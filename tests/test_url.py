"""URL canonicalization (functions/url.canonical_url): the RFC 3986
§6.2 semantics-preserving subset as pure Column expressions."""

from __future__ import annotations

import pytest


CASES = [
    ("HTTP://Host.COM:80/a//b#frag", "http://host.com/a/b"),
    ("https://E.com:443/", "https://e.com/"),
    ("https://e.com:8443/x", "https://e.com:8443/x"),  # non-default port kept
    ("http://e.com", "http://e.com/"),                 # empty path -> /
    ("http://e.com?", "http://e.com/"),                # lone ? dropped
    ("http://e.com/a?b=1&c=2#x", "http://e.com/a?b=1&c=2"),
    ("  http://e.com/Path/Case  ", "http://e.com/Path/Case"),  # path case kept
    ("http://e.com//a///b//", "http://e.com/a/b/"),
    ("http://e.com/a?x=//keep//", "http://e.com/a?x=//keep//"),  # query bytes kept
    ("mailto:a@b.com", "mailto:a@b.com"),              # no authority: pass-through
    ("/relative/path#f", "/relative/path"),
]


def test_canonical_url_cases(spark):
    from pyspark.sql import functions as F

    from verified_sources_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)],
        "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_canonical_url_stays_jvm_side(spark):
    from verified_sources_spark.functions.url import canonical_url

    df = spark.range(10).selectExpr(
        "concat('HTTP://H', id, '.COM:80/p#f') as url")
    plan = (df.select(canonical_url("url").alias("c"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
