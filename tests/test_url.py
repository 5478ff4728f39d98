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
    # userinfo is case-sensitive: only scheme+host fold (§6.2.2.1)
    ("HTTP://User:Pw@Host.COM:80/a", "http://User:Pw@host.com/a"),
    ("http://User:Pw@h.com/a", "http://User:Pw@h.com/a"),
    ("http://a@b@H.com/x", "http://a@b@h.com/x"),      # last @ splits host
    # fragment strip is dotall: embedded newline doesn't save the tail
    ("http://e.com/a#fr\nag", "http://e.com/a"),
    ("http://e.com/a?q=1#x\ny#z", "http://e.com/a?q=1"),
]


def test_userinfo_not_folded_together(spark):
    """Distinct-credential URLs must stay distinct canonical keys."""
    from verified_sources_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [("http://User:X@h.com/",), ("http://user:x@h.com/",)],
        "url string")
    keys = {r["c"] for r in
            df.select(canonical_url("url").alias("c")).collect()}
    assert len(keys) == 2


def test_collapse_slashes_flag(spark):
    """collapse_slashes=False keeps /a//b (the strictly
    semantics-preserving subset)."""
    from verified_sources_spark.functions.url import canonical_url

    df = spark.createDataFrame([("HTTP://E.com//a//b",)], "url string")
    [r] = df.select(
        canonical_url("url", collapse_slashes=False).alias("c")
    ).collect()
    assert r["c"] == "http://e.com//a//b"


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


def test_userinfo_newline_stays_case_sensitive(spark):
    """The authority class admits newlines; the userinfo split must be
    dotall or the whole userinfo silently case-folds (self-review)."""
    from verified_sources_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [("http://UserA\nB@H.com/x",), ("http://usera\nb@H.com/x",)],
        "url string")
    keys = [r["c"] for r in
            df.select(canonical_url("url").alias("c")).collect()]
    assert keys[0] == "http://UserA\nB@h.com/x"
    assert len(set(keys)) == 2


def test_base_scheme_resolves_network_path_refs(spark):
    """base_scheme='http' resolves RFC 3986 §4.2 scheme-relative URLs
    to the absolute canonical key; the default keeps the passthrough
    (resolution is opt-in, never invented); absolute inputs are
    untouched by the parameter; a path-relative '/x' never gains an
    authority."""
    from verified_sources_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [("//Host.COM:80/a//b#f",), ("http://host.com/a/b",),
         ("/rel/path",)], "url string")
    with_base = [r["c"] for r in df.select(
        canonical_url("url", base_scheme="http").alias("c")).collect()]
    assert with_base == ["http://host.com/a/b", "http://host.com/a/b",
                         "/rel/path"]
    no_base = [r["c"] for r in df.select(
        canonical_url("url").alias("c")).collect()]
    assert no_base[0] == "//Host.COM:80/a//b"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        canonical_url("url", base_scheme="ht tp://")
