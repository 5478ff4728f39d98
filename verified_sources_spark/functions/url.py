"""URL canonicalization as pure JVM Column expressions — the
frontier/crawl dedup key.

The same page arrives from a crawl as ``HTTP://Host.COM:80/a//b#x``
and ``http://host.com/a/b``; hashed raw, they are two frontier
entries and two dedup keys.  ``canonical_url`` applies the
semantics-preserving normalizations of RFC 3986 §6.2 that are
expressible as deterministic string algebra — no UDF, no driver code,
and every step is kept to the Java∩RE2 regex subset so the DuckDB
oracle replays it bit-for-bit:

- trim surrounding whitespace; strip the fragment (``#…`` never
  reaches the server)
- lowercase the scheme and authority (host names are
  case-insensitive; paths are NOT touched)
- drop the default port (``:80`` for http, ``:443`` for https)
- collapse duplicate slashes in the PATH only (the query keeps its
  bytes), drop a trailing lone ``?``, and give an empty path ``/``

Deliberately NOT done (each would change semantics or need state):
percent-encoding case-folding (needs replacement-case regex), query
parameter sorting (order can be semantic), dot-segment resolution
(needs iteration), IDN/punycode (needs tables).  Documented so the
limits are visible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url"]

_AUTH_RX = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(col: str | Column) -> Column:
    u = F.trim(_c(col))
    u = F.regexp_replace(u, "#.*", "")        # fragment
    auth = F.regexp_extract(u, _AUTH_RX, 0)   # scheme://host[:port]
    rest = u.substr(F.length(auth) + 1, F.lit(1 << 30))
    lauth = F.lower(auth)
    lauth = F.when(
        lauth.startswith("http://"),
        F.regexp_replace(lauth, ":80$", ""),
    ).when(
        lauth.startswith("https://"),
        F.regexp_replace(lauth, ":443$", ""),
    ).otherwise(lauth)
    path = F.regexp_extract(rest, "^[^?]*", 0)
    query = rest.substr(F.length(path) + 1, F.lit(1 << 30))
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(query == "?", F.lit("")).otherwise(query)
    # inputs without an authority (relative refs, mailto:) pass
    # through with only trim+fragment applied
    return F.when(auth == "", u).otherwise(
        F.concat(lauth, path, query))
