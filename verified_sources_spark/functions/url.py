"""URL canonicalization as pure JVM Column expressions — the
frontier/crawl dedup key.

The same page arrives from a crawl as ``HTTP://Host.COM:80/a//b#x``
and ``http://host.com/a/b``; hashed raw, they are two frontier
entries and two dedup keys.  ``canonical_url`` applies the
normalizations below as deterministic string algebra — no UDF, no
driver code, and every step is kept to the Java∩RE2 regex subset so
the DuckDB oracle replays it bit-for-bit:

- trim surrounding whitespace; strip the fragment (``#…`` never
  reaches the server; the match is dotall so fragments containing
  embedded newlines strip whole)
- lowercase the scheme and the host:port ONLY (RFC 3986 §6.2.2.1 —
  userinfo is case-sensitive and keeps its bytes, so
  ``http://User:X@h/`` and ``http://user:x@h/`` stay distinct keys)
- drop the default port (``:80`` for http, ``:443`` for https)
- drop a trailing lone ``?`` and give an empty path ``/``
- with ``collapse_slashes=True`` (the default), collapse duplicate
  slashes in the PATH (the query keeps its bytes).  This one is NOT
  an RFC 3986 §6.2 semantics-preserving normalization — ``/a//b``
  and ``/a/b`` are distinct URIs — it is a deliberately lossy crawl
  heuristic (real servers overwhelmingly treat them alike, and crawl
  frontiers want them merged).  Pass ``collapse_slashes=False`` for
  the strictly semantics-preserving subset.

- with ``base_scheme='http'`` (or 'https'), a scheme-relative
  ``//host/path`` input — RFC 3986 §4.2 network-path reference,
  legal and seen in wild sitemaps — resolves against that scheme
  and canonicalizes like its absolute form.  The DEFAULT
  (``base_scheme=None``) keeps the no-authority passthrough:
  resolution needs a base the URL alone does not carry, and
  inventing one would merge keys the caller never asserted.

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
_SCHEME_RX = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(col: str | Column, *,
                  collapse_slashes: bool = True,
                  base_scheme: str | None = None) -> Column:
    u = F.trim(_c(col))
    # (?s): fragments may contain embedded newlines; Java '.' stops
    # at \n without it and the post-newline tail would survive.
    u = F.regexp_replace(u, "(?s)#.*", "")
    if base_scheme is not None:
        import re as _re

        # RFC 3986 §3.1 scheme grammar — isalnum() would admit
        # digit-first or fullwidth strings that then fail the
        # authority regex and silently fall into the passthrough
        if not _re.fullmatch(r"[A-Za-z][A-Za-z0-9+.-]*", base_scheme):
            raise ValueError(f"bad base_scheme {base_scheme!r}")
        # network-path references (//host/path) resolve against the
        # base scheme BEFORE the authority parse, so they share the
        # absolute form's canonical key
        u = F.when(u.startswith("//"),
                   F.concat(F.lit(base_scheme + ":"), u)).otherwise(u)
    auth = F.regexp_extract(u, _AUTH_RX, 0)  # scheme://[user@]host[:port]
    rest = u.substr(F.length(auth) + 1, F.lit(1 << 30))
    scheme = F.lower(F.regexp_extract(auth, _SCHEME_RX, 1))
    body = F.regexp_replace(auth, _SCHEME_RX, "")
    # Greedy ".*@" captures through the LAST '@' — userinfo may
    # itself contain '@' percent-free in the wild; the host never
    # does.  Case is preserved (userinfo is case-sensitive).  (?s):
    # the authority class [^/?#] admits newlines, and a non-dotall
    # '.*' would fail past one, silently case-folding the userinfo.
    userinfo = F.regexp_extract(body, "(?s)^(.*@)", 1)
    hostport = F.lower(body.substr(F.length(userinfo) + 1,
                                   F.lit(1 << 30)))
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", ""),
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", ""),
    ).otherwise(hostport)
    lauth = F.concat(scheme, F.lit("://"), userinfo, hostport)
    path = F.regexp_extract(rest, "^[^?]*", 0)
    query = rest.substr(F.length(path) + 1, F.lit(1 << 30))
    if collapse_slashes:
        path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(query == "?", F.lit("")).otherwise(query)
    # inputs without an authority (relative refs, mailto:) pass
    # through with only trim+fragment applied
    return F.when(auth == "", u).otherwise(
        F.concat(lauth, path, query))
