"""URL canonicalization column expressions for web-crawl pipelines.

Crawl dedup/partitioning keys off the URL, and the same resource appears
under many spellings (case-variant scheme/host, explicit default ports,
fragments, empty paths). Canonicalization is the first join/dedup key fix
at crawl scale.

Pure ``Column`` expressions (regexp_extract/CASE only — no ``parse_url``,
which has no DuckDB analog), so every function mirrors 1:1 into the ANSI
oracle. Rules (frozen):
  * scheme and host lowercase
  * fragment stripped
  * userinfo stripped from the authority
  * default ports stripped (``:80`` for http, ``:443`` for https)
  * empty path → ``/`` — INCLUDING before a query string
    (``http://a.com?q=1`` → ``http://a.com/?q=1``; the RFC-equivalent
    spellings must land on one dedup key, eleventh-review fix)
Non-URL strings (no ``scheme://``) pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# authority may be EMPTY (file:///path): '+' here would fail the whole match
# and silently canonicalize every file:/// URL to 'file:///', merging
# distinct paths onto one dedup key
_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), _SCHEME, 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    auth = F.lower(F.regexp_extract(_c(col), _AUTHORITY, 1))
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":[0-9]*$", "")


def url_normalize(col: Column | str) -> Column:
    """Canonical URL per the module's frozen rules."""
    c = _c(col)
    scheme = url_scheme(c)
    auth = F.lower(F.regexp_extract(c, _AUTHORITY, 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    rest = F.regexp_extract(c, _REST, 1)
    rest = F.when(rest == "", F.lit("/")).otherwise(
        # empty path before a query: 'http://a.com?q=1' extracts rest
        # '?q=1' — same resource as '/?q=1', must share its key
        F.when(
            F.substring(rest, 1, 1) == "?", F.concat(F.lit("/"), rest)
        ).otherwise(rest)
    )
    return F.when(
        scheme == "", c  # not a URL: pass through
    ).otherwise(F.concat(scheme, F.lit("://"), auth, rest))
