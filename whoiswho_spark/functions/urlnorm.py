"""URL canonicalization — the crawl-practice normal form used before
URL-level dedup and host blocking (RFC 3986 §6 syntax-based
normalization plus the common-crawl conventions).

Rules, in order (each a documented choice):

1. lowercase the SCHEME and HOST only (RFC 3986: both are
   case-insensitive; path/query are not — ``/Docs`` stays ``/Docs``);
2. strip a leading ``www.`` from the host (the convention
   ``blocking.normalized_host_col`` already uses);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop the fragment (never sent to the server);
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and SORT the survivors byte-ascending
   (param order is almost never semantic; sorting makes
   ``?b=2&a=1`` == ``?a=1&b=2``), dropping the ``?`` when none
   survive;
6. strip one trailing ``/`` from a non-root path (``/a/`` == ``/a``;
   the root path stays ``/``; an empty path becomes ``/``).

NOT done (documented): percent-encoding normalization and duplicate-
slash collapse — both can change meaning on real servers, and
syntax-only canonicalization must never merge two genuinely different
resources.

Everything is pure Catalyst (regexp + split/filter/sort/join on
arrays), engine-portable to the DuckDB oracle — no lookarounds, no
Python.  At 100 TB this is a map-only projection: zero shuffle, fully
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module rules).
    Non-URL strings (no scheme) pass through unchanged — an honest
    unknown, never a wrong merge."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    # rest = everything after the authority, fragment already excluded
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?([^#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        qpart,
    )
    return F.when(scheme == "", url).otherwise(canon)
