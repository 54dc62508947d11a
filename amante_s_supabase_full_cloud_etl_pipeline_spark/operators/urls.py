"""URL canonicalization — the crawl-side dedup key. Before any
content-level dedup, crawl pipelines collapse the SAME page fetched
under trivially-different URLs (scheme case, default ports, tracking
parameters, fragments); skipping this stage re-crawls and re-processes
the same documents many times over.

Charter extension (SURVEY.md §2.10 dedup family; reference analog:
none). The normalizations implemented are the RFC 3986 §6
syntax-based ones plus the tracking-parameter strip every production
crawler applies; everything is pure ``pyspark.sql.functions``
expressions — map-only, whole-stage codegen, zero UDF, so the
canonical key costs one projection at 100 TB.

Normalizations (in order):
- scheme and host lowercased (RFC 3986 §6.2.2.1); userinfo dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped (never sent to the server)
- query: tracking parameters removed (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``, ``mc_eid``), remaining params
  SORTED (param order is almost never semantic; sorting makes the
  key stable), empty query dropped
- path: empty → ``/``; trailing slash preserved (it CAN be
  semantic — /a and /a/ may differ)

:func:`canonical_url` returns the canonical string;
:func:`url_host`/:func:`url_registered_domain` expose the grouping
keys crawl stats and per-site quotas need.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change the document
_TRACKING = r"(?i)^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_eid)$"

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/([^\/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url(col: Column) -> Column:
    """RFC 3986 §6 syntax-based canonical form of a URL column (see
    module doc for the exact normalizations). A value that does not
    parse as ``scheme://authority...`` passes through TRIMMED but
    otherwise untouched — an unparseable source URL is still a
    usable dedup key, just not a normalized one."""
    url = F.trim(col)
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    auth = F.regexp_extract(url, _URL_RE, 2)
    path = F.regexp_extract(url, _URL_RE, 3)
    query = F.regexp_extract(url, _URL_RE, 4)

    # authority: drop userinfo, lowercase host, strip default port
    host = F.lower(
        F.regexp_replace(auth, r"^[^@]*@", "")  # userinfo@
    )
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).otherwise(
        F.when(
            (scheme == "https") & host.endswith(":443"),
            F.regexp_replace(host, r":443$", ""),
        ).otherwise(host)
    )

    # query: split params, drop tracking, sort, rejoin
    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(_TRACKING),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")

    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        norm_path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme != "", rebuilt).otherwise(url)


def url_host(col: Column) -> Column:
    """Lowercased host (no userinfo, port kept off) — the per-site
    grouping key."""
    auth = F.regexp_extract(F.trim(col), _URL_RE, 2)
    return F.lower(
        F.regexp_replace(F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", "")
    )


def url_registered_domain(col: Column) -> Column:
    """Last two host labels (example.co → example.co; a.b.example.com
    → example.com) — the quota key crawl politeness and per-domain
    mixture caps use. A real public-suffix list is data, not code;
    this two-label form is the standard approximation when the list
    isn't shipped, and the column is cheap to swap for a
    broadcast-joined suffix table."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)
