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
- scheme and host lowercased; userinfo and the DNS-neutral trailing
  host dot dropped
- percent escapes of UNRESERVED characters decoded (%41 ≡ A,
  RFC 3986 §6.2.2.2) and the hex of every remaining escape
  uppercased (%2f ≡ %2F, §6.2.2.1), in path and per query param
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped (never sent to the server)
- query: tracking parameters removed (``utm_*`` incl. GA4's
  underscore names, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid`` —
  NOT ``ref``, which is often semantic), remaining params SORTED (param order is almost never semantic; sorting makes the
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

#: query parameters that never change the document. Deliberately
#: NOT here: ``ref`` — on many sites it selects content (category /
#: referral routing), so stripping it would false-merge distinct
#: pages and the keep-one dedup downstream would silently drop real
#: documents. ``utm_[a-z_]+`` covers the underscore GA4 names
#: (utm_source_platform, utm_creative_format, ...).
_TRACKING = r"(?i)^(utm_[a-z_]+|fbclid|gclid|msclkid|mc_eid)$"

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/([^\/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def _unreserved_map() -> Column:
    """Literal map: UPPERCASE hex octet → the RFC 3986 §2.3 unreserved
    character it encodes (ALPHA / DIGIT / ``-._~``). Only these may be
    percent-DECODED without changing URI semantics (§6.2.2.2) — every
    reserved or opaque octet must keep its escape."""
    pairs = []
    for ch in (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "abcdefghijklmnopqrstuvwxyz"
        "0123456789-._~"
    ):
        pairs += [F.lit(f"{ord(ch):02X}"), F.lit(ch)]
    return F.create_map(*pairs)


def _pct_normalize(col: Column) -> Column:
    """Percent-escape normalization per RFC 3986 §6.2.2: DECODE
    escapes of unreserved characters (§6.2.2.2 — %41 ≡ A; leaving
    them encoded under-merges the dedup key) and UPPERCASE the hex of
    every remaining escape (§6.2.2.1 — %2f ≡ %2F). Split-on-%% +
    transform keeps it a pure column expression; a malformed escape
    ("%zz") uppercases too, which is harmless for a dedup key (no
    spec assigns the two forms different meanings)."""
    parts = F.split(col, "%")
    m = _unreserved_map()
    fixed = F.transform(
        parts,
        lambda s, i: F.when(i == 0, s).otherwise(
            _decode_or_upper(m, s)
        ),
    )
    return F.array_join(fixed, "")


def _decode_or_upper(m: Column, s: Column) -> Column:
    """One post-%% fragment: its first two chars are the escape's hex
    digits. Unreserved → the literal character (escape dropped);
    anything else → ``%`` + uppercased hex. The rest of the fragment
    passes through."""
    hex2 = F.upper(s.substr(F.lit(1), F.lit(2)))
    rest = s.substr(F.lit(3), F.greatest(F.length(s) - 2, F.lit(0)))
    decoded = F.element_at(m, hex2)
    return F.concat(
        F.when(decoded.isNotNull(), decoded).otherwise(
            F.concat(F.lit("%"), hex2)
        ),
        rest,
    )


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

    # authority: drop userinfo, lowercase host, strip the DNS-neutral
    # trailing dot ('e.com.' IS 'e.com'), strip default port
    host = F.regexp_replace(
        F.lower(F.regexp_replace(auth, r"^[^@]*@", "")),  # userinfo@
        r"\.(?=$|:)",
        "",
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

    # query: split params, normalize escapes PER PARAM (decode
    # unreserved, uppercase the rest), THEN drop tracking, THEN sort,
    # then rejoin. Normalization must precede BOTH later steps:
    # - the sort: 'q=%4a' and 'q=%4A' are the same param, and sorting
    #   the raw forms can order RFC-equivalent URLs' params
    #   differently (making canonical_url non-idempotent — ADVICE r5);
    # - the tracking filter: 'utm%5Fsource' IS 'utm_source', and
    #   filtering the raw name would keep it on the first pass but
    #   strip it from the canonical output on a second pass (another
    #   idempotency break).
    params = F.filter(
        F.transform(
            F.split(F.regexp_replace(query, r"^\?", ""), "&"), _pct_normalize
        ),
        lambda p: (p != "")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(_TRACKING),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")

    norm_path = _pct_normalize(F.when(path == "", F.lit("/")).otherwise(path))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        norm_path,
        F.when(
            sorted_q != "", F.concat(F.lit("?"), sorted_q)
        ).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(url)


def url_host(col: Column) -> Column:
    """Lowercased host (no userinfo, no port, no DNS-neutral trailing
    dot) — the per-site grouping key."""
    auth = F.regexp_extract(F.trim(col), _URL_RE, 2)
    return F.regexp_replace(
        F.lower(
            F.regexp_replace(
                F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", ""
            )
        ),
        r"\.$",
        "",
    )


def url_registered_domain(col: Column) -> Column:
    """Last two host labels (example.co → example.co; a.b.example.com
    → example.com) — the quota key crawl politeness and per-domain
    mixture caps use. A real public-suffix list is data, not code;
    this two-label form is the standard approximation when the list
    isn't shipped, and the column is cheap to swap for a
    broadcast-joined suffix table. IP-literal hosts return WHOLE
    (an IPv4's last two octets are not a domain — collapsing
    10.2.3.4 and 172.99.3.4 into one quota bucket would throttle
    unrelated servers; PSL logic keeps full IPs too)."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        host.rlike(_IPV4_RE) | host.startswith("["),  # IPv4 / [IPv6]
        host,
    ).otherwise(
        F.when(
            n >= 2,
            F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
        ).otherwise(host)
    )
