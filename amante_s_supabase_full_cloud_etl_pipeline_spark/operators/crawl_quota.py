"""Per-host crawl quota — the politeness/budget sampler that caps how
many pages any one site contributes to a corpus. Web crawls are
Zipf-distributed over hosts; without a cap, a handful of mega-hosts
dominate the training mixture (and the crawl's fetch budget). This is
the governance stage that composes with robots filtering
(:mod:`.robots`) and URL canonicalization (:mod:`.urls`): robots says
"may we", the quota says "how much".

Charter extension (SURVEY.md §2.10 crawl-governance family;
reference analog: none). Design requirements, shared with
:mod:`.sampling`:

- DETERMINISTIC and content-keyed: whether a URL survives depends
  only on the URL (``xxhash64``), never on partitioning, input
  order, or cluster size — re-running the pipeline keeps the same
  pages, so downstream caches/dedup state stay valid.
- BOUNDED state: selection is :func:`.topk.grouped_topk`'s two-phase
  fold (partial top-k per (host, partition), then top-k of
  candidates), NOT ``row_number() OVER (PARTITION BY host)`` — a
  window would sort each hot host in one task, the same
  skewed-single-task shape the robots evaluator just got rid of.
  The shuffle after the partial fold carries at most
  k × n_partitions rows per host.
- UNIFORM within a host: keeping the k smallest hashes is a uniform
  k-sample of the host's distinct URLs, so the cap does not bias
  toward any URL shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist
from .topk import grouped_topk
from .urls import url_host, url_registered_domain

_INT_MAX = 2**31 - 1

#: per-window fetch caps above this are treated as unlimited (see the
#: politeness_budget caps comment): bounds grouped_topk's k — and with
#: it the final per-site fold buffer — while remaining far above any
#: budget that actually throttles (65,536 fetches per politeness
#: window; the same order as the robots evaluator's salting threshold)
_CAP_CEILING = 1 << 16


def _shield(
    df: DataFrame, url_col: str, names: tuple[str, ...]
) -> tuple[DataFrame, str, dict[str, str]]:
    """Rename caller columns that clash with internal working names or
    grouped_topk's ``rank`` output (a payload column named rank would
    come back ambiguous, a pre-existing __site/__key would be
    clobbered). Returns (shielded df, shielded url column name, the
    rename map — invert it to restore caller names on the way out)."""
    clashes = {c: f"__cq_{c}" for c in df.columns if c in names}
    safe = df.withColumnsRenamed(clashes) if clashes else df
    return safe, clashes.get(url_col, url_col), clashes


def _unshield(df: DataFrame, clashes: dict[str, str]) -> DataFrame:
    return (
        df.withColumnsRenamed({v: c for c, v in clashes.items()})
        if clashes
        else df
    )


def site_of(
    df: DataFrame,
    url_col: str,
    by: str = "host",
    psl: DataFrame | None = None,
    out_col: str = "__site",
) -> DataFrame:
    """``df`` + a site-key column: the single dispatch (host /
    two-label registered domain / PSL-exact registered domain) shared
    by :func:`per_host_quota`, :func:`politeness_budget` and the
    streaming quota index — one place for site-key semantics, so the
    batch and streaming forms can never diverge."""
    if by not in ("host", "registered_domain"):
        raise ValueError(f"by must be 'host' or 'registered_domain', got {by!r}")
    if psl is not None and by != "registered_domain":
        raise ValueError("psl only applies to by='registered_domain'")
    if psl is not None:
        from .psl import with_registered_domain

        return with_registered_domain(df, url_col=url_col, psl=psl, out_col=out_col)
    site_fn = url_host if by == "host" else url_registered_domain
    return df.withColumn(out_col, site_fn(F.col(url_col)))


def per_host_quota(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    by: str = "host",
    psl: DataFrame | None = None,
) -> DataFrame:
    """At most ``k`` rows per site, selected as the ``k`` smallest
    ``xxhash64(url)`` values (a deterministic uniform sample of the
    site's URLs — see module doc). ``by`` picks the site key:
    ``"host"`` (default) or ``"registered_domain"`` (quota shared
    across subdomains — the usual politeness unit). With
    ``by="registered_domain"``, pass ``psl`` (an
    :func:`.psl.psl_frame` rules table) for public-suffix-list-exact
    site keys — the two-label default collapses every ``*.co.uk``
    registrant into ONE bucket, which is precisely the hosts a
    politeness quota must keep apart. Input columns pass through
    unchanged; ties (the same URL fetched twice) break on the
    remaining columns' struct order, so the output is deterministic
    for any input.
    """
    safe, safe_url, clashes = _shield(df, url_col, ("rank", "__site", "__key"))
    tagged = site_of(safe, safe_url, by=by, psl=psl, out_col="__site").withColumn(
        "__key", F.xxhash64(F.col(safe_url))
    )
    kept = grouped_topk(
        tagged,
        group_by=["__site"],
        order_by=["__key"],
        k=k,
        ascending=["__key"],
    ).select(*safe.columns)
    return _unshield(kept, clashes).select(*df.columns)


def politeness_budget(
    urls: DataFrame,
    robots: DataFrame,
    window_seconds: float,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
    fetched_col: str | None = None,
    rep: str = "stdlib",
    default_delay: float | None = None,
) -> DataFrame:
    """The "how fast" leg of crawl governance (robots = may we,
    :func:`per_host_quota` = how much): keep per host at most the
    number of fetches its declared ``Crawl-delay`` permits inside a
    ``window_seconds`` fetch window — ``max(1, floor(window /
    delay))`` (every host gets at least one fetch; a zero/negative
    delay means no limit). Hosts declaring NO delay — including
    hosts with no robots row at all — are unlimited unless
    ``default_delay`` imposes one; a host with an EXPLICIT
    zero/negative delay stays unlimited even then. A delay so small
    that the cap would exceed ``_CAP_CEILING`` (65,536 fetches per
    window) is likewise no limit — such a budget throttles nothing,
    and treating it as a cap would both overflow the INT32 cast and
    un-bound the shared top-k (see the caps comment). Selection is
    the same deterministic
    content-keyed k-smallest-hash sample as :func:`per_host_quota` —
    rerunning keeps the same pages.

    Scale shape: delays come from :func:`.robots.host_crawl_delays`
    (one row per host); the per-host cap varies, so rows are ranked
    once by the bounded two-phase :func:`.topk.grouped_topk` with
    ``k`` = the LARGEST cap any limited host carries (one scalar
    driver agg over the per-host delay frame — never per-URL data),
    then filtered to each host's own cap. Unlimited hosts bypass the
    rank entirely. No per-host window sort anywhere. The per-host
    caps subtree (robots parse + latest-fetch collapse) feeds both
    that scalar and the returned plan, so it is tracked-persisted —
    never parsed twice."""
    from .robots import host_crawl_delays

    delays = host_crawl_delays(
        robots,
        agent=agent,
        host_col=host_col,
        body_col=body_col,
        fetched_col=fetched_col,
        rep=rep,
    )
    eff = F.coalesce(
        F.col("crawl_delay"), F.lit(default_delay).cast("double")
    )
    raw = F.floor(F.lit(float(window_seconds)) / eff)  # bigint, never cast hot
    caps = tracked_persist(
        delays.select(
            F.col("host").alias("__site"),
            # caps above the ceiling are indistinguishable from no
            # limit — route them to the unlimited branch. The ceiling
            # serves two hazards at once: an INT32 overflow on the
            # cast (ANSI throws CAST_OVERFLOW on e.g. Crawl-delay:
            # 1e-8; legacy would wrap negative and silently drop every
            # page of the host), and — the subtler one — ONE tiny but
            # non-overflowing delay setting grouped_topk's k for EVERY
            # limited host: k in the hundreds of millions un-bounds
            # the final per-site fold buffer, the exact hazard the
            # two-phase top-k exists to prevent. A budget permitting
            # more than _CAP_CEILING fetches per window throttles
            # nothing real.
            F.when(
                (eff > 0) & (raw <= F.lit(_CAP_CEILING)),
                F.greatest(raw, F.lit(1)).cast("int"),
            ).alias("__cap"),
            F.lit(True).alias("__has_robots"),
        )
    )

    # hosts absent from the robots frame declare no delay either, so
    # default_delay governs them too (applied after the left join via
    # __has_robots — the caps-frame coalesce can't see absent hosts)
    default_cap = None
    if default_delay is not None and default_delay > 0:
        dc = int(float(window_seconds) // float(default_delay))
        if dc <= _CAP_CEILING:
            default_cap = max(1, dc)

    safe, safe_url, clashes = _shield(
        urls, url_col, ("rank", "__site", "__key", "__cap", "__has_robots")
    )
    tagged = (
        safe.withColumn("__site", url_host(F.col(safe_url)))
        .join(caps, "__site", "left")
        .withColumn(
            "__cap",
            F.when(
                F.col("__has_robots").isNull(),
                F.lit(default_cap).cast("int"),
            ).otherwise(F.col("__cap")),
        )
    )

    # rows whose URL yields no host (garbage strings: url_host()
    # returns '' on no-match, NULL on NULL input) have no site to
    # budget — pass them through rather than letting them compete as
    # ONE shared pseudo-host group that default_cap would silently
    # truncate (every other path in this module passes garbage URLs
    # through for downstream validation)
    no_site = F.col("__site").isNull() | (F.col("__site") == F.lit(""))
    unlimited = tagged.filter(F.col("__cap").isNull() | no_site).select(
        *safe.columns
    )
    limited = tagged.filter(F.col("__cap").isNotNull() & ~no_site)
    k_max = caps.agg(F.max("__cap").alias("m")).collect()[0]["m"]
    if default_cap is not None:
        k_max = default_cap if k_max is None else max(k_max, default_cap)
    if k_max is None:
        kept = safe.select(*safe.columns)  # no limited host anywhere
    else:
        ranked = grouped_topk(
            limited.withColumn("__key", F.xxhash64(F.col(safe_url))),
            group_by=["__site"],
            order_by=["__key"],
            k=int(k_max),
            ascending=["__key"],
        )
        kept = unlimited.unionByName(
            ranked.filter(F.col("rank") <= F.col("__cap")).select(*safe.columns)
        )
    return _unshield(kept, clashes).select(*urls.columns)
