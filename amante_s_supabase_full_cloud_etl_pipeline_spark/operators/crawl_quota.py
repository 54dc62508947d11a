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

from .topk import grouped_topk
from .urls import url_host, url_registered_domain


def per_host_quota(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    by: str = "host",
) -> DataFrame:
    """At most ``k`` rows per site, selected as the ``k`` smallest
    ``xxhash64(url)`` values (a deterministic uniform sample of the
    site's URLs — see module doc). ``by`` picks the site key:
    ``"host"`` (default) or ``"registered_domain"`` (quota shared
    across subdomains — the usual politeness unit). Input columns
    pass through unchanged; ties (the same URL fetched twice) break
    on the remaining columns' struct order, so the output is
    deterministic for any input.
    """
    if by not in ("host", "registered_domain"):
        raise ValueError(f"by must be 'host' or 'registered_domain', got {by!r}")
    # shield internal names and grouped_topk's 'rank' output from
    # caller columns: a payload column named rank would come back
    # ambiguous, and a pre-existing __site/__key would be clobbered
    clashes = {
        c: f"__cq_{c}" for c in df.columns if c in ("rank", "__site", "__key")
    }
    safe = df.withColumnsRenamed(clashes) if clashes else df
    safe_url = clashes.get(url_col, url_col)
    site_fn = url_host if by == "host" else url_registered_domain
    tagged = safe.withColumn("__site", site_fn(F.col(safe_url))).withColumn(
        "__key", F.xxhash64(F.col(safe_url))
    )
    kept = grouped_topk(
        tagged,
        group_by=["__site"],
        order_by=["__key"],
        k=k,
        ascending=["__key"],
    ).select(*safe.columns)
    if clashes:
        kept = kept.withColumnsRenamed({v: c for c, v in clashes.items()})
    return kept.select(*df.columns)
