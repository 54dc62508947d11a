"""robots.txt compliance filtering — crawl governance for the
curation pipeline. Fetch-side crawlers enforce robots at request
time; PROCESSING pipelines re-check it because corpora outlive
fetches (a page crawled in January may be disallowed by March's
robots.txt — takedown and licensing reviews ask exactly this
question of stored corpora).

Charter extension (SURVEY.md §2.10; the rules format is the public
Robots Exclusion Protocol and evaluation delegates to stdlib
``urllib.robotparser`` — the semantics every Python crawler already
has. NOTE this is the ORIGINAL first-match-in-rule-order REP, not
RFC 9309's longest-match: an ``Allow`` wins only when it precedes
the ``Disallow`` it carves out of. Swapping in a longest-match
evaluator changes one closure, not the distribution shape).

Scale design — the shape matters more than the parser:
- rules are DATA: a (host, robots_txt) DataFrame, joined to the URL
  set on host. NO driver-side collect of rule bodies (a crawl has
  millions of hosts; broadcasting a dict does not survive 100 TB).
- evaluation is ``applyInPandas`` GROUPED BY HOST: each group parses
  its robots.txt ONCE and evaluates all of that host's URLs against
  the parsed matcher — per-URL work is a matcher lookup, not a
  re-parse. Host grouping is the same shuffle the politeness/quota
  stages already need, so at scale the exchange is shared.
- hosts with no robots row (or an unparseable body) default to
  ALLOWED — the REP's own rule for missing robots.txt.
"""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import url_host

_SCHEMA_SUFFIX = "allowed boolean"


def robots_allowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
    fetched_col: str | None = None,
) -> DataFrame:
    """``urls`` + an ``allowed`` boolean per the REP (stdlib
    first-match semantics — see module doc), evaluated against
    ``robots``: a (host, robots_txt) frame. All other url columns
    pass through. See the module doc for the parse-once-per-host
    execution shape.

    ``robots`` is collapsed to ONE row per host before the join —
    a corpus re-checked over time legitimately carries several
    fetches of the same host's rules, and joining them raw would
    duplicate every URL row for that host (and score copies against
    arbitrary bodies). Pass ``fetched_col`` (a timestamp/version
    column on ``robots``) to keep the LATEST fetch per host; without
    it ties break on the lexically-greatest body — deterministic,
    but time-blind, so prefer ``fetched_col`` whenever fetch times
    exist."""
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in urls.schema.fields
    ) + ", " + _SCHEMA_SUFFIX
    with_host = urls.withColumn("__host", url_host(F.col(url_col)))
    per_host = robots.select(
        F.col(host_col).alias("__host"),
        F.col(body_col).alias("__robots"),
        *([F.col(fetched_col).alias("__fetched")] if fetched_col else []),
    ).groupBy("__host")
    robots_one = (
        per_host.agg(F.max_by("__robots", "__fetched").alias("__robots"))
        if fetched_col
        else per_host.agg(F.max("__robots").alias("__robots"))
    )
    joined = with_host.join(robots_one, "__host", "left")
    pass_cols = [f.name for f in urls.schema.fields]

    def evaluate(pdf):
        import pandas as pd

        body = pdf["__robots"].iloc[0]
        parser = None
        if body is not None:
            try:
                parser = urllib.robotparser.RobotFileParser()
                parser.parse(str(body).splitlines())
            except Exception:
                parser = None  # unparseable rules: REP default = allow
        if parser is None:
            allowed = [True] * len(pdf)
        else:
            allowed = [
                parser.can_fetch(agent, u) if u is not None else False
                for u in pdf[url_col]
            ]
        out = pdf[pass_cols].copy()
        out["allowed"] = allowed
        return out

    return joined.groupBy("__host").applyInPandas(evaluate, out_schema)


def drop_disallowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    fetched_col: str | None = None,
) -> DataFrame:
    """The filter form: only rows whose URL the host's robots.txt
    allows for ``agent`` (missing/unparseable rules allow, per the
    REP)."""
    return (
        robots_allowed(
            urls, robots, agent=agent, url_col=url_col, fetched_col=fetched_col
        )
        .filter(F.col("allowed"))
        .drop("allowed")
    )
