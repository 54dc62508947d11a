"""Public-suffix-list registered domains AS DATA — the precise form
of :func:`.urls.url_registered_domain`'s two-label approximation
(VERDICT r7 #4).

Under two-label, every ``*.co.uk`` site collapses into ONE quota
bucket (``co.uk``), so the per-site crawl quota — whose main
production use is politeness across exactly such ccTLD registrants —
mis-throttles unrelated sites. The real rule set is the public
suffix list (publicsuffix.org): thousands of rows of DATA, updated
continuously, so it belongs in a TABLE, not in code. This module
evaluates PSL semantics as a broadcast join + aggregation over the
DISTINCT hosts — no per-row Python, no driver-side host loop.

PSL algorithm (publicsuffix.org/list/ spec):
- a rule matches a host when the host ends with the rule's labels;
  ``*`` in a rule matches exactly one label; a ``!`` rule is an
  EXCEPTION;
- the prevailing rule is the matching exception if any, else the
  matching rule with the most labels, else the implicit default
  rule ``*`` (every bare TLD is a public suffix);
- the public suffix is the prevailing rule's labels (an exception
  first drops its leftmost label); the REGISTERED domain is the
  public suffix plus one more host label.

Deviations, both deliberate and test-pinned:
- a host that IS a public suffix (or an IP literal) returns ITSELF
  rather than the spec's null: a quota key must never merge all
  suffix-only hosts into one null bucket, and this matches the
  two-label fallback's behavior for short hosts;
- no IDN/punycode folding — the PSL ships both spellings and the
  caller's host column is already lowercased by ``url_host``.

Spark shape: hosts are deduplicated first (a crawl has millions of
hosts but orders of magnitude more rows), each distinct host explodes
into its ≤127 label-suffix candidates, candidates equi-join the
(broadcast) rule table, one aggregation picks the prevailing rule per
host, and the resulting (host → registered_domain) map joins back to
the data. Cost at 100 TB: one distinct on host + one broadcast join
+ one small shuffle on host — the same class as any dimension
enrichment.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .urls import _IPV4_RE, url_host

#: rule-kind tags in the rules frame
_NORMAL, _WILDCARD, _EXCEPTION = "normal", "wildcard", "exception"


def parse_psl(lines: Iterable[str]) -> list[tuple[str, str]]:
    """PSL text lines → [(pattern, kind)]. Comments (``//``) and
    blanks drop; ``*.foo`` stores its PARENT (``foo``, kind
    wildcard); ``!bar`` stores ``bar`` (kind exception); everything
    else is a normal rule. Patterns lowercase (the PSL is defined
    case-insensitive)."""
    rules = []
    for raw in lines:
        line = raw.split("//", 1)[0].strip().lower()
        if not line:
            continue
        if line.startswith("!"):
            rules.append((line[1:], _EXCEPTION))
        elif line.startswith("*."):
            rules.append((line[2:], _WILDCARD))
        else:
            rules.append((line, _NORMAL))
    return rules


def psl_frame(spark: SparkSession, lines: Iterable[str]) -> DataFrame:
    """The rules table :func:`registered_domain_map` consumes —
    built from PSL text here, or load your own (pattern, kind)
    parquet at scale."""
    return spark.createDataFrame(
        parse_psl(lines), "pattern string, kind string"
    )


def registered_domain_map(
    hosts: DataFrame, psl: DataFrame, host_col: str = "host"
) -> DataFrame:
    """(host → registered_domain) for each DISTINCT host in
    ``hosts``, under ``psl`` rules (see module doc for the algorithm
    and the suffix-only/IP deviations). One row per distinct host."""
    distinct = hosts.select(F.col(host_col).alias("host")).distinct()
    labeled = distinct.withColumn("labels", F.split("host", r"\.")).withColumn(
        "n", F.size("labels")
    )
    # candidate suffixes: for i in 0..n-1 the last (n-i) labels,
    # tagged with how many labels they carry
    cands = labeled.select(
        "host",
        "n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - 1),
                lambda i: F.array_join(
                    F.slice(F.col("labels"), i + 1, F.col("n") - i), "."
                ),
            )
        ).alias("i", "cand"),
    ).withColumn("cand_labels", F.col("n") - F.col("i"))

    matches = cands.join(
        F.broadcast(psl), cands["cand"] == psl["pattern"], "inner"
    ).select(
        "host",
        "n",
        "i",
        "cand",
        "cand_labels",
        "kind",
        # effective public-suffix label count per kind: a wildcard
        # parent match extends one label LEFT (requires that label to
        # exist, i >= 1); an exception's suffix is its own labels
        # MINUS the leftmost — and the exception's cand is itself the
        # registered domain
        F.when(F.col("kind") == _NORMAL, F.col("n") - F.col("i"))
        .when(
            (F.col("kind") == _WILDCARD) & (F.col("i") >= 1),
            F.col("n") - F.col("i") + 1,
        )
        .alias("eff_labels"),
    )
    per_host = matches.groupBy("host").agg(
        F.max(
            F.when(
                F.col("kind") == _EXCEPTION,
                F.struct(F.col("cand_labels"), F.col("cand")),
            )
        ).alias("exc"),
        F.max("eff_labels").alias("k_rules"),
    )

    out = labeled.join(per_host, "host", "left").withColumn(
        "__k", F.greatest(F.coalesce(F.col("k_rules"), F.lit(1)), F.lit(1))
    )
    reg_from_k = F.when(
        F.col("n") > F.col("__k"),
        F.array_join(
            F.slice(F.col("labels"), F.col("n") - F.col("__k"), F.col("__k") + 1),
            ".",
        ),
    ).otherwise(F.col("host"))  # host IS a suffix: own bucket (module doc)
    return out.select(
        "host",
        F.when(
            F.col("host").rlike(_IPV4_RE) | F.col("host").startswith("["),
            F.col("host"),  # IP literals keep whole, like the two-label form
        )
        .when(F.col("exc").isNotNull(), F.col("exc.cand"))
        .otherwise(reg_from_k)
        .alias("registered_domain"),
    )


def with_registered_domain(
    df: DataFrame,
    url_col: str = "url",
    psl: DataFrame | None = None,
    out_col: str = "registered_domain",
) -> DataFrame:
    """``df`` + a registered-domain column for each row's URL: the
    PSL-exact value when ``psl`` (a :func:`psl_frame`) is given, the
    two-label approximation otherwise — one call site, swappable
    precision."""
    if out_col == "__rd_host":
        raise ValueError("out_col may not be the internal name __rd_host")
    if out_col == url_col:
        raise ValueError("out_col may not equal url_col")
    if psl is None:
        from .urls import url_registered_domain

        return df.withColumn(out_col, url_registered_domain(F.col(url_col)))
    # REPLACE semantics, matching the two-label branch's withColumn:
    # a pre-existing out_col (re-enriching a two-label-tagged frame
    # with PSL precision — the advertised swappable-precision use)
    # would otherwise come back DUPLICATED by the join
    if out_col in df.columns:
        df = df.drop(out_col)
    # shield a caller payload column named __rd_host — withColumn
    # would overwrite it and the trailing drop would delete it
    clashes = {c: f"__psl_{c}" for c in df.columns if c == "__rd_host"}
    safe = df.withColumnsRenamed(clashes) if clashes else df
    safe_url = clashes.get(url_col, url_col)
    tagged = safe.withColumn("__rd_host", url_host(F.col(safe_url)))
    mapping = registered_domain_map(
        tagged.select("__rd_host"), psl, host_col="__rd_host"
    ).withColumnsRenamed(
        {"host": "__rd_host", "registered_domain": out_col}
    )
    out = tagged.join(mapping, "__rd_host", "left").drop("__rd_host")
    if clashes:
        out = out.withColumnsRenamed({v: c for c, v in clashes.items()})
    return out
