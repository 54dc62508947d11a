"""Deterministic sampling and dataset splits for training-data
pipelines (charter extension, SURVEY.md §2.10).

At 100 TB, ``df.sample()`` is the wrong tool for corpus curation:
its output depends on partitioning and the run's RNG stream, so a
re-run (or a recomputed lost partition!) yields a *different*
sample, and train/val/test membership can't be reproduced or
joined against later. The standard fix is CONTENT-KEYED sampling:
hash a stable key, take the rows whose hash falls below the
fraction threshold. Properties that matter at scale:

- **Pure map-side filter** — no shuffle, no state, prunes columns;
  Catalyst pipelines it into the scan stage.
- **Reproducible & incremental** — membership is a function of the
  key alone, so yesterday's train set is a subset relation, not a
  snapshot; new data lands in splits consistently.
- **Engine-portable** — the md5 path produces identical membership
  in any engine (differentially tested vs DuckDB); the xxhash64
  path is the cheap JVM-native variant for the 100 TB hot path.

Granularity is 16 bits (65536 buckets) — fractions snap to
1/65536, plenty for corpus work (document the snap, don't hide it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket-space granularity: first 4 hex chars of the digest
_BUCKETS = 16**4


def _threshold_hex(fraction: float) -> str:
    """Fraction → 4-hex-char exclusive upper bound. Comparison is
    LEXICOGRAPHIC, so fraction 1.0 returns 'g' — a single char above
    the hex alphabet that sorts after every 4-hex key ('10000' would
    NOT: strings compare char-wise and '1' < 'f')."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    t = round(fraction * _BUCKETS)
    return "g" if t == _BUCKETS else format(t, "04x")


def md5_sample_key(key: Column) -> Column:
    """Stable, engine-portable sample key: first 4 lowercase hex
    chars of md5(key-as-utf8). Fixed-length lowercase hex compares
    lexicographically == numerically, so no hex→int cast is needed
    (DuckDB has none)."""
    return F.substring(F.md5(F.encode(key.cast("string"), "UTF-8")), 1, 4)


def md5_sample_key_sql(key_sql: str) -> str:
    """DuckDB twin of :func:`md5_sample_key`."""
    return f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, 4)"


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Content-keyed sample: keep rows whose md5 bucket falls below
    ``fraction`` (snapped to 1/65536). Map-only — no shuffle."""
    return df.filter(md5_sample_key(F.col(key)) < F.lit(_threshold_hex(fraction)))


def split_column(key: Column, weights: dict[str, float]) -> Column:
    """Label each row with a split name by cumulative hash threshold
    (e.g. ``{"train": .8, "val": .1, "test": .1}``). Weights must sum
    to 1 (±1 bucket of rounding); every row gets exactly one label —
    splits are disjoint and exhaustive by construction."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    k = md5_sample_key(key)
    names = list(weights)
    expr = F.lit(names[-1])
    cum = 0.0
    # build CASE from the last boundary backwards
    bounds = []
    for name in names[:-1]:
        cum += weights[name]
        bounds.append((name, _threshold_hex(cum)))
    for name, bound in reversed(bounds):
        expr = F.when(k < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def split_column_sql(key_sql: str, weights: dict[str, float]) -> str:
    """DuckDB twin of :func:`split_column` (same thresholds from the
    same constants)."""
    k = md5_sample_key_sql(key_sql)
    names = list(weights)
    cum = 0.0
    case = "CASE"
    for name in names[:-1]:
        cum += weights[name]
        case += f" WHEN {k} < '{_threshold_hex(cum)}' THEN '{name}'"
    return case + f" ELSE '{names[-1]}' END"


def train_val_test_split(
    df: DataFrame, key: str, weights: dict[str, float] | None = None
) -> DataFrame:
    """Attach a ``split`` column (default 80/10/10)."""
    w = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_column(F.col(key), w))


def stratified_sample(
    df: DataFrame, strata: str, fractions: dict[str, float], key: str
) -> DataFrame:
    """Per-stratum content-keyed sampling (e.g. language-balanced
    corpus curation: ``{"en": 0.1, "de": 0.5, "fr": 1.0}``). Strata
    not listed are dropped — explicit beats surprising. Same map-only
    filter shape as :func:`deterministic_sample`; membership is
    reproducible per key regardless of partitioning, unlike
    ``df.sampleBy``. The hash input couples key AND stratum so a row
    migrating between strata re-rolls rather than carrying its old
    draw."""
    # F.concat (not concat_ws): null-propagating, matching SQL ||
    k = md5_sample_key(
        F.concat(F.col(strata), F.lit("\x1f"), F.col(key).cast("string"))
    )
    cond = F.lit(False)
    for name, frac in fractions.items():
        cond = cond | (
            (F.col(strata) == name) & (k < F.lit(_threshold_hex(frac)))
        )
    return df.filter(cond)


def stratified_sample_sql(
    strata_sql: str, fractions: dict[str, float], key_sql: str
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same thresholds,
    same hash input)."""
    k = f"substr(md5({strata_sql} || chr(31) || CAST({key_sql} AS VARCHAR)), 1, 4)"
    parts = [
        f"({strata_sql} = '{name}' AND {k} < '{_threshold_hex(frac)}')"
        for name, frac in fractions.items()
    ]
    return "(" + " OR ".join(parts) + ")"


# ---------------------------------------------------------------------------
# 100 TB hot path: xxhash64 (JVM-native, no hex strings).
# ---------------------------------------------------------------------------


def xxhash_bucket(key: Column, n_buckets: int = 10_000) -> Column:
    """Non-negative stable bucket from Spark's seeded xxhash64 —
    cheaper than md5 (no digest string); engine-specific, so use it
    in production and keep the md5 path for cross-engine checks."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets))


def xxhash_sample(df: DataFrame, key: str, fraction: float, n_buckets: int = 10_000) -> DataFrame:
    """Content-keyed sample on the xxhash64 path (fraction snaps to
    1/n_buckets)."""
    keep = int(round(fraction * n_buckets))
    return df.filter(xxhash_bucket(F.col(key), n_buckets) < F.lit(keep))


def resample_to_mixture(
    df: DataFrame,
    weights: DataFrame,
    strata: str = "source",
    key: str = "doc_id",
    weight_col: str = "sample_weight_t05",
    share_col: str = "token_share",
    n_buckets: int = 65536,
) -> DataFrame:
    """Materialize a target mixture (e.g. the output of
    ``source_mixture_weights``) as an actual single-epoch corpus:
    each stratum keeps the content-keyed fraction that moves its
    realized share onto the target, scaled so the most UP-weighted
    stratum keeps everything (downsample-only — no document
    repetition; over-weighting beyond that is an epoch/repetition
    decision for the training loop, not a corpus transform).

    keep_fraction_s = (w_s / p_s) / max_t (w_t / p_t), where w is the
    target weight and p the current share. Realized shares then equal
    the target up to per-document quantization. Map-only: the
    dimension-sized weights table broadcasts, membership is the same
    stratum-coupled content hash as :func:`stratified_sample` —
    reproducible on any partitioning, dynamic fractions straight from
    the weights DataFrame (no literal dict)."""
    ratio = (F.col(weight_col) / F.col(share_col)).alias("_r")
    w = weights.select(F.col(strata).alias("_s"), ratio)
    max_r = w.agg(F.max("_r").alias("_mr"))
    fracs = w.crossJoin(F.broadcast(max_r)).select(
        F.col("_s"), (F.col("_r") / F.col("_mr")).alias("_keep_frac")
    )
    joined = df.join(F.broadcast(fracs), df[strata] == F.col("_s"))
    bucket = F.pmod(
        F.xxhash64(F.concat(F.col(strata), F.lit("\x1f"), F.col(key).cast("string"))),
        F.lit(n_buckets),
    )
    return (
        joined.filter(
            bucket < F.round(F.col("_keep_frac") * n_buckets).cast("long")
        )
        .drop("_s", "_keep_frac")
    )
