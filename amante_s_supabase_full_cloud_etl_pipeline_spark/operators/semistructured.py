"""Semi-structured (JSON → VARIANT) processing — the modern Spark 4
path for schema-on-read event properties at 100 TB.

The reference's only semi-structured shape is the JSON record batch
it ships to the Supabase REST upsert (main.py:50 — dict rows); the
engine's `json_prop_extract` registry row covers the string-path
`get_json_object` form. This module upgrades the surface to
``VariantType`` (Spark 4): JSON parsed ONCE into a shredded binary
encoding, then typed path extraction — at scale this beats repeated
`get_json_object` calls, which re-parse the string per expression.

Operators:
- ``parse_props``: ``try_parse_json`` — malformed JSON yields a null
  variant (S4 per-row skip, the engine-wide corrupt-data contract),
  never a failed job; the strict form is one flag away.
- ``flatten_variant``: typed columns from path expressions in one
  map-only projection (``try_variant_get`` — type-mismatch rows null
  out per-path rather than killing the batch).
- ``schema_drift_report``: per-group ``schema_of_variant_agg`` — the
  merged observed schema per source/event-type, THE monitor for
  upstream producers changing their payloads (new fields widen the
  OBJECT<...>, type changes surface as widened unions/VARIANT).
- ``explode_variant_array``: one row per array element via the
  ``variant_explode`` TVF with typed element extraction.

Correctness: flattening is differential against DuckDB's JSON
extraction on identical inputs (tests/test_semistructured.py — same
compare harness the registry rows use); the drift report and explode
are fixture-anchored (DuckDB's json_structure output grammar differs
from Spark's schema strings, so those assert exact expected values
instead).

Scale: parse-once + extract-many is map-only (no shuffle); the drift
report is one hash aggregation; ``variant_explode`` is a generator —
Spark's equivalent of a lateral flatten.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_props(
    df: DataFrame,
    json_col: str,
    out_col: str = "props_v",
    strict: bool = False,
) -> DataFrame:
    """Parse a JSON string column into a VARIANT column. Default is
    permissive (malformed → null variant, S4); ``strict=True`` fails
    the job on the first malformed row (``parse_json``)."""
    parser = F.parse_json if strict else F.try_parse_json
    return df.withColumn(out_col, parser(F.col(json_col)))


def flatten_variant(
    df: DataFrame,
    var_col: str,
    fields: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Project typed columns out of a VARIANT: ``fields`` maps output
    column name → (JSON path, Spark type string), e.g.
    ``{"k": ("$.k", "bigint"), "tag": ("$.meta.tag", "string")}``.
    Per-path failures (missing key, type mismatch) null out that
    column for that row only. Output names must not collide with
    existing columns (a duplicate name would make every later
    reference AMBIGUOUS_REFERENCE at runtime — fail here instead)."""
    clash = set(fields) & set(df.columns)
    if clash:
        raise ValueError(
            f"flatten_variant: output field name(s) {sorted(clash)} already "
            "exist as columns; rename the outputs or drop the originals first"
        )
    return df.select(
        "*",
        *[
            F.try_variant_get(F.col(var_col), path, typ).alias(name)
            for name, (path, typ) in fields.items()
        ],
    )


def schema_drift_report(
    df: DataFrame,
    var_col: str,
    group_by: Sequence[str],
    json_col: str | None = None,
) -> DataFrame:
    """(group keys, merged_schema, n_rows, n_malformed) — the observed
    payload schema per group. A producer adding/retyping fields shows
    up as a changed ``merged_schema`` string for its group; compare
    across runs (or store via the table format's SCD2) to alarm.

    Pass the SOURCE ``json_col`` so n_malformed counts only rows whose
    JSON was present but unparseable — ``try_parse_json(NULL)`` is
    also a null variant, and a legitimately-absent payload must not
    alarm the malformed-producer monitor. Without ``json_col`` the
    metric counts all null variants (absent OR malformed)."""
    if json_col is not None:
        malformed = F.count_if(
            F.col(json_col).isNotNull() & F.col(var_col).isNull()
        )
    else:
        malformed = F.count_if(F.col(var_col).isNull())
    return (
        df.groupBy(*group_by)
        .agg(
            F.schema_of_variant_agg(F.col(var_col)).alias("merged_schema"),
            F.count(F.lit(1)).alias("n_rows"),
            malformed.alias("n_malformed"),
        )
        .orderBy(*group_by)
    )


def explode_variant_array(
    df: DataFrame,
    var_col: str,
    array_path: str,
    element_type: str,
    id_cols: Sequence[str],
    out_col: str = "element",
) -> DataFrame:
    """One row per element of the JSON array at ``array_path``:
    (id_cols..., pos, element[typed]). Rows whose path is missing or
    not an array contribute no output (S4)."""
    arr = F.try_variant_get(F.col(var_col), array_path, "variant")
    exploded = df.select(
        *id_cols, F.posexplode_outer(_variant_array(arr)).alias("pos", "_el")
    ).filter(F.col("_el").isNotNull())
    return exploded.select(
        *id_cols,
        "pos",
        F.try_variant_get(F.col("_el"), "$", element_type).alias(out_col),
    )


def _variant_array(arr: Column) -> Column:
    """VARIANT array → array<variant>, null on non-arrays (Spark 4
    supports this cast directly; try_cast keeps objects/scalars at the
    path as S4 nulls instead of failing the job)."""
    return arr.try_cast("array<variant>")
