"""Query + oracle registry.

Every operator the engine claims (SURVEY.md §2) registers here:
a named PySpark query ``(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, a matching ANSI-SQL string the DuckDB oracle runs on
the same parquet tables. ``__spark_entry__.py`` exposes these to the
driver's differential harness.

Column-name contract: the driver sorts columns by name before value
hashing, so each Spark query aliases every computed column to exactly
the name used in its oracle SQL.

Float-determinism contract: money-style aggregates accumulate in
DECIMAL(18,2) (exact, order-independent) and cast the final value
back to DOUBLE, so Spark's parallel partial aggregation and DuckDB's
serial sum produce bit-identical results at any scale/partitioning.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: committed golden tables (tests/golden/generate.py regenerates)
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
#: the scale factor the driver's correctness gate runs at — goldens
#: are generated against this input
DRIVER_SF = "/root/testdata/sf0.01"


def golden_oracle(name: str) -> str:
    """Oracle SQL for a golden-pinned query: DuckDB reads the
    committed expected table. Used for deterministic kernels DuckDB
    cannot recompute (xxhash64 MinHash/SimHash, k-means IVF lists,
    HLL sketches, image decode); valid only at DRIVER_SF inputs."""
    return f"SELECT * FROM read_parquet('{GOLDEN_DIR}/{name}.parquet')"

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
#: queries whose oracle reads a committed golden table generated at a
#: specific scale factor (deterministic kernels DuckDB cannot express,
#: e.g. xxhash64 MinHash signatures, image decode). The driver checks
#: at sf0.01 — exactly where the goldens are generated
#: (tests/golden/generate.py regenerates them).
GOLDEN_SF: dict[str, str] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    golden_sf: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its oracle SQL.
    ``golden_sf`` marks an oracle as a golden-table pin valid only at
    that scale factor's input.

    The registered callable releases the PREVIOUS query's tracked
    caches on entry (see operators.cache): by the time the driver asks
    for the next query, the prior one's action has completed, so a
    session running the whole suite never accumulates cached blocks.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .operators.cache import release_tracked

            release_tracked()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        if golden_sf is not None:
            GOLDEN_SF[name] = golden_sf
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are side-effecting registrations; keep inside the
    # function so callers control when registration happens.
    from .plans import analytics_queries  # noqa: F401
    from .plans import dashboard  # noqa: F401
    from .operators import curation_queries  # noqa: F401
    from .operators import dedup_queries  # noqa: F401
    from .operators import multimodal_queries  # noqa: F401
    from .operators import similarity_queries  # noqa: F401
    from .operators import text_queries  # noqa: F401
    from .plans import elt_queries  # noqa: F401
    from .plans import events_queries  # noqa: F401
    from .plans import parity_ops  # noqa: F401
    from .plans import pos_dashboard  # noqa: F401
    from .plans import pos_kernel_query  # noqa: F401
    from .plans import setops_queries  # noqa: F401
    from .plans import timeseries_queries  # noqa: F401
