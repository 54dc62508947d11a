"""Count-Min sketch over a column — point-frequency estimates for ANY
key in fixed memory, completing the engine's mergeable-sketch family
(HLL distinct counts, Misra-Gries heavy hitters, Greenwald-Khanna
percentiles; CM adds per-key counts).

Guarantee (Cormode & Muthukrishnan 2005): with ``depth`` rows and
``width`` buckets, for every key

    true ≤ estimate ≤ true + (e / width) · n    w.p. ≥ 1 − e^-depth

(one-sided: hash collisions only ever ADD). CM is EXACTLY mergeable —
cell-wise sum — so unlike Misra-Gries the sketch itself is
bit-identical under any partitioning: each partition builds a local
d×w array (mapInPandas, fixed memory), and the tiny per-partition
sketches (d·w longs, ~64 KB at 4×2048) sum on the driver.

Hash family: row i hashes ``md5(i || key)`` — deterministic across
runs/engines/partitionings, independent-enough per row, and string-
keyed so any column type works through a canonical string cast
(documented: ``1`` the int and ``"1"`` the string collide, same as
every string-keyed sketch here)."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

_SKETCH_SCHEMA = StructType([StructField("cells", ArrayType(LongType()))])


def _bucket(i: int, key: str, width: int) -> int:
    h = hashlib.md5(f"{i}\x1f{key}".encode()).digest()
    return int.from_bytes(h[:8], "big") % width


@dataclass(frozen=True)
class CountMin:
    depth: int
    width: int
    n: int  # total counted (non-null) rows
    cells: tuple  # depth*width longs, row-major

    def estimate(self, key) -> int:
        """Point estimate: min over rows of the key's cell."""
        k = str(key)
        return min(
            self.cells[i * self.width + _bucket(i, k, self.width)]
            for i in range(self.depth)
        )

    def error_bound(self) -> int:
        """Additive bound ε·n with ε = e/width (the classic setting)."""
        import math

        return int(math.e / self.width * self.n) + 1

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("sketch shapes differ")
        return CountMin(
            self.depth,
            self.width,
            self.n + other.n,
            tuple(a + b for a, b in zip(self.cells, other.cells)),
        )


def count_min_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 2048
) -> CountMin:
    """Build the sketch with one pass: per-partition d×w arrays
    (fixed memory however large the partition), cell-wise summed.
    Nulls are ignored (matching COUNT semantics)."""
    d, w = int(depth), int(width)

    def partial(batches):
        import numpy as np
        import pandas as pd

        cells = np.zeros(d * w, dtype=np.int64)
        seen = False
        for batch in batches:
            for v in batch["_v"]:
                if v is None:
                    continue
                seen = True
                for i in range(d):
                    cells[i * w + _bucket(i, v, w)] += 1
        if seen:
            yield pd.DataFrame({"cells": [cells.tolist()]})

    # second-level reduce (r12 advice): the per-partition summaries
    # are cell-wise summed IN SPARK (posexplode → hash-agg with
    # map-side combine), so the driver collects exactly d·w cell
    # totals however many partitions the scan had — O(d×w) driver
    # work in corpus AND cluster size, matching the repo's
    # "driver work is O(1) in corpus size" discipline.
    merged = (
        df.select(F.col(col).cast("string").alias("_v"))
        .mapInPandas(partial, _SKETCH_SCHEMA)
        .select(F.posexplode("cells").alias("_j", "_c"))
        .groupBy("_j")
        .agg(F.sum("_c").alias("_c"))
        .collect()
    )
    total = [0] * (d * w)
    for r in merged:
        total[r["_j"]] = r["_c"]
    # n = every counted increment / depth (each row increments d cells)
    n = sum(total) // d if d else 0
    return CountMin(d, w, n, tuple(total))
