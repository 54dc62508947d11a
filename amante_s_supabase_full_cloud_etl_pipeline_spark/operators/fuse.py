"""Fuse adjacent ``mapInPandas`` stages into ONE Python hop.

Guide §4.1: every Python stage pays the JVM → worker → JVM transpose
plus serialization, and a Python stage feeding ANOTHER Python stage
pays it twice back to back — measured ~60 ms of round-trip latency
per task per extra hop on this harness, plus a second worker per
task (the pool churns under that demand). Each corpus→kernel
pipeline in this engine is exactly that shape: a synthesis kernel
(iterator of pandas frames → iterator of pandas frames) feeding an
extraction kernel of the same signature. Function composition of the
two kernel BODIES inside one ``mapInPandas`` produces bit-identical
rows — the intermediate frames never cross the JVM boundary at all.

The public two-stage operators keep their signatures (arbitrary
DataFrames can still flow between them); the ``*_from_docs`` fused
variants in each module use this combinator for the common
seed-docs → corpus → extraction composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fused_pandas(source: DataFrame, kernels, schema) -> DataFrame:
    """``source.mapInPandas(k_n ∘ … ∘ k_1, schema)`` — run the given
    iterator→iterator pandas kernels (upstream first) inside a single
    Python worker pass."""
    kernels = tuple(kernels)

    def composed(batches):
        it = batches
        for k in kernels:
            it = k(it)
        return it

    return source.mapInPandas(composed, schema)
