"""Streaming rolling z-score anomaly detection — the stateful twin
of :func:`..operators.timeseries.rolling_zscore`: per key, the state
store holds a ring buffer of the last ``window`` values and each
arriving row is scored against that buffer (self-excluded) before
being pushed. This is exactly the bounded frame the batch operator
reads with a window function, kept as explicit state across
micro-batches (checkpoint-restored across restarts).

Exact parity contract (pinned in tests/test_streaming_anomaly.py):
values are carried as integer CENTS (the 2-decimal business scale),
so the buffer's sum and sum-of-squares are exact integers — the same
quantities the batch operator accumulates in DECIMAL — and the final
z expression divides the identical IEEE doubles in the identical
order. When rows arrive in event-time order (the replay/backfill
case), streaming output == batch output bit-for-bit; under true
out-of-order arrival the buffer is arrival-ordered and the score is
the online approximation (documented divergence — a watermark-sorted
pre-stage recovers exactness at the cost of latency).

Scale shape: state per key is ``window`` longs — fixed memory at any
stream volume; keys shard across executors by the groupBy hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_zscore(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 50,
    threshold: float = 2.0,
) -> DataFrame:
    """(key, ts, value, zscore) for anomalous rows — GroupState ring
    buffer via ``applyInPandasWithState``. The kernel is a nested
    closure so it ships by value to the Python workers."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    if window < 2:
        raise ValueError("window must be >= 2")

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("zscore", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("cents", ArrayType(LongType()))])

    def update(key, batches, state):
        import decimal as _dec

        import pandas as pd

        def to_cents(v: float) -> int:
            # match Spark's CAST(double AS DECIMAL(18,2)): HALF_UP on
            # the double's exact decimal expansion
            return int(
                _dec.Decimal(v).quantize(_dec.Decimal("0.01"), _dec.ROUND_HALF_UP)
                * 100
            )

        buf: list[int] = list(state.get[0]) if state.exists else []
        out_ts, out_v, out_z = [], [], []
        # ONE sort over the whole micro-batch: the group's rows may
        # arrive as several shuffle-interleaved Arrow chunks, and a
        # per-chunk sort cannot restore order across them — the ring
        # buffer would be fed out of order (memory bound = one key's
        # share of one micro-batch, the same bound any per-key
        # stateful kernel has)
        chunks = list(batches)
        if chunks:
            ordered = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ts, v in zip(ordered["ts"], ordered["value"]):
                if len(buf) == window:
                    s_c = sum(buf)          # exact integer cents
                    q_e4 = sum(c * c for c in buf)  # exact 1e-4 units
                    s = s_c / 100.0         # == DECIMAL(18,2) sum -> double
                    q = q_e4 / 10000.0      # == DECIMAL(38,4) sum -> double
                    nd = float(window)
                    var = (q - s * s / nd) / (nd - 1.0)
                    if var > 0:
                        # HALF_UP on the double's exact expansion ==
                        # Spark F.round(..., 6), not Python's
                        # banker's round
                        z = float(
                            _dec.Decimal((v - s / nd) / var**0.5).quantize(
                                _dec.Decimal("0.000001"), _dec.ROUND_HALF_UP
                            )
                        )
                        if abs(z) > threshold:
                            out_ts.append(ts)
                            out_v.append(v)
                            out_z.append(z)
                    buf.pop(0)
                buf.append(to_cents(v))
        state.update((buf,))
        yield pd.DataFrame(
            {"key": key[0], "ts": out_ts, "value": out_v, "zscore": out_z}
        )

    return (
        events.selectExpr(
            f"{key_col} AS key",
            f"{ts_col} AS ts",
            f"{id_col} AS event_id",
            f"{value_col} AS value",
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
