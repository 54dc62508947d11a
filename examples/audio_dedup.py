"""Incremental audio near-dup detection — the streaming probe index
loop, end to end (round 10):

    python examples/audio_dedup.py [workdir]

Recordings arrive in micro-batches; each fold fingerprints ONLY the
new blobs (RIFF decode → framed rFFT → band-vs-mean sign bits →
multi-probe keys, one Arrow kernel) and pairs them against the batch
and the accumulated store. The loop shows the module's two-tier
contract live:

1. the EMITTED stream never misses: a duplicate whose original
   arrived three batches earlier is discovered the moment its copy
   folds (the store join);
2. the EXACT view is read-time: shared silence that every recording
   carries manufactures early candidate pairs, but once enough
   recordings fold, its probes cross the ubiquity cap and
   ``stored_audio_pairs`` — the batch operator over the store —
   drops them, while the genuine volume-scaled/noisy duplicates
   stay.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (
    audio_near_dup_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    encode_wav_pcm16,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.audio_index import (
    fold_audio_index,
    stored_audio_pairs,
)

RATE = 16_000
CAP = 5


def _voice(seed: int, seconds: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(RATE * seconds)) / RATE
    x = np.zeros_like(t)
    for _ in range(6):
        f0 = rng.uniform(320, 2800)
        drift = rng.uniform(-80, 80)
        x += rng.uniform(0.05, 0.2) * np.sin(
            2 * np.pi * (f0 + drift * t) * t + rng.uniform(0, 6)
        )
    return (x / np.max(np.abs(x)) * 0.7).astype(np.float64)


def main(workdir: str) -> None:
    spark = get_spark("audio-dedup-example")
    # 8 recordings, ALL opening with the same station ident (shared
    # silence+tone — the audio boilerplate); doc 5 is doc 0 re-
    # uploaded at 60% volume with light noise, arriving 3 batches
    # later
    rng = np.random.default_rng(1)
    ident = np.concatenate([
        np.zeros(RATE // 4),
        0.3 * np.sin(2 * np.pi * 440 * np.arange(RATE // 4) / RATE),
    ])
    waves = [_voice(100 + d) for d in range(8)]
    waves[5] = 0.6 * waves[0] + 0.02 * rng.standard_normal(waves[0].size)
    rows = [
        (d, bytearray(encode_wav_pcm16(
            (np.concatenate([ident, w]) * 20_000).astype(np.int16), RATE
        )))
        for d, w in enumerate(waves)
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    index = ParquetTable(spark, os.path.join(workdir, "audio_probes"))

    # ── recordings arrive two per batch ───────────────────────────
    for i in range(4):
        batch = media.filter(
            (media.doc_id >= 2 * i) & (media.doc_id < 2 * i + 2)
        )
        found = {
            (r["doc_a"], r["doc_b"]): r["shared_probes"]
            for r in fold_audio_index(
                index, batch, batch_id=i, max_posting=CAP
            ).collect()
        }
        note = ""
        if i == 2 and (0, 5) in found:
            note = " ← the re-upload of doc 0, found via the STORE"
        print(f"batch {i}: docs {2*i},{2*i+1} → "
              f"{len(found)} candidate pair(s) {sorted(found)}{note}")
        if i == 2:
            assert (0, 5) in found  # cross-batch discovery
    # early batches emitted ident-driven candidates (frequency was
    # still under the cap) — the documented discovery semantics

    # ── the exact read-time view: boilerplate demoted, dup kept ──
    exact = {
        (r["doc_a"], r["doc_b"]): r["shared_probes"]
        for r in stored_audio_pairs(index, max_posting=CAP).collect()
    }
    print(f"exact view:  {sorted(exact)} (station ident crossed the "
          f"cap of {CAP} — its pairs are gone; the real dup stays)")
    assert (0, 5) in exact
    assert all(k == (0, 5) for k in exact)

    # ── and it equals the batch operator over everything ──────────
    want = {
        (r["doc_a"], r["doc_b"]): r["shared_probes"]
        for r in audio_near_dup_pairs(media, max_posting=CAP).collect()
    }
    assert exact == want
    print(f"streamed == batch: {len(exact)} pair(s), identical — "
          f"doc 5 shares {exact[(0, 5)]} probe keys with doc 0")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="audio_dedup_"
    ))
