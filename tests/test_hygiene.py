"""Text hygiene + compression-ratio signals: mojibake repair against
known artifacts, NFC/control/newline canonicalization, idempotence,
clean-text passthrough, and the information-density ordering the
compression ratio exists to provide."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.hygiene import (
    _fix_one,
    compression_signals,
    fixed_text,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fix_one_known_mojibake_and_normalization():
    # classic UTF-8-decoded-as-latin1 artifacts
    assert _fix_one("cafÃ©") == "café"
    assert _fix_one("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    assert _fix_one("itâ€™s here â€” now") == "it’s here — now"
    # NFC: combining acute collapses into one codepoint
    assert _fix_one("é") == "é"
    # control chars stripped, \n and \t kept, CRLF canonicalized
    assert _fix_one("a\x00b\x1fc\td\r\ne") == "abc\td\ne"
    # clean text passes through byte-identical
    clean = "Ordinary text, nothing to fix.\nSecond line."
    assert _fix_one(clean) == clean
    # genuine Portuguese 'Ã' alone (marker but no valid re-encode) survives
    assert "não" in _fix_one("não")


def test_fixed_text_dataframe_and_idempotence(spark):
    rows = [
        (1, "cafÃ© au lait"),
        (2, "already clean"),
        (3, "étude"),
        (4, None),
    ]
    out = {r["doc_id"]: (r["text"], r["changed"]) for r in fixed_text(_df(spark, rows)).collect()}
    assert out[1] == ("café au lait", True)
    assert out[2] == ("already clean", False)
    assert out[3] == ("étude", True)
    assert out[4] == (None, False)
    # idempotent: fixing fixed text changes nothing
    again = fixed_text(
        spark.createDataFrame(
            [(d, t) for d, (t, _) in out.items()], "doc_id long, text string"
        )
    )
    assert again.filter(F.col("changed")).count() == 0


def test_compression_ratio_orders_information_density(spark):
    repetitive = "spam ham " * 400
    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "meandering rivers carve unpredictable canyons through basalt. "
    ) * 20
    import hashlib

    noisy = "".join(hashlib.sha256(str(i).encode()).hexdigest() for i in range(50))
    rows = [(1, repetitive), (2, prose), (3, noisy), (4, "")]
    got = {r["doc_id"]: r for r in compression_signals(_df(spark, rows)).collect()}
    # ordering: template << prose << noise
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] < got[3]["compression_ratio"]
    assert got[1]["compression_ratio"] < 0.05
    assert got[3]["compression_ratio"] > 0.5
    # empty doc: defined, neutral
    assert got[4]["n_bytes"] == 0 and got[4]["compression_ratio"] == 1.0
    # exact bytes match a driver-side recomputation (determinism)
    for doc_id, text in rows[:3]:
        assert got[doc_id]["zlib_bytes"] == len(zlib.compress(text.encode(), 6))
        assert got[doc_id]["n_bytes"] == len(text.encode())
