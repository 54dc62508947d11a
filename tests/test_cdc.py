"""Content-defined chunking: partition invariants, the
shift-robustness property CDC exists for (quantified survival after
edits), determinism, Spark kernel == driver chunker, and the
chunk-sharing views with hand-derived expectations."""

from __future__ import annotations

import random

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (
    cdc_chunks,
    chunk_dedup_stats,
    chunk_documents,
    shared_chunk_pairs,
)


def _rand(n, seed):
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(n))


def test_chunks_partition_exactly_within_bounds():
    data = _rand(300_000, 1)
    chunks = cdc_chunks(data)
    # contiguous exact cover
    pos = 0
    for c in chunks:
        assert c["offset"] == pos
        pos += c["length"]
    assert pos == len(data)
    # size bounds: every chunk but the last in [min, max]
    for c in chunks[:-1]:
        assert 2048 <= c["length"] <= 65536
    assert chunks[-1]["length"] <= 65536
    # average lands near the target (normalized chunking)
    avg = len(data) / len(chunks)
    assert 0.5 * 8192 < avg < 2.0 * 8192
    # determinism
    assert cdc_chunks(data) == chunks


def test_shift_robustness_vs_fixed_blocking():
    """THE content-defined property: a front edit shifts every byte,
    yet most chunk hashes survive — while fixed-size blocking loses
    essentially all of them."""
    data = _rand(400_000, 2)
    edited = _rand(137, 3) + data  # prepend 137 bytes
    h1 = {c["chunk_hash"] for c in cdc_chunks(data)}
    h2 = {c["chunk_hash"] for c in cdc_chunks(edited)}
    assert len(h1 & h2) / len(h1) > 0.9
    # the fixed-size strawman: 8 KiB blocks share almost nothing
    import hashlib

    fixed = lambda b: {  # noqa: E731
        hashlib.blake2b(b[i:i + 8192], digest_size=16).hexdigest()
        for i in range(0, len(b), 8192)
    }
    assert len(fixed(data) & fixed(edited)) <= 1
    # a MIDDLE edit perturbs only chunks near it
    mid = len(data) // 2
    edited2 = data[:mid] + b"EDIT!" + data[mid:]
    h3 = {c["chunk_hash"] for c in cdc_chunks(edited2)}
    assert len(h1 & h3) / len(h1) > 0.9


def test_edges_and_validation():
    assert cdc_chunks(b"") == []
    one = cdc_chunks(b"tiny")
    assert len(one) == 1 and one[0]["length"] == 4
    # data shorter than min_size is one (short) chunk
    assert len(cdc_chunks(_rand(1000, 4))) == 1
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(b"x", min_size=0)
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(b"x", min_size=100, avg_size=50, max_size=200)
    # identical content ⇒ identical hashes regardless of position:
    # the cut points re-synchronize inside the shared region (the
    # region must carry entropy — an all-constant run is CDC's
    # documented degenerate case: the gear never fires inside it and
    # boundaries fall back to max_size spacing)
    shared_region = _rand(70_000, 99)
    a = cdc_chunks(_rand(100_000, 5) + shared_region)
    b = cdc_chunks(_rand(50_000, 6) + shared_region)
    assert len(
        {c["chunk_hash"] for c in a} & {c["chunk_hash"] for c in b}
    ) >= 4


def test_spark_kernel_matches_driver_chunker(spark):
    texts = [
        (0, "".join(random.Random(10).choices("abcdefgh \n", k=3000))),
        (1, "".join(random.Random(11).choices("abcdefgh \n", k=500))),
        (2, None),
        (3, "short"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = chunk_documents(docs).collect()
    assert {r["doc_id"] for r in got} == {0, 1, 3}  # None skipped
    by_doc: dict = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in texts:
        if text is None:
            continue
        want = cdc_chunks(
            text.encode("utf-8"), min_size=64, avg_size=256,
            max_size=2048,
        )
        rows = by_doc[doc_id]
        assert [r["chunk_hash"] for r in rows] == [
            c["chunk_hash"] for c in want
        ]
        assert [r["offset"] for r in rows] == [c["offset"] for c in want]


def test_sharing_views_hand_derived(spark):
    """Three docs: A and B share a large common middle; C is
    unrelated. The pair view must rank (A,B) and the stats view must
    price the duplicated chunks."""
    rnd = random.Random(20)
    common = "".join(rnd.choices("abcdefgh \n", k=2000))
    docs = spark.createDataFrame(
        [
            (1, "".join(rnd.choices("xyz", k=300)) + common),
            (2, "".join(rnd.choices("qrs", k=300)) + common),
            (3, "".join(rnd.choices("nop \n", k=2500))),
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_chunks"]
        for r in shared_chunk_pairs(chunks).collect()
    }
    assert set(pairs) == {(1, 2)}
    # shared count == the hashes both docs actually carry (driver
    # recomputation, full independence from the Spark path)
    h = lambda t: {  # noqa: E731
        c["chunk_hash"]
        for c in cdc_chunks(t.encode(), 64, 256, 2048)
    }
    rows = {r["doc_id"]: r["text"]
            for r in docs.collect()}
    want_shared = len(h(rows[1]) & h(rows[2]))
    assert pairs[(1, 2)] == want_shared and want_shared >= 2
    stats = {r["chunk_hash"]: r for r in chunk_dedup_stats(chunks).collect()}
    shared_hashes = h(rows[1]) & h(rows[2])
    assert shared_hashes <= set(stats)
    for ch in shared_hashes:
        assert stats[ch]["n_docs"] == 2
        assert stats[ch]["duplicate_bytes"] == stats[ch]["chunk_bytes"]


def test_posting_cap_bounds_pair_explosion(spark):
    """A chunk shared by MANY docs (ubiquitous boilerplate) is
    DROPPED before any posting list builds: with the cap below the
    corpus's sharing degree nothing pairs at all, and raising the
    cap restores the pairs — quadratic explosion (and the unbounded
    agg buffer) can't happen."""
    boiler = "".join(random.Random(30).choices("abcdefg \n", k=1500))
    docs = spark.createDataFrame(
        [(i, f"doc {i} header " * 3 + boiler) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs)
    # every shared chunk is carried by ~all 40 docs > cap 8 → dropped
    assert shared_chunk_pairs(chunks, max_posting=8).count() == 0
    # cap above the sharing degree: the boilerplate pairs appear,
    # bounded by C(40,2) per surviving chunk
    pairs = shared_chunk_pairs(chunks, max_posting=64)
    assert pairs.count() > 0
    assert pairs.agg({"shared_chunks": "max"}).collect()[0][0] >= 1
    # null ids/text are S4-skipped, not a kernel crash (review catch)
    with_null = docs.unionByName(
        docs.sparkSession.createDataFrame(
            [(None, "some text"), (99, None)],
            "doc_id long, text string",
        )
    )
    got = chunk_documents(with_null)
    assert got.filter("doc_id = 99").count() == 0
    assert got.filter("doc_id is null").count() == 0
    assert got.select("doc_id").distinct().count() == 40


def test_vectorized_spans_equal_scalar():
    """The numpy prefix-doubling cut scan must be BIT-IDENTICAL to
    the per-byte reference loop — hypothesis over random bytes and
    size triples, plus fixed low-entropy/repetitive cases (where the
    gear sum's masked bits are least random) and boundary sizes
    around one steady window."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (  # noqa: E501
        _chunk_spans,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=20_000),
        mn=st.integers(8, 256),
        factor=st.integers(1, 8),
        cap=st.integers(1, 8),
    )
    def prop(data, mn, factor, cap):
        avg = mn * factor
        mx = avg * cap
        assert _chunk_spans(data, mn, avg, mx, use_numpy=False) == (
            _chunk_spans(data, mn, avg, mx, use_numpy=True)
        )

    prop()
    text = b"the quick brown fox jumps over the lazy dog. " * 3000
    for params in [(64, 256, 2048), (2048, 8192, 65536)]:
        assert _chunk_spans(text, *params, use_numpy=False) == (
            _chunk_spans(text, *params, use_numpy=True)
        )
    # the BLOCKWISE precompute (memory bound for giant blobs) must be
    # hit-identical across block boundaries — force tiny blocks so a
    # modest input crosses many, including mid-chunk boundaries
    import amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc as cdc_mod

    orig_block = cdc_mod._VECTOR_BLOCK
    cdc_mod._VECTOR_BLOCK = 1000
    try:
        for params in [(64, 256, 2048), (8, 32, 256)]:
            assert _chunk_spans(text[:50_000], *params, use_numpy=True) == (
                _chunk_spans(text[:50_000], *params, use_numpy=False)
            )
    finally:
        cdc_mod._VECTOR_BLOCK = orig_block
    for n in (0, 1, 63, 64, 65, 90, 91, 92, 200):
        blob = bytes(range(256))[:n] if n <= 256 else b""
        assert _chunk_spans(blob, 64, 64, 64, use_numpy=False) == (
            _chunk_spans(blob, 64, 64, 64, use_numpy=True)
        )


def test_hypothesis_cdc_invariants():
    """Property: for ANY bytes and ANY valid size triple, chunks
    cover the input exactly, respect the bounds, and are
    deterministic; and a shared suffix between two inputs yields
    shared chunk hashes once it spans several average sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=30_000),
        mn=st.integers(16, 128),
        factor=st.integers(2, 8),
    )
    def prop(data, mn, factor):
        avg = mn * factor
        mx = avg * 4
        chunks = cdc_chunks(data, mn, avg, mx)
        pos = 0
        for c in chunks:
            assert c["offset"] == pos
            pos += c["length"]
        assert pos == len(data)
        for c in chunks[:-1]:
            assert mn <= c["length"] <= mx
        if chunks:
            assert chunks[-1]["length"] <= mx
        assert cdc_chunks(data, mn, avg, mx) == chunks

    prop()
