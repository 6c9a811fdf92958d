"""Round-5 operator tests: WAV codec, span-level substring dedup,
k-NN label propagation, MIPS (incl. the norm-augmentation reduction).
"""

from __future__ import annotations

import numpy as np
import pytest


# ------------------------------------------------------------ WAV codec


def test_wav_codec_roundtrip_with_chunk_walk():
    """decode_wav must walk chunks (the encoder plants a LIST chunk
    between fmt and data, so assuming data-at-44 breaks) and honor the
    odd-size pad byte."""
    from spark_kafka_streaming_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = (((7 * 31 + np.arange(32) * 17) % 65536) - 32768).astype("<i2")
    payload = encode_wav(s, 8000)
    assert payload.index(b"LIST") < payload.index(b"data")
    rate, out = decode_wav(payload)
    assert rate == 8000 and (out == s).all()

    odd = encode_wav(s[:31], 44100)  # 62-byte data chunk → pad byte
    rate2, out2 = decode_wav(odd)
    assert rate2 == 44100 and len(out2) == 31 and (out2 == s[:31]).all()


def test_wav_codec_rejects_unsupported():
    from spark_kafka_streaming_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # stereo: patch channel count in the fmt chunk
    payload = bytearray(encode_wav(np.zeros(4, dtype="<i2")))
    fmt_at = payload.index(b"fmt ") + 8
    payload[fmt_at + 2 : fmt_at + 4] = (2).to_bytes(2, "little")
    with pytest.raises(ValueError, match="2ch"):
        decode_wav(bytes(payload))


def test_audio_features_dlq_nulls_on_corrupt_payload(spark):
    """Undecodable payloads yield NULL stats (the DLQ split contract),
    decodable ones real values — in the same Arrow batch."""
    from spark_kafka_streaming_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )

    good = encode_wav(np.array([100, -100, 200, -200], dtype="<i2"), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not audio at all"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    assert rows[1].n_samples == 4 and rows[1].sample_rate == 8000
    assert rows[1].peak == 200 and rows[1].mean_amp == 0.0
    assert rows[2].n_samples is None and rows[2].rms is None


# ----------------------------------------------- substring span dedup


def test_substring_spans_cross_doc_and_internal(spark):
    """Doc 2 repeats doc 1's 5-token span → canonical stays in doc 1
    (global min (doc,pos)), doc 2's occurrence is removable.  Doc 3
    repeats a span internally → second occurrence removable.  Doc 4
    shares nothing; doc 5 is shorter than w (zero windows)."""
    from spark_kafka_streaming_spark.operators.dedup import (
        substring_span_stats,
    )

    span = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, span + " one two three"),
            (2, "x y " + span),
            (3, span + " " + span),
            (4, "p q r s t u v w"),
            (5, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_span_stats(docs, w=5).collect()}
    assert out[1].n_dup_windows == 0 or out[1].n_dup_tokens >= 0
    # doc 1 holds the canonical occurrence of the shared span: with
    # docs 2 and 3 also containing it, doc 1's own window at pos 1 is
    # canonical → not removable.
    assert out[1].n_dup_windows == 0
    assert out[2].n_dup_windows == 1 and out[2].n_dup_tokens == 5
    # doc 3: "span span" = 10 tokens www. windows at pos 1..6; pos 1
    # duplicates doc 1's canonical → removable; pos 6 (the second copy
    # of the span) also removable; wrap-around windows (pos 2..5) are
    # unique. Coverage = positions 1..5 ∪ 6..10 = 10 tokens.
    assert out[3].n_dup_windows == 2 and out[3].n_dup_tokens == 10
    assert out[4].n_dup_windows == 0 and out[4].n_dup_tokens == 0
    assert out[5].n_windows == 0 and out[5].dup_frac == 0.0
    assert out[2].dup_frac == pytest.approx(5 / 7, abs=1e-6)


def test_substring_spans_overlapping_spans_merge(spark):
    """Two removable windows that overlap must merge by position-set
    union, not double-count tokens."""
    from spark_kafka_streaming_spark.operators.dedup import (
        substring_span_stats,
    )

    six = "a1 a2 a3 a4 a5 a6"  # 6 tokens → two 5-windows (pos 1, 2)
    docs = spark.createDataFrame(
        [(1, six), (2, six)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in substring_span_stats(docs, w=5).collect()}
    # doc 2's windows at pos 1 and 2 are both removable; they overlap
    # in positions 2..5 → covered tokens = 6, not 10.
    assert out[2].n_dup_windows == 2 and out[2].n_dup_tokens == 6
    assert out[1].n_dup_windows == 0


# ------------------------------------------------------- kNN classify


def test_knn_vote_majority_and_tiebreak(spark):
    """2-2-1 vote split with k=5: tie between labels 7 and 3 breaks to
    the smaller label."""
    from spark_kafka_streaming_spark.operators.similarity import knn_classify

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 6

    # query at origin direction (1,0); neighbors ranked by cosine.
    corpus = [
        (10, vec(1.0, 0.01), 7),
        (11, vec(1.0, 0.02), 3),
        (12, vec(1.0, 0.03), 7),
        (13, vec(1.0, 0.04), 3),
        (14, vec(1.0, 0.05), 1),
        (15, vec(-1.0, 0.0), 9),  # rank 6 — outside k, must not vote
    ]
    q = [(0, vec(1.0, 0.0), -1)]
    schema = "vec_id long, embedding array<float>, label int"
    out = knn_classify(
        spark.createDataFrame(q, schema),
        spark.createDataFrame(corpus, schema),
        k=5,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.predicted_label == 3 and r.n_votes == 2


# ------------------------------------------------------------- MIPS


def test_mips_matches_numpy_exact(spark, sf_dir):
    from spark_kafka_streaming_spark.operators.similarity import mips_topk
    from spark_kafka_streaming_spark.functions.vectors import np_scaled
    from spark_kafka_streaming_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np_scaled([list(r.embedding) for r in rows])
    got = mips_topk(emb.filter("vec_id < 3"), emb, k=3).collect()
    for qid in range(3):
        qv = m[ids == qid][0]
        dots = m @ qv
        order = sorted(
            [(int(i), int(d)) for i, d in zip(ids, dots) if i != qid],
            key=lambda t: (-t[1], t[0]),
        )
        expect = [i for i, _ in order[:3]]
        mine = [r.neighbor_id for r in got if r.query_id == qid]
        assert mine == expect


def test_mips_norm_augmentation_preserves_order():
    """The Bachrach 2014 reduction: cosine ranking in the augmented
    space equals inner-product ranking in the original space — the
    property that lets the LSH/IVF cosine tiers index MIPS."""
    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(50, 8))
    queries = rng.normal(size=(5, 8))
    big_m = float(np.linalg.norm(corpus, axis=1).max())
    aug_c = np.hstack(
        [
            corpus,
            np.sqrt(
                np.maximum(big_m**2 - (corpus**2).sum(axis=1), 0.0)
            ).reshape(-1, 1),
        ]
    )
    aug_q = np.hstack([queries, np.zeros((5, 1))])
    for qi in range(5):
        dots = corpus @ queries[qi]
        cos = (aug_c @ aug_q[qi]) / (
            np.linalg.norm(aug_c, axis=1) * np.linalg.norm(aug_q[qi])
        )
        assert (np.argsort(-dots) == np.argsort(-cos)).all()
