"""Hyperplane-family uniformity pin (round-8 find): the original
linear coefficient family made plane p+1 a shifted copy of plane p,
so band keys carried far less entropy than their bit width — 60M
candidate pairs / 851-wide buckets at 200k vectors × 24-plane bands
where uniform keys predict ~10k / ~2 (the >58 GB sf100 spill).  This
pins the bucket statistics of the CURRENT family against theory on a
synthetic random-unit-vector corpus, so a future "cheaper" formula
cannot silently reintroduce the correlation.

Pure numpy — no Spark session; runs the exact `_plane_matrix`
coefficients the engine inlines.
"""

from __future__ import annotations

import numpy as np

from spark_kafka_streaming_spark.functions.vectors import np_scaled
from spark_kafka_streaming_spark.operators.similarity import (
    DIM,
    _plane_matrix,
)

N = 50_000
PLANES, BANDS = 24, 8


def _bucket_stats(v, planes, bands):
    pm = _plane_matrix(planes * bands)
    bits = (v @ pm.astype("float64") > 0).astype(np.int64)
    weights = 1 << np.arange(planes - 1, -1, -1, dtype=np.int64)
    tot_pairs = 0
    max_bucket = 0
    for b in range(bands):
        keys = bits[:, b * planes : (b + 1) * planes] @ weights
        _, cnt = np.unique(keys, return_counts=True)
        tot_pairs += int((cnt * (cnt - 1) // 2).sum())
        max_bucket = max(max_bucket, int(cnt.max()))
    return tot_pairs, max_bucket


def test_plane_family_bucket_uniformity():
    """Random unit vectors → random-pair collision mass within ~20× of
    the uniform-key expectation C(n,2)·bands·2^-planes and no
    mega-buckets.  The linear family failed this by 4 orders of
    magnitude (measured 60M pairs at 4× this n; scaled ≈ 3.8M at this
    n vs the ~600 uniform keys predict)."""
    rng = np.random.default_rng(8)
    m = rng.normal(0, 1, (N, DIM))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    v = np_scaled(m).astype("float64")
    pairs, max_bucket = _bucket_stats(v, PLANES, BANDS)
    expect = N * (N - 1) / 2 * BANDS * 2.0**-PLANES  # ≈ 596
    assert pairs <= 20 * expect, (pairs, expect)
    assert max_bucket <= 16, max_bucket


def test_plane_family_no_shifted_copies():
    """No two planes are (anti-)parallel in sign behavior: the
    fraction of probe vectors on which planes p and q agree in sign
    stays away from 0 and 1 for every pair — the direct test of the
    shifted-copy defect."""
    rng = np.random.default_rng(9)
    m = rng.normal(0, 1, (4096, DIM))
    v = np_scaled(m).astype("float64")
    pm = _plane_matrix(PLANES * BANDS)
    bits = (v @ pm.astype("float64") > 0).astype(np.float64)
    agree = (bits.T @ bits + (1 - bits).T @ (1 - bits)) / len(v)
    off = agree - np.eye(agree.shape[0])
    assert off.max() < 0.95, off.max()
    assert agree.min() > 0.05, agree.min()
