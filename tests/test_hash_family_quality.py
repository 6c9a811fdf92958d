"""Structural-quality pins for the hash families the oracles CANNOT
catch defects in (the round-8 plane-family lesson: implementation-twin
oracles replay the same formula, so they verify divergence, never
geometry QUALITY).  Each audit is pure numpy against the exact
constants the engine inlines, with the same "within ~20x of the
uniform/theory expectation" loudness bar test_plane_uniformity.py
uses — a defect of the shifted-copy magnitude overshoots these bounds
by orders of magnitude, while run-to-run noise sits far inside them.

Families pinned here:

* MinHash permutation family (texthash.A/B — h_i(x) = (A_i x + B_i)
  mod P): band-key collision mass on unrelated sets, adjacent-hash
  argmin independence (the direct shifted-copy probe), and Jaccard
  unbiasedness at J = 0.5.  Measured healthy: 0 collisions / 2000
  sets, argmin agreement 0.024-0.037 vs 1/m = 0.025 expected, mean
  agreement 0.4994 at J = 0.5.
* Portable-hash stratification (mixing.mixture_keep_expr's
  md5-prefix-mod-P hash): chi-square-ish balance of the mod-1e6 strata
  and realized keep-rate vs the requested ppm.
* PQ codebook seeds (pq.pq_codebooks — K_CODES lowest-id subspace
  slices): no duplicate seed centroid within any subspace on the real
  corpora (duplicate seeds would alias two codebook cells and starve
  one, silently halving that subspace's resolution).
"""

from __future__ import annotations

import hashlib

import numpy as np

from spark_kafka_streaming_spark.functions.texthash import A, B, K, P

M_SETS = 2000
SET_SIZE = 40


def _signatures(rng, n_sets: int, m: int):
    """Per-set MinHash signatures + argmins over the EXACT engine
    family (A_i x + B_i) mod P; all intermediates < 2^60, exact in
    int64."""
    a = np.array(A, dtype=np.int64)
    b = np.array(B, dtype=np.int64)
    x = rng.integers(0, P, size=(n_sets, m), dtype=np.int64)
    h = (x[:, None, :] * a[None, :, None] + b[None, :, None]) % P
    return h.min(axis=2), h.argmin(axis=2)


def test_minhash_band_keys_no_spurious_collisions():
    """Unrelated random sets must essentially never share a band key
    (per-position value-collision prob ~ m^2/P ~ 1.6e-6, to the 4th
    power per band) — a correlated family would produce thousands, the
    way the linear plane family produced 60M candidate pairs."""
    sig, _ = _signatures(np.random.default_rng(42), M_SETS, SET_SIZE)
    rows, bands = 4, 8
    total = 0
    for band in range(bands):
        key = np.zeros(M_SETS, dtype=np.int64)
        for r in range(rows):
            key = key * 31 + sig[:, band * rows + r]
        _, cnt = np.unique(key, return_counts=True)
        total += int((cnt * (cnt - 1) // 2).sum())
    assert total <= 5, total


def test_minhash_argmin_independence():
    """P[argmin_i == argmin_j] for i != j must stay near 1/m (0.025):
    a shifted-copy family drives it toward 1.  Bar 4x expectation —
    measured max over all 496 pairs is 0.037 (1.5x)."""
    _, am = _signatures(np.random.default_rng(42), M_SETS, SET_SIZE)
    worst = max(
        float((am[:, i] == am[:, j]).mean())
        for i in range(K)
        for j in range(i + 1, K)
    )
    assert worst <= 4 / SET_SIZE, worst


def test_minhash_jaccard_unbiased():
    """Signature agreement estimates Jaccard without bias: planted
    J = 0.5 pairs (40 shared + 20 + 20) must average 0.5 within 0.02
    (~4.5 sigma of the 400-pair x 32-position estimator)."""
    rng = np.random.default_rng(7)
    a = np.array(A, dtype=np.int64)
    b = np.array(B, dtype=np.int64)
    agree = []
    for _ in range(400):
        shared = rng.integers(0, P, 40, dtype=np.int64)
        s1 = np.concatenate([shared, rng.integers(0, P, 20, dtype=np.int64)])
        s2 = np.concatenate([shared, rng.integers(0, P, 20, dtype=np.int64)])
        h1 = (s1[None, :] * a[:, None] + b[:, None]) % P
        h2 = (s2[None, :] * a[:, None] + b[:, None]) % P
        agree.append(float((h1.min(1) == h2.min(1)).mean()))
    mean = float(np.mean(agree))
    assert abs(mean - 0.5) < 0.02, mean


def _portable_hash(s: str) -> int:
    """Python twin of texthash.spark_str_hash / duck_str_hash: top 60
    bits of md5, mod P."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


def test_portable_hash_strata_balance():
    """The mixture/stratified-sample keep-hash pmod(h, 1e6) must fill
    percentile strata uniformly over sequential ids (the universal id
    shape): chi-square over 100 buckets within 6 sigma per bucket, and
    a 10% ppm rate realized within 1% absolute.  (P mod 1e6 != 0
    biases buckets by ~7e-4 relative — far inside the bar.)"""
    n = 200_000
    ppm = np.array(
        [_portable_hash(f"mix:{i}") % 1_000_000 for i in range(n)],
        dtype=np.int64,
    )
    buckets = np.bincount(ppm // 10_000, minlength=100)
    expect = n / 100
    sigma = (expect * (1 - 1 / 100)) ** 0.5
    assert buckets.min() >= expect - 6 * sigma, buckets.min()
    assert buckets.max() <= expect + 6 * sigma, buckets.max()
    keep = float((ppm < 100_000).mean())
    assert abs(keep - 0.10) < 0.01, keep


def test_pq_seed_centroids_distinct_per_subspace():
    """pq_codebooks seeds each subspace codebook with the K_CODES
    lowest-id vectors' slices; two identical slices would alias two
    cells.  Pin distinctness on the real corpora the catalog trains
    on."""
    import duckdb

    from spark_kafka_streaming_spark.functions.vectors import np_scaled
    from spark_kafka_streaming_spark.operators.pq import (
        K_CODES,
        M_SUBS,
        SUB_DIM,
    )

    con = duckdb.connect()
    for sf in ("0.01", "0.1"):
        rows = con.execute(
            "SELECT embedding FROM read_parquet("
            f"'/root/testdata/sf{sf}/embeddings.parquet') "
            f"ORDER BY vec_id LIMIT {K_CODES}"
        ).fetchall()
        q = np_scaled(np.array([r[0] for r in rows], dtype="float64"))
        for m in range(M_SUBS):
            sl = q[:, m * SUB_DIM : (m + 1) * SUB_DIM]
            assert len(np.unique(sl, axis=0)) == K_CODES, (sf, m)
