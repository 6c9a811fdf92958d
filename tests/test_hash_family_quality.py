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


# --------------------------------------------------- Z-order interleave
def test_zorder_interleave_bijective_and_local(spark):
    """Structural audit of the Morton bit-interleave (round-10 verdict
    item: the two hash families the round-9 CI missed).

    * BIJECTIVITY: over the full 2^bits x 2^bits grid the interleaved
      value is a bijection onto [0, 4^bits) — any dropped/duplicated
      bit position collides grid cells and silently destroys the
      per-file clustering the layout exists for.
    * BIT OWNERSHIP: column j owns bit positions i*k + j (unit vectors
      map to single powers of two) — the round-robin scatter contract
      z_expr_spark_n documents.
    * LOCALITY: every ALIGNED 2^m x 2^m square is one CONTIGUOUS
      z-range of exactly 4^m values — the exact structural property
      that makes range predicates on either dimension prune files.
      (Not a statistical bar: correct Morton codes satisfy it
      exactly; any interleave defect breaks contiguity immediately.)
    * The DuckDB twin agrees bit-for-bit on the same grid.
    """
    import duckdb

    from spark_kafka_streaming_spark.operators.zorder import (
        z_expr_duck_n,
        z_expr_spark_n,
    )

    bits = 6  # 4096-cell grid: full enumeration stays instant
    side = 1 << bits
    grid = spark.sql(
        f"SELECT id DIV {side} AS a, id % {side} AS b "
        f"FROM range({side * side})"
    )
    z = grid.selectExpr(
        "a", "b", z_expr_spark_n(["a", "b"], bits) + " AS z"
    )
    rows = z.collect()
    zs = {r.z for r in rows}
    assert len(zs) == side * side  # injective
    assert min(zs) == 0 and max(zs) == side * side - 1  # onto the range
    # bit ownership: a -> even positions, b -> odd
    zmap = {(r.a, r.b): r.z for r in rows}
    for i in range(bits):
        assert zmap[(1 << i, 0)] == 1 << (2 * i)
        assert zmap[(0, 1 << i)] == 1 << (2 * i + 1)
    # aligned-square contiguity at m = 2 and m = 3
    for m in (2, 3):
        s = 1 << m
        for a0, b0 in ((0, 0), (s, 0), (2 * s, 3 * s), (side - s, side - s)):
            sq = [
                zmap[(a0 + da, b0 + db)]
                for da in range(s)
                for db in range(s)
            ]
            assert max(sq) - min(sq) == 4**m - 1, (m, a0, b0)
            assert len(set(sq)) == 4**m
    # DuckDB twin bit-for-bit on the same grid
    duck = duckdb.sql(
        f"SELECT (i // {side}) AS a, (i % {side}) AS b, "
        + z_expr_duck_n(["(i // %d)" % side, "(i %% %d)" % side], bits)
        + f" AS z FROM (SELECT unnest(generate_series(0, {side * side - 1})) AS i)"
    ).fetchall()
    for a, b, zv in duck:
        assert zmap[(a, b)] == zv


def test_zorder_interleave_bijective_3d():
    """3-D bijectivity (k·bits placement generalizes): full 2^4-side
    cube, pure python ints — no engine needed for the formula's
    integer semantics, which the 2-D test already pins cross-engine."""
    bits, k = 4, 3
    side = 1 << bits

    def z3(a, b, c):
        out = 0
        for i in range(bits):
            out += ((a >> i) & 1) << (i * k + 0)
            out += ((b >> i) & 1) << (i * k + 1)
            out += ((c >> i) & 1) << (i * k + 2)
        return out

    vals = {
        z3(a, b, c)
        for a in range(side)
        for b in range(side)
        for c in range(side)
    }
    assert len(vals) == side**3
    assert min(vals) == 0 and max(vals) == side**3 - 1


# ------------------------------------------- IMI super-ownership audit
def test_imi_super_ownership_partition_and_occupancy():
    """Structural audit of the two-level (IMI) quantizer's
    super-assignment (operators/kmeans.py::_lloyd_split):

    * PARTITION: every centroid is owned by exactly ONE super (the
      members arrays are disjoint and cover all k positions) and every
      ACTIVE super is non-empty — the property assign_clusters_imi's
      probe-descend correctness rests on.
    * EXACTNESS: each ownership is independently re-derived with pure
      python integer arithmetic (no float64 trick), confirming the
      2^53-exactness argument on this data, (dist, sid) tie-break
      included.
    * OCCUPANCY loudness bar: on a fixed-seed uniform corpus the max
      super occupancy stays within 20x of the k/sqrt(k) mean (the
      module-wide bar); a metric or tie-break defect concentrates
      ownership orders of magnitude beyond it.
    """
    from spark_kafka_streaming_spark.operators.kmeans import _lloyd_split

    rng = np.random.default_rng(7)
    k, d = 1024, 16
    cmat = rng.integers(-1000, 1000, size=(k, d)).astype("int64")
    cents = [
        (cid, cmat[cid].tolist(), int((cmat[cid] ** 2).sum()))
        for cid in range(k)
    ]
    cids, cm, cn, sup_pos, members = _lloyd_split(cents)
    n_super = int(np.floor(np.sqrt(k)))
    # partition: disjoint cover of all k row positions
    flat = np.concatenate(members)
    assert len(flat) == k
    assert len(np.unique(flat)) == k
    assert all(len(m) > 0 for m in members)
    assert list(sup_pos) == sorted(sup_pos)
    assert set(sup_pos).issubset(range(n_super))
    # exactness: integer re-derivation of each centroid's owner
    pos_of = {int(s): j for j, s in enumerate(sup_pos)}
    owner_of = np.empty(k, dtype="int64")
    for j, m in enumerate(members):
        owner_of[m] = sup_pos[j]
    supers = [[int(x) for x in cm[s]] for s in range(n_super)]
    for c in range(0, k, 17):  # sampled stride: 61 centroids
        row = [int(x) for x in cm[c]]
        best = min(
            (
                sum((a - b) ** 2 for a, b in zip(row, supers[s])),
                s,
            )
            for s in range(n_super)
        )
        assert owner_of[c] == best[1], c
    # occupancy loudness bar
    mean_occ = k / n_super
    assert max(len(m) for m in members) <= 20 * mean_occ
    # duplicate-vector tie: the lowest-sid twin wins, empty supers drop
    dup = [(0, [5] * d, 25 * d), (1, [5] * d, 25 * d), (2, [5] * d, 25 * d),
           (3, [900] * d, 810000 * d)]
    _, _, _, sp2, mem2 = _lloyd_split(dup)
    # n_super = 2 -> supers are cids 0 and 1; super 1 ties super 0 on
    # every centroid and loses every tie -> dropped as empty
    assert list(sp2) == [0]
    assert sorted(np.concatenate(mem2).tolist()) == [0, 1, 2, 3]
