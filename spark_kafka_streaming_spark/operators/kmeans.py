"""Fixed-iteration Lloyd k-means over integer-scaled embeddings.

The reference engine has no clustering operator; this is part of the
training-data-pipeline surface (corpus bucketing, SemDeDup's cluster
stage, IVF coarse quantizers are all k-means assignments).  The design
is the standard distributed Lloyd split:

* **assign** is map-only: the k centroids are compile-time array
  literals broadcast inside the plan, each row computes k exact int64
  squared-L2 distances and takes the (dist, cid)-lexicographic argmin.
  No shuffle, no UDF — whole-stage codegen end to end.
* **update** is one posexplode + groupBy(cluster, pos) integer-sum —
  map-side combinable, the shuffle carries one row per
  (cluster × dim × task), never per vector (same shape as
  :func:`.vector_agg.group_centroids`); from ``ARROW_ASSIGN_MIN_K``
  the same sums reduce through per-task numpy partials
  (:func:`centroid_partial_sums`) so the n·d exploded rows never
  materialize — bit-identical totals (integer addition commutes).
* at corpus-scaled k (``IMI_ASSIGN_MIN_K``) assignment switches to the
  TWO-LEVEL search (:func:`assign_clusters_imi`): ⌊√k⌋ supers own
  their nearest centroids, a vector scores the supers and argmins only
  its probed supers' members — n·O(√k) dots instead of the n·k =
  n²/400 full search that made SemDeDup's Lloyd pass the round-7
  scale-killer (427 s at 2M×5000; the ``ivf_topk_imi`` build move
  applied to Lloyd).
* the k×d centroid table syncs through the driver between iterations —
  the same mini-driver reduction every distributed k-means performs
  (Spark MLlib's KMeans does exactly this per step).

Cross-engine exactness: components are ``round(x · 1e7)`` int64s
(:mod:`..functions.vectors`), so distances are exact integers
(bounded by 4·d·(0.53·SCALE)² ≈ 7.1e15 < 2^53, so even the oracle's
double-typed arithmetic is exact), and the centroid update
``round(sum / count)`` divides a < 2^53 integer sum by a count —
identical IEEE operands → identical quotient in Spark, DuckDB, and the
driver.  Ties in the argmin break on centroid id.  Empty clusters drop
out (both engines rebuild the centroid set from surviving groups).

At 100 TB per-dimension cluster sums stay exact while the per-cluster
row count is < 2^53 / (0.53·SCALE) ≈ 1.7e9; beyond that, pre-aggregate
per partition and widen to DECIMAL — noted here, not needed at any
tested scale.

Sibling: :func:`..operators.similarity.kmeans_refine` is the
*driver-free* Lloyd variant used inside :func:`.similarity.ivf_topk`
(cosine assignment via broadcast-join + window, centroids stay a
DataFrame).  This module's literal-centroid form trades one k×d driver
sync per step for a join-free, window-free assignment — the right
shape when the assignment feeds further map-side work (SemDeDup) or
when k·d is tiny next to the corpus; the join form is right when the
centroid table must remain lineage-tracked plan state.  Both update
rules share the exact same ``round(sum/count)`` quantization, so the
trajectories are engine-reproducible either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.caching import track_persist
from .skew import bounded_self_pairs


def _lit_vec(vals: list[int]) -> str:
    return "array(" + ", ".join(f"{v}L" for v in vals) + ")"


def _dist_expr(cn: int, cvec: list[int]) -> str:
    """Exact squared L2 distance |x−c|² = n_x + n_c − 2·x·c (int64)."""
    return f"(n + {cn}L - 2 * {V.spark_dot('v', _lit_vec(cvec))})"


def scaled_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, v: array<bigint> scaled components, n: bigint self-dot)."""
    return df.select(
        F.col(id_col),
        F.expr(V.spark_scaled(vec_col)).alias("v"),
    ).withColumn("n", F.expr(V.spark_dot("v", "v")))


def assign_clusters(sv: DataFrame, cents: list[tuple[int, list[int], int]]) -> DataFrame:
    """Map-only nearest-centroid assignment.

    ``cents``: [(cid, scaled components, self-dot)].  Adds ``cluster``
    and ``dist2`` (exact int64 squared L2 in scaled units).  Argmin via
    array_min over (dist, cid) structs — lexicographic, so ties break
    on the lower centroid id, matching the oracle's ORDER BY dist, cid.
    """
    best: Column = F.array_min(
        F.array(
            *[
                F.struct(
                    F.expr(_dist_expr(cn, cv)).alias("d"),
                    F.lit(cid).cast("int").alias("cid"),
                )
                for cid, cv, cn in cents
            ]
        )
    )
    return sv.withColumn("_b", best).withColumn(
        "cluster", F.col("_b.cid")
    ).withColumn("dist2", F.col("_b.d")).drop("_b")


def _quantize_centroids(rows) -> list[tuple[int, list[int], int]]:
    """Shared tail of both update forms: (cluster, pos, s, cnt) rows →
    the engines' common ``round(sum / count)`` quantization.  round()
    here must match Spark/DuckDB double round (half away from zero on
    an exact < 2^53 quotient)."""
    import math

    acc: dict[int, dict[int, int]] = {}
    for r in rows:
        # half-away-from-zero on the exact double quotient (|s| < 2^53),
        # the scalar form of vectors.np_scaled — matches both engines'
        # round(CAST(s AS DOUBLE) / cnt).
        q = r["s"] / r["cnt"]
        if q >= 0:
            f = math.floor(q)
            comp = int(f + (1 if q - f >= 0.5 else 0))
        else:
            c = math.ceil(q)
            comp = int(c - (1 if c - q >= 0.5 else 0))
        acc.setdefault(r["cluster"], {})[r["pos"]] = comp
    cents = []
    for cid in sorted(acc):
        vec = [acc[cid][p] for p in range(len(acc[cid]))]
        cents.append((cid, vec, sum(c * c for c in vec)))
    return cents


def _update_centroids(assigned: DataFrame) -> list[tuple[int, list[int], int]]:
    """One Lloyd update: exact per-(cluster, pos) integer sums, then the
    engines' shared ``round(sum / count)`` quantization, driver-side.

    The collect is k×d rows (512 for k=8, d=64) — the centroid table,
    not data.  This posexplode form is the oracle-replayed shape (the
    DuckDB CTE runs the same unnest + GROUP BY); at corpus-scaled k the
    n·d exploded rows pumped through the hash aggregate become the
    cost, and :func:`_update_centroids_partials` computes the SAME
    integer sums from per-task numpy partials instead (bit-identical —
    integer addition is order-free)."""
    rows = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "c"))
        .groupBy("cluster", "pos")
        .agg(F.sum("c").alias("s"), F.count("*").alias("cnt"))
        .collect()
    )
    return _quantize_centroids(rows)


def centroid_partial_sums(
    assigned: DataFrame,
    cluster_col: str = "cluster",
    vec_col: str = "v",
    cluster_type: str = "int",
) -> DataFrame:
    """Per-task partial centroid sums as one numpy pass per Arrow
    batch: (cluster, pos, s, cnt) with ≤ k·d rows PER TASK — the
    shuffle carries O(tasks·k·d) rows instead of materializing n·d
    posexplode rows through the hash aggregate (128M at sf100; the
    fourth-decade Lloyd-update wall).  Integer sums are exact and
    order-free, so downstream totals are bit-identical to the
    posexplode form (pinned in tests/test_round8_kmeans.py)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        sums: dict = {}
        cnts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype="int64")
            cl = pdf[cluster_col].to_numpy()
            for c in np.unique(cl):
                m = cl == c
                part = vm[m].sum(axis=0)
                c = int(c)
                if c in sums:
                    sums[c] += part
                    cnts[c] += int(m.sum())
                else:
                    sums[c] = part
                    cnts[c] = int(m.sum())
        if not sums:
            return
        cs: list[int] = []
        ps: list[int] = []
        ss: list[int] = []
        ns: list[int] = []
        for c, vec in sums.items():
            d = len(vec)
            cs.extend([c] * d)
            ps.extend(range(d))
            ss.extend(int(x) for x in vec)
            ns.extend([cnts[c]] * d)
        yield pd.DataFrame(
            {cluster_col: cs, "pos": ps, "s": ss, "cnt": ns}
        )

    return assigned.select(cluster_col, vec_col).mapInPandas(
        run, f"{cluster_col} {cluster_type}, pos int, s bigint, cnt bigint"
    )


def _update_centroids_partials(
    assigned: DataFrame,
) -> list[tuple[int, list[int], int]]:
    """Corpus-scaled-k twin of :func:`_update_centroids`: per-task
    numpy partial sums → one O(tasks·k·d)-row shuffle → the same
    quantization.  Bit-identical by construction (exact integer sums
    commute)."""
    rows = (
        centroid_partial_sums(assigned)
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
        .collect()
    )
    return _quantize_centroids(rows)


def initial_centroids(sv: DataFrame, k: int, id_col: str = "vec_id") -> list[tuple[int, list[int], int]]:
    """Deterministic seed: the k lowest-id vectors, cid = 0..k−1 in id
    order (k rows to the driver — the centroid table, not data)."""
    rows = sv.orderBy(id_col).limit(k).collect()
    return [(i, list(r["v"]), int(r["n"])) for i, r in enumerate(rows)]


#: Largest k assigned via the compile-time literal-centroid expression.
#: Beyond it the argmin expression is k·d array literals in one
#: projection — past whole-stage codegen's method-size comfort zone —
#: so assignment switches to the broadcast-join form (bit-identical
#: trajectory; pinned in tests/test_llm7.py).
LITERAL_ASSIGN_MAX_K = 16


def assign_clusters_join(
    sv: DataFrame,
    cents: list[tuple[int, list[int], int]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment via broadcast join — the large-k
    twin of :func:`assign_clusters`.

    The k×d centroid table becomes a broadcast DataFrame instead of a
    compile-time literal: each vector meets all k centroids in a
    map-side broadcast nested loop, only (id, dist, cid) leaves the
    join (no vector payload), and a groupBy(id) min(struct(d, cid))
    reduces to the same lexicographic argmin the literal form computes
    — exact int64 distances both ways, so the two forms produce
    bit-identical assignments.  One extra shuffle of k·N slim rows plus
    an id-keyed join back to ``sv`` is the price; amortized it is far
    cheaper than a k·d-literal expression the JIT refuses to compile.
    """
    spark = sv.sparkSession
    cdf = spark.createDataFrame(
        [(cid, cv, cn) for cid, cv, cn in cents],
        "cid int, cv array<bigint>, cn bigint",
    )
    d = F.expr(f"(n + cn - 2 * {V.spark_dot('v', 'cv')})")
    best = (
        sv.select(id_col, "v", "n")
        .crossJoin(F.broadcast(cdf))
        .select(
            id_col,
            F.struct(d.alias("d"), F.col("cid")).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.min("s").alias("_b"))
    )
    return (
        sv.join(best, id_col)
        .withColumn("cluster", F.col("_b.cid"))
        .withColumn("dist2", F.col("_b.d"))
        .drop("_b")
    )


#: Smallest k assigned via the Arrow-batched numpy kernel.  Between
#: LITERAL_ASSIGN_MAX_K and here the broadcast-join form wins (no
#: Python worker round-trip); at corpus-scaled k (auto_k = n/400 →
#: thousands of centroids on millions of vectors) the join form's k·N
#: interpreted higher-order-function dots become the wall — found live
#: at the fourth scale decade: SemDeDup at 2M vectors × 5000 centroids
#: is 10¹⁰ interpreted dots per assignment pass and did not finish,
#: while one int64 matmul per Arrow batch is the same arithmetic at
#: numpy speed (the round-6 ANN-propagation fix, applied to Lloyd
#: assignment).
ARROW_ASSIGN_MIN_K = 64

#: Small-k dispatch bound for the SemDeDup Arrow drop kernel: the
#: per-cluster matmul is used below :data:`ARROW_ASSIGN_MIN_K` only
#: when NO cluster exceeds this many rows (verified by one count over
#: the persisted assignment).  The kernel holds one (2048 × m) float64
#: cosine panel per block — m = 8192 is ≈ 128 MB plus the m×d matrix —
#: so the bound is a per-task memory envelope, not a heuristic; larger
#: clusters keep the cell-decomposed, skew-guarded SQL pair stage.
ARROW_DROPS_MAX_CLUSTER = 8192


def assign_clusters_arrow(
    sv: DataFrame,
    cents: list[tuple[int, list[int], int]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment as one int64 numpy matmul per Arrow
    batch — the corpus-scaled-k twin of :func:`assign_clusters_join`.

    Bit-identical to the literal and join forms: the distance is the
    same exact int64 ``n + cn − 2·x·c`` (components are |x| ≤ 0.53·1e7
    so every product and sum stays far inside int64), and the argmin
    tie-break matches because the centroid matrix columns are sorted by
    cid ascending and ``np.argmin`` returns the FIRST minimum — i.e.
    the lowest cid, the same (dist, cid)-lexicographic rule.  Parity
    with the join form is pinned in tests/test_round7b_ops.py.
    """
    import numpy as np

    cents = sorted(cents)
    cmat = np.array([cv for _, cv, _ in cents], dtype="int64")
    cn = np.array([n for _, _, n in cents], dtype="int64")
    cids = np.array([cid for cid, _, _ in cents], dtype="int64")

    cmat_f = cmat.T.astype("float64")

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["v"].tolist(), dtype="int64")
            n = pdf["n"].to_numpy(dtype="int64")
            # float64 matmul takes the BLAS path (int64 has none, ~50×
            # slower) and is EXACT here: |component| ≤ 0.53·1e7, so any
            # dot ≤ 64·(0.53e7)² ≈ 1.8e15 and any partial sum stays
            # < 2^53 — every float64 intermediate is exactly the
            # integer, and dist ≤ ~7.1e15 < 2^53 likewise.
            dot = vm.astype("float64") @ cmat_f
            dist = (
                n[:, None].astype("float64")
                + cn[None, :].astype("float64")
                - 2.0 * dot
            )
            idx = np.argmin(dist, axis=1)
            out = pdf.copy()
            out["cluster"] = cids[idx].astype("int32")
            out["dist2"] = dist[np.arange(len(idx)), idx].astype("int64")
            yield out

    schema = (
        f"{id_col} bigint, v array<bigint>, n bigint, "
        "cluster int, dist2 bigint"
    )
    return sv.select(id_col, "v", "n").mapInPandas(run, schema=schema)


#: Smallest k assigned via the TWO-LEVEL (IMI-style) search.  Below it
#: the full arrow matmul is already cheap; above it full assignment is
#: the SemDeDup scale-killer — with auto_k = n/400 the n·k dots are
#: n²/400 per Lloyd pass (427 s single pass measured at 2M×5000,
#: SCALE.md round 7).  Two-level assignment (⌊√k⌋ supers own their
#: nearest centroids; a vector scores the supers, descends into its
#: IMI_SPROBE nearest, and argmins only THEIR members) costs
#: n·O(√k) dots — the ivf_topk_imi build move applied to Lloyd.  The
#: trade is standard IMI approximation: a vector's true nearest
#: centroid may live in an unprobed super, so the trajectory above
#: this threshold is NOT the exact-Lloyd one the DuckDB oracle
#: replays — the catalog oracles only exercise k < this bound
#: (auto_k leaves it at n ≥ 102,400 vectors, far above the sf0.01
#: gate); above it quality is pinned by the planted-cluster CI
#: (tests/test_planted_clusters.py) and exactness by the
#: probe-everything parity test (n_sprobe ≥ n_super ≡ full search).
IMI_ASSIGN_MIN_K = 256

#: supers probed per vector during two-level assignment
IMI_SPROBE = 2

#: int64 payload cap for shipping the member-centroid table inside the
#: mapInPandas closure.  k·d·8 bytes ≤ this → members ride the closure
#: (2.6 MB at k=5000, d=64); above it (k ≈ 2.5M at 10⁹ vectors would
#: be 1.3 GB — a broadcast ceiling of its own) only the ⌊√k⌋ supers
#: ride the closure and the member argmin runs as a cogrouped
#: applyInPandas keyed on the probed super (vectors shuffle n_sprobe×,
#: centroids once) — bit-identical assignments either way (pinned).
IMI_CLOSURE_MAX_BYTES = 64 << 20


def _lloyd_split(cents: list[tuple[int, list[int], int]]):
    """Two-level quantizer model over the (collected, bounded) centroid
    table: the first ⌊√k⌋ centroids (cid-ascending) are the SUPERS;
    every centroid is owned by its nearest super under the SAME exact
    int64 squared-L2 metric as assignment, (dist, sid) tie-break
    (np.argmin's first-minimum = lowest sid).  Supers owning no
    centroid (possible only with duplicate centroid vectors — the
    lowest-sid twin wins every tie and owns the group) are dropped
    from the probe set, so every probed super is non-empty by
    construction.  Driver-side cost: k·√k dots over arrays already in
    memory.  Returns (cids, cmat, cn, sup_pos, members) where
    ``sup_pos`` lists the ACTIVE super row-positions (ascending) and
    ``members[j]`` the ascending row-positions owned by
    ``sup_pos[j]``."""
    import numpy as np

    cents = sorted(cents)
    cmat = np.array([cv for _, cv, _ in cents], dtype="int64")
    cn = np.array([n for _, _, n in cents], dtype="int64")
    cids = np.array([cid for cid, _, _ in cents], dtype="int64")
    k = len(cents)
    n_super = max(1, int(np.floor(np.sqrt(float(k)))))
    sup_f = cmat[:n_super].T.astype("float64")
    sup_n = cn[:n_super].astype("float64")
    # exact under the 2^53 bound documented on assign_clusters_arrow
    dist = (
        cn[:, None].astype("float64")
        + sup_n[None, :]
        - 2.0 * (cmat.astype("float64") @ sup_f)
    )
    owner = np.argmin(dist, axis=1)
    sup_pos = [s for s in range(n_super) if np.any(owner == s)]
    members = [np.flatnonzero(owner == s) for s in sup_pos]
    return cids, cmat, cn, np.array(sup_pos, dtype="int64"), members


def _imi_probes(vm, xn, cmat, cn, sup_pos, sp_eff):
    """Each vector's ``sp_eff`` nearest ACTIVE supers by exact squared
    L2, (dist, sid) tie-break via stable argsort — returns an
    (n, sp_eff) matrix of indices INTO sup_pos."""
    import numpy as np

    sup_f = cmat[sup_pos].T.astype("float64")
    sup_n = cn[sup_pos].astype("float64")
    sdist = (
        xn[:, None].astype("float64")
        + sup_n[None, :]
        - 2.0 * (vm.astype("float64") @ sup_f)
    )
    return np.argsort(sdist, axis=1, kind="stable")[:, :sp_eff]


def assign_clusters_imi(
    sv: DataFrame,
    cents: list[tuple[int, list[int], int]],
    id_col: str = "vec_id",
    n_sprobe: int = IMI_SPROBE,
    closure_max_bytes: int = IMI_CLOSURE_MAX_BYTES,
) -> DataFrame:
    """Two-level nearest-centroid assignment — the corpus-scaled-k form
    that keeps Lloyd sub-quadratic (see ``IMI_ASSIGN_MIN_K``).

    A vector scores the ⌊√k⌋ supers, descends into its ``n_sprobe``
    nearest, and argmins over THEIR member centroids only — n·O(√k)
    dots total.  With ``n_sprobe ≥ the active super count`` the
    candidate set is every centroid and the result is bit-identical to
    :func:`assign_clusters_arrow` (the exactness pin); below that it
    is the standard IMI approximation of the argmin.  Tie-breaks
    everywhere are (dist, id)-lexicographic, matching the exact forms.
    Routes by closure size — see ``IMI_CLOSURE_MAX_BYTES``.
    """
    cids, cmat, cn, sup_pos, members = _lloyd_split(cents)
    sp_eff = min(n_sprobe, len(sup_pos))
    if cmat.size * 8 <= closure_max_bytes:
        return _assign_imi_closure(
            sv, id_col, sp_eff, cids, cmat, cn, sup_pos, members
        )
    return _assign_imi_cogroup(
        sv, id_col, sp_eff, cids, cmat, cn, sup_pos, members
    )


def _assign_imi_closure(
    sv, id_col, sp_eff, cids, cmat, cn, sup_pos, members
) -> DataFrame:
    """Members ride the closure: one mapInPandas pass, rows grouped by
    probe signature so each signature's candidate argmin is one
    float64 BLAS matmul (exact under the 2^53 bound)."""

    def run(batches):
        from collections import defaultdict

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["v"].tolist(), dtype="int64")
            xn = pdf["n"].to_numpy(dtype="int64")
            probes = _imi_probes(vm, xn, cmat, cn, sup_pos, sp_eff)
            groups = defaultdict(list)
            for i, sig in enumerate(map(tuple, np.sort(probes, axis=1))):
                groups[sig].append(i)
            cl = np.empty(len(pdf), dtype="int64")
            d2 = np.empty(len(pdf), dtype="float64")
            for sig, idxs in groups.items():
                cand = np.concatenate([members[s] for s in sig])
                cand.sort()  # ascending position = ascending cid
                gm = vm[idxs].astype("float64")
                cd = (
                    xn[idxs][:, None].astype("float64")
                    + cn[cand][None, :].astype("float64")
                    - 2.0 * (gm @ cmat[cand].T.astype("float64"))
                )
                j = np.argmin(cd, axis=1)  # first min → lowest cid
                cl[idxs] = cids[cand[j]]
                d2[idxs] = cd[np.arange(len(idxs)), j]
            out = pdf.copy()
            out["cluster"] = cl.astype("int32")
            out["dist2"] = d2.astype("int64")
            yield out

    schema = (
        f"{id_col} bigint, v array<bigint>, n bigint, "
        "cluster int, dist2 bigint"
    )
    return sv.select(id_col, "v", "n").mapInPandas(run, schema=schema)


def _assign_imi_cogroup(
    sv, id_col, sp_eff, cids, cmat, cn, sup_pos, members
) -> DataFrame:
    """Only the supers ride the closure; the member argmin is a
    cogrouped applyInPandas keyed on the probed super — each task sees
    one super's member slice (k·d never ships whole), vectors shuffle
    ``sp_eff``×.  The per-super argmin then reduces through a global
    (dist2, cluster) struct-min, which equals the union argmin —
    bit-identical to the closure route (pinned)."""
    import numpy as np

    spark = sv.sparkSession

    def probes_fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["v"].tolist(), dtype="int64")
            xn = pdf["n"].to_numpy(dtype="int64")
            probes = _imi_probes(vm, xn, cmat, cn, sup_pos, sp_eff)
            n = len(pdf)
            rep = pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), sp_eff),
                    "v": [v for v in pdf["v"] for _ in range(sp_eff)],
                    "n": np.repeat(xn, sp_eff),
                    "sid": probes.reshape(n * sp_eff).astype("int32"),
                }
            )
            yield rep

    probed = sv.select(id_col, "v", "n").mapInPandas(
        probes_fn, f"{id_col} bigint, v array<bigint>, n bigint, sid int"
    )
    cent_rows = [
        (int(j), int(cids[i]), [int(x) for x in cmat[i]], int(cn[i]))
        for j in range(len(sup_pos))
        for i in members[j]
    ]
    cdf = spark.createDataFrame(
        cent_rows, "sid int, cid bigint, cv array<bigint>, cn bigint"
    )

    def per_super(vec_pdf, cent_pdf):
        import numpy as np
        import pandas as pd

        if not len(vec_pdf) or not len(cent_pdf):
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype="int64"),
                    "cluster": np.array([], dtype="int32"),
                    "dist2": np.array([], dtype="int64"),
                }
            )
        cent_pdf = cent_pdf.sort_values("cid")
        cm = np.array(cent_pdf["cv"].tolist(), dtype="int64")
        cnn = cent_pdf["cn"].to_numpy(dtype="int64").astype("float64")
        ccids = cent_pdf["cid"].to_numpy(dtype="int64")
        vm = np.array(vec_pdf["v"].tolist(), dtype="int64").astype("float64")
        xn = vec_pdf["n"].to_numpy(dtype="int64").astype("float64")
        cd = xn[:, None] + cnn[None, :] - 2.0 * (vm @ cm.T.astype("float64"))
        j = np.argmin(cd, axis=1)
        return pd.DataFrame(
            {
                id_col: vec_pdf[id_col].to_numpy(),
                "cluster": ccids[j].astype("int32"),
                "dist2": cd[np.arange(len(j)), j].astype("int64"),
            }
        )

    best = (
        probed.groupBy("sid")
        .cogroup(cdf.groupBy("sid"))
        .applyInPandas(
            per_super, f"{id_col} bigint, cluster int, dist2 bigint"
        )
        .groupBy(id_col)
        .agg(F.min(F.struct("dist2", "cluster")).alias("_b"))
    )
    return (
        sv.select(id_col, "v", "n")
        .join(best, id_col)
        .withColumn("cluster", F.col("_b.cluster"))
        .withColumn("dist2", F.col("_b.dist2"))
        .drop("_b")
    )


def auto_k(n_vectors: int, per: int = 400, floor: int = 8) -> int:
    """Corpus-scaled cluster count: k = max(floor, n // per).

    SemDeDup's within-cluster pair cost is Σ(n/k)² ≈ n²/k while the
    per-step driver sync is k·d rows, so k should GROW with the corpus
    (the paper runs k ≈ 11k at LAION scale).  n/400 reproduces the
    measured sf1 sweet spot (k=50 at 20k vectors: 40.1 s → 15.8 s,
    SCALE.md) and stays at the floor — hence oracle-replayable with a
    literal-k CTE — for every driver-test corpus (≤ 3.2k vectors).
    """
    return max(floor, n_vectors // per)


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    two_level: bool | None = None,
    n_sprobe: int = IMI_SPROBE,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return (id, cluster, dist2) plus the
    scaled vector columns (v, n) for downstream consumers (SemDeDup).

    iters=1 means: assign to the seed centroids, update once, assign to
    the updated centroids — i.e. the returned assignment always reflects
    the *latest* centroids, and ``iters`` counts update steps.

    Assignment uses the codegen-friendly literal form up to
    ``LITERAL_ASSIGN_MAX_K`` centroids, the broadcast-join form beyond
    it, and the Arrow int64-matmul kernel from ``ARROW_ASSIGN_MIN_K``
    (corpus-scaled k) — these three produce bit-identical assignments
    (same exact arithmetic, same (dist, cid) tie-break).  From
    ``IMI_ASSIGN_MIN_K`` the two-level search takes over (n·O(√k) dots
    instead of n·k — the approximation documented there); ``two_level``
    pins the choice (False = exact full search at any k, the
    oracle-replay form).

    The update step reduces through per-task numpy partial sums from
    ``ARROW_ASSIGN_MIN_K`` (O(tasks·k·d) shuffled rows, bit-identical
    to the posexplode form — integer sums commute); below it the
    posexplode+groupBy shape is already cheap and stays.
    """
    use_imi = two_level if two_level is not None else k >= IMI_ASSIGN_MIN_K
    if two_level is None and use_imi:
        # The default silently flipping to the approximate two-level
        # search is fine for production but would make an exact-Lloyd
        # oracle diff fail with a confusing mismatch — say so loudly.
        # Oracle-replay runs must pin two_level=False.
        import warnings

        warnings.warn(
            f"kmeans_assignments: k={k} >= IMI_ASSIGN_MIN_K"
            f"={IMI_ASSIGN_MIN_K}, defaulting to APPROXIMATE two-level"
            " (IMI) assignment; pin two_level=False for exact-Lloyd"
            " oracle comparison",
            stacklevel=2,
        )
    if use_imi:
        assign = lambda s, c: assign_clusters_imi(  # noqa: E731
            s, c, id_col, n_sprobe=n_sprobe
        )
    elif k <= LITERAL_ASSIGN_MAX_K:
        assign = assign_clusters
    elif k < ARROW_ASSIGN_MIN_K:
        assign = lambda s, c: assign_clusters_join(s, c, id_col)  # noqa: E731
    else:
        assign = lambda s, c: assign_clusters_arrow(s, c, id_col)  # noqa: E731
    update = (
        _update_centroids_partials
        if k >= ARROW_ASSIGN_MIN_K
        else _update_centroids
    )
    sv = track_persist(scaled_vectors(df, id_col, vec_col))
    cents = initial_centroids(sv, k, id_col)
    for _ in range(iters):
        cents = update(assign(sv, cents))
    return assign(sv, cents)


def _semantic_drops_arrow(a: DataFrame, tau: float) -> DataFrame:
    """Within-cluster drop set as one int64 matmul per cluster — the
    corpus-scaled-k twin of the ``bounded_self_pairs`` SQL drop stage
    (the second half of the fourth-decade SemDeDup fix; the first is
    :func:`assign_clusters_arrow`).

    Bit-identical to the SQL form: the cosine is the exact int64 dot
    cast to double, divided by ``sqrt(n_i) * sqrt(n_j)`` in the same
    operation order as :func:`..functions.vectors.spark_cosine` (every
    int fits 2^53, so the casts are exact and the IEEE quotient is the
    same), and the drop rule is the same greedy keep-lowest-id — j is
    dropped iff ANY lower-id cluster member has cosine ≥ tau with it.
    Memory per task is bounded by processing the pair matrix in row
    blocks (block × m doubles); cluster sizes are ~n/k by the auto_k
    contract, so a task holds one modest cluster — for adversarial
    single-giant-cluster corpora keep the SQL stage with its
    ``max_bucket`` cell decomposition (the k < ARROW_ASSIGN_MIN_K
    route).  Equality with the SQL stage is pinned in
    tests/test_round7b_ops.py.
    """
    import numpy as np

    def per_cluster(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id": np.array([], dtype="int64")})
        pdf = pdf.sort_values("id")
        vm = np.array(pdf["v"].tolist(), dtype="int64")
        den = np.sqrt(pdf["n"].to_numpy(dtype="int64").astype("float64"))
        m = len(pdf)
        dropped = np.zeros(m, dtype=bool)
        block = 2048
        col = np.arange(m)
        vmf = vm.astype("float64")
        for s in range(0, m, block):
            e = min(s + block, m)
            # float64 BLAS matmul, exact for the same 2^53 bound as
            # assign_clusters_arrow — the quotient is then computed
            # from the identical integer-valued dot.
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = (vmf[s:e] @ vmf.T) / (den[s:e, None] * den[None, :])
            # zero-norm convention (shared with the SQL route's CASE):
            # cosine with a zero vector is 0.0 — den = 0 gives 0/0 =
            # NaN here, which numpy's `>= tau` would silently keep
            # while Spark's ANSI division would error; pinning 0.0 in
            # both routes keeps them bit-identical.
            cos = np.nan_to_num(cos, nan=0.0, posinf=0.0, neginf=0.0)
            ge = (cos >= tau) & (col[None, :] > np.arange(s, e)[:, None])
            dropped |= ge.any(axis=0)
        return pd.DataFrame({"id": pdf["id"].to_numpy()[dropped]})

    return (
        a.select("id", "cluster", "v", "n")
        .groupBy("cluster")
        .applyInPandas(per_cluster, "id bigint")
    )


def semantic_dedup(
    df: DataFrame,
    k: int | None = 8,
    tau: float = 0.45,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 256,
    two_level: bool | None = None,
    n_sprobe: int = IMI_SPROBE,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embeddings, then drop within-cluster semantic near-duplicates.

    ``two_level`` forwards to :func:`kmeans_assignments` — pass False
    to pin the exact full-search Lloyd assignment at any k (the
    oracle-replay form; the default flips to the approximate two-level
    search at ``IMI_ASSIGN_MIN_K`` and warns).  Drop-set agreement
    between the two routes at production k (200k vectors, k=500,
    ``tools/semdedup_agreement.py``, SCALE.md round 9): 0.995
    per-vector kept agreement in the true-near-dup regime (tau 0.9),
    0.67-0.77 at the low default tau on an unstructured corpus —
    where the drop set is partition-defined noise in the exact route
    too (near-tied centroids; a different seed moves it as much).
    SemDeDup's contract is "drop near-dups within SOME clustering",
    which both routes satisfy; pin ``two_level=False`` when low-tau
    drops must replay an exact-Lloyd oracle bit-for-bit.

    The clustering IS the scale move: candidate pairs form only inside
    a cluster, so the quadratic all-pairs cosine never happens —
    per-cluster pair counts are (n/k)² instead of n².  Survivor rule is
    deterministic: a vector is dropped iff some *lower-id* member of
    its cluster has cosine ≥ ``tau`` with it (greedy keep-lowest-id,
    the SQL-expressible form of SemDeDup's keep-one-per-group).

    Returns one row per input vector: (id, cluster, kept).  Cosines are
    computed from exact int64 dots (engine-identical doubles).

    At 100 TB: assignment is map-only; the within-cluster pair
    generation routes through :func:`.skew.bounded_self_pairs` with
    key_cols=["cluster"] — so parallelism is NOT bounded by k: an
    over-``max_bucket`` cluster decomposes cell-wise into
    ⌈m/max_bucket⌉ shuffle keys with an identical pair set (pinned on a
    planted one-giant-cluster corpus in tests/test_skew_guard.py).  The
    cosine is computed inside the join's projection, so only
    (id, sim) survive it — no vector payload leaves the join.
    ``max_bucket=None`` disables the guard (plain cluster-keyed
    self-join); raising k (the paper uses k ≈ 11k at LAION scale) is
    the complementary remedy when cluster geometry, not skew, is the
    bottleneck.  ``k=None`` scales it with the corpus via
    :func:`auto_k` (one count job — the model-sizing step).
    """
    if k is None:
        k = auto_k(df.count())
    a = kmeans_assignments(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        two_level=two_level, n_sprobe=n_sprobe,
    )
    a = track_persist(a.select(F.col(id_col).alias("id"), "cluster", "v", "n"))
    if k >= ARROW_ASSIGN_MIN_K:
        # corpus-scaled k: clusters are ~n/k rows, one int64 matmul per
        # cluster replaces ~n²/k interpreted HOF cosines (bit-identical
        # drop set — see _semantic_drops_arrow)
        drops = _semantic_drops_arrow(a, tau).distinct()
    elif (
        a.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
        or 0
    ) <= ARROW_DROPS_MAX_CLUSTER:
        # Small-k corpora reach the same kernel through an EXACT bound
        # instead of the k-proxy: one cheap count over the (persisted)
        # assignment proves no cluster exceeds the kernel's documented
        # memory envelope (block × m cosine panel), so the per-cluster
        # matmul is safe — replacing the interpreted per-pair HOF
        # cosines that dominated this stage at small k (measured: a
        # 1.30 s two-task pair stage at k=8 / 2k vectors).  The count
        # job doubles as the eager materialization of the assignment
        # cache (its consumers otherwise race to fill it).  Giant
        # clusters past the bound keep the cell-decomposed SQL stage
        # below — the adversarial-skew posture is unchanged.
        drops = _semantic_drops_arrow(a, tau).distinct()
    else:
        # zero-norm convention: cosine with a zero vector is undefined
        # (0/0 — an ANSI divide-by-zero error in Spark, NULL in
        # DuckDB); define it as 0.0 (below any positive tau → the row
        # neither drops nor is dropped) — the CASE short-circuits so
        # the division never executes, and the arrow route
        # (_semantic_drops_arrow) replays the same rule.
        sim = F.expr(
            "CASE WHEN l.n = 0 OR r.n = 0 THEN 0.0D ELSE "
            + V.spark_cosine(V.spark_dot("l.v", "r.v"), "l.n", "r.n")
            + " END"
        )
        drops = (
            bounded_self_pairs(
                a,
                key_cols=["cluster"],
                id_col="id",
                select_cols=lambda: [
                    F.col("r.id").alias("id"),
                    sim.alias("_sim"),
                ],
                cap=max_bucket,
            )
            .where(F.col("_sim") >= F.lit(tau))
            .select("id")
            .distinct()
        )
    return (
        a.join(drops.withColumn("_drop", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )
