"""Round-3 pipeline wave: k-means clustering, SemDeDup, weighted
(PPS) sampling, and dataset splitting.

These extend the training-data-pipeline surface past dedup/filtering
into corpus *organization*: clustering for curriculum/bucketing and
IVF coarse quantizers, SemDeDup (the embedding-clustered semantic
dedup of Abbas et al. 2023), size-weighted sampling for corpus
subsetting, and deterministic train/val/test splits.  No analog in the
reference (its analytics end at windowed word counts —
``KafkaWordCount.scala:53-73``); this is the §2c north-star surface.

Every query here is exactly reproducible in DuckDB: vector math on
int64-scaled components, sampling/splits on the md5 portable-hash
family, centroid updates on < 2^53 integer sums (see
``operators/kmeans.py`` for the exactness argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions import vectors as V
from ..operators.kmeans import kmeans_assignments, semantic_dedup
from ..operators.sharding import global_running_sum
from ..sources.batch import load_table, table_row_count
from .registry import register

KMEANS_K = 8
KMEANS_ITERS = 2
SEMDEDUP_TAU = 0.45
PPS_K = 50  # weighted-sample target size


# ------------------------------------------------------------ k-means


def _duck_kmeans_cte(
    k: int, iters: int, k_auto: bool = False
) -> tuple[str, str]:
    """(WITH-clause body, final-assignment CTE name) for ``iters``
    Lloyd update steps — generated, so the SQL twin follows the exact
    same schedule as the Spark loop: seed → [assign → update]×iters →
    final assign.

    ``k_auto=True`` derives k IN SQL from the same corpus-count
    formula as :func:`..operators.kmeans.auto_k`
    (``greatest(8, n // 400)``) instead of the literal ``k`` — so an
    oracle built for the auto-k engine path (``semantic_dedup(k=None)``)
    stays correct ABOVE the ~3.2k-vector scale where the auto value
    leaves the floor (ADVICE r5 #5); the literal ``k`` is ignored."""
    dot_sc = V.duck_dot("s.v", "c.v")
    parts = [
        f"sv AS (SELECT vec_id, {V.duck_scaled('embedding')} AS v FROM embeddings)",
        f"sn AS (SELECT vec_id, v, CAST({V.duck_dot('v', 'v')} AS BIGINT) AS n FROM sv)",
    ]
    if k_auto:
        parts.append(
            "kk AS (SELECT greatest(8, count(*) // 400) AS k FROM embeddings)"
        )
        parts.append(
            """c0 AS (
      SELECT cid, v, n FROM (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               v, n
        FROM sn) t
      WHERE cid < (SELECT k FROM kk))"""
        )
    else:
        parts.append(
            f"""c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v, n
      FROM sn ORDER BY vec_id LIMIT {k})"""
        )
    cur = "c0"
    for i in range(iters + 1):
        parts.append(
            f"""a{i} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT s.vec_id, c.cid,
               CAST(s.n + c.n - 2 * {dot_sc} AS BIGINT) AS dist,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY CAST(s.n + c.n - 2 * {dot_sc} AS BIGINT), c.cid) AS rn
        FROM sn s CROSS JOIN {cur} c) WHERE rn = 1)"""
        )
        if i < iters:
            parts.append(
                f"""u{i} AS (
      SELECT a.cid, unnest(generate_series(0, len(s.v) - 1)) AS pos, unnest(s.v) AS x
      FROM a{i} a JOIN sn s USING (vec_id))"""
            )
            parts.append(
                f"""c{i + 1}p AS (
      SELECT cid, pos, CAST(round(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      FROM u{i} GROUP BY cid, pos)"""
            )
            parts.append(
                f"""c{i + 1}l AS (SELECT cid, list(c ORDER BY pos) AS v FROM c{i + 1}p GROUP BY cid)"""
            )
            parts.append(
                f"""c{i + 1} AS (SELECT cid, v, CAST({V.duck_dot('v', 'v')} AS BIGINT) AS n FROM c{i + 1}l)"""
            )
            cur = f"c{i + 1}"
    return ",\n    ".join(parts), f"a{iters}"


_KMEANS_CTE, _KMEANS_FINAL = _duck_kmeans_cte(KMEANS_K, KMEANS_ITERS)


@register(
    "q_cluster_kmeans",
    oracle=f"""
    WITH {_KMEANS_CTE}
    SELECT vec_id, cid AS cluster, dist AS dist2
    FROM {_KMEANS_FINAL}
    ORDER BY vec_id
    """,
    doc="Fixed-iteration Lloyd k-means (k=8, 2 update steps, lowest-id "
    "seeds): map-only assignment against literal broadcast centroids, "
    "posexplode+groupBy(cluster,pos) integer-sum update, k×d driver "
    "sync per step (the MLlib pattern). Exact int64 distances → the "
    "whole trajectory (assignments AND centroids) is bit-identical in "
    "DuckDB, which replays the same schedule in generated CTEs. "
    "(operators/kmeans.py)",
    tags=("llm", "clustering", "vectors"),
)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_assignments(emb, k=KMEANS_K, iters=KMEANS_ITERS)
        .select("vec_id", "cluster", "dist2")
        .orderBy("vec_id")
    )


# ----------------------------------------------------------- SemDeDup

_SEM_CTE, _SEM_FINAL = _duck_kmeans_cte(KMEANS_K, 1, k_auto=True)


@register(
    "q_dedup_semantic",
    oracle=f"""
    WITH {_SEM_CTE},
    m AS (
      SELECT a.vec_id, a.cid, s.v, s.n
      FROM {_SEM_FINAL} a JOIN sn s USING (vec_id)
    ),
    drops AS (
      -- zero-norm convention (kmeans.py): cosine with a zero vector
      -- is pinned to 0.0 in engine and oracle alike
      SELECT DISTINCT r.vec_id
      FROM m l JOIN m r ON l.cid = r.cid AND l.vec_id < r.vec_id
      WHERE (CASE WHEN l.n = 0 OR r.n = 0 THEN 0.0
             ELSE CAST({V.duck_dot('l.v', 'r.v')} AS DOUBLE)
                  / (sqrt(CAST(l.n AS DOUBLE)) * sqrt(CAST(r.n AS DOUBLE)))
             END) >= {SEMDEDUP_TAU}
    )
    SELECT m.vec_id, m.cid AS cluster,
           m.vec_id NOT IN (SELECT vec_id FROM drops) AS kept
    FROM m
    ORDER BY m.vec_id
    """,
    doc="SemDeDup (arXiv:2303.09540): k-means clusters bound the "
    "candidate space, cosine>=tau within a cluster drops the higher "
    "id. The cluster stage IS the scale move — pairs form only inside "
    "a cluster ((n/k)^2, never n^2), so k SCALES with the corpus: the "
    "catalog runs auto_k = max(8, n/400) (the paper's own remedy, "
    "k~11k at LAION scale; sf1 measured 40.1s at k=8 vs 15.8s at "
    "k=50), switching from literal-centroid to broadcast-join "
    "assignment past k=16 with a bit-identical trajectory. The oracle "
    "derives k from the SAME count formula in SQL (greatest(8, "
    "n//400)), so engine and oracle agree at any sf, not only below "
    "the ~3.2k-vector floor; adversarial "
    "single-cluster corpora additionally route through "
    "skew.bounded_self_pairs. Exact int64 dots make the cosine "
    "threshold engine-identical. OPERATOR GUIDANCE (measured at "
    "production k, SCALE.md round 9): kept-set agreement between the "
    "two-level (IMI) and exact assignment routes is 0.995 in the "
    "true-near-dup regime (tau 0.9); at LOW tau the drop set is "
    "partition-defined noise in the exact route too — pin "
    "two_level=False when bit-reproducibility of low-tau drops "
    "matters. (operators/kmeans.py)",
    tags=("llm", "dedup", "vectors"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import auto_k

    emb = load_table(spark, sf_dir, "embeddings")
    # auto_k from the parquet-footer row count (same integer as
    # emb.count(), no scan job) — sources.batch.table_row_count
    k = auto_k(table_row_count(sf_dir, "embeddings"))
    return semantic_dedup(emb, k=k, tau=SEMDEDUP_TAU, iters=1).orderBy(
        "vec_id"
    )


# ------------------------------------------- weighted (PPS) sampling


@register(
    "q_sample_weighted_pps",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS wt,
             {TH.duck_str_hash_raw('CAST(doc_id AS VARCHAR)')} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, wt, h,
             SUM(wt) OVER (ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(wt) OVER () AS total
      FROM w
    )
    SELECT CAST((cum * {PPS_K}) // total AS BIGINT) AS pick, doc_id, wt
    FROM c
    WHERE (cum - wt) * {PPS_K} // total < cum * {PPS_K} // total
    ORDER BY pick, doc_id
    """,
    doc="Systematic PPS sampling (probability proportional to size, "
    "n_chars weights): items in portable-hash order, exact integer "
    "cumulative weights, row selected where floor(cum*k/W) advances — "
    "k strata, one hit each, zero floats. The Spark cumsum is the "
    "scale-safe two-phase prefix sum (range partition -> local window "
    "-> broadcast offsets), not a single-partition window; DuckDB's "
    "naive SUM OVER bit-matches it because integer sums are "
    "associative. (operators/sharding.py::global_running_sum)",
    tags=("llm", "sampling"),
)
def q_sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("wt"),
        F.expr(TH.spark_str_hash_raw("CAST(doc_id AS STRING)")).alias("h"),
    )
    c = global_running_sum(w, "wt", ["h", "doc_id"])
    total = c.groupBy().agg(F.sum("wt").alias("t"))
    return (
        c.crossJoin(F.broadcast(total))
        .where(
            F.expr(f"((cum - wt) * {PPS_K}) DIV t") < F.expr(f"(cum * {PPS_K}) DIV t")
        )
        .select(
            F.expr(f"CAST((cum * {PPS_K}) DIV t AS BIGINT)").alias("pick"),
            "doc_id",
            "wt",
        )
        .orderBy("pick", "doc_id")
    )


# -------------------------------------- IVF with a learned quantizer


def _duck_ivf_refined_oracle() -> str:
    from ..operators.similarity import duck_ivf_topk_sql

    return duck_ivf_topk_sql(5, "id < 10", kmeans_iters=1)


@register(
    "q_similarity_ann_ivf_refined",
    oracle=_duck_ivf_refined_oracle(),
    doc="IVF ANN with a LEARNED coarse quantizer: one Lloyd refinement "
    "over the seed cells before indexing (similarity.kmeans_refine — "
    "the all-DataFrame, driver-free Lloyd variant: broadcast-join "
    "assignment by cosine, posexplode integer-mean update). Closes the "
    "round-2 gap where only the kmeans_iters=0 path was oracle-able: "
    "the DuckDB twin now replays the refinement trajectory in "
    "generated CTEs, so centroid learning itself is driver-checked. "
    "(operators/similarity.py::ivf_topk)",
    tags=("llm", "similarity", "ivf", "clustering"),
)
def q_similarity_ann_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, kmeans_iters=1
    ).orderBy("query_id", "rn")


# ------------------------------------------- product quantization


def _duck_pq_oracle() -> str:
    from ..operators.pq import duck_pq_encode_sql

    return duck_pq_encode_sql(iters=1)


@register(
    "q_vector_pq_encode",
    oracle=_duck_pq_oracle(),
    doc="Product quantization (Jegou et al. 2011): train 8 per-subspace "
    "codebooks (16 centroids each, seed slices + 1 Lloyd step) and "
    "encode every vector as 8 codes + exact reconstruction errors. "
    "Subspaces are ROWS (posexplode of slices), so one generic "
    "assignment join and one generic update aggregation train all "
    "codebooks at once — the plan is M-independent, and the oracle "
    "replays the identical reshape with unnest+list_slice. The "
    "billion-vector memory move: 256 B float vector -> 8 B of codes. "
    "(operators/pq.py)",
    tags=("llm", "vectors", "quantization", "clustering"),
)
def q_vector_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_encode(emb, iters=1).orderBy("vec_id", "sub_id")


def _duck_pq_adc_oracle() -> str:
    from ..operators.pq import duck_pq_adc_sql

    return duck_pq_adc_sql(5, "id < 10", iters=1)


@register(
    "q_similarity_pq_adc",
    oracle=_duck_pq_adc_oracle(),
    doc="PQ asymmetric-distance (ADC) top-k: corpus as 8 codes per "
    "vector, queries exact; distance = sum of per-subspace LUT "
    "entries — the memory-bound third ANN scale path next to LSH and "
    "IVF (no corpus vectors touched at query time, only codes). "
    "Broadcast LUT join + slim (query, neighbor) partial-sum shuffle. "
    "Approximate by quantization, deterministic by exact int64 math — "
    "oracle replays codebooks, codes, LUT, and tiebreaks bit-for-bit. "
    "(operators/pq.py)",
    tags=("llm", "similarity", "quantization"),
)
def q_similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, iters=1
    ).orderBy("query_id", "rn")


def _duck_ivfpq_oracle() -> str:
    from ..operators.pq import duck_ivfpq_sql

    return duck_ivfpq_sql(5, "id < 10", iters=1)


@register(
    "q_similarity_ivfpq",
    oracle=_duck_ivfpq_oracle(),
    doc="IVFPQ (FAISS IVFADC, Jegou et al. 2011 SIV): coarse IVF cells "
    "+ one shared PQ codebook over cell RESIDUALS — the canonical "
    "billion-vector index. Corpus stored as (cell, 8 codes); a query "
    "probes 4 of 16 cells and scores codes via per-(query,cell) "
    "residual LUTs — only probed cells' codes are touched, no raw "
    "vectors move at query time. Residuals are exact int subtractions, "
    "so index build AND search replay bit-for-bit in DuckDB. "
    "(operators/pq.py::ivfpq_topk)",
    tags=("llm", "similarity", "ivf", "quantization"),
)
def q_similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, iters=1
    ).orderBy("query_id", "rn")


# ----------------------------------------------- ANN recall harness


def _duck_ann_recall_oracle() -> str:
    from ..operators.similarity import duck_lsh_topk_sql

    brute = f"""
    WITH sv AS (
      SELECT vec_id, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    sn AS (SELECT vec_id, v, {V.duck_dot('v', 'v')} AS n FROM sv),
    q AS (SELECT * FROM sn WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
               / (sqrt(CAST(q.n AS DOUBLE)) * sqrt(CAST(c.n AS DOUBLE)))
               AS cos_sim
      FROM q JOIN sn c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rn FROM scored
    ) t WHERE rn <= 5
    """
    from .llm import _oracle_lsh_planes

    approx_sql = duck_lsh_topk_sql(
        5, "id < 10", planes_per_band=_oracle_lsh_planes()
    )
    return f"""
    WITH brute AS (SELECT query_id, neighbor_id FROM ({brute}) b),
    approx AS (
      SELECT query_id, neighbor_id FROM ({approx_sql}) a
    )
    SELECT b.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b
    LEFT JOIN approx a
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@register(
    "q_ann_recall_lsh",
    oracle=_duck_ann_recall_oracle(),
    doc="ANN self-evaluation: recall@5 of the hyperplane-LSH top-k "
    "against the exact brute-force top-k, per query — the "
    "measure-don't-guess harness a production ANN deployment runs on "
    "every index build (both legs reuse the catalog's oracle-checked "
    "operators; the joint query makes the quality number itself "
    "driver-checkable). Scale: brute force runs on the SAMPLED query "
    "set only — recall estimation never needs the full |Q|. "
    "(operators/similarity.py)",
    tags=("llm", "similarity", "evaluation"),
)
def q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    approx = (
        lsh_topk(q, emb, k=5)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        brute.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
            (F.sum(F.coalesce("_hit", F.lit(0))) / 5.0).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ------------------------------------ curriculum selection per cluster


@register(
    "q_curriculum_select",
    oracle=f"""
    WITH {_SEM_CTE},
    feat AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS DOUBLE) AS n_tok,
             CAST(n_chars AS DOUBLE) AS n_chr,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','to','and','in','is','it')))
                  AS DOUBLE) AS n_stop
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             0.004 * n_tok + 0.0005 * n_chr + 0.8 * (n_stop / n_tok) - 0.6
               AS score
      FROM feat WHERE n_tok > 0
    ),
    j AS (
      SELECT a.cid, a.vec_id AS doc_id, z.score
      FROM {_SEM_FINAL} a JOIN z ON z.doc_id = a.vec_id
    )
    SELECT cid AS cluster, doc_id, score, rk FROM (
      SELECT cid, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY cid
                 ORDER BY score DESC, doc_id) AS INT) AS rk
      FROM j
    ) t WHERE rk <= 3
    ORDER BY cluster, rk
    """,
    doc="Curriculum/exemplar selection: the top-3 quality-scored "
    "documents per embedding cluster — diversity from the k-means "
    "partition, quality from the linear classifier (the "
    "cluster-then-rank shape of DEITA/prototype selection). Composes "
    "two oracle-checked operators (kmeans x classifier) joined on the "
    "1:1 doc/vec id correspondence of the test corpus; per-cluster "
    "window top-k, no global sort. (operators/kmeans.py + "
    "q_text_quality_classifier)",
    tags=("llm", "clustering", "quality", "sampling"),
)
def q_curriculum_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assignments(emb, k=KMEANS_K, iters=1).select(
        F.col("vec_id").alias("doc_id"), "cluster"
    )
    scores = q_text_quality_classifier(spark, sf_dir).select("doc_id", "score")
    w = Window.partitionBy("cluster").orderBy(F.desc("score"), "doc_id")
    return (
        clusters.join(scores, "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 3)
        .select("cluster", "doc_id", "score", "rk")
        .orderBy("cluster", "rk")
    )


# ----------------------------------------- dedup tier agreement audit


def _duck_tier_agreement_oracle() -> str:
    from .llm import _MINHASH_PAIRS_ORACLE, _duck_simhash_bands

    simhash = f"""
    WITH sims AS (
      SELECT doc_id, {TH.duck_simhash('text')} AS sim FROM documents
    ),
    bands AS ({_duck_simhash_bands()}),
    cand AS (
      SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
             l.sim AS sim1, r.sim AS sim2
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
    )
    SELECT id1, id2 FROM cand WHERE bit_count(xor(sim1, sim2)) <= 1
    """
    return f"""
    WITH mh AS (SELECT id1, id2 FROM ({_MINHASH_PAIRS_ORACLE}) m),
    sh AS (SELECT id1, id2 FROM ({simhash}) s)
    SELECT COALESCE(mh.id1 IS NOT NULL, FALSE) AS in_minhash,
           COALESCE(sh.id1 IS NOT NULL, FALSE) AS in_simhash,
           COUNT(*) AS n_pairs,
           MIN(COALESCE(mh.id1, sh.id1)) AS min_id1
    FROM mh FULL OUTER JOIN sh
      ON mh.id1 = sh.id1 AND mh.id2 = sh.id2
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@register(
    "q_dedup_tier_agreement",
    oracle=_duck_tier_agreement_oracle(),
    doc="Dedup tier-agreement audit: MinHash-LSH pairs (Jaccard>=0.5) "
    "vs SimHash pairs (hamming<=1) as a full-outer membership "
    "contingency — the cross-validation a pipeline runs before "
    "trusting one tier's drops (agreement high -> either tier "
    "suffices; low -> thresholds are mistuned). Composes two "
    "oracle-checked tiers so the comparison itself is driver-checked; "
    "both legs read the shared signature table build. "
    "(operators/dedup.py)",
    tags=("llm", "dedup", "evaluation"),
)
def q_dedup_tier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs, simhash_pairs
    from ..operators.signatures import signature_table

    sigs = signature_table(spark, sf_dir)
    mh = (
        minhash_lsh_pairs(None, jaccard_threshold=0.5, sigs=sigs)
        .select("id1", "id2", F.lit(True).alias("in_mh"))
    )
    sh = (
        simhash_pairs(None, max_hamming=1, sigs=sigs)
        .select(
            F.col("id1").alias("s1"), F.col("id2").alias("s2"),
            F.lit(True).alias("in_sh"),
        )
    )
    j = mh.join(
        sh, (mh["id1"] == sh["s1"]) & (mh["id2"] == sh["s2"]), "full_outer"
    )
    return (
        j.select(
            F.coalesce("in_mh", F.lit(False)).alias("in_minhash"),
            F.coalesce("in_sh", F.lit(False)).alias("in_simhash"),
            F.coalesce("id1", "s1").alias("any_id1"),
        )
        .groupBy("in_minhash", "in_simhash")
        .agg(F.count("*").alias("n_pairs"), F.min("any_id1").alias("min_id1"))
        .orderBy("in_minhash", "in_simhash")
    )


# --------------------------------- contamination governance by split


@register(
    "q_decontaminate_by_split",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {TH.duck_shingle_hashes('text')} AS hs FROM documents
    ),
    ev AS (
      SELECT DISTINCT h FROM (
        SELECT unnest(hs) AS h FROM sh WHERE doc_id % 97 = 0
      )
    ),
    tr AS (
      SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id % 97 <> 0
    ),
    hits AS (
      SELECT tr.doc_id, COUNT(*) AS n_hits
      FROM tr JOIN ev USING (h) GROUP BY tr.doc_id
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN {TH.duck_str_hash_raw('CAST(doc_id AS VARCHAR)')} % 100 < 80
                  THEN 'train'
                  WHEN {TH.duck_str_hash_raw('CAST(doc_id AS VARCHAR)')} % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents WHERE doc_id % 97 <> 0
    )
    SELECT sp.split,
           COUNT(*) AS n_docs,
           CAST(COUNT(hits.doc_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(hits.doc_id) AS DOUBLE) / COUNT(*) AS contamination_rate,
           CAST(COALESCE(SUM(hits.n_hits), 0) AS BIGINT) AS total_hits
    FROM sp LEFT JOIN hits ON hits.doc_id = sp.doc_id
    GROUP BY sp.split ORDER BY sp.split
    """,
    doc="Contamination governance report: benchmark-overlap hits "
    "(word 3-grams vs the held-out eval slice) aggregated per "
    "train/val/test split — the release-gate number a data audit "
    "signs off on. Composes two oracle-checked operators "
    "(decontaminate x split) so the COMPOSITION is driver-checked, "
    "the round-2 lesson that per-operator oracles miss cross-operator "
    "bugs. Eval shingle set broadcasts; corpus never shuffles. "
    "(operators/decontaminate.py + q_split_train_val_test)",
    tags=("llm", "decontaminate", "governance"),
)
def q_decontaminate_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.signatures import signature_table

    sigs = signature_table(spark, sf_dir).select("doc_id", "hs")
    ev = (
        sigs.where(F.expr("doc_id % 97 = 0"))
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    tr = sigs.where(F.expr("doc_id % 97 <> 0")).select(
        "doc_id", F.explode("hs").alias("h")
    )
    hits = (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    b = F.expr(TH.spark_str_hash_raw("CAST(doc_id AS STRING)")) % 100
    sp = (
        load_table(spark, sf_dir, "documents")
        .where(F.expr("doc_id % 97 <> 0"))
        .select(
            "doc_id",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
        )
    )
    return (
        sp.join(hits.withColumnRenamed("doc_id", "h_doc"),
                sp["doc_id"] == F.col("h_doc"), "left")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("h_doc").alias("n_contaminated"),
            (F.count("h_doc").cast("double") / F.count("*")).alias(
                "contamination_rate"
            ),
            F.coalesce(F.sum("n_hits"), F.lit(0)).cast("bigint").alias("total_hits"),
        )
        .orderBy("split")
    )


# --------------------------------------------- RAG sliding chunking


@register(
    "q_chunk_sliding_rag",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TH.duck_tokens('text')} AS t FROM documents
    ),
    win AS (
      SELECT doc_id, t,
             unnest(generate_series(0,
               (greatest(len(t) - 32, 0) + 23) // 24)) AS i
      FROM t WHERE len(t) > 0
    ),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             array_to_string(list_slice(t, i * 24 + 1, i * 24 + 32), ' ')
               AS chunk_text
      FROM win
    )
    SELECT doc_id, chunk_idx, chunk_text,
           CAST(len({TH.duck_tokens('chunk_text')}) AS INT) AS n_tok,
           {TH.duck_str_hash('chunk_text')} AS chunk_hash
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
    doc="RAG retrieval-corpus prep: overlapping 32-token windows every "
    "24 tokens (8-token overlap keeps passages from splitting "
    "answers), with per-chunk token counts and portable hashes. "
    "Map-only — one row per window, zero shuffle; at 100 TB the chunk "
    "table writes bucketed by chunk_hash so downstream chunk dedup "
    "and embedding joins are co-located. "
    "(operators/chunks.py::sliding_chunks)",
    tags=("llm", "chunking", "rag"),
)
def q_chunk_sliding_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunks import sliding_chunks

    docs = load_table(spark, sf_dir, "documents")
    return (
        sliding_chunks(docs, width=32, stride=24)
        .withColumn("n_tok", F.col("n_tok").cast("int"))
        .orderBy("doc_id", "chunk_idx")
    )


# ------------------------------------------------- corpus profiling


@register(
    "q_profile_documents",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Per-language corpus profile: counts, empties, char-length "
    "min/max/sum/avg, distinct sources — the data-quality dashboard "
    "every ingest runs first. One partial-aggregable pass; avg is the "
    "exact-sum/count division per the registry decimal rule. "
    "(map-side combine; output is O(langs))",
    tags=("llm", "profiling"),
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.col("text") == ""), 1
                ).otherwise(0)
            ).alias("n_empty"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        )
        .withColumn(
            "avg_chars",
            F.col("sum_chars").cast("double") / F.col("n_docs"),
        )
        .orderBy("lang")
    )


# ------------------------------------ linear quality classifier gate


@register(
    "q_text_quality_classifier",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS DOUBLE) AS n_tok,
             CAST(n_chars AS DOUBLE) AS n_chr,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','to','and','in','is','it')))
                  AS DOUBLE) AS n_stop
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             0.004 * n_tok + 0.0005 * n_chr + 0.8 * (n_stop / n_tok) - 0.6
               AS score
      FROM (SELECT * FROM f) t WHERE n_tok > 0
    )
    SELECT doc_id, score, score > 0.0 AS keep
    FROM z ORDER BY doc_id
    """,
    doc="fastText-style linear quality gate: a literal weight vector "
    "over cheap text features (token count, char count, stopword "
    "ratio), thresholded on the LINEAR score — mathematically the "
    "same decision as sigmoid > 0.5 but engine-exact (exp() differs "
    "in last-ulp between libms; the linear form is sums/products of "
    "identical doubles in a fixed order). Map-only, codegen, no UDF. "
    "A real trained classifier drops in by replacing the literals. "
    "(operators/text.py features)",
    tags=("llm", "quality"),
)
def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop = "('the','a','of','to','and','in','is','it')"
    f = docs.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(text, ' '), t -> t <> '')) AS DOUBLE)"
        ).alias("n_tok"),
        F.col("n_chars").cast("double").alias("n_chr"),
        F.expr(
            f"CAST(size(filter(split(text, ' '), t -> t IN {stop})) AS DOUBLE)"
        ).alias("n_stop"),
    ).where(F.col("n_tok") > 0)
    score = (
        0.004 * F.col("n_tok")
        + 0.0005 * F.col("n_chr")
        + 0.8 * (F.col("n_stop") / F.col("n_tok"))
        - 0.6
    )
    return (
        f.select("doc_id", score.alias("score"))
        .withColumn("keep", F.col("score") > 0.0)
        .orderBy("doc_id")
    )


# ------------------------------- temperature-balanced language mixing


@register(
    "q_mix_temperature_lang",
    oracle=f"""
    WITH n AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wt FROM n
    ),
    tot AS (SELECT SUM(n_docs) AS total, SUM(wt) AS wsum FROM w),
    quota AS (
      SELECT w.lang, w.n_docs,
             CAST(round(w.wt / t.wsum * t.total) AS BIGINT) AS target
      FROM w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, q.target,
             ROW_NUMBER() OVER (PARTITION BY d.lang
               ORDER BY {TH.duck_str_hash_raw('CAST(d.doc_id AS VARCHAR)')},
                        d.doc_id) AS rk
      FROM documents d JOIN quota q ON q.lang = d.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           MIN(target) AS target
    FROM ranked WHERE rk <= target
    GROUP BY lang ORDER BY lang
    """,
    # sqrt is IEEE-correctly-rounded in every engine, so T=0.5
    # temperature reweighting (w_l = n_l^T) is engine-exact — unlike
    # pow(x, 0.7), whose last-ulp drift across libms would break the
    # oracle. The division/multiplication chain runs on identical
    # operands in identical order.
    doc="Temperature-balanced language mixing (the multilingual "
    "sampling of mBERT/XLM, T=0.5): per-language quotas proportional "
    "to n^T upweight tail languages; documents are then picked by "
    "portable-hash rank within language — deterministic, no RNG. "
    "Output is the per-language sample manifest (sampled vs quota). "
    "Rank-within-group is a partitioned window (no global sort); at "
    "100 TB a label exceeding a partition budget salts through "
    "operators/skew.py. (operators/mixing.py family)",
    tags=("llm", "sampling", "mixing"),
)
def q_mix_temperature_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = n.withColumn("wt", F.sqrt(F.col("n_docs").cast("double")))
    tot = w.groupBy().agg(
        F.sum("n_docs").alias("total"), F.sum("wt").alias("wsum")
    )
    quota = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("CAST(round(wt / wsum * total) AS BIGINT)").alias("target"),
    )
    rk_w = Window.partitionBy("lang").orderBy(
        F.expr(TH.spark_str_hash_raw("CAST(doc_id AS STRING)")), "doc_id"
    )
    ranked = (
        docs.join(F.broadcast(quota), "lang")
        .withColumn("rk", F.row_number().over(rk_w))
        .where(F.col("rk") <= F.col("target"))
    )
    return (
        ranked.groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("target").alias("target"))
        .orderBy("lang")
    )


# --------------------------------------------- train/val/test split


@register(
    "q_split_train_val_test",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {TH.duck_str_hash_raw('CAST(doc_id AS VARCHAR)')} % 100 AS b
      FROM documents
    )
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM s
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    doc="Deterministic 80/10/10 train/val/test split manifest: bucket "
    "by portable content-free hash of the id (stable across runs, "
    "engines, and table growth — a doc never migrates splits), "
    "reported per (split, lang). Map-side only; the groupBy output is "
    "O(splits x langs). (functions/texthash.py)",
    tags=("llm", "sampling"),
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = F.expr(TH.spark_str_hash_raw("CAST(doc_id AS STRING)")) % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        docs.select(split, "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("split", "lang")
    )
