"""Fifth LLM-pipeline wave: corpus-LM document scoring, embedding
quantization, the distributed Gram matrix + PCA, class-balanced
sampling, and corpus snapshot diffing — the statistics/compression/
maintenance side of a training-data pipeline.

All but PCA are oracle-checked with exact cross-engine arithmetic:
LM familiarity is integer counts with one deterministic division,
quantization is a fixed double→int mapping both engines agree on, the
Gram matrix sums integer-scaled products into DECIMAL(38,0), the
balanced sampler ranks on the portable content-hash family with a
unique tiebreaker, and the snapshot diff compares md5 fingerprints.
PCA's driver-side eigendecomposition is pinned against numpy in tests
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import texthash as TH
from ..operators.lm import bigram_familiarity, duck_bigram_familiarity_sql
from ..operators.vector_agg import duck_gram_matrix_sql, gram_matrix
from ..sources.batch import load_table
from .registry import register

# ------------------------------------------------- bigram-LM scoring

_LM_MIN_COUNT = 3


@register(
    "q_text_lm_familiarity",
    oracle=duck_bigram_familiarity_sql(_LM_MIN_COUNT),
    doc="CCNet/KenLM-style quality signal: score every document by the "
    "fraction of its bigram occurrences the corpus itself has seen "
    ">= 3 times. Low familiarity = gibberish/OCR noise; ~1.0 = "
    "boilerplate. LM table is map-side-combined then min-count-pruned "
    "before the scoring join (broadcast when it fits, shuffle-hash "
    "otherwise); exact integer counts, one double division per doc. "
    "(operators/lm.py)",
    tags=("llm", "text", "ngram", "quality"),
)
def q_text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bigram_familiarity(docs, min_count=_LM_MIN_COUNT)


# ------------------------------------------------- int8 quantization

#: per-vector symmetric int8 range
_QMAX = 127.0


@register(
    "q_vector_quantize_int8",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             {_QMAX} / nullif(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 0.0) AS scale,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id, scale,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(list_transform(qv, v -> abs(v)), 'sum')
                AS BIGINT) AS q_l1,
           CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
           CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max
    FROM q
    ORDER BY vec_id
    """,
    doc="Symmetric per-vector int8 quantization (the storage/serving "
    "compression step for embedding indexes): scale = 127/max|x|, "
    "component -> floor(x*scale + 0.5). Map-only, no shuffle; the "
    "floor(+0.5) rounding is a fixed double->int mapping identical in "
    "both engines (round() half-even vs half-up would diverge). "
    "Catalog row pins exact integer digests (sum/L1/min/max) of every "
    "quantized vector plus the scale.",
    tags=("llm", "vector", "quantize"),
)
def q_vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = (
        f"transform(embedding, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * _scale + 0.5) AS BIGINT))"
    )
    return (
        emb.withColumn(
            "_scale",
            # nullif guards the all-zero vector: scale (and the digests)
            # go null instead of inf/NaN — identical in both engines.
            F.lit(_QMAX)
            / F.expr(
                "nullif(array_max(transform(embedding, "
                "x -> abs(CAST(x AS DOUBLE)))), 0.0D)"
            ),
        )
        .withColumn("_qv", F.expr(qv))
        .select(
            "vec_id",
            F.col("_scale").alias("scale"),
            F.expr("aggregate(_qv, 0L, (a, v) -> a + v)").alias("q_sum"),
            F.expr("aggregate(_qv, 0L, (a, v) -> a + abs(v))").alias("q_l1"),
            F.expr("array_min(_qv)").alias("q_min"),
            F.expr("array_max(_qv)").alias("q_max"),
        )
        .orderBy("vec_id")
    )


# ------------------------------------------------- Gram matrix (PCA)


@register(
    "q_vector_gram_matrix",
    oracle=duck_gram_matrix_sql("embeddings", "embedding"),
    doc="Distributed PCA building block: the d×d Gram matrix "
    "G[i,j] = Σ x_i·x_j over the corpus (upper triangle). Each row "
    "expands map-side into its d(d+1)/2 component products via one "
    "nested transform — no self-join — then a single map-side-"
    "combinable groupBy(i,j); the shuffle carries ≤ d²/2 rows per map "
    "task at any corpus size. Integer-scaled products summed exactly "
    "in DECIMAL(38,0). Eigendecomposition of the d² result happens "
    "driver-side. (operators/vector_agg.py)",
    tags=("llm", "vector", "pca"),
)
def q_vector_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(emb, "embedding").orderBy("i", "j")


# ------------------------------------------------- PCA projection

_PCA_K = 4


@register(
    "q_vector_pca_project",
    oracle=None,  # driver-side eigh is not SQL-expressible; semantics
    # pinned against numpy in tests/test_llm5.py (projection exactness,
    # orthonormality, variance ordering, partitioning invariance).
    doc="End-to-end distributed PCA: exact integer-scaled Gram matrix "
    "+ component sums reduce corpus-sized work to O(d²) driver rows, "
    "numpy.linalg.eigh runs on the d×d covariance driver-side, and "
    "the (d×k) component matrix is inlined as a literal expression so "
    "the projection pass is map-only JVM zip_with/aggregate — no UDF, "
    "no shuffle, no driver round-trip per row. Sign-fixed for "
    "reproducibility. (operators/pca.py)",
    tags=("llm", "vector", "pca"),
)
def q_vector_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_components, project

    emb = load_table(spark, sf_dir, "embeddings")
    comps, _ = pca_components(emb, _PCA_K)
    out = project(emb, comps)
    return out.select(
        "vec_id",
        *[F.expr(f"element_at(pca, {c + 1})").alias(f"p{c + 1}") for c in range(_PCA_K)],
    ).orderBy("vec_id")


@register(
    "q_vector_pca_invariants",
    # The eigendecomposition itself is driver-side numpy (not
    # SQL-expressible), but its defining invariants ARE engine-checkable:
    # the oracle pins the residuals the distributed projection pass must
    # reproduce to < 0.5 micro-units.  A wrong eigenvalue, a dropped
    # partition, or a mean/sign error turns a residual into O(λ)·1e6.
    oracle=f"""
    SELECT CAST(component AS INTEGER) AS component,
           CAST(var_resid_micro AS BIGINT) AS var_resid_micro,
           CAST(mean_resid_micro AS BIGINT) AS mean_resid_micro,
           CAST(orth_resid_micro AS BIGINT) AS orth_resid_micro
    FROM (VALUES {", ".join(f"({c + 1}, 0, 0, 0)" for c in range(_PCA_K))})
      AS t(component, var_resid_micro, mean_resid_micro, orth_resid_micro)
    ORDER BY component
    """,
    doc="Driver-visible PCA correctness surface: per-component "
    "eigen-invariants computed by a distributed aggregation over the "
    "projected corpus and returned as micro-unit residuals that must "
    "be exactly 0 — (a) population variance of projections equals the "
    "component's eigenvalue (Var[X·w_c] = λ_c), (b) projection mean "
    "equals mean·w_c, (c) components are orthonormal (CᵀC = I, "
    "computed from the same fitted matrix). Complements the rows-only "
    "q_vector_pca_project check with value-level verification the "
    "oracle can see. (operators/pca.py)",
    tags=("llm", "vector", "pca"),
)
def q_vector_pca_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators.pca import pca_fit, project

    emb = load_table(spark, sf_dir, "embeddings")
    comps, evals, mean, _ = pca_fit(emb, _PCA_K)
    k = comps.shape[1]
    orth = np.abs(comps.T @ comps - np.eye(k)).max(axis=1)
    mean_proj = mean @ comps  # expected projection mean per component
    lam_lit = ", ".join(f"{float(v)!r}D" for v in evals)
    mp_lit = ", ".join(f"{float(v)!r}D" for v in mean_proj)
    orth_lit = ", ".join(f"{float(v)!r}D" for v in orth)

    proj = project(emb, comps)
    ex = proj.select(
        F.posexplode(F.col("pca")).alias("cidx", "p")
    ).withColumn("component", (F.col("cidx") + 1).cast("int"))
    agg = ex.groupBy("component").agg(
        F.count("*").alias("n"),
        F.sum("p").alias("s1"),
        F.sum(F.expr("p * p")).alias("s2"),
    )
    return (
        agg.withColumn(
            "var_resid_micro",
            F.expr(
                f"CAST(round(abs(s2 / n - (s1 / n) * (s1 / n) "
                f"- element_at(array({lam_lit}), component)) * 1e6) AS BIGINT)"
            ),
        )
        .withColumn(
            "mean_resid_micro",
            F.expr(
                f"CAST(round(abs(s1 / n "
                f"- element_at(array({mp_lit}), component)) * 1e6) AS BIGINT)"
            ),
        )
        .withColumn(
            "orth_resid_micro",
            F.expr(
                f"CAST(round(element_at(array({orth_lit}), component) * 1e6) "
                f"AS BIGINT)"
            ),
        )
        .select(
            "component", "var_resid_micro", "mean_resid_micro", "orth_resid_micro"
        )
        .orderBy("component")
    )


# ------------------------------------------------- snapshot diff


@register(
    "q_corpus_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT doc_id, md5(text) AS fp, n_chars FROM documents
      WHERE doc_id % 7 <> 0
    ),
    snap_b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS fp,
             n_chars
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(COALESCE(b.n_chars, a.n_chars)) AS BIGINT) AS chars
    FROM snap_a a FULL OUTER JOIN snap_b b USING (doc_id)
    GROUP BY 1 ORDER BY status
    """,
    doc="Incremental corpus refresh audit: diff two crawl snapshots "
    "into added/removed/changed/unchanged via a full outer join on "
    "doc_id comparing content fingerprints (md5 — portable across "
    "engines). The join shuffles both sides once on the id (bucket "
    "both snapshots by doc_id at rest and it is co-located, shuffle-"
    "free); fingerprint compare and the status classification are "
    "map-side. The downstream incremental pipeline processes only "
    "the added+changed slice — the point of the diff at 100 TB.",
    tags=("llm", "diff", "join"),
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    snap_a = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5("text").alias("fp"), "n_chars"
    )
    snap_b = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("fp"),
        "n_chars",
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("a.fp").isNull(), F.lit("added"))
        .when(F.col("b.fp").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("b.n_chars"), F.col("a.n_chars")).alias("nc"),
        )
        .groupBy("status")
        .agg(F.count("*").alias("docs"), F.sum("nc").alias("chars"))
        .orderBy("status")
    )


# ------------------------------------------- class-balanced sampling

_BAL_PER_LABEL = 40


@register(
    "q_sample_balanced_label",
    oracle=f"""
    WITH h AS (
      SELECT label, vec_id,
             {TH.duck_str_hash("'bal:' || CAST(vec_id AS VARCHAR)")} AS hk
      FROM embeddings
    ),
    r AS (
      SELECT label, vec_id,
             row_number() OVER (PARTITION BY label ORDER BY hk, vec_id) AS rk
      FROM h
    )
    SELECT label, vec_id, rk FROM r WHERE rk <= {_BAL_PER_LABEL}
    ORDER BY label, rk
    """,
    doc="Class-balanced training subset: exactly N per label, chosen "
    "by ranking on a portable content hash (rand()-free, reproducible "
    "on any cluster/partitioning/engine) with vec_id as the unique "
    "tiebreaker. One shuffle keyed by label; rank state is O(1) per "
    "partition. Skewed-label caveat: a single giant class makes one "
    "partition hot — pre-aggregate with a per-label count and salt "
    "if a label exceeds a partition budget (operators/skew.py).",
    tags=("llm", "sample", "vector"),
)
def q_sample_balanced_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    h = emb.select(
        "label",
        "vec_id",
        F.expr(TH.spark_str_hash("concat('bal:', CAST(vec_id AS STRING))")).alias(
            "hk"
        ),
    )
    w = Window.partitionBy("label").orderBy("hk", "vec_id")
    return (
        h.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _BAL_PER_LABEL)
        .select("label", "vec_id", "rk")
        .orderBy("label", "rk")
    )
