"""Round-8 LLM-pipeline additions: the two-level (IMI) quantizer on
the SERVING side — round 7 shipped it for the index BUILD leg
(``ivf_topk_imi``); this routes the label-propagation query side
through it too, closing the one super-linear term left in the serving
path (single-level probing is |Q|·√n assignment dots per query wave;
two-level is |Q|·O(n^¼) + probed members).

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no analytics analog — its scope is the Kafka receiver
(``PartitionedSimpleConsumerKafkaInputDStream.scala``); these extend
the §2c north-star similarity family per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import duck_ivf2_topk_sql
from ..sources.batch import load_table
from .llm13 import _LABELED_PRED, _NCELLS_SQL, _votes_sql, auto_cells
from .registry import register


def _duck_emb_lsh_scaled_oracle() -> str:
    from ..operators.similarity import duck_cosine_dup_pairs_sql

    return duck_cosine_dup_pairs_sql(0.9, planes_per_band=24, bands=8)


@register(
    "q_dedup_embedding_lsh_scaled",
    oracle=_duck_emb_lsh_scaled_oracle(),
    doc="The embedding-LSH pair query at the CORPUS-SCALED geometry "
    "(24 planes x 8 bands, threshold 0.9): hyperplane-LSH's random "
    "per-band collision rate is 2^-planes, so at n vectors the "
    "expected random candidate count is C(n,2)*bands*2^-planes — "
    "planes must grow like log2(n) (+ ~3 for headroom) to keep it "
    "O(n). The catalog default (6x8, tuned for the <=20k driver "
    "corpora) random-collides ~10^11 candidate pairs at 2M vectors "
    "(found live at the fourth decade as a disk-spill wall); this "
    "geometry is the 2M-vector operating point: ~10^6 random "
    "candidates, 92% recall at cosine 0.99 (planted-pair recovery "
    "pinned in tests/test_embedding_planted_pairs.py, oracle replays "
    "hyperplanes/keys/candidates/cosines bit-for-bit). Empty at the "
    "driver corpora (no >=0.9 pairs exist there) — the non-empty "
    "oracle cross-check runs on the planted-pair fixture.",
    tags=("llm", "dedup", "embedding", "lsh", "scale"),
)
def q_dedup_embedding_lsh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(
        emb, threshold=0.9, n_planes=24, n_bands=8
    ).orderBy("id1", "id2")


#: Planted-pair construction shared by the Spark query and its DuckDB
#: oracle: an id-sampled slice (1-in-PLANT_MOD) is re-emitted with a
#: +2^-5 perturbation on coordinate 1 and ids offset by PLANT_OFFSET.
#: 2^-5 is exactly representable, and float32→double is exact, so the
#: perturbed doubles — and therefore the scaled int64 vectors, band
#: keys, candidate set, and cosines — are bit-identical in both
#: engines at ANY sf.  cosine(original, planted) ≈ 0.9995 ≥ 0.9 and
#: the 24-plane per-band miss rate at that angle is ~0.21 (8 bands →
#: ~4e-6 joint miss), so the row set is non-empty wherever the table
#: is.
PLANT_MOD = 20
PLANT_OFFSET = 10_000_000

#: Corpus contract (round-9 advice): planted ids are ``vec_id +
#: PLANT_OFFSET``, so a corpus containing vec_id >= PLANT_OFFSET would
#: silently collide planted ids with real ones (duplicate vec_id rows
#: in corpus and universe) — the oracle replays the same construction
#: so the differential check would stay green while the query's own
#: semantics degrade.  The guard is embedded in the base projection so
#: every corpus row is checked during the scan (no extra pass) and a
#: violation fails loudly in BOTH planted entries.
_VEC_ID_GUARD = (
    f"CASE WHEN vec_id >= {PLANT_OFFSET} THEN raise_error("
    f"'planted-pair corpus contract violated: vec_id >= PLANT_OFFSET="
    f"{PLANT_OFFSET} collides with planted ids') ELSE vec_id END "
    "AS vec_id"
)


def _duck_emb_lsh_planted_oracle() -> str:
    from ..operators.similarity import duck_cosine_dup_pairs_sql

    planted_table = f"""(
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET} AS vec_id,
             list_prepend(e[1] + 0.03125, e[2:]) AS embedding
      FROM (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings WHERE vec_id % {PLANT_MOD} = 0)
    )"""
    return duck_cosine_dup_pairs_sql(
        0.9, table=planted_table, planes_per_band=24, bands=8
    )


@register(
    "q_dedup_embedding_lsh_scaled_planted",
    oracle=_duck_emb_lsh_planted_oracle(),
    doc="The corpus-scaled LSH geometry (24x8) exercised on a NON-EMPTY "
    "pair set at every sf: the corpus is unioned with a deterministic "
    "exactly-representable perturbation (+2^-5 on coordinate 1, ids "
    "offset 10^7) of a 1-in-20 id sample, so ~n/20 true near-dup pairs "
    "(cos ~0.9995) exist wherever the table does.  Closes the round-8 "
    "gap where q_dedup_embedding_lsh_scaled was trivially green at "
    "sf0.01 (0 rows == 0 rows): here the driver hash pins the scaled "
    "geometry's banding, candidate join, and verify stage on real "
    "pairs, with the oracle replaying the identical plant (the "
    "perturbation is exact in double, so scaled vectors, band keys, "
    "candidates, and cosines agree bit-for-bit).  The planted-recovery "
    "quality bar stays in tests/test_embedding_planted_pairs.py.",
    tags=("llm", "dedup", "embedding", "lsh", "scale"),
)
def q_dedup_embedding_lsh_scaled_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity import DIM, cosine_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.selectExpr(
        _VEC_ID_GUARD,
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding",
    )
    planted = base.filter(F.col("vec_id") % PLANT_MOD == 0).selectExpr(
        f"vec_id + {PLANT_OFFSET} AS vec_id",
        "concat(array(element_at(embedding, 1) + 0.03125D), "
        f"slice(embedding, 2, {DIM - 1})) AS embedding",
    )
    return cosine_dup_pairs(
        base.unionByName(planted), threshold=0.9, n_planes=24, n_bands=8
    ).orderBy("id1", "id2")


def _duck_emb_clusters_scaled_oracle() -> str:
    from ..operators.similarity import duck_cosine_dup_pairs_sql

    planted_table = f"""(
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET} AS vec_id,
             list_prepend(e[1] + 0.03125, e[2:]) AS embedding
      FROM (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings WHERE vec_id % {PLANT_MOD} = 0)
    )"""
    pairs_sql = duck_cosine_dup_pairs_sql(
        0.9, table=planted_table, planes_per_band=24, bands=8
    )
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs_sql}
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION
      SELECT id2, id1 FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    universe AS (
      SELECT vec_id FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET} AS vec_id
      FROM embeddings WHERE vec_id % {PLANT_MOD} = 0
    )
    SELECT u.vec_id,
           COALESCE(c.cluster_id, u.vec_id) AS cluster_id,
           COALESCE(c.cluster_id, u.vec_id) = u.vec_id AS is_survivor
    FROM universe u LEFT JOIN comp c ON c.vec_id = u.vec_id
    ORDER BY u.vec_id
    """


@register(
    "q_dedup_clusters_embedding_scaled",
    oracle=_duck_emb_clusters_scaled_oracle(),
    doc="Full pairs→components→survivors dedup resolution on the "
    "embedding tier at the CORPUS-SCALED LSH geometry (24 planes x 8 "
    "bands, threshold 0.9) over the planted-pair corpus (same exact "
    "+2^-5 plant as q_dedup_embedding_lsh_scaled_planted, so true "
    "near-dup clusters exist at every sf). Closes the catalog-level "
    "gap the round-9 breadth batch measured: q_dedup_clusters_embedding "
    "at the default 6x8 geometry random-collides ~10^11 candidates at "
    "2M vectors (the round-8 plane-count find) and spills; the SAME "
    "clusters stage at this geometry completes 2M vectors in 68.4 s "
    "(SCALE.md round 9), because planes grow with log2(n). This entry "
    "makes the scale path driver-verifiable end-to-end: the oracle "
    "replays the plant, the 24x8 banding, the exact cosine verify, and "
    "the components by recursive transitive closure bit-for-bit. "
    "(operators/clusters.py, operators/similarity.py)",
    tags=("llm", "dedup", "embedding", "clusters", "scale"),
)
def q_dedup_clusters_embedding_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.clusters import dedup_survivors
    from ..operators.similarity import DIM, cosine_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.selectExpr(
        _VEC_ID_GUARD,
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding",
    )
    planted = base.filter(F.col("vec_id") % PLANT_MOD == 0).selectExpr(
        f"vec_id + {PLANT_OFFSET} AS vec_id",
        "concat(array(element_at(embedding, 1) + 0.03125D), "
        f"slice(embedding, 2, {DIM - 1})) AS embedding",
    )
    corpus = base.unionByName(planted)
    pairs = cosine_dup_pairs(corpus, threshold=0.9, n_planes=24, n_bands=8)
    return dedup_survivors(
        pairs, corpus.select("vec_id"), id_col="vec_id"
    ).orderBy("vec_id")


@register(
    "q_knn_label_propagation_imi",
    oracle=_votes_sql(
        duck_ivf2_topk_sql(
            5,
            "id % 5 = 0",
            corpus_pred="id % 5 <> 0",
            n_cells_sql=_NCELLS_SQL,
        )
    ),
    doc="k-NN label propagation with the TWO-LEVEL (IMI) quantizer on "
    "the QUERY side (pairs with q_knn_label_propagation_ann, which "
    "probes single-level cells): each query scores the floor(sqrt("
    "n_cells)) super-centroids and ranks only its 2 probed supers' "
    "member cells — |Q|*O(n^(1/4)) assignment dots instead of "
    "|Q|*sqrt(n) (operators/similarity.py::ivf_topk_imi). MEASURED "
    "TRADE at sqrt(n) cells (SCALE.md round 8): the restricted "
    "candidate set skews cell occupancy ~4x (max cell 3655 vs 942 "
    "single-level at 160k vectors), so the per-cell cogroup matmuls "
    "run hotter and the WALL is ~2x the single-level form at sf10 and "
    "sf100 — assignment dots are not the serving bottleneck at this "
    "scale. Single-level probing stays the propagation default at "
    "sqrt(n) cells; this entry pins the two-level serving form "
    "(oracle: duck_ivf2_topk_sql generated CTEs, cell count derived "
    "from the same corpus-count formula as auto_cells) for the "
    "n_cells >= ~10^4 regime where scoring all cells dominates — now "
    "MEASURED, not deferred (SCALE.md round 9): at 2M vectors and "
    "n_cells=10^4 the two-level route is 5.9x FASTER (28.1 s vs "
    "164.6 s, tools/imi_headtohead.py; the single-level leg only "
    "completes at all after the _cells_arrow row-blocking fix — its "
    "batch x n_cells score matrix OOM-killed the box at 10^4 cells). "
    "The vote/argmax stage is byte-identical to the exact form "
    "(knn_classify is neighbor-source-oblivious).",
    tags=("llm", "similarity", "classify"),
)
def q_knn_label_propagation_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk_imi, knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    nn = ivf_topk_imi(queries, corpus, k=5, n_cells=auto_cells(corpus.count()))
    return knn_classify(queries, corpus, k=5, neighbors=nn).orderBy("vec_id")
