"""Round-6 retrieval composition queries: metadata-filtered vector
search and hybrid lexical+vector retrieval (Reciprocal Rank Fusion) —
the two serving shapes a RAG/retrieval stack runs on top of the ANN
and BM25 tiers this catalog already implements.

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no retrieval surface; these extend the §2c similarity/search
families per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions import vectors as V
from ..operators import index as IX
from ..sources.batch import load_table
from .registry import register

# ------------------------------------------------ filtered ANN


_EN_PRED = "id IN (SELECT doc_id FROM documents WHERE lang = 'en')"

#: SQL twin of ``auto_cells`` over the FILTERED corpus — the cell
#: count must scale with the indexed slice, not the full table
#: (parameterized-oracle pattern; see queries/llm13.py::auto_cells).
_EN_NCELLS_SQL = (
    "SELECT greatest(16, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) "
    "AS BIGINT)) FROM embeddings "
    "WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"
)


def _filtered_ann_oracle() -> str:
    from ..operators.similarity import duck_ivf_topk_sql

    return duck_ivf_topk_sql(
        5,
        "id < 10",
        corpus_pred=_EN_PRED,
        n_cells_sql=_EN_NCELLS_SQL,
    )


@register(
    "q_similarity_filtered_ann",
    oracle=_filtered_ann_oracle(),
    doc="Metadata-filtered vector search: ANN top-5 restricted to the "
    "corpus slice whose joined document metadata passes a predicate "
    "(lang = 'en'), the filtered-search mode every production vector "
    "store serves (permission scopes, language routing, freshness "
    "windows). The filter is applied to the INDEXED side before cell "
    "assignment — a semi-join against the metadata table — so cells, "
    "probes, and candidates all live in the filtered universe "
    "(pre-filtering; no post-filter recall loss at low selectivity). "
    "The cell count scales with the FILTERED slice (auto_cells over "
    "the predicate's survivors, same count formula in engine and "
    "oracle) so per-cell occupancy stays constant however selective "
    "the filter. Oracle: the generated IVF CTE twin with the same "
    "corpus predicate, same seed centroids, same probe set, same "
    "exact cosines and tiebreaks.",
    tags=("llm", "similarity", "filtered"),
)
def q_similarity_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk
    from .llm13 import auto_cells

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    corpus = emb.join(
        F.broadcast(en), emb.vec_id == en.doc_id, "left_semi"
    )
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10),
        corpus,
        k=5,
        n_cells=auto_cells(corpus.count()),
    ).orderBy("query_id", "rn")


# ------------------------------------------------ hybrid RRF

_RRF_K = 60  # the standard RRF damping constant
_LEG_K = 50  # per-leg candidate depth
_HYBRID_TOPK = 15
_QVEC_ID = 0  # the query vector (stands in for an encoded query text)


def _hybrid_oracle() -> str:
    terms = IX.BM25_TERMS
    tf_cols = ", ".join(
        f"CAST({IX.bm25_tf_case(t)} AS BIGINT) AS tf_{t}" for t in terms
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    idfq_cols = ", ".join(
        IX.bm25_idfq(f"s.df_{t}", "//") + f" AS idfq_{t}" for t in terms
    )
    score_cols = ", ".join(
        IX.BM25_SCORE.format(t=t) + f" AS s_{t}" for t in terms
    )
    total = f"s_{terms[0]}"
    for t in terms[1:]:
        total = f"({total} + s_{t})"
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({TH.duck_tokens('text')}) AS term FROM documents
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS dl, {tf_cols} FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl, {df_cols}
      FROM per_doc
    ),
    scored AS (
      SELECT d.doc_id, d.dl, {', '.join(f'd.tf_{t}' for t in terms)},
             s.n_docs, s.sum_dl, {idfq_cols}
      FROM per_doc d CROSS JOIN stats s
    ),
    final AS (SELECT doc_id, {score_cols} FROM scored),
    bm AS (
      SELECT doc_id, CAST(rn AS INT) AS bm25_rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY {total} DESC, doc_id
        ) AS rn FROM final
      ) WHERE rn <= {_LEG_K}
    ),
    sv AS (
      SELECT vec_id, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    sn AS (SELECT vec_id, v, {V.duck_dot('v', 'v')} AS n FROM sv),
    q AS (SELECT * FROM sn WHERE vec_id = {_QVEC_ID}),
    cosr AS (
      SELECT c.vec_id AS id, ROW_NUMBER() OVER (
        ORDER BY CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
                 / (sqrt(CAST(q.n AS DOUBLE)) * sqrt(CAST(c.n AS DOUBLE)))
                 DESC, c.vec_id
      ) AS rn
      FROM q JOIN sn c ON c.vec_id <> {_QVEC_ID}
    ),
    cv AS (SELECT id, CAST(rn AS INT) AS cos_rank FROM cosr WHERE rn <= {_LEG_K})
    SELECT COALESCE(b.doc_id, v.id) AS id, b.bm25_rank, v.cos_rank,
           (COALESCE(1.0 / ({_RRF_K} + b.bm25_rank), 0.0)
            + COALESCE(1.0 / ({_RRF_K} + v.cos_rank), 0.0)) AS rrf
    FROM bm b FULL JOIN cv v ON b.doc_id = v.id
    ORDER BY rrf DESC, id LIMIT {_HYBRID_TOPK}
    """


@register(
    "q_search_hybrid_rrf",
    oracle=_hybrid_oracle(),
    doc="Hybrid lexical+vector retrieval via Reciprocal Rank Fusion: "
    "the BM25 leg ranks documents for the multi-term query and the "
    "vector leg ranks by exact cosine to a query embedding (vec 0 "
    "stands in for the encoded query text); each doc's fused score is "
    "Σ 1/(60 + rank) over the legs it appears in (Cormack 2009), "
    "top-15 fused — the default serving recipe of every hybrid search "
    "stack (sparse recall + dense recall, fusion without score "
    "calibration). Rank fusion is deliberately score-free, so the "
    "fused ordering is engine-exact (ranks are integers; 1/(60+r) is "
    "one IEEE division). Scale shape: each leg is its own documented "
    "plan (BM25: one shuffle + broadcast stats; cosine: one corpus "
    "pass, bounded query side); fusion joins two ≤50-row rank lists.",
    tags=("llm", "search", "hybrid"),
)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    tok = docs.select(
        "doc_id", F.explode(F.expr(TH.spark_tokens("text"))).alias("term")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.expr(IX.bm25_tf_case(t)).cast("bigint").alias(f"tf_{t}")
            for t in IX.BM25_TERMS
        ],
    )
    w_bm = Window.orderBy(F.desc("score"), "doc_id")
    bm = (
        IX.bm25_score_per_doc(per_doc, topk=_LEG_K)
        .withColumn("bm25_rank", F.row_number().over(w_bm).cast("int"))
        .select("doc_id", "bm25_rank")
    )
    cv = (
        brute_force_topk(
            emb.filter(F.col("vec_id") == _QVEC_ID), emb, k=_LEG_K
        )
        .select(
            F.col("neighbor_id").alias("id"),
            F.col("rn").cast("int").alias("cos_rank"),
        )
    )
    return IX.rrf_fuse(bm, cv, rrf_k=_RRF_K, topk=_HYBRID_TOPK)


# ------------------------------------------- audio windowed features

_AW_N = 32  # samples per payload (matches q_multimodal_audio_decode)
_AW_RATE = 8000
_AW_WIN = 8


@register(
    "q_multimodal_audio_windows",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, unnest(generate_series(0, {_AW_N - 1})) AS i
      FROM documents
    ),
    v AS (
      SELECT doc_id, i, i // {_AW_WIN} AS win_no,
             (doc_id * 31 + i * 17) % 65536 - 32768 AS x
      FROM s
    ),
    zc AS (
      SELECT a.doc_id, a.win_no,
             SUM(CASE WHEN a.x * b.x < 0 THEN 1 ELSE 0 END) AS z
      FROM v a JOIN v b
        ON b.doc_id = a.doc_id AND b.i = a.i + 1
       AND b.win_no = a.win_no
      GROUP BY a.doc_id, a.win_no
    )
    SELECT v.doc_id AS doc_id,
           CAST(v.win_no AS INT) AS win_no,
           CAST(SUM(v.x * v.x) AS BIGINT) AS energy,
           CAST(MAX(zc.z) AS INT) AS n_zero_cross,
           CAST(MAX(abs(v.x)) AS INT) AS peak
    FROM v JOIN zc ON zc.doc_id = v.doc_id AND zc.win_no = v.win_no
    GROUP BY v.doc_id, v.win_no
    ORDER BY v.doc_id, win_no
    """,
    doc="Windowed audio features over real decoded PCM — short-time "
    "energy, zero-crossing count, and peak per non-overlapping "
    "8-sample frame, the voice-activity-detection / "
    "speech-segmentation front-end (the audio twin of "
    "q_multimodal_video_scene_cuts' per-frame signal). The payload "
    "rides the same encode → RIFF chunk-walk → decode path as "
    "q_multimodal_audio_decode; the oracle recomputes every window's "
    "integer-exact stats arithmetically without seeing the bytes, so "
    "a flipped bit or a mis-sliced window breaks the hash. At 100 TB "
    "the per-window fan-out stays inside the Arrow batch (rows out = "
    "4 per clip here; real audio emits ~100 frames/s) and the "
    "features feed the usual downstream filters (silence drop, "
    "music/speech routing).",
    tags=("llm", "multimodal", "audio"),
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import audio_window_features, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n, rate, win = _AW_N, _AW_RATE, _AW_WIN

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(n, dtype=np.int64)
        for pdf in batches:
            payloads = [
                bytearray(
                    encode_wav(
                        ((int(did) * 31 + i * 17) % 65536 - 32768).astype("<i2"),
                        rate,
                    )
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payload_df = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return audio_window_features(payload_df, win=win).orderBy(
        "doc_id", "win_no"
    )
