"""Round-5 LLM-pipeline additions: span-level exact-substring dedup,
end-to-end audio decode, k-NN label propagation, and exact MIPS —
the four operator families a training-data pipeline needs that the
round-4 catalog did not yet cover.

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no analytics analog of any of these — its scope is the Kafka
receiver (``PartitionedSimpleConsumerKafkaInputDStream.scala``); these
extend the §2c north-star families (dedup, similarity, multimodal)
per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions import vectors as V
from ..sources.batch import load_table
from .registry import register

_SPAN_W = 5  # window width in tokens (production w≈50; 5 suits the corpus)


def _span_oracle(w: int) -> str:
    win = f"array_to_string(toks[i:i+{w - 1}], ' ')"
    return f"""
    WITH base AS (
      SELECT doc_id,
             {TH.duck_tokens('text')} AS toks,
             len({TH.duck_tokens('text')}) AS n_tokens
      FROM documents
    ),
    occ AS (
      SELECT doc_id,
             unnest(generate_series(1, n_tokens - {w - 1})) AS pos,
             unnest(list_transform(generate_series(1, n_tokens - {w - 1}),
                    i -> {TH.duck_str_hash_raw(win)})) AS h
      FROM base WHERE n_tokens >= {w}
    ),
    stats AS (
      SELECT h, count(*) AS cnt, min(doc_id * 4294967296 + pos) AS canon
      FROM occ GROUP BY h
    ),
    removable AS (
      SELECT occ.doc_id, occ.pos
      FROM occ JOIN stats USING (h)
      WHERE stats.cnt > 1 AND occ.doc_id * 4294967296 + occ.pos <> stats.canon
    ),
    dup_w AS (
      SELECT doc_id, count(*) AS n_dup_windows FROM removable GROUP BY doc_id
    ),
    cov AS (
      SELECT doc_id, count(*) AS n_dup_tokens FROM (
        SELECT DISTINCT doc_id, p FROM (
          SELECT doc_id, unnest(generate_series(pos, pos + {w - 1})) AS p
          FROM removable
        )
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS INT) AS n_tokens,
           CAST(greatest(b.n_tokens - {w - 1}, 0) AS INT) AS n_windows,
           CAST(COALESCE(d.n_dup_windows, 0) AS INT) AS n_dup_windows,
           CAST(COALESCE(c.n_dup_tokens, 0) AS INT) AS n_dup_tokens,
           round(CASE WHEN b.n_tokens = 0 THEN 0.0
                 ELSE CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / b.n_tokens
                 END, 6) AS dup_frac
    FROM base b
    LEFT JOIN dup_w d ON b.doc_id = d.doc_id
    LEFT JOIN cov c ON b.doc_id = c.doc_id
    ORDER BY b.doc_id
    """


@register(
    "q_dedup_substring_spans",
    oracle=_span_oracle(_SPAN_W),
    doc="Span-level exact-substring duplication accounting (the "
    "suffix-array dedup of Lee et al. 2022, re-expressed as a "
    "positional window-hash shuffle): every w-token window at every "
    "position is 60-bit-hashed; windows occurring >1 time corpus-wide "
    "keep one canonical occurrence (global min (doc,pos)) and the "
    "rest are removable; per doc the overlapping removable spans are "
    "merged by position-set union into an exact removable-token "
    "count. Linear in corpus tokens — the one dedup tier with no "
    "pair join even in the candidate space.",
    tags=("llm", "dedup", "spans"),
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import substring_span_stats

    docs = load_table(spark, sf_dir, "documents")
    return substring_span_stats(docs, w=_SPAN_W).orderBy("doc_id")


_AUDIO_N = 32  # synthetic samples per payload
_AUDIO_RATE = 8000


@register(
    "q_multimodal_audio_decode",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, unnest(generate_series(0, {_AUDIO_N - 1})) AS i
      FROM documents
    ),
    v AS (
      SELECT doc_id, i,
             (doc_id * 31 + i * 17) % 65536 - 32768 AS x
      FROM s
    )
    SELECT doc_id,
           CAST({_AUDIO_N} AS INT) AS n_samples,
           CAST({_AUDIO_RATE} AS INT) AS sample_rate,
           CAST(SUM(x) AS DOUBLE) / {_AUDIO_N} AS mean_amp,
           sqrt(CAST(SUM(x * x) AS DOUBLE) / {_AUDIO_N}) AS rms,
           CAST(MAX(abs(x)) AS INT) AS peak
    FROM v GROUP BY doc_id ORDER BY doc_id
    """,
    doc="End-to-end audio decode, oracle-checked: per-doc int16 PCM "
    "samples are a deterministic function of doc_id (sample i = "
    "(doc_id*31 + i*17) mod 65536 − 32768), encoded to REAL RIFF/WAVE "
    "bytes (fmt + LIST + data chunk walk on the wire), decoded back "
    "by operators/multimodal.py::decode_wav inside mapInPandas and "
    "reduced to integer-exact waveform stats (mean, RMS, peak). The "
    "oracle never sees the bytes — it recomputes the stats "
    "arithmetically, so any flipped bit in encode → chunk-walk → "
    "decode → reduce breaks the match. int64 sample sums and sums of "
    "squares are exact in double; the /n division and sqrt are "
    "deterministic IEEE ops shared by both engines. At 100 TB the "
    "payloads ride the columnar binary path and decode_wav is the "
    "dispatch point where soundfile/ffmpeg take over for compressed "
    "audio.",
    tags=("llm", "multimodal", "audio"),
)
def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import audio_features, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n, rate = _AUDIO_N, _AUDIO_RATE

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
    return audio_features(payload_df).orderBy("doc_id")


_DUCK_SN_CTE = f"""
    sv AS (
      SELECT vec_id, label, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    sn AS (
      SELECT vec_id, label, v, {V.duck_dot('v', 'v')} AS n FROM sv
    )
"""


@register(
    "q_knn_label_propagation",
    oracle=f"""
    WITH {_DUCK_SN_CTE},
    q AS (SELECT * FROM sn WHERE vec_id % 5 = 0 AND vec_id < 500),
    c AS (SELECT * FROM sn WHERE vec_id % 5 <> 0),
    nn AS (
      SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
                 / (sqrt(CAST(q.n AS DOUBLE)) * sqrt(CAST(c.n AS DOUBLE)))
                 AS cos_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY
                   CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
                     / (sqrt(CAST(q.n AS DOUBLE)) * sqrt(CAST(c.n AS DOUBLE)))
                   DESC, c.vec_id
               ) AS rn
        FROM q JOIN c ON c.vec_id <> q.vec_id
      ) t WHERE rn <= 5
    ),
    votes AS (
      SELECT nn.query_id, c.label AS nbr_label,
             count(*) AS n_votes, max(nn.cos_sim) AS top_cos
      FROM nn JOIN c ON c.vec_id = nn.neighbor_id
      GROUP BY nn.query_id, c.label
    )
    SELECT query_id AS vec_id,
           nbr_label AS predicted_label,
           CAST(n_votes AS INT) AS n_votes,
           top_cos
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY n_votes DESC, nbr_label
      ) AS rk FROM votes
    ) t WHERE rk = 1
    ORDER BY vec_id
    """,
    doc="k-NN label propagation, exact BOUNDED form: labels exist for "
    "80% of vectors (vec_id mod 5 <> 0 plays the labeled slice); each "
    "query takes the majority label of its 5 nearest labeled neighbors "
    "by exact cosine, deterministic (votes desc, label asc) tiebreak — "
    "the label-a-sample-then-propagate pattern of corpus curation "
    "(quality tags, topic routing, toxicity flags). The query side is "
    "BOUNDED (vec_id < 500 ∩ unlabeled ⇒ ≤100 queries at any sf) so "
    "the brute-force neighbor stage stays O(100·|C|) — this is the "
    "truth leg; the production form over the FULL unlabeled slice is "
    "q_knn_label_propagation_ann (IVF candidates), agreement pinned "
    "by q_knn_propagation_agreement.",
    tags=("llm", "similarity", "classify"),
)
def q_knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 500))
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    return knn_classify(queries, corpus, k=5).orderBy("vec_id")


@register(
    "q_similarity_mips_topk",
    oracle=f"""
    WITH sv AS (
      SELECT vec_id, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    q AS (SELECT * FROM sv WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
               / ({float(V.SCALE)} * {float(V.SCALE)}) AS ip
      FROM q JOIN sv c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, ip, rn FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY ip DESC, neighbor_id
      ) AS INT) AS rn FROM scored
    ) t WHERE rn <= 5
    ORDER BY query_id, rn
    """,
    doc="Exact maximum-inner-product top-5 for 10 query vectors — the "
    "retrieval ranking cosine ANN cannot serve (popular passages "
    "legitimately carry larger norms). int64 dot products over "
    "integer-scaled components make the reported ip engine-exact. "
    "Scale path: the Bachrach 2014 norm-augmentation (append "
    "sqrt(M²−‖x‖²) to corpus vectors, 0 to queries) reduces MIPS to "
    "cosine so the existing LSH/IVF tiers index it unchanged — this "
    "exact form is that reduction's oracle (order-equivalence "
    "asserted in tests).",
    tags=("llm", "similarity", "mips"),
)
def q_similarity_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mips_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mips_topk(emb.filter(F.col("vec_id") < 10), emb, k=5).orderBy(
        "query_id", "rn"
    )
