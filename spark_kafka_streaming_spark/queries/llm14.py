"""Round-6 LLM-pipeline additions, second wave: BPE merge training
(the tokenizer-learning pass — Sennrich et al. 2016 on the
word-frequency table) and hard-negative mining (the contrastive-
training data pass for dense retrievers).

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no analytics analog — its scope is the Kafka receiver
(``PartitionedSimpleConsumerKafkaInputDStream.scala``); these extend
the §2c north-star text/similarity families per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..operators.bpe import N_MERGES, duck_bpe_encode_sql, duck_bpe_train_sql
from ..sources.batch import load_table
from .registry import register


@register(
    "q_text_bpe_train",
    oracle=duck_bpe_train_sql(N_MERGES),
    doc="BPE merge training (Sennrich 2016): learn the first "
    f"{N_MERGES} tokenizer merges from the corpus. Spark-first shape: "
    "the corpus collapses to the (word, freq) table in ONE shuffle and "
    "every merge step runs over that vocab-sized table (pair counts "
    "are freq-weighted, map-side combined; the argmax is a bounded "
    "1-row driver pull; the merge applies as one leftmost "
    "non-overlapping ' L R '→' LR ' replace pass over space-joined "
    "symbols — identical semantics in Spark and DuckDB, so the "
    "generated CTE oracle replays the whole schedule exactly). "
    "Training cost is independent of corpus size beyond the first "
    "aggregation — the property that makes tokenizer training on a "
    "100 TB crawl a vocab-sized problem. Deterministic (count desc, "
    "left, right) tiebreak. Distinct from q_text_collocations_lift "
    "(one-shot pair ranking): this learns the ORDERED merge list, "
    "where each step's counts see the previous merges applied.",
    tags=("llm", "text", "tokenizer"),
)
def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=N_MERGES).orderBy("rank")


@register(
    "q_text_bpe_encode",
    oracle=duck_bpe_encode_sql(N_MERGES),
    doc="BPE tokenizer APPLICATION (pairs with q_text_bpe_train): "
    "train the merge list (bounded driver pull), encode the VOCAB — "
    "each distinct word replays the per-step wrap→replace-all→trim "
    "pass as one chained map-only expression — then broadcast-join "
    "the encoded vocab back to the exploded corpus tokens. Per doc: "
    "word count, char count, post-merge symbol count, and the "
    "chars-per-token compression (tokenizer fertility). Encoding is "
    "vocab-sized + one corpus hash join — no per-document Python; at "
    "crawl scale a 10M-word vocab (~100 MB) still broadcasts, beyond "
    "that AQE falls back to shuffle-on-word. Oracle replays the "
    "identical schedule via the shared generated-CTE chain.",
    tags=("llm", "text", "tokenizer"),
)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode(docs, n_merges=N_MERGES).orderBy("doc_id")


_HN_K = 5
_HN_COS = V.duck_cosine(V.duck_dot("q.v", "c.v"), "q.n", "c.n")


@register(
    "q_similarity_hard_negatives",
    oracle=f"""
    WITH sv AS (
      SELECT vec_id, label, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    sn AS (SELECT vec_id, label, v, {V.duck_dot('v', 'v')} AS n FROM sv),
    q AS (SELECT * FROM sn WHERE vec_id < 10)
    SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim, rn
    FROM (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             {_HN_COS} AS cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id ORDER BY {_HN_COS} DESC, c.vec_id
             ) AS INT) AS rn
      FROM q JOIN sn c
        ON c.vec_id <> q.vec_id AND c.label <> q.label
    ) t WHERE rn <= {_HN_K}
    ORDER BY query_id, rn
    """,
    doc="Hard-negative mining for contrastive training: per query "
    "vector, the 5 most-similar corpus vectors with a DIFFERENT "
    "label — the near-misses a dense retriever must learn to "
    "separate (easy negatives are random; hard ones drive the loss). "
    "Label-mismatch evaluated inside the broadcast join so same-label "
    "rows never reach the ranking; exact integer-scaled cosines, "
    "(cos desc, id) tiebreak. Bounded query set is the contract — "
    "unbounded query sides route through the IVF candidate tier "
    "first, as q_knn_label_propagation_ann does.",
    tags=("llm", "similarity", "contrastive"),
)
def q_similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb.filter(F.col("vec_id") < 10), emb, k=_HN_K
    ).orderBy("query_id", "rn")
