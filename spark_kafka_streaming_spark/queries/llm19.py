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
    "|Q|*sqrt(n), so BOTH legs of the serving path are now "
    "sub-sqrt(n) per vector (operators/similarity.py::ivf_topk_imi). "
    "The vote/argmax stage is byte-identical to the exact form "
    "(knn_classify is neighbor-source-oblivious). The oracle replays "
    "seed centroids, the super split, both assignment levels, probe "
    "sets, cosines and tie-breaks in generated CTEs "
    "(duck_ivf2_topk_sql), with the cell count derived from the same "
    "corpus-count formula as auto_cells.",
    tags=("llm", "similarity", "classify"),
)
def q_knn_label_propagation_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk_imi, knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    nn = ivf_topk_imi(queries, corpus, k=5, n_cells=auto_cells(corpus.count()))
    return knn_classify(queries, corpus, k=5, neighbors=nn).orderBy("vec_id")
