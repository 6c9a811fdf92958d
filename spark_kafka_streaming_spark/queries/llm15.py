"""Round-6 (second half) LLM-pipeline additions: end-to-end VIDEO
frame-sampling decode (completing the image/audio/video multimodal
triad), bounded-memory exact heavy hitters (Misra-Gries 2-pass), graph
triangle counting, and Johnson-Lindenstrauss random projection with an
engine-exact distortion audit.

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no analytics analog of any of these — its scope is the Kafka
receiver (``PartitionedSimpleConsumerKafkaInputDStream.scala``); these
extend the §2c north-star families (multimodal, sketches, similarity)
per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..sources.batch import load_table
from .registry import register

# ----------------------------------------------------------- video

_VID_W, _VID_H = 8, 6  # per-frame raster (production: real resolutions)
_VID_EVERY = 2  # sample every 2nd frame
_VID_NPX = _VID_W * _VID_H * 3


@register(
    "q_multimodal_video_frames",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS n_frames FROM documents
    ),
    f AS (
      SELECT doc_id,
             unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT),
                                    {_VID_EVERY})) AS frame_no
      FROM d
    ),
    px AS (
      SELECT f.doc_id, f.frame_no,
             (f.doc_id * 7 + f.frame_no * 31 + y.y * 13 + x.x * 5
              + c.c * 3) % 256 AS v
      FROM f,
           generate_series(0, {_VID_H - 1}) y(y),
           generate_series(0, {_VID_W - 1}) x(x),
           generate_series(0, 2) c(c)
    )
    SELECT doc_id,
           CAST(frame_no AS INT) AS frame_no,
           CAST({_VID_W} AS INT) AS width,
           CAST({_VID_H} AS INT) AS height,
           CAST(SUM(v) AS BIGINT) AS sum_px,
           CAST(MAX(v) AS INT) AS max_px,
           CAST(SUM(v) AS DOUBLE) / {_VID_NPX} AS mean_px
    FROM px GROUP BY doc_id, frame_no
    ORDER BY doc_id, frame_no
    """,
    doc="End-to-end VIDEO decode with frame sampling, oracle-checked: "
    "per doc a deterministic clip of 4 + doc_id%5 frames (pixel "
    "(f,y,x,c) = (doc_id*7 + f*31 + y*13 + x*5 + c*3) mod 256) is "
    "encoded to REAL RIFF AVI bytes (hdrl/avih/strh/strf headers, "
    "movi list of 00db DIB rasters, idx1 index — "
    "operators/multimodal.py::encode_avi), then every 2nd frame is "
    "decoded back inside mapInPandas by decode_avi_frames, which "
    "walks the movi chunks and materializes ONLY the sampled rasters "
    "(unsampled frames are skipped by chunk size — the bounded-I/O "
    "shape a production frame sampler needs). The oracle recomputes "
    "per-frame pixel sums arithmetically without seeing the bytes, so "
    "any flipped bit in encode → chunk-walk → frame-skip → decode "
    "breaks the hash. At 100 TB payloads ride the columnar binary "
    "path; decode_avi_frames is the dispatch point where ffmpeg/cv2 "
    "take over for compressed codecs with the same sampled-frames "
    "contract.",
    tags=("llm", "multimodal", "video"),
)
def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import encode_avi, video_frame_features

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w, h, every = _VID_W, _VID_H, _VID_EVERY

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y = np.arange(h, dtype=np.int64)[:, None, None]
        x = np.arange(w, dtype=np.int64)[None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        base = y * 13 + x * 5 + c * 3
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                frames = [
                    ((d * 7 + f * 31 + base) % 256).astype(np.uint8)
                    for f in range(4 + d % 5)
                ]
                payloads.append(bytearray(encode_avi(frames)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payload_df = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return video_frame_features(payload_df, every_n=every).orderBy(
        "doc_id", "frame_no"
    )


# ---------------------------------------------------- heavy hitters

_HH_PHI = 0.002


@register(
    "q_text_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({TH.duck_tokens('text')}) AS token FROM documents
    ),
    f AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM f)
    SELECT token, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS frac
    FROM f, t
    WHERE cnt >= ceil({_HH_PHI} * n_total)
    ORDER BY token
    """,
    doc="Exact phi-heavy hitters (phi=0.002) over the corpus token "
    "stream via two bounded passes: a map-only Misra-Gries candidate "
    "pass (operators/sketches.py::misra_gries_candidates — at most "
    "`capacity` counters per task, weighted batch merge with the "
    "provable no-false-negative superset guarantee) and an exact "
    "count pass restricted to candidates by broadcast semi-join. The "
    "result is deterministic and identical to the full-groupBy answer "
    "— which is what the oracle computes — but at 100 TB the shuffle "
    "carries O(tasks * capacity) candidate rows plus counts for the "
    "candidate tokens only, never the full (billions-of-keys) "
    "distinct-token space.",
    tags=("llm", "sketch", "text"),
)
def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import heavy_hitters_exact

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(TH.spark_tokens("text"))).alias("token")
    )
    return heavy_hitters_exact(toks, "token", phi=_HH_PHI).orderBy("token")


# -------------------------------------------------------- triangles


@register(
    "q_graph_triangles",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    pairs AS (
      SELECT a.brand AS b1, b.brand AS b2, count(*) AS cnt
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    edges AS (
      SELECT b1, b2, cnt FROM pairs
      WHERE CAST(cnt AS DOUBLE) > (SELECT avg(CAST(cnt AS DOUBLE)) FROM pairs)
    )
    SELECT e1.b1 AS brand_a, e1.b2 AS brand_b, e2.b2 AS brand_c,
           CAST(least(e1.cnt, e2.cnt, e3.cnt) AS BIGINT) AS min_pair_cnt
    FROM edges e1
    JOIN edges e2 ON e2.b1 = e1.b2
    JOIN edges e3 ON e3.b1 = e1.b1 AND e3.b2 = e2.b2
    ORDER BY brand_a, brand_b, brand_c
    """,
    doc="Triangle enumeration on the brand co-occurrence graph: nodes "
    "are part brands, an edge joins brands co-occurring in the same "
    "order more often than the average pair (self-normalizing "
    "threshold, so the graph stays non-degenerate across scale "
    "factors), and triangles are found by the classic oriented "
    "3-join on b1<b2<b3 (each triangle counted once). Scale shape: "
    "the per-order brand set is bounded (≤7 lineitems/order), so the "
    "pair expansion is O(orders); the pair table collapses to "
    "≤|brands|² rows, and the triangle join runs broadcast over that "
    "bounded edge list — corpus-sized work is one hash join plus one "
    "aggregation.",
    tags=("llm", "graph"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2"))
        .agg(F.count("*").alias("cnt"))
    )
    avg_cnt = pairs.groupBy().agg(F.avg(F.col("cnt").cast("double")).alias("avg_cnt"))
    edges = (
        pairs.crossJoin(F.broadcast(avg_cnt))
        .filter(F.col("cnt").cast("double") > F.col("avg_cnt"))
        .select("b1", "b2", "cnt")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(F.broadcast(e2), F.col("e2.b1") == F.col("e1.b2"))
        .join(
            F.broadcast(e3),
            (F.col("e3.b1") == F.col("e1.b1")) & (F.col("e3.b2") == F.col("e2.b2")),
        )
        .select(
            F.col("e1.b1").alias("brand_a"),
            F.col("e1.b2").alias("brand_b"),
            F.col("e2.b2").alias("brand_c"),
            F.least(F.col("e1.cnt"), F.col("e2.cnt"), F.col("e3.cnt")).alias(
                "min_pair_cnt"
            ),
        )
        .orderBy("brand_a", "brand_b", "brand_c")
    )


# ----------------------------------------- JL random projection

_RP_D = 8  # target dimensionality
_RP_N = 40  # audited vector prefix (bounded pair sample)


def _rp_sign_spark(i: str, j: str) -> str:
    """±1 sign from a portable integer hash of (dim i, output dim j) —
    pure int64 arithmetic both engines agree on."""
    return f"(CASE WHEN (({i} * 2654435761L + {j} * 40503L + 12345L) % 7L) % 2L = 0 THEN 1L ELSE -1L END)"


def _rp_sign_duck(i: str, j: str) -> str:
    return f"(CASE WHEN (({i} * 2654435761 + {j} * 40503 + 12345) % 7) % 2 = 0 THEN 1 ELSE -1 END)"


@register(
    "q_vector_random_projection",
    oracle=f"""
    WITH sv AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id < {_RP_N}
    ),
    comp AS (
      SELECT vec_id, i, v[i + 1] AS x FROM (
        SELECT vec_id, v, unnest(generate_series(0, 63)) AS i FROM sv
      )
    ),
    proj AS (
      SELECT vec_id, j.j AS j,
             CAST(sum(x * {_rp_sign_duck('i', 'j.j')}) AS BIGINT) AS y
      FROM comp, generate_series(0, {_RP_D - 1}) j(j)
      GROUP BY vec_id, j.j
    ),
    norms AS (
      SELECT s.vec_id,
             CAST(list_sum(list_transform(s.v, e -> e * e)) AS BIGINT) AS orig_sq,
             p.proj_sq
      FROM sv s JOIN (
        SELECT vec_id, CAST(sum(y * y) AS BIGINT) AS proj_sq
        FROM proj GROUP BY vec_id
      ) p USING (vec_id)
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(a.orig_sq + b.orig_sq AS BIGINT) AS sq_sum,
           CAST(a.proj_sq + b.proj_sq AS BIGINT) AS proj_sq_sum,
           CAST(a.proj_sq + b.proj_sq AS DOUBLE)
             / ({_RP_D} * CAST(a.orig_sq + b.orig_sq AS DOUBLE)) AS norm_ratio
    FROM norms a JOIN norms b ON a.vec_id < b.vec_id
    ORDER BY id_a, id_b
    """,
    doc="Johnson-Lindenstrauss sign random projection 64→8 dims with "
    "an engine-exact distortion audit: the projection matrix is ±1 "
    "entries derived from a portable integer hash of (input dim, "
    "output dim) — no RNG state, any executor regenerates any matrix "
    "entry — applied to integer-scaled components so every projected "
    "coordinate and squared norm is an exact int64 in BOTH engines "
    "(no float summation order anywhere). The audit reports, per "
    "vector pair in a bounded sample, the JL norm-preservation ratio "
    "E[‖Rx‖²/d'] / ‖x‖² whose concentration around 1 is the JL lemma. "
    "Scale shape: projection is a map-only per-row transform (the "
    "matrix is a formula, not data — nothing is broadcast), the thing "
    "that makes 64× cheaper downstream ANN/clustering possible; the "
    "O(n²) audit leg is bounded to a fixed {_RP_N}-vector sample.",
    tags=("llm", "vector", "projection"),
)
def q_vector_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _RP_N)
    sv = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"
        ).alias("v"),
    )
    # projected coords: y_j = sum_i v_i * sign(i, j), exact int64
    proj_terms = ", ".join(
        f"aggregate(zip_with(v, sequence(0, size(v) - 1), "
        f"(x, i) -> x * {_rp_sign_spark('i', f'{j}L')}), 0L, (acc, e) -> acc + e)"
        for j in range(_RP_D)
    )
    norms = sv.select(
        "vec_id",
        F.expr("aggregate(transform(v, e -> e * e), 0L, (acc, e) -> acc + e)").alias(
            "orig_sq"
        ),
        F.expr(
            f"aggregate(transform(array({proj_terms}), y -> y * y), 0L, (acc, e) -> acc + e)"
        ).alias("proj_sq"),
    )
    a, b = norms.alias("a"), norms.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (F.col("a.orig_sq") + F.col("b.orig_sq")).alias("sq_sum"),
            (F.col("a.proj_sq") + F.col("b.proj_sq")).alias("proj_sq_sum"),
            (
                (F.col("a.proj_sq") + F.col("b.proj_sq")).cast("double")
                / (_RP_D * (F.col("a.orig_sq") + F.col("b.orig_sq")).cast("double"))
            ).alias("norm_ratio"),
        )
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------- video scene cuts

_CUT_DELTA = 20.0  # mean-pixel jump that counts as a scene cut


@register(
    "q_multimodal_video_scene_cuts",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS n_frames FROM documents
    ),
    f AS (
      SELECT doc_id,
             unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT),
                                    {_VID_EVERY})) AS frame_no
      FROM d
    ),
    px AS (
      SELECT f.doc_id, f.frame_no,
             (f.doc_id * 7 + f.frame_no * 31 + y.y * 13 + x.x * 5
              + c.c * 3) % 256 AS v
      FROM f,
           generate_series(0, {_VID_H - 1}) y(y),
           generate_series(0, {_VID_W - 1}) x(x),
           generate_series(0, 2) c(c)
    ),
    frames AS (
      SELECT doc_id, frame_no,
             CAST(SUM(v) AS DOUBLE) / {_VID_NPX} AS mean_px
      FROM px GROUP BY doc_id, frame_no
    ),
    deltas AS (
      SELECT doc_id, frame_no,
             mean_px - lag(mean_px) OVER (
               PARTITION BY doc_id ORDER BY frame_no
             ) AS delta
      FROM frames
    )
    SELECT doc_id,
           CAST(count(*) FILTER (delta IS NOT NULL) AS INT) AS n_transitions,
           CAST(count(*) FILTER (abs(delta) > {_CUT_DELTA}) AS INT) AS n_cuts,
           round(coalesce(max(abs(delta)), 0.0), 6) AS max_delta
    FROM deltas GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Scene-cut detection over the sampled-frame decode: per clip, "
    "consecutive sampled frames are compared by mean pixel level (a "
    "real cut detector swaps in an HSV histogram or feature distance "
    "— same plan shape) and jumps above a threshold count as cuts. "
    "Composes q_multimodal_video_frames' decode stage with a "
    "doc-partitioned lag window, so the whole detector is one "
    "mapInPandas pass plus one bounded per-clip window — the shape of "
    "shot segmentation for video-curation pipelines (sample frames → "
    "per-frame signal → temporal structure). The oracle recomputes "
    "frame means arithmetically and replays the same lag/threshold "
    "logic in SQL.",
    tags=("llm", "multimodal", "video"),
)
def q_multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    frames = q_multimodal_video_frames(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("frame_no")
    deltas = frames.withColumn(
        "delta", F.col("mean_px") - F.lag("mean_px").over(w)
    )
    return (
        deltas.groupBy("doc_id")
        .agg(
            F.count("delta").cast("int").alias("n_transitions"),
            F.sum(
                F.when(F.abs(F.col("delta")) > _CUT_DELTA, 1).otherwise(0)
            )
            .cast("int")
            .alias("n_cuts"),
            F.round(F.coalesce(F.max(F.abs(F.col("delta"))), F.lit(0.0)), 6).alias(
                "max_delta"
            ),
        )
        .orderBy("doc_id")
    )
