"""Round-3 third wave: mergeable sketches and corpus-search indexing.

* Count-Min sketch + point-query error audit (``q_sketch_count_min``)
* portable HyperLogLog registers + raw estimate (``q_sketch_hll``)
* inverted-index construction with skew-capped postings
  (``q_text_inverted_index``)
* per-document n-gram novelty scoring (``q_ngram_novelty``)
* Bloom-filter benchmark decontamination (``q_decontaminate_bloom``)

The sketch tier is the 100 TB answer to "keyed statistics over more
keys than fit anywhere": each sketch is fixed-size and mergeable, so
partial aggregation collapses the shuffle to O(sketch) and the same
merge runs per micro-batch on a stream (``tests/test_llm8.py``).
Unlike the engine-native ``approx_count_distinct`` (rows-only entry
``q_agg_approx`` — HLL++ internals are engine-specific), these are
built on the portable md5 hash family, so DuckDB reproduces every
register/counter/bit exactly.

No analog in the reference — its one aggregate is the windowed word
count (``KafkaWordCount.scala:70-73``); the inverted index is the
batch-corpus generalization of exactly that word count into a search
structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators import index as IX
from ..operators import sketches as SK
from ..operators.signatures import signature_table
from ..sources.batch import load_table
from .registry import register

_EVAL_MOD = 97  # same eval slice as q_decontaminate_ngram (llm3.py)
_TOPK_USERS = 20
_POSTINGS_CAP = IX.POSTINGS_CAP

_CMS_VALUES = "(VALUES " + ", ".join(f"({i})" for i in range(SK.CMS_D)) + ") t(i)"
_BLOOM_VALUES = "(VALUES " + ", ".join(f"({j})" for j in range(SK.BLOOM_K)) + ") t(j)"


# --------------------------------------------------------- Count-Min


_DUCK_H = TH.duck_str_hash("CAST(user_id AS VARCHAR)")


@register(
    "q_sketch_count_min",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id, {_DUCK_H} AS h FROM events
    ),
    cells AS (
      SELECT i AS r, CAST({SK.duck_cms_bucket_sql('h')} AS INT) AS b
      FROM keyed CROSS JOIN {_CMS_VALUES}
    ),
    sk AS (
      SELECT r, b, COUNT(*) AS cnt FROM cells GROUP BY r, b
    ),
    truth AS (
      SELECT user_id, h, COUNT(*) AS true_cnt FROM keyed GROUP BY user_id, h
    ),
    probes AS (
      SELECT user_id, true_cnt, i AS r,
             CAST({SK.duck_cms_bucket_sql('h')} AS INT) AS b
      FROM truth CROSS JOIN {_CMS_VALUES}
    ),
    est AS (
      SELECT user_id, true_cnt, MIN(cnt) AS est_cnt
      FROM probes JOIN sk USING (r, b)
      GROUP BY user_id, true_cnt
    )
    SELECT user_id, true_cnt, est_cnt, est_cnt - true_cnt AS overcount
    FROM est
    ORDER BY true_cnt DESC, user_id
    LIMIT {_TOPK_USERS}
    """,
    doc="Count-Min sketch over event user_ids ({d}×{w} geometry) and "
    "its point-query audit for the top-{k} users: estimate = min over "
    "the d hash rows, overcount = collision inflation (never "
    "negative — CMS errs one-sidedly). The sketch is a fixed-size "
    "mergeable summary: map-side partial agg makes the build shuffle "
    "O(d·w) per partition regardless of corpus size, and the probe "
    "broadcasts the sketch. operators/sketches.py; portable hash "
    "family ⇒ every counter matches DuckDB exactly.".format(
        d=SK.CMS_D, w=SK.CMS_W, k=_TOPK_USERS
    ),
    tags=("sketch", "llm"),
)
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sketch = SK.cms_build(ev, "user_id")
    truth = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    est = SK.cms_estimate(truth.select("user_id"), sketch, "user_id")
    return (
        truth.join(est, "user_id")
        .select(
            "user_id",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("true_cnt"), "user_id")
        .limit(_TOPK_USERS)
    )


# ------------------------------------------------------- HyperLogLog


#: alpha·m²·2^SHIFT — the raw-estimate numerator as one double literal
#: shared by both engines (division by the exact integer harmonic sum
#: is then bit-identical IEEE).
_HLL_NUM = SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M * float(1 << SK.HLL_SHIFT)

_DUCK_HRAW = TH.duck_str_hash_raw("CAST(user_id AS VARCHAR)")


@register(
    "q_sketch_hll",
    oracle=f"""
    WITH hashed AS (
      SELECT {_DUCK_HRAW} AS hr FROM events
    ),
    touched AS (
      SELECT CAST(hr // {1 << SK.HLL_WBITS} AS INT) AS bucket,
             MAX({SK.duck_hll_rank_sql(f"(hr % {1 << SK.HLL_WBITS})")}) AS r
      FROM hashed GROUP BY bucket
    ),
    regs AS (
      SELECT s.bucket, CAST(COALESCE(t.r, 0) AS INT) AS r
      FROM (SELECT CAST(unnest(generate_series(0, {SK.HLL_M - 1})) AS INT)
              AS bucket) s
      LEFT JOIN touched t USING (bucket)
    ),
    summary AS (
      SELECT CAST({SK.HLL_M} AS BIGINT) AS m,
             CAST(SUM((1::BIGINT) << ({SK.HLL_SHIFT} - r)) AS BIGINT)
               AS sum_scaled,
             CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty
      FROM regs
    )
    SELECT m, sum_scaled, n_empty,
           CAST({_HLL_NUM!r} AS DOUBLE) / CAST(sum_scaled AS DOUBLE)
             AS raw_est,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS true_distinct
    FROM summary
    """,
    doc="Portable HyperLogLog over event user_ids: m={m} registers "
    "from the 60-bit md5 hash (top {b} bits pick the bucket, leading "
    "zeros of the rest set the rank), harmonic sum kept as an exact "
    "scaled integer Σ2^(SHIFT−r), raw estimate α·m²/S as one shared "
    "double literal divided by that integer — so even the estimate is "
    "bit-identical cross-engine. n_empty makes the linear-counting "
    "correction derivable. The register table is the mergeable unit "
    "(bucket-wise max); build shuffle is O(m) per partition. "
    "Complements rows-only q_agg_approx (engine-native HLL++). "
    "operators/sketches.py.".format(m=SK.HLL_M, b=SK.HLL_B),
    tags=("sketch", "llm"),
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    regs = SK.hll_registers(ev, "user_id")
    summary = regs.agg(
        F.lit(SK.HLL_M).cast("bigint").alias("m"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {SK.HLL_SHIFT} - r)")
        ).alias("sum_scaled"),
        F.sum(F.expr("CASE WHEN r = 0 THEN 1 ELSE 0 END")).alias("n_empty"),
    )
    truth = ev.agg(F.countDistinct("user_id").alias("true_distinct"))
    return summary.crossJoin(F.broadcast(truth)).select(
        "m",
        "sum_scaled",
        "n_empty",
        F.expr(f"{_HLL_NUM!r}D / CAST(sum_scaled AS DOUBLE)").alias("raw_est"),
        "true_distinct",
    )


# -------------------------------------------------- inverted index


@register(
    "q_text_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TH.duck_tokens('text')}) AS term FROM documents
    ),
    tf AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY term, doc_id
    ),
    rk AS (
      SELECT term, doc_id, tf,
             ROW_NUMBER() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rk
      FROM tf
    )
    SELECT term,
           COUNT(*) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rk)
             FILTER (WHERE rk <= {_POSTINGS_CAP}) AS top_docs
    FROM rk
    GROUP BY term
    ORDER BY term
    """,
    doc="Inverted-index build over the document corpus: per term, "
    "document frequency, total term frequency, and the posting list "
    "capped at the top-{k} documents by (tf desc, doc_id) — the "
    "skew guard that keeps a stop-word's postings bounded per task at "
    "corpus scale (full postings would concentrate the head term's "
    "entire docset in one group). One shuffle on term with map-side "
    "partial tf aggregation; the batch-corpus generalization of the "
    "reference's streaming word count (KafkaWordCount.scala:70-73) "
    "into a search structure. The posting list is serialized to a "
    "comma-joined string: container-typed output columns break the "
    "verification driver's pandas canonicalizer (round-3 red row), "
    "and the registry rule now forbids them "
    "(tests/test_oracle_diff.py::test_no_container_outputs).".format(
        k=_POSTINGS_CAP
    ),
    tags=("text", "llm"),
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return IX.inverted_index(IX.term_doc_tf(docs), cap=_POSTINGS_CAP)


# ------------------------------------------------- n-gram novelty


@register(
    "q_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {TH.duck_shingle_hashes('text')} AS hs FROM documents
    ),
    ex AS (
      SELECT doc_id, unnest(hs) AS h FROM sh
    ),
    fw AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS first_doc FROM ex
    ),
    nov AS (
      SELECT doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM fw GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(n.n_shingles, 0) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(n.n_novel AS DOUBLE) / CAST(n.n_shingles AS DOUBLE)
           END AS novelty
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN nov n USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Per-document n-gram novelty: the fraction of a document's "
    "distinct word 3-gram shingles first seen at that doc_id (min "
    "doc_id per shingle across the corpus) — the data-curriculum / "
    "crawl-ordering signal (low novelty ⇒ boilerplate or near-dup of "
    "earlier data). Reads the shared signature table, so the "
    "tokenize→shingle→hash pass is amortized with the dedup tier; one "
    "shuffle on shingle hash (window min), one map-side-combined "
    "groupBy doc. Exact division of exact integers ⇒ bit-identical "
    "score cross-engine.",
    tags=("text", "dedup", "llm"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = signature_table(spark, sf_dir).select("doc_id", "hs")
    ex = sigs.select("doc_id", F.explode("hs").alias("h"))
    fw = ex.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("h")).alias("first_doc"),
    )
    nov = fw.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(
            F.expr("CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END")
        ).alias("n_novel"),
    )
    return (
        sigs.select("doc_id")
        .join(nov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias(
                "n_shingles"
            ),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "CASE WHEN COALESCE(n_shingles, 0) = 0 THEN CAST(0 AS DOUBLE) "
                "ELSE CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) END"
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------- Bloom decontamination


_DUCK_BLOOM_WORD = f"CAST(bit // {SK.BLOOM_WORD_BITS} AS INT)"
_DUCK_BLOOM_MASK = (
    f"((1::BIGINT) << CAST(bit % {SK.BLOOM_WORD_BITS} AS INT))"
)


@register(
    "q_decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {TH.duck_shingle_hashes('text')} AS hs FROM documents
    ),
    ev AS (
      SELECT DISTINCT h FROM (
        SELECT unnest(hs) AS h FROM sh WHERE doc_id % {_EVAL_MOD} = 0
      )
    ),
    evbits AS (
      SELECT {SK.duck_bloom_bit_sql('h')} AS bit
      FROM ev CROSS JOIN {_BLOOM_VALUES}
    ),
    bm AS (
      SELECT {_DUCK_BLOOM_WORD} AS word, bit_or({_DUCK_BLOOM_MASK}) AS bm
      FROM evbits GROUP BY 1
    ),
    tr AS (
      SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
    ),
    trbits AS (
      SELECT doc_id, h, {SK.duck_bloom_bit_sql('h')} AS bit
      FROM tr CROSS JOIN {_BLOOM_VALUES}
    ),
    probe AS (
      SELECT doc_id, h,
             SUM(CASE WHEN (bm.bm & {_DUCK_BLOOM_MASK}) <> 0
                 THEN 1 ELSE 0 END) AS n_set
      FROM trbits JOIN bm ON bm.word = {_DUCK_BLOOM_WORD}
      GROUP BY doc_id, h
    ),
    pos AS (
      SELECT doc_id, COUNT(*) AS n_bloom_hits
      FROM probe WHERE n_set = {SK.BLOOM_K}
      GROUP BY doc_id
    ),
    exact AS (
      SELECT tr.doc_id, COUNT(*) AS n_exact_hits
      FROM tr JOIN ev USING (h)
      GROUP BY tr.doc_id
    )
    SELECT p.doc_id,
           p.n_bloom_hits,
           CAST(COALESCE(e.n_exact_hits, 0) AS BIGINT) AS n_exact_hits,
           p.n_bloom_hits - CAST(COALESCE(e.n_exact_hits, 0) AS BIGINT)
             AS n_false_pos
    FROM pos p LEFT JOIN exact e USING (doc_id)
    ORDER BY p.doc_id
    """,
    doc="Bloom-filter benchmark decontamination: the eval slice's "
    "(doc_id % {mod} = 0) shingle set is compressed into a {m}-bit "
    "k={k} Bloom bitmap ({w} int64 words, built by bit_or "
    "aggregation) and broadcast; training docs count bloom-positive "
    "shingles in one map-side probe, then the exact broadcast join "
    "reports the false positives. This is the beyond-broadcast form "
    "of q_decontaminate_ngram: the bitmap is FIXED-size however large "
    "the eval suite grows, so the 100 TB corpus side still never "
    "shuffles; exactness is recovered by verifying only the "
    "bloom-positive survivors. Deterministic hash family ⇒ the FP "
    "set itself is reproduced bit-for-bit by DuckDB. "
    "operators/sketches.py.".format(
        mod=_EVAL_MOD, m=SK.BLOOM_M, k=SK.BLOOM_K, w=SK.BLOOM_WORDS
    ),
    tags=("sketch", "decontaminate", "llm"),
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.caching import track_persist

    sigs = signature_table(spark, sf_dir).select("doc_id", "hs")
    # Persisted: consumed twice — eagerly collected into the bitmap
    # literal, then broadcast for the exact-verify join.
    ev = track_persist(
        sigs.where(F.expr(f"doc_id % {_EVAL_MOD} = 0"))
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    bitmap = SK.bloom_build(ev, "h")
    tr = sigs.where(F.expr(f"doc_id % {_EVAL_MOD} <> 0")).select(
        "doc_id", F.explode("hs").alias("h")
    )
    # Bloom has no false negatives, so every exact hit is inside the
    # bloom-positive subset: one map-only literal-bitmap filter, then a
    # single groupBy over the (candidate-sized) survivors counts both
    # tallies — the corpus never shuffles, the candidates shuffle once.
    pos = SK.bloom_probe(tr, bitmap, "h", keep_cols=("doc_id",))
    flagged = pos.join(
        F.broadcast(ev.withColumn("is_eval", F.lit(1))), "h", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bloom_hits"),
            F.sum(F.coalesce("is_eval", F.lit(0)))
            .cast("bigint")
            .alias("n_exact_hits"),
        )
        .select(
            "doc_id",
            "n_bloom_hits",
            "n_exact_hits",
            (F.col("n_bloom_hits") - F.col("n_exact_hits")).alias(
                "n_false_pos"
            ),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ KMV set operations


_KMV_K = 32
#: (k-1)·2^60 as a double literal — 31·2^60 overflows int64, but has
#: only 5 significant bits so the double is exact; dividing it by the
#: exact integer h_k is then bit-identical cross-engine.
_KMV_NUM = float((_KMV_K - 1) * (1 << 60))

# Same raw-hash expression the HLL tier uses — alias, not a copy.
_DUCK_UH = _DUCK_HRAW


@register(
    "q_sketch_kmv_setops",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT {_DUCK_UH} AS h FROM events WHERE event_type = 'click'
    ),
    hb AS (
      SELECT DISTINCT {_DUCK_UH} AS h FROM events
      WHERE event_type = 'purchase'
    ),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    ku AS (
      SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
      ORDER BY h LIMIT {_KMV_K}
    ),
    stats AS (
      SELECT (SELECT MAX(h) FROM ku) AS h_k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ku) AS n_sketch,
             (SELECT COUNT(*) FROM ku
              WHERE h IN (SELECT h FROM ka)
                AND h IN (SELECT h FROM kb)) AS n_both,
             (SELECT COUNT(*) FROM ha) AS n_a_true,
             (SELECT COUNT(*) FROM hb) AS n_b_true,
             (SELECT COUNT(*) FROM (SELECT h FROM ha UNION
                                    SELECT h FROM hb)) AS union_true
    )
    SELECT CAST({_KMV_K} AS BIGINT) AS k, n_a_true, n_b_true, union_true,
           h_k, n_sketch,
           CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_sketch AS DOUBLE)
                ELSE CAST({_KMV_NUM!r} AS DOUBLE) / CAST(h_k AS DOUBLE)
           END AS union_est,
           CAST(n_both AS BIGINT) AS n_both,
           CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_both AS DOUBLE)
                ELSE (CAST(n_both AS DOUBLE)
                      * (CAST({_KMV_NUM!r} AS DOUBLE) / CAST(h_k AS DOUBLE)))
                     / {_KMV_K}
           END AS inter_est,
           (SELECT COUNT(*) FROM ha WHERE h IN (SELECT h FROM hb))
             AS inter_true
    FROM stats
    """,
    doc="KMV (k-minimum-values, k={k}) distinct-set sketch with set "
    "operations over two user cohorts (clickers vs purchasers): union "
    "cardinality from the k-th smallest 60-bit hash ((k-1)/h_k "
    "normalized), intersection from the Jaccard fraction of the union "
    "sketch present in BOTH cohort sketches (Beyer et al. 2007). Each "
    "cohort's sketch is k values — a TakeOrdered, mergeable by "
    "union+truncate, so cohort overlap over 100 TB of events costs "
    "two bottom-k scans and no set-wide shuffle beyond the distinct. "
    "Under-filled sketches (|union| < k) fall back to the exact sketch "
    "size, the standard KMV small-range rule. True values returned "
    "alongside; portable hash ⇒ estimates are bit-identical "
    "cross-engine. operators/sketches.py family.".format(k=_KMV_K),
    tags=("sketch", "llm"),
)
def q_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def cohort(etype: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .select(
                F.expr(
                    TH.spark_str_hash_raw("CAST(user_id AS STRING)")
                ).alias("h")
            )
            .distinct()
        )

    ha, hb = cohort("click"), cohort("purchase")
    ka = ha.orderBy("h").limit(_KMV_K)
    kb = hb.orderBy("h").limit(_KMV_K)
    ku = ka.union(kb).distinct().orderBy("h").limit(_KMV_K)
    both = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count("*").alias("n_both"))
    )
    h_k = ku.agg(
        F.max("h").alias("h_k"),
        F.count("*").cast("bigint").alias("n_sketch"),
    )
    truths = (
        ha.select(F.lit(1).alias("side"), "h")
        .union(hb.select(F.lit(2).alias("side"), "h"))
        .agg(
            F.sum(F.expr("CASE WHEN side = 1 THEN 1 ELSE 0 END")).alias(
                "n_a_true"
            ),
            F.sum(F.expr("CASE WHEN side = 2 THEN 1 ELSE 0 END")).alias(
                "n_b_true"
            ),
            F.countDistinct("h").alias("union_true"),
        )
    )
    inter = ha.join(hb, "h", "left_semi").agg(
        F.count("*").alias("inter_true")
    )
    return (
        h_k.crossJoin(F.broadcast(both))
        .crossJoin(F.broadcast(truths))
        .crossJoin(F.broadcast(inter))
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            "n_a_true",
            "n_b_true",
            "union_true",
            "h_k",
            "n_sketch",
            F.expr(
                f"CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_sketch AS DOUBLE) "
                f"ELSE {_KMV_NUM!r}D / CAST(h_k AS DOUBLE) END"
            ).alias("union_est"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.expr(
                f"CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_both AS DOUBLE) "
                f"ELSE (CAST(n_both AS DOUBLE) * ({_KMV_NUM!r}D / "
                f"CAST(h_k AS DOUBLE))) / {_KMV_K} END"
            ).alias("inter_est"),
            "inter_true",
        )
    )


# ------------------------------------------- corpus drift (exact TV)


@register(
    "q_corpus_drift_tv",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TH.duck_tokens('text')}) AS term
      FROM documents
    ),
    ca AS (
      SELECT term, COUNT(*) AS c FROM tok WHERE doc_id % 2 = 0
      GROUP BY term
    ),
    cb AS (
      SELECT term, COUNT(*) AS c FROM tok WHERE doc_id % 2 = 1
      GROUP BY term
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ca) AS n1,
             (SELECT CAST(SUM(c) AS BIGINT) FROM cb) AS n2
    ),
    joined AS (
      SELECT COALESCE(ca.term, cb.term) AS term,
             CAST(COALESCE(ca.c, 0) AS BIGINT) AS c1,
             CAST(COALESCE(cb.c, 0) AS BIGINT) AS c2
      FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
    )
    SELECT t.n1, t.n2,
           COUNT(*) AS n_terms_union,
           CAST(SUM(ABS(c1 * t.n2 - c2 * t.n1)) AS BIGINT) AS tv_scaled,
           CAST(CAST(SUM(ABS(c1 * t.n2 - c2 * t.n1)) AS BIGINT) AS DOUBLE)
             / CAST(2 * t.n1 * t.n2 AS DOUBLE) AS tv
    FROM joined CROSS JOIN tot t
    GROUP BY t.n1, t.n2
    """,
    doc="Corpus drift between two snapshots (even/odd doc_id halves) "
    "as EXACT total-variation distance over term distributions: "
    "TV = Σ|c1·N2 − c2·N1| / (2·N1·N2) — the cross-multiplied form "
    "keeps the sum in exact integers (order-independent; no FP "
    "accumulation), with ONE final division shared by both engines. "
    "The distribution-shift monitor for rolling corpus snapshots: one "
    "shuffle on term (map-side-combined counts), a full-outer merge "
    "of two vocab-sized tables, no log()/entropy engine drift. At "
    "production counts the cross products route through DECIMAL(38) "
    "sums (functions/exact.py pattern).",
    tags=("text", "llm"),
)
def q_corpus_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(TH.spark_tokens("text"))).alias("term")
    )
    ca = (
        tok.where("doc_id % 2 = 0")
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
    )
    cb = (
        tok.where("doc_id % 2 = 1")
        .groupBy("term")
        .agg(F.count("*").alias("c2"))
    )
    joined = (
        ca.join(cb, "term", "full_outer")
        .select(
            F.coalesce("c1", F.lit(0)).cast("bigint").alias("c1"),
            F.coalesce("c2", F.lit(0)).cast("bigint").alias("c2"),
        )
    )
    tot = joined.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.count("*").alias("n_terms_union"),
            F.sum(F.expr("ABS(c1 * n2 - c2 * n1)")).alias("tv_scaled"),
        )
        .select(
            "n1",
            "n2",
            "n_terms_union",
            "tv_scaled",
            F.expr(
                "CAST(tv_scaled AS DOUBLE) / CAST(2 * n1 * n2 AS DOUBLE)"
            ).alias("tv"),
        )
    )


# -------------------------------------------- quantile histogram


_QH_EST = (
    "(CAST(lo AS DOUBLE) + (CAST(target_rank - cum_before AS DOUBLE) "
    "/ CAST(cnt AS DOUBLE)) * CAST(lo AS DOUBLE)) / 100.0"
)


@register(
    "q_sketch_quantile_hist",
    oracle=f"""
    WITH vals AS (
      SELECT value FROM events WHERE {SK.hist_filter_duck('value')}
    ),
    hist AS (
      SELECT {SK.duck_log_bucket_sql('value')} AS bucket, COUNT(*) AS cnt
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT bucket, cnt,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM hist
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    spine AS (
      SELECT qi, CAST(q AS DOUBLE) AS q
      FROM (VALUES (1, 0.5), (2, 0.95), (3, 0.99)) s(qi, q)
    ),
    ex AS (
      SELECT quantile_cont(value, [0.5, 0.95, 0.99]) AS exl FROM vals
    ),
    picked AS (
      SELECT s.qi, s.q,
             CAST(ceiling(s.q * t.n) AS BIGINT) AS target_rank,
             c.bucket, c.cnt, c.cum_before,
             ((1::BIGINT) << c.bucket) AS lo
      FROM spine s CROSS JOIN tot t
      JOIN cum c
        ON c.cum_before < CAST(ceiling(s.q * t.n) AS BIGINT)
       AND CAST(ceiling(s.q * t.n) AS BIGINT) <= c.cum_before + c.cnt
    )
    SELECT p.q, p.target_rank, p.bucket,
           {_QH_EST} AS est_value,
           e.exl[p.qi] AS exact_value
    FROM picked p CROSS JOIN ex e
    ORDER BY p.q
    """,
    doc="Mergeable quantile sketch: log2-bucketed histogram of event "
    "values (integer-cents bit-length buckets — no libm, ≤64 cells "
    "whatever the range), quantile estimated by linear interpolation "
    "inside the rank-selected bucket, compared against the exact "
    "percentile in the same result. Completes the sketch family "
    "(counts→CMS, distinct→HLL/KMV, membership→Bloom, "
    "quantiles→histogram): the histogram merges by bucket-wise sum, "
    "so streaming/partition partial sketches combine exactly; the "
    "exact leg is the test-scale comparator, the sketch is the 100 TB "
    "path. operators/sketches.py::log_histogram.",
    tags=("sketch", "llm"),
)
def q_sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vals = ev.where(SK.hist_filter_spark("value"))
    hist = SK.log_histogram(ev, "value")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    spine = spark.createDataFrame(
        [(1, 0.5), (2, 0.95), (3, 0.99)], "qi INT, q DOUBLE"
    )
    exact = vals.agg(
        F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("exl")
    )
    picked = (
        spine.crossJoin(F.broadcast(tot))
        .withColumn("target_rank", F.expr("CAST(ceiling(q * n) AS BIGINT)"))
        .join(
            F.broadcast(cum),
            F.expr(
                "cum_before < target_rank AND target_rank <= cum_before + cnt"
            ),
        )
        .withColumn("lo", F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
    )
    return (
        picked.crossJoin(F.broadcast(exact))
        .select(
            "q",
            "target_rank",
            "bucket",
            F.expr(_QH_EST).alias("est_value"),
            F.expr("element_at(exl, qi)").alias("exact_value"),
        )
        .orderBy("q")
    )


# ------------------------------------------------- collocations


_COLL_MIN_SUPPORT = 5
_COLL_TOPK = 20

#: lift = P(w1 w2) / (P(w1)·P(w2)) with P(bigram)=c_ab/N_bi and
#: P(w)=c_w/N_uni — written as one multiplication chain evaluated in
#: the SAME order by both engines, so the double is bit-identical.
_COLL_LIFT = (
    "((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)) * CAST(n_uni AS DOUBLE))"
    " / ((CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) * CAST(n_bi AS DOUBLE))"
)


@register(
    "q_text_collocations_lift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TH.duck_tokens('text')} AS toks FROM documents
    ),
    uni AS (
      SELECT unnest(toks) AS w FROM toks
    ),
    unic AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM unic),
    bi AS (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM toks WHERE len(toks) >= 2
    ),
    bic AS (SELECT bigram, COUNT(*) AS c_ab FROM bi GROUP BY bigram),
    nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bic),
    scored AS (
      SELECT string_split(bigram, ' ')[1] AS w1,
             string_split(bigram, ' ')[2] AS w2,
             c_ab, a.c AS c_a, b.c AS c_b, n_uni, n_bi
      FROM bic CROSS JOIN nu CROSS JOIN nb
      JOIN unic a ON a.w = string_split(bigram, ' ')[1]
      JOIN unic b ON b.w = string_split(bigram, ' ')[2]
      WHERE c_ab >= {_COLL_MIN_SUPPORT}
    )
    SELECT w1, w2, c_ab, c_a, c_b, {_COLL_LIFT} AS lift
    FROM scored
    ORDER BY {_COLL_LIFT} DESC, w1, w2
    LIMIT {_COLL_TOPK}
    """,
    doc="Collocation extraction: top-{k} adjacent word pairs by lift "
    "P(w1w2)/(P(w1)P(w2)) with support >= {s} — the corpus-statistics "
    "pass behind multiword-expression vocabularies and tokenizer "
    "merge candidates (BPE-style pair ranking is this same table "
    "ordered by raw count). Unigram and bigram tables are map-side-"
    "combined counts; the scoring joins hit the (vocab-sized) unigram "
    "table twice — broadcast at any realistic vocab. Lift is one "
    "fixed-order multiplication chain of exact counts ⇒ bit-identical "
    "cross-engine; (w1, w2) breaks ties before the LIMIT.".format(
        k=_COLL_TOPK, s=_COLL_MIN_SUPPORT
    ),
    tags=("text", "llm"),
)
def q_text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(TH.spark_tokens("text")).alias("toks"))
    uni = toks.select(F.explode("toks").alias("w"))
    unic = uni.groupBy("w").agg(F.count("*").alias("c"))
    nu = unic.agg(F.sum("c").cast("bigint").alias("n_uni"))
    bi = toks.where(F.expr("size(toks) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram")
    )
    bic = bi.groupBy("bigram").agg(F.count("*").alias("c_ab"))
    nb = bic.agg(F.sum("c_ab").cast("bigint").alias("n_bi"))
    scored = (
        bic.where(F.col("c_ab") >= _COLL_MIN_SUPPORT)
        .withColumn("w1", F.expr("split(bigram, ' ')[0]"))
        .withColumn("w2", F.expr("split(bigram, ' ')[1]"))
        .join(F.broadcast(unic.withColumnRenamed("w", "w1")
                          .withColumnRenamed("c", "c_a")), "w1")
        .join(F.broadcast(unic.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c", "c_b")), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
    )
    return (
        scored.select(
            "w1", "w2", "c_ab", "c_a", "c_b", F.expr(_COLL_LIFT).alias("lift")
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(_COLL_TOPK)
    )


# ------------------------------------------------- grouped HLL


@register(
    "q_sketch_hll_grouped",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type, {_DUCK_HRAW} AS hr FROM events
    ),
    touched AS (
      SELECT event_type,
             CAST(hr // {1 << SK.HLL_WBITS} AS INT) AS bucket,
             MAX({SK.duck_hll_rank_sql(f"(hr % {1 << SK.HLL_WBITS})")}) AS r
      FROM hashed GROUP BY event_type, bucket
    ),
    summary AS (
      SELECT event_type,
             CAST(({SK.HLL_M} - COUNT(*)) * {1 << SK.HLL_SHIFT}
                  + SUM((1::BIGINT) << ({SK.HLL_SHIFT} - r)) AS BIGINT)
               AS sum_scaled,
             CAST({SK.HLL_M} - COUNT(*) AS BIGINT) AS n_empty
      FROM touched GROUP BY event_type
    ),
    truth AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS true_distinct
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.sum_scaled, s.n_empty,
           CAST({_HLL_NUM!r} AS DOUBLE) / CAST(s.sum_scaled AS DOUBLE)
             AS raw_est,
           t.true_distinct
    FROM summary s JOIN truth t USING (event_type)
    ORDER BY s.event_type
    """,
    doc="Per-group HyperLogLog — the production shape of approximate "
    "count-distinct: one m={m}-register sketch per event_type, all "
    "maintained in a single (group, bucket) max-aggregation whose "
    "shuffle is O(groups·m) after map-side combine (vs O(groups·keys) "
    "for exact distinct). Empty registers are accounted arithmetically "
    "((m − present)·2^SHIFT) so no per-group spine join is needed. "
    "Exact per-group distinct returned beside the estimate. Scales to "
    "millions of groups where exact COUNT(DISTINCT) shuffles every "
    "key. operators/sketches.py family.".format(m=SK.HLL_M),
    tags=("sketch", "agg", "llm"),
)
def q_sketch_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.expr(
            TH.spark_str_hash_raw("CAST(user_id AS STRING)")
        ).alias("hr"),
    )
    touched = (
        hashed.select(
            "event_type",
            F.expr(f"CAST(hr DIV {1 << SK.HLL_WBITS} AS INT)").alias("bucket"),
            F.expr(
                SK.hll_rank_sql(f"(hr % {1 << SK.HLL_WBITS})")
            ).cast("int").alias("rank"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    summary = touched.groupBy("event_type").agg(
        F.expr(
            f"CAST(({SK.HLL_M} - COUNT(*)) * {1 << SK.HLL_SHIFT} "
            f"+ SUM(shiftleft(CAST(1 AS BIGINT), {SK.HLL_SHIFT} - r)) "
            f"AS BIGINT)"
        ).alias("sum_scaled"),
        F.expr(f"CAST({SK.HLL_M} - COUNT(*) AS BIGINT)").alias("n_empty"),
    )
    truth = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return (
        summary.join(truth, "event_type")
        .select(
            "event_type",
            "sum_scaled",
            "n_empty",
            F.expr(
                f"{_HLL_NUM!r}D / CAST(sum_scaled AS DOUBLE)"
            ).alias("raw_est"),
            "true_distinct",
        )
        .orderBy("event_type")
    )


# -------------------------------------------- positional phrase search


@register(
    "q_text_phrase_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TH.duck_tokens('text')} AS toks FROM documents
    ),
    pos AS (
      SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS p,
             toks FROM toks WHERE len(toks) >= 2
    ),
    big AS (
      SELECT doc_id, p, toks[p] || ' ' || toks[p + 1] AS bigram FROM pos
    ),
    top_phrase AS (
      SELECT bigram FROM big GROUP BY bigram
      ORDER BY COUNT(*) DESC, bigram LIMIT 1
    )
    SELECT b.doc_id,
           COUNT(*) AS n_occurrences,
           CAST(MIN(b.p) AS BIGINT) AS first_pos
    FROM big b JOIN top_phrase t ON b.bigram = t.bigram
    GROUP BY b.doc_id
    ORDER BY n_occurrences DESC, b.doc_id
    LIMIT 10
    """,
    doc="Positional phrase retrieval: the corpus' most frequent "
    "2-token phrase (count-then-lexicographic tiebreak) searched "
    "through a positional posting derivation — token positions via "
    "sequence fan-out, adjacency by construction, per-doc occurrence "
    "count and first match position, top-10 docs. Completes the "
    "search tier (inverted index → phrase query): at scale the "
    "positional postings are materialized once (same pattern as the "
    "signature table) and phrase queries touch only the first term's "
    "posting rows. No self-join — adjacency comes from the "
    "(token, next-token) pairing inside the same row.",
    tags=("text", "llm"),
)
def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.caching import track_persist

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(TH.spark_tokens("text")).alias("toks")
    ).where(F.expr("size(toks) >= 2"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(i AS p, concat(element_at(toks, i), ' ', "
                "element_at(toks, i + 1)) AS bigram))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.p").alias("p"), F.col("s.bigram").alias("bigram"))
    # Persisted: the tokenize + position-explode pass feeds BOTH the
    # top-phrase aggregation and the retrieval join, with no exchange
    # between them for ReuseExchange to dedupe (same double-consumption
    # shape as q_decontaminate_bloom's eval set).
    big = track_persist(big)
    top_phrase = (
        big.groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "bigram")
        .limit(1)
        .select("bigram")
    )
    return (
        big.join(F.broadcast(top_phrase), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("p").cast("bigint").alias("first_pos"),
        )
        .orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(10)
    )
