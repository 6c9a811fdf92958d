"""Property-based tests (hypothesis): the exactness claims hold on
arbitrary corpora, not just the driver's fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_kafka_streaming_spark.operators.dedup import ngram_jaccard_pairs

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)


def _py_shingles(text: str, w: int = 3) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def _py_pairs(docs: list[str], t: float) -> set[tuple[int, int]]:
    out = set()
    sh = {i: _py_shingles(d) for i, d in enumerate(docs)}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh[i], sh[j]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= t:
                out.add((i, j))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, t_tenths=st.integers(min_value=3, max_value=9))
def test_prefix_filtered_jaccard_is_exact(spark, docs, t_tenths):
    """The prefix-filtered set-similarity join returns exactly the
    brute-force pair set for arbitrary corpora and thresholds.

    Hash-collision caveat: pair semantics run on 60-bit shingle hashes;
    collisions in a ≤10-doc corpus are ~impossible, so the string-level
    brute force is the correct reference.
    """
    t = t_tenths / 10
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(
            df, threshold=t, threshold_frac=(t_tenths, 10)
        ).collect()
    }
    assert got == _py_pairs(docs, t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-10**9, max_value=10**9).map(lambda c: c / 100),
        min_size=1,
        max_size=200,
    ),
    nparts=st.integers(min_value=1, max_value=16),
)
def test_decimal_sum_partitioning_invariant(spark, vals, nparts):
    """The DECIMAL-sum-then-DOUBLE-cast pattern gives the same bits under
    any partitioning, and equals the exact cents total — the invariant
    the whole oracle strategy rests on."""
    from decimal import Decimal

    from spark_kafka_streaming_spark.functions.exact import dsum

    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
    got = df.agg(dsum("x").alias("s")).first().s
    exact = float(sum(Decimal(f"{v:.2f}") for v in vals))
    assert got == exact


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcdefghij ", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_str_hash_cross_engine_parity(spark, words):
    """spark_str_hash == duck_str_hash for arbitrary strings — the
    portability root of every signature-based operator."""
    import duckdb

    from spark_kafka_streaming_spark.functions.texthash import (
        duck_str_hash,
        spark_str_hash,
    )

    con = duckdb.connect()
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r.s: r.h
        for r in df.selectExpr("s", f"{spark_str_hash('s')} AS h").collect()
    }
    for w in words:
        duck = con.execute(
            f"SELECT {duck_str_hash('?::VARCHAR')} AS h", [w]
        ).fetchone()[0]
        assert got[w] == duck, (w, got[w], duck)
    con.close()


# ------------------------------------------------------------ sketches


def _py_cms(keys):
    """Reference CMS on arbitrary keys via the same hash family."""
    import hashlib

    from spark_kafka_streaming_spark.operators import sketches as SK

    cells: dict = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % SK.P
        for i in range(SK.CMS_D):
            b = ((SK.CMS_A[i] * h + SK.CMS_B[i]) % SK.P) % SK.CMS_W
            cells[(i, b)] = cells.get((i, b), 0) + 1
    return cells


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(st.integers(min_value=0, max_value=10**9),
                     min_size=1, max_size=50))
def test_cms_matches_python_reference(spark, keys):
    """The Spark CMS build equals a plain-Python reimplementation of
    the same (md5-prefix, affine-family) sketch on arbitrary keys —
    the portable-hash claim, property-tested."""
    from spark_kafka_streaming_spark.operators import sketches as SK

    df = spark.createDataFrame([(k,) for k in keys], "user_id BIGINT")
    got = {
        (r["r"], r["b"]): r["cnt"]
        for r in SK.cms_build(df, "user_id").collect()
    }
    assert got == _py_cms(keys)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=60),
       split=st.integers(min_value=0, max_value=2**31))
def test_hll_union_property(spark, keys, split):
    """HLL register merge(max) over an arbitrary 2-way partition of the
    keys equals the registers of the whole set — merge correctness on
    arbitrary data and arbitrary splits."""
    from spark_kafka_streaming_spark.operators import sketches as SK

    a = [k for k in keys if (k ^ split) % 2 == 0]
    b = [k for k in keys if (k ^ split) % 2 == 1]

    def regs(ks):
        if not ks:
            return {i: 0 for i in range(SK.HLL_M)}
        df = spark.createDataFrame([(k,) for k in ks], "user_id BIGINT")
        return {
            r["bucket"]: r["r"]
            for r in SK.hll_registers(df, "user_id").collect()
        }

    ra, rb, rfull = regs(a), regs(b), regs(keys)
    assert {k: max(ra[k], rb[k]) for k in rfull} == rfull


def _py_overlap_pairs(docs: list[str], t: float, max_df: int):
    """Brute-force overlap-coefficient reference with the same df-capped
    candidate rule as the operator."""
    sh = {i: _py_shingles(d) for i, d in enumerate(docs)}
    df_count: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    out = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh[i], sh[j]
            if not a or not b:
                continue
            shared = a & b
            if not any(df_count[g] <= max_df for g in shared):
                continue  # no rare shingle ⇒ never a candidate
            inter = len(shared)
            ov = inter / min(len(a), len(b))
            if ov >= t:
                out[(i, j)] = (inter, len(a), len(b))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, t_tenths=st.integers(min_value=3, max_value=9))
def test_overlap_pairs_match_bruteforce(spark, docs, t_tenths):
    """overlap_pairs returns exactly the brute-force overlap pair set
    (under the shared df-cap candidate rule) for arbitrary corpora."""
    from spark_kafka_streaming_spark.operators.dedup import overlap_pairs

    t = t_tenths / 10
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["id1"], r["id2"]): (r["inter"], r["sz1"], r["sz2"])
        for r in overlap_pairs(df, threshold=t, max_df=20).collect()
    }
    assert got == _py_overlap_pairs(docs, t, 20)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(min_value=0, max_value=59),
)
def test_moment_partials_merge_for_any_split(spark, vals, cut):
    """(n, Σc, Σc²) partials merge exactly for an arbitrary value list
    and an arbitrary split point — the algebraic property the grouped
    moments and their streaming maintenance rely on."""
    import math

    def partial(xs):
        return (len(xs), sum(xs), sum(x * x for x in xs))

    a, b = vals[:cut], vals[cut:]
    pa, pb = partial(a), partial(b)
    merged = tuple(x + y for x, y in zip(pa, pb))
    assert merged == partial(vals)
    # and the derived variance from merged partials equals the direct
    # population variance (float check, both computed the same way)
    n, s1, s2 = merged
    if n:
        var = (s2 - (s1 * s1) / n) / n
        mean = s1 / n
        direct = sum((x - mean) ** 2 for x in vals) / n
        assert math.isclose(var, direct, rel_tol=1e-9, abs_tol=1e-6)


# ---------------------------------------------------- AVI codec (r6)

_frame_dims = st.tuples(
    st.integers(min_value=1, max_value=9),  # h
    st.integers(min_value=1, max_value=9),  # w
    st.integers(min_value=1, max_value=6),  # n frames
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


@settings(max_examples=30, deadline=None)
@given(_frame_dims)
def test_avi_roundtrip_any_geometry(dims):
    """encode→decode is the identity for every frame at every (h, w,
    n) geometry — including odd widths where DIB row padding kicks in."""
    import numpy as np

    from spark_kafka_streaming_spark.operators.multimodal import (
        avi_info,
        decode_avi_frames,
        encode_avi,
    )

    h, w, n, seed = dims
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    payload = encode_avi(frames)
    assert avi_info(payload) == (w, h, n)
    dec = decode_avi_frames(payload, range(n))
    assert sorted(dec) == list(range(n))
    for i in range(n):
        assert (dec[i] == frames[i]).all()


# ------------------------------------------- Misra-Gries guarantee (r6)

_stream = st.lists(
    st.sampled_from([f"t{i}" for i in range(40)]), min_size=1, max_size=300
)


@settings(max_examples=20, deadline=None)
@given(_stream, st.integers(min_value=2, max_value=12))
def test_mg_batch_merge_superset_guarantee(stream, capacity):
    """Pure-python replay of the weighted MG batch merge over arbitrary
    batch splits: every item with count > N/(capacity+1) must survive —
    the guarantee heavy_hitters_exact's determinism rests on."""
    from collections import Counter

    truth = Counter(stream)
    n = len(stream)
    # replay the operator's per-batch fold (value-counts merge + offset
    # subtraction) over a fixed batch split
    counters: dict = {}
    for k in range(0, n, 37):
        for item, cnt in Counter(stream[k : k + 37]).items():
            counters[item] = counters.get(item, 0) + cnt
        if len(counters) > capacity:
            offset = sorted(counters.values(), reverse=True)[capacity]
            counters = {k2: v - offset for k2, v in counters.items() if v > offset}
    must_survive = {t for t, c in truth.items() if c > n / (capacity + 1)}
    assert must_survive <= set(counters)
