"""Planted-structure correctness on the Zipf-Mandelbrot corpus
(VERDICT r5 #6): the driver's oracles run on the uniform-vocabulary
testdata only, so these fixtures assert — not just measure — that the
dedup tiers recover the near-dup/containment/span structure the zipf
generator (tools/make_scale_data.py) injects.  Fixed seeds, 400 docs.
"""

from __future__ import annotations

import importlib.util
import random
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

_TOOLS = Path(__file__).resolve().parents[1] / "tools" / "make_scale_data.py"
_spec = importlib.util.spec_from_file_location("make_scale_data", _TOOLS)
_msd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_msd)

N_DOCS = 400
#: sf0.1-like empirical token-length pool (the generator samples real
#: lengths; a fixed pool keeps the fixture self-contained)
LENGTHS = [20, 30, 40, 55, 70, 90, 120]


@pytest.fixture(scope="module")
def zipf_corpus(spark):
    texts, planted = _msd._zipf_texts(
        N_DOCS,
        LENGTHS,
        np.random.default_rng(42),
        random.Random(42),
        return_pairs=True,
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    df.persist().count()
    yield df, texts, planted
    df.unpersist()


def _shingle_sets(texts: list[str], w: int = 3) -> list[set[tuple[str, ...]]]:
    out = []
    for t in texts:
        toks = t.split(" ")
        out.append(
            {tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)}
            if len(toks) >= w
            else set()
        )
    return out


def test_zipf_corpus_has_planted_structure(zipf_corpus):
    _, _, planted = zipf_corpus
    kinds = {k for _, _, k in planted}
    assert kinds == {"mutate", "contain"}
    assert sum(1 for *_, k in planted if k == "mutate") >= 10
    assert sum(1 for *_, k in planted if k == "contain") >= 5


def test_minhash_recall_on_zipf_truth(zipf_corpus):
    """MinHash-LSH at t=0.6 must recover ≥0.9 of the EXACT Jaccard
    ≥0.6 truth pairs of the zipf corpus (brute-force truth computed in
    Python), and that truth must be non-trivial — the planted 5%-token
    mutations sit near Jaccard (0.95)³/(2−0.95³) ≈ 0.75."""
    from spark_kafka_streaming_spark.operators.dedup import minhash_lsh_pairs

    df, texts, _ = zipf_corpus
    sets = _shingle_sets(texts)
    truth = set()
    for a in range(N_DOCS):
        if not sets[a]:
            continue
        for b in range(a + 1, N_DOCS):
            if not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= 0.6:
                truth.add((a, b))
    assert len(truth) >= 10, "zipf corpus must plant real Jaccard truth"
    found = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.6).collect()
    }
    assert found <= truth, "verify stage must keep minhash pairs exact"
    assert len(found & truth) / len(truth) >= 0.9


def test_containment_finds_planted_embeds(zipf_corpus):
    """Every planted verbatim embed is a containment pair (overlap
    ≈ 1.0 on the short side); the tier must find ≥0.9 of them, and at
    least one must be INVISIBLE to symmetric Jaccard at 0.6 — the
    asymmetric tier's reason to exist."""
    from spark_kafka_streaming_spark.operators.dedup import overlap_pairs

    df, texts, planted = zipf_corpus
    contain = {(a, b) for a, b, k in planted if k == "contain"}
    sets = _shingle_sets(texts)
    # planted embeds whose short side genuinely has shingles
    contain = {(a, b) for a, b in contain if sets[a] and sets[b]}
    assert len(contain) >= 5
    found = {
        (r["id1"], r["id2"])
        for r in overlap_pairs(
            df, threshold=0.8, threshold_frac=(4, 5)
        ).collect()
    }
    hit = {
        (a, b)
        for a, b in contain
        if (min(a, b), max(a, b)) in found
    }
    assert len(hit) / len(contain) >= 0.9
    jacc_invisible = [
        (a, b)
        for a, b in contain
        if len(sets[a] & sets[b])
        / (len(sets[a]) + len(sets[b]) - len(sets[a] & sets[b]))
        < 0.6
    ]
    assert jacc_invisible, "zipf embeds should include sub-Jaccard pairs"


def test_span_tier_accounts_planted_embeds(zipf_corpus):
    """For a planted verbatim embed, every w-token window of the
    source doc re-occurs inside the host, and the host's copy is
    removable (the source's occurrence is the canonical min since
    src_idx < host_idx): the host's removable-token coverage must be
    at least the source's length for ≥0.9 of planted embeds."""
    from spark_kafka_streaming_spark.operators.dedup import (
        substring_span_stats,
    )

    df, texts, planted = zipf_corpus
    w = 5
    contain = [
        (a, b)
        for a, b, k in planted
        if k == "contain" and len(texts[a].split(" ")) >= w
    ]
    assert len(contain) >= 5
    stats = {
        r["doc_id"]: r for r in substring_span_stats(df, w=w).collect()
    }
    ok = 0
    for src, host in contain:
        src_len = len(texts[src].split(" "))
        if stats[host]["n_dup_tokens"] >= src_len:
            ok += 1
    assert ok / len(contain) >= 0.9


def test_heavy_hitters_on_zipf_match_true_counts(zipf_corpus, spark):
    """On the 30k-word Zipf-Mandelbrot vocabulary the MG candidate
    pass runs far below the distinct-token count (capacity 1000 ≪
    vocab), i.e. the sketch actually sketches — and the 2-pass result
    must still equal the exact python-side frequency answer."""
    from collections import Counter

    from spark_kafka_streaming_spark.functions import texthash as TH
    from spark_kafka_streaming_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    df, texts, _ = zipf_corpus
    truth = Counter(t for s in texts for t in s.split(" ") if t)
    n_total = sum(truth.values())
    phi = 0.005
    thresh = -(-phi * n_total // 1)  # ceil
    expected = {w: c for w, c in truth.items() if c >= thresh}
    assert 0 < len(expected) < len(truth)  # head only, sketch meaningful

    toks = df.select(F.explode(F.expr(TH.spark_tokens("text"))).alias("token"))
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters_exact(toks, "token", phi=phi, capacity=1000)
        .collect()
    }
    assert got == expected
