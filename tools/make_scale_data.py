#!/usr/bin/env python
"""Synthesize a 10× ("sf1") dataset from /root/testdata/sf0.1 for the
scale-decade measurement in SCALE.md.

Relational tables are key-shifted replicas (distributions preserved,
referential integrity maintained by shifting FKs consistently).
``documents`` is NOT replicated — replica clusters would be near-dups
of each other and quadratically inflate the dedup pair outputs —
instead new docs are sampled from the sf0.1 token distribution with
empirical length distribution (seeded, deterministic), which keeps
near-dup rates realistic.  ``embeddings`` replicas are mostly FRESH
unit vectors with a 2% planted near-dup fraction (tiny perturbations
of the replica-0 originals) for the same reason — the planted truth is
written to ``embedding_dup_pairs.parquet`` so recall probes assert
recovery, and the near-dup pair count stays ~linear in the factor
(per-base intra-dup cliques are 0.02·factor wide), never the
quadratic every-replica-pairs-with-every-replica degeneracy that made
the tier unmeasurable at factor 1000 (VERDICT r7 missing #3).

``documents`` supports two vocabulary modes:

* ``empirical`` (default) — sample tokens from the sf0.1 empirical
  distribution.  The sf0.1 generator uses a ~40-word shared
  vocabulary, so at factor 100 most shingles saturate their document
  frequency caps (the measured root cause of the SimHash mega-bucket,
  PPJoin prefix-saturation, and containment Σdf² artifacts in
  SCALE.md) — kept as the adversarial/stress corpus.
* ``zipf`` — a power-law (Zipf-Mandelbrot, s=1.07) vocabulary of 30k
  synthetic words, the shape of a real web corpus: shingle df follows
  the head/tail split the dedup operators' df-caps are designed for.
  Near-dup structure is injected deterministically so recall/dedup
  operators have non-trivial truth: 8% of docs are ~5%-token-mutated
  copies of an earlier doc (high-Jaccard pairs) and 3% embed a full
  earlier doc verbatim inside fresh padding (containment pairs that
  symmetric Jaccard misses).

Usage: python tools/make_scale_data.py [out_dir] [factor] [vocab] [tables]
Defaults: /tmp/spark_graft_sf1  10  empirical  (all tables)
``tables`` is a comma-separated subset (e.g. ``embeddings``) for
regenerating one table in an existing directory without rebuilding the
rest — safe because each stochastic section owns an independently
seeded RNG (documents: seed 42; embeddings: seed 4242), so a subset
run draws exactly what a full run would.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _zipf_texts(
    n_docs: int, lengths: list[int], rng, pyrng, return_pairs: bool = False
):
    """Power-law-vocabulary documents with injected near-dup structure
    (see module docstring).  Deterministic under the passed RNGs.

    ``return_pairs=True`` also returns the planted truth
    ``[(src_idx, dup_idx, kind)]`` with kind ∈ {'mutate', 'contain'}
    — consumed by tests/test_zipf_structure.py to assert the dedup
    tiers recover the injected structure (not just run on it)."""
    V = 30_000
    words = [f"w{i:05d}" for i in range(V)]
    ranks = np.arange(1, V + 1, dtype=np.float64)
    p = 1.0 / (ranks + 2.7) ** 1.07
    p /= p.sum()
    all_lens = [lengths[int(rng.integers(0, len(lengths)))] for _ in range(n_docs)]
    total = sum(all_lens)
    flat = rng.choice(V, size=total, p=p)
    texts: list[str] = []
    pairs: list[tuple[int, int, str]] = []
    pos = 0
    for i in range(n_docs):
        L = all_lens[i]
        toks = [words[j] for j in flat[pos : pos + L]]
        pos += L
        roll = pyrng.random()
        if i > 10 and roll < 0.08:  # mutated near-copy (high Jaccard)
            src = pyrng.randrange(i)
            src_toks = texts[src].split(" ")
            toks = [
                (words[pyrng.randrange(V)] if pyrng.random() < 0.05 else t)
                for t in src_toks
            ]
            pairs.append((src, i, "mutate"))
        elif i > 10 and roll < 0.11:  # verbatim containment embed
            src = pyrng.randrange(i)
            src_toks = texts[src].split(" ")
            cut = max(1, L // 4)
            toks = toks[:cut] + src_toks + toks[cut : cut * 2]
            pairs.append((src, i, "contain"))
        texts.append(" ".join(toks))
    return (texts, pairs) if return_pairs else texts


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    vocab_mode = sys.argv[3] if len(sys.argv) > 3 else "empirical"
    assert vocab_mode in ("empirical", "zipf"), vocab_mode
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    def wanted(t: str) -> bool:
        return only is None or t in only

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    # fixed dims: straight copies
    for t in ("region", "nation"):
        if not wanted(t):
            continue
        con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # key-shifted replicas; offsets chosen per key domain
    shifts = {
        "customer": {"c_custkey": 1_000_000},
        "supplier": {"s_suppkey": 1_000_000},
        "part": {"p_partkey": 1_000_000},
        "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
        "lineitem": {
            "l_orderkey": 10_000_000,
            "l_partkey": 1_000_000,
            "l_suppkey": 1_000_000,
        },
        "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    }
    for t, keymap in shifts.items():
        if not wanted(t):
            continue
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()]
        # one replica per generate_series row (NOT a factor-way UNION
        # ALL: a 1000-branch union exceeds the parser's expression
        # depth — found generating the fourth decade), same key-shifted
        # multiset at any factor
        proj = ", ".join(
            f"({c} + r.i * {off}) AS {c}" if (off := keymap.get(c)) else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM {src(t)} CROSS JOIN (SELECT "
            f"unnest(generate_series(0, {factor - 1})) AS i) r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    # documents: sample from the sf0.1 token distribution
    if wanted("documents"):
        rows = con.execute(
            f"SELECT doc_id, text, lang, source FROM {src('documents')}"
        ).fetchall()
        vocab: dict[str, int] = {}
        lengths = []
        langs, sources = [], []
        for _, text, lang, source in rows:
            toks = [t for t in text.split(" ") if t]
            lengths.append(len(toks))
            langs.append(lang)
            sources.append(source)
            for tk in toks:
                vocab[tk] = vocab.get(tk, 0) + 1
        words = list(vocab)
        weights = np.array([vocab[w] for w in words], dtype=np.float64)
        weights /= weights.sum()
        rng = np.random.default_rng(42)
        pyrng = random.Random(42)
        n_docs = len(rows) * factor
        doc_ids, out_langs, out_sources, n_chars = [], [], [], []
        if vocab_mode == "zipf":
            texts = _zipf_texts(n_docs, lengths, rng, pyrng)
        else:
            texts = []
            # batch-sample all tokens at once for speed
            all_lens = [
                lengths[int(rng.integers(0, len(lengths)))]
                for _ in range(n_docs)
            ]
            total = sum(all_lens)
            flat = rng.choice(len(words), size=total, p=weights)
            pos = 0
            for i in range(n_docs):
                L = all_lens[i]
                toks = [words[j] for j in flat[pos : pos + L]]
                pos += L
                texts.append(" ".join(toks))
        for i, txt in enumerate(texts):
            doc_ids.append(i)
            out_langs.append(pyrng.choice(langs))
            out_sources.append(pyrng.choice(sources))
            n_chars.append(len(txt))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(out_langs, pa.string()),
                    "source": pa.array(out_sources, pa.string()),
                    "n_chars": pa.array(n_chars, pa.int64()),
                }
            ),
            f"{out}/documents.parquet",
            # bounded row groups: a single-row-group file defeats Spark's
            # byte-range splitting (one task owns the whole table — found
            # live as a 12-idle/1-hot straggler in every sf10 PQ stage)
            row_group_size=16384,
        )

    # embeddings: replica 0 = original; each further replica is MOSTLY
    # fresh unit vectors (random-gaussian cosines concentrate at
    # 0 ± 1/√d — never near-dups) with a 2% planted near-dup fraction
    # (tiny perturbation of the replica-0 original, cosine ≈ 0.99).
    # The earlier σ=0.05-noise-on-every-replica scheme made EVERY
    # replica of a vector a near-dup of every other replica — ~2·10⁹
    # TRUE pairs at factor 1000, output quadratic in factor (found as
    # the round-7 SCALE.md exclusion) — whereas a web corpus's near-dup
    # pair count is roughly linear in corpus size.  Planted truth is
    # written beside the table (embedding_dup_pairs.parquet: src =
    # replica-0 vec_id, dup = the planted copy) so recall tests assert
    # the dedup tier RECOVERS the structure, not just runs on it.
    if wanted("embeddings"):
        erng = np.random.default_rng(4242)
        emb = con.execute(
            f"SELECT vec_id, embedding, label FROM {src('embeddings')} ORDER BY vec_id"
        ).fetchall()
        dim = len(emb[0][1])
        base = np.array([e[1] for e in emb], dtype=np.float32)
        base_ids = np.array([e[0] for e in emb], dtype=np.int64)
        base_labels = np.array([e[2] for e in emb], dtype=np.int32)
        n_base = len(emb)
        ids, vecs, labels = [], [], []
        pair_src, pair_dup = [], []
        for i in range(factor):
            if i == 0:
                v = base
            else:
                mask = erng.random(n_base) < 0.02
                fresh = erng.normal(0, 1, size=(n_base, dim))
                fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
                noise = erng.normal(0, 0.02, size=(n_base, dim))
                v = np.where(
                    mask[:, None], base + noise, fresh
                ).astype(np.float32)
                dup_ids = base_ids[mask] + i * 1_000_000
                pair_src.extend(int(x) for x in base_ids[mask])
                pair_dup.extend(int(x) for x in dup_ids)
            for j in range(n_base):
                ids.append(int(base_ids[j]) + i * 1_000_000)
                vecs.append(v[j].tolist())
                labels.append(int(base_labels[j]))
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            ),
            f"{out}/embeddings.parquet",
            row_group_size=16384,
        )
        if factor > 1:
            pq.write_table(
                pa.table(
                    {
                        "src_vid": pa.array(pair_src, pa.int64()),
                        "dup_vid": pa.array(pair_dup, pa.int64()),
                    }
                ),
                f"{out}/embedding_dup_pairs.parquet",
            )
    for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
        if not wanted(t):
            continue
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
