"""Recall pin for the posting-list TF-IDF knn (operators/similarity.py
::tfidf_knn_posting).

The df cap is a recall/cost tradeoff: tokens above the cap never
generate candidate pairs, so a neighbor reachable ONLY through
high-df tokens is lost. The claim in the operator docstring is that on
a power-law (Zipf-ish) vocabulary the capped result recovers almost
all true nearest neighbors, because high-df tokens carry near-zero
idf weight and therefore almost never decide the top-k. This test
pins that claim: a 90-doc corpus with a handful of ubiquitous tokens
and many group-shared rare tokens, capped knn vs exact (uncapped)
brute-force cosine — recall@3 must be >= 0.9.

Also pins the hybrid-cap regression from r5: with an absolute-only
cap, a corpus whose every discriminative token's df exceeds the cap
returns an EMPTY result (this is what the sf0.1 bench was silently
timing); the relative term must keep the candidate set alive.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from healthcare_research_data_pipeline_project_spark.operators.similarity import (
    tfidf_knn_posting,
)

K = 3


def _zipf_corpus() -> list[tuple[int, str]]:
    # 88 docs, 13 tokens each: 5 ubiquitous fillers (df ~ 88, near-zero
    # idf) + group-shared rare tokens (df <= 4, high idf). Groups of 4
    # docs draw from the same rare pool, so every doc has exactly 3
    # true rare-token neighbors — its exact top-3.
    rng = random.Random(7)
    fillers = [f"common{i}" for i in range(5)]
    docs = []
    for i in range(88):
        group = i // 4
        pool = [f"rare{group}_{j}" for j in range(8)]
        toks = [rng.choice(fillers) for _ in range(7)] + rng.sample(pool, 6)
        rng.shuffle(toks)
        docs.append((i, " ".join(toks)))
    return docs


def _exact_topk(docs: list[tuple[int, str]]) -> dict[int, set[int]]:
    # uncapped brute-force tf-idf cosine, same weight definition as the
    # operator (tf * ln(n/df), idf rounded to 6 dp)
    tf = {d: Counter(t.split()) for d, t in docs}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(docs)
    w = {
        d: {t: cnt * round(math.log(n / df[t]), 6) for t, cnt in c.items()}
        for d, c in tf.items()
    }
    nrm = {d: math.sqrt(sum(x * x for x in ws.values())) for d, ws in w.items()}
    out: dict[int, set[int]] = {}
    for d, ws in w.items():
        scored = []
        for e, we in w.items():
            if e == d:
                continue
            dot = sum(v * we.get(t, 0.0) for t, v in ws.items())
            if dot > 0:
                scored.append((round(dot / (nrm[d] * nrm[e]), 4), -e))
        scored.sort(reverse=True)
        out[d] = {-e for _, e in scored[:K]}
    return out


def test_capped_knn_recall_on_zipf_vocab(spark):
    docs = _zipf_corpus()
    sdf = spark.createDataFrame(docs, "doc_id int, text string")
    # cap: abs 10 (fillers df~90 excluded, rare df<=6 kept); relative
    # term 6% of 90 = 5 — abs dominates here
    got = tfidf_knn_posting(sdf, k=K, df_max=10, df_max_pct=6)
    got_sets: dict[int, set[int]] = {}
    for r in got.collect():
        got_sets.setdefault(r["doc_id"], set()).add(r["nbr_id"])
    exact = _exact_topk(docs)
    hits = sum(len(got_sets.get(d, set()) & nbrs) for d, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    assert total >= 88 * (K - 1)  # the corpus really has neighbors
    recall = hits / total
    assert recall >= 0.9, f"recall@{K} {recall:.3f} < 0.9"


def test_relative_cap_keeps_discriminative_token_alive(spark):
    # every token's df exceeds the absolute cap, but one planted token
    # sits at 5% of docs: absolute-only cap -> empty result (the r5
    # sf0.1 bench bug); the hybrid cap must keep it generating pairs
    n = 400
    rows = []
    for i in range(n):
        toks = [f"common{j}" for j in range(8)]  # df = 400 for all
        if i % 20 == 0:  # 5% of docs share the planted marker
            toks.append("plantedmarker")
        rows.append((i, " ".join(toks)))
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    empty = tfidf_knn_posting(sdf, k=K, df_max=10, df_max_pct=0)
    assert empty.count() == 0  # absolute-only: vacuous
    alive = tfidf_knn_posting(sdf, k=K, df_max=10, df_max_pct=6)
    got = alive.collect()
    assert len(got) > 0
    marked = {i for i in range(n) if i % 20 == 0}
    assert {r["doc_id"] for r in got} == marked
    assert {r["nbr_id"] for r in got} <= marked


def test_champion_cap_bounds_candidates(spark):
    # 40 docs all sharing one token (plus a unique filler each):
    # champions=8 must admit only the 8 first champion postings
    # (w ties -> doc_id ascending), so candidates — and therefore all
    # output rows — stay within those 8 docs. This is the constant-in-
    # corpus-size bound that keeps the pair join alive at 100 TB.
    rows = [(i, f"shared uniq{i}") for i in range(40)]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    out = tfidf_knn_posting(
        sdf, k=39, df_max=100, df_max_pct=0, champions=8
    ).collect()
    ids = {r["doc_id"] for r in out} | {r["nbr_id"] for r in out}
    assert ids == set(range(8))
    # with the cap above the posting size, all 40 participate
    full = tfidf_knn_posting(
        sdf, k=39, df_max=100, df_max_pct=0, champions=256
    ).collect()
    assert {r["doc_id"] for r in full} == set(range(40))


@pytest.mark.parametrize("k", [1, 5])
def test_k_bounds_rows_per_doc(spark, k):
    docs = _zipf_corpus()
    sdf = spark.createDataFrame(docs, "doc_id int, text string")
    out = tfidf_knn_posting(sdf, k=k, df_max=10, df_max_pct=6).collect()
    per_doc = Counter(r["doc_id"] for r in out)
    assert per_doc and max(per_doc.values()) <= k
    ranks = {(r["doc_id"], r["rank"]) for r in out}
    assert all(1 <= r <= k for _, r in ranks)
