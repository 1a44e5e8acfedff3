"""Pins for product quantization: codebook shape, encoding
well-formedness and self-consistency, ADC score correctness against a
pure-Python recomputation, and recall@k vs the exact brute-force
ranking on the smoke corpus."""

from __future__ import annotations

import pytest

from healthcare_research_data_pipeline_project_spark.operators import (
    similarity as S,
)
from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from healthcare_research_data_pipeline_project_spark.tables import load_tables
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe7  # noqa: F401


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF_SMOKE).embeddings


def test_codebook_shape_and_determinism(spark, emb):
    b1 = S.train_pq_codebooks(emb, m=8, ksub=16)
    b2 = S.train_pq_codebooks(emb, m=8, ksub=16)
    assert len(b1) == 8
    assert all(len(sub) == 16 for sub in b1)
    assert all(len(c) == 8 for sub in b1 for c in sub)  # 64/8 dims
    assert b1 == b2  # hash-sampled + fixed seeding → bit-identical


def test_encoding_is_nearest_subcentroid(spark, emb):
    books = S.train_pq_codebooks(emb, m=8, ksub=16)
    codes = {
        r["vec_id"]: r["code"]
        for r in S.pq_encode(emb, books).collect()
    }
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    assert set(codes) == set(vecs)
    # spot-check a handful against a pure-Python argmin
    for vid in sorted(vecs)[:10]:
        v = vecs[vid]
        for j in range(8):
            sub = v[j * 8:(j + 1) * 8]
            dists = [
                sum((a - b) ** 2 for a, b in zip(sub, c))
                for c in books[j]
            ]
            assert dists[codes[vid][j]] == pytest.approx(
                min(dists), abs=1e-9
            )


def test_adc_scores_match_python(spark, emb):
    # unrefined mode: dist is the raw ADC approximation — recompute it
    # in pure Python from the codes and the LUT definition
    rows = S.pq_topk(emb, list(range(8)), k=5, m=8, ksub=16).collect()
    assert rows and len(rows) == 8 * 5
    books = S.train_pq_codebooks(emb, m=8, ksub=16)
    codes = {r["vec_id"]: r["code"] for r in S.pq_encode(emb, books).collect()}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    for r in rows[:10]:
        q = vecs[r["qid"]]
        lut = [
            [sum((q[j * 8 + t] - c[t]) ** 2 for t in range(8))
             for c in books[j]]
            for j in range(8)
        ]
        expect = sum(lut[j][codes[r["cid"]][j]] for j in range(8))
        assert r["dist"] == pytest.approx(expect, abs=1e-5)


def _exact_l2_top5(vecs, qid):
    q = vecs[qid]
    exact = sorted(
        (sum((a - b) ** 2 for a, b in zip(q, vecs[c])), c)
        for c in vecs
        if c != qid
    )[:5]
    return {c for _, c in exact}


def test_pq_refine_recall_vs_brute_force(spark, emb):
    # the m=16/ksub=32/refine=50 two-stage pipeline (the registered
    # query's route — the corpus entry reports the oracled audit
    # summary since r7, so the pair-level pins live here): recall@5 vs
    # exact L2 must beat the raw code-space ranking and clear 0.8 on
    # the (deterministic) smoke corpus (measured: 0.93 refined vs
    # 0.125 raw m=8 codes)
    refined = S.pq_topk(
        emb, list(range(8)), k=5, m=16, ksub=32, refine=50
    ).collect()
    raw = S.pq_topk(emb, list(range(8)), k=5, m=8, ksub=16).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    hits_ref = hits_raw = 0
    for qid in range(8):
        exact_ids = _exact_l2_top5(vecs, qid)
        hits_ref += len(exact_ids & {r["cid"] for r in refined
                                     if r["qid"] == qid})
        hits_raw += len(exact_ids & {r["cid"] for r in raw
                                     if r["qid"] == qid})
    assert hits_ref >= hits_raw
    assert hits_ref / 40 >= 0.8
    # refined distances are exact: rank-1 rows must carry the true
    # minimum over the shortlist (sanity on a couple of queries)
    for r in refined:
        if r["qid"] == 0 and r["rank"] == 1:
            d = sum(
                (a - b) ** 2
                for a, b in zip(vecs[0], vecs[r["cid"]])
            )
            assert r["dist"] == pytest.approx(d, abs=1e-5)


def test_pq_train_empty_input_raises_cleanly(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="non-empty"):
        S.train_pq_codebooks(empty, m=8, ksub=16)


def test_pq_query_audit_summary(spark):
    # the r7 oracled corpus shape: per-query verdict row — exactly k
    # returned, well-formed ranks, worst returned exact distance
    # within slack of the true k-th best
    rows = QUERIES["sim_pq_topk"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_returned"] == 5
        assert r["ranks_wellformed"]
        assert r["within_slack"]
        assert r["true_kth_l2"] > 0


def test_pq_topk_precomputed_index_matches_fresh_encode(spark, emb):
    # the index-reuse contract (r9): callers that persist the encoded
    # (vec_id, code) table — what FAISS persists — and pass it back
    # via `encoded=` must get bit-identical results to a fresh encode,
    # because the codes are deterministic given the codebooks
    books = S.train_pq_codebooks(emb, m=8, ksub=16)
    codes = S.pq_encode(emb, books)
    fresh = S.pq_topk(
        emb, [0, 1, 2], k=5, m=8, ksub=16, codebooks=books
    ).collect()
    reused = S.pq_topk(
        emb, [0, 1, 2], k=5, m=8, ksub=16, codebooks=books,
        encoded=codes,
    ).collect()
    key = lambda r: (r["qid"], r["rank"])
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, reused))
    assert {key(r) for r in fresh} == {
        (q, rk) for q in (0, 1, 2) for rk in range(1, 6)
    }
