"""Semantic pins for the datapipe6 corpus: sequence packing, weighted
Poisson sampling, CUSUM change-point detection, and PSI drift.
Hand-computable fixtures via the load_tables stub pattern (the DuckDB
equivalence itself is covered by test_corpus_oracle)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe6 as d6


def _stub(monkey_tables):
    class _T:
        pass

    for k, v in monkey_tables.items():
        setattr(_T, k, v)
    return _T()


def _with_tables(spark, tables, name):
    orig = d6.load_tables
    d6.load_tables = lambda s, d: _stub(tables)
    try:
        return QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        d6.load_tables = orig


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )


def test_pack_sequences_hand_case(spark):
    # budget 512; doc token counts: 300, 300, 512, 100.
    # offsets: d1 [0,300) seq0; d2 [300,600) seq0 SPLIT; d3 [600,1112)
    # seq1 SPLIT; d4 [1112,1212) seq2.
    rows = [
        (1, " ".join(["a"] * 300), "en", "s", 1),
        (2, " ".join(["b"] * 300), "en", "s", 1),
        (3, " ".join(["c"] * 512), "en", "s", 1),
        (4, " ".join(["d"] * 100), "en", "s", 1),
    ]
    got = {
        r["seq_id"]: r
        for r in _with_tables(
            spark, {"documents": _docs(spark, rows)}, "ds_pack_sequences"
        )
    }
    assert set(got) == {0, 1, 2}
    s0, s1, s2 = got[0], got[1], got[2]
    assert (s0["n_docs"], s0["n_tokens"], s0["n_split_docs"]) == (2, 600, 1)
    assert (s0["first_doc"], s0["last_doc"]) == (1, 2)
    assert (s1["n_docs"], s1["n_tokens"], s1["n_split_docs"]) == (1, 512, 1)
    assert (s2["n_docs"], s2["n_tokens"], s2["n_split_docs"]) == (1, 100, 0)
    # conservation: every token is attributed to exactly one start-seq
    assert sum(r["n_tokens"] for r in got.values()) == 1212


def test_pack_sequences_partition_invariant(spark):
    rows = [
        (i, " ".join(["w"] * (37 + 13 * (i % 7))), "en", "s", 1)
        for i in range(60)
    ]
    docs = _docs(spark, rows)
    a = _with_tables(spark, {"documents": docs}, "ds_pack_sequences")
    b = _with_tables(
        spark, {"documents": docs.repartition(11)}, "ds_pack_sequences"
    )
    key = lambda r: (
        r["seq_id"], r["n_docs"], r["n_tokens"], r["n_split_docs"],
        r["first_doc"], r["last_doc"],
    )
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_weighted_sample_exact_inclusion_rule(spark):
    # recompute the integer Bernoulli rule driver-side and pin equality
    import hashlib

    rows = [(i, "x", "en", "s", 10 + (i * 37) % 500) for i in range(400)]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: r for r in _with_tables(
        spark, {"documents": docs}, "ds_weighted_sample"
    )}
    tot_w = sum(r[4] for r in rows)
    expect = set()
    for i, _, _, _, w in rows:
        h = int(hashlib.md5(f"{i}#wsample".encode()).hexdigest()[:8], 16)
        if (h % 1_000_000) * tot_w < 100 * w * 1_000_000:
            expect.add(i)
    assert set(got) == expect
    # expected-size sanity: Poisson(≈100) stays well inside ±5σ
    assert 50 <= len(got) <= 150
    for i, r in got.items():
        w = rows[i][4]
        assert abs(r["incl_p"] - min(1.0, round(100 * w / tot_w, 6))) < 2e-6


def test_cusum_changepoint_hand_case(spark):
    # one type, 6 days: level 10 for 3 days then 20 for 3 days —
    # CUSUM peaks exactly at the shift (day 3). S_k(cents)=1000·k for
    # k<=3; dev_k=|6·S_k−k·S_6|, S_6=9000 ⇒ dev_3=|18000−27000|=9000.
    rows = []
    for day in range(6):
        val = 10.0 if day < 3 else 20.0
        rows.append(
            (day, datetime.datetime(2024, 1, 1 + day, 12), 1, "click",
             val, "{}")
        )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [r] = _with_tables(spark, {"events": events}, "t_cusum_changepoint")
    assert r["n_days"] == 6
    assert r["cp_day_idx"] == 3
    assert r["cp_date"] == "2024-01-03"
    # S_3 = 3000 cents, S_6 = 9000 cents: |6·3000 − 3·9000| = 9000
    assert r["cusum_peak_cents_x_n"] == 9000


def test_psi_drift_identical_cohorts_near_zero_and_shifted_large(spark):
    ts = datetime.datetime(2024, 1, 5)
    rows = []
    # type "same": parity cohorts identically distributed → psi ≈ 0
    for i in range(200):
        rows.append((i, ts, 1, "same", float((i // 2) % 10) * 50.0, "{}"))
    # type "shift": cohort A all in bucket 0, cohort B all in bucket 9
    for i in range(200, 400):
        rows.append(
            (i, ts, 1, "shift", 0.0 if i % 2 == 0 else 490.0, "{}")
        )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["event_type"]: r for r in _with_tables(
        spark, {"events": events}, "dq_psi_drift"
    )}
    assert got["same"]["psi"] == 0.0
    # hand value: 2 buckets observed, tot=100/cohort, nb=2 ⇒
    # p=(101/102, 1/102) vs (1/102, 101/102):
    # psi = 2·(100/102)·ln(101) summed over both buckets
    expect = 2 * (100 / 102) * math.log(101.0)
    assert abs(got["shift"]["psi"] - expect) < 1e-5
    assert got["shift"]["n_buckets"] == 2


def test_canonical_keep_planted_duplicates(spark):
    # 3 identical docs (one cluster, keeper=min id) + 2 unique docs in
    # another source: web keeps 1 of 3, news keeps both
    dup = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, dup, "en", "web", 10),
        (2, dup, "en", "web", 20),
        (3, dup, "en", "web", 40),
        (4, "totally unrelated text about spark engines " * 8, "en", "news", 7),
        (5, "another completely different news article body " * 8, "en", "news", 9),
    ]
    got = {r["source"]: r for r in _with_tables(
        spark, {"documents": _docs(spark, rows)}, "dedup_canonical_keep"
    )}
    w, n = got["web"], got["news"]
    assert (w["n_docs"], w["n_keepers"], w["n_dropped"], w["kept_chars"]) == (
        3, 1, 2, 10,
    )
    assert (n["n_docs"], n["n_keepers"], n["n_dropped"]) == (2, 2, 0)
    assert n["kept_chars"] == 16


def test_psi_drift_partition_invariant(spark):
    ts = datetime.datetime(2024, 1, 5)
    rows = [
        (i, ts, 1, "t", float((i * 17) % 500), "{}") for i in range(500)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [a] = _with_tables(spark, {"events": events}, "dq_psi_drift")
    [b] = _with_tables(
        spark, {"events": events.repartition(17)}, "dq_psi_drift"
    )
    assert a["psi"] == b["psi"]


def test_dsir_sample_upweights_target_like_docs(spark):
    # target slice (src0) speaks vocabulary A; the raw remainder
    # (src9) speaks vocabulary B — except three "gold" src9 docs that
    # speak A. DSIR's whole point: the gold docs must carry strictly
    # higher importance weights than every B-speaking doc.
    voc_a = "alpha beta gamma delta " * 20
    voc_b = "omega sigma theta kappa " * 20
    rows = [(i, voc_a, "en", "src0", 1) for i in range(10)]
    rows += [(100 + i, voc_b, "en", "src9", 1) for i in range(10)]
    rows += [(200 + i, voc_a, "en", "src9", 1) for i in range(3)]
    got = _with_tables(
        spark, {"documents": _docs(spark, rows)}, "ds_dsir_sample"
    )
    # 23 docs < K=50: the whole corpus comes back (Gumbel top-k over
    # everything), keys strictly descending with doc_id tie-break
    assert len(got) == 23
    keys = [(r["key_micro"], -r["doc_id"]) for r in got]
    assert keys == sorted(keys, reverse=True)
    by_id = {r["doc_id"]: r for r in got}
    gold = [by_id[200 + i]["logw_nats"] for i in range(3)]
    bad = [by_id[100 + i]["logw_nats"] for i in range(10)]
    assert min(gold) > max(bad)
    # identical text => identical weight (features are content-only)
    assert len(set(gold)) == 1 and len(set(bad)) == 1


def test_dsir_sample_short_docs_stay_candidates(spark):
    # a doc with < 2 tokens has no bigram features; it must still be
    # a sample candidate with logw = 0 (left-join path), not vanish
    rows = [(1, "solo", "en", "src9", 1), (2, "a b c d", "en", "src0", 1)]
    got = {r["doc_id"]: r for r in _with_tables(
        spark, {"documents": _docs(spark, rows)}, "ds_dsir_sample"
    )}
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 0 and got[1]["logw_nats"] == 0.0
    assert got[2]["n_bigrams"] == 3


def test_dsir_sample_partition_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)),
         "en", f"src{i % 6}", 1)
        for i in range(80)
    ]
    docs = _docs(spark, rows)
    a = _with_tables(spark, {"documents": docs}, "ds_dsir_sample")
    b = _with_tables(
        spark, {"documents": docs.repartition(13)}, "ds_dsir_sample"
    )
    key = lambda r: (
        r["doc_id"], r["source"], r["n_bigrams"], r["logw_nats"],
        r["key_micro"],
    )
    assert sorted(map(key, a)) == sorted(map(key, b))
