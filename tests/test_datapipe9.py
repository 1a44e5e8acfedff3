"""Semantic pins for the datapipe9 corpus: Poissonized bootstrap CI
and Welch's t-test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe9 as d9


def _stub(monkey_tables):
    class _T:
        pass

    for k, v in monkey_tables.items():
        setattr(_T, k, v)
    return _T()


def _with_tables(spark, tables, name):
    orig = d9.load_tables
    d9.load_tables = lambda s, d: _stub(tables)
    try:
        return QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        d9.load_tables = orig


def test_bootstrap_ci_constant_data_collapses(spark):
    # every resample of a constant column has the same mean, so the
    # interval collapses to the point
    orders = spark.createDataFrame(
        [(i, 5.0) for i in range(60)], "o_orderkey long, o_totalprice double"
    )
    r = _with_tables(spark, {"orders": orders}, "stat_bootstrap_ci")[0]
    assert r["n_replicas"] == 100
    assert r["ci_lo"] == 5.0 and r["ci_hi"] == 5.0


def test_bootstrap_ci_ordered_and_brackets_mean(spark):
    orders = spark.createDataFrame(
        [(i, float(1 + i % 9)) for i in range(200)],
        "o_orderkey long, o_totalprice double",
    )
    r = _with_tables(spark, {"orders": orders}, "stat_bootstrap_ci")[0]
    assert r["ci_lo"] <= r["ci_hi"]
    true_mean = sum(1 + i % 9 for i in range(200)) / 200
    assert r["ci_lo"] <= true_mean <= r["ci_hi"]
    # deterministic resampling: identical on a second run
    r2 = _with_tables(spark, {"orders": orders}, "stat_bootstrap_ci")[0]
    assert (r2["ci_lo"], r2["ci_hi"]) == (r["ci_lo"], r["ci_hi"])


def test_welch_identical_groups_t_zero(spark):
    rows = [(v, f) for f in ("A", "R") for v in (10.0, 20.0, 30.0)]
    li = spark.createDataFrame(
        rows, "l_extendedprice double, l_returnflag string"
    )
    r = _with_tables(spark, {"lineitem": li}, "stat_ttest_welch")[0]
    assert (r["n1"], r["n2"]) == (3, 3)
    assert r["t_stat"] == 0.0 and r["mean_diff"] == 0.0


def test_welch_shifted_group_hand_value(spark):
    # A = {1,2,3}, R = {4,5,6}: mean diff -3, s² = 1 each →
    # t = -3 / sqrt(1/3 + 1/3) = -3.6742
    rows = [(1.0, "A"), (2.0, "A"), (3.0, "A"), (4.0, "R"), (5.0, "R"),
            (6.0, "R"), (99.0, "N")]
    li = spark.createDataFrame(
        rows, "l_extendedprice double, l_returnflag string"
    )
    r = _with_tables(spark, {"lineitem": li}, "stat_ttest_welch")[0]
    assert r["mean_diff"] == -3.0
    assert r["t_stat"] == pytest.approx(-3.6742, abs=1e-4)


def test_seasonal_anomaly_flags_break_not_seasonality(spark):
    import datetime as _dt

    # Mondays always 100, Tuesdays always 100 — except ONE Tuesday at
    # 200 and one at 2: the breaks must flag, the steady days must not
    rows = []
    d = _dt.datetime(2024, 1, 1)  # a Monday
    for week in range(12):
        rows.append((d + _dt.timedelta(days=7 * week), 100.0))       # Mon
        rows.append((d + _dt.timedelta(days=7 * week + 1), 100.0))   # Tue
    rows[5] = (rows[5][0], 200.0)   # one anomalous Tuesday up
    rows[11] = (rows[11][0], 2.0)   # one anomalous day down
    orders = spark.createDataFrame(
        rows, "o_orderdate timestamp, o_totalprice double"
    )
    got = _with_tables(spark, {"orders": orders}, "t_seasonal_anomaly")
    flagged = {r["day"] for r in got}
    assert str(rows[5][0].date()) in flagged
    assert str(rows[11][0].date()) in flagged
    assert len(flagged) == 2  # steady days never flag
    by_day = {r["day"]: r for r in got}
    assert by_day[str(rows[5][0].date())]["z"] > 0
    assert by_day[str(rows[11][0].date())]["z"] < 0


def test_k_anonymity_hand_case(spark):
    # class (1, X): 5 rows (safe at k=5); class (2, Y): 2 rows
    # (violating) → 2 rows to suppress out of 7
    rows = [(1, "X")] * 5 + [(2, "Y")] * 2
    cust = spark.createDataFrame(
        rows, "c_nationkey int, c_mktsegment string"
    )
    r = _with_tables(spark, {"customer": cust}, "dq_k_anonymity")[0]
    assert (r["n_classes"], r["violating_classes"]) == (2, 1)
    assert (r["rows_to_suppress"], r["min_class_size"]) == (2, 2)
    assert r["suppression_pct"] == pytest.approx(2 * 100 / 7, abs=1e-3)


def test_l_diversity_hand_case(spark):
    cust = spark.createDataFrame(
        [(10, 1, "X"), (20, 2, "Y")],
        "c_custkey long, c_nationkey int, c_mktsegment string",
    )
    # class (1,X): 3 distinct priorities (safe at l=3);
    # class (2,Y): 2 orders, 1 distinct (violating, 2 exposed rows)
    orders = spark.createDataFrame(
        [(10, "1-a"), (10, "2-b"), (10, "3-c"), (20, "1-a"), (20, "1-a")],
        "o_custkey long, o_orderpriority string",
    )
    r = _with_tables(
        spark, {"customer": cust, "orders": orders}, "dq_l_diversity"
    )[0]
    assert (r["n_classes"], r["violating_classes"]) == (2, 1)
    assert (r["min_diversity"], r["exposed_rows"]) == (1, 2)


def test_simhash_pairs_identical_docs_pair_at_zero(spark):
    import healthcare_research_data_pipeline_project_spark.queries.datapipe10 as d10
    from healthcare_research_data_pipeline_project_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "s", "en", 1),
            (2, "alpha beta gamma delta epsilon", "s", "en", 1),  # identical
            (3, "totally different words entirely here", "s", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    orig = d10.load_tables
    d10.load_tables = lambda s_, d_: type("T", (), {"documents": docs})()
    try:
        rows = QUERIES["dedup_simhash_pairs"](spark, SF_SMOKE).collect()
    finally:
        d10.load_tables = orig
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0           # identical text → distance 0
    assert (1, 3) not in got and (2, 3) not in got
