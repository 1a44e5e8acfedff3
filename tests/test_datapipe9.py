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
