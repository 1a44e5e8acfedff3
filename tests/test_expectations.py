"""Pins for the declarative expectations engine: rule semantics
(including NULL three-valued behavior), single-scan row validation,
uniqueness accounting, and referential checks."""

from __future__ import annotations

from healthcare_research_data_pipeline_project_spark.operators import (
    expectations as E,
)
from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe9  # noqa: F401


def _report(rows):
    return {r["rule"]: (r["n_rows"], r["n_violations"], r["pass"]) for r in rows}


def test_row_rules_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "O"), (None, -1.0, "X"), (3, None, None)],
        "k int, v double, s string",
    )
    rep = _report(
        E.validate_rows(
            df,
            [
                E.expect_not_null("k"),
                E.expect_in_range("v", 0, 10),
                E.expect_in_set("s", ["O", "F"]),
                E.expect_regex("s", "^[OF]$"),
            ],
        ).collect()
    )
    # k: one NULL violates not_null
    assert rep["k_not_null"] == (3, 1, False)
    # v: -1 violates range; NULL passes (range rule skips NULLs)
    assert rep["v_in_range"] == (3, 1, False)
    # s: 'X' violates set+regex; NULL passes both
    assert rep["s_in_set"] == (3, 1, False)
    assert rep["s_regex"] == (3, 1, False)


def test_unique_counts_extra_rows_only(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,)], "k int"
    )
    r = E.validate_unique(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_violations"], r["pass"]) == (4, 2, False)
    clean = spark.createDataFrame([(1,), (2,)], "k int")
    r2 = E.validate_unique(clean, ["k"]).collect()[0]
    assert (r2["n_violations"], r2["pass"]) == (0, True)


def test_ref_nulls_pass_and_orphans_fail(spark):
    fact = spark.createDataFrame([(1,), (2,), (None,), (9,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = E.validate_ref(fact, "fk", dim, "pk").collect()[0]
    assert r["rule"] == "fk_ref_pk"
    assert (r["n_rows"], r["n_violations"], r["pass"]) == (4, 1, False)


def test_expectations_query_all_green_on_corpus(spark):
    rows = QUERIES["dq_expectations_orders"](spark, SF_SMOKE).collect()
    rep = _report(rows)
    assert len(rep) == 6
    # the synthetic feed is clean: every expectation holds
    assert all(v[2] for v in rep.values()), rep


def test_unique_on_empty_input_reports_zero_and_passes(spark):
    # zero groups → the outer SUMs are NULL without COALESCE; the rule
    # must report 0 rows / 0 violations / pass=True like validate_rows
    from healthcare_research_data_pipeline_project_spark.operators import (
        expectations as ex,
    )

    empty = spark.createDataFrame([], "k string, v double")
    row = ex.validate_unique(empty, ["k"]).collect()[0]
    assert row["n_rows"] == 0
    assert row["n_violations"] == 0
    assert row["pass"] is True
