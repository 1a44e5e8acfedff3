"""Extended-operator tests: as-of join semantics and plan shape,
lead-pairing equivalence to the band self-join, rollup/pivot
structure. Value correctness of the registered queries is pinned by
the DuckDB oracle harness (test_corpus_oracle)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.operators.temporal import asof_join
from healthcare_research_data_pipeline_project_spark.plans import explain as X
from healthcare_research_data_pipeline_project_spark.queries import extended as EXT
from healthcare_research_data_pipeline_project_spark.tables import load_tables
from tests.conftest import SF_SMOKE


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# As-of join semantics
# ---------------------------------------------------------------------------
def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),  # matches r@09:00
            (1, _ts("2024-01-01 12:00:00"), "b"),  # matches r@12:00 (incl.)
            (2, _ts("2024-01-01 08:00:00"), "c"),  # no right row at/before
            (3, _ts("2024-01-01 08:00:00"), "d"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 90),
            (1, _ts("2024-01-01 12:00:00"), 120),
            (2, _ts("2024-01-01 09:30:00"), 93),
        ],
        "k long, ts timestamp, payload int",
    )
    got = {
        r["tag"]: (r["payload"], r["matched_ts"])
        for r in asof_join(left, right, "k", "ts", "ts", ["payload"]).collect()
    }
    assert got["a"] == (90, _ts("2024-01-01 09:00:00"))
    assert got["b"] == (120, _ts("2024-01-01 12:00:00"))  # inclusive <=
    assert got["c"] == (None, None)
    assert got["d"] == (None, None)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 80)], "k long, ts timestamp, payload int"
    )
    fresh = asof_join(
        left, right, "k", "ts", "ts", ["payload"], tolerance_seconds=3 * 3600
    ).collect()[0]
    stale = asof_join(
        left, right, "k", "ts", "ts", ["payload"], tolerance_seconds=3600
    ).collect()[0]
    assert fresh["payload"] == 80
    assert stale["payload"] is None and stale["matched_ts"] is None


def test_asof_join_plan_is_window_not_pair_explosion(spark):
    """The scalable shape: union + window on the key, never a nested-
    loop/cartesian pair enumeration."""
    df = EXT.t_asof_join(spark, SF_SMOKE)
    p = X.plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p


# ---------------------------------------------------------------------------
# Lead pairing ≡ band self-join (same 30-day semantics, one shuffle)
# ---------------------------------------------------------------------------
def test_lead_reorder_matches_band_self_join(spark):
    t = load_tables(spark, SF_SMOKE)
    via_lead = {
        r["o_orderpriority"]: r["reorder_30d"]
        for r in EXT.w5_lead_reorder(spark, SF_SMOKE).collect()
    }
    o1, o2 = t.orders.alias("o1"), t.orders.alias("o2")
    later = (F.col("o2.o_orderdate") > F.col("o1.o_orderdate")) | (
        (F.col("o2.o_orderdate") == F.col("o1.o_orderdate"))
        & (F.col("o2.o_orderkey") > F.col("o1.o_orderkey"))
    )
    within = F.col("o2.o_orderdate") <= F.date_add(F.col("o1.o_orderdate"), 30)
    via_band = {
        r["o_orderpriority"]: r["n"]
        for r in o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey")) & later & within,
            "left_semi",
        )
        .groupBy(F.col("o1.o_orderpriority").alias("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert via_lead == via_band


# ---------------------------------------------------------------------------
# Rollup / pivot structure
# ---------------------------------------------------------------------------
def test_rollup_has_grand_total(spark):
    rows = EXT.a16_rollup(spark, SF_SMOKE).collect()
    total = load_tables(spark, SF_SMOKE).lineitem.count()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["line_cnt"] == total
    assert grand[0]["l_returnflag"] is None


def test_pivot_unpivot_roundtrip(spark):
    """stack() inverts the pivot back to the long form."""
    p = EXT.a17_pivot(spark, SF_SMOKE)
    long = p.select(
        "l_returnflag",
        F.expr(
            "stack(2, 'F', f_qty_cents, 'O', o_qty_cents)"
            " AS (l_linestatus, qty_cents)"
        ),
    ).filter(F.col("qty_cents").isNotNull())
    direct = (
        load_tables(spark, SF_SMOKE)
        .lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("qty_cents")
        )
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(long) == as_set(direct)
