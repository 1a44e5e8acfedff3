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


def test_interval_join_matches_naive(spark):
    from healthcare_research_data_pipeline_project_spark.operators.interval import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 10:{i:02d}:00")) for i in range(60)],
        "pid long, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:05:00"), _ts("2024-01-01 10:15:00")),
            (200, _ts("2024-01-01 10:50:00"), _ts("2024-01-01 11:10:00")),
            (300, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 09:30:00")),
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "p_ts", "w_start", "w_end", 600
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter(F.col("p_ts").between(F.col("w_start"), F.col("w_end")))
        .collect()
    }
    assert got == naive and len(got) == 11 + 10  # [05,15] and [50,59]


def test_interval_join_plan_no_nested_loop(spark):
    df = EXT.t_interval_join(spark, SF_SMOKE)
    p = X.plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_approx_within_tolerance(spark):
    rows = EXT.a2b_approx_stats(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # the sketch-vs-exact verdicts the oracle pins as literal TRUE
        # must be genuinely computed TRUE on real estimates
        assert r["hll_within_tol"] is True
        assert r["p50_within_tol"] is True
        assert r["exact_custs"] > 0
        # a+b integer carry of the interpolated median: even cents sum
        assert r["p50_x2_cents"] > 0


def test_click_purchase_stream_join(spark, tmp_path):
    from healthcare_research_data_pipeline_project_spark.streaming import (
        joins as SJ,
        surveillance as sv,
    )

    rows = [
        # (event_id, ts, user_id, event_type)
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:05:00", 1, "purchase"),   # pairs with 1
        (3, "2024-01-01 10:20:00", 1, "purchase"),   # >10min after click 1
        (4, "2024-01-01 10:18:00", 1, "click"),      # pairs with 3
        (5, "2024-01-01 10:06:00", 2, "purchase"),   # user 2: no click
        (6, "2024-01-01 12:00:00", 3, "click"),      # click w/o purchase
    ]
    src = str(tmp_path / "cp_events")
    spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(2).write.parquet(src)

    out = sv.run_available_now(
        SJ.click_purchase_join(sv.stream_events(spark, src)),
        "t_cp_join",
        output_mode="append",
    )
    pairs = {(r["purchase_id"], r["click_id"]) for r in out}
    assert pairs == {(2, 1), (3, 4)}


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


def test_asof_join_nearest_hand_case(spark):
    # nearest in either direction; backward wins exact ties; tolerance
    # nulls far matches; no candidate at all -> null
    from healthcare_research_data_pipeline_project_spark.operators.temporal import (
        asof_join_nearest,
    )

    ts = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("a", ts(10), 1),   # backward@8 (gap 2) vs forward@13 (gap 3) -> b
            ("a", ts(12), 2),   # tie: backward@8 gap 4? no - fwd@13 gap 1 -> f
            ("a", ts(50), 3),   # nothing within tol 5 -> null
            ("b", ts(10), 4),   # only forward@11 -> f
            ("c", ts(10), 5),   # no right rows at all -> null
        ],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [
            ("a", ts(8), 100),
            ("a", ts(13), 101),
            ("b", ts(11), 102),
        ],
        "k string, ts timestamp, payload int",
    )
    got = {
        r["eid"]: (r["payload"], r["matched_ts"])
        for r in asof_join_nearest(
            left, right, "k", "ts", "ts", ["payload"], tolerance_seconds=5
        ).collect()
    }
    assert got[1] == (100, ts(8))
    assert got[2] == (101, ts(13))
    assert got[3] == (None, None)
    assert got[4] == (102, ts(11))
    assert got[5] == (None, None)
    # exact tie: backward and forward equidistant -> backward wins
    left2 = spark.createDataFrame(
        [("a", ts(10), 1)], "k string, ts timestamp, eid int"
    )
    right2 = spark.createDataFrame(
        [("a", ts(8), 200), ("a", ts(12), 201)],
        "k string, ts timestamp, payload int",
    )
    r2 = asof_join_nearest(
        left2, right2, "k", "ts", "ts", ["payload"]
    ).collect()[0]
    assert r2["payload"] == 200 and r2["matched_ts"] == ts(8)
    # equal-timestamp right row matches at gap 0
    right3 = spark.createDataFrame(
        [("a", ts(10), 300)], "k string, ts timestamp, payload int"
    )
    r3 = asof_join_nearest(
        left2, right3, "k", "ts", "ts", ["payload"]
    ).collect()[0]
    assert r3["payload"] == 300


def test_asof_nearest_plan_is_window_not_pair_explosion(spark):
    df = EXT.t_asof_nearest(spark, SF_SMOKE)
    p = X.plan(df).lower()
    assert "cartesian" not in p and "nestedloop" not in p
