"""Semantic pins for the datapipe4 corpus: two-sample KS, Gini
concentration, market-basket lift, weekly retention cohorts, and the
distribution-window battery. Hand-computable fixtures via the
load_tables stub pattern (see test_datapipe3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe4 as d4


def _stub(monkey_tables):
    class _T:
        def raw(self, name):
            # Tables.raw parity: same frame, no fan-out repartition
            return monkey_tables[name]

    for k, v in monkey_tables.items():
        setattr(_T, k, v)
    return _T()


def _with_tables(spark, tables, name):
    orig = d4.load_tables
    d4.load_tables = lambda s, d: _stub(tables)
    try:
        return QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        d4.load_tables = orig


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderpriority string"
    )


def test_ks_fully_separated_distributions(spark):
    # hi prices {1,2} strictly below lo prices {3,4} → D = 1
    rows = [
        (1, 1, 1.0, "1-URGENT"),
        (2, 1, 2.0, "2-HIGH"),
        (3, 2, 3.0, "5-LOW"),
        (4, 2, 4.0, "3-MEDIUM"),
    ]
    [r] = _with_tables(spark, {"orders": _orders(spark, rows)}, "t_ks_two_sample")
    assert (r["n_hi"], r["n_lo"]) == (2, 2)
    assert r["ks_d"] == 1.0


def test_ks_interleaved_distributions(spark):
    # hi {1,3}, lo {2,4} → ECDF gaps 0.5, 0, 0.5, 0 → D = 0.5
    rows = [
        (1, 1, 1.0, "1-URGENT"),
        (2, 1, 3.0, "2-HIGH"),
        (3, 2, 2.0, "5-LOW"),
        (4, 2, 4.0, "3-MEDIUM"),
    ]
    [r] = _with_tables(spark, {"orders": _orders(spark, rows)}, "t_ks_two_sample")
    assert r["ks_d"] == 0.5


def test_gini_equal_and_concentrated(spark):
    # equal revenues → G = 0
    eq = [(i, i, 10.0, "5-LOW") for i in range(1, 5)]
    [r] = _with_tables(
        spark, {"orders": _orders(spark, eq)}, "a24_gini_concentration"
    )
    assert r["n_customers"] == 4 and r["gini"] == 0.0
    # revenues 1,1,1,97 → G = (2·39400 − 5·10000) / (4·10000) = 0.72
    conc = [
        (1, 1, 1.0, "5-LOW"),
        (2, 2, 1.0, "5-LOW"),
        (3, 3, 1.0, "5-LOW"),
        (4, 4, 97.0, "5-LOW"),
    ]
    [r] = _with_tables(
        spark, {"orders": _orders(spark, conc)}, "a24_gini_concentration"
    )
    assert r["total_cents"] == 10000
    assert r["gini"] == 0.72


def test_pair_lift_hand_case(spark):
    # orders: O1{p1,p2} O2{p1,p2} O3{p1,p3}; duplicate line for (O1,p1)
    # exercises the distinct. Only (p1,p2) reaches pair_cnt >= 2:
    # support = 2/3, lift = 2·3/(3·2) = 1.
    rows = [
        (1, 1),
        (1, 1),
        (1, 2),
        (2, 1),
        (2, 2),
        (3, 1),
        (3, 3),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = _with_tables(spark, {"lineitem": li}, "mb_pair_lift")
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["pair_cnt"]) == (1, 2, 2)
    assert r["support"] == 0.666667
    assert r["lift"] == 1.0


def test_retention_cohorts_hand_case(spark):
    # u1 active wk1+wk2, u2 wk1 only, u3 first seen wk2:
    # cohort wk1: size 2, offset1 active 1 (50%); cohort wk2: size 1
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-08 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        (3, "2024-01-09 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = _with_tables(spark, {"events": ev}, "t_retention_cohorts")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_pct"],
        )
        for r in out
    }
    assert got == {
        ("2024-01-01 00:00:00", 0): (2, 2, 100.0),
        ("2024-01-01 00:00:00", 1): (1, 2, 50.0),
        ("2024-01-08 00:00:00", 0): (1, 1, 100.0),
    }


def test_dist_window_battery_bounds(spark):
    rows = QUERIES["w11_dist_window_battery"](spark, SF_SMOKE).collect()
    by_nation: dict[int, list] = {}
    for r in rows:
        by_nation.setdefault(r["c_nationkey"], []).append(r)
    for _, grp in by_nation.items():
        prs = sorted(r["pct_rank"] for r in grp)
        cds = sorted(r["cume"] for r in grp)
        assert prs[0] == 0.0
        if len(grp) > 1:
            assert prs[-1] == 1.0
        assert cds[-1] == 1.0
        assert all(0.0 <= v <= 1.0 for v in prs + cds)


def test_weighted_median_hand_case(spark):
    # flag A: weight concentrated at qty 3 → median 3;
    # flag B: even split → lower weighted median 1
    rows = [
        ("A", 1.0, 1.00),
        ("A", 2.0, 1.00),
        ("A", 3.0, 10.00),
        ("B", 1.0, 5.00),
        ("B", 2.0, 5.00),
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    out = {
        r["l_returnflag"]: (r["weighted_median_qty"], r["total_weight_cents"])
        for r in _with_tables(spark, {"lineitem": li}, "a25_weighted_median")
    }
    assert out == {"A": (3.0, 1200), "B": (1.0, 1000)}


def test_pareto_share_hand_case(spark):
    # revenues 50, 30, 10, 10 → top-2 cover 80%, top decile (1 cust) 50%
    rows = [
        (1, 1, 50.0, "5-LOW"),
        (2, 2, 30.0, "5-LOW"),
        (3, 3, 10.0, "5-LOW"),
        (4, 4, 10.0, "5-LOW"),
    ]
    [r] = _with_tables(spark, {"orders": _orders(spark, rows)}, "a26_pareto_share")
    assert (r["n_customers"], r["n_top80"]) == (4, 2)
    assert r["top80_frac"] == 0.5
    assert r["top_decile_share"] == 0.5


def test_ab_ztest_degenerate_full_conversion(spark):
    # sf0.001: every user purchases → p = 1, se = 0 → z undefined (NULL)
    [r] = [
        row
        for row in QUERIES["ab_conversion_ztest"](spark, SF_SMOKE).collect()
    ]
    assert r["n_a"] + r["n_b"] == r["conv_a"] + r["conv_b"]
    assert r["cvr_a"] == 1.0 and r["cvr_b"] == 1.0
    assert r["z_score"] is None


def test_ab_ztest_sign_follows_conversion_gap(spark):
    # 4 users, purchases only for some; arm assignment is hash-driven,
    # so pin the invariant: z sign matches the cvr gap (or NULL when
    # an arm is empty / se = 0)
    rows = [
        (u, f"2024-01-0{u} 10:00:00", "purchase" if u % 2 else "view")
        for u in range(1, 9)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    [r] = _with_tables(spark, {"events": ev}, "ab_conversion_ztest")
    assert r["n_a"] + r["n_b"] == 8
    assert r["conv_a"] + r["conv_b"] == 4
    if r["z_score"] is not None:
        gap = r["cvr_a"] - r["cvr_b"]
        assert (r["z_score"] > 0) == (gap > 0) or gap == 0


def test_cdc_last_state_hand_case(spark):
    # u1: insert then update → survives as U; u2: insert then delete →
    # dropped; u3: delete then re-insert → survives as I; tie on ts for
    # u1 broken by event_id (higher wins)
    rows = [
        (1, 1, "2024-01-01 00:00:00", "signup", 1.0),
        (2, 1, "2024-01-02 00:00:00", "click", 2.0),
        (3, 1, "2024-01-02 00:00:00", "view", 3.0),
        (4, 2, "2024-01-01 00:00:00", "signup", 4.0),
        (5, 2, "2024-01-03 00:00:00", "error", 5.0),
        (6, 3, "2024-01-01 00:00:00", "error", 6.0),
        (7, 3, "2024-01-02 00:00:00", "signup", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["user_id"]: (r["last_op"], r["last_value"])
        for r in _with_tables(spark, {"events": ev}, "cdc_last_state")
    }
    assert out == {1: ("U", 3.0), 3: ("I", 7.0)}


def test_hopping_rollup_hand_case(spark):
    # one event at 10:05 lands in exactly the 4 hour-windows starting
    # 09:15, 09:30, 09:45, 10:00
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 7, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = _with_tables(spark, {"events": ev}, "events_hopping_rollup")
    starts = sorted(str(r["window_start"]) for r in out)
    assert starts == [
        "2024-01-01 09:15:00",
        "2024-01-01 09:30:00",
        "2024-01-01 09:45:00",
        "2024-01-01 10:00:00",
    ]
    assert all(r["event_cnt"] == 1 and r["unique_users"] == 1 for r in out)


def test_pair_lift_plan_has_no_join_on_fact(spark):
    from healthcare_research_data_pipeline_project_spark.plans import explain as X

    p = X.plan(QUERIES["mb_pair_lift"](spark, SF_SMOKE))
    # basket-array expansion: no sort-merge join anywhere; the only
    # joins are broadcasts of the part-frequency / total frames
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_ks_and_gini_plans_use_range_partitioning(spark):
    from healthcare_research_data_pipeline_project_spark.plans import explain as X

    for name in ("t_ks_two_sample", "a24_gini_concentration"):
        p = X.plan(QUERIES[name](spark, SF_SMOKE)).lower()
        assert "rangepartitioning" in p, name
