"""Relational query corpus (SURVEY.md §2.1-§2.8, §2.11).

Each query re-expresses a reference operator/semantic over the driver's
TPC-H-ish tables, as an idiomatic-Spark DataFrame plan plus a DuckDB
oracle string. Numeric discipline per `functions.helpers` (exact
decimal sums, round-then-cast-double) so value hashes match across
engines.

Reference semantics are cited per query (file:line under
/root/reference) — the reference ships these shapes as SQL text to an
RDBMS; here they are Catalyst logical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import (
    DEC,
    count_if,
    dec_avg,
    dec_sum,
    duck_dec_avg,
    duck_pct,
    duck_round_div,
    pct,
    rnd,
    round_div,
    sum_cents,
)
from ..operators import relational as R
from ..tables import load_tables
from . import register

# anchor for "relative to today" predicates (GETDATE()/datetime.now() in
# the reference, e.g. healthcare-data-pipeline-main.py:286) — pinned so
# results are reproducible against the oracle (SURVEY §7.8 parameterizes
# the reference's hardcoded year the same way).
ANCHOR = "2001-08-01"


# ---------------------------------------------------------------------------
# Flagship: executive summary (healthcare-data-pipeline-main.py:393-414)
# scan → relative-date filter → count-distinct, avg, conditional sum,
# rate arithmetic, round.
# ---------------------------------------------------------------------------
@register(
    "exec_summary",
    f"""
    SELECT
      CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)                AS total_orders,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT)                 AS unique_customers,
      {duck_dec_avg("o_totalprice")}                            AS avg_order_value,
      {duck_pct("SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)",
                "COUNT(*)")}                                    AS urgent_rate_pct,
      CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(o_totalprice AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS finished_revenue
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= CAST(DATE '{ANCHOR}' - INTERVAL 6 MONTH AS DATE)
    """,
)
def exec_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    recent = t.orders.filter(
        F.to_date("o_orderdate") >= F.add_months(F.lit(ANCHOR).cast("date"), -6)
    )
    return recent.agg(
        F.countDistinct("o_orderkey").alias("total_orders"),
        F.countDistinct("o_custkey").alias("unique_customers"),
        dec_avg("o_totalprice", "avg_order_value"),
        pct(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)),
            F.count(F.lit(1)),
            "urgent_rate_pct",
        ),
        rnd(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F", F.col("o_totalprice").cast(DEC)
                ).otherwise(F.lit(0).cast(DEC))
            ),
            "finished_revenue",
        ),
    )


# ---------------------------------------------------------------------------
# P2-P5, P11: equality / range / IN-list / between + deterministic limit
# (healthcare-api-main.py:246-268 patient search query builder)
# ---------------------------------------------------------------------------
@register(
    "p_filter_predicates",
    """
    SELECT c_custkey, c_name, CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS acctbal,
           c_nationkey
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
      AND c_acctbal BETWEEN 0 AND 5000
      AND c_nationkey IN (1, 2, 3, 13, 24)
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 100
    """,
)
def p_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .filter(F.col("c_acctbal").between(0, 5000))
        .filter(F.col("c_nationkey").isin(1, 2, 3, 13, 24))
        .select(
            "c_custkey",
            "c_name",
            rnd(F.col("c_acctbal"), "acctbal"),
            "c_nationkey",
        )
        .orderBy(F.desc("acctbal"), "c_custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# P6, P7: LIKE prefix / infix (ICD-10 prefixes, '%saline%' —
# healthcare-sql-analytics.sql:220,274-275)
# ---------------------------------------------------------------------------
@register(
    "p_like_predicates",
    f"""
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS part_cnt,
           {duck_dec_avg("p_retailprice")} AS avg_price
    FROM part
    WHERE p_type LIKE 'S%' AND p_name LIKE '%red%'
    GROUP BY p_type
    """,
)
def p_like_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.part.filter(F.col("p_type").like("S%"))
        .filter(F.col("p_name").contains("red"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            dec_avg("p_retailprice", "avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# J1: star join fact ⋈ 4 dims (healthcare-sql-analytics.sql:185-188).
# region/nation broadcast; customer/orders joins carried by AQE.
# ---------------------------------------------------------------------------
@register(
    "j1_star_join",
    """
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY r_name, n_name
    """,
)
def j1_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders_96 = t.orders.filter(
        F.to_date("o_orderdate").between("1996-01-01", "1996-12-31")
    )
    return (
        t.lineitem.join(orders_96, t.lineitem.l_orderkey == orders_96.o_orderkey)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            rnd(
                # exact decimal arithmetic (no double product): 2-dp
                # price × 2-dp discount is exact at scale 4 in both
                # engines, so the sum hash-matches
                F.sum(
                    F.col("l_extendedprice").cast(DEC)
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                "revenue",
            ),
        )
    )


# ---------------------------------------------------------------------------
# J2: banded self-join — 30-day readmission pairing
# (healthcare-data-pipeline-main.py:279-282; sql:164-171)
# ---------------------------------------------------------------------------
@register(
    "j2_band_self_join",
    """
    SELECT o1.o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS reorder_pairs_30d,
           CAST(MIN(DATEDIFF('day', CAST(o1.o_orderdate AS DATE),
                             CAST(o2.o_orderdate AS DATE))) AS INT) AS min_gap_days
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND CAST(o2.o_orderdate AS DATE) >  CAST(o1.o_orderdate AS DATE)
     AND CAST(o2.o_orderdate AS DATE) <= CAST(o1.o_orderdate AS DATE) + 30
    GROUP BY o1.o_custkey
    """,
)
def j2_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pairs = R.band_self_join(
        t.orders.select("o_custkey", "o_orderdate"), "o_custkey", "o_orderdate",
        min_days=1, max_days=30,
    )
    return pairs.groupBy(F.col("a.o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("reorder_pairs_30d"),
        F.min(
            F.datediff(F.to_date("b.o_orderdate"), F.to_date("a.o_orderdate"))
        ).cast("int").alias("min_gap_days"),
    )


# ---------------------------------------------------------------------------
# J3: left join with join-side predicate
# (healthcare-data-pipeline-main.py:283-285 — abnormal-lab left join)
# ---------------------------------------------------------------------------
@register(
    "j3_left_join_pred",
    """
    SELECT o_orderkey,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS returned_items,
           CAST(ROUND(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))),
                               CAST(0 AS DECIMAL(18,2))), 2) AS DOUBLE) AS returned_value
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_returnflag = 'R'
    GROUP BY o_orderkey
    """,
)
def j3_left_join_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    returned = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        t.orders.alias("o")
        .join(returned.alias("l"), F.col("o.o_orderkey") == F.col("l.l_orderkey"), "left")
        .groupBy("o.o_orderkey")
        .agg(
            F.count("l.l_orderkey").alias("returned_items"),
            rnd(
                F.coalesce(
                    F.sum(F.col("l.l_extendedprice").cast(DEC)), F.lit(0).cast(DEC)
                ),
                "returned_value",
            ),
        )
    )


# ---------------------------------------------------------------------------
# J4: EXISTS as filter (semi join) — diabetic-cohort idiom
# (healthcare-sql-analytics.sql:606-616)
# ---------------------------------------------------------------------------
@register(
    "j4_semi_exists",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def j4_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return R.semi_join(
        t.customer, urgent, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_name", "c_nationkey")


# ---------------------------------------------------------------------------
# J4b: EXISTS as SELECT column (SURVEY §7.1 hard part — readmitted_30day
# flag, healthcare-sql-analytics.sql:164-171)
# ---------------------------------------------------------------------------
@register(
    "j4b_exists_flag",
    """
    SELECT c_custkey,
           CAST(EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT') AS INT) AS has_urgent
    FROM customer c
    """,
)
def j4b_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return R.exists_flag(
        t.customer.select("c_custkey"), urgent, "c_custkey", "has_urgent"
    )


# ---------------------------------------------------------------------------
# J5: NOT EXISTS (anti join) — "No Relationship" audit idiom
# (healthcare-sql-analytics.sql:749-754)
# ---------------------------------------------------------------------------
@register(
    "j5_anti_not_exists",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return R.anti_join(
        t.customer, t.orders, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# J6: IN (subquery) semi join (antibiotic med-ids,
# healthcare-sql-analytics.sql:250-255)
# ---------------------------------------------------------------------------
@register(
    "j6_in_subquery",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
)
def j6_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big_parts = t.part.filter(F.col("p_size") > 40)
    return R.semi_join(
        t.lineitem, big_parts, F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        F.count(F.lit(1)).alias("line_cnt"),
        dec_sum("l_quantity", "total_qty"),
    )


# ---------------------------------------------------------------------------
# J7: role-playing dimension joined twice (dim_time t_arr/t_dep,
# healthcare-sql-analytics.sql:692-693) — nation as customer- and
# supplier-nation.
# ---------------------------------------------------------------------------
@register(
    "j7_role_playing_dim",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_0', 'NATION_5', 'NATION_10', 'NATION_15')
    GROUP BY n1.n_name, n2.n_name
    """,
)
def j7_role_playing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_0", "NATION_5", "NATION_10", "NATION_15"))
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    # dimension-first join order (written explicitly — Spark has no
    # CBO reordering by default, so the as-written order IS the plan):
    # the selective n1 broadcast prunes customer to 4/25 nations
    # BEFORE any fact-sized join, which shrinks the orders join input
    # and with it every downstream shuffle; the r8 form joined
    # lineitem⋈orders⋈customer⋈supplier in full and only then dropped
    # 84% of the rows at the nation filters (measured 7.9 s → see
    # SCALE_PROBE at sf1 for the reordered plan).
    cust = t.customer.join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key")
    ).select("c_custkey", "cust_nation")
    ords = t.orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    supp = t.supplier.join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")
    ).select("s_suppkey", "supp_nation")
    return (
        t.lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            rnd(
                F.sum(
                    F.col("l_extendedprice").cast(DEC)
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                "revenue",
            ),
        )
    )


# ---------------------------------------------------------------------------
# J9 + CTEs: derived-frame ⋈ derived-frame benchmark comparison
# (ProviderMetrics ⋈ SpecialtyBenchmarks, healthcare-sql-analytics.sql:306-364)
# ---------------------------------------------------------------------------
@register(
    "j9_cte_join",
    f"""
    WITH nation_metrics AS (
      SELECT n_nationkey, n_name, n_regionkey,
             COUNT(*) AS cust_cnt,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS bal_cents
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_nationkey, n_name, n_regionkey
    ),
    region_bench AS (
      SELECT n_regionkey,
             COUNT(*) AS r_cnt,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS r_cents
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_regionkey
    )
    SELECT nm.n_name,
           CAST(nm.cust_cnt AS BIGINT) AS cust_cnt,
           {duck_round_div("nm.bal_cents", "nm.cust_cnt * 100")} AS nation_avg_bal,
           {duck_round_div("rb.r_cents", "rb.r_cnt * 100")} AS region_avg_bal,
           CAST(ROUND({duck_round_div("nm.bal_cents", "nm.cust_cnt * 100")}
                      - {duck_round_div("rb.r_cents", "rb.r_cnt * 100")}, 2)
                + 0.0 AS DOUBLE) AS vs_benchmark
    FROM nation_metrics nm
    JOIN region_bench rb ON nm.n_regionkey = rb.n_regionkey
    WHERE nm.cust_cnt >= 10
    """,
)
def j9_cte_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust_nation = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    nation_metrics = cust_nation.groupBy("n_nationkey", "n_name", "n_regionkey").agg(
        F.count(F.lit(1)).alias("cust_cnt"),
        sum_cents("c_acctbal").alias("bal_cents"),
    )
    region_bench = cust_nation.groupBy(
        F.col("n_regionkey").alias("rb_regionkey")
    ).agg(
        F.count(F.lit(1)).alias("r_cnt"),
        sum_cents("c_acctbal").alias("r_cents"),
    )
    nation_avg = round_div(
        F.col("bal_cents"), F.col("cust_cnt") * 100, "nation_avg_bal"
    )
    region_avg = round_div(F.col("r_cents"), F.col("r_cnt") * 100, "region_avg_bal")
    return (
        nation_metrics.filter(F.col("cust_cnt") >= 10)
        .join(
            F.broadcast(region_bench),
            F.col("n_regionkey") == F.col("rb_regionkey"),
        )
        .select(
            "n_name",
            F.col("cust_cnt").cast("long").alias("cust_cnt"),
            nation_avg,
            region_avg,
            (F.round(nation_avg - region_avg, 2) + F.lit(0.0)).cast("double").alias("vs_benchmark"),
        )
    )


# ---------------------------------------------------------------------------
# A1-A7: full aggregate battery with HAVING (pricing-summary shape;
# conditional agg per healthcare-sql-analytics.sql:197-204, HAVING :207)
# ---------------------------------------------------------------------------
@register(
    "a1_agg_battery",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS order_cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           {duck_dec_avg("l_extendedprice")} AS avg_price,
           CAST(ROUND(MIN(l_extendedprice), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(l_extendedprice), 2) AS DOUBLE) AS max_price,
           CAST(ROUND(STDDEV(l_extendedprice), 4) AS DOUBLE) AS std_price,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS high_discount_cnt
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) >= 10
    """,
)
def a1_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    flt = t.lineitem.filter(
        F.to_date("l_shipdate") <= F.lit("2000-09-01").cast("date")
    )
    # COUNT(DISTINCT) runs as its OWN narrow pass (the a2b doctrine,
    # r9): sharing one Aggregate would drag every plain metric through
    # a fact-grain (flag, status, orderkey) shuffle carrying all the
    # decimal agg buffers; split, the plain battery collapses map-side
    # to ~6 groups and the distinct pass shuffles only the 3-column
    # key — measured 7.7 s → 6.8 s warm (12.5 → 8.9 cold) at sf1, and
    # the gap widens with buffer width at scale.
    plain = flt.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("line_cnt"),
        dec_sum("l_quantity", "sum_qty"),
        dec_avg("l_extendedprice", "avg_price"),
        rnd(F.min("l_extendedprice"), "min_price"),
        rnd(F.max("l_extendedprice"), "max_price"),
        rnd(F.stddev("l_extendedprice"), "std_price", 4),
        count_if(F.col("l_discount") > 0.05, "high_discount_cnt"),
    )
    dis = (
        flt.select("l_returnflag", "l_linestatus", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    return (
        plain.join(F.broadcast(dis), ["l_returnflag", "l_linestatus"])
        .filter(F.col("line_cnt") >= 10)
        .select(
            "l_returnflag",
            "l_linestatus",
            "line_cnt",
            "order_cnt",
            "sum_qty",
            "avg_price",
            "min_price",
            "max_price",
            "std_price",
            "high_discount_cnt",
        )
    )


# ---------------------------------------------------------------------------
# A8: exact percentiles (PERCENTILE_CONT 0.5/0.9 WITHIN GROUP,
# healthcare-sql-analytics.sql:702-703)
# ---------------------------------------------------------------------------
@register(
    "a8_percentiles",
    """
    SELECT l_returnflag,
           CAST(ROUND(CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity)
                           AS DOUBLE), 4) AS DOUBLE) AS median_qty,
           CAST(ROUND(CAST(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity)
                           AS DOUBLE), 4) AS DOUBLE) AS p90_qty,
           CAST(ROUND(CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                           AS DOUBLE), 4) AS DOUBLE) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a8_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT Spark's exact percentile() aggregate: that merges each
    # group's full value->count map into one reducer buffer (5.5x
    # superlinear on the 10x probe; an OOM for near-unique doubles at
    # warehouse scale). exact_percentiles_multi is sketch-bracketed
    # exact refinement — a mergeable GK approx_percentile pass
    # brackets each target rank with a hard error bound, then one
    # more scan exactly resolves inside the ~0.08%-of-rows window —
    # with bit-identical PERCENTILE_CONT interpolation. 10x probe
    # ratio 5.47 -> 1.7; the ~2x absolute cost at sf0.1 (two passes
    # vs one) is the accepted price of the bounded-memory shape
    # (annotated in tools/bench_annotations.json).
    from ..operators.scale import exact_percentiles_multi

    t = load_tables(spark, sf_dir)
    # accuracy=2000: sketch upkeep is the pass-1 CPU term (GK insert
    # cost grows with summary size — measured 1.63s@10000 vs
    # 1.17s@2000 best-of-2 at sf0.1) while the pass-2 window stays a
    # constant 8/accuracy = 0.4% of rows at ANY corpus size
    return exact_percentiles_multi(
        t.lineitem,
        ["l_returnflag"],
        {
            "median_qty": ("l_quantity", 0.5),
            "p90_qty": ("l_quantity", 0.9),
            "median_price": ("l_extendedprice", 0.5),
        },
        accuracy=2000,
    ).select(
        "l_returnflag",
        rnd(F.col("median_qty"), "median_qty", 4),
        rnd(F.col("p90_qty"), "p90_qty", 4),
        rnd(F.col("median_price"), "median_price", 4),
    )


# ---------------------------------------------------------------------------
# A9: IQR validity bounds (healthcare-data-pipeline-main.py:246-250)
# ---------------------------------------------------------------------------
_A9_VALID = (
    "SUM(CASE WHEN o_totalprice >= q1 - 1.5 * (q3 - q1) "
    "AND o_totalprice <= q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)"
)


@register(
    "a9_iqr_outliers",
    f"""
    WITH b AS (
      SELECT CAST(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS q1,
             CAST(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS q3
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                           OR o_totalprice > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS outlier_cnt,
           CAST(COUNT(*) AS BIGINT) AS total_cnt,
           {duck_pct(_A9_VALID, "COUNT(*)")} AS validity_pct
    FROM orders, b
    """,
)
def a9_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bounds = R.iqr_bounds(t.orders, "o_totalprice", 1.5).select("lo", "hi")
    p = F.col("o_totalprice")
    return (
        t.orders.crossJoin(F.broadcast(bounds))
        .agg(
            count_if((p < F.col("lo")) | (p > F.col("hi")), "outlier_cnt"),
            F.count(F.lit(1)).alias("total_cnt"),
            pct(
                F.sum(
                    F.when((p >= F.col("lo")) & (p <= F.col("hi")), 1).otherwise(0)
                ),
                F.count(F.lit(1)),
                "validity_pct",
            ),
        )
    )


# ---------------------------------------------------------------------------
# A10: z-score anomaly detection (healthcare-data-pipeline-main.py:319-338)
# ---------------------------------------------------------------------------
@register(
    "a10_zscore_outliers",
    """
    WITH s AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS mu,
             STDDEV(value) AS sigma
      FROM events
    )
    SELECT event_id, event_type, CAST(ROUND(value, 2) AS DOUBLE) AS value
    FROM events, s
    WHERE ABS(value - mu) > 2.5 * sigma
    """,
)
def a10_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = R.zscore_outliers(
        t.events, "value", sigma=2.5, keep_cols=["event_id", "event_type", "value"]
    )
    return out.select("event_id", "event_type", rnd(F.col("value"), "value"))


# ---------------------------------------------------------------------------
# A11: correlation matrix pairs (healthcare-data-pipeline-main.py:350-362)
# ---------------------------------------------------------------------------
@register(
    "a11_correlation",
    """
    SELECT CAST(ROUND(CORR(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
           CAST(ROUND(CORR(l_discount, l_extendedprice), 4) AS DOUBLE) AS corr_disc_price,
           CAST(ROUND(CORR(l_quantity, l_discount), 4) AS DOUBLE) AS corr_qty_disc
    FROM lineitem
    """,
)
def a11_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.agg(
        rnd(F.corr("l_quantity", "l_extendedprice"), "corr_qty_price", 4),
        rnd(F.corr("l_discount", "l_extendedprice"), "corr_disc_price", 4),
        rnd(F.corr("l_quantity", "l_discount"), "corr_qty_disc", 4),
    )


# ---------------------------------------------------------------------------
# A12: distribution-as-percentage (healthcare-api-main.py:527-542)
# ---------------------------------------------------------------------------
@register(
    "a12_distribution_pct",
    f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {duck_pct("COUNT(*)", "SUM(COUNT(*)) OVER ()")} AS pct
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a12_distribution_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return R.distribution_pct(t.customer, "c_mktsegment").select(
        "c_mktsegment", F.col("cnt").cast("long").alias("cnt"), "pct"
    )


# ---------------------------------------------------------------------------
# A13: histogram bucketing → distribution (healthcare-api-main.py:544-576)
# ---------------------------------------------------------------------------
@register(
    "a13_histogram",
    f"""
    WITH b AS (
      SELECT CASE WHEN o_totalprice < 50000  THEN '<50k'
                  WHEN o_totalprice < 100000 THEN '50-100k'
                  WHEN o_totalprice < 200000 THEN '100-200k'
                  WHEN o_totalprice < 300000 THEN '200-300k'
                  ELSE '300k+' END AS price_bucket
      FROM orders
    )
    SELECT price_bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {duck_pct("COUNT(*)", "SUM(COUNT(*)) OVER ()")} AS pct
    FROM b
    GROUP BY price_bucket
    """,
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bucketed = t.orders.select(
        R.bucketize(
            F.col("o_totalprice"),
            [50000, 100000, 200000, 300000],
            ["<50k", "50-100k", "100-200k", "200-300k", "300k+"],
        ).alias("price_bucket")
    )
    return R.distribution_pct(bucketed, "price_bucket").select(
        "price_bucket", F.col("cnt").cast("long").alias("cnt"), "pct"
    )


# ---------------------------------------------------------------------------
# A14/A15 + U1: one-pass data-quality scan, unioned per-table summaries
# (healthcare-data-pipeline-main.py:233-258,436-450; sql:759-779)
# ---------------------------------------------------------------------------
_QUALITY_COLS = {
    "orders": ["o_custkey", "o_totalprice", "o_orderdate"],
    "lineitem": ["l_quantity", "l_shipdate"],
    "events": ["value", "props"],
}


def _quality_oracle() -> str:
    ctes, selects = [], []
    for tbl, cols in _QUALITY_COLS.items():
        nulls = ", ".join(
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_{c}" for c in cols
        )
        ctes.append(f"{tbl}_q AS (SELECT COUNT(*) AS t, {nulls} FROM {tbl})")
        for c in cols:
            selects.append(
                f"SELECT '{tbl}' AS table_name, '{c}' AS column_name, "
                f"CAST(t AS BIGINT) AS total_rows, CAST(n_{c} AS BIGINT) AS null_count, "
                f"{duck_pct(f'(t - n_{c})', 't')} AS completeness_pct "
                f"FROM {tbl}_q"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@register("a14_quality_metrics", _quality_oracle())
def a14_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    frames = [
        R.column_quality(getattr(t, tbl), tbl, cols)
        for tbl, cols in _QUALITY_COLS.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# W1/W2: per-category expected value + 2σ outlier flag (DRG outlier
# query, healthcare-sql-analytics.sql:521-580). Implemented as
# groupBy-stats + broadcast join-back rather than a whole-partition
# window — same semantics, no full sort, scales to any partition size.
# ---------------------------------------------------------------------------
@register(
    "w1_w2_group_outliers",
    f"""
    WITH s AS (
      SELECT o_orderpriority,
             COUNT(*) AS grp_cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS grp_cents,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS mu,
             STDDEV(o_totalprice) AS sd
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderkey,
           o.o_orderpriority AS priority,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS totalprice,
           {duck_round_div("grp_cents", "grp_cnt * 100")} AS expected_price,
           CASE WHEN o_totalprice > mu + 1.5 * sd THEN 'High Outlier'
                ELSE 'Low Outlier' END AS outlier_status
    FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
    WHERE ABS(o_totalprice - mu) > 1.5 * sd
    """,
)
def w1_w2_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    stats = t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("grp_cnt"),
        sum_cents("o_totalprice").alias("grp_cents"),
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("mu"),
        F.stddev("o_totalprice").alias("sd"),
    )
    p = F.col("o_totalprice")
    return (
        t.orders.join(
            F.broadcast(stats), F.col("o_orderpriority") == F.col("priority")
        )
        .filter(F.abs(p - F.col("mu")) > 1.5 * F.col("sd"))
        .select(
            "o_orderkey",
            "priority",
            rnd(p, "totalprice"),
            round_div(F.col("grp_cents"), F.col("grp_cnt") * 100, "expected_price"),
            F.when(p > F.col("mu") + 1.5 * F.col("sd"), "High Outlier")
            .otherwise("Low Outlier")
            .alias("outlier_status"),
        )
    )


# ---------------------------------------------------------------------------
# W3: top-N per group (nlargest, healthcare-data-pipeline-main.py:345)
# ---------------------------------------------------------------------------
@register(
    "w3_topn_per_group",
    """
    SELECT c_nationkey, c_custkey,
           CAST(ROUND(c_acctbal, 2) AS DOUBLE) AS acctbal,
           CAST(rn AS INT) AS rank_in_nation
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 5
    """,
)
def w3_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t.customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "c_nationkey",
            "c_custkey",
            rnd(F.col("c_acctbal"), "acctbal"),
            F.col("rn").cast("int").alias("rank_in_nation"),
        )
    )


# ---------------------------------------------------------------------------
# W4: latest-per-entity (latest A1C, healthcare-sql-analytics.sql:592-598)
# ---------------------------------------------------------------------------
@register(
    "w4_latest_per_entity",
    """
    SELECT o_custkey AS custkey,
           o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS latest_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    WHERE rn = 1
    """,
)
def w4_latest_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    latest = R.latest_per_key(
        t.orders, "o_custkey", [F.desc("o_orderdate"), F.desc("o_orderkey")]
    )
    # note: emitted as TIMESTAMP, not DATE — pandas/Arrow render Spark
    # DATE and DuckDB DATE differently, which would break value hashing
    return latest.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
        rnd(F.col("o_totalprice"), "latest_totalprice"),
    )


# ---------------------------------------------------------------------------
# F2-F8: date-function battery (DATEADD/DATEDIFF/date_trunc/DATE_FORMAT,
# SURVEY §2.8) — monthly order/ship-lag rollup.
# ---------------------------------------------------------------------------
@register(
    "f_date_functions",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           {duck_round_div('''SUM(DATEDIFF('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)))''', "COUNT(*)")}
             AS avg_ship_lag_days,
           CAST(MIN(DATE_TRUNC('month', o_orderdate)) AS TIMESTAMP) AS month_start
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(o_orderdate AS DATE) >= CAST(DATE '{ANCHOR}' - INTERVAL 1 YEAR AS DATE)
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    recent = t.orders.filter(
        F.to_date("o_orderdate") >= F.add_months(F.lit(ANCHOR).cast("date"), -12)
    )
    return (
        recent.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            round_div(
                F.sum(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))),
                F.count(F.lit(1)),
                "avg_ship_lag_days",
            ),
            F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        )
    )


# ---------------------------------------------------------------------------
# F1/F14/F17 + P10: CASE bucketing, dict recode with default, PII mask,
# SHA-256 (healthcare-data-pipeline-main.py:182-197,221-223; sql:151-155)
# ---------------------------------------------------------------------------
@register(
    "f_case_mask_hash",
    """
    SELECT c_custkey,
           sha256(c_name) AS name_hash,
           '***MASKED***' AS masked_name,
           CASE WHEN c_acctbal < 0    THEN 'Delinquent'
                WHEN c_acctbal < 5000 THEN 'Standard'
                ELSE 'Premium' END AS balance_tier,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'Consumer'
                             WHEN 'HOUSEHOLD'  THEN 'Consumer'
                             ELSE 'Business' END AS segment_group
    FROM customer
    """,
)
def f_case_mask_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    recode = F.create_map(
        F.lit("AUTOMOBILE"), F.lit("Consumer"), F.lit("HOUSEHOLD"), F.lit("Consumer")
    )
    return t.customer.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_hash"),
        F.lit("***MASKED***").alias("masked_name"),
        F.when(F.col("c_acctbal") < 0, "Delinquent")
        .when(F.col("c_acctbal") < 5000, "Standard")
        .otherwise("Premium")
        .alias("balance_tier"),
        F.coalesce(recode[F.col("c_mktsegment")], F.lit("Business")).alias(
            "segment_group"
        ),
    )


# ---------------------------------------------------------------------------
# Streaming-shape batch twin: tumbling-window event rollup
# (surveillance batch snapshot, healthcare-sql-analytics.sql:442-518;
# streaming variant in streaming/surveillance.py)
# ---------------------------------------------------------------------------
@register(
    "events_hourly_rollup",
    """
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.countDistinct("user_id").alias("unique_users"),
            dec_sum("value", "total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization: lag + cumulative-sum session ids (idiomatic-Spark
# upgrade of the readmission pairing, SURVEY §2.5 note)
# ---------------------------------------------------------------------------
@register(
    "events_sessionize",
    """
    WITH x AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM y
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = t.events.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sessions = lagged.withColumn("session_id", F.sum("is_new").over(wsum))
    return sessions.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# U2: set operations (SURVEY §2.7). The reference only uses UNION ALL
# (healthcare-data-pipeline-main.py:436-450, mirrored by hc_q10), but
# INTERSECT / EXCEPT / UNION DISTINCT are part of the engine surface:
# each branch is a DataFrame set operator, tagged and unioned into one
# comparable result. All three are hash-partition joins/aggregates on
# the key — no driver involvement.
# ---------------------------------------------------------------------------
@register(
    "u2_set_ops",
    """
    WITH a AS (SELECT c_custkey AS k FROM customer
               WHERE c_mktsegment = 'BUILDING'),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders
          WHERE o_totalprice > 250000)
    SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    UNION ALL
    SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
    """,
)
def u2_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = (
        t.orders.filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "k")  # noqa: E731
    return (
        tag(a.intersect(b), "intersect")
        .unionByName(tag(a.exceptAll(b.distinct()).distinct(), "except"))
        .unionByName(tag(a.union(b).distinct(), "union"))
    )


# ---------------------------------------------------------------------------
# A28: winsorized statistics — percentile clipping, the standard
# robust-feature treatment before model training (cap extreme values
# at p05/p95 instead of dropping rows like the IQR filter does).
# Consumes the r11 sketch-bracketed exact-percentile operator per
# group; the clip itself is a broadcast map-side LEAST/GREATEST.
# Boundary values are PERCENTILE_CONT-interpolated identically in
# both engines (see exact_percentiles_multi), so the clipped sums
# agree to the 4-dp rounding.
# ---------------------------------------------------------------------------
@register(
    "a28_winsorize",
    """
    WITH b AS (
      SELECT l_returnflag,
             CAST(PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY l_extendedprice)
                  AS DOUBLE) AS lo,
             CAST(PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY l_extendedprice)
                  AS DOUBLE) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           CAST(ROUND(AVG(LEAST(GREATEST(l_extendedprice, lo), hi)), 4)
                AS DOUBLE) AS winsorized_mean,
           CAST(ROUND(AVG(l_extendedprice), 4) AS DOUBLE) AS raw_mean
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def a28_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import exact_percentiles_multi

    t = load_tables(spark, sf_dir)
    b = exact_percentiles_multi(
        t.lineitem,
        ["l_returnflag"],
        {"lo": ("l_extendedprice", 0.05), "hi": ("l_extendedprice", 0.95)},
        # accuracy=2000: the measured balance point (see a8) — the
        # pass-2 window stays a bounded 0.4% of rows at any corpus
        # size while GK upkeep stays off the critical path
        accuracy=2000,
    )
    p = F.col("l_extendedprice")
    clipped = F.least(F.greatest(p, F.col("lo")), F.col("hi"))
    return (
        t.lineitem.join(F.broadcast(b), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((p < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((p > F.col("hi")).cast("long")).alias("n_clipped_high"),
            rnd(F.avg(clipped), "winsorized_mean", 4),
            rnd(F.avg(p), "raw_mean", 4),
        )
        .orderBy("l_returnflag")
    )
