"""Extended operator corpus: temporal joins, multidimensional
aggregation, pivot, nested arrays, and JSON extraction.

None of these exist in the reference (SURVEY notes their absence:
as-of joins §2.3, grouping sets/cube/rollup §2.4, lag/lead §2.5,
array/JSON scalar functions §2.8) — they round out the engine surface
a user would expect, each expressed as the Spark plan we'd want at
100 TB and pinned to a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.helpers import (
    DEC,
    duck_pct,
    duck_round_div,
    lng,
    pct,
    rnd,
    round_div,
)
from ..functions.text import DUCK_TOKENS, tokens
from ..operators.interval import interval_join
from ..operators.temporal import asof_join
from ..tables import load_tables
from . import register


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's latest click at or
# before it. One shuffle on user_id (union + running last), never a
# banded pair explosion — see operators/temporal.py.
# ---------------------------------------------------------------------------
@register(
    "t_asof_join",
    """
    WITH l AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    m AS (
      SELECT l.user_id, l.ts, r.ts AS rts, r.click_id
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS purchase_cnt,
           CAST(COUNT(click_id) AS BIGINT) AS matched_cnt,
           CAST(COALESCE(SUM(epoch_us(ts) - epoch_us(rts)), 0) AS BIGINT)
             AS gap_us_total
    FROM m GROUP BY user_id
    """,
)
def t_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    # dedup right per (key, ts) — determinism contract of asof_join
    clicks = (
        t.events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    m = asof_join(
        purchases, clicks, "user_id", "ts", "ts", payload=["click_id"]
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("purchase_cnt"),
        F.count("click_id").alias("matched_cnt"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_total"),
    )


# ---------------------------------------------------------------------------
# W5: lag/lead successor pairing — the idiomatic-Spark twin of the
# banded readmission self-join (SURVEY §2.5 note). One window shuffle
# instead of a self-join; same 30-day-gap semantics.
# ---------------------------------------------------------------------------
@register(
    "w5_lead_reorder",
    f"""
    WITH x AS (
      SELECT o_orderpriority, o_orderdate,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS next_dt
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS ord_cnt,
           CAST(COUNT(next_dt) AS BIGINT) AS with_successor,
           CAST(COUNT(CASE WHEN date_diff('day', o_orderdate, next_dt) <= 30
                           THEN 1 END) AS BIGINT) AS reorder_30d,
           {duck_pct(
               "COUNT(CASE WHEN date_diff('day', o_orderdate, next_dt) <= 30"
               " THEN 1 END)",
               "COUNT(*)",
           )} AS reorder_pct
    FROM x GROUP BY o_orderpriority
    """,
)
def w5_lead_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    x = t.orders.withColumn("next_dt", F.lead("o_orderdate").over(w))
    gap_days = F.datediff(F.col("next_dt"), F.col("o_orderdate"))
    reorder = F.sum(F.when(gap_days <= 30, 1).otherwise(0)).cast("long")
    return x.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("ord_cnt"),
        F.count("next_dt").alias("with_successor"),
        reorder.alias("reorder_30d"),
        pct(reorder, F.count(F.lit(1)), "reorder_pct"),
    )


# ---------------------------------------------------------------------------
# A16: ROLLUP with grouping_id — subtotals and grand total in one pass
# (partial aggregation handles all levels map-side; no extra shuffles
# vs a plain groupBy).
# ---------------------------------------------------------------------------
@register(
    "a16_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.rollup("l_returnflag", "l_linestatus").agg(
        lng(F.grouping_id(), "gid"),
        F.count(F.lit(1)).alias("line_cnt"),
        rnd(F.sum(F.col("l_quantity").cast(DEC)), "sum_qty"),
    )


# ---------------------------------------------------------------------------
# F20: string-function battery — case, trim, substring (1-based),
# concat_ws, global regexp replace, split-derived token count. All
# JVM-side codegen expressions; DuckDB twins are name-for-name except
# regexp_replace, which needs the 'g' flag to match Spark's
# replace-all semantics.
# ---------------------------------------------------------------------------
@register(
    "f_string_battery",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           TRIM(p_type) AS type_trim,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           CONCAT_WS('|', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS name_tokens
    FROM part
    """,
)
def f_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.size(F.split("p_name", " ")).cast("long").alias("name_tokens"),
    )


# ---------------------------------------------------------------------------
# A18: CUBE — all 2^k grouping-set combinations in one pass (Spark
# expands the sets map-side; one shuffle, same as a plain groupBy).
# grouping_id disambiguates real NULL keys from subtotal rows.
# ---------------------------------------------------------------------------
@register(
    "a18_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS price_cents
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def a18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        lng(F.grouping_id(), "gid"),
        F.count(F.lit(1)).alias("line_cnt"),
        (F.sum(F.col("l_extendedprice").cast(DEC)) * 100)
        .cast("long")
        .alias("price_cents"),
    )


# ---------------------------------------------------------------------------
# W7: ranking-function battery — rank/dense_rank keyed on a non-unique
# date (tie groups share a rank, so values are deterministic); ntile &
# lag/lead keyed on the unique orderkey (total order, so bucket
# boundaries and neighbors are deterministic). One window partition
# spec each → two sorts, no extra shuffle beyond the partition key.
# ---------------------------------------------------------------------------
@register(
    "w7_rank_battery",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY CAST(o_orderdate AS DATE)) AS BIGINT)
             AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                   ORDER BY CAST(o_orderdate AS DATE)) AS BIGINT)
             AS drnk,
           CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_orderkey) AS BIGINT) AS quartile,
           CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)
                AS BIGINT) AS prev_cents,
           CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)
                AS BIGINT) AS next_cents
    FROM orders
    """,
)
def w7_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    by_date = Window.partitionBy("o_orderpriority").orderBy(
        F.to_date("o_orderdate")
    )
    by_key = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    cents = F.col("o_totalprice").cast(DEC) * 100
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        lng(F.rank().over(by_date), "rnk"),
        lng(F.dense_rank().over(by_date), "drnk"),
        lng(F.ntile(4).over(by_key), "quartile"),
        F.lag(cents).over(by_key).cast("long").alias("prev_cents"),
        F.lead(cents).over(by_key).cast("long").alias("next_cents"),
    )


# ---------------------------------------------------------------------------
# A17: pivot with explicit value list (scale rule: always pass the
# pivot values — omitting them costs an extra distinct scan of the
# fact and risks a column-count explosion).
# ---------------------------------------------------------------------------
@register(
    "a17_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT)
             AS f_qty_cents,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) * 100 AS BIGINT)
             AS o_qty_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DEC) * 100).cast("long"))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("f_qty_cents"),
        F.col("O").alias("o_qty_cents"),
    )


# ---------------------------------------------------------------------------
# Array explode: per-(label, dimension) stats over the embedding
# vectors via posexplode. min/max are exact (float→double widening is
# exact in both engines). The average is computed over values
# quantized to exact integer micro-units (floor(v·1e6) — double
# multiply and floor are bit-identical across engines) and rounded in
# integer arithmetic: summing raw doubles is NOT portable when the
# mean sits near a rounding tie, because Spark's and DuckDB's
# summation orders differ (helpers module doctrine).
# ---------------------------------------------------------------------------
@register(
    "arr_dim_stats",
    f"""
    WITH x AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS min_v, MAX(v) AS max_v,
           {duck_round_div(
               "SUM(CAST(FLOOR((v + 16) * 1000000) AS BIGINT))",
               "COUNT(*) * 1000000",
               4,
           )} - 16 AS avg_v
    FROM x WHERE dim <= 4 GROUP BY label, dim
    """,
)
def arr_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    x = t.embeddings.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),  # 1-based like SQL
        F.col("v").cast("double").alias("v"),
    )
    # +16 offset keeps the quantized units non-negative (round_div's
    # integer-division trick and DuckDB's `//` disagree on negatives)
    micro = F.floor((F.col("v") + 16) * 1_000_000).cast("long")
    return (
        x.filter(F.col("dim") <= 4)
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            (
                round_div(
                    F.sum(micro), F.count(F.lit(1)) * 1_000_000, "x", 4
                )
                - 16
            ).alias("avg_v"),
        )
    )


# ---------------------------------------------------------------------------
# Keyless interval join: purchases within 10 minutes after each error
# event — bucketized equi-join (operators/interval.py), never a
# nested-loop. Oracle is DuckDB's native range join (IEJoin).
# ---------------------------------------------------------------------------
@register(
    "t_interval_join",
    """
    WITH e AS (
      SELECT event_id AS error_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'error'
    ),
    p AS (SELECT ts FROM events WHERE event_type = 'purchase')
    SELECT e.error_id, CAST(COUNT(*) AS BIGINT) AS purchase_cnt
    FROM p JOIN e ON p.ts BETWEEN e.w_start AND e.w_end
    GROUP BY e.error_id
    """,
)
def t_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    errors = t.events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts")
    )
    joined = interval_join(
        purchases, errors, "p_ts", "w_start", "w_end",
        bucket_width_seconds=600,
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("purchase_cnt")
    )


# ---------------------------------------------------------------------------
# Approximate tier: HLL distinct + quantile-sketch percentiles. At
# 100 TB these replace their exact twins (COUNT(DISTINCT) is a full
# shuffle of every key; approx_* is a fixed-size sketch merged
# map-side). Sketch estimates themselves are engine-specific, so the
# oracle pins what IS portable: the exact values (custs, and the
# interpolated median carried as the integer a+b cent sum — never a
# rounded float) plus tolerance VERDICT columns — Spark computes
# |estimate − exact| against the sketch's published error bound and
# must emit TRUE where the oracle emits literal TRUE. A sketch
# regression (or a bad rsd/accuracy knob) flips the boolean and the
# gate hash catches it; test_approx_within_tolerance still pins the
# tighter numeric contract.
# ---------------------------------------------------------------------------
@register(
    "a2b_approx_stats",
    """
    WITH c AS (
      SELECT o_orderpriority, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           CAST(ROUND(quantile_cont(CAST(cents AS DOUBLE), 0.5) * 2)
                AS BIGINT) AS p50_x2_cents,
           TRUE AS hll_within_tol,
           TRUE AS p50_within_tol
    FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def a2b_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        "o_orderpriority",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    # COUNT(DISTINCT) must NOT share an Aggregate with the sketch
    # functions: Catalyst's distinct rewrite routes the imperative
    # sketch buffers through an Expand + sort aggregate, turning two
    # sub-second passes into a ~20s one (measured at sf0.1). Two
    # narrow scans + a broadcast join of the group-count-sized results
    # is the plan that survives scale-up.
    sketches = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.percentile_approx("cents", 0.5, 10_000).alias("approx_p50_cents"),
        # one percentile buffer for all three cut points (49/50/51):
        # the array form sorts the group once instead of three times.
        # The band is the sketch verdict's envelope — accuracy=10000
        # bounds rank error at 1e-4, so ±0.01 is 100x slack at any SF.
        # The EXACT leg's buffer is this verdict query's point (it is
        # what the sketch is judged against); the production exact-
        # percentile path is operators.scale.exact_percentiles_multi
        F.expr("percentile(cents, array(0.49D, 0.5D, 0.51D))").alias("pcts"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    # HLL bound: rsd=0.02 ⇒ 2.5σ = 5% relative, floored at 8 absolute
    # for tiny groups
    hll_tol = F.greatest(
        F.round(F.col("exact_custs") * 0.05, 0), F.lit(8.0)
    )
    return sketches.join(F.broadcast(exact), "o_orderpriority").select(
        "o_orderpriority",
        F.col("exact_custs").cast("long").alias("exact_custs"),
        F.round(F.col("pcts")[1] * 2, 0).cast("long").alias("p50_x2_cents"),
        (
            F.abs(F.col("approx_custs") - F.col("exact_custs")) <= hll_tol
        ).alias("hll_within_tol"),
        F.col("approx_p50_cents")
        .between(F.col("pcts")[0], F.col("pcts")[2])
        .alias("p50_within_tol"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# A2c: MERGEABLE distinct-count sketches — the property a one-shot
# estimate (a2b) does not prove. Per-group Apache DataSketches HLL
# partials (`hll_sketch_agg`) re-aggregate up the hierarchy with
# `hll_union_agg`: the global estimate comes from UNIONING the five
# per-priority sketches, never from rescanning the fact — the pattern
# that makes distinct counting cube/rollup-able at 100 TB (compute
# sketch partials once at the finest grain, serve every coarser
# rollup from sketch merges). A customer spans priorities, so the
# merged estimate tracks the true global distinct (~1.5k), NOT the
# sum of per-group distincts (~6.5k) — the oracle pins exact counts
# at both levels plus tolerance verdicts that a broken merge (or a
# sum-not-union regression) would flip. Reference parity: extends the
# COUNT(DISTINCT ...) family (healthcare-sql-analytics.sql:174,181,
# 310-311 and SURVEY §2.4 A2) with the re-aggregatable form its
# RDBMS could not provide.
# ---------------------------------------------------------------------------
@register(
    "a2c_sketch_rollup",
    """
    SELECT o_orderpriority AS grp,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS within_tol
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT), TRUE
    FROM orders
    ORDER BY grp
    """,
)
def a2c_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t.orders.select("o_orderpriority", "o_custkey")
    sk = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    def verdict(est, exact):
        # lgConfigK=12 sketches: rsd ~1.6%, 3σ ≈ 5%; floor 8 absolute
        tol = F.greatest(F.round(exact * 0.05, 0), F.lit(8.0))
        return (F.abs(est - exact) <= tol).alias("within_tol")
    per = sk.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("exact").cast("long").alias("exact_custs"),
        verdict(F.hll_sketch_estimate("sk"), F.col("exact")),
    )
    # the global row NEVER rescans orders for its estimate: it merges
    # the five per-group sketch partials
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    g_exact = o.agg(F.countDistinct("o_custkey").alias("exact"))
    allrow = merged.crossJoin(F.broadcast(g_exact)).select(
        F.lit("ALL").alias("grp"),
        F.col("exact").cast("long").alias("exact_custs"),
        verdict(F.col("est"), F.col("exact")),
    )
    return per.unionByName(allrow).orderBy("grp")


# ---------------------------------------------------------------------------
# A2d: mergeable frequency top-k — the accumulate / combine / estimate
# protocol (Spark 4.1's approx_top_k sketch family). Per-shard sketch
# partials (here: one per order status) COMBINE into the global top-k
# without re-touching the fact — the companion of a2c's HLL merge for
# the "serve every rollup from sketch partials" pattern. With
# maxItemsTracked above the key cardinality the sketch is EXACT
# (degenerates to full counting), so the oracle pins the merged
# estimates value-for-value against exact GROUP BY counts — any
# combine/estimate defect shifts a count and fails the hash. k equals
# the full key domain, so no tie-at-the-boundary nondeterminism.
# Extends SURVEY §2.4 A2/W3 (distinct counts, top-N) with the
# re-aggregatable form; reference anchor healthcare-sql-analytics.sql
# :196-208 (the priority-volume rollups this replaces at scale).
# ---------------------------------------------------------------------------
@register(
    "a2d_topk_sketch_merge",
    """
    SELECT o_orderpriority AS item,
           CAST(COUNT(*) AS BIGINT) AS est_cnt
    FROM orders GROUP BY o_orderpriority
    ORDER BY est_cnt DESC, item
    """,
)
def a2d_topk_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    acc = t.orders.groupBy("o_orderstatus").agg(
        F.expr("approx_top_k_accumulate(o_orderpriority, 16)").alias("sk")
    )
    # the global sketch merges the per-status partials — the fact is
    # never rescanned for the global view
    glob = acc.agg(F.expr("approx_top_k_combine(sk, 16)").alias("sk"))
    est = glob.select(
        F.explode(F.expr("approx_top_k_estimate(sk, 5)")).alias("e")
    )
    return est.select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("long").alias("est_cnt"),
    ).orderBy(F.desc("est_cnt"), "item")


# ---------------------------------------------------------------------------
# W6: rolling window frame (RANGE BETWEEN N PRECEDING) — trailing
# 7-day order revenue per priority. The frame is keyed on an integer
# day column so Spark's rangeBetween and SQL RANGE frames agree
# exactly; sums are decimal cents (exact, order-independent).
# ---------------------------------------------------------------------------
@register(
    "w6_rolling_window",
    """
    WITH x AS (
      SELECT o_orderkey, o_orderpriority,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_num,
             CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS cents
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, CAST(day_num AS INT) AS day_num,
           CAST(SUM(cents) OVER (PARTITION BY o_orderpriority ORDER BY day_num
                                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_7d_cents
    FROM x
    """,
)
def w6_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    x = t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("int")
        .alias("day_num"),
        (F.col("o_totalprice").cast(DEC) * 100).alias("cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return x.select(
        "o_orderkey",
        "o_orderpriority",
        "day_num",
        F.sum("cents").over(w).cast("long").alias("trailing_7d_cents"),
    )


# ---------------------------------------------------------------------------
# TF-IDF corpus statistics: term df / tf via explode + two aggregations
# (term-local shuffles only; N is a scalar broadcast into the plan).
# idf uses natural log — rounded at 4dp since libm implementations may
# differ in the last ulp (cross-engine doctrine in functions/helpers).
# ---------------------------------------------------------------------------
@register(
    "text_tfidf",
    f"""
    WITH t AS (
      SELECT doc_id, unnest({DUCK_TOKENS.format(text="text")}) AS term
      FROM documents
    ),
    d AS (
      SELECT term,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM t GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, df, tf,
           CAST(ROUND(ln(CAST(n.n_docs AS DOUBLE) / df), 4) AS DOUBLE) AS idf,
           CAST(ROUND(tf * ROUND(ln(CAST(n.n_docs AS DOUBLE) / df), 4), 2)
                AS DOUBLE) AS tfidf_mass
    FROM d, n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    terms = t.documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    d = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    n_docs = t.documents.count()  # scalar; folded into the plan as a literal
    idf = F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 4)
    return d.select(
        "term",
        "df",
        "tf",
        idf.cast("double").alias("idf"),
        F.round(F.col("tf") * idf, 2).cast("double").alias("tfidf_mass"),
    )


# ---------------------------------------------------------------------------
# JSON extraction: typed scalar pulled from a JSON string column
# (`events.props`), aggregated per event_type. JVM-side
# get_json_object — no Python in the path.
# ---------------------------------------------------------------------------
@register(
    "f_json_extract",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max
    FROM events GROUP BY event_type
    """,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum(k).cast("long").alias("k_sum"),
        F.max(k).cast("long").alias("k_max"),
    )


# ---------------------------------------------------------------------------
# NEAREST as-of join (pandas merge_asof direction="nearest"): each
# purchase matched to the user's CLOSEST click in either direction
# within a 30-minute tolerance, backward winning ties. Same
# single-shuffle union + running-carry as t_asof_join — the backward
# candidate is a running last, the forward one a running first over
# the mirrored frame, both on ONE key exchange. The oracle composes
# DuckDB's two directional ASOF joins and re-applies the identical
# pick rule.
# ---------------------------------------------------------------------------
_NEAREST_TOL_S = 1800


@register(
    "t_asof_nearest",
    f"""
    WITH l AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    mb AS (
      SELECT l.user_id, l.ts, l.event_id, r.ts AS bts, r.click_id AS bid
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    mf AS (
      SELECT l.user_id, l.ts, l.event_id, r.ts AS fts, r.click_id AS fid
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    ),
    m AS (
      SELECT mb.user_id, mb.ts,
             epoch_us(mb.ts) - epoch_us(mb.bts) AS bgap,
             epoch_us(mf.fts) - epoch_us(mf.ts) AS fgap,
             (mb.bts IS NOT NULL
              AND epoch_us(mb.ts) - epoch_us(mb.bts)
                  <= {_NEAREST_TOL_S} * 1000000) AS b_ok,
             (mf.fts IS NOT NULL
              AND epoch_us(mf.fts) - epoch_us(mf.ts)
                  <= {_NEAREST_TOL_S} * 1000000) AS f_ok,
             mb.bid, mf.fid
      FROM mb JOIN mf
        ON mb.user_id = mf.user_id AND mb.ts = mf.ts
           AND mb.event_id = mf.event_id
    ),
    pick AS (
      SELECT user_id, ts,
             CASE WHEN b_ok AND (NOT f_ok OR bgap <= fgap) THEN bid
                  WHEN f_ok THEN fid END AS nearest_id,
             CASE WHEN b_ok AND (NOT f_ok OR bgap <= fgap) THEN bgap
                  WHEN f_ok THEN fgap END AS gap_us
      FROM m
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS purchase_cnt,
           CAST(COUNT(nearest_id) AS BIGINT) AS matched_cnt,
           CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS gap_us_total
    FROM pick GROUP BY user_id
    """,
)
def t_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join_nearest

    t = load_tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        t.events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    m = asof_join_nearest(
        purchases, clicks, "user_id", "ts", "ts",
        payload=["click_id"], tolerance_seconds=_NEAREST_TOL_S,
    )
    gap = F.abs(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
    )
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("purchase_cnt"),
        F.count("click_id").alias("matched_cnt"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_total"),
    )
