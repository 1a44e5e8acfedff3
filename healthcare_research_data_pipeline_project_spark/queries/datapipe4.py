"""Training-data pipeline corpus, part 4: distribution comparison and
concentration statistics (two-sample Kolmogorov–Smirnov, Gini
coefficient), market-basket co-occurrence lift, monthly retention
cohorts, and a distribution-window battery (percent_rank/cume_dist).

The KS and Gini queries are deliberately built on
`operators.scale.prefix_sum` — the two-phase range-partitioned running
sum — instead of the `SUM(x) OVER (ORDER BY k)` single-partition
window, because a global ECDF/rank is exactly the operator that
silently stops scaling when the ordered frame no longer fits one task.
The oracle pins that the two-phase result is bit-identical to the
naive window form (the DuckDB side uses the window).

Numerics doctrine as in datapipe/datapipe2/datapipe3: ratios of exact
integers go through `round_div` (engine-portable HALF_UP in BIGINT);
money sums are decimal cents; the one plain `round` (Gini) divides
two huge exact integers where a decimal-tie at the rounded scale has
vanishing probability (same doctrine as stddev/corr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import duck_round_div, round_div
from ..operators.scale import prefix_sum
from ..tables import load_tables
from . import register

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _order_cents() -> F.Column:
    return (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov: D = max_x |F_hi(x) − F_lo(x)| between
# the order-value distributions of high-priority (URGENT/HIGH) and
# other orders — the standard drift test between two slices of a fact
# table. Exactness: prices become integer cents, ECDF differences are
# compared as cross-multiplied integers |ca·nb − cb·na| (no division
# until the final round_div), so Spark and DuckDB agree bit-for-bit.
# Scale: the per-cents count is a partial-aggregated shuffle whose key
# domain is bounded by the price grid (not the row count); the running
# ECDFs use prefix_sum (range repartition + per-partition window +
# broadcast offsets) — no single-partition exchange anywhere. The
# oracle uses the naive global window, pinning two-phase == naive.
# ---------------------------------------------------------------------------
@register(
    "t_ks_two_sample",
    f"""
    WITH t AS (
      SELECT {_CENTS} AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi
      FROM orders
    ),
    c AS (SELECT cents, SUM(hi) AS a, SUM(1 - hi) AS b FROM t GROUP BY cents),
    cum AS (
      SELECT SUM(a) OVER (ORDER BY cents) AS ca,
             SUM(b) OVER (ORDER BY cents) AS cb
      FROM c
    ),
    tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM c)
    SELECT CAST(na AS BIGINT) AS n_hi,
           CAST(nb AS BIGINT) AS n_lo,
           {duck_round_div('MAX(ABS(ca * nb - cb * na))', 'na * nb', 6)} AS ks_d
    FROM cum, tot
    GROUP BY na, nb
    """,
)
def t_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tagged = t.orders.select(
        _order_cents().alias("cents"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("hi"),
    )
    c = tagged.groupBy("cents").agg(
        F.sum("hi").alias("a"), F.sum(F.lit(1) - F.col("hi")).alias("b")
    )
    # 8 lanes, not defaultParallelism: the running-sum frame is the
    # distinct price grid (domain-bounded — saturates at the cents
    # resolution of the price range, NOT the fact's row count), so wide
    # fan-out buys nothing and each extra lane is an extra task +
    # offset row; 8 vs 32 measured 1.75 s vs 2.10 s at sf0.1. Callers
    # with genuinely row-scaled frames keep prefix_sum's default.
    cum = prefix_sum(c, ["cents"], {"ca": "a", "cb": "b"}, num_partitions=8)
    # totals from `c`, ON PURPOSE sharing the groupBy lineage: AQE
    # turns the shared subtree into one exchange with a ReusedExchange
    # consumer, so the fact is scanned/shuffled ONCE and the totals are
    # a reduce-side re-aggregation of the already-shuffled per-cents
    # partials (plan-verified: a single orders FileScan in the AQE
    # final plan; the old ungrouped-branch form scanned the fact twice)
    tot = c.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    d = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("d"),
        "na",
        "nb",
    )
    res = d.agg(
        F.max("d").alias("maxd"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return res.select(
        F.col("na").cast("long").alias("n_hi"),
        F.col("nb").cast("long").alias("n_lo"),
        round_div(F.col("maxd"), F.col("na") * F.col("nb"), "ks_d", 6),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue concentration:
# G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) with x ascending, i = 1..n.
# The global rank i is a prefix_sum of ones in (cents, custkey) order —
# the scalable row_number — and every product/sum stays in exact
# integer/decimal arithmetic until the single final division. Scale:
# one shuffle for per-customer revenue, one range exchange for the
# rank; no single-partition stage touches a data-sized frame.
# ---------------------------------------------------------------------------
@register(
    "a24_gini_concentration",
    f"""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
      FROM rev
    ),
    s AS (
      SELECT SUM(CAST(i AS DECIMAL(38,0)) * cents) AS s_ix,
             SUM(CAST(cents AS DECIMAL(38,0))) AS tot,
             COUNT(*) AS n
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS BIGINT) AS total_cents,
           CAST(ROUND(CAST(2 * s_ix - (n + 1) * tot AS DOUBLE)
                      / CAST(n * tot AS DOUBLE), 6) AS DOUBLE) AS gini
    FROM s
    """,
)
def a24_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    ranked = prefix_sum(
        rev.withColumn("one", F.lit(1)), ["cents", "o_custkey"], {"i": "one"}
    )
    s = ranked.agg(
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("s_ix"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    num = F.lit(2) * F.col("s_ix") - (F.col("n") + 1) * F.col("tot")
    den = F.col("n") * F.col("tot")
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("tot").cast("long").alias("total_cents"),
        F.round(num.cast("double") / den.cast("double"), 6)
        .cast("double")
        .alias("gini"),
    )


# ---------------------------------------------------------------------------
# Market-basket pair lift: parts that co-occur in the same order,
# support and lift vs their independent frequencies — the co-occurrence
# mining pass (association rules, "products bought together") over a
# fact table. Plan: one groupBy collects each order's basket as a
# sorted part-set array, then pairs are expanded MAP-SIDE from the
# array (nested `transform` + `flatten` + explode — no self-join, no
# sort of the fact): measured ~30% faster than the distinct+SMJ
# self-join form at sf0.1, and the win grows with scale because the
# two fact-sized sort phases disappear. Pair blowup stays bounded by
# Σ basket² (baskets are small); part frequencies come off the same
# basket arrays. Lift is exact: pair_cnt·n_orders / (cnt_a·cnt_b) via
# the round_div integer formula, inlined. The top-100 is fully
# tie-broken (cnt desc, part_a, part_b) so LIMIT is deterministic in
# both engines. The oracle keeps the classic self-join formulation —
# pinning array-expansion == relational self-join.
#
# Implementation is ONE spark.sql statement over a temp view rather
# than chained DataFrame calls: this query is all small fast stages,
# so the ~0.45 s of per-call Python→JVM round-trips (each DataFrame
# method eagerly analyzes its subtree) was a third of its wall time;
# a single statement parses + analyzes once (~0.2 s, measured). Two
# further micro-choices, both measured at sf0.1: pairs travel as ONE
# packed BIGINT (a·2^32 + b — valid while part ids < 2^32; switch to
# a struct key beyond that) instead of a two-field struct (cheaper
# shuffle/hash), and the single-row-group local file is fanned out to
# 16 lanes, not defaultParallelism (the basket partial-agg is CPU-thin
# — 32 lanes cost more in task overhead than they win; skipped for
# multi-split inputs, same guard as tables._spread).
# ---------------------------------------------------------------------------
@register(
    "mb_pair_lift",
    f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    pf AS (SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY l_partkey),
    pc AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS pair_cnt
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b,
           CAST(pair_cnt AS BIGINT) AS pair_cnt,
           {duck_round_div('pair_cnt', 'n_orders', 6)} AS support,
           {duck_round_div('pair_cnt * n_orders', 'fa.cnt * fb.cnt', 4)} AS lift
    FROM pc, n
    JOIN pf fa ON pc.part_a = fa.l_partkey
    JOIN pf fb ON pc.part_b = fb.l_partkey
    ORDER BY pair_cnt DESC, part_a, part_b
    LIMIT 100
    """,
)
def mb_pair_lift(
    spark: SparkSession, sf_dir: str, min_support: int = 2
) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # parallel scan (split-layout cache) straight into the basket
    # aggregate: partial collect_set shrinks ~4 lineitems/order to one
    # basket row map-side BEFORE the exchange, so the shuffle carries
    # basket-count rows, not fact-count rows — the shape that holds at
    # 100 TB. An explicit keyed fan-out was measured and REJECTED
    # twice: pre-split-cache it beat round-robin (2.2x on the basket
    # stage), but against the multi-file scan it shuffles RAW fact
    # rows (repartition defeats the partial aggregate) and loses
    # ~30% end-to-end (1.26-1.41 s vs 1.02 s at sf0.1).
    li = t.lineitem.select("l_orderkey", "l_partkey")
    li.createOrReplaceTempView("__mb_li")
    ms = max(2, min_support)
    # a-priori pre-prune for real min-support thresholds: pair_cnt <=
    # min(cnt_a, cnt_b), so parts below min_support can never appear in
    # a qualifying pair — pruning them BEFORE expansion is what keeps
    # sum(basket^2) tractable at 100 TB. At the default threshold (2,
    # the oracle's HAVING) the prune removes nothing, so the expansion
    # reads `baskets` directly. pf/n_orders always come from the
    # UNPRUNED baskets (the lift denominators are corpus frequencies).
    # NOTE (r7 tuning pass): an explicit REPARTITION hint on the
    # expansion input was measured and REJECTED — it defeats AQE's
    # coalescing but re-shuffles the basket arrays and re-runs the
    # collect_set merge wider (5x the executor time for the same
    # wall), so the size-based plan stands.
    if min_support > 2:
        exp_src = f"""
  SELECT l_orderkey, sort_array(collect_set(l_partkey)) AS ps
  FROM __mb_li
  WHERE l_partkey IN (SELECT pk FROM pf0 WHERE cnt >= {min_support})
  GROUP BY l_orderkey"""
    else:
        exp_src = "  SELECT * FROM baskets"
    # Single statement, one analysis pass. Both `ex` (frequencies +
    # order count) and `pairs` consume the identical `baskets` subtree,
    # so AQE plans ONE basket partial-agg exchange and the fact is
    # scanned once (plan-asserted by
    # test_mb_pair_lift_scans_fact_once_in_final_plan). n_orders is a
    # one-row scalar aggregate broadcast-cross-joined onto pf0 — NOT a
    # `SUM() OVER ()` window: the part dimension grows with the corpus
    # (TPC-H part = SF x 200k), and an unpartitioned window would move
    # the whole frame to a single partition. The broadcast side is
    # exactly one row by construction, so the hint is always safe.
    # support/lift are the round_div integer HALF_UP formula inlined
    # (`div` keeps it in exact BIGINT in both engines).
    return spark.sql(
        f"""
WITH baskets AS (
  SELECT l_orderkey, sort_array(collect_set(l_partkey)) AS ps
  FROM __mb_li GROUP BY l_orderkey
),
ex AS (SELECT posexplode(ps) AS (pos, pk) FROM baskets),
pf0 AS (
  SELECT pk, count(1) AS cnt,
         sum(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS first_cnt
  FROM ex GROUP BY pk
),
nord AS (SELECT sum(first_cnt) AS n_orders FROM pf0),
pf AS (SELECT /*+ BROADCAST(nord) */ pk, cnt, n_orders
       FROM pf0 CROSS JOIN nord),
pairs AS (
  SELECT explode(flatten(transform(ps, (x, i) ->
           transform(slice(ps, i + 2, size(ps) - i - 1),
                     y -> cast(x AS bigint) * 4294967296 + y)))) AS pkey
  FROM ({exp_src})
),
pc AS (
  SELECT pkey, count(1) AS pair_cnt FROM pairs
  GROUP BY pkey HAVING count(1) >= {ms}
),
top AS (
  -- top-100 BEFORE the frequency joins: the packed key orders
  -- exactly like (part_a, part_b), so the tie-broken top slice is
  -- the same 100 rows and the broadcast joins touch 100 rows, not
  -- every qualifying pair
  SELECT cast(pkey div 4294967296 AS bigint) AS part_a,
         cast(pkey % 4294967296 AS bigint) AS part_b, pair_cnt
  FROM pc ORDER BY pair_cnt DESC, pkey LIMIT 100
)
SELECT /*+ BROADCAST(fa), BROADCAST(fb) */
       t.part_a, t.part_b, cast(t.pair_cnt AS bigint) AS pair_cnt,
       cast((2 * t.pair_cnt * 1000000 + fa.n_orders)
              div (2 * fa.n_orders) / 1e6 AS double) AS support,
       cast((2 * t.pair_cnt * fa.n_orders * 10000 + fa.cnt * fb.cnt)
              div (2 * fa.cnt * fb.cnt) / 1e4 AS double) AS lift
FROM top t
JOIN pf fa ON t.part_a = fa.pk
JOIN pf fb ON t.part_b = fb.pk
ORDER BY pair_cnt DESC, part_a, part_b
LIMIT 100
"""
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts on the event stream: users grouped by
# first-seen week, activity tracked by weeks-since-signup — the
# standard growth-analytics triangle (weekly because the driver's
# events table spans one month). Plan: distinct (user, week) activity,
# per-user min week (cohort), equi-join back on user_id (both sides
# pre-aggregated, key-partitioned), then a cohort-sized aggregate; the
# offset-0 row supplies each cohort's denominator via a broadcast
# join. Week offsets are day-diffs/7 — exact integers since both
# endpoints are Monday week-starts; all ratios exact through
# round_div.
# ---------------------------------------------------------------------------
@register(
    "t_retention_cohorts",
    f"""
    WITH ue AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ),
    fu AS (SELECT user_id, MIN(w) AS cohort FROM ue GROUP BY user_id),
    g AS (
      SELECT fu.cohort,
             datediff('day', fu.cohort, ue.w) // 7 AS week_offset,
             COUNT(*) AS active_users
      FROM ue JOIN fu ON ue.user_id = fu.user_id
      GROUP BY fu.cohort, week_offset
    )
    SELECT g.cohort AS cohort_week,
           CAST(g.week_offset AS INT) AS week_offset,
           CAST(g.active_users AS BIGINT) AS active_users,
           CAST(s.active_users AS BIGINT) AS cohort_size,
           {duck_round_div('g.active_users * 100', 's.active_users', 2)}
             AS retention_pct
    FROM g JOIN g s
      ON g.cohort = s.cohort AND s.week_offset = 0
    """,
)
def t_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ue = t.events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    fu = ue.groupBy("user_id").agg(F.min("w").alias("cohort"))
    g = (
        ue.join(fu, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    size = g.filter(F.col("week_offset") == 0).select(
        "cohort", F.col("active_users").alias("cohort_size")
    )
    return g.join(F.broadcast(size), "cohort").select(
        F.col("cohort").alias("cohort_week"),
        "week_offset",
        F.col("active_users").cast("long").alias("active_users"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        round_div(
            F.col("active_users") * 100, F.col("cohort_size"), "retention_pct", 2
        ),
    )


# ---------------------------------------------------------------------------
# Distribution-window battery: percent_rank and cume_dist per nation
# over customer account balances (the remaining SQL window functions
# not covered by w7's rank/dense_rank/ntile/lag/lead). No rounding
# needed: with a full (acctbal, custkey) tiebreak both functions are a
# single IEEE division of small integers — bit-identical across
# engines. Partitioned window (per nation): scales with the partition
# count, no global sort.
# ---------------------------------------------------------------------------
@register(
    "w11_dist_window_battery",
    """
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def w11_dist_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Weighted median: per return-flag, the smallest quantity whose
# cumulative revenue weight reaches half the group's total — the
# revenue-weighted "typical order size". Exact by construction: weights
# are decimal cents, the halfway test is 2·cum ≥ tot in integers, no
# division at all. Plan: partial-aggregated (flag, qty) weight sums,
# then per-group windows over the tiny (flag × qty-domain) frame —
# partitioned windows only, no global sort, scale-independent frame
# sizes.
# ---------------------------------------------------------------------------
@register(
    "a25_weighted_median",
    """
    WITH c AS (
      SELECT l_returnflag, l_quantity AS qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS w
      FROM lineitem GROUP BY l_returnflag, qty
    ),
    m AS (
      SELECT l_returnflag, qty, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM c
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN qty END) AS DOUBLE)
             AS weighted_median_qty,
           CAST(MAX(tw) AS BIGINT) AS total_weight_cents
    FROM m GROUP BY l_returnflag
    """,
)
def a25_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t.lineitem.groupBy("l_returnflag", F.col("l_quantity").alias("qty")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("w")
    )
    # default window frame (RANGE unbounded→current) on both engines;
    # qty is distinct within the group so RANGE == ROWS
    w_cum = Window.partitionBy("l_returnflag").orderBy("qty")
    w_all = Window.partitionBy("l_returnflag")
    m = c.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_all)
    )
    return m.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("qty")))
        .cast("double")
        .alias("weighted_median_qty"),
        F.max("tw").cast("long").alias("total_weight_cents"),
    )


# ---------------------------------------------------------------------------
# Pareto concentration accounting: how many customers cover 80% of
# revenue, and what share the top decile holds. The descending-revenue
# rank and running revenue both come from one prefix_sum pass (ordered
# by negated cents — the operator shuffles the frame exactly once);
# the 80% test is 5·cum ≥ 4·tot in exact integers. The oracle's naive
# global-window form pins the two-phase plan's results.
# ---------------------------------------------------------------------------
@register(
    "a26_pareto_share",
    f"""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS i,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cumc
      FROM rev
    ),
    t AS (SELECT COUNT(*) AS n, SUM(cents) AS tot FROM rev)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(MIN(CASE WHEN 5 * cumc >= 4 * tot THEN i END) AS BIGINT)
             AS n_top80,
           {duck_round_div('MIN(CASE WHEN 5 * cumc >= 4 * tot THEN i END)',
                           'n', 6)} AS top80_frac,
           {duck_round_div('MIN(CASE WHEN i = (n + 9) // 10 THEN cumc END)',
                           'tot', 6)} AS top_decile_share
    FROM r, t GROUP BY n, tot
    """,
)
def a26_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    base = rev.select(
        "o_custkey",
        "cents",
        (-F.col("cents")).alias("neg"),
        F.lit(1).alias("one"),
    )
    r = prefix_sum(base, ["neg", "o_custkey"], {"i": "one", "cumc": "cents"})
    tot = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tot")
    )
    j = r.crossJoin(F.broadcast(tot))
    k = ((F.col("n") + 9) / 10).cast("long")
    agg = j.groupBy("n", "tot").agg(
        F.min(
            F.when(5 * F.col("cumc") >= 4 * F.col("tot"), F.col("i"))
        ).alias("n_top80"),
        F.min(F.when(F.col("i") == k, F.col("cumc"))).alias("decile_cum"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("n_top80").cast("long").alias("n_top80"),
        round_div(F.col("n_top80"), F.col("n"), "top80_frac", 6),
        round_div(F.col("decile_cum"), F.col("tot"), "top_decile_share", 6),
    )


# ---------------------------------------------------------------------------
# A/B conversion z-test: users split into two arms by the engine's
# deterministic content-hash bucketing (operators.scale.hash_bucket —
# replay-safe, engine-portable, key-consistent), conversion = the user
# ever fired a purchase event, and the two-proportion z-score between
# arms. Counts are exact; the z expression is one mirrored IEEE op
# tree (identical literals, identical shape) so both engines produce
# the same double before the final round. Plan: one user-keyed
# aggregate, then a single partial-aggregated scan — no joins.
# ---------------------------------------------------------------------------
from ..operators.scale import duck_hash_bucket, hash_bucket  # noqa: E402


@register(
    "ab_conversion_ztest",
    f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    armed AS (
      SELECT CASE WHEN {duck_hash_bucket('user_id', 2, 'ab')} = 0
                  THEN 'A' ELSE 'B' END AS arm, conv
      FROM u
    ),
    s AS (
      SELECT SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS c_a,
             SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS c_b
      FROM armed
    ),
    z AS (
      SELECT n_a, c_a, n_b, c_b,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
               CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS diff,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
               sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE)
                       + 1.0 / CAST(n_b AS DOUBLE))) END AS se
      FROM s
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS conv_b,
           {duck_round_div('c_a', 'n_a', 6)} AS cvr_a,
           {duck_round_div('c_b', 'n_b', 6)} AS cvr_b,
           CAST(CASE WHEN se IS NULL OR se = 0 THEN NULL
                     ELSE ROUND(diff / se, 4) END AS DOUBLE) AS z_score
    FROM z
    """,
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    u = t.events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    armed = u.select(
        F.when(hash_bucket("user_id", 2, "ab") == 0, "A")
        .otherwise("B")
        .alias("arm"),
        "conv",
    )
    s = armed.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("conv")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("conv")).otherwise(0)).alias(
            "c_b"
        ),
    )
    # degenerate-arm guards: one-sided splits (n=0) or p ∈ {0,1}
    # (se = 0) make z undefined → NULL, and the CASE keeps Spark's
    # ANSI division from throwing on the unevaluated branch
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    da = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    db = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se_inner = F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = s.withColumn("diff", F.when(both, da - db)).withColumn(
        "se", F.when(both, se_inner)
    )
    return z.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("conv_b"),
        round_div(F.col("c_a"), F.col("n_a"), "cvr_a", 6),
        round_div(F.col("c_b"), F.col("n_b"), "cvr_b", 6),
        F.when(
            F.col("se").isNull() | (F.col("se") == 0), F.lit(None)
        )
        .otherwise(F.round(F.col("diff") / F.col("se"), 4))
        .cast("double")
        .alias("z_score"),
    )


# ---------------------------------------------------------------------------
# CDC changelog collapse: treat the event stream as a change-data feed
# per user (signup → Insert, error → Delete, anything else → Update)
# and materialize the current state — keep each key's latest operation
# by (ts, event_id) and drop keys whose last op is a delete. This is
# the batch core of a MERGE/CDC-apply pipeline (the reference's
# session.merge upsert, healthcare-data-pipeline-main.py:606-670,
# generalized with deletes). Plan: one key-partitioned ranking window
# — partial shuffle on user_id only, no global sort; the same shape
# Delta/Hudi use for snapshot reconstruction.
# ---------------------------------------------------------------------------
@register(
    "cdc_last_state",
    """
    WITH c AS (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, op AS last_op, value AS last_value, ts AS last_ts
    FROM c WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Hopping-window rollup (1-hour windows sliding every 15 minutes) —
# the batch twin of a sliding streaming aggregation, complementing the
# tumbling events_hourly_rollup. Spark's F.window(ts, 1h, 15m) expands
# each event into its 4 covering windows before the partial aggregate;
# the oracle reproduces the same window-start arithmetic with an
# unnest over hop offsets (window_start = floor(epoch/hop)·hop −
# k·hop). Scale: the 4× row expansion happens map-side inside the
# aggregate's partial phase — the shuffle carries only (window,
# event_type) partial counts. Exact distinct users per window via the
# count-distinct shuffle (the approximate tier is a2b_approx_stats).
# ---------------------------------------------------------------------------
@register(
    "events_hopping_rollup",
    """
    WITH hop AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900
                - off * 900) * 1000000) AS window_start,
             event_type, user_id
      FROM events, unnest([0, 1, 2, 3]) AS t(off)
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
    FROM hop GROUP BY window_start, event_type
    """,
)
def events_hopping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.events.groupBy(
        F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("event_cnt"),
        F.countDistinct("user_id").cast("long").alias("unique_users"),
    )
