"""Training-data pipeline corpus, part 10: the privacy triad's third
leg, sequence analytics (pattern cohorts + gaps-and-islands), and
blocked-Hamming SimHash pairing.

`dq_t_closeness`: completes k-anonymity / l-diversity (datapipe9) —
even a diverse class leaks if its sensitive-value DISTRIBUTION skews
far from the population's. Per quasi-identifier class, total
variation distance TVD = ½·Σ_s |p_class(s) − p_global(s)| over the
FULL sensitive domain (absent values contribute their global mass —
the grid is completed explicitly, classes × |domain|, a bounded
frame). Determinism doctrine: each |p−q| term is a float of exact
integer ratios rounded to 8 dp and cast DECIMAL(18,8), so the
cross-term sum is exact and order-free; one fact shuffle for the
counts, everything else bounded.

`t_event_pattern_match`: MATCH_RECOGNIZE-lite — each user's event
stream compresses to a journey string of type initials (ordered by
ts, event_id; initials are distinct for this domain), and behavioral
cohorts are regex matches over the journeys: repeated errors,
signup-first, view-then-purchase, error-immediately-before-purchase.
One shuffle to assemble journeys (per-user lists, bounded by per-user
activity — at 100 TB you'd sessionize first, the same shape per
session); the pattern battery is a map-side projection over the
user frame.

Reference parity: privacy extends healthcare/security.py's masking
family with the re-identification metrics HIPAA de-identification
review actually uses; pattern matching extends the patient-flow/
funnel family (healthcare-sql-analytics.sql:640-698).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import track_persist
from ..functions.helpers import duck_round_div, round_div
from ..tables import load_tables
from . import register

_TCLOSE_T = 0.2


@register(
    "dq_t_closeness",
    f"""
    WITH joined AS (
      SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM joined),
    gs AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ns FROM joined GROUP BY s),
    cls AS (SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS nc
            FROM joined GROUP BY c_nationkey, c_mktsegment),
    cs AS (SELECT c_nationkey, c_mktsegment, s, CAST(COUNT(*) AS BIGINT) AS ncs
           FROM joined GROUP BY c_nationkey, c_mktsegment, s),
    grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.nc, gs.s, gs.ns,
             COALESCE(cs.ncs, 0) AS ncs
      FROM cls CROSS JOIN gs
      LEFT JOIN cs ON cs.c_nationkey = cls.c_nationkey
                  AND cs.c_mktsegment = cls.c_mktsegment
                  AND cs.s = gs.s
    ),
    terms AS (
      SELECT c_nationkey, c_mktsegment, nc,
             CAST(ROUND(abs(CAST(ncs AS DOUBLE) / nc
                            - CAST(ns AS DOUBLE) / (SELECT n FROM g)), 8)
                  AS DECIMAL(18,8)) AS term
      FROM grid
    )
    SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment,
           CAST(MAX(nc) AS BIGINT) AS n_rows,
           CAST(ROUND(CAST(SUM(term) AS DOUBLE) / 2, 4) AS DOUBLE) AS tvd,
           CAST(ROUND(CAST(SUM(term) AS DOUBLE) / 2, 4) AS DOUBLE)
             > {_TCLOSE_T} AS violating
    FROM terms
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = t.orders.join(
        t.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("s")
    )
    joined = track_persist(joined)  # four aggregation consumers of the same join
    g = joined.agg(F.count(F.lit(1)).cast("long").alias("n"))
    gs = joined.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    cls = joined.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("nc")
    )
    cs = joined.groupBy("c_nationkey", "c_mktsegment", "s").agg(
        F.count(F.lit(1)).cast("long").alias("ncs")
    )
    grid = (
        cls.crossJoin(F.broadcast(gs))
        .join(
            cs,
            ["c_nationkey", "c_mktsegment", "s"],
            "left",
        )
        .crossJoin(F.broadcast(g))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "nc",
            F.round(
                F.abs(
                    F.coalesce("ncs", F.lit(0)).cast("double") / F.col("nc")
                    - F.col("ns").cast("double") / F.col("n")
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("term"),
        )
    )
    tvd = F.round(F.sum("term").cast("double") / 2, 4).cast("double")
    return (
        grid.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("nc").cast("long").alias("n_rows"),
            tvd.alias("tvd"),
            (tvd > _TCLOSE_T).alias("violating"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            "n_rows",
            "tvd",
            "violating",
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Journey-string pattern battery.
# ---------------------------------------------------------------------------
_PATTERNS = {
    "double_error": "ee",
    "signup_first": "^s",
    "view_then_purchase": "v.*p",
    "error_before_purchase": "ep",
}


@register(
    "t_event_pattern_match",
    f"""
    WITH j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             {", ".join(
                 f"CASE WHEN regexp_matches(journey, '{rx}') THEN 1 ELSE 0 END"
                 f" AS m_{name}"
                 for name, rx in _PATTERNS.items())}
      FROM j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           {", ".join(
               f"CAST(SUM(m_{name}) AS BIGINT) AS {name}, "
               + duck_round_div(f"SUM(m_{name}) * 100", "COUNT(*)", 2)
               + f" AS {name}_pct"
               for name in _PATTERNS)}
    FROM m
    """,
)
def t_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = (
        t.events.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1)
                     .alias("i")).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["i"]
                ),
                "",
            ).alias("journey")
        )
    )
    flags = [
        F.col("journey").rlike(rx).cast("int").alias(f"m_{name}")
        for name, rx in _PATTERNS.items()
    ]
    m = j.select(*flags)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_users")]
    for name in _PATTERNS:
        aggs.append(F.sum(f"m_{name}").cast("long").alias(name))
        aggs.append(
            round_div(
                F.sum(f"m_{name}") * 100, F.count(F.lit(1)), f"{name}_pct", 2
            )
        )
    return m.agg(*aggs)


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest same-type run per user — the classic
# value-change islands pattern (distinct from time-gap sessionization,
# which events_sessionize covers). Island ids come from the
# change-flag running sum; both windows are PARTITIONED BY user
# (per-entity frames, never a global stream sort). The final
# aggregate reports, per event_type, the longest run anywhere and how
# many users achieve a run ≥ 3.
# ---------------------------------------------------------------------------


@register(
    "t_run_length_islands",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
    ),
    isl AS (
      SELECT user_id, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM s
    ),
    runs AS (
      SELECT user_id, event_type, island, COUNT(*) AS run_len
      FROM isl GROUP BY user_id, event_type, island
    )
    SELECT event_type,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(COUNT(DISTINCT CASE WHEN run_len >= 3 THEN user_id END)
                AS BIGINT) AS users_with_streak3
    FROM runs
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def t_run_length_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = t.events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    isl = s.withColumn("island", F.sum("chg").over(wrun))
    runs = isl.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max("run_len").cast("long").alias("longest_run"),
            F.countDistinct(
                F.when(F.col("run_len") >= 3, F.col("user_id"))
            )
            .cast("long")
            .alias("users_with_streak3"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup PAIRS via the blocked-Hamming trick — the step the
# signature query (dedup_simhash) feeds at scale: split each 32-bit
# signature into 4 byte-blocks; by pigeonhole, any pair within
# Hamming distance ≤ 3 agrees EXACTLY on at least one block, so
# candidates come from equi-joins on (block_idx, block_value) — never
# an all-pairs Hamming sweep — and the ≤ 3 verification runs only on
# candidates. DISTINCT collapses pairs found via several blocks.
# Bit-string character math end to end (the simhash_bits doctrine):
# identical in both engines.
# ---------------------------------------------------------------------------
_SH_BITS = 60
_SH_BLOCKS = 4
_SH_W = _SH_BITS // _SH_BLOCKS
_SH_HAM = 3


def _duck_hamming(a: str, b: str, n: int) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {n}), i -> "
        f"CASE WHEN substr({a}, i, 1) <> substr({b}, i, 1) "
        f"THEN 1 ELSE 0 END))"
    )


def _simhash_pairs_oracle() -> str:
    from ..functions.text import DUCK_TOKENS, duck_simhash_bits

    toks = DUCK_TOKENS.format(text="text")
    sig = duck_simhash_bits("toks", _SH_BITS)
    ham = _duck_hamming("sa", "sb", _SH_BITS)
    return f"""
    WITH d AS (
      SELECT doc_id, {sig} AS sig
      FROM (SELECT doc_id, {toks} AS toks FROM documents)
    ),
    blk AS (
      SELECT doc_id, sig, b.bi,
             substr(sig, 1 + b.bi * {_SH_W}, {_SH_W}) AS bv
      FROM d CROSS JOIN
           (SELECT unnest(generate_series(0, {_SH_BLOCKS - 1})) AS bi) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             a.sig AS sa, c.sig AS sb
      FROM blk a JOIN blk c
        ON a.bi = c.bi AND a.bv = c.bv AND a.doc_id < c.doc_id
    )
    SELECT id_a, id_b, CAST({ham} AS INT) AS hamming
    FROM cand
    WHERE {ham} <= {_SH_HAM}
    ORDER BY id_a, id_b
    """


@register("dedup_simhash_pairs", _simhash_pairs_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 60-bit signature travels the pair path as ONE BIGINT
    (`conv(sig, 2, 10)`, once per document): block keys are
    shift+mask extractions and the candidate verification is
    `bit_count(sa ^ sb)` — one ALU op per pair instead of the r8
    form's 60 per-pair `substr` comparisons, and the block-join
    shuffle carries 8-byte longs instead of 60-char strings (the
    pair frame is the fat intermediate at scale). The bit-STRING
    doctrine stays at the boundary: the signature itself is computed
    as the cross-engine bit string (dedup_simhash pins it), and the
    DuckDB oracle keeps the character-math formulation — pinning
    integer XOR/popcount == per-character Hamming."""
    from ..functions.text import simhash_bits_col, tokens

    t = load_tables(spark, sf_dir)
    d = (
        t.documents.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id", simhash_bits_col("toks", _SH_BITS).alias("sig")
        )
        .select(
            "doc_id",
            F.conv("sig", 2, 10).cast("long").alias("sn"),
        )
    )
    # signature scan feeds both self-join sides
    d = track_persist(d)
    mask = (1 << _SH_W) - 1
    blk = d.select(
        "doc_id",
        "sn",
        F.explode(F.sequence(F.lit(0), F.lit(_SH_BLOCKS - 1))).alias("bi"),
    ).withColumn(
        "bv",
        F.expr(
            f"shiftright(sn, ({_SH_BLOCKS - 1} - bi) * {_SH_W})"
            f" & {mask}"
        ),
    )
    a = blk.select(
        F.col("doc_id").alias("id_a"), F.col("sn").alias("sa"), "bi", "bv"
    )
    c = blk.select(
        F.col("doc_id").alias("id_b"),
        F.col("sn").alias("sb"),
        F.col("bi").alias("bi2"),
        F.col("bv").alias("bv2"),
    )
    cand = (
        a.join(
            c,
            (F.col("bi") == F.col("bi2"))
            & (F.col("bv") == F.col("bv2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr("bit_count(sa ^ sb)").cast("int"),
        )
        .filter(F.col("hamming") <= _SH_HAM)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Statistical mode battery — the one descriptive statistic the agg
# family skipped: per-group modal value via count + rank (ties break
# to the SMALLEST value, stated explicitly — engines disagree on
# native mode() tie-breaks, so neither engine's builtin is used), with
# the runner-up value and the modal share as an exact rational.
# Two-level aggregation: (group, value) counts first — the only
# fact-sized shuffle — then a rank over the per-group value domain.
# ---------------------------------------------------------------------------


@register(
    "a27_mode_battery",
    f"""
    WITH c AS (
      SELECT l_returnflag, CAST(l_quantity AS INT) AS v, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, v
    ),
    r AS (
      SELECT l_returnflag, v, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, v) AS rk,
             SUM(n) OVER (PARTITION BY l_returnflag) AS tot
      FROM c
    )
    SELECT l_returnflag,
           CAST(MAX(CASE WHEN rk = 1 THEN v END) AS INT) AS mode_qty,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS mode_cnt,
           CAST(MAX(CASE WHEN rk = 2 THEN v END) AS INT) AS second_qty,
           {duck_round_div("MAX(CASE WHEN rk = 1 THEN n END) * 10000",
                           "MAX(tot)", 2)} AS mode_share_bps
    FROM r
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a27_mode_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    c = t.lineitem.groupBy(
        "l_returnflag", F.col("l_quantity").cast("int").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    # value-domain frame per group (~50 rows): group-cardinality
    # windows, fine at any scale
    w = W.partitionBy("l_returnflag").orderBy(F.desc("n"), "v")
    r = c.withColumn("rk", F.row_number().over(w)).withColumn(
        "tot", F.sum("n").over(W.partitionBy("l_returnflag"))
    )
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("v")))
            .cast("int")
            .alias("mode_qty"),
            F.max(F.when(F.col("rk") == 1, F.col("n")))
            .cast("long")
            .alias("mode_cnt"),
            F.max(F.when(F.col("rk") == 2, F.col("v")))
            .cast("int")
            .alias("second_qty"),
            round_div(
                F.max(F.when(F.col("rk") == 1, F.col("n"))) * 10000,
                F.max("tot"),
                "mode_share_bps",
                2,
            ),
        )
        .orderBy("l_returnflag")
    )
