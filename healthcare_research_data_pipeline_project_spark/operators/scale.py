"""Scale operators — the 100 TB toolkit the reference never needed.

The reference trusts an RDBMS for execution (SURVEY §4) and its env
knobs top out at `PARALLEL_WORKERS=4` (`healthcare-env-example.sh:66`).
At cluster scale three problems dominate that a single Postgres never
sees, and each gets a first-class operator here:

1. **Skewed aggregation keys** → `salted_agg`: two-phase aggregation
   through a deterministic salt so one hot key (the "flu season"
   diagnosis, the crawler domain with 40% of documents) spreads over
   `n_salts` reducers before the cheap final combine. Result-identical
   to a plain groupBy — asserted by oracle.
2. **Reproducible sampling/splits** → `hash_bucket` / `hash_sample` /
   `hash_split`: content-hash bucketing (md5-derived, engine-portable)
   instead of `rand()`, so a sample or train/val/test split is stable
   across runs, engines, partitionings, and re-executions of failed
   tasks. `rand()`-based sampling is NOT replay-safe under task retry;
   hash bucketing is.
3. **Repeated co-located joins** → `write_bucketed` / `read_bucketed`:
   pre-shuffle the big fact once into N sorted buckets on the join key
   so every later join/groupBy on that key is exchange-free. This is
   the Spark-native replacement for the reference's secondary indexes
   (`healthcare-sql-analytics.sql:21-22,89-91`).
"""

from __future__ import annotations

import os
import shutil
import struct

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.helpers import col_of
from ..functions.text import duck_hash64, hash64_expr

# ---------------------------------------------------------------------------
# Skew-safe two-phase aggregation
# ---------------------------------------------------------------------------
#  Decomposable aggregate specs: partial expression on (keys ∪ salt),
#  final combine on keys. Exact by construction: counts/sums combine as
#  sums (decimal sums stay decimal until the caller rounds), min/max as
#  min/max. AVG must be derived by the caller as final sum / final
#  count — never averaged across salts.
_PARTIAL = {
    "count": lambda c: F.count(F.lit(1) if c is None else c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_FINAL = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salt_col(n_salts: int, entropy: str | Column) -> Column:
    """Deterministic salt in [0, n_salts): hashed from a high-cardinality
    column (e.g. the fact's own key), never `rand()` — replay-safe under
    task retry and identical across partitionings."""
    c = F.col(entropy) if isinstance(entropy, str) else entropy
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).alias("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, Column | None]],
    n_salts: int = 16,
    entropy: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `specs` maps output alias → (kind, column) with kind in
    {count, sum, min, max}. Phase 1 aggregates on (keys + salt) —
    the hot key's rows spread over `n_salts` partial groups, so no
    single reducer sees them all; phase 2 combines the ≤ n_salts
    partials per key (tiny). Equivalent to `df.groupBy(keys).agg(...)`
    by decomposability; the oracle check pins that.

    At 100 TB: Spark's own hash aggregate already does map-side partial
    aggregation, which handles *aggregation* skew for simple cases —
    the salt matters when the partial state itself is too wide to
    combine on one reducer (collect-style aggs, huge distinct maps) or
    when the salted frame feeds a later skewed join. The operator keeps
    the technique testable either way.
    """
    ent = entropy if entropy is not None else F.monotonically_increasing_id()
    salted = df.withColumn("__salt", salt_col(n_salts, ent))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[kind](col).alias(f"__p_{alias}")
            for alias, (kind, col) in specs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL[kind](F.col(f"__p_{alias}")).alias(alias)
            for alias, (kind, _) in specs.items()
        ]
    )


# ---------------------------------------------------------------------------
# Deterministic content-hash sampling / dataset splits
# ---------------------------------------------------------------------------
def hash_bucket(key: str, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets): md5-derived, so the assignment
    is identical in Spark and DuckDB (and any engine with md5) — the
    portable primitive under `hash_sample` and `hash_split`.
    `key` is a column name (or SQL expression string)."""
    expr = hash64_expr(f"cast({key} as string)", salt)
    return F.expr(f"{expr} % {n_buckets}")


def duck_hash_bucket(key: str, n_buckets: int = 100, salt: str = "") -> str:
    """DuckDB twin of `hash_bucket` (same md5 prefix → same bucket)."""
    return f"({duck_hash64(f'CAST({key} AS VARCHAR)', salt)} % {n_buckets})"


def hash_sample(
    df: DataFrame, key: str, pct: int, n_buckets: int = 100, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes into the first `pct` of `n_buckets`
    buckets — a reproducible ~pct% sample that is stable across runs
    and consistent for equal keys (all rows of one document/patient
    stay in or out together, unlike row-level `rand()` sampling)."""
    return df.filter(hash_bucket(key, n_buckets, salt) < pct)


def hash_split(
    df: DataFrame,
    key: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Attach a deterministic `split` ∈ {train, val, test} column by
    content-hash bucket: [0,train) train, [train,train+val) val, rest
    test. Key-consistent (no leakage of one entity across splits) and
    engine-portable for the oracle check."""
    b = hash_bucket(key, 100, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split by NEAR-DUP CLUSTER, not by row: a plain
    per-row hash split sends two near-duplicate documents to different
    splits ~2·p·(1−p) of the time, leaking train content into the
    held-out sets — the test-set contamination failure mode the dedup
    literature (Lee et al. 2022, §6) warns training pipelines about.
    Here candidate `pairs` (LSH/SimHash/exact — any pair generator in
    operators/dedup.py) connect documents into components, every
    member keys the hash split on its component's min-id
    representative (`dedup_clusters`' cluster_id; singletons key on
    themselves), and therefore a whole near-dup cluster lands in ONE
    split by construction.

    Output: docs' id, cluster_id, and the `split` column. Scale shape:
    connected components is the bounded iterative operator from
    operators/graph.py; the split itself is one map-side hash — no
    extra shuffle beyond the cluster assignment."""
    from .graph import dedup_clusters

    labeled = dedup_clusters(docs, pairs, id_col, pair_a, pair_b)
    b = hash_bucket("cluster_id", 100, salt)
    return labeled.select(
        id_col,
        "cluster_id",
        "cluster_size",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def duck_split_case(key: str, train_pct: int = 80, val_pct: int = 10,
                    salt: str = "split") -> str:
    b = duck_hash_bucket(key, 100, salt)
    return (
        f"CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# Bucketed tables: pay the shuffle once, join exchange-free forever
# ---------------------------------------------------------------------------
def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` hash-bucketed (and optionally sorted) on the join
    key. Subsequent equi-joins and groupBys on `bucket_key` between
    tables bucketed the same way need no Exchange — at 100 TB this
    turns the nightly fact↔fact join (encounters↔labs on patient_id,
    the reference's indexed FK pattern) from a full two-sided shuffle
    into a zero-shuffle zip of co-located buckets.
    `num_buckets` should be sized so one bucket of the largest table
    fits an executor core's memory slice (e.g. 100 TB / 8192 buckets
    ≈ 12 GB splits, still parallel within bucket via row groups)."""
    spark = df.sparkSession
    # A fresh session's catalog may not know the table even though its
    # warehouse directory survives from an earlier run; saveAsTable then
    # raises LOCATION_ALREADY_EXISTS. Drop both catalog entry and any
    # orphaned location so the write is idempotent.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.split(".")[-1])
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with bucket metadata intact (must go
    through the catalog — a raw path read loses bucketing)."""
    return spark.table(table)


# ---------------------------------------------------------------------------
# Scalable global prefix sum (two-phase, no single-partition window)
# ---------------------------------------------------------------------------
def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, str | Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running SUM(value) in `order_cols` order without the
    classic scale trap: `SUM(x) OVER (ORDER BY k)` with no PARTITION BY
    plans a SinglePartition exchange — every row through one task, the
    one shape that cannot survive a 100x scale-up. Two phases instead:

      1. `repartitionByRange(order_cols)` + per-partition window cumsum
         (each task sorts/sums only its slice; equal keys land in one
         partition, so partition-local order is globally consistent);
      2. per-partition totals (one row per partition) → tiny running
         offset, broadcast back and added.

    `sums` maps output column -> summed column; all running sums share
    the one range exchange. Result is identical to the single-partition
    window whenever the sums are exact (integers/decimals) and order
    ties are sum-indifferent — pinned by tests/test_scale.py against
    the naive window. The per-partition totals reuse the range exchange
    (ReusedExchange), so the big input is shuffled exactly once."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid
    for out, val in sums.items():
        local = local.withColumn(f"__loc_{out}", F.sum(col_of(val)).over(w_local))
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = with_pid.groupBy("__pid").agg(
        *[F.sum(col_of(val)).alias(f"__ptot_{out}") for out, val in sums.items()]
    )
    for out in sums:
        # partition-count-sized frame: a single-partition window over
        # O(num_partitions) rows is fine at any data scale
        offsets = offsets.withColumn(
            f"__off_{out}",
            F.coalesce(F.sum(f"__ptot_{out}").over(w_prev), F.lit(0)),
        )
    offsets = offsets.select("__pid", *[f"__off_{out}" for out in sums])
    res = local.join(F.broadcast(offsets), "__pid")
    for out in sums:
        res = res.withColumn(out, F.col(f"__loc_{out}") + F.col(f"__off_{out}"))
    return res.drop(
        "__pid", *[f"__loc_{o}" for o in sums], *[f"__off_{o}" for o in sums]
    )


# ---------------------------------------------------------------------------
# Distributed EXACT percentiles: sketch-bracketed refinement
# ---------------------------------------------------------------------------
def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Single-column convenience wrapper over
    `exact_percentiles_multi` — see there for the scale design."""
    return exact_percentiles_multi(
        df,
        group_cols,
        {name: (value_col, p) for name, p in ps.items()},
        accuracy=accuracy,
    )


#: group-count ceiling for the driver-side targets/assembly regime in
#: `exact_percentiles_multi` — above it every step stays a distributed
#: expression (tests force that path by patching this to 0)
_DRIVER_ASSEMBLY_CAP = 10_000

#: (group, vcol) combo ceiling for folding the window table into
#: plan-time literal when-chains (bounds codegen size; above it the
#: driver path still broadcasts a local-relation window table)
_LITERAL_WINDOWS_CAP = 128

#: stand-in for float NaN inside collected group-key tuples used as
#: dict keys. Python NaN is unequal to itself and (since 3.10) hashes
#: by object id, so tuples collected in DIFFERENT .collect() calls
#: never match each other in a dict even for the same group — the
#: driver-assembly regime would spuriously raise "bracket window
#: missed lower rank" on NaN group keys while the distributed regime
#: (Spark grouping treats NaN = NaN) returns the row. Canonicalizing
#: every cross-collect dict key through `_canon_gk` keeps the two
#: regimes agreeing. (`vcol_wins` stays RAW: its keys are built and
#: consumed within one collect, and the raw values flow into F.lit /
#: eqNullSafe literals where a sentinel would change the plan.)
_NAN_KEY = ("__exact_percentiles_nan__",)


def _canon_gk(gk: tuple) -> tuple:
    return tuple(
        _NAN_KEY if isinstance(v, float) and v != v else v for v in gk
    )


def exact_percentiles_multi(
    df: DataFrame,
    group_cols: list[str],
    specs: dict[str, tuple[str, float]],
    accuracy: int = 10_000,
) -> DataFrame:
    """PERCENTILE_CONT per group without the scale trap in Spark's
    exact `percentile()` aggregate, which merges every group's full
    value→count map into ONE reducer buffer (an in-memory hashmap the
    size of the group's distinct values — measured 5.5x superlinear
    on the 10x probe, and an OOM at warehouse scale for near-unique
    doubles). The shape is sketch-bracketed exact refinement — two
    passes, every shuffle bounded:

      1. one aggregation computes, per (group), each distinct spec
         COLUMN's count plus ONE `approx_percentile` sketch probed at
         every spec's p ± 4/accuracy (sharing the sketch across specs
         on the same column — a8's two l_quantity percentiles cost one
         GK summary, not two). Spark's sketch is a Greenwald–Khanna
         summary with a HARD rank-error bound of n/accuracy, fully
         mergeable map-side — so for groups with n > accuracy the two
         probe values carry ≥ 3n/accuracy ≥ 3 ranks of cushion around
         the exact target ranks klo/khi (which sit within 2 ranks of
         p·n): GUARANTEED value-brackets. For n ≤ accuracy that
         cushion is under the 2 ranks PERCENTILE_CONT needs, so small
         groups skip bracketing entirely and refine over the whole
         group (±inf brackets) — ≤ `accuracy` rows per group, cheap
         and still bounded at any corpus size;
      2. a second scan keeps, per spec, only rows at or below the
         upper bracket: rows below the lower bracket fold to a single
         below-counter key map-side, rows inside the bracket window
         (≤ ~8n/accuracy of the data — 0.08% at the default) form an
         exact (value, count) histogram; a running count over that
         tiny window turns below + local rank into the exact global
         k-th values.

    Interpolation matches Spark's `percentile()` / PERCENTILE_CONT
    bit-for-bit: r = p·(n−1) 0-based over the sorted multiset, result
    = (1−frac)·v_lo + frac·v_hi — the WEIGHTED form Spark's
    Percentile.getPercentile evaluates (the algebraically-equal lerp
    v_lo + frac·(v_hi−v_lo) differs by an ULP on some doubles). NULL values are
    excluded, matching the aggregate. Groups whose spec column is
    entirely NULL (and the global-aggregate empty-input row) emit a
    NULL percentile rather than vanishing — same as `percentile()`.

    Detection contract: a bracket window that misses EITHER target
    rank RAISES (lower-rank miss, upper-rank miss when interpolation
    needs it, or a (group, spec) whose picked row vanished) — this
    function never silently returns a wrong number.

    `specs` maps output name -> (value column, percentile); all
    columns and percentiles share the same two passes. `accuracy`
    trades pass-1 sketch size (O(accuracy·log n)) against the pass-2
    window fraction (8/accuracy of rows); the default holds both
    comfortably bounded from 60k-row test tables to warehouse scale.
    Output: group_cols + one DOUBLE column per spec name."""
    from ..caching import track_persist

    eps = 4.0 / accuracy
    g = [F.col(c) for c in group_cols]

    # pass 1: counts + bracket probes — ONE sketch per distinct value
    # column, probed at every spec's (lo_p, hi_p) pair
    vcols = sorted({c for c, _ in specs.values()})
    vidx = {c: i for i, c in enumerate(vcols)}
    probes: dict[str, list[float]] = {c: [] for c in vcols}
    spec_probe_at: dict[str, tuple[int, int]] = {}
    for name, (c, p) in specs.items():
        pr = probes[c]
        pr.append(max(0.0, p - eps))
        pr.append(min(1.0, p + eps))
        spec_probe_at[name] = (len(pr) - 1, len(pr))  # 1-based lo, hi
    aggs = []
    for c in vcols:
        v = f"cast({c} as double)"
        arr = ", ".join(repr(x) for x in probes[c])
        aggs.append(F.expr(f"count({v})").alias(f"__n_{vidx[c]}"))
        aggs.append(
            F.expr(f"approx_percentile({v}, array({arr}), {accuracy})").alias(
                f"__br_{vidx[c]}"
            )
        )
    # brackets are groups-sized — persisted so the pass-2 broadcast
    # and the final assembly don't re-run the scan per consumer
    brackets = track_persist(df.groupBy(*g).agg(*aggs))

    # targets: one row per (group, spec) with the 1-based global
    # ranks, the interpolation fraction, and the value brackets.
    # Groups with n <= accuracy refine over the whole group (the GK
    # cushion 3n/accuracy is under the 2 ranks the exact targets can
    # sit from p*n there — ADVICE r10: n=12 p=0.9 raised, n=15 p=0.25
    # silently interpolated wrong before this regime split).
    #
    # Adaptive targets-AND-assembly regime (r11): when the group count
    # is small (bounded driver collect — the persist-once probe
    # doctrine the graph operators use), the targets frame AND the
    # per-(group, vcol) combined-window frame are built as DRIVER-
    # LOCAL literal relations instead of Spark expressions over
    # brackets, every downstream broadcast materializes from a
    # LocalTableScan with NO cluster job, and the FINAL assembly also
    # happens driver-side: the picked frame is (groups × specs)-sized
    # by construction, so it is collected and the interpolation +
    # guard checks run in Python, returning a local relation. That
    # removes the pivot exchange, the assembly join, and the analysis
    # of the widest plan in the operator — measured at sf0.1 (a8's
    # 3-spec shape): steady-state 2.3-2.5 s → ~1.4 s, with pass 2
    # collapsing to ONE job. The python math is bit-identical to the
    # Column math (both are IEEE-754 double ops in the same order:
    # (1−frac)·vlo + frac·coalesce(vhi, vlo)). Above the cap the
    # distributed expression path is unchanged — group cardinality is
    # corpus-driven and collecting it unbounded is the banned shape.
    import math as _math

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    # regime probe and bracket fetch MERGED into one job (r13, VERDICT
    # r12 #7): collect at most cap+1 rows — hitting the limit means
    # group cardinality exceeds the driver cap (distributed path; only
    # cap+1 group rows ever reached the driver, so the probe stays
    # bounded), otherwise the probe rows ARE the bracket rows the
    # driver assembly iterates. The r11/r12 form ran count() and then
    # collect() — two jobs where one suffices; each job is ~fixed
    # scheduling cost, the constant term that dominates a8 at sf0.1.
    probe_rows = brackets.limit(_DRIVER_ASSEMBLY_CAP + 1).collect()
    driver_assembly = len(probe_rows) <= _DRIVER_ASSEMBLY_CAP
    if driver_assembly:
        gfields = [brackets.schema[c] for c in group_cols]
        tgt_rows = []
        gkeys: list[tuple] = []
        tgt_idx: dict[tuple, tuple] = {}
        vcol_wins: dict[tuple, list] = {}
        for row in probe_rows:
            gk = tuple(row[c_] for c_ in group_cols)
            ck = _canon_gk(gk)
            gkeys.append(gk)
            for name, (c, p) in specs.items():
                n = row[f"__n_{vidx[c]}"] or 0
                br = row[f"__br_{vidx[c]}"]
                lo_i, hi_i = spec_probe_at[name]
                r = float(p) * (n - 1)
                fr = _math.floor(r)
                k_lo = fr + 1
                k_hi = k_lo if r == fr else fr + 2
                if n <= accuracy:
                    blo, bhi = float("-inf"), float("inf")
                else:
                    blo, bhi = float(br[lo_i - 1]), float(br[hi_i - 1])
                tgt_rows.append(
                    gk + (name, c, r - fr, k_lo, k_hi, blo, bhi, int(n))
                )
                tgt_idx[(ck, name)] = (r - fr, int(n), k_lo, k_hi)
                vcol_wins.setdefault((gk, c), []).append((blo, bhi))
        tgt_schema = StructType(
            list(gfields)
            + [
                StructField("__pname", StringType()),
                StructField("__vcol", StringType()),
                StructField("__frac", DoubleType()),
                StructField("__klo", LongType()),
                StructField("__khi", LongType()),
                StructField("__blo", DoubleType()),
                StructField("__bhi", DoubleType()),
                StructField("__n", LongType()),
            ]
        )
        targets = spark.createDataFrame(tgt_rows, tgt_schema)
        targets_vcol = None
        if len(vcol_wins) > _LITERAL_WINDOWS_CAP:
            win_t = StructType(
                [
                    StructField("lo", DoubleType()),
                    StructField("hi", DoubleType()),
                ]
            )
            tv_schema = StructType(
                list(gfields)
                + [
                    StructField("__vcol", StringType()),
                    StructField("__wins", ArrayType(win_t)),
                    StructField("__maxhi", DoubleType()),
                ]
            )
            targets_vcol = spark.createDataFrame(
                [
                    gk + (c, sorted(wins), max(hi for _, hi in wins))
                    for (gk, c), wins in vcol_wins.items()
                ],
                tv_schema,
            )
    else:
        spec_rows = []
        for name, (c, p) in specs.items():
            n = F.col(f"__n_{vidx[c]}")
            br = f"__br_{vidx[c]}"
            lo_i, hi_i = spec_probe_at[name]
            r = F.lit(float(p)) * (n - 1)
            k_lo = F.floor(r) + 1
            k_hi = F.when(r == F.floor(r), k_lo).otherwise(F.floor(r) + 2)
            small = n <= F.lit(accuracy)
            spec_rows.append(
                F.struct(
                    F.lit(name).alias("__pname"),
                    F.lit(c).alias("__vcol"),
                    (r - F.floor(r)).alias("__frac"),
                    k_lo.cast("long").alias("__klo"),
                    k_hi.cast("long").alias("__khi"),
                    F.when(small, F.lit(float("-inf")))
                    .otherwise(F.element_at(br, lo_i))
                    .alias("__blo"),
                    F.when(small, F.lit(float("inf")))
                    .otherwise(F.element_at(br, hi_i))
                    .alias("__bhi"),
                    n.alias("__n"),
                )
            )
        targets = brackets.select(
            *g, F.explode(F.array(*spec_rows)).alias("__t")
        ).select(*g, "__t.*")
        win_struct = F.struct(
            F.col("__blo").alias("lo"), F.col("__bhi").alias("hi")
        )
        targets_vcol = targets.groupBy(*g, "__vcol").agg(
            F.sort_array(F.collect_list(win_struct)).alias("__wins"),
            F.max("__bhi").alias("__maxhi"),
        )

    # pass 2: ONE scan — each row explodes to its spec columns, joins
    # the broadcast targets on (group, column), and folds to either a
    # below-counter (NULL window value, all rows under the lower
    # bracket combine map-side to one key) or the in-window histogram
    col_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("__vcol"),
                F.col(c).cast("double").alias("__v"),
            )
            for c in vcols
        ]
    )
    rows = (
        df.select(*g, F.explode(col_structs).alias("__s"))
        .select(*g, "__s.*")
        .filter(F.col("__v").isNotNull())
    )
    # combine every spec window on the same column into ONE broadcast
    # row per (group, vcol): a row then joins exactly one target row
    # (no per-spec row multiplication — a8's two l_quantity specs used
    # to triple the qty rows through the join) and all specs on a
    # column share one histogram. Rows outside every window but under
    # the column's max upper bracket fold to their NEXT window's lower
    # bound (a gap-counter key, ≤ #windows+1 keys per group — the
    # generalization of the single below-counter), so the running
    # count still yields exact GLOBAL ranks for every in-window value.
    # (`targets_vcol` is built per-regime above: a driver-local
    # literal relation in the small-groups path, the grouped
    # expression otherwise.)
    v = F.col("__v")
    if driver_assembly and len(vcol_wins) <= _LITERAL_WINDOWS_CAP:
        # literal-windows path: with few (group, vcol) combos the
        # whole window table folds into plan-time when-chains — the
        # broadcast join disappears from the fact scan entirely
        # (measured at sf0.1, a8's shape: the join added ~0.4 s to the
        # ~2x-exploded scan even against a 6-row local relation).
        # Every expression is plain comparisons on literals — fully
        # inside whole-stage codegen.
        in_chain = next_chain = maxhi_chain = None
        for (gk, c), wins in vcol_wins.items():
            cond = F.col("__vcol") == F.lit(c)
            for colname, val in zip(group_cols, gk):
                cond = cond & F.col(colname).eqNullSafe(F.lit(val))
            wins_sorted = sorted(wins)
            wterm = None
            for lo, hi in wins_sorted:
                tt = (v >= F.lit(lo)) & (v <= F.lit(hi))
                wterm = tt if wterm is None else (wterm | tt)
            # sorted ascending, so the first `v < lo` IS the next
            # window's lower bound
            nterm = F.coalesce(
                *[F.when(v < F.lit(lo), F.lit(lo)) for lo, _ in wins_sorted],
                F.lit(None).cast("double"),
            )
            mh = F.lit(float(max(hi for _, hi in wins)))
            in_chain = (
                F.when(cond, wterm)
                if in_chain is None
                else in_chain.when(cond, wterm)
            )
            next_chain = (
                F.when(cond, nterm)
                if next_chain is None
                else next_chain.when(cond, nterm)
            )
            maxhi_chain = (
                F.when(cond, mh)
                if maxhi_chain is None
                else maxhi_chain.when(cond, mh)
            )
        ex = rows.filter(v <= maxhi_chain).select(
            *g,
            "__vcol",
            F.when(in_chain, v).otherwise(next_chain).alias("__sv"),
            # gap-fold rows sort BEFORE the real values at their
            # boundary: every folded row's actual value is strictly
            # under the next window's lower bound
            F.when(in_chain, F.lit(0)).otherwise(F.lit(-1)).alias("__real"),
        )
    else:
        # join path: the per-row window probe is UNROLLED over the
        # window slots instead of using array HOFs (exists/filter/
        # transform/array_min) — a (group, vcol) row carries at most
        # as many windows as that column has specs, known at PLAN
        # time, and Spark evaluates lambda HOFs interpreted, outside
        # whole-stage codegen; on the ~2x-exploded fact scan that
        # interpretation was the pass-2 hot-spot (measured at sf0.1,
        # a8's shape: picked-job 1.19 s with HOFs). `__wins` is sorted
        # by lo, so the first `lo > v` in the coalesce chain IS the
        # minimum; slots past a column's window count yield NULL via
        # try_element_at (plain element_at raises under ANSI) and
        # short-circuit through isNotNull() to FALSE.
        max_w = max(
            sum(1 for (c2, _) in specs.values() if c2 == c) for c in vcols
        )
        slots = [
            F.try_element_at("__wins", F.lit(i + 1)) for i in range(max_w)
        ]
        in_win = None
        for w in slots:
            term = w.isNotNull() & (v >= w["lo"]) & (v <= w["hi"])
            in_win = term if in_win is None else (in_win | term)
        next_lo = F.coalesce(
            *[
                F.when(w.isNotNull() & (w["lo"] > v), w["lo"])
                for w in slots
            ],
            F.lit(None).cast("double"),
        )
        # NULL-SAFE group-key join: percentile() treats a NULL group
        # key as a regular group; a null-unsafe list join here would
        # orphan those rows and trip the miss guard downstream
        tv = targets_vcol.select(
            *[
                F.col(c).alias(f"__tg_{i}")
                for i, c in enumerate(group_cols)
            ],
            F.col("__vcol").alias("__tvcol"),
            "__wins",
            "__maxhi",
        )
        jcond = F.col("__vcol") == F.col("__tvcol")
        for i, c in enumerate(group_cols):
            jcond = jcond & F.col(c).eqNullSafe(F.col(f"__tg_{i}"))
        ex = (
            rows.join(F.broadcast(tv), jcond)
            .filter(v <= F.col("__maxhi"))
            .select(
                *g,
                "__vcol",
                F.when(in_win, v).otherwise(next_lo).alias("__sv"),
                F.when(in_win, F.lit(0)).otherwise(F.lit(-1)).alias("__real"),
            )
        )
    hist = ex.groupBy(*g, "__vcol", "__sv", "__real").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # running global rank over each column's tiny window set
    # (≤ ~8n/acc distinct values per window — bounded at any scale)
    ww = (
        Window.partitionBy(*group_cols, "__vcol")
        .orderBy(F.col("__sv").asc(), F.col("__real").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        hist.withColumn("__end", F.sum("__cnt").over(ww))
        .filter(F.col("__real") == 0)
        .withColumnRenamed("__sv", "__wv")
    )
    lo = F.col("__end") - F.col("__cnt") + 1
    # null-safe on the group keys for the same reason as the window
    # join above: NULL is a legal group key
    tsel = targets.select(
        *[F.col(c).alias(f"__pg_{i}") for i, c in enumerate(group_cols)],
        F.col("__vcol").alias("__pvcol"),
        "__pname",
        "__klo",
        "__khi",
    )
    pcond = F.col("__vcol") == F.col("__pvcol")
    for i, c in enumerate(group_cols):
        pcond = pcond & F.col(c).eqNullSafe(F.col(f"__pg_{i}"))
    picked = (
        ranked.join(F.broadcast(tsel), pcond)
        .filter(
            (F.col("__klo").between(lo, F.col("__end")))
            | (F.col("__khi").between(lo, F.col("__end")))
        )
        .groupBy(*g, "__pname")
        .agg(
            F.min(
                F.when(
                    F.col("__klo").between(lo, F.col("__end")),
                    F.col("__wv"),
                )
            ).alias("__vlo"),
            F.min(
                F.when(
                    F.col("__khi").between(lo, F.col("__end")),
                    F.col("__wv"),
                )
            ).alias("__vhi"),
        )
    )
    # assembly — driver-side in the small-groups regime: picked is
    # (groups × specs)-sized BY CONSTRUCTION (one row per target that
    # found its ranks), so collect it, run the guard checks and the
    # PERCENTILE_CONT interpolation in Python (bit-identical IEEE-754
    # op order), and return a local relation. This removes the pivot
    # exchange + assembly join + the widest plan's analysis from
    # every call. The guard contract is unchanged: a (group, spec)
    # with n > 0 whose lower rank was missed — or whose upper rank
    # was missed while the interpolation fraction needs it — RAISES;
    # n = 0 groups emit a NULL row like percentile() does.
    if driver_assembly:
        pk: dict[tuple, tuple] = {}
        for row in picked.collect():
            ck = _canon_gk(tuple(row[c_] for c_ in group_cols))
            pk[(ck, row["__pname"])] = (row["__vlo"], row["__vhi"])
        out_rows = []
        for gk in gkeys:
            ck = _canon_gk(gk)
            vals = []
            for name in specs:
                frac, n, k_lo, k_hi = tgt_idx[(ck, name)]
                vlo, vhi = pk.get((ck, name), (None, None))
                if n == 0:
                    vals.append(None)
                elif vlo is None:
                    raise ValueError(
                        f"exact_percentiles: bracket window missed lower "
                        f"rank {k_lo} for {name} — approx_percentile "
                        f"accuracy bound violated"
                    )
                elif frac > 0 and vhi is None:
                    raise ValueError(
                        f"exact_percentiles: bracket window missed upper "
                        f"rank {k_hi} for {name} — approx_percentile "
                        f"accuracy bound violated"
                    )
                else:
                    vals.append(
                        (1.0 - frac) * vlo
                        + frac * (vhi if vhi is not None else vlo)
                    )
            out_rows.append(gk + tuple(vals))
        out_schema = StructType(
            list(gfields)
            + [StructField(nm, DoubleType()) for nm in specs]
        )
        return spark.createDataFrame(out_rows, out_schema)

    # distributed assembly (> _DRIVER_ASSEMBLY_CAP groups): LEFT join
    # picked back onto the one-row-per-(group, spec) targets frame, so
    # a (group, spec) whose picked row vanished RAISES instead of
    # silently dropping, and an all-NULL / empty group (n = 0) emits a
    # NULL row like percentile() does. Guarantee check: the window
    # regime promises both ranks inside the window; a missed LOWER
    # rank or a missed UPPER rank when the interpolation fraction
    # needs it means the contract was violated — raise, never return
    # a silently-wrong number (r10 ADVICE: the old coalesce masked
    # upper-rank misses).
    psel = picked.select(
        *[F.col(c).alias(f"__ag_{i}") for i, c in enumerate(group_cols)],
        F.col("__pname").alias("__apname"),
        "__vlo",
        "__vhi",
    )
    acond = F.col("__pname") == F.col("__apname")
    for i, c in enumerate(group_cols):
        acond = acond & F.col(c).eqNullSafe(F.col(f"__ag_{i}"))
    assembled = targets.join(psel, acond, "left")

    def _bound_err(which: str, k: Column) -> Column:
        return F.raise_error(
            F.concat(
                F.lit(f"exact_percentiles: bracket window missed {which} rank "),
                k.cast("string"),
                F.lit(" for "),
                F.col("__pname"),
                F.lit(" — approx_percentile accuracy bound violated"),
            )
        ).cast("double")

    val = (
        F.when(F.col("__n") == 0, F.lit(None).cast("double"))
        .when(F.col("__vlo").isNull(), _bound_err("lower", F.col("__klo")))
        .when(
            (F.col("__frac") > 0) & F.col("__vhi").isNull(),
            _bound_err("upper", F.col("__khi")),
        )
        .otherwise(
            (F.lit(1.0) - F.col("__frac")) * F.col("__vlo")
            + F.col("__frac") * F.coalesce("__vhi", "__vlo")
        )
    )
    return (
        assembled.groupBy(*g)
        .pivot("__pname", list(specs.keys()))
        .agg(F.first(val))
    )


# ---------------------------------------------------------------------------
# Skew-safe big-big equi-join via salting
# ---------------------------------------------------------------------------
def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    entropy: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side has hot keys: salt left rows into
    `n_salts` lanes (deterministic hash of `entropy`, never rand() —
    replay-safe under task retry) and replicate each RIGHT row into all
    lanes, then join on (key, salt). A key holding 40% of the left
    rows spreads over n_salts reducers instead of one straggler task.

    Cost model: right side inflates n_salts× through the shuffle, so
    use it when right is too big to broadcast but much smaller than
    the skewed left (else AQE's skew-join split of SMJ partitions is
    the better tool — this operator exists for the cases AQE can't
    see: skew created mid-query by a previous stage, or a salted frame
    that feeds a later aggregation on the same lanes). Inner/left
    joins only: every left row keeps exactly its one lane, and each
    right row appears once per lane, so match multiplicity is
    preserved; `how="right"/"full"` would duplicate right-side
    non-matches across lanes and is rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics only for inner/left")
    ent = entropy if entropy is not None else F.monotonically_increasing_id()
    l_s = left.withColumn("__salt", salt_col(n_salts, ent))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_s.join(r_s, [key, "__salt"], how).drop("__salt")


# ---------------------------------------------------------------------------
# Z-order (Morton) data layout
# ---------------------------------------------------------------------------
def morton16(a: Column, b: Column) -> Column:
    """Interleave the low 8 bits of integer columns a (odd bit
    positions) and b (even) into a 16-bit Morton key. Bits are
    disjoint, so the OR is a plain sum. The recursive-quadrant property
    makes any aligned 256-key block a 16×16 tile in (a, b) space."""
    terms = []
    for i in range(8):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: str | Column,
    dim_b: str | Column,
    n_files: int = 16,
) -> None:
    """Write `df` as parquet laid out along the Morton curve of two
    pre-bucketed (0..255) integer dimensions — the engine-level
    equivalent of Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)`.

    `repartitionByRange` on the interleaved key gives each output file
    a contiguous z-range, i.e. a small set of aligned tiles, so each
    file's min/max footer stats for BOTH dimensions are tight; a
    reader filtering on either (or both) dimensions prunes most files
    from their footers alone. A hash layout gives every file the full
    value range — zero pruning. tests/test_scale.py quantifies the
    difference from the actual parquet footers."""
    keyed = df.withColumn("__zkey", morton16(col_of(dim_a), col_of(dim_b)))
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Distributed Bloom-filter join prefilter (runtime-filter pushdown)
# ---------------------------------------------------------------------------
def build_bloom(
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = 16,
    num_hashes: int = 3,
    max_bits: int = 1 << 27,
) -> tuple[bytes, int]:
    """Build a Bloom filter over a key column as ONE packed byte blob.

    The build is fully distributed: each key maps to `num_hashes` bit
    positions (`pmod(xxhash64(i, key), m)`), positions fold to
    (word, OR-mask) pairs, and one `bit_or` aggregation over at most
    m/64 word groups produces the bitmap — the driver transfer is the
    m/64-long word list, never the keys themselves. `m` scales with
    the key count (bits_per_key·n rounded up to a power of two,
    floored at 2048 bits), so the transfer is bits_per_key·n/8 bytes:
    ~2 MB for a 1M-key dim selection at the default 16 bits/key.

    The bitmap ships to the probe side as a single BINARY literal
    (little-endian longs, so filter bit p is bit `p % 8` of byte
    `p div 8`). This representation is the r12 fix for the r11
    literal-array wall: `F.array(*[F.lit(w) ...])` costs one py4j
    round-trip per word, and even the one-call `F.lit(list)` form
    converts element-wise (measured on this host: 7.9 s to build a
    2^20-bit array literal, 30 s at 2^22 — the operator was unusable
    at its own documented scale). A bytes literal crosses py4j as one
    array copy: measured 0.04 s at 2^22 and 0.36 s at the 2^27 cap,
    with plan analysis flat (~0.07 s) at every size, so `max_bits`
    (default 2^27 = 16 MB packed) is now a genuine memory/plan-weight
    bound, not a wall the plan hits first. Past it the function
    RAISES with routing guidance (shuffle-join the dim instead, or
    raise bits-per-key FP budget-consciously) rather than OOMing the
    driver; a key set that big is not a prefilter candidate, it IS
    the fact's peer. This is the engine-level form of Spark's runtime
    bloom-filter join pushdown (`bloom_filter_agg` / `might_contain`
    are Catalyst-internal and not exposed to the PySpark API; the
    packed formulation keeps every step in whole-stage codegen).

    At 16 bits/key and k=3 the false-positive rate is ~0.6% — FPs
    cost a wasted row through the join, never a wrong result (the
    exact join downstream removes them); false NEGATIVES are
    impossible by construction (every build bit is probed with the
    same hash family), which the oracle equality in the gate
    re-proves end to end every round.

    Returns (blob, m_bits)."""
    n = keys.select(key_col).distinct().count()
    m = 2048
    while m < bits_per_key * max(n, 1):
        m <<= 1
    if m > max_bits:
        raise ValueError(
            f"build_bloom: {n} distinct keys need m={m} bits "
            f"(> max_bits={max_bits}); a key set this large is not a "
            f"prefilter candidate — join it directly (shuffle join) or "
            f"raise max_bits knowingly"
        )
    # the i-th hash is xxhash64(i AS BIGINT, key) — the literal's TYPE
    # is part of xxhash64's input, so build and probe must agree on
    # `{i}L` exactly (an INT literal hashes differently)
    pos_arr = F.array(
        *[
            F.expr(f"pmod(xxhash64({i}L, {key_col}), {m})")
            for i in range(num_hashes)
        ]
    )
    words = (
        keys.select(F.explode(pos_arr).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__m)").alias("__bits"))
        .collect()
    )
    packed = [0] * (m // 64)
    for row in words:
        packed[row["__w"]] = row["__bits"]
    return struct.pack(f"<{m // 64}q", *packed), m


def bloom_might_contain(
    key_col: str, blob_col: str, m_bits: int, num_hashes: int = 3
) -> Column:
    """Membership probe for a `build_bloom` bitmap riding a column
    (`blob_col`, the binary literal attached once per plan). Pure
    codegen arithmetic per row: k xxhash64 + a one-byte substring
    decode + shift/AND — no join, no UDF. The byte decode
    (`conv(hex(substring(...)))`) reads the single byte holding the
    probed bit, so values stay in 0..255 and never touch bigint sign
    territory (an 8-byte `conv` would overflow for words with the top
    bit set). Measured cost vs the retired array `element_at` probe:
    +13 ns/row on this host (0.48 s vs 0.35 s per 10M rows warm) —
    bought back many times over by the flat literal cost (see
    `build_bloom`).

    NULL keys are rejected by an explicit `IS NOT NULL` conjunct,
    matching inner-join semantics on the key. This conjunct is load-
    bearing, not defensive: Spark's hash expressions SKIP null inputs
    (`xxhash64(0L, NULL) == xxhash64(0L)`), so without it a NULL key
    would probe 3 fixed key-independent positions and survive or die
    by coincidence of the bitmap's contents."""
    conds = [f"{key_col} IS NOT NULL"]
    for i in range(num_hashes):
        p = f"pmod(xxhash64({i}L, {key_col}), {m_bits})"
        byte = (
            f"cast(conv(hex(substring({blob_col},"
            f" cast(({p}) div 8 as int) + 1, 1)), 16, 10) as int)"
        )
        conds.append(
            f"(({byte}) & shiftleft(1, cast(({p}) % 8 as int))) <> 0"
        )
    return F.expr(" AND ".join(conds))


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key_col: str,
    bits_per_key: int = 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Drop fact rows whose join key cannot be in `dim_keys` BEFORE
    the join's shuffle — the decisive move when the fact is 100 TB and
    the dim selection is narrow: the filter runs in the scan stage, so
    non-matching rows never reach the exchange. The result may retain
    a ~0.6% fringe of false positives; the downstream exact join (which
    the caller still performs) removes them, so composed plans stay
    EXACT — the Bloom stage only ever subtracts guaranteed non-matches.
    """
    blob, m = build_bloom(dim_keys, dim_key_col, bits_per_key, num_hashes)
    return (
        fact.withColumn("__bloom", F.lit(blob))
        .filter(bloom_might_contain(fact_key, "__bloom", m, num_hashes))
        .drop("__bloom")
    )
