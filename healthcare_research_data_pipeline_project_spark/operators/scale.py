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
