"""Relational operator library (SURVEY.md §2.2-§2.7).

Each helper is a *composition of built-in DataFrame ops* so Catalyst
keeps full visibility (pushdown, pruning, AQE). Reference citations
point at the semantics being reproduced, not at code being ported —
the reference ships SQL text to an RDBMS; we build logical plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.helpers import round_div


def band_self_join(
    df: DataFrame,
    key: str,
    date_col: str,
    min_days: int = 1,
    max_days: int = 30,
    left_alias: str = "a",
    right_alias: str = "b",
    right_date_col: str | None = None,
) -> DataFrame:
    """Banded self-join: pairs (a, b) with equal `key` and
    `b.right_date ∈ [a.date + min_days, a.date + max_days]`.
    `right_date_col` defaults to `date_col`; the readmission idiom
    bands b's *admission* against a's *discharge*
    (healthcare-data-pipeline-main.py:282).

    Semantics of the 30-day readmission pair-finding
    (`healthcare-data-pipeline-main.py:279-282`,
    `healthcare-sql-analytics.sql:164-171`).

    Scale: the equi key carries the shuffle (sort-merge join on `key`);
    the band condition is a cheap post-filter. Per-key cardinality is
    small (encounters per patient / orders per customer), so the
    quadratic-within-key blowup is bounded; AQE skew-join splits any
    hot key. No range-join machinery needed.
    """
    a, b = df.alias(left_alias), df.alias(right_alias)
    ad = F.to_date(F.col(f"{left_alias}.{date_col}"))
    bd = F.to_date(F.col(f"{right_alias}.{right_date_col or date_col}"))
    return a.join(
        b,
        (F.col(f"{left_alias}.{key}") == F.col(f"{right_alias}.{key}"))
        & (bd > F.date_add(ad, min_days - 1))
        & (bd <= F.date_add(ad, max_days)),
        "inner",
    )


def exists_flag(
    left: DataFrame,
    right: DataFrame,
    key: str,
    flag_name: str,
) -> DataFrame:
    """EXISTS as a *SELECT column* (not a filter) — SURVEY §7.1, the
    `readmitted_30day` idiom (`healthcare-sql-analytics.sql:164-171`).

    Implemented as distinct-key aggregate + left join + coalesce: the
    aggregate side reduces to |distinct keys| rows before the join, so
    at scale the join input is minimal and often broadcastable by AQE.
    """
    keys = right.select(F.col(key)).distinct().withColumn(flag_name, F.lit(1))
    return (
        left.join(keys, key, "left")
        .withColumn(flag_name, F.coalesce(F.col(flag_name), F.lit(0)).cast("int"))
    )


def semi_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    """EXISTS as a filter (`healthcare-sql-analytics.sql:606-616`)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    """NOT EXISTS as a filter (`healthcare-sql-analytics.sql:749-754`)."""
    return left.join(right, on, "left_anti")


def latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Latest-row-per-entity — the correlated `ORDER BY … DESC LIMIT 1`
    (latest A1C per patient, `healthcare-sql-analytics.sql:592-598`).

    `order_by` must be a *total* order within each key (append a
    unique id as tiebreaker) — the reference is nondeterministic on
    ties; we are not (SURVEY §7.2).

    Scale: single hash-partition shuffle on `key`, per-partition
    top-1 (Spark plans a WindowExec after a sort within partitions; no
    global sort).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topn_per_group(
    df: DataFrame,
    group: str | Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Top-N per group — distributed form of the reference's
    `nlargest(5, ...)` (`healthcare-data-pipeline-main.py:345`)."""
    keys = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def distribution_pct(
    df: DataFrame, col: str, scale: int = 2, count_name: str = "cnt", pct_name: str = "pct"
) -> DataFrame:
    """Group-count → percent-of-total (`healthcare-api-main.py:527-542`).

    The percent step uses an empty-frame window over the *already
    aggregated* counts (|distinct values| rows), so the window's
    single-partition exchange is on a tiny relation — fine at any
    scale. Counts are integers ⇒ exact.
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias(count_name))
    total = F.sum(count_name).over(Window.partitionBy())
    return counts.withColumn(
        pct_name,
        round_div(F.col(count_name) * 100, total, pct_name, scale),
    )


def bucketize(col: Column, edges: Sequence[float], labels: Sequence[str]) -> Column:
    """CASE-WHEN histogram bucketing (`healthcare-api-main.py:544-576`):
    len(labels) == len(edges) + 1; bucket i is [edges[i-1], edges[i])."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    expr = F.when(col < F.lit(edges[0]), labels[0])
    for i in range(1, len(edges)):
        expr = expr.when(col < F.lit(edges[i]), labels[i])
    return expr.otherwise(labels[-1])


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    sigma: float = 2.5,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Mean/std anomaly detection (|x−μ| > kσ), the RCA detector
    (`healthcare-data-pipeline-main.py:319-338`).

    μ is computed exactly (decimal sum / count); σ is sample stddev
    like the oracle's STDDEV. The 1-row stats frame is broadcast into
    a literal-free cross join — no second scan materialization, no
    driver round-trip.
    """
    stats = df.agg(
        (F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double") / F.count(value_col)).alias("__mu"),
        F.stddev(value_col).alias("__sigma"),
    )
    out = df.crossJoin(F.broadcast(stats)).filter(
        F.abs(F.col(value_col) - F.col("__mu")) > F.lit(sigma) * F.col("__sigma")
    )
    return out.select(*(keep_cols or df.columns))


def iqr_bounds(df: DataFrame, col: str, factor: float = 1.5) -> DataFrame:
    """IQR validity bounds (`healthcare-data-pipeline-main.py:246-250`):
    exact quartiles → [q1−k·IQR, q3+k·IQR]. Quartiles come from
    `exact_percentiles_multi` (sketch-bracketed refinement, r10) —
    the exact `percentile()` aggregate this replaced buffers the
    column's full value→count map in one reducer, an OOM for
    near-unique doubles (order totals) at warehouse scale."""
    from .scale import exact_percentiles_multi

    q = exact_percentiles_multi(
        df, [], {"q1": (col, 0.25), "q3": (col, 0.75)}
    )
    return q.select(
        "q1",
        "q3",
        (F.col("q1") - factor * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + factor * (F.col("q3") - F.col("q1"))).alias("hi"),
    )


def column_quality(df: DataFrame, table_name: str, columns: Sequence[str] | None = None) -> DataFrame:
    """One-pass data-quality scan: per-table row count, null counts and
    completeness (`healthcare-data-pipeline-main.py:233-258`,
    `healthcare-sql-analytics.sql:759-779`). Emits one summary row per
    column in a canonical schema so per-table frames union cleanly
    (SURVEY §2.7 U1)."""
    cols = list(columns or df.columns)
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.sum(F.col(c).isNull().cast("int")).alias(f"__n_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', __n_{c}" for c in cols)
    return agg.selectExpr(
        "__total",
        f"stack({len(cols)}, {stack}) as (column_name, null_count)",
    ).select(
        F.lit(table_name).alias("table_name"),
        "column_name",
        F.col("__total").cast("long").alias("total_rows"),
        F.col("null_count").cast("long").alias("null_count"),
        round_div(
            (F.col("__total") - F.col("null_count")) * 100,
            F.col("__total"),
            "completeness_pct",
        ),
    )
