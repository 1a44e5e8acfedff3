"""Temporal join operators beyond the reference's surface.

The reference's only temporal pairing is the 30-day readmission band
self-join (`healthcare-data-pipeline-main.py:279-282`, SURVEY §2.3 J2).
An as-of join — "for each left event, the latest right event at or
before it" — is the general form of that need (state lookup, slowly
changing dimensions, last-observation-carried-forward labs) and Spark
has no built-in for it.

Implementation choice (the 100 TB one): **union + single window**, not
a band join. A band join (`l.ts BETWEEN r.ts AND r.ts + tol`) explodes
candidate pairs quadratically inside hot keys and still needs a
per-left argmax; a broadcast of the right side caps at driver memory.
The union form shuffles each row exactly once on the join key, sorts
within key, and carries the last-seen right payload forward with a
running `last(ignorenulls)` — linear work, one exchange, no
per-pair blowup, and AQE can split a skewed key's sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join (DuckDB `ASOF LEFT JOIN` semantics:
    match the greatest right.ts <= left.ts per key).

    Returns the left rows plus the matched `payload` columns and a
    `matched_ts` column (the matched right timestamp, null if no match).
    With `tolerance_seconds`, matches older than the tolerance are
    nulled out.

    Determinism requires the right side be unique per (key, right_ts) —
    pre-aggregate it otherwise (ties between right rows at the same
    timestamp would make `last()` pick an arbitrary one).
    """
    keys = [key] if isinstance(key, str) else list(key)
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__is_l", F.lit(1)
    )
    rhs = (
        right.select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in payload],
        )
        .withColumn("__r_matched_ts", F.col("__ts"))
        .withColumn("__is_l", F.lit(0))
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive `<=`
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ["__r_matched_ts"] + [f"__r_{c}" for c in payload]
    for c in carried:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    out = u.filter(F.col("__is_l") == 1).drop("__is_l")
    if tolerance_seconds is not None:
        # materialize the flag before nulling anything — the predicate
        # reads __r_matched_ts, which is itself one of the nulled columns
        out = out.withColumn(
            "__stale",
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(F.col("__r_matched_ts"))
            > F.lit(int(tolerance_seconds) * 1_000_000),
        )
        for c in carried:
            out = out.withColumn(
                c, F.when(F.col("__stale"), None).otherwise(F.col(c))
            )
        out = out.drop("__stale")
    out = out.drop("__ts")
    for c in payload:
        out = out.withColumnRenamed(f"__r_{c}", c)
    return out.withColumnRenamed("__r_matched_ts", "matched_ts")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof(direction="nearest")
    semantics): match the right row whose timestamp is closest to
    left.ts in either direction, backward winning exact-distance ties;
    with `tolerance_seconds`, matches farther than the tolerance are
    nulled out.

    Plan shape: the same single-shuffle union + running-carry as
    `asof_join` — the backward candidate is a running `last` over
    (key, ts asc) and the forward candidate a running `first` over the
    mirrored frame; both windows share one hash partitioning on the
    key, so the exchange happens once and the pick is a row-local
    CASE. Never a banded self-join. The right side must be unique per
    (key, right_ts) — pre-aggregate it otherwise (same determinism
    contract as `asof_join`)."""
    keys = [key] if isinstance(key, str) else list(key)
    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__is_l", F.lit(1)
    )
    rhs = (
        right.select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in payload],
        )
        .withColumn("__r_matched_ts", F.col("__ts"))
        .withColumn("__is_l", F.lit(0))
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)
    # backward: right rows sort before left at equal ts → inclusive <=
    wb = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: same partitioning, mirrored frame → first right >= ts
    wf = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_l")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = ["__r_matched_ts"] + [f"__r_{c}" for c in payload]
    for c in carried:
        u = u.withColumn(f"__b_{c}", F.last(F.col(c), ignorenulls=True).over(wb))
        u = u.withColumn(f"__f_{c}", F.first(F.col(c), ignorenulls=True).over(wf))
    out = u.filter(F.col("__is_l") == 1).drop("__is_l")
    ts_us = F.unix_micros(F.col("__ts"))
    bgap = ts_us - F.unix_micros(F.col("__b___r_matched_ts"))
    fgap = F.unix_micros(F.col("__f___r_matched_ts")) - ts_us
    tol_us = (
        F.lit(int(tolerance_seconds) * 1_000_000)
        if tolerance_seconds is not None
        else None
    )
    b_ok = F.col("__b___r_matched_ts").isNotNull() & (
        (bgap <= tol_us) if tol_us is not None else F.lit(True)
    )
    f_ok = F.col("__f___r_matched_ts").isNotNull() & (
        (fgap <= tol_us) if tol_us is not None else F.lit(True)
    )
    # nearest pick, backward wins ties (bgap <= fgap) — the flags are
    # materialized BEFORE the carry loop because each iteration drops
    # the directional columns the flag expressions read
    take_b = b_ok & (~f_ok | (bgap <= fgap))
    take_f = f_ok & ~take_b
    out = out.withColumn("__take_b", take_b).withColumn("__take_f", take_f)
    for c in carried:
        out = out.withColumn(
            c,
            F.when(F.col("__take_b"), F.col(f"__b_{c}"))
            .when(F.col("__take_f"), F.col(f"__f_{c}"))
            .otherwise(F.lit(None)),
        ).drop(f"__b_{c}", f"__f_{c}")
    out = out.drop("__ts", "__take_b", "__take_f")
    for c in payload:
        out = out.withColumnRenamed(f"__r_{c}", c)
    return out.withColumnRenamed("__r_matched_ts", "matched_ts")
