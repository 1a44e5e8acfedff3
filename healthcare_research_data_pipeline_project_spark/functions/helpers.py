"""Deterministic-numerics helpers.

The driver's correctness gate hashes result values against a DuckDB
oracle, so every floating aggregate must be *bit-reproducible across
engines*. Two engine asymmetries drive the design:

1. Aggregation order: double addition is not associative, and Spark's
   partial/final aggregation order differs from DuckDB's. Fix: sums of
   money/quantity cast each value to DECIMAL(18,2) *before* summing —
   decimal addition is exact and associative.
2. Rounding ties: Spark's `round(double, n)` rounds the *shortest
   decimal representation* of the double (Java `BigDecimal.valueOf`),
   while DuckDB rounds the binary value. For exact-tie rationals
   (e.g. 189/40 = 4.725) the two disagree by one ulp of the target
   scale. Fix: every ratio of exact integers (counts, decimal-cents
   sums) is rounded *in integer arithmetic* — `round_div` — which both
   engines evaluate identically. Plain `round` is reserved for
   genuinely irrational statistics (stddev/corr/percentile/cosine)
   where exact decimal ties have measure zero.

Every helper has a DuckDB twin (`duck_*`) generating the matching SQL
fragment, so query and oracle share one formula.

Scale note: `round_div` works in BIGINT (exact while
|2·num·10^scale| < 2^63 and the quotient < 2^53 — comfortably true for
per-group aggregates at bench scale; at warehouse scale you'd keep the
DECIMAL sum unrounded instead).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def col_of(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Exact integer-arithmetic rounding (engine-portable HALF_UP)
# ---------------------------------------------------------------------------
def round_div(num: Column, den: Column, alias: str, scale: int = 2) -> Column:
    """HALF_UP(num/den, scale) for non-negative integer columns, exact:
    floor((2·num·10^s + den) / (2·den)) / 10^s, all in BIGINT."""
    p = 10**scale
    x = num.cast("long") * F.lit(2 * p) + den.cast("long")
    y = den.cast("long") * F.lit(2)
    q = (x - x % y) / y  # exact: x - x%y is a multiple of y, quotient < 2^53
    return (
        F.when(den.cast("long") == 0, F.lit(None))
        .otherwise(q / F.lit(float(p)))
        .cast("double")
        .alias(alias)
    )


def duck_round_div(num: str, den: str, scale: int = 2) -> str:
    p = 10**scale
    return (
        f"CAST(CASE WHEN ({den}) = 0 THEN NULL ELSE "
        f"((2 * CAST({num} AS BIGINT) * {p} + CAST({den} AS BIGINT))"
        f" // (2 * CAST({den} AS BIGINT))) / {p}.0 END AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# Exact decimal sums / averages
# ---------------------------------------------------------------------------
def sum_cents(c: str | Column) -> Column:
    """Exact SUM of a 2-dp money column, in integer cents."""
    return F.sum(col_of(c).cast(DEC) * 100).cast("long")


def duck_sum_cents(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,2)) * 100) AS BIGINT)"


def dec_sum(c: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum, rounded, emitted as double."""
    return F.round(F.sum(col_of(c).cast(DEC)), scale).cast("double").alias(alias)


def dec_avg(c: str | Column, alias: str, scale: int = 2) -> Column:
    """AVG of a money column: exact cents sum / (100·count), HALF_UP."""
    cc = col_of(c)
    return round_div(sum_cents(cc), F.count(cc) * 100, alias, scale)


def duck_dec_avg(c: str, scale: int = 2) -> str:
    return duck_round_div(duck_sum_cents(c), f"COUNT({c}) * 100", scale)


# ---------------------------------------------------------------------------
# Misc aggregates
# ---------------------------------------------------------------------------
def rnd(c: Column, alias: str, scale: int = 2) -> Column:
    """ROUND emitted as double — only for irrational-valued stats or
    values already exact at `scale` (see module docstring)."""
    return F.round(c, scale).cast("double").alias(alias)


def bool_sum(c: str | Column, alias: str) -> Column:
    """SUM over a boolean flag (MySQL sums booleans natively; Spark
    needs the int cast — SURVEY §7.10)."""
    return F.sum(col_of(c).cast("int")).alias(alias)


def count_if(cond: Column, alias: str) -> Column:
    """COUNT(CASE WHEN cond THEN 1 END) — conditional aggregation (A5)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)


def pct(num: Column, den: Column, alias: str, scale: int = 2) -> Column:
    """`num * 100.0 / den` rate arithmetic (F12) over integer counts,
    exact HALF_UP via round_div."""
    return round_div(num * 100, den, alias, scale)


def duck_pct(num: str, den: str, scale: int = 2) -> str:
    return duck_round_div(f"({num}) * 100", den, scale)


def lng(c: Column, alias: str) -> Column:
    return c.cast("long").alias(alias)
