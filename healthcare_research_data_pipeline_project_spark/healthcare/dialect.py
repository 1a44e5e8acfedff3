"""SQL dialect abstraction: one logical query text, two renderings.

Every healthcare-layer statement is written once against this tiny
interface and rendered for Spark SQL and for DuckDB. The fragments
are chosen so both engines compute *bit-identical* values:

- `hmod`: md5-derived pseudo-random integer in [0, mod) — the engine-
  portable deterministic RNG used for all synthesized attributes.
- `rdiv`: exact HALF_UP rounding of integer ratios in BIGINT
  arithmetic (see functions/helpers.py for why plain ROUND diverges).
- dates/percentiles: per-dialect function-name differences only.
"""

from __future__ import annotations


class Dialect:
    name = "base"

    def str_cast(self, expr: str) -> str:
        raise NotImplementedError

    def hmod(self, expr: str, salt: str, mod: str | int) -> str:
        """Deterministic hash of `expr` (any type) into [0, mod)."""
        raise NotImplementedError

    def rdiv(self, num: str, den: str, scale: int = 2) -> str:
        """Exact HALF_UP(num/den, scale) for non-negative int exprs."""
        raise NotImplementedError

    def datediff_day(self, start: str, end: str) -> str:
        raise NotImplementedError

    def month_key(self, d: str) -> str:
        """'yyyy-MM' month bucket of a date/timestamp expression."""
        raise NotImplementedError

    def date_series(self, start: str, end: str) -> str:
        """SELECT yielding one `full_date` DATE row per day in range."""
        raise NotImplementedError

    def pctile(self, col: str, frac: float) -> str:
        raise NotImplementedError

    def argmax(self, val: str, key: str) -> str:
        """Value of `val` on the row where `key` is maximal (an
        aggregate — at scale this beats a ROW_NUMBER()=1 window:
        partial aggregation combines map-side, shuffling one row per
        (partition, group) instead of every ranked row, and no sort).
        `key` must be a single orderable expression; pack composite
        orderings into one BIGINT (DuckDB's arg_max takes no struct
        key). Ties: undefined — give every row a unique key."""
        raise NotImplementedError

    def broadcast_hint(self, *aliases: str) -> str:
        """Spark `/*+ BROADCAST(a, b) */` join hint; empty for engines
        whose optimizer needs no nudge (DuckDB joins tiny aggregates
        hash-side automatically). Semantics-neutral by construction —
        hints never change results, only the physical join strategy."""
        return ""


class SparkDialect(Dialect):
    name = "spark"

    def str_cast(self, expr: str) -> str:
        return f"CAST({expr} AS STRING)"

    def hmod(self, expr: str, salt: str, mod: str | int) -> str:
        s = self.str_cast(expr)
        return (
            f"pmod(cast(conv(substring(md5(concat({s}, '#{salt}')), 1, 8), 16, 10)"
            f" as bigint), {mod})"
        )

    def rdiv(self, num: str, den: str, scale: int = 2) -> str:
        p = 10**scale
        return (
            f"CAST(CASE WHEN ({den}) = 0 THEN NULL ELSE "
            f"((2 * CAST({num} AS BIGINT) * {p} + CAST({den} AS BIGINT))"
            f" div (2 * CAST({den} AS BIGINT))) / {p}.0 END AS DOUBLE)"
        )

    def datediff_day(self, start: str, end: str) -> str:
        return f"datediff({end}, {start})"

    def month_key(self, d: str) -> str:
        return f"date_format({d}, 'yyyy-MM')"

    def date_series(self, start: str, end: str) -> str:
        return (
            f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'),"
            f" interval 1 day)) AS full_date"
        )

    def pctile(self, col: str, frac: float) -> str:
        # exact percentile() — safe for the warehouse callers because
        # every percentiled column is domain-bounded (LOS/duration
        # MINUTES, integer lab grades): the aggregate's value->count
        # buffer caps at the domain size, not the fact count.
        # Near-unique measures belong in
        # operators.scale.exact_percentiles_multi instead.
        return f"percentile({col}, {frac})"

    def argmax(self, val: str, key: str) -> str:
        return f"max_by({val}, {key})"

    def broadcast_hint(self, *aliases: str) -> str:
        return f"/*+ BROADCAST({', '.join(aliases)}) */ "


class DuckDialect(Dialect):
    name = "duckdb"

    def str_cast(self, expr: str) -> str:
        return f"CAST({expr} AS VARCHAR)"

    def hmod(self, expr: str, salt: str, mod: str | int) -> str:
        s = self.str_cast(expr)
        return (
            f"(CAST('0x' || substr(md5({s} || '#{salt}'), 1, 8) AS BIGINT)"
            f" % ({mod}))"
        )

    def rdiv(self, num: str, den: str, scale: int = 2) -> str:
        p = 10**scale
        return (
            f"CAST(CASE WHEN ({den}) = 0 THEN NULL ELSE "
            f"((2 * CAST({num} AS BIGINT) * {p} + CAST({den} AS BIGINT))"
            f" // (2 * CAST({den} AS BIGINT))) / {p}.0 END AS DOUBLE)"
        )

    def datediff_day(self, start: str, end: str) -> str:
        return f"datediff('day', {start}, {end})"

    def month_key(self, d: str) -> str:
        return f"strftime({d}, '%Y-%m')"

    def date_series(self, start: str, end: str) -> str:
        return (
            f"SELECT CAST(unnest(generate_series(DATE '{start}', DATE '{end}',"
            f" INTERVAL 1 DAY)) AS DATE) AS full_date"
        )

    def pctile(self, col: str, frac: float) -> str:
        return f"PERCENTILE_CONT({frac}) WITHIN GROUP (ORDER BY {col})"

    def argmax(self, val: str, key: str) -> str:
        return f"arg_max({val}, {key})"


SPARK = SparkDialect()
DUCK = DuckDialect()
