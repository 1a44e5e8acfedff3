"""Declarative data-quality expectations — the generic rules engine
behind the reference's hard-coded quality scoring
(healthcare-data-pipeline-main.py:216-265 transform-time validity,
healthcare-sql-analytics.sql:700-779 audit queries).

A rule set compiles into ONE projection + aggregation pass over the
table (every row-level rule is a `SUM(CASE WHEN violated)` column —
no per-rule scans), plus one tiny aggregate per uniqueness rule and
one key-distinct anti-join per referential rule, all UNION'd into a
uniform report: (rule, n_rows, n_violations, pass).

Row-level rules are plain Column predicates, so the engine is open:
anything expressible in Catalyst is a rule. NULL semantics: a NULL
value VIOLATES not_null and SATISFIES nothing else by default — each
factory states its treatment, mirroring SQL three-valued logic
explicitly instead of letting `NOT (NULL > 0)` decide silently.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violated: Column  # boolean: true when the ROW breaks the rule


def expect_not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNull())


def expect_in_range(col: str, lo, hi) -> Rule:
    """NULL passes (pair with expect_not_null to forbid NULLs)."""
    c = F.col(col)
    return Rule(
        f"{col}_in_range",
        c.isNotNull() & ~((c >= F.lit(lo)) & (c <= F.lit(hi))),
    )


def expect_in_set(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_in_set", c.isNotNull() & ~c.isin(values))


def expect_regex(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"{col}_regex", c.isNotNull() & ~c.rlike(pattern))


def validate_rows(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All row-level rules in one scan: (rule, n_rows, n_violations,
    pass). `pass` is true iff no row violates."""
    if not rules:
        raise ValueError("validate_rows requires at least one rule")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[
            F.sum(r.violated.cast("int")).cast("long").alias(f"__v_{i}")
            for i, r in enumerate(rules)
        ],
    )
    per_rule = [
        agg.select(
            F.lit(r.name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.coalesce(F.col(f"__v_{i}"), F.lit(0)).alias("n_violations"),
        )
        for i, r in enumerate(rules)
    ]
    out = per_rule[0]
    for p in per_rule[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("n_violations") == 0)


def validate_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness over a key: violations = rows beyond the first per
    duplicate key (so a clean table reports 0). NULL keys count like
    any other key value."""
    name = "_".join(cols) + "_unique"
    # COALESCE both sums: an empty input has zero groups, so the
    # outer SUMs are NULL — report 0/0/pass like validate_rows does
    agg = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c")).agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
        .cast("long")
        .alias("n_violations"),
    )
    return agg.select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def validate_ref(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Referential integrity: rows whose non-NULL `col` has no match
    in `dim.dim_col` (NULL foreign keys pass — add expect_not_null to
    forbid them). The dim side reduces to distinct keys first, so the
    anti-join is key-sized."""
    name = f"{col}_ref_{dim_col}"
    keys = dim.select(F.col(dim_col).alias("__k")).distinct()
    marked = df.select(col).join(
        keys, F.col(col) == F.col("__k"), "left"
    )
    return marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            (F.col(col).isNotNull() & F.col("__k").isNull()).cast("int")
        )
        .cast("long")
        .alias("n_violations"),
    ).select(
        F.lit(name).alias("rule"),
        "n_rows",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("pass"),
    )
