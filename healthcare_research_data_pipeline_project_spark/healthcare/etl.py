"""ETL transformations — parity with the reference's ETLPipeline
(`healthcare-data-pipeline-main.py:205-258`), expressed as single-pass
Catalyst plans.

The reference transforms a pandas frame in-process; these operate on
DataFrames of any size (quality metrics are one `.agg()` pass —
no per-column scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GENDER_MAP = {"M": "Male", "F": "Female", "O": "Other"}


def transform_patient_data(df: DataFrame) -> DataFrame:
    """birth_date → birth_year (dropped), gender recode with Unknown
    default (reference `:211-231`, F9/F14/P1)."""
    recode = F.create_map(
        *[F.lit(x) for kv in GENDER_MAP.items() for x in kv]
    )
    out = df
    if "birth_date" in df.columns:
        out = out.withColumn("birth_year", F.year("birth_date")).drop("birth_date")
    if "gender" in df.columns:
        out = out.withColumn(
            "gender", F.coalesce(recode[F.col("gender")], F.lit("Unknown"))
        )
    return out


def quality_metrics(df: DataFrame, numeric_cols: list[str] | None = None) -> dict:
    """completeness / validity / overall ∈ [0,1] (reference `:233-258`):
    completeness = non-null cells / cells; validity = IQR-inlier
    fraction over numeric columns (1.5·IQR fences, exact quartiles);
    overall = mean of the two. One aggregate pass for the null scan,
    one `approxQuantile` (rel-err 0 ⇒ exact) per numeric column."""
    cols = df.columns
    n = df.count()
    if n == 0:
        return {"completeness": 0.0, "validity": 0.0, "overall": 0.0}
    null_counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("int")).alias(c) for c in cols]
    ).collect()[0]
    total_cells = n * len(cols)
    completeness = (total_cells - sum(null_counts[c] for c in cols)) / total_cells

    numeric_cols = numeric_cols or [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "decimal")
    ]
    if not numeric_cols:
        validity = 1.0
    else:
        ratios = []
        for c in numeric_cols:
            q1, q3 = df.stat.approxQuantile(c, [0.25, 0.75], 0.0)
            lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
            inliers = df.filter(F.col(c).between(lo, hi)).count()
            non_null = n - null_counts[c]
            ratios.append(inliers / non_null if non_null else 1.0)
        validity = sum(ratios) / len(ratios)

    return {
        "completeness": round(completeness, 4),
        "validity": round(validity, 4),
        "overall": round((completeness + validity) / 2, 4),
    }
