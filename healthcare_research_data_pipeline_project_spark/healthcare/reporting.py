"""Reporting service — parity with the reference's ReportingService
(`healthcare-data-pipeline-main.py:371-489`): executive summary,
demographic distributions, daily-volume stats. Each report is one
DataFrame plan; the reference's four separate DB round-trips become
four Spark jobs over the same cached warehouse."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.helpers import count_if, pct, rnd
from ..operators.relational import bucketize, distribution_pct

AGE_BUCKETS = ([18, 31, 46, 61, 76], ["0-17", "18-30", "31-45", "46-60", "61-75", "76+"])


def executive_summary(encounters: DataFrame) -> DataFrame:
    """Counts / LOS / readmission-rate / charges one-pass summary
    (reference `:393-414`)."""
    return encounters.agg(
        F.countDistinct("patient_id").alias("total_patients"),
        F.countDistinct("encounter_id").alias("total_encounters"),
        rnd(F.avg("length_of_stay"), "avg_length_of_stay"),
        pct(
            F.sum(F.col("readmission_flag").cast("int")),
            F.count(F.lit(1)),
            "readmission_rate_pct",
        ),
        rnd(F.avg("total_charges"), "avg_charges"),
    )


def encounters_by_type(encounters: DataFrame) -> DataFrame:
    """Department/type utilization (reference `:418-427`)."""
    return encounters.groupBy("encounter_type").agg(
        F.count(F.lit(1)).alias("encounter_count"),
        rnd(F.avg("length_of_stay"), "avg_los"),
        rnd(F.avg("total_charges"), "avg_charges"),
        count_if(F.col("readmission_flag"), "readmissions"),
    )


def demographic_distribution(patients: DataFrame, col: str) -> DataFrame:
    """Gender/race %-distribution (reference API `_calculate_distribution`,
    healthcare-api-main.py:527-542) — in-plan, not driver-side."""
    return distribution_pct(patients, col)


def age_distribution(patients: DataFrame, current_year: int = 2025) -> DataFrame:
    """Fixed-range age histogram (healthcare-api-main.py:544-576)."""
    ages = patients.select(
        (F.lit(current_year) - F.col("birth_year")).alias("age")
    )
    bucketed = ages.select(
        bucketize(F.col("age"), list(AGE_BUCKETS[0]), list(AGE_BUCKETS[1])).alias(
            "age_group"
        )
    )
    return distribution_pct(bucketed, "age_group")


def daily_volume_stats(encounters: DataFrame) -> DataFrame:
    """Daily patient volume + variance (reference `:459-478`): day
    truncation, per-day counts, global mean/stddev of the daily
    series."""
    daily = encounters.groupBy(
        F.to_date("encounter_date").alias("day")
    ).agg(F.count(F.lit(1)).alias("daily_encounters"))
    return daily.agg(
        F.count(F.lit(1)).alias("days_observed"),
        rnd(F.avg("daily_encounters"), "avg_daily_volume"),
        rnd(F.stddev("daily_encounters"), "std_daily_volume"),
        F.max("daily_encounters").alias("peak_daily_volume"),
    )
