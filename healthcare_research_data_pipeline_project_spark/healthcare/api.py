"""Query-builder API layer — parity with the reference's REST handlers
(`healthcare-api-main.py:236-388`), minus the HTTP scaffolding: each
endpoint's lazily-composed ORM query becomes a lazily-composed
DataFrame builder (identical semantics — both accumulate an unexecuted
plan, J8/P2-P5/P11 in SURVEY §2), and the reference's driver-side
post-aggregation (distribution percentages, rate math,
healthcare-api-main.py:323-331,527-576) moves *into* the plan so only
final small results are collected.

Frames use the raw generator shape (generator.py): patients with
birth_year (post-ETL), encounters with encounter_date/diagnosis_code.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.helpers import pct, rnd
from ..operators.relational import distribution_pct

SEARCH_LIMIT = 1000  # reference healthcare-api-main.py:268


def search_patients(
    patients: DataFrame,
    encounters: DataFrame | None = None,
    gender: str | None = None,
    race: str | None = None,
    min_age: int | None = None,
    max_age: int | None = None,
    diagnosis_codes: list[str] | None = None,
    current_year: int | None = None,
    limit: int = SEARCH_LIMIT,
) -> DataFrame:
    """Demographic cohort search (reference `:236-268`): conditional
    equality/range filters, a dynamic join applied only when the
    diagnosis filter is present (J8), and a result cap (P11)."""
    year = current_year or dt.date.today().year
    q = patients
    if gender is not None:
        q = q.filter(F.col("gender") == gender)
    if race is not None:
        q = q.filter(F.col("race") == race)
    if min_age is not None:
        q = q.filter(F.col("birth_year") <= year - min_age)
    if max_age is not None:
        q = q.filter(F.col("birth_year") >= year - max_age)
    if diagnosis_codes:
        if encounters is None:
            raise ValueError("diagnosis filter requires the encounters frame")
        dx = (
            encounters.filter(F.col("diagnosis_code").isin(diagnosis_codes))
            .select("patient_id")
            .distinct()
        )
        q = q.join(dx, "patient_id", "left_semi")
    return q.limit(limit)


def search_demographics(cohort: DataFrame) -> dict:
    """The endpoint's response shape: count + in-plan distributions
    (the reference computes these driver-side over collected rows,
    `:527-576`)."""
    n = cohort.count()
    return {
        "count": n,
        "demographics": {
            "gender_distribution": {
                r["gender"]: r["pct"]
                for r in distribution_pct(cohort, "gender").collect()
            },
            "race_distribution": {
                r["race"]: r["pct"]
                for r in distribution_pct(cohort, "race").collect()
            },
        },
    }


def encounter_metrics(
    encounters: DataFrame,
    start_date: str,
    end_date: str,
    group_by: str = "month",
    encounter_type: str | None = None,
) -> DataFrame:
    """Per-period utilization metrics (reference `:291-340`):
    date_trunc grouping ∈ {day, week, month, quarter}, date-range
    predicate, optional type filter, rate arithmetic in-plan."""
    if group_by not in ("day", "week", "month", "quarter"):
        raise ValueError(f"unsupported group_by {group_by!r}")
    q = encounters.filter(
        F.col("encounter_date").between(start_date, end_date)
    )
    if encounter_type is not None:
        q = q.filter(F.col("encounter_type") == encounter_type)
    return (
        q.groupBy(F.date_trunc(group_by, "encounter_date").alias("period"))
        .agg(
            F.count(F.lit(1)).alias("encounters"),
            rnd(F.avg("length_of_stay"), "average_los"),
            rnd(F.avg("total_charges"), "average_charges"),
            pct(
                F.sum(F.col("readmission_flag").cast("int")),
                F.count(F.lit(1)),
                "readmission_rate",
            ),
        )
        .orderBy("period")
    )


def quality_metrics(
    encounters: DataFrame,
    labs: DataFrame,
    start_date: str,
    end_date: str,
) -> dict:
    """Composite quality snapshot (reference `:342-388`): readmission
    rate, mean LOS, abnormal-lab rate over a reporting window — three
    small aggregates, collected once."""
    e = encounters.filter(F.col("encounter_date").between(start_date, end_date))
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        pct(
            F.sum(F.col("readmission_flag").cast("int")),
            F.count(F.lit(1)),
            "readmission_rate",
        ),
        rnd(F.avg("length_of_stay"), "avg_los"),
    ).collect()[0]
    lab_row = labs.agg(
        pct(
            F.sum(F.col("abnormal_flag").cast("int")),
            F.count(F.lit(1)),
            "abnormal_rate",
        )
    ).collect()[0]
    return {
        "period": {"start": start_date, "end": end_date},
        "total_encounters": row["n"],
        "readmission_rate_pct": row["readmission_rate"],
        "average_length_of_stay": row["avg_los"],
        "abnormal_lab_rate_pct": lab_row["abnormal_rate"],
    }


# ---------------------------------------------------------------------------
# Endpoint-equivalent compositions (reference healthcare-api-main.py
# :391-431 RCA, :470-498 health, :500-545 status): the auth / rate /
# cache / audit decorator stack as explicit function plumbing over the
# same engine-side primitives.
# ---------------------------------------------------------------------------
def run_rca_cached(
    encounters: DataFrame,
    labs: DataFrame,
    token_payload: dict,
    limiter,
    cache,
    analysis_type: str = "readmissions",
    time_period_days: int = 365,
    client_key: str = "default",
) -> list[dict]:
    """The /analytics/rca endpoint flow (reference `:391-431`):
    role check → rate limit → cache probe → analysis → cache store.
    Returns the readmission-factor records; raises
    `InsufficientRoleError` / `RateLimitExceededError` /
    `NotImplementedError` exactly where the endpoint returns
    403 / 429 / 501."""
    from ..sources.sinks import to_records
    from . import rca
    from .security import require_role

    require_role(token_payload, ["researcher", "analyst"])
    limiter.check(f"rate_limit:{client_key}:run_root_cause_analysis")
    key = f"rca:{analysis_type}:{time_period_days}"
    hit = cache.get(key)
    if hit is not None:
        return hit
    if analysis_type != "readmissions":
        raise NotImplementedError(
            f"Analysis type '{analysis_type}' not yet implemented"
        )
    result = to_records(
        rca.readmission_analysis(encounters, labs).orderBy(
            F.desc("readmission_count"), "diagnosis_code"
        ),
        limit=SEARCH_LIMIT,
    )
    cache.put(key, result)
    return result


def health_check(spark) -> dict:
    """The /health probe (reference `:470-498`): execute a trivial
    engine statement; degraded — not raised — on failure."""
    out = {"status": "healthy", "services": {}}
    try:
        spark.sql("SELECT 1").collect()
        out["services"]["engine"] = "healthy"
    except Exception:
        out["services"]["engine"] = "unhealthy"
        out["status"] = "degraded"
    return out


def system_status(
    patients: DataFrame,
    encounters: DataFrame,
    labs: DataFrame,
    token_payload: dict,
    cache=None,
) -> dict:
    """The admin-only /status endpoint (reference `:500-545`): table
    row counts + cache stats. Counts are three count-star aggregates —
    metadata-cheap on columnar sources at any scale."""
    from .security import require_role

    require_role(token_payload, ["admin"])
    return {
        "database": {
            "total_patients": patients.count(),
            "total_encounters": encounters.count(),
            "total_lab_results": labs.count(),
        },
        "cache": {"keys": len(cache._store) if cache is not None else 0},
    }
