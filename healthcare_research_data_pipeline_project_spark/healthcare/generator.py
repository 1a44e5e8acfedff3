"""Spark-native synthetic data generator — distribution parity with the
reference's seeded numpy generator (`healthcare-data-pipeline-main.py:
548-604`: choice-with-p, Poisson(3), Gamma(2, 2000), Normal(100, 20),
date ranges), re-expressed as Catalyst expressions.

Distributed by construction: `spark.range(n)` partitions the id space;
every attribute is a pure hash of (id, salt) — no RNG state, no
driver-side loops (the reference builds pandas frames in-process),
identical output at any partitioning/parallelism. At 100 TB-scale you
generate directly into partitioned parquet without materializing
anything on the driver.

Inverse-CDF sampling:
- categorical-with-p: `F.when` ladder over a uniform.
- Poisson(λ=3): precomputed CDF ladder (exact to the 10^-6 tail).
- Gamma(k=2, θ): −θ·(ln u1 + ln u2) (sum of two exponentials).
- Normal(μ, σ): Box-Muller from two uniforms.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
_U_MOD = 1 << 30


def _uniform(id_col: Column, salt: str, seed: int = SEED) -> Column:
    """Deterministic uniform in (0, 1): md5-derived, partition-proof."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(id_col.cast("string"), F.lit(f"#{salt}#{seed}"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(_U_MOD)) + 1) / F.lit(float(_U_MOD + 1))


def _choice(u: Column, values: list[str | None], probs: list[float]) -> Column:
    """Categorical sample via inverse CDF (reference's np.random.choice
    with p=…)."""
    acc, expr = 0.0, None
    for v, p in zip(values[:-1], probs[:-1]):
        acc += p
        lit = F.lit(v) if v is not None else F.lit(None)
        expr = F.when(u < acc, lit) if expr is None else expr.when(u < acc, lit)
    last = values[-1]
    return expr.otherwise(F.lit(last) if last is not None else F.lit(None))


def _poisson(u: Column, lam: float = 3.0, max_k: int = 15) -> Column:
    """Inverse-CDF Poisson(λ) as a when-ladder."""
    cdf, term = 0.0, math.exp(-lam)
    expr = None
    for k in range(max_k):
        cdf += term
        expr = F.when(u < cdf, k) if expr is None else expr.when(u < cdf, k)
        term *= lam / (k + 1)
    return expr.otherwise(max_k).cast("int")


def _gamma2(u1: Column, u2: Column, theta: float) -> Column:
    """Gamma(k=2, θ) = −θ (ln u1 + ln u2)."""
    return -F.lit(theta) * (F.log(u1) + F.log(u2))


def _normal(u1: Column, u2: Column, mu: float, sigma: float) -> Column:
    """Box-Muller."""
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    return F.lit(mu) + F.lit(sigma) * z


def generate_patients(spark: SparkSession, n: int = 1000, seed: int = SEED) -> DataFrame:
    """Raw patients, FIXTURES.md §1.1 shape (pre-ETL: birth_date,
    M/F/O gender codes, unmasked ssn/phone)."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "patient_id")
    pid = F.col("patient_id")
    u = lambda s: _uniform(pid, s, seed)  # noqa: E731
    days = 23741  # 1940-01-01 .. 2005-01-01
    return df.select(
        pid,
        F.format_string("MRN%06d", pid).alias("mrn"),
        F.date_add(F.lit("1940-01-01").cast("date"), (u("bd") * days).cast("int")).alias(
            "birth_date"
        ),
        _choice(u("g"), ["M", "F", "O"], [0.48, 0.48, 0.04]).alias("gender"),
        _choice(
            u("r"),
            ["White", "Black", "Asian", "Hispanic", "Other"],
            [0.6, 0.13, 0.06, 0.18, 0.03],
        ).alias("race"),
        _choice(u("e"), ["Hispanic", "Non-Hispanic"], [0.18, 0.82]).alias("ethnicity"),
        F.format_string(
            "%03d-%02d-%04d",
            (u("s1") * 900 + 100).cast("int"),
            (u("s2") * 99).cast("int"),
            (u("s3") * 9999).cast("int"),
        ).alias("ssn"),
        F.format_string(
            "%03d-%03d-%04d",
            (u("p1") * 800 + 200).cast("int"),
            (u("p2") * 999).cast("int"),
            (u("p3") * 9999).cast("int"),
        ).alias("phone"),
    )


def generate_encounters(
    spark: SparkSession, n: int = 5000, n_patients: int = 1000, seed: int = SEED
) -> DataFrame:
    """Raw encounters, FIXTURES.md §1.2 shape (Poisson LOS, Gamma
    charges, 2024 date spread, derived discharge_date)."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "encounter_id")
    eid = F.col("encounter_id")
    u = lambda s: _uniform(eid, s, seed)  # noqa: E731
    enc_date = F.to_timestamp(
        F.date_add(F.lit("2024-01-01").cast("date"), (u("d") * 365).cast("int"))
    )
    los = _poisson(u("los"), 3.0)
    return df.select(
        eid,
        (1 + (u("pid") * n_patients).cast("long")).alias("patient_id"),
        enc_date.alias("encounter_date"),
        _choice(u("t"), ["Inpatient", "Outpatient", "Emergency"], [0.2, 0.6, 0.2]).alias(
            "encounter_type"
        ),
        _choice(
            u("dx"), ["I10", "E11.9", "J44.1", "N18.3", "F32.9"], [0.2] * 5
        ).alias("diagnosis_code"),
        _choice(
            u("pc"),
            ["99213", "99214", "99285", "99232", None],
            [0.3, 0.3, 0.2, 0.15, 0.05],
        ).alias("procedure_code"),
        los.alias("length_of_stay"),
        F.round(_gamma2(u("c1"), u("c2"), 2000.0), 2).alias("total_charges"),
        (u("re") < 0.15).alias("readmission_flag"),
        (enc_date + F.make_dt_interval(days=los)).alias("discharge_date"),
    )


def generate_labs(
    spark: SparkSession, n: int = 10000, n_encounters: int = 5000, seed: int = SEED
) -> DataFrame:
    """Raw lab results, FIXTURES.md §1.3 shape (Normal(100, 20) values)."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "result_id")
    rid = F.col("result_id")
    u = lambda s: _uniform(rid, s, seed)  # noqa: E731
    return df.select(
        rid,
        (1 + (u("eid") * n_encounters).cast("long")).alias("encounter_id"),
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (u("d") * 365).cast("int"))
        ).alias("lab_date"),
        _choice(
            u("n"), ["Glucose", "Creatinine", "Hemoglobin", "WBC", "Platelet"], [0.2] * 5
        ).alias("lab_name"),
        F.round(_normal(u("v1"), u("v2"), 100.0, 20.0), 3).alias("lab_value"),
        F.lit("mg/dL").alias("lab_units"),
        F.lit(70.0).alias("reference_range_low"),
        F.lit(130.0).alias("reference_range_high"),
        (u("a") < 0.2).alias("abnormal_flag"),
    )
