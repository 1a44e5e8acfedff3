"""The reference's 10 advanced analytics queries
(healthcare-sql-analytics.sql:141-779), ported onto the mapped
warehouse (mapping.py) as dialect-templated single statements.

Port notes (SURVEY §7 watch list applied):
- EXISTS-as-SELECT-column kept (Spark 4 supports it); the *nested*
  correlated aggregate subqueries (sepsis first-antibiotic, Q4/Q5/Q7
  per-entity counts, correlated ORDER BY…LIMIT 1) are pre-rewritten as
  explicit aggregate CTEs + joins — deterministic, decorrelation-proof,
  and the scalable plan shape (grouped partial aggregates instead of
  per-row subquery execution).
- SUM(boolean) → SUM(CASE WHEN…) (§7.10).
- Hardcoded year 2024 → ANALYSIS_YEAR (2000 in the mapped calendar);
  the 2025 age anchor is kept; CURRENT_DATE → ANCHOR_DATE (§7.8).
- All integer/decimal ratio outputs use the dialect's exact `rdiv`;
  STDDEV outputs use plain ROUND (irrational-valued — §helpers).
- Q6 window AVG/STDDEV OVER (PARTITION BY category) → groupBy stats +
  join-back: identical semantics, no whole-partition sort at scale.
- Q8's TIMESTAMPDIFF over date+hour concat → pure integer arithmetic
  on day-grain time_ids and the hour column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries import register
from .dialect import DUCK, SPARK, Dialect
from .mapping import (
    AGE_ANCHOR,
    ANALYSIS_YEAR,
    ANCHOR_DATE,
    RESULT_ID_PACK,
    ensure_warehouse,
    query_with,
    with_clause,
)

CENTS = "SUM(CAST(total_charges * 100 AS BIGINT))"


def q1_readmission(d: Dialect) -> str:
    # The reference's correlated scalar subqueries (abnormal-lab count,
    # medication count — healthcare-sql-analytics.sql:172-184) are
    # pre-rewritten as per-encounter aggregate CTEs + left joins: the
    # plan Catalyst's decorrelation produces anyway, but stated
    # explicitly (one scan per fact, grouped partial aggregation). The
    # 30-day EXISTS stays an EXISTS — a banded semi-join on patient_id
    # is its natural plan shape.
    ctes = [
        (
            "lab_cnt",
            """
            SELECT encounter_id,
                   COUNT(DISTINCT lab_test_code) AS abnormal_lab_count
            FROM fact_lab_results
            WHERE abnormal_flag IN ('H', 'HH', 'L', 'LL')
            GROUP BY encounter_id
            """,
        ),
        (
            "med_cnt",
            """
            SELECT encounter_id,
                   COUNT(DISTINCT medication_id) AS medication_count
            FROM fact_medication_orders
            GROUP BY encounter_id
            """,
        ),
        (
            "ReadmissionAnalysis",
            f"""
            SELECT d.category AS diagnosis_category,
                   CASE WHEN {AGE_ANCHOR} - p.birth_year < 65 THEN 'Under 65'
                        WHEN {AGE_ANCHOR} - p.birth_year BETWEEN 65 AND 79 THEN '65-79'
                        ELSE '80+' END AS age_group,
                   e.length_of_stay, e.icu_days, e.total_charges,
                   CASE WHEN EXISTS (
                       SELECT 1 FROM fact_encounters e2
                       WHERE e2.patient_id = e.patient_id
                         AND e2.encounter_id != e.encounter_id
                         AND e2.admission_time_id BETWEEN e.discharge_time_id
                             AND e.discharge_time_id + 30
                   ) THEN 1 ELSE 0 END AS readmitted_30day,
                   COALESCE(lc.abnormal_lab_count, 0) AS abnormal_lab_count,
                   COALESCE(mc.medication_count, 0) AS medication_count
            FROM fact_encounters e
            JOIN dim_patient p ON e.patient_id = p.patient_id
            JOIN dim_diagnosis d ON e.primary_diagnosis_id = d.diagnosis_id
            JOIN dim_time t ON e.discharge_time_id = t.time_id
            LEFT JOIN lab_cnt lc ON e.encounter_id = lc.encounter_id
            LEFT JOIN med_cnt mc ON e.encounter_id = mc.encounter_id
            WHERE t.year = {ANALYSIS_YEAR}
              AND e.encounter_type = 'Inpatient'
              AND e.mortality_flag = FALSE
            """,
        ),
    ]
    select = f"""
        SELECT diagnosis_category, age_group,
               CAST(COUNT(*) AS BIGINT) AS total_discharges,
               CAST(SUM(readmitted_30day) AS BIGINT) AS readmissions,
               {d.rdiv('SUM(readmitted_30day) * 100', 'COUNT(*)', 2)} AS readmission_rate,
               {d.rdiv('SUM(length_of_stay)', 'COUNT(*)', 1)} AS avg_los,
               {d.rdiv('SUM(icu_days)', 'COUNT(*)', 1)} AS avg_icu_days,
               {d.rdiv('SUM(abnormal_lab_count)', 'COUNT(*)', 1)} AS avg_abnormal_labs,
               {d.rdiv('SUM(medication_count)', 'COUNT(*)', 1)} AS avg_medications,
               {d.rdiv(CENTS, 'COUNT(*) * 100', 0)} AS avg_charges,
               CAST(ROUND(STDDEV(length_of_stay), 2) AS DOUBLE) AS los_std_dev
        FROM ReadmissionAnalysis
        GROUP BY diagnosis_category, age_group
        HAVING COUNT(*) >= 30
    """
    return ctes, select


def q2_sepsis(d: Dialect) -> str:
    # The reference expresses each bundle element as a correlated EXISTS
    # (healthcare-sql-analytics.sql:233-278), which decorrelates into one
    # fact rescan per element. Every element is equivalent to a
    # per-encounter MIN/MAX: EXISTS(lact row with t <= first+3) ⟺
    # MIN(lact time) <= first+3, etc. — so the whole bundle is two
    # single-scan conditional aggregations (one per fact) left-joined to
    # the cohort, and the flags become NULL-safe column comparisons.
    ctes = [
        (
            "med_mins",
            """
            SELECT mo.encounter_id,
                   MIN(CASE WHEN m.medication_class = 'Antibiotic'
                            THEN mo.start_time_id END) AS first_abx_time,
                   MAX(CASE WHEN (m.medication_name LIKE '%saline%'
                                  OR m.medication_name LIKE '%lactated ringers%')
                             AND mo.dose_amount >= 30
                            THEN 1 ELSE 0 END) AS fluid_resuscitation
            FROM fact_medication_orders mo
            JOIN dim_medication m ON mo.medication_id = m.medication_id
            GROUP BY mo.encounter_id
            """,
        ),
        (
            # one encounter-grain pass over fact_lab_results computes the
            # cohort filter AND the bundle's lab mins: the reference's
            # standalone lab_mins CTE (mins over ALL of an encounter's
            # lab rows) equals the unconditioned MINs here because the
            # join brings every lab row of the encounter; the original
            # WHERE-then-MIN equals MIN(CASE WHEN qualifies ...) with a
            # HAVING on qualifying-row count. One fewer fact scan + join.
            "SepsisPatients",
            """
            SELECT e.encounter_id, e.patient_id, e.admission_time_id,
                   MIN(CASE WHEN d.icd10_code LIKE 'A41%'
                             OR (lr.lab_test_code IN ('WBC', 'TEMP', 'HR', 'RR')
                                 AND lr.critical_flag = TRUE)
                            THEN lr.lab_time_id END) AS first_abnormal_lab_time,
                   MIN(CASE WHEN lr.lab_test_code = 'LACT'
                            THEN lr.lab_time_id END) AS min_lact_time,
                   MIN(CASE WHEN lr.lab_test_code LIKE 'BLOOD_CX%'
                            THEN lr.lab_time_id END) AS min_bcx_time
            FROM fact_encounters e
            JOIN dim_diagnosis d ON e.primary_diagnosis_id = d.diagnosis_id
            JOIN fact_lab_results lr ON e.encounter_id = lr.encounter_id
            GROUP BY e.encounter_id, e.patient_id, e.admission_time_id
            HAVING SUM(CASE WHEN d.icd10_code LIKE 'A41%'
                             OR (lr.lab_test_code IN ('WBC', 'TEMP', 'HR', 'RR')
                                 AND lr.critical_flag = TRUE)
                            THEN 1 ELSE 0 END) > 0
            """,
        ),
        (
            "BundleCompliance",
            """
            SELECT sp.encounter_id,
                   CASE WHEN sp.min_lact_time
                             <= sp.first_abnormal_lab_time + 3
                        THEN 1 ELSE 0 END AS lactate_measured,
                   CASE WHEN sp.min_bcx_time < mm.first_abx_time
                        THEN 1 ELSE 0 END AS blood_culture_before_abx,
                   CASE WHEN mm.first_abx_time
                             <= sp.first_abnormal_lab_time + 1
                        THEN 1 ELSE 0 END AS antibiotics_within_hour,
                   COALESCE(mm.fluid_resuscitation, 0) AS fluid_resuscitation
            FROM SepsisPatients sp
            LEFT JOIN med_mins mm ON sp.encounter_id = mm.encounter_id
            """,
        ),
    ]
    compliant = ("CASE WHEN lactate_measured = 1 AND blood_culture_before_abx = 1 "
                 "AND antibiotics_within_hour = 1 AND fluid_resuscitation = 1 "
                 "THEN 1 ELSE 0 END")
    select = f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS total_sepsis_patients,
               CAST(SUM(lactate_measured) AS BIGINT) AS lactate_compliant,
               CAST(SUM(blood_culture_before_abx) AS BIGINT) AS culture_compliant,
               CAST(SUM(antibiotics_within_hour) AS BIGINT) AS antibiotic_compliant,
               CAST(SUM(fluid_resuscitation) AS BIGINT) AS fluid_compliant,
               CAST(SUM({compliant}) AS BIGINT) AS fully_compliant,
               {d.rdiv(f'SUM({compliant}) * 100', 'COUNT(*)', 2)} AS bundle_compliance_rate
        FROM BundleCompliance
    """
    return ctes, select


def q3_provider(d: Dialect) -> str:
    ctes = [
        (
            # r5 profile fixes, same doctrine as q4:
            # - COUNT(DISTINCT e.encounter_id) == COUNT(*) at the
            #   fact's unique encounter grain (every joined dim key is
            #   unique), so the alias row_cnt serves both and the
            #   HAVING uses plain COUNT(*) — leaves ONE genuine
            #   distinct (patients), which Spark plans without Expand
            "ProviderMetrics",
            f"""
            SELECT p.provider_id, p.specialty,
                   COUNT(*) AS total_encounters,
                   COUNT(DISTINCT e.patient_id) AS unique_patients,
                   COUNT(*) AS row_cnt,
                   SUM(e.length_of_stay) AS los_sum,
                   SUM(CASE WHEN e.readmission_flag THEN 1 ELSE 0 END) AS readmissions,
                   SUM(CASE WHEN e.mortality_flag THEN 1 ELSE 0 END) AS mortalities,
                   {CENTS} AS charges_cents,
                   SUM(d.severity_deci) AS sev_deci_sum,
                   SUM(CASE WHEN e.discharge_disposition = 'Home' THEN 1 ELSE 0 END)
                     AS home_cnt
            FROM fact_encounters e
            JOIN dim_provider p ON e.provider_id = p.provider_id
            JOIN dim_diagnosis d ON e.primary_diagnosis_id = d.diagnosis_id
            JOIN dim_time t ON e.admission_time_id = t.time_id
            WHERE t.year = {ANALYSIS_YEAR} AND p.is_active = TRUE
            GROUP BY p.provider_id, p.specialty
            HAVING COUNT(*) >= 20
            """,
        ),
        (
            # specialty benchmarks as WINDOW aggregates over the
            # provider-cardinality frame, replacing the reference's
            # second aggregate CTE + join-back: Spark inlines a
            # twice-referenced CTE, which re-ran the whole fact
            # join+aggregate — the window computes the same averages
            # in one pass over ~hundreds of provider rows (a
            # group-cardinality partition, fine at any scale)
            "BenchmarkedMetrics",
            """
            SELECT pm.*,
                   AVG(los_sum * 1.0 / row_cnt)
                     OVER (PARTITION BY specialty) AS specialty_avg_los,
                   AVG(readmissions * 100.0 / total_encounters)
                     OVER (PARTITION BY specialty) AS specialty_readmit_rate,
                   AVG(sev_deci_sum * 1.0 / (10 * row_cnt))
                     OVER (PARTITION BY specialty) AS specialty_avg_severity
            FROM ProviderMetrics pm
            """,
        ),
    ]
    score = """100 - (
        (pm.los_sum * 1.0 / pm.row_cnt) / pm.specialty_avg_los * 25
        + (pm.readmissions * 100.0 / pm.total_encounters)
          / pm.specialty_readmit_rate * 25
        + (100 - pm.home_cnt * 100.0 / pm.row_cnt) / 50 * 25
        + CASE WHEN pm.mortalities > 0 THEN 25 ELSE 0 END
    ) * (pm.specialty_avg_severity / (pm.sev_deci_sum * 1.0 / (10 * pm.row_cnt)))"""
    select = f"""
        SELECT pm.provider_id, pm.specialty,
               CAST(pm.total_encounters AS BIGINT) AS total_encounters,
               CAST(pm.unique_patients AS BIGINT) AS unique_patients,
               {d.rdiv('pm.los_sum', 'pm.row_cnt', 1)} AS provider_avg_los,
               CAST(ROUND(pm.specialty_avg_los, 1) AS DOUBLE) AS specialty_avg_los,
               CAST(ROUND(pm.los_sum * 1.0 / pm.row_cnt - pm.specialty_avg_los, 1)
                    + 0.0 AS DOUBLE) AS los_variance,
               {d.rdiv('pm.readmissions * 100', 'pm.total_encounters', 2)}
                 AS provider_readmit_rate,
               CAST(ROUND(pm.specialty_readmit_rate, 2) AS DOUBLE)
                 AS specialty_readmit_rate,
               {d.rdiv('pm.sev_deci_sum', '10 * pm.row_cnt', 2)} AS case_mix_index,
               {d.rdiv('pm.home_cnt * 100', 'pm.row_cnt', 1)} AS home_discharge_rate,
               {d.rdiv('pm.charges_cents', '100 * pm.row_cnt', 0)} AS avg_charges,
               CAST(ROUND({score}, 1) + 0.0 AS DOUBLE) AS performance_score
        FROM BenchmarkedMetrics pm
    """
    return ctes, select


def q4_chronic(d: Dialect) -> str:
    ctes = [
        (
            # Distinct-aggregate elimination (the r4→r5 profile fix —
            # this CTE's six COUNT(DISTINCT)s made Catalyst Expand the
            # year's encounters 6x before the patient shuffle):
            # - the reference's COUNT(DISTINCT CASE WHEN cond THEN 1
            #   END) flags take values in {0,1} only, so MAX(CASE WHEN
            #   cond THEN 1 ELSE 0 END) is value-identical with no
            #   Expand (healthcare-sql-analytics.sql Q4 semantics)
            # - encounter_id IS fact_encounters' unique grain
            #   (mapping.py:146, one row per o_orderkey) and every
            #   joined dim key is unique, so COUNT(DISTINCT
            #   e.encounter_id) == COUNT(*)
            # One fact_encounters pass serves BOTH the year-scoped
            # chronic population AND the all-time outpatient visit
            # count (the reference's separate correlated subquery):
            # in-year measures gate on yr inside the aggregates, the
            # HAVING reproduces the original inner-join-on-year
            # population, and op_visits drops its own fact scan +
            # patient shuffle. At 100 TB this halves the heaviest
            # stage; the lost year-predicate pushdown costs a wider
            # scan but no extra shuffle.
            "ChronicDiseasePopulation",
            f"""
            SELECT p.patient_id,
                   MAX(CASE WHEN t.year = {ANALYSIS_YEAR}
                            AND d.icd10_code LIKE 'E11%' THEN 1 ELSE 0 END)
                     AS has_diabetes,
                   MAX(CASE WHEN t.year = {ANALYSIS_YEAR}
                            AND d.icd10_code LIKE 'I10%' THEN 1 ELSE 0 END)
                     AS has_hypertension,
                   MAX(CASE WHEN t.year = {ANALYSIS_YEAR}
                            AND d.icd10_code LIKE 'J44%' THEN 1 ELSE 0 END)
                     AS has_copd,
                   MAX(CASE WHEN t.year = {ANALYSIS_YEAR}
                            AND d.icd10_code LIKE 'N18%' THEN 1 ELSE 0 END)
                     AS has_ckd,
                   SUM(CASE WHEN t.year = {ANALYSIS_YEAR} THEN 1 ELSE 0 END)
                     AS total_encounters_year,
                   SUM(CASE WHEN t.year = {ANALYSIS_YEAR}
                       THEN CAST(total_charges * 100 AS BIGINT) END)
                     AS charges_cents_year,
                   SUM(CASE WHEN e.encounter_type = 'Outpatient'
                       THEN 1 ELSE 0 END) AS op_visits
            FROM dim_patient p
            JOIN fact_encounters e ON p.patient_id = e.patient_id
            JOIN dim_diagnosis d ON e.primary_diagnosis_id = d.diagnosis_id
            JOIN dim_time t ON e.admission_time_id = t.time_id
            GROUP BY p.patient_id
            HAVING SUM(CASE WHEN t.year = {ANALYSIS_YEAR} THEN 1 ELSE 0 END) > 0
            """,
        ),
        (
            "a1c_counts",
            f"""
            SELECT lr.patient_id,
                   COUNT(DISTINCT {d.month_key('t.full_date')}) AS a1c_months
            FROM fact_lab_results lr
            JOIN dim_time t ON lr.lab_time_id = t.time_id
            WHERE lr.lab_test_code = 'HBA1C' AND t.year = {ANALYSIS_YEAR}
            GROUP BY lr.patient_id
            """,
        ),
        (
            # the a1c side is a patient-cardinality aggregate —
            # broadcast it so the chronic-population frame never
            # sorts/shuffles into a merge join (Spark's size estimator
            # overshoots the two-level distinct aggregate and picks
            # SMJ without the hint)
            "DiseaseManagement",
            f"""
            SELECT {d.broadcast_hint('ac')}cdp.patient_id,
                   CASE WHEN cdp.has_diabetes > 0 THEN COALESCE(ac.a1c_months, 0)
                        ELSE NULL END AS a1c_tests_count,
                   CASE WHEN cdp.has_hypertension > 0 THEN cdp.op_visits
                        ELSE NULL END AS bp_check_visits,
                   cdp.has_diabetes + cdp.has_hypertension + cdp.has_copd + cdp.has_ckd
                     AS chronic_conditions_count,
                   cdp.total_encounters_year,
                   cdp.charges_cents_year
            FROM ChronicDiseasePopulation cdp
            LEFT JOIN a1c_counts ac ON cdp.patient_id = ac.patient_id
            """,
        ),
    ]
    select = f"""
        SELECT CASE WHEN chronic_conditions_count = 0 THEN 'No Chronic Conditions'
                    WHEN chronic_conditions_count = 1 THEN '1 Chronic Condition'
                    WHEN chronic_conditions_count = 2 THEN '2 Chronic Conditions'
                    ELSE '3+ Chronic Conditions' END AS condition_category,
               CAST(COUNT(*) AS BIGINT) AS patient_count,
               {d.rdiv('SUM(total_encounters_year)', 'COUNT(*)', 1)}
                 AS avg_encounters_per_year,
               {d.rdiv('SUM(charges_cents_year)', 'COUNT(*) * 100', 0)}
                 AS avg_annual_charges,
               CAST(COUNT(CASE WHEN a1c_tests_count >= 2 THEN 1 END) AS BIGINT)
                 AS diabetics_with_adequate_a1c,
               CAST(COUNT(CASE WHEN a1c_tests_count IS NOT NULL THEN 1 END) AS BIGINT)
                 AS total_diabetics,
               CAST(COUNT(CASE WHEN bp_check_visits >= 4 THEN 1 END) AS BIGINT)
                 AS htn_with_adequate_monitoring,
               CAST(COUNT(CASE WHEN bp_check_visits IS NOT NULL THEN 1 END) AS BIGINT)
                 AS total_hypertensive
        FROM DiseaseManagement
        GROUP BY condition_category
    """
    return ctes, select


def q5_surveillance(d: Dialect) -> str:
    ctes = [
        (
            "CurrentInpatients",
            f"""
            SELECT e.encounter_id, e.patient_id, e.admission_time_id,
                   {d.datediff_day('t.full_date', f"DATE '{ANCHOR_DATE}'")}
                     AS days_admitted,
                   (e.icu_days > 0) AS in_icu
            FROM fact_encounters e
            JOIN dim_time t ON e.admission_time_id = t.time_id
            WHERE e.discharge_time_id IS NULL
            """,
        ),
        # One conditional-aggregation scan of each fact, pre-filtered by
        # the (tiny, broadcastable) CurrentInpatients set — the original
        # reference query's cl/pc/fe/wbc subqueries each rescan a fact
        # table (healthcare-sql-analytics.sql:461-487); semantics are
        # identical because every subquery is keyed by encounter_id and
        # COALESCE'd to 0 on miss.
        (
            "cl",
            """
            SELECT mo.encounter_id,
                   COUNT(DISTINCT mo.order_time_id) AS central_line_days
            FROM fact_medication_orders mo
            JOIN CurrentInpatients ci ON mo.encounter_id = ci.encounter_id
            WHERE mo.route = 'Central Line'
            GROUP BY mo.encounter_id
            """,
        ),
        (
            "labstats",
            """
            SELECT lr.encounter_id,
                   COUNT(CASE WHEN lr.lab_test_code LIKE '%CULTURE%'
                               AND lr.result_value > 0
                               AND lr.lab_time_id >= ci.admission_time_id + 2
                              THEN 1 END) AS positive_cultures,
                   COUNT(CASE WHEN lr.lab_test_code = 'TEMP'
                               AND lr.result_value > 38.3
                              THEN 1 END) AS fever_episodes,
                   CASE WHEN MAX(CASE WHEN lr.lab_test_code = 'WBC'
                                       AND lr.lab_time_id >= ci.admission_time_id
                                      THEN lr.result_value END)
                           - MIN(CASE WHEN lr.lab_test_code = 'WBC'
                                       AND lr.lab_time_id >= ci.admission_time_id
                                      THEN lr.result_value END) > 5
                        THEN 1 ELSE 0 END AS wbc_trending_up
            FROM fact_lab_results lr
            JOIN CurrentInpatients ci ON lr.encounter_id = ci.encounter_id
            GROUP BY lr.encounter_id
            """,
        ),
        (
            "RiskStratification",
            """
            SELECT ci.encounter_id, ci.patient_id, ci.days_admitted, ci.in_icu,
                   COALESCE(cl.central_line_days, 0) AS central_line_days,
                   COALESCE(ls.positive_cultures, 0) AS positive_cultures,
                   COALESCE(ls.fever_episodes, 0) AS fever_episodes,
                   COALESCE(ls.wbc_trending_up, 0) AS wbc_trending_up,
                   (CASE WHEN ci.days_admitted > 7 THEN 2 ELSE 0 END)
                   + (CASE WHEN ci.in_icu THEN 3 ELSE 0 END)
                   + (CASE WHEN COALESCE(cl.central_line_days, 0) > 0 THEN 3 ELSE 0 END)
                   + (COALESCE(ls.positive_cultures, 0) * 4)
                   + (COALESCE(ls.fever_episodes, 0) * 2)
                   + (COALESCE(ls.wbc_trending_up, 0) * 2) AS hai_risk_score
            FROM CurrentInpatients ci
            LEFT JOIN cl ON ci.encounter_id = cl.encounter_id
            LEFT JOIN labstats ls ON ci.encounter_id = ls.encounter_id
            """,
        ),
    ]
    select = """
        SELECT encounter_id, patient_id,
               CAST(days_admitted AS BIGINT) AS days_admitted,
               CASE WHEN hai_risk_score >= 10 THEN 'HIGH'
                    WHEN hai_risk_score >= 5 THEN 'MODERATE'
                    ELSE 'LOW' END AS risk_level,
               CAST(hai_risk_score AS BIGINT) AS hai_risk_score,
               in_icu,
               CAST(central_line_days AS BIGINT) AS central_line_days,
               CAST(positive_cultures AS BIGINT) AS positive_cultures,
               CAST(fever_episodes AS BIGINT) AS fever_episodes
        FROM RiskStratification
        WHERE hai_risk_score >= 5
    """
    return ctes, select


def q6_drg(d: Dialect) -> str:
    ctes = [
        (
            "enc_year",
            f"""
            SELECT dd.category AS drg_category, e.encounter_id, e.length_of_stay,
                   e.total_charges, e.icu_days
            FROM fact_encounters e
            JOIN dim_diagnosis dd ON e.primary_diagnosis_id = dd.diagnosis_id
            JOIN dim_time t ON e.discharge_time_id = t.time_id
            WHERE t.year = {ANALYSIS_YEAR} AND e.encounter_type = 'Inpatient'
            """,
        ),
        (
            "drg_stats",
            f"""
            SELECT drg_category AS sc, COUNT(*) AS n,
                   SUM(length_of_stay) AS los_sum,
                   STDDEV(length_of_stay) AS los_sd,
                   {CENTS} AS cents,
                   STDDEV(total_charges) AS ch_sd
            FROM enc_year
            GROUP BY drg_category
            """,
        ),
        (
            "OutlierDetection",
            """
            SELECT e.*,
                   s.los_sum * 1.0 / s.n AS expected_los,
                   s.cents * 1.0 / (100 * s.n) AS expected_charges,
                   CASE WHEN e.length_of_stay > s.los_sum * 1.0 / s.n + 2 * s.los_sd
                          THEN 'High LOS Outlier'
                        WHEN e.length_of_stay < s.los_sum * 1.0 / s.n - 2 * s.los_sd
                          THEN 'Low LOS Outlier'
                        ELSE 'Normal' END AS los_outlier_status,
                   CASE WHEN e.total_charges > s.cents * 1.0 / (100 * s.n) + 2 * s.ch_sd
                          THEN 'High Cost Outlier'
                        WHEN e.total_charges < s.cents * 1.0 / (100 * s.n) - 2 * s.ch_sd
                          THEN 'Low Cost Outlier'
                        ELSE 'Normal' END AS cost_outlier_status
            FROM enc_year e JOIN drg_stats s ON e.drg_category = s.sc
            """,
        ),
    ]
    select = f"""
        SELECT drg_category,
               CAST(COUNT(*) AS BIGINT) AS total_cases,
               {d.rdiv('SUM(length_of_stay)', 'COUNT(*)', 1)} AS avg_los,
               {d.rdiv(CENTS, 'COUNT(*) * 100', 0)} AS avg_charges,
               {d.rdiv(CENTS, '100', 0)} AS total_revenue,
               CAST(SUM(CASE WHEN los_outlier_status = 'High LOS Outlier'
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_los_outliers,
               CAST(SUM(CASE WHEN cost_outlier_status = 'High Cost Outlier'
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_cost_outliers,
               CAST(ROUND(SUM(CASE WHEN los_outlier_status = 'High LOS Outlier'
                                   THEN total_charges - expected_charges
                                   ELSE 0 END), 0) + 0.0 AS DOUBLE)
                 AS excess_charges_from_outliers,
               {d.rdiv(f'{CENTS} * 6', '1000', 0)} AS estimated_contribution_margin,
               {d.rdiv('SUM(CASE WHEN icu_days > 0 THEN icu_days ELSE 0 END)',
                       'SUM(CASE WHEN icu_days > 0 THEN 1 ELSE 0 END)', 1)}
                 AS avg_icu_days_when_used,
               {d.rdiv('SUM(CASE WHEN icu_days > 0 THEN 1 ELSE 0 END) * 100',
                       'COUNT(*)', 2)} AS icu_utilization_rate
        FROM OutlierDetection
        GROUP BY drg_category
        HAVING COUNT(*) >= 10
    """
    return ctes, select


def q7_cohort(d: Dialect) -> str:
    ctes = [
        (
            "latest_a1c",
            f"""
            -- latest-per-patient as an ARGMAX AGGREGATE, not a
            -- ROW_NUMBER()=1 window: partial aggregation combines
            -- map-side, so the shuffle carries one row per (partition,
            -- patient) instead of every HBA1C result, and no per-
            -- partition sort runs (the r5 window shape was hc_q7's
            -- scale-probe outlier). time_id is days-since-epoch, so
            -- ordering by it equals ordering by dim_time.full_date,
            -- and the dense-calendar join reduces to a range filter
            -- (mapping.TIME_ID_MAX); the (lab_time_id, result_id)
            -- ordering packs into one BIGINT key — time_id <= 2556,
            -- result_id < mapping.RESULT_ID_PACK (the shared
            -- constant; the bound is asserted against the generated
            -- warehouse by tests/test_warehouse_mapping.py) —
            -- because DuckDB's arg_max has no composite-key form.
            SELECT lr.patient_id,
                   {d.argmax('lr.result_value',
                             f'lr.lab_time_id * CAST({RESULT_ID_PACK} AS BIGINT)'
                             ' + lr.result_id')} AS latest_a1c
            FROM fact_lab_results lr
            WHERE lr.lab_test_code = 'HBA1C'
              AND lr.lab_time_id BETWEEN 0 AND 2556
            GROUP BY lr.patient_id
            """,
        ),
        # Single scan of fact_encounters⋈dim_diagnosis replaces the
        # reference's three per-cohort subqueries (diabetes count /
        # complications EXISTS / exclusions NOT EXISTS,
        # healthcare-sql-analytics.sql:599-650): each flag is keyed by
        # patient_id over the same join, so one conditional aggregation
        # computes all three with identical semantics.
        (
            "pat_dx",
            """
            SELECT e.patient_id,
                   COUNT(DISTINCT CASE WHEN dd.icd10_code LIKE 'E11%'
                                       THEN e.encounter_id END)
                     AS diabetes_encounters,
                   MAX(CASE WHEN dd.icd10_code LIKE 'E11.2%'
                             OR dd.icd10_code LIKE 'E11.3%'
                             OR dd.icd10_code LIKE 'E11.4%'
                             OR dd.icd10_code LIKE 'E11.5%'
                            THEN 1 ELSE 0 END) AS has_complications,
                   MAX(CASE WHEN dd.icd10_code LIKE 'N18.5%'
                             OR dd.icd10_code LIKE 'Z94%'
                             OR dd.icd10_code LIKE 'C%'
                            THEN 1 ELSE 0 END) AS excluded
            FROM fact_encounters e
            JOIN dim_diagnosis dd ON e.primary_diagnosis_id = dd.diagnosis_id
            GROUP BY e.patient_id
            """,
        ),
    ]
    select = f"""
        SELECT p.patient_id, p.mrn_hash,
               CAST({AGE_ANCHOR} - p.birth_year AS BIGINT) AS age,
               p.gender, p.race,
               la.latest_a1c,
               CAST(px.diabetes_encounters AS BIGINT) AS diabetes_encounters,
               CAST(px.has_complications AS INT) AS has_complications,
               CASE WHEN px.excluded = 0 THEN 'ELIGIBLE'
                    ELSE 'EXCLUDED' END AS trial_status
        FROM dim_patient p
        JOIN pat_dx px ON p.patient_id = px.patient_id
        JOIN latest_a1c la ON p.patient_id = la.patient_id
        WHERE {AGE_ANCHOR} - p.birth_year BETWEEN 40 AND 75
          AND la.latest_a1c > 8.0
          AND px.diabetes_encounters >= 2
    """
    return ctes, select


def q8_ed_throughput(d: Dialect) -> str:
    ctes = [
        (
            "EDVisits",
            """
            SELECT e.encounter_id,
                   t_arr.hour AS arrival_hour,
                   ((e.discharge_time_id - e.admission_time_id) * 24
                    + (t_dep.hour - t_arr.hour)) * 60 AS total_ed_minutes,
                   CASE WHEN e.discharge_disposition IN ('Admit', 'Transfer')
                        THEN 1 ELSE 0 END AS admitted_flag,
                   dd.severity_deci
            FROM fact_encounters e
            JOIN dim_time t_arr ON e.admission_time_id = t_arr.time_id
            JOIN dim_time t_dep ON e.discharge_time_id = t_dep.time_id
            JOIN dim_diagnosis dd ON e.primary_diagnosis_id = dd.diagnosis_id
            WHERE e.encounter_type = 'Emergency'
            """,
        ),
        (
            "HourlyMetrics",
            f"""
            SELECT arrival_hour,
                   COUNT(*) AS volume,
                   SUM(total_ed_minutes) AS min_sum,
                   {d.pctile('total_ed_minutes', 0.5)} AS median_minutes,
                   {d.pctile('total_ed_minutes', 0.9)} AS p90_minutes,
                   SUM(admitted_flag) AS adm,
                   SUM(severity_deci) AS sev_sum
            FROM EDVisits
            GROUP BY arrival_hour
            """,
        ),
    ]
    select = f"""
        SELECT CAST(arrival_hour AS INT) AS arrival_hour,
               CAST(volume AS BIGINT) AS volume,
               {d.rdiv('min_sum', 'volume * 60', 1)} AS avg_hours,
               {d.rdiv('CAST(ROUND(median_minutes * 10, 0) AS BIGINT)', '600', 1)}
                 AS median_hours,
               {d.rdiv('CAST(ROUND(p90_minutes * 10, 0) AS BIGINT)', '600', 1)}
                 AS p90_hours,
               {d.rdiv('adm * 100', 'volume', 1)} AS admission_rate_pct,
               {d.rdiv('sev_sum', 'volume * 10', 2)} AS avg_acuity_score,
               CASE WHEN median_minutes <= 120 THEN 'EXCELLENT'
                    WHEN median_minutes <= 180 THEN 'GOOD'
                    WHEN median_minutes <= 240 THEN 'FAIR'
                    ELSE 'NEEDS IMPROVEMENT' END AS performance_category
        FROM HourlyMetrics
    """
    return ctes, select


def q9_access_audit(d: Dialect) -> str:
    ctes = [
        (
            "daily_vol",
            """
            SELECT user_id, CAST(access_timestamp AS DATE) AS d,
                   COUNT(DISTINCT patient_id) AS pats
            FROM audit_log
            GROUP BY user_id, CAST(access_timestamp AS DATE)
            """,
        ),
    ]
    select = """
        SELECT al.audit_id, al.user_id, al.access_timestamp, al.patient_id,
               al.access_type,
               CASE WHEN hour(al.access_timestamp) < 8
                      OR hour(al.access_timestamp) >= 20 THEN 'After Hours'
                    WHEN dv.pats > 50 THEN 'High Volume'
                    WHEN upr.user_id IS NULL THEN 'No Relationship'
                    ELSE 'Normal' END AS access_flag
        FROM audit_log al
        JOIN daily_vol dv
          ON al.user_id = dv.user_id
         AND CAST(al.access_timestamp AS DATE) = dv.d
        LEFT JOIN user_patient_relationship upr
          ON upr.user_id = al.user_id AND upr.patient_id = al.patient_id
    """
    return ctes, select


def q10_data_quality(d: Dialect) -> str:
    select = """
        SELECT 'fact_encounters' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS total_records,
               CAST(SUM(CASE WHEN patient_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS null_patient_ids,
               CAST(SUM(CASE WHEN admission_time_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS null_admission_times,
               CAST(SUM(CASE WHEN primary_diagnosis_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS null_diagnoses,
               CAST(SUM(CASE WHEN total_charges < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS negative_charges,
               CAST(SUM(CASE WHEN length_of_stay < 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS negative_los
        FROM fact_encounters
        UNION ALL
        SELECT 'fact_lab_results' AS table_name,
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN patient_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN lab_test_code IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN result_value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN result_value < 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM fact_lab_results
    """
    return [], select


HC_QUERIES = {
    "hc_q1_readmission_risk": q1_readmission,
    "hc_q2_sepsis_bundle": q2_sepsis,
    "hc_q3_provider_performance": q3_provider,
    "hc_q4_chronic_disease": q4_chronic,
    "hc_q5_hai_surveillance": q5_surveillance,
    "hc_q6_drg_outliers": q6_drg,
    "hc_q7_trial_cohort": q7_cohort,
    "hc_q8_ed_throughput": q8_ed_throughput,
    "hc_q9_access_audit": q9_access_audit,
    "hc_q10_data_quality": q10_data_quality,
}


#: Spark-side CTE materialization list: Spark INLINES a CTE once per
#: reference, so a CTE consumed by several later CTEs re-runs its
#: whole subtree per consumer (hc_q5's CurrentInpatients fed three —
#: three fact_encounters scans at any scale). Materializing it as a
#: cached temp view makes the fact scan run once; the DuckDB oracle
#: text is untouched (DuckDB evaluates a multiply-referenced CTE
#: once on its own), so semantics stay pinned by the same oracle.
MATERIALIZE: dict[str, set[str]] = {
    "hc_q5_hai_surveillance": {"CurrentInpatients"},
}


def _make_runner(name, template):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..caching import track_persist

        # warehouse tables resolve as persisted temp views (built once
        # per session+sf_dir); only query-local CTEs stay in the text
        ensure_warehouse(spark, sf_dir)
        ctes, select = template(SPARK)
        mat = MATERIALIZE.get(name, set())
        remaining: list[tuple[str, str]] = []
        for cte_name, cte_sql in ctes:
            if cte_name in mat:
                # earlier CTEs this one references are already either
                # materialized views or in `remaining` (prepended)
                df = spark.sql(query_with(remaining) + cte_sql)
                track_persist(df).createOrReplaceTempView(cte_name)
            else:
                remaining.append((cte_name, cte_sql))
        return spark.sql(query_with(remaining) + select)

    return run


def _oracle_text(template) -> str:
    # DuckDB has no session to persist into: render the full
    # self-contained WITH (mapping + query CTEs)
    ctes, select = template(DUCK)
    return with_clause(DUCK, ctes) + select


for _name, _template in HC_QUERIES.items():
    register(_name, _oracle_text(_template))(_make_runner(_name, _template))
