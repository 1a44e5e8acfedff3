"""CLI entry point — parity with the reference's orchestrator
(`python main.py --run-pipeline`, healthcare-data-pipeline-main.py:
673-705) re-expressed as one Spark lineage.

Phases (reference §3.1): generate → transform → load → analyze →
report → audit. Where the reference round-trips pandas↔RDBMS between
phases, here each phase is a DataFrame transformation; only final
small results are collected.

    python -m healthcare_research_data_pipeline_project_spark \
        --run-pipeline --out /tmp/hrdp_warehouse [--patients 1000]
    python -m healthcare_research_data_pipeline_project_spark \
        --query exec_summary --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

log = logging.getLogger("hrdp")


def run_pipeline(spark, out_dir: str, n_patients: int = 1000) -> dict:
    from .healthcare import etl, generator, rca, reporting, security
    from .sources.sinks import write_warehouse

    t0 = time.time()
    # Phase 1-2: ingestion + ETL (generator parity with reference
    # healthcare-data-pipeline-main.py:548-604; transform :211-231)
    patients = generator.generate_patients(spark, n_patients)
    encounters = generator.generate_encounters(
        spark, n_patients * 5, n_patients
    )
    labs = generator.generate_labs(spark, n_patients * 10, n_patients * 5)
    patients = security.mask_pii_columns(etl.transform_patient_data(patients))
    quality = etl.quality_metrics(patients)

    # Phase 3: warehouse load (partitioned parquet, no row-wise loop)
    write_warehouse(patients, os.path.join(out_dir, "dim_patient"))
    write_warehouse(encounters, os.path.join(out_dir, "fact_encounters"))
    write_warehouse(labs, os.path.join(out_dir, "fact_lab_results"))

    # Phase 4: root-cause analysis (readmissions + anomalies + insights)
    analysis = rca.readmission_analysis(encounters, labs)
    metric_cols = [
        c for c, t in analysis.dtypes if t in ("bigint", "double", "int")
    ]
    anomalies = rca.detect_anomalies(analysis)
    insights = rca.generate_insights(analysis, metric_cols)

    # Phase 5: reporting — the full composite report (reference
    # reporting.generate_research_report, :532)
    report = reporting.generate_research_report(patients, encounters, "monthly")

    # Phase 6: audit
    log.info("pipeline complete: %s patients, out=%s", n_patients, out_dir)
    return {
        "status": "success",
        "quality": quality,
        "anomaly_columns": sorted(anomalies),
        "insights": insights,
        "report": report,
        "elapsed_sec": round(time.time() - t0, 2),
    }


def run_query(spark, name: str, sf_dir: str, limit: int = 20) -> list[dict]:
    from . import queries as Q

    Q.load_all()
    if name not in Q.QUERIES:
        raise SystemExit(
            f"unknown query {name!r}; one of {sorted(Q.QUERIES)}"
        )
    return [r.asDict() for r in Q.QUERIES[name](spark, sf_dir).limit(limit).collect()]


def serve_api(spark, host: str, port: int, n_patients: int) -> None:
    """Run the stdlib HTTP adapter as a long-lived driver process (the
    compose `api` service). Middleware knobs come from the same env
    vars the reference's FastAPI app reads (ALLOWED_ORIGINS /
    ALLOWED_HOSTS, comma-separated, default '*'); an external
    Redis-protocol cache attaches via CACHE_HOST/CACHE_PORT."""
    from .healthcare import etl, generator, security
    from .healthcare.http_api import HealthcareApi, serve

    cache = None
    if os.environ.get("CACHE_HOST"):
        # the compose `redis` service (or any RESP2 server): RCA
        # results are then shared across api replicas with server-side
        # TTL, matching the reference's Redis cache
        from .sources.external_cache import RedisResultCache, RespClient

        cache = RedisResultCache(
            RespClient(
                os.environ["CACHE_HOST"],
                int(os.environ.get("CACHE_PORT", "6379")),
            )
        )
    patients = security.mask_pii_columns(
        etl.transform_patient_data(generator.generate_patients(spark, n_patients))
    )
    encounters = generator.generate_encounters(
        spark, n_patients * 5, n_patients
    )
    labs = generator.generate_labs(spark, n_patients * 10, n_patients * 5)
    app = HealthcareApi(
        spark,
        patients,
        encounters,
        labs,
        allowed_origins=os.environ.get("ALLOWED_ORIGINS", "*").split(","),
        allowed_hosts=os.environ.get("ALLOWED_HOSTS", "*").split(","),
        cache=cache,
    )
    server = serve(app, host=host, port=port)
    log.info("serving on %s:%s", *server.server_address)
    server.serve_forever()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="healthcare_research_data_pipeline_project_spark")
    ap.add_argument("--run-pipeline", action="store_true")
    ap.add_argument("--out", default="/tmp/hrdp_warehouse")
    ap.add_argument("--patients", type=int, default=1000)
    ap.add_argument("--query", help="run one corpus query by name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument(
        "serve", nargs="?", choices=["serve"],
        help="run the HTTP API server (compose `api` service)",
    )
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from .session import get_spark

    spark = get_spark(app_name="hrdp-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.run_pipeline:
        print(json.dumps(run_pipeline(spark, args.out, args.patients), default=str))
        return 0
    if args.query:
        print(json.dumps(run_query(spark, args.query, args.sf_dir, args.limit), default=str))
        return 0
    if args.serve == "serve":
        serve_api(spark, args.host, args.port, args.patients)
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
