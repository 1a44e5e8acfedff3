"""Incremental-rollup maintenance and CLI orchestrator tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.__main__ import main
from healthcare_research_data_pipeline_project_spark.streaming import rollup as RU
from tests.conftest import SF_SMOKE

EVENT_DDL = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_incremental_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        (1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:25:00", 2, "view", 2.0, "{}"),
        (3, "2024-01-01 11:10:00", 1, "click", 3.0, "{}"),
    ]
    _events(spark, batch1).coalesce(1).write.mode("append").parquet(src)
    RU.run_incremental_rollup(spark, src, roll, ckpt)

    # second drop updates hour 11 and adds hour 12 — only these windows
    # are re-merged; hour 10 rows are not re-read
    batch2 = [
        (4, "2024-01-01 11:40:00", 3, "click", 4.0, "{}"),
        (5, "2024-01-01 12:00:00", 1, "view", 5.0, "{}"),
    ]
    _events(spark, batch2).coalesce(1).write.mode("append").parquet(src)
    RU.run_incremental_rollup(spark, src, roll, ckpt)

    got = {
        (str(r["window_start"]), r["event_type"]): (
            r["event_cnt"],
            r["total_value"],
        )
        for r in RU.read_rollup(spark, roll).collect()
    }
    batch_twin = {
        (str(r["w"]), r["event_type"]): (r["event_cnt"], r["total_value"])
        for r in _events(spark, batch1 + batch2)
        .groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert got == batch_twin


def test_cli_run_pipeline(spark, tmp_path, capsys):
    rc = main(
        ["--run-pipeline", "--out", str(tmp_path / "wh"), "--patients", "50"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "success"
    assert set(out["quality"]) == {"completeness", "validity", "overall"}
    assert (tmp_path / "wh" / "dim_patient").exists()
    assert (tmp_path / "wh" / "fact_encounters").exists()
    # phase 5 emits the full composite report
    assert out["report"]["report_type"] == "monthly"
    assert {"executive_summary", "patient_metrics", "utilization",
            "operational_metrics"} <= set(out["report"])


def test_cli_run_query(spark, capsys):
    rc = main(["--query", "ds_hash_sample", "--sf-dir", SF_SMOKE, "--limit", "5"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert 0 < len(rows) <= 5
    assert {"doc_id", "lang", "bucket"} <= set(rows[0])
