"""Semantic pins for the datapipe5 corpus: deterministic shard
shuffle, MAD robust outliers, salted big-big join (the join itself is
pinned in test_scale; here the corpus query's aggregate is smoked).
Hand-computable fixtures via the load_tables stub pattern."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe5 as d5


def _stub(monkey_tables):
    class _T:
        pass

    for k, v in monkey_tables.items():
        setattr(_T, k, v)
    return _T()


def _with_tables(spark, tables, name):
    orig = d5.load_tables
    d5.load_tables = lambda s, d: _stub(tables)
    try:
        return QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        d5.load_tables = orig


def test_shuffle_shards_deterministic_and_complete(spark):
    # same docs, different partitioning → identical shard assignment,
    # and every doc lands in exactly one shard
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        (F.col("id") % 7 + 1).alias("n_chars"),
    )
    a = _with_tables(spark, {"documents": docs}, "ds_shuffle_shards")
    b = _with_tables(
        spark, {"documents": docs.repartition(13)}, "ds_shuffle_shards"
    )
    ka = sorted((r["shard_id"], r["n_docs"], r["total_chars"]) for r in a)
    kb = sorted((r["shard_id"], r["n_docs"], r["total_chars"]) for r in b)
    assert ka == kb
    assert sum(r["n_docs"] for r in a) == 200
    assert {r["shard_id"] for r in a} <= set(range(16))


def test_mad_outliers_hand_case(spark):
    # values 1..9 plus a 1000 spike: med=5.5, MAD=2.5 →
    # threshold 3·1.4826·2.5 = 11.1195; only the spike exceeds it
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (i, ts, 1, "click", float(v), "{}")
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [r] = _with_tables(spark, {"events": events}, "t_mad_outliers")
    assert r["n_events"] == 10
    assert r["med"] == 5.5
    assert r["mad"] == 2.5
    assert r["n_outliers"] == 1


def test_mad_outliers_flat_series_has_none(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [(i, ts, 1, "view", 10.0, "{}") for i in range(8)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [r] = _with_tables(spark, {"events": events}, "t_mad_outliers")
    assert (r["mad"], r["n_outliers"]) == (0.0, 0)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def test_filter_cascade_hand_cases(spark):
    natural = "the " + " ".join(f"word{i} of the thing and" for i in range(20))
    rows = [
        (1, "en", "s", natural),                      # passes all rules
        (2, "en", "s", "short text"),                 # fails length
        (3, "en", "s", "the " * 60 + "!?#$% " * 40),  # heavy punctuation
        (4, "en", "s", " ".join(["zzz"] * 80)),       # no stopwords, repetitive
    ]
    got = {r["doc_id"]: r for r in _with_tables(spark, {"documents": _docs(spark, rows)}, "text_filter_cascade")}
    assert got[1]["keep"] == 1 and got[1]["fail_reasons"] == ""
    assert got[2]["keep"] == 0 and "length" in got[2]["fail_reasons"]
    assert got[3]["keep"] == 0 and "punctuation" in got[3]["fail_reasons"]
    assert got[4]["keep"] == 0
    assert {"stopwords", "repetition"} <= set(got[4]["fail_reasons"].split(","))


def test_pii_redact_planted(spark):
    import hashlib

    rows = [
        (1, "en", "s", "contact jane.doe@example.org or (555) 123-4567 now"),
        (2, "en", "s", "ssn 123-45-6789 and backup 987-65-4321 on file"),
        (3, "en", "s", "no pii here at all"),
    ]
    got = {r["doc_id"]: r for r in _with_tables(spark, {"documents": _docs(spark, rows)}, "text_pii_redact")}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ssn"]) == (1, 1, 0)
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ssn"]) == (0, 0, 2)
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ssn"]) == (0, 0, 0)
    red1 = "contact [EMAIL] or [PHONE] now"
    assert got[1]["redacted_md5"] == hashlib.md5(red1.encode()).hexdigest()
    assert got[3]["redacted_md5"] == hashlib.md5(b"no pii here at all").hexdigest()
