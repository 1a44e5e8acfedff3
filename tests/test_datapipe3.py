"""Semantic pins for the datapipe3 corpus: span-dedup accounting,
Zipf fit, OHLC resample, rate-limit window, bitwise aggregates, and
the broadcast band-lookup join. Each query is also oracle-checked at
sf0.01 by tools/check_correctness.py — these tests pin hand-computable
cases and the physical-plan shapes the hash compare can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_research_data_pipeline_project_spark.queries import (
    QUERIES,
    load_all,
)

from .conftest import SF_SMOKE

load_all()


def test_span_dedup_fractions_are_consistent(spark):
    rows = QUERIES["text_span_dedup"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup_span_cnt"] <= r["span_cnt"]
        expected_keep = int(r["dup_span_cnt"] * 10 <= r["span_cnt"] * 3)
        assert r["keep"] == expected_keep


def test_zipf_fit_slope_negative_and_counts_add_up(spark):
    rows = QUERIES["text_zipf_fit"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # frequency must decay with rank on any natural-ish corpus
        assert r["zipf_slope"] < 0
        assert 0 <= r["zipf_r2"] <= 1
        assert r["vocab_size"] <= r["token_cnt"]


def test_resample_ohlc_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "a", 5.0),
            (2, "2024-01-01 01:00:00", "a", 9.0),
            (3, "2024-01-01 05:59:59", "a", 2.0),
            (4, "2024-01-01 06:00:00", "a", 7.0),  # next 6h bar
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.createOrReplaceTempView("_ohlc_probe")
    import healthcare_research_data_pipeline_project_spark.queries.datapipe3 as d3

    class _T:
        events = df

    orig = d3.load_tables
    d3.load_tables = lambda s, d: _T()
    try:
        got = {
            (r["event_type"], r["bucket_epoch"]): r
            for r in QUERIES["t_resample_ohlc"](spark, SF_SMOKE).collect()
        }
    finally:
        d3.load_tables = orig
    bar0 = got[("a", 1704067200)]
    assert (bar0["open_v"], bar0["close_v"]) == (5.0, 2.0)
    assert (bar0["high_v"], bar0["low_v"]) == (9.0, 2.0)
    assert bar0["n_events"] == 3
    assert float(bar0["avg_v"]) == 5.3333
    bar1 = got[("a", 1704088800)]
    assert bar1["n_events"] == 1 and bar1["open_v"] == bar1["close_v"] == 7.0


def test_rate_limit_window_hand_case(spark):
    # user 1: events at t, t+30min, t+59:59, t+61min → counts 1,2,3,3
    # (the 4th event's trailing hour drops the first event but keeps
    # the 30min and 59:59 ones)
    rows = [
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 1, "2024-01-01 00:30:00", 1.0),
        (3, 1, "2024-01-01 00:59:59", 1.0),
        (4, 1, "2024-01-01 01:01:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    import healthcare_research_data_pipeline_project_spark.queries.datapipe3 as d3

    class _T:
        events = df

    orig = d3.load_tables
    d3.load_tables = lambda s, d: _T()
    try:
        got = {
            r["event_id"]: r["cnt_1h"]
            for r in QUERIES["t_rate_limit_window"](spark, SF_SMOKE).collect()
        }
    finally:
        d3.load_tables = orig
    assert got == {1: 1, 2: 2, 3: 3, 4: 3}


def test_band_lookup_is_broadcast_and_row_preserving(spark):
    df = QUERIES["j11_broadcast_band_lookup"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    total = df.agg(F.sum("order_cnt")).collect()[0][0]
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert total == n_orders  # bands are exhaustive and disjoint


def test_bitwise_agg_matches_python(spark):
    import functools

    rows = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderpriority", (F.col("o_custkey") % 256).alias("m")
    ).collect()
    by_p: dict[str, list[int]] = {}
    for r in rows:
        by_p.setdefault(r["o_orderpriority"], []).append(r["m"])
    got = {
        r["o_orderpriority"]: r
        for r in QUERIES["a22_bitwise_bool_agg"](spark, SF_SMOKE).collect()
    }
    for p, ms in by_p.items():
        assert got[p]["mask_and"] == functools.reduce(lambda a, b: a & b, ms)
        assert got[p]["mask_or"] == functools.reduce(lambda a, b: a | b, ms)
        assert got[p]["mask_xor"] == functools.reduce(lambda a, b: a ^ b, ms)


def test_scd2_apply_hand_case(spark):
    from healthcare_research_data_pipeline_project_spark.operators.scd import (
        scd2_apply,
        snapshot_as_of,
    )

    dim = spark.createDataFrame(
        [
            (1, "gold", "2024-01-01", None, True),
            (2, "silver", "2024-01-01", None, True),
            (2, "bronze", "2023-01-01", "2024-01-01", False),  # history
        ],
        "k long, tier string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "k", "tier",
        "cast(valid_from as timestamp) valid_from",
        "cast(valid_to as timestamp) valid_to",
        "is_current",
    )
    updates = spark.createDataFrame(
        [(1, "gold"), (2, "gold"), (3, "silver")], "k long, tier string"
    )
    out = scd2_apply(dim, updates, "k", ["tier"], "2024-06-01")
    rows = {(r["k"], r["tier"], r["is_current"]): r for r in out.collect()}
    assert len(rows) == 5  # 1 history + 1 untouched + closed/reopened + new
    assert (1, "gold", True) in rows          # identical update: untouched
    closed = rows[(2, "silver", False)]
    assert str(closed["valid_to"]).startswith("2024-06-01")
    assert (2, "gold", True) in rows          # reopened
    new = rows[(3, "silver", True)]
    assert str(new["valid_from"]).startswith("2024-06-01")
    # point-in-time probes
    asof_feb = snapshot_as_of(out, "2024-02-01")
    assert {(r["k"], r["tier"]) for r in asof_feb.collect()} == {
        (1, "gold"), (2, "silver"),
    }
    asof_jul = snapshot_as_of(out, "2024-07-01")
    assert {(r["k"], r["tier"]) for r in asof_jul.collect()} == {
        (1, "gold"), (2, "gold"), (3, "silver"),
    }


def test_funnel_monotone_and_sane(spark):
    r = QUERIES["t_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] > 0
    assert 0 < float(r["click_pct"]) <= 100
    assert float(r["avg_secs_to_convert"]) > 0


def test_compact_small_files(spark, tmp_path):
    from healthcare_research_data_pipeline_project_spark.sources.sinks import (
        compact_small_files,
    )

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orders.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) >= 64
    compact_small_files(spark, src, dest, target_bytes=1 << 30,
                        sort_cols=["o_orderdate"])
    out = spark.read.parquet(dest)
    assert len(out.inputFiles()) <= 2
    assert out.count() == orders.count()


def test_compact_small_files_rejects_in_place(spark, tmp_path):
    import pytest as _pytest

    from healthcare_research_data_pipeline_project_spark.sources.sinks import (
        compact_small_files,
    )

    src = str(tmp_path / "frag")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.parquet(src)
    with _pytest.raises(ValueError, match="dest must differ"):
        compact_small_files(spark, src, src)
    # same path spelled differently (trailing slash / file: scheme)
    with _pytest.raises(ValueError, match="dest must differ"):
        compact_small_files(spark, src, src + "/")
    with _pytest.raises(ValueError, match="dest must differ"):
        compact_small_files(spark, src, "file://" + src)


def test_fuzzy_names_pairs_are_blocked_and_bounded(spark):
    rows = QUERIES["dedup_fuzzy_names"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split()[-1] == r["name_b"].split()[-1] == r["block"]
        assert 1 <= r["edit_dist"] <= 4

    # spot-check the distance against a pure-python Levenshtein
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for r in rows[:10]:
        assert r["edit_dist"] == lev(r["name_a"], r["name_b"])


def test_referential_audit_detects_injected_violations(spark):
    import healthcare_research_data_pipeline_project_spark.queries.datapipe3 as d3

    class _T:
        orders = spark.createDataFrame(
            [(1, 10), (2, 10), (2, 99)], "o_orderkey long, o_custkey long"
        )  # dup PK 2; custkey 99 is an orphan
        customer = spark.createDataFrame([(10,)], "c_custkey long")
        lineitem = spark.createDataFrame(
            [(1, 100, 200), (7, 100, 200)],
            "l_orderkey long, l_partkey long, l_suppkey long",
        )  # orderkey 7 is an orphan
        part = spark.createDataFrame([(100,)], "p_partkey long")
        supplier = spark.createDataFrame([(200,)], "s_suppkey long")

    orig = d3.load_tables
    d3.load_tables = lambda s, d: _T()
    try:
        got = {
            r["constraint_name"]: r["violation_cnt"]
            for r in QUERIES["dq_referential_audit"](spark, SF_SMOKE).collect()
        }
    finally:
        d3.load_tables = orig
    assert got["lineitem.l_orderkey->orders"] == 1
    assert got["orders.o_custkey->customer"] == 1
    assert got["orders.o_orderkey unique"] == 1
    assert got["lineitem.l_partkey->part"] == 0
    assert got["customer.c_custkey unique"] == 0


def test_surrogate_keys_dense_and_stable(spark):
    rows = QUERIES["ds_surrogate_keys"](spark, SF_SMOKE).collect()
    by_combo = {}
    for r in rows:
        by_combo.setdefault((r["lang"], r["source"]), set()).add(r["sk"])
    # one sk per combo, dense 1..n, ordered by (lang, source)
    assert all(len(v) == 1 for v in by_combo.values())
    sks = [next(iter(by_combo[k])) for k in sorted(by_combo)]
    assert sks == list(range(1, len(by_combo) + 1))


def test_ewma_hand_case(spark):
    import healthcare_research_data_pipeline_project_spark.queries.datapipe3 as d3

    class _T:
        events = spark.createDataFrame(
            [
                (1, 7, "2024-01-01 00:00:00", 1.0),
                (2, 7, "2024-01-01 00:01:00", 2.0),
                (3, 7, "2024-01-01 00:02:00", 3.0),
            ],
            "event_id long, user_id long, ts string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))

    orig = d3.load_tables
    d3.load_tables = lambda s, d: _T()
    try:
        r = QUERIES["t_ewma"](spark, SF_SMOKE).collect()[0]
    finally:
        d3.load_tables = orig
    # ema = 0.5*3 + 0.5*(0.5*2 + 0.5*1) = 2.25
    assert (r["user_id"], r["n_events"], r["last_value"]) == (7, 3, 3.0)
    assert r["ewma"] == 2.25


def test_text_chunks_cover_document_with_overlap(spark):
    rows = QUERIES["text_chunks"](spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    for doc_id, chunks in list(by_doc.items())[:20]:
        text = docs[doc_id]
        chunks.sort(key=lambda r: r["chunk_start"])
        assert chunks[0]["chunk_start"] == 0
        # strides are regular and every char is covered (len > stride)
        starts = [c["chunk_start"] for c in chunks]
        assert starts == list(range(0, len(text), 90))
        for c in chunks:
            assert c["chunk"] == text[c["chunk_start"]:c["chunk_start"] + 120]
        assert chunks[-1]["chunk_start"] + chunks[-1]["chunk_len"] == len(text)


def test_substring_dedup_hand_case(spark, tmp_path, monkeypatch):
    # docs A and B share an exact 25-token run (=> one maximal span of
    # 25 tokens each); doc C repeats its own 20-token run twice inside
    # one 45-token text (two islands merged? no — the two copies are
    # separated by 5 unique tokens, gap > K, so TWO spans of 20); doc
    # D is shorter than K (no windows, zero counts, keep=1)
    import healthcare_research_data_pipeline_project_spark.queries.datapipe3 as d3
    from healthcare_research_data_pipeline_project_spark.queries.datapipe3 import (
        _SUB_K,
    )

    run = " ".join(f"shared{i}" for i in range(25))
    selfrun = " ".join(f"rep{i}" for i in range(_SUB_K))
    gap = " ".join(f"uniqgap{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            (1, "a pre " + run + " tail1x"),
            (2, run + " other trailing words here"),
            (3, selfrun + " " + gap + " " + selfrun),
            (4, "tiny doc under k tokens"),
        ],
        "doc_id long, text string",
    )

    class T:
        documents = docs

    monkeypatch.setattr(d3, "load_tables", lambda spark, sf: T())
    rows = {
        r["doc_id"]: r
        for r in d3.text_substring_dedup(spark, "ignored").collect()
    }
    assert rows[1]["n_dup_spans"] == 1
    assert rows[1]["dup_token_cnt"] == 25
    assert rows[1]["max_span_len"] == 25
    assert rows[1]["keep"] == 0  # 25 dup of 28 tokens > 20%
    assert rows[2]["dup_token_cnt"] == 25
    assert rows[3]["n_dup_spans"] == 2
    assert rows[3]["dup_token_cnt"] == 2 * _SUB_K
    assert rows[3]["max_span_len"] == _SUB_K
    assert rows[4]["token_cnt"] == 5
    assert rows[4]["n_dup_spans"] == 0
    assert rows[4]["dup_token_cnt"] == 0
    assert rows[4]["keep"] == 1
