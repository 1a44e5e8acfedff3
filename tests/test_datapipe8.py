"""Semantic pins for the datapipe8 corpus: Markov event transitions,
weekday seasonality, and inverted-index TF-IDF k-NN."""

from __future__ import annotations

import datetime
import math

import pytest

from healthcare_research_data_pipeline_project_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

import healthcare_research_data_pipeline_project_spark.queries.datapipe8 as d8


def _stub(monkey_tables):
    class _T:
        pass

    for k, v in monkey_tables.items():
        setattr(_T, k, v)
    return _T()


def _with_tables(spark, tables, name):
    orig = d8.load_tables
    d8.load_tables = lambda s, d: _stub(tables)
    try:
        return QUERIES[name](spark, SF_SMOKE).collect()
    finally:
        d8.load_tables = orig


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_event_transitions_hand_case(spark):
    t0 = datetime.datetime(2024, 1, 1)
    sec = datetime.timedelta(seconds=1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, t0, 1, "a"),
        (2, t0 + sec, 1, "b"),
        (3, t0 + 2 * sec, 1, "a"),
        (4, t0, 2, "a"),
        (5, t0 + sec, 2, "b"),
    ]
    got = {
        (r["from_type"], r["to_type"]): r
        for r in _with_tables(
            spark, {"events": _events(spark, rows)}, "t_event_transitions"
        )
    }
    assert got[("a", "b")]["n_transitions"] == 2
    assert got[("b", "a")]["n_transitions"] == 1
    # probabilities are exact rationals per from_type
    assert got[("a", "b")]["prob"] == 1.0
    assert got[("b", "a")]["prob"] == 1.0
    # no cross-user transition (user2's 'b' never flows to user1's 'a')
    assert set(got) == {("a", "b"), ("b", "a")}


def test_event_transitions_tie_break_on_event_id(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [  # same ts: order by event_id -> a (id 1) then b (id 2)
        (1, t0, 1, "a"),
        (2, t0, 1, "b"),
    ]
    got = _with_tables(
        spark, {"events": _events(spark, rows)}, "t_event_transitions"
    )
    assert len(got) == 1
    assert (got[0]["from_type"], got[0]["to_type"]) == ("a", "b")


def test_seasonal_profile_hand_case(spark):
    # Mon 2024-01-01 twice ($1, $3 -> avg $2), Tue once ($4):
    # global avg = (1+3+4)/3 days? No — daily totals: Mon1=4, Mon8=2,
    # Tue2=4 → per-dow: Mon avg 3, Tue avg 4; global (4+2+4)/3 = 10/3
    rows = [
        (datetime.datetime(2024, 1, 1), 1.0),
        (datetime.datetime(2024, 1, 1), 3.0),
        (datetime.datetime(2024, 1, 8), 2.0),
        (datetime.datetime(2024, 1, 2), 4.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderdate timestamp, o_totalprice double"
    )
    got = {
        r["dow"]: r
        for r in _with_tables(spark, {"orders": orders}, "t_seasonal_profile")
    }
    assert set(got) == {1, 2}  # ISO Mon=1, Tue=2
    assert got[1]["n_days"] == 2 and got[2]["n_days"] == 1
    assert got[1]["avg_daily_revenue"] == 3.0
    assert got[2]["avg_daily_revenue"] == 4.0
    # index = dow_avg / global_avg, exact HALF_UP at 4 dp:
    # Mon: 3/(10/3) = 0.9 ; Tue: 4/(10/3) = 1.2
    assert got[1]["seasonal_index"] == 0.9
    assert got[2]["seasonal_index"] == 1.2


def test_tfidf_knn_hand_case(spark):
    # d1/d2 share the rare token "x"; d3 shares nothing rare with them
    docs = spark.createDataFrame(
        [
            (1, "x alpha beta", "s", "en", 1),
            (2, "x gamma delta", "s", "en", 1),
            (3, "epsilon zeta eta", "s", "en", 1),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    rows = _with_tables(spark, {"documents": docs}, "text_tfidf_knn")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # only d1<->d2 form a candidate pair (shared token); d3 has no
    # neighbors at all
    assert set(by_doc) == {1, 2}
    assert by_doc[1][0]["nbr_id"] == 2 and by_doc[2][0]["nbr_id"] == 1
    # expected cosine: every token unique to its doc except x (df 2):
    # idf(x) = ln(3/2); unique tokens idf ln(3). w = 1·idf.
    wx, wu = math.log(3 / 2), math.log(3)
    cos = round(wx * wx / (wx * wx + 2 * wu * wu), 4)
    assert by_doc[1][0]["cos_sim"] == pytest.approx(cos, abs=2e-4)


def test_tfidf_knn_df_cap_drops_ubiquitous_tokens(spark):
    # "the" appears in every doc — with df over the cap it cannot form
    # pairs; these docs share nothing else, so no rows at all
    docs = spark.createDataFrame(
        [(i, f"the tok{i}", "s", "en", 1) for i in range(d8._KNN_DF_MAX + 5)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    rows = _with_tables(spark, {"documents": docs}, "text_tfidf_knn")
    assert rows == []


def test_tfidf_knn_rank_shape_on_corpus(spark):
    rows = QUERIES["text_tfidf_knn"](spark, SF_SMOKE).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= d8._KNN_K
