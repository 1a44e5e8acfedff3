"""Scale-operator corpus entries: skew-safe aggregation and
deterministic sampling/splits, each pinned to the same DuckDB oracle
as a plain single-phase query — proving the scale path changes the
*plan*, never the *answer*."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.helpers import DEC, duck_dec_avg, rnd, round_div
from ..operators import scale as SC
from ..tables import load_tables
from . import register


# ---------------------------------------------------------------------------
# Salted two-phase aggregation ≡ plain GROUP BY (oracle is the plain
# form — decomposability is the correctness claim)
# ---------------------------------------------------------------------------
@register(
    "skew_salted_agg",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty,
           {duck_dec_avg("l_extendedprice")} AS avg_price,
           CAST(ROUND(MIN(l_extendedprice), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(l_extendedprice), 2) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`l_returnflag` has 3 values over the whole fact — the canonical
    hot-key shape. The salt spreads each flag over 16 partial groups."""
    t = load_tables(spark, sf_dir)
    agg = SC.salted_agg(
        t.lineitem,
        ["l_returnflag"],
        {
            "cnt": ("count", None),
            "qty_dec": ("sum", F.col("l_quantity").cast(DEC)),
            "price_cents": ("sum", F.col("l_extendedprice").cast(DEC) * 100),
            "minp": ("min", F.col("l_extendedprice")),
            "maxp": ("max", F.col("l_extendedprice")),
        },
        n_salts=16,
        entropy="l_orderkey",
    )
    return agg.select(
        "l_returnflag",
        F.col("cnt").cast("long").alias("line_cnt"),
        rnd(F.col("qty_dec"), "sum_qty"),
        round_div(
            F.col("price_cents").cast("long"), F.col("cnt") * 100, "avg_price"
        ),
        rnd(F.col("minp"), "min_price"),
        rnd(F.col("maxp"), "max_price"),
    )


# ---------------------------------------------------------------------------
# Deterministic content-hash sample (reproducible ~10% of documents)
# ---------------------------------------------------------------------------
@register(
    "ds_hash_sample",
    f"""
    SELECT doc_id, lang,
           {SC.duck_hash_bucket("doc_id")} AS bucket
    FROM documents
    WHERE {SC.duck_hash_bucket("doc_id")} < 10
    """,
)
def ds_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return SC.hash_sample(t.documents, "doc_id", pct=10).select(
        "doc_id", "lang", SC.hash_bucket("doc_id").alias("bucket")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split — per-split-per-language counts
# ---------------------------------------------------------------------------
@register(
    "ds_hash_split",
    f"""
    WITH s AS (
      SELECT lang, {SC.duck_split_case("doc_id")} AS split FROM documents
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS doc_cnt
    FROM s GROUP BY split, lang
    """,
)
def ds_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        SC.hash_split(t.documents, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_cnt"))
    )
