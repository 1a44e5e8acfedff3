"""Training-data pipeline corpus, part 5: deterministic training-set
shard shuffle, robust (MAD) outlier detection, and the salted big-big
join.

Shard shuffle: the step between curation and training — assign every
document a reproducible (shard, position) so a 1000-node trainer
streams disjoint, stably-ordered shards. `rand()` ordering is not
replay-safe and not engine-portable; the md5-derived `hash_bucket`
family (operators/scale.py) is both, so the oracle reproduces the
exact assignment in DuckDB.

MAD outliers: the robust twin of the reference's mean/2.5σ anomaly
detector (`healthcare-data-pipeline-main.py:319-338`, engine form
`rca.detect_anomalies` / `a10_zscore_outliers`). Mean/σ break down
when the outliers themselves inflate σ; median/MAD does not — at
100 TB of telemetry the heavy tail is the norm, not the exception.

Salted join: `operators.scale.salted_join` exercised end-to-end and
pinned result-identical to the plain join by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import duck_hash64, hash64_expr
from ..operators.scale import salted_join
from ..tables import load_tables
from . import register

_N_SHARDS = 16


# ---------------------------------------------------------------------------
# Deterministic training-shard shuffle. Every doc gets a stable 32-bit
# content hash h; shard = h mod 16; within-shard stream order is
# (h, doc_id). The query audits the assignment: per-shard doc count
# (balance), char volume (each shard feeds one trainer — volume skew
# is wasted GPU time), and the hash range [min_h, max_h]. Plan shape:
# the hash is map-side; the only exchange is the 16-key final
# aggregate. Materializing the shuffled corpus is then
# `repartitionByRange(16, shard, h, doc_id)` + a partitioned write —
# one range shuffle, no global sort.
# ---------------------------------------------------------------------------
@register(
    "ds_shuffle_shards",
    f"""
    WITH d AS (
      SELECT {duck_hash64("CAST(doc_id AS VARCHAR)", "shuffle")} AS h,
             doc_id, n_chars
      FROM documents
    )
    SELECT h % {_N_SHARDS} AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(h) AS min_h, MAX(h) AS max_h
    FROM d GROUP BY shard_id
    """,
)
def ds_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        F.expr(hash64_expr("cast(doc_id as string)", "shuffle")).alias("h"),
        "doc_id",
        "n_chars",
    )
    return (
        d.groupBy((F.col("h") % _N_SHARDS).alias("shard_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection via median absolute deviation. Per event
# type: med = median(value), MAD = median(|value − med|), outlier ⇔
# |value − med| > 3·1.4826·MAD (1.4826 scales MAD to σ under
# normality; both engines evaluate the same double product, so the
# threshold comparison is bit-identical). Three aggregation passes
# over the fact, each a bounded-key shuffle; the per-type medians are
# broadcast back — no percentile state ever crosses a partition
# boundary unaggregated. Interpolated exact medians on both sides
# (Spark `percentile`, DuckDB `median` = percentile_cont).
# ---------------------------------------------------------------------------
@register(
    "t_mad_outliers",
    """
    WITH m AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN m USING (event_type)
    ),
    s AS (
      SELECT event_type, MIN(med) AS med, median(adev) AS mad,
             COUNT(*) AS n
      FROM d GROUP BY event_type
    ),
    o AS (
      SELECT d.event_type,
             SUM(CASE WHEN d.adev > 3 * 1.4826 * s.mad
                      THEN 1 ELSE 0 END) AS n_out
      FROM d JOIN s USING (event_type) GROUP BY d.event_type
    )
    SELECT s.event_type, CAST(s.n AS BIGINT) AS n_events,
           ROUND(s.med, 6) AS med, ROUND(s.mad, 6) AS mad,
           CAST(o.n_out AS BIGINT) AS n_outliers
    FROM s JOIN o USING (event_type)
    """,
)
def t_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t.events.select("event_type", "value")
    # exact percentile() is safe HERE because events.value is a
    # 2-decimal bounded domain (17.8k distinct at 100k rows, ceiling
    # = value-range x 100 regardless of corpus size), so the
    # aggregate's value->count buffer is domain-bounded, not
    # corpus-bounded. Near-unique columns must use
    # operators.scale.exact_percentiles_multi instead (see
    # a8_percentiles / iqr_bounds).
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
        "med",
    )
    stats = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )
    out = (
        dev.join(F.broadcast(stats.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_out")
        )
    )
    return stats.join(out, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        F.col("n_out").cast("long").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Salted big-big join, end-to-end: lineitem (skew side — at 100 TB a
# handful of mega-orders or crawler domains dominate a join key)
# joined to orders through operators.scale.salted_join, then revenue
# per order priority. The oracle is the PLAIN join + aggregate — the
# gate pins that salting is result-invariant. Exact money: 2-dp price
# × 2-dp discount is exact at decimal scale 4 in both engines (the
# j1_star_join doctrine), rounded once at the end.
# ---------------------------------------------------------------------------
@register(
    "skew_salted_join",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    left = t.lineitem.select(
        F.col("l_orderkey").alias("okey"),
        "l_extendedprice",
        "l_discount",
        "l_linenumber",
    )
    right = t.orders.select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(
        left, right, "okey", n_salts=4, entropy=F.col("l_linenumber")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("line_cnt"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# C4/Gopher-style filter cascade: the keep/drop decision of a
# training-corpus cleanup pass, with machine-readable failure reasons.
# Every rule is an integer-exact predicate (cross-multiplied ratios, no
# float compares), so Spark and DuckDB produce the identical keep set
# and reason strings. Plan shape: one map-side projection over the
# corpus — no shuffle at all until the final ORDER BY; at 100 TB this
# is a pure scan+filter stage that fuses into whole-stage codegen.
# Rules (integer forms):
#   len_ok:   50 <= token_cnt <= 100000
#   punct_ok: punct_cnt * 10 <= char_cnt * 3        (punct ratio <= 0.3)
#   stop_ok:  stop_cnt * 20 >= token_cnt            (stopword ratio >= 0.05)
#   ttr_ok:   uniq_cnt * 5 >= token_cnt             (type-token ratio >= 0.2)
# ---------------------------------------------------------------------------
from ..functions.text import DUCK_TOKENS, STOPWORDS  # noqa: E402

_STOP_SQL5 = ", ".join(f"'{w}'" for w in STOPWORDS)
_TOKS5 = DUCK_TOKENS.format(text="text")


@register(
    "text_filter_cascade",
    f"""
    WITH d0 AS (
      -- coalesce NULL text to '' exactly like the Spark projection, so
      -- the twins agree on null input (Spark size(null) = -1 otherwise)
      SELECT doc_id, lang, coalesce(text, '') AS text FROM documents
    ),
    d AS (
      SELECT doc_id, lang, {_TOKS5} AS toks,
             length(text) AS char_cnt,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
               AS punct_cnt
      FROM d0
    ),
    m AS (
      SELECT doc_id, lang, char_cnt, punct_cnt,
             len(toks) AS token_cnt,
             len(list_distinct(toks)) AS uniq_cnt,
             len(list_filter(toks, t -> list_contains([{_STOP_SQL5}], t)))
               AS stop_cnt
      FROM d
    ),
    r AS (
      SELECT doc_id, lang, CAST(token_cnt AS BIGINT) AS token_cnt,
             (token_cnt BETWEEN 50 AND 100000) AS len_ok,
             (punct_cnt * 10 <= char_cnt * 3) AS punct_ok,
             (stop_cnt * 20 >= token_cnt) AS stop_ok,
             (uniq_cnt * 5 >= token_cnt) AS ttr_ok
      FROM m
    )
    SELECT doc_id, lang, token_cnt,
           CAST(CASE WHEN len_ok AND punct_ok AND stop_ok AND ttr_ok
                     THEN 1 ELSE 0 END AS INT) AS keep,
           concat_ws(',',
             CASE WHEN NOT len_ok THEN 'length' END,
             CASE WHEN NOT punct_ok THEN 'punctuation' END,
             CASE WHEN NOT stop_ok THEN 'stopwords' END,
             CASE WHEN NOT ttr_ok THEN 'repetition' END) AS fail_reasons
    FROM r
    """,
)
def text_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_cascade

    t = load_tables(spark, sf_dir)
    return quality_cascade(t.documents)


# ---------------------------------------------------------------------------
# Free-text PII scrubbing: regex redaction of emails / SSNs / phone
# numbers inside the document corpus — the curation step every
# training pipeline runs before release, and the free-text twin of the
# reference's column-level masking (healthcare-data-pipeline-main.py:
# 182-197). Patterns use only portable regex constructs (character
# classes + bounded repetition — no lookaround), so Java regex (Spark)
# and RE2 (DuckDB) agree byte-for-byte; the oracle pins redacted-text
# md5 AND per-kind match counts. Map-side only — no shuffle.
# ---------------------------------------------------------------------------
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\d{3}-\d{2}-\d{4}"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}"),
]


def redact_pii_text(col: F.Column) -> F.Column:
    """Chained regexp_replace over the portable PII patterns."""
    out = col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def _pii_oracle() -> str:
    red = "text"
    for kind, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '[{kind.upper()}]', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, pat in PII_PATTERNS
    )
    return f"""
    SELECT doc_id,
           md5({red}) AS redacted_md5,
           {counts}
    FROM documents
    """


@register("text_pii_redact", _pii_oracle())
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5(redact_pii_text(F.col("text"))).alias("redacted_md5"),
        *[
            F.regexp_count("text", F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
    )
