"""Text-analysis column builders (north-star extensions, SURVEY §7 P5).

Everything here is JVM-side Catalyst expressions (split / higher-order
functions / md5) — no Python UDFs — so text ops run inside whole-stage
codegen and scale linearly with partitions. Each Spark builder has a
DuckDB SQL twin built from the same spec so the oracle matches
bit-for-bit.

Tokenization spec (shared by both engines):
  tokens(text)   = non-empty pieces of regex-split on \\s+
  shingles(text) = space-joined word k-grams (k=3); docs shorter than k
                   tokens contribute their whole token list as one
                   shingle.
  hash64(s)      = first 8 hex chars of md5(s) as integer — engine-
                   portable (Spark `conv`, DuckDB '0x' cast), uniform
                   enough for MinHash/SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_K = 3

#: small multilingual stopword inventory for quality scoring / lang-ID
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "der", "die", "und",
             "le", "la", "et", "el", "los", "y", "en", "de")

#: lang-ID marker words per language (deterministic scorer; ties break
#: in this dict's order)
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "y", "que", "es"),
    "fr": ("le", "la", "et", "les", "est"),
    "zh": ("de5", "le5", "shi4", "he2", "zai4"),
}


# ---------------------------------------------------------------------------
# Spark-side builders (Catalyst expressions)
# ---------------------------------------------------------------------------
def tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def shingles(toks_col: str, k: int = SHINGLE_K) -> Column:
    """Word k-gram shingles from a token-array column name."""
    return F.expr(
        f"transform(sequence(0, greatest(size({toks_col}) - {k}, 0)),"
        f" i -> array_join(slice({toks_col}, i + 1, {k}), ' '))"
    )


def hash64_expr(s: str, salt: str = "") -> str:
    """Spark SQL fragment: portable 32-bit-in-64 hash of expression `s`."""
    inner = f"concat({s}, '#{salt}')" if salt else s
    return f"cast(conv(substring(md5({inner}), 1, 8), 16, 10) as bigint)"


# MinHash permutation family: h_j(x) = (A_j*x + B_j) mod P over the base
# 32-bit shingle hash. One md5 per shingle total (instead of one per
# shingle PER COMPONENT); the j-th component is a cheap affine remap.
# A_j < 2^28 and x < 2^32 keep A_j*x + B_j < 2^63 (no BIGINT overflow in
# either engine; both engines' % is exact on positives).
_MH_PRIME = 4294967311  # smallest prime > 2^32

def _mh_coeffs(n: int = 64) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for j in range(n):
        a = int(hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out


MH_COEFFS = _mh_coeffs()


def shingle_hashes(shingle_col: str) -> Column:
    """Array of base hash64 values, one md5 per distinct shingle."""
    return F.expr(
        f"transform(array_distinct({shingle_col}), s -> {hash64_expr('s')})"
    )


def minhash_col(hashes_col: str, seed: int) -> Column:
    """One MinHash component: min over pre-hashed shingles of the
    seed-th affine permutation."""
    a, b = MH_COEFFS[seed]
    return F.expr(
        f"array_min(transform({hashes_col}, h -> ({a} * h + {b}) % {_MH_PRIME}))"
    ).alias(f"mh_{seed}")


def simhash_bits_col(toks_col: str, nbits: int = 16) -> Column:
    """SimHash as a bit-string: per bit position j, majority vote over
    token-hash bits (+1/−1), emitted as '0'/'1' chars. Bit-string form
    avoids engine-specific integer bit-packing differences.

    The token hash takes ceil(nbits/4) md5 hex chars so every
    signature bit has real entropy (a fixed 4-char hash would leave
    bits ≥ 16 constant). nbits ≤ 60 keeps the conv() result inside
    BIGINT in both engines; nbits = 16 reproduces the original
    signatures bit-for-bit."""
    if nbits > 60:
        raise ValueError("simhash nbits must be <= 60 (BIGINT token hash)")
    hx = (nbits + 3) // 4
    tok_hash = f"cast(conv(substring(md5(t), 1, {hx}), 16, 10) as bigint)"
    # ONE fold with an nbits-wide vote accumulator over PRE-hashed
    # tokens: the naive per-bit form (`transform(sequence(...), j ->
    # aggregate(toks, ...))`) re-evaluates md5(token) once per BIT —
    # a 60x hot-loop blowup Catalyst does not CSE away. Here each
    # token hashes exactly once (the `transform` below), and per token
    # the fold does nbits cheap shift/mask votes. Vote sums are
    # order-independent integers, so the output is bit-for-bit the
    # per-bit form's.
    return F.expr(
        f"aggregate("
        f"transform({toks_col}, t -> {tok_hash}), "
        f"array_repeat(0, {nbits}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {nbits - 1}), "
        f"(a, j) -> a + CASE WHEN (shiftright(h, j) & 1) = 1 "
        f"THEN 1 ELSE -1 END), "
        f"acc -> concat_ws('', transform(acc, v -> "
        f"CASE WHEN v >= 0 THEN '1' ELSE '0' END)))"
    )


# ---------------------------------------------------------------------------
# DuckDB twins (oracle SQL fragments)
# ---------------------------------------------------------------------------
DUCK_TOKENS = r"list_filter(string_split_regex({text}, '\s+'), x -> x <> '')"


def duck_shingles(toks: str, k: int = SHINGLE_K) -> str:
    return (
        f"list_transform(generate_series(0, greatest(len({toks}) - {k}, 0)),"
        f" i -> array_to_string({toks}[i + 1:i + {k}], ' '))"
    )


def duck_hash64(s: str, salt: str = "") -> str:
    inner = f"{s} || '#{salt}'" if salt else s
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


def duck_shingle_hashes(shingle_col: str) -> str:
    return (
        f"list_transform(list_distinct({shingle_col}), s -> {duck_hash64('s')})"
    )


def duck_minhash(hashes_col: str, seed: int) -> str:
    a, b = MH_COEFFS[seed]
    return (
        f"list_min(list_transform({hashes_col}, "
        f"h -> ({a} * h + {b}) % {_MH_PRIME}))"
    )


def duck_simhash_bits(toks: str, nbits: int = 16) -> str:
    hx = (nbits + 3) // 4
    tok_hash = f"CAST('0x' || substr(md5(t), 1, {hx}) AS BIGINT)"
    return (
        f"array_to_string(list_transform(generate_series(0, {nbits - 1}), j -> "
        f"CASE WHEN list_sum(list_transform({toks}, t -> "
        f"CASE WHEN (({tok_hash} >> j) & 1) = 1 THEN 1 ELSE -1 END)) >= 0 "
        f"THEN '1' ELSE '0' END), '')"
    )


# ---------------------------------------------------------------------------
# Quality cascade (C4/Gopher-style keep/drop): shared projection used
# by the batch corpus query (queries/datapipe5.py text_filter_cascade,
# which carries the DuckDB oracle twin) AND the streaming curation
# path (streaming/surveillance.py curate_stream) — stateless, so the
# identical expression graph runs under both engines' schedulers.
# ---------------------------------------------------------------------------
def quality_cascade(df, text_col: str = "text", id_cols=("doc_id", "lang")):
    """keep/fail_reasons projection. Integer-exact rules:
    len_ok 50<=tokens<=100000; punct_ok punct*10<=chars*3;
    stop_ok stops*20>=tokens; ttr_ok uniq*5>=tokens.

    NULL text is coalesced to '' up front (token_cnt 0, keep 0,
    fail_reasons includes 'length') so the Spark path agrees with the
    DuckDB oracle twin on null input — without the coalesce, Spark's
    size(null)=-1 convention and DuckDB's NULL propagation diverge."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    d = (
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        .withColumn("toks", tokens(F.col(text_col)))
        .withColumn("char_cnt", F.length(text_col))
        .withColumn(
            "punct_cnt",
            F.length(text_col)
            - F.length(F.regexp_replace(text_col, "[^A-Za-z0-9 ]", "")),
        )
        .withColumn("token_cnt", F.size("toks"))
        .withColumn("uniq_cnt", F.size(F.array_distinct("toks")))
        .withColumn(
            "stop_cnt",
            F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x))),
        )
    )
    len_ok = F.col("token_cnt").between(50, 100000)
    punct_ok = F.col("punct_cnt") * 10 <= F.col("char_cnt") * 3
    stop_ok = F.col("stop_cnt") * 20 >= F.col("token_cnt")
    ttr_ok = F.col("uniq_cnt") * 5 >= F.col("token_cnt")
    return d.select(
        *id_cols,
        F.col("token_cnt").cast("long").alias("token_cnt"),
        (len_ok & punct_ok & stop_ok & ttr_ok).cast("int").alias("keep"),
        F.concat_ws(
            ",",
            F.when(~len_ok, "length"),
            F.when(~punct_ok, "punctuation"),
            F.when(~stop_ok, "stopwords"),
            F.when(~ttr_ok, "repetition"),
        ).alias("fail_reasons"),
    )
