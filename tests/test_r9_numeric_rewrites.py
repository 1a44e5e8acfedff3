"""Pins for the r9 hot-path numeric rewrites: each replaced a
per-pair/per-replica string or decimal computation with integer math
under the SAME cross-engine contract, so these tests pin the
equivalences the rewrites rely on (the DuckDB gate pins the
end-to-end values; these pin the local invariants)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_simhash_popcount_equals_character_hamming(spark):
    # bit_count(conv(sa,2,10) ^ conv(sb,2,10)) must equal the
    # per-character Hamming distance of the bit strings for 60-bit
    # signatures — the equivalence the integer pair path rides
    rows = [
        ("0" * 60, "0" * 60),
        ("0" * 60, "1" * 60),
        ("01" * 30, "10" * 30),
        ("1" + "0" * 59, "0" * 59 + "1"),
        ("110101" * 10, "011011" * 10),
    ]
    df = spark.createDataFrame(rows, "sa string, sb string")
    got = df.select(
        F.expr(
            "bit_count(cast(conv(sa, 2, 10) as bigint)"
            " ^ cast(conv(sb, 2, 10) as bigint))"
        ).alias("pc"),
        F.expr(
            "aggregate(sequence(1, 60), 0, (acc, i) -> acc +"
            " IF(substr(sa, i, 1) <> substr(sb, i, 1), 1, 0))"
        ).alias("ch"),
    ).collect()
    for r in got:
        assert r["pc"] == r["ch"], (r["pc"], r["ch"])


def test_boot_coeffs_bounds_and_determinism():
    from healthcare_research_data_pipeline_project_spark.queries.datapipe9 import (
        _BOOT_PRIME,
        _N_REPLICAS,
        _boot_coeffs,
    )

    cs = _boot_coeffs()
    assert len(cs) == _N_REPLICAS
    assert cs == _boot_coeffs()  # deterministic
    for a, b in cs:
        assert 0 < a < 2 ** 28 and a % 2 == 1  # a·x + b < 2^61, a odd
        assert 0 <= b < 2 ** 32
    assert _BOOT_PRIME > 2 ** 32  # remap covers the 32-bit hash range
    # first coefficient matches the published md5 derivation
    a0 = int(hashlib.md5(b"bootA:0").hexdigest()[:7], 16) | 1
    assert cs[0][0] == a0


def test_bootstrap_affine_draw_matches_python(spark):
    # the Spark-side draw for (x, r) must equal the plain-Python
    # evaluation of the same affine formula (both engines' % is exact
    # on positives; pins the element_at indexing is 1-based-correct)
    from healthcare_research_data_pipeline_project_spark.queries.datapipe9 import (
        _BOOT_PRIME,
        _boot_coeffs,
    )

    cs = _boot_coeffs()
    xs = [0, 1, 123456789, 2 ** 32 - 1]
    As = "array(" + ", ".join(str(a) for a, _ in cs) + ")"
    Bs = "array(" + ", ".join(str(b) for _, b in cs) + ")"
    df = spark.createDataFrame([(x,) for x in xs], "x long").select(
        "x", F.expr("explode(sequence(0, 99))").alias("r")
    ).select(
        "x",
        "r",
        F.expr(
            f"pmod((element_at({As}, r + 1) * x"
            f" + element_at({Bs}, r + 1)) % {_BOOT_PRIME}, 1000000)"
        ).alias("u"),
    )
    got = {(row["x"], row["r"]): row["u"] for row in df.collect()}
    for x in xs:
        for r in (0, 1, 50, 99):
            a, b = cs[r]
            assert got[(x, r)] == ((a * x + b) % _BOOT_PRIME) % 1000000


def test_tfidf_integer_weight_matches_decimal_ranking(spark):
    # milli-unit BIGINT weights must preserve the posting ORDER the
    # champion window uses (w DESC, doc_id) whenever 6-dp idf values
    # differ by >= 1e-3 — i.e. integer truncation only collapses
    # sub-milli ties, it never inverts a real ordering
    import math

    n_docs = 1000
    dfs = [1, 2, 5, 17, 60, 250, 999]
    idf6 = [round(math.log(n_docs / d), 6) for d in dfs]
    idf_milli = [round(math.log(n_docs / d) * 1000) for d in dfs]
    order6 = sorted(range(len(dfs)), key=lambda i: -idf6[i])
    orderm = sorted(range(len(dfs)), key=lambda i: -idf_milli[i])
    assert order6 == orderm
