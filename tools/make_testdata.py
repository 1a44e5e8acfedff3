"""Self-contained synthetic test-data generator.

Reproduces the SHAPE of the driver's TPC-H-ish tables (TESTDATA.md:
`region nation customer supplier part orders lineitem events
documents embeddings`, identical column names/types, compatible value
domains and date ranges) so CI machines without /root/testdata can
run the pytest suite, the DuckDB oracle gate, and the bench smoke.

This is NOT the driver's generator and makes no attempt to match its
values — it doesn't need to: every correctness check in this repo
compares Spark against DuckDB over the SAME parquet, so any
well-formed instance exercises the contract. Deterministic
(numpy PCG64 seed per table), pure pyarrow writes, no Spark needed.

Usage: python tools/make_testdata.py --out testdata/sf0.001 --sf 0.001
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]
EVENT_TYPES = ["view", "click", "purchase", "login", "logout"]
LANGS = ["en", "de", "fr", "es", "it"]
WORDS = (
    "the fast slow key order sort table scan merge part window small "
    "hash join spark group query row data filter customer line batch "
    "value stream shuffle broadcast plan stage task node disk memory"
).split()

DAY = np.timedelta64(86_400_000_000, "us")


def _ts(rng, start: str, days: float, n: int) -> np.ndarray:
    base = np.datetime64(start + "T00:00:00", "us")
    return base + (rng.random(n) * days * 86_400_000_000).astype("int64").astype(
        "timedelta64[us]"
    )


def build(out: str, sf: float) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = max(5, int(150_000 * sf))
    n_supp = max(3, int(10_000 * sf))
    n_part = max(5, int(200_000 * sf))
    n_ord = max(10, int(1_500_000 * sf))
    n_line = max(20, int(6_000_000 * sf))
    n_evt = max(20, int(1_000_000 * sf))
    n_doc = max(10, int(500_000 * sf))
    n_emb = max(10, int(500_000 * sf))

    def w(name: str, cols: dict) -> None:
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))

    w("region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    w("nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })

    rng = np.random.default_rng(np.random.PCG64(1001))
    w("customer", {
        "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    })

    rng = np.random.default_rng(np.random.PCG64(1002))
    w("supplier", {
        "s_suppkey": pa.array(np.arange(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    })

    rng = np.random.default_rng(np.random.PCG64(1003))
    w("part", {
        "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
        "p_name": [
            " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), 3))
            for _ in range(n_part)
        ],
        "p_brand": [BRANDS[i] for i in rng.integers(0, len(BRANDS), n_part)],
        "p_type": [TYPES[i] for i in rng.integers(0, len(TYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    })

    rng = np.random.default_rng(np.random.PCG64(1004))
    odate = _ts(rng, "1995-01-01", 2404, n_ord)
    w("orders", {
        "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 500_000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[D]").astype("datetime64[us]"),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    })

    rng = np.random.default_rng(np.random.PCG64(1005))
    lok = rng.integers(1, n_ord + 1, n_line)
    w("lineitem", {
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_line), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_line), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_line).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": [RETURNFLAGS[i] for i in rng.integers(0, 3, n_line)],
        "l_linestatus": [LINESTATUSES[i] for i in rng.integers(0, 2, n_line)],
        "l_shipdate": (
            _ts(rng, "1995-01-02", 2400, n_line)
            .astype("datetime64[D]")
            .astype("datetime64[us]")
        ),
    })

    rng = np.random.default_rng(np.random.PCG64(1006))
    n_users = max(5, int(15 * (sf / 0.001)))
    w("events", {
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": np.sort(_ts(rng, "2024-01-01", 30, n_evt)),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_evt)],
        "value": np.round(rng.uniform(0, 100, n_evt), 3),
        "props": ["{}"] * n_evt,
    })

    rng = np.random.default_rng(np.random.PCG64(1007))
    texts = []
    for i in range(n_doc):
        n_words = int(rng.integers(8, 90))
        base = " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), n_words))
        if i % 17 == 0 and i > 0:  # plant near-duplicates for dedup ops
            base = texts[i - 1]
        texts.append(base)
    w("documents", {
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in rng.integers(1, 21, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    rng = np.random.default_rng(np.random.PCG64(1008))
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    vecs = centers[labels] + rng.normal(0, 0.4, (n_emb, 64))
    w("embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v.astype("float32") for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", type=float, default=0.001)
    args = ap.parse_args()
    build(args.out, args.sf)
    print(f"wrote {args.out} at sf={args.sf}")


if __name__ == "__main__":
    main()
