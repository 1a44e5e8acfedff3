"""Micro-bench: Bloom bitmap literal representations (VERDICT r11 #4).

Times (a) literal creation, (b) plan analysis, (c) a 10M-row probe
for the three candidate representations of the bitmap:

  per-word   F.array(*[F.lit(w) for w in packed])  — r11 shipped form
  list-lit   F.lit(packed)                          — one call, but
             PySpark converts element-wise through py4j
  bytes-lit  F.lit(struct.pack('<Nq', *packed))     — one array copy
             (r12 shipped form; probe decodes one byte per hash)

Representative r12 numbers on this host (local[32], 128 GiB):

  m bits   words    per-word     list-lit    bytes-lit (pack+lit)
  2^16      1024     2.0 s        0.6 s       0.004 s
  2^18      4096     6.7 s        2.0 s       0.01  s
  2^20     16384     (minutes)    7.9 s       0.01  s
  2^22     65536     —           29.9 s       0.04  s
  2^27   2097152     —            —           0.36  s

Plan analysis is flat (~0.07 s) for bytes-lit at every size; probe
throughput costs +13 ns/row vs array element_at (0.48 s vs 0.35 s per
10M rows warm). Conclusion: the bytes literal removes the plan-size
wall entirely, so `build_bloom`'s max_bits=2^27 guard is a genuine
memory bound rather than an analysis cliff. Run:

    python tools/bloom_literal_bench.py
"""

from __future__ import annotations

import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from healthcare_research_data_pipeline_project_spark.operators.scale import (  # noqa: E402
    bloom_might_contain,
)
from healthcare_research_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    spark = get_spark()
    fact = spark.range(10_000_000).select(F.col("id").alias("k"))
    word = 0x5555555555555555 - (1 << 63)  # sign-bit-set pattern
    for exp in (16, 18, 20, 22, 24, 27):
        nwords = (1 << exp) // 64
        packed = [word] * nwords

        t0 = time.time()
        blob = struct.pack(f"<{nwords}q", *packed)
        blit = F.lit(blob)
        t_make = time.time() - t0

        t0 = time.time()
        d = fact.withColumn("__b", blit).filter(
            bloom_might_contain("k", "__b", 1 << exp)
        )
        d._jdf.queryExecution().executedPlan()
        t_plan = time.time() - t0

        t0 = time.time()
        kept = d.count()
        t_exec = time.time() - t0
        print(
            f"bytes-lit m=2^{exp} ({nwords} words): make {t_make:.3f}s "
            f"plan {t_plan:.2f}s probe-10M {t_exec:.2f}s kept {kept}"
        )

        if exp <= 20:  # list-lit comparison; minutes-slow beyond this
            t0 = time.time()
            llit = F.lit(packed)
            d2 = fact.withColumn("__b2", llit)
            d2._jdf.queryExecution().executedPlan()
            print(f"list-lit  m=2^{exp}: make+plan {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
