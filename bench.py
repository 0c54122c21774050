"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local Spark.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: relational core + the heaviest extension operators.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_nation_revenue",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from dabstract_spark.session import get_spark
    from __spark_entry__ import queries

    spark = get_spark("bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    def run(df):
        # noop sink: computes EVERY output column. count() would let
        # Catalyst prune the projections and under-measure any query
        # whose cost lives in the select list.
        df.write.format("noop").mode("overwrite").save()

    # one untimed flagship execution so one-time session costs (executor
    # deploy, codegen/JIT warmup, parquet footer reads) don't land on the
    # first timed query; every timed run below still reads data cold
    # through the same scan paths.
    run(qs[names[0]](spark, sf_dir))

    timings = {}
    for name in names:
        fn = qs[name]
        t0 = time.time()
        run(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
