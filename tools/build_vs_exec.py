"""Split each query's wall time into DataFrame BUILD time (python-side
plan construction incl. py4j chatter and any eager setup the query does)
vs EXECUTION time (noop-sink action) — guide §1 empirical decomposition
for a high-IPC-latency environment.

Usage: python tools/build_vs_exec.py [sf_dir] [query_prefix ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    from __spark_entry__ import queries

    from dabstract_spark.session import get_spark

    spark = get_spark("buildexec")
    qs = queries()
    names = [n for n in sorted(qs) if not only or any(n.startswith(p) for p in only)]

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    try:
        run(qs[names[0]](spark, sf_dir))
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _warm(s):
            return s

        run(spark.range(256).select(_warm(F.col("id").cast("double"))))
    except Exception:
        pass

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t1 = time.time()
            run(df)
            t2 = time.time()
            print(
                json.dumps(
                    {
                        "q": name,
                        "build": round(t1 - t0, 2),
                        "exec": round(t2 - t1, 2),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "err": str(exc)[:160]}), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
