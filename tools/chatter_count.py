"""Deterministic driver-chatter profile: py4j round trips + Spark jobs
per query.

Wall-clock on this round's host swings ±2-3x run-to-run (vCPU steal),
so before/after evidence for driver-side optimizations uses DETERMINISTIC
counters instead: the number of py4j commands sent (every one pays the
host's ~0.5-6 ms loopback round trip) during (a) DataFrame construction
and (b) execution, plus the number of Spark jobs run. These counts are
reproducible to within a few calls on any host.

Usage: python tools/chatter_count.py [sf_dir] [query_prefix ...]
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

    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, command):
        counter["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counted

    from __spark_entry__ import queries

    from dabstract_spark.session import get_spark

    spark = get_spark("chatter")
    sc = spark.sparkContext
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

    tracker = sc.statusTracker()
    for name in names:
        fn = qs[name]
        sc.setJobDescription(name)
        j0 = tracker.getJobIdsForGroup(None)
        n0 = counter["n"]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n1 = counter["n"]
            t1 = time.time()
            run(df)
            n2 = counter["n"]
            t2 = time.time()
            jobs = len(set(tracker.getJobIdsForGroup(None)) - set(j0))
            print(
                json.dumps(
                    {
                        "q": name,
                        "rt_build": n1 - n0,
                        "rt_exec": n2 - n1,
                        "jobs": jobs,
                        "wall": round(t2 - t0, 2),
                    }
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "err": str(exc)[:160]}), flush=True)
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
