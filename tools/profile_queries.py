"""Per-query profiling harness for the optimization rounds (guide §1).

Times each named query (or the full catalog) through the same noop sink
bench.py uses, labels jobs (setJobDescription), and optionally captures
``explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt so plan
claims in OPTIMIZATION_r*.md are reproducible by a reader without Spark.

Usage:
    python tools/profile_queries.py [--plans TAG --suffix before] \
        [--reps N] [sf_dir] [query_name_prefix ...]

Timings go to stdout as one JSON line per query:
    {"q": name, "secs": [..], "best": s}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    args = sys.argv[1:]
    plans_tag = None
    suffix = "before"
    reps = 1
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_tag = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = args[1:]

    from __spark_entry__ import queries

    from dabstract_spark.session import get_spark

    spark = get_spark("profile")
    qs = queries()
    names = [
        n
        for n in sorted(qs)
        if not only or any(n.startswith(p) for p in only)
    ]

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmup as bench.py: session infrastructure off the first cell
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

    plans_dir = None
    if plans_tag:
        plans_dir = REPO / "plans" / plans_tag
        plans_dir.mkdir(parents=True, exist_ok=True)

    total = 0.0
    for name in names:
        fn = qs[name]
        secs = []
        spark.sparkContext.setJobDescription(name)
        err = None
        for _ in range(reps):
            t0 = time.time()
            try:
                run(fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                err = f"{type(exc).__name__}: {exc}"[:200]
                break
            secs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if plans_dir is not None and err is None:
            try:
                txt = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                    fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
                )
            except Exception:
                df = fn(spark, sf_dir)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            (plans_dir / f"{name}_{suffix}.txt").write_text(txt)
        row = {"q": name, "secs": secs}
        if secs:
            row["best"] = min(secs)
            total += min(secs)
        if err:
            row["err"] = err
        print(json.dumps(row), flush=True)
    print(json.dumps({"q": "__total_best__", "best": round(total, 2)}))


if __name__ == "__main__":
    main()
