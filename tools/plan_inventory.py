"""Regenerate the catalog plan-shape inventory.

Builds every ``__spark_entry__.queries()`` entry at the smoke fixture
with the hot-table cache disabled (raw-parquet plans — the 100 TB
shape), records each query's ``plan_signature`` (shuffle / broadcast /
scan / Arrow-stage counts), and writes
``tests/fixtures/plan_inventory.json``.

``tests/test_plan_inventory.py`` compares the live catalog against
this file with EXACT equality: any drift — a new shuffle, a lost
broadcast, an extra scan, a Python stage sneaking in — fails the suite
until either the regression is fixed or this tool is deliberately
re-run and the diff reviewed/committed. Run it from the repo root:

    python tools/plan_inventory.py            # regenerate all
    python tools/plan_inventory.py q269 q106  # print (don't write) a subset
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
OUT = REPO / "tests" / "fixtures" / "plan_inventory.json"
RUNTIME_OUT = REPO / "tests" / "fixtures" / "runtime_signatures.json"

# The composed/highest-static-signature queries whose STATIC rows
# over-count (persisted subtrees printed N times): their honest number
# is the post-collect runtime signature. Regenerate with
#   python tools/plan_inventory.py --runtime
RUNTIME_QUERIES = (
    "q187_crossfold_encoding",
    "q211_bloom_dedup_against",
    "q221_pretrain_pipeline",
    "q228_curate_pack_pipeline",
    "q231_incremental_recuration",
    "q244_ccnet_buckets",
    "q282_histogram_drift",
    "q283_stream_drift",
    "q293_mutual_info",
    "q297_cluster_purity",
)


def build_inventory(spark, only: list[str] | None = None) -> dict:
    from __spark_entry__ import queries

    from dabstract_spark.plans import plan_signature
    from dabstract_spark.session import table_cache_disabled

    inv = {}
    with table_cache_disabled():
        for name, fn in sorted(queries().items()):
            if only and not any(name.startswith(p) for p in only):
                continue
            df = fn(spark, SF_SMOKE)
            inv[name] = plan_signature(df)
    return inv


def build_runtime(spark, only: list[str] | None = None) -> dict:
    from __spark_entry__ import queries

    from dabstract_spark.plans import runtime_signature
    from dabstract_spark.session import table_cache_disabled

    qs = queries()
    out = {}
    with table_cache_disabled():
        for name in RUNTIME_QUERIES:
            if only and not any(name.startswith(p) for p in only):
                continue
            out[name] = runtime_signature(qs[name](spark, SF_SMOKE))
            print(f"{name}: {out[name]}")
    return out


def main() -> None:
    args = sys.argv[1:]
    runtime = "--runtime" in args
    if runtime:
        args.remove("--runtime")
    only = args or None
    from dabstract_spark.session import get_spark

    spark = get_spark(
        "plan-inventory", extra_conf={"spark.sql.shuffle.partitions": "8"}
    )
    if runtime:
        rt = build_runtime(spark, only)
        if only:
            print(json.dumps(rt, indent=1, sort_keys=True))
        else:
            RUNTIME_OUT.write_text(json.dumps(rt, indent=1, sort_keys=True) + "\n")
            print(f"wrote {RUNTIME_OUT} ({len(rt)} queries)")
        spark.stop()
        return
    inv = build_inventory(spark, only)
    if only:
        print(json.dumps(inv, indent=1, sort_keys=True))
    else:
        OUT.write_text(json.dumps(inv, indent=1, sort_keys=True) + "\n")
        print(f"wrote {OUT} ({len(inv)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
