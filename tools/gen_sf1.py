"""Generate /tmp/sf1: a 10x FK-consistent self-union of the sf0.1
fixtures (TPC-H-style scaling: region/nation fixed, every other table
x10 with per-copy key offsets so PK/FK relationships stay intact
within each copy). Purpose: the r10 VERDICT's sf1 stretch — run the
data-sized query subset through check_oracle at ~6M lineitem /
~50k documents, one order of magnitude past the sf0.1 gate.

Deterministic; rerunning overwrites. Events keep their global
time-order (the streaming source contract) by re-sorting the union on
ts before the single-file write.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

OFF = 10_000_000
COPIES = 10
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

# table -> columns to offset per copy (PKs and the FKs that reference
# a scaled table; n_nationkey/r_regionkey stay — dims are fixed)
OFFSETS = {
    "region": None,  # fixed dim: single copy
    "nation": None,  # fixed dim: single copy
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    from dabstract_spark.session import get_spark, load_table

    spark = get_spark("gen-sf1", extra_conf={"spark.sql.shuffle.partitions": "32"})
    for t, keys in OFFSETS.items():
        df = load_table(spark, SRC, t)
        if keys is None:
            out = df
        else:
            parts = []
            for c in range(COPIES):
                p = df
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(c * OFF))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        writer = out
        if t == "events":
            writer = out.orderBy("ts")
        writer.coalesce(1).write.mode("overwrite").parquet(f"{DST}/_{t}")
        # check_oracle expects {table}.parquet FILES: move the part file
        import glob
        import shutil

        part = glob.glob(f"{DST}/_{t}/part-*.parquet")[0]
        shutil.move(part, f"{DST}/{t}.parquet")
        shutil.rmtree(f"{DST}/_{t}")
        print(f"{t}: done")
    spark.stop()


if __name__ == "__main__":
    main()
