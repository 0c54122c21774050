"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping (SURVEY §4 / 100 TB posture; no reference analog — the
reference never manages physical layout).

Why this matters at scale: parquet row-group pruning works off per-file
min/max statistics, which a sort can only make selective for ONE column.
Interleaving the bits of two (or more) quantized columns and sorting by
the interleaved value bounds the min/max *range of every participating
column* per file — the standard lakehouse trick for multi-dimensional
predicates. Everything here is pure JVM bit arithmetic (shift/and/or
unrolled per bit), whole-stage-codegen friendly, oracle-expressible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code of two pre-quantized values in [0, 2^bits): bit i of
    x lands at position 2i, bit i of y at 2i+1. Unrolled shift/and/add —
    no UDF, no loop at runtime."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_value_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Morton arithmetic as engine-portable SQL text."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({y}) >> {i}) & 1) << {2 * i + 1}")
    return "CAST(" + " + ".join(f"({t})" for t in terms) + " AS BIGINT)"


def quantize_minmax(df: DataFrame, col: str, bits: int = 8) -> tuple[DataFrame, Column]:
    """Rank-free quantization of a numeric column to [0, 2^bits) by a
    broadcast (min, max) aggregate — deterministic (no sampled range
    boundaries), two tiny jobs, zero data shuffle. Returns (df', expr);
    df' carries the broadcast bounds columns the expr references."""
    lo, hi = f"__lo_{col}", f"__hi_{col}"
    mm = df.select(
        F.min(F.col(col)).cast("double").alias(lo),
        F.max(F.col(col)).cast("double").alias(hi),
    )
    out = df.crossJoin(F.broadcast(mm))
    width = (F.col(hi) - F.col(lo)) + F.lit(1e-9)
    n = 1 << bits
    q = F.least(
        F.greatest(
            F.floor((F.col(col).cast("double") - F.col(lo)) / width * n), F.lit(0)
        ),
        F.lit(n - 1),
    ).cast("int")
    return out, q


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet physically clustered by the Z-order of
    two numeric columns: quantize each by its global min/max, compute
    the Morton code, range-partition on it (so files own contiguous
    Z ranges → tight per-file min/max on BOTH columns) and sort within
    partitions. Readers with predicates on either column then skip
    files/row-groups via ordinary parquet stats — no engine changes.
    """
    d1, q1 = quantize_minmax(df, cols[0], bits)
    d2, q2 = quantize_minmax(d1.withColumn("__q1", q1), cols[1], bits)
    z = d2.withColumn("__z", zorder_value(F.col("__q1"), q2, bits)).drop(
        f"__lo_{cols[0]}", f"__hi_{cols[0]}", f"__lo_{cols[1]}", f"__hi_{cols[1]}", "__q1"
    )
    n = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        z.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_files: int,
) -> DataFrame:
    """Small-file compaction — the lakehouse maintenance pass that keeps
    scan parallelism healthy after many incremental appends: rewrite a
    parquet directory into exactly ``target_files`` files and return a
    one-row AUDIT DataFrame (row count, content checksum, file count)
    proving the rewrite lost nothing. The repartition is the only
    shuffle; at scale you'd run this per partition-directory, each an
    independent job. The checksum is an order-independent integer sum,
    so it is engine/partitioning-invariant."""
    from pyspark.sql import functions as F

    spark.read.parquet(src_path).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(dst_path)
    compacted = spark.read.parquet(dst_path)
    n_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(dst_path)
        .count()
    )
    first_col = compacted.columns[0]
    return compacted.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.col(first_col).cast("bigint")).alias("id_sum"),
    ).select(
        "total_rows", "id_sum", F.lit(int(n_files)).cast("int").alias("n_files")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    digest: Column | str,
) -> DataFrame:
    """Row-level delta between two corpus snapshots: one
    (``key_col``, status) row per key, status in
    added / removed / changed / unchanged.

    ``digest`` is the content fingerprint expression evaluated on BOTH
    sides (e.g. ``F.md5("text")``) — the comparison shuffles only
    (key, 32-byte digest) pairs, never the payload, so diffing a 100 TB
    corpus moves gigabytes, not terabytes. The full-outer join is the
    one shuffle; with both snapshots written bucketed by key
    (sources/bucketed.py) it degrades to a co-located zipper with no
    shuffle at all. This is the discovery half of an incremental rerun:
    downstream stages reprocess only added/changed keys (see
    q231_incremental_recuration) instead of rescanning the corpus."""
    dg = F.col(digest) if isinstance(digest, str) else digest
    o = old.select(F.col(key_col), dg.alias("__dg_old"), F.lit(1).alias("__in_old"))
    n = new.select(F.col(key_col), dg.alias("__dg_new"), F.lit(1).alias("__in_new"))
    j = o.join(n, key_col, "full_outer")
    # presence comes from the marker columns, not digest nullability, so
    # a present row with a NULL fingerprint is never misread as added
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__dg_old").eqNullSafe(F.col("__dg_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key_col, status.alias("status"))


def shard_manifest(
    df: DataFrame,
    key_col: str,
    digest: Column | str,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Deterministic output-sharding manifest: assign every row a
    md5-derived shard in [0, n_shards) and emit one row per shard with
    (n_rows, checksum) where the checksum is the SUM of each member's
    digest folded to a 60-bit int, accumulated exactly in decimal(38,0)
    (the repo-wide overflow-proof accumulator discipline) — order- and
    partitioning-independent, so
    two independent runs (or engines) writing the same logical corpus
    produce bit-identical manifests. This is the reproducibility audit
    for a 100 TB materialization: re-run the manifest, compare 64 tiny
    rows instead of re-reading shards. One groupBy on the shard id is
    the only shuffle, carrying (shard, partial sums) after map-side
    combine."""
    from dabstract_spark.functions.hashing import md5_bucket

    dg = F.col(digest) if isinstance(digest, str) else digest
    fold = F.conv(F.substring(F.md5(dg.cast("string")), 1, 15), 16, 10).cast("bigint")
    rows = df.select(
        md5_bucket(F.col(key_col), n_shards, seed=seed).alias("shard"),
        fold.alias("__h"),
    )
    return rows.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__h").cast("decimal(38,0)")).alias("checksum"),
    )


def snapshot_apply(
    old: DataFrame,
    diff: DataFrame,
    delta: DataFrame,
    key_col: str,
) -> DataFrame:
    """Reconstruct the NEW snapshot from the OLD one plus a delta — the
    apply half of :func:`snapshot_diff`: keep old rows whose diff status
    is 'unchanged' (one semi-join on the key) and union the delta rows
    (the new-side content for added/changed keys). Removed keys vanish
    because only 'unchanged' survives the semi-join.

    Roundtrip law (unit/property-tested, and hash-checked end-to-end by
    q235_snapshot_roundtrip): ``apply(old, diff(old, new), delta) ==
    new`` exactly, where delta = new rows with status added/changed.
    This is what makes incremental reruns safe at 100 TB: the rebuilt
    corpus is provably identical to a full recompute while touching only
    O(delta) payload bytes — old content never moves, and the audit
    compares order-independent checksums, not corpora."""
    unchanged = old.join(
        diff.filter(F.col("status") == "unchanged").select(key_col),
        key_col,
        "left_semi",
    )
    return unchanged.unionByName(delta)
