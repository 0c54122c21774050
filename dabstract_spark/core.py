"""Row-identity discipline.

The reference's semantics are ordinal (integer indexing, positional fold
masks, concat offsets — /root/reference/dabstract/abstract/abstract.py:1242-1248).
Spark rows are unordered, so ordinal identity is reified as an explicit
``row_id BIGINT`` column. Everything positional (index selects, slices,
fold masks, concat offsets) routes through it.

Scale notes
-----------
``row_number() over (ORDER BY key)`` with no partitioning collapses to a
single task — unusable at 100 TB. ``with_row_id`` therefore uses a
two-pass distributed scheme: range-partition + sort by the ordering key,
count rows per partition (small driver-side array), then assign
``partition_offset + local_index`` with a mapInPandas pass. One shuffle,
no single-task stage, deterministic for a total ordering key.

When the table already has a unique orderable key (``o_orderkey``,
``doc_id``…) prefer ``row_id_from_key`` — zero extra work and stable
across runs, which positional derivation can never be under re-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROW_ID = "row_id"


def row_id_from_key(df: DataFrame, key: str) -> DataFrame:
    """Adopt an existing unique integer key as the ordinal row id (free)."""
    return df.withColumn(ROW_ID, F.col(key).cast("bigint"))


def with_row_id(df: DataFrame, order_by: str | list[str]) -> DataFrame:
    """Assign a dense 0-based ``row_id`` following ``order_by``, distributed.

    Two jobs: (1) per-partition counts after a range-partitioned sort,
    (2) offsetted local enumeration. No global single-partition window.
    """
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    npart = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    sorted_df = df.repartitionByRange(npart, *cols).sortWithinPartitions(*cols)

    # Pass 1: rows per physical partition (tiny result to the driver).
    counts = (
        sorted_df.rdd.mapPartitionsWithIndex(
            lambda pid, it: [(pid, sum(1 for _ in it))]
        ).collect()
    )
    offsets = {}
    acc = 0
    for pid, n in sorted(counts):
        offsets[pid] = acc
        acc += n
    sc = df.sparkSession.sparkContext
    b_offsets = sc.broadcast(offsets)

    # Pass 2: offset + local index. (RDD zipWithIndex does the same two-job
    # dance internally; doing it explicitly keeps the DataFrame schema.)
    schema = sorted_df.schema.add(ROW_ID, "long", False)

    def number(pid, it):
        base = b_offsets.value.get(pid, 0)
        for i, row in enumerate(it):
            yield (*row, base + i)

    return df.sparkSession.createDataFrame(
        sorted_df.rdd.mapPartitionsWithIndex(number), schema
    )


def slice_filter(df: DataFrame, start=None, stop=None, step=None) -> DataFrame:
    """Ordinal slice ``[start:stop:step]`` as a pushdown-friendly filter on
    ``row_id`` (reference: slice selectors, abstract.py:1242-1248)."""
    out = df
    s = 0 if start is None else start
    if start is not None:
        out = out.filter(F.col(ROW_ID) >= start)
    if stop is not None:
        out = out.filter(F.col(ROW_ID) < stop)
    if step is not None and step != 1:
        out = out.filter((F.col(ROW_ID) - F.lit(s)) % step == 0)
    return out


def select_indices(df: DataFrame, indices) -> DataFrame:
    """Explicit index-array selection (reference SelectAbstract with an index
    list) as a broadcast semi-join on row_id. The index list is a small
    driver-side artifact, so broadcast is always right."""
    spark = df.sparkSession
    idx_df = spark.createDataFrame([(int(i),) for i in indices], f"{ROW_ID} long")
    return df.join(F.broadcast(idx_df), ROW_ID, "left_semi")
