"""Sequence packing: map documents into fixed-capacity training context
windows ("concat-and-chunk"), the standard LLM pre-training layout.

The core primitive is an EXACT distributed prefix sum. A naive global
cumulative sum (``Window.orderBy(...)`` with no partition key) collapses
the whole table into one task — the classic single-partition window
scale bug. Here the sum is computed block-wise instead:

1. rows are grouped into blocks by ``order_col`` value range (pure
   map-side arithmetic, no shuffle beyond the window's own);
2. a windowed cumsum *within* each block (one shuffle on the block id,
   local sorts only — every block is bounded);
3. per-block totals are aggregated (map-side partial agg, n_blocks tiny
   rows), collected, exclusive-prefix-summed on the driver, and
   broadcast-joined back.

The only driver-side state is one row per block: with ``block_size`` =
1M ordinals, a 10^12-row table needs 10^6 block rows (~16 MB) — the
same K-row-collect shape as the IVF centroid table. Everything row-scale
stays in whole-stage codegen.

Reference parallel: dabstract's SplitAbstract/frame bookkeeping computes
per-example split offsets with ``np.cumsum`` on the driver
(/root/reference/dabstract/abstract/abstract.py:480-520); this is the
shuffle-safe distributed analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def block_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "cum",
    block_size: int = 65536,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` in ``order_col`` order.

    Contract: ``order_col`` is an integral column with UNIQUE, non-NULL
    values (a doc id / ordinal). Ties would make "the" prefix sum
    ill-defined; uniqueness makes the result deterministic and
    oracle-checkable against ``SUM(...) OVER (ORDER BY order_col)``.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    blk = F.floor(F.col(order_col) / F.lit(block_size)).alias("__blk")
    with_blk = df.withColumn("__blk", blk).withColumn("__v", val.cast("bigint"))

    # per-block totals: map-side combine shrinks this to n_blocks rows
    # before the (tiny) shuffle; the collect is K rows, not data-scale.
    totals = (
        with_blk.groupBy("__blk").agg(F.sum("__v").alias("__tot")).collect()
    )
    running = 0
    offsets = []
    for row in sorted(totals, key=lambda r: r["__blk"]):
        offsets.append((row["__blk"], running))
        running += row["__tot"] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__blk bigint, __off bigint")

    w = (
        Window.partitionBy("__blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_blk.withColumn("__loc", F.sum("__v").over(w))
        .join(F.broadcast(off_df), "__blk")
        .withColumn(out_col, F.col("__loc") + F.col("__off"))
        .drop("__blk", "__v", "__loc", "__off")
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    capacity: int,
    block_size: int = 65536,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out in ``id_col``
    order into one virtual token stream, then cut into context windows
    of ``capacity`` tokens (documents may span a window boundary, as in
    standard LLM pre-training).

    Returns one row per document:
      id_col, n_tokens, start_offset (0-based position in the stream),
      first_chunk / last_chunk (window indices it lands in), n_chunks.

    Zero-token documents sit at a boundary without occupying space:
    first_chunk == last_chunk == the window of their start offset.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    cum = block_prefix_sum(
        df.withColumn("__n", tok.cast("bigint")),
        id_col,
        "__n",
        out_col="__end",
        block_size=block_size,
    )
    start = F.col("__end") - F.col("__n")
    last = F.when(
        F.col("__n") > 0, F.floor((F.col("__end") - 1) / capacity)
    ).otherwise(F.floor(start / capacity))
    return (
        cum.withColumn("n_tokens", F.col("__n"))
        .withColumn("start_offset", start)
        .withColumn("first_chunk", F.floor(start / capacity))
        .withColumn("last_chunk", last)
        .withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + F.lit(1))
        .drop("__n", "__end")
    )
