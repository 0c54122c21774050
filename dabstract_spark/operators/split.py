"""Cardinality-changing operators: split / replicate / framing.

Reference: ``SplitAbstract`` / ``SampleReplicateAbstract`` / ``add_split``
(/root/reference/dabstract/abstract/abstract.py:746-1121,
/root/reference/dabstract/dataset/dataset.py:287-428) and the ``Framing``
processor (/root/reference/dabstract/dataprocessor/processors/processors.py:198-261).

In the relational model a split is ONE ``explode`` of the whole row, so
the reference's elaborate bookkeeping (per-example chunk counts, sample
replication of non-split columns, equal-length asserts) is free: every
non-split column is replicated automatically, and alignment across keys
holds by construction. ``explode`` is a built-in UDTF — whole-stage
codegen'd, no Python in the loop, linear shuffle-free scale-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _safe_seq(start: int, stop_col: Column) -> Column:
    """sequence(start, stop) that yields an EMPTY array when stop < start.
    Bare F.sequence descends in that case (sequence(0,-1) == [0,-1]), which
    would emit spurious rows for empty/short inputs instead of none."""
    return F.when(
        stop_col >= start, F.sequence(F.lit(start), stop_col)
    ).otherwise(F.array().cast("array<int>"))


def split_array(
    df: DataFrame,
    key: str,
    split_size: int,
    chunk_col: str = "chunk_id",
    drop_last_partial: bool = False,
) -> DataFrame:
    """Chop each row's array ``key`` into consecutive ``split_size`` chunks
    (reference SplitAbstract, type='samples'). One row per chunk; all other
    columns replicate. ``drop_last_partial`` mirrors the reference's
    constraint that only full windows are kept when lengths are ragged.
    """
    n = F.size(F.col(key))
    n_chunks = (
        F.floor(n / split_size) if drop_last_partial else F.ceil(n / F.lit(split_size))
    ).cast("int")
    out = df.withColumn(chunk_col, F.explode(_safe_seq(0, n_chunks - 1)))
    return out.withColumn(
        key, F.slice(F.col(key), F.col(chunk_col) * split_size + 1, split_size)
    )


def split_text(
    df: DataFrame, key: str, split_size: int, chunk_col: str = "chunk_id"
) -> DataFrame:
    """Same semantics over a string column (document chunking)."""
    n = F.length(F.col(key))
    n_chunks = F.ceil(n / F.lit(split_size)).cast("int")
    out = df.withColumn(chunk_col, F.explode(_safe_seq(0, n_chunks - 1)))
    return out.withColumn(
        key, F.substring(F.col(key), F.col(chunk_col) * split_size + 1, split_size)
    )


def sample_replicate(df: DataFrame, factor: int | Column, rep_col: str = "replica_id") -> DataFrame:
    """Repeat each row ``factor`` times (scalar or per-row Column expression)
    — reference SampleReplicateAbstract (abstract.py:746-883). replica_id
    is 1-based like the reference's repetition index."""
    fcol = (F.lit(factor) if isinstance(factor, int) else factor).cast("int")
    return df.withColumn(rep_col, F.explode(_safe_seq(1, fcol)))


def frame_array(
    df: DataFrame,
    key: str,
    frame_size: int,
    step: int,
    frame_col: str = "frame_id",
    out_key: str | None = None,
) -> DataFrame:
    """Overlapping sliding frames within each row's array — the reference
    ``Framing`` processor as an explode (one row per frame). Frame count
    follows numpy framing: 1 + floor((n - frame_size)/step); rows shorter
    than one frame produce no output."""
    n = F.size(F.col(key))
    n_frames = (F.floor((n - frame_size) / step) + 1).cast("int")
    out = df.filter(n >= frame_size).withColumn(
        frame_col, F.explode(_safe_seq(0, n_frames - 1))
    )
    return out.withColumn(
        out_key or key, F.slice(F.col(key), F.col(frame_col) * step + 1, frame_size)
    )
