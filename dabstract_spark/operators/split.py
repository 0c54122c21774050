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


def next_pow2(n: Column) -> Column:
    """Smallest power of two ≥ n (the reference's 'power2' constraint,
    dataset.py:287-428 via abstract.py:955-987)."""
    return F.pow(F.lit(2.0), F.ceil(F.log2(n.cast("double")))).cast("int")


def split_multi(
    df: DataFrame,
    windows: dict[str, Column],
    chunk_col: str = "chunk_id",
    drop_last_partial: bool = False,
) -> DataFrame:
    """Chunk SEVERAL array columns in one explode, each by its own
    (possibly per-row) window size, with the chunk count normalized to
    the minimum across keys — the reference add_split's min-duration
    normalization (dataset.py:379-393) and equal-length assert
    (dataset.py:412-417), which the relational form makes structural:
    one chunk_id drives every key, so alignment cannot drift.

    ``windows``: key -> window length in ELEMENTS (Column; callers
    convert seconds→samples with their rate columns first).
    """
    if not windows:
        raise ValueError("split_multi needs at least one key")
    staged = df
    n_chunk_cols = []
    for i, (key, w) in enumerate(windows.items()):
        wc, nc = f"__w{i}", f"__n{i}"
        n = F.size(F.col(key))
        w_int = w.cast("int")
        n_chunks = (
            F.floor(n / w_int) if drop_last_partial else F.ceil(n / w_int.cast("double"))
        ).cast("int")
        staged = staged.withColumn(wc, w_int).withColumn(nc, n_chunks)
        n_chunk_cols.append(nc)
    total = F.least(*[F.col(c) for c in n_chunk_cols]) if len(n_chunk_cols) > 1 else F.col(n_chunk_cols[0])
    out = staged.withColumn(chunk_col, F.explode(_safe_seq(0, total - 1)))
    for i, key in enumerate(windows):
        wc = f"__w{i}"
        out = out.withColumn(
            key, F.slice(F.col(key), F.col(chunk_col) * F.col(wc) + 1, F.col(wc))
        )
    drop = [c for i in range(len(windows)) for c in (f"__w{i}", f"__n{i}")]
    return out.drop(*drop)


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
