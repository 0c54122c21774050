"""Folder scan as a table (reference ``get_dir_info`` /
``FolderDictSeqAbstract``, /root/reference/dabstract/dataset/helpers.py:187-400).

The reference walks a directory tree driver-side, derives
``filepath/example/filename/subdb`` per file, probes WAV headers, and
pickles the listing. Here the scan is Spark's ``binaryFile`` source —
distributed listing, column pruning (metadata-only consumers never read
file bytes), plus a ``_file_info.parquet`` cache replacing the
``file_info.pickle`` (helpers.py:377-393) with skip-if-exists/overwrite
semantics. The lazy ``data`` column of FolderDictSeqAbstract is the
``content`` binary column; decode chains (sources/readers.py) attach as
Arrow pandas UDF columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dabstract_spark import core
from dabstract_spark.dataset import Dataset

#: columns in the cached file-info table (content intentionally excluded)
_INFO_COLS = ("filepath", "filename", "example", "subdb", "n_bytes")


def _derive_path_cols(df: DataFrame, base: str, extension: str) -> DataFrame:
    """path/length -> filepath, filename, example, subdb (reference
    helpers.py:360-371's os.path derivations as string expressions)."""
    filepath = F.regexp_replace(F.col("path"), "^file:", "")
    filename = F.element_at(F.split(filepath, "/"), -1)
    example = F.regexp_replace(filename, extension.replace(".", r"\.") + "$", "")
    base_clean = base.rstrip("/")
    subdb = F.regexp_extract(
        filepath, "^" + base_clean.replace(".", r"\.") + "/(?:(.*)/)?[^/]+$", 1
    )
    return df.select(
        filepath.alias("filepath"),
        filename.alias("filename"),
        example.alias("example"),
        subdb.alias("subdb"),
        F.col("length").alias("n_bytes"),
        *(["content"] if "content" in df.columns else []),
    )


def _scan(spark: SparkSession, path: str, extension: str, with_content: bool) -> DataFrame:
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{extension}")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    if not with_content:
        # column pruning: the scan never materializes file bytes
        df = df.select("path", "length")
    out = _derive_path_cols(df, path, extension)
    # ordinal identity follows the sorted-walk order of the reference
    # (helpers.py:363-366): rank by filepath, bucketing past the common
    # base-dir prefix so the rank stage parallelizes
    return core.with_row_id(out, "filepath", prefix_skip=len(path.rstrip("/")) + 1)


def get_dir_info(
    spark: SparkSession,
    path: str,
    extension: str = ".wav",
    file_info_save_path: str | None = None,
    overwrite_file_info: bool = False,
    audio_info: bool = False,
) -> DataFrame:
    """File-listing table (row_id, filepath, filename, example, subdb,
    n_bytes [, fs, n_samples, time_step]).

    ``file_info_save_path``: parquet cache — read back when present
    unless ``overwrite_file_info`` (reference helpers.py:377-393).
    ``audio_info=True`` probes WAV headers (requires reading content;
    the result is exactly what the cache is for)."""
    if file_info_save_path and not overwrite_file_info:
        if os.path.exists(os.path.join(file_info_save_path, "_SUCCESS")):
            return spark.read.parquet(file_info_save_path)
    df = _scan(spark, path, extension, with_content=audio_info)
    if audio_info:
        from dabstract_spark.sources.readers import wav_info

        df = df.withColumn("__wi", wav_info("content")).select(
            core.ROW_ID,
            *_INFO_COLS,
            F.col("__wi.fs").alias("fs"),
            F.col("__wi.n_samples").alias("n_samples"),
            F.col("__wi.time_step").alias("time_step"),
        )
    else:
        df = df.select(core.ROW_ID, *_INFO_COLS)
    if file_info_save_path:
        df.write.mode("overwrite").parquet(file_info_save_path)
        return spark.read.parquet(file_info_save_path)
    return df


def folder_dataset(
    spark: SparkSession,
    path: str,
    extension: str = ".wav",
    name: str | None = None,
    map_fct=None,
    data_key: str = "data",
    test_only: bool = False,
) -> Dataset:
    """FolderDictSeqAbstract parity: a Dataset over the folder scan with
    the binary payload as lazy ``data`` column (active key pinned to it,
    helpers.py:283-286). ``map_fct``: a decode Column function or
    ProcessingChain applied to the bytes (e.g. sources.readers.decode_wav
    — the reference's ``ProcessingChain().add(WavDatareader())``)."""
    df = _scan(spark, path, extension, with_content=True)
    df = df.withColumnRenamed("content", data_key)
    ds = Dataset(df, name=name or path.rstrip("/").rsplit("/", 1)[-1], test_only=test_only)
    if map_fct is not None:
        ds = ds.add_map(data_key, map_fct)
    return ds.set_active_keys(data_key)


def attach_csv_metadata(
    ds: Dataset,
    csv_path: str,
    on: str | tuple[str, str] = "filepath",
    how: str = "left",
    header: bool = True,
    sep: str = ",",
    names: list[str] | None = None,
) -> Dataset:
    """Connector pattern (reference dbs/DCASE2020Task1A.py:63-71): align a
    CSV label table to the scan by equi-join on a path-derived key. The
    CSV is small — broadcast hash join, no shuffle of the scan side.

    ``on``: a shared column name, or ``(dataset_col, csv_col)`` when the
    key is named differently on each side (the CSV key column is dropped
    after the join in that case). ``sep``: field delimiter (DCASE metas
    are tab-separated). ``names``: column names for headerless files
    (reference DCASE2018Task5.py reads ``meta.txt`` with header=None)."""
    spark = ds.full_df.sparkSession
    meta = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "true")
        .option("sep", sep)
        .csv(csv_path)
    )
    if names is not None:
        meta = meta.toDF(*names)
    join_keys = set(on if isinstance(on, tuple) else (on,))
    for c in list(meta.columns):
        if c in ds.full_df.columns and c not in join_keys:
            meta = meta.drop(c)  # scan-side columns win on collision
    if isinstance(on, tuple):
        left_col, right_col = on
        meta = meta.withColumnRenamed(right_col, "__csv_key") if right_col in meta.columns else meta
        joined = ds.full_df.join(
            F.broadcast(meta), F.col(left_col) == F.col("__csv_key"), how
        ).drop("__csv_key")
    else:
        joined = ds.full_df.join(F.broadcast(meta), on=on, how=how)
    return ds._evolve(joined)
