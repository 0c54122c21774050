"""Concrete named dataset connectors (reference ``dabstract/dataset/dbs/``,
e.g. DCASE2020Task1A.py:42-80): end-to-end worked examples that compose
folder scan + CSV metadata join + label derivation + ``test_only`` into
one registered builder a config can name.

The reference connector interpolates labels row-by-row in Python
(``filenames.index(...)`` reindex, DCASE2020Task1A.py:63-71); here the
alignment is a broadcast equi-join and the label dictionary-encodes are
``dense_rank`` window expressions — everything stays one Catalyst plan.
At scale the scan side never shuffles: the CSV side is broadcast and the
dense_rank runs over the distinct label values only (tiny), joined back
broadcast.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from dabstract_spark.core import dense_codes
from dabstract_spark.dataset import Dataset
from dabstract_spark.sources.folder import attach_csv_metadata, folder_dataset


def _dense_label_ids(ds: Dataset, col: str, out_col: str) -> Dataset:
    """stringlist2ind parity (reference utils.py): dense 0-based int codes
    in sorted-value order. Computed window-free on the DISTINCT values
    (core.dense_codes: count-of-smaller self-join on the tiny label
    domain), broadcast-joined back — neither a window over the full scan
    NOR a single-partition WindowExec over the dictionary."""
    df = ds.full_df
    codes = dense_codes(df, col, out_col).withColumnRenamed(col, "__val")
    joined = df.join(F.broadcast(codes), F.col(col) == F.col("__val"), "left").drop("__val")
    return ds._evolve(joined)


class AnomalyAudioDB:
    """Named connector over an anomaly-labeled audio folder tree
    (layout: ``<data>/<subdb>/<example>.wav`` + ``<meta>`` CSV with
    columns filepath,subdb,anomaly — the committed tests/fixtures/audiodb
    shape, mirroring the reference's DCASE dev-set layout).

    Composes, in one declarative plan:
      1. folder scan (filepath/filename/subdb/example + binary payload)
      2. broadcast CSV label join on the relative path
      3. label derivation: ``anomaly`` plus dense int codes for the
         scene/``subdb`` grouping (stringlist2ind parity)
      4. ``test_only`` marking for mixed-corpus xval

    Builder signature matches the ``_DATASETS`` registry:
    ``AnomalyAudioDB.build(spark, paths={'data':…, 'meta':…}, test_only=…)``.
    """

    def __init__(self, spark: SparkSession, paths: dict, test_only: bool = False, **kw):
        self.dataset = self.build(spark, paths, test_only=test_only, **kw)

    @staticmethod
    def build(
        spark: SparkSession,
        paths: dict,
        test_only: bool = False,
        extension: str = ".wav",
        name: str | None = None,
        **kw,
    ) -> Dataset:
        if not paths or "data" not in paths or "meta" not in paths:
            raise ValueError("AnomalyAudioDB needs paths={'data': dir, 'meta': labels.csv}")
        ds = folder_dataset(
            spark,
            paths["data"],
            extension=extension,
            name=name or "AnomalyAudioDB",
            test_only=test_only,
        ).reset_active_keys()
        ds = ds.add("relpath", F.concat_ws("/", F.col("subdb"), F.col("filename")))
        ds = attach_csv_metadata(ds, paths["meta"], on=("relpath", "filepath"))
        ds = _dense_label_ids(ds, "subdb", "scene_id")
        ds = ds.add("group", F.col("scene_id"))
        return ds


def _anomaly_audio_db(spark, paths, test_only=False, name=None, **kw) -> Dataset:
    """Registry adapter: builder(spark, paths, test_only, **kw) -> Dataset."""
    return AnomalyAudioDB.build(spark, paths or {}, test_only=test_only, name=name, **kw)
