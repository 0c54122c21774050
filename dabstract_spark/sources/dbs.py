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


# ------------------------------------------------------------------ #
# Concrete DCASE dev-set connector trio (reference dbs/DCASE2020Task1A.py,
# DCASE2020Task1B.py, DCASE2018Task5.py): named dataset classes with a
# `prepare` (download) hook, metadata alignment, and stringlist2ind label
# codes — the first thing a user porting a dabstract project reaches for.
# ------------------------------------------------------------------ #
class DCASEDevSet:
    """Shared skeleton for DCASE-style dev sets: a flat ``audio/`` wav
    folder plus a tab-separated meta table keyed by ``audio/<filename>``.

    Reference flow parity (dataset.py:118-119 runs ``self.prepare(paths)``
    before ``set_data``): ``build`` calls ``cls.prepare`` first. The
    reference's prepare downloads via ``dcase_util`` (DCASE2020Task1A.py:
    82-88); network fetch is environment-specific, so here the fetch step
    is INJECTED — pass ``downloader=callable(paths)`` and it runs exactly
    once, iff the data dir is absent (idempotent like the reference's
    ``initialize()``); with the data already on disk prepare is a no-op;
    with neither, a clear FileNotFoundError explains what to provide.

    Labels follow the reference column-for-column: the meta's label
    columns are broadcast-joined onto the scan, and ``scene_id`` /
    ``group`` are stringlist2ind dense codes (window-free
    ``core.dense_codes``) of the scene / identifier domains.
    """

    META_FILE = "meta.csv"
    META_SEP = "\t"
    META_HEADER = True
    META_NAMES: list[str] | None = None  # for headerless metas
    FILENAME_COL = "filename"
    SCENE_COL = "scene_label"
    GROUP_COL = "identifier"

    def __init__(self, spark: SparkSession, paths: dict, test_only: bool = False, **kw):
        self.dataset = self.build(spark, paths, test_only=test_only, **kw)

    @classmethod
    def prepare(cls, paths: dict, downloader=None) -> bool:
        """Ensure the data exists; returns True iff the downloader ran."""
        import os

        data = paths.get("data", "")
        meta = paths.get("meta") or (
            os.path.join(os.path.dirname(data.rstrip("/")), cls.META_FILE) if data else ""
        )
        if os.path.isdir(data) and os.path.isfile(meta):
            return False
        if downloader is not None:
            downloader(paths)
            if not (os.path.isdir(data) and os.path.isfile(meta)):
                raise FileNotFoundError(
                    f"{cls.__name__}.prepare: downloader ran but {data} / {meta} still missing"
                )
            return True
        raise FileNotFoundError(
            f"{cls.__name__}.prepare: no data at {data!r} (meta {meta!r}). This "
            "environment performs no network fetches — pass "
            "downloader=callable(paths) (e.g. a dcase_util/zenodo wrapper) "
            "or stage the dev set on disk first."
        )

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        paths: dict,
        test_only: bool = False,
        downloader=None,
        name: str | None = None,
        **kw,
    ) -> Dataset:
        import os

        if not paths or "data" not in paths:
            raise ValueError(f"{cls.__name__} needs paths={{'data': <audio dir>[, 'meta': <meta file>]}}")
        cls.prepare(paths, downloader)
        meta_path = paths.get("meta") or os.path.join(
            os.path.dirname(paths["data"].rstrip("/")), cls.META_FILE
        )
        ds = folder_dataset(
            spark,
            paths["data"],
            extension=".wav",
            name=name or cls.__name__,
            test_only=test_only,
        ).reset_active_keys()
        # DCASE metas key rows as 'audio/<filename>' (the reference
        # reindexes on exactly that string, DCASE2020Task1A.py:63-71)
        ds = ds.add("relpath", F.concat(F.lit("audio/"), F.col("filename")))
        ds = attach_csv_metadata(
            ds,
            meta_path,
            on=("relpath", cls.FILENAME_COL),
            sep=cls.META_SEP,
            header=cls.META_HEADER,
            names=cls.META_NAMES,
        )
        ds = _dense_label_ids(ds, cls.SCENE_COL, "scene_id")
        grp_codes = dense_codes(ds.full_df, cls.GROUP_COL, "group").withColumnRenamed(
            cls.GROUP_COL, "__gval"
        )
        joined = ds.full_df.join(
            F.broadcast(grp_codes), F.col(cls.GROUP_COL) == F.col("__gval"), "left"
        ).drop("__gval")
        return ds._evolve(joined)


class DCASE2020Task1A(DCASEDevSet):
    """Acoustic scene classification dev set (reference
    dbs/DCASE2020Task1A.py:42-88): meta.csv with filename / scene_label /
    identifier / source_label; scene_id + group label codes."""


class DCASE2020Task1B(DCASEDevSet):
    """Same dev-set layout as Task1A (reference dbs/DCASE2020Task1B.py —
    identical set_data; the tasks differ in the downloaded archive)."""


class DCASE2018Task5(DCASEDevSet):
    """Domestic-activity dev set (reference dbs/DCASE2018Task5.py:42-87):
    HEADERLESS tab meta.txt (filename, scene, identifier); group codes
    over the recording session identifier."""

    META_FILE = "meta.txt"
    META_HEADER = False
    META_NAMES = ["filename", "scene", "identifier"]
    SCENE_COL = "scene"
    GROUP_COL = "identifier"
