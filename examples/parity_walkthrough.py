"""Side-by-side parity walkthrough: dabstract -> dabstract_spark.

Mirrors the reference's ``examples/introduction/Readme_3_dataset.py``
(and the operator tour of ``Readme_2_data_abstracts.py``) end-to-end on
the committed WAV fixture ``tests/fixtures/audiodb`` — the engine's
stand-in for the reference's generated EXAMPLE dataset (two subdbs,
normal/abnormal, a labels CSV, 800 Hz tones).

Every section quotes the dabstract call it reproduces in the comment
directly above the engine call, citing the reference script line. Run
it directly (``python examples/parity_walkthrough.py``) or through its
CI test (``tests/test_parity_walkthrough.py``), which asserts each
section's output shape.

Reference: /root/reference/examples/introduction/Readme_3_dataset.py
(sections 1-8), Readme_2_data_abstracts.py (map/select/split idioms).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "audiodb",
)


def build_db(spark, feat_dir: str | None = None):
    """The engine's EXAMPLE-dataset constructor.

    dabstract (Readme_3_dataset.py:14-17 via custom/dataset/dbs/EXAMPLE.py):
        db = EXAMPLE(paths={'data': ..., 'meta': ...})
        # EXAMPLE.set_data:
        #   chain = ProcessingChain().add(WavDatareader())
        #   tmp = FolderDictSeqAbstract(paths['data'], map_fct=chain, ...)
        #   self.add('data', tmp)
        #   self.add('binary_anomaly', self._get_binary_anomaly(paths), lazy=False)
        #   self.add('group', self['data']['subdb'], lazy=False)
    """
    from dabstract_spark.sources import attach_csv_metadata, decode_wav, folder_dataset

    # folder scan + lazy WAV decode == FolderDictSeqAbstract(map_fct=chain)
    ds = folder_dataset(spark, FIXTURES, map_fct=lambda c: decode_wav(c), name="EXAMPLE")
    # labels CSV aligned by relative path == _get_binary_anomaly's
    # .npy-by-subdb walk (the connector idiom, dbs/DCASE2020Task1A.py:63-71)
    ds = ds.reset_active_keys().add(
        "relpath", F.concat_ws("/", F.col("subdb"), F.col("filename"))
    )
    ds = attach_csv_metadata(ds, f"{FIXTURES}/meta/labels.csv", on=("relpath", "filepath"))
    ds = ds.add_alias("anomaly", "binary_anomaly")
    # self.add('group', self['data']['subdb']) — a column copy
    ds = ds.add("group", F.col("subdb"))
    return ds


def run(spark, workdir: str) -> dict:
    """Run every walkthrough section; returns {section: result} for the
    CI test. ``workdir``: scratch dir for xval persist + features."""
    out = {}

    # ------------------------------------------------------------------
    # 1. construction + summary
    # dabstract (Readme_3:14-17):
    #     db = EXAMPLE(paths={'data': ..., 'meta': ...}); db.summary()
    db = build_db(spark)
    out["summary"] = db.summary().collect()
    out["keys"] = db.keys()
    out["len"] = len(db)

    # ------------------------------------------------------------------
    # 2. selection at construction
    # dabstract (Readme_3:20-27):
    #     db = EXAMPLE(..., select=random_subsample(ratio=0.3))
    sub = db.add_select("random_subsample", ratio=0.5, seed=0)
    out["subsample_len"] = len(sub)

    # ------------------------------------------------------------------
    # 3. xval
    # dabstract (Readme_3:29-36):
    #     db.set_xval(random_kfold(folds=4, val_frac=1/3))
    #     xval = db.get_xval_set(fold=0, set='train')
    db = db.set_xval("random_kfold", folds=4, val_frac=1 / 3, seed=0)
    out["train0"] = len(db.get_xval_set("train", fold=0))
    out["val0"] = len(db.get_xval_set("val", fold=0))
    out["test0"] = len(db.get_xval_set("test", fold=0))

    # ------------------------------------------------------------------
    # 4. xval persisted for later reuse
    # dabstract (Readme_3:38-44):
    #     db.set_xval(random_kfold(folds=4, val_frac=1/3), save_path='xval')
    xval_path = os.path.join(workdir, "xval")
    db = db.set_xval("random_kfold", folds=4, val_frac=1 / 3, seed=0, save_path=xval_path)
    reloaded = build_db(spark).set_xval(
        "random_kfold", folds=4, val_frac=1 / 3, seed=999, save_path=xval_path
    )  # seed ignored: the persisted assignment is reloaded, dabstract's pickle reuse
    out["xval_reload_same"] = sorted(
        r.row_id for r in db.get_xval_set("test", 1).full_df.select("row_id").collect()
    ) == sorted(
        r.row_id for r in reloaded.get_xval_set("test", 1).full_df.select("row_id").collect()
    )

    # ------------------------------------------------------------------
    # 5. xval from an item
    # dabstract (Readme_3:46-53):
    #     db.add('set', ['test'] * len(db)); db.set_xval(xval_from_item(key='set'))
    db2 = build_db(spark).add("set", F.lit("test"))
    db2 = db2.set_xval("xval_from_item", item="set")
    out["from_item_test"] = len(db2.get_xval_set("test", fold=0))

    # ------------------------------------------------------------------
    # 6. feature extraction (prepare_feat)
    # dabstract (Readme_3:59-73):
    #     processor = ProcessingChain().add(Framing(windowsize=10, stepsize=10))
    #     db.prepare_feat('data', fe_name='Framing1010', fe_dp=processor, new_key='feat')
    from dabstract_spark.processing import ProcessingChain

    # fixture tones are 0.2 s at 800 Hz; windowsize 0.05 s == 40 samples
    chain = ProcessingChain().add("Framing", {"windowsize": 0.05, "stepsize": 0.05, "fs": 800})
    feat_dir = os.path.join(workdir, "feat")
    db = db.prepare_feat("data", "Framing0505", chain, new_key="feat", feat_base_dir=feat_dir)
    out["feat_rows"] = db.full_df.select(F.size("feat").alias("n")).collect()

    # ------------------------------------------------------------------
    # 7. nested feature extraction
    # dabstract (Readme_3:75-95):
    #     db.prepare_feat('data', 'np_audio', ProcessingChain(), new_key='feat')
    #     db.prepare_feat('feat', 'raw_audio', chain2, new_key='feat2')
    chain2 = ProcessingChain().add("Aggregation", {"methods": ["mean"], "axis": -1})
    db = db.prepare_feat("feat", "FrameMeans", chain2, new_key="feat2", feat_base_dir=feat_dir)
    out["feat2_rows"] = db.full_df.select(F.size("feat2").alias("n")).collect()

    # ------------------------------------------------------------------
    # 8. load into memory
    # dabstract (Readme_3:97-110 / :112-130):
    #     db.load_memory('feat'); db.load_memory('feat', keep_structure=True)
    db = db.load_memory("feat2")
    out["loaded_len"] = len(db)

    # ------------------------------------------------------------------
    # 9. per-example map + split (the Readme_2 operator tour)
    # dabstract (Readme_2: MapAbstract(data, fct), SplitAbstract /
    #     dataset.add_split(windowsize, stepsize)):
    mapped = db.add_map("data", lambda c: F.transform(c, lambda x: x * 2))
    split = mapped.add_split("data", 40, type="samples")
    out["split_len"] = len(split)

    return out


if __name__ == "__main__":
    import tempfile

    from dabstract_spark.session import get_spark

    spark = get_spark("parity_walkthrough")
    with tempfile.TemporaryDirectory(prefix="sparkdab_walkthrough_") as wd:
        results = run(spark, wd)
    for k, v in results.items():
        print(f"{k}: {v if not isinstance(v, list) else f'{len(v)} rows'}")
