"""Split / replicate / framing / xval unit tests — tiny literal inputs,
exact expected outputs (reference test pattern, tests/test_abstract.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dabstract_spark.dataset import Dataset
from dabstract_spark.operators import split as sp, xval as xv


def test_split_array_exact_chunks(spark):
    df = spark.createDataFrame(
        [(0, list(range(10))), (1, list(range(5)))], "row_id long, data array<int>"
    )
    out = sp.split_array(df, "data", 4).collect()
    got = {(r["row_id"], r["chunk_id"]): r["data"] for r in out}
    assert got[(0, 0)] == [0, 1, 2, 3]
    assert got[(0, 2)] == [8, 9]  # partial tail kept
    assert got[(1, 1)] == [4]
    assert len(got) == 3 + 2


def test_split_array_drop_partial(spark):
    df = spark.createDataFrame([(0, list(range(10)))], "row_id long, data array<int>")
    out = sp.split_array(df, "data", 4, drop_last_partial=True).collect()
    assert sorted(len(r["data"]) for r in out) == [4, 4]


def test_split_text_and_replication_alignment(spark):
    ds = Dataset(
        spark.createDataFrame([(0, "abcdefgh", "L0")], "row_id long, txt string, label string"),
        name="t",
    )
    out = ds.add_split("txt", 3).full_df.orderBy("chunk_id").collect()
    assert [r["txt"] for r in out] == ["abc", "def", "gh"]
    # non-split columns replicate automatically
    assert {r["label"] for r in out} == {"L0"}


def test_sample_replicate_per_row_factor(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    out = sp.sample_replicate(df, F.col("k")).collect()
    counts = {}
    for r in out:
        counts[r["k"]] = counts.get(r["k"], 0) + 1
    assert counts == {1: 1, 2: 2, 3: 3}
    assert sorted(r["replica_id"] for r in out if r["k"] == 3) == [1, 2, 3]


def test_frame_array_overlap(spark):
    df = spark.createDataFrame([(0, list(range(10)))], "row_id long, data array<int>")
    out = sp.frame_array(df, "data", frame_size=4, step=2).orderBy("frame_id").collect()
    # frames: 1 + floor((10-4)/2) = 4
    assert [r["data"] for r in out] == [
        [0, 1, 2, 3],
        [2, 3, 4, 5],
        [4, 5, 6, 7],
        [6, 7, 8, 9],
    ]


def test_frame_array_short_rows_dropped(spark):
    df = spark.createDataFrame([(0, [1, 2])], "row_id long, data array<int>")
    assert sp.frame_array(df, "data", frame_size=4, step=2).count() == 0


def _keys(spark, n=20):
    return spark.createDataFrame([(i,) for i in range(n)], "k long")


def test_random_kfold_balanced_disjoint(spark):
    df = _keys(spark, 20)
    out = xv.random_kfold(df, folds=4, key="k", seed=0).collect()
    assert len(out) == 20 and len({r["k"] for r in out}) == 20
    sizes = {}
    for r in out:
        sizes[r["fold"]] = sizes.get(r["fold"], 0) + 1
    assert sizes == {0: 5, 1: 5, 2: 5, 3: 5}
    # seeded determinism + seed sensitivity
    again = {(r["k"], r["fold"]) for r in xv.random_kfold(df, 4, "k", seed=0).collect()}
    assert again == {(r["k"], r["fold"]) for r in out}
    other = {(r["k"], r["fold"]) for r in xv.random_kfold(df, 4, "k", seed=9).collect()}
    assert other != again


def test_stratified_kfold_per_label_balance(spark):
    df = spark.createDataFrame([(i, f"L{i % 2}") for i in range(16)], "k long, lab string")
    out = xv.stratified_kfold(df, folds=4, key="k", label="lab").collect()
    # each label contributes exactly 2 rows per fold
    from collections import Counter

    lab = {r["k"]: f"L{r['k'] % 2}" for r in out}
    c = Counter((lab[r["k"]], r["fold"]) for r in out)
    assert set(c.values()) == {2}


def test_group_kfold_integrity(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(25)], "k long, g int")
    out = xv.group_random_kfold(df, folds=3, key="k", group="g").collect()
    gf = {}
    for r in out:
        g = r["k"] % 5
        gf.setdefault(g, set()).add(r["fold"])
    assert all(len(s) == 1 for s in gf.values())  # a group never straddles folds


def test_sequential_kfold_contiguous(spark):
    df = spark.createDataFrame([(i, "g") for i in range(9)], "k long, g string")
    out = {r["k"]: r["fold"] for r in xv.sequential_kfold(df, folds=3, key="k", group="g").collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 2, 7: 2, 8: 2}


def test_random_split_fractions_and_determinism(spark):
    df = _keys(spark, 1000)
    out = xv.random_split(df, key="k", val_frac=0.1, test_frac=0.2, seed=0).collect()
    from collections import Counter

    c = Counter(r["set_name"] for r in out)
    assert abs(c["test"] / 1000 - 0.2) < 0.05
    assert abs(c["val"] / 1000 - 0.1) < 0.05
    assert c["train"] + c["val"] + c["test"] == 1000


def test_set_xval_testonly_reattached(spark):
    rows = [(i, 1 if i >= 8 else 0) for i in range(10)]
    ds = Dataset(
        spark.createDataFrame(rows, "row_id long, test_only int"), name="t"
    )
    ds = ds.set_xval("random_kfold", key="row_id", folds=2, seed=0)
    t0 = {r["row_id"] for r in ds.get_xval_set("test", 0).full_df.collect()}
    t1 = {r["row_id"] for r in ds.get_xval_set("test", 1).full_df.collect()}
    # test_only rows appear in every test fold
    assert {8, 9} <= t0 and {8, 9} <= t1
    # non-test_only candidates split disjointly
    assert (t0 - {8, 9}).isdisjoint(t1 - {8, 9})
    assert (t0 | t1) == set(range(10))
    # train/test disjoint within a fold
    tr0 = {r["row_id"] for r in ds.get_xval_set("train", 0).full_df.collect()}
    assert tr0.isdisjoint(t0)


def test_set_xval_persist_roundtrip(spark, tmp_path):
    ds = Dataset(_keys(spark, 12).withColumnRenamed("k", "row_id"), name="t")
    p = str(tmp_path / "folds.parquet")
    ds1 = ds.set_xval("random_kfold", key="row_id", folds=3, seed=0, save_path=p)
    a1 = {(r["row_id"], r["fold"]) for r in ds1._xval[0].collect()}
    # reload path (overwrite=False reads back the persisted assignment)
    ds2 = ds.set_xval("random_kfold", key="row_id", folds=3, seed=99, save_path=p)
    a2 = {(r["row_id"], r["fold"]) for r in ds2._xval[0].collect()}
    assert a1 == a2  # seed ignored because persisted folds were loaded
