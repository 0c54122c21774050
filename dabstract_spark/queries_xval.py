"""Cross-validation + cardinality-op query catalog entries
(SURVEY §2.5, §2.10) with DuckDB oracles.

The md5-derived pseudo-random order (functions/hashing.py) makes fold
assignment oracle-checkable: both engines compute identical md5 hex, so
rank-based folds match row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dabstract_spark.dataset import Dataset
from dabstract_spark.operators import split as sp, xval as xv
from dabstract_spark.queries import _t, query


# --------------------------------------------------------------------- #
# add_split / SplitAbstract: document chunking (SURVEY §2.5)
# --------------------------------------------------------------------- #
@query(
    "q25_split_text_chunks",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           substring(text, CAST(i AS INT) * 100 + 1, 100) AS text
    FROM documents, UNNEST(generate_series(0, CAST(ceil(n_chars / 100.0) AS INT) - 1)) AS t(i)
    """,
)
def q25_split_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "documents"), name="documents")
    ds = ds.add_split("text", split_size=100)
    return ds.full_df.select("doc_id", "chunk_id", "text")


# SampleReplicateAbstract (SURVEY §2.5; abstract.py:746-883)
@query(
    "q26_sample_replicate",
    oracle="""
    SELECT s_suppkey, CAST(i AS INT) AS replica_id, s_name
    FROM supplier, UNNEST(generate_series(1, CAST(s_suppkey % 3 + 1 AS INT))) AS t(i)
    """,
)
def q26_sample_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    out = sp.sample_replicate(sup, F.col("s_suppkey") % 3 + 1)
    return out.select("s_suppkey", "replica_id", "s_name")


# Framing: overlapping sliding frames (SURVEY §2.5; processors.py:198-261)
@query(
    "q27_framing",
    oracle="""
    SELECT vec_id, CAST(i AS INT) AS frame_id,
           ROUND(list_sum(list_transform(embedding[CAST(i AS INT)*4+1 : CAST(i AS INT)*4+8],
                                         x -> CAST(x AS DOUBLE))) / 8, 6) AS frame_mean
    FROM embeddings, UNNEST(generate_series(0, CAST(floor((len(embedding) - 8) / 4.0) AS INT))) AS t(i)
    """,
)
def q27_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    framed = sp.frame_array(emb, "embedding", frame_size=8, step=4, out_key="frame")
    return framed.select(
        "vec_id",
        "frame_id",
        F.round(
            F.aggregate(
                F.col("frame"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            / 8.0,
            6,
        ).alias("frame_mean"),
    )


# --------------------------------------------------------------------- #
# xval fold builders (SURVEY §2.10)
# --------------------------------------------------------------------- #
_RANK_MOD = (
    "CAST((ROW_NUMBER() OVER (ORDER BY md5('{seed}:' || CAST({key} AS VARCHAR))) - 1) % {k} AS INT)"
)


@query(
    "q30_xval_random_kfold",
    oracle=f"""
    SELECT o_orderkey, {_RANK_MOD.format(seed=0, key="o_orderkey", k=5)} AS fold
    FROM orders
    """,
)
def q30_xval_random_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return xv.random_kfold(orders, folds=5, key="o_orderkey", seed=0)


@query(
    "q31_xval_stratified_kfold",
    oracle="""
    SELECT o_orderkey,
           CAST((ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY md5('3:' || CAST(o_orderkey AS VARCHAR))) - 1) % 4 AS INT) AS fold
    FROM orders
    """,
)
def q31_xval_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return xv.stratified_kfold(orders, folds=4, key="o_orderkey", label="o_orderpriority", seed=3)


@query(
    "q32_xval_group_kfold",
    oracle="""
    WITH gfold AS (
      -- NULL groups get no fold (engine convention: they cannot
      -- survive the equi-join back, and their md5 sort position is
      -- engine-dependent)
      SELECT c_nationkey,
             CAST((ROW_NUMBER() OVER (ORDER BY md5('1:' || CAST(c_nationkey AS VARCHAR))) - 1) % 5 AS INT) AS fold
      FROM (SELECT DISTINCT c_nationkey FROM customer WHERE c_nationkey IS NOT NULL)
    )
    SELECT c_custkey, fold FROM customer JOIN gfold USING (c_nationkey)
    """,
)
def q32_xval_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return xv.group_random_kfold(cust, folds=5, key="c_custkey", group="c_nationkey", seed=1)


@query(
    "q33_xval_sequential_kfold",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(3) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) - 1 AS INT) AS fold
    FROM customer
    """,
)
def q33_xval_sequential_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return xv.sequential_kfold(cust, folds=3, key="c_custkey", group="c_nationkey")


@query(
    "q34_xval_from_item",
    oracle="""
    SELECT o_orderkey,
           -- NULL items carry no split value -> NULL fold (engine
           -- convention); NULLS LAST keeps non-NULL folds identical to
           -- ranking the non-NULL domain alone
           CASE WHEN o_orderpriority IS NULL THEN NULL
                ELSE CAST(DENSE_RANK() OVER (ORDER BY o_orderpriority NULLS LAST) - 1 AS INT)
           END AS fold
    FROM orders
    """,
)
def q34_xval_from_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return xv.xval_from_item(orders, key="o_orderkey", item="o_orderpriority")


@query(
    "q35_random_split",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN u < 0.2 THEN 'test' WHEN u < 0.3 THEN 'val' ELSE 'train' END AS set_name
    FROM (
      SELECT o_orderkey,
             CAST(('0x' || substr(md5('5:' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
      FROM orders
    )
    """,
)
def q35_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return xv.random_split(orders, key="o_orderkey", val_frac=0.1, test_frac=0.2, seed=5)


# End-to-end set_xval → get_xval_set through the Dataset façade, incl.
# test_only re-attachment (reference dataset.py:1044-1045).
@query(
    "q36_get_xval_set",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS test_only
      FROM orders
    ), assign AS (
      SELECT o_orderkey,
             CAST((ROW_NUMBER() OVER (ORDER BY md5('0:' || CAST(o_orderkey AS VARCHAR))) - 1) % 4 AS INT) AS fold
      FROM base WHERE test_only = 0
    )
    SELECT b.o_orderkey, b.o_totalprice
    FROM base b LEFT JOIN assign a USING (o_orderkey)
    WHERE a.fold = 2 OR b.test_only = 1
    """,
)
def q36_get_xval_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        # when/otherwise, not a bare comparison cast: (NULL == 'P')
        # is NULL, which would silently drop NULL-status rows from
        # BOTH the fold assignment and the test set
        F.when(F.col("o_orderstatus") == "P", F.lit(1))
        .otherwise(F.lit(0))
        .alias("test_only"),
    )
    ds = Dataset(base, name="orders")
    ds = ds.set_xval("random_kfold", key="o_orderkey", folds=4, seed=0)
    return ds.get_xval_set("test", fold=2).full_df.select("o_orderkey", "o_totalprice")
