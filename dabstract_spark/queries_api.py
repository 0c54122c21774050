"""Catalog entries for Dataset-API operators that round 1 left
unit-tested but without oracle coverage (VERDICT r1 "What's missing" #9)
plus the full add_split orchestration (seconds / power2 / multi-key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dabstract_spark.dataset import Dataset
from dabstract_spark.functions.hashing import md5_order
from dabstract_spark.queries import _t, query


# --------------------------------------------------------------------- #
# add_split type='seconds' with a per-row rate column (§2.5 full
# orchestration): window = round(0.9 s * rate), chunks = ceil(64 / w)
# --------------------------------------------------------------------- #
@query(
    "q72_add_split_seconds",
    oracle="""
    WITH r AS (
      SELECT vec_id, embedding, (vec_id % 3 + 1) * 8 AS rate,
             CAST(round(0.9 * ((vec_id % 3 + 1) * 8)) AS INT) AS w
      FROM embeddings)
    SELECT vec_id, CAST(c AS INT) AS chunk_id, CAST(k - 1 AS INT) AS pos,
           embedding[CAST(c AS INT) * w + k]::DOUBLE AS x
    FROM r,
         UNNEST(generate_series(0, CAST(ceil(64.0 / w) AS INT) - 1)) AS t(c),
         UNNEST(generate_series(1, w)) AS t2(k)
    WHERE CAST(c AS INT) * w + k <= 64
    """,
)
def q72_add_split_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "rate", (F.col("vec_id") % 3 + 1) * 8
    )
    ds = Dataset(emb, name="emb")
    ds = ds.add_split("embedding", split_size=0.9, type="seconds", rate="rate")
    return ds.full_df.select(
        "vec_id",
        "chunk_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )


# power2 constraint: window = next_pow2(round(0.3 * 20)) = 8
@query(
    "q73_add_split_power2",
    oracle="""
    SELECT vec_id, CAST(c AS INT) AS chunk_id, CAST(k - 1 AS INT) AS pos,
           embedding[CAST(c AS INT) * 8 + k]::DOUBLE AS x
    FROM embeddings,
         UNNEST(generate_series(0, 7)) AS t(c),
         UNNEST(generate_series(1, 8)) AS t2(k)
    """,
)
def q73_add_split_power2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "embeddings"), name="emb")
    ds = ds.add_split("embedding", split_size=0.3, type="seconds", rate=20, constraint="power2")
    return ds.full_df.select(
        "vec_id",
        "chunk_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )


# --------------------------------------------------------------------- #
# Dataset.add positional zip-join (§2.3): partial (row_id, value) frame
# NULL-fills — the relational form of the reference's length-checked zip
# --------------------------------------------------------------------- #
@query(
    "q74_zip_join_add",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE WHEN n_nationkey < 15 THEN upper(n_name) END AS uname
    FROM nation
    """,
)
def q74_zip_join_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    ds = Dataset(nation.withColumn("row_id", F.col("n_nationkey").cast("bigint")), name="nation")
    vals = (
        nation.filter(F.col("n_nationkey") < 15)
        .select(F.col("n_nationkey").cast("bigint").alias("row_id"), F.upper("n_name").alias("v"))
    )
    ds = ds.add("uname", vals)
    return ds.full_df.select("n_nationkey", "n_name", "uname")


# --------------------------------------------------------------------- #
# add_map + add_alias + remove (§2.2/§2.9)
# --------------------------------------------------------------------- #
@query(
    "q75_map_alias_remove",
    oracle="""
    SELECT c_custkey, round(c_acctbal::DOUBLE / 100.0, 6) + 0.0 AS bal_pct,
           c_mktsegment AS segment
    FROM customer
    """,
)
def q75_map_alias_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    ds = Dataset(cust, name="customer")
    ds = ds.add_map(
        "c_acctbal",
        lambda c: F.round(c.cast("double") / 100.0, 6) + F.lit(0.0),
        new_key="bal_pct",
    )
    ds = ds.add_alias("c_mktsegment", "segment").remove("c_mktsegment")
    return ds.full_df.select("c_custkey", "bal_pct", "segment")


# --------------------------------------------------------------------- #
# set_active_keys persistent projection (§2.2)
# --------------------------------------------------------------------- #
@query(
    "q76_active_keys",
    oracle="SELECT c_name, c_nationkey FROM customer",
)
def q76_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "customer"), name="customer")
    return ds.set_active_keys(["c_name", "c_nationkey"]).df


# --------------------------------------------------------------------- #
# load_memory: cache is semantically transparent (§2.11)
# --------------------------------------------------------------------- #
@query(
    "q77_load_memory",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def q77_load_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "customer"), name="customer").load_memory()
    return (
        ds.full_df.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
    )


# --------------------------------------------------------------------- #
# exact-count random_subsample (§2.2, reference select.py:7-24): rank by
# the md5 ordering, keep ceil(n * ratio)
# --------------------------------------------------------------------- #
@query(
    "q78_random_subsample_exact",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    QUALIFY ROW_NUMBER() OVER (ORDER BY md5('11:' || CAST(s_suppkey AS VARCHAR)))
            <= (SELECT CEIL(COUNT(*) * 0.25) FROM supplier)
    """,
)
def q78_random_subsample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "supplier"), name="supplier")
    out = ds.add_select("random_subsample", ratio=0.25, seed=11, key="s_suppkey")
    return out.full_df.select("s_suppkey", "s_name")


# --------------------------------------------------------------------- #
# YAML/dict config compiler (§2.1 dataset_from_config): a config-built
# pipeline reproduces the direct-API query
# --------------------------------------------------------------------- #
@query(
    "q79_config_pipeline",
    oracle="SELECT doc_id, lang FROM documents WHERE lang IN ('en', 'qy')",
)
def q79_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.config import dataset_from_config

    cfg = {
        "datasets": [
            {
                "name": "parquet_table",
                "parameters": {
                    "paths": {"data": f"{sf_dir}/documents.parquet"},
                    "row_key": "doc_id",
                    "name": "docs",
                },
            }
        ],
        "select": [
            {"name": "subsample_by_str", "parameters": {"key": "lang", "keep": ["en", "qy"]}}
        ],
    }
    ds = dataset_from_config(spark, cfg)
    return ds.full_df.select("doc_id", "lang")


# --------------------------------------------------------------------- #
# Skew-salted aggregation (100 TB posture): the two-phase (key, salt)
# partial -> merge plan is semantically identical to the single-phase
# aggregate — the oracle computes the plain aggregate
# --------------------------------------------------------------------- #
@query(
    "q82_salted_agg",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def q82_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators.skew import salted_count_sum

    orders = _t(spark, sf_dir, "orders")
    return salted_count_sum(
        orders, ["o_orderpriority"], "o_totalprice", n_salts=16, salt_on=["o_orderkey"]
    )


# --------------------------------------------------------------------- #
# Resample (§2.8): FFT-method resampling spelled as an O(n²) oracle —
# forward DFT (17 kept bins of the 64-sample spectrum), spectral
# truncation, inverse real DFT at 32 points, ×(num/n) gain: exactly
# scipy.signal.resample's construction (the same rfft→truncate→irfft
# the Spark-side numpy UDF runs), like q65's DFT-magnitude oracle.
# DC contributes re once, the kept top bin contributes re·cos(πm)
# (irfft's C2R transform drops its imaginary part), interior bins 2·(re
# cosθ − im sinθ). Rounded to 4 decimals on both sides (q65 precedent:
# transcendental float paths agree to well below 1e-4).
# --------------------------------------------------------------------- #
@query(
    "q83_resample",
    oracle="""
    WITH spec AS (
      SELECT vec_id, k,
             list_sum(list_transform(generate_series(1, 64),
               j -> embedding[j]::DOUBLE * cos(2 * pi() * k * (j - 1) / 64))) AS re,
             -list_sum(list_transform(generate_series(1, 64),
               j -> embedding[j]::DOUBLE * sin(2 * pi() * k * (j - 1) / 64))) AS im
      FROM embeddings, UNNEST(generate_series(0, 16)) AS t(k)),
    y AS (
      SELECT vec_id, m,
             SUM(CASE WHEN k = 0 THEN re
                      WHEN k = 16 THEN re * cos(pi() * m)
                      ELSE 2 * (re * cos(2 * pi() * k * m / 32)
                                - im * sin(2 * pi() * k * m / 32)) END)
               / 32 * 0.5 AS v
      FROM spec, UNNEST(generate_series(0, 31)) AS u(m)
      GROUP BY vec_id, m)
    SELECT vec_id, CAST(m AS INT) AS pos, round(v, 4) + 0.0 AS resampled FROM y
    """,
)
def q83_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.processing import ProcessingChain

    emb = _t(spark, sf_dir, "embeddings")
    chain = ProcessingChain().add("Resample", {"target_fs": 4, "fs": 8})
    out = chain.process_df(emb, "embedding", new_key="resampled", info={"dtype": "array<double>"})
    return out.select("vec_id", F.posexplode("resampled").alias("pos", "resampled")).select(
        "vec_id", "pos", (F.round("resampled", 4) + F.lit(0.0)).alias("resampled")
    )


# --------------------------------------------------------------------- #
# Exact-N deterministic sample (select.random_sample_n): the fixed-budget
# sibling of q78 — "exactly 40 customers", md5-ranked via bounded
# per-bucket windows, no count job, no global sort-limit.
# --------------------------------------------------------------------- #
@query(
    "q209_random_sample_n",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    QUALIFY ROW_NUMBER() OVER (ORDER BY md5('4:' || CAST(c_custkey AS VARCHAR))) <= 40
    """,
)
def q209_random_sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators.select import random_sample_n

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return random_sample_n(cust, 40, seed=4, key="c_custkey")
