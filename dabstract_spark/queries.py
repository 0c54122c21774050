"""The query catalog: every implemented operator exposed as a named query
over the fixture tables, with a matching DuckDB oracle (ANSI SQL).

This is the correctness surface the driver checks (CORRECTNESS_r{N}.json):
each entry maps to a SURVEY.md §2 operator (or a §7-M6 extension) and is
expressed Spark-first through the dabstract_spark API.

Cross-engine float discipline: sums are computed in exact DECIMAL then
cast to DOUBLE (deterministic IEEE rounding in both engines); averages
round to 6 decimals on both sides. Pseudo-randomness is md5-based (see
functions/hashing.py) so fold/sample queries are oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from dabstract_spark.dataset import Dataset
from dabstract_spark.functions.hashing import md5_unit

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and its DuckDB oracle SQL) in the catalog."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_catalogs() -> None:
    # Import registers the extension catalogs on first use.
    import dabstract_spark.queries_api  # noqa: F401
    import dabstract_spark.queries_processing  # noqa: F401
    import dabstract_spark.queries_sources  # noqa: F401
    import dabstract_spark.queries_text  # noqa: F401
    import dabstract_spark.queries_tpch  # noqa: F401
    import dabstract_spark.queries_xval  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_catalogs()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_catalogs()
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dabstract_spark.session import load_table

    return load_table(spark, sf_dir, name)


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------- #
# Relational core: scan → filter → group → agg (TPC-H Q1 shape).
# Reference analog: the EXAMPLE pipeline of scan + select + distinct/count
# (SURVEY §3-A); here in its full OLAP form since Spark gives it natively.
# --------------------------------------------------------------------- #
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (_dec(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    # sum_disc_price/sum_charge: bound every factor's precision so the
    # decimal products stay EXACT in both engines — the naive (18,2)
    # three-factor product exceeds precision 38, and Spark's
    # allowPrecisionLoss then ROUNDS per-row products where DuckDB
    # widens exactly; the last-ulp drift only surfaces once sums reach
    # ~11 integer digits (found by the sf1 full-catalog sweep, r12).
    # (12,2)x(5,2)x(5,2) -> (24,6): exact, sums exact. The final ROUND
    # to 2 keeps the summed unscaled value under 2^53 before the double
    # cast: DuckDB's decimal->double is int->double / 10^scale (TWO
    # roundings, off by an ulp past 53 bits) while Spark's
    # BigDecimal.doubleValue is correctly rounded — under 2^53 both
    # collapse to one exact IEEE division and agree bit-for-bit.
    price12 = F.col("l_extendedprice").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc4 = F.col("l_discount").cast("decimal(4,2)")
    tax4 = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(price12 * (one - disc4)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price12 * (one - disc4) * (one + tax4)), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(disc).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------- #
# Multi-join star query with broadcastable dims (TPC-H Q3/Q5 shape).
# Reference analog: connector metadata equi-join (SURVEY §2.3) scaled up.
# --------------------------------------------------------------------- #
@query(
    "q02_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q03_region_nation_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q03_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(price * (1 - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------- #
# UnpackAbstract / projection (SURVEY §2.2; abstract.py:71-145)
# --------------------------------------------------------------------- #
@query(
    "q10_unpack_project",
    oracle="""
    SELECT o_orderkey AS row_id, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 100000
    """,
)
def q10_unpack_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "orders").withColumn("row_id", F.col("o_orderkey")), name="orders", _has_meta=False)
    ds = ds.add_select(F.col("o_totalprice") > 100000).unpack(["o_orderstatus", "o_totalprice"])
    return ds.df


# subsample_by_str selector (SURVEY §2.2; select.py:27-40)
@query(
    "q11_select_isin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
)
def q11_select_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "lineitem"), name="lineitem")
    ds = ds.add_select("subsample_by_str", key="l_returnflag", keep=["A", "R"])
    return ds.df.select("l_orderkey", "l_linenumber", "l_returnflag")


# ordinal slice selection (SURVEY §2.2; abstract.py:1242-1248)
@query(
    "q12_select_slice",
    oracle="""
    SELECT o_orderkey AS row_id, o_totalprice
    FROM orders
    WHERE o_orderkey >= 100 AND o_orderkey < 1000 AND (o_orderkey - 100) % 7 = 0
    """,
)
def q12_select_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset.from_parquet(spark, f"{sf_dir}/orders.parquet", name="orders", row_key="o_orderkey")
    return ds[100:1000:7].df.select("row_id", "o_totalprice")


# FilterAbstract(return_none=True): cardinality-preserving NULL-out
# (SURVEY §2.2; abstract.py:1392-1396)
@query(
    "q13_filter_nullout",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice END AS l_extendedprice
    FROM lineitem
    """,
)
def q13_filter_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "lineitem"), name="lineitem")
    ds = ds.add_filter(F.col("l_discount") > 0.05, return_none=True, key="l_extendedprice")
    return ds.df.select("l_orderkey", "l_linenumber", "l_extendedprice")


# --------------------------------------------------------------------- #
# concat / union with dataset lineage (SURVEY §2.6; dataset.py:182-221)
# --------------------------------------------------------------------- #
@query(
    "q14_concat_union",
    oracle="""
    SELECT dataset_id, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT 0 AS dataset_id, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 1 AS dataset_id, value FROM events WHERE event_type = 'purchase'
    ) GROUP BY dataset_id
    """,
)
def q14_concat_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = Dataset(ev.filter(F.col("event_type") == "click"), name="clicks")
    b = Dataset(ev.filter(F.col("event_type") == "purchase"), name="purchases")
    merged = a.concat(b)
    return (
        merged.full_df.groupBy("dataset_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


# concat(intersect=True): schema intersection (abstract.py:1599-1608)
@query(
    "q15_concat_intersect",
    oracle="""
    SELECT name, acctbal FROM (
      SELECT c_name AS name, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT s_name AS name, s_acctbal AS acctbal FROM supplier
    )
    """,
)
def q15_concat_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"), "c_mktsegment"
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"), "s_nationkey"
    )
    merged = Dataset(cust, name="cust").concat(Dataset(sup, name="sup"), intersect=True)
    return merged.full_df.select("name", "acctbal")


# KeyAbstract: missing key → NULL across concatenated sources
# (abstract.py:1479-1527 → unionByName(allowMissingColumns=True))
@query(
    "q16_concat_missing_null",
    oracle="""
    SELECT name, mktsegment FROM (
      SELECT c_name AS name, c_mktsegment AS mktsegment FROM customer
      UNION ALL
      SELECT s_name AS name, NULL AS mktsegment FROM supplier
    )
    """,
)
def q16_concat_missing_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_mktsegment").alias("mktsegment")
    )
    sup = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    merged = Dataset(cust, name="cust").concat(Dataset(sup, name="sup"))
    return merged.full_df.select("name", "mktsegment")


# --------------------------------------------------------------------- #
# get_unique / summary / dictionary-encode (SURVEY §2.4)
# --------------------------------------------------------------------- #
@query(
    "q17_get_unique",
    oracle="SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
)
def q17_get_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "orders"), name="orders")
    return ds.get_unique("o_orderpriority")


@query(
    "q18_get_unique_groups",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority
    """,
)
def q18_get_unique_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # get_unique(return_idx=True) materializes per-value row-id groups
    # (dataset.py:636-701); checked here via group fingerprints.
    ds = Dataset(
        _t(spark, sf_dir, "orders").withColumn("row_id", F.col("o_orderkey")),
        name="orders",
    )
    groups = ds.get_unique("o_orderpriority", return_idx=True)
    return groups.select(
        "o_orderpriority",
        F.size("row_ids").cast("bigint").alias("n"),
        F.element_at("row_ids", 1).alias("min_key"),
        F.element_at("row_ids", -1).alias("max_key"),
    )


@query(
    "q257_get_unique_long",
    # the scale-safe long form of get_unique(return_idx): one
    # (value, row_id) row per member instead of a per-value array —
    # no per-value state, so a 90%-hot value costs nothing special
    oracle="""
    SELECT o_orderpriority, o_orderkey AS row_id
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q257_get_unique_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    # get_unique(return_idx="long") emits the relational membership
    # table; the %7 filter keeps the compare set small while still
    # exercising the xval-free path end to end
    ds = Dataset(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("row_id", F.col("o_orderkey")),
        name="orders",
    )
    return ds.get_unique("o_orderpriority", return_idx="long")


@query(
    "q19_summary_counts",
    oracle="""
    SELECT 0 AS dataset_id, 'orders' AS dataset_str, COUNT(*) AS n_rows FROM orders
    UNION ALL
    SELECT 1 AS dataset_id, 'lineitem' AS dataset_str, COUNT(*) AS n_rows FROM lineitem
    """,
)
def q19_summary_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = Dataset(_t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("key")), name="orders")
    b = Dataset(_t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("key")), name="lineitem")
    return (a + b).summary()


# stringlist2ind: dictionary-encode strings to dense int codes
# (utils.py:553-569) — dense_rank over the distinct domain.
@query(
    "q20_dictionary_encode",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           -- NULL segments get no dictionary code (dense_codes leaves
           -- them out of the dictionary; the join back is LEFT);
           -- NULLS LAST keeps non-NULL codes identical to a ranking
           -- over the non-NULL domain alone
           CASE WHEN c_mktsegment IS NULL THEN NULL
                ELSE CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment NULLS LAST) - 1 AS INT)
           END AS segment_code
    FROM customer
    """,
)
def q20_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.core import dense_codes

    cust = _t(spark, sf_dir, "customer")
    # Scale note: a global dense_rank window is single-partition; the scale
    # path builds the (tiny) distinct dictionary window-free
    # (count-of-smaller self-join) and broadcast-joins it back.
    dic = dense_codes(cust, "c_mktsegment", "segment_code")
    # LEFT join: NULL segments have no dictionary entry and must keep
    # their rows with a NULL code, not vanish through an inner join
    return (
        cust.select("c_custkey", "c_mktsegment")
        .join(F.broadcast(dic), "c_mktsegment", "left")
        .select("c_custkey", "c_mktsegment", "segment_code")
    )


# --------------------------------------------------------------------- #
# Connector metadata alignment join (SURVEY §2.3; DCASE2020Task1A.py:63-71)
# --------------------------------------------------------------------- #
@query(
    "q21_metadata_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_brand, p_type
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    """,
)
def q21_metadata_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .select("l_orderkey", "l_linenumber", "p_brand", "p_type")
    )


# --------------------------------------------------------------------- #
# Deterministic threshold subsample (SURVEY §2.2 random_subsample;
# engine-portable md5 randomness, see functions/hashing.py)
# --------------------------------------------------------------------- #
@query(
    "q22_threshold_subsample",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(('0x' || substr(md5('7:' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < 0.25
    """,
)
def q22_threshold_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = Dataset(_t(spark, sf_dir, "orders"), name="orders")
    ds = ds.add_select("threshold_subsample", ratio=0.25, seed=7, key="o_orderkey")
    return ds.df.select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------- #
# Exact COUNT(DISTINCT) at scale (SURVEY §2.4): the two-level form —
# pre-dedup on (group, key) with map-side partial aggregation, then a
# plain count. A direct countDistinct ships every raw (group, key) pair
# to the group's reducer; the two-level plan dedups BEFORE the second
# shuffle, which is the difference between working and dying on a 100 TB
# fact table with hot groups.
# --------------------------------------------------------------------- #
@query(
    "q141_exact_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q141_exact_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        # count(user_id), not count(1): COUNT(DISTINCT) never counts
        # NULL keys, so the deduped NULL-user row must not either
        .agg(F.count(F.col("user_id")).alias("n_users"))
    )


# --------------------------------------------------------------------- #
# ROLLUP / grouping sets (SURVEY §2.4): region > nation subtotal
# hierarchy in ONE pass. grouping_id disambiguates subtotal NULLs from
# data NULLs — both engines emit the identical bit mask.
# --------------------------------------------------------------------- #
@query(
    "q142_rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS level,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q142_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("level"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .select("r_name", "n_name", "level", "revenue")
    )


# --------------------------------------------------------------------- #
# Anti-join (SURVEY §2.3): churned customers — no order since mid-1997.
# left_anti with the date predicate PUSHED INTO the build side is the
# shuffle-once negative membership test (never a NOT IN broadcast of a
# data-scale list); the filter prunes the orders scan before the join.
# --------------------------------------------------------------------- #
@query(
    "q143_churned_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
    """,
)
def q143_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-06-01"
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# --------------------------------------------------------------------- #
# Decorrelated scalar subquery (TPC-H Q17 shape, SURVEY §2.3/§2.4):
# lineitems below 20% of their part's average quantity. The correlated
# per-row subquery becomes one per-part aggregate joined back — the
# decorrelation every engine must do; quantities are small integers so
# the double avg is exact in any summation order.
# --------------------------------------------------------------------- #
@query(
    "q144_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
           AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    WHERE l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q144_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__thresh")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.__pk)
        .filter(F.col("l_quantity") < F.col("__thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
