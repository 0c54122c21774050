"""Warehouse-shape relational suite (TPC-H query shapes adapted to the
trimmed fixture schema — no partsupp/commitdate/shipmode columns exist,
so each query keeps the SHAPE that stresses the engine, not the TPC-H
constants: EXISTS/IN semi-joins, NOT-IN anti-joins, scalar-subquery
HAVING, disjunctive predicate pushdown, multi-way star joins with
broadcastable dims, window-rank distribution, CUBE).

Reference analog: the reference's query surface is dataset selection +
metadata joins (SURVEY §2.2–§2.4); these queries are the same operators
at warehouse width, expressed so Catalyst picks broadcast vs shuffle per
side and pushes every filter to the parquet scan.

Float discipline: money sums in DECIMAL(18,2) then cast to DOUBLE;
ratios rounded to 6 decimals on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dabstract_spark.queries import _dec, _t, query

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev():
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


# --------------------------------------------------------------------- #
# Q4 shape: EXISTS semi-join with an inequality residual — orders that
# had at least one line shipped >90 days after the order date, counted
# by priority. Spark: LEFT SEMI hash join on the order key with the
# date comparison as the join residual (one shuffle, no dedup needed —
# semi-join semantics absorb the 1:N fanout).
# --------------------------------------------------------------------- #
@query(
    "q147_late_priority_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q147_late_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------- #
# Q5 shape: six-way star join, local-supplier revenue per nation for one
# region-year. nation/region broadcast (25/5 rows); the c=s nation
# equality rides the fact-side join output. ONE shuffle pair for
# orders⋈lineitem⋈customer; supplier broadcasts at this dim size but
# the plan stays correct if it ever has to shuffle.
# --------------------------------------------------------------------- #
@query(
    "q148_local_supplier_revenue",
    oracle=f"""
    SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q148_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------- #
# Q7 shape: bi-nation shipping volume — revenue between two nations in
# both directions, per year. The two broadcast nation joins rename to
# supp_nation/cust_nation; the disjunctive nation-pair predicate sits
# above them.
# --------------------------------------------------------------------- #
@query(
    "q149_bination_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, l_year
    """,
)
def q149_bination_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("volume"))
    )


# --------------------------------------------------------------------- #
# Q8 shape: market share — the share of one supplier nation's revenue
# within a customer region, per year. Conditional aggregation over the
# same star join; DECIMAL ratio rounded at 6.
# --------------------------------------------------------------------- #
@query(
    "q150_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY o_year
    """,
)
def q150_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------- #
# Q15 shape: top supplier by revenue — grouped revenue with a scalar
# MAX subquery over the same aggregate. Spark reuses one aggregate
# for both sides; the max side collapses to a single row crossed in.
# --------------------------------------------------------------------- #
@query(
    "q151_top_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN r ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM r)
    """,
)
def q151_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------- #
# Q16 shape: supplier diversity per part type/size band, excluding a
# NOT-IN supplier set (negative balance). No partsupp table in the
# fixture — supply relationships come from observed lineitems. The
# NOT IN compiles to a broadcast anti-join (the excluded set is tiny);
# COUNT(DISTINCT) shuffles once on the group key.
# --------------------------------------------------------------------- #
@query(
    "q152_part_supplier_count",
    oracle="""
    SELECT p_type, CAST(p_size % 5 AS INT) AS size_band,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 20
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, size_band
    """,
)
def q152_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", (F.col("p_size") % 5).cast("int").alias("size_band"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------- #
# Q18 shape: large-volume orders — IN over a grouped-HAVING subquery.
# Spark: aggregate once, semi-join orders against the qualifying keys,
# then re-join lineitem for the total. The qualifying-key set is small
# (HAVING prunes hard) so it broadcasts.
# --------------------------------------------------------------------- #
@query(
    "q153_big_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q153_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 150)
        .select(F.col("l_orderkey").alias("__ok"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(
            F.broadcast(qualifying), F.col("o_orderkey") == F.col("__ok"), "left_semi"
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )


# --------------------------------------------------------------------- #
# Q19 shape: disjunctive predicate over a fact⋈dim join — three
# (brand, size, quantity-range) conjunctions OR'd together. Catalyst
# splits the common l_quantity/p_size bounds out of the OR and pushes
# them to both scans; the residual disjunction evaluates post-join.
# --------------------------------------------------------------------- #
@query(
    "q154_disjunctive_pricing",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q154_disjunctive_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(F.sum(_rev()).cast("double").alias("revenue"))


# --------------------------------------------------------------------- #
# Q22 shape: rich-but-idle customers — acctbal above the positive-only
# global average (scalar subquery) with no RECENT orders (anti-join
# whose build side has the date predicate pushed into its scan).
# The scalar average broadcasts as a one-row cross; the anti-join
# shuffles on custkey only.
# --------------------------------------------------------------------- #
@query(
    "q155_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q155_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------- #
# Window-rank distribution (§2.7 breadth): percent_rank / cume_dist /
# ntile within each market segment — routed through the two-level
# `select.grouped_order_stats` (r9): the rank family EMITS every row
# (no WindowGroupLimit pruning), so the old per-segment window was the
# last full-output group-sized sort in the catalog — 5 segments means
# one task sorting and streaming ~n/5 customers at 100 TB. The
# (c_acctbal, c_custkey) order is total (custkey unique), so
# percent_rank = (rank-1)/(n-1), cume_dist = rank/n, and NTILE comes
# from the exact integer allotment — all derived from the de-skewed
# rank; the oracle stays the literal SQL window functions, proving the
# derivation equals the engine semantics.
# --------------------------------------------------------------------- #
@query(
    "q156_balance_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q156_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators.select import grouped_order_stats

    cust = _t(spark, sf_dir, "customer")
    ranked = grouped_order_stats(
        cust.select("c_custkey", "c_mktsegment", "c_acctbal"),
        "c_mktsegment",
        "c_acctbal",
        "c_custkey",
        ntiles=4,
        n_groups_hint=8,
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.round(
            F.when(
                F.col("n_group") > 1,
                (F.col("rank_in_group") - 1) / (F.col("n_group") - 1),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct_rank"),
        F.round(F.col("rank_in_group") / F.col("n_group"), 6).alias("cume"),
        F.col("ntile_in_group").alias("quartile"),
    )


# --------------------------------------------------------------------- #
# CUBE with grouping_id (§2.4 breadth): all four aggregation levels of
# (returnflag, linestatus) in ONE shuffle — Spark expands the cube
# map-side, partial-aggregates each level, then shuffles once.
# --------------------------------------------------------------------- #
@query(
    "q160_cube_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q160_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------- #
# Sketch guard queries: the approximate operators (HLL distinct,
# quantile sketch) cannot hash-match an exact oracle — their outputs are
# algorithm-specific. Instead each query computes BOTH the sketch and
# the exact answer in one pass and returns the exact value plus a
# boolean asserting the sketch landed within its error bound; the
# oracle computes the exact value and asserts TRUE. A broken sketch
# path flips the boolean and fails the hash — the approximate machinery
# is gate-checked without demanding cross-engine sketch equality.
# --------------------------------------------------------------------- #
@query(
    "q157_approx_distinct_guard",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q157_approx_distinct_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        # HLL++ at 2% target rsd; guard at 5% — wide enough to be
        # deterministic-in-practice, tight enough to catch a broken
        # path. NOT 1%: under the mixed distinct/non-distinct Expand
        # rewrite the p=14 sketch buffers replicate per distinct group
        # (measured 4x slower than p=12 for zero guard benefit).
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
    )
    return agg.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("__approx") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("approx_ok"),
    )


@query(
    "q158_approx_quantile_guard",
    oracle="""
    SELECT event_type,
           ROUND(CAST(quantile_disc(value, 0.5) AS DOUBLE), 2) AS exact_median,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q158_approx_quantile_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # exact discrete median = percentile_approx at accuracy >= group
    # size is NOT guaranteed; compute exact via percentile() and the
    # sketch via approx_percentile, guard on relative error
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__exact_cont"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("__approx"),
        F.expr("percentile_approx(value, 0.5, 2147483647)").alias("__exact_disc"),
    )
    # percentile_approx at max accuracy degenerates to the exact
    # discrete quantile (DuckDB's quantile_disc)
    return agg.select(
        "event_type",
        F.round(F.col("__exact_disc"), 2).alias("exact_median"),
        (
            F.abs(F.col("__approx") - F.col("__exact_cont"))
            <= 0.05 * F.abs(F.col("__exact_cont")) + F.lit(0.01)
        ).alias("approx_ok"),
    )


# --------------------------------------------------------------------- #
# Event-transition matrix (user-journey Markov counts): consecutive
# event-type bigrams per user via lag over (user, ts, event_id), with
# transition probability normalized per source state. One shuffle on
# user_id for the window, one on the bigram for the count.
# --------------------------------------------------------------------- #
@query(
    "q159_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type)
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM c
    """,
)
def q159_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    )


# --------------------------------------------------------------------- #
# Product-analytics breadth over events: cohort retention and session
# entry paths — the two classic "user journey" aggregations.
# --------------------------------------------------------------------- #
@query(
    "q164_cohort_retention",
    # cohort = each user's first active day; cell (cohort_day, offset) =
    # distinct users of that cohort active `offset` days later. The
    # first-seen aggregate shuffles once on user_id; the join back is on
    # the same key (co-partitioned), then one shuffle on the cell key.
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, CAST(ts AS DATE)) AS INT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    WHERE date_diff('day', cohort_day, CAST(ts AS DATE)) <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def q164_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", F.col("ts").cast("date").alias("d"))
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_day").cast("int"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q165_session_entry_paths",
    # entry path = the first three event types of each session, joined
    # with '>'. Sessions from the gaps-and-islands sessionizer; the
    # within-session order is (ts, event_id) — total, so both engines
    # build identical paths. One groupBy(user, session) with a sorted
    # in-group fold (JVM collect_list + sort_array, no Python).
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events)),
    paths AS (
      -- list_filter mirrors Spark concat_ws, which SKIPS NULL event
      -- types (an all-NULL entry reads '', never NULL)
      SELECT user_id, session_id,
             coalesce(array_to_string(list_filter(
               (list(event_type ORDER BY ts, event_id))[1:3],
               x -> x IS NOT NULL), '>'), '') AS path
      FROM s GROUP BY user_id, session_id)
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    """,
)
def q165_session_entry_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators.events import sessionize

    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, "ts", "user_id", gap_minutes=30)
    # rank-filter to the 3 entry events BEFORE collecting: the old
    # collect-then-slice shape materialized a whole session's events in
    # one task to keep 3 of them — a never-idle bot session (the gap
    # never fires) was one task's unbounded array. Byte-identical
    # output: row_number over (ts, event_id) picks exactly the rows the
    # sorted slice kept (event_id is unique), and the ≤3-element
    # collect is then trivially bounded.
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first3 = s.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= 3)
    paths = (
        first3.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))


# --------------------------------------------------------------------- #
# Incremental aggregate maintenance: the nightly pattern that avoids
# rescanning a 100 TB history — a materialized per-key partial aggregate
# (count + DECIMAL sum) absorbs each new batch by re-aggregating the
# UNION of two partial-agg TABLES (K rows each), never the raw base.
# The oracle recomputes from scratch; equality proves the maintenance
# algebra (count/sum are the decomposable aggregates; avg derives).
# --------------------------------------------------------------------- #
@query(
    "q168_incremental_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def q168_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )

    base = partial(ev.filter(F.col("ts") < cut))      # the materialized state
    delta = partial(ev.filter(F.col("ts") >= cut))    # tonight's batch
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    return merged.select(
        "event_type",
        "n",
        F.col("total").cast("double").alias("total"),
        F.round(F.col("total").cast("double") / F.col("n"), 6).alias("avg_value"),
    )


# --------------------------------------------------------------------- #
# Re-aggregatable distinct sketches — THE 100 TB pattern the scalar
# approx_count_distinct (q157) cannot express: persist one Datasketches
# HLL per (event_type, day) partition, then answer the whole-corpus distinct
# question by MERGING sketches (hll_union_agg) without ever rescanning
# the base data. Guarded like q157: exact value + a boolean asserting
# the merged estimate landed inside 5x its configured error.
# --------------------------------------------------------------------- #
@query(
    "q176_sketch_reaggregation",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS merge_ok
    FROM events GROUP BY event_type
    """,
)
def q176_sketch_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # stage 1: the partial sketches a pipeline would PERSIST (per day)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    # stage 2: merge-only rollup — no base-table rescan
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    # eqNullSafe: a NULL event_type is a real group in both legs and
    # must survive the join (plain equality would drop it)
    merged_r = F.broadcast(merged.withColumnRenamed("event_type", "__et"))
    return (
        exact.join(merged_r, F.col("event_type").eqNullSafe(F.col("__et")))
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("__est") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("merge_ok"),
        )
    )


# --------------------------------------------------------------------- #
# Leave-one-out target encoding (the ML-feature staple): encode a
# categorical by the mean target of all OTHER rows in its category, in
# exact integer ppm. Shape matters at scale: a window over the category
# would funnel each (few-valued, huge) category into one partition —
# instead aggregate to a tiny per-category table and broadcast it back
# onto the fact scan. Integer arithmetic => bit-identical cross-engine.
# --------------------------------------------------------------------- #
@query(
    "q180_target_encoding",
    oracle="""
    WITH agg AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s,
             COUNT(*) AS c
      FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(CASE WHEN a.c > 1
                THEN 1000000 * (a.s - CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                     // (a.c - 1)
                ELSE 0 END AS BIGINT) AS loo_ppm
    FROM orders o JOIN agg a USING (o_orderpriority)
    """,
)
def q180_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    agg = orders.groupBy("o_orderpriority").agg(
        F.sum(y).alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    return (
        orders.join(F.broadcast(agg), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                F.col("__c") > 1,
                F.expr(
                    "1000000 * (__s - (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))"
                    " div (__c - 1)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("loo_ppm"),
        )
    )


# --------------------------------------------------------------------- #
# Rolling 7-day distinct users (the WAU metric): COUNT(DISTINCT) over a
# RANGE window is inexpressible in Spark SQL — the scalable form is
# dedup to (user, day), explode each pair into the 7 window-ending days
# it serves, then one distinct-count per day. Shuffle volume is bounded
# at 7x the DEDUPED user-day table (not 7x raw events).
# --------------------------------------------------------------------- #
@query(
    "q182_rolling_distinct",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    win AS (
      SELECT user_id, day + CAST(i AS INT) AS wday
      FROM ud, UNNEST(generate_series(0, 6)) AS t(i))
    SELECT wday, COUNT(DISTINCT user_id) AS wau
    FROM win GROUP BY wday
    """,
)
def q182_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    win = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("i")).alias("wday"))
    return win.groupBy("wday").agg(F.countDistinct("user_id").alias("wau"))


# --------------------------------------------------------------------- #
# UNPIVOT / melt (wide → long): the inverse of q119's pivot, via
# Spark's native unpivot (Expand node — map-side, zero shuffle).
# --------------------------------------------------------------------- #
@query(
    "q183_unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           CAST(l_quantity AS DOUBLE) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           CAST(l_extendedprice AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(l_discount AS DOUBLE) FROM lineitem
    """,
)
def q183_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        F.col("val").cast("double").alias("val"),
    )


# --------------------------------------------------------------------- #
# Cross-validated (out-of-fold) target encoding: q180's encoder made
# leakage-safe the way training pipelines actually do it — each row's
# category statistic comes from the OTHER k-1 folds of the md5-seeded
# kfold assignment (§2.10 machinery composed with the feature path).
# Per-(category, fold) partials are tiny and broadcast back; exact
# integer ppm.
# --------------------------------------------------------------------- #
@query(
    "q187_crossfold_encoding",
    oracle="""
    WITH f AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             CAST((ROW_NUMBER() OVER (ORDER BY md5('0:' || CAST(o_orderkey AS VARCHAR))) - 1) % 5 AS INT) AS fold
      FROM orders),
    pf AS (SELECT o_orderpriority, fold, SUM(y) AS s, COUNT(*) AS c
           FROM f GROUP BY o_orderpriority, fold),
    pt AS (SELECT o_orderpriority, SUM(y) AS s, COUNT(*) AS c
           FROM f GROUP BY o_orderpriority)
    SELECT f.o_orderkey, f.o_orderpriority, f.fold,
           CAST(CASE WHEN pt.c - pf.c = 0 THEN 0
                ELSE 1000000 * (pt.s - pf.s) // (pt.c - pf.c) END AS BIGINT) AS oof_ppm
    FROM f
    JOIN pf USING (o_orderpriority, fold)
    JOIN pt USING (o_orderpriority)
    """,
)
def q187_crossfold_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators import xval as xv

    orders = _t(spark, sf_dir, "orders")
    folds = xv.random_kfold(orders, folds=5, key="o_orderkey", seed=0)
    f = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("__y"),
    ).join(folds, "o_orderkey")
    pf = f.groupBy("o_orderpriority", "fold").agg(
        F.sum("__y").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    pt = f.groupBy("o_orderpriority").agg(
        F.sum("__y").alias("__ts"), F.count(F.lit(1)).alias("__tc")
    )
    return (
        f.join(F.broadcast(pf), ["o_orderpriority", "fold"])
        .join(F.broadcast(pt), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "fold",
            F.when(F.col("__tc") - F.col("__c") == 0, F.lit(0))
            .otherwise(F.expr("1000000 * (__ts - __s) div (__tc - __c)"))
            .cast("bigint")
            .alias("oof_ppm"),
        )
    )


# --------------------------------------------------------------------- #
# Referential-integrity audit: orphan counts for every FK relationship
# in one result — each relationship a broadcast/shuffle ANTI join (the
# scalable form; EXISTS-per-row subqueries would rescan the dim per
# probe). The constraint pass a warehouse runs after every load.
# --------------------------------------------------------------------- #
@query(
    "q190_referential_audit",
    oracle="""
    SELECT 'orders->customer' AS rel,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    """,
)
def q190_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")

    def orphans(rel, child, parent, ck, pk):
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(rel).alias("rel"), "orphans")
        )

    return (
        orphans("orders->customer", orders, cust, "o_custkey", "c_custkey")
        .unionByName(orphans("lineitem->orders", li, orders, "l_orderkey", "o_orderkey"))
        .unionByName(orphans("customer->nation", cust, nation, "c_nationkey", "n_nationkey"))
        .unionByName(orphans("supplier->nation", supp, nation, "s_nationkey", "n_nationkey"))
    )


# --------------------------------------------------------------------- #
# Grouped WEIGHTED median (price weighted by quantity): the exact
# selection form — collapse to per-(group, price) weight sums FIRST
# (the aggregation does the data-sized work and kills duplicates), then
# the two-level `select.grouped_weighted_quantiles` cumsum over the
# distinct-price table picks the smallest price whose cumulative weight
# reaches half the total — no per-group window ever holds a whole
# group's distinct prices (for continuous values that table is
# O(group rows); the oracle's naive cumsum form is equivalent but
# serializes one low-cardinality group per task at scale). Integer
# weights => deterministic boundary, no percentile interpolation
# semantics to disagree on.
# --------------------------------------------------------------------- #
@query(
    "q194_weighted_median",
    oracle="""
    WITH pw AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY l_returnflag, l_extendedprice),
    cum AS (
      SELECT l_returnflag, price, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS total
      FROM pw)
    SELECT l_returnflag, MIN(price) AS weighted_median
    FROM cum WHERE 2 * cw >= total
    GROUP BY l_returnflag
    """,
)
def q194_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.operators.select import grouped_weighted_quantiles

    li = _t(spark, sf_dir, "lineitem")
    pw = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("w")
    )
    # 2·cum >= total: (num, den) = (1, 2); 3 return flags -> hint 8
    return grouped_weighted_quantiles(
        pw,
        "l_returnflag",
        "price",
        "w",
        [("weighted_median", 1, 2)],
        n_groups_hint=8,
    )


# --------------------------------------------------------------------- #
# Grouped exact MODE with a deterministic tie-break (built-in mode()
# breaks ties arbitrarily — useless under a correctness gate): count
# per (group, value) first (map-side combine does the heavy lifting),
# then a bounded top-1 window over the small distinct-value table.
# --------------------------------------------------------------------- #
@query(
    "q195_grouped_mode",
    oracle="""
    WITH vc AS (
      SELECT event_type, user_id, COUNT(*) AS n
      FROM events GROUP BY event_type, user_id)
    SELECT event_type, user_id AS mode_user, n AS n_events
    FROM vc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY n DESC, user_id) = 1
    """,
)
def q195_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    vc = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        vc.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("n").alias("n_events"),
        )
    )
