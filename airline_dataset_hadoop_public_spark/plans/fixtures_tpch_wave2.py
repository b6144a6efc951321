"""Second wave of decision-support shapes (TPC-H Q7/Q8/Q9/Q13/Q15/
Q16/Q21 analogs + GROUPING SETS), adapted to the fixture schema.

The reference (/root/reference/README.md) has no outer joins, no
correlated EXISTS chains, no count-distinct, no grouping sets
(SURVEY.md §2.3/§2.5 "not present"); a drop-in engine needs them.
The fixture corpus lacks ``partsupp`` and commit/receipt dates, so
shapes that need them are re-anchored on available columns with the
PLAN SHAPE preserved (noted per query).

Scale notes (the 100 TB shape of each):
- q7/q8/q9: fact table shuffles once on its join key per hop; every
  dimension (supplier, nation, region, part) is broadcast, so the
  lineitem side never re-shuffles for a dim.
- q13: left-outer on the customer/orders key, then a tiny re-agg on
  the count value — second shuffle is on an already-aggregated frame.
- q15: the revenue view is aggregated once and cached; the global max
  is a one-row broadcast, not a driver-side collect.
- q16: count-distinct shuffles (brand,type,size,suppkey) once then
  re-aggregates; the excluded-supplier list is a broadcast anti-join.
- q21: the "late lines" frame is computed once and cached, then
  consumed by a semi-join (another supplier exists on the order) and
  an anti-join (no OTHER supplier was late) — both hash joins keyed
  on l_orderkey, the key the frame already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from ..runtime import cache_tracked

# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, per direction and year.
# Dual-nation filter rides the joined row (supplier nation x customer
# nation); both nation dims broadcast.
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_ORACLE)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        load_table(spark, sf_dir, "supplier")
        .join(load_table(spark, sf_dir, "lineitem"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(load_table(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(load_table(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: of all PROMO-part revenue sold to
# customers in EUROPE, what fraction came from NATION_3 suppliers,
# per order year. Ratio of conditional sums over a 5-way join.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
)
GROUP BY o_year
"""


@register("tpch_q8_national_market_share", _Q8_ORACLE)
def tpch_q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    promo_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    europe_cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        load_table(spark, sf_dir, "lineitem")
        # part/supplier-scaled sides carry no broadcast hints (r10
        # broadcast audit); the nation/region dims above keep theirs
        .join(promo_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(load_table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(europe_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — revenue by supplier nation and ship year for parts matching a
# name pattern (Q9's profit expression needs ps_supplycost, absent
# from the fixture corpus; the LIKE-driven scan + nation/year rollup
# — Q9's plan shape — is preserved on the revenue expression).
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year, ROUND(SUM(volume), 4) AS sum_revenue
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
)
GROUP BY nation, o_year
"""


@register("tpch_q9_part_pattern_revenue", _Q9_ORACLE)
def tpch_q9_part_pattern_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join with an
# extra join-side predicate (so unmatched customers count 0), then a
# histogram over the per-customer counts.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", _Q13_ORACLE)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue: aggregate view consumed by
# both the final join and a global-max scalar subquery. The view is
# cached (two consumers would otherwise recompute the scan+agg
# lineage — the prefix/banded-LSH lesson); the max is broadcast.
# Revenue is ROUNDED before the max-equality so both engines compare
# identical values (raw float sums differ in last-bit across engines).
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("tpch_q15_top_supplier", _Q15_ORACLE)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
        .transform(cache_tracked)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        load_table(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part profile: COUNT(DISTINCT suppkey)
# per (brand, type, size), excluding one brand and a supplier
# denylist (Q16 excludes complaint suppliers via NOT IN; the fixture
# analog is negative account balance). Bridge is lineitem (no
# partsupp table in the corpus).
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#12'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("tpch_q16_supplier_diversity", _Q16_ORACLE)
def tpch_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#12")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    denylist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        # no broadcast hints: the part slice and the supplier denylist
        # both scale with the data (r10 broadcast audit) — AQE decides
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            denylist,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: on finished orders, count
# a supplier's very-late lines where ANOTHER supplier shared the
# order (EXISTS → semi-join) but no OTHER supplier was also late
# (NOT EXISTS → anti-join). "Late" is l_shipdate > o_orderdate +
# 1000 days (the corpus has no commit/receipt dates; ~p85 of the
# ship-lag distribution, so lateness is selective). The late frame
# is cached — it feeds both the probe side and the anti-join side.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 1000 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM supplier JOIN late l1 ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


@register("tpch_q21_waiting_suppliers", _Q21_ORACLE)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    finished = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late = (
        lineitem.join(finished, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 1000 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .transform(cache_tracked)
    )
    other_lines = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waiting = (
        late.join(
            other_lines,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            load_table(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — multi-granularity revenue in one pass: (flag,
# status), (flag), and grand total, with explicit grouping flags so
# the NULL rows are unambiguous. Exercises the SQL surface (Spark's
# DataFrame API has rollup/cube; arbitrary grouping sets are SQL).
# One shuffle produces all three granularities (Spark expands the
# grouping sets into a single Expand + hash aggregate).
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_revenue", _GSETS_ORACLE)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import ansi_empty_grouping_row

    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gsets_lineitem")
    result = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               COUNT(*) AS n_lines
        FROM gsets_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
    # ANSI emits the global grouping-set row even over an empty table
    return ansi_empty_grouping_row(
        li,
        result,
        [
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(1).cast("int").alias("g_flag"),
            F.lit(1).cast("int").alias("g_status"),
            F.lit(None).cast("double").alias("revenue"),
            F.lit(0).cast("long").alias("n_lines"),
        ],
    )
