"""TPC-H-style warehouse analytics over the synthetic star schema.

Three classic decision-support shapes (pricing summary, shipping
priority, local-supplier volume) re-expressed over the driver's
TPC-H-ish tables.  They close the "generic OLAP over the same lake"
surface for a user replacing the reference ETL (which has no analytics
tier — SURVEY.md §2.4 scopes only its ETL aggregations), and they are
the three plans every warehouse engine is judged on: a full-scan
partial aggregation, a filtered fact-to-fact join with top-k, and a
multi-dimension snowflake join.

Scale notes (the 100 TB plan, asserted in tests/test_plans.py):

* ``tpch_pricing_summary`` — single scan, map-side partial agg on a
  6-group key; the shipdate filter and 7-column projection reach the
  parquet scan.  No join, one shuffle of ~6 rows per task.
* ``tpch_shipping_priority`` — customer is filtered to one segment and
  joined to orders on the shuffle; lineitem joins orders on the same
  key.  At 100 TB both sides are fact-sized, so these stay shuffle
  hash/sort-merge joins (no broadcast hint); date filters prune both
  scans before the exchange.
* ``tpch_local_supplier_volume`` — nation⋈region is a driver-sized
  dimension reduced *first* and broadcast to both customer and
  supplier; the c_nationkey = s_nationkey co-location predicate rides
  the lineitem⋈supplier join as a post-join filter on broadcast-joined
  columns, never a second shuffle.

Hash-compare discipline: every money aggregate is computed in exact
DECIMAL arithmetic (doubles cast to DECIMAL(18,2) at the scan, products
kept within precision 38 so neither engine truncates), so the sums are
bit-identical between Spark and DuckDB rather than
accumulation-order-dependent doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.tables import read_table

_D = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount), exactly, in decimal.

    price is DECIMAL(18,2); (1 - discount) is DECIMAL(19,2); the product
    is scale 4 within precision 38 in both Spark and DuckDB, so no
    engine-dependent truncation occurs.
    """
    price = F.col("l_extendedprice").cast(_D)
    disc = F.lit(1).cast(_D) - F.col("l_discount").cast(_D)
    return price * disc


# ---------------------------------------------------------------------------
# Q1-style: pricing summary report (full-scan partial aggregation)
# ---------------------------------------------------------------------------

def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary by (returnflag, linestatus) over shipped lineitems.

    charge = disc_price * (1 + tax): the second multiply runs on operands
    re-cast to (18,4)×(8,2) so its result is scale 6 / precision 27 —
    exact in both engines.  Final sums are widened to DECIMAL(38,s)
    (exact) so the output scales match DuckDB's column-for-column.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _disc_price()
    charge = disc_price.cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(8,2)") + F.col("l_tax").cast("decimal(8,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_D)).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_D)).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_PRICING_SUMMARY = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(38,4)) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2))))
            AS DECIMAL(38,6)) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3-style: shipping priority (fact-to-fact join + deterministic top-k)
# ---------------------------------------------------------------------------

def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 open orders of one market segment by outstanding revenue.

    Ties on revenue are broken by o_orderkey so the top-k is
    deterministic across engines.
    """
    cutoff = F.lit("1997-06-15").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", _disc_price().alias("disc_price"))
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("disc_price").cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_TPCH_SHIPPING_PRIORITY = """
SELECT o_orderkey,
       o_orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(38,4)) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate  > TIMESTAMP '1997-06-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5-style: local supplier volume (snowflake join, broadcast dims)
# ---------------------------------------------------------------------------

def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation for one region where the supplying and ordering
    nations coincide.

    nation⋈region collapses to a ≤25-row dimension first and is
    broadcast twice; the customer-nation = supplier-nation constraint is
    enforced as an equality on the two broadcast-derived nation keys, so
    the only shuffles are the two fact joins.
    """
    cutoff_lo = F.lit("1996-01-01").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01").cast("timestamp")
    nations = (
        _t(spark, sf_dir, "nation")
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    # both dimension joins broadcast the IDENTICAL nations subtree (same
    # projection), so the second one is a ReusedExchange instead of a
    # second broadcast build job (guide §2.4)
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cn_key"), "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_nationkey").alias("sn_key"))
    orders = (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi))
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _disc_price().alias("disc_price")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("cn_key") == F.col("sn_key"))
        .groupBy("n_name")
        .agg(F.sum("disc_price").cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


SQL_TPCH_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DECIMAL(38,4)) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def build_registry():
    queries = {
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_shipping_priority": q_tpch_shipping_priority,
        "tpch_local_supplier_volume": q_tpch_local_supplier_volume,
    }
    oracles = {
        "tpch_pricing_summary": SQL_TPCH_PRICING_SUMMARY,
        "tpch_shipping_priority": SQL_TPCH_SHIPPING_PRIORITY,
        "tpch_local_supplier_volume": SQL_TPCH_LOCAL_SUPPLIER_VOLUME,
    }
    return queries, oracles
