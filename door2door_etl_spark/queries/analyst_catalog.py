"""Analyst query catalog, wave 2: the wider TPC-H-shaped surface.

The reference delegates all analyst queries to its Postgres warehouse
(reference README.md:3,48-51) — this module supplies the remaining classic
shapes that warehouse serves and SURVEY.md §2.4-2.6 calls for: outer joins,
correlated-subquery rewrites (join-with-agg), HAVING, disjunctive pushdown
predicates, set ops (INTERSECT/EXCEPT), CUBE grouping sets, lag/ntile
windows, exact percentiles, explode/top-k token analytics, and array math
over embeddings.

Scale notes per query are inline: every join declares its broadcast side,
every window partitions on a high-cardinality key (or pre-aggregates first),
and the disjunctive predicates stay inside the parquet scan's pushdown set.
Determinism follows relational_catalog.py: exact-decimal money sums, unique
tie-breaks under every LIMIT/window rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from door2door_etl_spark.io.readers import load_table
from door2door_etl_spark.operators.similarity import norm
from door2door_etl_spark.operators.text import tokens
from door2door_etl_spark.queries.defs import QueryDef, davg, dsum
from door2door_etl_spark.queries.sql_fragments import sql_norm, sql_tokens

# ---------------------------------------------------------------------------
# TPC-H-shaped joins / subquery rewrites
# ---------------------------------------------------------------------------


def q_tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 shape: two-nation shipping volume by year — fact⋈fact with two
    broadcast dimension legs (supplier-nation and customer-nation)."""
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(revenue).alias("revenue"))
    )


SQL_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q_tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 shape: NATION_1 suppliers' share of revenue to NATION_2-region...
    here: share of all ASIA-customer revenue supplied by NATION_1, per
    year — ratio of a conditional aggregate over a 6-way join with
    broadcast dimension legs."""
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n_cust = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", revenue)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == n_cust.cn_key)
        .join(F.broadcast(region), n_cust.cn_rkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == n_supp.sn_key)
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(nation_rev.cast("decimal(20,6)")).cast("double")
            / F.sum(revenue.cast("decimal(20,6)")).cast("double"),
            6,
        ).alias("mkt_share"),
        dsum(revenue).alias("total_revenue"),
    )


SQL_TPCH_Q8 = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  round(
    CAST(sum(CAST(CASE WHEN ns.n_name = 'NATION_1'
          THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(20,6))) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE),
    6) AS mkt_share,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS total_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def q_tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, deterministic top-20.
    Scale: the groupBy key (custkey) is high-cardinality → AQE coalesces;
    nation is broadcast."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name, c_acctbal,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Literal TPC-H Q4: order-priority counts over a 3-month order-date
    window, counting orders with at least one late lineitem (EXISTS →
    left-semi with a cross-side predicate).

    The synthetic schema has no ``l_commitdate``/``l_receiptdate``, so
    "late" is "shipped ≥90 days after the order date" — the plan shape
    (date-window scan of orders, correlated EXISTS against lineitem
    collapsing to a semi join on the order key, grouped count on the tiny
    priority key) is exactly Q4's.  The EXISTS-shape sibling without the
    date window is tpch_order_priority_semi."""
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate >= orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late_exists, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q12_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape: late-shipment priority counts — fact⋈fact join on the
    order key with a cross-side date predicate, then conditional counts.

    The synthetic schema has no ``l_shipmode``/``l_commitdate``, so line
    status stands in for ship mode and "shipped >60 days after the order
    date" is the lateness predicate; the plan shape (big-big sort-merge
    join, post-join filter referencing both sides, CASE-counts grouped on a
    tiny key) is exactly classic Q12's. Neither side broadcasts at scale —
    this is the canonical shuffle-on-orderkey join."""
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_tpch_q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 shape: customer order-count distribution — LEFT OUTER join
    preserving zero-order customers, double aggregation."""
    cust = load_table(spark, sf, "customer").select("c_custkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
GROUP BY 1
"""


def q_tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: promo revenue share — conditional aggregate over a
    fact⋈dim join (part broadcast; filter pushed to the lineitem scan)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue)
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo.cast("decimal(20,6)")).cast("double")
            / F.sum(revenue.cast("decimal(20,6)")).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = """
SELECT round(
    100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
               THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(20,6))) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE),
    4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 shape: supplier(s) with max quarterly revenue — pre-aggregate,
    then an all-rows window MAX (single tiny row set after the agg) and an
    equality filter; exact-decimal revenue makes the tie semantics stable."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dsum(revenue).alias("total_revenue"))
    w = Window.partitionBy()
    top = per_supp.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


SQL_TPCH_Q15 = """
WITH per_supp AS (
  SELECT l_suppkey,
    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
"""


def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part avg quantity)
    rewritten as join-with-aggregate — the Spark-first form of
    `l_quantity < 0.2 * (SELECT avg ... WHERE same part)`."""
    li = load_table(spark, sf, "lineitem")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    joined = li.join(per_part_avg, li.l_partkey == per_part_avg.ap_partkey)
    small = joined.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(20,6)")).cast("double") / 7.0,
            2,
        ).alias("avg_yearly")
    )


SQL_TPCH_Q17 = """
WITH per_part AS (
  SELECT l_partkey AS ap_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY 1)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly
FROM lineitem JOIN per_part ON l_partkey = ap_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


def q_tpch_q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: HAVING on a grouped sum, semi-joined back to the facts,
    deterministic top-100."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.b_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey AS b_orderkey,
    round(CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE), 2) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE), 2) > 250)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = b_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate over a fact⋈dim join — Catalyst
    extracts the common l_partkey=p_partkey conjunct so the join stays an
    equi-join (broadcast part) with a residual disjunctive filter."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(
        dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


SQL_TPCH_Q19 = """
SELECT
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q22_idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 shape: global-scalar-subquery threshold (avg positive balance,
    computed once and broadcast via crossJoin) + anti join to orders,
    grouped by a derived bucket."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_orderdate")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_custkey") % 10).alias("cust_bucket")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


SQL_TPCH_Q22 = """
SELECT c_custkey % 10 AS cust_bucket, count(*) AS numcust,
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: correlated-MIN subquery (cheapest supplier per part)
    decorrelated as a per-part window rank over the fact table.  The schema
    has no partsupp, so lineitem is the part↔supplier price fact and
    unit price = l_extendedprice / l_quantity (bit-identical double math in
    both engines).  Scale: the window partitions on high-cardinality
    p_partkey; part/supplier/nation dims broadcast."""
    part = load_table(spark, sf, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") < 10)
    )
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    priced = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "l_suppkey")
    best = priced.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("unit_price", 4).alias("min_unit_price"),
        )
    )


SQL_TPCH_Q2 = """
WITH priced AS (
  SELECT p_partkey, p_brand, l_suppkey,
         l_extendedprice / l_quantity AS unit_price,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rk
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO' AND p_size < 10)
SELECT p_partkey, p_brand, s_name, n_name,
       round(unit_price, 4) AS min_unit_price
FROM priced
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1
"""


def q_tpch_q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year.  The schema
    has no partsupp supplycost, so cost = 0.6 · p_retailprice · l_quantity.
    Scale: one fact⋈fact shuffle (lineitem⋈orders on orderkey); part,
    supplier, nation legs broadcast; the p_name filter prunes the broadcast
    side before it ships."""
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum(profit).alias("sum_profit"))


SQL_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        - 0.6 * p_retailprice * l_quantity AS DECIMAL(20,6))) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


def q_tpch_q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: global-scalar-subquery threshold — parts whose ASIA-supplied
    value exceeds a fraction of the total ASIA-supplied value.  The scalar is
    a one-row agg crossJoin-broadcast (no second scan pass at the consumer);
    exact decimal sums make the > comparison engine-stable."""
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_li = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    per_part = asia_li.groupBy("l_partkey").agg(
        F.sum(value.cast("decimal(20,6)")).cast("double").alias("part_value")
    )
    # Self-scaling threshold (TPC-H scales Q11's fraction with SF for the
    # same reason): keep parts above 2× the mean per-part share, so the
    # result stays selective-but-nonempty at every scale factor.
    total = asia_li.agg(
        F.sum(value.cast("decimal(20,6)")).cast("double").alias("total_value"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value")
            > (F.lit(2.0) / F.col("n_parts")) * F.col("total_value")
        )
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


SQL_TPCH_Q11 = """
WITH asia_li AS (
  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
SELECT l_partkey,
       round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS part_value
FROM asia_li
GROUP BY 1
HAVING CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
       > (2.0 / (SELECT count(DISTINCT l_partkey) FROM asia_li))
         * (SELECT CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) FROM asia_li)
"""


def q_tpch_q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape: NOT IN subquery (suppliers with negative balance — the
    'complaints' stand-in) as a left_anti join, then COUNT(DISTINCT) per
    part attribute group.  Scale: part broadcast; the distinct-agg shuffles
    once on the (brand,type,size) group key."""
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def q_tpch_q20_excess_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: nested semi-join chain — suppliers who shipped more than a
    threshold quantity of a part-name family in one year, surfaced as a
    left_semi against the supplier dim.  The HAVING side aggregates before
    the semi, so only qualifying suppkeys cross the join."""
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf, "lineitem").filter(F.year("l_shipdate") == 1998)
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double").alias("qty"))
        .filter(F.col("qty") > 200)
    )
    supp = load_table(spark, sf, "supplier")
    return supp.join(
        F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


SQL_TPCH_Q20 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%' AND year(l_shipdate) = 1998
  GROUP BY 1
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) > 200)
"""


def q_tpch_q21_sole_returning_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 shape: correlated EXISTS (another supplier on the order) +
    NOT EXISTS (another *returning* supplier) — decorrelated as one grouped
    pass over lineitem with conditional DISTINCT counts, so the multi-EXISTS
    costs a single shuffle instead of two self-joins.  The sole returning
    supplier is recovered as min(CASE WHEN returned THEN suppkey END)."""
    li = load_table(spark, sf, "lineitem")
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(ret_supp).alias("n_ret_supp"),
        F.min(ret_supp).alias("ret_suppkey"),
    )
    sole = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    supp = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("ret_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("ret_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


SQL_TPCH_Q21 = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS ret_suppkey
  FROM lineitem GROUP BY 1)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON ret_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_ret_supp = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Set operations / grouping sets
# ---------------------------------------------------------------------------


def q_set_intersect_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT (distinct set semantics): users who both click and
    purchase — a shuffle-on-key set op, the EXCEPT/INTERSECT surface
    SURVEY.md §2.6 notes the reference lacks."""
    ev = load_table(spark, sf, "events")
    clickers = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 90)
    ).select("user_id")
    buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    ).select("user_id")
    return clickers.intersect(buyers)


SQL_SET_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'click' AND value > 90
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
"""


def q_set_except_view_error(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT (distinct set semantics = DataFrame.subtract): viewers who
    never made a large purchase."""
    ev = load_table(spark, sf, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    big_buyers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    ).select("user_id")
    return viewers.subtract(big_buyers)


SQL_SET_EXCEPT = """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
"""


def q_cube_lineitem_status(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two keys)."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
    )


SQL_CUBE_LINEITEM_STATUS = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE), 2) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets_order_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP specialize):
    per (priority, status), per priority, and grand total in one pass.
    Spark plans this as a single Expand + hash aggregate — one shuffle for
    all three granularities, the same way it executes cube/rollup."""
    orders = load_table(spark, sf, "orders")
    return orders.groupingSets(
        [("o_orderpriority", "o_orderstatus"), ("o_orderpriority",), ()],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


SQL_GROUPING_SETS_ORDER_MIX = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
"""


def q_event_value_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type z-score outliers: grouped moment stats joined back to the
    fact, keeping events more than 2 sigma above their type's mean.

    Scale shape: the stats aggregate collapses to one row per event type
    (tiny), so the join back is an explicit broadcast — the fact table is
    scanned twice but never shuffled.  Determinism: sum and sum-of-squares
    accumulate as exact DECIMAL(20,6); mean/variance/sqrt are then a fixed
    chain of IEEE double ops, bit-identical across engines."""
    ev = load_table(spark, sf, "events").select("event_id", "event_type", "value")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(20,6)")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    typed = stats.select(
        F.col("event_type").alias("t_type"), mean.alias("mean"), std.alias("std")
    )
    z = (v - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(typed), ev.event_type == typed.t_type)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("zscore"))
        .filter(F.round(z, 4) > 2.0)
    )


SQL_EVENT_VALUE_OUTLIERS = """
WITH stats AS (
  SELECT event_type AS t_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(20,6))) AS DOUBLE) AS s2
  FROM events GROUP BY 1)
SELECT event_id, event_type, value,
  round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS zscore
FROM events JOIN stats ON event_type = t_type
WHERE round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) > 2.0
"""


# ---------------------------------------------------------------------------
# Window analytics
# ---------------------------------------------------------------------------


def q_window_interevent_gap(spark: SparkSession, sf: str) -> DataFrame:
    """LAG window per user: mean inter-event gap in microseconds.
    Scale: partitions on user_id (high cardinality) so window state stays
    per-key-small.  Determinism: gaps sum as exact BIGINT (fits 2^53, so the
    double division below is bit-identical across engines); a decimal-cast
    double sum would drift in the last ulp at this magnitude."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    gaps = ev.select("user_id", gap.alias("gap_us")).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("gap_us").cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_gap_us"),
    )


SQL_WINDOW_INTEREVENT_GAP = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_gaps,
  round(CAST(sum(gap_us) AS DOUBLE) / count(*), 4) AS avg_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1
"""


def q_window_acctbal_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE decile summary over customer balances (unique tie-break).
    Scale note: a global NTILE is single-partition by construction; it runs
    on the already-small customer dim, never on a fact table."""
    cust = load_table(spark, sf, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    deciled = cust.withColumn("decile", F.ntile(10).over(w))
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        davg(F.col("c_acctbal")).alias("avg_bal"),
    )


SQL_WINDOW_ACCTBAL_DECILES = """
WITH deciled AS (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer)
SELECT decile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) / count(*), 4) AS avg_bal
FROM deciled GROUP BY 1
"""


def q_percentile_event_value(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per event type (median + p90).
    Spark `percentile` and DuckDB `quantile_cont` share the same
    linear-interpolation definition."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_PERCENTILE_EVENT_VALUE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50_value,
       round(quantile_cont(value, 0.9), 4) AS p90_value,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def q_full_outer_user_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join reconciliation: per-user click revenue vs purchase
    revenue, preserving users present on only one side."""
    ev = load_table(spark, sf, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("cu"))
        .agg(dsum(F.col("value")).alias("click_sum"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("bu"))
        .agg(dsum(F.col("value")).alias("purchase_sum"))
    )
    joined = clicks.join(buys, clicks.cu == buys.bu, "full_outer")
    return joined.select(
        F.coalesce(F.col("cu"), F.col("bu")).alias("user_id"),
        "click_sum",
        "purchase_sum",
    )


SQL_FULL_OUTER_USER_FUNNEL = """
WITH clicks AS (
  SELECT user_id AS cu,
    round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS click_sum
  FROM events WHERE event_type = 'click' GROUP BY 1),
buys AS (
  SELECT user_id AS bu,
    round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS purchase_sum
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT coalesce(cu, bu) AS user_id, click_sum, purchase_sum
FROM clicks FULL JOIN buys ON cu = bu
"""


# ---------------------------------------------------------------------------
# Explode / array analytics (documents + embeddings)
# ---------------------------------------------------------------------------


def q_token_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Explode + top-k: 20 most frequent tokens across the corpus
    (map-side-combinable count, deterministic tie-break on token).
    Scale: explode → partial agg per partition before the single shuffle."""
    docs = load_table(spark, sf, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("token"))
        .limit(20)
    )


SQL_TOKEN_TOPK = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({sql_tokens('text')}) AS token FROM documents)
GROUP BY 1 ORDER BY n DESC, token LIMIT 20
"""


def q_embedding_norm_by_label(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array math: mean L2 norm per label — F.aggregate/
    F.transform JVM-side, no Python in the loop."""
    emb = load_table(spark, sf, "embeddings")
    l2 = norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        davg(l2).alias("avg_norm"),
        F.round(F.min(l2), 4).alias("min_norm"),
        F.round(F.max(l2), 4).alias("max_norm"),
    )


SQL_EMBEDDING_NORM_BY_LABEL = f"""
SELECT label, count(*) AS n_vecs,
  round(CAST(sum(CAST({sql_norm('embedding')} AS DECIMAL(20,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
  round(min({sql_norm('embedding')}), 4) AS min_norm,
  round(max({sql_norm('embedding')}), 4) AS max_norm
FROM embeddings GROUP BY 1
"""


ANALYST_QUERIES: list[QueryDef] = [
    QueryDef("tpch_q2_min_cost_supplier", q_tpch_q2_min_cost_supplier, SQL_TPCH_Q2, "§2.4-join,§2.6-window", ("tpch",)),
    QueryDef("tpch_q7_volume_shipping", q_tpch_q7_volume_shipping, SQL_TPCH_Q7, "§2.4-join", ("tpch",)),
    QueryDef("tpch_q8_market_share", q_tpch_q8_market_share, SQL_TPCH_Q8, "§2.4-join,§2.5-agg", ("tpch",)),
    QueryDef("tpch_q9_product_type_profit", q_tpch_q9_product_type_profit, SQL_TPCH_Q9, "§2.4-join,§2.5-agg", ("tpch",)),
    QueryDef("tpch_q10_returned_items", q_tpch_q10_returned_items, SQL_TPCH_Q10, "§2.4-join,§2.6-limit", ("tpch",)),
    QueryDef("tpch_q11_important_parts", q_tpch_q11_important_parts, SQL_TPCH_Q11, "§2.5-having", ("tpch",)),
    QueryDef("tpch_q4_order_priority", q_tpch_q4_order_priority, SQL_TPCH_Q4, "§2.4-semi,§2.5-agg", ("tpch",)),
    QueryDef("tpch_q12_priority_shipping", q_tpch_q12_priority_shipping, SQL_TPCH_Q12, "§2.4-join,§2.5-agg", ("tpch",)),
    QueryDef("tpch_q13_order_count_distribution", q_tpch_q13_order_count_distribution, SQL_TPCH_Q13, "§2.4-outer", ("tpch",)),
    QueryDef("tpch_q14_promo_revenue", q_tpch_q14_promo_revenue, SQL_TPCH_Q14, "§2.5-agg", ("tpch",)),
    QueryDef("tpch_q15_top_supplier", q_tpch_q15_top_supplier, SQL_TPCH_Q15, "§2.6-window", ("tpch",)),
    QueryDef("tpch_q16_supplier_count", q_tpch_q16_supplier_count, SQL_TPCH_Q16, "§2.4-anti,§2.5-distinct", ("tpch",)),
    QueryDef("tpch_q17_small_quantity_revenue", q_tpch_q17_small_quantity_revenue, SQL_TPCH_Q17, "§2.4-join,§2.5-agg", ("tpch",)),
    QueryDef("tpch_q18_large_volume_customer", q_tpch_q18_large_volume_customer, SQL_TPCH_Q18, "§2.5-having", ("tpch",)),
    QueryDef("tpch_q19_disjunctive_revenue", q_tpch_q19_disjunctive_revenue, SQL_TPCH_Q19, "§2.3-filter", ("tpch",)),
    QueryDef("tpch_q20_excess_shippers", q_tpch_q20_excess_shippers, SQL_TPCH_Q20, "§2.4-semi,§2.5-having", ("tpch",)),
    QueryDef("tpch_q21_sole_returning_supplier", q_tpch_q21_sole_returning_supplier, SQL_TPCH_Q21, "§2.4-semi,§2.5-distinct", ("tpch",)),
    QueryDef("tpch_q22_idle_rich_customers", q_tpch_q22_idle_rich_customers, SQL_TPCH_Q22, "§2.4-anti,§2.5-agg", ("tpch",)),
    QueryDef("rel_set_intersect_click_purchase", q_set_intersect_click_purchase, SQL_SET_INTERSECT, "§2.6-setops", ("rel",)),
    QueryDef("rel_set_except_view_error", q_set_except_view_error, SQL_SET_EXCEPT, "§2.6-setops", ("rel",)),
    QueryDef("rel_cube_lineitem_status", q_cube_lineitem_status, SQL_CUBE_LINEITEM_STATUS, "§2.5-cube", ("rel",)),
    QueryDef("rel_grouping_sets_order_mix", q_grouping_sets_order_mix, SQL_GROUPING_SETS_ORDER_MIX, "§2.5-grouping-sets", ("rel",)),
    QueryDef("rel_event_value_outliers", q_event_value_outliers, SQL_EVENT_VALUE_OUTLIERS, "§2.5-agg,§2.4-join", ("rel",)),
    QueryDef("rel_window_interevent_gap", q_window_interevent_gap, SQL_WINDOW_INTEREVENT_GAP, "§2.6-window", ("rel",)),
    QueryDef("rel_window_acctbal_deciles", q_window_acctbal_deciles, SQL_WINDOW_ACCTBAL_DECILES, "§2.6-window", ("rel",)),
    QueryDef("rel_percentile_event_value", q_percentile_event_value, SQL_PERCENTILE_EVENT_VALUE, "§2.5-percentile", ("rel",)),
    QueryDef("rel_full_outer_user_funnel", q_full_outer_user_funnel, SQL_FULL_OUTER_USER_FUNNEL, "§2.4-outer", ("rel",)),
    QueryDef("rel_token_topk", q_token_topk, SQL_TOKEN_TOPK, "north-star text/tokens,§2.6-limit", ("rel", "text")),
    QueryDef("rel_embedding_norm_by_label", q_embedding_norm_by_label, SQL_EMBEDDING_NORM_BY_LABEL, "north-star similarity/array-math", ("rel", "similarity")),
]


def q_pareto_frontier_parts(spark: SparkSession, sf: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts minimizing
    (p_retailprice, p_size) — the Börzsönyi et al. (ICDE'01) operator
    relational engines ship as SKYLINE OF: a part survives iff no other
    part is <= on both axes and < on at least one.  Plan: one per-price
    min aggregate + ONE running-min window over the distinct-price
    relation (ROWS frame, strict predecessor) + a semi-join back — no
    self-join, no n^2 dominance test at any width.  Duplicate
    (price, size) points are mutually non-dominating and both
    survive."""
    part = load_table(spark, sf, "part")
    perx = part.groupBy("p_retailprice").agg(
        F.min("p_size").alias("_my")
    )
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front_prices = perx.select(
        "p_retailprice",
        "_my",
        F.min("_my").over(w).alias("_pm"),
    ).filter(F.col("_pm").isNull() | (F.col("_my") < F.col("_pm")))
    return (
        part.join(
            front_prices.select("p_retailprice", "_my"),
            (part["p_retailprice"] == front_prices["p_retailprice"])
            & (part["p_size"] == front_prices["_my"]),
            "left_semi",
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


SQL_PARETO_FRONTIER_PARTS = """
WITH perx AS (
  SELECT p_retailprice, min(p_size) AS my FROM part GROUP BY 1),
runm AS (
  SELECT p_retailprice, my,
         min(my) OVER (ORDER BY p_retailprice
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM perx),
front AS (
  SELECT p_retailprice, my FROM runm WHERE pm IS NULL OR my < pm)
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p JOIN front f
  ON p.p_retailprice = f.p_retailprice AND p.p_size = f.my
ORDER BY p.p_retailprice, p.p_partkey
"""


def q_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation over orders — recency (last order
    date), frequency (order count), monetary (exact-decimal spend) each
    scored into quintiles by ``ntile(5)`` with a custkey tie-break so
    the banding is deterministic in both engines; segment label =
    concatenated scores.  Monetary sums in DECIMAL(38,6) (float
    accumulation order can never move a bit — the money-aggregate
    discipline), and every ntile ordering is on exact values.  One
    aggregate + three windows over the same per-customer relation: a
    single shuffle on the aggregate, windows reuse its output.

    Scale posture: the three ``ntile(5)`` windows are UNPARTITIONED —
    exact global quintiles require a total order, which funnels the
    per-customer relation through one partition (the module's standing
    single-partition-window hazard).  Fine at bench scale (one row per
    customer); at true 100 TB scale the banding would switch to
    ``approx_percentile`` cut points broadcast back (approximate but
    distributed) or a two-pass exact-rank banding over range
    partitioning — exact ntile semantics and hash parity are why the
    bench row keeps the window form."""
    orders = load_table(spark, sf, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("spend"),
    )
    r_w = Window.orderBy(F.col("last_order").asc(), F.col("custkey").asc())
    f_w = Window.orderBy(F.col("n_orders").asc(), F.col("custkey").asc())
    m_w = Window.orderBy(F.col("spend").asc(), F.col("custkey").asc())
    return (
        per.select(
            "custkey",
            "n_orders",
            F.ntile(5).over(r_w).alias("r_score"),
            F.ntile(5).over(f_w).alias("f_score"),
            F.ntile(5).over(m_w).alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ),
        )
        .orderBy("custkey")
    )


SQL_RFM_SEGMENTS = """
WITH per AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_order,
         count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(38,6))) AS spend
  FROM orders GROUP BY 1)
SELECT custkey, n_orders,
       ntile(5) OVER (ORDER BY last_order ASC, custkey ASC) AS r_score,
       ntile(5) OVER (ORDER BY n_orders ASC, custkey ASC) AS f_score,
       ntile(5) OVER (ORDER BY spend ASC, custkey ASC) AS m_score,
       CAST(ntile(5) OVER (ORDER BY last_order ASC, custkey ASC) AS VARCHAR)
         || CAST(ntile(5) OVER (ORDER BY n_orders ASC, custkey ASC) AS VARCHAR)
         || CAST(ntile(5) OVER (ORDER BY spend ASC, custkey ASC) AS VARCHAR)
         AS segment
FROM per ORDER BY custkey
"""

ANALYST_QUERIES.extend(
    [
        QueryDef(
            "rel_pareto_frontier_parts",
            q_pareto_frontier_parts,
            SQL_PARETO_FRONTIER_PARTS,
            "2-D skyline via running-min window (no n^2 dominance join)",
            ("rel",),
        ),
        QueryDef(
            "rel_rfm_segments",
            q_rfm_segments,
            SQL_RFM_SEGMENTS,
            "RFM quintile segmentation (deterministic ntile banding, exact-decimal monetary)",
            ("rel",),
        ),
    ]
)
