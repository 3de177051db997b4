"""TPC-H-shaped query catalog extensions (SURVEY.md §7 M2/M4 widening).

The reference's own query surface peaks at the `daily_city_sales`
aggregate (``pipeline_pyspark.py:175-184``); these queries extend the
engine's verified surface to the classical analytic shapes a user of a
general engine expects — conditional aggregation, scalar subqueries,
HAVING + join-back, disjunctive pushdown predicates, grouping sets, and
analytic window frames — each with a DuckDB oracle twin.

Scale notes are per-query; the common posture: exact DECIMAL aggregation
for cross-engine determinism (functions/money.py), pre-aggregation
below joins (the reference's own J2/A2 trick,
``pipeline_pyspark.py:156-160``, applied at fact scale), and NO forced
broadcast hints on relations that grow with scale factor
(customer/part/supplier and anything derived from them): their join
strategy is left to size statistics + AQE, which still picks broadcast
at test scale but degrades safely to a shuffle join at 100 TB, where a
forced hint would OOM the build side. Hints remain only on genuinely
bounded sides — nation (25 rows), region (5), and 1-row scalar
pre-aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.money import (
    dec2,
    money_sum,
    one_minus,
    one_plus,
)
from esther_apache_spark_spark.plans.catalog import register
from esther_apache_spark_spark.schemas import load_table

SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


# ---------------------------------------------------------------------------
# Q6 shape — pure scan aggregate under range predicates.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: no join, no group — the whole query is a scan with
    three range predicates and a global sum. At 100 TB this is the purest
    pushdown test: all three predicates and the 3-column ReadSchema must
    reach the parquet scan, and the aggregate is a two-stage
    partial/final with no shuffle of row data at all."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(dec2("l_extendedprice") * dec2("l_discount", "decimal(3,2)"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 shape — conditional aggregation (SUM of CASE).
# ---------------------------------------------------------------------------
@register(
    "q12_priority_lines_by_returnflag",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q12_priority_lines_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact equi-join then SUM(CASE WHEN …) —
    conditional aggregation folds what would be two filtered scans into
    one pass. The shipdate predicate prunes lineitem before the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape — conditional-sum ratio (promo revenue share).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                            THEN {SQL_DISC_PRICE} ELSE 0 END) AS DOUBLE)
                      / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE), 4) AS DOUBLE)
               AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of a conditional sum to a total sum in one
    aggregate. part grows with sf, so no broadcast hint — AQE picks
    broadcast at test scale, shuffle at cluster scale; both sums are
    exact decimals so the final double division is bit-identical
    cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = dec2("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(16,4)"))).cast("double")
                / F.sum(disc).cast("double"),
                4,
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — distinct-count with NOT-IN exclusion subquery.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY 1, 2
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (subquery) becomes a left-anti join —
    no null-trap because s_suppkey is a key. The exclusion list grows
    with sf (it is a supplier subset) — AQE sizes the anti join, which
    stays a broadcast at test scale; the distinct-count shuffles
    (brand, size, suppkey) only."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & (F.col("p_type") != "PROMO")
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — correlated aggregate subquery (per-part avg join-back).
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
               AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated `l_quantity < 0.5 * avg(quantity
    per part)` subquery is decorrelated into a pre-aggregate joined back
    to the fact — the reference's own aggregate-below-join trick
    (pipeline_pyspark.py:156-160) at fact scale. The per-part avg output
    is |parts| rows — grows with sf, so no forced hint on the
    join-back (AQE broadcasts it while it fits); avg is
    exact-decimal-sum / count for cross-engine determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "a_partkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    return (
        li.join(part_avg, li.l_partkey == part_avg.a_partkey)
        .join(part, li.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(dec2("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape — HAVING on a fact aggregate, then join back to dims.
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name AS customer_name, o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(ROUND(t.total_qty, 2) AS DOUBLE) AS total_qty
    FROM (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    ) t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate the fact, HAVING-filter the groups,
    join the survivors back to orders and customer. The HAVING output is
    tiny in selectivity but grows with sf, so the join-back strategy
    is left to AQE (broadcast while it fits) — the big table is
    aggregated exactly once either way."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.round(F.col("_qty").cast("double"), 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunction of conjunctive range predicates.
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    derives the implied single-side filters (brand IN (…) on part,
    quantity ∈ [1,30] on lineitem) and pushes them below the join —
    verify with .explain at scale; the residual disjunction evaluates
    post-join inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q22 shape — scalar subquery + anti join (idle high-balance customers).
# ---------------------------------------------------------------------------
@register(
    "q22_idle_high_balance_customers",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY 1
    """,
)
def q22_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global avg balance)
    as a broadcast 1-row cross join, NOT EXISTS (no pending order) as a
    left-anti join on the filtered orders fact. The status filter prunes
    the anti side before its shuffle; only (custkey) pairs move."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(dec2("c_acctbal"), "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — argmax via aggregate + max join-back.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey, SUM({SQL_DISC_PRICE}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-07-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_rev
    FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax over an aggregate — revenue per supplier,
    keep the max. The per-supplier aggregate is dim-sized, so the max is
    a 1-row broadcast and the equality compares exact decimals (ties
    surface as multiple rows, same as the SQL)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec2("l_extendedprice") * one_minus("l_discount")).alias("_rev")
    )
    max_rev = rev.agg(F.max("_rev").alias("_max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            F.round("_rev", 2).cast("double").alias("total_rev"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — multi-granularity aggregate in one pass.
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(r.r_name, '<all>') AS region_name,
           COALESCE(o.o_orderstatus, '<all>') AS orderstatus,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(o.o_orderstatus) AS BIGINT) AS gid,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name, o.o_orderstatus), (r.r_name), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond the catalog's rollup/cube: three explicit
    granularities in one logical aggregate (Spark expands to one
    Expand + single shuffle, not three scans). grouping_id
    disambiguates aggregate NULLs from data NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    j.createOrReplaceTempView("_gsets_base")
    return spark.sql(
        """
        SELECT COALESCE(r_name, '<all>') AS region_name,
               COALESCE(o_orderstatus, '<all>') AS orderstatus,
               CAST(grouping_id(r_name, o_orderstatus) AS BIGINT) AS gid,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
                   AS total_price
        FROM _gsets_base
        GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
        """
    )


# ---------------------------------------------------------------------------
# Analytic windows over events — lag deltas and running totals.
# ---------------------------------------------------------------------------
@register(
    "lag_event_gaps",
    oracle="""
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag (absent from the reference — SURVEY.md §2.6 'no
    lead/lag'): per-user inter-event gap in microseconds. The window
    shuffles once on user_id; (ts, event_id) is a total order so the
    lag is deterministic. This is the batch shape of the streaming
    sessionize gap test."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@register(
    "running_total_per_user",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS running_value
    FROM events
    """,
)
def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-sum frame (rowsBetween — no frame specs exist in the
    reference, SURVEY.md §2.6): running per-user value total. Summed in
    exact DECIMAL because engines associate incremental window sums
    differently (Spark running accumulator vs DuckDB segment tree) —
    decimal makes every association order identical."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(dec2("value")).over(w), 2).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Q7 shape — bidirectional nation-pair volume with year extraction.
# ---------------------------------------------------------------------------
@register(
    "q7_nation_pair_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n1   ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2   ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-way join with a bidirectional nation-pair
    disjunction and year bucketing. The nation filter is applied to each
    broadcast dim copy BEFORE the join (either side may be 1 or 2), so
    only matching supplier/customer rows survive into the fact joins —
    Catalyst derives the single-side IN('NATION_1','NATION_2') filters
    from the disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "volume"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share: conditional-sum ratio per year.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    SELECT ship_year,
           CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
               n1.n_name AS supp_nation,
               {SQL_DISC_PRICE} AS volume
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        JOIN region r   ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'ASIA'
    )
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per year
    — a conditional-sum ratio over a six-way join. Bounded dims
    (nation/region) broadcast by hint; customer/supplier/part joins are
    AQE-sized; the region filter prunes the customer side before the
    fact join;
    both sums are exact decimals so the double division is bit-identical
    cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = dec2("l_extendedprice") * one_minus("l_discount")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(16,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS decorrelated to a semi join, then a small aggregate.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority_checking",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (no l_commitdate in this schema, so the EXISTS
    predicate is returnflag='R'): correlated EXISTS decorrelated to a
    LEFT SEMI join — the semi join never widens rows and stops probing an
    order on the first matching line. The date filter prunes the orders
    scan before the shuffle; the final aggregate is 5 groups."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q9 shape — profit by nation × year over a five-way join with a LIKE filter.
# ---------------------------------------------------------------------------
@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
               - CAST(p.p_retailprice AS DECIMAL(12,2))
                 * CAST(l.l_quantity AS DECIMAL(12,2))
                 * CAST(0.1 AS DECIMAL(3,2))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table: supply cost proxied as 10% of
    retail price × quantity, exact in decimal): profit by supplier
    nation × order year for parts matching a name pattern. part/
    supplier/part joins are AQE-sized (the LIKE filter shrinks part
    ~17× before it ships while it fits broadcast; nation keeps its
    hint); the only big shuffle is lineitem ⋈ orders on
    orderkey. All money math in DECIMAL so cross-engine sums agree."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = dec2("l_extendedprice") * one_minus("l_discount") - dec2(
        "p_retailprice"
    ) * dec2("l_quantity") * F.lit(0.1).cast("decimal(3,2)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(money_sum(profit, "profit"))
    )


# ---------------------------------------------------------------------------
# Q13 shape — outer join with a join-condition predicate, then a distribution.
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders — a LEFT
    OUTER join whose extra predicate lives IN the join condition (moving
    it to WHERE would drop zero-order customers), a per-customer count
    (COUNT(col) skips the nulls outer rows carry), then a second tiny
    aggregate over the counts. First agg shuffles on custkey; second is
    ~dozens of groups."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(customer.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q11 shape — HAVING against a scalar subquery of the same aggregate.
# ---------------------------------------------------------------------------
@register(
    "q11_important_part_value",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_val
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(ROUND(part_val, 2) AS DOUBLE) AS part_value
    FROM per_part
    WHERE part_val > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                          * CAST(0.005 AS DECIMAL(4,3))
                      FROM lineitem)
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part total value, kept only when above a
    fraction of the GLOBAL total — a scalar subquery realized as a 1-row
    broadcast cross join (no second scan ordering constraint; Spark
    reuses the shuffle for both aggregates under AQE). Threshold math is
    exact decimal so the > comparison can't flap cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec2("l_extendedprice")).alias("part_val")
    )
    total = li.agg(
        (F.sum(dec2("l_extendedprice")) * F.lit(0.005).cast("decimal(4,3)")).alias(
            "threshold"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_val") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("part_val", 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape — correlated MIN subquery as an argmin join-back.
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS supp_price
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type LIKE '%bolt%'
        GROUP BY 1, 2
    ), best AS (
        SELECT l_partkey, MIN(supp_price) AS best_price
        FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, s.s_name, n.n_name AS nation,
           CAST(c.supp_price AS DOUBLE) AS best_price
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.supp_price = b.best_price
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: a supplier's price for a part is its
    min lineitem price): for each part of a type, every supplier
    achieving the part's minimum price — the correlated MIN subquery
    decorrelated into (per part×supp min) → (per part min) → equality
    join-back. Both aggregates reuse the same partkey shuffle; `best` is
    dim-sized so the join-back broadcasts; ties keep all argmin rows
    (deterministic, unlike a LIMIT 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("%bolt%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    costs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec2("l_extendedprice")).alias("supp_price"))
    )
    best = costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supp_price").alias("best_price")
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == best.b_partkey)
            & (costs.supp_price == best.best_price),
        )
        .join(supplier, costs.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("supp_price").cast("double").alias("best_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested aggregates feeding a semi join (dominant suppliers).
# ---------------------------------------------------------------------------
@register(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
        GROUP BY 1, 2
    ), pt AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM sp GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM sp
    JOIN pt ON sp.l_partkey = pt.l_partkey
    JOIN supplier s ON sp.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE sp.qty > CAST(0.5 AS DECIMAL(2,1)) * pt.total_qty
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty > half of shipped qty becomes: supplier
    shipped > half of the part's total): nested aggregation — per
    (part,supp) quantity, re-aggregated per part — joined back on
    partkey, the >50% filter, then effectively a semi join into the
    supplier dim (DISTINCT collapses multi-part dominance). The second
    aggregate and the join-back reuse the partkey shuffle; quantities
    summed in decimal so the threshold comparison is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sp = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty"))
    )
    pt = sp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = sp.join(pt, sp.l_partkey == pt.t_partkey).filter(
        F.col("qty") > F.lit(0.5).cast("decimal(2,1)") * F.col("total_qty")
    )
    return (
        dominant.join(supplier, dominant.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS decorrelated to per-order aggregates.
# ---------------------------------------------------------------------------
@register(
    "q21_sole_failing_supplier",
    oracle="""
    WITH flines AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
                   AS n_fail
        FROM flines GROUP BY l_orderkey
    ), culprits AS (
        SELECT DISTINCT f.l_orderkey, f.l_suppkey
        FROM flines f
        JOIN per_order po ON f.l_orderkey = po.l_orderkey
        WHERE f.l_returnflag = 'R' AND po.n_supp >= 2 AND po.n_fail = 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM culprits c JOIN supplier s ON c.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (commit/receipt dates absent: "late" is
    returnflag='R'): suppliers who were the ONLY supplier with a failed
    line in a multi-supplier finalized order. The classic EXISTS(other
    supplier) AND NOT EXISTS(other failing supplier) pair is decorrelated
    into one per-order aggregate (distinct suppliers / distinct failing
    suppliers) — one shuffle on orderkey instead of two self-joins —
    then the failing lines join that tiny filter set."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    flines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = flines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail"),
    )
    culprits = (
        flines.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_fail") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprits.join(supplier, culprits.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "percentile_rank_suppliers",
    oracle="""
    SELECT s_suppkey,
           CAST(ROUND(percent_rank() OVER w, 9) AS DOUBLE) AS pct_rank,
           CAST(ROUND(cume_dist() OVER w, 9) AS DOUBLE) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def percentile_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic window pair (W2 family): percent_rank and
    cume_dist of supplier balance within nation — rank arithmetic on
    integer positions ((rank-1)/(n-1), rows≤/n), exact in double on both
    engines; the suppkey tiebreak makes ranks total-ordered. One
    shuffle on the partition key, no join."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supplier.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 9).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).cast("double").alias("cume"),
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations (dual-role dimension).
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: one dimension (nation) playing two roles —
    supplier nation and customer nation — with a symmetric pair filter.
    Both nation roles are filtered to the two target nations BEFORE
    broadcast, so each build side ships 2 rows; the semi-join effect of
    the inner broadcast joins prunes lineitem/orders early. The only
    fact-fact shuffle is lineitem ⋈ orders on orderkey. At 100 TB the
    pair predicate cannot be pushed into either scan alone (it spans
    both roles), but the per-role IN ('NATION_1','NATION_2') residual
    IS pushed — each side scans only the two nations' rows."""
    nations = ("NATION_1", "NATION_2")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
            | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share (conditional share of a grouped total).
# ---------------------------------------------------------------------------
@register(
    "q8_national_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                             THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
                             ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE),
               6) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    GROUP BY 1
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: target nation's share of regional revenue for one
    part type, by order year — a conditional sum divided by the group
    total in a single aggregate pass (no self-join, no second scan).
    part is pre-filtered on p_type before its AQE-sized join (build
    side shrinks ~6×); the customer-side nation⋈region chain collapses to a
    broadcast semi-filter on EUROPE. Numerator and denominator are
    exact decimal sums; the one double division per group is
    bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    volume = dec2("l_extendedprice") * one_minus("l_discount")
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(
            F.lit(0).cast("decimal(16,4)")
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(num.cast("double") / F.sum(volume).cast("double"), 6)
            .cast("double")
            .alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frame — value-based (interval) sliding aggregate.
# ---------------------------------------------------------------------------
@register(
    "rolling_1h_user_value",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2)))
                          OVER (PARTITION BY user_id ORDER BY ts
                                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                          AND CURRENT ROW), 2) AS DOUBLE)
               AS rolling_1h_value
    FROM events
    """,
)
def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per user, the
    decimal-exact sum of event values in the trailing 1-hour interval
    ending at each event. Rows with EQUAL timestamps (full microsecond
    precision, not truncated seconds) are peers — they share one frame
    and one result, which is why no tiebreak column is needed for
    determinism (contrast the ROWS frames elsewhere, which need the
    event_id tiebreak). Spark expresses the interval frame as
    ``rangeBetween(-3_600_000_000, 0)`` over the epoch-MICROseconds
    ordering (``unix_micros``) — the same frame DuckDB states as RANGE
    INTERVAL 1 HOUR PRECEDING over its microsecond timestamps. Ordering
    by ``ts.cast('long')`` (epoch seconds) would be wrong twice over:
    it truncates sub-second precision so distinct timestamps within one
    wall-clock second wrongly become peers, and the 1-hour bound gets
    evaluated on the truncated values.

    Scale: one shuffle on user_id + one sort per partition, identical
    cost profile to any other window; the frame is evaluated by a
    sliding two-pointer over the sorted run, not by re-scanning the
    hour for every row."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(12,2)")).over(w), 2)
        .cast("double")
        .alias("rolling_1h_value"),
    )


@register(
    "rolling_median_user_value",
    oracle="""
    SELECT user_id, event_id,
           ROUND(quantile_cont(value, 0.5)
                     OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                     AND CURRENT ROW), 4) + 0.0
               AS rolling_med
    FROM events
    """,
)
def rolling_median_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over the trailing hour — the robust twin of
    `rolling_1h_user_value` (a median shrugs off the value spikes that
    drag a rolling mean; it is the baseline for spike/anomaly
    monitoring). Spark's `percentile(0.5)` and DuckDB's `quantile_cont`
    share linear-interpolation semantics: the median of an even frame
    is one IEEE midpoint, deterministic in both engines, rounded to
    4 dp per the module doctrine. Same frame discipline as the sum
    form: ordered by epoch MICROseconds, equal timestamps are peers.

    Scale note: an exact percentile over a sliding frame cannot stream
    like SUM — Spark evaluates it per frame, O(frame) each — so at
    100 TB the knob is the frame width (an hour of one user's events),
    not the corpus; for wide frames swap in `approx_percentile` or the
    KLL sketch rollup."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.percentile("value", 0.5).over(w), 4).alias("rolling_med"),
    )


# ---------------------------------------------------------------------------
# max_by / arg-max aggregate — the single-pass form of latest-per-key.
# ---------------------------------------------------------------------------
@register(
    "latest_event_per_user_maxby",
    oracle="""
    SELECT user_id,
           arg_max(event_type, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000 + event_id)
               AS last_type,
           CAST(ROUND(CAST(arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000
                                          + event_id) AS DECIMAL(12,2)), 2)
                AS DOUBLE) AS last_value
    FROM events
    GROUP BY user_id
    """,
)
def latest_event_per_user_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per key via the ``max_by`` aggregate — same answer
    as a row_number()-over-desc window (cdc_merge_latest_state's
    mechanism) but ONE hash aggregate with map-side partial combine:
    no per-partition sort, no full row shuffle — only (key, current
    argmax) pairs move. At 100 TB this is the preferred latest-per-key
    plan; the window form earns its sort only when the full ranked
    history is needed. Tiebreak: the ordering key packs (epoch-micros,
    event_id) into one wide integer (DuckDB's arg_max takes scalar
    keys only), so equal-timestamp ties resolve identically in both
    engines via the unique event_id."""
    events = load_table(spark, sf_dir, "events")
    ordkey = F.unix_micros("ts").cast("decimal(38,0)") * F.lit(
        1_000_000_000_000
    ) + F.col("event_id")
    return events.groupBy("user_id").agg(
        F.max_by("event_type", ordkey).alias("last_type"),
        F.round(F.max_by("value", ordkey).cast("decimal(12,2)"), 2)
        .cast("double")
        .alias("last_value"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence — self-join on the basket key.
# ---------------------------------------------------------------------------
@register(
    "copurchase_brand_pairs",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    ORDER BY n_orders DESC, brand_a ASC, brand_b ASC
    LIMIT 10
    """,
)
def copurchase_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: which part brands are bought
    together in one order (top 10 pairs). The scale discipline is the
    DISTINCT **before** the self-join: collapsing line items to unique
    (order, brand) first bounds the join fan-out at C(brands-in-order,2)
    instead of C(lineitems-in-order,2) — on a 7-line order with 3
    brands that is 3 pairs, not 21, and corpus-wide it is the
    difference between a brand-pair count and a lineitem² blowup. Both
    the distinct and the self-join shuffle on the same orderkey, so the
    second Exchange vanishes (co-partitioned self-join); the part join
    is AQE-sized. Deterministic top-10 via (count desc, pair asc)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, "k")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(10)
    )


@register(
    "revenue_share_of_parent",
    oracle="""
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DECIMAL(20,2))
                   AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(rev AS DOUBLE)
                      / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
                AS DOUBLE) AS share_of_region
    FROM nat
    """,
)
def revenue_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent OLAP report: each nation's revenue as a fraction
    of its region's total — the nested-ratio shape every BI rollup
    needs. The share window runs over the AGGREGATED nation frame
    (≤ |nations| rows), never the facts — the same bounded-frame window
    doctrine as `weekly_from_daily_rollup`; revenue is summed in
    decimal (exact, order-free) and only the final share divides in
    double, rounded to 6."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nation), c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(dec2("o_totalprice", "decimal(14,2)")).alias("rev"))
    )
    w = Window.partitionBy("region")
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 6
        ).alias("share_of_region"),
    )


@register(
    "wow_growth_by_event_type",
    oracle="""
    WITH weekly AS (
        SELECT event_type, date_trunc('week', CAST(ts AS DATE)) AS week,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS wv
        FROM events GROUP BY event_type, date_trunc('week', CAST(ts AS DATE))
    )
    SELECT event_type, strftime(week, '%Y-%m-%d') AS week_start,
           CAST(wv AS DOUBLE) AS week_value,
           CAST(ROUND(CAST(wv AS DOUBLE)
                      / CAST(lag(wv) OVER (PARTITION BY event_type
                                           ORDER BY week) AS DOUBLE) - 1.0, 6)
                AS DOUBLE) AS wow_growth
    FROM weekly
    """,
)
def wow_growth_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the lag-ratio reporting
    shape (this week / last week − 1). The lag window runs over the
    weekly AGGREGATE frame (|types| × |weeks| rows); the first week's
    growth is NULL by definition (no prior), which both engines state
    identically. Weekly sums are decimal-exact; one rounded double
    ratio at the end. Monday week-truncation matches between Spark's
    date_trunc('week') and DuckDB's."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week"),
    ).agg(F.sum(dec2("value")).alias("wv"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        F.date_format("week", "yyyy-MM-dd").alias("week_start"),
        F.col("wv").cast("double").alias("week_value"),
        F.round(
            F.col("wv").cast("double") / F.lag("wv").over(w).cast("double") - 1.0, 6
        ).alias("wow_growth"),
    )


@register(
    "item_item_cosine_brands",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
        FROM ob GROUP BY p_brand
    ),
    co AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_co
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
        GROUP BY 1, 2
    ),
    sc AS (
        SELECT co.brand_a, co.brand_b, co.n_co,
               CAST(ROUND(CAST(co.n_co AS DOUBLE)
                          / sqrt(CAST(na.n AS DOUBLE) * CAST(nbb.n AS DOUBLE)),
                          6) AS DOUBLE) AS cosine
        FROM co
        JOIN nb na ON co.brand_a = na.p_brand
        JOIN nb nbb ON co.brand_b = nbb.p_brand
    )
    SELECT brand_a, brand_b, n_co, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY brand_a ORDER BY cosine DESC, brand_b ASC) AS rn
        FROM sc
    ) WHERE rn <= 3
    """,
)
def item_item_cosine_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the co-purchase signal:
    cosine-normalized brand affinity n_co(a,b)/sqrt(n(a)*n(b)) with the
    top-3 neighbors per brand — the normalization step that turns the
    raw co-occurrence counts of `copurchase_brand_pairs` into a
    recommender neighbor list (raw counts just rank popular items
    everywhere; cosine divides that popularity back out). Same scale
    discipline as the raw-count query: DISTINCT (order, brand) BEFORE
    the self-join bounds fan-out at C(brands-in-order, 2), and both
    sides shuffle on the same orderkey so the self-join is
    co-partitioned. All counts are exact BIGINTs; the only float is
    the final cosine (one IEEE sqrt + divide, rounded to 6, identical
    expression shape in both engines). The neighbor-rank window runs
    over the AGGREGATED pair frame (<= |brands|^2 rows), never the
    line items."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    nb = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_b"))
    co = (
        a.join(b, "k")
        .filter(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    na = nb.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na"))
    nbb = nb.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nb"))
    sc = (
        co.join(na, "brand_a")
        .join(nbb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            F.round(
                F.col("n_co").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("brand_a").orderBy(
        F.desc("cosine"), F.asc("brand_b")
    )
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "dow_seasonality_by_type",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, dow, cents,
           CAST(ROUND(7.0 * CAST(cents AS DOUBLE)
                      / CAST(SUM(cents) OVER (PARTITION BY event_type)
                             AS DOUBLE), 6) AS DOUBLE) AS dow_index
    FROM d
    """,
)
def dow_seasonality_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: each ISO weekday's
    share of the type's total value, scaled by 7 so 1.0 = flat (a
    Monday index of 1.4 means Mondays run 40% hot) — the calendar
    profile a capacity planner or anomaly detector baselines against
    before calling a spike anomalous (`zscore_anomaly_events` flags
    residuals; this is the expected-shape numerator). Value sums are
    exact integer cents per (type, ISO dow); the share window runs over
    the AGGREGATED frame (<= 7 x |types| rows). ISO weekday alignment
    is pinned cross-engine: Spark weekday() is 0=Monday, DuckDB isodow
    is 1=Monday, so Spark emits weekday()+1."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        (F.expr("weekday(ts)") + F.lit(1)).cast("int").alias("dow"),
    ).agg(F.sum((dec2("value") * 100).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type")
    return d.select(
        "event_type",
        "dow",
        "cents",
        F.round(
            F.lit(7.0)
            * F.col("cents").cast("double")
            / F.sum("cents").over(w).cast("double"),
            6,
        ).alias("dow_index"),
    )


_DAILY_CENTS_CTE = """
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (event_type, day, cents) daily aggregate — the bounded
    frame (|types| x |days| rows) every trend/seasonality query runs
    its second phase over, so the raw events are scanned exactly once
    per query and never enter a pair join or window."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum((dec2("value") * 100).cast("long")).alias("cents"))


@register(
    "mannkendall_trend_by_type",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS_CTE}),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.cents > a.cents THEN 1
                    WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (
        SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat
        FROM pairs GROUP BY event_type
    ),
    n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
        FROM (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, cents
        ) GROUP BY event_type
    )
    SELECT s.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie18
                AS BIGINT) AS var18,
           CAST(ROUND(CASE
               WHEN s.s_stat > 0 THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
                   / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                               - ties.tie18 AS DOUBLE) / 18.0)
               WHEN s.s_stat < 0 THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
                   / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                               - ties.tie18 AS DOUBLE) / 18.0)
               ELSE 0.0 END, 6) AS DOUBLE) AS z_stat
    FROM s
    JOIN n ON s.event_type = n.event_type
    JOIN ties ON s.event_type = ties.event_type
    """,
)
def mannkendall_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type — the nonparametric
    is-this-series-monotonically-drifting check an SRE or metrics owner
    runs before trusting a dashboard's "flat" reading; unlike the OLS
    slope it is rank-based, so one outlier day cannot fake a trend.
    S = sum of sign(later - earlier) over all day pairs, the
    tie-corrected variance 18*Var(S) = n(n-1)(2n+5) - sum t(t-1)(2t+5),
    and the continuity-corrected z — S, n and var18 are EXACT BIGINTs
    (sign arithmetic, never a float sum); the only floats are the final
    /18, one IEEE sqrt and the rounded ratio, identical expression
    shape in both engines. Scale: the day<day pair join runs over the
    shared DAILY AGGREGATE frame — bounded by the calendar
    (|types| x ~days^2/2 pairs, ~66k pairs per type-year), never the
    raw events, and the equi-key on event_type keeps it a hash join."""
    daily = _daily_cents(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("cents").alias("c2")
    )
    sgn = (
        F.when(F.col("c2") > F.col("c1"), 1)
        .when(F.col("c2") < F.col("c1"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("long")
            .alias("tie18")
        )
    )
    nn = F.col("n_days")
    var18 = (nn * (nn - 1) * (2 * nn + 5) - F.col("tie18")).cast("long")
    sd = F.col("s_stat").cast("double")
    denom = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return (
        s.join(n, "event_type")
        .join(ties, "event_type")
        .withColumn("var18", var18)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            F.round(
                F.when(F.col("s_stat") > 0, (sd - 1.0) / denom)
                .when(F.col("s_stat") < 0, (sd + 1.0) / denom)
                .otherwise(F.lit(0.0)),
                6,
            ).alias("z_stat"),
        )
    )


@register(
    "theilsen_slope_by_type",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS_CTE}),
    slopes AS (
        SELECT a.event_type,
               CAST(b.cents - a.cents AS DOUBLE)
                   / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(quantile_cont(slope, 0.5), 6) AS DOUBLE)
               AS slope_cents_per_day
    FROM slopes GROUP BY event_type
    """,
)
def theilsen_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per event type: the MEDIAN of all
    pairwise (value diff)/(day diff) slopes — the estimator that
    tolerates ~29% contaminated days where OLS breaks, and the natural
    magnitude companion to `mannkendall_trend_by_type`'s direction
    test (same pair frame, same scale posture). Each slope is one IEEE
    divide of two exact integers (cents diff, calendar-day diff); the
    median is the exact interpolating percentile over the pair frame —
    sort-based and order-insensitive, hence deterministic cross-engine
    (Spark percentile() and DuckDB quantile_cont() share the
    x_lo + frac*(x_hi - x_lo) definition). The pair join is bounded by
    the calendar exactly as in Mann-Kendall; the raw events are
    touched once, in the daily pre-aggregate."""
    daily = _daily_cents(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("cents").alias("c2")
    )
    slope = (F.col("c2") - F.col("c1")).cast("double") / F.datediff(
        F.col("d2"), F.col("d1")
    ).cast("double")
    return (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select("event_type", slope.alias("slope"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
                "slope_cents_per_day"
            ),
        )
    )


@register(
    "forecast_baseline_mae",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS_CTE}),
    lagged AS (
        SELECT event_type, cents,
               lag(cents, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
               lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
        FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(abs(cents - l1)) AS BIGINT) AS abs_err_naive_cents,
           CAST(SUM(abs(cents - l7)) AS BIGINT) AS abs_err_seasonal_cents,
           CAST(ROUND(CAST(SUM(abs(cents - l1)) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS mae_naive,
           CAST(ROUND(CAST(SUM(abs(cents - l7)) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS mae_seasonal,
           CASE WHEN SUM(abs(cents - l7)) < SUM(abs(cents - l1))
                THEN 'seasonal_naive'
                WHEN SUM(abs(cents - l7)) > SUM(abs(cents - l1))
                THEN 'naive' ELSE 'tie' END AS better_baseline
    FROM lagged WHERE l7 IS NOT NULL
    GROUP BY event_type
    """,
)
def forecast_baseline_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest per event type: one-step-ahead MAE of
    the naive (yesterday's value) vs the seasonal-naive (same weekday
    last week, 7 observed days back) predictor — the two baselines any
    proposed forecaster must beat, and the cheapest quantitative answer
    to "is this series weekly-seasonal?" (seasonal-naive winning is the
    operational signal; `dow_seasonality_by_type` shows the shape, this
    scores it). Absolute errors are EXACT BIGINTs in integer cents
    summed per type; the MAEs are one rounded divide each, and the
    winner verdict compares the two integer sums directly — no float
    enters the decision. Both lags run over the shared daily aggregate
    frame in a single window pass; rows before the 7th observed day are
    excluded from BOTH baselines so the comparison is paired on the
    identical evaluation set."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 7).over(w).alias("l7"),
    ).filter(F.col("l7").isNotNull())
    e1 = F.abs(F.col("cents") - F.col("l1"))
    e7 = F.abs(F.col("cents") - F.col("l7"))
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(e1).cast("long").alias("abs_err_naive_cents"),
        F.sum(e7).cast("long").alias("abs_err_seasonal_cents"),
        F.round(
            F.sum(e1).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mae_naive"),
        F.round(
            F.sum(e7).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mae_seasonal"),
        F.when(F.sum(e7) < F.sum(e1), F.lit("seasonal_naive"))
        .when(F.sum(e7) > F.sum(e1), F.lit("naive"))
        .otherwise(F.lit("tie"))
        .alias("better_baseline"),
    )


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    e AS (
        SELECT digit, n_orders,
               CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
                          WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
                          WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
                          WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
                          WHEN 9 THEN 0.045757 END AS expected,
               CAST(SUM(n_orders) OVER () AS BIGINT) AS total
        FROM d
    )
    SELECT digit, n_orders,
           CAST(ROUND(CAST(n_orders AS DOUBLE) / CAST(total AS DOUBLE), 6)
                AS DOUBLE) AS observed_share,
           CAST(expected AS DOUBLE) AS benford_share,
           CAST(ROUND(abs(CAST(n_orders AS DOUBLE) / CAST(total AS DOUBLE)
                          - CAST(expected AS DOUBLE)), 6) AS DOUBLE)
               AS abs_deviation
    FROM e
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classical fabricated-data screen (a synthetic or tampered amount
    column shows a flat digit histogram where organic multiplicative
    data leans 30% toward leading 1s), here doubling as a data-quality
    fingerprint a pipeline can trend release-over-release next to
    `dq_report_lineitem`. The expected Benford shares are pinned as
    identical 6-dp literals in BOTH engines (log10(1+1/d) evaluated
    once, offline — no runtime transcendental to differ in the last
    ulp); digit counts are exact BIGINTs from one hash aggregate, and
    the share window runs over the 9-row digit frame. Deviations are
    reported per digit (max-abs is the usual alarm statistic; emitting
    the full profile keeps the query a reusable report)."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    d = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n_orders"))
    expected = (
        F.when(F.col("digit") == 1, 0.301030)
        .when(F.col("digit") == 2, 0.176091)
        .when(F.col("digit") == 3, 0.124939)
        .when(F.col("digit") == 4, 0.096910)
        .when(F.col("digit") == 5, 0.079181)
        .when(F.col("digit") == 6, 0.066947)
        .when(F.col("digit") == 7, 0.057992)
        .when(F.col("digit") == 8, 0.051153)
        .when(F.col("digit") == 9, 0.045757)
    )
    w = Window.partitionBy(F.lit(0))
    share = F.col("n_orders").cast("double") / F.sum("n_orders").over(w).cast(
        "double"
    )
    return d.select(
        "digit",
        "n_orders",
        F.round(share, 6).alias("observed_share"),
        expected.cast("double").alias("benford_share"),
        F.round(F.abs(share - expected.cast("double")), 6).alias("abs_deviation"),
    )


# ---------------------------------------------------------------------------
# Q1 shape — the canonical pricing-summary scan aggregate.
# ---------------------------------------------------------------------------
_SQL_CHARGE = (
    f"({SQL_DISC_PRICE})"
    " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS sum_base_price,
           CAST(ROUND(SUM({SQL_DISC_PRICE}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_SQL_CHARGE}), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY 1, 2
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the canonical pricing-summary report, completing the
    engine's TPC-H set (Q2-Q22 were already registered): one lineitem
    scan under a single shipdate predicate, grouped by the 6-cell
    (returnflag, linestatus) domain, emitting eight aggregates (four
    decimal sums incl. the two-factor charge expression, three means,
    a count).

    Scale shape: THE map-side-combine benchmark — the group domain is 6
    rows, so partial aggregation reduces each of the thousands of scan
    partitions to ≤6 rows before the single tiny Exchange; the scan
    reads 7 columns under a pushed range filter. All money arithmetic
    in exact DECIMAL (functions/money.py) so every sum is
    order-insensitive and bit-identical cross-engine; means divide the
    exact decimal sum by the exact count in one double op."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = dec2("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    return (
        li.groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            money_sum(dec2("l_quantity"), "sum_qty"),
            money_sum(dec2("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            F.round(
                F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(dec2("l_extendedprice")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.round(
                F.sum(dec2("l_discount", "decimal(3,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Association rules — support/confidence/lift on the co-purchase pairs.
# ---------------------------------------------------------------------------
@register(
    "association_rules_brands",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM ob),
    ic AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY 1),
    pc AS (
        SELECT a.p_brand AS ba, b.p_brand AS bb,
               CAST(COUNT(*) AS BIGINT) AS cab
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    ),
    joined AS (
        SELECT pc.ba, pc.bb, pc.cab, ia.c AS ca, ib.c AS cb
        FROM pc JOIN ic ia ON pc.ba = ia.p_brand
                JOIN ic ib ON pc.bb = ib.p_brand
    ),
    rules AS (
        SELECT ba AS antecedent, bb AS consequent, cab, ca, cb FROM joined
        UNION ALL
        SELECT bb, ba, cab, cb, ca FROM joined
    )
    SELECT antecedent, consequent, cab AS n_both,
           ROUND(CAST(cab AS DOUBLE) / nb, 6) AS support,
           ROUND(CAST(cab AS DOUBLE) / ca, 6) AS confidence,
           ROUND(CAST(cab * nb AS DOUBLE) / (ca * cb), 6) AS lift
    FROM rules, n
    ORDER BY ROUND(CAST(cab * nb AS DOUBLE) / (ca * cb), 6) DESC,
             antecedent ASC, consequent ASC
    LIMIT 20
    """,
)
def association_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over the co-purchase baskets — the
    support/confidence/lift layer `copurchase_brand_pairs` stops short
    of: each undirected pair count fans out into BOTH directed rules
    a→b and b→a (same support and lift, different confidence — the
    asymmetry that tells a merchandiser which item drives the other),
    top-20 by lift with a full name tiebreak.

    Determinism: counts exact BIGINT; support/confidence are single
    double divisions; lift is computed as the exact integer products
    cab·N and ca·cb divided once — no chained float arithmetic. The
    ORDER BY uses the same rounded lift both engines emit.

    Scale shape: inherits `copurchase_brand_pairs`' discipline (DISTINCT
    before self-join bounds fan-out at C(brands-per-order, 2); distinct
    and self-join share one orderkey Exchange). The item-count side is
    the bounded brand vocabulary, the basket total is a 1-row scalar
    broadcast, and the final TakeOrderedAndProject keeps only 20 rows on
    the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    nb = ob.agg(F.countDistinct("l_orderkey").alias("nb"))
    ic = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    a = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("ba"))
    b = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("bb"))
    pc = (
        a.join(b, "k")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    joined = (
        pc.join(ic.select(F.col("p_brand").alias("ba"), F.col("c").alias("ca")), "ba")
        .join(ic.select(F.col("p_brand").alias("bb"), F.col("c").alias("cb")), "bb")
    )
    rules = joined.select(
        F.col("ba").alias("antecedent"),
        F.col("bb").alias("consequent"),
        "cab",
        "ca",
        "cb",
    ).unionAll(
        joined.select(
            F.col("bb").alias("antecedent"),
            F.col("ba").alias("consequent"),
            "cab",
            F.col("cb").alias("ca"),
            F.col("ca").alias("cb"),
        )
    )
    lift = F.round(
        (F.col("cab") * F.col("nb")).cast("double")
        / (F.col("ca") * F.col("cb")),
        6,
    )
    return (
        rules.crossJoin(nb)
        .select(
            "antecedent",
            "consequent",
            F.col("cab").alias("n_both"),
            F.round(F.col("cab").cast("double") / F.col("nb"), 6).alias(
                "support"
            ),
            F.round(F.col("cab").cast("double") / F.col("ca"), 6).alias(
                "confidence"
            ),
            lift.alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent"))
        .limit(20)
    )
