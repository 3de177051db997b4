"""Reference-parity queries (SURVEY.md §2) recast on the driver testdata.

Each query cites the reference operator rows it exercises. The testdata
role mapping (FIXTURES.md §2): ``lineitem⋈orders⋈customer`` plays the
reference's orders⋈customers enrichment; ``l_extendedprice*(1-l_discount)``
plays ``line_gross``; ``documents`` plays the word-count corpus; ``events``
plays the dedup/refunds timelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.cleaning import parse_multiformat_ts, truthy_bool
from esther_apache_spark_spark.functions.money import (
    dec2,
    mean_of_dec,
    money_sum,
    one_minus,
    one_plus,
)
from esther_apache_spark_spark.functions.text import tokenize
from esther_apache_spark_spark.operators.windows import keep_first, top_k, top_k_per_group
from esther_apache_spark_spark.plans.catalog import register
from esther_apache_spark_spark.schemas import load_table


def _d(col):  # timestamp -> ISO date string (stable across engines)
    return F.date_format(col, "yyyy-MM-dd")


# Oracle-SQL fragments matching functions.money (same decimal widths).
DEC_PRICE = "CAST({c} AS DECIMAL(12,2))"
DEC_ONE_MINUS = "(CAST(1 AS DECIMAL(3,2)) - CAST({c} AS DECIMAL(3,2)))"
DEC_ONE_PLUS = "(CAST(1 AS DECIMAL(3,2)) + CAST({c} AS DECIMAL(3,2)))"
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


# ---------------------------------------------------------------------------
# M1 flagship — daily revenue by market segment.
# Shape of the reference's daily_city_sales (pipeline_pyspark.py:175-184):
# fact ⋈ dim join (J1; AQE broadcasts the small side at test scale —
# no forced hint, customer grows with sf), filter (P7), revenue (F6),
# multi-key agg with sum + two countDistinct (A1/A3), orderBy (O1).
# ---------------------------------------------------------------------------
@register(
    "flagship_daily_segment_sales",
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           c.c_mktsegment AS mktsegment,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS orders_count,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS unique_customers,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS items_sold,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
               AS gross_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
)
def flagship_daily_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A1+A3+F6+P7+O1 — the reference's flagship aggregation shape."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            _d("o_orderdate").alias("order_date"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.countDistinct("o_orderkey").alias("orders_count"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            money_sum(dec2("l_quantity"), "items_sold"),
            money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "gross_revenue"),
        )
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE)
               AS net_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_returnflag = 'R'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P7/P8 + F6 — narrow projection under comparison predicates.

    At scale both predicates and the 5-column projection reach the
    parquet scan (PushedFilters / ReadSchema in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.round(dec2("l_extendedprice") * one_minus("l_discount"), 2)
        .cast("double")
        .alias("net_price"),
    )


@register(
    "multikey_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({dp}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({dp} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE)
               AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(dp=SQL_DISC_PRICE),
)
def multikey_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 multi-key hash aggregate (TPC-H Q1 shape) — the reference's
    groupBy(order_id, customer_id, channel, created_at).agg(sum, sum)
    (pipeline_pyspark.py:143-148) generalized. Catalyst plans
    partial+final HashAggregate (the DF form of reduceByKey doctrine,
    tuto_rdd_pyspark(2).ipynb:469-476)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * one_minus("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec2("l_quantity"), "sum_qty"),
            money_sum(dec2("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(disc_price * one_plus("l_tax"), "sum_charge"),
            mean_of_dec(dec2("l_quantity"), "avg_qty"),
            mean_of_dec(dec2("l_extendedprice"), "avg_price"),
            mean_of_dec(dec2("l_discount", "decimal(3,2)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "preagg_left_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           COALESCE(r.returned_amt, 0.0) AS returned_amt
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS returned_amt
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    ) r ON o.o_orderkey = r.l_orderkey
    """,
)
def preagg_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A2+P12 — aggregate-below-join then left join with null→0.0 fill,
    the reference's refunds pattern (pipeline_pyspark.py:156-161). The
    pre-aggregation shrinks the build side before the shuffle — the same
    manual 'partial-agg pushdown through join' the reference does."""
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(money_sum(dec2("l_extendedprice"), "returned_amt"))
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left")
        .na.fill({"returned_amt": 0.0})
        .select("o_orderkey", "o_totalprice", "returned_amt")
    )


@register(
    "join_then_filter",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def join_then_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 exact semantics — filter AFTER a left join silently drops
    null-matched rows (effective inner join), the reference's
    is_active==True pattern (pipeline_pyspark.py:150-152). Preserved
    deliberately, not 'fixed' (SURVEY.md §7 hard-part 4). Catalyst
    rewrites the left join to inner under the null-intolerant filter."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@register(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_us, ROUND(value, 2) AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — dedup keep-first-by-time with a deterministic tiebreaker
    (event_id), the reference's order_id dedup (pipeline_pyspark.py:133-138)
    with the nondeterministic-ties fix from SURVEY.md §2.6."""
    events = load_table(spark, sf_dir, "events")
    first = keep_first(events, "user_id", [F.col("ts"), F.col("event_id")])
    return first.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 2).alias("value"),
    )


@register(
    "topk_customers_by_revenue",
    oracle="""
    SELECT c_custkey, c_name, revenue FROM (
        SELECT c.c_custkey, c.c_name,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    ) ORDER BY revenue DESC, c_custkey ASC LIMIT 10
    """,
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3 — top-k by aggregate, deterministic tiebreak on key.
    Catalyst plans TakeOrderedAndProject: per-partition heaps, no global
    sort shuffle (the scalable form of sortBy(desc).take(20)).
    Revenue is pre-aggregated per orderkey BELOW the orders join (the
    reference's own refunds trick, pipeline_pyspark.py:156-160): the
    orderkey shuffle then carries one narrow partial-sum row per order
    (~4× fewer, 2-column rows at TPC-H line/order ratio) instead of
    every lineitem — the difference that matters at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice") * one_minus("l_discount")).alias("ord_rev")
    )
    revenue = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(money_sum(F.col("ord_rev"), "revenue"))
    )
    return revenue.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(10)


@register(
    "count_distinct_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS orders_count,
           CAST(COUNT(*) AS BIGINT) AS row_count
    FROM orders GROUP BY o_orderpriority
    """,
)
def count_distinct_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — two exact count-distincts at once (pipeline_pyspark.py:175-181).
    Spark plans this as expand + two-phase aggregate; the approximate
    variant is `approx_distinct_by_priority` (extensions)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.countDistinct("o_orderkey").alias("orders_count"),
        F.count(F.lit(1)).alias("row_count"),
    )


@register(
    "derived_post_agg",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(ROUND(SUM({dp}), 2) AS DOUBLE) AS gross_revenue,
           CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN -({dp})
                          ELSE CAST(0 AS DECIMAL(16,4)) END), 2) AS DOUBLE) AS refunds,
           CAST(ROUND(SUM({dp}) + SUM(CASE WHEN l_returnflag = 'R' THEN -({dp})
                          ELSE CAST(0 AS DECIMAL(16,4)) END), 2) AS DOUBLE) AS net_revenue
    FROM lineitem GROUP BY 1
    """.format(dp=SQL_DISC_PRICE),
)
def derived_post_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — derived column AFTER aggregation with the reference's sign
    convention: refunds are NEGATIVE so net = gross + refunds uses
    ADDITION (pipeline_pyspark.py:182-184; SURVEY.md §7 hard-part 5)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * one_minus("l_discount")
    refund_term = F.when(F.col("l_returnflag") == "R", -disc_price).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    agg = li.groupBy(_d("l_shipdate").alias("ship_date")).agg(
        F.sum(disc_price).alias("_gross"),
        F.sum(refund_term).alias("_refunds"),
    )
    return agg.select(
        "ship_date",
        F.round("_gross", 2).cast("double").alias("gross_revenue"),
        F.round("_refunds", 2).cast("double").alias("refunds"),
        # refunds are negative → net = gross + refunds by ADDITION;
        # computed on the exact decimal sums, not the rounded doubles
        F.round(F.col("_gross") + F.col("_refunds"), 2).cast("double").alias("net_revenue"),
    )


@register(
    "global_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
    FROM lineitem
    """,
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — global reduce/count as a single-row aggregate (the DF form of
    rdd.reduce(add) / rdd.count(), tuto_rdd_pyspark(2).ipynb cell 29)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(dec2("l_quantity"), "total_qty"),
        # min/max select an existing double — no reduction drift, no round
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
    )


# ---------------------------------------------------------------------------
# Word count — the reference's "query workload" (SURVEY.md §3.3).
# ---------------------------------------------------------------------------
_WORDCOUNT_ORACLE_BODY = """
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(list_filter(
                       regexp_split_to_array(
                           trim(regexp_replace(lower(text), '[^\\w\\s]', '', 'g')),
                           '\\s+'),
                       w -> w <> '')) AS word
            FROM documents
        ) GROUP BY word
"""


@register("word_count", oracle=f"SELECT word, cnt FROM ({_WORDCOUNT_ORACLE_BODY})")
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F1-F4/A4/P10 — lower → strip punctuation → split → explode →
    filter '' → groupBy(word).count() (tuto_dataframes_pyspark(2).ipynb:404-539),
    run over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "word_topk",
    oracle=f"""
    SELECT word, cnt FROM ({_WORDCOUNT_ORACLE_BODY})
    ORDER BY cnt DESC, word ASC LIMIT 20
    """,
)
def word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — the reference's top-20 words (show(20)/take(20)), with a
    deterministic tiebreak on the word itself."""
    counts = word_count(spark, sf_dir)
    return counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(20)


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.8).
# ---------------------------------------------------------------------------
@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U3 — union then distinct (rdd1.union(rdd2),
    tuto_rdd_pyspark(2).ipynb:392 + distinct :361)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — intersection (tuto_rdd_pyspark(2).ipynb:423)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — except (absent from the reference; free Spark extension)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)


# ---------------------------------------------------------------------------
# Native UDF rewrites exercised as queries (F8/F9).
# ---------------------------------------------------------------------------
@register(
    "truthy_bool_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_raw,
           (CASE WHEN props IS NULL OR json_extract_string(props, '$.k') IS NULL THEN FALSE
                 ELSE lower(trim(json_extract_string(props, '$.k')))
                      IN ('1','true','yes','y','t') END) AS k_truthy
    FROM events
    """,
)
def truthy_bool_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/D1 — the controle_bool truth table as a native expression
    (string semantics: None→False, lower/strip ∈ truthy set), applied to
    a JSON-extracted field. No Python worker in the plan."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return events.select(
        "event_id",
        k.alias("k_raw"),
        truthy_bool(k).alias("k_truthy"),
    )


@register(
    "multiformat_date_parse",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date
    FROM events
    """,
)
def multiformat_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/D2 — multi-format date parsing as native try_to_timestamp
    coalesce (pipeline_pyspark.py:48-56 rewritten). Half the rows are
    rendered 'YYYY-MM-DD HH:MM:SS', half date-only 'YYYY-MM-DD'; both
    must parse to the same ISO date (the oracle states the semantics)."""
    events = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 2 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd"))
    return events.select(
        "event_id",
        F.date_format(parse_multiformat_ts(raw), "yyyy-MM-dd").alias("event_date"),
    )


# ---------------------------------------------------------------------------
# Window rank / per-group top-k (W2 + guide pattern).
# ---------------------------------------------------------------------------
@register(
    "rank_in_nation",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rnk FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(row_number() OVER (PARTITION BY c_nationkey
                                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        FROM customer
    ) WHERE rnk <= 5
    """,
)
def rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/O3-per-group — top-5 customers by balance within each nation
    (pandas rank, tutoriel_pandas.ipynb cell 31, as a Spark window)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("c_custkey", "c_nationkey", "c_acctbal", "rnk")
    )


@register(
    "ntile_bucketing",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS balance_quartile
    FROM customer
    """,
)
def ntile_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — pandas qcut bucketing (tutoriel_pandas.ipynb cells 17-23)
    as ntile over a total order."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return cust.select("c_custkey", F.ntile(4).over(w).alias("balance_quartile"))


@register(
    "pivot_status_by_segment",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — get_dummies/crosstab as pivot. Explicit pivot values skip
    the extra distinct-values job (required practice at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


@register(
    "summary_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*), 4)
               AS avg_price,
           ROUND(stddev_samp(o_totalprice), 2) AS stddev_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — describe/summary statistics per group (tutoriel_pandas.ipynb
    cells 34-39) as declarative aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        mean_of_dec(dec2("o_totalprice", "decimal(14,2)"), "avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("stddev_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "collect_values_per_group",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def collect_values_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — groupByKey-style value retention done right: collect_set +
    sort_array (deterministic), emitted as a joined string so the hash
    is order-insensitive and engine-neutral. The RDD groupByKey form
    shuffles every row; collect_set still shuffles values but dedups
    map-side (partial aggregation) — the doctrine's 'gros shuffle'
    warning (tuto_rdd_pyspark(2).ipynb:469-476) applies to values, so
    retention is opt-in, never the default aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Join-family completion (SURVEY.md §2.4: J3/J4 + the free semi/anti
# extensions noted under "Not present anywhere").
# ---------------------------------------------------------------------------
@register(
    "semi_join_orders_with_returns",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    """,
)
def semi_join_orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join — EXISTS semantics without duplicating or carrying
    right-side columns (no row multiplication, half the shuffle payload
    of an inner join + distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderpriority")


@register(
    "anti_join_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join — NOT EXISTS (TPC-H Q22 shape)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "full_outer_nation_balance",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_customers,
           COALESCE(s.n_supp, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
          FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
    ON c.nk = s.nk
    """,
)
def full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 full-outer join of two pre-aggregates with COALESCE'd keys —
    the taxonomy demo'd in partie2.ipynb cell 33 done at scale (pre-agg
    below the join keeps both sides small)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "right_join_orders_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'MACHINERY'
    """,
)
def right_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 right join — customers kept even with zero orders (NULL
    o_orderkey rows)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "right"
    ).select("c_custkey", "c_name", "o_orderkey")


@register(
    "join_expr_dup_keys",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_custkey, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def join_expr_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — join on an expression retains BOTH key columns (the
    notebook's duplicate-customer_id gotcha, pipeline_pyspark_test.ipynb:244),
    disambiguated by DataFrame reference rather than USING-style dedup."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left"
    ).select(
        orders.o_orderkey, orders.o_custkey, customer.c_custkey, customer.c_mktsegment
    )


# ---------------------------------------------------------------------------
# TPC-H-classic multi-join shapes — the flagship generalized to 3-6 way
# joins over the full star schema (supplier/nation/region included).
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM({dp}), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """.format(dp=SQL_DISC_PRICE),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-10.
    Both date predicates push to their scans; no broadcast hint on
    customer (it grows with sf) — AQE/size stats pick broadcast at
    test scale, shuffle join at cluster scale."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            _d("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM({dp}), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """.format(dp=SQL_DISC_PRICE),
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join across the whole star schema with the
    local-supplier correlation (s_nationkey = c_nationkey). Bounded
    dims (nation=25, region=5) carry broadcast hints; customer/supplier
    grow with sf, so their join strategy is left to size stats + AQE —
    broadcast at test scale, shuffle join at cluster scale."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "revenue"))
    )


@register(
    "q10_returned_by_customer",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation, revenue FROM (
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(ROUND(SUM({dp}), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """.format(dp=SQL_DISC_PRICE),
)
def q10_returned_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(money_sum(dec2("l_extendedprice") * one_minus("l_discount"), "revenue"))
        .select("c_custkey", "c_name", "nation", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "part_brand_stats",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 20
    GROUP BY 1
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part⋈lineitem with a pushed dim predicate — covers the part table
    (the last unexercised testdata table)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            money_sum(dec2("l_quantity"), "total_qty"),
        )
    )


@register(
    "explode_embeddings",
    oracle="""
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS component
    FROM embeddings
    """,
)
def explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/P2 — posexplode of a real array column (the testdata analog of
    the reference's items explode, pipeline_pyspark.py:112-121)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select(
        "vec_id",
        "pos",
        F.round(F.col("component").cast("double"), 4).alias("component"),
    )


@register(
    "star_expand_order_items",
    oracle="""
    SELECT l.l_orderkey AS order_id,
           o.o_orderpriority AS priority,
           l.l_linenumber AS linenumber,
           l.l_partkey AS partkey,
           l.l_quantity AS quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def star_expand_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — the LITERAL struct star-expansion form ``select("items.*")``
    (reference src/pyspark/pipeline_pyspark_test.ipynb:155:
    ``orders_exploded.select("order_id", ..., "items.*")``), closing the
    one partial row of the SURVEY §2 inventory: elsewhere the repo
    flattens structs via explicit field paths (P2); here the ``.*``
    operator itself is exercised end-to-end.

    The reference's shape is reproduced faithfully — orders arrive
    NESTED (an items array of structs per order), get exploded, and the
    item struct is star-expanded next to order-level sibling columns.
    The testdata is flat, so the nesting is built first with
    collect_list(struct(...)): a real re-nest shuffle, the exact inverse
    of the reference's JSON ingestion, grouped on the join key the
    downstream explode immediately consumes. Round-trip (nest → explode
    → ``items.*``) is row-set identity, so the DuckDB oracle is the
    plain flat join — an exact multiset hash match (collect_list's
    intra-array order never survives the explode). Scale: one hash agg
    on l_orderkey + a broadcast-able dim filter; array size per row is
    bounded by lines-per-order (~7), not data-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nested = (
        li.join(urgent.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("linenumber"),
                    F.col("l_partkey").alias("partkey"),
                    F.col("l_quantity").alias("quantity"),
                )
            ).alias("items")
        )
    )
    exploded = nested.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.explode("items").alias("items"),
    )
    return exploded.select("order_id", "priority", "items.*")
