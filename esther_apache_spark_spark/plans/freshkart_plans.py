"""FreshKart replay as driver queries (SURVEY.md §5 item 2, §7 M3).

The DuckDB oracle re-implements the reference pipeline's semantics
(``src/pyspark/pipeline_pyspark.py:94-184``) independently in SQL over
the SAME generated fixture files — the differential-equivalence test the
reference intended (its ``test/test_pipeline_equivalence.py`` is empty)
done properly, and wired into the driver's hash-compare gate.

The fixture is generated at import time (idempotent, seeded, pure
Python) so the files exist before either engine runs. All prices are
exact multiples of 0.25, so double sums are bit-identical across
engines with no rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from esther_apache_spark_spark.freshkart import ensure_fixture, run_freshkart_pipeline
from esther_apache_spark_spark.plans.catalog import register

_DIR = ensure_fixture()

# Shared oracle CTE prefix: the full pipeline in DuckDB SQL.
_PIPELINE_CTES = f"""
WITH customers_clean AS (
    SELECT customer_id, city,
           (CASE WHEN is_active IS NULL THEN FALSE
                 ELSE lower(trim(is_active)) IN ('1','true','yes','y','t') END)
               AS is_active
    FROM read_csv('{_DIR}/customers.csv', header=true, all_varchar=true)
),
refunds_clean AS (
    SELECT order_id, COALESCE(TRY_CAST(amount AS DOUBLE), 0.0) AS amount
    FROM read_csv('{_DIR}/refunds.csv', header=true, all_varchar=true)
),
orders_flat AS (
    SELECT order_id, customer_id, channel, created_at,
           item.sku AS item_sku, item.qty AS item_qty,
           item.unit_price AS item_unit_price
    FROM (
        SELECT order_id, customer_id, channel, created_at, payment_status,
               unnest(items) AS item
        FROM read_json('{_DIR}/orders_*.json', format='array', columns={{
            'order_id': 'VARCHAR', 'customer_id': 'VARCHAR',
            'channel': 'VARCHAR', 'created_at': 'VARCHAR',
            'payment_status': 'VARCHAR',
            'items': 'STRUCT(sku VARCHAR, qty BIGINT, unit_price DOUBLE)[]'}})
    )
    WHERE payment_status = 'paid'
),
rejects AS (
    SELECT * FROM orders_flat WHERE item_unit_price < 0
),
dedup AS (
    SELECT * FROM (SELECT * FROM orders_flat WHERE item_unit_price >= 0)
    QUALIFY row_number() OVER (
        PARTITION BY order_id
        ORDER BY created_at, item_sku, item_qty, item_unit_price) = 1
),
per_order AS (
    SELECT order_id, customer_id, channel, created_at,
           CAST(SUM(item_qty) AS BIGINT) AS items_sold,
           SUM(item_qty * item_unit_price) AS gross_revenue_eur
    FROM dedup GROUP BY 1, 2, 3, 4
),
per_order_active AS (
    SELECT p.*, c.city, substr(p.created_at, 1, 10) AS order_date
    FROM per_order p LEFT JOIN customers_clean c USING (customer_id)
    WHERE c.is_active
),
refunds_sum AS (
    SELECT order_id, SUM(amount) AS refunds_eur FROM refunds_clean GROUP BY 1
),
per_order_ref AS (
    SELECT p.order_id, p.customer_id, p.city, p.channel, p.order_date,
           p.created_at, p.items_sold, p.gross_revenue_eur,
           COALESCE(r.refunds_eur, 0.0) AS refunds_eur
    FROM per_order_active p LEFT JOIN refunds_sum r USING (order_id)
)
"""


def _dfs(spark: SparkSession) -> dict[str, DataFrame]:
    return run_freshkart_pipeline(spark, ensure_fixture())


@register(
    "freshkart_daily_city_sales",
    oracle=_PIPELINE_CTES
    + """
    SELECT order_date AS date, city, channel,
           CAST(COUNT(DISTINCT order_id) AS BIGINT) AS orders_count,
           CAST(COUNT(DISTINCT customer_id) AS BIGINT) AS unique_customers,
           CAST(SUM(items_sold) AS BIGINT) AS items_sold,
           SUM(gross_revenue_eur) AS gross_revenue_eur,
           SUM(refunds_eur) AS refunds_eur,
           SUM(gross_revenue_eur) + SUM(refunds_eur) AS net_revenue_eur
    FROM per_order_ref GROUP BY 1, 2, 3
    """,
)
def freshkart_daily_city_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline output table (pipeline_pyspark.py:175-184),
    full pipeline replay. sf_dir is unused — the FreshKart fixture is its
    own deterministic dataset."""
    return _dfs(spark)["daily_city_sales"]


@register(
    "freshkart_orders_clean",
    oracle=_PIPELINE_CTES
    + """
    SELECT order_id, customer_id, city, channel, order_date,
           items_sold, gross_revenue_eur
    FROM per_order_ref
    """,
)
def freshkart_orders_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-order output table (pipeline_pyspark.py:186-195)."""
    return _dfs(spark)["orders_clean"]


@register(
    "wordcount_textfile",
    oracle=f"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
        SELECT unnest(list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(content), '[^\\w\\s]', '', 'g')),
                       '\\s+'),
                   w -> w <> '')) AS word
        FROM read_text('{_DIR}/data.txt')
    ) GROUP BY word
    """,
)
def wordcount_textfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 text scan + the notebook word count (FIXTURES.md §1.5,
    tuto_dataframes_pyspark(2).ipynb:404-539): read.text → lower →
    strip punctuation → split → explode → filter '' → count. Newlines
    are whitespace, so per-line tokenization equals whole-file."""
    from esther_apache_spark_spark.functions.text import tokenize
    from esther_apache_spark_spark.sources.readers import read_text

    lines = read_text(spark, f"{ensure_fixture()}/data.txt")
    from pyspark.sql import functions as F

    return (
        lines.select(F.explode(tokenize(F.col("value"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "freshkart_rejects",
    oracle=_PIPELINE_CTES
    + """
    SELECT order_id, customer_id, channel, created_at,
           item_sku, item_qty, item_unit_price
    FROM rejects
    """,
)
def freshkart_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The negative-price quarantine side channel (pipeline_pyspark.py:123-130)."""
    return _dfs(spark)["rejects"]
