"""Warehouse-pattern operators (round 6): gaps-and-islands interval
algebra, SCD2 point-in-time lookup, exact distribution statistics from
value-frequency frames, closed-form OLS regression, and boolean /
conditional aggregation — each a named catalog query with a DuckDB
oracle twin.

The shared scale doctrine for the statistics here: NEVER sort or rank
the raw rows. Every percentile/median in this module runs over the
VALUE-FREQUENCY frame (group by the value, count, then one cumulative
window over distinct values) — the same collapse `key_skew_report` uses
for its Gini: the window's frame size is bounded by the value domain
(price points, latency seconds), not the row count, so the plan shape
survives a 100× scale-up where a `row_number` over the raw rows would
funnel whole groups through single tasks.

Cross-engine determinism: exact integer (cents / micros / quantized)
arithmetic end-to-end; ceil-style ranks via integer `div`; DECIMAL(38,0)
(DuckDB: HUGEINT) sums where BIGINT would overflow at corpus scale; the
only floats are final single divisions of exact integers, rounded."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.money import dec2
from esther_apache_spark_spark.plans.catalog import register
from esther_apache_spark_spark.schemas import EMBEDDING_DIM, load_table

# ---------------------------------------------------------------------------
# Gaps and islands: interval union coverage.
# ---------------------------------------------------------------------------

_IVL_US = 300_000_000  # each event opens a 5-minute activity interval


@register(
    "interval_union_coverage",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s, epoch_us(ts) + {_IVL_US} AS e
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island,
               event_id
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ),
    per_island AS (
        SELECT user_id, island,
               CAST(MAX(e) - MIN(s) AS BIGINT) AS cov_us
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(cov_us) AS BIGINT) AS covered_us,
           CAST(MAX(cov_us) AS BIGINT) AS longest_us
    FROM per_island GROUP BY user_id
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval UNION per user: every event opens a
    5-minute activity interval [ts, ts+5m); overlapping/touching-by-
    overlap intervals merge into islands, and the report is each user's
    island count, total covered micros, and longest island — the
    "actual active time" readout that a naive n_events × 5m sum
    overstates wherever activity is bursty (the same algebra prices
    machine-occupancy from job logs or on-screen time from heartbeats).

    The classic SQL technique, expressed once per engine: an island
    starts where the interval's start exceeds the running MAX of all
    previous ends (cummax over the per-user (ts, event_id) order — NOT
    lag(e), which misses the case where an earlier long interval
    swallows its successors); island ids are the running sum of those
    start flags; a merged island's coverage is exactly max(e) − min(s)
    because by construction no internal gap exists.

    Scale shape: both windows share ONE (user_id / s, event_id)
    sort-partition — a single Exchange, frames bounded per user — then
    two partial-aggregable groupBys. Exact integer micros end-to-end;
    the unique event_id tiebreak makes the total order deterministic."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_IVL_US)).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    pmax = F.max("e").over(wprev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(pmax.isNull() | (F.col("s") > pmax), 1).otherwise(0).alias(
            "new_island"
        ),
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).cast("long").alias("cov_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("cov_us").cast("long").alias("covered_us"),
        F.max("cov_us").alias("longest_us"),
    )


# ---------------------------------------------------------------------------
# Exact winsorized mean via the value-frequency frame.
# ---------------------------------------------------------------------------


@register(
    "winsorized_mean_order_totals",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS segment,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    freq AS (
        SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY segment, cents
    ),
    cum AS (
        SELECT segment, cents, cnt,
               SUM(cnt) OVER (PARTITION BY segment ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(cnt) OVER (PARTITION BY segment) AS n
        FROM freq
    ),
    bounds AS (
        SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN c >= (n * 5 + 99) // 100 THEN cents END) AS lo,
               MIN(CASE WHEN c >= (n * 95 + 99) // 100 THEN cents END) AS hi
        FROM cum GROUP BY segment
    )
    SELECT f.segment,
           b.n AS n_orders,
           CAST(ROUND(CAST(b.lo AS DOUBLE) / 100.0, 2) AS DOUBLE) AS p05,
           CAST(ROUND(CAST(b.hi AS DOUBLE) / 100.0, 2) AS DOUBLE) AS p95,
           CAST(ROUND(CAST(SUM(f.cnt * LEAST(GREATEST(f.cents, b.lo), b.hi))
                           AS DOUBLE)
                      / CAST(b.n AS DOUBLE) / 100.0, 4) AS DOUBLE)
               AS winsorized_mean
    FROM freq f JOIN bounds b ON f.segment = b.segment
    GROUP BY f.segment, b.n, b.lo, b.hi
    """,
)
def winsorized_mean_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order totals per market segment — the robust
    central-tendency readout (clamp to the exact p05/p95, then average)
    that a plain mean can't give when a few whale orders dominate.

    EXACT percentiles without sorting rows: percentile_disc(p) is the
    value at rank ceil(p·n), found on the VALUE-FREQUENCY frame — group
    by (segment, cents), one cumulative window over distinct price
    points per segment (domain-bounded frame), then a conditional MIN
    for each rank threshold. The clamp-and-average then re-joins the
    bounds onto the same frequency frame, so raw orders are scanned
    once and never sorted. Integer cents end-to-end; ceil via integer
    div; the mean is one double division of exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    freq = base.groupBy("segment", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wseg = Window.partitionBy("segment")
    wcum = wseg.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.select(
        "segment",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wseg).alias("n"),
    )
    bounds = cum.groupBy("segment").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 5 + 99) div 100"), F.col("cents"))
        ).alias("lo"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 95 + 99) div 100"), F.col("cents"))
        ).alias("hi"),
    )
    return (
        freq.join(bounds, on="segment", how="inner")
        .groupBy("segment", "n", "lo", "hi")
        .agg(
            F.sum(
                F.col("cnt")
                * F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
            ).alias("wsum")
        )
        .select(
            "segment",
            F.col("n").alias("n_orders"),
            F.round(F.col("lo").cast("double") / 100.0, 2).alias("p05"),
            F.round(F.col("hi").cast("double") / 100.0, 2).alias("p95"),
            F.round(
                F.col("wsum").cast("double") / F.col("n").cast("double") / 100.0,
                4,
            ).alias("winsorized_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Exact weighted median via the same value-frequency collapse.
# ---------------------------------------------------------------------------


@register(
    "weighted_median_extprice_by_flag",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    freq AS (
        SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
        FROM base GROUP BY flag, cents
    ),
    cum AS (
        SELECT flag, cents, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(w) OVER (PARTITION BY flag) AS tot
        FROM freq
    )
    SELECT flag,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           CAST(ROUND(CAST(MIN(CASE WHEN 2 * c >= tot THEN cents END)
                           AS DOUBLE) / 100.0, 2) AS DOUBLE)
               AS weighted_median_price
    FROM cum GROUP BY flag
    """,
)
def weighted_median_extprice_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of lineitem extended price per return
    flag — "the price of the median UNIT shipped", which differs from
    the row median whenever cheap items ship in bulk. Lower weighted
    median: the smallest price whose cumulative weight reaches half the
    total (2·cum ≥ total in integers — no /2 rounding question).

    Same scale shape as the winsorized mean: weights (l_quantity is
    integral by TPC-H construction — cast asserted exact BIGINT) are
    pre-summed per (flag, cents) so the cumulative window runs over
    distinct price points, not the 6M-rows-per-SF lineitem; one
    Exchange on flag, frames bounded by the price domain."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        (dec2("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    freq = base.groupBy("flag", "cents").agg(F.sum("w").cast("long").alias("w"))
    wflag = Window.partitionBy("flag")
    wcum = wflag.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.select(
        "flag",
        "cents",
        "w",
        F.sum("w").over(wcum).alias("c"),
        F.sum("w").over(wflag).alias("tot"),
    )
    return cum.groupBy("flag").agg(
        F.max("tot").cast("long").alias("total_weight"),
        F.round(
            F.min(
                F.when(2 * F.col("c") >= F.col("tot"), F.col("cents"))
            ).cast("double")
            / 100.0,
            2,
        ).alias("weighted_median_price"),
    )


# ---------------------------------------------------------------------------
# Closed-form OLS daily trend (the parametric twin of theilsen_slope_by_type).
# ---------------------------------------------------------------------------


@register(
    "ols_daily_trend_by_type",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    anchored AS (
        SELECT d.event_type,
               CAST(date_diff('day', m.d0, d.day) AS BIGINT) AS x,
               d.cents AS y
        FROM daily d
        JOIN (SELECT event_type, MIN(day) AS d0 FROM daily GROUP BY event_type) m
          ON d.event_type = m.event_type
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
               SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        FROM anchored GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS DOUBLE)
               AS slope_cents_per_day,
           CAST(ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 4)
                AS DOUBLE) AS intercept_cents
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
)
def ols_daily_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares trend of daily revenue per event type —
    the parametric partner of `theilsen_slope_by_type` and
    `mannkendall_trend_by_type` (those are rank-robust; OLS is what the
    dashboard's trendline actually draws). slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²), intercept = ȳ − slope·x̄, with x the day index
    anchored at each type's first day.

    Determinism/overflow doctrine: x is centered per type (≤ calendar
    span, not an epoch offset) and all five sufficient statistics are
    summed in DECIMAL(38,0) (DuckDB: HUGEINT) — Σxy at 100 TB daily
    revenue (~10¹³ cents/day × 365² day-pairs) blows past BIGINT but
    sits comfortably in 38 digits. The only floats are the final
    divisions of exact integers, written as the SAME IEEE expression
    tree in both engines, then rounded. Degenerate series (one day, or
    zero x-variance) are filtered identically on both sides.

    Scale: the regression runs on the bounded DAILY frame (|types| ×
    |days|); raw events are touched once by the partial-aggregable
    daily groupBy. The per-type anchor join is |types| rows."""
    from esther_apache_spark_spark.plans.tpch_more import _daily_cents

    daily = _daily_cents(spark, sf_dir)
    m = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    anchored = daily.join(m, on="event_type", how="inner").select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("x"),
        F.col("cents").alias("y"),
    )
    d38 = "decimal(38,0)"
    sums = anchored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.filter(
        (F.col("n") >= 2)
        & ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) != 0)
    ).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(num / den, 6).alias("slope_cents_per_day"),
        F.round(
            F.col("sy").cast("double") / F.col("n").cast("double")
            - (num / den) * (F.col("sx").cast("double") / F.col("n").cast("double")),
            4,
        ).alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup (as-of against validity intervals).
# ---------------------------------------------------------------------------


@register(
    "scd2_state_asof_probe",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev
        FROM events
    ),
    scd2 AS (
        SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us
        FROM ordered WHERE prev IS NULL OR prev <> event_type
    ),
    probes AS (
        SELECT user_id,
               MAX(epoch_us(ts)) - 1800000000 AS probe_us
        FROM events GROUP BY user_id
    ),
    hits AS (
        SELECT p.user_id, p.probe_us, s.state,
               row_number() OVER (PARTITION BY p.user_id
                                  ORDER BY s.valid_from_us DESC) AS rn
        FROM probes p JOIN scd2 s
          ON p.user_id = s.user_id AND s.valid_from_us <= p.probe_us
    )
    SELECT user_id, CAST(probe_us AS BIGINT) AS probe_us,
           state AS state_at_probe
    FROM hits WHERE rn = 1
    """,
)
def scd2_state_asof_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 history that
    `scd2_user_state_history` builds: for each user, "what state were
    they in 30 minutes before their last event?" — the snapshot-as-of
    join every leakage-safe feature pipeline needs (train-time features
    must reflect the state AT the label's timestamp, not the current
    row).

    Spark-first shape: NOT an inequality join. The probe frame (one row
    per user) and the version frame (valid_from per change) feed the
    sort-merge as-of operator (`operators/asof.as_of_join`): union both
    sides, one (user / ts) window pass carries the last version forward
    onto each probe — linear in versions + probes, no per-user
    version × probe blow-up, no range-join bucketing needed because
    validity intervals partition the timeline. The oracle states the
    same semantics as the classic inequality-join + row_number pick.
    Users whose probe precedes their first version (all activity inside
    the last 30 min) drop out identically on both sides."""
    from esther_apache_spark_spark.operators.asof import as_of_join
    from esther_apache_spark_spark.plans.corpus_ops import scd2_user_state_history

    hist = scd2_user_state_history(spark, sf_dir).select(
        "user_id", "valid_from_us", "state"
    )
    ev = load_table(spark, sf_dir, "events")
    probes = ev.groupBy("user_id").agg(
        (F.max(F.unix_micros("ts")) - F.lit(1_800_000_000)).alias("probe_us")
    )
    joined = as_of_join(
        probes,
        hist,
        on="user_id",
        left_ts="probe_us",
        right_ts="valid_from_us",
        value_cols=["state"],
    )
    return joined.filter(F.col("state").isNotNull()).select(
        "user_id", "probe_us", F.col("state").alias("state_at_probe")
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (feature-normalization readout).
# ---------------------------------------------------------------------------


@register(
    "embedding_dim_stats",
    oracle=f"""
    WITH dims AS (
        SELECT r.range AS dim,
               CAST(FLOOR(CAST(e.embedding[CAST(r.range AS INT)] AS DOUBLE)
                          * 10000.0 + 0.5) AS BIGINT) AS q
        FROM embeddings e CROSS JOIN range(1, {EMBEDDING_DIM + 1}) r
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(q) AS BIGINT) AS min_q,
           CAST(MAX(q) AS BIGINT) AS max_q,
           CAST(ROUND(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      / 10000.0, 6) AS DOUBLE) AS mean_val,
           CAST(ROUND((CAST(SUM(q * q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       - (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                         * (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                      / 100000000.0, 9) AS DOUBLE) AS var_val
    FROM dims GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics of the embedding corpus (n, min, max,
    mean, population variance) — the readout that decides whether a
    feature pipeline needs per-dim standardization before k-means/PQ
    (a dominant dimension drowns squared-distance metrics) and that
    catches silently-dead dims (var ≈ 0).

    Determinism: floats quantize once to integers at scale 10⁴
    (``floor(x·10⁴ + 0.5)``, exact on parquet-identical floats — the
    `clustering.py` front at a coarser scale chosen so Σq² stays exact
    BIGINT to ~10¹² vectors); mean and variance are then single double
    divisions of exact integer sums, identical expression trees both
    engines, rounded. Scale: posexplode fans out dim× rows but feeds a
    partial-aggregable groupBy on 64 keys — the shuffle carries 64
    partial-sum rows per partition, and no window or sort anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * F.lit(10000.0) + F.lit(0.5))
                .cast("long"),
            )
        ).alias("pos", "q")
    ).select((F.col("pos") + 1).cast("long").alias("dim"), "q")
    n = F.count(F.lit(1))
    sq = F.sum("q")
    sqq = F.sum(F.col("q") * F.col("q"))
    return dims.groupBy("dim").agg(
        n.alias("n_vecs"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.round(
            sq.cast("double") / n.cast("double") / 10000.0, 6
        ).alias("mean_val"),
        F.round(
            (
                sqq.cast("double") / n.cast("double")
                - (sq.cast("double") / n.cast("double"))
                * (sq.cast("double") / n.cast("double"))
            )
            / 100000000.0,
            9,
        ).alias("var_val"),
    )


# ---------------------------------------------------------------------------
# Boolean / conditional aggregation suite.
# ---------------------------------------------------------------------------


@register(
    "nation_balance_flags",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
           (SUM(CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) < 0
                     THEN 1 ELSE 0 END) > 0) AS any_negative,
           (SUM(CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) <= 0
                     THEN 1 ELSE 0 END) = 0) AS all_positive,
           CAST(COUNT(DISTINCT CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) < 0
                                    THEN c.c_mktsegment END) AS BIGINT)
               AS n_segments_with_negative,
           CAST(ROUND(CAST(SUM(CASE WHEN CAST(c.c_acctbal AS DECIMAL(12,2)) < 0
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS pct_negative
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def nation_balance_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregation suite per nation: count-if,
    ANY/EVERY-style existence flags, conditional COUNT(DISTINCT) (how
    many market segments contain a debtor), and a share — the SQL
    shapes a data-quality dashboard is made of, pinned as exact
    sum-of-CASE arithmetic (identical semantics both engines, no
    engine-specific bool_or/count_if builtins). The conditional
    distinct's CASE yields NULL for non-matching rows, which both
    engines exclude from COUNT(DISTINCT) — the standard trick, asserted
    here. One partial-aggregable groupBy after a broadcast-size dim
    join; nation is 25 rows by contract."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    neg = (dec2("c_acctbal") < 0).cast("int")
    nonpos = (dec2("c_acctbal") <= 0).cast("int")
    joined = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey, "inner"
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(neg).cast("long").alias("n_negative"),
        (F.sum(neg) > 0).alias("any_negative"),
        (F.sum(nonpos) == 0).alias("all_positive"),
        F.countDistinct(
            F.when(dec2("c_acctbal") < 0, F.col("c_mktsegment"))
        ).cast("long").alias("n_segments_with_negative"),
        F.round(
            F.sum(neg).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("pct_negative"),
    )


# ---------------------------------------------------------------------------
# Conversion latency quantiles (funnel timing, frequency-frame exact).
# ---------------------------------------------------------------------------


@register(
    "conversion_latency_quantiles",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT (p - v) // 1000000 AS latency_s
        FROM firsts WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
    ),
    freq AS (
        SELECT latency_s, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lat GROUP BY latency_s
    ),
    cum AS (
        SELECT latency_s, cnt,
               SUM(cnt) OVER (ORDER BY latency_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(cnt) OVER () AS n
        FROM freq
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(MIN(CASE WHEN c >= (n * 25 + 99) // 100 THEN latency_s END)
                AS BIGINT) AS p25_s,
           CAST(MIN(CASE WHEN c >= (n * 50 + 99) // 100 THEN latency_s END)
                AS BIGINT) AS p50_s,
           CAST(MIN(CASE WHEN c >= (n * 75 + 99) // 100 THEN latency_s END)
                AS BIGINT) AS p75_s
    FROM cum
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING: quartiles of first-view → first-purchase latency
    across converting users — `funnel_view_click_purchase` counts who
    converts; this measures how long conversion takes, the number an
    activation team actually tunes. Users with both events and
    purchase ≥ view qualify (converted-before-ever-viewing rows are
    attribution noise, excluded identically on both sides).

    Exact quartiles by the module's frequency-frame doctrine: per-user
    firsts are one conditional-min groupBy; latencies collapse to a
    (latency_s, count) frame; ONE unpartitioned cumulative window runs
    over that frame — safe because its size is bounded by distinct
    latency SECONDS (the 30-day calendar caps it at ~2.6M rows even at
    100 TB, and they're integers, not user rows), then quartiles are
    conditional MINs at the ceil(p·n) ranks. Integer micros → integer
    div seconds; no floats anywhere in the output."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p"),
    )
    lat = firsts.filter(
        F.col("v").isNotNull() & F.col("p").isNotNull() & (F.col("p") >= F.col("v"))
    ).select(F.expr("(p - v) div 1000000").alias("latency_s"))
    freq = lat.groupBy("latency_s").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("latency_s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = freq.select(
        "latency_s",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return cum.agg(
        F.max("n").cast("long").alias("n_users"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 25 + 99) div 100"), F.col("latency_s"))
        ).alias("p25_s"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 50 + 99) div 100"), F.col("latency_s"))
        ).alias("p50_s"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 75 + 99) div 100"), F.col("latency_s"))
        ).alias("p75_s"),
    )


# ---------------------------------------------------------------------------
# Distributed exact rank: range-partitioned prefix sum.
# ---------------------------------------------------------------------------


def _exact_cum(freq: DataFrame, value: str, cnt: str, ranges: int = 64) -> DataFrame:
    """Exact cumulative counts over a distinct-value frequency frame,
    with NO data-sized window: the textbook distributed prefix sum.
    ``repartitionByRange`` splits the value domain into ``ranges``
    contiguous slices (sampled boundaries — the RESULT is invariant to
    where they land, because cum(v) = slice_offset + within-slice
    cumsum holds for ANY contiguous range partitioning); within-slice
    cumsums run under a per-slice window partition, slice offsets come
    from a window over the ≤``ranges``-row slice-total frame. This is
    the scale tier the module's value-frequency doctrine needs when the
    value domain is NOT calendar/price-point bounded (e.g. per-customer
    lifetime spend, whose distinct count approaches the customer
    count). Returns (value, cnt, cum, n)."""
    part = freq.repartitionByRange(ranges, F.col(value)).withColumn(
        "_pid", F.spark_partition_id()
    )
    win_in = (
        Window.partitionBy("_pid")
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = part.withColumn("_wc", F.sum(cnt).over(win_in))
    ptot = part.groupBy("_pid").agg(F.sum(cnt).alias("_pn"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(woff), F.lit(0)).alias("_off"),
        F.sum("_pn").over(Window.partitionBy()).alias("_n"),
    )
    return within.join(offs, on="_pid", how="inner").select(
        value,
        cnt,
        (F.col("_wc") + F.col("_off")).cast("long").alias("cum"),
        F.col("_n").cast("long").alias("n"),
    )


def _quintile_map(freq: DataFrame, value: str) -> DataFrame:
    """(value, q): map every distinct metric value to its exact
    quintile 1..5 — q(v) = ceil(5·cum(v)/n), monotone, ties share a
    quintile (value-based, so engine-neutral where row-based ntile is
    not). Built on the distributed prefix sum above."""
    cumdf = _exact_cum(freq, value, "cnt")
    return cumdf.select(
        value, F.expr("(5 * cum + n - 1) div n").cast("long").alias("q")
    )


_RFM_QUINTILE_SQL = """
        SELECT {v} AS v,
               (5 * SUM(cnt) OVER (ORDER BY {v}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                + SUM(cnt) OVER () - 1) // SUM(cnt) OVER () AS q
        FROM (SELECT {v}, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM rfm GROUP BY {v})
"""


@register(
    "rfm_customer_segments",
    oracle=f"""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d_max FROM orders),
    rfm AS (
        SELECT o.o_custkey AS custkey,
               CAST(date_diff('day', MAX(CAST(o.o_orderdate AS DATE)), a.d_max)
                    AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders o CROSS JOIN anchor a
        GROUP BY o.o_custkey, a.d_max
    ),
    qr AS ({_RFM_QUINTILE_SQL.format(v="recency_days")}),
    qf AS ({_RFM_QUINTILE_SQL.format(v="frequency")}),
    qm AS ({_RFM_QUINTILE_SQL.format(v="monetary_cents")})
    SELECT r.custkey,
           CAST(6 - qr.q AS BIGINT) AS r_score,
           CAST(qf.q AS BIGINT) AS f_score,
           CAST(qm.q AS BIGINT) AS m_score,
           CAST(6 - qr.q AS VARCHAR) || CAST(qf.q AS VARCHAR)
               || CAST(qm.q AS VARCHAR) AS rfm_code
    FROM rfm r
    JOIN qr ON r.recency_days = qr.v
    JOIN qf ON r.frequency = qf.v
    JOIN qm ON r.monetary_cents = qm.v
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM scoring: per customer,
    exact quintiles of Recency (days since last order, lower is
    better so the score flips), Frequency (order count) and Monetary
    (lifetime cents), concatenated into the familiar '555'-style code.

    Quintiles are VALUE-based (q(v) = ceil(5·cum/n); ties share a
    score — deterministic where row-based ntile's tie-splitting is
    engine-arbitrary) and computed by the distributed prefix-sum
    helper: monetary's distinct-value count approaches the customer
    count at scale, so a single cumulative window would funnel the
    whole domain through one task — range partitioning + per-slice
    cumsum + a ≤64-row offset frame keeps every window bounded. The
    anchor date is a 1-row global aggregate broadcast onto the
    per-customer frame; the three quintile maps hash-join back on the
    metric value. All integers end-to-end."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d_max"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum((dec2("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff("d_max", "last_day").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    maps = {
        m: _quintile_map(
            rfm.groupBy(m).agg(F.count(F.lit(1)).alias("cnt")), m
        ).withColumnRenamed("q", f"q_{m}")
        for m in ("recency_days", "frequency", "monetary_cents")
    }
    out = (
        rfm.join(maps["recency_days"], on="recency_days", how="inner")
        .join(maps["frequency"], on="frequency", how="inner")
        .join(maps["monetary_cents"], on="monetary_cents", how="inner")
    )
    r = (6 - F.col("q_recency_days")).cast("long")
    return out.select(
        "custkey",
        r.alias("r_score"),
        F.col("q_frequency").alias("f_score"),
        F.col("q_monetary_cents").alias("m_score"),
        F.concat(
            r.cast("string"),
            F.col("q_frequency").cast("string"),
            F.col("q_monetary_cents").cast("string"),
        ).alias("rfm_code"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy pre-flight).
# ---------------------------------------------------------------------------

_K_ANON = 10


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(sz) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_groups_below_k,
           CAST(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
               AS n_rows_below_k,
           CAST(ROUND(CAST(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END)
                           AS DOUBLE)
                      / CAST(SUM(sz) AS DOUBLE), 6) AS DOUBLE)
               AS share_below_k
    FROM groups
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): group sizes, the smallest equivalence
    class, and how many classes/rows fall below k=10 — the privacy
    pre-flight a dataset release runs BEFORE publishing
    "anonymized" records, since any row in a below-k class is
    re-identifiable by its quasi-identifiers alone. Two
    partial-aggregable groupBys (rows → QI classes → 1-row report);
    the class frame is bounded by the QI domain product, never the
    row count. Exact integers; one final rounded share."""
    customer = load_table(spark, sf_dir, "customer")
    groups = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    below = F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("sz").alias("min_group_size"),
        F.sum((F.col("sz") < _K_ANON).cast("int")).cast("long").alias(
            "n_groups_below_k"
        ),
        F.sum(below).cast("long").alias("n_rows_below_k"),
        F.round(
            F.sum(below).cast("double") / F.sum("sz").cast("double"), 6
        ).alias("share_below_k"),
    )


# ---------------------------------------------------------------------------
# Percentile-band anomaly days (frequency-frame exact p10/p90).
# ---------------------------------------------------------------------------


@register(
    "revenue_anomaly_days",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    freq AS (
        SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM daily GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM freq
    ),
    bands AS (
        SELECT event_type,
               MIN(CASE WHEN c >= (n * 10 + 99) // 100 THEN cents END) AS p10,
               MIN(CASE WHEN c >= (n * 90 + 99) // 100 THEN cents END) AS p90
        FROM cum GROUP BY event_type
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           d.cents, b.p10, b.p90
    FROM daily d JOIN bands b ON d.event_type = b.event_type
    WHERE d.cents < b.p10 OR d.cents > b.p90
    """,
)
def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band anomaly detection on daily revenue: per event
    type, flag the days whose total falls outside the type's exact
    [p10, p90] band — the "which days should an on-call look at"
    readout, self-calibrating per type where a global threshold
    would drown quiet types in loud ones. Bands use the module's
    frequency-frame percentile_disc (cumulative window over distinct
    DAILY TOTALS — calendar-bounded, ~days×types rows); the band
    re-joins the daily frame on event_type. Integer cents; day
    emitted as an ISO string (oracle doctrine)."""
    from esther_apache_spark_spark.plans.tpch_more import _daily_cents

    daily = _daily_cents(spark, sf_dir)
    freq = daily.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wt = Window.partitionBy("event_type")
    wcum = wt.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = freq.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wt).alias("n"),
    )
    bands = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("c") >= F.expr("(n * 10 + 99) div 100"), F.col("cents"))
        ).alias("p10"),
        F.min(
            F.when(F.col("c") >= F.expr("(n * 90 + 99) div 100"), F.col("cents"))
        ).alias("p90"),
    )
    return (
        daily.join(bands, on="event_type", how="inner")
        .filter((F.col("cents") < F.col("p10")) | (F.col("cents") > F.col("p90")))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            "p10",
            "p90",
        )
    )


# ---------------------------------------------------------------------------
# Item-item recommendations per customer (end-to-end recommender read).
# ---------------------------------------------------------------------------


@register(
    "recommend_brands_per_customer",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
        FROM ob GROUP BY p_brand
    ),
    sim AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(FLOOR(CAST(COUNT(*) AS DOUBLE)
                          / sqrt(CAST(na.n AS DOUBLE) * CAST(nbb.n AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS cos_q
        FROM ob a
        JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
        JOIN nb na ON a.p_brand = na.p_brand
        JOIN nb nbb ON b.p_brand = nbb.p_brand
        GROUP BY a.p_brand, b.p_brand, na.n, nbb.n
    ),
    cb AS (
        SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS brand
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
    ),
    scores AS (
        SELECT cb.custkey, s.brand_b AS brand,
               CAST(SUM(s.cos_q) AS BIGINT) AS score_q
        FROM cb JOIN sim s ON cb.brand = s.brand_a
        GROUP BY cb.custkey, s.brand_b
    ),
    cand AS (
        SELECT sc.custkey, sc.brand, sc.score_q
        FROM scores sc
        LEFT JOIN cb ON sc.custkey = cb.custkey AND sc.brand = cb.brand
        WHERE cb.custkey IS NULL
    )
    SELECT custkey, brand, score_q,
           CAST(ROUND(CAST(score_q AS DOUBLE) / 1000000.0, 6) AS DOUBLE)
               AS score
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey
                   ORDER BY score_q DESC, brand ASC) AS rn
        FROM cand
    ) ranked WHERE rn <= 3
    """,
)
def recommend_brands_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end item-item recommender read: for each customer, the
    top-3 brands they have NOT bought, scored by the summed
    cosine-normalized co-purchase affinity between each candidate and
    the customer's bought-brand set — the serving-side query that
    `item_item_cosine_brands` (the neighbor-list build) exists to feed.

    Determinism across engines despite float cosines: each pairwise
    cosine quantizes per-term to an exact BIGINT
    (``floor(n_co/sqrt(n_a·n_b)·10⁶ + 0.5)`` — one IEEE sqrt/divide on
    exact integers, identical trees both engines), so the per-customer
    SCORE is an order-independent integer sum — a raw float Σcosine
    would vary with aggregation order. Already-bought brands drop via a
    left-anti join; the top-3 window runs over the aggregated
    (customer × candidate-brand) frame, bounded per customer by
    |brands|, never by line items.

    Scale: the similarity frame is |brands|²-bounded (distinct
    (order, brand) before the self-join caps fan-out, both sides
    co-partitioned on orderkey); scoring joins stream the bounded sim
    frame onto the customer-brand frame on the brand key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
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
    sim = (
        co.join(nb.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na")), "brand_a")
        .join(nb.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nbb")), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.floor(
                F.col("n_co").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nbb").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cos_q"),
        )
    )
    cb = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("custkey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    scores = (
        cb.join(sim, cb.brand == sim.brand_a)
        .groupBy("custkey", F.col("brand_b").alias("rec_brand"))
        .agg(F.sum("cos_q").cast("long").alias("score_q"))
        .withColumnRenamed("rec_brand", "brand")
    )
    cand = scores.join(cb, on=["custkey", "brand"], how="left_anti")
    w = Window.partitionBy("custkey").orderBy(F.desc("score_q"), F.asc("brand"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "custkey",
            "brand",
            "score_q",
            F.round(F.col("score_q").cast("double") / 1000000.0, 6).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group top-k terms (aggregated-frame window, not raw tokens).
# ---------------------------------------------------------------------------


@register(
    "top_terms_per_lang",
    oracle="""
    WITH tokens AS (
        SELECT lang,
               unnest(list_filter(
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '[^\\w\\s]', '', 'g')),
                       '\\s+'),
                   w -> w <> '')) AS word
        FROM documents
    ),
    freq AS (
        SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tokens GROUP BY lang, word
    )
    SELECT lang, word, cnt, CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY cnt DESC, word ASC) AS rn
        FROM freq
    ) ranked WHERE rn <= 3
    """,
)
def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tokens per language — the per-stratum twin of the global
    `word_topk`: the corpus fingerprint a lang-ID audit eyeballs first
    (a 'fr' stratum whose top terms are English stopwords is mislabeled
    upstream). The ranking window runs over the AGGREGATED (lang, word)
    frequency frame — vocabulary-bounded per language, never the raw
    token stream, which is reduced by a partial-aggregable groupBy
    first. Deterministic (cnt DESC, word ASC) tiebreak; exact counts."""
    from esther_apache_spark_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("word"))
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "word", "cnt", F.col("rn").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Additive seasonal decomposition (trend / seasonal / residual).
# ---------------------------------------------------------------------------


@register(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    win AS (
        SELECT event_type, day, dow, cents,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend7,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        FROM daily
    ),
    det AS (
        SELECT event_type, day, dow, cents, trend7,
               7 * cents - trend7 AS det7
        FROM win WHERE wn = 7
    ),
    seas AS (
        SELECT event_type, dow,
               CAST(SUM(det7) AS BIGINT) AS s_num,
               CAST(COUNT(*) AS BIGINT) AS s_cnt
        FROM det GROUP BY event_type, dow
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.cents,
           CAST(ROUND(CAST(d.trend7 AS DOUBLE) / 7.0, 4) AS DOUBLE) AS trend,
           CAST(ROUND(CAST(s.s_num AS DOUBLE)
                      / (CAST(s.s_cnt AS DOUBLE) * 7.0), 4) AS DOUBLE)
               AS seasonal,
           CAST(ROUND(CAST(d.det7 AS DOUBLE) / 7.0
                      - CAST(s.s_num AS DOUBLE)
                        / (CAST(s.s_cnt AS DOUBLE) * 7.0), 4) AS DOUBLE)
               AS residual
    FROM det d JOIN seas s
      ON d.event_type = s.event_type AND d.dow = s.dow
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue per event type
    (classical decompose / STL-lite): trend = centered 7-day moving
    average (only full windows — edges drop, the textbook convention),
    seasonal = per-ISO-weekday mean of the detrended series, residual =
    the rest. The readout that separates "Mondays are always slow"
    from "this Monday was genuinely anomalous" — the companion to
    `revenue_anomaly_days`, which flags levels but can't tell seasonal
    lows from outliers.

    Exactness: the moving average stays INTEGER as trend7 = Σ of 7
    daily cents, and the detrended series as det7 = 7·cents − trend7 —
    scaling by 7 instead of dividing keeps every intermediate an exact
    BIGINT (the `cusum` trick); the three emitted doubles are single
    divisions of those integers with identical IEEE trees both engines.
    Spark ``weekday()+1`` ≡ DuckDB ``isodow``. Scale: windows run per
    event type ordered by day — calendar-bounded frames over the
    pre-aggregated daily relation; the seasonal join is ≤ types×7 rows."""
    from esther_apache_spark_spark.plans.tpch_more import _daily_cents

    daily = _daily_cents(spark, sf_dir).withColumn(
        "dow", (F.expr("weekday(day)") + F.lit(1)).cast("int")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    det = (
        daily.select(
            "event_type",
            "day",
            "dow",
            "cents",
            F.sum("cents").over(w7).alias("trend7"),
            F.count(F.lit(1)).over(w7).alias("wn"),
        )
        .filter(F.col("wn") == 7)
        .withColumn("det7", 7 * F.col("cents") - F.col("trend7"))
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.sum("det7").cast("long").alias("s_num"),
        F.count(F.lit(1)).alias("s_cnt"),
    )
    s_term = F.col("s_num").cast("double") / (
        F.col("s_cnt").cast("double") * F.lit(7.0)
    )
    return det.join(seas, on=["event_type", "dow"], how="inner").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        F.round(F.col("trend7").cast("double") / 7.0, 4).alias("trend"),
        F.round(s_term, 4).alias("seasonal"),
        F.round(
            F.col("det7").cast("double") / 7.0 - s_term, 4
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Neyman allocation with largest-remainder apportionment.
# ---------------------------------------------------------------------------

_SAMPLE_BUDGET = 1000


@register(
    "neyman_allocation_plan",
    oracle=f"""
    WITH moments AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(n_chars AS HUGEINT)) AS s1,
               SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS s2
        FROM documents GROUP BY lang
    ),
    weights AS (
        SELECT lang, n,
               sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                   / CAST(n AS DOUBLE) AS sd,
               CAST(n AS DOUBLE)
                   * (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                      / CAST(n AS DOUBLE)) AS w
        FROM moments
    ),
    shares AS (
        SELECT lang, n, sd, w,
               {_SAMPLE_BUDGET}.0 * w / SUM(w) OVER () AS alloc_real
        FROM weights
    ),
    base AS (
        SELECT lang, n, sd, alloc_real,
               CAST(FLOOR(alloc_real) AS BIGINT) AS base_alloc,
               alloc_real - FLOOR(alloc_real) AS rem
        FROM shares
    ),
    ranked AS (
        SELECT *,
               CAST({_SAMPLE_BUDGET} - SUM(base_alloc) OVER () AS BIGINT)
                   AS leftover,
               ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rk
        FROM base
    )
    SELECT lang, n AS n_docs,
           CAST(ROUND(sd, 6) AS DOUBLE) AS sd_chars,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocation
    FROM ranked
    """,
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a
    1000-doc labeling/eval budget across languages proportional to
    nₕ·sₕ (stratum size × within-stratum std of doc length) — the
    variance-minimizing allocation for a fixed budget, and the
    principled answer to "how many docs per language do we audit"
    (proportional allocation oversamples homogeneous strata).

    The integer apportionment is LARGEST-REMAINDER (Hamilton): floor
    every real allocation, then hand the leftover units to the largest
    fractional remainders (lang tiebreak) — allocations sum to the
    budget EXACTLY, which naive per-stratum rounding does not.
    Exactness: per-stratum variance from integer moments (n·S2 − S1²
    in DECIMAL(38,0) ≡ HUGEINT — char counts square past BIGINT at
    corpus scale); one IEEE sqrt per stratum; every window
    (share/leftover/remainder rank) runs over the ≤|langs| frame."""
    docs = load_table(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    moments = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast(d38)).alias("s1"),
        F.sum(F.col("n_chars").cast(d38) * F.col("n_chars").cast(d38)).alias(
            "s2"
        ),
    )
    sd = (
        F.sqrt(
            (
                F.col("n").cast(d38) * F.col("s2")
                - F.col("s1") * F.col("s1")
            ).cast("double")
        )
        / F.col("n").cast("double")
    )
    weights = moments.select(
        "lang",
        "n",
        sd.alias("sd"),
        (F.col("n").cast("double") * sd).alias("w"),
    )
    wall = Window.partitionBy()
    shares = weights.select(
        "lang",
        "n",
        "sd",
        (F.lit(float(_SAMPLE_BUDGET)) * F.col("w") / F.sum("w").over(wall)).alias(
            "alloc_real"
        ),
    )
    base = shares.select(
        "lang",
        "n",
        "sd",
        F.floor("alloc_real").cast("long").alias("base_alloc"),
        (F.col("alloc_real") - F.floor("alloc_real")).alias("rem"),
    )
    ranked = base.select(
        "lang",
        "n",
        "sd",
        "base_alloc",
        (F.lit(_SAMPLE_BUDGET) - F.sum("base_alloc").over(wall))
        .cast("long")
        .alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("lang")))
        .alias("rk"),
    )
    return ranked.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.round("sd", 6).alias("sd_chars"),
        (
            F.col("base_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocation"),
    )


# ---------------------------------------------------------------------------
# Streaming twin of the interval union (session_window ≡ islands).
# ---------------------------------------------------------------------------


@register(
    "streaming_interval_coverage",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s, epoch_us(ts) + {_IVL_US} AS e
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR s >= MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island,
               event_id
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
    ),
    per_island AS (
        SELECT user_id, island,
               CAST(MAX(e) - MIN(s) AS BIGINT) AS cov_us
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(cov_us) AS BIGINT) AS covered_us,
           CAST(MAX(cov_us) AS BIGINT) AS longest_us
    FROM per_island GROUP BY user_id
    """,
)
def streaming_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `interval_union_coverage`, proving the
    paradigm identity session_window(gap) ≡ interval-union islands:
    the native streaming sessionizer produces, per user, the same
    (n_islands, covered_us, longest_us) the batch windows compute —
    covered micros fall out as win.end − win.start because a session's
    end is last_ts + gap. The oracle states the one semantic difference
    explicitly: session windows are half-open (an event exactly gap
    after its predecessor starts a NEW island — ``s >= pmax`` in the
    oracle, vs the batch op's touch-merging ``s > pmax``). Driven to
    exact equality via the sentinel watermark-flush protocol of
    `run_streaming_session_agg`; see
    `streaming.events.run_streaming_interval_coverage` for state/GC
    shape."""
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_interval_coverage,
    )

    return run_streaming_interval_coverage(spark, sf_dir)


# ---------------------------------------------------------------------------
# SQL-surface showcases: LATERAL join and recursive CTE (Spark 4 features).
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT c.custkey, l.o_orderkey, l.cents
    FROM (SELECT DISTINCT o_custkey AS custkey FROM {orders}) c
    CROSS JOIN LATERAL (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM {orders} o
        WHERE o.o_custkey = c.custkey
        ORDER BY cents DESC, o_orderkey ASC
        LIMIT 2
    ) l
"""


@register(
    "lateral_top2_orders_per_customer",
    oracle=_LATERAL_SQL.format(orders="orders"),
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999, Spark since 3.2): each
    customer's top-2 orders by value, written as the per-row subquery a
    SQL author reaches for — and planned by Catalyst as a decorrelated
    join + per-group limit, NOT an N-times re-executed subquery (the
    same physical shape as the window top-k). One SQL text runs on both
    engines; amounts in exact integer cents with the unique orderkey
    tiebreak so the LIMIT 2 cut is deterministic."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(_LATERAL_SQL.format(orders="orders_lat"))


_RECURSIVE_REACH_SQL = """
    WITH RECURSIVE ob AS (
        SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS b
        FROM {lineitem} l JOIN {part} p ON l.l_partkey = p.p_partkey
    ),
    pairs AS (
        SELECT a.b AS src, c.b AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ob a JOIN ob c ON a.k = c.k WHERE a.b <> c.b
        GROUP BY a.b, c.b
    ),
    bedges AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY cnt DESC, dst) AS rn
            FROM pairs
        ) tk WHERE rn <= 3
    ),
    reach(v, hop) AS (
        SELECT MIN(src), 0 FROM bedges
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN bedges e ON e.src = r.v
        WHERE r.hop < 3
    )
    SELECT v AS brand, CAST(MIN(hop) AS INT) AS hops
    FROM reach GROUP BY v
"""


@register(
    "recursive_cte_brand_reach",
    oracle=_RECURSIVE_REACH_SQL.format(lineitem="lineitem", part="part"),
)
def recursive_cte_brand_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop reachability via WITH RECURSIVE (new in Spark 4.0) — the
    declarative twin of the statically-unrolled `bfs_hops_brands`: same
    sparsified top-3 co-purchase edges, same seed (lexicographically
    first brand), same ≤3-hop horizon, but the iteration is expressed
    as a recursive CTE and driven by the engine's own fixpoint executor
    instead of a Python loop building the plan. The depth guard
    (hop < 3) bounds the recursion on a CYCLIC graph — a plain
    transitive closure would never terminate — and the final MIN(hop)
    collapses re-visits to first discovery, making the recursive form
    result-identical to the level-synchronous unrolled one. One SQL
    text on both engines; pure integer/string ops, exact by
    construction."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_rec")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_rec")
    return spark.sql(
        _RECURSIVE_REACH_SQL.format(lineitem="lineitem_rec", part="part_rec")
    )


# ---------------------------------------------------------------------------
# Round 6: drawdown curve, LOO target encoding, l-diversity, RLE audit.
# ---------------------------------------------------------------------------


@register(
    "max_drawdown_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT day, cents,
           MAX(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents,
           MAX(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cents
               AS drawdown_cents
    FROM daily
    """,
)
def max_drawdown_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown curve of daily order revenue: for each day, the running
    peak of the daily-revenue series and how far below it that day sits
    (the finance max-drawdown readout, applied to a revenue health
    dashboard — a sustained-decline detector that, unlike the z-score
    anomaly queries, is cumulative: it flags slow slides no single-day
    threshold catches).

    Scale doctrine: the window runs over the DAILY frame (≤ calendar
    span rows — same bound as the OLS/seasonal queries), never the raw
    orders; orders are touched once by a partial-aggregable groupBy.
    Daily cents stay BIGINT (10^13 cents/day at 100 TB is 5 orders of
    magnitude under the 2^63 line); the running MAX and the subtraction
    are pure integer ops, exact on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "cents",
        F.max("cents").over(w).alias("peak_cents"),
        (F.max("cents").over(w) - F.col("cents")).alias("drawdown_cents"),
    )


@register(
    "target_encode_loo",
    oracle="""
    WITH oc AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
        SELECT segment, SUM(CAST(cents AS HUGEINT)) AS ssum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM oc GROUP BY segment
    )
    SELECT oc.o_orderkey, oc.segment,
           CAST(ROUND(CAST(seg.ssum - oc.cents AS DOUBLE)
                      / CAST(seg.n - 1 AS DOUBLE), 4) AS DOUBLE) AS loo_cents
    FROM oc JOIN seg ON oc.segment = seg.segment
    WHERE seg.n >= 2
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment by
    order value — the classic high-cardinality-categorical feature for
    tabular models, in its leakage-safe form: each order's encoding is
    the mean order value of its segment EXCLUDING the order itself
    ((Σ − own)/(n − 1)), so the feature never contains the row's own
    target (plain mean encoding leaks; LOO is the standard fix).

    Scale doctrine: per-segment (Σcents, n) is a partial-aggregable
    5-row groupBy; the join back onto orders broadcasts that
    segment-domain-bounded frame (never the fact side), so the encode
    costs one fact scan + one map-side join — no window over the data,
    no per-row subquery. Sums in DECIMAL(38,0) ≡ HUGEINT (BIGINT cents
    × 10^12 orders overflows 2^63 at extreme scale); the single final
    division is the only float, rounded identically."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    oc = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seg_stats = oc.groupBy("segment").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("ssum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        oc.join(F.broadcast(seg_stats), "segment")
        .filter(F.col("n") >= 2)
        .select(
            "o_orderkey",
            "segment",
            F.round(
                (F.col("ssum") - F.col("cents")).cast("double")
                / (F.col("n") - 1).cast("double"),
                # 4 decimals, NOT 9: loo is ~10^7 cents, and rounding a
                # double to 17 significant digits is past the 53-bit
                # mantissa — the two engines' last-bit behavior
                # diverges there (seen at sf0.001). 4 decimals keeps
                # the scaled value under 2^53, where both round
                # identically.
                4,
            ).alias("loo_cents"),
        )
    )


@register(
    "l_diversity_audit",
    oracle="""
    WITH sens AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 1000)
                    AS BIGINT) AS bal_band
        FROM customer
    )
    SELECT nationkey, segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT bal_band) >= 3 AS meets_l3
    FROM sens GROUP BY nationkey, segment
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity audit — the companion to `k_anonymity_audit`
    (k-anonymity alone permits the homogeneity attack: a class of 50
    identical sensitive values re-identifies everyone in it). Quasi-
    identifiers are (nation, market segment); the sensitive attribute is
    the account-balance band (floor(acctbal/1000) — the DECIMAL-domain
    quantization keeps the band exact where a double divide could
    straddle a boundary differently per engine). Each QI class reports
    its size, its count of DISTINCT sensitive values (the l in
    l-diversity), and whether it meets l ≥ 3.

    Scale: one partial-aggregable two-level groupBy over the QI domain
    (|nations| × |segments| classes); exact COUNT(DISTINCT) inside each
    class is a hash agg on (class, band) first — no window, no sort."""
    customer = load_table(spark, sf_dir, "customer")
    sens = customer.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(dec2("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return sens.groupBy("nationkey", "segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("bal_band").alias("l_distinct"),
        (F.countDistinct("bal_band") >= 3).alias("meets_l3"),
    )


_RLE_COLS = [
    # (label, DuckDB value expr) — values normalized to engine-neutral
    # strings: integers via exact DECIMAL-domain casts (a raw DOUBLE or
    # DECIMAL rendered to VARCHAR can format differently per engine).
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)"),
    ("l_tax", "CAST(CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS VARCHAR)"),
]


def _rle_oracle() -> str:
    flags = ",\n               ".join(
        f"CASE WHEN coalesce(lag(v_{lbl}) OVER w = v_{lbl}, FALSE) "
        f"THEN 0 ELSE 1 END AS start_{lbl}"
        for lbl, _ in _RLE_COLS
    )
    vals = ",\n               ".join(f"{expr} AS v_{lbl}" for lbl, expr in _RLE_COLS)
    order = ", ".join(f"v_{lbl}" for lbl, _ in _RLE_COLS)
    branches = "\n    UNION ALL\n".join(
        f"""    SELECT '{lbl}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT v_{lbl}) AS BIGINT) AS ndv,
           CAST(SUM(start_{lbl}) AS BIGINT) AS runs,
           CAST(ROUND(CAST(COUNT(DISTINCT v_{lbl}) AS DOUBLE) / COUNT(*), 9)
                AS DOUBLE) AS ndv_ratio,
           CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(start_{lbl}), 9)
                AS DOUBLE) AS avg_run_len
    FROM flagged"""
        for lbl, _ in _RLE_COLS
    )
    return f"""
    WITH vals AS (
        SELECT l_orderkey, l_linenumber,
               {vals}
        FROM lineitem
    ),
    flagged AS (
        SELECT *,
               {flags}
        FROM vals
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, {order})
    )
{branches}
    """


@register("column_compression_audit", oracle=_rle_oracle())
def column_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout audit: for each low-cardinality lineitem column,
    how dictionary- and run-length-encodable it is under the table's
    natural (orderkey, linenumber) order — NDV ratio (dictionary
    pressure) and within-order run statistics (RLE efficacy). This is
    the readout that decides whether re-sorting before the parquet
    write (cf. `zorder_layout_audit`) pays for itself at 100 TB: a
    column with avg_run_len ≈ 1 gains nothing from RLE in this order;
    one with long runs compresses ~n/runs ×.

    Runs are counted WITHIN each order's line group (lag over a ≤7-row
    frame partitioned by the natural key) — never a global-order window,
    which would funnel the whole table through one task; cross-order
    run continuations are deliberately excluded from the metric's
    definition, making it partition-invariant and exact. Doubles are
    normalized through exact DECIMAL-domain integer casts before the
    string compare, so NULL-safe equality sees identical values on both
    engines. One scan, one bounded window pass, four 1-row aggregates
    stacked to long form."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = {
        "l_returnflag": F.col("l_returnflag"),
        "l_linestatus": F.col("l_linestatus"),
        "l_quantity": F.col("l_quantity").cast("long").cast("string"),
        "l_tax": (F.col("l_tax").cast("decimal(4,2)") * 100)
        .cast("long")
        .cast("string"),
    }
    proj = li.select(
        "l_orderkey",
        "l_linenumber",
        *[v.alias(f"v_{lbl}") for lbl, v in vals.items()],
    )
    # Duplicate (orderkey, linenumber) pairs exist in the synthetic data:
    # appending every audited value to the ORDER BY makes run counts
    # well-defined — rows still tied carry identical audited values, so
    # any tie resolution yields the same value sequence.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", *[f"v_{lbl}" for lbl in vals]
    )
    flagged = proj.select(
        *[
            F.when(
                F.coalesce(
                    F.lag(f"v_{lbl}").over(w) == F.col(f"v_{lbl}"), F.lit(False)
                ),
                0,
            )
            .otherwise(1)
            .alias(f"start_{lbl}")
            for lbl in vals
        ],
        *[F.col(f"v_{lbl}") for lbl in vals],
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.countDistinct(f"v_{lbl}").alias(f"ndv_{lbl}") for lbl in vals],
        *[F.sum(f"start_{lbl}").alias(f"runs_{lbl}") for lbl in vals],
    )
    stack_args = ", ".join(
        f"'{lbl}', ndv_{lbl}, runs_{lbl}" for lbl in vals
    )
    return agg.selectExpr(
        "n_rows", f"stack({len(vals)}, {stack_args}) AS (column_name, ndv, runs)"
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("ndv").cast("long").alias("ndv"),
        F.col("runs").cast("long").alias("runs"),
        F.round(F.col("ndv").cast("double") / F.col("n_rows"), 9).alias("ndv_ratio"),
        F.round(F.col("n_rows").cast("double") / F.col("runs"), 9).alias(
            "avg_run_len"
        ),
    )


# ---------------------------------------------------------------------------
# Capped running balance — the canonical NON-associative scan.
# ---------------------------------------------------------------------------

_BAL_CAP = 500_000  # clamp ceiling, integer cents


@register(
    "capped_running_balance",
    oracle=f"""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
               END AS delta
        FROM events
    ),
    seq AS (
        SELECT user_id, delta,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM base
    ),
    counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM seq GROUP BY user_id),
    rec AS (
        WITH RECURSIVE walk(user_id, rn, bal, nclamp) AS (
            SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT)
            FROM counts
            UNION ALL
            SELECT s.user_id, w.rn + 1,
                   least(greatest(w.bal + s.delta, 0), {_BAL_CAP}),
                   w.nclamp + CASE WHEN w.bal + s.delta < 0
                                     OR w.bal + s.delta > {_BAL_CAP}
                                   THEN 1 ELSE 0 END
            FROM walk w JOIN seq s
              ON s.user_id = w.user_id AND s.rn = w.rn + 1
        )
        SELECT * FROM walk
    )
    SELECT r.user_id, c.n AS n_events, r.bal AS final_cents,
           r.nclamp AS n_clamped
    FROM rec r JOIN counts c ON r.user_id = c.user_id AND r.rn = c.n
    """,
)
def capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user clamped running balance — credits (purchase/signup
    value) in, debits (view/click/error value) out, balance pinned to
    [0, cap] at EVERY step (a prepaid wallet / inventory-with-shelf-cap
    semantics). This is the canonical NON-associative scan: clamping
    inside the fold means no window/prefix-sum decomposition exists
    (the final balance depends on WHERE the path hit the bounds), so
    the one honest distributed shape is a grouped ordered walk —
    `applyInPandas` per user, one shuffle by user_id, linear work per
    group, arbitrarily many groups in parallel. Deltas are computed
    JVM-side in exact DECIMAL-domain cents BEFORE the Python boundary
    (the pandas kernel only ever adds/clamps integers — no float
    re-rounding can diverge from the oracle).

    The oracle replays the walk with a per-user recursive CTE (depth =
    max events/user), joined to per-user counts for the terminal row —
    the declarative twin of the imperative fold, results identical by
    construction. Output: final balance, event count, and how often the
    path was clamped (the saturation diagnostic)."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec2("value") * 100).cast("long")
    base = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type").isin("purchase", "signup"), cents)
        .otherwise(-cents)
        .alias("delta"),
    )

    import pandas as pd

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        bal = 0
        nclamp = 0
        for d in pdf["delta"].tolist():
            raw = bal + int(d)
            if raw < 0 or raw > _BAL_CAP:
                nclamp += 1
            bal = min(max(raw, 0), _BAL_CAP)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "final_cents": [bal],
                "n_clamped": [nclamp],
            }
        )

    return base.groupBy("user_id").applyInPandas(
        walk,
        schema="user_id long, n_events long, final_cents long, n_clamped long",
    )


# ---------------------------------------------------------------------------
# Right-to-erasure cascade audit.
# ---------------------------------------------------------------------------


@register(
    "erasure_cascade_audit",
    oracle="""
    WITH del_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    del_o AS (SELECT o_orderkey FROM orders o
              JOIN del_c d ON o.o_custkey = d.c_custkey),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS purged
          FROM customer),
    o AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(COUNT(d.o_orderkey) AS BIGINT) AS purged
          FROM orders ordr LEFT JOIN del_o d
            ON ordr.o_orderkey = d.o_orderkey),
    l AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(COUNT(d.o_orderkey) AS BIGINT) AS purged
          FROM lineitem li LEFT JOIN del_o d
            ON li.l_orderkey = d.o_orderkey)
    SELECT 'customer' AS tbl, total, purged,
           CAST(ROUND(CAST(purged AS DOUBLE) / total, 9) AS DOUBLE) AS share
    FROM c
    UNION ALL
    SELECT 'orders', total, purged,
           CAST(ROUND(CAST(purged AS DOUBLE) / total, 9) AS DOUBLE) FROM o
    UNION ALL
    SELECT 'lineitem', total, purged,
           CAST(ROUND(CAST(purged AS DOUBLE) / total, 9) AS DOUBLE) FROM l
    """,
)
def erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) cascade sizing: given a deletion
    list (here the deterministic c_custkey % 97 cohort), how many rows
    each table in the FK chain customer → orders → lineitem must purge,
    before any destructive write happens — the pre-flight every
    compliant delete pipeline runs (the actual purge is these same
    joins as anti-join writes; `sources/sinks.py`'s atomic-publish
    protocol is the safe way to commit them).

    Scale shape: the deletion list is a filter pushed into the customer
    scan; orders membership is one FK equi-join; lineitem membership
    joins on the ALREADY-RESOLVED order list (never a 3-way join
    through customer) — each hop shuffles on its own key once. Counts
    via left-join + COUNT(col) (NULL-skipping) so each table scans
    once, no second anti-join pass."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    del_c = customer.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = orders.join(
        del_c, orders.o_custkey == del_c.c_custkey, "inner"
    ).select("o_orderkey")
    c = customer.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(F.col("c_custkey") % 97 == 0, 1).otherwise(0)
        ).alias("purged"),
    )
    o = (
        orders.join(
            del_o.withColumnRenamed("o_orderkey", "dok"),
            orders.o_orderkey == F.col("dok"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count("dok").alias("purged"),
        )
    )
    li = (
        lineitem.join(
            del_o.withColumnRenamed("o_orderkey", "dok"),
            lineitem.l_orderkey == F.col("dok"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count("dok").alias("purged"),
        )
    )

    def shaped(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("tbl"),
            F.col("total").cast("long").alias("total"),
            F.col("purged").cast("long").alias("purged"),
            F.round(
                F.col("purged").cast("double") / F.col("total"), 9
            ).alias("share"),
        )

    return (
        shaped(c, "customer")
        .unionAll(shaped(o, "orders"))
        .unionAll(shaped(li, "lineitem"))
    )


_PIPE_ORACLE = """
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
"""


@register("pipe_syntax_daily_totals", oracle=_PIPE_ORACLE)
def pipe_syntax_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (new in Spark 4.0 — the `|>` operator-chain
    dialect from Google's 'SQL Has Problems' pipe-syntax proposal):
    the same daily revenue rollup a nested SELECT states, written as a
    linear dataflow FROM → WHERE → EXTEND → AGGREGATE. The catalog
    pins that the dialect is pure surface: Catalyst plans it
    identically to the classic form (partial-aggregable groupBy over a
    pushed-down filtered scan), and the DuckDB oracle is the classic
    ANSI statement — a hash match proves dialect-equivalence, the same
    way `lateral_top2_orders_per_customer` pins decorrelation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_pipe")
    return spark.sql("""
        FROM events_pipe
        |> WHERE event_type IN ('purchase', 'signup')
        |> EXTEND date_format(ts, 'yyyy-MM-dd') AS day,
                  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM(c) AS BIGINT) AS cents
           GROUP BY event_type, day
    """)


# ---------------------------------------------------------------------------
# Incremental view maintenance across a JOIN (delta propagation).
# ---------------------------------------------------------------------------


@register(
    "incremental_join_rollup_delta",
    oracle="""
    SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS day,
           c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def incremental_join_rollup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN + rollup view under an insert
    delta — the algebra `incremental_rollup_merge` proves for plain
    aggregates, extended across a join: with customer unchanged and
    ΔO the new orders, Δ(O ⋈ C grouped) = (ΔO ⋈ C) grouped, merged
    into the base rollup by key-wise addition. The query SPLITS orders
    deterministically (o_orderkey % 50 = 0 plays the newly-arrived
    batch), computes base and delta rollups separately, and merges —
    while the ORACLE is the full recompute over all orders: the hash
    match is the correctness proof of the delta-propagation identity,
    not of one engine against the other.

    Scale: this is the pattern that turns a daily 100 TB re-aggregation
    into touching only the day's arrivals — the delta join shuffles
    |ΔO|, the merge shuffles only rollup keys (|days|×|segments|);
    counts/cents merge because SUM/COUNT are abelian (MIN/MAX would
    need re-aggregation only for deletes, not inserts)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def rollup(o: DataFrame) -> DataFrame:
        return (
            o.join(customer, o.o_custkey == customer.c_custkey, "inner")
            .groupBy(
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
                F.col("c_mktsegment").alias("segment"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum((dec2("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
        )

    base = rollup(orders.filter(F.col("o_orderkey") % 50 != 0))
    delta = rollup(orders.filter(F.col("o_orderkey") % 50 == 0))
    return (
        base.unionAll(delta)
        .groupBy("day", "segment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private counts — seeded discrete Laplace (geometric).
# ---------------------------------------------------------------------------

_DP_SCALE = 3 * 2**21  # threshold denominator: exact dyadic thirds


def _dp_ladder() -> list[tuple[int, int]]:
    """Cumulative integer thresholds of the two-sided geometric with
    p = 1/2 (discrete Laplace, eps = ln 2), scaled by 3·2^21 so every
    mass is an exact integer: P(0) = 1/3 → 2^21, P(±k) = (1/3)2^-|k|
    → 2^(21-|k|), residual tail mass (4/S) pinned to k = ±21."""
    ws = {}
    for k in range(-21, 22):
        if k == 0:
            ws[k] = 2**21
        elif abs(k) <= 20:
            ws[k] = 2 ** (21 - abs(k))
        else:
            ws[k] = 2
    cum, out = 0, []
    for k in range(-21, 22):
        cum += ws[k]
        out.append((k, cum))
    assert cum == _DP_SCALE
    return out


def _dp_noise_sql(useed: str) -> str:
    h = (
        f"CAST(CONCAT('0x', substr(md5('dp:' || {useed}), 1, 8)) AS BIGINT)"
        f" % {_DP_SCALE}"
    )
    branches = " ".join(
        f"WHEN {h} < {c} THEN {k}" for k, c in _dp_ladder()[:-1]
    )
    return f"CASE {branches} ELSE 21 END"


@register(
    "dp_noisy_counts_geometric",
    oracle=f"""
    WITH cls AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_true
        FROM customer GROUP BY 1, 2
    )
    SELECT nationkey, segment, n_true,
           CAST(n_true + {_dp_noise_sql(
               "CAST(nationkey AS VARCHAR) || ':' || segment"
           )} AS BIGINT) AS n_noisy
    FROM cls
    """,
)
def dp_noisy_counts_geometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the (nation, segment) customer
    histogram via the DISCRETE Laplace (two-sided geometric) mechanism
    at eps = ln 2 — the count-release companion to the k-anonymity /
    l-diversity audits (those say whether raw release is safe; this is
    what you publish when it is not). p = 1/2 is chosen so every
    probability mass is an exact dyadic third: the sampler is a CASE
    ladder over integer thresholds scaled by 3·2^21, driven by the
    md5-hex→BIGINT uniform of the CLASS KEY — seeded, replayable, and
    identical in both engines (a float inverse-CDF with ln() would
    drift; the modulo bias at 2^32/(3·2^21) is ~0.2% and affects both
    engines identically). Tail clamped to ±21 (mass 2^-20).

    NOTE on semantics: a keyed-hash "noise" is pseudo-random, not
    random — real DP requires fresh randomness per release; this
    catalog entry fixes the coin flips so the MECHANISM (sensitivity-1
    counts + geometric noise, post-processing-safe integer output) is
    testable end-to-end. Scale: one partial-aggregable groupBy plus a
    per-row expression."""
    customer = load_table(spark, sf_dir, "customer")
    cls = customer.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).alias("n_true"))
    useed = F.concat(
        F.col("nationkey").cast("string"), F.lit(":"), F.col("segment")
    )
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), useed)), 1, 8), 16, 10
        ).cast("long")
        % _DP_SCALE
    )
    noise = F.lit(21)
    for k, c in reversed(_dp_ladder()[:-1]):
        noise = F.when(h < c, k).otherwise(noise)
    return cls.select(
        "nationkey",
        "segment",
        F.col("n_true").cast("long").alias("n_true"),
        (F.col("n_true") + noise).cast("long").alias("n_noisy"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency — the sweep-line dual of interval_union_coverage.
# ---------------------------------------------------------------------------
@register(
    "peak_concurrency_by_type",
    oracle=f"""
    WITH pts AS (
        SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id
        FROM events
        UNION ALL
        SELECT event_type, epoch_us(ts) + {_IVL_US} AS t, -1 AS delta,
               event_id
        FROM events
    ),
    run AS (
        SELECT event_type, t, delta,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS conc
        FROM pts
    ),
    peak AS (SELECT event_type, MAX(conc) AS peak FROM run GROUP BY 1)
    SELECT r.event_type,
           CAST(p.peak AS BIGINT) AS peak_concurrency,
           CAST(MIN(r.t) AS BIGINT) AS first_peak_us
    FROM run r JOIN peak p
      ON r.event_type = p.event_type AND r.conc = p.peak
    GROUP BY r.event_type, p.peak
    """,
)
def peak_concurrency_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — the sweep-line DUAL of
    `interval_union_coverage`: that query answers "how long was at
    least one interval open", this one answers "how many were open at
    the worst moment (and when did it first happen)" — the
    capacity-planning readout (max simultaneous sessions/connections/
    jobs) behind autoscaler sizing. Each event opens the same 5-minute
    interval [ts, ts+5m); every boundary becomes a ±1 point, a running
    sum over the per-type (t, delta, event_id) order is the live
    concurrency, and its max is the peak. Ordering delta ASCENDING puts
    each −1 close before a same-instant +1 open, which is exactly the
    half-open-interval rule (an interval ending at t does not overlap
    one starting at t); the event_id tiebreak makes the running sum a
    total order, so `conc` is deterministic row-by-row and the
    first-peak timestamp is unique.

    Scale shape: one Exchange partitioned by event_type carries the
    2-row-per-event point stream; the window frame is a running sum
    (O(1) per row). Parallelism equals the type cardinality — for a
    high-volume type the standard split is per-(type, day) partial
    sweeps seeded by the previous day's closing concurrency (the same
    carry-in trick `capped_running_balance` documents); the join-back
    against the 1-row-per-type peak frame is a broadcast. Exact integer
    micros end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    opens = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    closes = ev.select(
        "event_type",
        (F.unix_micros("ts") + F.lit(_IVL_US)).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = opens.unionAll(closes).select(
        "event_type", "t", F.sum("delta").over(w).alias("conc")
    )
    peak = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        run.join(peak, "event_type")
        .filter(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").cast("long").alias("first_peak_us"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak_concurrency"),
            "first_peak_us",
        )
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing — the sequential fold family, continued.
# ---------------------------------------------------------------------------
@register(
    "holt_linear_daily_by_type",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 1000 AS BIGINT)
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day) AS rn
        FROM daily
    ),
    counts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM seq GROUP BY event_type),
    rec AS (
        WITH RECURSIVE walk(event_type, rn, l, b) AS (
            SELECT s.event_type, CAST(1 AS BIGINT), s.y, CAST(0 AS BIGINT)
            FROM seq s WHERE s.rn = 1
            UNION ALL
            SELECT s.event_type, w.rn + 1,
                   CAST(FLOOR(CAST(s.y + w.l + w.b AS DOUBLE) / 2)
                        AS BIGINT),
                   CAST(FLOOR((CAST(FLOOR(CAST(s.y + w.l + w.b AS DOUBLE)
                                          / 2) AS DOUBLE)
                               - w.l + w.b) / 2) AS BIGINT)
            FROM walk w JOIN seq s
              ON s.event_type = w.event_type AND s.rn = w.rn + 1
        )
        SELECT * FROM walk
    )
    SELECT r.event_type, c.n AS n_days,
           r.l AS level_milli, r.b AS trend_milli,
           r.l + 7 * r.b AS forecast_7d_milli
    FROM rec r JOIN counts c
      ON r.event_type = c.event_type AND r.rn = c.n
    """,
)
def holt_linear_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) over
    each event type's daily revenue, with a 7-day-ahead forecast — the
    trend-aware upgrade to `ewma_user_value` and the model-based
    counterpart of `forecast_baseline_mae`'s naive carry-forward. At
    alpha = beta = 1/2 every update is level' = (y + level + trend)/2,
    trend' = (level' - level + trend)/2 — a sequential, NON-associative
    fold (same family as `capped_running_balance`): the halving after
    every step means no prefix-sum decomposition exists, so the honest
    distributed shape is one shuffle by event_type and a linear
    per-group walk (`applyInPandas`), series in parallel.

    Determinism: daily revenue lands as exact DECIMAL-domain
    milli-cents BEFORE the fold; each halving is floor(a/2) computed
    via one exact double division (|a| < 2^53 by construction), so the
    pandas kernel, the Spark plan and the oracle's per-type recursive
    CTE walk identical integer states — the declarative twin proves
    the fold, not an approximation of it. Observed days only (gap
    semantics documented; `gapfill_daily_user_value` is the gap-fill
    front if calendar-regular series are needed)."""
    import math

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(
            (F.sum(dec2("value")) * 1000).cast("long").alias("y")
        )
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = pdf["y"].tolist()
        lvl, trd = int(ys[0]), 0
        for y in ys[1:]:
            nl = math.floor((int(y) + lvl + trd) / 2)
            trd = math.floor((nl - lvl + trd) / 2)
            lvl = nl
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(ys)],
                "level_milli": [lvl],
                "trend_milli": [trd],
                "forecast_7d_milli": [lvl + 7 * trd],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        walk,
        schema=(
            "event_type string, n_days long, level_milli long, "
            "trend_milli long, forecast_7d_milli long"
        ),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F — exact integer sums of squares, one final division.
# ---------------------------------------------------------------------------
@register(
    "anova_f_value_by_type",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(cents) AS HUGEINT) AS s_g,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss_g
        FROM base GROUP BY 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS HUGEINT) AS s,
               CAST(SUM(ss_g) AS HUGEINT) AS ss,
               SUM(CAST(ROUND(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                              / n_g, 9) AS DOUBLE)) AS sum_sq_over_n
        FROM g
    )
    SELECT CAST(k AS BIGINT) AS k_groups, n AS n_rows,
           ROUND((sum_sq_over_n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / 10000.0, 4) AS ss_between,
           ROUND((CAST(ss AS DOUBLE) - sum_sq_over_n) / 10000.0, 4)
               AS ss_within,
           ROUND(((sum_sq_over_n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                  / (k - 1))
                 / ((CAST(ss AS DOUBLE) - sum_sq_over_n) / (n - k)), 6)
               AS f_stat
    FROM tot
    """,
)
def anova_f_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for `value` across event types — the
    "does this categorical matter for this metric at all" gate that
    precedes any per-type modeling (the numeric counterpart of
    `chisq_event_type_dow`'s categorical×categorical test). F =
    (SS_between/(k−1)) / (SS_within/(n−k)) with the sums of squares
    assembled from per-group exact integers: n_g, Σy (HUGEINT/DECIMAL),
    Σy² — the textbook one-pass decomposition SS_within = Σy² − Σ_g
    (Σ_g y)²/n_g, so no second centered pass over the data. Each
    group's (Σy)²/n_g — the single non-integer step — is rounded once
    at 9 dp before the k-row sum (the transcendental doctrine applied
    to a division); everything else is one final double expression on
    identical inputs.

    Scale: ONE map-combinable hash aggregate to k rows; the F assembly
    runs on that bounded frame. Squared-cents sums hold exact to ~1e9
    rows per group at 1e4-cent values in the 38-digit domain."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    base = ev.select(
        "event_type", (dec2("value") * 100).cast("long").alias("cents")
    )
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("cents").cast(d38)).alias("s_g"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("ss_g"),
    )
    sq_over_n = F.round(
        F.col("s_g").cast("double") * F.col("s_g").cast("double")
        / F.col("n_g"),
        9,
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(sq_over_n).alias("sum_sq_over_n"),
    )
    sd, ssd = F.col("s").cast("double"), F.col("ss").cast("double")
    ssb = F.col("sum_sq_over_n") - sd * sd / F.col("n")
    ssw = ssd - F.col("sum_sq_over_n")
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(ssb / 10000.0, 4).alias("ss_between"),
        F.round(ssw / 10000.0, 4).alias("ss_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Gini concentration coefficient — revenue inequality per nation.
# ---------------------------------------------------------------------------
@register(
    "gini_revenue_by_nation",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey,
               o.o_custkey AS custkey,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) * 100
                    AS BIGINT) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY nationkey
                                  ORDER BY cents, custkey) AS i
        FROM rev
    ),
    agg AS (
        SELECT nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s,
               CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS si
        FROM ranked GROUP BY 1
    )
    SELECT nationkey, n AS n_customers,
           ROUND((2.0 * CAST(si AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)))
                 - (CAST(n AS DOUBLE) + 1) / n, 6) AS gini
    FROM agg
    WHERE s > 0
    """,
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration per nation —
    the inequality summary behind `pareto_revenue_customers`' 80/20
    readout, as a single [0,1] number a dashboard can track per market:
    G = 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n over the per-nation revenue ranks.
    Exactness: per-customer revenue in integer cents, ranks from a
    deterministically tie-broken row_number (cents, custkey), and both
    Σ(i·y) and Σy as exact HUGEINT/DECIMAL sums — the formula's two
    divisions happen once, on identical exact inputs.

    Scale: the rank is the one ordered pass, partitioned by nation
    (plenty of key parallelism); the customer-revenue pre-aggregate
    collapses orders before anything sorts. Zero-revenue nations are
    excluded (G undefined), identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    d38 = "decimal(38,0)"
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            (F.sum(dec2("o_totalprice", "decimal(14,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    ranked = rev.select(
        "nationkey",
        "cents",
        F.row_number()
        .over(Window.partitionBy("nationkey").orderBy("cents", "custkey"))
        .alias("i"),
    )
    agg = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("s"),
        F.sum(F.col("i").cast(d38) * F.col("cents")).alias("si"),
    )
    nd = F.col("n").cast("double")
    return (
        agg.filter(F.col("s") > 0)
        .select(
            "nationkey",
            F.col("n").alias("n_customers"),
            F.round(
                2.0 * F.col("si").cast("double") / (nd * F.col("s").cast("double"))
                - (nd + 1) / F.col("n"),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration — market-structure per region.
# ---------------------------------------------------------------------------
@register(
    "hhi_brand_concentration_by_region",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, p.p_brand AS brand,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100
                    AS BIGINT) AS BIGINT) AS cents
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT region, brand, cents,
               SUM(cents) OVER (PARTITION BY region) AS t
        FROM rev
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           ROUND(SUM(ROUND(10000.0 * (CAST(cents AS DOUBLE) / t)
                           * (CAST(cents AS DOUBLE) / t), 9)), 4) AS hhi
    FROM tot GROUP BY region
    """,
)
def hhi_brand_concentration_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of brand revenue concentration per
    region — the antitrust-grade market-structure number (0 =
    atomistic, 10000 = monopoly; >2500 reads "highly concentrated")
    that complements `gini_revenue_by_nation` (customer-side
    inequality) with the supply-side view. HHI = 10000·Σ share².

    Exactness: brand revenue in exact integer cents from decimal sums;
    per-brand 10000·s² terms are single fixed expressions over (cents,
    region-total) rounded once at 9 dp; the region totals are window
    sums over the bounded (region × brand) frame. Scale: the 5-way
    snowflake join pre-aggregates lineitem to its join keys before
    anything wide, and the final math runs on the |regions|·|brands|
    model-constant frame."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("p_brand").alias("brand"))
        .agg((F.sum(dec2("l_extendedprice")) * 100).cast("long").alias("cents"))
    )
    tot = rev.select(
        "region",
        "cents",
        F.sum("cents").over(Window.partitionBy("region")).alias("t"),
    )
    share = F.col("cents").cast("double") / F.col("t")
    term = F.round(10000.0 * share * share, 9)
    return tot.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_brands"),
        F.round(F.sum(term), 4).alias("hhi"),
    )
