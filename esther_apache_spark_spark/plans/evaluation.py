"""Model-evaluation, data-layout and link-prediction queries.

The round-5 closing ring: once a pipeline *trains or applies* models
(the quality classifier, lang-ID, k-means, ANN indexes elsewhere in
the catalog), production needs the EVALUATION side — threshold-free
ranking quality (AUC), calibration, chance-corrected agreement — and
the STORAGE side needs multi-dimensional layout (Z-order) so 100 TB of
parquet prunes on more than one predicate column.

Cross-engine determinism doctrine (same as ``analytics``/``corpus_ops``):
classifier scores are exact dyadic rationals (see
``textstats.quality_classifier_score``), so grouping by score value and
bucketing by ``floor((score+1)*512)`` replay bit-for-bit in DuckDB; all
rank statistics are kept as INTEGER numerators (``2·U`` instead of
``U`` so tie-halves stay integral); per-term quantization
(``floor(x·1e9+0.5)``) before any float sum; ROUND(…,9) only on final
report columns.

Reference parity note: the reference has no evaluation surface at all
(its pipeline ends at ``daily_city_sales``,
``src/pyspark/pipeline_pyspark.py:175-184``); these are engine
extensions in the SURVEY.md §7 M4 spirit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.operators import textstats as TS
from esther_apache_spark_spark.operators.layout import (
    zorder_index,
    zorder_index_sql,
)
from esther_apache_spark_spark.plans.catalog import register
from esther_apache_spark_spark.plans.extensions import (
    _QC_SCORE_CTES,
    _TOKS_CTE,
)
from esther_apache_spark_spark.schemas import load_table

# ---------------------------------------------------------------------------
# Z-order layout audit — the data-skipping case for Morton clustering.
# ---------------------------------------------------------------------------

# 8 bits per dimension: x = customer bucket, y = order-day bucket.
_ZX = "((o_custkey % 256) + 256) % 256"
_ZY = "((date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256) + 256) % 256"

_LAYOUT_SUMMARY = """
    SELECT '{name}' AS layout,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN min_x <= 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS chunks_hit_x_stripe,
           CAST(SUM(CASE WHEN min_y <= 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS chunks_hit_y_stripe,
           CAST(SUM(CASE WHEN min_x <= 15 AND min_y <= 15 THEN 1 ELSE 0 END)
                AS BIGINT) AS chunks_hit_point_box,
           ROUND(CAST(SUM((max_x - min_x + 1) * (max_y - min_y + 1)) AS DOUBLE)
                 / COUNT(*), 4) AS avg_bbox_area
    FROM (
        SELECT {chunk} AS chunk,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y,
               COUNT(*) AS n
        FROM pts GROUP BY 1
    )
"""


def _chunk_summary(pts: DataFrame, chunk: Column, name: str) -> DataFrame:
    per_chunk = (
        pts.groupBy(chunk.alias("chunk"))
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return per_chunk.agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n").cast("long").alias("rows_total"),
        F.sum((F.col("min_x") <= 15).cast("long")).cast("long").alias("chunks_hit_x_stripe"),
        F.sum((F.col("min_y") <= 15).cast("long")).cast("long").alias("chunks_hit_y_stripe"),
        F.sum(((F.col("min_x") <= 15) & (F.col("min_y") <= 15)).cast("long"))
        .cast("long")
        .alias("chunks_hit_point_box"),
        F.round(
            F.sum((F.col("max_x") - F.col("min_x") + 1) * (F.col("max_y") - F.col("min_y") + 1))
            .cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_bbox_area"),
    ).select(
        F.lit(name).alias("layout"),
        "n_chunks",
        "rows_total",
        "chunks_hit_x_stripe",
        "chunks_hit_y_stripe",
        "chunks_hit_point_box",
        "avg_bbox_area",
    )


@register(
    "zorder_layout_audit",
    oracle=f"""
    WITH base AS (
        SELECT {_ZX} AS x, {_ZY} AS y FROM orders
    ),
    pts AS (SELECT x, y, {zorder_index_sql('x', 'y', 8)} AS z, y * 256 + x AS lin
            FROM base)
    {_LAYOUT_SUMMARY.format(name='zorder', chunk='z // 256')}
    UNION ALL
    {_LAYOUT_SUMMARY.format(name='linear', chunk='lin // 256')}
    """,
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies the data-skipping benefit of Z-order clustering
    (operators/layout.py) on orders bucketed by (customer, order-day):
    chunk the 16-bit key space into 256 equal key-ranges under (a) the
    Morton interleave and (b) the lexicographic (day, customer) order,
    then report how many chunks' min/max bounding boxes a
    single-dimension stripe predicate (x<16, y<16) or a point box would
    have to read. Under the linear layout every x-stripe query touches
    ~ALL chunks (each chunk spans the full customer range); under
    Z-order it touches ~1/16 of them — the pruning a 100 TB table's
    row-group stats deliver when the compaction job writes
    ``write_zordered``. Pure integer arithmetic end-to-end (div/mod/mul
    only), no window, two hash aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(256))
    y = F.pmod(
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01"))),
        F.lit(256),
    )
    pts = orders.select(x.alias("x"), y.alias("y")).select(
        "x",
        "y",
        zorder_index(F.col("x"), F.col("y"), 8).alias("z"),
        (F.col("y") * 256 + F.col("x")).alias("lin"),
    )
    zsum = _chunk_summary(pts, F.floor(F.col("z") / 256).cast("long"), "zorder")
    lsum = _chunk_summary(pts, F.floor(F.col("lin") / 256).cast("long"), "linear")
    return zsum.unionByName(lsum)


# ---------------------------------------------------------------------------
# Classifier evaluation: exact-integer AUC (Mann-Whitney rank form).
# ---------------------------------------------------------------------------


def _classifier_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, quality, pos) for the linear quality classifier,
    positive class = labeled English. Scores are exact dyadic rationals
    (k/1024 means + IEEE divisions) so value-equality grouping and
    bucket assignment replay bit-for-bit in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    w = TS.quality_classifier_weights(spark)
    scored = TS.quality_classifier_score(docs, w).select(
        "doc_id", "score", "quality"
    )
    lab = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", (F.col("lang") == "en").cast("long").alias("pos")
    )
    return scored.join(lab, "doc_id")


@register(
    "quality_classifier_auc",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    {_QC_SCORE_CTES},
    base AS (SELECT doc_id, lang FROM documents WHERE text IS NOT NULL),
    sc AS (SELECT b.doc_id, COALESCE(sw / n, 0.0) AS score,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM base b LEFT JOIN agg USING (doc_id)),
    per AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np_s,
                   CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn_s
            FROM sc GROUP BY score),
    cum AS (SELECT np_s, nn_s,
                   CAST(COALESCE(SUM(nn_s) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS nn_lt
            FROM per)
    SELECT CAST(SUM(np_s) AS BIGINT) AS n_pos,
           CAST(SUM(nn_s) AS BIGINT) AS n_neg,
           CAST(SUM(np_s * (2 * nn_lt + nn_s)) AS BIGINT) AS u2,
           ROUND(CAST(SUM(np_s * (2 * nn_lt + nn_s)) AS DOUBLE)
                 / NULLIF(2.0 * SUM(np_s) * SUM(nn_s), 0), 9) AS auc
    FROM cum
    """,
)
def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ranking quality of the linear classifier against
    the English label: AUC in the Mann-Whitney rank-sum form,
    ``AUC = (Σ_s n⁺(s)·(2·n⁻(<s) + n⁻(s))) / (2·n⁺·n⁻)`` — the
    numerator ``2U`` is kept as an exact BIGINT (tie halves ×2 stay
    integral), so the statistic is reproducible to the last bit and the
    only float is the final division.

    Scale shape — the distributed two-level rank: docs collapse to one
    row per DISTINCT score (hash agg), each score lands in one of 1025
    value-range buckets (``floor((score+1)·512)``, exact IEEE ops on
    dyadic scores); cross-bucket negative counts come from a window
    over the ≤1025-row bucket frame (model-constant bounded), and
    within-bucket cumulative sums run partitioned per bucket — no
    global single-partition window over a data-sized frame anywhere."""
    j = _classifier_scored(spark, sf_dir)
    per = j.groupBy("score").agg(
        F.sum("pos").alias("np_s"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("nn_s"),
    )
    per = per.withColumn(
        "bucket", F.floor((F.col("score") + F.lit(1.0)) * F.lit(512.0)).cast("int")
    )
    # ≤1025 rows (model constant): the bounded aggregated frame doctrine
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    bucket_offsets = (
        per.groupBy("bucket")
        .agg(F.sum("nn_s").alias("bnn"))
        .withColumn("cum", F.sum("bnn").over(wb))
        .select("bucket", (F.col("cum") - F.col("bnn")).alias("offset"))
    )
    wn = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        per.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn("cumin", F.sum("nn_s").over(wn))
        .withColumn("nn_lt", F.col("offset") + F.col("cumin") - F.col("nn_s"))
    )
    return ranked.agg(
        F.sum("np_s").cast("long").alias("n_pos"),
        F.sum("nn_s").cast("long").alias("n_neg"),
        F.sum(F.col("np_s") * (2 * F.col("nn_lt") + F.col("nn_s")))
        .cast("long")
        .alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        F.round(
            F.col("u2").cast("double")
            / F.nullif(
                F.lit(2.0) * F.col("n_pos") * F.col("n_neg"), F.lit(0.0)
            ),
            9,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Classifier evaluation: reliability (calibration) bins.
# ---------------------------------------------------------------------------
@register(
    "classifier_calibration_bins",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    {_QC_SCORE_CTES},
    base AS (SELECT doc_id, lang FROM documents WHERE text IS NOT NULL),
    sc AS (SELECT b.doc_id,
                  COALESCE(sw / n, 0.0) /
                      (1 + abs(COALESCE(sw / n, 0.0))) AS quality,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM base b LEFT JOIN agg USING (doc_id)),
    pr AS (SELECT CAST(LEAST(FLOOR(((quality + 1.0) / 2.0) * 20), 19) AS INT)
                      AS bin,
                  (quality + 1.0) / 2.0 AS p, pos
           FROM sc)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 9) AS pos_rate,
           ROUND(CAST(SUM(CAST(FLOOR(p * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e9 / COUNT(*), 9) AS mean_pred
    FROM pr GROUP BY bin
    """,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the linear classifier: squashed score
    mapped to a pseudo-probability ``p = (quality+1)/2``, docs grouped
    into 20 equal-width p-bins, each bin reporting predicted-vs-actual
    positive rate. A calibrated scorer has ``mean_pred ≈ pos_rate``
    per bin — the audit run before using classifier scores as sampling
    weights rather than a hard gate. Determinism: p is a chain of
    exactly-specified IEEE ops on dyadic scores, bin assignment is
    floor on exact products, and the float mean is per-term quantized
    (``floor(p·1e9+0.5)`` → BIGINT sum) so reduction order can't leak
    into the hash. One projection + one hash aggregate; 20-row result."""
    j = _classifier_scored(spark, sf_dir)
    p = (F.col("quality") + F.lit(1.0)) / F.lit(2.0)
    binned = j.select(
        F.least(F.floor(p * 20), F.lit(19)).cast("int").alias("bin"),
        p.alias("p"),
        "pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum(F.floor(F.col("p") * 1e9 + 0.5).cast("long")).alias("_pq"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n_docs"), 9).alias(
                "pos_rate"
            ),
            F.round(
                F.col("_pq").cast("double") / F.lit(1e9) / F.col("n_docs"), 9
            ).alias("mean_pred"),
        )
    )


# ---------------------------------------------------------------------------
# Link prediction over the sparsified co-purchase graph.
# ---------------------------------------------------------------------------

_LP_EDGES_CTE = """
    ob AS (
        SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS b
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    pairs AS (
        SELECT a.b AS src, c.b AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ob a JOIN ob c USING (k) WHERE a.b <> c.b
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
    und AS (SELECT src, dst FROM bedges UNION SELECT dst, src FROM bedges),
    deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY src),
    mid AS (SELECT v FROM deg WHERE d <= 64)
"""


@register(
    "link_prediction_brands",
    oracle=f"""
    WITH {_LP_EDGES_CTE},
    cand AS (
        SELECT e1.src AS u, e2.dst AS w, CAST(COUNT(*) AS BIGINT) AS cn
        FROM und e1
        JOIN mid m ON e1.dst = m.v
        JOIN und e2 ON e1.dst = e2.src
        WHERE e1.src < e2.dst
        GROUP BY e1.src, e2.dst
    ),
    nonedge AS (
        SELECT u, w, cn FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM und x
                          WHERE x.src = c.u AND x.dst = c.w)
    )
    SELECT u AS src, w AS dst, cn AS common_neighbors,
           du.d AS deg_src, dw.d AS deg_dst,
           ROUND(CAST(cn AS DOUBLE) / (du.d + dw.d - cn), 9) AS jaccard
    FROM nonedge JOIN deg du ON u = du.v JOIN deg dw ON w = dw.v
    """,
)
def link_prediction_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Jaccard link prediction over the SPARSIFIED
    brand co-purchase graph (same top-3-per-node edge construction as
    ``bfs_hops_brands``): for every non-adjacent pair reachable in two
    hops, score = shared-neighbor count and Jaccard of neighborhoods —
    the similar-item candidate generator a recommender mines from the
    link graph.

    Scale shape: the two-hop expansion goes THROUGH a middle node, so
    its cost is Σ_m deg(m)² — unbounded when hub nodes exist. The
    ``mid`` gate (deg ≤ 64) caps every middle node's contribution at
    64², making the join output linear in edges (the standard hub
    exclusion of large-scale link prediction); existing edges are
    removed by a left-anti equi-join, never a cartesian check. Pure
    integer counts; the single float division is final and ROUNDed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a = ob.select("k", F.col("b").alias("src"))
    c = ob.select("k", F.col("b").alias("dst"))
    pairs = (
        a.join(c, "k")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w3 = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("dst"))
    bedges = (
        pairs.withColumn("rn", F.row_number().over(w3))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
    )
    # symmetrized adjacency, referenced four times below -> materialize
    # once (brand-vocabulary bounded at any sf; components.py doctrine)
    und = (
        bedges.unionByName(
            bedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("src", "v")
    mid = deg.filter(F.col("d") <= 64).select("v")
    e1 = und.select(F.col("src").alias("u"), F.col("dst").alias("m"))
    e2 = und.select(F.col("src").alias("m"), F.col("dst").alias("w"))
    cand = (
        e1.join(mid.withColumnRenamed("v", "m"), "m")
        .join(e2, "m")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonedge = cand.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("deg_src"))
    dw = deg.select(F.col("v").alias("w"), F.col("d").alias("deg_dst"))
    return (
        nonedge.join(du, "u")
        .join(dw, "w")
        .select(
            F.col("u").alias("src"),
            F.col("w").alias("dst"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.col("deg_src").cast("long"),
            F.col("deg_dst").cast("long"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_src") + F.col("deg_dst") - F.col("cn")),
                9,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming sessionization — the native session_window run as a stream.
# ---------------------------------------------------------------------------
@register(
    "streaming_session_agg",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def streaming_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` run as a Structured Streaming query (append
    mode + watermark — the only modes session state supports) and
    driven to EXACT batch equality: sentinel flush events written after
    each ``processAllAvailable`` advance the watermark past every real
    session's end, so state for all genuine sessions is evicted and
    emitted before the query stops (the same oracle as the batch
    ``session_window_agg`` — full equality, not the prefix-containment
    contract of the streaming outer joins). State is keyed by (user,
    session) and GC'd by the watermark, so memory is bounded by active
    sessions × gap, not stream length."""
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_session_agg,
    )

    return run_streaming_session_agg(spark, sf_dir)


# ---------------------------------------------------------------------------
# Frequent itemsets (a-priori) — market-basket triples beyond the pair
# co-occurrence the recommender family already mines.
# ---------------------------------------------------------------------------

_FI_SUPPORT = 10


@register(
    "frequent_itemset_triples",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS b
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    fi AS (SELECT b FROM (SELECT b, COUNT(*) AS n FROM ob GROUP BY b)
           WHERE n >= {_FI_SUPPORT}),
    obf AS (SELECT k, b FROM ob WHERE b IN (SELECT b FROM fi)),
    pairs AS (
        SELECT a.b AS b1, c.b AS b2, COUNT(*) AS n
        FROM obf a JOIN obf c USING (k) WHERE a.b < c.b GROUP BY 1, 2
    ),
    fp AS (SELECT b1, b2 FROM pairs WHERE n >= {_FI_SUPPORT}),
    tri AS (
        SELECT a.b AS b1, c.b AS b2, d.b AS b3, COUNT(*) AS n
        FROM obf a JOIN obf c USING (k) JOIN obf d USING (k)
        WHERE a.b < c.b AND c.b < d.b
          AND EXISTS (SELECT 1 FROM fp WHERE fp.b1 = a.b AND fp.b2 = c.b)
          AND EXISTS (SELECT 1 FROM fp WHERE fp.b1 = a.b AND fp.b2 = d.b)
          AND EXISTS (SELECT 1 FROM fp WHERE fp.b1 = c.b AND fp.b2 = d.b)
        GROUP BY 1, 2, 3
    )
    SELECT b1 AS brand_a, b2 AS brand_b, b3 AS brand_c,
           CAST(n AS BIGINT) AS support
    FROM tri WHERE n >= {_FI_SUPPORT}
    """,
)
def frequent_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand TRIPLES by the a-priori doctrine: every stage's
    candidates are generated only from the previous stage's survivors
    (frequent items gate the baskets, frequent pairs gate the pair
    instances, and all three sub-pairs of a triple must be frequent
    before it is counted). That anti-monotone pruning is what makes
    itemset mining feasible at 100 TB — the triple join runs over the
    support-pruned minority, not the raw baskets, and per-basket
    fan-out is C(m,3) with m bounded by basket size (≤7 lineitems per
    TPC-H order). All equi-joins on the basket key + hash aggregates;
    pure integer counts, bit-exact oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("b"))
        .distinct()
    )
    fi = (
        ob.groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _FI_SUPPORT)
        .select("b")
    )
    obf = ob.join(fi, "b", "left_semi")
    t1 = obf.select("k", F.col("b").alias("b1"))
    t2 = obf.select("k", F.col("b").alias("b2"))
    t3 = obf.select("k", F.col("b").alias("b3"))
    pair_inst = t1.join(t2, "k").filter(F.col("b1") < F.col("b2"))
    fp = (
        pair_inst.groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _FI_SUPPORT)
        .select("b1", "b2")
    )
    gated_pairs = pair_inst.join(fp, ["b1", "b2"], "left_semi")
    fp13 = fp.select(F.col("b1"), F.col("b2").alias("b3"))
    fp23 = fp.select(F.col("b1").alias("b2"), F.col("b2").alias("b3"))
    return (
        gated_pairs.join(t3, "k")
        .filter(F.col("b3") > F.col("b2"))
        .join(fp13, ["b1", "b3"], "left_semi")
        .join(fp23, ["b2", "b3"], "left_semi")
        .groupBy("b1", "b2", "b3")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _FI_SUPPORT)
        .select(
            F.col("b1").alias("brand_a"),
            F.col("b2").alias("brand_b"),
            F.col("b3").alias("brand_c"),
            F.col("n").cast("long").alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series downsampling — LTTB (largest-triangle-three-buckets),
# fixed-anchor variant, exact integer/decimal geometry.
# ---------------------------------------------------------------------------

_LTTB_BUCKETS = 12
# area terms as exact wide integers: DuckDB HUGEINT / Spark DECIMAL(38,0)
_D = "DECIMAL(38,0)"


@register(
    "downsample_lttb_user_value",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id, ts,
               epoch_us(ts) // 1000000
                   - MIN(epoch_us(ts) // 1000000)
                         OVER (PARTITION BY user_id) AS x,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
               CAST(value AS DECIMAL(12,2)) AS v,
               ntile({_LTTB_BUCKETS}) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS bucket
        FROM events
    ),
    bsum AS (
        SELECT user_id, bucket,
               COUNT(*) AS nb, SUM(x) AS sx, SUM(y) AS sy
        FROM pts GROUP BY 1, 2
    ),
    nbr AS (
        SELECT user_id, bucket,
               MAX(bucket) OVER (PARTITION BY user_id) AS lastb,
               lag(nb) OVER w AS nl, lag(sx) OVER w AS sxl,
               lag(sy) OVER w AS syl,
               lead(nb) OVER w AS nr, lead(sx) OVER w AS sxr,
               lead(sy) OVER w AS syr
        FROM bsum
        WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
    ),
    scored AS (
        SELECT p.user_id, p.event_id, p.ts, p.v, p.x, p.bucket,
               CASE
                 WHEN p.bucket = 1 THEN CAST(-p.x AS HUGEINT)
                 WHEN p.bucket = n.lastb THEN CAST(p.x AS HUGEINT)
                 ELSE ABS(
                   (CAST(n.sxl AS HUGEINT) * n.nr - CAST(n.sxr AS HUGEINT) * n.nl)
                     * (CAST(p.y AS HUGEINT) * n.nl - n.syl)
                   - (CAST(n.sxl AS HUGEINT) - CAST(p.x AS HUGEINT) * n.nl)
                     * (CAST(n.syr AS HUGEINT) * n.nl - CAST(n.syl AS HUGEINT) * n.nr)
                 )
               END AS score
        FROM pts p JOIN nbr n USING (user_id, bucket)
    ),
    pick AS (
        SELECT user_id, event_id, ts, v, bucket,
               row_number() OVER (PARTITION BY user_id, bucket
                                  ORDER BY score DESC, x, event_id) AS rn
        FROM scored
    )
    SELECT user_id, CAST(bucket AS INT) AS bucket,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(v AS DOUBLE) AS value
    FROM pick WHERE rn = 1
    """,
)
def downsample_lttb_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-series downsampling to {_LTTB_BUCKETS} visually
    representative points — the largest-triangle-three-buckets family
    (Steinarsson 2013), in its parallel FIXED-ANCHOR variant: each
    middle bucket keeps the point with the largest triangle area
    against the AVERAGE points of its neighbor buckets (classic LTTB
    anchors on the previously-selected point, a sequential dependency;
    anchoring on neighbor means is the standard parallel relaxation),
    first/last buckets keep their first/last points.

    Exact geometry, no floats: x in rebased epoch SECONDS, y in integer
    CENTS, and the area comparison multiplied through by nl²·nr so
    every term is an integer — DuckDB HUGEINT vs Spark DECIMAL(38,0),
    both exact (magnitudes ≤ ~1e22 at any plausible per-user history,
    far inside both ranges); ties break on (x, event_id).

    Scale shape: one per-user sort window for ntile (the same exchange
    as any per-key history op), bucket sums are a hash aggregate, and
    the neighbor frame is ≤{_LTTB_BUCKETS} rows per user — lag/lead
    over it is partitioned, never global."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) div 1000000")
    wu = W.partitionBy("user_id")
    pts = events.select(
        "user_id",
        "event_id",
        "ts",
        (sec - F.min(sec).over(wu)).alias("x"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("y"),
        F.col("value").cast("decimal(12,2)").alias("v"),
        F.ntile(_LTTB_BUCKETS)
        .over(wu.orderBy("ts", "event_id"))
        .alias("bucket"),
    )
    bsum = pts.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    wb = W.partitionBy("user_id").orderBy("bucket")
    nbr = bsum.select(
        "user_id",
        "bucket",
        F.max("bucket").over(W.partitionBy("user_id")).alias("lastb"),
        F.lag("nb").over(wb).alias("nl"),
        F.lag("sx").over(wb).alias("sxl"),
        F.lag("sy").over(wb).alias("syl"),
        F.lead("nb").over(wb).alias("nr"),
        F.lead("sx").over(wb).alias("sxr"),
        F.lead("sy").over(wb).alias("syr"),
    )
    j = pts.join(nbr, ["user_id", "bucket"])
    d = lambda c: F.col(c).cast(_D)  # noqa: E731
    area = F.abs(
        (d("sxl") * d("nr") - d("sxr") * d("nl"))
        * (d("y") * d("nl") - d("syl"))
        - (d("sxl") - d("x") * d("nl"))
        * (d("syr") * d("nl") - d("syl") * d("nr"))
    )
    score = (
        F.when(F.col("bucket") == 1, (-F.col("x")).cast(_D))
        .when(F.col("bucket") == F.col("lastb"), F.col("x").cast(_D))
        .otherwise(area)
    )
    wpick = W.partitionBy("user_id", "bucket").orderBy(
        F.desc("score"), F.asc("x"), F.asc("event_id")
    )
    return (
        j.withColumn("score", score)
        .withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.col("v").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence — categorical drift / association audit.
# ---------------------------------------------------------------------------
@register(
    "chisq_event_type_dow",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow,
               COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, dow, o,
               SUM(o) OVER (PARTITION BY event_type) AS r,
               SUM(o) OVER (PARTITION BY dow) AS c,
               SUM(o) OVER () AS n
        FROM cells
    )
    SELECT CAST(ROUND(SUM(ROUND(
               CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
               / (CAST(n AS DOUBLE) * r * c), 9)), 6) AS DOUBLE) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n
    FROM t
    """,
)
def chisq_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    ISO day-of-week — the categorical drift/association audit a
    pipeline runs to decide whether a dimension interacts with time
    (feeding into stratification choices). Computed in the
    integer-numerator form: per cell, ``(O·n − R·C)² / (n·R·C)`` where
    O, R, C, n are exact BIGINT counts — the subtraction happens in
    integers (≤ ~1e13, exactly representable as doubles), each term is
    ROUNDed to 9 decimals before the ≤|types·7|-row sum (the per-term
    quantization doctrine), and dof = (R−1)(C−1).

    Scale shape: one hash aggregate over the fact table down to ≤35
    cells; every window (row/col/grand totals) runs over that bounded
    aggregated frame. Spark ``weekday()+1`` ≡ DuckDB ``isodow`` (the
    `dow_seasonality_by_type` convention)."""
    events = load_table(spark, sf_dir, "events")
    cells = (
        events.select(
            "event_type",
            (F.expr("weekday(ts)") + F.lit(1)).cast("int").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    t = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    dev = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    term = F.round(
        dev.cast("double")
        * dev.cast("double")
        / (F.col("n").cast("double") * F.col("r") * F.col("c")),
        9,
    )
    return t.agg(
        F.round(F.sum(term), 6).cast("double").alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.max("n").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association matrix — chi-square, normalized and swept
# across the schema's categorical pairs.
# ---------------------------------------------------------------------------

def _cramers_pair_sql(label: str, table: str, xe: str, ye: str) -> str:
    return f"""
    SELECT '{label}' AS pair, chi2, dof, n,
           ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * (LEAST(nr, nc) - 1))), 6)
               AS cramers_v
    FROM (
        SELECT CAST(ROUND(SUM(ROUND(
                   CAST(o * n - r * c AS DOUBLE)
                   * CAST(o * n - r * c AS DOUBLE)
                   / (CAST(n AS DOUBLE) * r * c), 9)), 6) AS DOUBLE) AS chi2,
               CAST((COUNT(DISTINCT x) - 1)
                    * (COUNT(DISTINCT y) - 1) AS BIGINT) AS dof,
               CAST(MAX(n) AS BIGINT) AS n,
               COUNT(DISTINCT x) AS nr, COUNT(DISTINCT y) AS nc
        FROM (
            SELECT x, y, o,
                   SUM(o) OVER (PARTITION BY x) AS r,
                   SUM(o) OVER (PARTITION BY y) AS c,
                   SUM(o) OVER () AS n
            FROM (SELECT {xe} AS x, {ye} AS y, COUNT(*) AS o
                  FROM {table} GROUP BY 1, 2) cells
        ) t
    ) s"""


@register(
    "cramers_v_matrix",
    oracle=" UNION ALL ".join(
        [
            _cramers_pair_sql(
                "event_type_x_dow",
                "events",
                "event_type",
                "CAST(isodow(CAST(ts AS DATE)) AS VARCHAR)",
            ),
            _cramers_pair_sql("lang_x_source", "documents", "lang", "source"),
            _cramers_pair_sql(
                "segment_x_nation",
                "customer",
                "c_mktsegment",
                "CAST(c_nationkey AS VARCHAR)",
            ),
        ]
    ),
)
def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association sweep across the schema's categorical
    pairs — `chisq_event_type_dow` generalized into the profiler view
    (pandas-profiling's "associations" panel, distributed): chi-square
    alone grows with n, V = sqrt(chi2 / (n·(min(r,c)−1))) normalizes it
    to [0,1] so pairs of different sizes and cardinalities compare on
    one scale — the readout that decides which dimensions need joint
    (not independent) stratification in sampling and split design.

    Same exactness discipline as the parent query: integer-numerator
    (O·n − R·C)²/(n·R·C) per cell with one 9-dp round, marginals via
    windows over the bounded contingency frames (≤ |x|·|y| cells each),
    and V's sqrt applied to the identically-rounded chi2 in both
    engines. Each pair costs one map-combinable hash aggregate over its
    table; the union of three 1-row results is free."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    cust = load_table(spark, sf_dir, "customer")

    def pair(label: str, df: DataFrame, xc, yc) -> DataFrame:
        cells = (
            df.select(xc.cast("string").alias("x"), yc.cast("string").alias("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("o"))
        )
        t = cells.select(
            "x",
            "y",
            "o",
            F.sum("o").over(Window.partitionBy("x")).alias("r"),
            F.sum("o").over(Window.partitionBy("y")).alias("c"),
            F.sum("o").over(Window.partitionBy()).alias("n"),
        )
        dev = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast(
            "double"
        )
        term = F.round(
            dev * dev / (F.col("n").cast("double") * F.col("r") * F.col("c")),
            9,
        )
        agg = t.agg(
            F.round(F.sum(term), 6).alias("chi2"),
            (
                (F.countDistinct("x") - 1) * (F.countDistinct("y") - 1)
            ).cast("long").alias("dof"),
            F.max("n").cast("long").alias("n"),
            F.countDistinct("x").alias("nr"),
            F.countDistinct("y").alias("nc"),
        )
        return agg.select(
            F.lit(label).alias("pair"),
            "chi2",
            "dof",
            "n",
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n").cast("double")
                        * (F.least("nr", "nc") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )

    return (
        pair(
            "event_type_x_dow",
            ev,
            F.col("event_type"),
            (F.expr("weekday(ts)") + F.lit(1)).cast("int"),
        )
        .unionAll(pair("lang_x_source", docs, F.col("lang"), F.col("source")))
        .unionAll(
            pair(
                "segment_x_nation",
                cust,
                F.col("c_mktsegment"),
                F.col("c_nationkey"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Brier decomposition — calibration quality as three numbers.
# ---------------------------------------------------------------------------
@register(
    "brier_decomposition_classifier",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    {_QC_SCORE_CTES},
    base AS (SELECT doc_id, lang FROM documents WHERE text IS NOT NULL),
    sc AS (SELECT b.doc_id,
                  COALESCE(sw / n, 0.0) /
                      (1 + abs(COALESCE(sw / n, 0.0))) AS quality,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM base b LEFT JOIN agg USING (doc_id)),
    pr AS (SELECT CAST(LEAST(FLOOR(((quality + 1.0) / 2.0) * 20), 19) AS INT)
                      AS bin,
                  (quality + 1.0) / 2.0 AS p, pos
           FROM sc),
    bb AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(pos) AS BIGINT) AS k_b,
               CAST(SUM(CAST(FLOOR(p * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sq,
               SUM(ROUND((p - pos) * (p - pos), 9)) AS bsum
        FROM pr GROUP BY bin
    ),
    tt AS (
        SELECT bin, n_b, k_b, sq, bsum,
               SUM(n_b) OVER () AS n, SUM(k_b) OVER () AS k
        FROM bb
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
           ROUND(CAST(MAX(k) AS DOUBLE) / MAX(n), 6) AS base_rate,
           ROUND(SUM(bsum) / MAX(n), 6) AS brier,
           ROUND(SUM(ROUND(n_b
                 * (CAST(sq AS DOUBLE) / 1e9 / n_b
                    - CAST(k_b AS DOUBLE) / n_b)
                 * (CAST(sq AS DOUBLE) / 1e9 / n_b
                    - CAST(k_b AS DOUBLE) / n_b), 9)) / MAX(n), 6)
               AS reliability,
           ROUND(SUM(ROUND(n_b
                 * (CAST(k_b AS DOUBLE) / n_b - CAST(k AS DOUBLE) / n)
                 * (CAST(k_b AS DOUBLE) / n_b - CAST(k AS DOUBLE) / n),
                 9)) / MAX(n), 6) AS resolution,
           ROUND((CAST(MAX(k) AS DOUBLE) / MAX(n))
                 * (1.0 - CAST(MAX(k) AS DOUBLE) / MAX(n)), 6)
               AS uncertainty
    FROM tt
    """,
)
def brier_decomposition_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the quality classifier's Brier score —
    BS = reliability − resolution + uncertainty (up to within-bin
    variance): one number each for "are the probabilities honest"
    (reliability, want 0), "do they separate the classes" (resolution,
    want big) and the irreducible base-rate term —
    `classifier_calibration_bins`' reliability DIAGRAM collapsed to the
    scorecard a model registry tracks per version.

    Determinism: same binned frame as the calibration query (dyadic p,
    floor-quantized per-term mean); every per-bin squared-gap term is
    a fixed expression over exact (n_b, k_b, Σ⌊p·1e9⌉) integers,
    rounded once at 9 dp before the 20-row sum; grand totals via
    windows over the 20-row model-constant bin frame."""
    j = _classifier_scored(spark, sf_dir)
    p = (F.col("quality") + F.lit(1.0)) / F.lit(2.0)
    pr = j.select(
        F.least(F.floor(p * 20), F.lit(19)).cast("int").alias("bin"),
        p.alias("p"),
        "pos",
    )
    b = pr.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("pos").alias("k_b"),
        F.sum(F.floor(F.col("p") * 1e9 + 0.5).cast("long")).alias("sq"),
        F.sum(
            F.round(
                (F.col("p") - F.col("pos")) * (F.col("p") - F.col("pos")), 9
            )
        ).alias("bsum"),
    )
    w = Window.partitionBy()
    t = b.select(
        "n_b",
        "k_b",
        "sq",
        "bsum",
        F.sum("n_b").over(w).alias("n"),
        F.sum("k_b").over(w).alias("k"),
    )
    pb = F.col("sq").cast("double") / 1e9 / F.col("n_b")
    yb = F.col("k_b").cast("double") / F.col("n_b")
    ybar = F.col("k").cast("double") / F.col("n")
    rel_t = F.round(F.col("n_b") * (pb - yb) * (pb - yb), 9)
    res_t = F.round(F.col("n_b") * (yb - ybar) * (yb - ybar), 9)
    return t.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(F.max("k").cast("double") / F.max("n"), 6).alias("base_rate"),
        F.round(F.sum("bsum") / F.max("n"), 6).alias("brier"),
        F.round(F.sum(rel_t) / F.max("n"), 6).alias("reliability"),
        F.round(F.sum(res_t) / F.max("n"), 6).alias("resolution"),
        F.round(
            (F.max("k").cast("double") / F.max("n"))
            * (1.0 - F.max("k").cast("double") / F.max("n")),
            6,
        ).alias("uncertainty"),
    )
