"""ML-preprocessing and estimation-theory queries (round 6): Flesch
readability scoring, the feature-hashing trick, lift/gain deciles for
the linear quality classifier, and an AMS (tug-of-war) F2 sketch with
its exact twin — each a named catalog query with a DuckDB oracle.

Cross-engine determinism carries the module: md5-hex→BIGINT hashing for
anything pseudo-random (signs, buckets), exact integer/DECIMAL(38,0)
sums, divisions only as the final op and rounded, and the two-level
bucketed rank pattern (never a data-sized global window) wherever a
cumulative position over distinct values is needed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.money import dec2
from esther_apache_spark_spark.functions.text import tokenize, normalize_text
from esther_apache_spark_spark.plans.catalog import register
from esther_apache_spark_spark.plans.extensions import _QC_SCORE_CTES, _TOKS_CTE
from esther_apache_spark_spark.schemas import load_table

# ---------------------------------------------------------------------------
# Flesch reading ease — the classic readability heuristic as a corpus
# quality feature (a standard column in LLM data-quality dashboards).
# ---------------------------------------------------------------------------


@register(
    "readability_flesch_docs",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, text,
               trim(regexp_replace(lower(text), '[^\w\s]', '', 'g')) AS nt
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(nt, '\s+'),
                                    x -> x <> '')) AS BIGINT) AS words,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS sentences,
               CAST(len(regexp_extract_all(nt, '[aeiouy]+')) AS BIGINT)
                   AS syllables
        FROM norm
    )
    SELECT doc_id, words, sentences, syllables,
           CAST(ROUND(206.835
                      - 1.015 * (CAST(words AS DOUBLE) / sentences)
                      - 84.6 * (CAST(syllables AS DOUBLE) / words), 9)
                AS DOUBLE) AS flesch
    FROM counts WHERE words > 0
    """,
)
def readability_flesch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the interpretable quality
    feature beside the learned classifier score: 206.835 − 1.015·(W/S)
    − 84.6·(Syl/W), with syllables approximated by vowel-group count
    (the standard dependency-free estimator — exact syllabification
    needs a pronunciation lexicon). Words and vowel groups are counted
    on the SAME normalized text the corpus tokenizer produces (lower +
    punctuation strip), sentences on the raw text's terminal-punctuation
    runs (min 1), so the three counts share one definition with the
    rest of the text stack.

    Determinism: all three inputs are exact integers from identical
    regex semantics (RE2-safe character classes); the formula is one
    fixed double expression tree evaluated on those integers, identical
    IEEE ops in both engines, rounded once. Scale: pure per-row
    projection — no join, no window, no shuffle; Catalyst prunes the
    scan to (doc_id, text)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    nt = normalize_text(F.col("text"))
    counts = docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("words"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("long")
        .alias("sentences"),
        F.regexp_count(nt, F.lit("[aeiouy]+")).cast("long").alias("syllables"),
    )
    return counts.filter(F.col("words") > 0).select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences"))
            - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words")),
            9,
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) — fixed-width sparse features
# without a vocabulary pass.
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64


@register(
    "feature_hash_vectors",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    expl AS (
        SELECT doc_id, unnest(t) AS tok FROM toks
    ),
    hashed AS (
        SELECT doc_id,
               CAST(CONCAT('0x', substr(md5('fh:' || tok), 1, 8)) AS BIGINT)
                   AS h
        FROM expl
    )
    SELECT doc_id,
           CAST(h % {_FH_BUCKETS} AS BIGINT) AS bucket,
           CAST(SUM(CASE WHEN ((h >> 6) & 1) = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS feat
    FROM hashed GROUP BY doc_id, h % {_FH_BUCKETS}
    """,
)
def feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al.'s signed feature hashing):
    each token lands in one of 64 buckets by hash, contributing ±1 by
    an independent hash bit, and a document's feature vector is the
    per-bucket signed sum — fixed-width features with NO vocabulary
    pass over the corpus (the property that matters at 100 TB: a
    vocabulary is a second full scan plus a giant dim table; hashing is
    stateless). The signed sum makes collisions cancel in expectation —
    the estimator the kernel-trick analysis of feature hashing relies
    on — where unsigned counting would bias upward.

    Emitted long-form (doc_id, bucket, feat≠0 rows implicit by
    grouping); consumers needing dense vectors pivot the ≤64 buckets.
    Scale: explode → partial-aggregable (doc, bucket) hash agg, no
    window, no join. Determinism: the md5-hex→BIGINT family (same
    construction the CMS/sampling gates replay), so bucket and sign are
    bit-identical in DuckDB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh:"), F.col("tok"))), 1, 8), 16, 10
    ).cast("long")
    hashed = toks.select(
        "doc_id",
        (h % _FH_BUCKETS).cast("long").alias("bucket"),
        F.when((F.shiftright(h, 6).bitwiseAND(F.lit(1))) == 0, 1)
        .otherwise(-1)
        .alias("sign"),
    )
    return hashed.groupBy("doc_id", "bucket").agg(
        F.sum("sign").cast("long").alias("feat")
    )


# ---------------------------------------------------------------------------
# Lift / gains deciles for the linear quality classifier.
# ---------------------------------------------------------------------------


@register(
    "lift_gain_deciles",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    {_QC_SCORE_CTES},
    base AS (SELECT doc_id, lang FROM documents WHERE text IS NOT NULL),
    sc AS (SELECT b.doc_id, COALESCE(sw / n, 0.0) AS score,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM base b LEFT JOIN agg USING (doc_id)),
    per AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(pos) AS BIGINT) AS p
            FROM sc GROUP BY score),
    cum AS (SELECT c, p,
                   SUM(c) OVER (ORDER BY score DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS n_ge,
                   SUM(c) OVER () AS n
            FROM per),
    dec AS (SELECT CAST((10 * n_ge + n - 1) // n AS INT) AS decile, c, p
            FROM cum),
    g AS (SELECT decile, SUM(c) AS nc, SUM(p) AS np
          FROM dec GROUP BY decile)
    SELECT decile,
           CAST(nc AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_pos,
           CAST(SUM(nc) OVER w AS BIGINT) AS cum_docs,
           CAST(SUM(np) OVER w AS BIGINT) AS cum_pos,
           CAST(ROUND(CAST(SUM(np) OVER w AS DOUBLE) / SUM(np) OVER (), 9)
                AS DOUBLE) AS gain,
           CAST(ROUND((CAST(SUM(np) OVER w AS DOUBLE) / SUM(nc) OVER w)
                      / (CAST(SUM(np) OVER () AS DOUBLE) / SUM(nc) OVER ()), 9)
                AS DOUBLE) AS lift
    FROM g
    WINDOW w AS (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for the linear quality classifier
    against the English label — the campaign-targeting readout beside
    `quality_classifier_auc` (AUC summarizes ranking in one number;
    gains answer "if I can only process the top-k%, how much of the
    signal do I capture?"). Deciles are CUMULATIVE-POSITION deciles over
    distinct scores: every doc at score s joins decile
    ceil(10·n_ge(s)/n), so tied scores land together deterministically
    (ntile would split ties engine-arbitrarily).

    Scale shape — the same distributed two-level rank as the AUC query:
    docs collapse to one row per distinct score (hash agg); each score
    lands in one of ≤1025 value-range buckets (floor((score+1)·512),
    exact IEEE on the classifier's dyadic scores); n_ge(s) = the
    higher-buckets total (window over the ≤1025-row bucket frame) plus
    a within-bucket cumulative — no data-sized global window. The final
    lift/gain windows run over the ≤10-row decile frame."""
    from esther_apache_spark_spark.plans.evaluation import _classifier_scored

    sc = _classifier_scored(spark, sf_dir)
    per = sc.groupBy("score").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    per = per.withColumn(
        "bucket", F.floor((F.col("score") + F.lit(1.0)) * F.lit(512.0)).cast("int")
    )
    btot = per.groupBy("bucket").agg(F.sum("c").alias("bc"))
    w_gt = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.select(
        "bucket",
        F.coalesce(F.sum("bc").over(w_gt), F.lit(0)).alias("gt_off"),
        F.sum("bc").over(Window.partitionBy()).alias("n"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        per.withColumn("cum_in", F.sum("c").over(w_in))
        .join(offs, "bucket")
        .select(
            "c",
            "p",
            (F.col("gt_off") + F.col("cum_in")).alias("n_ge"),
            "n",
        )
    )
    # integer ceil-div: decile(s) = ceil(10 * n_ge / n)
    dec = cum.selectExpr(
        "CAST((10 * n_ge + n - 1) DIV n AS INT) AS decile", "c", "p"
    )
    g = dec.groupBy("decile").agg(F.sum("c").alias("nc"), F.sum("p").alias("np"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return g.select(
        "decile",
        F.col("nc").cast("long").alias("n_docs"),
        F.col("np").cast("long").alias("n_pos"),
        F.sum("nc").over(w).cast("long").alias("cum_docs"),
        F.sum("np").over(w).cast("long").alias("cum_pos"),
        F.round(
            F.sum("np").over(w).cast("double") / F.sum("np").over(w_all), 9
        ).alias("gain"),
        F.round(
            (F.sum("np").over(w).cast("double") / F.sum("nc").over(w))
            / (F.sum("np").over(w_all).cast("double") / F.sum("nc").over(w_all)),
            9,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# AMS (tug-of-war) F2 sketch — second frequency moment / self-join size.
# ---------------------------------------------------------------------------

_AMS_R = 16


def _ams_sign_sql(r: int) -> str:
    return (
        f"CASE WHEN CAST(CONCAT('0x', substr(md5('ams{r}:' || "
        f"CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0 "
        f"THEN 1 ELSE -1 END"
    )


def _ams_oracle() -> str:
    sums = ",\n               ".join(
        f"SUM({_ams_sign_sql(r)}) AS s{r}" for r in range(_AMS_R)
    )
    ests = ", ".join(
        f"CAST(s{r} AS HUGEINT) * CAST(s{r} AS HUGEINT)" for r in range(_AMS_R)
    )
    return f"""
    WITH sk AS (
        SELECT {sums}
        FROM events
    ),
    med AS (
        SELECT list_sort([{ests}]) AS l FROM sk
    ),
    est AS (
        SELECT CAST(l[{_AMS_R // 2}] + l[{_AMS_R // 2 + 1}] AS BIGINT)
               AS f2_est2
        FROM med
    ),
    exact AS (
        SELECT CAST(SUM(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT))
                    AS BIGINT) AS f2_exact
        FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY user_id)
    )
    SELECT f2_exact, f2_est2,
           CAST(ROUND((CAST(f2_est2 AS DOUBLE) / 2 - f2_exact)
                      / f2_exact, 9) AS DOUBLE) AS rel_err
    FROM exact, est
    """


@register("ams_f2_selfjoin_estimate", oracle=_ams_oracle())
def ams_f2_selfjoin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" sketch (Alon–Matias–Szegedy) for the second
    frequency moment F2 = Σ_u cnt(u)² of the event-user stream —
    the self-join size estimator a cost-based optimizer wants before
    committing to a join order, and the classic one-pass streaming
    moment sketch. 16 independent estimators: each hashes every row's
    user to ±1 (md5 parity — fully SQL-replayable, unlike a seeded
    PRNG) and keeps one running signed counter S_r; E[S_r²] = F2
    exactly, and the median of the 16 squares concentrates. The median
    is emitted DOUBLED (l[8]+l[9]) so it stays an exact integer —
    halving would be the one lossy op in the pipeline.

    The exact twin (Σcnt² via a per-user hash agg) rides along for the
    relative-error readout — the operator's own accuracy audit, like
    `ann_recall_audit` does for ANN. Scale: the sketch side is ONE
    partial-aggregable pass (16 conditional sums, no shuffle beyond the
    final 1-row combine); the exact side is a two-level hash agg.
    Squares/sums ride in DECIMAL(38,0) ≡ HUGEINT (S_r ~ n at worst, so
    S² blows BIGINT at ~10^10 rows); the 1-row × 1-row join is pinned
    in the hygiene allowlist."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"

    def sign(r: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"ams{r}:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return F.when(h % 2 == 0, 1).otherwise(-1)

    sk = ev.agg(*[F.sum(sign(r)).alias(f"s{r}") for r in range(_AMS_R)])
    ests = F.array_sort(
        F.array(
            *[
                (F.col(f"s{r}").cast(d38) * F.col(f"s{r}").cast(d38))
                for r in range(_AMS_R)
            ]
        )
    )
    est = sk.select(
        (
            F.element_at(ests, _AMS_R // 2) + F.element_at(ests, _AMS_R // 2 + 1)
        )
        .cast("long")
        .alias("f2_est2")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(F.col("cnt").cast(d38) * F.col("cnt").cast(d38))
            .cast("long")
            .alias("f2_exact")
        )
    )
    return exact.crossJoin(est).select(
        "f2_exact",
        "f2_est2",
        F.round(
            (F.col("f2_est2").cast("double") / 2 - F.col("f2_exact"))
            / F.col("f2_exact"),
            9,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Streaming late-data accounting.
# ---------------------------------------------------------------------------


@register(
    "streaming_late_data_audit",
    oracle="""
    WITH e AS (
        SELECT event_id, ts, event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    b1 AS (SELECT * FROM e WHERE event_id % 7 <> 0),
    b2 AS (SELECT * FROM e WHERE event_id % 7 = 0),
    wm AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM b1),
    kept AS (
        SELECT ts, event_type, cents FROM b1
        UNION ALL
        SELECT b2.ts, b2.event_type, b2.cents
        FROM b2, wm
        WHERE date_trunc('hour', b2.ts) + INTERVAL 1 HOUR > wm.w
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM kept GROUP BY 1, 2
    """,
)
def streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermark drop semantics pinned by a batch oracle: an
    on-time feed and a one-batch-delayed feed (event_id % 7) run
    through a 1-hour tumbling aggregation with a 30-minute watermark;
    delayed rows whose window closed before the on-time watermark are
    dropped, rows for still-open windows absorbed. The oracle replays
    the exact rule (kept iff window_end > max(on-time ts) − 30 min),
    so the per-window accepted counts hash-match — the honesty check
    that the engine's late-data behavior is the DOCUMENTED one, not an
    accident of batch sizing. See
    `streaming.events.run_streaming_late_data_audit` for the
    deterministic drive mechanics."""
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_late_data_audit,
    )

    return run_streaming_late_data_audit(spark, sf_dir)


# ---------------------------------------------------------------------------
# Audio codec roundtrip — multimodal plumbing proven in-plan.
# ---------------------------------------------------------------------------

_WAV_CAP = 256  # samples per user clip (first-N by time)


@register(
    "audio_wav_roundtrip_stats",
    oracle=f"""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    capped AS (
        SELECT user_id, (cents % 65536) - 32768 AS s
        FROM (
            SELECT user_id, cents,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM e
        ) WHERE rn <= {_WAV_CAP}
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(MAX(abs(s)) AS BIGINT) AS peak
    FROM capped GROUP BY user_id
    """,
)
def audio_wav_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing proven END-TO-END inside one plan: each
    user's first 256 events (by time) synthesize an int16 PCM waveform
    (cents → [-32768, 32767]), which the REAL dependency-free WAV codec
    (`operators/multimodal.py` — RIFF chunk walk, 16-bit PCM) encodes
    to bytes and decodes back inside an Arrow-batched `applyInPandas`
    kernel; the kernel asserts bit-exact sample recovery and emits
    per-clip stats (n, Σs², peak) FROM THE DECODED bytes. The oracle
    computes the same stats straight from the source integers — so a
    hash match certifies the encode→binary→decode path is lossless, the
    same roundtrip discipline `decode_token_ids_roundtrip` applies to
    the tokenizer.

    Scale shape: the per-user cap bounds both the window frame tail and
    the kernel's memory (≤256 samples/clip); one shuffle by user; the
    binary payloads never leave the executor. int16 → float64/32768 →
    round is exact by construction (float64 holds ±2^15 integers
    exactly), so the roundtrip assertion is deterministic, not a
    tolerance check."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (
            F.pmod((dec2("value") * 100).cast("long"), F.lit(65536)) - 32768
        ).alias("s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    capped = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WAV_CAP)
        .select("user_id", "rn", "s")
    )

    import numpy as np
    import pandas as pd

    def clip_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        from esther_apache_spark_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        pdf = pdf.sort_values("rn")
        ints = pdf["s"].to_numpy(dtype=np.int64)
        payload = encode_wav(ints.astype(np.float64) / 32768.0, 16_000)
        decoded, rate = decode_wav(payload)
        back = np.round(decoded[:, 0] * 32768.0).astype(np.int64)
        if rate != 16_000 or len(back) != len(ints) or not (back == ints).all():
            raise ValueError("WAV roundtrip diverged")  # loud, never silent
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_samples": [len(back)],
                "sum_sq": [int((back * back).sum())],
                "peak": [int(np.abs(back).max())],
            }
        )

    return capped.groupBy("user_id").applyInPandas(
        clip_stats,
        schema="user_id long, n_samples long, sum_sq long, peak long",
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve — churn analysis with right-censoring.
# ---------------------------------------------------------------------------

_KM_SCALE = 1_000_000_000  # survival kept as an exact 1e9-scaled integer
_KM_CHURN_HOURS = 12


@register(
    "survival_km_curve",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(ts) AS mx FROM events),
    cohort AS (
        SELECT CAST(date_diff('day', CAST(p.first_ts AS DATE),
                              CAST(p.last_ts AS DATE)) AS BIGINT) AS dur,
               CASE WHEN p.last_ts < h.mx - INTERVAL {_KM_CHURN_HOURS} HOUR
                    THEN 1 ELSE 0 END AS churned
        FROM per_user p, horizon h
    ),
    freq AS (
        SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(churned) AS BIGINT) AS d
        FROM cohort GROUP BY dur
    ),
    risk AS (
        SELECT dur, d,
               SUM(n_users) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n_risk
        FROM freq
    ),
    ev AS (
        SELECT dur, d, n_risk,
               row_number() OVER (ORDER BY dur) AS rn
        FROM risk WHERE d > 0
    ),
    walk AS (
        WITH RECURSIVE km(rn, s) AS (
            SELECT CAST(0 AS BIGINT), CAST({_KM_SCALE} AS BIGINT)
            UNION ALL
            SELECT e.rn,
                   CAST(CAST(k.s AS HUGEINT) * (e.n_risk - e.d) // e.n_risk
                        AS BIGINT)
            FROM km k JOIN ev e ON e.rn = k.rn + 1
        )
        SELECT * FROM km WHERE rn > 0
    )
    SELECT e.dur AS t_days, e.n_risk, e.d AS d_events, w.s AS surv9
    FROM ev e JOIN walk w ON e.rn = w.rn
    """,
)
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user churn with right-censoring
    — THE estimator for "how long do users stay active" when the study
    window cuts observation short (naive retention curves silently
    treat still-active users as churned; KM's risk-set construction is
    the fix). Duration = days from a user's first to last event;
    churned if the last event predates the horizon by > 12 hours, else
    censored (still at risk when observation ended). S(t) =
    Π_{{t_j ≤ t}} (n_j − d_j)/n_j over event times, n_j the at-risk
    count (censored users leave the risk set without an event).

    Determinism doctrine — NO float product: survival is carried as a
    1e9-scaled integer with a floor division per step
    (s ← s·(n−d) div n), every intermediate exact in HUGEINT ≡ the
    Python kernel's arbitrary-precision ints, so the curve is
    bit-reproducible where exp(Σln) would drift in the last ulp. The
    fold is sequential BY NATURE (like `capped_running_balance`), but
    runs over the CALENDAR-BOUNDED distinct-duration frame (≤ span
    days — same bound as the OLS/seasonal family), never the raw
    events: the distributed work is the per-user first/last agg and
    the duration frequency frame; the ≤|days|-row walk is one tiny
    single-group kernel. The oracle replays it as a recursive CTE."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    cohort = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff(
            F.col("last_ts").cast("date"), F.col("first_ts").cast("date")
        )
        .cast("long")
        .alias("dur"),
        F.when(
            F.col("last_ts")
            < F.col("mx") - F.expr(f"INTERVAL {_KM_CHURN_HOURS} HOUR"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    freq = cohort.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("churned").alias("d")
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = freq.select(
        "dur", "d", F.sum("n_users").over(w_desc).alias("n_risk")
    ).filter(F.col("d") > 0)

    import pandas as pd

    def km_walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur")
        s = _KM_SCALE
        out = []
        for dur, d, n in zip(pdf["dur"], pdf["d"], pdf["n_risk"]):
            s = s * (int(n) - int(d)) // int(n)
            out.append((int(dur), int(n), int(d), s))
        return pd.DataFrame(
            out, columns=["t_days", "n_risk", "d_events", "surv9"]
        )

    # single-group fold over the calendar-bounded event-time frame
    return (
        risk.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            km_walk, schema="t_days long, n_risk long, d_events long, surv9 long"
        )
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap — confidence intervals in ONE pass, no resample shuffles.
# ---------------------------------------------------------------------------

_PB_B = 64
# cumulative Poisson(1) thresholds scaled by 2^32: floor(2^32 * Σ e⁻¹/k!)
_PB_TH = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)


def _pb_hash_sql(b: int) -> str:
    return (
        f"CAST(CONCAT('0x', substr(md5('pb{b}:' || "
        f"CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)"
    )


def _pb_weight_sql(b: int) -> str:
    h = _pb_hash_sql(b)
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_PB_TH)
    )
    return f"CASE {branches} ELSE 6 END"


def _pb_oracle() -> str:
    aggs = ",\n               ".join(
        f"SUM({_pb_weight_sql(b)}) AS n{b}, "
        f"SUM(CAST({_pb_weight_sql(b)} * cents AS HUGEINT)) AS s{b}"
        for b in range(_PB_B)
    )
    # Resample means as INTEGER nano-scaled values — round-half-up via
    # (s·10⁹ + n//2) // n in exact integer arithmetic, sorted as
    # integers, converted to double ONCE at the very end. The former
    # ROUND(double, 9) form hit a 1-ULP cross-engine divergence at
    # sf0.01 (Spark rounds via BigDecimal on the double's exact decimal
    # expansion, DuckDB in floating point); integer rounding + one
    # int→double conversion is bit-identical by IEEE 754 in both.
    means = ", ".join(
        f"CAST((s{b} * 1000000000 + n{b} // 2) // n{b} AS BIGINT)"
        for b in range(_PB_B)
    )
    return f"""
    WITH oc AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    agg AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(cents AS HUGEINT)) AS tot,
               {aggs}
        FROM oc GROUP BY segment
    ),
    sorted_means AS (
        SELECT segment, n_orders, tot, list_sort([{means}]) AS l FROM agg
    )
    SELECT segment, n_orders,
           CAST((tot * 1000000000 + n_orders // 2) // n_orders AS DOUBLE)
               / 1e9 AS mean_cents,
           CAST(l[2] AS DOUBLE) / 1e9 AS ci_lo_cents,
           CAST(l[{_PB_B - 1}] AS DOUBLE) / 1e9 AS ci_hi_cents
    FROM sorted_means
    """


@register("bootstrap_ci_poisson", oracle=_pb_oracle())
def bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for mean order value per segment — the
    bootstrap that actually runs at 100 TB: instead of materializing B
    resampled datasets (B full shuffles), every row carries B
    independent Poisson(1) weights (the large-n limit of multinomial
    resampling) and ALL 64 resample means come out of ONE partial-
    aggregable pass — 128 conditional sums, zero extra shuffles, zero
    row replication. The CI is the [2nd, 63rd] order statistic of the
    64 sorted resample means (2.5/97.5 percentile indices at B=64).

    Determinism: weights come from md5-hex→BIGINT uniforms cut at
    precomputed integer thresholds floor(2^32·Σe⁻¹/k!) — a seeded,
    SQL-replayable Poisson sampler, not a PRNG; weighted sums ride in
    DECIMAL(38,0) ≡ HUGEINT; each resample mean is rounded once before
    the order-statistic sort, so the sort key is bit-identical in both
    engines. Output: per segment, full-sample n/mean plus the CI."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    oc = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    d38 = "decimal(38,0)"

    def weight(b: int):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"pb{b}:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        w = F.when(h < _PB_TH[0], 0)
        for k, t in enumerate(_PB_TH[1:], start=1):
            w = w.when(h < t, k)
        return w.otherwise(6)

    aggs = []
    for b in range(_PB_B):
        wb = weight(b)
        aggs.append(F.sum(wb).alias(f"n{b}"))
        aggs.append(F.sum((wb * F.col("cents")).cast(d38)).alias(f"s{b}"))
    agg = oc.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("cents").cast(d38)).alias("tot"),
        *aggs,
    )
    # Integer nano-scaled resample means, sorted as integers, one
    # int→double conversion at the end — bit-identical to the oracle's
    # HUGEINT arithmetic (the former ROUND(double, 9) diverged by 1 ULP
    # at sf0.01; see the oracle builder comment).
    # PRECONDITION (ADVICE r10): resample sums are NON-NEGATIVE (cents
    # come from o_totalprice > 0), which is what makes Spark's `div`
    # (IntegralDivide, truncates toward zero) agree with the oracle's
    # `//` (floor division). If refunds/credits ever make a bucket sum
    # negative, switch BOTH engines to an explicitly floor-consistent
    # form before trusting the hash compare.
    means = F.expr(
        "array_sort(array(" + ", ".join(
            f"cast((s{b} * cast(1000000000 as decimal(38,0)) + n{b} div 2)"
            f" div n{b} as bigint)"
            for b in range(_PB_B)
        ) + "))"
    )
    mean_all = F.expr(
        "cast((tot * cast(1000000000 as decimal(38,0)) + n_orders div 2)"
        " div n_orders as double) / 1e9"
    )
    return agg.select(
        "segment",
        F.col("n_orders").cast("long").alias("n_orders"),
        mean_all.alias("mean_cents"),
        (F.element_at(means, 2).cast("double") / F.lit(1e9)).alias("ci_lo_cents"),
        (F.element_at(means, _PB_B - 1).cast("double") / F.lit(1e9)).alias(
            "ci_hi_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Chi-square keyness — corpus keyword extraction without logarithms.
# ---------------------------------------------------------------------------


@register(
    "keyword_keyness_chisq",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    expl AS (
        SELECT d.lang, unnest(t.t) AS tok
        FROM toks t JOIN documents d USING (doc_id)
    ),
    cells AS (
        SELECT tok,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
                   AS b
        FROM expl GROUP BY tok
    ),
    tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb
        FROM cells
    ),
    scored AS (
        SELECT tok, a, b,
               CAST(ROUND(
                   (CAST(ta AS DOUBLE) + tb)
                   * (CAST(a AS DOUBLE) * (tb - b)
                      - CAST(b AS DOUBLE) * (ta - a))
                   * (CAST(a AS DOUBLE) * (tb - b)
                      - CAST(b AS DOUBLE) * (ta - a))
                   / ((CAST(a AS DOUBLE) + b) * ((ta - a) + (CAST(tb AS DOUBLE) - b))
                      * ta * tb), 6) AS DOUBLE) AS chisq
        FROM cells, tot
        WHERE a + b >= 5 AND CAST(a AS DOUBLE) * tb > CAST(b AS DOUBLE) * ta
    )
    SELECT tok, a AS en_count, b AS rest_count, chisq
    FROM (
        SELECT *, row_number() OVER (ORDER BY chisq DESC, tok) AS rn
        FROM scored
    ) WHERE rn <= 20
    """,
)
def keyword_keyness_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keyness: the top-20 English-enriched keywords by 2×2
    chi-square against the rest-of-corpus background — the
    log-likelihood (Dunning G²) keyword extractor's chi-square twin,
    chosen deliberately because G² needs ln() while χ² =
    N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is pure arithmetic on exact
    integer cells: both engines evaluate one identical IEEE expression
    tree on identical BIGINTs, so the score is reproducible without
    the cross-engine ln drift the module doctrine avoids. Enrichment
    direction is pinned by the exact integer cross-product test
    a·tb > b·ta (never a float ratio compare).

    Scale: tokens reduce by partial-aggregable (token) hash agg to the
    VOCABULARY frame; totals are a 1-row scalar joined back; the
    top-20 rank runs over the vocabulary-bounded scored frame (same
    doctrine as `top_terms_per_lang`). Min-count a+b ≥ 5 prunes
    hapaxes before ranking."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    expl = docs.select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
    cells = expl.groupBy("tok").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("b"),
    )
    tot = cells.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    j = cells.crossJoin(F.broadcast(tot)).filter(
        (F.col("a") + F.col("b") >= 5)
        & (
            F.col("a").cast("double") * F.col("tb")
            > F.col("b").cast("double") * F.col("ta")
        )
    )
    num = (
        F.col("a").cast("double") * (F.col("tb") - F.col("b"))
        - F.col("b").cast("double") * (F.col("ta") - F.col("a"))
    )
    chisq = F.round(
        (F.col("ta").cast("double") + F.col("tb"))
        * num
        * num
        / (
            (F.col("a").cast("double") + F.col("b"))
            * (
                (F.col("ta") - F.col("a"))
                + (F.col("tb").cast("double") - F.col("b"))
            )
            * F.col("ta")
            * F.col("tb")
        ),
        6,
    )
    scored = j.select("tok", "a", "b", chisq.alias("chisq"))
    w = Window.orderBy(F.col("chisq").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "tok",
            F.col("a").alias("en_count"),
            F.col("b").alias("rest_count"),
            "chisq",
        )
    )


# ---------------------------------------------------------------------------
# Overdispersion index — count-model diagnostic per event type.
# ---------------------------------------------------------------------------


@register(
    "overdispersion_index_by_type",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    moments AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST(ROUND(CAST(sx AS DOUBLE) / n, 9) AS DOUBLE) AS mean_daily,
           CAST(ROUND(CAST(n * sxx - sx * sx AS DOUBLE)
                      / (CAST(n AS DOUBLE) * sx), 9) AS DOUBLE)
               AS dispersion_index,
           n * sxx - sx * sx > n * sx AS overdispersed
    FROM moments WHERE sx > 0
    """,
)
def overdispersion_index_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of DAILY event
    counts per type — the diagnostic that decides whether a Poisson
    count model is even admissible (Poisson ⇒ D = 1; D ≫ 1 means
    burstiness/contagion and calls for negative-binomial): D =
    (nΣx² − (Σx)²)/(n·Σx), population-variance form. The
    `overdispersed` flag is an EXACT integer comparison
    (nΣx² − (Σx)² > nΣx — i.e. D > 1 cleared of its denominator), so
    the boundary verdict can never flip on float noise; the reported
    D itself is the single final division, rounded.

    Scale: daily counts are a partial-aggregable two-level groupBy;
    moments ride in DECIMAL(38,0) ≡ HUGEINT (Σx² of 10^13-row days
    overflows BIGINT); the moment frame is |types| × |days| bounded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    d38 = "decimal(38,0)"
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
    )
    return m.filter(F.col("sx") > 0).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.col("sx").cast("double") / F.col("n"), 9).alias("mean_daily"),
        F.round(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("sx")),
            9,
        ).alias("dispersion_index"),
        (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
            > F.col("n") * F.col("sx")
        ).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Heaps' law vocabulary-growth curve.
# ---------------------------------------------------------------------------


@register(
    "vocab_growth_heaps",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    expl AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
        FROM expl GROUP BY doc_id
    ),
    firsts AS (
        SELECT MIN(doc_id) AS first_doc FROM expl GROUP BY tok
    ),
    new_v AS (
        SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS nv
        FROM firsts GROUP BY first_doc
    ),
    frame AS (
        SELECT p.doc_id, p.n_toks, COALESCE(v.nv, 0) AS nv
        FROM per_doc p LEFT JOIN new_v v USING (doc_id)
    )
    SELECT doc_id,
           CAST(SUM(n_toks) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(nv) OVER w AS BIGINT) AS cum_vocab
    FROM frame
    WINDOW w AS (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct-token
    count against cumulative token count, in doc_id order — the
    readout that says whether a corpus is still yielding new
    vocabulary or has saturated (V ≈ K·nᵝ; a flattening curve is the
    diminishing-returns signal corpus-expansion decisions read).
    "Distinct so far" is decomposed shuffle-friendly: each token type
    charges exactly its FIRST document (min(doc_id) per token — one
    vocabulary-frame hash agg), so cumulative vocab is a plain prefix
    SUM of per-doc first-occurrence counts — no running COUNT(DISTINCT)
    state anywhere.

    Scale: both cumulatives run through the range-partitioned
    distributed prefix sum (`warehouse._exact_cum` — repartitionByRange
    slices + per-slice window + ≤64-row offset frame), NOT a global
    single-partition window: the curve frame is corpus-sized (one row
    per doc), which is exactly the regime that helper exists for. The
    oracle states the same curve as two ordinary window sums."""
    from esther_apache_spark_spark.plans.warehouse import _exact_cum

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    expl = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    per_doc = expl.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    new_v = (
        expl.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    frame = per_doc.join(new_v, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("nv", F.lit(0)).alias("nv"),
    )
    cum_t = _exact_cum(frame.select("doc_id", "n_toks"), "doc_id", "n_toks")
    cum_v = _exact_cum(frame.select("doc_id", "nv"), "doc_id", "nv")
    return (
        cum_t.select("doc_id", F.col("cum").alias("cum_tokens"))
        .join(cum_v.select("doc_id", F.col("cum").alias("cum_vocab")), "doc_id")
    )


# ---------------------------------------------------------------------------
# Positional phrase search — the inverted index with positions.
# ---------------------------------------------------------------------------

_PHRASE = ("hash", "value")


@register(
    "phrase_search_positional",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE})
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(t)),
                    i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}'))
                AS BIGINT) AS n_matches
    FROM toks
    WHERE len(list_filter(range(1, len(t)),
              i -> t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}')) > 0
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search ("hash value") through a positional inverted
    index — the search-engine primitive bag-of-words retrieval (TF-IDF
    / BM25 entries) cannot express: posexplode yields (doc, token,
    position) postings; the phrase is an equi-join of the two terms'
    postings on doc AND consecutive positions (t2.pos = t1.pos + 1).
    Each term's posting list is filtered BEFORE the join, so the join
    touches only the two terms' postings — at corpus scale that is the
    document-frequency of the rarer term, not the corpus (the same
    asymmetry real inverted indexes exploit by intersecting shortest
    lists first). The oracle states the phrase as a per-doc adjacent-
    pair scan over the token array; counts are exact integers."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    postings = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "tok")
    )
    t1 = postings.filter(F.col("tok") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = postings.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("p2")
    )
    return (
        t1.join(t2, "doc_id")
        .filter(F.col("p2") == F.col("p1") + 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution — fractional credit, integer-exact.
# ---------------------------------------------------------------------------


@register(
    "attribution_linear_multitouch",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, event_type, epoch_us(ts) AS tus
        FROM events WHERE event_type IN ('view', 'click')
    ),
    paired AS (
        SELECT p.pid, p.cents, t.event_type,
               CAST(COUNT(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n,
               row_number() OVER (
                   PARTITION BY p.pid ORDER BY t.tus DESC, t.tid DESC
               ) AS rn
        FROM p JOIN t
          ON p.user_id = t.user_id
         AND t.tus < p.pus AND t.tus >= p.pus - 3600000000
    ),
    credited AS (
        SELECT event_type,
               (cents * 1000000) // n
               + CASE WHEN rn = 1
                      THEN cents * 1000000 - n * ((cents * 1000000) // n)
                      ELSE 0 END AS micro
        FROM paired
    )
    SELECT event_type AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CAST(micro AS HUGEINT)) AS BIGINT) AS credited_micro
    FROM credited GROUP BY event_type
    """,
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution — the fractional
    model `attribution_last_touch`'s docstring defers: every view/click
    in the hour before a purchase shares its value equally. The split
    is INTEGER-EXACT by construction: credits are micro-cents
    floor(cents·10⁶/n), with the division remainder assigned to the
    LAST touch (largest-remainder apportionment under the same
    (ts, event_id) total order the last-touch model uses) — so each
    purchase's credits sum to exactly cents·10⁶ and the rollup is an
    order-independent integer sum, where naive value/n doubles would
    drift by aggregation order and leak fractional cents.

    Scale shape: identical banded equi-join as last-touch; the added
    per-purchase COUNT and rank windows run over the touches-per-
    purchase-per-hour frame (bounded by user activity rate × window);
    micro sums ride DECIMAL(38,0) ≡ HUGEINT."""
    us = F.unix_micros(F.col("ts"))
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        us.alias("pus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"), "user_id", "event_type", us.alias("tus")
    )
    paired = p.join(
        t,
        (F.col("puser") == F.col("user_id"))
        & (F.col("tus") < F.col("pus"))
        & (F.col("tus") >= F.col("pus") - 3_600_000_000),
    )
    w_n = Window.partitionBy("pid")
    w_rn = Window.partitionBy("pid").orderBy(
        F.col("tus").desc(), F.col("tid").desc()
    )
    base = F.col("cents") * 1_000_000
    n = F.count(F.lit(1)).over(w_n)
    credited = paired.select(
        "event_type",
        (
            F.floor(base / n).cast("long")
            + F.when(
                F.row_number().over(w_rn) == 1,
                base - n * F.floor(base / n).cast("long"),
            ).otherwise(0)
        ).alias("micro"),
    )
    return credited.groupBy(F.col("event_type").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.col("micro").cast("decimal(38,0)")).cast("long").alias(
            "credited_micro"
        ),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA) — monotone probability calibration, pure SQL.
# ---------------------------------------------------------------------------

_ISO_TEMPLATE = """
    WITH bk AS (
        SELECT bucket,
               CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS pos
        FROM per_bucket GROUP BY bucket
    ),
    idx AS (
        SELECT bucket, n, pos,
               row_number() OVER (ORDER BY bucket) AS i
        FROM bk
    ),
    pre AS (
        SELECT i, bucket, n, pos,
               SUM(n) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
               SUM(pos) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               COUNT(*) OVER () AS n_all
        FROM idx
    ),
    pj AS (
        SELECT i AS j, {GEN} AS k FROM pre
    ),
    pairs AS (
        SELECT pj.j, pj.k,
               CAST(kk.cp - jj.cp + jj.pos AS DOUBLE)
                   / (kk.cn - jj.cn + jj.n) AS avgjk
        FROM pj
        JOIN pre jj ON jj.i = pj.j
        JOIN pre kk ON kk.i = pj.k
    ),
    m AS (
        SELECT j, k,
               MIN(avgjk) OVER (PARTITION BY j ORDER BY k DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mjk
        FROM pairs
    ),
    fit AS (
        SELECT k AS i,
               MAX(mjk) OVER (PARTITION BY k ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f,
               j
        FROM m
    )
    SELECT p.bucket, p.n, p.pos,
           CAST(ROUND(f.f, 9) AS DOUBLE) AS fit
    FROM fit f JOIN pre p ON f.i = p.i AND f.j = f.i
"""

# Pair expansion is a GENERATOR, not an inequality self-join: j <= k via
# explode/unnest of the integer range — the inequality-join form plans
# as a CartesianProduct, which the catalog hygiene gate rightly rejects
# even on this bounded frame.
_ISO_SPARK = _ISO_TEMPLATE.format(GEN="explode(sequence(i, n_all))")
_ISO_DUCK = _ISO_TEMPLATE.format(GEN="unnest(range(i, n_all + 1))")


@register(
    "isotonic_calibration_pava",
    oracle=(
        f"""
    WITH toks AS ({_TOKS_CTE}),
    {_QC_SCORE_CTES},
    base AS (SELECT doc_id, lang FROM documents WHERE text IS NOT NULL),
    sc AS (SELECT b.doc_id, COALESCE(sw / n, 0.0) AS score,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM base b LEFT JOIN agg USING (doc_id)),
    per_bucket AS (
        SELECT CAST(floor((score + 1) * 512) AS INT) AS bucket,
               COUNT(*) AS c, SUM(pos) AS p
        FROM sc GROUP BY 1
    )"""
        + _ISO_DUCK.replace("WITH bk AS", ", bk AS", 1)
    ),
)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of the linear quality classifier
    against the English label — the nonparametric monotone calibrator
    beside the binned reliability diagram (`classifier_calibration_bins`
    fixes bin edges; isotonic regression learns them). Computed NOT by
    the sequential pool-adjacent-violators sweep but by its closed
    minimax characterization iso(i) = max_{{j≤i}} min_{{k≥i}}
    mean(y[j..k]) — which turns the fit into three bounded relational
    passes: prefix sums over the score-bucket frame, the j≤k pair
    frame with interval means from prefix differences, a reverse
    running MIN per j, and a running MAX per k read on the diagonal.
    Pure SQL on BOTH engines — no UDF, no iteration, no state.

    Scale: every frame is bounded by the ≤1025-bucket model constant
    (pairs ≤ 1025²/2 ≈ 525k rows — independent of corpus size); the
    corpus appears only in the initial partial-aggregable bucket
    groupBy. Interval means are exact-integer prefix differences
    divided once; both engines compare identical doubles, so the
    min/max lattice picks identical values; the fit is rounded once at
    emission. Output is the monotone calibrated positive-rate per
    bucket (verifiably non-decreasing — the property test asserts it)."""
    from esther_apache_spark_spark.plans.evaluation import _classifier_scored

    sc = _classifier_scored(spark, sf_dir)
    per = sc.groupBy(
        F.floor((F.col("score") + F.lit(1.0)) * F.lit(512.0))
        .cast("int")
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p"))
    per.createOrReplaceTempView("per_bucket")
    return spark.sql(_ISO_SPARK)


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation — the optimizer's cardinality
# sketch, audited against the exact join size.
# ---------------------------------------------------------------------------

_CJ_W, _CJ_D = 1024, 4


def _cms_pages_sql(table: str, key: str, alias: str) -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS cms_row, "
        f"CAST(CAST(CONCAT('0x', substr(md5('cms{r}:' || "
        f"CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) % {_CJ_W} AS BIGINT) "
        f"AS cms_slot FROM {table}"
        for r in range(_CJ_D)
    )
    return (
        f"{alias} AS (SELECT cms_row, cms_slot, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM ({rows}) "
        f"GROUP BY cms_row, cms_slot)"
    )


@register(
    "cms_join_size_estimate",
    oracle=f"""
    WITH {_cms_pages_sql("orders", "o_custkey", "pa")},
    {_cms_pages_sql("events", "user_id", "pb")},
    dots AS (
        SELECT a.cms_row,
               SUM(CAST(a.cnt AS HUGEINT) * b.cnt) AS dot
        FROM pa a JOIN pb b
          ON a.cms_row = b.cms_row AND a.cms_slot = b.cms_slot
        GROUP BY a.cms_row
    ),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS join_est FROM dots),
    exact AS (
        SELECT CAST(SUM(CAST(oc.c AS HUGEINT) * ec.c) AS BIGINT)
               AS join_exact
        FROM (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1) oc
        JOIN (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1) ec
          ON oc.k = ec.k
    )
    SELECT join_exact, join_est,
           CAST(ROUND((CAST(join_est AS DOUBLE) - join_exact)
                      / join_exact, 9) AS DOUBLE) AS rel_err
    FROM exact, est
    """,
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from count-min sketches — the
    cost-based-optimizer primitive: |A ⋈ B on k| = Σ_k c_A(k)·c_B(k),
    estimated WITHOUT touching the keys jointly as min_r Σ_j
    cms_A[r][j]·cms_B[r][j] (the classic CMS inner-product bound — an
    OVERestimate whose error is bounded by ‖A‖₁‖B‖₁/width per row, with
    min-over-rows tightening it). Each side sketches independently in
    one partial-aggregable pass — exactly how an engine estimates a
    join between tables profiled at different times — and the sketch
    dot-product is a (row, slot) equi-join on 4×1024 counters,
    independent of data size. The exact Σ c_A·c_B twin rides along for
    the relative-error readout, like `ams_f2_selfjoin_estimate` and
    `ann_recall_audit` do for their estimators.

    Determinism: the repo's standard md5 CMS construction
    (`operators/sketches.cms_slot` — same salt scheme), integer
    counters, HUGEINT ≡ DECIMAL(38,0) products; rel_err is the single
    final float. The estimate is sound (≥ exact) by construction —
    the property test asserts it."""
    from esther_apache_spark_spark.operators import sketches as SK

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    pa = SK.cms_bucket_pages(
        orders, "o_custkey", [], width=_CJ_W, depth=_CJ_D, salt="cms"
    )
    pb = SK.cms_bucket_pages(
        events, "user_id", [], width=_CJ_W, depth=_CJ_D, salt="cms"
    )
    dots = (
        pa.alias("a")
        .join(
            pb.alias("b"),
            (F.col("a.cms_row") == F.col("b.cms_row"))
            & (F.col("a.cms_slot") == F.col("b.cms_slot")),
        )
        .groupBy("a.cms_row")
        .agg(
            F.sum(
                F.col("a.cms_cnt").cast(d38) * F.col("b.cms_cnt").cast(d38)
            ).alias("dot")
        )
    )
    est = dots.agg(F.min("dot").cast("long").alias("join_est"))
    oc = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    ec = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    exact = (
        oc.join(ec, "k")
        .agg(
            F.sum(F.col("ca").cast(d38) * F.col("cb").cast(d38))
            .cast("long")
            .alias("join_exact")
        )
    )
    return exact.crossJoin(est).select(
        "join_exact",
        "join_est",
        F.round(
            (F.col("join_est").cast("double") - F.col("join_exact"))
            / F.col("join_exact"),
            9,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitors: exact-integer KS statistic and PSI.
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"


@register(
    "ks_value_drift_by_type",
    oracle=f"""
    WITH pts AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN 1 ELSE 0 END AS e
        FROM events
    ),
    cum AS (
        SELECT event_type,
               SUM(e) OVER (PARTITION BY event_type ORDER BY value
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
               SUM(1 - e) OVER (PARTITION BY event_type ORDER BY value
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
               SUM(e) OVER (PARTITION BY event_type) AS n1,
               SUM(1 - e) OVER (PARTITION BY event_type) AS n2
        FROM pts
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n_early,
           CAST(MAX(n2) AS BIGINT) AS n_late,
           CAST(MAX(ABS(CAST(c1 AS HUGEINT) * n2
                        - CAST(c2 AS HUGEINT) * n1)) AS BIGINT)
               AS max_gap_scaled,
           ROUND(CAST(MAX(ABS(CAST(c1 AS HUGEINT) * n2
                              - CAST(c2 AS HUGEINT) * n1)) AS DOUBLE)
                 / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)), 9) AS ks_d
    FROM cum GROUP BY event_type
    """,
)
def ks_value_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event type —
    D = max_x |F_early(x) − F_late(x)| between the first and second half
    of the month — the distribution-shift alarm a feature store runs on
    every model input (PSI's rank-free sibling: KS needs no binning
    choice and is sensitive anywhere in the CDF, not just where bins
    land).

    The whole statistic is EXACT INTEGER until one final division: both
    empirical CDFs are cumulative counts over the per-type value order
    (RANGE frame so ties collapse to the post-tie count on both sides
    simultaneously — evaluating the gap only at distinct values, the
    textbook definition), and |F1 − F2| is compared as the
    cross-multiplied |c1·n2 − c2·n1| in DECIMAL(38,0)/HUGEINT, so the
    max is order- and ulp-free; ks_d divides once at the end.

    Scale shape: one Exchange partitioned by event_type, two running
    sums over a shared sort, then a partial-aggregable max. Same
    coarse-key caveat + per-day split-and-carry remedy as
    `peak_concurrency_by_type`."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "value",
        F.when(
            F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1
        ).otherwise(0).alias("e"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    d38 = "decimal(38,0)"
    cum = pts.select(
        "event_type",
        F.sum("e").over(wcum).alias("c1"),
        F.sum(F.lit(1) - F.col("e")).over(wcum).alias("c2"),
        F.sum("e").over(wall).alias("n1"),
        F.sum(F.lit(1) - F.col("e")).over(wall).alias("n2"),
    )
    gap = F.abs(
        F.col("c1").cast(d38) * F.col("n2") - F.col("c2").cast(d38) * F.col("n1")
    )
    return cum.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
        F.max(gap).cast("long").alias("max_gap_scaled"),
        F.round(
            F.max(gap).cast("double")
            / (F.max("n1").cast("double") * F.max("n2")),
            9,
        ).alias("ks_d"),
    )


_PSI_ORACLE = f"""
    WITH base AS (
        SELECT event_type,
               LEAST(CAST(FLOOR(value / 50.0) AS INT), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN 1 ELSE 0 END AS e
        FROM events
    ),
    cnt AS (
        SELECT event_type, bin,
               CAST(SUM(e) AS BIGINT) AS c1,
               CAST(SUM(1 - e) AS BIGINT) AS c2
        FROM base GROUP BY 1, 2
    ),
    grid AS (
        SELECT event_type, UNNEST(range(10)) AS bin
        FROM (SELECT DISTINCT event_type FROM cnt)
    ),
    filled AS (
        SELECT g.event_type, g.bin,
               COALESCE(c.c1, 0) AS c1, COALESCE(c.c2, 0) AS c2,
               SUM(COALESCE(c.c1, 0)) OVER (PARTITION BY g.event_type) AS n1,
               SUM(COALESCE(c.c2, 0)) OVER (PARTITION BY g.event_type) AS n2
        FROM grid g LEFT JOIN cnt c
          ON g.event_type = c.event_type AND g.bin = c.bin
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n_early,
           CAST(MAX(n2) AS BIGINT) AS n_late,
           ROUND(SUM(ROUND(
               ((CAST(c1 + 1 AS DOUBLE) / (n1 + 10))
                - (CAST(c2 + 1 AS DOUBLE) / (n2 + 10)))
               * LN((CAST(c1 + 1 AS DOUBLE) / (n1 + 10))
                    / (CAST(c2 + 1 AS DOUBLE) / (n2 + 10))), 9)), 6) AS psi
    FROM filled GROUP BY event_type
    """


def psi_from_bin_counts(cnt: DataFrame) -> DataFrame:
    """(event_type, bin, c1, c2) exact bin counts → per-type PSI: grid
    fill over the fixed 10-bin domain, add-one smoothing, per-term
    9-dp ln round. Shared by the batch query and its streaming twin —
    the counts frame is the ONLY thing the two paths compute
    differently."""
    grid = (
        cnt.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
        )
    )
    filled = grid.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    wall = Window.partitionBy("event_type")
    filled = filled.select(
        "event_type",
        "c1",
        "c2",
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    p = (F.col("c1") + 1).cast("double") / (F.col("n1") + 10)
    q = (F.col("c2") + 1).cast("double") / (F.col("n2") + 10)
    term = F.round((p - q) * F.log(p / q), 9)
    return filled.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
        F.round(F.sum(term), 6).alias("psi"),
    )


def psi_bin_expr():
    """The fixed 10-bin (50-wide, top-capped) value binning and the
    early/late split flag — shared with the streaming twin."""
    return (
        F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)).alias(
            "bin"
        ),
        F.when(
            F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1
        ).otherwise(0).alias("e"),
    )


@register("psi_value_drift_by_type", oracle=_PSI_ORACLE)
def psi_value_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type over the same
    early/late split as `ks_value_drift_by_type` — the risk-scorecard
    drift metric (PSI < 0.1 stable, > 0.25 action): Σ (p_b − q_b)·
    ln(p_b/q_b) over 10 FIXED value bins (50-wide, top-capped), with
    add-one smoothing so empty bins contribute finitely, and the bin
    grid generated explicitly so a bin absent on BOTH sides still
    enters the smoothed sum in both engines identically.

    Determinism: exact integer bin counts; each term's single ln is
    rounded to 9 dp (the repo's transcendental discipline); bin edges
    are fixed literals, not data-derived quantiles, so no circular
    dependence on a sampled statistic. Scale shape: one map-side-
    combinable hash aggregate to the |types|×10 frame; the grid
    fill, window totals and term sum all run on that model-constant
    frame."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", *psi_bin_expr())
    cnt = base.groupBy("event_type", "bin").agg(
        F.sum("e").alias("c1"), F.sum(F.lit(1) - F.col("e")).alias("c2")
    )
    return psi_from_bin_counts(cnt)


# ---------------------------------------------------------------------------
# PCA top component by power iteration — iterative linear algebra as
# relational frames, exactly replayed.
# ---------------------------------------------------------------------------

_PCA_Q = 10000.0       # per-dim quantization (same as embedding_dim_stats)
_PCA_VS = 1000000.0    # eigenvector iterate norm, micro-units
_PCA_ITERS = 32


def _pca_oracle() -> str:
    dim = 64
    head = f"""
    WITH qd AS (
        SELECT e.vec_id, CAST(r.range AS INT) AS j,
               CAST(FLOOR(CAST(e.embedding[CAST(r.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT) AS q
        FROM embeddings e CROSS JOIN range(1, {dim + 1}) r
    ),
    pr AS (
        SELECT CAST(r1.range AS INT) AS j, CAST(r2.range AS INT) AS k,
               CAST(FLOOR(CAST(e.embedding[CAST(r1.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT)
             * CAST(FLOOR(CAST(e.embedding[CAST(r2.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT) AS prod
        FROM embeddings e
        CROSS JOIN range(1, {dim + 1}) r1
        CROSS JOIN range(1, {dim + 1}) r2
    ),
    pp AS (SELECT j, k, SUM(prod) AS p FROM pr GROUP BY 1, 2),
    ss AS MATERIALIZED (SELECT j, SUM(q) AS s, COUNT(*) AS nv
                        FROM qd GROUP BY 1),
    cov AS MATERIALIZED (
        SELECT pp.j, pp.k, sa.nv * pp.p - sa.s * sb.s AS c
        FROM pp JOIN ss sa ON pp.j = sa.j JOIN ss sb ON pp.k = sb.j
    ),
    v0 AS (SELECT CAST(r.range AS INT) AS j,
                  CAST({int(_PCA_VS)} AS HUGEINT) AS v
           FROM range(1, {dim + 1}) r)"""
    its = []
    for i in range(1, _PCA_ITERS + 1):
        # AS MATERIALIZED is load-bearing: w{i} is referenced twice
        # (s{i} and v{i}); inlined CTEs would re-expand the whole prior
        # chain per reference — 2^iters blowup.
        its.append(f""",
    w{i} AS MATERIALIZED (SELECT cov.j, SUM(cov.c * v{i-1}.v) AS w
             FROM cov JOIN v{i-1} ON cov.k = v{i-1}.j GROUP BY 1),
    s{i} AS MATERIALIZED (SELECT SQRT(SUM(CAST(w AS DOUBLE)
                                          * CAST(w AS DOUBLE))) AS s
             FROM w{i}),
    v{i} AS MATERIALIZED (SELECT j,
                  CAST(FLOOR(CAST(w AS DOUBLE) / s * {_PCA_VS} + 0.5)
                       AS HUGEINT) AS v
             FROM w{i}, s{i})""")
    n = _PCA_ITERS
    tail = f""",
    wf AS MATERIALIZED (SELECT cov.j, SUM(cov.c * v{n}.v) AS w
           FROM cov JOIN v{n} ON cov.k = v{n}.j GROUP BY 1),
    ray AS (SELECT SUM(CAST(v{n}.v AS DOUBLE) * CAST(wf.w AS DOUBLE)) AS num,
                   SUM(CAST(v{n}.v AS DOUBLE) * CAST(v{n}.v AS DOUBLE)) AS den
            FROM v{n} JOIN wf ON v{n}.j = wf.j),
    tr AS (SELECT CAST(SUM(c) AS DOUBLE) AS trace_scat FROM cov WHERE j = k),
    nn AS (SELECT CAST(MAX(nv) AS BIGINT) AS n_vectors FROM ss)
    SELECT n_vectors,
           ROUND(num / den / (CAST(n_vectors AS DOUBLE) * n_vectors)
                 / {_PCA_Q * _PCA_Q}, 6) AS lambda1_var,
           ROUND(trace_scat / (CAST(n_vectors AS DOUBLE) * n_vectors)
                 / {_PCA_Q * _PCA_Q}, 6) AS trace_var,
           ROUND(num / den / trace_scat, 6) AS explained_var_ratio
    FROM ray, tr, nn"""
    return head + "".join(its) + tail


@register("embedding_pca_power_iter", oracle=_pca_oracle())
def embedding_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION — iterative linear algebra run as relational frames, the
    missing summary between `embedding_dim_stats` (per-dim variance)
    and `kmeans_lloyd_clusters` (cluster structure): lambda1_var is the
    variance along the dominant direction and explained_var_ratio =
    lambda1/trace says how one-dimensional the corpus is (the
    anisotropy/collapse alarm for an embedding pipeline — a ratio near
    1 means the encoder collapsed).

    Exactness discipline (`operators/clustering.py`'s, extended to an
    eigen-solver): vectors quantize once to 1e4-unit integers; the
    64x64 SCATTER matrix C = n.Sigma(xx^T) - ss^T accumulates as exact
    DECIMAL(38,0)/HUGEINT — the double posexplode emits (j, k, q_j.q_k)
    triples that partial-aggregate map-side, so the single data pass
    shuffles at most 4096 partial rows per partition and raw vectors
    never cross the wire. Each of the 6 unrolled iterations is an
    exact integer matvec w = C.v over the 4096-row model-constant
    frame (checkpointed once — the iterations never rescan data),
    renormalized to 1e6-unit integers through one IEEE sqrt+divide
    (correctly rounded in both engines) and re-quantized by
    floor(x+0.5), so Spark and the DuckDB CTE replay walk bit-identical
    iterates. The readout is the Rayleigh quotient v^T C v / v^T v —
    quadratically insensitive to the +-1-unit quantization wobble —
    divided once into variance units. It is a LOWER BOUND on lambda_1
    that converges as (lambda_2/lambda_1)^(2k); the synthetic corpus is
    deliberately near-isotropic (gap ~0.99), so 32 iterations land
    within a few percent — exactly the regime the collapse alarm cares
    about (a collapsed encoder has a huge gap and converges in 2-3
    rounds). For tighter estimates square the operator (C^2 halves the
    needed rounds; watch the DECIMAL(38,0) headroom) or hand off to a
    driver-side eigensolver on the collected 4096-entry scatter — a
    model constant, same boundary as kmeans' centroid collect.

    Scale: one Exchange of bounded scatter partials; 6 iterations of
    4096-row joins; 1-row normalization scalars (allowlisted). The
    HUGEINT/DECIMAL(38,0) headroom holds past 1e10 vectors at |x|<=3."""
    dim, q, vs = 64, _PCA_Q, _PCA_VS
    d38 = "decimal(38,0)"
    emb = load_table(spark, sf_dir, "embeddings")
    e1 = emb.select(
        F.col("embedding").alias("a"),
        F.posexplode("embedding").alias("j0", "xj"),
    )
    e2 = e1.select("j0", "xj", F.posexplode("a").alias("k0", "xk"))
    qj = F.floor(F.col("xj").cast("double") * q + 0.5).cast(d38)
    qk = F.floor(F.col("xk").cast("double") * q + 0.5).cast(d38)
    pp = (
        e2.select(
            (F.col("j0") + 1).alias("j"),
            (F.col("k0") + 1).alias("k"),
            (qj * qk).alias("prod"),
        )
        .groupBy("j", "k")
        .agg(F.sum("prod").alias("p"))
    )
    qcol = F.floor(F.col("xj").cast("double") * q + 0.5).cast(d38)
    ss = (
        e1.select((F.col("j0") + 1).alias("j"), qcol.alias("q"))
        .groupBy("j")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("nv"))
    )
    sa = ss.select(
        F.col("j").alias("sj"), F.col("s").alias("s_a"), F.col("nv").alias("nv")
    )
    sb = ss.select(F.col("j").alias("sk"), F.col("s").alias("s_b"))
    cov = (
        pp.join(sa, pp.j == sa.sj)
        .join(sb, pp.k == sb.sk)
        .select(
            "j",
            "k",
            (
                F.col("nv").cast(d38) * F.col("p")
                - F.col("s_a") * F.col("s_b")
            ).alias("c"),
            "nv",
        )
        # one data pass; iterations reuse the 4096-row model-constant
        # frame. repartition(1) first: every downstream iterate stage is
        # then a single task instead of 32 near-empty ones.
        .repartition(1)
        .localCheckpoint()
    )
    v = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("vj"), F.lit(int(vs)).cast(d38).alias("v")
    )
    for i in range(_PCA_ITERS):
        w = (
            cov.join(v, cov.k == v.vj)
            .groupBy("j")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        s = w.agg(
            F.sqrt(
                F.sum(F.col("w").cast("double") * F.col("w").cast("double"))
            ).alias("s")
        )
        v = w.crossJoin(s).select(
            F.col("j").alias("vj"),
            F.floor(F.col("w").cast("double") / F.col("s") * vs + 0.5)
            .cast(d38)
            .alias("v"),
        )
        if (i + 1) % 4 == 0 and i + 1 < _PCA_ITERS:
            # 64-row iterate: truncating the lineage every few rounds
            # keeps analysis cost linear in iterations (the pagerank /
            # connected-components discipline, plans/extensions.py:3203)
            v = v.repartition(1).localCheckpoint()
    wf = (
        cov.join(v, cov.k == v.vj)
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
    )
    ray = (
        v.join(wf, v.vj == wf.j)
        .agg(
            F.sum(F.col("v").cast("double") * F.col("w").cast("double")).alias(
                "num"
            ),
            F.sum(F.col("v").cast("double") * F.col("v").cast("double")).alias(
                "den"
            ),
        )
    )
    tr = cov.filter(F.col("j") == F.col("k")).agg(
        F.sum("c").cast("double").alias("trace_scat")
    )
    nn = ss.agg(F.max("nv").cast("long").alias("n_vectors"))
    nvd = F.col("n_vectors").cast("double")
    return (
        ray.crossJoin(tr)
        .crossJoin(nn)
        .select(
            "n_vectors",
            F.round(
                F.col("num") / F.col("den") / (nvd * nvd) / (q * q), 6
            ).alias("lambda1_var"),
            F.round(F.col("trace_scat") / (nvd * nvd) / (q * q), 6).alias(
                "trace_var"
            ),
            F.round(F.col("num") / F.col("den") / F.col("trace_scat"), 6).alias(
                "explained_var_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval — distribution-free coverage,
# exact-integer residual ranks.
# ---------------------------------------------------------------------------
@register(
    "conformal_interval_value_by_type",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               event_id % 2 = 0 AS is_cal
        FROM events
    ),
    cal AS (
        SELECT event_type,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM base WHERE is_cal GROUP BY 1
    ),
    resid AS (
        SELECT b.event_type,
               ABS(CAST(b.cents AS HUGEINT) * c.n_cal - c.s) AS r,
               b.event_id
        FROM base b JOIN cal c ON b.event_type = c.event_type
        WHERE b.is_cal
    ),
    ranked AS (
        SELECT event_type, r,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY r, event_id) AS rn
        FROM resid
    ),
    qhat AS (
        SELECT rk.event_type, rk.r AS q_scaled, c.n_cal, c.s
        FROM ranked rk JOIN cal c ON rk.event_type = c.event_type
        WHERE rk.rn = LEAST(CAST(CEIL((c.n_cal + 1) * 0.9) AS BIGINT),
                            c.n_cal)
    ),
    test AS (
        SELECT b.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN ABS(CAST(b.cents AS HUGEINT) * q.n_cal
                                      - q.s) <= q.q_scaled
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM base b JOIN qhat q ON b.event_type = q.event_type
        WHERE NOT b.is_cal
        GROUP BY 1
    )
    SELECT q.event_type, q.n_cal, t.n_test,
           ROUND(CAST(q.q_scaled AS DOUBLE) / q.n_cal / 100.0, 4)
               AS qhat_value,
           ROUND(CAST(t.covered AS DOUBLE) / t.n_test, 6) AS coverage
    FROM qhat q JOIN test t ON q.event_type = t.event_type
    """,
)
def conformal_interval_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval per event type — the
    distribution-free uncertainty wrapper every deployed predictor
    should ship with: calibrate on the even-event_id half (point
    predictor = per-type calibration mean), take the ceil((n+1)·0.9)-th
    smallest absolute residual as the interval half-width q-hat
    (clamped to the max residual when a calibration set is smaller than
    9 — the finite-sample rank would otherwise exceed n and silently
    drop the type), then
    AUDIT the guaranteed >=90% marginal coverage on the held-out odd
    half. The conformal guarantee is finite-sample and assumption-free
    (Vovk; Angelopoulos & Bates 2021) — exactly what a 100 TB feature
    store can promise without distributional modeling.

    Exactness: the residual |y - mean| is kept as the cross-multiplied
    integer |y·n_cal − Σy_cal| (the `ks_value_drift_by_type` trick), so
    the rank statistic, the quantile pick (row_number with an event_id
    tiebreak) and the coverage comparison are all exact integer
    arithmetic — floats appear only in the two final readout divisions.

    Scale: one Exchange by event_type for the residual rank (same
    coarse-key caveat as the other per-type sequential ops), the
    calibration aggregate is map-combinable, and the q-hat frame is one
    row per type joined back broadcast-style."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        (dec2("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % 2 == 0).alias("is_cal"),
    )
    cal = (
        base.filter("is_cal")
        .groupBy("event_type")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n_cal"))
    )
    d38 = "decimal(38,0)"
    resid = (
        base.filter("is_cal")
        .join(cal, "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(
                F.col("cents").cast(d38) * F.col("n_cal") - F.col("s")
            ).alias("r"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("r", "event_id")
    )
    qhat = (
        resid.withColumn("rn", rn)
        .join(cal, "event_type")
        .filter(
            F.col("rn")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * 0.9).cast("long"),
                F.col("n_cal"),
            )
        )
        .select("event_type", F.col("r").alias("q_scaled"), "n_cal", "s")
    )
    test = (
        base.filter(~F.col("is_cal"))
        .join(qhat, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(
                        F.col("cents").cast(d38) * F.col("n_cal")
                        - F.col("s")
                    )
                    <= F.col("q_scaled"),
                    1,
                ).otherwise(0)
            ).alias("covered"),
        )
    )
    return qhat.join(test, "event_type").select(
        "event_type",
        "n_cal",
        "n_test",
        F.round(
            F.col("q_scaled").cast("double") / F.col("n_cal") / 100.0, 4
        ).alias("qhat_value"),
        F.round(F.col("covered").cast("double") / F.col("n_test"), 6).alias(
            "coverage"
        ),
    )


@register("streaming_psi_drift", oracle=_PSI_ORACLE)
def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`psi_value_drift_by_type` with its count state maintained by
    Structured Streaming: the events file-stream feeds the binned
    integer histogram (complete-mode agg — the state is one row per
    (type, bin), bounded by the model constant), and the PSI readout
    runs on the final counts. Matching the batch oracle bit-for-bit
    proves the monitor can run continuously with no semantic drift
    from its batch definition."""
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_psi_bin_counts,
    )

    # localCheckpoint: the counts frame is <= |types|x10 rows, and the
    # fresh lineage sidesteps the memory-sink self-reference conflict
    # in the grid-fill left join
    cnt = run_streaming_psi_bin_counts(spark, sf_dir).localCheckpoint()
    return psi_from_bin_counts(cnt)


# ---------------------------------------------------------------------------
# CUPED variance reduction — the experimentation platform's pre-period
# covariate adjustment, exact to the last integer.
# ---------------------------------------------------------------------------
@register(
    "cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM per_user
    )
    SELECT n AS n_users,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS theta,
           ROUND((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * n) / 10000.0, 4) AS var_y,
           ROUND(((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 / (CAST(n AS DOUBLE) * n) / 10000.0, 4) AS var_adj,
           ROUND(100.0
                 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 4) AS var_reduction_pct
    FROM s
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. 2013) — the variance-reduction step every mature A/B platform
    applies before reading an experiment: adjust each user's metric by
    their PRE-period behavior, y' = y − θ(x − x̄) with θ = cov(x,y)/
    var(x), and the metric variance drops by exactly ρ²·100% — smaller
    confidence intervals from the same traffic. Here x = a user's value
    before the split date, y = after (the `ks_value_drift_by_type`
    split), both from ONE conditional-sum pass — no pre/post join, and
    users absent from the pre-period enter naturally with x = 0.

    Exactness: per-user (x, y) in integer cents; n, Σx, Σy, Σx², Σy²,
    Σxy as exact HUGEINT/DECIMAL(38,0) sums; θ, var_y, var_adj and the
    reduction are closed-form expressions over those six exact scalars
    — cross-multiplied (n·Σxy − ΣxΣy form) so no mean is ever
    subtracted row-wise, and every division happens once, on identical
    inputs, in the final projection.

    Scale: one map-combinable hash aggregate to users, one to six
    scalars. The x² sums hold exact past 1e9 users at 1e6-cent
    pre-period totals."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cents = (dec2("value") * 100).cast("long")
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    nd = n.cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_num = n * sxy - sx * sy
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    return s.select(
        n.alias("n_users"),
        F.round(cov_num / varx_num, 6).alias("theta"),
        F.round(vary_num / (nd * n) / 10000.0, 4).alias("var_y"),
        F.round(
            (vary_num - cov_num * cov_num / varx_num) / (nd * n) / 10000.0, 4
        ).alias("var_adj"),
        F.round(
            100.0 * cov_num * cov_num / (varx_num * vary_num), 4
        ).alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# Rank statistics: Mann–Whitney U drift test and Spearman correlation,
# both on exact doubled midranks.
# ---------------------------------------------------------------------------
@register(
    "mann_whitney_value_drift",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN 1 ELSE 0 END AS e
        FROM events
    ),
    r AS (
        SELECT event_type, e,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY event_type, cents) - 1
                   AS mr2
        FROM base
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(e) AS BIGINT) AS n1,
               CAST(SUM(1 - e) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN e = 1 THEN CAST(mr2 AS HUGEINT)
                             ELSE 0 END) AS HUGEINT) AS r1_2
        FROM r GROUP BY 1
    )
    SELECT event_type, n1 AS n_early, n2 AS n_late,
           ROUND((CAST(r1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0
                 / 100.0, 4) AS u_stat_h,
           ROUND(((CAST(r1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS auc_effect
    FROM agg
    """,
)
def mann_whitney_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the early and late halves of each event
    type's value distribution — the NONPARAMETRIC drift test completing
    the monitor family (`ks_value_drift_by_type` sees any CDF gap, PSI
    sees binned mass moves; U/AUC answers the directional question "did
    values stochastically INCREASE?"). The normalized U/(n1·n2) is
    exactly P(early > late) + P(tie)/2 — the common-language AUC effect
    size.

    Tie handling is the textbook midrank, kept EXACT by doubling:
    mr2 = 2·rank_min + tie_count − 1 is always an integer, so rank sums
    are exact HUGEINT/DECIMAL and the single halving happens in the
    final readout division. One partitioned ordered pass computes both
    window quantities over a shared sort; the aggregate is
    map-combinable. u_stat_h is reported in value units (÷100 cents)."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    base = ev.select(
        "event_type",
        (dec2("value") * 100).cast("long").alias("cents"),
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("e"),
    )
    mr2 = (
        2 * F.rank().over(Window.partitionBy("event_type").orderBy("cents"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "cents"))
        - 1
    )
    r = base.select("event_type", "e", mr2.alias("mr2"))
    agg = r.groupBy("event_type").agg(
        F.sum("e").alias("n1"),
        F.sum(F.lit(1) - F.col("e")).alias("n2"),
        F.sum(
            F.when(F.col("e") == 1, F.col("mr2").cast(d38)).otherwise(
                F.lit(0).cast(d38)
            )
        ).alias("r1_2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    u2 = F.col("r1_2").cast("double") - n1d * (F.col("n1") + 1)
    return agg.select(
        "event_type",
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.round(u2 / 2.0 / 100.0, 4).alias("u_stat_h"),
        F.round((u2 / 2.0) / (n1d * n2d), 6).alias("auc_effect"),
    )


@register(
    "spearman_value_time_by_type",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               epoch_us(ts) AS t
        FROM events
    ),
    r AS (
        SELECT event_type,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS rx,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY t)
               + COUNT(*) OVER (PARTITION BY event_type, t) - 1 AS ry
        FROM base
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
               CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
               CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
        FROM r GROUP BY 1
    )
    SELECT event_type, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS spearman_rho
    FROM s
    """,
)
def spearman_value_time_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between value and time per event type
    — the monotone-trend detector that complements `correlation`'s
    Pearson (linear only) and `mannkendall_trend_by_type`'s sign test:
    ρ_s is Pearson computed on midranks, so it sees ANY monotone drift
    regardless of shape, robust to outliers.

    Exactness: both variables' tie-midranks are the doubled-integer
    mr2 = 2·rank_min + ties − 1 (no half ever materializes); the five
    rank-moment sums are exact HUGEINT/DECIMAL; ρ is the single
    cross-multiplied expression n·Σxy − ΣxΣy over the exact scalars
    with two IEEE sqrts at the end — identical in both engines. The
    doubling cancels algebraically in ρ, so no rescale is needed.

    Scale: two rank windows sharing one per-type Exchange (value order
    and time order each need their own sort of the same partition),
    then a map-combinable six-scalar aggregate. Σr² ≤ 4n³ holds exact
    past 1e9 rows/type in the 38-digit domain."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    base = ev.select(
        "event_type",
        (dec2("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t"),
    )
    rx = (
        2 * F.rank().over(Window.partitionBy("event_type").orderBy("cents"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "cents"))
        - 1
    )
    ry = (
        2 * F.rank().over(Window.partitionBy("event_type").orderBy("t"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "t"))
        - 1
    )
    r = base.select("event_type", rx.alias("rx"), ry.alias("ry"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx").cast(d38)).alias("sx"),
        F.sum(F.col("ry").cast(d38)).alias("sy"),
        F.sum(F.col("rx").cast(d38) * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry").cast(d38) * F.col("ry")).alias("syy"),
        F.sum(F.col("rx").cast(d38) * F.col("ry")).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    rho = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select("event_type", "n", F.round(rho, 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Ridge regression by exact normal equations — a trained multi-feature
# linear model with no float until the three final divisions.
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 100


@register(
    "ridge_daily_revenue_trend",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS i,
               CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS w,
               CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS a11,
               CAST(SUM(i) AS HUGEINT) AS a12,
               CAST(SUM(w) AS HUGEINT) AS a13,
               CAST(SUM(i * i) + {_RIDGE_LAMBDA} AS HUGEINT) AS a22,
               CAST(SUM(i * w) AS HUGEINT) AS a23,
               CAST(SUM(w * w) + {_RIDGE_LAMBDA} AS HUGEINT) AS a33,
               CAST(SUM(y) AS HUGEINT) AS b1,
               CAST(SUM(i * y) AS HUGEINT) AS b2,
               CAST(SUM(w * y) AS HUGEINT) AS b3
        FROM daily
    ),
    d AS (
        SELECT a11 * (a22 * a33 - a23 * a23)
             - a12 * (a12 * a33 - a23 * a13)
             + a13 * (a12 * a23 - a22 * a13) AS det,
               b1 * (a22 * a33 - a23 * a23)
             - a12 * (b2 * a33 - a23 * b3)
             + a13 * (b2 * a23 - a22 * b3) AS det0,
               a11 * (b2 * a33 - b3 * a23)
             - b1 * (a12 * a33 - a23 * a13)
             + a13 * (a12 * b3 - b2 * a13) AS det1,
               a11 * (a22 * b3 - a23 * b2)
             - a12 * (a12 * b3 - b2 * a13)
             + b1 * (a12 * a23 - a22 * a13) AS det2,
               a11
        FROM m
    )
    SELECT CAST(a11 AS BIGINT) AS n_days,
           CAST({_RIDGE_LAMBDA} AS BIGINT) AS lam,
           ROUND(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 4)
               AS intercept,
           ROUND(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 4)
               AS slope_per_day,
           ROUND(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 4)
               AS weekend_effect
    FROM d
    """,
)
def ridge_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression of daily revenue on (day index, weekend flag) —
    a multi-feature linear model TRAINED relationally with no float
    anywhere in the fit: the 3×3 normal equations (XᵀX + λ·diag(0,1,1))
    β = Xᵀy are assembled from exact integer moment sums (the intercept
    is unpenalized, per the standard), and Cramer's rule expands the
    four 3×3 determinants in exact HUGEINT/DECIMAL(38,0) — β materializes
    as three single divisions of exact integers. Extends
    `ols_daily_trend_by_type` (one regressor, λ=0) to the regularized
    multi-feature case — the smallest honest example of the normal-
    equation pattern that scales to any fixed feature set (the Gram
    matrix is feature²-bounded, never data-sized).

    Scale: one map-combinable aggregate to the day grain, one to nine
    scalars — the time axis bounds the day frame at ANY corpus size,
    and determinant products stay within 38 digits past ten years of
    days at 1e9-cent daily revenue."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    daily = (
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("i"),
            F.when(F.expr("weekday(ts)") + 1 >= 6, 1).otherwise(0).alias("w"),
        ).agg((F.sum(dec2("value")) * 100).cast("long").alias("y"))
    )
    c = lambda col: col.cast(d38)  # noqa: E731
    m = daily.agg(
        c(F.count(F.lit(1))).alias("a11"),
        c(F.sum("i")).alias("a12"),
        c(F.sum("w")).alias("a13"),
        c(F.sum(F.col("i") * F.col("i")) + _RIDGE_LAMBDA).alias("a22"),
        c(F.sum(F.col("i") * F.col("w"))).alias("a23"),
        c(F.sum(F.col("w") * F.col("w")) + _RIDGE_LAMBDA).alias("a33"),
        c(F.sum("y")).alias("b1"),
        c(F.sum(F.col("i") * F.col("y"))).alias("b2"),
        c(F.sum(F.col("w") * F.col("y"))).alias("b3"),
    )
    a11, a12, a13 = F.col("a11"), F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - b3 * a23)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - a23 * b2)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    dd = det.cast("double")
    return m.select(
        a11.cast("long").alias("n_days"),
        F.lit(_RIDGE_LAMBDA).cast("long").alias("lam"),
        F.round(det0.cast("double") / dd / 100.0, 4).alias("intercept"),
        F.round(det1.cast("double") / dd / 100.0, 4).alias("slope_per_day"),
        F.round(det2.cast("double") / dd / 100.0, 4).alias("weekend_effect"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences — the 2×2 experimentation estimator.
# ---------------------------------------------------------------------------
@register(
    "did_estimator_value",
    oracle=f"""
    WITH cells AS (
        SELECT user_id % 2 AS cohort,
               CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}'
                    THEN 1 ELSE 0 END AS post,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    agg AS (
        SELECT cohort, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s
        FROM cells GROUP BY 1, 2
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN cohort = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS a_pre,
            MAX(CASE WHEN cohort = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS a_post,
            MAX(CASE WHEN cohort = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS b_pre,
            MAX(CASE WHEN cohort = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS b_post,
            CAST(SUM(n) AS BIGINT) AS n_events
        FROM agg
    )
    SELECT n_events,
           ROUND(a_pre / 100.0, 4) AS mean_a_pre,
           ROUND(a_post / 100.0, 4) AS mean_a_post,
           ROUND(b_pre / 100.0, 4) AS mean_b_pre,
           ROUND(b_post / 100.0, 4) AS mean_b_post,
           ROUND(((b_post - b_pre) - (a_post - a_pre)) / 100.0, 4) AS did
    FROM wide
    """,
)
def did_estimator_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the 2×2 (cohort × pre/post) grid
    — the quasi-experimental estimator for rollouts WITHOUT a clean
    randomized holdout: the control cohort's pre→post movement nets out
    the secular trend, DiD = (B_post − B_pre) − (A_post − A_pre). Pairs
    with `cuped_variance_reduction` (randomized case) and
    `ab_test_purchase_lift` (plain lift) to complete the
    experimentation-readout family. Cohort = user_id % 2, period = the
    standard drift split date.

    Exactness: one conditional hash aggregate to four exact (n, Σcents)
    cells; each cell mean is a single double division of exact
    integers, and the DiD combination is one fixed expression on those
    four identical doubles. Scale: entirely map-combinable — the only
    shuffled relation is the 4-row cell frame."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cells = ev.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.when(
            F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        (dec2("value") * 100).cast("long").alias("cents"),
    )
    agg = cells.groupBy("cohort", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n")

    def cell(c: int, p: int):
        return F.max(
            F.when((F.col("cohort") == c) & (F.col("post") == p), mean)
        )

    wide = agg.agg(
        cell(0, 0).alias("a_pre"),
        cell(0, 1).alias("a_post"),
        cell(1, 0).alias("b_pre"),
        cell(1, 1).alias("b_post"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return wide.select(
        "n_events",
        F.round(F.col("a_pre") / 100.0, 4).alias("mean_a_pre"),
        F.round(F.col("a_post") / 100.0, 4).alias("mean_a_post"),
        F.round(F.col("b_pre") / 100.0, 4).alias("mean_b_pre"),
        F.round(F.col("b_post") / 100.0, 4).alias("mean_b_post"),
        F.round(
            (
                (F.col("b_post") - F.col("b_pre"))
                - (F.col("a_post") - F.col("a_pre"))
            )
            / 100.0,
            4,
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Log-rank test — two-cohort survival comparison on exact risk tables.
# ---------------------------------------------------------------------------
@register(
    "logrank_churn_by_cohort",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(ts) AS mx FROM events),
    cohort AS (
        SELECT p.user_id % 2 AS g,
               CAST(date_diff('day', CAST(p.first_ts AS DATE),
                              CAST(p.last_ts AS DATE)) AS BIGINT) AS dur,
               CASE WHEN p.last_ts < h.mx - INTERVAL {_KM_CHURN_HOURS} HOUR
                    THEN 1 ELSE 0 END AS churned
        FROM per_user p, horizon h
    ),
    freq AS (
        SELECT dur,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN g = 0 THEN churned ELSE 0 END) AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
               CAST(SUM(CASE WHEN g = 1 THEN churned ELSE 0 END) AS BIGINT) AS d2
        FROM cohort GROUP BY dur
    ),
    risk AS (
        SELECT dur, d1, d2,
               SUM(c1) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
               SUM(c2) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n2
        FROM freq
    ),
    terms AS (
        SELECT d1, d1 + d2 AS dt, n1, n2, n1 + n2 AS nt
        FROM risk WHERE d1 + d2 > 0
    ),
    s AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               ROUND(SUM(ROUND(CAST(CAST(dt AS HUGEINT) * n1 AS DOUBLE)
                               / nt, 9)), 6) AS e1,
               ROUND(SUM(CASE WHEN nt > 1 THEN ROUND(
                   CAST(CAST(dt AS HUGEINT) * n1 * n2 * (nt - dt) AS DOUBLE)
                   / (CAST(nt AS DOUBLE) * nt * (nt - 1)), 9)
                   ELSE 0.0 END), 6) AS v
        FROM terms
    )
    SELECT o1 AS observed_g0, e1 AS expected_g0,
           ROUND((o1 - e1) * (o1 - e1) / v, 6) AS chi2_logrank
    FROM s
    """,
)
def logrank_churn_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two user cohorts' churn survival
    curves — the hypothesis test `survival_km_curve` (same duration and
    12-hour-churn conventions) visualizes: at every event time the
    observed cohort-0 events d1 are compared to the expectation
    dt·n1/nt under the null of equal hazards, chi2 = (O−E)²/V with the
    hypergeometric variance V = Σ dt·n1·n2·(nt−dt)/(nt²(nt−1)). The
    standard A/B readout for retention experiments, where means lie
    and censoring is the norm.

    Exactness: risk-set sizes n1/n2 are exact descending cumulative
    sums over the shared duration frame (zero-event durations included,
    so the risk sets deplete identically in both engines); every E and
    V term's integer numerator is formed in HUGEINT/DECIMAL before its
    single division, rounded once at 9 dp; the nt=1 variance guard is
    an explicit CASE, not an engine-specific 0/0 convention. Scale:
    everything after the per-user aggregate runs on the duration frame
    — calendar-bounded at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    cohort = per_user.crossJoin(horizon).select(
        (F.col("user_id") % 2).alias("g"),
        F.datediff(
            F.col("last_ts").cast("date"), F.col("first_ts").cast("date")
        ).cast("long").alias("dur"),
        F.when(
            F.col("last_ts")
            < F.col("mx") - F.expr(f"INTERVAL {_KM_CHURN_HOURS} HOURS"),
            1,
        ).otherwise(0).alias("churned"),
    )
    freq = cohort.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 0, F.col("churned")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("g") == 1, F.col("churned")).otherwise(0)).alias("d2"),
    )
    wdesc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = freq.select(
        "dur",
        "d1",
        "d2",
        F.sum("c1").over(wdesc).alias("n1"),
        F.sum("c2").over(wdesc).alias("n2"),
    )
    terms = risk.filter(F.col("d1") + F.col("d2") > 0).select(
        "d1",
        (F.col("d1") + F.col("d2")).alias("dt"),
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("nt"),
    )
    e_term = F.round(
        (F.col("dt").cast(d38) * F.col("n1")).cast("double") / F.col("nt"), 9
    )
    v_term = F.when(
        F.col("nt") > 1,
        F.round(
            (
                F.col("dt").cast(d38)
                * F.col("n1")
                * F.col("n2")
                * (F.col("nt") - F.col("dt"))
            ).cast("double")
            / (
                F.col("nt").cast("double")
                * F.col("nt")
                * (F.col("nt") - 1)
            ),
            9,
        ),
    ).otherwise(F.lit(0.0))
    s = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.round(F.sum(e_term), 6).alias("e1"),
        F.round(F.sum(v_term), 6).alias("v"),
    )
    return s.select(
        F.col("o1").alias("observed_g0"),
        F.col("e1").alias("expected_g0"),
        F.round(
            (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1"))
            / F.col("v"),
            6,
        ).alias("chi2_logrank"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate — how predictable is the behavioral sequence.
# ---------------------------------------------------------------------------
@register(
    "markov_entropy_rate_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT from_type, to_type, n,
               SUM(n) OVER (PARTITION BY from_type) AS row_tot,
               SUM(n) OVER () AS grand
        FROM pairs
    ),
    terms AS (
        SELECT ROUND(-(CAST(n AS DOUBLE) / grand)
                     * LN(CAST(n AS DOUBLE) / row_tot), 9) AS h_cond,
               ROUND(-(CAST(n AS DOUBLE) / grand)
                     * LN(CAST(n AS DOUBLE) / grand), 9) AS h_joint
        FROM tot
    )
    SELECT ROUND(SUM(h_cond), 6) AS entropy_rate_nats,
           ROUND(SUM(h_cond) / LN(2.0), 6) AS entropy_rate_bits,
           ROUND(SUM(h_joint), 6) AS joint_entropy_nats
    FROM terms
    """,
)
def markov_entropy_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event Markov chain — ONE number
    for "how predictable is user behavior": H = −Σ_{ij} π̂_ij ln p(j|i),
    with the stationary weights π̂ taken empirically from the observed
    transition mass (exactly the plug-in estimator; the conditional
    probabilities are `event_transition_matrix`'s). Low entropy = users
    follow rails (view→click→purchase); high = noise — THE summary a
    personalization team tracks per release to see whether a UI change
    made behavior more or less deterministic. The joint entropy of the
    pair distribution rides along (H_joint = H_rate + H(π) by the chain
    rule — a cheap internal consistency probe for tests).

    Determinism: the transition-count frame is exact integers (lead()
    over the per-user (ts, event_id) total order); each −π ln p term is
    rounded once at 9 dp over the |types|²-bounded frame. Scale: one
    windowed pass per user partition, one hash aggregate to ≤|types|²
    rows — everything downstream is model-constant."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.select(
        "n",
        F.sum("n").over(Window.partitionBy("from_type")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy()).alias("grand"),
    )
    nd = F.col("n").cast("double")
    h_cond = F.round(
        -(nd / F.col("grand")) * F.log(nd / F.col("row_tot")), 9
    )
    h_joint = F.round(
        -(nd / F.col("grand")) * F.log(nd / F.col("grand")), 9
    )
    return tot.select(
        h_cond.alias("h_cond"), h_joint.alias("h_joint")
    ).agg(
        F.round(F.sum("h_cond"), 6).alias("entropy_rate_nats"),
        F.round(F.sum("h_cond") / F.log(F.lit(2.0)), 6).alias(
            "entropy_rate_bits"
        ),
        F.round(F.sum("h_joint"), 6).alias("joint_entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Welch's t and the MDE sample-size planner — the parametric side of
# the experimentation toolkit.
# ---------------------------------------------------------------------------
@register(
    "welch_t_value_by_cohort",
    oracle="""
    WITH cells AS (
        SELECT user_id % 2 AS g,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT g,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
        FROM cells GROUP BY 1
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN g = 0 THEN n END) AS n0,
            MAX(CASE WHEN g = 0 THEN CAST(s AS DOUBLE) END) AS s0,
            MAX(CASE WHEN g = 0 THEN CAST(ss AS DOUBLE) END) AS ss0,
            MAX(CASE WHEN g = 1 THEN n END) AS n1,
            MAX(CASE WHEN g = 1 THEN CAST(s AS DOUBLE) END) AS s1,
            MAX(CASE WHEN g = 1 THEN CAST(ss AS DOUBLE) END) AS ss1
        FROM m
    ),
    v AS (
        SELECT n0, n1,
               (s0 / n0 - s1 / n1) AS md,
               (ss0 - s0 * s0 / n0) / (n0 - 1) / n0 AS se0,
               (ss1 - s1 * s1 / n1) / (n1 - 1) / n1 AS se1
        FROM wide
    )
    SELECT CAST(n0 AS BIGINT) AS n_g0, CAST(n1 AS BIGINT) AS n_g1,
           ROUND(md / 100.0, 4) AS mean_diff,
           ROUND(md / SQRT(se0 + se1), 6) AS t_welch,
           ROUND((se0 + se1) * (se0 + se1)
                 / (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)), 4)
               AS df_welch
    FROM v
    """,
)
def welch_t_value_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic between the two user-hash
    cohorts — the parametric counterpart of `mann_whitney_value_drift`
    and the significance readout `did_estimator_value` stops short of,
    with the Welch–Satterthwaite effective degrees of freedom (never
    assume pooled variance on production metrics; revenue-style values
    are heteroscedastic by construction).

    Exactness: per-cohort (n, Σy, Σy²) are exact HUGEINT/DECIMAL sums
    from one conditional aggregate; every derived quantity (mean diff,
    the two squared standard errors, t, df) is a fixed closed-form
    double expression over those six exact scalars — each division
    appears once, identically in both engines. Scale: fully
    map-combinable, 2-row intermediate."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cells = ev.select(
        (F.col("user_id") % 2).alias("g"),
        (dec2("value") * 100).cast("long").alias("cents"),
    )
    m = cells.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("ss"),
    )

    def cell(g: int, col: str, as_double: bool = True):
        c = F.col(col).cast("double") if as_double else F.col(col)
        return F.max(F.when(F.col("g") == g, c))

    wide = m.agg(
        cell(0, "n", False).alias("n0"),
        cell(0, "s").alias("s0"),
        cell(0, "ss").alias("ss0"),
        cell(1, "n", False).alias("n1"),
        cell(1, "s").alias("s1"),
        cell(1, "ss").alias("ss1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    md = F.col("s0") / n0 - F.col("s1") / n1
    se0 = (F.col("ss0") - F.col("s0") * F.col("s0") / n0) / (n0 - 1) / n0
    se1 = (F.col("ss1") - F.col("s1") * F.col("s1") / n1) / (n1 - 1) / n1
    return wide.select(
        n0.cast("long").alias("n_g0"),
        n1.cast("long").alias("n_g1"),
        F.round(md / 100.0, 4).alias("mean_diff"),
        F.round(md / F.sqrt(se0 + se1), 6).alias("t_welch"),
        F.round(
            (se0 + se1) * (se0 + se1)
            / (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)),
            4,
        ).alias("df_welch"),
    )


@register(
    "mde_sample_size_plan",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS HUGEINT) AS s,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                  AS BIGINT) AS HUGEINT)
                        * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS HUGEINT) AS ss
        FROM events GROUP BY 1
    ),
    v AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS mean_c,
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                   / (n - 1) AS var_c
        FROM m
    )
    SELECT event_type, n AS n_observed,
           ROUND(mean_c / 100.0, 4) AS mean_value,
           ROUND(SQRT(var_c) / 100.0, 4) AS sd_value,
           CAST(CEIL(15.69775702445
                     * var_c / (0.05 * mean_c * 0.05 * mean_c))
                AS BIGINT) AS n_per_arm_5pct_mde
    FROM v
    """,
)
def mde_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planner per event type: the users-per-arm
    needed to detect a 5% relative change in mean value at alpha = 0.05
    / 80% power — n = 2(z_{0.975}+z_{0.8})² sigma²/delta², the
    calculation every experimentation platform runs BEFORE an A/B test
    to say how long it must collect (pairs with
    `welch_t_value_by_cohort`, the test run after). The whole z-factor
    2·(z_{0.975}+z_{0.8})² = 2·(1.959964+0.841621)² is ONE precomputed
    decimal literal, 15.69775702445, identical in both engines (ADVICE
    r06: letting each engine multiply the z literals itself left Spark
    with Python-double products and DuckDB with exact-DECIMAL ones —
    a last-ulp divergence that CEIL can amplify to an off-by-one n) —
    and no inverse-normal ever executes in either engine.

    Exactness: per-type (n, Σy, Σy²) exact; mean, sample variance and
    the plan n are one fixed expression over them, ceil'd identically.
    Scale: one map-combinable aggregate to |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cents = (dec2("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents.cast(d38)).alias("s"),
        F.sum(cents.cast(d38) * cents).alias("ss"),
    )
    nd = F.col("n")
    sd, ssd = F.col("s").cast("double"), F.col("ss").cast("double")
    mean_c = sd / nd
    var_c = (ssd - sd * sd / nd) / (nd - 1)
    # 2*(z_0.975 + z_0.8)^2 as ONE shared decimal literal (see docstring)
    z_factor = 15.69775702445
    return m.select(
        "event_type",
        nd.alias("n_observed"),
        F.round(mean_c / 100.0, 4).alias("mean_value"),
        F.round(F.sqrt(var_c) / 100.0, 4).alias("sd_value"),
        F.ceil(
            F.lit(z_factor) * var_c / (0.05 * mean_c * 0.05 * mean_c)
        ).cast("long").alias("n_per_arm_5pct_mde"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effect — where in the distribution the cohorts
# differ, not just whether the means do.
# ---------------------------------------------------------------------------
@register(
    "qte_deciles_by_cohort",
    oracle="""
    WITH base AS (
        SELECT user_id % 2 AS g,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               event_id
        FROM events
    ),
    ranked AS (
        SELECT g, cents,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM base
    ),
    picks AS (
        SELECT r.g, d.range AS decile, r.cents
        FROM ranked r JOIN range(1, 10) d
          ON r.rn = CAST(CEIL(d.range * r.n / 10.0) AS BIGINT)
    )
    SELECT CAST(decile AS INT) AS decile,
           ROUND(MAX(CASE WHEN g = 0 THEN cents END) / 100.0, 2) AS v_g0,
           ROUND(MAX(CASE WHEN g = 1 THEN cents END) / 100.0, 2) AS v_g1,
           ROUND((MAX(CASE WHEN g = 1 THEN cents END)
                  - MAX(CASE WHEN g = 0 THEN cents END)) / 100.0, 2) AS qte
    FROM picks GROUP BY 1
    """,
)
def qte_deciles_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effect at the deciles — WHERE in the value
    distribution the two cohorts differ, which a mean comparison
    (`welch_t_value_by_cohort`) averages away: a change that lifts the
    p90 while hurting the p10 nets to zero in the mean but shows as a
    signed QTE fan here (the standard heterogeneity readout before
    shipping a pricing/ranking change). Quantiles are EXACT rank picks
    (ceil(q·n/10)-th order statistic via row_number with the event_id
    tiebreak) — no interpolation, no approx-percentile sketch — so the
    oracle matches to the cent.

    Scale: one ordered pass per cohort partition; the 9-decile target
    join is against the per-row (rn, n) — an equi-condition on the
    computed rank, no inequality join. The decile grid is a literal."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2).alias("g"),
        (dec2("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    ranked = base.select(
        "g",
        "cents",
        F.row_number()
        .over(Window.partitionBy("g").orderBy("cents", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("decile"))
    picks = ranked.join(
        deciles,
        F.col("rn")
        == F.ceil(F.col("decile") * F.col("n") / 10.0).cast("long"),
    ).select("g", "decile", "cents")
    g0 = F.max(F.when(F.col("g") == 0, F.col("cents")))
    g1 = F.max(F.when(F.col("g") == 1, F.col("cents")))
    return picks.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.round(g0 / 100.0, 2).alias("v_g0"),
        F.round(g1 / 100.0, 2).alias("v_g1"),
        F.round((g1 - g0) / 100.0, 2).alias("qte"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes rate shrinkage — the smoothed-CTR estimator.
# ---------------------------------------------------------------------------
@register(
    "eb_shrunk_purchase_rate",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS u,
               SUM(ROUND(CAST(k AS DOUBLE) / n, 9)) AS sr,
               SUM(ROUND((CAST(k AS DOUBLE) / n)
                         * (CAST(k AS DOUBLE) / n), 9)) AS srr
        FROM per_user
    ),
    prior AS (
        SELECT u,
               sr / u AS mu,
               GREATEST(srr / u - (sr / u) * (sr / u), 1e-9) AS vr
        FROM mom
    ),
    ab AS (
        SELECT u, mu,
               GREATEST(mu * (1 - mu) / vr - 1, 0.1) AS m
        FROM prior
    )
    SELECT p.user_id, p.n AS n_events, p.k AS n_purchases,
           ROUND(CAST(p.k AS DOUBLE) / p.n, 6) AS raw_rate,
           ROUND((p.k + ab.mu * ab.m) / (p.n + ab.m), 6) AS shrunk_rate
    FROM per_user p, ab
    ORDER BY p.user_id
    LIMIT 100
    """,
)
def eb_shrunk_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rate — the
    smoothed-CTR estimator every ranking/recommendation feature store
    uses instead of raw k/n (a 1/1 user is NOT a 100% purchaser): fit a
    Beta prior by method of moments on the observed rate distribution
    (prior mean mu, pseudo-count m = mu(1-mu)/var - 1, floored so a
    degenerate variance can't flip the sign), then shrink each user to
    (k + mu·m)/(n + m) — low-evidence users collapse to the prior,
    high-evidence users keep their data. First 100 users by id for a
    stable driver-sized result.

    Determinism: per-user (n, k) exact; each rate and rate² moment term
    rounded once at 9 dp before the user-level sum (the transcendental
    doctrine applied to divisions); the prior scalars are single fixed
    expressions; the final shrink is one expression over exact (k, n)
    and those scalars. Scale: one map-combinable aggregate to users,
    one to 3 scalars broadcast back (allowlisted 1-row join)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    )
    r = F.col("k").cast("double") / F.col("n")
    mom = per_user.agg(
        F.count(F.lit(1)).alias("u"),
        F.sum(F.round(r, 9)).alias("sr"),
        F.sum(F.round(r * r, 9)).alias("srr"),
    )
    mu = F.col("sr") / F.col("u")
    vr = F.greatest(
        F.col("srr") / F.col("u") - mu * mu, F.lit(1e-9)
    )
    ab = mom.select(
        mu.alias("mu"),
        F.greatest(mu * (1 - mu) / vr - 1, F.lit(0.1)).alias("m"),
    )
    return (
        per_user.crossJoin(ab)
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.col("k").alias("n_purchases"),
            F.round(r, 6).alias("raw_rate"),
            F.round(
                (F.col("k") + F.col("mu") * F.col("m"))
                / (F.col("n") + F.col("m")),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy("user_id")
        .limit(100)
    )


_MOMENTS_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 100.0, 4) AS mean_value,
           ROUND((CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                      AS BIGINT) AS HUGEINT)
                           * CAST(CAST(value AS DECIMAL(12,2)) * 100
                                  AS BIGINT)) AS DOUBLE)
                  - CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                  AS BIGINT)) AS DOUBLE)
                    * CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                    AS BIGINT)) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1) / 10000.0, 4) AS var_value
    FROM events GROUP BY 1
"""


def _moments_readout(m: DataFrame) -> DataFrame:
    nd = F.col("n")
    sd, ssd = F.col("s").cast("double"), F.col("ss").cast("double")
    return m.select(
        "event_type",
        nd.cast("long").alias("n_events"),
        F.round(sd / nd / 100.0, 4).alias("mean_value"),
        F.round((ssd - sd * sd / nd) / (nd - 1) / 10000.0, 4).alias(
            "var_value"
        ),
    )


@register("moments_by_type", oracle=_MOMENTS_ORACLE)
def moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type exact moment state (n, Σcents, Σcents²) and its
    mean/variance readout — the batch definition the streaming twin
    (`streaming_moments_by_type`) must reproduce bit-for-bit. The state
    is three associative integer sums, i.e. the minimal mergeable
    summary from which mean/var/stddev/t-tests all derive — persist it
    per partition/day and every coarser readout is a merge, never a
    rescan (the same doctrine as the sketch rollups, with exactness
    instead of approximation)."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cents = (dec2("value") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents.cast(d38)).alias("s"),
        F.sum(cents.cast(d38) * cents).alias("ss"),
    )
    return _moments_readout(m)


@register("streaming_moments_by_type", oracle=_MOMENTS_ORACLE)
def streaming_moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`moments_by_type` with the integer moment state maintained by
    Structured Streaming (complete-mode agg over the file stream) and
    the mean/variance readout computed on the final state. Matching the
    batch oracle proves the monitor's restart/merge-safety: the state
    is three associative integer sums per type, so micro-batch
    boundaries cannot leak into the answer."""
    from esther_apache_spark_spark.streaming.events import (
        run_streaming_moment_counts,
    )

    return _moments_readout(run_streaming_moment_counts(spark, sf_dir))


# ---------------------------------------------------------------------------
# Two-proportion z-test — conversion-rate significance between cohorts.
# ---------------------------------------------------------------------------
@register(
    "two_proportion_ztest_conversion",
    oracle="""
    WITH per_user AS (
        SELECT user_id % 2 AS g,
               MAX(CASE WHEN event_type = 'purchase'
                         AND ts < TIMESTAMP '2024-01-03'
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS k
        FROM per_user GROUP BY 1
    ),
    wide AS (
        SELECT MAX(CASE WHEN g = 0 THEN n END) AS n0,
               MAX(CASE WHEN g = 0 THEN k END) AS k0,
               MAX(CASE WHEN g = 1 THEN n END) AS n1,
               MAX(CASE WHEN g = 1 THEN k END) AS k1
        FROM cells
    )
    SELECT CAST(n0 AS BIGINT) AS n_g0, CAST(n1 AS BIGINT) AS n_g1,
           ROUND(CAST(k0 AS DOUBLE) / n0, 6) AS rate_g0,
           ROUND(CAST(k1 AS DOUBLE) / n1, 6) AS rate_g1,
           ROUND((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                 / SQRT((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat
    FROM wide
    """,
)
def two_proportion_ztest_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user-level ACTIVATION (did the user
    purchase within the first two days) between the hash cohorts — the binary-metric
    counterpart of `welch_t_value_by_cohort` and the significance layer
    `funnel_view_click_purchase` and `ab_test_purchase_lift` stop short
    of: pooled-proportion standard error, user-grain deduplication
    FIRST (event-grain conversion rates double-count heavy users — the
    classic A/B bug this query's shape avoids by construction).

    Exactness: per-user conversion is an exact MAX over the user
    partition; cohort (n, k) are exact counts; the z statistic is one
    fixed closed-form expression over four exact integers. Scale: two
    map-combinable aggregates (user grain, then 2 cells)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-03").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    cells = per_user.groupBy(
        (F.col("user_id") % 2).alias("g")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k")
    )

    def cell(g: int, col: str):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    wide = cells.agg(
        cell(0, "n").alias("n0"),
        cell(0, "k").alias("k0"),
        cell(1, "n").alias("n1"),
        cell(1, "k").alias("k1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    r0 = F.col("k0").cast("double") / n0
    r1 = F.col("k1").cast("double") / n1
    pool = (F.col("k0") + F.col("k1")).cast("double") / (n0 + n1)
    z = (r1 - r0) / F.sqrt(
        pool * (1 - pool) * (1.0 / n0 + 1.0 / n1)
    )
    return wide.select(
        n0.cast("long").alias("n_g0"),
        n1.cast("long").alias("n_g1"),
        F.round(r0, 6).alias("rate_g0"),
        F.round(r1, 6).alias("rate_g1"),
        F.round(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Top-2 PCA by power iteration + exact integer deflation.
# ---------------------------------------------------------------------------

_PCA2_ITERS = 24


def _pca2_oracle() -> str:
    dim = 64
    head = f"""
    WITH qd AS (
        SELECT e.vec_id, CAST(r.range AS INT) AS j,
               CAST(FLOOR(CAST(e.embedding[CAST(r.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT) AS q
        FROM embeddings e CROSS JOIN range(1, {dim + 1}) r
    ),
    pr AS (
        SELECT CAST(r1.range AS INT) AS j, CAST(r2.range AS INT) AS k,
               CAST(FLOOR(CAST(e.embedding[CAST(r1.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT)
             * CAST(FLOOR(CAST(e.embedding[CAST(r2.range AS INT)] AS DOUBLE)
                          * {_PCA_Q} + 0.5) AS HUGEINT) AS prod
        FROM embeddings e
        CROSS JOIN range(1, {dim + 1}) r1
        CROSS JOIN range(1, {dim + 1}) r2
    ),
    pp AS (SELECT j, k, SUM(prod) AS p FROM pr GROUP BY 1, 2),
    ss AS MATERIALIZED (SELECT j, SUM(q) AS s, COUNT(*) AS nv
                        FROM qd GROUP BY 1),
    cov AS MATERIALIZED (
        SELECT pp.j, pp.k, sa.nv * pp.p - sa.s * sb.s AS c
        FROM pp JOIN ss sa ON pp.j = sa.j JOIN ss sb ON pp.k = sb.j
    ),
    v0 AS (SELECT CAST(r.range AS INT) AS j,
                  CAST({int(_PCA_VS)} AS HUGEINT) AS v
           FROM range(1, {dim + 1}) r)"""
    its = []
    for i in range(1, _PCA2_ITERS + 1):
        its.append(f""",
    w{i} AS MATERIALIZED (SELECT cov.j, SUM(cov.c * v{i-1}.v) AS w
             FROM cov JOIN v{i-1} ON cov.k = v{i-1}.j GROUP BY 1),
    s{i} AS MATERIALIZED (SELECT SQRT(SUM(CAST(w AS DOUBLE)
                                          * CAST(w AS DOUBLE))) AS s
             FROM w{i}),
    v{i} AS MATERIALIZED (SELECT j,
                  CAST(FLOOR(CAST(w AS DOUBLE) / s * {_PCA_VS} + 0.5)
                       AS HUGEINT) AS v
             FROM w{i}, s{i})""")
    n1 = _PCA2_ITERS
    # PC1 Rayleigh + deflation constants
    its.append(f""",
    wf1 AS MATERIALIZED (SELECT cov.j, SUM(cov.c * v{n1}.v) AS w
           FROM cov JOIN v{n1} ON cov.k = v{n1}.j GROUP BY 1),
    ray1 AS (SELECT SUM(CAST(v{n1}.v AS DOUBLE) * CAST(wf1.w AS DOUBLE)) AS num,
                    SUM(CAST(v{n1}.v AS DOUBLE) * CAST(v{n1}.v AS DOUBLE)) AS den
             FROM v{n1} JOIN wf1 ON v{n1}.j = wf1.j),
    vden AS MATERIALIZED (SELECT SUM(v * v) AS d FROM v{n1}),
    u0 AS (SELECT CAST(r.range AS INT) AS j,
                  CAST(CASE WHEN r.range % 2 = 0 THEN {int(_PCA_VS)}
                            ELSE -{int(_PCA_VS)} END AS HUGEINT) AS v
           FROM range(1, {dim + 1}) r)""")
    for i in range(1, _PCA2_ITERS + 1):
        its.append(f""",
    x{i} AS MATERIALIZED (SELECT cov.j, SUM(cov.c * u{i-1 if i > 1 else 0}.v) AS w
             FROM cov JOIN u{i-1 if i > 1 else 0}
               ON cov.k = u{i-1 if i > 1 else 0}.j GROUP BY 1),
    pn{i} AS MATERIALIZED (SELECT SUM(v{n1}.v * x{i}.w) AS num
             FROM v{n1} JOIN x{i} ON v{n1}.j = x{i}.j),
    o{i} AS MATERIALIZED (SELECT x{i}.j,
                  x{i}.w * vden.d - pn{i}.num * v{n1}.v AS w
             FROM x{i} JOIN v{n1} ON x{i}.j = v{n1}.j, vden, pn{i}),
    t{i} AS MATERIALIZED (SELECT SQRT(SUM(CAST(w AS DOUBLE)
                                          * CAST(w AS DOUBLE))) AS s
             FROM o{i}),
    u{i} AS MATERIALIZED (SELECT j,
                  CAST(FLOOR(CAST(w AS DOUBLE) / s * {_PCA_VS} + 0.5)
                       AS HUGEINT) AS v
             FROM o{i}, t{i})""")
    n2 = _PCA2_ITERS
    tail = f""",
    wf2 AS MATERIALIZED (SELECT cov.j, SUM(cov.c * u{n2}.v) AS w
           FROM cov JOIN u{n2} ON cov.k = u{n2}.j GROUP BY 1),
    ray2 AS (SELECT SUM(CAST(u{n2}.v AS DOUBLE) * CAST(wf2.w AS DOUBLE)) AS num,
                    SUM(CAST(u{n2}.v AS DOUBLE) * CAST(u{n2}.v AS DOUBLE)) AS den
             FROM u{n2} JOIN wf2 ON u{n2}.j = wf2.j),
    tr AS (SELECT CAST(SUM(c) AS DOUBLE) AS trace_scat FROM cov WHERE j = k),
    nn AS (SELECT CAST(MAX(nv) AS BIGINT) AS n_vectors FROM ss)
    SELECT n_vectors,
           ROUND(ray1.num / ray1.den
                 / (CAST(n_vectors AS DOUBLE) * n_vectors)
                 / {_PCA_Q * _PCA_Q}, 6) AS lambda1_var,
           ROUND(ray2.num / ray2.den
                 / (CAST(n_vectors AS DOUBLE) * n_vectors)
                 / {_PCA_Q * _PCA_Q}, 6) AS lambda2_var,
           ROUND((ray1.num / ray1.den + ray2.num / ray2.den)
                 / trace_scat, 6) AS cum_explained_ratio
    FROM ray1, ray2, tr, nn"""
    return head + "".join(its) + tail


@register("embedding_pca_top2", oracle=_pca2_oracle())
def embedding_pca_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TWO principal components by power iteration + DEFLATION —
    extends `embedding_pca_power_iter` (same scatter matrix, same
    exact-integer matvec/renormalize loop) with the orthogonalized
    second iterate: each PC2 round computes w = C·u and then projects
    v1 OUT as w' = w·(v1ᵀv1) − (v1ᵀw)·v1 — the common (v1ᵀv1) factor
    is kept rather than divided away, so the deflation is EXACT integer
    arithmetic with no rounding and no engine-specific division
    semantics (the normalization absorbs the scale). The readout adds
    lambda2 and the cumulative top-2 explained-variance ratio — the
    first point of the scree curve, i.e. the difference between "the
    encoder collapsed to a line" (lambda1 dominates) and "it collapsed
    to a plane" (lambda1+lambda2 dominate).

    The alternating-sign u0 avoids starting parallel to the all-ones
    v0. Estimates are Rayleigh lower bounds with the documented
    near-isotropic-gap caveat (24 rounds each). Deflation multiplies
    magnitudes by v1ᵀv1 ≈ 64·1e12, which spends headroom: exact past
    ~1e7 vectors rather than PC1's 1e10 — drop _PCA_Q one decade to
    trade precision back for reach. Scale shape identical to the PC1
    query: one data pass, then model-constant frames."""
    dim, q, vs = 64, _PCA_Q, _PCA_VS
    d38 = "decimal(38,0)"
    emb = load_table(spark, sf_dir, "embeddings")
    e1 = emb.select(
        F.col("embedding").alias("a"),
        F.posexplode("embedding").alias("j0", "xj"),
    )
    e2 = e1.select("j0", "xj", F.posexplode("a").alias("k0", "xk"))
    qj = F.floor(F.col("xj").cast("double") * q + 0.5).cast(d38)
    qk = F.floor(F.col("xk").cast("double") * q + 0.5).cast(d38)
    pp = (
        e2.select(
            (F.col("j0") + 1).alias("j"),
            (F.col("k0") + 1).alias("k"),
            (qj * qk).alias("prod"),
        )
        .groupBy("j", "k")
        .agg(F.sum("prod").alias("p"))
    )
    ss = (
        e1.select((F.col("j0") + 1).alias("j"), qj.alias("q"))
        .groupBy("j")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("nv"))
    )
    sa = ss.select(
        F.col("j").alias("sj"), F.col("s").alias("s_a"), F.col("nv").alias("nv")
    )
    sb = ss.select(F.col("j").alias("sk"), F.col("s").alias("s_b"))
    cov = (
        pp.join(sa, pp.j == sa.sj)
        .join(sb, pp.k == sb.sk)
        .select(
            "j",
            "k",
            (F.col("nv").cast(d38) * F.col("p") - F.col("s_a") * F.col("s_b"))
            .alias("c"),
            "nv",
        )
        .repartition(1)
        .localCheckpoint()
    )

    def matvec(vec):
        return (
            cov.join(vec, cov.k == vec.vj)
            .groupBy("j")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )

    def renorm(w):
        s = w.agg(
            F.sqrt(
                F.sum(F.col("w").cast("double") * F.col("w").cast("double"))
            ).alias("s")
        )
        return w.crossJoin(s).select(
            F.col("j").alias("vj"),
            F.floor(F.col("w").cast("double") / F.col("s") * vs + 0.5)
            .cast(d38)
            .alias("v"),
        )

    v = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("vj"), F.lit(int(vs)).cast(d38).alias("v")
    )
    for i in range(_PCA2_ITERS):
        v = renorm(matvec(v))
        if (i + 1) % 4 == 0:
            v = v.repartition(1).localCheckpoint()
    wf1 = matvec(v)
    ray1 = v.join(wf1, v.vj == wf1.j).agg(
        F.sum(F.col("v").cast("double") * F.col("w").cast("double")).alias(
            "num1"
        ),
        F.sum(F.col("v").cast("double") * F.col("v").cast("double")).alias(
            "den1"
        ),
    )
    vden = v.agg(F.sum(F.col("v") * F.col("v")).alias("d")).localCheckpoint()
    v1 = v.select(F.col("vj").alias("pj"), F.col("v").alias("pv"))

    u = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("vj"),
        F.when(F.col("id") % 2 == 0, F.lit(int(vs)))
        .otherwise(F.lit(-int(vs)))
        .cast(d38)
        .alias("v"),
    )
    for i in range(_PCA2_ITERS):
        x = matvec(u)
        pn = x.join(v1, x.j == v1.pj).agg(
            F.sum(F.col("pv") * F.col("w")).alias("num")
        )
        o = (
            x.join(v1, x.j == v1.pj)
            .crossJoin(vden)
            .crossJoin(pn)
            .select(
                "j",
                (F.col("w") * F.col("d") - F.col("num") * F.col("pv")).alias(
                    "w"
                ),
            )
        )
        u = renorm(o)
        if (i + 1) % 4 == 0:
            u = u.repartition(1).localCheckpoint()
    wf2 = matvec(u)
    ray2 = u.join(wf2, u.vj == wf2.j).agg(
        F.sum(F.col("v").cast("double") * F.col("w").cast("double")).alias(
            "num2"
        ),
        F.sum(F.col("v").cast("double") * F.col("v").cast("double")).alias(
            "den2"
        ),
    )
    tr = cov.filter(F.col("j") == F.col("k")).agg(
        F.sum("c").cast("double").alias("trace_scat")
    )
    nn = ss.agg(F.max("nv").cast("long").alias("n_vectors"))
    nvd = F.col("n_vectors").cast("double")
    return (
        ray1.crossJoin(ray2)
        .crossJoin(tr)
        .crossJoin(nn)
        .select(
            "n_vectors",
            F.round(
                F.col("num1") / F.col("den1") / (nvd * nvd) / (q * q), 6
            ).alias("lambda1_var"),
            F.round(
                F.col("num2") / F.col("den2") / (nvd * nvd) / (q * q), 6
            ).alias("lambda2_var"),
            F.round(
                (F.col("num1") / F.col("den1") + F.col("num2") / F.col("den2"))
                / F.col("trace_scat"),
                6,
            ).alias("cum_explained_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Daily anomaly z-score — the monitoring layer's "is today weird" readout,
# batch definition + stateful streaming twin (VERDICT r06 #7).
# ---------------------------------------------------------------------------
_ANOMALY_ORACLE = """
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT event_type, day, cents,
               CAST(COUNT(*) OVER w AS BIGINT) AS pn,
               CAST(SUM(cents) OVER w AS BIGINT) AS ps,
               SUM(CAST(cents AS HUGEINT) * cents) OVER w AS pss
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    z AS (
        SELECT event_type, day, cents, pn,
               (CAST(cents AS DOUBLE) - CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
                   / SQRT((CAST(pss AS DOUBLE)
                           - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE)
                             / CAST(pn AS DOUBLE))
                          / (CAST(pn AS DOUBLE) - 1)) AS zv,
               (CAST(pss AS DOUBLE)
                - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
                   / (CAST(pn AS DOUBLE) - 1) AS varv
        FROM win
    )
    SELECT event_type, day,
           ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS daily_value,
           ROUND(zv, 4) AS z_score,
           CAST(ABS(ROUND(zv, 4)) >= 3.0 AS BOOLEAN) AS is_anomaly
    FROM z
    WHERE pn >= 2 AND varv > 0
"""


def _anomaly_readout(df: DataFrame) -> DataFrame:
    """Shared z-score readout over (event_type, day, cents, pn, ps,
    pss) — used verbatim by the batch entry AND the streaming twin, so
    both engines' float arithmetic is literally the same expression
    tree over the same exact-integer moments."""
    pnd = F.col("pn").cast("double")
    psd, pssd = F.col("ps").cast("double"), F.col("pss").cast("double")
    centsd = F.col("cents").cast("double")
    mean_p = psd / pnd
    var_p = (pssd - psd * psd / pnd) / (pnd - 1)
    z = (centsd - mean_p) / F.sqrt(var_p)
    return (
        df.filter((F.col("pn") >= 2) & (var_p > 0))
        .select(
            "event_type",
            "day",
            F.round(centsd / 100.0, 2).alias("daily_value"),
            F.round(z, 4).alias("z_score"),
            (F.abs(F.round(z, 4)) >= 3.0).alias("is_anomaly"),
        )
    )


@register("daily_anomaly_zscore_by_type", oracle=_ANOMALY_ORACLE)
def daily_anomaly_zscore_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily anomaly z-score against the EXPANDING history of
    prior days: each day's exact-integer value total is scored vs the
    running mean/variance of every preceding day — the canonical
    monitoring readout ("is today weird for this metric"), and the
    batch definition the stateful streaming twin
    (`streaming_daily_anomaly_zscore`) must reproduce bit-for-bit.

    Exactness: daily totals are integer cents; the prior-window
    moments (pn, Σ, Σ²) are exact BIGINT window sums; mean/var/z are
    one fixed float expression over those integers shared with the
    streaming readout and mirrored in the oracle. Scale: one daily
    hash-agg, then a window over each type's DAY-grain series —
    calendar-bounded rows per partition, not data-sized."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec2("value") * 100).cast("long")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(cents).alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wind = daily.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(w).alias("pn"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("ps"),
        # squares widened to decimal(38,0) before summing (ADVICE r7):
        # plain BIGINT cents*cents wraps silently past ~3M-cent days
        # while the HUGEINT oracle errors — same widening discipline as
        # _gs_wide_and_z, so batch stays exact where the int64-bounded
        # streaming fold documents its limit
        F.coalesce(
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).over(w),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("pss"),
    )
    return _anomaly_readout(wind)


@register("streaming_daily_anomaly_zscore", oracle=_ANOMALY_ORACLE)
def streaming_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`daily_anomaly_zscore_by_type` with the prior-day moments held in
    STREAMING STATE: ``applyInPandasWithState`` keyed by event_type
    carries (open day's partial cents, n/Σ/Σ² of completed days); a day
    closes — and scores — when the next day arrives, and per-type
    far-future sentinels close each key's final day so the bounded file
    stream reaches EXACT batch equality (the sentinel's own day never
    closes, so it never emits). Matching the batch oracle proves the
    detector restart-safely extends the stateful family beyond
    totals/transitions: the z derives from exact-integer state through
    the SAME shared readout expression, so micro-batch slicing cannot
    move a bit."""
    from esther_apache_spark_spark.streaming.events import (
        daily_anomaly_state_stream,
    )

    return _anomaly_readout(daily_anomaly_state_stream(spark, sf_dir))


# ---------------------------------------------------------------------------
# Retention cohort triangle — the canonical product-analytics readout.
# ---------------------------------------------------------------------------
@register(
    "retention_cohort_triangle",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1
    ),
    joined AS (
        SELECT f.cohort_day, a.day - f.cohort_day AS day_offset, a.user_id
        FROM act a JOIN firsts f USING (user_id)
    ),
    tri AS (
        SELECT cohort_day, day_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM joined GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        FROM firsts GROUP BY 1
    )
    SELECT strftime(t.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           n_active, n_cohort,
           ROUND(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
    FROM tri t JOIN sizes s USING (cohort_day)
    """,
)
def retention_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users cohorted by FIRST-activity day, each
    cell = share of the cohort active again `day_offset` days later —
    the readout behind every retention curve / DAU decomposition, and
    the product-side complement of `logrank_churn_by_cohort` (which
    tests survival differences; this reports the raw surface).

    Exactness: activity is user-day distinct (exact), cohort assignment
    an exact MIN, every cell a ratio of exact BIGINTs rounded once.
    Scale: user-day dedup (one hash agg), a broadcast-able user→cohort
    join (user-grain — at 100 TB this is the big shuffle, keyed and
    partial-aggregable), then a triangle-sized (days × days / 2) agg;
    no window over anything data-sized."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    firsts = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = act.join(firsts, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"),
        "user_id",
    )
    tri = joined.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return tri.join(sizes, "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_cohort").cast("long").alias("n_cohort"),
        F.round(
            F.col("n_active").cast("double") / F.col("n_cohort"), 6
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# Group-sequential monitoring — the "peeking correctly" layer over the
# two-arm z machinery.
# ---------------------------------------------------------------------------
_GS_CTES = """WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, user_id % 2 AS g,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100
                                  AS BIGINT) AS HUGEINT)
                        * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS HUGEINT) AS ss
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT day, DENSE_RANK() OVER (ORDER BY day) AS r FROM daily
        GROUP BY day
    ),
    nd AS (SELECT CAST(MAX(r) AS BIGINT) AS d FROM ranked),
    looks AS (
        SELECT day, r, CAST(CEIL(r * 5.0 / d) AS BIGINT) AS look
        FROM ranked, nd
    ),
    cum AS (
        SELECT l.look, l.day, l.r, d.g,
               SUM(d.n) OVER w AS cn,
               SUM(d.s) OVER w AS cs,
               SUM(d.ss) OVER w AS css
        FROM daily d JOIN looks l USING (day)
        WINDOW w AS (PARTITION BY d.g ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cut AS (
        SELECT look, MAX(r) AS rmax FROM looks GROUP BY 1
    ),
    at_cut AS (
        SELECT c.look, c.day, c.g,
               CAST(c.cn AS BIGINT) AS cn, CAST(c.cs AS BIGINT) AS cs,
               CAST(c.css AS HUGEINT) AS css
        FROM cum c JOIN cut t ON c.look = t.look AND c.r = t.rmax
    ),
    wide AS (
        SELECT look, MAX(strftime(day, '%Y-%m-%d')) AS cutoff_day,
               MAX(CASE WHEN g = 0 THEN cn END) AS n0,
               MAX(CASE WHEN g = 0 THEN cs END) AS s0,
               MAX(CASE WHEN g = 0 THEN css END) AS ss0,
               MAX(CASE WHEN g = 1 THEN cn END) AS n1,
               MAX(CASE WHEN g = 1 THEN cs END) AS s1,
               MAX(CASE WHEN g = 1 THEN css END) AS ss1
        FROM at_cut GROUP BY 1
    )"""

_GS_Z = """(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / SQRT(((CAST(ss0 AS DOUBLE)
                          - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                            / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1))
                        / CAST(n0 AS DOUBLE)
                        + ((CAST(ss1 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                              / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
                          / CAST(n1 AS DOUBLE))"""


def _gs_oracle(crossed_sql: str, extra_cols: str = "") -> str:
    """Shared group-sequential oracle: the daily-moments → look-grid →
    cumulative-window CTE chain, with the boundary rule plugged in."""
    return f"""
    {_GS_CTES}SELECT CAST(look AS BIGINT) AS look, cutoff_day,
           CAST(n0 + n1 AS BIGINT) AS n_total,
           ROUND({_GS_Z}, 4) AS z_stat{extra_cols},
           {crossed_sql} AS crossed
    FROM wide
    """


def _gs_wide_and_z(spark: SparkSession, sf_dir: str):
    """Shared group-sequential machinery: per-look cumulative exact
    moments (wide frame: look, cutoff_day, n/s/ss per arm) and the
    Welch-style z Column over them — one implementation for every
    boundary family (Pocock, O'Brien-Fleming)."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    cents = (dec2("value") * 100).cast("long")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), (F.col("user_id") % 2).alias("g")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents.cast(d38) * cents).alias("ss"),
    )
    days = daily.select("day").distinct()
    ranked = days.select(
        "day", F.dense_rank().over(Window.orderBy("day")).alias("r")
    )
    nd = ranked.agg(F.max("r").cast("long").alias("d"))
    looks = ranked.crossJoin(F.broadcast(nd)).select(
        "day", "r", F.ceil(F.col("r") * 5.0 / F.col("d")).cast("long").alias("look")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.join(looks, "day").select(
        "look",
        "day",
        "r",
        "g",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
    )
    cut = looks.groupBy("look").agg(F.max("r").alias("rmax"))
    at_cut = cum.join(
        cut, (cum.look == cut.look) & (cum.r == cut.rmax)
    ).select(cum.look, "day", "g", "cn", "cs", "css")

    def cell(g: int, col: str):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    wide = at_cut.groupBy("look").agg(
        F.max(F.date_format("day", "yyyy-MM-dd")).alias("cutoff_day"),
        cell(0, "cn").alias("n0"),
        cell(0, "cs").alias("s0"),
        cell(0, "css").alias("ss0"),
        cell(1, "cn").alias("n1"),
        cell(1, "cs").alias("s1"),
        cell(1, "css").alias("ss1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    s0d, s1d = F.col("s0").cast("double"), F.col("s1").cast("double")
    ss0d, ss1d = F.col("ss0").cast("double"), F.col("ss1").cast("double")
    v0 = (ss0d - s0d * s0d / n0d) / (n0d - 1)
    v1 = (ss1d - s1d * s1d / n1d) / (n1d - 1)
    z = (s1d / n1d - s0d / n0d) / F.sqrt(v0 / n0d + v1 / n1d)
    return wide, z


@register(
    "group_sequential_pocock_ztest",
    oracle=_gs_oracle(
        "CAST(ABS(ROUND(" + _GS_Z + ", 4)) >= 2.413 AS BOOLEAN)"
    ),
)
def group_sequential_pocock_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential two-arm monitoring: the Welch-style z statistic
    evaluated at 5 equally-spaced interim LOOKS (calendar-day grid cut
    into fifths by day rank), each compared against the Pocock K=5,
    two-sided α=0.05 boundary 2.413 — a fixed published constant
    (Pocock 1977, Table 2), embedded as ONE literal in both engines
    (the `mde_sample_size_plan` doctrine: no boundary computation ever
    executes). This is the "peeking correctly" layer the fixed-horizon
    tests (`welch_t_value_by_cohort`) can't provide: five raw z>1.96
    peeks inflate type-I error to ~14%; the Pocock boundary holds it at
    5%.

    Exactness: per-(day, arm) moments are exact integers; per-look
    cumulative moments are exact window sums over the day-grain series
    (calendar-bounded rows, never data-sized); z is one fixed float
    expression over six exact integers, rounded once; the crossing flag
    compares the ROUNDED z so both engines flip together. Scale: one
    map-combinable daily aggregate, then windows over ≤ days×2 rows."""
    wide, z = _gs_wide_and_z(spark, sf_dir)
    return wide.select(
        F.col("look").cast("long").alias("look"),
        "cutoff_day",
        (F.col("n0") + F.col("n1")).cast("long").alias("n_total"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(F.round(z, 4)) >= 2.413).alias("crossed"),
    )


@register(
    "group_sequential_obf_ztest",
    oracle=_gs_oracle(
        "CAST(ABS(ROUND(" + _GS_Z + """, 4)) >=
             CASE look WHEN 1 THEN 4.562 WHEN 2 THEN 3.226 WHEN 3 THEN 2.634
                       WHEN 4 THEN 2.281 ELSE 2.040 END AS BOOLEAN)""",
        extra_cols=""",
           CAST(CASE look WHEN 1 THEN 4.562 WHEN 2 THEN 3.226
                          WHEN 3 THEN 2.634 WHEN 4 THEN 2.281
                          ELSE 2.040 END AS DOUBLE) AS boundary""",
    ),
)
def group_sequential_obf_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming sibling of `group_sequential_pocock_ztest` — the
    OTHER canonical spending shape: conservative early (look-1 boundary
    4.562, nearly impossible to cross on noise) and close to the fixed-
    horizon 1.96 at the final look (2.040), so the experiment keeps
    almost full terminal power while still allowing a dramatic-effect
    early stop — the boundary most real experimentation platforms
    default to, vs Pocock's flat 2.413 which spends alpha evenly and
    pays ~0.08 z of terminal power for easier early stops. All five
    boundaries are the published O'Brien-Fleming K=5 two-sided α=0.05
    constants (4.562, 3.226, 2.634, 2.281, 2.040 — Pocock 1977 Table 2
    / Jennison & Turnbull), embedded as LITERALS in both engines; the
    look machinery, exact cumulative moments and z expression are the
    shared `_gs_wide_and_z` / `_gs_oracle` used by the Pocock entry."""
    wide, z = _gs_wide_and_z(spark, sf_dir)
    boundary = (
        F.when(F.col("look") == 1, 4.562)
        .when(F.col("look") == 2, 3.226)
        .when(F.col("look") == 3, 2.634)
        .when(F.col("look") == 4, 2.281)
        .otherwise(2.040)
    )
    return wide.select(
        F.col("look").cast("long").alias("look"),
        "cutoff_day",
        (F.col("n0") + F.col("n1")).cast("long").alias("n_total"),
        F.round(z, 4).alias("z_stat"),
        boundary.alias("boundary"),
        (F.abs(F.round(z, 4)) >= boundary).alias("crossed"),
    )
