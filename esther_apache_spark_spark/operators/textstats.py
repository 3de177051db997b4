"""Text-analysis operators for training-data pipelines (SURVEY.md §7 M4).

Language ID (stopword-marker heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace +
BPE-ish regex) and document fingerprinting. Everything is built-in
column expressions — regex, arrays, higher-order functions — so the hot
path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from esther_apache_spark_spark.functions.text import normalize_text, tokenize

# Tiny deterministic per-language marker sets (n-gram/stopword heuristic).
# Real deployments swap in fastText/CLD3 via a pandas_udf; the heuristic
# keeps language-ID expressible as pure SQL for the oracle gate.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "las", "y", "es"),
}

# BPE-ish token regex: letter runs, digit runs, or single non-space symbol.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

_ENGLISH_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
)


def token_count(col: Column, mode: str = "ws") -> Column:
    """Token count: ``ws`` = non-empty whitespace tokens; ``bpe`` = count
    of BPE-ish regex matches (letters / digits / single symbols)."""
    if mode == "ws":
        return F.size(tokenize(col, normalize=False))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))
    raise ValueError(f"unknown token mode: {mode}")


def stopword_ratio(tokens: Column, stopwords: tuple[str, ...] = _ENGLISH_STOPWORDS) -> Column:
    n = F.size(tokens)
    hits = F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs and
    normal stopword density, penalizes punctuation soup. Deterministic
    and SQL-expressible (oracle in plans.extensions)."""
    toks = tokenize(text)
    n_tok = F.size(toks)
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop = stopword_ratio(toks)
    stop_score = F.lit(1.0) - F.abs(stop - F.lit(0.4)) / F.lit(0.4)
    stop_score = F.greatest(stop_score, F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round((length_score + stop_score + punct_score) / 3, 4)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: score = count of per-language marker words
    among the tokens; argmax with deterministic tie order (en>fr>de>es>und)."""
    toks = tokenize(text)

    def marker_hits(markers: tuple[str, ...]):
        # single-arg closure: a two-param lambda would make F.filter
        # pass the element index as the second argument
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_hits(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    out = F.when(best_score <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # declaration order breaks ties (first wins)
        out = out.when(scores[lang] == best_score, F.lit(lang))
    return out.otherwise(F.lit("und"))


def fingerprint(text: Column, length: int = 16) -> Column:
    """Normalized-content fingerprint: md5 of (lowercased, punctuation-
    stripped, whitespace-collapsed) text, truncated. Key for exact-dedup
    groups that survives formatting noise."""
    canon = F.regexp_replace(F.trim(normalize_text(text)), r"\s+", " ")
    return F.substring(F.md5(canon.cast("binary")), 1, length)


def document_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document text-analysis projection."""
    t = F.col(text_col)
    toks = tokenize(t)
    return df.select(
        id_col,
        F.length(t).alias("n_chars"),
        F.size(toks).alias("n_tokens_ws"),
        token_count(t, "bpe").alias("n_tokens_bpe"),
        F.round(stopword_ratio(toks), 4).alias("stopword_ratio"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def rolling_hash(tokens: Column, mod: int = 2147483647) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash over the token
    sequence: fold acc·31 + h(token) mod 2^31−1, where h is the md5-
    derived 32-bit bucket (same engine-portable hash the sampling gate
    uses). ORDER-SENSITIVE — unlike the md5 `fingerprint`, reordered
    tokens change the value — and incremental: a streaming ingester can
    extend it token-at-a-time. Pure higher-order expressions (transform
    + aggregate), so it runs JVM-side; the modulus keeps every
    intermediate < 2^37, overflow-safe in both Spark and DuckDB."""
    th = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(mod),
    )


def duplicate_fraction(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier element:
    ``(len - distinct_len) / len``, 0.0 for empty arrays. Over token or
    n-gram arrays this is the Gopher-style repetition signal
    (Rae et al. 2021, "duplicate n-gram fraction") — high values mark
    degenerate, loop-generated or boilerplate text that a training
    pipeline filters before anything else sees it. Pure expression."""
    n = F.size(arr)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(arr))) / n
    ).otherwise(F.lit(0.0))


def quality_classifier_weights(
    spark, n_buckets: int = 4096, seed_salt: str = "qcw:"
):
    """Deterministic fasttext-style weight table: one row per token-hash
    bucket, weight an EXACT dyadic rational in [-1, 1]
    (``(md5_bucket_hash mod 2049 − 1024) / 1024`` — denominator a power
    of two, so every weight, partial sum and mean is bit-identical
    across engines and summation orders). In production this frame is
    the trained model's quantized embedding/weight table loaded from a
    store; the interface is identical — (bucket, weight)."""
    from esther_apache_spark_spark.operators.dedup import md5_long

    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            (
                F.pmod(
                    md5_long(F.col("id").cast("string"), salt=seed_salt),
                    F.lit(2049),
                )
                - 1024
            )
            / F.lit(1024.0)
        ).alias("weight"),
    )


def quality_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bias: float = 0.0,
) -> DataFrame:
    """Model-based quality filter (the CCNet/fasttext linear-classifier
    step of an LLM data pipeline): token → md5 hash bucket → broadcast
    weight lookup → per-doc mean + bias → rational squash
    ``z / (1 + |z|)`` (every op an exactly-specified IEEE operation —
    no ``exp``, whose libm implementations differ across engines).
    Returns (id, n_tokens, score, quality, keep) with keep = score > 0.

    Scale shape: explode is linear in corpus tokens, the weight join is
    a broadcast hash join against a table bounded by ``n_buckets`` (a
    model constant, not data), and the per-doc aggregate is map-side
    combinable. Zero-token docs are preserved by the left join back to
    the doc base (score = bias). Pure expressions throughout — no UDF.

    Exact by construction: weights are multiples of 1/1024 with |w| ≤ 1,
    so group sums stay exact dyadic rationals regardless of reduction
    order, and the single divisions (mean, squash) are deterministic
    IEEE ops — the DuckDB oracle matches bit-for-bit with NO rounding."""
    from esther_apache_spark_spark.operators.dedup import md5_long

    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    )
    tok = base.select("_id", F.explode(tokenize(F.col("_t"))).alias("_tok"))
    bucketed = tok.select(
        "_id",
        F.pmod(md5_long(F.col("_tok"), salt="qc:"), F.lit(n_buckets)).alias(
            "bucket"
        ),
    )
    # bounded by n_buckets (model constant) -> broadcast is safe at any sf
    scored = bucketed.join(F.broadcast(weights), "bucket", "left").select(
        "_id", F.coalesce("weight", F.lit(0.0)).alias("weight")
    )
    agg = scored.groupBy("_id").agg(
        F.sum("weight").alias("_sw"), F.count(F.lit(1)).alias("_n")
    )
    z = F.coalesce(F.col("_sw") / F.col("_n"), F.lit(0.0)) + F.lit(bias)
    return (
        base.select("_id")
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_n", F.lit(0).cast("long")).alias("n_tokens"),
            z.alias("score"),
            (z / (F.lit(1.0) + F.abs(z))).alias("quality"),
            (z > 0).alias("keep"),
        )
    )
