"""Streaming operators over the ``events`` table (engine extension, M5).

Batch and streaming share the same transformation functions — the
DataFrame is the IR, so ``tumbling_agg`` composes onto either
``spark.read`` or ``spark.readStream``. Watermarks bound state for late
data; the local test driver uses the parquet file-source + memory sink +
``processAllAvailable`` to run a stream to completion synchronously.

Scale notes: windowed aggregation state is partitioned by (window, keys)
— the same shuffle as the batch groupBy; watermark GC keeps state
bounded. The sessionize operator is the batch twin of
``session_window`` / ``applyInPandasWithState``.
"""

from __future__ import annotations

import contextlib
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esther_apache_spark_spark.schemas import TESTDATA

# Off-heap state store for big-state streaming (see DEPLOYMENT.md).
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextlib.contextmanager
def state_store_provider(spark: SparkSession, provider: str = ROCKSDB_STATE_STORE):
    """Run streaming queries under a specific state-store provider.

    The default HDFSBackedStateStoreProvider keeps every partition's
    state map ON-HEAP in the executor — fine for bounded windowed aggs,
    a memory wall for 100 TB-scale stateful pipelines (billions of keys
    in dedup-within-watermark or applyInPandasWithState accumulators).
    RocksDB spills state to local SSD with an off-heap block cache, so
    state size is bounded by disk, not heap, and GC pauses stop scaling
    with key count.

    The provider is a runtime SQL conf read at QUERY START — queries
    started inside this context use ``provider``, queries already
    running are unaffected. Restores the previous setting on exit.
    Checkpoint compatibility: a query's provider is fixed by its
    checkpoint; don't flip providers across restarts of the same
    checkpoint dir."""
    # get(key, None) is None when the conf was never explicitly set
    # (plain get() would return the class's baked-in default and make
    # the restore pin it explicitly, changing observable conf state)
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, provider)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)


def streaming_events_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events parquet (explicit
    schema — required for readStream). The ts precision branch mirrors
    the batch reader (schemas.load_table): int64-nanos files are read
    raw and converted to a micros timestamp; micros files read natively."""
    from esther_apache_spark_spark.schemas import _EVENTS_RAW, _events_ts_unit

    # The file stream source wants a directory; point it at sf_dir with a
    # glob filter so only the events table streams in.
    if _events_ts_unit(f"{sf_dir}/events.parquet") == "ns":
        raw = (
            spark.readStream.schema(_EVENTS_RAW)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(TESTDATA["events"])
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def tumbling_agg(events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window count+sum per event_type. Works on batch and
    streaming inputs alike; the watermark is applied only when streaming."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact sum: order-independent and cross-engine stable
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_tumbling_agg(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """Drive the streaming tumbling agg to completion via the memory sink
    and return the (batch) result table. Complete output mode so every
    window is emitted regardless of watermark progress."""
    name = f"stream_agg_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_agg(streaming_events_source(spark, sf_dir), window)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_to_partitioned_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint_path: str,
    partition_col: str = "event_type",
) -> None:
    """foreachBatch → K2-style partitioned sink (SURVEY.md §7 M5): each
    micro-batch appends into a value-partitioned parquet layout. Using
    foreachBatch (rather than the native file sink) is the pattern for
    sinks that need batch-writer features — partitionBy, JDBC, merges —
    and gives exactly-once per batch via the checkpoint's batch id."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy(partition_col)
            .parquet(out_path)
        )

    q = (
        streaming_events_source(spark, sf_dir)
        .writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def running_user_totals_stream(
    spark: SparkSession, sf_dir: str, value_round: int = 2
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §7 M5):
    ``applyInPandasWithState`` keeps a (count, total) accumulator per
    user across micro-batches and emits the updated totals each batch.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (the built-ins cover tumbling/sliding/
    session); the state store shuffles by user_id exactly like a groupBy,
    and state size is O(distinct users). Returns the final totals table
    (last update per user) after driving the stream to completion.

    The running total accumulates in integer cents (``value`` is
    2-decimal money), not a float — integer addition is exact and
    order-independent, so the result does not depend on micro-batch
    arrival order, matching the decimal-exact convention of the batch
    aggregates (``functions/money.py``)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    scale = 10 ** value_round

    def update(key, pdfs, state: GroupState):
        cnt, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            # per-row to integer cents (exact for 2-decimal money), then
            # integer sum — order-independent, unlike a float accumulator
            cents += int((pdf["value"] * scale).round().astype("int64").sum())
        state.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [cents / scale]}
        )

    stream = streaming_events_source(spark, sf_dir)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="cnt long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"user_totals_{uuid.uuid4().hex[:8]}"
    q = (
        updates.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # multiple micro-batches emit multiple updates per user; the final
    # state is the row with the highest n_events per user
    all_updates = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        all_updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def tws_available() -> bool:
    """Whether ``transformWithStateInPandas`` can execute here: its
    Python↔JVM state protocol is protobuf-encoded, so the worker needs
    the ``protobuf`` package (not bundled with pyspark)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_peak_stream(
    spark: SparkSession, sf_dir: str, value_round: int = 2
) -> DataFrame:
    """Custom stateful operator on the MODERN state API
    (``transformWithStateInPandas``, Spark 4 — the arbitrary-state
    replacement for ``applyInPandasWithState``): a ``StatefulProcessor``
    with an explicit ``ValueState`` tracks each user's peak single-event
    value (integer cents — exact, order-independent max) and event
    count across micro-batches, emitting the updated pair per batch.

    transformWithState REQUIRES the RocksDB state-store provider (the
    on-heap HDFS provider does not implement the new state API), so the
    runner wraps the query in ``state_store_provider`` — which is also
    the 100 TB posture: typed per-key state (value/list/map states,
    timers, TTL) living off-heap, instead of one opaque pickled tuple
    per key on the executor heap. Returns the final per-user state
    after driving the stream to completion (max is monotone, so the
    final emission per user is the max over its updates).

    Environment gate (honest, like the non-PPM/BMP codecs): the state
    protocol needs the ``protobuf`` Python package, which this container
    lacks — ``tws_available()`` is checked up front and a clear
    ``NotImplementedError`` raised instead of the opaque mid-query
    runner crash; the query wiring up to runner init is exercised by
    ``tests/test_skew_and_streaming.py`` either way. The
    ``applyInPandasWithState`` twin (``running_user_totals_stream``)
    carries the tested-in-container stateful semantics."""
    import pandas as pd

    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package for its "
            "Python<->JVM state protocol, which is not available in this "
            "environment; use running_user_totals_stream "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    scale = 10 ** value_round

    class PeakProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("peak", "mx long, cnt long")

        def handleInputRows(self, key, rows, timer_values):
            got = self._state.get()
            mx, cnt = got if got is not None else (None, 0)
            for pdf in rows:
                cents = (pdf["value"] * scale).round().astype("int64")
                batch_mx = int(cents.max())
                mx = batch_mx if mx is None else max(mx, batch_mx)
                cnt += len(pdf)
            self._state.update((mx, cnt))
            yield pd.DataFrame(
                {"user_id": [key[0]], "max_value": [mx / scale], "n_events": [cnt]}
            )

        def close(self) -> None:
            pass

    stream = streaming_events_source(spark, sf_dir)
    name = f"user_peak_{uuid.uuid4().hex[:8]}"
    with state_store_provider(spark):
        updates = stream.groupBy("user_id").transformWithStateInPandas(
            PeakProcessor(),
            outputStructType="user_id long, max_value double, n_events long",
            outputMode="Update",
            timeMode="None",
        )
        q = (
            updates.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    all_updates = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        all_updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch twin of session_window): a new
    session starts when the time since the user's previous event exceeds
    the gap. One shuffle on user_id; lag + running sum over one window."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("session_seq", F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ))


def run_stream_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on
    event_id — the streaming twin of the batch exact-dedup operator
    (operators.dedup.exact_dedup). State holds one entry per key seen
    within the watermark horizon and is GC'd as the watermark advances,
    so memory is bounded by (arrival rate × watermark), not stream
    length — the property that makes exact dedup viable on an unbounded
    100 TB/day ingest. Driven to completion on the file source; returns
    the deduped (batch) result table."""
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_events_source(spark, sf_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def interval_join_views_purchases(
    views: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Attribution interval join: each view pairs with the same user's
    purchases in (view_ts, view_ts + horizon]. Works on batch and
    streaming inputs alike — on streams the equality key plus the
    two-sided time bound is exactly what Spark needs to run a
    stream-stream inner join with bounded state (each side's rows are
    GC'd once the other side's watermark passes the horizon)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", "30 minutes")
        p = p.withWatermark("purchase_ts", "30 minutes")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def run_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stream-stream interval join to completion: two
    readStream sources over the same events file (filtered to views /
    purchases), inner-joined on user + time bound, append mode. Inner
    join rows emit as soon as both sides arrive; watermarks only bound
    state, so the completed stream equals the batch twin row-for-row."""
    src1 = streaming_events_source(spark, sf_dir)
    src2 = streaming_events_source(spark, sf_dir)
    name = f"stream_ij_{uuid.uuid4().hex[:8]}"
    q = (
        interval_join_views_purchases(
            src1.filter(F.col("event_type") == "view"),
            src2.filter(F.col("event_type") == "purchase"),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def enriched_segment_totals(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) event fact
    to the static customer dimension, then aggregate per market segment.
    The static side broadcasts by SIZE STATS (no forced hint — the
    customer dim grows with sf, and a hint would pin the broadcast even
    when it no longer fits): while it is under
    autoBroadcastJoinThreshold this is THE streaming reference-data
    enrichment pattern — the static side is re-broadcast per
    micro-batch, no state store involved, and the stream side never
    shuffles for the join itself. Works identically on a batch frame,
    which is what the shared DuckDB oracle checks."""
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        events.join(dim, "user_id")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


def run_streaming_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stream-static enrichment to completion: events as a file
    stream, customer loaded once as a plain batch dim, complete-mode
    memory sink (global agg, no watermark needed)."""
    from esther_apache_spark_spark.schemas import load_table

    customer = load_table(spark, sf_dir, "customer")
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched_segment_totals(streaming_events_source(spark, sf_dir), customer)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def interval_join_views_purchases_left(
    views: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER attribution join: every view row survives; purchases
    within (view_ts, view_ts + horizon] attach, unconverted views carry
    NULL purchase columns. Batch and streaming share this kernel, but
    their COMPLETENESS differs by design: a streaming left-outer join
    emits a null-extended row only once the purchase-side watermark has
    passed the view's horizon (state can then prove no match will
    arrive). A bounded file stream stops advancing the watermark after
    its last batch, so views near the end of input remain unemitted —
    the streamed result is a PREFIX-complete subset of the batch twin
    (matched rows all present; null-extensions only for views whose
    horizon closed). tests/test_skew_and_streaming.py pins exactly that
    containment; the batch twin is the oracled complete answer."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", "30 minutes")
        p = p.withWatermark("purchase_ts", "30 minutes")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        F.col("purchase_id"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def interval_join_views_purchases_full(
    views: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """FULL OUTER attribution join — the completion of the interval-join
    family (inner / leftOuter / fullOuter share one kernel): every view
    AND every purchase survives; unconverted views carry NULL purchase
    columns, orphan purchases (no view in the preceding hour) carry NULL
    view columns. Streaming semantics extend the left-outer contract
    symmetrically: matched rows emit on arrival; null-extensions on
    EITHER side emit only once the opposite side's watermark passes the
    horizon, so a bounded stream yields a prefix-complete subset of the
    batch twin on both sides (pinned in
    tests/test_skew_and_streaming.py). State stays bounded exactly as in
    the inner form — the equality key plus the two-sided time bound lets
    each side GC rows the other side's watermark has passed."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", "30 minutes")
        p = p.withWatermark("purchase_ts", "30 minutes")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        "fullOuter",
    ).select(
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def windowed_distinct_users_hll(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "30 minutes",
    lgk: int = 12,
) -> DataFrame:
    """Distinct users per (window, event_type), HLL-estimated — the
    streaming face of ``operators.sketches``. Exact streaming distinct
    would keep every user id in the state store (state grows with the
    key universe); the HLL register array is a few KB per group no
    matter the cardinality, and register-max merge across micro-batches
    is lossless, so the completed stream's estimates equal the batch
    twin's bit-for-bit (asserted in tests). Works on batch and
    streaming inputs alike."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(lgk)))
            .cast("long")
            .alias("distinct_users_est")
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "distinct_users_est",
        )
    )


def run_streaming_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the windowed HLL distinct to completion via the memory
    sink (complete mode) and return the result table."""
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_distinct_users_hll(streaming_events_source(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def windowed_user_freq_cms(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "30 minutes",
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-min counter pages per event-time window — the FREQUENCY
    member of the streaming sketch family (the HLL twin above answers
    "how many distinct", this answers "how often is key X", both with
    state bounded by the sketch, not the key universe: ≤ depth·width
    counters per window vs one state row per (window, user)). Counter
    addition is associative, so micro-batch accumulation is exactly the
    batch aggregate — the completed stream's pages equal the batch
    twin's bit-for-bit (md5 hash rows, integer counts; asserted in
    tests/test_sketches.py), and persisted window pages merge into any
    coarser period later via ``sketches.cms_rollup``. Works on batch
    and streaming inputs alike."""
    from esther_apache_spark_spark.operators.sketches import cms_slot

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    slots = F.array(
        *[cms_slot(F.col("user_id"), j, width) for j in range(depth)]
    )
    return (
        src.select(
            F.window("ts", window).alias("win"),
            F.posexplode(slots).alias("cms_row", "cms_slot"),
        )
        .groupBy("win", "cms_row", "cms_slot")
        .agg(F.count(F.lit(1)).alias("cms_cnt"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "cms_row",
            "cms_slot",
            "cms_cnt",
        )
    )


def run_streaming_user_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the windowed CMS pages to completion via the memory sink
    (complete mode) and return the result table."""
    name = f"stream_cms_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_user_freq_cms(streaming_events_source(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_bloom_novelty(
    spark: SparkSession, sf_dir: str, m_bits: int = 131072, k_hashes: int = 7
) -> DataFrame:
    """Streaming novelty gate against a HISTORY Bloom filter: events
    whose event_id hits all k bits of the filter built over the
    'historical' half (hash gate, salt 'hist') are dropped in-flight;
    everything else streams through. The filter is an inline EXPRESSION
    over a dense word-list literal (``sketches.bloom_contains_expr``) —
    ZERO streaming state, no stream-side join — which is the 100 TB/day
    posture for dedup-vs-history: exact per-key state grows with the
    corpus, the Bloom gate is a constant-size broadcastable literal
    with a sized, deterministic false-drop rate. Returns the streamed
    (batch) result table."""
    import uuid as _uuid

    from esther_apache_spark_spark.operators import sketches as SK
    from esther_apache_spark_spark.operators.sampling import hash_bucket
    from esther_apache_spark_spark.schemas import load_table

    hist = load_table(spark, sf_dir, "events").filter(
        hash_bucket(F.col("event_id"), salt="hist") < int(0.5 * (1 << 32))
    )
    dense = SK.bloom_words_dense(
        SK.bloom_words(hist, "event_id", m_bits=m_bits, k_hashes=k_hashes, salt="sbloom"),
        m_bits,
    )
    name = f"stream_bloom_{_uuid.uuid4().hex[:8]}"
    q = (
        streaming_events_source(spark, sf_dir)
        .filter(
            ~SK.bloom_contains_expr(
                F.col("event_id"), dense, m_bits, k_hashes, salt="sbloom"
            )
        )
        .select("event_id", "user_id", "event_type")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_minhash_novelty(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
    hist_frac: int | None = None,
    hist_salt: str = "incrmh",
) -> DataFrame:
    """Streaming NEAR-dup novelty gate against the persisted MinHash
    band index of ``operators/incremental.py`` — the banded sibling of
    ``run_stream_bloom_novelty`` (exact ids), sharing ONE index format
    with the batch ingest path (VERDICT r8 #6): the nightly job writes
    ``bucket_reps``; both the batch merge and this stream probe it.

    Per micro-batch (foreachBatch — the banding needs a batch context:
    signature frames cache, and the probe is an ordinary equi-join):
    arriving docs are banded, band keys semi-joined against the index's
    (band, bucket) set, and docs with NO bucket co-occupancy in history
    — no LSH near-dup candidate — pass through as novel. Docs with
    empty/whitespace text share the sentinel signature, so they are
    novel only if history has no such doc; null-text docs never band
    and always pass. The index is RE-READ each micro-batch, so a
    concurrent nightly rebuild is picked up at the next trigger —
    streaming state is ZERO (the gate is a join against storage, not a
    state store), which is the 100 TB/day posture: per-key streaming
    state grows with corpus age, the index is already maintained by the
    batch path. Returns the accumulated (batch) novel-docs table."""
    import tempfile as _tempfile

    from esther_apache_spark_spark.operators import dedup as D
    from esther_apache_spark_spark.operators.incremental import HIST_GATE_FRAC
    from esther_apache_spark_spark.operators.sampling import hash_bucket
    from esther_apache_spark_spark.schemas import TESTDATA

    # ADVICE r9: the history/batch split derives from the ONE shared
    # constant (and is overridable), so the plan entry, this gate, and
    # the DuckDB oracle can never silently desynchronize.
    if hist_frac is None:
        hist_frac = HIST_GATE_FRAC
    out_dir = _tempfile.mkdtemp(prefix="stream_mh_novel_")

    src = (
        spark.readStream.schema(TESTDATA["documents"])
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(hash_bucket(F.col("doc_id"), salt=hist_salt) >= hist_frac)
    )

    def _gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        from esther_apache_spark_spark.operators.incremental import (
            read_index_tables,
        )

        # snapshot-aware: on a snapshot-store index this pins one
        # manifest version per trigger, so a nightly fold committing
        # mid-stream is picked up atomically at the NEXT trigger
        reps = read_index_tables(spark, index_path, ["bucket_reps"])[
            "bucket_reps"
        ]
        sig = D.minhash_band_frame(
            batch_df,
            num_perm=num_perm,
            bands=bands,
            shingle_n=shingle_n,
            hash_family=hash_family,
        )
        bband = sig.select("_id", F.posexplode("_bh").alias("_band", "_bucket"))
        hits = (
            bband.join(
                reps.select("_band", "_bucket"), ["_band", "_bucket"], "semi"
            )
            .select(F.col("_id").alias("doc_id"))
            .distinct()
        )
        novel = batch_df.join(hits, "doc_id", "left_anti").select(
            "doc_id", "lang"
        )
        try:
            novel.write.mode("append").parquet(out_dir)
        finally:
            # the band frame persists per micro-batch (module cache
            # doctrine); on an unbounded stream those entries would
            # accumulate one per trigger — release each after its
            # batch's write consumed it
            sig.unpersist()

    q = src.writeStream.foreachBatch(_gate_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir)


def run_stream_srp_novelty(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int | None = 4096,
    hist_frac: int | None = None,
    hist_salt: str = "incrsem",
) -> DataFrame:
    """Streaming SEMANTIC novelty gate — the embedding twin of
    ``run_stream_minhash_novelty`` (VERDICT r9 #4): arriving embeddings
    are gated against the persisted SRP index the batch merge maintains
    (``operators/incremental.py`` — ONE index format for both ingest
    paths). Unlike the minhash gate, bucket co-occupancy alone is only
    a CANDIDATE here — the gate needs the index's ``vectors`` copy for
    the exact 4-dp cosine ≥ ``threshold`` rerank, via the SAME probe
    the batch merge runs (``srp_batch_history_hits``: bucket equi-join,
    hot-bucket history sharding, per-(table, bucket, shard) cross-GEMM).
    Vectors with NO reranked history hit have no near-duplicate
    anywhere in history — novel, streamed through; the rest are held
    for the batch merge.

    Same 100 TB posture as the minhash gate: ZERO streaming state (the
    gate is a join against storage — per-key state would grow with
    corpus age), index re-read each trigger (a concurrent nightly
    rebuild is picked up at the next trigger), per-trigger plan-barrier
    caches released via ``cache_scope``. Returns the accumulated
    (batch) novel-vectors table."""
    import tempfile as _tempfile

    from esther_apache_spark_spark.operators import dedup as D
    from esther_apache_spark_spark.operators import incremental as I
    from esther_apache_spark_spark.operators.sampling import hash_bucket
    from esther_apache_spark_spark.schemas import TESTDATA

    if hist_frac is None:
        hist_frac = I.HIST_GATE_FRAC
    out_dir = _tempfile.mkdtemp(prefix="stream_srp_novel_")

    src = (
        spark.readStream.schema(TESTDATA["embeddings"])
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .filter(hash_bucket(F.col("vec_id"), salt=hist_salt) >= hist_frac)
    )

    def _gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        # a trigger whose rows all fall in the history slice yields an
        # empty batch; with dim=None the probe's dim inference would
        # raise inside foreachBatch and kill the whole stream — an
        # empty batch gates to an empty novel set, so skip it
        if batch_df.isEmpty():
            return
        # snapshot-aware AND version-consistent: buckets and vectors
        # come from one pinned manifest on a snapshot-store index — the
        # cosine rerank must never join a newer buckets table against
        # an older vectors table
        idx = I.read_index_tables(spark, index_path, ["buckets", "vectors"])
        buckets, vectors = idx["buckets"], idx["vectors"]
        with D.cache_scope():
            hits = (
                I.srp_batch_history_hits(
                    batch_df,
                    buckets,
                    vectors,
                    threshold=threshold,
                    n_planes=n_planes,
                    n_tables=n_tables,
                    seed=seed,
                    dim=dim,
                    max_bucket=max_bucket,
                )
                .select(F.col("_bid").alias("vec_id"))
                .distinct()
            )
            novel = batch_df.join(hits, "vec_id", "left_anti").select(
                "vec_id", "label"
            )
            # materialize INSIDE the scope (the scope unpersists the
            # probe's plan-barrier caches on exit — r9's per-trigger
            # cache-release doctrine, a44b097)
            novel.write.mode("append").parquet(out_dir)

    q = src.writeStream.foreachBatch(_gate_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import os as _os

    if not any(n.endswith(".parquet") for n in _os.listdir(out_dir)):
        # every trigger was empty (all rows in the history slice):
        # nothing was appended, so build the empty result directly
        return spark.createDataFrame([], TESTDATA["embeddings"]).select(
            "vec_id", "label"
        )
    return spark.read.parquet(out_dir)


def _transitions_update(key, pdfs, state):
    """The ``applyInPandasWithState`` fold for
    ``event_transitions_stream`` — module-level so the cross-batch
    bridge semantics are unit-testable against a fake GroupState.
    State: the user's LAST event as (ts int64-ns, event_id, type)."""
    import bisect

    import pandas as pd

    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts_ns = pd.to_datetime(pdf["ts"]).astype("int64").tolist()
    eids = pdf["event_id"].astype("int64").tolist()
    types = pdf["event_type"].tolist()
    if state.exists:
        last_ts, last_eid, last_type = state.get
        # Merge the saved event into the batch's (ts, event_id) total
        # order instead of assuming it precedes every row: in-order
        # delivery inserts at 0 (the old prepend), while a late-arriving
        # batch folds against the saved event at its true position —
        # single-event history, so this is the best non-retractive fold;
        # exact equality with the batch twin still requires per-user
        # in-order arrival (see event_transitions_stream's docstring).
        pos = bisect.bisect_right(list(zip(ts_ns, eids)), (last_ts, last_eid))
        ts_ns.insert(pos, last_ts)
        eids.insert(pos, last_eid)
        types.insert(pos, last_type)
    if types:
        state.update((ts_ns[-1], eids[-1], types[-1]))
    pairs: dict[tuple[str, str], int] = {}
    for a, b in zip(types, types[1:]):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
    if pairs:
        yield pd.DataFrame(
            {
                "from_type": [k[0] for k in pairs],
                "to_type": [k[1] for k in pairs],
                "n": list(pairs.values()),
            }
        )


def event_transitions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming event-transition counter — the streaming twin
    of the batch `event_transition_matrix` pair counts:
    ``applyInPandasWithState`` keeps each user's LAST (ts, event_id,
    event_type) across micro-batches, sorts each batch's rows by
    (ts, event_id) — the same total order the batch lead() window uses —
    emits that batch's (from, to) transition counts including the bridge
    from the saved state, and saves the new last event. State is O(1)
    per user (one struct), not the event history.

    Order contract (documented, standard for order-sensitive stateful
    ops): across micro-batches the count equals the batch twin when
    arrival respects event time per user — the file source replays one
    file per trigger in order, and a production deployment either
    partitions the bus by user with in-order delivery or buffers within
    a watermark before folding. The saved event carries its (ts,
    event_id), and each batch MERGES it into the batch's total order
    (bisect insert) rather than blindly prepending — in-order delivery
    reduces to the prepend, while a late batch folds against the saved
    event at its true position (single-event history: the best
    non-retractive behavior, and out-of-order arrival is now detectable
    from state rather than silently miscounted). The driver-facing result aggregates the
    per-batch emissions, so emission slicing never changes totals.

    STATE-SCHEMA BREAK (ADVICE r06): the state widened from
    ``last_type string`` to ``(last_ts, last_event_id, last_type)`` when
    the merge-by-position contract landed; a restart against a
    checkpoint written by the old single-column schema fails state
    deserialization. Harmless for this repo's fresh-tmp-checkpoint
    drivers, but a production deployment upgrading across that change
    needs a NEW checkpoint location (or a one-off state migration) —
    the same caveat class as the batch/stream equality notes above."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = streaming_events_source(spark, sf_dir)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        _transitions_update,
        outputStructType="from_type string, to_type string, n long",
        stateStructType="last_ts long, last_event_id long, last_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"transitions_{uuid.uuid4().hex[:8]}"
    q = (
        updates.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n"))
    )


def _write_sentinel_event(
    dst_dir: str,
    src_file: str,
    ts_us: int,
    event_id: int,
    event_type: str = "flush",
) -> None:
    """Write a one-row parquet with the SAME arrow schema (incl. the
    ts unit) as ``src_file``: a far-future sentinel event for a
    negative user. Its only job is to advance the global watermark (or,
    for per-key stateful ops, to CLOSE the key's open unit — pass the
    real ``event_type``) so state flushes; the caller filters
    ``user_id >= 0`` / the sentinel's own never-closing unit out of the
    result."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pa.schema(
        [pa.field(f.name, f.type) for f in pq.ParquetFile(src_file).schema_arrow]
    )
    vals = {
        "event_id": event_id,
        "user_id": -1,
        "event_type": event_type,
        "value": 0.0,
        "props": None,
    }
    cols = []
    for f in sch:
        if f.name == "ts":
            unit = getattr(f.type, "unit", "us")
            scale = {"s": 10**-6, "ms": 10**-3, "us": 1, "ns": 10**3}[unit]
            cols.append(pa.array([int(ts_us * scale)], type=pa.int64()).cast(f.type))
        else:
            cols.append(pa.array([vals.get(f.name)], type=f.type))
    path = os.path.join(dst_dir, f"zz_flush_{event_id & 0xFFFF:04x}.parquet")
    pq.write_table(pa.table(cols, schema=sch), path)
    now = time.time()
    os.utime(path, (now, now))


def run_streaming_session_agg(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native ``session_window`` sessionization as a streaming query —
    the streaming twin of the batch ``session_window_agg``, driven to
    EXACT equality (not prefix containment).

    Session aggregation streams only in append/update mode with a
    watermark, and append emits a session only once the watermark
    passes its end. A bounded file stream's watermark stalls at
    ``max(ts) - delay``, which would strand every session ending in the
    final delay horizon — so after draining the real file we write a
    far-future SENTINEL event (user_id = -1) and drain again, twice:
    the first sentinel batch advances the watermark past all real
    sessions, the second forces one more micro-batch in which that
    advanced watermark evicts + emits the remaining state (eviction
    happens in the batch AFTER the watermark moves). The sentinel's own
    session is filtered out by ``user_id >= 0``.

    Scale shape: state is one struct per OPEN (user, session), GC'd by
    the watermark — bounded by active users × gap, independent of
    stream length; the shuffle is the same (user) hash exchange as the
    batch groupBy."""
    import os
    import shutil
    import tempfile
    import time

    from esther_apache_spark_spark.schemas import (
        _EVENTS_RAW,
        _events_ts_unit,
        load_table,
    )

    tmp = tempfile.mkdtemp(prefix="stream_session_")
    try:
        src = f"{sf_dir}/events.parquet"
        copy = os.path.join(tmp, "00_events.parquet")
        shutil.copy(src, copy)
        t0 = time.time() - 60
        os.utime(copy, (t0, t0))

        max_ts_us = (
            load_table(spark, sf_dir, "events")
            .agg(F.max(F.unix_micros("ts")).alias("m"))
            .collect()[0]["m"]
        )

        if _events_ts_unit(copy) == "ns":
            raw = spark.readStream.schema(_EVENTS_RAW).parquet(tmp)
            stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            stream = spark.readStream.schema(TESTDATA["events"]).parquet(tmp)

        sessions = (
            stream.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
                .cast("double")
                .alias("total_value"),
            )
            .select(
                "user_id",
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                "n_events",
                "total_value",
            )
        )
        name = f"stream_session_{uuid.uuid4().hex[:8]}"
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            day_us = 86_400_000_000
            _write_sentinel_event(tmp, copy, max_ts_us + 30 * day_us, -1)
            q.processAllAvailable()
            _write_sentinel_event(tmp, copy, max_ts_us + 60 * day_us, -2)
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).filter(F.col("user_id") >= 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_streaming_interval_coverage(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Interval-union coverage as a STREAMING query — the paradigm-twin
    proof that `session_window` IS the gaps-and-islands operator: an
    island of 5-minute activity intervals is exactly a session with a
    5-minute gap (win.end = last_ts + gap, so covered micros =
    win.end − win.start ≡ the batch op's max(e) − min(s)). Per user it
    emits (n_islands, covered_us, longest_us) from the session rows the
    stream produced.

    Boundary convention: session windows are HALF-OPEN — an event
    arriving exactly gap after the previous one starts a NEW session
    (merge requires ts < prev_end), where the batch
    `interval_union_coverage` merges exact-touch intervals (s > pmax
    starts an island). The oracle for this query states the strict
    (>=) convention, so the two catalog entries pin both conventions
    explicitly rather than papering over the edge case.

    Same sentinel-flush drive as `run_streaming_session_agg` (append
    mode emits a session only after the watermark passes its end; two
    far-future sentinel events advance the watermark, then force the
    eviction micro-batch). State is one struct per OPEN (user, session),
    watermark-GC'd — bounded by active users, independent of stream
    length."""
    import os
    import shutil
    import tempfile
    import time

    from esther_apache_spark_spark.schemas import (
        _EVENTS_RAW,
        _events_ts_unit,
        load_table,
    )

    tmp = tempfile.mkdtemp(prefix="stream_islands_")
    try:
        src = f"{sf_dir}/events.parquet"
        copy = os.path.join(tmp, "00_events.parquet")
        shutil.copy(src, copy)
        t0 = time.time() - 60
        os.utime(copy, (t0, t0))

        max_ts_us = (
            load_table(spark, sf_dir, "events")
            .agg(F.max(F.unix_micros("ts")).alias("m"))
            .collect()[0]["m"]
        )

        if _events_ts_unit(copy) == "ns":
            raw = spark.readStream.schema(_EVENTS_RAW).parquet(tmp)
            stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            stream = spark.readStream.schema(TESTDATA["events"]).parquet(tmp)

        sessions = (
            stream.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_micros("win.start").alias("s_us"),
                F.unix_micros("win.end").alias("e_us"),
            )
        )
        name = f"stream_islands_{uuid.uuid4().hex[:8]}"
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            day_us = 86_400_000_000
            _write_sentinel_event(tmp, copy, max_ts_us + 30 * day_us, -1)
            q.processAllAvailable()
            _write_sentinel_event(tmp, copy, max_ts_us + 60 * day_us, -2)
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.table(name)
            .filter(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_islands"),
                F.sum(F.col("e_us") - F.col("s_us")).cast("long").alias(
                    "covered_us"
                ),
                F.max(F.col("e_us") - F.col("s_us")).cast("long").alias(
                    "longest_us"
                ),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_streaming_late_data_audit(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermark LATE-DATA accounting, driven deterministically: the
    events table is split into an on-time feed (event_id % 7 != 0) and
    a delayed feed (% 7 == 0) arriving one micro-batch later — the
    replayed-old-partition scenario. After the on-time batch the global
    watermark stands at max(on-time ts) − delay, so delayed rows whose
    tumbling window has already closed (window end ≤ watermark) are
    DROPPED by the aggregation, and rows for still-open windows are
    absorbed. The emitted per-(window, type) counts therefore encode
    exactly which late rows survived — the oracle replays the rule in
    SQL (b2 kept iff window_end > max(b1.ts) − delay), so the
    engine's documented drop semantics are PINNED by a hash-equal
    batch query rather than prose.

    Drive mechanics: two ordered parquet feeds with batch boundaries
    forced by ``processAllAvailable`` between file drops (watermark
    updates at batch boundaries — the delayed batch is filtered by the
    watermark the on-time batch established), then the standard
    two-round far-future sentinel flush to evict append-mode state.
    State is one row per open (window, type), watermark-GC'd."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from esther_apache_spark_spark.functions.money import dec2
    from esther_apache_spark_spark.schemas import _EVENTS_RAW, _events_ts_unit

    tmp = tempfile.mkdtemp(prefix="stream_late_")
    try:
        src = f"{sf_dir}/events.parquet"
        tbl = pq.read_table(src)
        rem = pc.cast(
            pc.subtract(
                tbl["event_id"], pc.multiply(pc.divide(tbl["event_id"], 7), 7)
            ),
            "int64",
        )
        ontime = tbl.filter(pc.not_equal(rem, 0))
        delayed = tbl.filter(pc.equal(rem, 0))
        f1 = os.path.join(tmp, "00_ontime.parquet")
        pq.write_table(ontime, f1)
        t0 = time.time() - 60
        os.utime(f1, (t0, t0))

        if _events_ts_unit(src) == "ns":
            raw = spark.readStream.schema(_EVENTS_RAW).parquet(tmp)
            stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            stream = spark.readStream.schema(TESTDATA["events"]).parquet(tmp)

        # NOTE: the flush sentinels must NOT be filtered before the
        # aggregation — a pre-watermark filter gets pushed below the
        # EventTimeWatermark node by Catalyst, and the sentinel then
        # never advances the watermark. They group into their own
        # far-future 'flush' window, removed post-agg instead.
        agg = (
            stream.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum((dec2("value") * 100).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .select(
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "total_cents",
            )
        )
        name = f"stream_late_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            f2 = os.path.join(tmp, "01_delayed.parquet")
            pq.write_table(delayed, f2)
            now = time.time()
            os.utime(f2, (now, now))
            q.processAllAvailable()
            max_ts_us = (
                pc.max(pc.cast(tbl["ts"], "int64")).as_py()
            )
            if _events_ts_unit(src) == "ns":
                max_ts_us //= 1000
            day_us = 86_400_000_000
            _write_sentinel_event(tmp, src, max_ts_us + 30 * day_us, -1)
            q.processAllAvailable()
            _write_sentinel_event(tmp, src, max_ts_us + 60 * day_us, -2)
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name).filter(F.col("event_type") != "flush")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_streaming_psi_bin_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events source through the PSI drift monitor's binned
    count aggregation (fixed 10-bin value histogram × early/late flag,
    exact integer counts), driven to completion via the memory sink in
    complete mode. Returns the final (event_type, bin, c1, c2) counts
    frame — the streaming half of `streaming_psi_drift`; the PSI math
    itself runs batch-side on this bounded model-constant frame.

    This is the standard production split for drift monitoring: the
    streaming job maintains only mergeable integer bin counts (tiny
    state, one row per (type, bin)), and the alarm computation reads
    the state table — restarts and late data change nothing because
    counts are associative."""
    from esther_apache_spark_spark.plans.mlprep import psi_bin_expr

    name = f"stream_psi_{uuid.uuid4().hex[:8]}"
    src = streaming_events_source(spark, sf_dir)
    cnt = (
        src.select("event_type", *psi_bin_expr())
        .groupBy("event_type", "bin")
        .agg(
            F.sum("e").alias("c1"),
            F.sum(F.lit(1) - F.col("e")).alias("c2"),
        )
    )
    q = (
        cnt.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_streaming_moment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events source through an exact integer moment
    aggregation — per type (n, Σcents, Σcents²) in complete mode — and
    return the final state table. The streaming half of
    `streaming_moments_by_type`: moments are associative integer sums
    (DECIMAL(38,0) state), so restarts, reordering and late data cannot
    change the final answer — the canonical mergeable-state shape every
    streaming metrics pipeline should reduce to before deriving
    mean/variance."""
    name = f"stream_mom_{uuid.uuid4().hex[:8]}"
    d38 = "decimal(38,0)"
    src = streaming_events_source(spark, sf_dir)
    cents = F.col("value").cast("decimal(12,2)") * 100
    m = (
        src.select("event_type", cents.cast("long").alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast(d38)).alias("s"),
            F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("ss"),
        )
    )
    q = (
        m.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _daily_anomaly_update(key, pdfs, state):
    """Per-event_type state fold for the daily anomaly z-score stream
    (`streaming_daily_anomaly_zscore`): state carries the OPEN day's
    partial cents plus the exact running moments (n, Σ, Σ²) of every
    COMPLETED day's total. A day closes when a later day arrives for
    the key; closing emits (day, cents, prior n/Σ/Σ²) — the z-score is
    derived from that tuple by the shared batch readout, so stream and
    batch float arithmetic are literally the same expression.

    Order contract (same doctrine as `event_transitions_stream`): days
    are processed in sorted order WITHIN a batch; across batches the
    fold assumes per-key day-ordered arrival (file-per-trigger replay,
    or a day-partitioned bus). A day older than the open day is counted
    into `late_days` state and excluded — visible, never silently
    wrong. Moment bound: Σ² of daily cents is exact in int64 up to
    ~3M-cent days × 10⁶ days; beyond that shard days per key upstream
    (same documented bound class as kmeans_lloyd_summary's inertia)."""
    import pandas as pd

    if state.exists:
        open_day, open_cents, nd, s, ss, late = state.get
    else:
        open_day, open_cents, nd, s, ss, late = None, 0, 0, 0, 0, 0
    days: dict[str, int] = {}
    for pdf in pdfs:
        for d, c in zip(pdf["day"], pdf["cents"]):
            days[d] = days.get(d, 0) + int(c)
    out = []
    for d in sorted(days):
        if open_day is not None and d < open_day:
            late += 1
            continue
        if open_day is None:
            open_day, open_cents = d, 0
        elif d > open_day:
            out.append((key[0], open_day, open_cents, nd, s, ss))
            nd += 1
            s += open_cents
            ss += open_cents * open_cents
            open_day, open_cents = d, 0
        open_cents += days[d]
    state.update((open_day, open_cents, nd, s, ss, late))
    if out:
        yield pd.DataFrame(
            out, columns=["event_type", "day", "cents", "pn", "ps", "pss"]
        )


def daily_anomaly_updates(stream: DataFrame) -> DataFrame:
    """Wire the anomaly state machine onto any events-shaped frame
    (streaming or not must be streaming for applyInPandasWithState):
    projects (event_type, day, exact integer cents) and folds per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = stream.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )
    return rows.groupBy("event_type").applyInPandasWithState(
        _daily_anomaly_update,
        outputStructType="event_type string, day string, cents long, "
        "pn long, ps long, pss long",
        stateStructType="open_day string, open_cents long, nd long, "
        "s long, ss long, late_days long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_anomaly_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the daily anomaly state machine over the events file
    stream to EXACT batch equality: after draining the real file, one
    far-future sentinel row PER REAL EVENT TYPE closes each key's last
    open day (the sentinel's own day never closes, so it never emits —
    no filtering needed). Returns the raw (day, cents, prior-moments)
    emissions; `streaming_daily_anomaly_zscore` applies the shared
    z-score readout."""
    import os
    import shutil
    import tempfile
    import time

    from esther_apache_spark_spark.schemas import (
        _EVENTS_RAW,
        _events_ts_unit,
        load_table,
    )

    tmp = tempfile.mkdtemp(prefix="stream_anom_")
    try:
        src = f"{sf_dir}/events.parquet"
        copy = os.path.join(tmp, "00_events.parquet")
        shutil.copy(src, copy)
        t0 = time.time() - 60
        os.utime(copy, (t0, t0))

        batch_ev = load_table(spark, sf_dir, "events")
        max_ts_us = batch_ev.agg(F.max(F.unix_micros("ts")).alias("m")).collect()[0][
            "m"
        ]
        types = sorted(
            r["event_type"] for r in batch_ev.select("event_type").distinct().collect()
        )

        if _events_ts_unit(copy) == "ns":
            raw = spark.readStream.schema(_EVENTS_RAW).parquet(tmp)
            stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            stream = spark.readStream.schema(TESTDATA["events"]).parquet(tmp)

        name = f"stream_anom_{uuid.uuid4().hex[:8]}"
        q = (
            daily_anomaly_updates(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            day_us = 86_400_000_000
            for i, t in enumerate(types):
                _write_sentinel_event(
                    tmp, copy, max_ts_us + 30 * day_us, -(i + 1), event_type=t
                )
            q.processAllAvailable()
        finally:
            q.stop()
        # materialize: the memory sink's table dies with the next query
        return spark.createDataFrame(
            spark.table(name).collect(), spark.table(name).schema
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
