"""Structured Streaming surface over the events table.

The reference is strictly batch (its barrier at JobContext.cpp:74 ends
the map phase for the whole input before any shuffle) — streaming is
north-star surface. The engine exposes the standard Structured
Streaming shapes: file-source readStream, watermarks, tumbling windows,
and an ``applyInPandasWithState`` custom stateful operator.

API coverage note: arbitrary stateful processing is exposed through
``applyInPandasWithState`` (running_user_counts below). Spark 4's newer
``transformWithStateInPandas`` is NOT used: its state-server protocol
imports ``google.protobuf``, which this container lacks (verified — the
TWS driver worker crashes with ImportError before user code runs); the
older API covers the same per-key mutable-state semantics without that
dependency.

Testing model: the driver's data is one static parquet file, so
streaming queries run with ``trigger(availableNow=True)`` into an
in-memory sink — the full pipeline (source -> watermark -> stateful op
-> sink) executes through the streaming engine, then the sink table is
returned as a batch DataFrame for the oracle comparison. On a real
cluster the same plan runs continuously against an arriving directory /
Kafka source; only the reader and trigger change.

Scale notes: windowed-aggregation state is partitioned by (window, key)
across executors; the watermark bounds state size — without it a 100 TB
stream accretes state forever. availableNow + complete-mode here is a
test harness choice, not the production mode (that's append + watermark
eviction).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import int_round_mean, snap_units

from mapreduceframework_spark.sources.registry import (
    EVENTS_PHYSICAL_NANOS,
    TABLES,
    events_nanos_to_ts,
    events_ts_unit,
    inline_rows_df,
)


def _staged_events_dir(sf_dir: str) -> str:
    """File-source streams read directories; stage the single events
    parquet into a temp dir via symlink (no data copy). The target is
    made ABSOLUTE first: a relative ``sf_dir`` would otherwise
    produce a dangling symlink inside the temp dir and the file
    source would silently read zero files (caught by the r16 sf1
    scale probe, which passed a relative path)."""
    d = tempfile.mkdtemp(prefix="mrf_events_stream_")
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if not os.path.exists(target):
        raise FileNotFoundError(f"events parquet not found: {target}")
    os.symlink(target, os.path.join(d, "events.parquet"))
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of events with the pinned physical schema (file
    streams never infer), unit-aware like the batch loader: the footer
    decides whether ts reads natively (micros) or needs the raw-int64
    nanos conversion."""
    if events_ts_unit(os.path.join(sf_dir, "events.parquet")) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(EVENTS_PHYSICAL_NANOS).parquet(
            _staged_events_dir(sf_dir)
        )
        return events_nanos_to_ts(raw)
    return spark.readStream.schema(TABLES["events"]).parquet(
        _staged_events_dir(sf_dir)
    )


def stream_state_partitions(spark: SparkSession) -> int:
    """Shuffle-partition count for STREAMING queries. Stateful
    operators pay a per-partition-per-micro-batch checkpoint cost
    (state snapshot + delta files) that batch shuffles don't, so the
    right count tracks STATE VOLUME, not batch parallelism — measured
    at sf0.01, dropping 32 -> 8 took the stream-stream joins from
    ~5.5 s to ~2.2 s and the windowed aggs ~1.8x down, with identical
    results (BASELINE.md round 15). Default: a quarter of the session
    shuffle partitions, floor 8; override with the
    ``mrf.streaming.statePartitions`` conf at any scale (at 100 TB
    you RAISE it — state must fit per-partition executor memory;
    the count is pinned into each query's checkpoint at first batch,
    which is why the override is read per query start)."""
    explicit = spark.conf.get("mrf.streaming.statePartitions", None)
    if explicit:
        return max(1, int(explicit))
    base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(8, base // 4)


class _tuned_state_partitions:
    """Context manager: pin spark.sql.shuffle.partitions to the
    streaming-tuned count for the duration of a streaming query's
    plan + execution, restoring the batch setting afterwards. The
    stateful operator reads the conf when the query STARTS (then pins
    it in checkpoint metadata), so the whole start..awaitTermination
    span sits inside the context."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def __enter__(self) -> None:
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(stream_state_partitions(self.spark)),
        )

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def run_available_now(result: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    uniquely-named memory sink; return the sink contents as a batch DF."""
    name = "mrf_sink_" + uuid.uuid4().hex[:12]
    with _tuned_state_partitions(result.sparkSession):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return result.sparkSession.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 5-minute tumbling window counts per event_type,
    through the real streaming engine. With availableNow over a static
    source nothing is late, so the result equals the batch window
    aggregation — which is exactly what the oracle checks."""
    events = read_events_stream(spark, sf_dir).withColumn(
        "v_e4", snap_units("value", 10_000)
    )
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum("v_e4") / 10000.0).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "cnt", "sum_value")
    )
    return run_available_now(agg, "complete")


STATEFUL_OUTPUT_SCHEMA = "user_id long, n_events long"
STATEFUL_STATE_SCHEMA = "n long"


def running_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count held in GroupState across
    micro-batches (the engine-managed, checkpointable state the
    reference's JobContext mutexed globals correspond to). Emits the
    updated count each batch; over availableNow's single batch the
    final emission per user equals the batch groupBy count."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    events = read_events_stream(spark, sf_dir)
    counts = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_available_now(counts, "update")


def sliding_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING windows (10-minute length, 5-minute slide)
    through the streaming engine — every event belongs to two window
    instances, expanded before the stateful aggregation exactly as in
    the batch twin, so the same oracle covers both."""
    events = read_events_stream(spark, sf_dir).withColumn(
        "v_e4", snap_units("value", 10_000)
    )
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("v_e4").alias("s_e4"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "cnt",
            # Same exact-integer mean finisher as the batch twin
            # (round-14 queue item d) — the shared oracle demands it.
            (int_round_mean(F.col("s_e4"), 1, F.col("cnt")) / 10000.0)
            .alias("avg_value"),
        )
    )
    return run_available_now(agg, "complete")


def dedup_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first occurrence of each
    (user_id, event_type) key survives; later arrivals are dropped
    against engine-managed dedup state. Only the key columns are
    emitted, so the append-mode output is deterministically the
    distinct key set. At 100 TB the watermark is what keeps this state
    finite — keys older than the delay are evicted."""
    events = read_events_stream(spark, sf_dir)
    dd = (
        events.withWatermark("ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_available_now(dd, "append")


def click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases within the following 30 minutes. Both sides carry
    watermarks and the join predicate carries the time-range
    constraint — together they bound the buffered state (clicks older
    than watermark + range are evicted); without them a stream-stream
    join accretes state forever."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    return run_available_now(joined, "append")


def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SESSION windows (6-hour inactivity gap) per user
    through the streaming engine. Session windows are the one window
    kind whose extent is data-driven: the stateful operator MERGES
    overlapping [ts, ts+gap) intervals as events arrive, so a session's
    bounds can grow across micro-batches; the watermark is what lets
    the engine finalize (and evict) sessions whose close time has
    passed. Over a static availableNow source every session finalizes,
    so the result equals the batch gaps-and-islands sessionization."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "6 hours").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    return run_available_now(agg, "complete")


def static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the STATIC
    customer dimension (user_id = c_custkey), then aggregated per
    nation. Stream-static joins need no watermark and buffer no state
    for the static side — each micro-batch plans a fresh join against
    the (broadcastable) table, so dimension updates between batches are
    picked up automatically. The 100 TB shape: the stream side never
    shuffles for the join when the dimension broadcasts."""
    from pyspark.sql import functions as F  # noqa: F401 (module-level F ok)

    from mapreduceframework_spark.sources.registry import load_table

    events = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    agg = (
        events.join(cust, events.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_events"))
    )
    return run_available_now(agg, "complete")


def click_purchase_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics the inner
    join (click_purchase_join) can't express: a click with NO purchase
    within 30 minutes must still appear, with nulls. In a streaming
    engine that row can only be emitted when the WATERMARK proves no
    matching purchase can still arrive — i.e. on state EVICTION, not on
    arrival. Matched rows stream out immediately; null rows trail the
    watermark.

    Determinism note: clicks near the end of the input may terminate
    the query still sitting in state (their null verdict never emitted)
    — how many depends on micro-batch boundaries, not semantics. The
    caller therefore restricts the result to the deterministic region
    (clicks old enough that eviction provably happened); the untrimmed
    stream is NOT run-to-run stable and must not be oracle-compared."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id", "click_ts"
    )
    return run_available_now(joined, "append")


def click_purchase_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both eviction semantics
    at once: clicks with no purchase AND purchases with no click each
    surface as null-padded rows once the watermark proves no match can
    still arrive. Matched rows stream out immediately; null rows on
    either side trail the global watermark (min over both sides).

    Determinism: same caveat as click_purchase_left_join, on BOTH
    sides — rows near the end of input may terminate still in state, so
    the caller must restrict to the deterministic region where every
    non-null event time is old enough that eviction provably happened."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "fullOuter",
    ).select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )
    return run_available_now(joined, "append")


ALERT_THRESHOLD_E4 = 5_000_000  # cumulative purchase value 500.0
ALERT_OUTPUT_SCHEMA = "user_id long, crossing_event_id long, cum_e4 long"
ALERT_STATE_SCHEMA = "cum long, alerted boolean"


def spend_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second custom stateful operator: per-user cumulative-spend
    threshold alerting via applyInPandasWithState — emit ONE alert row
    the first time a user's running purchase total crosses
    ALERT_THRESHOLD_E4, then stay silent (the alerted flag lives in
    GroupState across batches; the fraud/budget-alert shape every
    event pipeline ships). Events are folded in (ts, event_id) order
    inside each group so the crossing event is deterministic no matter
    how micro-batches split or order the rows."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        cum, alerted = state.get if state.exists else (0, False)
        rows = []
        for pdf in pdfs:
            for _, r in (
                pdf.sort_values(["ts", "event_id"]).iterrows()
            ):
                if alerted:
                    break
                cum += int(round(float(r["value"]) * 10000))
                if cum >= ALERT_THRESHOLD_E4:
                    alerted = True
                    rows.append((key[0], int(r["event_id"]), cum))
        state.update((cum, alerted))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "crossing_event_id", "cum_e4"]
            )

    events = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id", "value")
    alerts = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_available_now(alerts, "update")


def foreachbatch_upsert_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once foreachBatch sink: per-event_type running counts
    streamed in MULTIPLE micro-batches (the source is re-staged as 4
    files with maxFilesPerTrigger=1, so availableNow delivers ~4
    batches, unlike the single-batch single-file streams above) into a
    batch-id-transactional upsert sink — the canonical idempotent
    `foreachBatch` recipe from the Structured Streaming guide: commit
    (batchId, rows) atomically, SKIP a batchId already committed.

    The re-delivery that makes the guard matter is simulated after the
    stream drains: the final batch is committed AGAIN verbatim, exactly
    what a sink sees when the driver crashes after writing but before
    the checkpoint records the offset. Because the ledger is
    append-only, a broken guard would double-append the last batch and
    every affected key would report deliveries = 2 — and the oracle
    pins deliveries = 1, so exactly-once is value-hash-CHECKED, not
    asserted in prose.

    Sink state is model-sized (|event_type| rows per batch, collected
    like the other streaming scalar reads); production swaps the
    in-memory ledger for a transactional MERGE (Delta/JDBC) keyed the
    same way — the guard logic is identical."""
    import shutil

    from pyspark.sql.window import Window

    from mapreduceframework_spark.sources import load_table

    split_dir = tempfile.mkdtemp(prefix="mrf_events_split_")
    batch_src = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    batch_src.repartition(4).write.mode("overwrite").parquet(split_dir)
    stream = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_dir)
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n_events"))

    ledger: list[tuple[int, str, int]] = []
    committed: set[int] = set()
    delivered: list[tuple[int, list]] = []

    def commit_batch(batch_id: int, rows: list) -> None:
        if batch_id in committed:
            return  # exactly-once: this batch already landed
        ledger.extend(rows)
        committed.add(batch_id)

    def sink(df, batch_id: int) -> None:
        rows = [
            (batch_id, r["event_type"], r["n_events"]) for r in df.collect()
        ]
        delivered.append((batch_id, rows))
        commit_batch(batch_id, rows)

    with _tuned_state_partitions(spark):
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(split_dir, ignore_errors=True)
    # Crash-recovery re-delivery of the final batch, verbatim.
    commit_batch(*delivered[-1])

    ldf = inline_rows_df(
        spark, ledger, "batch_id long, event_type string, n_events long"
    )
    # Upsert view of the append-only ledger: latest batch wins per key;
    # `deliveries` counts ledger rows for that winning batch — the
    # column the exactly-once guarantee pins to 1.
    w = Window.partitionBy("event_type")
    return (
        ldf.withColumn("maxb", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("maxb"))
        .groupBy("event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.count("*").cast("long").alias("deliveries"),
        )
    )


def checkpoint_restart_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed RESTART of a stateful streaming query, as a
    value-checked result instead of a prose claim: the per-user
    running count (the applyInPandasWithState operator from
    running_user_counts) runs as TWO SEPARATE query executions
    sharing ONE checkpoint over a growing source directory —

    - run 1 sees only the even-event_id half of the events table and
      drains (availableNow), persisting source offsets AND the keyed
      state store under the checkpoint;
    - the odd-event_id half then "arrives" in the source directory,
      and run 2 STARTS A NEW QUERY from the same checkpoint.

    Run 2's emissions are the returned result, and they pin BOTH
    recovery guarantees at once:

    - n_events (the state counter) equals the batch count over ALL
      events for that user — possible only if run 2 RESUMED the
      checkpointed state (a fresh state store would report just the
      odd half);
    - n_new (rows ingested by run 2, counted inside the operator)
      equals the user's odd-half count — possible only if run 2 did
      NOT re-read the files run 1 already committed (a wiped offset
      log would replay the even half too).

    The oracle states both columns in batch SQL (count over all rows /
    count over the odd half, for users with at least one odd-half
    event — only they emit in run 2). This is the operational property
    that makes a 100 TB ingest restartable after a crash or deploy:
    the checkpoint, not the directory listing and not the sink, is the
    source of truth. State is one long per user; the restart cost is
    O(state), independent of how much history run 1 ingested."""
    import shutil

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mapreduceframework_spark.sources import load_table

    src_dir = tempfile.mkdtemp(prefix="mrf_events_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="mrf_events_restart_ckpt_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )

    def stage(half_df, name: str) -> None:
        """Materialize one half as a single file inside src_dir (the
        file-arrival simulation from tests/test_streaming_checkpoint)."""
        scratch = tempfile.mkdtemp(prefix=f"mrf_restart_{name}_")
        half_df.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = next(
            f
            for f in os.listdir(scratch)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.replace(
            os.path.join(scratch, part), os.path.join(src_dir, f"{name}.parquet")
        )
        shutil.rmtree(scratch, ignore_errors=True)

    def update(key: tuple, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        n += seen
        state.update((n,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_new": [seen]}
        )

    def run_once(emissions: list) -> None:
        """One query execution against the shared checkpoint. The sink
        is foreachBatch (memory sinks don't support checkpoint
        recovery — the engine rejects the restart outright), appending
        each micro-batch's emissions to the caller's list."""

        def sink(batch_df, _batch_id: int) -> None:
            emissions.extend(
                (r["user_id"], r["n_events"], r["n_new"])
                for r in batch_df.collect()
            )

        stream = spark.readStream.schema(events.schema).parquet(src_dir)
        counts = stream.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, n_new long",
            stateStructType=STATEFUL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        # Both runs inside the context: run 1 pins the partition
        # count into the checkpoint; run 2 must resume under the same
        # setting.
        with _tuned_state_partitions(spark):
            q = (
                counts.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    run2: list[tuple[int, int, int]] = []
    try:
        stage(events.filter(F.col("event_id") % 2 == 0), "even")
        run_once([])  # run 1's emissions are not the checked result

        stage(events.filter(F.col("event_id") % 2 == 1), "odd")
        run_once(run2)
    finally:
        # This row runs at three SFs every window pass — a transient
        # streaming failure must not leak a staged copy of the events
        # table (plus the checkpoint) into /tmp per retry.
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return inline_rows_df(
        spark, run2, "user_id long, n_events long, n_new long"
    )
