"""True streaming semantics the oracle-parity harness can't see:
watermark-based late-data drop across micro-batches."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from mapreduceframework_spark.streaming.windows import run_available_now


def _write(path, rows):
    ts, key = zip(*rows)
    table = pa.table(
        {
            "ts": pa.array([datetime(2024, 1, 1, *t) for t in ts],
                           type=pa.timestamp("us")),
            "k": pa.array(key),
        }
    )
    pq.write_table(table, path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Batch 1 advances the watermark past an old window; batch 2's
    late row for that window must be discarded, not re-opened —
    bounded state is what makes streaming viable on an unbounded
    stream."""
    from pyspark.sql import functions as F

    import os

    d = tmp_path / "stream"
    d.mkdir()
    # batch 0: one event in the 09:00 window + one at 11:00 whose event
    # time will advance the watermark to 10:50 (>> 09:05 window end).
    # The watermark takes effect one batch after the events that move it
    # (it commits at batch boundaries), so batch 1 is a spacer and the
    # late row arrives in batch 2, where the filter is active.
    _write(str(d / "0.parquet"), [((9, 1, 0), "a"), ((11, 0, 0), "b")])
    _write(str(d / "1.parquet"), [((11, 1, 0), "c")])
    _write(str(d / "2.parquet"), [((9, 2, 0), "late")])
    # the file source orders batches by modification time — pin it
    for i in range(3):
        t = 1_700_000_000 + i * 100
        os.utime(d / f"{i}.parquet", (t, t))

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("win"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "cnt")
    )
    out = run_available_now(agg, "append")
    rows = {r["win_start"].strftime("%H:%M"): r["cnt"] for r in out.collect()}
    # the 09:00 window was finalized with ONLY the batch-1 event; the
    # late batch-2 row did not resurrect it
    assert rows.get("09:00") == 1


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """foreachBatch — the production sink escape hatch (idempotent
    batch-id-addressed writes to arbitrary stores): stream the events
    aggregation into per-batch parquet dirs; the union of batches must
    equal the batch-mode aggregate."""
    from pyspark.sql import functions as F

    from mapreduceframework_spark.sources import load_table
    from mapreduceframework_spark.streaming.windows import read_events_stream

    out_dir = tmp_path / "sink"

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            str(out_dir / f"batch={batch_id}")
        )

    counts = read_events_stream(spark, sf_dir).groupBy("event_type").agg(
        F.count("*").alias("cnt")
    )
    q = (
        counts.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_type"], r["cnt"])
        for r in spark.read.parquet(str(out_dir / "batch=0")).collect()
    }
    want = {
        (r["event_type"], r["cnt"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want


def test_stateful_counts_accumulate_across_batches(spark, tmp_path):
    """GroupState must PERSIST between micro-batches: the same user's
    events split across two triggers, and the second batch's emission
    must report the running total, not restart from zero — this is the
    property that separates engine-managed state from a per-batch
    groupBy."""
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = tmp_path / "stream"
    d.mkdir()
    _write(str(d / "0.parquet"), [((9, 0, 0), "u1"), ((9, 1, 0), "u1")])
    _write(str(d / "1.parquet"), [((9, 2, 0), "u1"), ((9, 3, 0), "u2")])
    for i in range(2):
        t = 1_700_000_000 + i * 100
        os.utime(d / f"{i}.parquet", (t, t))

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    counts = stream.groupBy("k").applyInPandasWithState(
        update,
        outputStructType="k string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_available_now(counts, "update")
    # update-mode memory sink keeps every emission: u1 must appear with
    # 2 (after batch 0) AND 3 (after batch 1); u2 once with 1.
    got = {(r["k"], r["n"]) for r in out.collect()}
    assert (("u1", 2) in got) and (("u1", 3) in got)
    assert ("u2", 1) in got


def test_event_time_timeout_evicts_idle_state(spark, tmp_path):
    """GroupStateTimeout.EventTimeTimeout: a group idle past its timeout
    timestamp must get a final hasTimedOut callback once the WATERMARK
    (not wall clock) passes it — emit-on-expiry, then the state is
    gone. This is the eviction half of custom stateful operators: with
    NoTimeout, an idle key's state lives forever and a 100 TB stream
    accretes unbounded state; event-time timeout ties eviction to the
    same monotonic clock that drops late data."""
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = tmp_path / "stream"
    d.mkdir()
    # batch 0: two u1 events around 09:00 -> u1 state, timeout set to
    # last-seen + 30 min = 09:31. batch 1: u2 at 11:00 advances the max
    # event time; the watermark (10 min delay -> 10:50) commits at the
    # batch BOUNDARY, so batch 2 is the spacer in which 10:50 > 09:31
    # finally holds and u1's timeout fires.
    _write(str(d / "0.parquet"), [((9, 0, 0), "u1"), ((9, 1, 0), "u1")])
    _write(str(d / "1.parquet"), [((11, 0, 0), "u2")])
    _write(str(d / "2.parquet"), [((11, 1, 0), "u2")])
    for i in range(3):
        t = 1_700_000_000 + i * 100
        os.utime(d / f"{i}.parquet", (t, t))

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"k": [key[0]], "n": [n], "expired": [True]}
            )
            return
        n = state.get[0] if state.exists else 0
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            last_ms = max(
                last_ms, int(pdf["ts"].max().timestamp() * 1000)
            )
        state.update((n,))
        state.setTimeoutTimestamp(last_ms + 30 * 60 * 1000)
        yield pd.DataFrame({"k": [key[0]], "n": [n], "expired": [False]})

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    counts = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("k")
        .applyInPandasWithState(
            update,
            outputStructType="k string, n long, expired boolean",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    out = run_available_now(counts, "update")
    got = {(r["k"], r["n"], r["expired"]) for r in out.collect()}
    # u1 counted 2 while live, then expired with its final count intact
    assert ("u1", 2, False) in got
    assert ("u1", 2, True) in got
    # u2 stayed live (its timeout never passed the final watermark)
    assert ("u2", 1, False) in got and not any(
        k == "u2" and e for k, _, e in got
    )


def test_checkpoint_restart_resumes_without_duplicates(spark, tmp_path):
    """Exactly-once recovery: a checkpointed query stopped and
    restarted must process only NEW files, never re-emit committed
    batches — the property that makes streaming writes idempotent
    end-to-end (checkpoint = source offsets + sink commit log)."""
    import os

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, k string")
            .parquet(str(src))
        )
        q = (
            stream.select("k")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write(str(src / "0.parquet"), [((9, 0, 0), "a"), ((9, 1, 0), "b")])
    os.utime(src / "0.parquet", (1_700_000_000, 1_700_000_000))
    run_once()
    first = [r["k"] for r in spark.read.parquet(sink).collect()]
    assert sorted(first) == ["a", "b"]

    _write(str(src / "1.parquet"), [((9, 2, 0), "c")])
    os.utime(src / "1.parquet", (1_700_000_100, 1_700_000_100))
    run_once()
    second = [r["k"] for r in spark.read.parquet(sink).collect()]
    # 'a'/'b' appear exactly once: the restarted query resumed from the
    # committed offset instead of reprocessing file 0
    assert sorted(second) == ["a", "b", "c"]


def test_left_outer_join_emits_null_rows_on_eviction(spark, sf_dir):
    """The left-outer stream-stream join's whole point: clicks with no
    purchase within 30 min must surface with a NULL purchase_id once
    the watermark evicts their state. Parity proves equality with the
    batch left join; this pins that the null-emission path actually
    fired (a result with only matched rows would pass an inner-join
    oracle too)."""
    from mapreduceframework_spark.plans.registry import all_queries

    out = (
        all_queries()["streaming_click_purchase_left_join"]
        .fn(spark, sf_dir)
        .cache()
    )
    n_null = out.filter("purchase_id IS NULL").count()
    n_matched = out.filter("purchase_id IS NOT NULL").count()
    out.unpersist()
    assert n_null > 0, "no evicted-unmatched clicks emitted"
    assert n_matched > 0, "no matched pairs emitted"
