"""Watermark semantics under MULTIPLE micro-batches: a late row aimed at
an already-emitted window is dropped, and append mode emits exactly the
windows the watermark has closed — never re-emitting or updating one.

The driver-facing streaming queries run availableNow over one static
file (a single batch — nothing is ever late), so this is the test that
proves the watermark actually gates state across batches, not just that
the syntax parses.

Semantics pinned here (empirically verified, and what Spark documents
as the append-mode GUARANTEE): the watermark promises that a window,
once closed and emitted, never changes — so input falling into an
already-closed window MUST be dropped (observable via the
numRowsDroppedByWatermark state metric). Spark does NOT promise eager
dropping of every row older than the watermark: a late row whose window
was never in state may still be accepted and close in the same batch.

Setup: three single-row-group parquet files with staggered modification
times + maxFilesPerTrigger=1 force three ordered micro-batches through
the file source.
"""

from __future__ import annotations

import datetime
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts(hh: int, mm: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hh, mm, 0)


SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
    ]
)

# Batch timeline (10-minute watermark delay, 15-minute windows):
#   b0: 10:00, 10:05, 10:31   -> watermark advances to 10:21
#   b1: 10:50                 -> closes+emits [10:00,10:15) cnt 2;
#                                watermark advances to 10:40
#   b2: 10:10 LATE            -> targets the ALREADY-EMITTED window;
#                                the append guarantee forces a drop
BATCHES = [
    [(_ts(10, 0), "a"), (_ts(10, 5), "a"), (_ts(10, 31), "a")],
    [(_ts(10, 50), "a")],
    [(_ts(10, 10), "a")],
]


@pytest.fixture()
def staged_dir(spark, tmp_path):
    d = str(tmp_path / "stream_src")
    os.makedirs(d)
    for i, rows in enumerate(BATCHES):
        scratch = str(tmp_path / f"w{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(scratch)
        part = next(
            f for f in os.listdir(scratch)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dest = os.path.join(d, f"b{i}.parquet")
        os.rename(os.path.join(scratch, part), dest)
        # File source orders by modification time (oldest first); space
        # the mtimes far apart so the ordering is unambiguous.
        os.utime(dest, (1_000_000 + i * 10_000, 1_000_000 + i * 10_000))
    return d


def test_late_row_into_emitted_window_is_dropped(spark, staged_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("win"), "k")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("start"), "cnt")
    )
    name = "wm_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append = emit only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table(name).collect()
    got = [(r["start"], r["cnt"]) for r in rows]
    # Exactly one emission: [10:00,10:15) with cnt 2 — the late 10:10
    # did NOT bump it to 3 and did NOT trigger a second emission; the
    # [10:30,10:45) window (end 10:45 > final watermark 10:40) and
    # [10:45,11:00) stay open and unemitted.
    assert got == [(_ts(10, 0), 2)], got

    # The engine accounts for the drop explicitly.
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1
    # And the batching premise holds: three input batches of 3/1/1 rows.
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"]]
    assert sizes == [3, 1, 1]


def test_same_data_single_batch_counts_everything(spark, staged_dir):
    # Control: batch semantics over the same files count all 5 rows —
    # proving the streaming result above reflects watermark dropping,
    # not data loss in the fixture.
    df = spark.read.schema(SCHEMA).parquet(staged_dir)
    assert df.count() == 5
