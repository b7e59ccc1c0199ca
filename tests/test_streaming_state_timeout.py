"""Custom sessionization with EVENT-TIME TIMERS: applyInPandasWithState
using GroupStateTimeout.EventTimeTimeout across multiple micro-batches.

The driver-facing stateful query (streaming_user_counts_stateful) uses
NoTimeout — state lives forever and emits on every batch. This test
exercises the other half of the state API: a session closes ONLY when
the watermark passes its gap-timeout timestamp, the close fires as a
hasTimedOut invocation with no input rows, and the state is removed.
That timer mechanism is what bounds state size on an unbounded stream —
without it a 100 TB stream accretes a state entry per key forever.
"""

from __future__ import annotations

import datetime
import os
import uuid

import pandas as pd
import pytest
from pyspark.sql import types as T

SESSION_GAP_MIN = 15


def _ts(hh: int, mm: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hh, mm, 0)


SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
    ]
)

# Batch timeline (10-minute watermark delay, 15-minute session gap):
#   b0: a@10:00, a@10:05, b@10:02, clock@10:31
#       -> watermark advances to 10:21 for the next batch
#   b1: clock@10:50
#       -> during b1 the watermark (10:21) has passed a's gap deadline
#          (10:05+15m = 10:20) and b's (10:02+15m = 10:17): BOTH
#          sessions must close via hasTimedOut, with no input rows.
#       'clock' itself (last seen 10:50 and 10:31+15m=10:46 > final
#       watermark 10:40) must NOT emit.
BATCHES = [
    [
        (_ts(10, 0), "a"),
        (_ts(10, 5), "a"),
        (_ts(10, 2), "b"),
        (_ts(10, 31), "clock"),
    ],
    [(_ts(10, 50), "clock")],
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
        os.utime(dest, (1_000_000 + i * 10_000, 1_000_000 + i * 10_000))
    return d


def test_event_time_timeout_closes_sessions(spark, staged_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "n_events": [n],
                    "session_end_us": [last_us],
                }
            )
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = int(
                pdf["ts"].max().to_datetime64().astype("datetime64[us]").astype("int64")
            )
            last_us = max(last_us, batch_max)
        state.update((n, last_us))
        # Close the session when the WATERMARK passes last-event + gap.
        state.setTimeoutTimestamp(
            last_us // 1000 + SESSION_GAP_MIN * 60 * 1000
        )
        yield pd.DataFrame(
            {"user": [], "n_events": [], "session_end_us": []}
        ).astype({"user": str, "n_events": "int64", "session_end_us": "int64"})

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_dir)
    )
    sessions = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user")
        .applyInPandasWithState(
            update,
            outputStructType="user string, n_events long, session_end_us long",
            stateStructType="n long, last_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["user"]: (r["n_events"], r["session_end_us"])
        for r in spark.table(name).collect()
    }
    epoch = datetime.datetime(1970, 1, 1)
    us = lambda hh, mm: int(  # noqa: E731
        (_ts(hh, mm) - epoch).total_seconds() * 1_000_000
    )
    assert got == {
        "a": (2, us(10, 5)),
        "b": (1, us(10, 2)),
    }, got
