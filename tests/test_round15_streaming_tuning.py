"""Round-15 pins for the streaming state-partition tuning (VERDICT
r14 item 5): stateful streaming queries run under a state-volume-
scaled shuffle-partition count (stream_state_partitions), pinned for
the start..awaitTermination span and restored afterwards. Measured at
sf0.01: stream-stream joins ~5.5 s -> ~2.2 s, windowed aggs ~1.8x
down, identical results (BASELINE.md round 15)."""

from __future__ import annotations

import pytest

from mapreduceframework_spark.streaming.windows import (
    _tuned_state_partitions,
    run_available_now,
    stream_state_partitions,
)


def test_default_scales_with_session_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert stream_state_partitions(spark) == 8
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        assert stream_state_partitions(spark) == 50
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        assert stream_state_partitions(spark) == 8  # floor
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_explicit_override_wins(spark):
    try:
        spark.conf.set("mrf.streaming.statePartitions", "64")
        assert stream_state_partitions(spark) == 64
    finally:
        spark.conf.unset("mrf.streaming.statePartitions")


def test_context_restores_batch_setting(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with _tuned_state_partitions(spark):
        inside = spark.conf.get("spark.sql.shuffle.partitions")
        assert int(inside) == stream_state_partitions(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_state_partition_count_lands_in_query(spark, sf_dir):
    # The sink table's state partitioning is invisible after the fact,
    # so assert the observable contract: a streaming agg run through
    # run_available_now completes and the session conf is untouched.
    from pyspark.sql import functions as F

    from mapreduceframework_spark.streaming.windows import (
        read_events_stream,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    out = run_available_now(agg, "complete")
    assert out.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_staged_events_dir_handles_relative_sf_dir(tmp_path):
    """r16 regression (caught by the sf1 scale probe): a RELATIVE
    sf_dir used to produce a dangling symlink inside the staging temp
    dir, and the file stream silently read zero rows. The target must
    be absolutized, and a missing source must fail loudly."""
    import os

    from mapreduceframework_spark.streaming.windows import (
        _staged_events_dir,
    )

    (tmp_path / "events.parquet").write_bytes(b"stub")
    cwd = os.getcwd()
    os.chdir(tmp_path.parent)
    try:
        rel = os.path.relpath(tmp_path)
        d = _staged_events_dir(rel)
        link = os.path.join(d, "events.parquet")
        assert os.path.isabs(os.readlink(link))
        assert os.path.exists(link)  # NOT dangling
    finally:
        os.chdir(cwd)
    with pytest.raises(FileNotFoundError, match="events parquet"):
        _staged_events_dir(str(tmp_path / "nope"))
