"""Data-shape tripwires: fail LOUDLY if the driver testdata silently
changes shape or encoding.

Motivation (round 4 post-mortem): the events loader misread the parquet
timestamp unit and every event collapsed from a month of 2024 into 43
minutes of 1970 — and nothing failed locally for two rounds, because no
test pinned ABSOLUTE time or absolute row counts. These tests are that
pin: a unit regression, a truncated file, or a regenerated dataset with
a different epoch now fails here with a message naming the table.
"""

from __future__ import annotations

import datetime
import os
import re

import pytest

from mapreduceframework_spark.sources.registry import TABLES, load_table


def _sf_factor(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        pytest.skip(f"cannot parse scale factor from {sf_dir!r}")
    return float(m.group(1))


# Rows-per-table at sf=1.0 for the linearly-scaled tables (TESTDATA.md:
# lineitem ~6M x sf; others measured across all three generated SFs).
_SCALED_ROWS_SF1 = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
}
_FIXED_ROWS = {"region": 5, "nation": 25}


@pytest.mark.parametrize("name", sorted(TABLES))
def test_row_counts_order_of_magnitude(spark, sf_dir, name):
    n = load_table(spark, sf_dir, name).count()
    if name in _FIXED_ROWS:
        assert n == _FIXED_ROWS[name], f"{name}: {n} rows, expected {_FIXED_ROWS[name]}"
    elif name in _SCALED_ROWS_SF1:
        want = _SCALED_ROWS_SF1[name] * _sf_factor(sf_dir)
        assert want / 3 <= n <= want * 3, (
            f"{name}: {n} rows, expected ~{want:.0f} (within 3x) at {sf_dir}"
        )
    else:  # documents / embeddings: sub-linear generation, just non-trivial
        assert n >= 100, f"{name}: only {n} rows at {sf_dir}"


def test_events_ts_spans_2024(spark, sf_dir):
    """THE unit tripwire: events.ts must be real 2024 wall-clock time.

    A nanos-as-micros misread lands in 1970; a micros-as-nanos misread
    lands in year ~55900. Both are far outside this window. Also pin the
    span: the generator emits ~a month of events, so min/max collapsing
    to under a day means the time axis got compressed.
    """
    import pyspark.sql.functions as F

    row = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    lo, hi = row["lo"], row["hi"]
    assert datetime.datetime(2023, 12, 31) <= lo <= datetime.datetime(2025, 1, 1), lo
    assert datetime.datetime(2023, 12, 31) <= hi <= datetime.datetime(2025, 1, 1), hi
    assert (hi - lo) >= datetime.timedelta(days=1), f"span collapsed: {lo}..{hi}"


def test_events_ts_unit_probe(sf_dir):
    """The footer probe must agree with what pyarrow reads directly —
    asserted as EQUALITY, not mere membership, so a probe bug (or a
    stale cache entry) cannot hide behind the other encoding."""
    import pyarrow.parquet as pq

    from mapreduceframework_spark.sources.registry import events_ts_unit

    path = f"{sf_dir}/events.parquet"
    direct = pq.ParquetFile(path).schema_arrow.field("ts").type.unit
    assert events_ts_unit(path) == direct
    assert direct in ("us", "ns")


def test_events_ts_unit_cache_invalidates_on_rewrite(tmp_path):
    """Regenerating a file in place (same path, new encoding) must not
    serve the old cached unit — the r4 failure mode."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduceframework_spark.sources.registry import events_ts_unit

    p = str(tmp_path / "events.parquet")
    t_us = pa.table({"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us"))})
    pq.write_table(t_us, p)
    assert events_ts_unit(p) == "us"
    t_ns = pa.table({"ts": pa.array([1], pa.timestamp("ns"))})
    pq.write_table(t_ns, p)
    os.utime(p, (4_000_000_000, 4_000_000_000))  # force a distinct mtime
    assert events_ts_unit(p) == "ns"


def test_events_ts_unit_directory_probes_all_files(tmp_path):
    """A directory dataset must probe EVERY part-file: agreement returns
    the shared unit; a mixed-encoding dataset raises instead of silently
    misreading all-but-the-first file 1000x (the probe's raison d'etre)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduceframework_spark.sources.registry import events_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    t_us = pa.table({"ts": pa.array([1_700_000_000_000_000], pa.timestamp("us"))})
    pq.write_table(t_us, str(d / "part-000.parquet"))
    pq.write_table(t_us, str(d / "part-001.parquet"))
    assert events_ts_unit(str(d)) == "us"

    t_ns = pa.table({"ts": pa.array([1], pa.timestamp("ns"))})
    pq.write_table(t_ns, str(d / "part-002.parquet"))
    with pytest.raises(ValueError, match="mixed ts encodings"):
        events_ts_unit(str(d))


def test_orders_dates_span_years(spark, sf_dir):
    """o_orderdate must be plausible TPC-H-era dates (not epoch)."""
    import pyspark.sql.functions as F

    row = (
        load_table(spark, sf_dir, "orders")
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()[0]
    )
    assert row["lo"].year >= 1990, row["lo"]
    assert row["hi"].year <= 2030, row["hi"]


def test_lineitem_orderkey_linenumber_not_unique(spark, sf_dir):
    """(l_orderkey, l_linenumber) has DUPLICATES in this synthetic data
    (unlike real TPC-H, where it is the primary key) — the data
    property that made window_moving_avg's original ROWS frame
    underdetermined: a frame ordered by a non-unique key permutes tied
    rows at the engine's whim (DuckDB's parallel window execution
    flipped run to run at sf0.1). Window queries over lineitem must
    therefore carry a tiebreak column; if this tripwire ever fails
    (data became unique), those tiebreaks are dead weight, not bugs."""
    import pyspark.sql.functions as F

    dups = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dups > 0


def test_moving_avg_oracle_is_run_deterministic(oracle_con):
    """The window_moving_avg DuckDB oracle must hash identically across
    runs — this exact query produced three different results in three
    runs before the total-order + integer-cents fix, which a
    single-shot parity check can never catch."""
    from mapreduceframework_spark.plans.registry import all_queries

    sql = all_queries()["window_moving_avg"].oracle
    a = oracle_con.execute(sql).fetchdf()
    key = ["l_suppkey", "l_orderkey", "l_linenumber", "ma4"]
    a = a.sort_values(key).reset_index(drop=True)
    for _ in range(2):
        b = (
            oracle_con.execute(sql)
            .fetchdf()
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert a.equals(b)
