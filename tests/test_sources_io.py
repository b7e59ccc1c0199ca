"""Source/sink surface: CSV/JSON/in-memory readers and the file sink
round-trip losslessly with pinned schemas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceframework_spark.sources import io as sio
from mapreduceframework_spark.sources import load_table

SCHEMA = "k long, name string, score double"
ROWS = [(1, "alpha", 0.5), (2, "beta", -1.25), (3, None, 3.0)]


def _expect(df):
    got = sorted([tuple(r) for r in df.collect()])
    assert got == sorted(ROWS)


def test_csv_roundtrip(spark, tmp_path):
    df = sio.from_rows(spark, ROWS, SCHEMA)
    sio.write_table(df, str(tmp_path / "t"), fmt="csv", header="true")
    _expect(sio.read_csv(spark, str(tmp_path / "t"), SCHEMA))


def test_json_roundtrip(spark, tmp_path):
    df = sio.from_rows(spark, ROWS, SCHEMA)
    sio.write_table(df, str(tmp_path / "t"), fmt="json")
    _expect(sio.read_json(spark, str(tmp_path / "t"), SCHEMA))


def test_parquet_sink_partitioned_prunes(spark, tmp_path, sf_dir):
    """partition_by produces hive-style dirs and scans of one partition
    value read only that directory (partition pruning)."""
    orders = load_table(spark, sf_dir, "orders")
    sio.write_table(
        orders, str(tmp_path / "o"), partition_by=["o_orderstatus"]
    )
    statuses = [d.name for d in (tmp_path / "o").iterdir() if d.is_dir()]
    assert all(s.startswith("o_orderstatus=") for s in statuses)
    one = spark.read.parquet(str(tmp_path / "o")).filter(
        F.col("o_orderstatus") == "F"
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus=F" in plan


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,name,score\n1,alpha,not_a_number\n")
    with pytest.raises(Exception, match="(?i)malformed|failfast|cannot"):
        sio.read_csv(spark, str(p), SCHEMA).collect()


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other native columnar format — same write_table /
    pinned-schema read path as parquet."""
    df = sio.from_rows(spark, ROWS, SCHEMA)
    sio.write_table(df, str(tmp_path / "t"), fmt="orc")
    _expect(spark.read.schema(SCHEMA).orc(str(tmp_path / "t")))


def test_text_source_reads_lines(spark, tmp_path):
    """Raw text-line source: one string column named value — the entry
    format for unstructured corpus ingestion before parsing."""
    p = tmp_path / "corpus.txt"
    p.write_text("line one\nline two\n")
    df = spark.read.text(str(p))
    assert [r["value"] for r in df.orderBy("value").collect()] == [
        "line one",
        "line two",
    ]


def test_parquet_zstd_roundtrip(spark, tmp_path):
    """Columnar compression is a first-class scale knob; zstd write
    must round-trip through the standard reader."""
    df = sio.from_rows(spark, ROWS, SCHEMA)
    sio.write_table(
        df, str(tmp_path / "t"), fmt="parquet", compression="zstd"
    )
    files = list((tmp_path / "t").glob("*.zstd.parquet")) or list(
        (tmp_path / "t").glob("*.parquet")
    )
    assert files
    _expect(spark.read.schema(SCHEMA).parquet(str(tmp_path / "t")))


def test_cluster_conf_scales_with_fleet(spark):
    """The cluster profile derives shuffle parallelism from fleet size
    and keeps every scale-critical knob present."""
    from mapreduceframework_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert conf["spark.sql.shuffle.partitions"] == str(2 * 4000)
    for key in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ):
        assert key in conf
    small = cluster_conf(executors=10, cores_per_executor=8)
    assert small["spark.sql.shuffle.partitions"] == str(2 * 80)


def test_compact_table_merges_small_files(spark, tmp_path, sf_dir):
    """Compaction: a directory of many tiny files rewrites to the
    byte-size-derived partition count (here: 1), with identical data."""
    from mapreduceframework_spark.sources import load_table
    from mapreduceframework_spark.sources.io import compact_table

    import os

    frag = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(frag)
    n_small = sum(
        1 for f in os.listdir(frag) if f.endswith(".parquet")
    )
    assert n_small >= 40

    compacted = str(tmp_path / "compacted")
    n = compact_table(spark, frag, compacted, target_mb=256)
    assert n == 1
    n_big = sum(
        1 for f in os.listdir(compacted) if f.endswith(".parquet")
    )
    assert n_big == 1
    assert spark.read.parquet(compacted).count() == orders.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: files written before a column existed still
    read alongside newer files via mergeSchema — old rows surface NULL
    for the added column (the append-only reality of a long-lived
    100 TB dataset; pinned schemas in the registry make the merged
    shape explicit rather than inferred)."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(d + "/batch=0")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(d + "/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(
        d + "/batch=0", d + "/batch=1"
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5
