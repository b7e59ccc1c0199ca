"""Physical evidence for the Z-order layout claim: writing
repartitionByRange(z) + sortWithinPartitions(z) must produce parquet
row groups whose (px, sx) min/max rectangles are SMALL on both
dimensions — that is what makes footer stats selective for either
predicate at 100 TB. The summary query (layout_zorder_clustering)
value-checks the z math; this test checks the actual files."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.lakehouse_queries import _z_expr
from mapreduceframework_spark.sources import load_table


def _rowgroup_area_fraction(path: str) -> float:
    """Mean fraction of the GLOBAL (px, sx) domain covered by each row
    group's min/max bounding rectangle, weighted by rows. The global
    domain is derived from the same footers (at small SF the key space
    is far smaller than the 256 modulus)."""
    groups = []  # (rows, px_min, px_max, sx_min, sx_max)
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, fname))
        sch = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            px = meta.column(sch["px"]).statistics
            sx = meta.column(sch["sx"]).statistics
            groups.append((meta.num_rows, px.min, px.max, sx.min, sx.max))
    assert groups
    gpx_lo = min(g[1] for g in groups)
    gpx_hi = max(g[2] for g in groups)
    gsx_lo = min(g[3] for g in groups)
    gsx_hi = max(g[4] for g in groups)
    domain = (gpx_hi - gpx_lo + 1) * (gsx_hi - gsx_lo + 1)
    total = sum(g[0] for g in groups)
    weighted = sum(
        (g[2] - g[1] + 1) * (g[4] - g[3] + 1) / domain * g[0] for g in groups
    )
    return weighted / total


@pytest.fixture(scope="module")
def zdf(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey % 256 AS px",
        "l_suppkey % 256 AS sx",
        f"{_z_expr('(l_partkey % 256)', '(l_suppkey % 256)')} AS zv",
    )


def test_zorder_rowgroups_are_selective_on_both_dims(spark, tmp_path, zdf):
    out = str(tmp_path / "zorder")
    (
        zdf.repartitionByRange(8, "zv")
        .sortWithinPartitions("zv")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(out)
    )
    frac_z = _rowgroup_area_fraction(out)

    base = str(tmp_path / "plain")
    zdf.repartition(8).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(base)
    frac_plain = _rowgroup_area_fraction(base)

    # Unclustered row groups cover essentially the whole domain; the
    # z-ordered layout must cover a small fraction of it, on BOTH
    # dimensions at once (that's the Morton-interleave property a
    # single-column sort cannot give).
    assert frac_plain > 0.5, frac_plain
    assert frac_z < frac_plain / 3, (frac_z, frac_plain)
