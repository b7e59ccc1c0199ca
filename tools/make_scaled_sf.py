#!/usr/bin/env python
"""Synthesize a LARGER scale factor from sf0.1 for parity probing.

The driver's testdata tops out at sf0.1 (~600k lineitem rows;
TESTDATA.md says never modify /root/testdata). The round-16 scale
probe (VERDICT r15 item 6) needs an sf1-direction dataset to re-check
the scale-sensitive query classes (rank cutoffs, band buckets,
bucketed prefix scans, popularity caps) one decade further out — the
decade jump from sf0.01 to sf0.1 caught four latent bugs in round 6.

Parity checking compares Spark and DuckDB on the SAME parquet files,
so the generator does not need to reproduce the driver's exact
distributions — it needs schema-identical, referentially-consistent
data at 10x the volume. This replicates each scaled table K times
with disjoint key offsets (copy k adds k * OFFSET to every entity
key), which preserves referential integrity per copy and keeps the
fixed dimensions (nation / region) shared, the way a real corpus
grows by accretion. Text payloads repeat verbatim across copies —
deliberate: 10-deep exact-duplicate clusters STRESS the dedup band
buckets and candidate joins harder than organic data would, which is
the point of the probe.

Usage:
    python tools/make_scaled_sf.py [K] [out_dir]
K defaults to 10 (sf0.1 -> ~sf1); out_dir to .scratch/sf1 in the
repo (gitignored).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 1_000_000  # > every entity-key range in sf0.1
EV_OFFSET = 100_000_000  # event_id headroom

# table -> columns that get the per-copy key offset
KEYED = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("user_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
SHARED = ("nation", "region")  # fixed dims: copied once, never scaled


def scale_table(name: str, k_copies: int, out_dir: str) -> int:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    copies = []
    for k in range(k_copies):
        t = src
        for col in KEYED[name]:
            off = k * OFFSET
            idx = t.schema.get_field_index(col)
            t = t.set_column(
                idx, col, pc.add(t.column(col), pa.scalar(
                    off, type=t.schema.field(col).type))
            )
        if name == "events":
            idx = t.schema.get_field_index("event_id")
            t = t.set_column(
                idx, "event_id",
                pc.add(t.column("event_id"),
                       pa.scalar(k * EV_OFFSET, type=pa.int64())),
            )
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    return out.num_rows


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(repo, ".scratch", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in SHARED:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"),
            f"{out_dir}/{name}.parquet",
        )
        print(f"{name}: shared dim copied")
    for name in KEYED:
        n = scale_table(name, k, out_dir)
        print(f"{name}: {n} rows ({k} copies)")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
