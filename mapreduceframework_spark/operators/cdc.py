"""Change-data-capture merge (MERGE INTO semantics) as a DataFrame op.

The reference is strictly batch-rebuild: every job re-reads the whole
``InputVec`` (reference MapReduceFramework.h:18-20) — there is no notion
of applying a delta to prior output. At 100 TB a full rebuild per update
is untenable, so the standard lakehouse operation is MERGE: apply a
changes table (insert / update / delete rows keyed like the base) to a
snapshot, producing the next snapshot. Delta/Iceberg ship this as a
table-format command; this operator is the engine-level form — one
full-outer join — that those commands compile to, usable on plain
parquet snapshots.

Scale notes (100 TB):
- One shuffle join on the merge key. Real change batches are small
  relative to the snapshot: Spark/AQE broadcasts the change side
  automatically under the threshold, making the merge a map-only pass
  over the snapshot. For repeated merges, bucket both sides by the key
  so the join is co-located (zero shuffle) every batch.
- Copy-on-write amplification (rewriting untouched files) is a table
  -format concern, not an engine concern; partition the snapshot so a
  change batch touches few partitions and write back only those
  (write_table supports hive partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INSERT, UPDATE, DELETE = "I", "U", "D"


def merge_changes(
    base: DataFrame, changes: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """Apply ``changes`` (same schema as ``base`` plus an ``op_col`` of
    'I'/'U'/'D') to ``base``; returns the next snapshot.

    Semantics (one change row per key, caller pre-collapses a change
    LOG to latest-per-key with a window first):
    - D: key dropped from the snapshot.
    - U: change row replaces the base row (full-row update).
    - I: change row added (upsert: if the key exists, behaves as U —
      MERGE's "when not matched then insert" degenerates safely).
    - base rows with no change pass through unchanged.
    """
    data_cols = [c for c in base.columns]
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = joined.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != DELETE)
    )
    return keep.select(
        *[
            F.when(
                F.col(f"c.{op_col}").isin(INSERT, UPDATE),
                F.col(f"c.{col}"),
            )
            .otherwise(F.col(f"b.{col}"))
            .alias(col)
            for col in data_cols
        ]
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Derive a change batch from two snapshots — the INVERSE of
    :func:`merge_changes`: ``merge_changes(old, snapshot_diff(old, new),
    key)`` reproduces ``new``. This is how CDC is bootstrapped when the
    upstream system offers no change log (periodic full dumps): diff
    consecutive snapshots into I/U/D rows.

    Emits ``new``'s columns plus ``op``: 'I' for keys only in ``new``,
    'D' for keys only in ``old`` (new-side columns NULL except the
    key), 'U' for keys in both whose non-key columns differ anywhere
    (struct inequality — one comparison, null-safe). Unchanged rows are
    NOT emitted; at 100 TB the diff output is change-sized, not
    snapshot-sized.

    Scale: one full-outer shuffle join on the key — same cost shape as
    the merge itself; bucket both snapshots by key to make repeated
    diffs co-located and shuffle-free.
    """
    cols = list(new.columns)
    non_key = [c for c in cols if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    old_row = F.struct(*[F.col(f"o.{c}") for c in non_key])
    new_row = F.struct(*[F.col(f"n.{c}") for c in non_key])
    op = (
        F.when(F.col(f"o.{key}").isNull(), F.lit(INSERT))
        .when(F.col(f"n.{key}").isNull(), F.lit(DELETE))
        .when(~old_row.eqNullSafe(new_row), F.lit(UPDATE))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            *[F.col(f"n.{c}").alias(c) for c in non_key],
            "op",
        )
    )
