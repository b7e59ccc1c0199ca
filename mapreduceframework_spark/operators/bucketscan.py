"""The earlier-bucket stitch of the bucketed two-phase prefix scan.

The round-8 enum-key fixes decompose running windows over constant
-cardinality keys into (key, range-bucket)-local windows plus an
O(buckets) cross-bucket stitch: every per-bucket aggregate row needs an
aggregate (sum / min / max) of its STRICTLY EARLIER sibling buckets'
values — the prefix offset (sum of earlier totals), the previous
bucket's last timestamp (max), or the strict-prefix minimum. Five call
sites share that stitch (`_islands_bucketed` x2, the peak-concurrency
sweep-line, `stats_cusum_drift` x2, and `sort_global_ranked`'s global
-rank offset); this module is the single implementation so a boundary
-condition fix cannot drift between them.

Shape choice, deliberately a broadcast theta-join and NOT a window:
a cumulative window over the bucket table would be O(buckets) instead
of the join's O(buckets^2) pairs, but it would have to run either
unpartitioned (sort_global_ranked) or partitioned by the enum key —
the two shapes the plan sweeps in tests/test_plans.py exist to forbid —
and would need an above-an-Aggregate exemption carved into
test_no_unpartitioned_window_anywhere. The bucket table is broadcast
-sized by construction (one row per (key, bucket)), so the quadratic
pair count is bounded by a driver-visible model size, and keeping the
sweeps exemption-free is worth more than the asymptotic tidiness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "min": F.min, "max": F.max}


def earlier_bucket_agg(
    bt: DataFrame,
    part_cols: Sequence[str],
    bucket_col: str,
    val_col: str,
    agg: str,
    out_col: str,
    *,
    descending: bool = False,
    carry: Sequence[str] = (),
) -> DataFrame:
    """For every (part, bucket) row of the per-bucket aggregate table
    ``bt``, the ``agg`` ('sum' | 'min' | 'max') of ``val_col`` over all
    strictly earlier buckets of the same partition.

    'Earlier' means a smaller bucket value, or a LARGER one with
    ``descending=True`` (sort_global_ranked ranks by descending price,
    so its prefix is the higher-priced buckets). A 'sum' coalesces to
    BIGINT 0 for first buckets; 'min'/'max' keep NULL there (the
    islands lag and the CUSUM prefix-min both need the no-predecessor
    case observable). ``carry`` columns of ``bt`` ride through the
    groupBy unchanged so call sites don't need a re-join.
    """
    other = bt.select(
        *[F.col(c).alias(f"_eb_{c}") for c in [*part_cols, bucket_col]],
        F.col(val_col).alias("_eb_v"),
    )
    cond = (
        F.col(f"_eb_{bucket_col}") > F.col(bucket_col)
        if descending
        else F.col(f"_eb_{bucket_col}") < F.col(bucket_col)
    )
    for c in part_cols:
        cond = (F.col(f"_eb_{c}") == F.col(c)) & cond
    agg_col = _AGGS[agg]("_eb_v")
    if agg == "sum":
        agg_col = F.coalesce(agg_col, F.lit(0).cast("long"))
    return (
        bt.join(F.broadcast(other), cond, "left")
        .groupBy(*part_cols, bucket_col, *carry)
        .agg(agg_col.alias(out_col))
    )
