"""Event-time windowing + Structured Streaming queries (SURVEY.md §2.2
streaming row — absent in the reference, which is strictly batch:
its barrier at JobContext.cpp:74 ends map for the whole input before
any shuffle; progress polling in SampleClient.cpp:85-94 is monitoring,
not streaming).

Two tiers:
- ``events_*``: event-time window semantics (tumbling / sliding /
  session) on the batch DataFrame API — the same window() /
  session_window() expressions Structured Streaming executes, checked
  value-exact against gaps-and-islands SQL oracles.
- ``streaming_*``: the REAL streaming engine — readStream file source,
  watermark, stateful aggregation / applyInPandasWithState, memory
  sink, availableNow trigger (see streaming/windows.py). Over a static
  source the results equal their batch twins, so they get full
  value-hash oracles too (rare for streaming code).

value aggregates are computed over exact BIGINT 1e-4 units (each row's
double snapped row-locally, then an associativity-proof integer SUM):
summation order across partitions is nondeterministic, and ROUND(SUM)
/ ROUND(AVG) of raw doubles proved ULP-fragile at sf0.1 — one window's
average landed within an ULP of a .00005 boundary and the two engines
rounded to different 4-decimal values (same failure class, and same
fix, as the timeseries fill family's _SPARSE_GRID_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceframework_spark.plans.exact import (
    int_round_mean,
    int_round_mean_sql,
    snap_units,
)
from mapreduceframework_spark.plans.registry import (
    NO_TRAILING_NODATA_BATCH,
    query,
)
from mapreduceframework_spark.sources import load_table

TUMBLING_ORACLE = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS sum_value
    FROM events GROUP BY 1, 2
"""

SLIDING_ORACLE = f"""
    WITH hit AS (
        SELECT t.win_start, event_type,
               CAST(ROUND(value * 10000) AS BIGINT) AS v_e4
        FROM (SELECT event_type, value,
                     unnest([time_bucket(INTERVAL '5 minutes', ts),
                             time_bucket(INTERVAL '5 minutes', ts)
                                 - INTERVAL '5 minutes']) AS win_start
              FROM events) t)
    SELECT win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {int_round_mean_sql("SUM(v_e4)", 1)} / 10000.0
               AS avg_value
    FROM hit GROUP BY 1, 2
"""


@query(
    "events_tumbling_counts",
    oracle=TUMBLING_ORACLE,
    tags=("streaming", "window-time"),
    bench=True,
)
def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling event-time windows: count + sum per
    event_type. window() is epoch-aligned, same as DuckDB time_bucket.
    Partial aggregation happens map-side; shuffle is O(windows x
    types), not O(events)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "v_e4", snap_units("value", 10_000)
    )
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum("v_e4") / 10000.0).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "cnt", "sum_value"
        )
    )


@query(
    "events_sliding_windows",
    oracle=SLIDING_ORACLE,
    tags=("streaming", "window-time"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): every event
    lands in exactly two windows. Spark's window() expands the rows
    internally (explode of window instances) — the oracle mirrors that
    expansion with unnest of the two candidate window starts. The
    average is the exact integer mean of 1e-4-unit values (see module
    docstring for why ROUND(AVG(double)) is not oracle-safe)."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "v_e4", snap_units("value", 10_000)
    )
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("cnt"), F.sum("v_e4").alias("s_e4"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "cnt",
            # round-14 exactness-queue item (d): exact half-up integer
            # mean (int_round_mean), not ROUND(double quotient).
            (int_round_mean(F.col("s_e4"), 1, F.col("cnt")) / 10000.0)
            .alias("avg_value"),
        )
    )


@query(
    "events_session_windows",
    bench=True,
    oracle="""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
                        THEN 1 ELSE 0 END AS new_session
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM o)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '6 hours' AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    tags=("streaming", "window-time"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 6-hour inactivity gap per user —
    session_window() merges events whose [ts, ts+gap) windows overlap.
    The oracle is the classic gaps-and-islands formulation (lag +
    cumulative boundary sum), boundary at ts - prev >= gap to match
    Spark's overlap rule. Sessionization shuffles once on user_id."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "6 hours").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "streaming_tumbling_counts",
    oracle=TUMBLING_ORACLE,
    bench=True,
    tags=("streaming", "true-streaming"),
    # Skip the trailing no-data micro-batch (1.63x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming: file-source readStream -> watermark ->
    windowed aggregation -> memory sink, run to completion with
    availableNow (streaming/windows.py). Same oracle as the batch twin:
    over a static source nothing is late, so results are identical."""
    from mapreduceframework_spark.streaming.windows import tumbling_counts

    return tumbling_counts(spark, sf_dir)


@query(
    "streaming_user_counts_stateful",
    oracle="""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    """,
    tags=("streaming", "true-streaming", "stateful"),
    # Skip the trailing no-data micro-batch (1.23x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_user_counts_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running counts in
    applyInPandasWithState (engine-managed GroupState, update mode).
    The streaming analogue of the reference's full-group reduce — state
    lives per key across batches instead of per-key vectors in RAM
    (reference JobContext.h:80)."""
    from mapreduceframework_spark.streaming.windows import running_user_counts

    return running_user_counts(spark, sf_dir)


@query(
    "streaming_sliding_avgs",
    oracle=SLIDING_ORACLE,
    tags=("streaming", "true-streaming", "window-time"),
    # Skip the trailing no-data micro-batch (1.15x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_sliding_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming sliding windows (10 min / 5 min slide) with a
    watermark — the stateful window expansion runs inside the
    streaming engine; over a static source the result equals the batch
    twin (events_sliding_windows), hence the shared oracle shape."""
    from mapreduceframework_spark.streaming.windows import sliding_avgs

    return sliding_avgs(spark, sf_dir)


@query(
    "streaming_dedup_keys",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "true-streaming", "dedup"),
    # Skip the trailing no-data micro-batch (1.21x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication via dropDuplicates state: append-mode
    emission of the first event per (user_id, event_type). The oracle
    is the batch DISTINCT — reachable because only key columns are
    emitted."""
    from mapreduceframework_spark.streaming.windows import dedup_user_type

    return dedup_user_type(spark, sf_dir)


@query(
    "streaming_click_purchase_join",
    oracle="""
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        FROM events a JOIN events b
        ON a.user_id = b.user_id
           AND a.event_type = 'click' AND b.event_type = 'purchase'
           AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "true-streaming", "join"),
    # Skip the trailing no-data micro-batch (1.48x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (clicks x purchases of the same user
    within 30 minutes) with watermarks on both sides — state-bounded
    interval join through the streaming engine, checked value-exact
    against the batch interval join."""
    from mapreduceframework_spark.streaming.windows import click_purchase_join

    return click_purchase_join(spark, sf_dir)


@query(
    "streaming_session_counts",
    oracle="""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
                        THEN 1 ELSE 0 END AS new_session
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM o)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '6 hours' AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    tags=("streaming", "true-streaming", "window-time"),
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming session windows: the engine's merging session
    state (data-driven window extents, watermark-driven finalization)
    run to completion over the static source — checked value-exact
    against the batch gaps-and-islands oracle, same as the batch twin
    events_session_windows."""
    from mapreduceframework_spark.streaming.windows import session_counts

    return session_counts(spark, sf_dir)


@query(
    "events_funnel_conversion",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'),
        converters AS (
            SELECT DISTINCT c.user_id
            FROM clicks c
            WHERE EXISTS (
                SELECT 1 FROM events p
                WHERE p.event_type = 'purchase'
                  AND p.user_id = c.user_id
                  AND p.ts >= c.ts
                  AND p.ts <= c.ts + INTERVAL 30 MINUTE))
        SELECT
            (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM clicks)
                AS n_clickers,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM converters)
                AS n_converters,
            100.0 * (SELECT COUNT(*) FROM converters)
                  / (SELECT COUNT(DISTINCT user_id) FROM clicks)
                AS conv_pct
    """,
    tags=("events", "funnel", "semi"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion: share of clicking users with a purchase
    within 30 minutes of some click — the product-analytics shape on
    top of the same watermarkable interval-join pattern as
    streaming_click_purchase_join. The EXISTS is a left-semi join whose
    equi part (user_id) carries the shuffle and whose time window rides
    as a residual; both aggregates are distinct-counts over the key
    only. conv_pct divides two exact integers once — bit-identical
    cross-engine, no rounding (int-ratio outputs must never be rounded:
    ties at the rounding digit resolve differently per engine)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converters = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (
                F.col("p_ts")
                <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "left_semi",
        )
        .select("c_user")
        .distinct()
        .agg(F.count("*").alias("n_converters"))
    )
    clickers = clicks.agg(
        F.countDistinct("c_user").alias("n_clickers")
    )
    return (
        clickers.crossJoin(F.broadcast(converters))
        .select(
            "n_clickers",
            "n_converters",
            (
                100.0
                * F.col("n_converters")
                / F.col("n_clickers")
            ).alias("conv_pct"),
        )
    )


@query(
    "streaming_static_enrich",
    oracle="""
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_nationkey
    """,
    tags=("streaming", "true-streaming", "join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-streaming stream-STATIC join: events enriched with the
    static customer dimension per micro-batch (no state, no watermark
    needed on the static side), aggregated per nation — the third join
    flavor next to batch joins and the stream-stream interval join.
    Over a static source the result equals the batch join, hence the
    full value-hash oracle."""
    from mapreduceframework_spark.streaming.windows import (
        static_enrich_counts,
    )

    return static_enrich_counts(spark, sf_dir)


@query(
    "streaming_click_purchase_left_join",
    oracle="""
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        FROM events a
        LEFT JOIN events b
          ON a.user_id = b.user_id AND b.event_type = 'purchase'
             AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        WHERE a.event_type = 'click'
          AND a.ts <= LEAST(
                  (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
                  (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
              ) - INTERVAL 61 MINUTE
    """,
    tags=("streaming", "true-streaming", "join"),
)
def streaming_click_purchase_left_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, with its
    purchases within 30 minutes or nulls if none arrived — null rows
    are emitted on watermark-driven state EVICTION, the semantic the
    inner join never exercises. The result is trimmed to the
    deterministic region: the GLOBAL watermark is min over both sides'
    watermarks, and each side's watermark tracks the max event time of
    ITS OWN filtered stream — so null emission is only guaranteed for
    clicks older than min(max click ts, max purchase ts) - (watermark
    30 min + join range 30 min), minus 1 min slack for the watermark's
    millisecond truncation. The oracle applies the identical trim to
    the batch left join. See streaming/windows.py
    click_purchase_left_join for why the untrimmed tail is unstable."""
    from mapreduceframework_spark.streaming.windows import (
        click_purchase_left_join,
    )

    res = click_purchase_left_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    max_ts = (
        ev.agg(
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            ).alias("mx")
        )
        .select(F.col("mx") - F.expr("INTERVAL 61 MINUTES"))
        .collect()[0][0]
    )
    return res.filter(F.col("click_ts") <= F.lit(max_ts)).select(
        "user_id", "click_id", "purchase_id"
    )


@query(
    "streaming_click_purchase_full_join",
    oracle="""
        WITH cutoff AS (
            SELECT LEAST(
                (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
                (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
            ) - INTERVAL 61 MINUTE AS t)
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               a.event_id AS click_id, b.event_id AS purchase_id
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        FULL OUTER JOIN
             (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id AND b.ts >= a.ts
             AND b.ts <= a.ts + INTERVAL 30 MINUTE
        WHERE (a.ts IS NULL OR a.ts <= (SELECT t FROM cutoff))
          AND (b.ts IS NULL OR b.ts <= (SELECT t FROM cutoff))
    """,
    tags=("streaming", "true-streaming", "join"),
)
def streaming_click_purchase_full_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the
    inner/left/full matrix: unmatched rows on BOTH sides are emitted
    on watermark-driven state eviction. The deterministic region is
    symmetric: a row is stable once EVERY non-null event time in it is
    older than min(max click ts, max purchase ts) - (watermark 30 min
    + join range 30 min + 1 min truncation slack); the oracle applies
    the identical predicate to the batch full join. Note the trim is on
    the OUTPUT, not the inputs — trimming inputs would turn a
    match-beyond-cutoff into a spurious null row on exactly one side.
    See streaming/windows.py click_purchase_full_join."""
    from mapreduceframework_spark.streaming.windows import (
        click_purchase_full_join,
    )

    res = click_purchase_full_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    cutoff = (
        ev.agg(
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            ).alias("mx")
        )
        .select(F.col("mx") - F.expr("INTERVAL 61 MINUTES"))
        .collect()[0][0]
    )
    return res.filter(
        (F.col("click_ts").isNull() | (F.col("click_ts") <= F.lit(cutoff)))
        & (
            F.col("purchase_ts").isNull()
            | (F.col("purchase_ts") <= F.lit(cutoff))
        )
    ).select("user_id", "click_id", "purchase_id")


@query(
    "streaming_threshold_alerts",
    oracle="""
        WITH p AS (
            SELECT user_id, event_id, ts,
                   CAST(ROUND(value * 10000) AS BIGINT) AS v_e4
            FROM events WHERE event_type = 'purchase'),
        c AS (
            SELECT user_id, event_id,
                   SUM(v_e4) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_e4
            FROM p)
        SELECT user_id, event_id AS crossing_event_id,
               CAST(cum_e4 AS BIGINT) AS cum_e4
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY cum_e4, event_id) AS rk
              FROM c WHERE cum_e4 >= 5000000)
        WHERE rk = 1
    """,
    tags=("streaming", "true-streaming", "stateful"),
    # Skip the trailing no-data micro-batch (1.11x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful threshold alerting in the streaming engine: the first
    purchase that pushes a user's cumulative spend over 500.0 emits
    one alert carrying the crossing event and the running total; the
    alerted flag persists in GroupState so later batches stay silent —
    semantics dropDuplicates/window aggregation cannot express (emit
    depends on the ORDERED prefix sum of the state, not on membership
    or a window bucket). Values fold as exact 1e-4-unit integers in
    (ts, event_id) order, so the crossing point is deterministic
    across micro-batch boundaries; the oracle is the batch ordered
    cumulative sum with the identical tie-break.

    Scale: state is two scalars per user (the O(1)-per-key discipline
    of every stateful row); the per-user fold is the streaming
    engine's keyed partitioning, never a global order."""
    from mapreduceframework_spark.streaming.windows import (
        spend_threshold_alerts,
    )

    return spend_threshold_alerts(spark, sf_dir)


@query(
    "streaming_foreachbatch_upsert",
    oracle="""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(1 AS BIGINT) AS deliveries
        FROM events GROUP BY event_type
    """,
    tags=("streaming", "true-streaming", "sink", "exactly-once"),
)
def streaming_foreachbatch_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-once foreachBatch sink over a genuinely multi-batch
    stream (4 staged files, maxFilesPerTrigger=1): per-type counts
    upserted into a batch-id-transactional ledger, with the final
    micro-batch RE-DELIVERED after the stream drains (the post-crash
    replay Structured Streaming contracts sinks to tolerate). The
    oracle pins both the totals and deliveries = 1 per key, so a
    broken idempotence guard — double-appended final batch — is a
    value-hash mismatch, not an untested claim
    (streaming/windows.py foreachbatch_upsert_counts)."""
    from mapreduceframework_spark.streaming.windows import (
        foreachbatch_upsert_counts,
    )

    return foreachbatch_upsert_counts(spark, sf_dir)


@query(
    "streaming_checkpoint_restart",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new
        FROM events
        GROUP BY user_id
        HAVING SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) > 0
    """,
    tags=("streaming", "true-streaming", "stateful", "recovery"),
    # Skip the trailing no-data micro-batch (1.09x, row-identical
    # output; registry._SCOPED_CONF_DEFAULTS rationale).
    sql_conf=NO_TRAILING_NODATA_BATCH,
)
def streaming_checkpoint_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpointed restart of a stateful streaming query as a
    driver-checked row (the VERDICT-r11 optional item): the per-user
    stateful count runs as two query executions over a growing file
    source sharing one checkpoint; the returned rows are the SECOND
    run's emissions. n_events pins state recovery (it equals the
    batch count over ALL events, though run 2 ingested only the
    newly-arrived half) and n_new pins offset recovery (run 2 read
    exactly the new file — a wiped offset log would replay history,
    a wiped state store would undercount). Both failure modes are
    value-hash mismatches, per the house style of making
    error/recovery guarantees value-checked columns
    (streaming/windows.py checkpoint_restart_counts; recovery
    mechanics also unit-tested in tests/test_streaming_checkpoint.py)."""
    from mapreduceframework_spark.streaming.windows import (
        checkpoint_restart_counts,
    )

    return checkpoint_restart_counts(spark, sf_dir)
