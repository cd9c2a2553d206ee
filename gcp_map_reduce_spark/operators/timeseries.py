"""Time-series regularization: resample events onto a fixed grid and
gap-fill — the feature-pipeline step between raw event logs and anything
windowed/trained downstream.

Not in the reference (strings only, no timestamps). ``events_resample_hourly``
produces, per user, one row per hour from their first to their last active
hour: observed hours carry the hourly aggregate, gap hours carry
``n_events = 0`` and a carried-forward ``filled_value`` (last observed
hourly total) — the standard forward-fill shape.

Scale shape: the hourly pre-aggregation shrinks the data BEFORE the spine
join (events -> user-hours), the spine generates from a 2-column span
table (one row per user — ``sequence`` + ``explode`` is per-row, no
shuffle), the join keys on (user_id, hour) and the fill is a per-user
ordered window — all partitioned by user, no global ordering anywhere.
Decimal-cast sums keep cross-engine float determinism (same scheme as
``events_enriched_hourly``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


_RESAMPLE_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM span
)
SELECT s.user_id, s.hour,
  COALESCE(h.n_events, 0) AS n_events,
  h.total_value AS total_value,
  last_value(h.total_value IGNORE NULLS) OVER (
    PARTITION BY s.user_id ORDER BY s.hour
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


def events_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly grid from first to last active hour: observed rows
    keep their aggregate, gaps get n_events=0 and the forward-filled last
    observed total (null until the first observation)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    hourly = ev.groupBy("user_id", "hour").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_value"),
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            "total_value",
            F.last("total_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def events_sliding_window(
    spark: SparkSession,
    sf_dir: str,
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows over the event stream: per
    (window, event_type), event count and decimal-exact value total.
    Spark's ``F.window`` replicates each row into every window covering
    it (window/slide copies), then a plain grouped aggregation runs —
    partial aggregation applies per copy, so the shuffle carries one
    partial row per (window, type) per task, NOT per event. The same
    expression works unchanged in Structured Streaming with a watermark
    (see streaming/). Library form; the tumbling special case is the
    registered ``events_enriched_hourly``."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_resample_hourly",
    oracle=f"""
SELECT 'resample_hourly' AS series, user_id, hour AS t,
       CAST(NULL AS TIMESTAMP) AS t_end, CAST(NULL AS VARCHAR) AS k,
       n_events AS n, total_value, filled_value
FROM ({_RESAMPLE_ORACLE})
UNION ALL
SELECT 'sliding_2h_1h', NULL, w_start, w_start + INTERVAL 2 HOUR,
       event_type, n, total_value, NULL
FROM (
  SELECT date_trunc('hour', ts) - to_hours(o) AS w_start, event_type,
    count(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
  FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
  GROUP BY 1, 2
)
""",
)
def events_timeseries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event time-series family, tagged: the per-user hourly grid with
    gap-fill (series='resample_hourly' — :func:`events_resample_hourly`)
    plus the sliding event-time windows (series='sliding_2h_1h' —
    :func:`events_sliding_window`, 2-hour windows sliding hourly). The
    oracle reproduces Spark's ``F.window`` replication arithmetic
    directly: with slide=1h each event belongs to exactly the windows
    starting at trunc_hour(ts) and trunc_hour(ts)-1h, so a 2-offset
    cross join + group-by is the engine-independent twin."""
    nullts = F.lit(None).cast("timestamp")
    res = events_resample_hourly(spark, sf_dir).select(
        F.lit("resample_hourly").alias("series"),
        "user_id",
        F.col("hour").alias("t"),
        nullts.alias("t_end"),
        F.lit(None).cast("string").alias("k"),
        F.col("n_events").alias("n"),
        "total_value",
        "filled_value",
    )
    sliding = events_sliding_window(spark, sf_dir).select(
        F.lit("sliding_2h_1h").alias("series"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.col("w_start").alias("t"),
        F.col("w_end").alias("t_end"),
        F.col("event_type").alias("k"),
        "n",
        "total_value",
        F.lit(None).cast("double").alias("filled_value"),
    )
    return res.unionByName(sliding)
