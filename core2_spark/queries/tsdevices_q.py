"""ts-devices-shaped time-series queries over the `events` fixture.

The reference benchmarked itself against TimescaleDB's ts-devices
suite [upstream: core2 `modules/bench`] — last-reading-per-device,
multi-level time rollups, and gap-filled series are its defining
shapes.  core2 itself had no dedicated time-series operators (time is
just bitemporal columns), and neither do we: each query below is plain
DataFrame algebra, which is the point — the engine's relational
surface covers the time-series workload.

Scale notes: per-device patterns partition by `user_id` (device id) —
at 100 TB the events table is partitioned by day and the window/group
shuffles hash on the device key, so no single-partition windows
anywhere; the gap-fill spine is generated distributively with
`sequence()` + `explode` per device (never a driver-side loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query
from core2_spark.queries.util import davg, fround, sql_davg, sql_pround


@query(
    "ts_last_point_per_device",
    oracle="""
    SELECT user_id, ts AS last_ts, ROUND(value, 4) AS last_value, event_type
    FROM (
        SELECT user_id, ts, value, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def ts_last_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-devices 'last reading per device': row_number window keyed on
    the device — the same pattern as bitemporal latest-version dedup
    (temporal.latest_versions), reused on event time."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            fround("value").alias("last_value"),
            "event_type",
        )
        .orderBy("user_id")
    )


@query(
    "ts_hourly_rollup_daily_peak",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id,
               date_trunc('hour', ts) AS hour,
               {sql_davg('value')} AS hourly_avg
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT user_id, CAST(date_trunc('day', hour) AS TIMESTAMP) AS day,
           MAX(hourly_avg) AS peak_hourly_avg,
           CAST(COUNT(*) AS BIGINT) AS active_hours
    FROM hourly
    GROUP BY user_id, date_trunc('day', hour)
    ORDER BY user_id, day
    """,
)
def ts_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-devices two-level rollup: hourly averages re-aggregated to a
    per-day peak.  Both aggregates hash on user_id(+bucket) — partial
    aggregation shrinks each level before its shuffle, and AQE can
    reuse the first exchange's partitioning for the second."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(davg("value").alias("hourly_avg"))
    )
    return (
        hourly.groupBy("user_id", F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.max("hourly_avg").alias("peak_hourly_avg"),
            F.count("*").alias("active_hours"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ts_gap_fill_locf",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               {sql_davg('value')} AS obs_avg
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
          AND user_id < 20
        GROUP BY user_id, date_trunc('hour', ts)
    ),
    spine AS (
        SELECT u.user_id, CAST(g.generate_series AS TIMESTAMP) AS hour
        FROM (SELECT DISTINCT user_id FROM hourly) u
        CROSS JOIN generate_series(TIMESTAMP '2024-01-01',
                                   TIMESTAMP '2024-01-03 23:00:00',
                                   INTERVAL 1 HOUR) g
    )
    SELECT s.user_id AS user_id, s.hour AS hour,
           last_value(h.obs_avg IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.hour) AS filled_value,
           CAST(h.hour IS NOT NULL AS BOOLEAN) AS observed
    FROM spine s LEFT JOIN hourly h
      ON h.user_id = s.user_id AND h.hour = s.hour
    ORDER BY s.user_id, s.hour
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-devices gap-fill + LOCF: build a dense hourly spine per
    device with `sequence()`+`explode` (distributed — the spine is
    generated inside each device's rows, no driver loop), left-join
    the observed hourly averages, and carry the last observation
    forward with an IGNORE NULLS window."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
            & (F.col("user_id") < 20)
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(davg("value").alias("obs_avg"))
    )
    spine = (
        hourly.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-03 23:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
        )
    )
    obs = hourly.select(
        F.col("user_id").alias("h_uid"),
        F.col("hour").alias("h_hour"),
        "obs_avg",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(
            obs,
            (F.col("h_uid") == F.col("user_id")) & (F.col("h_hour") == F.col("hour")),
            "left",
        )
        .select(
            "user_id",
            "hour",
            F.last("obs_avg", ignorenulls=True).over(w).alias("filled_value"),
            F.col("h_hour").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "hour")
    )


@query(
    "ts_device_delta_stats",
    oracle="""
    WITH deltas AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000
                 + 0.000000001, 2) AS avg_gap_s,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM deltas
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_device_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-devices inter-reading gap statistics: lag window per device
    then aggregate — heartbeat/outage detection shape.  Gaps are exact
    integer microseconds (unix_micros / epoch_us) so SUM and MAX are
    engine-exact; only the final average divides into double."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / F.count("gap_us") / 1e6 + 1e-9, 2
            ).alias("avg_gap_s"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_gap_fill_interpolate",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               {sql_davg('value')} AS obs_avg
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
          AND user_id < 20
        GROUP BY user_id, date_trunc('hour', ts)
    ),
    spine AS (
        SELECT u.user_id, CAST(g.generate_series AS TIMESTAMP) AS hour
        FROM (SELECT DISTINCT user_id FROM hourly) u
        CROSS JOIN generate_series(TIMESTAMP '2024-01-01',
                                   TIMESTAMP '2024-01-03 23:00:00',
                                   INTERVAL 1 HOUR) g
    ),
    joined AS (
        SELECT s.user_id, s.hour, h.obs_avg,
               CAST(epoch(s.hour) AS BIGINT) AS t
        FROM spine s LEFT JOIN hourly h
          ON h.user_id = s.user_id AND h.hour = s.hour
    ),
    ctx AS (
        SELECT user_id, hour, obs_avg, t,
               last_value(obs_avg IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN obs_avg IS NOT NULL THEN t END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(obs_avg IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN obs_avg IS NOT NULL THEN t END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM joined
    )
    SELECT user_id, hour,
           {sql_pround("CASE WHEN obs_avg IS NOT NULL THEN obs_avg "
                       "ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END")}
               AS filled_value,
           CAST(obs_avg IS NOT NULL AS BOOLEAN) AS observed
    FROM ctx
    ORDER BY user_id, hour
    """,
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with LINEAR INTERPOLATION (the ts-devices rollup's
    other standard fill mode, complementing LOCF): interior gaps get
    prev + (next-prev)*(t-pt)/(nt-pt) between the surrounding observed
    hours; leading/trailing gaps stay NULL (no extrapolation).  Two
    IGNORE-NULLS window passes per direction over the same spine —
    still one shuffle on the device key, no self-join, no UDF."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
            & (F.col("user_id") < 20)
        )
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(davg("value").alias("obs_avg"))
    )
    spine = (
        hourly.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-03 23:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
        )
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left").withColumn(
        "t", F.unix_timestamp("hour")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("obs_avg").isNotNull(), F.col("t"))
    ctx = (
        joined.withColumn("pv", F.last("obs_avg", ignorenulls=True).over(back))
        .withColumn("pt", F.last(obs_t, ignorenulls=True).over(back))
        .withColumn("nv", F.first("obs_avg", ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(obs_t, ignorenulls=True).over(fwd))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("t") - F.col("pt")
    ) / (F.col("nt") - F.col("pt"))
    from core2_spark.queries.util import pround

    return ctx.select(
        "user_id",
        "hour",
        pround(
            F.when(F.col("obs_avg").isNotNull(), F.col("obs_avg")).otherwise(
                interp
            )
        ).alias("filled_value"),
        F.col("obs_avg").isNotNull().alias("observed"),
    ).orderBy("user_id", "hour")
