"""Event-analytics catalog queries: funnel, cohort retention,
multi-dimensional cube, time-weighted averages.

The behavioral-analytics layer over the events stream — the read-side
counterpart of the §2.10 streaming ingest. All shapes are
groupBy/window compositions that scale as one or two key-partitioned
shuffles; nothing is per-user iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_script_spark.plans.catalog import DEC, register, t


@register(
    "ev_funnel_conversion",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.v_ts
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
               GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    ("EV-funnel",),
)
def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click-after-view →
    purchase-after-click): each stage is a min-timestamp aggregation
    gated on the previous stage's timestamp — three key-partitioned
    aggregations + two joins on user_id, reusable distribution
    throughout; no per-user sequence scan."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@register(
    "ev_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT CAST(CAST(f.cohort_week AS DATE) AS VARCHAR) AS cohort_week,
           CAST(floor(date_diff('day', f.cohort_week,
                                date_trunc('week', e.ts)) / 7) AS BIGINT)
             AS weeks_since,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    ("EV-cohort",),
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ISO week of
    their first event, activity counted as distinct users per
    (cohort_week, weeks_since). Two aggregations; the firsts table is
    user-cardinality — usually broadcastable, but NOT hinted: at
    billion-user scale AQE must be free to pick a shuffle join, and
    when firsts does fit, AQE broadcasts it on its own size estimate.
    Both engines truncate weeks to ISO Monday, and week
    arithmetic stays in integer days. The week is emitted as an ISO
    date STRING: DuckDB DATE surfaces as pandas Timestamp in the
    comparator, Spark DATE as datetime.date — strings align."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = ev.join(firsts, "user_id")
    weeks_since = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        joined.groupBy(
            F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
            weeks_since.alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "ev_value_cube",
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(yr AS VARCHAR), '<all>') AS yr,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT event_type, CAST(year(ts) AS BIGINT) AS yr, value
          FROM events)
    GROUP BY CUBE (event_type, yr)
    """,
    ("EV-cube",),
)
def ev_value_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, year): all four grouping-set levels in
    one pass (Spark expands the cube into a single Expand+aggregate —
    one shuffle regardless of level count). Null group keys are
    folded to '<all>' sentinels so the level structure itself is part
    of the hash-checked output; value sums follow the decimal
    policy."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.year("ts").cast("long").alias("yr"),
        "value",
    )
    return (
        ev.cube("event_type", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("yr").cast("string"), F.lit("<all>")).alias("yr"),
            "n_events",
            "total_value",
        )
    )


@register(
    "ev_time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id, value,
             date_diff('second', ts,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS dt
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(value * dt AS DECIMAL(18,6))) AS DOUBLE)
             / SUM(dt) AS twap,
           CAST(SUM(dt) AS BIGINT) AS observed_seconds
    FROM seq WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
    ("EV-twap",),
)
def ev_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the value signal: each
    reading holds until the user's next event (lead over the
    event-time order, event_id tiebreak), weight = holding seconds.
    One window + one aggregation, both partitioned by user —
    value·dt products go through the decimal policy so the division
    is the only float op."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (
        F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp(F.col("ts"))
    ).alias("dt")
    seq = ev.select("user_id", "value", dt).filter(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    return seq.groupBy("user_id").agg(
        (
            F.sum((F.col("value") * F.col("dt")).cast(DEC)).cast("double")
            / F.sum("dt")
        ).alias("twap"),
        F.sum("dt").cast("long").alias("observed_seconds"),
    )
