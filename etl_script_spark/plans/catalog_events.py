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


from etl_script_spark.operators import timeseries as ts_ops  # noqa: E402

_EWMA_ALPHA, _EWMA_TAPS = 0.3, 8


def _sqldouble(x: float) -> str:
    """A literal DuckDB parses directly as DOUBLE (exponent notation
    forces float parsing; repr round-trips the exact bits)."""
    r = repr(x)
    return r if ("e" in r or "E" in r) else r + "e0"


_EWMA_TERMS = " + ".join(
    (
        f"value * {_sqldouble(w)}"
        if j == 0
        else f"LAG(value, {j}) OVER w * {_sqldouble(w)}"
    )
    for j, w in enumerate(ts_ops.ewma_weights(_EWMA_ALPHA, _EWMA_TAPS))
)


@register(
    "ts_ewma_fir",
    f"""
    SELECT event_id, user_id, value, {_EWMA_TERMS} AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    ("TS-smoothing",),
)
def ts_ewma_fir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the event value as an 8-tap FIR window filter
    (operators/timeseries.ewma_fir): the recursive EWMA is sequential
    and unbounded; truncating to 8 taps with the geometric tail folded
    into the oldest tap makes it a pure lag-window expression — one
    shuffle on user_id, codegen'd, state-free, and bit-replayable by
    the oracle because both engines evaluate the SAME left-associative
    literal-weighted sum. Warm-up rows (< 8 predecessors) are NULL by
    contract."""
    ev = t(spark, sf_dir, "events")
    return ts_ops.ewma_fir(
        ev, ["user_id"], ["ts", "event_id"], "value",
        alpha=_EWMA_ALPHA, taps=_EWMA_TAPS,
    ).select("event_id", "user_id", "value", "ewma")


@register(
    "ts_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT e.event_type, MIN(m.med) AS med,
             quantile_cont(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN ABS(e.value - s.med) > 3.0e0 * 1.4826e0 * s.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           MIN(s.med) AS med, MIN(s.mad) AS mad
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
    ("TS-robust",),
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD with the
    1.4826 normal-consistency constant (operators/timeseries). Exact
    per-group medians (two one-shuffle percentile passes, stats
    broadcast back) are the oracle-able contract; percentile_approx
    is the stated 100 TB swap. Output is the per-type outlier census
    so the check covers flag assignment, not just the stats."""
    ev = t(spark, sf_dir, "events")
    flagged = ts_ops.mad_outliers(ev, "event_type", "value", k=3.0)
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("n_outliers"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
    )


@register(
    "ev_attribution_last_touch",
    """
    WITH touched AS (
      SELECT event_id, user_id, ts, event_type, value,
             last_value(CASE WHEN event_type IN ('click','view')
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type,
             last_value(CASE WHEN event_type IN ('click','view')
                             THEN ts END IGNORE NULLS) OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN touch_ts IS NOT NULL
                 AND touch_ts >= ts - INTERVAL 7 DAY
                THEN touch_type ELSE 'direct' END AS channel,
           COUNT(*) AS n_conversions,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM touched WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    ("EV-attribution",),
)
def ev_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase credits
    the user's most recent click/view within a 7-day lookback, else
    'direct'. One window pass over (user, time) — the same shuffle the
    sessionizer uses — then a 3-group rollup; no self-join of the
    event stream against itself (the naive as-of formulation), so the
    shape survives arbitrarily long histories."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = ev.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .withColumn(
            "channel",
            F.when(
                F.col("touch_ts").isNotNull()
                & (F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
                F.col("touch_type"),
            ).otherwise(F.lit("direct")),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("revenue"),
        )
    )


@register(
    "chat_flatten_turns",
    """
    SELECT user_id, COUNT(*) AS n_turns,
           substr(string_agg(
             (CASE WHEN event_type IN ('click','view') THEN 'user'
                   ELSE 'assistant' END)
             || ': ' || event_type || ' ' || printf('%.2f', value),
             chr(10) ORDER BY ts, event_id), 1, 512) AS transcript
    FROM events GROUP BY user_id
    """,
    ("LLM-conversations",),
)
def chat_flatten_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation assembly (operators/conversations.flatten_turns):
    each user's event stream becomes one role-tagged transcript in
    exact (ts, event_id) turn order, truncated to a 512-char budget —
    the instruction-tuning data-prep stage. The deterministic spelling
    is sort_array(collect_list(struct(order, line))): an unordered
    collect_list is partition-order-dependent and would never
    hash-match; the oracle replays it as string_agg(... ORDER BY).
    One shuffle on the conversation key."""
    from etl_script_spark.operators import conversations

    ev = t(spark, sf_dir, "events")
    role = F.when(
        F.col("event_type").isin("click", "view"), F.lit("user")
    ).otherwise(F.lit("assistant"))
    content = F.concat(
        F.col("event_type"), F.lit(" "), F.format_string("%.2f", "value")
    )
    return conversations.flatten_turns(
        ev, ["user_id"], ["ts", "event_id"], role, content,
        sep="\n", max_chars=512,
    )


@register(
    "ts_ohlc_resample",
    """
    WITH b AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
             ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM events
    )
    SELECT key, bucket_ts,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM b GROUP BY key, bucket_ts
    """,
    ("X-timeseries", "A1"),
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (timeseries.ohlc_resample):
    open/close are SELECTED by a replayable total order (ts,
    event_id), high/low are order statistics — no value arithmetic,
    so the doubles hash identically on both engines. One shuffle
    (both row_number orderings share the partitioning) plus one
    aggregation."""
    from etl_script_spark.operators import timeseries

    ev = t(spark, sf_dir, "events")
    return timeseries.ohlc_resample(
        ev, "event_type", "ts", "value", "event_id", bucket="hour"
    )


@register(
    "ev_markov_transitions",
    """
    WITH p AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_state,
             event_type AS to_state
      FROM events
    ),
    c AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE from_state IS NOT NULL
      GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, n,
           CAST((n * 1000000) //
                SUM(n) OVER (PARTITION BY from_state) AS BIGINT)
             AS prob_ppm
    FROM c
    """,
    ("X-markov", "A1"),
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream (timeseries.markov_transitions): per-(from, to) counts
    and exact-ppm row probabilities — next-action prediction and
    improbable-transition anomaly scoring in one small matrix. One
    per-user window shuffle, one aggregation."""
    from etl_script_spark.operators import timeseries

    ev = t(spark, sf_dir, "events")
    return timeseries.markov_transitions(
        ev, "user_id", "ts", "event_type", "event_id"
    )


@register(
    "ts_cusum_changepoints",
    """
    WITH c AS (
      SELECT event_type AS key, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    m AS (
      SELECT key,
             CAST(SUM(v) * 1000 // (COUNT(*) * 1000) AS BIGINT) AS kk,
             CAST(SUM(v) * 3000 // (COUNT(*) * 1000) AS BIGINT) AS h
      FROM c GROUP BY key
    ),
    p AS (
      SELECT c.key, c.ts, c.event_id, c.v, m.h,
             SUM(c.v - m.kk) OVER (PARTITION BY c.key
                                   ORDER BY c.ts, c.event_id
                                   ROWS UNBOUNDED PRECEDING) AS pp
      FROM c JOIN m ON c.key = m.key
    ),
    s AS (
      SELECT key, ts, event_id, v, h,
             greatest(pp - MIN(pp) OVER (PARTITION BY key
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING),
                      0) AS sv
      FROM p
    )
    SELECT key, ts, event_id AS tiebreak, v AS value,
           CAST(sv AS BIGINT) AS s_value
    FROM s WHERE sv > h
    """,
    ("X-timeseries", "X-changepoint"),
)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint alarms over each event type's
    value stream (timeseries.cusum_changepoints, Page 1954): the
    sequential recursion rewritten as prefix-sum minus running-min —
    ONE window spec, one shuffle — with self-calibrated integer
    allowance/threshold (k = mean, h = 3x mean, exact DIV). Alarm
    rows only."""
    from etl_script_spark.operators import timeseries

    ev = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return timeseries.cusum_changepoints(
        ev, "event_type", "ts", "v", "event_id",
        allowance_milli=1000, h_mult_milli=3000,
    )


@register(
    "ts_seasonality_index",
    """
    WITH c AS (
      SELECT CAST(month(o_orderdate) AS INTEGER) AS period_no,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    p AS (
      SELECT period_no, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total
      FROM c GROUP BY period_no
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn,
             CAST(SUM(total) AS BIGINT) AS gs
      FROM p
    )
    SELECT period_no, n, total,
           CAST((CAST(total AS HUGEINT) * gn * 1000000)
                // (CAST(n AS HUGEINT) * gs) AS BIGINT) AS index_ppm
    FROM p CROSS JOIN g
    """,
    ("X-timeseries", "A1"),
)
def ts_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonal index of order revenue
    (timeseries.seasonality_index): each month's mean order total as
    an exact-ppm ratio of the global mean — ``(sum_m * n * 1e6) DIV
    (n_m * sum)`` in DECIMAL(38,0). Two aggregations, a one-row
    broadcast, 12 output rows."""
    from etl_script_spark.operators import timeseries

    o = t(spark, sf_dir, "orders").select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    return timeseries.seasonality_index(o, "o_orderdate", "v", "month")


@register(
    "ev_top_paths",
    """
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rk) AS path
      FROM r WHERE rk <= 3 GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM p),
    c AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_keys FROM p
      GROUP BY path
    )
    SELECT path, n_keys,
           CAST((n_keys * 1000000) // t AS BIGINT) AS share_ppm
    FROM c CROSS JOIN tot
    ORDER BY n_keys DESC, path ASC LIMIT 20
    """,
    ("X-paths", "A1"),
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user onboarding paths — each user's first three event
    types in time order, counted and ranked
    (conversations.top_paths): one per-user window shuffle, local
    ordered collect, TakeOrdered top-k. Share in exact ppm."""
    from etl_script_spark.operators import conversations

    ev = t(spark, sf_dir, "events")
    return conversations.top_paths(
        ev, "user_id", "ts", "event_type", "event_id", depth=3, k=20
    )


from etl_script_spark.plans.catalog_quality import _corr_oracle_tail  # noqa: E402


@register(
    "ts_acf_lags",
    """
    WITH base AS (
      SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS v,
             ts, event_id
      FROM events WHERE value IS NOT NULL
    ),
    lagd AS (
      SELECT user_id, v,
             LAG(v, 1) OVER w AS l1,
             LAG(v, 2) OVER w AS l2,
             LAG(v, 3) OVER w AS l3
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pairs AS (
      SELECT user_id, 1 AS lag, v, l1 AS p FROM lagd WHERE l1 IS NOT NULL
      UNION ALL
      SELECT user_id, 2, v, l2 FROM lagd WHERE l2 IS NOT NULL
      UNION ALL
      SELECT user_id, 3, v, l3 FROM lagd WHERE l3 IS NOT NULL
    ),
    st AS (
      SELECT user_id, lag, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS sx, SUM(CAST(p AS HUGEINT)) AS sy,
             SUM(CAST(v AS HUGEINT) * v) AS sxx,
             SUM(CAST(p AS HUGEINT) * p) AS syy,
             SUM(CAST(v AS HUGEINT) * p) AS sxy
      FROM pairs GROUP BY 1, 2
    ),
    d AS (
      SELECT user_id, lag, n, n * sxy - sx * sy AS num,
             (n * sxx - sx * sx) // n AS qx,
             (n * syy - sy * sy) // n AS qy
      FROM st
    )"""
    + _corr_oracle_tail(keys="user_id, lag,", out="corr_ppb"),
    ("TS-acf",),
)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation of the event value signal at lags
    1-3 (timeseries.acf_lags): the stickiness/periodicity readout,
    computed from ONE window sort per user (three lag() expressions
    share the frame), an inline explode to (user, lag) pairs, and
    six exact integer sufficient statistics per group; corr_ppb
    under the integer-sqrt convention — bit-identical to the
    oracle's plain-SQL replay. NULL values pre-filtered so lag
    offsets count the same rows on both engines."""
    from etl_script_spark.operators import timeseries as ts_ops2

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    return ts_ops2.acf_lags(
        ev, ["user_id"], ["ts", "event_id"], "v", max_lag=3
    )


@register(
    "ev_attribution_linear",
    """
    WITH base AS (
      SELECT user_id, event_type, value,
             date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
               AS tsec
      FROM events
    ),
    wcnt AS (
      SELECT user_id, event_type, value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w AS nc,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER w AS nv
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                   RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
    ),
    p AS (
      SELECT COALESCE(nc, 0) AS nc, COALESCE(nv, 0) AS nv,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM wcnt WHERE event_type = 'purchase'
    )
    SELECT 'click' AS channel,
           CAST(COALESCE(SUM(CASE WHEN nc + nv > 0
                 THEN (nc * 1000000) // (nc + nv) ELSE 0 END), 0)
                AS BIGINT) AS credit_ppm,
           CAST(COALESCE(SUM(CASE WHEN nc + nv > 0
                 THEN cents * ((nc * 1000000) // (nc + nv)) ELSE 0 END), 0)
                AS BIGINT) AS revenue_cents_ppm
    FROM p
    UNION ALL
    SELECT 'view',
           CAST(COALESCE(SUM(CASE WHEN nc + nv > 0
                 THEN (nv * 1000000) // (nc + nv) ELSE 0 END), 0)
                AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN nc + nv > 0
                 THEN cents * ((nv * 1000000) // (nc + nv)) ELSE 0 END), 0)
                AS BIGINT)
    FROM p
    UNION ALL
    SELECT 'direct',
           CAST(COALESCE(SUM(CASE WHEN nc + nv = 0
                 THEN 1000000 ELSE 0 END), 0) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN nc + nv = 0
                 THEN cents * 1000000 ELSE 0 END), 0) AS BIGINT)
    FROM p
    """,
    ("EV-attribution",),
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — each purchase splits its
    credit equally (exact integer ppm) across every click/view in
    its 7-day lookback, vs last-touch's winner-take-all: the
    touch counts come from two SUM-CASE expressions over ONE
    range-frame window per user (seconds-granularity bounds
    [-604800, -1], identical peer semantics on both engines), so no
    purchase-to-touch self-join ever materializes — per purchase the
    credit is count-based, not row-expanded, which is what keeps an
    arbitrarily long history linear. Truncation makes per-purchase
    channel credits sum to ≤1e6 (documented convention)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value",
        F.unix_timestamp("ts").alias("tsec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsec")
        .rangeBetween(-604800, -1)
    )
    wcnt = ev.select(
        "event_type", "value",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .over(w), F.lit(0),
        ).alias("nc"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .over(w), F.lit(0),
        ).alias("nv"),
    )
    p = wcnt.filter(F.col("event_type") == "purchase").select(
        "nc", "nv",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    tot = F.col("nc") + F.col("nv")
    share = {
        "click": F.expr("(nc * 1000000) DIV (nc + nv)"),
        "view": F.expr("(nv * 1000000) DIV (nc + nv)"),
    }
    rows = []
    for ch, sh in share.items():
        credit = F.when(tot > 0, sh).otherwise(F.lit(0))
        rows.append(
            p.agg(
                F.lit(ch).alias("channel"),
                F.coalesce(F.sum(credit), F.lit(0))
                .cast("long").alias("credit_ppm"),
                F.coalesce(F.sum(F.col("cents") * credit), F.lit(0))
                .cast("long").alias("revenue_cents_ppm"),
            )
        )
    direct = F.when(tot == 0, F.lit(1000000)).otherwise(F.lit(0))
    rows.append(
        p.agg(
            F.lit("direct").alias("channel"),
            F.coalesce(F.sum(direct), F.lit(0))
            .cast("long").alias("credit_ppm"),
            F.coalesce(F.sum(F.col("cents") * direct), F.lit(0))
            .cast("long").alias("revenue_cents_ppm"),
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "ev_bot_detect",
    """
    WITH base AS (
      SELECT user_id, event_type,
             date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
               AS tsec
      FROM events
    ),
    b AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY tsec
                            RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
               AS burst
      FROM base
    ),
    mb AS (
      SELECT user_id, CAST(MAX(burst) AS BIGINT) AS max_burst_60s
      FROM b GROUP BY 1
    ),
    tc AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM base GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             CAST((CAST(MAX(c) AS HUGEINT) * 1000000) // SUM(c)
                  AS BIGINT) AS top_type_ppm
      FROM tc GROUP BY 1
    )
    SELECT t.user_id, n_events, max_burst_60s, top_type_ppm,
           (max_burst_60s >= 20
            OR (n_events >= 50 AND top_type_ppm >= 900000)) AS is_bot
    FROM top t JOIN mb USING (user_id)
    """,
    ("EV-bot",),
)
def ev_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic bot/abuse flagging per user: the max event count in
    any rolling 60-second window (range-frame count over the same
    per-user second-ordered sort every other event op uses) plus the
    top-event-type concentration in exact ppm — a user firing ≥20
    events in a minute, or ≥50 events that are ≥90% one type, flags.
    The pre-training-curation counterpart of the documents quality
    gate, on behavioral data: two aggregations and one window, all
    user-partitioned, no self-joins."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("tsec")
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tsec")
        .rangeBetween(-59, 0)
    )
    mb = (
        ev.select("user_id", F.count(F.lit(1)).over(wb).alias("burst"))
        .groupBy("user_id")
        .agg(F.max("burst").cast("long").alias("max_burst_60s"))
    )
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    top = tc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.expr(
            "CAST((CAST(MAX(c) AS DECIMAL(38,0)) * 1000000) DIV SUM(c)"
            " AS BIGINT)"
        ).alias("top_type_ppm"),
    )
    return top.join(mb, "user_id").select(
        "user_id", "n_events", "max_burst_60s", "top_type_ppm",
        (
            (F.col("max_burst_60s") >= 20)
            | ((F.col("n_events") >= 50) & (F.col("top_type_ppm") >= 900000))
        ).alias("is_bot"),
    )


@register(
    "ts_cross_correlation",
    """
    WITH g AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events GROUP BY 1, 2
    ),
    lagd AS (
      SELECT user_id, a,
             LEAD(b, 2) OVER w AS bm2, LEAD(b, 1) OVER w AS bm1,
             b AS b0, LAG(b, 1) OVER w AS b1, LAG(b, 2) OVER w AS b2
      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY h)
    ),
    pairs AS (
      SELECT user_id, -2 AS lag, a, bm2 AS p FROM lagd WHERE bm2 IS NOT NULL
      UNION ALL SELECT user_id, -1, a, bm1 FROM lagd WHERE bm1 IS NOT NULL
      UNION ALL SELECT user_id, 0, a, b0 FROM lagd WHERE b0 IS NOT NULL
      UNION ALL SELECT user_id, 1, a, b1 FROM lagd WHERE b1 IS NOT NULL
      UNION ALL SELECT user_id, 2, a, b2 FROM lagd WHERE b2 IS NOT NULL
    ),
    st AS (
      SELECT user_id, lag, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(a AS HUGEINT)) AS sx, SUM(CAST(p AS HUGEINT)) AS sy,
             SUM(CAST(a AS HUGEINT) * a) AS sxx,
             SUM(CAST(p AS HUGEINT) * p) AS syy,
             SUM(CAST(a AS HUGEINT) * p) AS sxy
      FROM pairs GROUP BY 1, 2
    ),
    d AS (
      SELECT user_id, lag, n, n * sxy - sx * sy AS num,
             (n * sxx - sx * sx) // n AS qx,
             (n * syy - sy * sy) // n AS qy
      FROM st
    )"""
    + _corr_oracle_tail(keys="user_id, lag,", out="corr_ppb"),
    ("TS-acf",),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CROSS-correlation between hourly purchase revenue and
    hourly click count at lags −2..+2 (timeseries.ccf_lags): positive
    lag means clicks LEAD purchases — the attribution-adjacent
    lead-lag readout last-touch models assume rather than measure.
    All five shifted copies (lags AND leads — lag with a negative
    offset) come from ONE window sort per user; exact integer
    sufficient statistics; corr_ppb under the integer-sqrt
    convention."""
    from etl_script_spark.operators import timeseries as ts_ops3

    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).cast("long").alias("a"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("long").alias("b"),
    )
    return ts_ops3.ccf_lags(g, ["user_id"], ["h"], "a", "b", max_lag=2)


@register(
    "ts_lttb_downsample",
    """
    WITH pts AS (
      SELECT CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1
    ),
    span AS (SELECT MIN(t) AS t0, MAX(t) AS t1 FROM pts),
    bk AS (
      SELECT t, v,
             LEAST(47, CAST(((t - t0) * 48) // (t1 - t0 + 1) AS INT)) AS b
      FROM pts CROSS JOIN span
    ),
    cent AS (
      SELECT b,
             (SUM(CAST(t AS HUGEINT)) * 1000000) // COUNT(*) AS ct,
             (SUM(CAST(v AS HUGEINT)) * 1000000) // COUNT(*) AS cv
      FROM bk GROUP BY b
    ),
    anch AS (
      SELECT b,
             LAG(ct) OVER (ORDER BY b) AS pt,
             LAG(cv) OVER (ORDER BY b) AS pv,
             LEAD(ct) OVER (ORDER BY b) AS nt,
             LEAD(cv) OVER (ORDER BY b) AS nv
      FROM cent
    ),
    scored AS (
      SELECT bk.b, bk.t, bk.v,
             CASE WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
               abs((pt - nt) * (CAST(bk.v AS HUGEINT) * 1000000 - pv)
                 - (pt - CAST(bk.t AS HUGEINT) * 1000000) * (nv - pv))
             END AS a,
             CASE WHEN pt IS NULL THEN bk.t
                  WHEN nt IS NULL THEN -bk.t
                  ELSE 0 END AS endpick
      FROM bk JOIN anch ON bk.b = anch.b
    ),
    ranked AS (
      SELECT b, t, v,
             ROW_NUMBER() OVER (
               PARTITION BY b
               ORDER BY endpick ASC, a DESC, t ASC, v ASC) AS r
      FROM scored
    )
    SELECT CAST(b AS INT) AS bucket, t AS ts, v AS value
    FROM ranked WHERE r = 1
    """,
    ("X-timeseries",),
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling of the daily-revenue series to 48 buckets
    (timeseries.lttb_downsample, fixed-anchor parallel variant): per
    time bucket, keep the point forming the largest triangle with the
    neighbor buckets' centroids — spike-preserving chart reduction
    that per-bucket avg/min/max cannot give. Centroids are exact
    micro-units, areas exact DECIMAL(38) cross products, endpoints
    pinned; the centroid table is ≤48 rows so its lag/lead window is
    tiny and broadcasts back onto the points."""
    from etl_script_spark.plans.catalog import cents

    o = t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("d")
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("v"))
    )
    return ts_ops.lttb_downsample(daily, "d", "v", n_buckets=48)


@register(
    "ev_diff_in_diff",
    """
    WITH cells AS (
      SELECT event_type AS "group",
        CAST(SUM(CASE WHEN user_id % 2 = 0
                  AND NOT ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        CAST(SUM(CASE WHEN user_id % 2 = 0
                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        CAST(SUM(CASE WHEN user_id % 2 <> 0
                  AND NOT ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        CAST(SUM(CASE WHEN user_id % 2 <> 0
                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        SUM(CASE WHEN user_id % 2 = 0
                  AND NOT ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN CAST(ROUND(value * 1000000) AS HUGEINT)
                 ELSE 0 END) AS s_t_pre,
        SUM(CASE WHEN user_id % 2 = 0
                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN CAST(ROUND(value * 1000000) AS HUGEINT)
                 ELSE 0 END) AS s_t_post,
        SUM(CASE WHEN user_id % 2 <> 0
                  AND NOT ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN CAST(ROUND(value * 1000000) AS HUGEINT)
                 ELSE 0 END) AS s_c_pre,
        SUM(CASE WHEN user_id % 2 <> 0
                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                 THEN CAST(ROUND(value * 1000000) AS HUGEINT)
                 ELSE 0 END) AS s_c_post
      FROM events GROUP BY 1
    )
    SELECT "group", n_t_pre, n_t_post, n_c_pre, n_c_post,
      CAST(
        ((CASE WHEN n_t_post = 0 THEN NULL
               WHEN s_t_post < 0 THEN -CAST(abs(s_t_post) // n_t_post AS BIGINT)
               ELSE CAST(s_t_post // n_t_post AS BIGINT) END)
         - (CASE WHEN n_t_pre = 0 THEN NULL
               WHEN s_t_pre < 0 THEN -CAST(abs(s_t_pre) // n_t_pre AS BIGINT)
               ELSE CAST(s_t_pre // n_t_pre AS BIGINT) END))
        - ((CASE WHEN n_c_post = 0 THEN NULL
               WHEN s_c_post < 0 THEN -CAST(abs(s_c_post) // n_c_post AS BIGINT)
               ELSE CAST(s_c_post // n_c_post AS BIGINT) END)
         - (CASE WHEN n_c_pre = 0 THEN NULL
               WHEN s_c_pre < 0 THEN -CAST(abs(s_c_pre) // n_c_pre AS BIGINT)
               ELSE CAST(s_c_pre // n_c_pre AS BIGINT) END))
      AS BIGINT) AS did_micro
    FROM cells
    """,
    ("X-statistics", "X-attribution"),
)
def ev_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences per event type (stats.diff_in_diff):
    even-user-id cohort as 'treated', 2024-01-16 as the intervention
    cutoff — the treated group's pre→post mean value change minus the
    control group's, all in exact micro units (one conditional
    aggregation; empty cells yield NULL, not a throw). The causal
    counterpart of the attribution operators."""
    from etl_script_spark.operators import stats

    e = t(spark, sf_dir, "events")
    return stats.diff_in_diff(
        e.select(
            "event_type", "user_id", "ts",
            F.expr("CAST(ROUND(value * 1000000) AS BIGINT)").alias("vmic"),
        ),
        "event_type",
        treated=F.col("user_id") % 2 == 0,
        post=F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp_ntz"),
        value_micro=F.col("vmic"),
    )


def _period_oracle() -> str:
    from etl_script_spark.plans.catalog_quality import _corr_oracle_tail

    tail = _corr_oracle_tail(keys="g, lag,", out="corr_ppb")
    i = tail.rfind("SELECT")
    wrapped = tail[:i] + ", acf AS (" + tail[i:] + ")"
    return (
        """
    WITH base AS (
      SELECT o_orderpriority AS g,
             CAST(datediff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS pos,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM orders GROUP BY 1, 2
    ),
    probes AS (
      SELECT g, pos, v, lag, pos - lag AS ppos
      FROM base CROSS JOIN (SELECT UNNEST(range(1, 15)) AS lag)
    ),
    pairs AS (
      SELECT p.g, p.lag, p.v AS x, b2.v AS y
      FROM probes p JOIN base b2
        ON p.g = b2.g AND p.ppos = b2.pos
    ),
    st AS (
      SELECT g, lag, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs GROUP BY 1, 2
    ),
    d AS (
      SELECT g, lag, n, n * sxy - sx * sy AS num,
             (n * sxx - sx * sx) // n AS qx,
             (n * syy - sy * sy) // n AS qy
      FROM st
    )"""
        + wrapped
        + """
    SELECT g AS priority, CAST(lag AS INT) AS period, corr_ppb, n
    FROM (
      SELECT g, lag, corr_ppb, n,
             ROW_NUMBER() OVER (
               PARTITION BY g
               ORDER BY corr_ppb DESC NULLS LAST, lag ASC) AS r
      FROM acf WHERE lag >= 2
    ) WHERE r = 1
    """
    )


@register(
    "ts_period_detect",
    _period_oracle(),
    ("TS-acf",),
)
def ts_period_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detection of each priority class's daily order
    count (timeseries.detect_period): argmax of the sample ACF over
    lags 2-14, built on the REGULAR-grid scale path (lag by position
    = equi-join on (key, pos-k) — no per-key window sort, so a
    single 30 M-point key still distributes). Ties break to the
    smaller lag; corr_ppb under the integer-sqrt convention, so the
    winning lag matches the oracle exactly."""
    from etl_script_spark.operators import timeseries as ts_ops2

    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
        .cast("long")
        .alias("pos"),
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    return ts_ops2.detect_period(
        daily, ["priority"], "pos", "v", max_lag=14, min_lag=2
    )


def _tdiv6(e: str) -> str:
    """DuckDB truncate-toward-zero // 1e6 (Spark DIV truncates;
    DuckDB // floors on negatives — the repo's signed-DIV rule)."""
    return (f"(CASE WHEN ({e}) < 0 THEN -((-({e})) // 1000000)"
            f" ELSE ({e}) // 1000000 END)")


_HOLT_NL = "(300000 * s.x + 700000 * (r.l + r.b))"
_HOLT_NB = f"(100000 * ({_tdiv6(_HOLT_NL)} - r.l) + 900000 * r.b)"


@register(
    "ts_holt_linear",
    f"""
    WITH RECURSIVE s AS (
      SELECT user_id AS srs,
             CAST(ROUND(value * 100) AS BIGINT) AS x,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT srs, rn, x AS l, CAST(0 AS BIGINT) AS b
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.srs, s.rn,
             CAST({_tdiv6(_HOLT_NL)} AS BIGINT),
             CAST({_tdiv6(_HOLT_NB)} AS BIGINT)
      FROM r JOIN s ON s.srs = r.srs AND s.rn = r.rn + 1
    )
    SELECT srs AS series, CAST(mx AS BIGINT) AS n,
           l AS level, b AS trend, l + b AS forecast
    FROM (SELECT *, MAX(rn) OVER (PARTITION BY srs) AS mx FROM r)
    WHERE rn = mx
    """,
    ("X-timeseries",),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double exponential smoothing of event values
    (timeseries.holt_linear_smooth, α=0.3 β=0.1 in exact ppm): level
    + trend + one-step forecast, the drift-aware upgrade over plain
    EWMA. The recurrence folds each series in ONE ordered-array
    aggregate() pass (inherently sequential per series — series
    distribute, length is ENFORCED bounded); the oracle replays the
    identical integer recurrence as a recursive CTE, sidestepping a
    DuckDB 1.0 list_reduce defect where multi-field struct
    accumulators see sibling fields mid-update."""
    from etl_script_spark.operators import timeseries as ts_ops

    e = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        F.col("user_id").alias("srs"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    return ts_ops.holt_linear_smooth(
        e, "srs", "ord", "x",
        alpha_ppm=300000, beta_ppm=100000, horizon=1,
    )


_MK_ISQRT = (
    "(CASE WHEN (s0+2)*(s0+2) <= vs THEN s0+2"
    " WHEN (s0+1)*(s0+1) <= vs THEN s0+1"
    " WHEN s0*s0 <= vs THEN s0"
    " WHEN (s0-1)*(s0-1) <= vs THEN s0-1 ELSE s0-2 END)"
)


@register(
    "ts_mann_kendall",
    f"""
    WITH b AS (
      SELECT c_nationkey AS g, c_custkey AS t,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
      FROM customer
    ),
    bi AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) AS i
      FROM b
    ),
    s AS (
      SELECT i.g,
             CAST(SUM(CASE WHEN j.v > i.v THEN 1
                           WHEN j.v < i.v THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM bi i JOIN bi j ON i.g = j.g AND i.i < j.i GROUP BY i.g
    ),
    ties AS (
      SELECT g, SUM(tc) AS n, SUM(tc * (tc - 1) * (2 * tc + 5)) AS tie18
      FROM (SELECT g, v, CAST(COUNT(*) AS HUGEINT) AS tc
            FROM b GROUP BY g, v) GROUP BY g
    ),
    cur AS (
      SELECT s.g, s_stat, n,
             n * (n - 1) * (2 * n + 5) - tie18 AS var18
      FROM s JOIN ties ON s.g = ties.g
    ),
    num AS (
      SELECT *,
             CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                       WHEN s_stat < 0 THEN s_stat + 1
                       ELSE 0 END AS HUGEINT) * 1000000 AS nm,
             (var18 * 1000000) // 18 AS vs
      FROM cur
    ),
    sd AS (
      SELECT *, CAST(FLOOR(SQRT(CAST(vs AS DOUBLE))) AS HUGEINT) AS s0
      FROM num
    ),
    sd2 AS (SELECT *, {_MK_ISQRT} AS sdm FROM sd)
    SELECT g AS series, CAST(n AS BIGINT) AS n, s_stat,
           CAST(var18 AS BIGINT) AS var_x18,
           CASE WHEN sdm <= 0 THEN NULL
                WHEN nm < 0 THEN CAST(-((-nm) // sdm) AS BIGINT)
                ELSE CAST(nm // sdm AS BIGINT) END AS z_milli
    FROM sd2
    """,
    ("X-timeseries", "X-statistics"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Mann-Kendall monotone-trend test of account balance
    over the customer-key ordering (timeseries.mann_kendall_trend) —
    the hypothesis-test sibling of stat_theil_sen's slope: S from
    group-keyed pairwise sign comparisons (Θ(n²) per series, bounded
    + enforced), tie-corrected variance off the value histogram,
    continuity-corrected z in exact milli via the isqrt ladder."""
    from etl_script_spark.operators import timeseries as ts

    from etl_script_spark.plans.catalog import cents

    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("g"),
        F.col("c_custkey").alias("t"),
        cents(F.col("c_acctbal")).alias("v"),
    )
    return ts.mann_kendall_trend(c, "g", "t", "v")


_TD = (
    lambda num, den:
    f"(CASE WHEN ({num}) < 0 THEN -((-({num})) // ({den}))"
    f" ELSE ({num}) // ({den}) END)"
)


@register(
    "ts_seasonal_decompose",
    f"""
    WITH b AS (
      SELECT user_id % 4 AS g, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    based AS (
      SELECT g, ts, event_id, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY ts, event_id)
               AS rn,
             SUM(CAST(v AS HUGEINT)) OVER
               (PARTITION BY g ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ws,
             COUNT(*) OVER
               (PARTITION BY g ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wc
      FROM b
    ),
    t1 AS (
      SELECT *,
             CASE WHEN wc = 7
                  THEN CAST({_TD("ws * 1000", "7")} AS BIGINT) END
               AS trend_milli,
             (rn - 1) % 7 AS phase
      FROM based
    ),
    t2 AS (SELECT *, v * 1000 - trend_milli AS det FROM t1),
    ph AS (
      SELECT g, phase,
             CAST({_TD("SUM(CAST(det AS HUGEINT))", "COUNT(*)")}
                  AS BIGINT) AS smean
      FROM t2 WHERE det IS NOT NULL GROUP BY g, phase
    ),
    ctr AS (
      SELECT g,
             CAST({_TD("SUM(CAST(smean AS HUGEINT))", "COUNT(*)")}
                  AS BIGINT) AS center
      FROM ph GROUP BY g
    ),
    seas AS (
      SELECT ph.g, phase, smean - center AS seasonal_milli
      FROM ph JOIN ctr ON ph.g = ctr.g
    )
    SELECT t2.g AS series, t2.event_id, t2.v AS v, t2.trend_milli,
           seas.seasonal_milli,
           t2.v * 1000 - t2.trend_milli - seas.seasonal_milli
             AS residual_milli
    FROM t2 LEFT JOIN seas
      ON t2.g = seas.g AND t2.phase = seas.phase
    """,
    ("X-timeseries",),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition by centered 7-point moving
    average (timeseries.seasonal_decompose_ma) of event values per
    user-bucket: trend (NULL at honest edges), re-centered per-phase
    seasonal indices, residual — all exact integer milli with the
    shared sign-split truncating division. The deseasonalizer behind
    residual-based anomaly gates."""
    from etl_script_spark.operators import timeseries as ts

    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 4).alias("g"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = ts.seasonal_decompose_ma(ev, "g", "ord", "cents", period=7)
    return out.select(
        "series",
        F.col("t.event_id").alias("event_id"),
        "v",
        "trend_milli",
        "seasonal_milli",
        "residual_milli",
    )
