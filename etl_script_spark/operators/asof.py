"""As-of (most-recent-at-or-before) join.

Spark has no ASOF JOIN operator; the naive encodings are a range
cross-join (quadratic blowup) or a per-key collect (driver-bound).
This implements the scale shape: TAG + UNION + one window —

    union(left tagged 1, right tagged 0)
    window PARTITION BY key ORDER BY (ts, tag)
    last(right-payload-struct, ignorenulls) over
        rows unbounded preceding .. current row
    keep tag=1 rows

One shuffle on the join key, a per-key sort (any time-series op pays
it), zero row amplification. Right rows sort BEFORE left rows at equal
timestamps, giving `left.ts >= right.ts` match semantics — the same
inequality DuckDB's ASOF JOIN uses, which is the oracle for the
catalog query. The payload rides in a STRUCT so a matched right row
whose payload fields are NULL still counts as a match (last+ignorenulls
on bare columns would skip past it — different semantics).

At 100 TB: partition the union by key ranges and this is exactly the
merge phase of a sort-merge join; no state beyond the sort buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    matched_ts: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row gets the payload of the most
    recent right row with ``right_ts <= left_ts`` for the same ``on``
    key (NULLs when no right row precedes it).

    payload maps right-column -> output-column. ``matched_ts`` names
    an optional output column carrying the matched right timestamp.
    Ties on (key, ts) between multiple RIGHT rows resolve to the
    last in (ts) order plus struct comparison — pre-dedupe the right
    side if that matters (the catalog query's right side is unique per
    (key, ts)).

    Right rows with a NULL timestamp are DROPPED: ``l.ts >= NULL`` is
    no-match (DuckDB ASOF semantics, the catalog oracle). Without the
    filter they sort first under ASC NULLS FIRST and last(ignorenulls)
    would hand their payload to every left row that precedes the first
    real right row — null timestamps are routine here (try_* parse
    failures), so this is a correctness filter, not hygiene."""
    out_cols = list(left.columns)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__rts"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(src).alias(dst) for src, dst in payload.items()],
        ).alias("__p"),
    )
    # align schemas for the union: right rows carry NULL left columns
    for c in out_cols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l = left.select(
        *out_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    r = r.select(
        *out_cols,
        F.col("__rts").alias("__t"),
        F.lit(0).alias("__tag"),
        F.col("__p"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    res = matched.filter(F.col("__tag") == 1).select(
        *out_cols,
        *[F.col(f"__m.{dst}").alias(dst) for dst in payload.values()],
        *( [F.col("__m.__mts").alias(matched_ts)] if matched_ts else [] ),
    )
    return res


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: assign a session ordinal per key where a
    new session starts whenever the gap to the previous event exceeds
    ``gap_seconds``.

    Two stacked window expressions over ONE (key)-partitioned sort —
    lag to mark session starts, running sum to number them. The two
    Window nodes are adjacent in the physical plan and share the same
    exchange + sort (verified: no Exchange/Sort between them), so the
    cost is one shuffle + one per-key sort, the same as any
    time-series pass. The batch twin of the streaming session_window
    aggregation (streaming/windows.py).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    # timestamp arithmetic, not epoch flooring: exact to the microsecond
    # and identical in any SQL engine used as an oracle
    gap = F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND")
    is_start = F.when(prev.isNull() | (F.col(ts) - prev > gap), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def range_join_broadcast(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Range join, small-interval-side shape: every fact row matched to
    the intervals containing its value (lo <= v < hi).

    The intervals side is explicitly broadcast, so the plan is a
    BroadcastNestedLoopJoin — the RIGHT physical strategy when one
    side is a dimension of bands/tiers: the fact side never shuffles
    and the per-row work is a scan of the (tiny) broadcast list.
    Use range_join_bucketed when BOTH sides are large."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(intervals), cond, "inner")


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join, large-large shape: quantize the value axis into
    fixed-width grid cells; each interval row is exploded to every
    cell it overlaps, facts map to their single cell, the join becomes
    an EQUI-join on the cell id (shuffle on a long key — the only wide
    stage), and the exact lo <= v < hi predicate refines inside the
    matched cells.

    Row amplification is interval_span / bucket_width per interval
    row — pick bucket_width near the typical interval length so each
    interval lands in O(1) cells. This is the standard scale shape
    (Spark has no native range-join optimizer); a cross join or a
    nested-loop over two large sides is the thing this avoids."""
    cell = lambda c: F.floor(c / F.lit(float(bucket_width))).cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "__cell",
        F.explode(F.sequence(cell(F.col(lo_col)), cell(F.col(hi_col)))),
    )
    fx = facts.withColumn("__cell", cell(F.col(value_col)))
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return (
        fx.hint("shuffle_hash")
        .join(iv, "__cell")
        .filter(cond)
        .drop("__cell")
    )


def gap_fill(
    agg: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step: str,
    fill: dict | None = None,
) -> DataFrame:
    """Densify a per-key bucketed time series: emit EVERY step-spaced
    bucket between each key's min and max bucket, left-joining the
    sparse aggregate and filling the holes (``fill`` maps column →
    constant; unfilled columns stay NULL for a downstream ffill).

    Scale shape: the per-key (min, max) is one map-side-combined
    aggregate; the dense grid is sequence+explode — generated, never
    shuffled as input; the fill join is co-partitioned on
    (key, bucket) with the aggregate it densifies. Row amplification
    is bounded by the real time span of each key, not the global
    span (a key active for one day never expands to the full year).
    """
    bounds = agg.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__b0"), F.max(bucket_col).alias("__b1")
    )
    # Spread the bounds BEFORE the explode: AQE sizes the exchange
    # feeding this stage from the tiny pre-explode bounds table and
    # coalesces it to one partition — then the explode amplifies
    # 100-1000x INSIDE that single task and every downstream window /
    # projection runs serial (measured on the sf0.1 interpolation
    # entry: 1 M grid rows on 1 task, 13-30 s; spread, <3 s). A
    # round-robin repartition of the bounds is not redundant with any
    # required hash partitioning, so the optimizer keeps it; it moves
    # only per-key (min, max) rows, and the post-explode exchange the
    # fill join / windows need is then sized from honest post-explode
    # statistics.
    n_spread = int(
        agg.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    bounds = bounds.repartition(n_spread)
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    out = grid.join(agg, [*key_cols, bucket_col], "left")
    if fill:
        out = out.fillna(fill)
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join: pair every left interval with every
    right interval it overlaps (``l.lo <= r.hi AND r.lo <= l.hi``,
    inclusive) — session overlap, booking conflicts, validity-window
    matching.

    Scale shape: both sides explode onto a fixed-width grid of cells,
    the join becomes an EQUI-join on the cell id, and the exact
    overlap predicate refines inside cells. A pair can share several
    cells; instead of a dedup pass, each pair is emitted ONLY from its
    canonical cell (the first cell both intervals cover) — no extra
    exchange, and genuinely duplicate input rows produce duplicate
    matches exactly like the theta join this replaces. Same grid
    family as range_join_bucketed, generalized to interval×interval.
    Pick bucket_width near the typical interval length so each side
    lands in O(1) cells; a naive theta join here is a cross join,
    which this exists to avoid.

    Malformed intervals (hi < lo) produce no matches (empty cell
    list), never a job abort. Only ``inner`` is supported: outer
    variants would need the unmatched sides re-derived.
    """
    if how != "inner":
        raise ValueError("interval_overlap_join supports how='inner' only")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"left and right share column names {sorted(clash)}; "
            "rename before joining so the output is unambiguous"
        )
    llo, lhi = left_range
    rlo, rhi = right_range
    cell = lambda c: F.floor(c / F.lit(float(bucket_width))).cast("long")  # noqa: E731

    def cells(lo: str, hi: str):
        return F.when(
            F.col(hi) >= F.col(lo),
            F.sequence(cell(F.col(lo)), cell(F.col(hi))),
        ).otherwise(F.array().cast("array<bigint>"))

    lb = left.withColumn("__cell", F.explode(cells(llo, lhi)))
    rb = right.withColumn("__cell", F.explode(cells(rlo, rhi)))
    overlap = (F.col(llo) <= F.col(rhi)) & (F.col(rlo) <= F.col(lhi))
    canonical = F.col("__cell") == F.greatest(
        cell(F.col(llo)), cell(F.col(rlo))
    )
    return lb.join(rb, "__cell").where(overlap & canonical).drop("__cell")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance_sec: int,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with a match-window tolerance (pandas merge_asof
    semantics): ``backward`` pairs each left row with the most recent
    right row at/before it, ``forward`` with the earliest right row
    at/after it — and in BOTH directions the match is voided (payload
    NULLed, left row kept) when the time gap exceeds
    ``tolerance_sec``. The stale-quote guard asof_join alone cannot
    express: "most recent sensor reading, unless it is more than an
    hour old".

    Same scale shape as asof_join: one union, one window partitioned
    by the key (never global), last(ignorenulls) carries the payload
    struct; ``forward`` simply reverses the window order. The
    tolerance applies per-row afterward as a pure projection.

    Right NULL timestamps are dropped (no-match, DuckDB ASOF
    semantics). Ties on (key, ts): backward picks the last right row
    in ts order, forward the first — pre-dedupe if that matters.

    Returns left columns + payload values + ``__gap_us`` (exact
    microsecond gap; NULL when no in-tolerance match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance_sec < 0:
        raise ValueError(f"tolerance_sec must be >= 0, got {tolerance_sec}")
    out_cols = list(left.columns)
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__rts"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(src).alias(dst) for src, dst in payload.items()],
        ).alias("__p"),
    )
    for c in out_cols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l = left.select(
        *out_cols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    r = r.select(
        *out_cols,
        F.col("__rts").alias("__t"),
        F.lit(0).alias("__tag"),
        F.col("__p"),
    )
    u = l.unionByName(r)
    if direction == "backward":
        # right rows (tag 0) sort before left rows at equal ts, so a
        # same-instant right row IS visible to the left row
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # reversed order: scanning from latest to earliest, right rows
        # still sort "before" the left row at equal ts
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").desc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    # MICROSECOND timestampdiff: exact integer at the data's own
    # resolution, so no truncation-direction ambiguity between engines
    # (SECOND-granularity diffs count boundary crossings in DuckDB but
    # elapsed whole units in Spark — a 0.2 s gap straddling :01.000
    # would disagree). Works for TIMESTAMP and TIMESTAMP_NTZ alike.
    gap = (
        F.expr("timestampdiff(MICROSECOND, __m.__mts, __t)")
        if direction == "backward"
        else F.expr("timestampdiff(MICROSECOND, __t, __m.__mts)")
    )
    ok = F.col("__m").isNotNull() & (
        gap <= F.lit(int(tolerance_sec) * 1_000_000)
    )
    return matched.filter(F.col("__tag") == 1).select(
        *out_cols,
        *[
            F.when(ok, F.col(f"__m.{dst}")).alias(dst)
            for dst in payload.values()
        ],
        F.when(ok, gap).cast("long").alias("__gap_us"),
    )
