"""Per-user running-mean anomaly flags: JVM window path + custom
stateful streaming extension point (applyInPandasWithState).

``running_mean_anomalies_jvm`` is the DEFAULT: for batch and backfill
the semantics are a plain cumulative window (ROWS UNBOUNDED PRECEDING
AND 1 PRECEDING) — whole-stage-codegen, one exchange on user_id, no
Python workers. Use it whenever the input is a bounded DataFrame.

``running_mean_anomalies`` (applyInPandasWithState) exists for the
case the JVM path cannot express: UNBOUNDED streams, where row-order
windows are unsupported and the running (count, total) must be carried
across micro-batches in explicit group state. It pays the Python
worker round-trip by design — the documented escape hatch, not the
hot-path default.

Determinism contract: values are converted to integer cents by
truncation of the same IEEE double on every engine, so running sums
are exact integers and the batch-mode SQL oracle matches bit-for-bit.
Rows within a group process in (ts, event_id) order.

Scale: state is one (count, total) pair per user — O(distinct keys)
memory, partitioned by the group key across executors; Arrow batches
in/out. At 100 TB the shuffle on user_id is the only wide stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, value_cents long, prev_total_cents long, "
    "n_prev long, is_anomaly boolean"
)
STATE_SCHEMA = "n long, total_cents long"


def _anomaly_batch(
    pdf: pd.DataFrame,
    user_id: int,
    n: int,
    total: int,
    factor_num: int,
    factor_den: int,
) -> tuple[pd.DataFrame, int, int]:
    """Vectorized per-batch running state shared by BOTH stateful
    APIs: prev_total/n_prev for row i are the carried-in state plus
    the shifted cumulative sums of this batch — no per-row Python.
    int64 cast truncates the IEEE double toward zero exactly like
    int() (values are non-negative cents; cross-multiplies stay far
    below 2^63 for realistic counts x amounts). NULL/NaN values
    mirror the JVM twin exactly: NULL cents, excluded from the
    running total, still counted in n_prev, never anomalous — a raw
    astype would smuggle INT64_MIN into the state."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"])
    vals = pdf["value"].to_numpy(dtype=np.float64)
    nanmask = np.isnan(vals)
    cents = np.where(nanmask, 0.0, vals * 100).astype(np.int64)
    csum = np.cumsum(np.where(nanmask, 0, cents))
    prev_total = total + np.concatenate(([0], csum[:-1]))
    n_prev = n + np.arange(len(cents), dtype=np.int64)
    is_anom = (
        ~nanmask
        & (n_prev > 0)
        & (cents * n_prev * factor_den > factor_num * prev_total)
    )
    frame = pd.DataFrame(
        {
            "user_id": np.full(len(cents), user_id, dtype=np.int64),
            "event_id": pdf["event_id"].to_numpy(),
            "value_cents": pd.array(
                np.where(nanmask, None, cents), dtype="Int64"
            ),
            "prev_total_cents": prev_total,
            "n_prev": n_prev,
            "is_anomaly": is_anom,
        }
    )
    if len(cents):
        n = int(n_prev[-1]) + 1
        total = int(prev_total[-1]) + (0 if nanmask[-1] else int(cents[-1]))
    return frame, n, total


def _flag_anomalies(factor_num: int, factor_den: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n, total) = state.get if state.exists else (0, 0)
        user_id = key[0]
        frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            frame, n, total = _anomaly_batch(
                pdf, user_id, n, total, factor_num, factor_den
            )
            frames.append(frame)
        state.update((n, total))
        yield pd.concat(frames) if frames else pd.DataFrame(
            columns=[
                "user_id",
                "event_id",
                "value_cents",
                "prev_total_cents",
                "n_prev",
                "is_anomaly",
            ]
        )

    return fn


def running_mean_anomalies(
    events: DataFrame, factor_num: int = 2, factor_den: int = 1
) -> DataFrame:
    """Streaming (or batch-grouped) per-user anomaly flags: an event is
    anomalous when value > (factor_num/factor_den) × mean of the
    user's previous events. State = (count, total_cents) per user."""
    src = events.select("user_id", "event_id", "ts", "value")
    return src.groupBy("user_id").applyInPandasWithState(
        _flag_anomalies(factor_num, factor_den),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_mean_anomalies_jvm(
    events: DataFrame, factor_num: int = 2, factor_den: int = 1
) -> DataFrame:
    """Batch/backfill path for the running-mean anomaly flag: a
    cumulative row window per user — pure whole-stage codegen, one
    exchange on user_id, no Python workers. Output schema and integer
    semantics are identical to ``running_mean_anomalies`` (cents by
    double truncation; comparison cross-multiplied so no division).

    This is the plan you want at 100 TB when the input is bounded
    (daily batch, backfill, reprocessing): the Python-state operator
    exists only for unbounded streams, where row-order windows are
    unsupported.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = (F.col("value") * 100).cast("long")  # double→long truncates
    prev_total = F.coalesce(F.sum(cents).over(w), F.lit(0)).cast("long")
    n_prev = F.count(F.lit(1)).over(w)
    is_anom = F.coalesce(
        cents * n_prev * F.lit(factor_den)
        > F.lit(factor_num) * prev_total,
        F.lit(False),
    )
    return events.select(
        "user_id",
        "event_id",
        cents.alias("value_cents"),
        prev_total.alias("prev_total_cents"),
        n_prev.alias("n_prev"),
        is_anom.alias("is_anomaly"),
    )


def running_mean_anomalies_tws(
    events: DataFrame, factor_num: int = 2, factor_den: int = 1
) -> DataFrame:
    """Third implementation of the same contract, on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState: typed named state slots (ValueState here;
    ListState/MapState/timers available), explicit processor
    lifecycle, and state schema evolution support. Same vectorized
    batch core, same bit-exact integer semantics, so the one SQL
    oracle checks all three paths.

    Prefer this API for NEW stateful operators; the
    applyInPandasWithState twin stays as the pre-4.0 pattern.

    Environment gate: the transformWithState runtime serializes state
    through protobuf — absent in this container, so this path carries
    a unit test that skips without it (the same gated-engine
    convention as the PDF extractors) and no catalog entry; the
    applyInPandasWithState and JVM twins remain the driver-checked
    paths."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-specific
        raise ImportError(
            "transformWithStateInPandas requires protobuf at runtime; "
            "use running_mean_anomalies (applyInPandasWithState) or the "
            "JVM window twin in protobuf-less environments"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._agg.get() if self._agg.exists() else (0, 0)
            )
            user_id = key[0]
            for pdf in rows:
                frame, n, total = _anomaly_batch(
                    pdf, user_id, n, total, factor_num, factor_den
                )
                yield frame
            self._agg.update((n, total))

        def close(self) -> None:
            pass

    src = events.select("user_id", "event_id", "ts", "value")
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Proc(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
