"""Change-data-capture apply: collapse an ordered change feed
(insert / update / delete rows per key) into the final table state.

The reference mutates its store row-at-a-time through an ORM
(smf-api ImportDbdFinancial.php:209,244,279 — one updateOrCreate per
record per table); a CDC feed replayed that way is a day of
round-trips at 100 TB. The set-based equivalent is one window
pass: latest change per key wins, deletes drop the key. Composes with
``sources.writers.merge_into_partitioned`` for the storage side and
with ``foreachBatch`` for the streaming side (apply each micro-batch's
feed, then MERGE the survivors).

Scale shape: a single shuffle on the key columns; the window is
``row_number`` over (key, seq desc) so partial aggregation does not
apply, but AQE handles skewed keys and the state never leaves the
executors. Requires ``seq_col`` to totally order each key's changes
(Debezium LSN / Kafka offset / commit timestamp + tiebreak) — ties
within a key are a feed bug and are deterministically broken by
preferring deletes (op ascending: 'D' < 'I' < 'U') so replays stay
idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Final state after replaying the feed: one row per surviving key
    (latest non-delete change), no rows for keys whose latest change
    is a delete. Keeps every payload column; drops nothing else."""
    # op ASCENDING: 'D' < 'I' < 'U', so a same-seq tie resolves to the
    # delete — replaying a buggy feed stays idempotent-conservative
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col(op_col) != F.lit(delete_op))
