"""Leakage-safe train/validation/test splitting.

The trap in corpus splitting is assigning SPLITS TO DOCUMENTS: two
near-identical documents (exact dups, boilerplate twins) land on
opposite sides of the train/test fence and the eval leaks. The fix is
to assign splits to GROUPS — every document in a duplicate group goes
to the same side by construction (the grouped split of scikit-learn's
GroupShuffleSplit, done with deterministic hashing so any engine
replays the assignment).

Group keys compose: the default is the exact-content fingerprint
(md5 of normalized text — the cheapest leakage class); callers with a
near-dup clustering (MinHash connected components) pass the cluster
id instead and inherit the same guarantee for fuzzy leakage.

Assignment is a pure per-row expression — md5(seed || group) mod 100
against cumulative per-myriad bounds — so the split is reproducible
across runs, engines and cluster sizes, needs NO shuffle beyond what
computing the group key needs (none, for content hashing), and
rebalances only if the seed changes. Fractions apply to GROUPS, not
documents: a heavy dup-group drags its whole mass into one split
(exactly the point — the alternative is leakage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from etl_script_spark.operators.dedup import normalize_text


def group_aware_split(
    df: DataFrame,
    id_col: str,
    group: Column | None = None,
    text_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "split",
) -> DataFrame:
    """Assign every row a split label such that all rows sharing a
    group key get the SAME label. ``group`` defaults to the exact
    content fingerprint of ``text_col``; pass a cluster-id column for
    near-dup-safe splits. Percentages are integers (train + val <=
    100; the remainder is test).

    The bucket is the first 32 md5 bits of (seed || group) modulo
    100 — the engine-shared uniform, so DuckDB replays the exact
    assignment. Scan-stage projection, zero shuffle, zero UDF.

    Returns the input plus (group_fp, split).
    """
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"bad split percentages: train={train_pct} val={val_pct}"
        )
    g = group if group is not None else F.md5(normalize_text(F.col(text_col)))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), g.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("group_fp", g.cast("string")).withColumn(
        "split", split
    )
