"""Round-9 fixes, each pinned by a boundary or cross-engine test:
the empty-document token-count divergence in the batch planner
(ADVICE r8 medium), the exact integer log2 band at the 2^48 float
boundary, Kendall's sign classification at int64 extremes, the
enforced Θ(n²)-per-group contract, and the shuffle-free char-entropy
rewrite's brute-force twin."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


# ------------------------------------------------------------------ #
# Empty-doc token count: both engines must agree a whitespace-only
# document has 0 tokens (ADVICE r8: split('', ' ') = [''] made the
# Spark side count 1 and keep the doc the oracle excluded)
# ------------------------------------------------------------------ #

def test_token_count_ws_nonempty_zero_for_empty_docs(spark):
    from etl_script_spark.operators.textstats import (
        token_count_ws, token_count_ws_nonempty,
    )

    df = spark.createDataFrame(
        [("", ), ("   ", ), ("\t\n ", ), ("a b", ), (" one ", )],
        "text string",
    )
    rows = df.select(
        token_count_ws(F.col("text")).alias("plain"),
        token_count_ws_nonempty(F.col("text")).alias("nonempty"),
    ).collect()
    assert [r["nonempty"] for r in rows] == [0, 0, 0, 2, 1]
    # the plain count's empty-token artifact, documented not hidden
    assert [r["plain"] for r in rows] == [1, 1, 1, 2, 1]


def test_batch_budget_excludes_empty_doc_both_engines(spark):
    """A corpus WITH an empty document: the Spark batch plan and the
    DuckDB oracle form must produce identical (id, batch_id) — the
    empty doc enters neither (it has 0 non-empty tokens)."""
    from etl_script_spark.operators.textstats import (
        batch_by_token_budget, token_count_ws_nonempty,
    )

    docs = [(i, f"word {'x ' * (i % 7)}doc{i}") for i in range(40)]
    docs.append((40, ""))
    docs.append((41, "   "))
    df = spark.createDataFrame(docs, "id long, text string")
    base = df.select(
        "id", token_count_ws_nonempty(F.col("text")).cast("long").alias("n_tok")
    )
    got = {
        (r["id"], r["band"], r["batch_id"])
        for r in batch_by_token_budget(base, "id", "n_tok", budget=9).collect()
    }
    assert all(i not in {40, 41} for i, _, _ in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE d (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = {
        tuple(r)
        for r in con.execute("""
            WITH base AS (
              SELECT id,
                     CAST(len(list_filter(string_split(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       ' '), w -> w != '')) AS BIGINT) AS n_tokens
              FROM d
            ),
            banded AS (
              SELECT id, n_tokens,
                     CAST(length(to_base(n_tokens, 2)) - 1 AS INT) AS band
              FROM base WHERE n_tokens > 0
            ),
            packed AS (
              SELECT id, band, n_tokens,
                     SUM(n_tokens) OVER (
                       PARTITION BY band
                       ORDER BY md5('bb' || CAST(id AS VARCHAR)) ASC, id ASC
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM banded
            )
            SELECT id, band,
                   CAST((CAST(cum AS HUGEINT) - n_tokens) // 9 AS BIGINT)
            FROM packed
        """).fetchall()
    }
    assert got == want


# ------------------------------------------------------------------ #
# Exact integer band: floor(log2) via float diverges between engines
# at 2^48-1 (Spark's log(x)/log(2) rounds UP to 48; exact is 47)
# ------------------------------------------------------------------ #

def test_batch_budget_band_exact_at_float_boundary(spark):
    from etl_script_spark.operators.textstats import batch_by_token_budget

    hostile = [
        (1, 1), (2, 2), (3, 3), (4, 4), (5, 7), (6, 8),
        (7, (1 << 48) - 1), (8, 1 << 48), (9, (1 << 53) + 1),
        (10, (1 << 62) + 5),
    ]
    df = spark.createDataFrame(hostile, "id long, n_tok long")
    bands = {
        r["id"]: r["band"]
        for r in batch_by_token_budget(df, "id", "n_tok", budget=100).collect()
    }
    for i, n in hostile:
        assert bands[i] == n.bit_length() - 1, (i, n, bands[i])
    # the float path would give 48 here; the exact band is 47
    assert bands[7] == 47 and bands[8] == 48


# ------------------------------------------------------------------ #
# Kendall sign at int64 extremes: subtraction wraps, comparison never
# ------------------------------------------------------------------ #

def test_kendall_sign_no_overflow_at_int64_extremes(spark):
    from etl_script_spark.operators import stats

    lo, hi = -(1 << 62), (1 << 62)
    # x perfectly concordant with y; the old signum(j.x - i.x) wrapped
    # (hi - lo = 2^63 overflows) and misclassified the extreme pair
    df = spark.createDataFrame(
        [("g", lo, 1), ("g", 0, 2), ("g", hi, 3)],
        "g string, x long, y long",
    )
    row = stats.kendall_tau_groups(df, "g", "x", "y").collect()[0]
    assert row["concordant"] == 3 and row["discordant"] == 0
    assert row["tau_b_milli"] == 1000


def test_kendall_sign_discordant_at_extremes(spark):
    from etl_script_spark.operators import stats

    lo, hi = -(1 << 62), (1 << 62)
    df = spark.createDataFrame(
        [("g", lo, 3), ("g", 0, 2), ("g", hi, 1)],
        "g string, x long, y long",
    )
    row = stats.kendall_tau_groups(df, "g", "x", "y").collect()[0]
    assert row["concordant"] == 0 and row["discordant"] == 3
    assert row["tau_b_milli"] == -1000


# ------------------------------------------------------------------ #
# Θ(n²)-per-group contract is ENFORCED, not documented
# ------------------------------------------------------------------ #

def _oversized(spark, n=25):
    return spark.createDataFrame(
        [("g", i, i * 2 + (i % 3)) for i in range(n)],
        "g string, x long, y long",
    )


def test_group_size_guard_raises_kendall(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    from etl_script_spark.operators import stats

    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_group_rows"
    ):
        stats.kendall_tau_groups(
            _oversized(spark), "g", "x", "y", max_group_rows=10
        ).collect()


def test_group_size_guard_raises_theil_sen(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from py4j.protocol import Py4JJavaError

    from etl_script_spark.operators import stats

    with pytest.raises(
        (Py4JJavaError, PySparkException), match="max_group_rows"
    ):
        stats.theil_sen_groups(
            _oversized(spark), "g", "x", "y", max_group_rows=10
        ).collect()


def test_group_size_guard_none_disables(spark):
    from etl_script_spark.operators import stats

    df = _oversized(spark)
    assert stats.kendall_tau_groups(
        df, "g", "x", "y", max_group_rows=None
    ).count() == 1
    assert stats.theil_sen_groups(
        df, "g", "x", "y", max_group_rows=None
    ).count() == 1
    # at/under the bound passes untouched
    assert stats.kendall_tau_groups(
        df, "g", "x", "y", max_group_rows=25
    ).count() == 1


def test_group_size_guard_rejects_degenerate_bound(spark):
    from etl_script_spark.operators import stats

    with pytest.raises(ValueError, match="max_group_rows"):
        stats.kendall_tau_groups(
            _oversized(spark), "g", "x", "y", max_group_rows=1
        )


# ------------------------------------------------------------------ #
# char_entropy: the shuffle-free rewrite vs an exact Python twin
# ------------------------------------------------------------------ #

def _entropy_twin(text: str) -> tuple[int, int]:
    """Exact integer twin of the micro-quantized entropy policy."""
    chars = [c for c in text if c != ""]
    n = len(chars)
    if n == 0:
        return 0, 0
    from collections import Counter

    t_micro = sum(
        c * round(math.log2(c) * 1e6) for c in Counter(chars).values()
    )
    h_micro = round(math.log2(n) * 1e6) - t_micro // n  # both >= 0
    return n, h_micro // 1000


def test_char_entropy_matches_python_twin(spark):
    from etl_script_spark.operators.textstats import char_entropy

    docs = [
        (1, "aaaaaaaa"),              # zero entropy
        (2, "abababab"),              # exactly 1 bit/char
        (3, "abcdefgh"),              # exactly 3 bits/char
        (4, ""),                      # empty -> 0
        (5, "the quick brown fox jumps over the lazy dog"),
        (6, "aab"),                   # ties + truncating DIV
        (7, "naïve — ünïcödé text"),  # non-ASCII chars
        (8, "zzzzzzzzzzzzzzzzzzzzy"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["n_chars"], r["entropy_mbits"])
        for r in char_entropy(df, "text", "id").collect()
    }
    for i, text in docs:
        assert got[i] == _entropy_twin(text), (i, text, got[i])
    assert got[1][1] == 0 and got[2][1] == 1000 and got[3][1] == 3000


def test_char_entropy_plan_has_no_explode_or_corpus_shuffle(spark):
    """The rewrite's contract: per-row HOFs only — no Generate
    (explode) node and no hash-aggregate over a (doc, char) fan-out
    in the plan."""
    from etl_script_spark.operators.textstats import char_entropy

    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    plan = char_entropy(df, "text", "id")._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
