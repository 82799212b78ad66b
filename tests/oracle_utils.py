"""Local mirror of the driver's DuckDB-oracle comparison: row count +
column names (sorted) + order-insensitive canonical value comparison.
Floats are compared EXACTLY (repr) — the catalog's decimal-aggregation
policy must make Spark and DuckDB bitwise-identical; any drift is a
bug to fix in the query, not to tolerate here.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        return repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Returns list of problems; empty = match."""
    problems = []
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    s_cols = sorted(str(c) for c in sdf.columns)
    o_cols = sorted(str(c) for c in odf.columns)
    if s_cols != o_cols:
        return [f"{name}: column mismatch spark={s_cols} oracle={o_cols}"]
    if len(sdf) != len(odf):
        problems.append(f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}")
    s_rows = canon_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = canon_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        extra_s = [r for r in s_rows[:5] if r not in o_rows[:50]]
        problems.append(
            f"{name}: value mismatch; first diffs={diffs!r} sample_spark_only={extra_s!r}"
        )
    return problems
