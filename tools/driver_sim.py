"""Mirror the driver's correctness sampling for not-yet-checked queries.

Runs each catalog query NOT in ``__spark_entry__._CHECKED`` (or names
passed on argv) at sf0.01 on Spark and DuckDB, then compares with the
driver's exact canonicalization style: pandas ``sort_values`` over all
columns (which raises on unhashable array cells — the failure mode that
broke embedding_quantize_int8 in round 4), sorted column order, repr
values. Prints one PASS/FAIL line per query and exits non-zero on any
failure.
"""

from __future__ import annotations

import os
import sys
import traceback

import pandas as pd

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from __spark_entry__ import _CHECKED  # noqa: E402
from etl_script_spark.plans.catalog import CATALOG  # noqa: E402
from tests.oracle_utils import make_duckdb  # noqa: E402

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Driver-style: sort columns by name, then sort_values over ALL
    # columns (unhashable cells -> TypeError, exactly like the driver).
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _hashable(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(repr(v) for v in row))
    return out


def main() -> int:
    names = sys.argv[1:] or [n for n in CATALOG if n not in _CHECKED]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("driver-sim")
        .getOrCreate()
    )
    con = make_duckdb(SF_DIR)
    failures = 0
    for name in names:
        q = CATALOG[name]
        try:
            sdf = q.spark(spark, SF_DIR).toPandas()
            if q.oracle is None:
                print(f"ROWS-ONLY {name}: rows={len(sdf)}")
                continue
            odf = con.execute(q.oracle).df()
            sc = _canon(sdf)
            oc = _canon(odf)
            ok_cols = list(sc.columns) == list(oc.columns)
            ok_rows = len(sc) == len(oc)
            ok_vals = ok_cols and ok_rows and _hashable(sc) == _hashable(oc)
            if ok_cols and ok_rows and ok_vals:
                print(f"PASS {name}: rows={len(sc)}")
            else:
                failures += 1
                print(
                    f"FAIL {name}: cols={ok_cols} rows={len(sc)}/{len(oc)}"
                    f" vals={ok_vals}"
                )
                if ok_cols and not ok_vals:
                    for i, (a, b) in enumerate(
                        zip(_hashable(sc), _hashable(oc))
                    ):
                        if a != b:
                            print(f"  first diff row {i}:\n   S={a}\n   O={b}")
                            break
        except Exception:
            failures += 1
            print(f"ERR  {name}:")
            traceback.print_exc()
    print(f"\n{failures} failures / {len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
