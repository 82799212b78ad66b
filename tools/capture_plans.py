#!/usr/bin/env python
"""Capture .explain("formatted") output for catalog queries.

Usage:
    python tools/capture_plans.py before q1_pricing_summary q3_... dir=plans/r10
    python tools/capture_plans.py after --all-headline

Writes plans/<outdir>/<name>_<suffix>.txt. The plan is captured at
sf0.1 (the bench scale) unless SPARK_GRAFT_SF_DIR overrides it.
"""

from __future__ import annotations

import os
import sys

from etl_script_spark.plans.catalog import CATALOG
from etl_script_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "upsert_keyed", "diff_sync_scoped", "dedup_composite_first",
    "topk_per_group", "range_projection",
]


def main() -> int:
    suffix = sys.argv[1]
    names: list[str] = []
    outdir = "plans/r10"
    for a in sys.argv[2:]:
        if a == "--all-headline":
            names.extend(HEADLINE)
        elif a.startswith("dir="):
            outdir = a[4:]
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    for name in names:
        df = CATALOG[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
