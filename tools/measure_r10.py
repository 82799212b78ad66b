#!/usr/bin/env python
"""Round-10 measurement harness: isolated steady-state timing for a
set of catalog queries, with per-pass load evidence (same semantics
as bench.py's headline tier: fresh session, warm-up pass, min of N
timed noop-sink passes, jvm_cpu / host steal recorded per pass).

Usage:
    python tools/measure_r10.py q1_pricing_summary q3_shipping_priority
    python tools/measure_r10.py --passes 5 pipeline_sale_report_e2e

Prints one JSON object to stdout.
"""

from __future__ import annotations

import json
import os
import sys

from etl_script_spark.plans.catalog import CATALOG
from etl_script_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import _jvm_pid, _release, _timed_pass  # noqa: E402


def main() -> int:
    passes = 3
    names: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-r10")
    jvm = _jvm_pid()
    out: dict[str, dict] = {}
    for name in names:
        q = CATALOG[name]

        def _run(q=q):
            q.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        spark.sparkContext.setJobDescription(f"measure:{name}")
        _release(spark)
        warm = _timed_pass(_run, jvm)
        ps = []
        for _ in range(passes):
            _release(spark)
            ps.append(_timed_pass(_run, jvm))
        out[name] = {
            "min_wall": round(min(p["wall"] for p in ps), 4),
            "min_jvm_cpu": round(
                min(p["jvm_cpu"] for p in ps if p["jvm_cpu"] is not None),
                2,
            ),
            "warm_wall": warm["wall"],
            "passes": ps,
        }
        print(
            f"{name}: min_wall={out[name]['min_wall']}s "
            f"min_jvm_cpu={out[name]['min_jvm_cpu']} "
            f"warm={warm['wall']:.2f}s "
            f"steal={[p['host_steal_cpu'] for p in ps]}",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
