"""Plan-health audit over every registered (non-streaming) query.

Flags the anti-patterns the scale contract (SCALE.md / PLANS.md)
forbids, from the EXECUTED plan string:

- CartesianProduct anywhere (one sanctioned exception);
- SortAggregate outside the three documented benign holdouts
  (string/struct-payload min/max/argmax — see PLANS.md tail);
- hash-exchange counts, sorted descending, to spot lineage
  re-execution (the semdedup/triangle class of bug: a subtree
  consumed N times without a persist).

Run after adding an operator or touching a shared build;
exit code 1 on any new flag, so it can gate locally.

Usage: python tools/plan_audit.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_map_reduce_spark import caching, registry  # noqa: E402
from dist_map_reduce_spark.session import get_spark  # noqa: E402

registry.load_all()

CARTESIAN_OK = {"join_semi_anti_balance"}  # 1-row scalar crossJoin
SORTAGG_OK = {
    "profile_orders_columns",  # global min/max over string columns
    "sink_sorted_parquet_ranges",  # max(struct(ts, id)) per file
    "stats_argmax_per_nation",  # max_by with a string payload
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    flags: list[str] = []
    exchanges: list[tuple[int, str]] = []
    for name in sorted(registry.QUERIES):
        if name.startswith("streaming_"):
            continue  # streaming queries execute on plan construction
        caching.clear()
        try:
            plan = (
                registry.QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            flags.append(f"{name}: PLAN ERROR {e}")
            continue
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            flags.append(f"{name}: CartesianProduct")
        if "SortAggregate" in plan and name not in SORTAGG_OK:
            fns = sorted(
                set(
                    m.group(1)[:50]
                    for m in re.finditer(r"SortAggregate\(.*?functions=\[([^\]]*)", plan)
                )
            )
            flags.append(f"{name}: SortAggregate {fns[:1]}")
        exchanges.append((plan.count("Exchange hashpartitioning"), name))
    exchanges.sort(reverse=True)
    print("top hash-exchange counts (plan-string, incl. cached-relation reprs):")
    for n, name in exchanges[:10]:
        print(f"  {n:3d}  {name}")
    if flags:
        print("\nFLAGS:")
        for f in flags:
            print(" ", f)
        return 1
    print("\nno flags.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
