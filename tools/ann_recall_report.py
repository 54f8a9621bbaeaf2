"""Print the ANN recall@5 table (SCALE.md §ANN recall) for a fixture
dir — run after touching any index build to keep the documented
numbers honest.

Usage: python tools/ann_recall_report.py [sf_dir ...]
Defaults to sf0.01 and sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_map_reduce_spark import registry  # noqa: E402
from dist_map_reduce_spark.session import get_spark  # noqa: E402

registry.load_all()


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("ann_recall_report")
    for sf_dir in dirs:
        print(f"== {sf_dir} ==")
        rows = (
            registry.QUERIES["similarity_ann_recall"](spark, sf_dir)
            .orderBy("variant")
            .collect()
        )
        for r in rows:
            print(f"  {r.variant:<12} hits={r.hits:>3}  recall@5={r.recall:.4f}")


if __name__ == "__main__":
    main()
