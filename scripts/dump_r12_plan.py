"""Dump normalized explain("formatted") for named queries to
plans/r12/<query>_<tag>.txt — the before/after plan evidence for the
round-12 optimization notes (OPTIMIZATION_r12.md).

Usage: python scripts/dump_r12_plan.py <tag> <query> [query ...]
       python scripts/dump_r12_plan.py <tag> --all
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from dump_plans import _normalize  # noqa: E402  (sibling script)
from mapreduce_stockheadlines_spark.plans.guard import formatted_plan
from mapreduce_stockheadlines_spark.plans.registry import ALL_QUERIES
from mapreduce_stockheadlines_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = "/root/repo/plans/r12"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all"]:
        names = list(ALL_QUERIES)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-dump-r12")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL_QUERIES[name].builder(spark, SF_DIR)
        plan = _normalize(formatted_plan(df))
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
