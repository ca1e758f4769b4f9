"""Shared-22 bench spread (VERDICT r5 #6): run the 22 queries common to
the r4 and r5 headline suites 5x IN ONE PROCESS at sf0.1 and print the
per-run subtotal spread, so README bench notes can cite a measured
spread instead of a point estimate. Usage:

    python scripts/bench_spread.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mapreduce_stockheadlines_spark.plans.registry import ALL_QUERIES
from mapreduce_stockheadlines_spark.session import get_spark

SHARED_22 = [
    "q01_filter_project", "q02_group_agg", "q03_topk_rank",
    "q09_window_partitioned", "q13_tokenize_count",
    "q15_word_count_analogue", "q19_large_join", "q21_time_windows",
    "q22_dedup", "q23_asof_join", "q24_range_join", "x01_dedup_exact",
    "x03_minhash_signatures", "x06_embedding_neardup", "x07_ann_topk",
    "x08_text_stats", "x09_repetition_stats", "x12_pii_redact",
    "x13_multimodal_pipeline", "x14_session_window",
    "x17_lsh_bucketed_neardup", "x18_ivf_topk",
]


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-spread")
    spark.sparkContext.setLogLevel("ERROR")

    # settle probe caches / JIT once, same as bench.py's warm-up
    for name in SHARED_22:
        ALL_QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    subtotals = []
    per_query: dict[str, list[float]] = {n: [] for n in SHARED_22}
    for run in range(n_runs):
        total = 0.0
        for name in SHARED_22:
            t0 = time.time()
            ALL_QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            per_query[name].append(dt)
            total += dt
        subtotals.append(round(total, 2))
        print(f"run {run + 1}: shared-22 subtotal {total:.2f}s", flush=True)

    print(json.dumps({
        "subtotals": subtotals,
        "min": min(subtotals),
        "max": max(subtotals),
        "per_query_minmax": {
            n: [round(min(v), 3), round(max(v), 3)]
            for n, v in per_query.items()
        },
    }))


if __name__ == "__main__":
    main()
