"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion via the noop sink (all columns
computed, no output cost) — ``count()`` would let Catalyst prune the plan
and overstate throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_stockheadlines_spark.plans.registry import ALL_QUERIES
from mapreduce_stockheadlines_spark.session import get_spark

HEADLINE_QUERIES = [
    "q01_filter_project",
    "q02_group_agg",
    "q03_topk_rank",
    "q09_window_partitioned",
    "q13_tokenize_count",
    "q15_word_count_analogue",
    "q19_large_join",
    "q21_time_windows",
    "q22_dedup",
    "q23_asof_join",
    "q24_range_join",
    "x01_dedup_exact",
    "x03_minhash_signatures",
    "x06_embedding_neardup",
    "x07_ann_topk",
    "x08_text_stats",
    "x09_repetition_stats",
    "x12_pii_redact",
    "x13_multimodal_pipeline",
    "x14_session_window",
    "x17_lsh_bucketed_neardup",
    "x18_ivf_topk",
    # round 5 additions (suite grew by 6: r4→r5 headline totals compare
    # on the shared 22, see README bench notes)
    "x24_url_curation",
    "x25_line_dedup",
    "x26_classifier_score",
    "x27_quantize_embeddings",
    "x28_lm_perplexity",
    "x29_token_divergence",
    "x30_remove_dup_windows",
    # round 6 additions
    "x31_pagerank",
    "x32_sampling",
    "x33_train_classifier",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE_QUERIES:
        spec = ALL_QUERIES[name]
        df = spec.builder(spark, sf_dir)
        # Warm-up run: JIT, IO cache, and the plans/catalog probe caches
        # (events ts-encoding, scan split count) all settle here, so the
        # timed builds below are probe-free and plan-identical.
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):  # best-of-3: damp GC/JIT noise in the measurement
            t0 = time.time()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_elapsed",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
