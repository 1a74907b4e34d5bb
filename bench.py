"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + full execution (count-style action
that materializes every row of the result).  A warm-up action runs first
so JVM/codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gratum_spark.session import get_spark

# Headline set: the three TPC-H-ish analytics queries plus the heaviest
# training-data-pipeline operators (dedup, ANN, text).  Correctness-only
# micro-queries (column ops, coercions) are excluded — they measure
# nothing at scale.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "op_window_rank",
    "op_rollup",
    "op_sessionize",
    "op_tumbling_window",
    "op_asof_join",
    "op_range_join",
    "op_grouping_sets",
    "op_pivot",
    "op_unpivot",
    "op_percentiles",
    "op_corr_exact",
    "op_histogram",
    "stream_tumbling_counts",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram",
    "dedup_embedding",
    "dedup_cluster_cc",
    "ann_topk",
    "text_stats",
    "text_lang_id",
    "text_top_terms",
    "text_contamination",
    "pipeline_curation",
    # added r3: the operators rotated into the driver window this round
    "text_redact_pii",
    "text_repetition",
    "multimodal_audio",
    "dedup_minhash_verified",
    "emb_quantize",
    "op_salted_join",
    "corpus_quota_sample",
    "dedup_chunks",
    "text_tfidf",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from gratum_spark.plans.queries import QUERIES  # noqa: E402

    spark = get_spark("gratum-bench")
    # Warm up JVM/codegen/Arrow/python-worker pools by running every
    # headline query once at the smallest scale factor: first-query cost
    # in a fresh session is dominated by one-time setup (measured ~45 s
    # for the pandas-UDF paths), which is not what the bench measures.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn, _ = QUERIES[name]
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # Two measured passes, report per-query MIN: filters out one-time
    # JVM/python-worker warm-up noise that otherwise lands on a random
    # query (JIT compilation, worker-pool respawn after idle reaping).
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn, _ = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Materialize every output row (not just a count, which could
            # let Spark prune the plan) — write.noop-style full evaluation.
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
