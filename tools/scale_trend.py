"""Dedup-family scale-trend measurement (r4 verdict task 5; closes r2
task 4): run the four near-dup operators at sf0.01 and sf0.1 in ONE
session and record wall time, input rows, and output rows at each scale.

What this is evidence for: the r2 "narrow band-join" trade
(dedup.py _lsh_candidates carries only (band, h, id) through the LSH
shuffle and re-joins signatures per-candidate) was chosen for 100 TB
behavior. If candidate generation were super-linear (a skewed band
bucket, a stop-shingle blowup), the 10x input step would show a >>10x
time/output step. ~Linear-in-rows growth is the pass condition.

Usage: PYTHONPATH=/root/repo python tools/scale_trend.py [op ...]
With op names, re-measures just those rows and merges them into
SCALE_TREND.json; with none, rewrites the full table. Prints a
markdown table (committed as SCALE_TREND.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gratum_spark.plans.queries import QUERIES
from gratum_spark.session import get_spark

OPS = [
    "dedup_minhash",
    "dedup_minhash_verified",
    "dedup_ngram",
    "dedup_embedding",
    # r6 (r5 verdict task 7): the remaining families with shuffle
    # behavior worth pinning — broadcast-gram contamination join,
    # one-action TF-IDF, expression-only chunk explode, micro-batch
    # streaming aggregation
    "text_contamination",
    "text_tfidf",
    "text_chunks",
    "stream_tumbling_counts",
    # r6 new operators: distributed prefix-sum packing and the
    # cross-corpus incremental dedup family
    "text_pack",
    "dedup_incremental",
    "corpus_novel_docs",
    # late-r6 operators: chunk rewrite (string reassembly agg),
    # SemDeDup (single cluster shuffle + per-cluster gram), BM25
    # (postings aggregates + broadcast query probe), mixture (no data
    # shuffle — should be ~flat), keep-best (one window shuffle)
    "dedup_rewrite",
    "dedup_semantic",
    "text_bm25",
    "corpus_mixture",
    "dedup_keep_best",
    # wave-2 + final late-r6 operators
    "text_collapse_repeats",
    "text_pmi",
    "text_canary",
    "emb_decontaminate",
    "corpus_report",
    "op_resample_interpolate",
    "text_hybrid_search",
    "graph_pagerank",
    "corpus_diff_report",
    # wave-3 late-r6 operators: exact-substring span dedup (shingle
    # count + islands window — the corpus-sized groupBy is the scale
    # risk) and bigram-LM perplexity (two model-table joins)
    "dedup_spans",
    "dedup_span_rewrite",
    "text_perplexity",
    "corpus_dsir",
]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
INPUT_TABLE = {
    "dedup_minhash": "documents",
    "dedup_minhash_verified": "documents",
    "dedup_ngram": "documents",
    "dedup_embedding": "embeddings",
    "text_contamination": "documents",
    "text_tfidf": "documents",
    "text_chunks": "documents",
    "stream_tumbling_counts": "events",
    "text_pack": "documents",
    "dedup_incremental": "documents",
    "corpus_novel_docs": "documents",
    "dedup_rewrite": "documents",
    "dedup_semantic": "embeddings",
    "text_bm25": "documents",
    "corpus_mixture": "documents",
    "dedup_keep_best": "documents",
    "text_collapse_repeats": "documents",
    "text_pmi": "documents",
    "text_canary": "documents",
    "emb_decontaminate": "embeddings",
    "corpus_report": "documents",
    "op_resample_interpolate": "events",
    "text_hybrid_search": "documents",
    "graph_pagerank": "lineitem",
    "corpus_diff_report": "documents",
    "dedup_spans": "documents",
    "dedup_span_rewrite": "documents",
    "text_perplexity": "documents",
    "corpus_dsir": "documents",
}


def main() -> int:
    # optional subset: `python tools/scale_trend.py op1 op2 ...`
    # re-measures just those rows and merges into SCALE_TREND.json
    # (full-table rewrite when no args)
    subset = [a for a in sys.argv[1:] if a in INPUT_TABLE]
    ops = subset or OPS
    spark = get_spark("scale-trend")
    # warm-up: one pass of each op at the small SF so JVM/codegen/Arrow
    # startup isn't charged to the first measured cell
    for op in ops:
        fn, _ = QUERIES[op]
        fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, dict[str, float]]] = {}
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        for op in ops:
            fn, _ = QUERIES[op]
            in_rows = spark.read.parquet(
                f"{sf_dir}/{INPUT_TABLE[op]}.parquet"
            ).count()
            best = None
            out_rows = None
            for _ in range(2):  # min-of-2: drop one-off JIT noise
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                out_rows = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(op, {})[sf] = {
                "sec": round(best, 3),
                "input_rows": in_rows,
                "output_rows": out_rows,
            }

    trend = {}
    for op, by_sf in results.items():
        a, b = by_sf["sf0.01"], by_sf["sf0.1"]
        trend[op] = {
            **by_sf,
            "ratio_input": round(b["input_rows"] / a["input_rows"], 2),
            "ratio_time": round(b["sec"] / a["sec"], 2),
            "ratio_output": round(b["output_rows"] / max(a["output_rows"], 1), 2),
        }

    out_path = os.path.join(os.path.dirname(__file__), "..", "SCALE_TREND.json")
    if subset and os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(trend)
        trend_to_write = merged
    else:
        trend_to_write = trend
    with open(out_path, "w") as f:
        json.dump(trend_to_write, f, indent=2)

    # print the FULL merged table (not just this run's rows): the
    # committed SCALE_TREND.md is regenerated from this output, and a
    # subset run must not silently drop every other operator's row
    print("| operator | sf0.01 s | sf0.1 s | in 10x | time x | out pairs 0.01 -> 0.1 |")
    print("|---|---|---|---|---|---|")
    for op, t in trend_to_write.items():
        print(
            f"| {op} | {t['sf0.01']['sec']} | {t['sf0.1']['sec']} | "
            f"{t['ratio_input']} | {t['ratio_time']} | "
            f"{t['sf0.01']['output_rows']} -> {t['sf0.1']['output_rows']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
