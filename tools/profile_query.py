"""Per-query profiler for the optimization rounds (guide §1).

For each named catalog query: time plan build (fn(spark, dir) — includes
any eager localCheckpoint jobs), time the noop-sink execution (guide
§1.4), count Spark jobs/stages/tasks the query submitted (statusTracker
deltas), and optionally dump `.explain("formatted")` to a file.

Usage:
  python tools/profile_query.py [--sf DIR] [--passes N] [--explain-dir D]
                                [--warm] query [query ...]
  python tools/profile_query.py --all          # every HEADLINE query

Prints one JSON line per query:
  {"name":..., "build_sec":[...], "exec_sec":[...], "jobs":N,
   "stages":N, "tasks":N}
(build/exec lists have one entry per pass; job counts are from the last
pass.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gratum_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--warm", action="store_true",
                    help="one throwaway pass at sf0.001 then one at --sf first")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from gratum_spark.plans.queries import QUERIES  # noqa: E402

    names = args.queries
    if args.all:
        import importlib

        bench = importlib.import_module("bench")
        names = list(bench.HEADLINE)

    spark = get_spark("gratum-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker

    def run(name: str, data_dir: str) -> tuple[float, float]:
        fn, _ = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, data_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        return round(t1 - t0, 3), round(t2 - t1, 3)

    if args.warm:
        for name in names:
            try:
                run(name, "/root/testdata/sf0.001")
            except Exception as exc:  # noqa: BLE001
                print(f"warm {name}: {exc}", file=sys.stderr)
        for name in names:
            try:
                run(name, args.sf)
            except Exception:
                pass

    for name in names:
        sc.setJobDescription(f"profile:{name}")
        builds, execs = [], []
        jobs0 = tracker().getJobIdsForGroup(None)
        st = spark._jsparkSession.sparkContext().statusTracker()
        # job/stage counters via the JVM AppStatusStore would need more
        # plumbing; count jobs by id delta instead
        before_max = max([-1] + list(tracker().getJobIdsForGroup(None) or []))
        for _ in range(args.passes):
            b, e = run(name, args.sf)
            builds.append(b)
            execs.append(e)
        ids = [j for j in (tracker().getJobIdsForGroup(None) or []) if j > before_max]
        n_stages = 0
        n_tasks = 0
        for j in ids:
            ji = tracker().getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
                for s in ji.stageIds:
                    si = tracker().getStageInfo(s)
                    if si is not None:
                        n_tasks += si.numTasks
        rec = {
            "name": name,
            "build_sec": builds,
            "exec_sec": execs,
            "jobs": round(len(ids) / max(args.passes, 1), 1),
            "stages": round(n_stages / max(args.passes, 1), 1),
            "tasks": round(n_tasks / max(args.passes, 1), 1),
        }
        print(json.dumps(rec), flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            fn, _ = QUERIES[name]
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        sc.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
