#!/usr/bin/env python
"""Per-key profiler for optimization work: run selected catalog keys
under the bench's exact methodology (same session factory, same
LARGE_RESULT action split), repeated N times, reporting wall seconds
plus Spark job/stage counts from the status store — the scheduler-floor
evidence the full bench can't give (and with min-of-N, robust to the
host's documented noise windows).

Usage: python tools/profile_key.py key1 key2 ... [--reps 3] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LARGE_RESULT, _warm_streaming
from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES
from spacex_data_engineering_pipeline_spark.session import get_spark


def _counts(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n = jobs.size()
    stages = sum(
        jobs.apply(i).stageIds().size() for i in range(n)
    )
    return n, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument(
        "--json",
        default=None,
        help="also write {key: {jobs, stages, min_s, runs}} to this path "
        "— job/stage counts are the load-independent round-over-round "
        "signal (JOBS_local.json is the committed artifact)",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="profile",
        extra_conf={
            # the status store is a ring buffer; heavy keys overflow the
            # 1000-job default and wrap the before/after counts negative
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["latest_event"](spark, args.sf).collect()
    _warm_streaming(spark)
    jsc = spark.sparkContext._jsc

    results = {}
    for name in args.keys:
        fn = QUERIES[name]
        best, runs = float("inf"), []
        jobs = stages = 0
        for rep in range(args.reps):
            pre_ids = set(jsc.getPersistentRDDs().keys())
            j0, s0 = _counts(spark)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if name in LARGE_RESULT:
                df.count()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            j1, s1 = _counts(spark)
            runs.append(round(dt, 3))
            best = min(best, dt)
            jobs, stages = j1 - j0, s1 - s0
            spark.catalog.clearCache()
            import gc

            gc.collect()
            for rid, jrdd in jsc.getPersistentRDDs().items():
                if rid not in pre_ids:
                    jrdd.unpersist()
        print(
            f"{name}: min={best:.3f}s runs={runs} "
            f"jobs/run={jobs} stages/run={stages}",
            flush=True,
        )
        results[name] = {
            "jobs": jobs,
            "stages": stages,
            "min_s": round(best, 3),
            "runs": runs,
        }
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
