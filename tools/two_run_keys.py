"""Two-run rule, as a tool: re-measure a handful of catalog keys at a
given SF dir, twice each on a warm session, and print per-key
(artifact, run1, run2) so a drifted BENCH entry can be adjudicated as
real (reproduces in both re-runs) or host noise (neither).

SCALE_NOTES documents ±15% host swings on frozen trees; the rule this
repo applies to every flagged key is: a regression is only believed if
it reproduces across two fresh runs, and the committed artifact carries
whatever spike landed in its single run. This tool is that rule,
runnable: same warm-up as bench.py (JVM + footers + streaming engine),
same terminal actions, same per-query cache/localCheckpoint release.

Run: python tools/two_run_keys.py <sf_dir> key1 [key2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LARGE_RESULT, _warm_streaming  # noqa: E402
from spacex_data_engineering_pipeline_spark.plans.queries import (  # noqa: E402
    QUERIES,
)
from spacex_data_engineering_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="two-run")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["latest_event"](spark, sf_dir).collect()
    _warm_streaming(spark)
    jsc = spark.sparkContext._jsc
    out = {}
    for name in keys:
        runs = []
        for _ in range(2):
            pre_ids = set(jsc.getPersistentRDDs().keys())
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if name in LARGE_RESULT:
                df.count()
            else:
                df.collect()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
            import gc

            gc.collect()
            for rid, jrdd in jsc.getPersistentRDDs().items():
                if rid not in pre_ids:
                    jrdd.unpersist()
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
