"""Benchmark: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to execute via a count-style terminal action
(``df.foreach`` no-op would skip result materialization; we use
``collect`` for small results and ``count`` for large ones, mirroring
what a client would pull).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES
from spacex_data_engineering_pipeline_spark.session import get_spark

# Queries whose results are large (one row per key over a big table):
# count() them instead of collecting to the driver.
LARGE_RESULT = {"order_discount_enrichment", "latest_event_per_user", "dedup_exact_documents"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not first-touch session setup.
    QUERIES["latest_event"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in LARGE_RESULT:
            df.count()
        else:
            df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
