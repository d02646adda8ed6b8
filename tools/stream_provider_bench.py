"""Measure the streaming catalog family under both state-store
providers (verdict r7 task 4: the RocksDB dial was measured at sf0.1
only, while the largest sf1.0 entries are all stateful streaming).

    python tools/stream_provider_bench.py {hdfs|rocksdb} [sf_dir]

Each provider runs in its own process/session (the provider class is
frozen into a checkpoint at first start; the catalog's streaming
entries use fresh per-run checkpoints, so the dial is honest). Prints
one JSON line with per-query and total wall."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacex_data_engineering_pipeline_spark.plans.queries import QUERIES
from spacex_data_engineering_pipeline_spark.session import get_spark


def main() -> int:
    provider = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    spark = get_spark(
        app_name=f"stream-bench-{provider}", state_store_provider=provider
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench._warm_streaming(spark)
    names = sorted(k for k in QUERIES if k.startswith("streaming_"))
    timings = {}
    for k in names:
        t0 = time.perf_counter()
        df = QUERIES[k](spark, sf_dir)
        if k in bench.LARGE_RESULT:
            df.count()
        else:
            df.collect()
        timings[k] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "provider": provider,
                "sf_dir": sf_dir,
                "timings": timings,
                "total": round(sum(timings.values()), 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
