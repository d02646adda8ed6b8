"""End-to-end streaming LATENCY surface (verdict r7 optional task):
all other streaming grading is AvailableNow file-source THROUGHPUT —
correctness of final state after draining a bounded backlog. This
probe measures the other axis: a live rate source under a
processing-time trigger, per-record latency = (micro-batch completion
wall) − (record's source-assigned event timestamp), reported as
percentiles.

What the number means: with a map+agg micro-workload the p50 is
dominated by trigger cadence (a record waits on average half a trigger
interval before its batch even starts) + micro-batch schedule/commit
overhead — the structural latency floor of micro-batch execution.
That floor is what you dial with the trigger interval; at 100 TB the
same probe (rate-micro-batch per executor) separates "the trigger is
too coarse" from "the batch can't keep up" (rising p95 across batches
= falling behind; flat = keeping up).

Wall-clock-dependent BY DESIGN → bench-only scenario (like the
pipeline scenarios), never an oracle-graded catalog entry: the oracle
policy grades deterministic values, and a latency is not one.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def rate_latency_probe(
    spark: SparkSession,
    rows_per_second: int = 2000,
    trigger: str = "500 milliseconds",
    min_batches: int = 8,
    warmup_batches: int = 2,
    timeout_sec: float = 60.0,
) -> dict:
    """Drive a rate source for ``min_batches`` micro-batches and return
    end-to-end latency percentiles.

    Each micro-batch first pays the measured workload (a bucketed
    count over the batch — forces a full scan+agg before the
    completion stamp), then every record's latency is completion wall
    minus its source timestamp. The first ``warmup_batches`` batches
    are discarded (they carry one-time stream-engine init, the same
    reason bench.py warms streaming before timing).
    """
    samples: list[tuple[int, float]] = []

    def handle(bdf, epoch_id: int) -> None:
        bdf.groupBy(F.pmod(F.col("value"), F.lit(32)).alias("b")).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        done = time.time()
        for r in bdf.select("timestamp").collect():
            samples.append((epoch_id, done - r["timestamp"].timestamp()))

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .writeStream.foreachBatch(handle)
        .trigger(processingTime=trigger)
        .start()
    )
    t0 = time.time()
    try:
        while time.time() - t0 < timeout_sec:
            epochs = {e for e, _ in samples}
            if len(epochs) >= min_batches + warmup_batches:
                break
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(30)

    epochs = sorted({e for e, _ in samples})
    keep = set(epochs[warmup_batches:])
    lats = sorted(lat for e, lat in samples if e in keep)
    if not lats:
        raise RuntimeError("latency probe produced no post-warmup samples")

    def pct(p: float) -> float:
        return lats[min(len(lats) - 1, int(p * len(lats)))]

    return {
        "n_samples": len(lats),
        "n_batches": len(keep),
        "rows_per_second": rows_per_second,
        "trigger": trigger,
        "p50_sec": round(pct(0.50), 4),
        "p95_sec": round(pct(0.95), 4),
        "p99_sec": round(pct(0.99), 4),
        "max_sec": round(lats[-1], 4),
    }
