"""Scale probe: measure operator throughput at 1×/5×/20× synthetic
corpus sizes and report the scaling slope — the empirical answer to
"does this plan hold when the data grows?".

A healthy operator scales ~linearly in rows (slope ≈ 1 in log-log,
i.e. 20× data → ~20× time or less once fixed overheads amortize).
Quadratic plans (the inlined-shingling bug this repo fixed) show up
immediately as slope ≈ 2.

Run: python tools/scale_probe.py  → prints one JSON line and writes
SCALE_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators import dedup as D
from spacex_data_engineering_pipeline_spark.session import get_spark

SIZES = [5_000, 25_000, 100_000]


def synthetic_docs(spark, n_rows: int, seed: int = 7):
    """Deterministic word-salad corpus: ~50 words per doc from a small
    vocabulary (mirrors the driver's documents table), built JVM-side
    with no Python loop."""
    vocab = [
        "spark", "table", "row", "scan", "merge", "join", "filter", "agg",
        "key", "value", "batch", "stream", "window", "sort", "hash", "part",
        "fast", "slow", "big", "small", "query", "data", "column", "line",
    ]
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(50)),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(seed)), F.lit(len(vocab))) + 1).cast("int"),
        ),
    )
    return (
        spark.range(n_rows)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .withColumn("text", F.concat_ws(" ", words))
        .withColumn("source", F.concat(F.lit("src"), F.pmod(F.col("doc_id"), 20)))
    )


def probe(spark, n_rows: int) -> dict[str, float]:
    docs = synthetic_docs(spark, n_rows).localCheckpoint()  # exclude gen cost
    timings = {}

    from spacex_data_engineering_pipeline_spark.functions.text import with_word_ngrams

    t0 = time.perf_counter()
    staged = with_word_ngrams(docs, "text", 5, out_col="g")
    staged.select(F.sum(F.size("g"))).collect()
    timings["shingle_5gram"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    D.minhash_near_dup_pairs(docs, "doc_id", "text", min_jaccard_micro=800_000).count()
    timings["minhash_lsh"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    D.exact_dedup(docs, ["text"], [F.col("doc_id").asc()]).count()
    timings["exact_dedup"] = time.perf_counter() - t0

    from spacex_data_engineering_pipeline_spark.operators.pack import (
        with_distributed_rank,
    )

    t0 = time.perf_counter()
    with_distributed_rank(
        docs.withColumn("n", F.pmod(F.xxhash64("doc_id"), 1000)),
        "n", part_cols=["source"], tiebreak_cols=["doc_id"], out_col="r",
    ).select(F.sum("r")).collect()
    timings["distributed_rank"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    grams8 = with_word_ngrams(docs, "text", 8, out_col="g8", distinct=True)
    posting = grams8.select("doc_id", F.explode("g8").alias("s"))
    from pyspark.sql import Window as _W

    dup = F.when(F.count(F.lit(1)).over(_W.partitionBy("s")) > 1, 1).otherwise(0)
    posting.withColumn("d", dup).groupBy("doc_id").agg(F.sum("d")).count()
    timings["span_duplication"] = time.perf_counter() - t0

    return {k: round(v, 3) for k, v in timings.items()}


def main() -> None:
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, 1000)  # warm JVM + codegen
    results = {n: probe(spark, n) for n in SIZES}

    lines = [
        "# SCALE_NOTES — measured operator scaling (synthetic corpus)",
        "",
        "`python tools/scale_probe.py` times the text-dedup operators at",
        f"{SIZES} rows (~50 words/doc) on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "Slope = log(t_max/t_min) / log(rows_max/rows_min); ~1.0 is linear.",
        "",
        "| operator | " + " | ".join(f"{n} rows" for n in SIZES) + " | slope |",
        "|---|" + "---|" * (len(SIZES) + 1),
    ]
    import math

    ops = list(results[SIZES[0]])
    summary = {}
    for op in ops:
        ts = [results[n][op] for n in SIZES]
        slope = math.log(ts[-1] / ts[0]) / math.log(SIZES[-1] / SIZES[0])
        summary[op] = {"timings_s": dict(zip(map(str, SIZES), ts)), "slope": round(slope, 2)}
        lines.append(
            f"| {op} | " + " | ".join(f"{t:.2f}s" for t in ts) + f" | {slope:.2f} |"
        )
    lines += [
        "",
        "Sub-linear slopes mean fixed overheads (session, scheduling,",
        "shuffle setup) still dominate at these sizes; anything ≥ ~1.3",
        "warrants a plan inspection (see tests/test_plans.py guards).",
    ]
    # Own ONLY the auto-generated block: everything after the first
    # `## ` heading is hand-written analysis and must survive re-runs.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    notes = os.path.join(repo, "SCALE_NOTES.md")
    tail = ""
    if os.path.exists(notes):
        existing = open(notes).read()
        cut = existing.find("\n## ")
        if cut != -1:
            tail = existing[cut:]
    with open(notes, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(json.dumps({"metric": "scale_probe", "results": summary}))


if __name__ == "__main__":
    main()
