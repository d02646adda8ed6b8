"""Decade-scale probe for the IVF-ROUTED graph fold (round 12): fold
the SAME 1k-vector append batch into the SAME 200k corpus + saved
exact graph through both maintenance arms and measure wall + recall —
the honest per-batch numbers behind ``knn_graph_ivf_fold``'s claim
that routed maintenance beats the exact |batch|·N fold in the regime
``knn_graph_auto`` refuses.

Arms, per corpus (uniform worst case + planted-cluster):
- EXACT fold: ``knn_graph_incremental(corpus, batch, base_graph=
  saved)`` — one |batch|·N scan, recall 1 by theorem. Its new-row
  lists are the truth the routed arm's recall is scored against.
- ROUTED fold: ``knn_graph_ivf_fold`` at the decade probe's operating
  points (√N-ish 448 clusters, 6.25% / 12.5% probe mass) over a
  posting table assigned once (the one-time cost is timed separately
  — at 100 TB it is the index build you amortize over every batch).

The batch is synthesized from the corpus itself (ids shifted above the
domain, vectors = eps-mix of two corpus rows, re-normalized — the
``build_clustered_corpus`` recipe), so batch vectors have genuine
near neighbors for routing to find. Corpora + exact graphs come from
``knn_decade_probe.py``'s dst (run it first); results append to
``<dst>/fold_state.json``.

Run: python tools/knn_fold_probe.py [dst] [sf01_dir]
     (defaults /tmp/sf_decade /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spacex_data_engineering_pipeline_spark.operators import similarity as S  # noqa: E402
from spacex_data_engineering_pipeline_spark.session import get_spark  # noqa: E402

BATCH = 1_000
EPS = 0.2


def make_batch(spark, corpus_path: str, n: int):
    """Synthetic append batch: ids shifted by 10M, vector = (1-eps)·a +
    eps·partner, re-normalized — deterministic, no RNG."""
    base = spark.read.parquet(corpus_path).filter(
        F.col("embedding").isNotNull()
    )
    cnt = base.count()
    # deterministic hash sample — id domains may be sparse (the uniform
    # decade corpus copy-shifts keys), so modulo-on-id under-picks —
    # and the mix partner is the vector's own reverse (no join, always
    # resolves, low cosine to the original), so each batch vector has
    # its pick as a genuine near neighbor for routing to find
    picks = base.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(max(1, cnt // n))) == 0
    ).limit(n)
    mix = F.zip_with(
        F.col("embedding"), F.reverse(F.col("embedding")),
        lambda a, b: F.lit(1.0 - EPS) * a + F.lit(EPS) * b,
    )
    nrm = F.sqrt(F.aggregate(mix, F.lit(0.0), lambda acc, x: acc + x * x))
    return picks.select(
        (F.col("vec_id") + F.lit(1_000_000_000)).alias("vec_id"),
        F.transform(mix, lambda x: x / nrm).alias("embedding"),
    ).localCheckpoint(eager=True)


def new_row_lists(graph_df, batch_ids):
    rows = graph_df.filter(F.col("vec_id").isin(list(batch_ids))).collect()
    out = {}
    for r in rows:
        out.setdefault(r.vec_id, set()).add(r.neighbor)
    return out


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_decade"
    spark = get_spark(app_name="knn-fold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    state_path = os.path.join(dst, "fold_state.json")
    state = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    for label, corpus_file, graph_file in (
        ("uniform", "embeddings.parquet", "exact_graph.parquet"),
        ("clustered", "embeddings_clustered.parquet", "clustered_exact_graph.parquet"),
    ):
        rec = state.setdefault(label, {})
        corpus_path = os.path.join(dst, corpus_file)
        corpus = spark.read.parquet(corpus_path).filter(
            F.col("embedding").isNotNull()
        ).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        n = corpus.count()
        base_graph = spark.read.parquet(os.path.join(dst, graph_file))
        k = 5
        batch = make_batch(spark, corpus_path, BATCH)
        batch_ids = {r.vec_id for r in batch.select("vec_id").collect()}
        rec.update({"n": n, "batch": len(batch_ids), "k": k})

        if "exact_wall" not in rec:
            t0 = time.perf_counter()
            exact = S.knn_graph_incremental(
                corpus, batch, "vec_id", "embedding", k, base_graph=base_graph
            ).localCheckpoint(eager=True)
            rec["exact_wall"] = round(time.perf_counter() - t0, 1)
            exact.write.mode("overwrite").parquet(
                os.path.join(dst, f"fold_exact_{label}.parquet")
            )
            print(label, "exact fold", rec["exact_wall"], "s", flush=True)
        exact = spark.read.parquet(os.path.join(dst, f"fold_exact_{label}.parquet"))
        truth = new_row_lists(exact, batch_ids)

        if "assign_wall" not in rec:
            t0 = time.perf_counter()
            idx = S.build_ivf_index(
                corpus, "vec_id", "embedding",
                n_clusters=448, seed=42, persist=False,
            )
            idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(
                os.path.join(dst, f"fold_postings_{label}")
            )
            with open(os.path.join(dst, f"fold_centroids_{label}.json"), "w") as f:
                json.dump(idx.centroids.tolist(), f)
            rec["assign_wall"] = round(time.perf_counter() - t0, 1)
            print(label, "one-time assign", rec["assign_wall"], "s", flush=True)
        postings = spark.read.parquet(os.path.join(dst, f"fold_postings_{label}"))
        with open(os.path.join(dst, f"fold_centroids_{label}.json")) as f:
            centers = json.load(f)

        runs = rec.setdefault("routed", [])
        done = {r["n_probes"] for r in runs}
        for n_probes in (28, 56):  # 6.25% / 12.5% of 448
            if n_probes in done:
                continue
            t0 = time.perf_counter()
            routed = S.knn_graph_ivf_fold(
                postings, centers, batch, "vec_id", "embedding", k,
                n_probes=n_probes, base_graph=base_graph,
            ).localCheckpoint(eager=True)
            wall = round(time.perf_counter() - t0, 1)
            got = new_row_lists(routed, batch_ids)
            hits = sum(len(got.get(i, set()) & truth[i]) for i in truth)
            total = sum(len(v) for v in truth.values())
            runs.append(
                {
                    "n_probes": n_probes,
                    "probe_frac": round(n_probes / 448, 4),
                    "wall": wall,
                    "recall_new_rows": round(hits / total, 4),
                    "speedup_vs_exact": round(rec["exact_wall"] / wall, 2),
                }
            )
            print(label, runs[-1], flush=True)
            with open(state_path + ".tmp", "w") as f:
                json.dump(state, f, indent=2, sort_keys=True)
            os.replace(state_path + ".tmp", state_path)

        with open(state_path + ".tmp", "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(state_path + ".tmp", state_path)
    print(json.dumps(state, indent=2, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
