#!/usr/bin/env python
"""Dump explain('formatted') evidence for the r14 optimization round.

Two kinds of artifact, both under plans/r14/:

1. OPERATOR plans for the fused kNN-graph maintenance ops — the code
   the optimization actually changed. The streaming entries return a
   localCheckpoint scan (their pipelines run inside the timed region),
   so the physical-plan diff lives at the operator layer: the upsert
   merge plan (TWO MapInPandas corpus passes before, ONE after), the
   delete merge plan, and the CDC batch plan (delete-then-upsert chain
   before, one fused pass after).

2. ENTRY plans for the touched catalog keys — proving the returned
   frame's shape is unchanged.

Run from either the optimized tree or the pre-optimization worktree:
    python tools/dump_r14_plans.py <suffix>   # suffix: before | after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.plans.queries import (
    QUERIES,
    load_table,
)
from spacex_data_engineering_pipeline_spark.session import get_spark
import spacex_data_engineering_pipeline_spark.operators.similarity as S

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
# plans always land in the MAIN repo's plans/r14, even when this script
# runs from the read-only before-worktree
OUT = os.path.join("/root/repo", "plans", "r14")
SF = "/root/testdata/sf0.01"


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"plans-{SUFFIX}")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    mx = int(emb.agg(F.max("vec_id").alias("m")).first()["m"])
    s97, s99 = mx * 97 // 100, mx * 99 // 100
    vid = F.col("vec_id")
    old = emb.filter(vid < s99).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    updates = emb.filter(vid >= s97).select(
        "vec_id",
        F.reverse(F.col("embedding").cast("array<double>")).alias("embedding"),
    )
    dels = emb.filter((vid % 17 == 3) & (vid < s97)).select("vec_id")
    base = S.knn_graph(old, "vec_id", "embedding", k=5, n_blocks=8)
    base = base.localCheckpoint(eager=True)

    # operator plans: the merged graph each maintenance op would save
    dump(
        "op_knn_graph_upsert",
        S.knn_graph_upsert(
            old, updates, "vec_id", "embedding", 5, base_graph=base
        ),
    )
    dump(
        "op_knn_graph_delete",
        S.knn_graph_delete(
            old, dels, "vec_id", "embedding", 5, base_graph=base
        ),
    )
    if hasattr(S, "knn_graph_apply_cdc"):
        cdc = S.knn_graph_apply_cdc(
            old, dels, updates, "vec_id", "embedding", 5, base_graph=base
        )
    else:  # pre-optimization tree: the CDC fold chained the two verbs
        repaired = S.knn_graph_delete(
            old, dels, "vec_id", "embedding", 5, base_graph=base
        ).localCheckpoint(eager=True)
        cdc = S.knn_graph_upsert(
            old.join(dels, "vec_id", "left_anti"),
            updates,
            "vec_id",
            "embedding",
            5,
            base_graph=repaired,
        )
    dump("op_knn_graph_cdc_batch", cdc)

    # entry plans for the touched keys (returned-frame shape evidence)
    for key in [
        "streaming_knn_graph_sync",
        "streaming_knn_graph_cdc_sync",
        "streaming_knn_graph_delete_sync",
        "streaming_graph_rebase_sync",
        "streaming_fenced_redrain",
        "streaming_bm25_cdc_sync",
        "bm25_netting_compact",
        "embedding_knn_graph_upsert",
        "embedding_knn_graph_delete",
    ]:
        dump(key, QUERIES[key](spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
