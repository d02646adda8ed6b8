#!/usr/bin/env python
"""Dump explain('formatted') evidence for the r15 optimization round.

Artifacts under plans/r15/, written from BOTH trees:
    python tools/dump_r15_plans.py before   # from the pre-round worktree
    python tools/dump_r15_plans.py after    # from the optimized tree

1. OPERATOR plans for the delta-generation graph work: what a graph
   fold WRITES per micro-batch (before: the full merged N·k graph;
   after: the churn-sized changed-rows delta), and what a graph READ
   costs (before: one snapshot scan; after: base + delta fold).
2. The BM25 epoch-table dfreq plan (before: a second explode +
   distinct shuffle over the token stream; after: derived from the
   postings aggregate).
3. ENTRY plans for the touched catalog keys — the returned frame's
   shape must be unchanged (most are localCheckpoint scans; the diff
   evidence lives at the operator layer, exactly as in r14).
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
import spacex_data_engineering_pipeline_spark.streaming.bm25_sync as B

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "after"
# plans always land in the MAIN repo's plans/r15, even when this script
# runs from the read-only before-worktree
OUT = os.path.join("/root/repo", "plans", "r15")
SF = "/root/testdata/sf0.01"

DELTA_MODE = "delta_only" in S.knn_graph_upsert.__code__.co_varnames


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

    # (1) what one graph fold WRITES per micro-batch
    if DELTA_MODE:
        up, _ = S.knn_graph_upsert(
            old, updates, "vec_id", "embedding", 5, base_graph=base,
            delta_only=True,
        )
        cdc, _ = S.knn_graph_apply_cdc(
            old, dels, updates, "vec_id", "embedding", 5, base_graph=base,
            delta_only=True,
        )
    else:
        up = S.knn_graph_upsert(
            old, updates, "vec_id", "embedding", 5, base_graph=base
        )
        cdc = S.knn_graph_apply_cdc(
            old, dels, updates, "vec_id", "embedding", 5, base_graph=base
        )
    dump("op_graph_fold_written_upsert", up)
    dump("op_graph_fold_written_cdc", cdc)

    # (1b) what a synced-graph READ costs: drive one real root
    import shutil as _shutil
    import tempfile as _tempfile

    from spacex_data_engineering_pipeline_spark.streaming import index_sync
    from spacex_data_engineering_pipeline_spark.plans.queries import (
        _stage_stream_batches,
    )

    work = _tempfile.mkdtemp(prefix="r15_plans_")
    try:
        root = os.path.join(work, "index")
        src = os.path.join(work, "src")
        os.makedirs(src)
        index_sync.init_knn_graph_root(
            old, root, "vec_id", "embedding", k=5, n_blocks=8, n_buckets=16
        )
        _stage_stream_batches(work, src, (updates,))
        index_sync.sync_knn_graph_stream(
            spark, src, updates.schema, root,
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        dump("op_graph_synced_read", index_sync.load_synced_graph(spark, root))
    finally:
        _shutil.rmtree(work, ignore_errors=True)

    # (2) BM25 epoch tables: the dfreq plan per fold (a FILTER keeps the
    # frame multi-partition — a LIMIT would collapse the plan to one
    # partition and erase the exchanges the evidence is about)
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 5 != 0
    )
    tables = B._bm25_epoch_tables(docs, "doc_id", "text", 16)
    dump("op_bm25_epoch_postings", tables[0])
    if len(tables) == 4:  # before: a stored dfreq table per epoch
        try:
            tables[0].persist()
            tables[0].count()
            dump("op_bm25_epoch_dfreq", tables[1])
        finally:
            tables[0].unpersist()
    tables[-1].unpersist()
    # the QUERY plan: before reads + folds the stored df ledger; after
    # derives df from the folded postings (one less ledger scan, the
    # identical subtree reused)
    import shutil as _sh
    import tempfile as _tf

    bwork = _tf.mkdtemp(prefix="r15_bm25_plans_")
    try:
        broot = os.path.join(bwork, "bm25")
        from spacex_data_engineering_pipeline_spark.streaming import (
            index_sync as IS,
        )

        IS.init_bm25_root(docs, broot, "doc_id", "text")
        dump(
            "op_bm25_topk_synced",
            IS.bm25_topk_synced(spark, broot, ("spark", "vector"), k=10),
        )
    finally:
        _sh.rmtree(bwork, ignore_errors=True)

    # (3) entry plans for the touched keys (returned-frame shape)
    for key in [
        "streaming_knn_graph_sync",
        "streaming_knn_graph_ivf_sync",
        "streaming_knn_graph_cdc_sync",
        "streaming_knn_graph_ivf_cdc_sync",
        "streaming_knn_graph_delete_sync",
        "streaming_graph_rebase_sync",
        "streaming_maintained_index",
        "streaming_bm25_cdc_sync",
        "streaming_bm25_index_sync",
        "bm25_netting_compact",
        "hybrid_cdc_paired_sync",
        "embedding_knn_graph_upsert",
    ]:
        dump(key, QUERIES[key](spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
