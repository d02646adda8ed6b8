"""Streaming maintenance of PERSISTED derived artifacts — one
epoch-ledger protocol (the generic ``EpochLedger``:
streaming/ledger.py — staged epoch writes, one fsync'd pointer flip,
replay-safe drains, compact/vacuum; every arm here is a thin fold
over one instance), eight sync arms over six artifact kinds:

- kNN graph (``sync_knn_graph_stream``): micro-batches fold into a
  SAVED graph via ``knn_graph_upsert`` — |batch|·N + |affected|·N per
  epoch, upsert semantics (stale edges evicted corpus-wide);
- kNN graph through IVF ROUTING (``sync_knn_graph_ivf_stream``): the
  arm for the regime ``knn_graph_auto`` refuses — append batches fold
  by probing only their ``n_probes`` nearest clusters of a cluster-
  partitioned posting ledger, |batch| × |probed postings| per epoch,
  exact at full probe width;
- IVF posting table (``sync_ivf_index_stream``): batches route against
  the FIXED saved centroids into epoch partitions — FAISS ``add``
  semantics, the exactly-once wrapper ``append_to_ivf_index`` defers
  to;
- PCA moment table (``sync_pca_moments_stream``): each batch reduces
  to its own exact int64 moment table (dim²-sized state), refit =
  model-sized fold + O(dim³) driver eigensolve, bit-identical to a
  from-scratch fit (moment additivity);
- MinHash dedup index (``sync_minhash_index_stream``): probe the batch
  against the index AS OF the pointer (exact-verify side PARTITION-
  PRUNED to the candidate docs' grams buckets), then fold the batch's
  shingles + band keys in — the GROWING index (first-seen-wins) that
  a static probe can't express;
- semantic dedup index (``sync_semantic_dedup_stream``): the embedding
  analog — probe the batch for cosine-threshold near-dup pairs against
  the IVF posting ledger, then fold it in, pairs + growth in one flip;
- BM25 inverted index (streaming/bm25_sync.py, re-exported here):
  INSERT-only arm (``sync_bm25_index_stream`` — one tokenize pass per
  batch, df/stats additive over disjoint doc sets) plus the CDC arm
  (``sync_bm25_cdc_stream`` — op ∈ I/U/D folded as SIGNED tombstone
  epochs derived from the doc log); queries read only their terms'
  buckets and rank bit-identically to a batch rescore
  (``bm25_topk_synced``).

Id-level lifecycle verbs for the IVF-family posting ledgers:
``delete_index_ids`` writes tombstone epochs that probes anti-join
(delete epoch > posting epoch — re-inserts stay visible, history
before the delete stays readable), and ``compact_ivf_epochs`` /
``compact_semantic_epochs`` with ``purge_deleted=True`` are the
physical right-to-be-forgotten removal (as-of refusal floor).

All arms share the commit protocol below: epoch-keyed staged writes
(overwrite-idempotent, invisible to readers) published by ONE fsync'd
pointer flip; replayed epochs no-op; crash-window orphans are never
scanned and the replay overwrites them. Crash-restart is pytest-pinned
per artifact kind (tests/test_streaming.py).

RETENTION, per ledger: ``compact_minhash_epochs`` / ``compact_ivf_
epochs`` / ``compact_semantic_epochs`` / ``compact_bm25_epochs``
rewrite committed epochs into one compact dataset per table
(epoch kept as an int data column — as-of reads stay row-exact, the
bucket/cluster partitioning survives so pruned reads keep pruning);
``compact_pca_epochs`` SUMS moments (ending pre-compaction as-of
readability explicitly); the matching ``vacuum_*_epochs`` sweeps drop
only compacted-away dirs, superseded compacts, and staged orphans.
Graph generations keep their own ``vacuum_generations``.

The original kNN-graph story, kept for the design rationale:
embedding micro-batches fold into a SAVED kNN graph via
``knn_graph_upsert``, exactly-once, never a rebuild.

This closes the lifecycle × streaming cell: ``save_knn_graph`` /
``load_knn_graph`` give the persisted artifact, ``knn_graph_upsert``
gives batch maintenance (operators/similarity.py:684), and the
streaming modules prove exactly-once folds for TABLES
(streaming/txn_sync.py, matview_sync.py) — but until now an embedding
STREAM still had no path into a saved index short of rebuilding. The
reference keeps exactly one durable artifact current per ingest batch
(raw rows + state committed together, reference src/database.py:
133-223); at 100 TB the analogous artifact is the corpus-sized kNN
graph, which you build once and maintain per micro-batch (|batch|·N +
|affected|·N per epoch), never re-pay the N² build for.

Commit protocol per micro-batch (foreachBatch is at-least-once):
1. epoch ≤ pointer.last_batch_id ⇒ replayed epoch, no-op (the ledger
   makes a checkpoint-wiped re-drain a fixed point);
2. stage the new graph generation dir (``graph/gen=<epoch+1>``,
   overwrite-idempotent) and append the batch to the applied-updates
   log as a staged epoch-keyed dir — both invisible to readers;
3. flip the ONE pointer file last (fsync'd ``os.replace``, the
   txn.py commit point): readers at any instant see a graph
   generation and an applied-log high-water mark that AGREE.
A crash between 2 and 3 leaves a staged applied/removed epoch dir
above the pointer — invisible, overwritten by the replay, swept by
the next commit's orphan sweep (the ledger discipline; round 14
converted these logs from flat appends exactly so a crashed verb's
rows can never activate under a later commit's pointer advance).

Scale: per epoch the graph write is N·k skinny rows (the artifact
itself — at 100 TB give each generation a bucketed layout exactly as
``save_knn_graph`` does, and ``vacuum_generations`` drops pre-pointer
ones); the applied log grows O(stream), base corpus is written once.
The corpus snapshot a batch folds against is DERIVED (base ⊖ applied
ids ⊕ latest applied rows) — O(batch) bytes move per epoch, the
corpus parquet is never rewritten.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spacex_data_engineering_pipeline_spark.operators import similarity as S
from spacex_data_engineering_pipeline_spark.streaming.ledger import (
    EpochLedger,
    compact_path as _compact_path,
    epoch_path as _epoch_path,
    clear_staged_epoch as _clear_staged_epoch,
    flip_pointer as _flip_pointer,
    id_bucket as _id_bucket,
    ledger_frames as _ledger_frames,
    live_epochs as _live_epochs,
    read_epoch_pairs,
    read_index_pointer,
    record_epoch_pair,
    resolve_as_of as _resolve_as_of,
    vacuum_ledger_dirs as _vacuum_ledger_dirs,
)

# The BM25 arm lives in its own module since round 13; re-exported here
# so the catalog/tests keep one address for the sync family.
from spacex_data_engineering_pipeline_spark.streaming.bm25_sync import (  # noqa: F401
    _bm25_epoch_tables,
    _bm25_ledger,
    _term_bucket,
    bm25_topk_synced,
    compact_bm25_epochs,
    init_bm25_root,
    sync_bm25_cdc_stream,
    sync_bm25_index_stream,
    vacuum_bm25_epochs,
)


# Per-arm ledger layouts — the ONLY thing that differs between the
# sync families besides the fold body. Partition columns are the
# query-time pruning keys: doc-id bucket for the dedup verify fetch,
# cluster for IVF probes, term bucket for BM25 queries.
# Back-compat private aliases (tests and older callers address the
# ledger internals through this module): the generic machinery now
# lives in streaming/ledger.py.
def _minhash_epoch_path(root: str, table: str, epoch: int) -> str:
    return _epoch_path(root, table, epoch)


def _minhash_ledger(root: str) -> EpochLedger:
    return EpochLedger(
        root,
        {"grams": "__bucket", "bands": None, "pairs": None, "deletes": None},
    )


def _ivf_ledger(root: str) -> EpochLedger:
    return EpochLedger(root, {"postings": "cluster", "deletes": None})


def _semantic_ledger(root: str) -> EpochLedger:
    return EpochLedger(
        root, {"postings": "cluster", "pairs": None, "deletes": None}
    )


def _pca_ledger(root: str) -> EpochLedger:
    return EpochLedger(root, {"moments": None})


def _graph_gen_path(root: str, generation: int) -> str:
    return os.path.join(root, "graph", f"gen={generation}")


def init_knn_graph_root(
    corpus: DataFrame,
    root: str,
    id_col: str,
    vec_col: str,
    k: int,
    n_blocks: int = 8,
    n_buckets: int = 16,
) -> None:
    """One-time base build: exact kNN graph over ``corpus`` saved as
    generation 0 (bucket-partitioned + sidecar, ``save_knn_graph``),
    the base corpus parquet, and the initial pointer. Everything after
    this is incremental."""
    os.makedirs(root, exist_ok=True)
    graph = S.knn_graph(corpus, id_col, vec_col, k, n_blocks=n_blocks)
    S.save_knn_graph(graph, _graph_gen_path(root, 0), id_col, n_buckets=n_buckets)
    corpus.select(id_col, vec_col).write.mode("overwrite").parquet(
        os.path.join(root, "corpus_base")
    )
    _flip_pointer(
        root,
        {
            "generation": 0,
            "last_batch_id": None,
            "id_col": id_col,
            "vec_col": vec_col,
            "k": k,
            "n_blocks": n_blocks,
            "n_buckets": n_buckets,
        },
    )


def _corpus_at(spark: SparkSession, root: str, ptr: dict) -> DataFrame:
    """The corpus snapshot AS OF the pointer: base rows whose id never
    appeared in a committed batch, plus the latest committed vector per
    upserted id, MINUS ids a committed removal killed. Both logs are
    EPOCH-KEYED DIRECTORIES (``applied/epoch=<g>/``,
    ``removed/epoch=<g>/`` — the ledger discipline): visibility is
    the pointer's generation (staged crash orphans above it are
    invisible AND swept by the next commit's ``clear_staged_epoch``,
    closing the orphan-activation hazard a flat append-log would
    carry — a crashed verb's rows activating when a LATER commit
    advances the pointer past their stamp), writes are
    overwrite-idempotent per generation, and an id removed at
    generation r then re-upserted at s > r is alive again (its latest
    applied stamp outranks the removal).

    REBASE-AWARE (``rebase_graph_corpus``): when the pointer records a
    ``corpus_rebase_gen`` floor, the base snapshot comes from
    ``corpus_rebase/upto=<floor>`` (logs ≤ floor already folded in —
    its rows carry the floor as their stamp, so a later removal still
    kills them and a later re-upsert still outranks them) and only log
    epochs ABOVE the floor are replayed — the replay cost tracks churn
    since the last rebase, not all history."""
    id_col, vec_col = ptr["id_col"], ptr["vec_col"]
    gen_now = int(ptr["generation"])
    floor = int(ptr.get("corpus_rebase_gen", 0) or 0)
    base = spark.read.parquet(
        os.path.join(root, "corpus_rebase", f"upto={floor}")
        if floor
        else os.path.join(root, "corpus_base")
    )
    # ONE join over the corpus-sized base (optimization r15): base rows
    # predate every LIVE log event (their stamp is the floor), so a
    # base row survives iff its id appears in NO live applied/removed
    # epoch — one dup-tolerant anti-join against the union of raw log
    # ids, instead of anti-join-on-upserts THEN left-join-removals over
    # the whole corpus stream. The removal-vs-reupsert tiebreak
    # (latest applied stamp outranks an older removal) only involves
    # CHURN-sized rows, so the rmax join now runs over `latest` alone.
    # The orphan sweep can leave an EMPTY log dir (its only staged
    # epoch removed) — an empty parquet dataset fails schema inference,
    # hence the _live_epochs guards.
    latest = touched = None
    if any(floor < e <= gen_now for e in _live_epochs(root, "applied")):
        applied = spark.read.parquet(os.path.join(root, "applied")).filter(
            (F.col("epoch") > floor) & (F.col("epoch") <= gen_now)
        )
        w = Window.partitionBy(id_col).orderBy(F.col("epoch").desc())
        latest = (
            applied.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, vec_col, "epoch")
        )
        touched = applied.select(id_col)
    if any(floor < e <= gen_now for e in _live_epochs(root, "removed")):
        removed = (
            spark.read.parquet(os.path.join(root, "removed"))
            .filter((F.col("epoch") > floor) & (F.col("epoch") <= gen_now))
            .select(id_col, F.col("epoch").alias("__del_gen"))
        )
        touched = (
            removed.select(id_col)
            if touched is None
            else touched.unionByName(removed.select(id_col))
        )
        if latest is not None:
            rmax = removed.groupBy(id_col).agg(
                F.max("__del_gen").alias("__del_gen")
            )
            latest = (
                latest.join(rmax, id_col, "left")
                .filter(
                    F.col("__del_gen").isNull()
                    | (F.col("epoch") >= F.col("__del_gen"))
                )
                .drop("__del_gen")
            )
    corpus = base.select(id_col, vec_col)
    if touched is not None:
        corpus = corpus.join(touched, id_col, "left_anti")
    if latest is not None:
        corpus = corpus.unionByName(latest.select(id_col, vec_col))
    return corpus


def _graph_committed_gens(root: str, floor: int, head: int) -> set[int]:
    """The still-readable committed generations: the full base snapshot
    at ``floor`` plus every live delta epoch in (floor, head]."""
    return {floor} | {
        e for e in _live_epochs(root, "graph_delta") if floor < e <= head
    }


def _graph_at(
    spark: SparkSession, root: str, ptr: dict, gen: int | None = None
) -> DataFrame:
    """Reconstruct the graph AS OF ``gen`` (default: the committed
    head) from the DELTA-GENERATION layout (optimization r15): one full
    bucket-partitioned snapshot at the pointer's ``graph_base_gen``
    floor (``save_knn_graph`` — generation 0 at init, or the floor a
    ``vacuum_generations`` rebase materialized) plus one churn-sized
    ``graph_delta/epoch=<g>/`` dir per committed generation. A delta
    epoch carries (a) the CHANGED ids' full new lists and (b) rnk-NULL
    MARKER rows for ids whose stored list that epoch invalidated
    (deleted or recomputed). Latest-mention-wins per id: rows of the
    max mention epoch, markers filtered out — a marker beaten by a
    same-epoch or later list loses (replace/re-insert), a marker as the
    last word kills the id (delete), untouched ids read from the base.
    Row-identical to the full snapshot the pre-r15 layout persisted per
    generation, at churn-sized instead of corpus-sized write volume per
    micro-batch. Staged crash orphans (epoch > head) are invisible by
    the epoch filter, exactly as every ledger table."""
    id_col = ptr["id_col"]
    head = int(ptr["generation"])
    if gen is None:
        gen = head
    floor = int(ptr.get("graph_base_gen", 0) or 0)
    base = S.load_knn_graph(spark, _graph_gen_path(root, floor))
    eps = [e for e in _live_epochs(root, "graph_delta") if floor < e <= gen]
    if not eps:
        return base
    d = spark.read.parquet(os.path.join(root, "graph_delta")).filter(
        (F.col("epoch") > floor) & (F.col("epoch") <= gen)
    )
    if len(eps) > 1:
        # latest mention wins — one churn-sized window shuffle
        w = Window.partitionBy(id_col)
        alive = (
            d.withColumn("__me", F.max("epoch").over(w))
            .filter(
                (F.col("epoch") == F.col("__me")) & F.col("rnk").isNotNull()
            )
            .select(id_col, "rnk", "neighbor", "cos_sim")
        )
    else:  # one live epoch: its rows ARE the latest mentions, no window
        alive = d.filter(F.col("rnk").isNotNull()).select(
            id_col, "rnk", "neighbor", "cos_sim"
        )
    # no distinct on the anti-join side: left_anti tolerates duplicate
    # keys, and the dedup would cost its own exchange (AQE job) per
    # execution of this plan
    return base.join(
        d.select(id_col), id_col, "left_anti"
    ).unionByName(alive)


def _write_graph_delta(
    spark,
    root: str,
    epoch: int,
    delta: DataFrame,
    marker_ids,
    id_col: str,
    marker_df: DataFrame | None = None,
) -> None:
    """Stage one graph delta epoch (overwrite-idempotent, invisible
    until the pointer flip): the changed rows' new lists unioned with
    rnk-NULL marker rows for every id whose stored list this epoch
    invalidates — ``marker_ids`` is the verbs' driver-side recompute
    list, ``marker_df`` the CDC arms' batch-sized delete-id frame. One
    write executes the fold's merged plan once; at 100 TB the bytes
    written per micro-batch are churn-sized, never corpus-sized."""
    parts = [delta]
    nulls = (
        F.lit(None).cast("int").alias("rnk"),
        F.lit(None).cast("long").alias("neighbor"),
        F.lit(None).cast("double").alias("cos_sim"),
    )
    if marker_ids:
        parts.append(
            spark.createDataFrame(
                [(int(i),) for i in sorted(marker_ids)], f"{id_col} long"
            ).select(id_col, *nulls)
        )
    if marker_df is not None:
        parts.append(marker_df.select(id_col, *nulls))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(_epoch_path(root, "graph_delta", epoch))


def load_synced_graph(
    spark: SparkSession, root: str, as_of_generation: int | None = None
) -> DataFrame:
    """The committed graph: pointer → base snapshot + delta epochs →
    ``_graph_at``. ``as_of_generation`` time-travels to any
    still-retained generation (readable while its floor snapshot and
    the delta epochs up to it are retained; ``vacuum_generations`` is
    what ends a generation's readability)."""
    ptr = read_index_pointer(root)
    gen = _resolve_as_of(ptr, "generation", as_of_generation)
    floor = int(ptr.get("graph_base_gen", 0) or 0)
    if gen not in _graph_committed_gens(root, floor, int(ptr["generation"])):
        raise ValueError(
            f"generation {gen} was vacuumed (vacuum_generations keeps "
            "only recent ones) — time travel reaches retained "
            "generations only"
        )
    return _graph_at(spark, root, ptr, gen)


def sync_knn_graph_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of (id, vector)
    upserts) with AvailableNow: per micro-batch, fold the batch into
    the SAVED graph with ``knn_graph_upsert(base_graph=loaded)`` —
    |batch|·N + |affected|·N work, never the N² rebuild — and publish
    graph + applied-log high-water mark in one pointer flip. Blocks
    until the drain completes. ``on_batch_start`` is a test hook
    (crash injection): called with the epoch id before any work."""

    def fold(ptr: dict, gen: int, batch_df: DataFrame) -> dict:
        id_col, vec_col, k = ptr["id_col"], ptr["vec_col"], ptr["k"]
        updates = batch_df.select(id_col, vec_col)
        corpus_before = _corpus_at(spark, root, ptr)
        # persist the reconstructed graph for THIS fold's lifetime: the
        # verb references it from the affected probe AND the keep
        # stream (two actions), and re-executing the delta fold's
        # window + anti-join per action is pure AQE job inflation —
        # the fenced-batch persist precedent (optimization r14/r15)
        prev = _graph_at(spark, root, ptr).persist()
        try:
            # DELTA GENERATION (optimization r15): the verb emits only
            # the changed ids' new lists + the recompute-id markers;
            # the write per epoch is churn-sized, never the
            # corpus-sized N·k table the pre-r15 layout re-saved per
            # micro-batch
            delta, rec_ids = S.knn_graph_upsert(
                corpus_before,
                updates,
                id_col,
                vec_col,
                k,
                n_blocks=ptr["n_blocks"],
                base_graph=prev,
                delta_only=True,
            )
            _write_graph_delta(spark, root, gen, delta, rec_ids, id_col)
            # the applied log is an epoch-keyed ledger table: staged
            # overwrite-idempotently at the COMMITTING generation, so a
            # replay overwrites its own orphan and the pre-commit sweep
            # can clear a crashed verb's dir at this number
            updates.write.mode("overwrite").parquet(
                _epoch_path(root, "applied", gen)
            )
        finally:
            prev.unpersist()
        return {"generation": gen}

    EpochLedger(root, {}).drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def sync_knn_graph_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """ONE-VERB CDC for a PLAIN graph root — the stream-shaped
    completion of the family's graph lifecycle (``sync_knn_graph_
    stream`` folds upserts, ``delete_graph_ids`` is the manual delete
    verb; a real CDC feed interleaves all three ops): drain (id,
    vector, op ∈ I/U/D) micro-batches, each folded as DELETE-THEN-
    UPSERT against the saved graph and published as ONE generation +
    one pointer flip —

    1. op-D ids retire via ``knn_graph_delete`` (citing edges
       repaired against the remaining corpus, |affected|·N);
    2. op-I/U rows fold via ``knn_graph_upsert`` on the repaired
       graph (|batch|·N + |affected|·N — the N² build never re-paid);
    3. the applied log gains the upserts, the removal log the
       deletes, both stamped with the committing generation, so the
       derived corpus replays the exact same order (a removal kills
       every strictly-older version; a later re-upsert outranks it).

    At most one row per id per batch, ENFORCED — an id can't be both
    deleted and upserted in one batch, which is what makes
    delete-then-upsert order-free. An empty batch advances only the
    bookkeeping (no corpus-sized graph copy for a no-op epoch). Same
    exactly-once ledger + checkpoint-lineage contract as every arm;
    crash-restart pytest-pinned
    (test_knn_graph_cdc_sync_crash_restart)."""

    def fold(ptr: dict, gen: int, batch_df: DataFrame) -> dict:
        id_col, vec_col, k = ptr["id_col"], ptr["vec_col"], ptr["k"]
        ops, has_ud, n_del, n_up = _cdc_batch_ops(
            batch_df, id_col, (vec_col,), op_col
        )
        dels = ops.filter(F.col("__op") == "D").select(id_col).distinct()
        upserts = ops.filter(F.col("__op") != "D").select(id_col, vec_col)
        if not n_del and not n_up:
            ops.unpersist()
            return {}  # empty batch: bookkeeping only, generation holds
        corpus = _corpus_at(spark, root, ptr)
        # fold-lifetime persist: probe + keep are separate actions
        graph = _graph_at(spark, root, ptr).persist()
        try:
            # ONE fused affected-set pass for both sides of the batch
            # (optimization r14 — previously delete-then-upsert: two
            # full corpus passes, two probes, two merge windows and an
            # eager localCheckpoint of the intermediate repaired graph;
            # the fused form is bit-identical, see knn_graph_apply_cdc's
            # theorem). DELTA GENERATION (optimization r15): only the
            # changed rows + tombstone markers (deletes ∪ recompute
            # set) land on disk
            delta, rec_ids = S.knn_graph_apply_cdc(
                corpus,
                dels if n_del else None,
                upserts if n_up else None,
                id_col, vec_col, k,
                n_blocks=ptr["n_blocks"], base_graph=graph,
                delta_only=True,
            )
            _write_graph_delta(
                spark, root, gen, delta, rec_ids, id_col,
                marker_df=dels if n_del else None,
            )
            if n_up:
                upserts.write.mode("overwrite").parquet(
                    _epoch_path(root, "applied", gen)
                )
            if n_del:
                dels.write.mode("overwrite").parquet(
                    _epoch_path(root, "removed", gen)
                )
        finally:
            graph.unpersist()
        ops.unpersist()
        return {"generation": gen}

    EpochLedger(root, {}).drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def _ivf_epoch_path(root: str, epoch: int) -> str:
    return os.path.join(root, "postings", f"epoch={epoch}")


def init_ivf_root(
    corpus: DataFrame,
    root: str,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    seed: int = 42,
    sample_cap: int = 65536,
) -> None:
    """One-time IVF base build: train the coarse quantizer on the base
    corpus (``build_ivf_index``) and save postings as epoch 0 of an
    epoch-keyed layout (``postings/epoch=0/cluster=*/``) plus the
    centroid sidecar and the initial pointer. The quantizer is FIXED
    for the index's lifetime (FAISS ``add`` semantics) — every later
    epoch routes against these centroids; retrain = a new root."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    os.makedirs(root, exist_ok=True)
    idx = S_.build_ivf_index(
        corpus, id_col, vec_col,
        n_clusters=n_clusters, seed=seed, sample_cap=sample_cap,
        persist=False,
    )
    with open(os.path.join(root, "centroids.json"), "w") as f:
        json.dump(idx.centroids.tolist(), f)
    idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        _ivf_epoch_path(root, 0)
    )
    _flip_pointer(
        root,
        {
            "max_epoch": 0,
            "last_batch_id": None,
            "id_col": id_col,
            "vec_col": vec_col,
        },
    )


def load_synced_ivf(
    spark: SparkSession, root: str, as_of_epoch: int | None = None
):
    """Open the committed index: postings at epochs ≤ the pointer's
    high-water mark (partition-pruned — a staged epoch a crash left
    above the pointer is never scanned), centroids from the sidecar.
    Returns an ``IvfIndex``; probes prune on the ``cluster`` partition
    column exactly as for an offline-saved index. ``as_of_epoch``
    time-travels: epoch partitions are immutable once committed, so
    the index as of any past epoch is the exact filter ≤ k.

    Compaction-aware: after ``compact_ivf_epochs`` the committed
    history comes from the cluster-partitioned compact dataset (epoch
    a data column — as-of reads stay row-exact, cluster pruning keeps
    working) plus any live epoch dirs above it."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    ptr = read_index_pointer(root)
    epoch = _resolve_as_of(ptr, "max_epoch", as_of_epoch)
    with open(os.path.join(root, "centroids.json")) as f:
        centroids = json.load(f)
    assigned = _synced_postings(
        spark, _ivf_ledger(root), ptr, epoch, ptr["id_col"]
    )
    if assigned is None:
        raise ValueError(
            f"no committed postings at epoch {epoch} — the root is not "
            "initialized (init_ivf_root writes epoch 0)"
        )
    return S_.IvfIndex(
        assigned.drop("epoch"), centroids, ptr["id_col"], ptr["vec_col"]
    )


def _apply_tombstones(
    spark: SparkSession,
    led: EpochLedger,
    ptr: dict,
    epoch: int,
    posts: DataFrame | None,
    id_col: str,
) -> DataFrame | None:
    """Filter a posting frame (epoch column still attached) through the
    ``deletes`` tombstone ledger AS OF ``epoch``: a posting is visible
    unless a STRICTLY LATER tombstone at or below the as-of point names
    its id — so a re-insert after a delete is visible again, reads as
    of a point before the delete still see the row (row-exact history
    until an explicit ``purge_deleted`` compaction), and a posting
    written IN THE SAME EPOCH as its id's tombstone survives it: that
    is the CDC arms' atomic-update shape (``sync_ivf_cdc_stream`` & co.
    stage tombstone + replacement posting in one epoch, one flip —
    the tombstone covers every OLDER version only).

    Shape: tombstones reduce to one (id, max delete epoch) row per
    deleted id, then ONE equi-join against the (already
    cluster/epoch-pruned) postings — delete-request-sized, so AQE
    broadcasts it in the common case; no driver collect."""
    if posts is None:
        return None
    dels = led.frames(spark, "deletes", ptr, epoch)
    if dels is None:
        return posts
    dmax = dels.groupBy(id_col).agg(F.max("epoch").alias("__del_epoch"))
    return (
        posts.join(dmax, id_col, "left")
        .filter(
            F.col("__del_epoch").isNull()
            | (F.col("epoch") >= F.col("__del_epoch"))
        )
        .drop("__del_epoch")
    )


def _synced_postings(
    spark: SparkSession, led: EpochLedger, ptr: dict, epoch: int, id_col: str
) -> DataFrame | None:
    """Committed postings as of ``epoch`` with id-level tombstones
    applied — THE posting read path for every IVF-family root (plain
    IVF, semantic dedup). Keeps the ``epoch`` column for callers."""
    return _apply_tombstones(
        spark, led, ptr, epoch, led.frames(spark, "postings", ptr, epoch),
        id_col,
    )


def delete_index_ids(
    spark: SparkSession, root: str, ids, max_affected: int = 1_000_000
) -> int:
    """ID-LEVEL DELETE for the id-keyed index ledgers (plain IVF
    roots, semantic-dedup roots, and MinHash dedup roots) — the
    lifecycle verb the family lacked: ``compact_*`` could only drop whole epochs, but a
    right-to-be-forgotten request names specific vector ids. Writes a
    TOMBSTONE EPOCH (just the ids), published by the usual pointer
    flip; every reader (``load_synced_ivf``, the semantic probe/fold)
    anti-joins postings against tombstones with delete-epoch >
    posting-epoch, so:

    - a later re-insert of the same id IS visible (the tombstone only
      covers postings committed before it);
    - ``as_of_epoch`` reads before the delete still see the row —
      tombstones are history too, until ``compact_*_epochs(...,
      purge_deleted=True)`` physically removes both and sets the
      as-of refusal floor;
    - streaming syncs interleave safely: the stream's next epoch is
      ``max(epoch_id + 1, head + 1)`` (``EpochLedger.next_epoch``), so
      a manual tombstone epoch never collides with a replayed batch.

    ``ids`` is a list of id values or a DataFrame holding either the
    root's tombstone column (``'doc'`` on MinHash dedup roots — the
    ledger tables' canonical id name, recorded as ``tomb_col`` in the
    pointer) or the caller-facing id column the root was initialized
    with; the latter is aliased to the tombstone column automatically.
    ``max_affected`` is the refusal guard the repo's
    destructive verbs carry (reference pattern: operators/delete.py's
    affected-partitions discipline): a tombstone set larger than this
    is almost certainly a bug upstream, and it also bounds this verb's
    one count() job. Crash window: a staged tombstone epoch above the
    pointer is invisible, overwritten by the next delete, and swept by
    vacuum (and by any commit's pre-write orphan sweep). Returns the
    committed tombstone epoch — or the unchanged head for an EMPTY id
    set, which is a no-op rather than a burned epoch (an empty
    list-built frame would also guess the id type). Refused on roots
    whose readers don't honor tombstones: BM25 (route deletes through
    the CDC arm), graph-bearing roots (use ``knn_graph_delete``), and
    pre-``tomb_col`` dedup roots."""
    led_ptr = read_index_pointer(root)
    # refuse roots whose READERS don't honor the deletes ledger — a
    # committed tombstone nobody anti-joins is the worst outcome (the
    # caller believes the right-to-be-forgotten delete took effect):
    if "tomb_col" not in led_ptr and os.path.isdir(
        os.path.join(root, "grams")
    ):
        raise ValueError(
            "this dedup root predates id-level deletes (no tomb_col in "
            "its pointer) — its readers would silently ignore the "
            "tombstones; rebuild with init_minhash_root to enable them"
        )
    if "term_buckets" in led_ptr:
        raise ValueError(
            "BM25 roots don't take id tombstones — the inverted index "
            "folds deletes SUBTRACTIVELY; route a 'D' row through "
            "sync_bm25_cdc_stream instead"
        )
    if "generation" in led_ptr:
        raise ValueError(
            "graph-bearing roots don't take id tombstones alone — the "
            "saved graph's edges would keep citing the deleted "
            "vectors; use delete_graph_ids, which writes the tombstone "
            "AND publishes the edge-repaired graph as a new generation "
            "in one flip"
        )
    if "tomb_col" not in led_ptr and "id_col" not in led_ptr:
        # e.g. a PCA moments root: its ledger holds exact integer SUMS,
        # not id-keyed rows — there is nothing a tombstone could name.
        # An explicit refusal beats the bare KeyError a caller would
        # otherwise have to decode.
        raise ValueError(
            "this root's ledger has no id-keyed rows to tombstone (its "
            "pointer records neither tomb_col nor id_col — a moment "
            "ledger stores sums, not per-id state); removals there are "
            "the CDC arm's subtract-then-add job (sync_pca_cdc_stream)"
        )
    id_col = led_ptr.get("tomb_col", led_ptr.get("id_col"))
    if isinstance(ids, DataFrame):
        if id_col in ids.columns:
            tomb = ids.select(id_col).distinct()
        elif led_ptr.get("id_col") in ids.columns:
            # caller passed the root's caller-facing id column (the
            # docstring's original wording) — alias it to the ledger
            # tables' canonical tombstone column
            tomb = ids.select(
                F.col(led_ptr["id_col"]).alias(id_col)
            ).distinct()
        else:
            raise ValueError(
                f"ids frame has columns {ids.columns} — expected the "
                f"root's tombstone column {id_col!r}"
                + (
                    f" or its id column {led_ptr['id_col']!r}"
                    if led_ptr.get("id_col") not in (None, id_col)
                    else ""
                )
            )
        n = tomb.count()
    else:
        # a driver-side id list needs no Spark job to count or dedup
        uniq = sorted(set(ids))
        n = len(uniq)
        id_type = "long" if uniq and isinstance(uniq[0], int) else "string"
        tomb = spark.createDataFrame([(i,) for i in uniq], f"{id_col} {id_type}")
    if n > max_affected:
        raise ValueError(
            f"delete_index_ids would tombstone {n} ids > max_affected="
            f"{max_affected} — pass a higher bound explicitly if this "
            "is intended"
        )
    if n == 0:
        # no-op, and crucially NO epoch: an empty list-built frame has
        # a GUESSED id type (string) that would poison the deletes
        # dataset's parquet schema for long-keyed roots
        return int(led_ptr["max_epoch"])
    led = EpochLedger(root, {"deletes": None})
    epoch = int(led_ptr["max_epoch"]) + 1
    # sweep ANY verb's crash orphan at this number before staging (a
    # crashed stream batch's posting epoch must not activate when this
    # delete's flip advances the pointer past it) — ledger.py:
    # clear_staged_epoch documents the invariant
    _clear_staged_epoch(root, epoch)
    led.write_epoch(tomb, "deletes", epoch)
    _flip_pointer(root, {**led_ptr, "max_epoch": epoch})
    return epoch


def _cdc_batch_ops(
    batch_df: DataFrame, id_col: str, payload_cols, op_col: str
) -> tuple[DataFrame, bool, int, int]:
    """Normalize + GUARD one CDC micro-batch: returns (ops frame —
    (id, payload, op first letter uppercased), persisted across the
    fold's writes — whether the batch carries any U/D row, the op-D
    row count, and the non-D row count), and ENFORCE the
    at-most-one-row-per-id-per-batch contract every CDC arm shares
    (two versions of an id in one batch have no defined order — one
    tombstone would cover both new rows and the surviving state would
    depend on shuffle order; collapse upstream with
    ``latest_update_per_key``). One batch-sized agg job — the BM25
    arm's refusal discipline, factored for the vector arms; the D /
    non-D counts ride in the SAME agg so folds that branch on them
    (the graph CDC arm) don't pay two extra count() actions per
    micro-batch (optimization r14)."""
    ops = batch_df.select(
        F.col(id_col),
        *[F.col(c) for c in payload_cols],
        F.upper(F.col(op_col).cast("string")).substr(1, 1).alias("__op"),
    ).persist()
    card = ops.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(id_col).alias("d"),
        F.sum(
            F.when(F.col("__op").isin("U", "D"), F.lit(1)).otherwise(F.lit(0))
        ).alias("ud"),
        F.sum(
            F.when(F.col("__op") == "D", F.lit(1)).otherwise(F.lit(0))
        ).alias("nd"),
    ).first()
    if int(card["n"]) != int(card["d"]):
        ops.unpersist()
        raise ValueError(
            f"CDC batch carries {int(card['n'])} rows over "
            f"{int(card['d'])} distinct ids — at most ONE row per id "
            "per micro-batch; collapse upstream with "
            "latest_update_per_key"
        )
    n_del = int(card["nd"] or 0)
    return ops, bool(int(card["ud"] or 0)), n_del, int(card["n"]) - n_del


def sync_ivf_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """Drain a CDC stream of (id, vector, op ∈ I/U/D) rows into an IVF
    posting ledger — the ONE-VERB update path the insert-only arm and
    ``delete_index_ids`` previously left as a documented two-step
    (tombstone, then re-stream: two pointer flips with a crash window
    where the id is deleted but not yet re-inserted). Per micro-batch
    the fold writes ONE epoch carrying both sides of the mutation:

    1. a tombstone row for every U/D id (the ``deletes`` table —
       delete-request-sized, skipped entirely on insert-only batches);
    2. the non-delete rows routed against the FIXED saved centroids
       into the epoch's posting partition (the committed corpus is
       never read — same cost shape as the insert arm);

    published by the one pointer flip. Visibility falls out of the
    tombstone rule every reader already applies (delete epoch >
    posting epoch): the SAME epoch's new posting survives its own
    tombstone, everything older is hidden — so an update is atomic, a
    delete is a plain tombstone, an op-U on an absent id is an insert
    (its tombstone hides nothing), and a later re-insert stays
    visible. Op-I must be a genuinely NEW id (an insert of an existing
    id would surface both versions — use U; tombstoning inserts too
    would grow the deletes ledger with the whole insert history and
    break its delete-request-sized broadcast join). At most one row
    per id per batch, ENFORCED (``_cdc_batch_ops``). Same exactly-once
    ledger + checkpoint-lineage contract as every arm."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _ivf_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        if "generation" in ptr:
            raise ValueError(
                "graph-bearing roots don't take the posting-only CDC "
                "arm — a tombstone here would leave the saved graph's "
                "edges citing the deleted vectors; stream inserts via "
                "sync_knn_graph_ivf_stream and route updates/deletes "
                "through delete_graph_ids (edge repair + tombstone in "
                "one flip)"
            )
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        id_col, vec_col = ptr["id_col"], ptr["vec_col"]
        ops, has_ud, n_del, n_up = _cdc_batch_ops(
            batch_df, id_col, (vec_col,), op_col
        )
        if has_ud:
            led.write_epoch(
                ops.filter(F.col("__op").isin("U", "D"))
                .select(id_col)
                .distinct(),
                "deletes",
                epoch,
            )
        led.write_epoch(
            ops.filter(F.col("__op") != "D").select(
                F.col(id_col),
                F.col(vec_col),
                S_.centroid_assign_udf(centers)(F.col(vec_col)).alias(
                    "cluster"
                ),
            ),
            "postings",
            epoch,
        )
        ops.unpersist()
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def sync_semantic_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """CDC arm for the GROWING semantic-dedup index — closes the
    delete-then-restream crash window ``sync_semantic_dedup_stream``
    documents for re-vectored ids: per micro-batch, ONE epoch carries
    the U/D tombstones AND the new postings (the
    ``sync_ivf_cdc_stream`` commit shape), plus the batch's near-dup
    VERDICTS: the non-delete rows are probed against the committed
    postings as of the pointer (cluster-pruned, tombstones applied),
    and pairs whose corpus side is tombstoned IN THIS BATCH are
    dropped — an updated doc is never flagged against its own
    superseded version, and a doc can't be a duplicate of one deleted
    in the same batch (the anti-join is batch-sized, broadcast). At
    most one row per id per batch, ENFORCED. First-seen-wins and
    flag-and-audit semantics otherwise unchanged; the whole mutation
    is one pointer flip."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _semantic_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        id_col, vec_col = ptr["id_col"], ptr["vec_col"]
        ops, has_ud, n_del, n_up = _cdc_batch_ops(
            batch_df, id_col, (vec_col,), op_col
        )
        tomb = (
            ops.filter(F.col("__op").isin("U", "D")).select(id_col).distinct()
        )
        upserts = ops.filter(F.col("__op") != "D").select(id_col, vec_col)
        postings = _synced_postings(
            spark, led, ptr, ptr["max_epoch"], id_col
        ).drop("epoch")
        pairs = S_.embedding_near_dup_probe(
            postings, centers, upserts, id_col, vec_col,
            n_probes=ptr["n_probes"], min_cosine=ptr["min_cosine"],
        )
        if has_ud:
            pairs = pairs.join(
                F.broadcast(tomb.withColumnRenamed(id_col, "corpus_vec")),
                "corpus_vec",
                "anti",
            )
            led.write_epoch(tomb, "deletes", epoch)
        led.write_epoch(pairs, "pairs", epoch)
        led.write_epoch(
            upserts.select(
                F.col(id_col),
                F.col(vec_col),
                S_.centroid_assign_udf(centers)(F.col(vec_col)).alias(
                    "cluster"
                ),
            ),
            "postings",
            epoch,
        )
        ops.unpersist()
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def sync_minhash_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """CDC arm for the GROWING MinHash dedup index — the text analog
    of ``sync_semantic_cdc_stream``: per micro-batch, ONE epoch
    carries the U/D tombstones (on the ledger's canonical ``doc``
    column), the non-delete rows' shingles + band keys, and their
    near-dup verdicts probed against the committed index as of the
    pointer (band-candidates → bucket-pruned exact verify, tombstones
    applied) with pairs citing a THIS-BATCH-tombstoned corpus doc
    dropped — an updated doc is never flagged against its own old
    text. Visibility is the shared tombstone rule (delete epoch >
    posting epoch), so the same epoch's new grams survive while every
    older version is hidden from all later probes, and as-of reads
    before the update still see the old text's grams until a purging
    compaction. At most one row per id per batch, ENFORCED. Refused on
    pre-``tomb_col`` roots (their readers ignore the deletes ledger —
    same guard as ``delete_index_ids``)."""
    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )

    led = _minhash_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        if "tomb_col" not in ptr:
            raise ValueError(
                "this dedup root predates id-level deletes (no tomb_col "
                "in its pointer) — its readers would silently ignore "
                "the CDC tombstones; rebuild with init_minhash_root"
            )
        id_col, text_col = ptr["id_col"], ptr["text_col"]
        ops, has_ud, n_del, n_up = _cdc_batch_ops(
            batch_df, id_col, (text_col,), op_col
        )
        tomb = (
            ops.filter(F.col("__op").isin("U", "D"))
            .select(F.col(id_col).alias(ptr["tomb_col"]))
            .distinct()
        )
        upserts = ops.filter(F.col("__op") != "D").select(id_col, text_col)
        bg, bb = build_minhash_index(
            upserts, id_col, text_col,
            ptr["num_hashes"], ptr["bands"], ptr["shingle_n"],
        )
        pairs = _probe_pruned(spark, root, ptr, bg, bb)
        if has_ud:
            pairs = pairs.join(
                F.broadcast(
                    tomb.withColumnRenamed(ptr["tomb_col"], "corpus_doc")
                ),
                "corpus_doc",
                "anti",
            )
            led.write_epoch(tomb, "deletes", epoch)
        led.write_epoch(pairs, "pairs", epoch)
        _write_grams_epoch(bg, root, epoch, ptr.get("grams_buckets"))
        led.write_epoch(bb, "bands", epoch)
        bb.unpersist()
        bg.unpersist()
        ops.unpersist()
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def sync_ivf_index_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of NEW (id, vector)
    rows) with AvailableNow: per micro-batch, assign the batch against
    the SAVED centroids (one Arrow map over the batch — the existing
    100 TB of postings is never rescanned) into its own epoch
    partition, then publish with one pointer flip.

    This is the exactly-once wrapper ``append_to_ivf_index`` documents
    itself as needing: plain parquet append replayed = duplicated
    postings, so instead each epoch writes overwrite-idempotently to
    ``postings/epoch=<epoch_id+1>`` (invisible to readers until the
    flip — readers filter epochs ≤ pointer), and a replayed epoch id
    (≤ ``last_batch_id``) is a no-op. A crash after the epoch write
    but before the flip leaves an orphan partition that the next
    replay overwrites and readers never scan.

    Contract: INSERT-only, FAISS ``add`` semantics — re-vectoring an
    existing id is the kNN-graph sync's job (``sync_knn_graph_stream``
    evicts stale edges corpus-wide); an IVF posting table has no
    per-id latest-wins read path, so feeding updates here would
    surface both versions. ``on_batch_start`` is the crash-injection
    test hook."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _ivf_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        id_col, vec_col = ptr["id_col"], ptr["vec_col"]
        assigned = batch_df.select(
            F.col(id_col),
            F.col(vec_col),
            S_.centroid_assign_udf(centers)(F.col(vec_col)).alias("cluster"),
        )
        led.write_epoch(assigned, "postings", epoch)
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def init_knn_graph_ivf_root(
    corpus: DataFrame,
    root: str,
    id_col: str,
    vec_col: str,
    k: int,
    n_clusters: int = 16,
    n_probes: int = 4,
    seed: int = 42,
    sample_cap: int = 65536,
    n_blocks: int = 8,
    n_buckets: int = 16,
) -> None:
    """One-time base for IVF-ROUTED graph maintenance — the streaming
    arm for the regime ``knn_graph_auto_plan`` refuses: the base kNN
    graph (exact, built once) saved as generation 0, the corpus saved
    as IVF POSTINGS (epoch 0, partitioned by cluster — the layout the
    per-batch probed-cluster fetch partition-prunes on) with the FIXED
    centroid sidecar, and one pointer carrying both high-water marks
    (graph ``generation``, postings ``max_epoch``) plus the pinned
    probe width. ``load_synced_graph``, ``vacuum_generations``, and
    ``vacuum_ivf_orphans`` all work on this root unchanged — it is the
    graph ledger and the IVF ledger sharing one commit point."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    os.makedirs(root, exist_ok=True)
    idx = S_.build_ivf_index(
        corpus, id_col, vec_col,
        n_clusters=n_clusters, seed=seed, sample_cap=sample_cap,
        persist=False,
    )
    with open(os.path.join(root, "centroids.json"), "w") as f:
        json.dump(idx.centroids.tolist(), f)
    idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        _ivf_epoch_path(root, 0)
    )
    graph = S_.knn_graph(corpus, id_col, vec_col, k, n_blocks=n_blocks)
    S_.save_knn_graph(graph, _graph_gen_path(root, 0), id_col, n_buckets=n_buckets)
    _flip_pointer(
        root,
        {
            "generation": 0,
            "max_epoch": 0,
            "last_batch_id": None,
            "id_col": id_col,
            "vec_col": vec_col,
            "k": k,
            "n_probes": n_probes,
            "n_buckets": n_buckets,
        },
    )


def sync_knn_graph_ivf_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of NEW (id, vector)
    rows — INSERT-only, the ``knn_graph_incremental`` append contract;
    re-vectored ids need ``sync_knn_graph_stream``'s exact upsert fold)
    with AvailableNow: per micro-batch, fold the batch into the SAVED
    graph through IVF ROUTING (``knn_graph_ivf_fold`` — only the
    postings in the batch's probed clusters are read, partition-pruned
    by the cluster layout), append the batch to the postings ledger as
    its own epoch, and publish graph generation + postings high-water
    mark in ONE pointer flip. This is the maintenance path the
    ``knn_graph_auto`` refusal names for > 2M-row corpora: per-epoch
    work is |batch| × |probed postings|, never |batch| × N, at the
    pinned recall dial ``n_probes`` (full width ⇒ the fold is exact —
    the oracle-graded configuration).

    Same exactly-once epoch ledger as the other syncs (replays no-op,
    staged orphans overwritten, one fsync'd pointer flip), and the
    same checkpoint-wipe hazard (see ``sync_minhash_index_stream``):
    wiping the checkpoint after NEW source files landed renumbers
    epochs and can skip them as replays."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _ivf_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        id_col, vec_col, k = ptr["id_col"], ptr["vec_col"], ptr["k"]
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        # tombstone-aware (delete_graph_ids writes deletes epochs on
        # graph+IVF roots): a deleted vector must never re-enter as a
        # neighbor candidate for later batches
        postings = _synced_postings(
            spark, led, ptr, ptr["max_epoch"], id_col
        ).drop("epoch")
        prev = _graph_at(spark, root, ptr)
        updates = batch_df.select(id_col, vec_col)
        # DELTA GENERATION (optimization r15): appends change only the
        # new ids' lists + corpus rows that admitted a batch neighbor —
        # exactly what lands on disk (no markers: nothing is evicted)
        delta, _ = S_.knn_graph_ivf_fold(
            postings, centers, updates, id_col, vec_col, k,
            n_probes=ptr["n_probes"], base_graph=prev, delta_only=True,
        )
        _write_graph_delta(spark, root, epoch, delta, [], id_col)
        led.write_epoch(
            updates.select(
                F.col(id_col),
                F.col(vec_col),
                S_.centroid_assign_udf(centers)(F.col(vec_col)).alias(
                    "cluster"
                ),
            ),
            "postings",
            epoch,
        )
        return {"generation": epoch, "max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def delete_graph_ids(
    spark: SparkSession, root: str, ids, max_affected: int = 65536
) -> int:
    """ID-LEVEL DELETE for GRAPH-BEARING roots — the verb
    ``delete_index_ids`` refuses (a bare tombstone would leave the
    saved graph's edges citing the deleted vectors): write the
    tombstone AND publish the EDGE-REPAIRED graph as a new generation
    in ONE pointer flip, folding ``knn_graph_delete``
    (operators/similarity.py — affected rows recomputed against the
    remaining corpus, unaffected lists kept verbatim, merge ≡ rebuild
    over corpus − deleted) into the sync family's commit discipline.

    Works on both graph-root kinds:

    - combined graph+IVF roots (``init_knn_graph_ivf_root``): the
      delete is a ``deletes`` tombstone epoch (every posting reader
      and the streaming fold anti-join it — the fold's candidate fetch
      is ``_synced_postings``), the repaired graph is saved as the
      same-numbered generation, and generation + ``max_epoch`` advance
      together in the one flip;
    - plain graph roots (``init_knn_graph_root``): the removal is
      appended to the generation-stamped ``removed`` log that
      ``_corpus_at`` nets out of the derived corpus (a later streamed
      re-upsert of the id outranks the removal — alive again), and the
      repaired graph is the new generation.

    Interleaves safely with the streaming arms: the stream's next
    epoch/generation is ``max(epoch_id+1, heads+1)``
    (``EpochLedger.next_epoch`` consults both heads), so a manual
    generation never collides with a replayed batch and later folds
    build on the repaired graph. Crash window: the staged generation
    dir and tombstone/removal rows above the pointer are invisible
    (``_corpus_at`` and the posting readers filter by the committed
    pointer), overwritten by a retry, and swept by the next commit's
    orphan sweep. ``max_affected`` bounds both the tombstone set and
    ``knn_graph_delete``'s affected-row recompute (hub-scale deletes
    refuse with the rebuild recommendation). Returns the committed
    generation — unchanged head for an empty id set (no burned
    epoch)."""
    ptr = read_index_pointer(root)
    if "generation" not in ptr:
        raise ValueError(
            "not a graph-bearing root (no generation in its pointer) — "
            "use delete_index_ids for posting-only ledgers"
        )
    id_col, vec_col, k = ptr["id_col"], ptr["vec_col"], ptr["k"]
    if isinstance(ids, DataFrame):
        dels = ids.select(id_col).distinct()
        n = dels.count()
    else:
        if not ids:
            return int(ptr["generation"])
        # a driver-side id list needs no Spark job to count
        uniq = sorted(set(ids))
        n = len(uniq)
        id_type = "long" if isinstance(uniq[0], int) else "string"
        dels = spark.createDataFrame(
            [(i,) for i in uniq], f"{id_col} {id_type}"
        )
    if n == 0:
        return int(ptr["generation"])
    if n > max_affected:
        raise ValueError(
            f"delete_graph_ids would remove {n} ids > max_affected="
            f"{max_affected} — a hub-scale delete; rebuild the graph "
            "instead (pass a higher bound explicitly if intended)"
        )
    new_gen = max(
        int(ptr["generation"]), int(ptr.get("max_epoch") or 0)
    ) + 1
    _clear_staged_epoch(root, new_gen)
    is_ivf = "max_epoch" in ptr
    if is_ivf:
        led = _ivf_ledger(root)
        corpus = _synced_postings(
            spark, led, ptr, ptr["max_epoch"], id_col
        ).select(id_col, vec_col)
    else:
        corpus = _corpus_at(spark, root, ptr)
    # fold-lifetime persist: probe + keep are separate actions
    prev = _graph_at(spark, root, ptr).persist()
    try:
        # DELTA GENERATION (optimization r15): stage only the affected
        # rows' repaired lists + markers for the deleted/affected ids
        delta, aff_ids = S.knn_graph_delete(
            corpus, dels, id_col, vec_col, k,
            n_blocks=int(ptr.get("n_blocks", 8)),
            base_graph=prev,
            max_affected=max_affected,
            delta_only=True,
        )
        _write_graph_delta(
            spark, root, new_gen, delta, aff_ids, id_col, marker_df=dels
        )
    finally:
        prev.unpersist()
    if is_ivf:
        EpochLedger(root, {"deletes": None}).write_epoch(
            dels, "deletes", new_gen
        )
        _flip_pointer(
            root, {**ptr, "generation": new_gen, "max_epoch": new_gen}
        )
    else:
        dels.write.mode("overwrite").parquet(
            _epoch_path(root, "removed", new_gen)
        )
        _flip_pointer(root, {**ptr, "generation": new_gen})
    return new_gen


def sync_knn_graph_ivf_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """ONE-VERB CDC for the GRAPH+IVF root — the scale arm's
    counterpart of ``sync_knn_graph_cdc_stream``: op ∈ I/U/D
    micro-batches fold as ONE epoch carrying the U/D tombstones, the
    edge-repaired-then-grown graph generation, and the upserts'
    posting partition, all published by one flip (generation and
    ``max_epoch`` advance together, as the root's other verbs do).

    Per batch: (1) op-D and op-U ids become a ``deletes`` tombstone
    epoch — every posting read from here on hides their older
    versions (``_apply_tombstones``' strictly-later rule; the same
    epoch's replacement posting survives); (2) the graph retires them
    via ``knn_graph_delete`` against the committed corpus
    (|affected|·N, affected ≈ in-degree of the tombstoned set);
    (3) the non-delete rows fold into the repaired graph through IVF
    ROUTING (``knn_graph_ivf_fold`` — |batch| × |probed postings|,
    partition-pruned, exact at full probe width: after the exact
    repair the graph is exact over corpus − tombstoned, and the
    routed insert of the new versions is the graded-exact insert arm)
    and land as the epoch's postings. So an update costs one exact
    eviction + one routed insert — never a rebuild, never |batch|·N
    against the full corpus. At most one row per id per batch,
    ENFORCED. Same exactly-once ledger + checkpoint-lineage contract;
    crash-restart pytest-pinned
    (test_knn_graph_ivf_cdc_sync_crash_restart)."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _ivf_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        id_col, vec_col, k = ptr["id_col"], ptr["vec_col"], ptr["k"]
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        ops, has_ud, n_del, n_up = _cdc_batch_ops(
            batch_df, id_col, (vec_col,), op_col
        )
        tomb = (
            ops.filter(F.col("__op").isin("U", "D")).select(id_col).distinct()
        )
        upserts = ops.filter(F.col("__op") != "D").select(id_col, vec_col)
        # one-row-per-id is enforced, so "any U/D rows" ⟺ "any tombstone
        # ids" and the agg's non-D count IS |upserts| — the two extra
        # per-batch count() actions this fold used to pay are free in
        # the guard agg (optimization r14)
        n_tomb = has_ud
        if not n_tomb and not n_up:
            ops.unpersist()
            return {}  # empty batch: bookkeeping only
        # fold-lifetime persist: the reconstructed graph feeds the
        # delete probe, the keep stream, the repaired-graph build and
        # the routed insert — re-executing the delta fold per action
        # is pure AQE job inflation
        graph = _graph_at(spark, root, ptr).persist()
        base_handle = graph
        # DELTA GENERATION (optimization r15): each stage emits only
        # its changed rows; the eager localCheckpoint between the
        # repair and the routed insert materializes a CHURN-sized
        # delta now, not the full repaired graph
        delta1 = None
        aff1: list = []
        try:
            if n_tomb:
                # committed corpus BEFORE this epoch's tombstones — the
                # repair needs the doomed rows present (survivors = old
                # − deletes); reads filter epoch ≤ the old head, so the
                # staged epoch below stays invisible to them
                corpus = _synced_postings(
                    spark, led, ptr, ptr["max_epoch"], id_col
                ).select(id_col, vec_col)
                led.write_epoch(tomb, "deletes", epoch)
                delta1, aff1 = S_.knn_graph_delete(
                    corpus, tomb, id_col, vec_col, k,
                    n_blocks=int(ptr.get("n_blocks", 8)), base_graph=graph,
                    delta_only=True,
                )
                delta1 = delta1.localCheckpoint(eager=True)
                # the repaired graph the insert stage folds into: stored
                # lists minus the invalidated ids, plus repaired lists
                invalid = tomb.unionByName(
                    spark.createDataFrame(
                        [(int(i),) for i in aff1], f"{id_col} long"
                    )
                )
                graph = graph.join(
                    invalid, id_col, "left_anti"
                ).unionByName(delta1)
            delta2 = None
            if n_up:
                # candidate fetch: committed postings MINUS this epoch's
                # tombstones (frames at the staged epoch see them), so a
                # replaced version never re-enters as a neighbor
                postings_now = _apply_tombstones(
                    spark, led, ptr, epoch,
                    led.frames(spark, "postings", ptr, ptr["max_epoch"]),
                    id_col,
                ).drop("epoch")
                delta2, _ = S_.knn_graph_ivf_fold(
                    postings_now, centers, upserts, id_col, vec_col, k,
                    n_probes=ptr["n_probes"], base_graph=graph,
                    delta_only=True,
                )
                delta2 = delta2.localCheckpoint(eager=True)
            # one delta epoch for the whole batch: insert-stage rows win
            # over repair-stage rows for the same id (computed ON TOP of
            # the repair), markers cover tombstoned ∪ affected; no
            # distinct on the anti side — left_anti tolerates dup keys
            if delta1 is not None and delta2 is not None:
                delta = delta2.unionByName(
                    delta1.join(
                        delta2.select(id_col), id_col, "left_anti"
                    )
                )
            else:
                delta = delta2 if delta2 is not None else delta1
            _write_graph_delta(
                spark, root, epoch, delta, aff1, id_col,
                marker_df=tomb if n_tomb else None,
            )
            led.write_epoch(
                upserts.select(
                    F.col(id_col),
                    F.col(vec_col),
                    S_.centroid_assign_udf(centers)(F.col(vec_col)).alias(
                        "cluster"
                    ),
                ),
                "postings",
                epoch,
            )
        finally:
            base_handle.unpersist()
        ops.unpersist()
        return {"generation": epoch, "max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def vacuum_ivf_orphans(root: str) -> int:
    """Drop staged posting epochs ABOVE the pointer — the crash-window
    orphans a final crash can leave. Unlike graph generations, committed
    IVF epochs all hold live (disjoint) postings, so nothing at or below
    the pointer is ever touched."""
    import shutil

    ptr = read_index_pointer(root)
    post_dir = os.path.join(root, "postings")
    doomed = [
        int(d.split("=", 1)[1])
        for d in os.listdir(post_dir)
        if d.startswith("epoch=")
        and int(d.split("=", 1)[1]) > ptr["max_epoch"]
    ]
    for e in doomed:
        shutil.rmtree(_ivf_epoch_path(root, e))
    return len(doomed)


def compact_ivf_epochs(
    spark: SparkSession, root: str, purge_deleted: bool = False
) -> int:
    """Retention for the IVF posting ledger — the worst directory
    growth of the family (``n_clusters`` dirs per committed epoch):
    rewrite every posting epoch at or below the pointer into ONE
    cluster-partitioned compact dataset with epoch kept as an int data
    column, so probes keep partition-pruning on ``cluster``, as-of
    reads stay row-exact, and the live tail keeps its epoch dirs. Same
    staged-then-pointer-flip commit as ``compact_minhash_epochs``;
    superseded dirs removed by ``vacuum_ivf_epochs``. Returns epochs
    newly folded. Works on both plain IVF roots (``init_ivf_root``)
    and combined graph+IVF roots (``init_knn_graph_ivf_root``); the
    ``deletes`` tombstone table (``delete_index_ids``) compacts along
    under the same shared ``compact_upto``.

    ``purge_deleted=True`` is the RIGHT-TO-BE-FORGOTTEN hard removal:
    the postings compact is written with tombstoned rows physically
    DROPPED and the tombstones themselves discarded, and the pointer
    records ``purge_floor = head`` — as-of reads below the floor are
    refused afterwards (the rows needed to reconstruct them are gone;
    the same explicit end-of-readability contract as PCA moment
    compaction). The default keeps every row, so compaction alone
    never changes what time travel can see."""
    return _compact_with_tombstones(
        spark, _ivf_ledger(root), purge_deleted,
        ("postings",), lambda ptr: ptr["id_col"],
    )


def _compact_with_tombstones(
    spark: SparkSession,
    led: EpochLedger,
    purge_deleted: bool,
    data_tables: tuple[str, ...],
    tomb_col_of,
    pair_cols: dict[str, tuple[str, str]] | None = None,
) -> int:
    """Shared compact for roots carrying id-keyed data tables plus a
    ``deletes`` tombstone ledger (IVF/semantic postings; the minhash
    grams+bands pair): the plain path rewrites rows; the purge path
    drops tombstoned rows from every table in ``data_tables`` and the
    spent tombstones, recording the as-of refusal floor.
    ``tomb_col_of(ptr)`` names the id column tombstones join on.
    ``pair_cols`` extends the purge to AUDIT pair tables (the
    ``purge_pairs`` dial): {table: (side_col, side_col)} — a pair row
    is dropped when EITHER cited id was tombstoned after the pair was
    recorded (the same epoch rule as the data tables, applied per
    side, so a re-ingested id's post-re-insert verdicts survive its
    earlier identity's sweep)."""
    if not purge_deleted:
        return led.compact(spark)
    ptr = led.pointer()
    head = ptr["max_epoch"]
    cu = int(ptr.get("compact_upto", 0) or 0)
    if head <= cu:
        # a silent no-op would leave "purged" rows readable — refuse.
        # (delete_index_ids always bumps the head, so purging right
        # after a delete never hits this; only purging deletes that an
        # earlier PLAIN compaction already folded does. Recovery: write
        # a fresh tombstone epoch for the same ids, then purge.)
        raise ValueError(
            f"purge needs uncompacted epochs (head={head}, "
            f"compact_upto={cu}): the staged-compact commit can't "
            "rewrite a live compact in place"
        )
    col = tomb_col_of(ptr)

    def transform(table: str, df: DataFrame, head_: int):
        if table in data_tables:
            return _apply_tombstones(spark, led, ptr, head_, df, col)
        if pair_cols and table in pair_cols:
            out = df
            for side in pair_cols[table]:
                out = _apply_tombstones(
                    spark, led, ptr, head_,
                    out.withColumnRenamed(side, col), col,
                ).withColumnRenamed(col, side)
            return out
        if table == "deletes":
            return None  # spent: their targets are physically gone
        return df

    return led.compact(
        spark, transform=transform, extra={"purge_floor": head}
    )


def vacuum_ivf_epochs(root: str) -> int:
    """Retention sweep for the posting ledger: see
    ``_vacuum_ledger_dirs`` (compacted-away epoch dirs, superseded
    compacts, staged crash orphans — never the committed tail or the
    pointer-named compact). Supersedes ``vacuum_ivf_orphans`` on
    compacted roots (orphans are swept by both)."""
    return _ivf_ledger(root).vacuum()


def init_semantic_dedup_root(
    corpus: DataFrame,
    root: str,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    n_probes: int = 16,
    min_cosine: float = 0.95,
    seed: int = 42,
    sample_cap: int = 65536,
) -> None:
    """One-time base for STREAMING SEMANTIC DEDUP — the embedding
    analog of the growing MinHash index: the corpus saved as an IVF
    posting ledger (epoch 0, cluster-partitioned) with fixed centroids,
    and the probe parameters (threshold + probe width) pinned in the
    pointer, exactly as the MinHash root pins its hash geometry. Full
    probe width (n_probes ≥ n_clusters) makes every batch's verdicts
    EXHAUSTIVE — the oracle-graded configuration; partial width is the
    recall dial for corpora whose near-dups cluster."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    os.makedirs(root, exist_ok=True)
    idx = S_.build_ivf_index(
        corpus, id_col, vec_col,
        n_clusters=n_clusters, seed=seed, sample_cap=sample_cap,
        persist=False,
    )
    with open(os.path.join(root, "centroids.json"), "w") as f:
        json.dump(idx.centroids.tolist(), f)
    idx.assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        _ivf_epoch_path(root, 0)
    )
    _flip_pointer(
        root,
        {
            "max_epoch": 0,
            "last_batch_id": None,
            "id_col": id_col,
            "vec_col": vec_col,
            "n_probes": n_probes,
            "min_cosine": min_cosine,
        },
    )


def sync_semantic_dedup_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of (id, vector)
    docs) with AvailableNow: per micro-batch, (1) probe the batch
    against the posting ledger AS OF the pointer
    (``embedding_near_dup_probe`` — only the batch's probed clusters
    are fetched, partition-pruned), writing flagged near-dup pairs to
    the epoch's pairs partition, then (2) fold the batch into the
    postings as the same epoch, then (3) publish pairs + growth with
    one pointer flip. First-seen-wins: batch k's vectors are checked
    against corpus + batches < k and never against their own batch —
    the GROWING semantic index that ``semantic_dedup_pairs`` (one
    static corpus) and ``streaming_minhash_index_sync`` (text
    shingles) leave uncovered for embeddings. Every vector enters the
    index regardless of its own verdict (flag-and-audit, as the
    MinHash sync). Re-vectoring an id = ``delete_index_ids`` (its
    tombstone hides the old posting from every later probe) followed
    by re-streaming the new vector. Same exactly-once ledger; same
    checkpoint-wipe hazard (see ``sync_minhash_index_stream``)."""
    from spacex_data_engineering_pipeline_spark.operators import (
        similarity as S_,
    )

    led = _semantic_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        id_col, vec_col = ptr["id_col"], ptr["vec_col"]
        with open(os.path.join(root, "centroids.json")) as f:
            centers = json.load(f)
        postings = _synced_postings(
            spark, led, ptr, ptr["max_epoch"], id_col
        ).drop("epoch")
        batch = batch_df.select(id_col, vec_col)
        led.write_epoch(
            S_.embedding_near_dup_probe(
                postings, centers, batch, id_col, vec_col,
                n_probes=ptr["n_probes"], min_cosine=ptr["min_cosine"],
            ),
            "pairs",
            epoch,
        )
        led.write_epoch(
            batch.select(
                F.col(id_col),
                F.col(vec_col),
                S_.centroid_assign_udf(centers)(F.col(vec_col)).alias(
                    "cluster"
                ),
            ),
            "postings",
            epoch,
        )
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def load_synced_semantic_pairs(
    spark: SparkSession, root: str, as_of_epoch: int | None = None
) -> DataFrame:
    """All committed semantic near-dup verdicts: epochs ≤ the pointer,
    staged orphans invisible, columns (new_vec, corpus_vec, cos_sim).
    ``as_of_epoch`` time-travels (immutable epoch partitions — exact
    across compaction too, epoch survives as a data column there); a
    fresh root (or ``as_of_epoch=0``) returns the empty verdict set."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ptr = read_index_pointer(root)
    epoch = _resolve_as_of(ptr, "max_epoch", as_of_epoch)
    pairs = (
        None if epoch == 0 else _ledger_frames(spark, root, "pairs", ptr, epoch)
    )
    if pairs is None:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("new_vec", LongType()),
                    StructField("corpus_vec", LongType()),
                    StructField("cos_sim", DoubleType()),
                ]
            ),
        )
    return pairs.drop("epoch")


def compact_semantic_epochs(
    spark: SparkSession,
    root: str,
    purge_deleted: bool = False,
    purge_pairs: bool = False,
) -> int:
    """Retention for the semantic-dedup root: fold BOTH its ledgers —
    postings (cluster-partitioned compact) and pairs — at or below the
    pointer into compact datasets in one staged pass, then one pointer
    flip. Both must move together: the shared ``compact_upto`` governs
    which live epoch dirs ``vacuum_semantic_epochs`` may drop, so
    compacting only one table would let the sweep delete the other's
    uncompacted rows. (For the same reason, do not run
    ``compact_ivf_epochs`` on a semantic root.) Returns epochs newly
    folded. The ``deletes`` tombstone table compacts along; see
    ``compact_ivf_epochs`` for the ``purge_deleted`` contract and
    ``compact_minhash_epochs`` for the ``purge_pairs`` audit-sweep
    dial (here on the (new_vec, corpus_vec) sides)."""
    if purge_pairs and not purge_deleted:
        raise ValueError(
            "purge_pairs extends purge_deleted (the pairs sweep keys "
            "on the same spent tombstones) — pass purge_deleted=True"
        )
    return _compact_with_tombstones(
        spark, _semantic_ledger(root), purge_deleted,
        ("postings",), lambda ptr: ptr["id_col"],
        pair_cols=(
            {"pairs": ("new_vec", "corpus_vec")} if purge_pairs else None
        ),
    )


def vacuum_semantic_epochs(root: str) -> int:
    """Retention sweep for the semantic-dedup root's ledgers: see
    ``_vacuum_ledger_dirs``."""
    return _semantic_ledger(root).vacuum()


def _moments_epoch_path(root: str, epoch: int) -> str:
    return os.path.join(root, "moments", f"epoch={epoch}")


def init_pca_moments_root(corpus: DataFrame, root: str, vec_col: str) -> None:
    """One-time moment base: ONE corpus pass collects the exact int64
    moment table (N, Σq, Σqqᵀ — model-sized, ~2,145 rows at dim 64;
    ``operators/linalg.py:quantized_moments``) and saves it as epoch 0.
    The corpus itself is never persisted here — moments are the ONLY
    state a PCA refit needs, which is what makes the streaming story
    cheap: O(dim²) rows per epoch, never O(corpus)."""
    from spacex_data_engineering_pipeline_spark.operators.linalg import (
        quantized_moments,
    )

    os.makedirs(root, exist_ok=True)
    quantized_moments(
        corpus.filter(F.col(vec_col).isNotNull()), vec_col
    ).write.mode("overwrite").parquet(_moments_epoch_path(root, 0))
    _flip_pointer(
        root, {"max_epoch": 0, "last_batch_id": None, "vec_col": vec_col}
    )


def sync_pca_moments_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of NEW embedding
    rows) with AvailableNow: per micro-batch, ONE Arrow pass reduces
    the batch to its own exact int64 moment table, written
    overwrite-idempotently to ``moments/epoch=<epoch_id+1>`` and
    published by one pointer flip — the same epoch-ledger exactly-once
    protocol as the kNN-graph and IVF syncs (replays no-op, staged
    orphans invisible + overwritten).

    Why this is the RIGHT streaming shape for PCA: every moment cell
    is an order-free exact integer sum, so moments(base ∪ batches) =
    Σ per-epoch moment tables BIT-EXACTLY (``merge_moments``
    additivity) — the refit model is IDENTICAL to a from-scratch fit
    over everything seen, the corpus is never rescanned, and per-epoch
    state is dim²-sized regardless of batch or corpus size. Contract:
    INSERT-only (moments are sums over disjoint row sets); updates and
    deletes are ``sync_pca_cdc_stream``'s signed-moment job."""
    from spacex_data_engineering_pipeline_spark.operators.linalg import (
        quantized_moments,
    )

    led = _pca_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        vec_col = ptr["vec_col"]
        m = quantized_moments(
            batch_df.filter(F.col(vec_col).isNotNull()), vec_col
        )
        led.write_epoch(m, "moments", epoch)
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def sync_pca_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    op_col: str = "op",
    old_vec_col: str = "old_vec",
    max_files_per_trigger: int = 1,
    on_batch_start=None,
) -> None:
    """Drain a CDC stream of (vector, old_vector, op ∈ I/U/D) rows into
    the PCA moment ledger — the subtract-then-add epoch the
    INSERT-only arm names as its own seam: per micro-batch, ONE Arrow
    pass reduces the non-delete rows' NEW vectors to positive moments
    and the update/delete rows' BEFORE-IMAGE vectors to NEGATED
    moments, written together as one signed epoch. Because every
    moment cell is an exact int64 sum of the same quantization,
    subtracting the identical old vector is bit-exact — the refit over
    the folded ledger EQUALS a from-scratch fit over
    (corpus − old versions + new versions), and every existing reader
    (``load_synced_pca_model`` sums, ``compact_pca_epochs`` sums)
    handles signed rows unchanged.

    Why before-images instead of a vector log: the PCA arm's whole
    identity is that moments are the ONLY state — O(dim²) per epoch,
    the corpus never persisted here (``init_pca_moments_root``). A
    Debezium-style CDC stream carries the before image anyway; an
    upstream that can't produce it should keep its own corpus table
    and diff there. Contract: ``old_vec_col`` must hold EXACTLY the
    vector previously folded in (same doubles — the subtraction has no
    way to validate it against state that was never kept); op I rows
    ignore it, op D rows ignore the new-vector column. Same
    exactly-once ledger as every arm; crash-restart pytest-pinned."""
    from spacex_data_engineering_pipeline_spark.operators.linalg import (
        quantized_moments,
    )

    led = _pca_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        vec_col = ptr["vec_col"]
        ops = batch_df.withColumn(
            "__op", F.upper(F.col(op_col).cast("string")).substr(1, 1)
        )
        pos = quantized_moments(
            ops.filter(F.col("__op") != "D").filter(
                F.col(vec_col).isNotNull()
            ),
            vec_col,
        )
        neg = quantized_moments(
            ops.filter(F.col("__op").isin("U", "D"))
            .filter(F.col(old_vec_col).isNotNull())
            .select(F.col(old_vec_col).alias(vec_col)),
            vec_col,
        ).select("i", "j", (-F.col("m")).alias("m"))
        led.write_epoch(pos.unionByName(neg), "moments", epoch)
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start,
    )


def load_synced_pca_model(
    spark: SparkSession,
    root: str,
    n_components: int,
    n_iter: int = 12,
    as_of_epoch: int | None = None,
):
    """Refit from the committed moment ledger: read epochs ≤ the
    pointer (partition-pruned), fold them with one model-sized
    groupBy-sum (exact int64 — the ``merge_moments`` additivity), and
    run the O(dim³) driver-side eigensolve. Total input is
    epochs × ~2,145 rows; the corpus is untouched. ``as_of_epoch``
    time-travels: the model as trained after any past batch is exactly
    the fold over epochs ≤ k — full model provenance at dim² bytes per
    epoch.

    Retention interplay: ``compact_pca_epochs`` SUMS epochs away
    (unlike the MinHash compaction, which rewrites rows — a summed
    moment table cannot be re-sliced), so as-of points strictly below
    the pointer's ``compact_upto`` are refused the way vacuumed graph
    generations are: compaction is the explicit choice to end their
    readability."""
    from spacex_data_engineering_pipeline_spark.operators.pca import (
        fit_pca_from_moments,
    )

    ptr = read_index_pointer(root)
    epoch = _resolve_as_of(ptr, "max_epoch", as_of_epoch)
    cu = int(ptr.get("compact_upto", 0) or 0)
    if epoch < cu:
        raise ValueError(
            f"as_of={epoch} was compacted away (compact_upto={cu}) — "
            "moment compaction sums epochs, so time travel reaches "
            "epochs ≥ the compaction point only"
        )
    merged = (
        _ledger_frames(spark, root, "moments", ptr, epoch)
        .groupBy("i", "j")
        .agg(F.sum("m").alias("m"))
        .collect()
    )
    return fit_pca_from_moments(merged, n_components, n_iter=n_iter)


def compact_pca_epochs(spark: SparkSession, root: str) -> int:
    """Retention for the PCA moment ledger: SUM every committed epoch
    at or below the pointer into one model-sized moment table (exact
    int64 — ``merge_moments`` additivity makes the fold bit-identical
    to reading the epochs separately), staged at
    ``moments_compact/upto=<head>`` and published by one pointer flip.
    The summed table carries ``epoch = compact point`` so the generic
    ledger reader unions it with the live tail transparently; as-of
    reads below the compaction point are refused (the detail is gone —
    see ``load_synced_pca_model``). Superseded dirs stay until
    ``vacuum_pca_epochs``. Returns the number of epochs newly folded."""
    return _pca_ledger(root).compact(
        spark,
        transform=lambda table, df, head: (
            df.groupBy("i", "j")
            .agg(F.sum("m").alias("m"))
            .withColumn("epoch", F.lit(head).cast("int"))
        ),
    )


def vacuum_pca_epochs(root: str) -> int:
    """Retention sweep for the moment ledger: see
    ``_vacuum_ledger_dirs`` (summed-away epoch dirs, superseded
    compacts, staged crash orphans — never the committed tail or the
    pointer-named compact)."""
    return _pca_ledger(root).vacuum()


def compact_minhash_epochs(
    spark: SparkSession,
    root: str,
    purge_deleted: bool = False,
    purge_pairs: bool = False,
) -> int:
    """Fold every committed MinHash ledger epoch (grams / bands /
    pairs) at or below the pointer into one compact dataset per table
    — the retention step that stops the root from accumulating one
    epoch directory per micro-batch forever. Rows are REWRITTEN, never
    summarized: epoch survives as an int data column, so as-of reads
    stay row-exact after compaction (unlike graph generations, where
    vacuuming ends a generation's readability). The grams compact
    keeps the ``__bucket`` partitioning, so the probe's verify fetch
    still partition-prunes. Same commit discipline as the syncs: the
    compact dataset is STAGED (readers only consult the upto the
    pointer names), published by one pointer flip; superseded dirs
    stay on disk, harmless, until ``vacuum_minhash_epochs``. Returns
    the number of epochs newly folded.

    ``purge_deleted=True`` physically drops tombstoned docs' grams and
    band keys (the content-bearing tables) plus the spent tombstones,
    and sets the as-of refusal floor — see ``compact_ivf_epochs``. The
    PAIRS table is audit history and keeps its rows BY DEFAULT:
    verdicts carry only ids and scores, never document content.
    ``purge_pairs=True`` (requires ``purge_deleted``) extends the
    sweep to them — every pair citing a tombstoned id on EITHER side
    is physically dropped too (epoch-aware: verdicts a re-ingested id
    earned after its re-insert survive the earlier identity's sweep),
    so a right-to-be-forgotten removal can be TOTAL when even the id
    itself must go; below-floor as-of reads refuse as usual."""
    if purge_pairs and not purge_deleted:
        raise ValueError(
            "purge_pairs extends purge_deleted (the pairs sweep keys "
            "on the same spent tombstones) — pass purge_deleted=True"
        )
    return _compact_with_tombstones(
        spark, _minhash_ledger(root), purge_deleted,
        ("grams", "bands"), lambda ptr: ptr.get("tomb_col", "doc"),
        pair_cols={"pairs": ("new_doc", "corpus_doc")} if purge_pairs else None,
    )


def vacuum_minhash_epochs(root: str) -> int:
    """Retention for the MinHash dedup ledger: see
    ``_vacuum_ledger_dirs`` (compacted-away epoch dirs, superseded
    compacts, staged crash orphans — never the committed tail or the
    pointer-named compact)."""
    return _minhash_ledger(root).vacuum()


_grams_bucket = _id_bucket  # the grams ledger's historical name


def _write_grams_epoch(
    grams: DataFrame, root: str, epoch: int, n_buckets: int | None
) -> None:
    """``n_buckets=None`` writes an UNBUCKETED epoch — the layout a
    pre-bucketing root (pointer without ``grams_buckets``) uses. Mixing
    layouts inside one grams table would make Spark's partition
    discovery reject the whole dataset ('conflicting directory
    structures'), so a legacy root keeps its flat layout forever."""
    if not n_buckets:
        grams.write.mode("overwrite").parquet(
            _minhash_epoch_path(root, "grams", epoch)
        )
        return
    grams.withColumn(
        "__bucket", _grams_bucket(F.col("doc"), n_buckets)
    ).write.mode("overwrite").partitionBy("__bucket").parquet(
        _minhash_epoch_path(root, "grams", epoch)
    )


def init_minhash_root(
    corpus: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_jaccard_micro: int = 300_000,
    grams_buckets: int = 16,
) -> None:
    """One-time dedup-index base: shingle + band the corpus ONCE
    (``operators/dedup.py:build_minhash_index``) and save both index
    tables — ``grams`` (exact-verify side) and ``bands`` (candidate
    side) — as epoch 0 of an epoch-keyed layout, with the probe
    parameters pinned in the pointer (an index probed with different
    banding than it was built with silently loses recall, so the
    params travel with the artifact).

    The grams ledger is written partitioned by a doc-id hash bucket
    inside each epoch (``epoch=<e>/__bucket=<b>/``, the
    ``save_knn_graph`` layout): candidates are batch-sized, so the
    exact-Jaccard verify only ever needs the buckets the candidate
    corpus docs hash into — a partition-pruned fetch of ≤ |candidate
    buckets|/``grams_buckets`` of the files, never a scan of all
    committed grams. At 100 TB raise ``grams_buckets`` so one bucket
    ≈ one task's worth of files."""
    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )

    os.makedirs(root, exist_ok=True)
    grams, banded = build_minhash_index(
        corpus, id_col, text_col, num_hashes, bands, shingle_n
    )
    _write_grams_epoch(grams, root, 0, grams_buckets)
    banded.write.mode("overwrite").parquet(
        _minhash_epoch_path(root, "bands", 0)
    )
    banded.unpersist()
    grams.unpersist()
    _flip_pointer(
        root,
        {
            "max_epoch": 0,
            "last_batch_id": None,
            "id_col": id_col,
            "text_col": text_col,
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "min_jaccard_micro": min_jaccard_micro,
            "grams_buckets": grams_buckets,
            # id-level tombstones join the ledger tables on their
            # canonical "doc" column, not the caller-facing id_col
            "tomb_col": "doc",
        },
    )


def read_synced_grams(
    spark: SparkSession,
    root: str,
    buckets: list[int] | None = None,
    as_of_epoch: int | None = None,
) -> DataFrame:
    """The committed grams (doc, shingles) as of the pointer (or
    ``as_of_epoch``), optionally restricted to a doc-id bucket list —
    both epoch and bucket are PARTITION columns, so the restriction
    prunes at file-listing time (assert: the scan's PartitionFilters
    carry ``__bucket``; ``.inputFiles()`` lists only the probed bucket
    dirs). ``buckets=[]`` means "no corpus docs can match" and returns
    the empty frame without touching files.

    Compaction-aware: after ``compact_minhash_epochs`` the committed
    history comes from the bucket-partitioned compact dataset (epoch a
    data column — as-of filters stay row-exact) plus any live epoch
    dirs above it; the bucket restriction partition-prunes both."""
    ptr = read_index_pointer(root)
    epoch = _resolve_as_of(ptr, "max_epoch", as_of_epoch)
    g = _ledger_frames(spark, root, "grams", ptr, epoch)
    if g is None:
        raise ValueError(
            f"no committed grams at epoch {epoch} — the root is not "
            "initialized (init_minhash_root writes epoch 0)"
        )
    if buckets is not None:
        g = g.filter(
            F.col("__bucket").isin(buckets) if buckets else F.lit(False)
        )
    # id-level tombstones (delete_index_ids) hide grams of deleted docs
    # — applied AFTER the bucket prune, so the anti-join sees only the
    # fetched rows; legacy roots (no deletes ledger) skip it entirely
    g = _apply_tombstones(
        spark, _minhash_ledger(root), ptr, epoch, g, ptr.get("tomb_col", "doc")
    )
    return g.drop("epoch", "__bucket")


def _probe_pruned(
    spark: SparkSession,
    root: str,
    ptr: dict,
    new_grams: DataFrame,
    new_banded: DataFrame,
) -> DataFrame:
    """Probe a pre-hashed batch against the committed index with the
    verify side PARTITION-PRUNED: candidates first (band-key join —
    the bands ledger is narrow keys, epoch-pruned to the pointer),
    then ONE bounded driver collect of the candidates' distinct doc-id
    buckets (≤ ``grams_buckets`` ints — model-sized, the repo's
    bounded-probe convention), then the exact-Jaccard verify against
    only those grams bucket dirs. The candidate frame is persisted so
    the band join runs once across the bucket collect and the verify."""
    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_verify_pairs,
    )
    from spacex_data_engineering_pipeline_spark.operators.util import (
        release_caches_with,
    )

    led = _minhash_ledger(root)
    idx_bands = _apply_tombstones(
        spark,
        led,
        ptr,
        ptr["max_epoch"],
        led.frames(spark, "bands", ptr, ptr["max_epoch"]),
        ptr.get("tomb_col", "doc"),
    ).drop("epoch")
    candidates = minhash_candidate_pairs(idx_bands, new_banded).persist()
    n_buckets = ptr.get("grams_buckets")
    if n_buckets:
        buckets = sorted(
            r["b"]
            for r in candidates.select(
                _grams_bucket(F.col("corpus_doc"), n_buckets).alias("b")
            )
            .distinct()
            .collect()
        )
        idx_grams = read_synced_grams(spark, root, buckets=buckets)
    else:  # pre-bucketing root layout: epoch-pruned full read
        idx_grams = read_synced_grams(spark, root)
    out = minhash_verify_pairs(
        candidates, new_grams, idx_grams, ptr["min_jaccard_micro"]
    )
    return release_caches_with(out, candidates)


def probe_minhash_root(
    spark: SparkSession, root: str, new_df: DataFrame
) -> DataFrame:
    """Batch-probe NEW documents against a persisted synced index
    WITHOUT folding them in (read-only): hash the batch with the
    ledger's pinned parameters (the pointer is the source of truth —
    a caller-supplied geometry could silently mismatch the index, see
    ``probe_minhash_index``'s contract note), then run the same
    partition-pruned candidates→verify path the streaming fold uses.
    Returns (new_doc, corpus_doc, jaccard_micro)."""
    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )
    from spacex_data_engineering_pipeline_spark.operators.util import (
        release_caches_with,
    )

    ptr = read_index_pointer(root)
    bg, bb = build_minhash_index(
        new_df,
        ptr["id_col"],
        ptr["text_col"],
        ptr["num_hashes"],
        ptr["bands"],
        ptr["shingle_n"],
    )
    return release_caches_with(_probe_pruned(spark, root, ptr, bg, bb), bg, bb)


def sync_minhash_index_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    on_batch_start=None,
    fence_sources: bool = False,
) -> None:
    """Drain ``source_path`` (parquet file stream of (id, text) docs)
    with AvailableNow: per micro-batch, (1) probe the batch against
    the index AS OF the pointer (``probe_minhash_index`` — O(batch)
    hashing + one band-key shuffle, the committed 100 TB of postings
    partition-pruned by epoch), writing flagged near-dup pairs to the
    epoch's pairs partition, then (2) fold the WHOLE batch's shingles
    and band keys into the index as the same epoch, then (3) publish
    pairs + index growth together with one pointer flip.

    This upgrades ``streaming_dedup_against_index`` (static index —
    batch k is never checked against batches < k) to the GROWING index
    every continuously-ingesting dedup actually needs: first-seen
    wins, so a document re-ingested in a later batch is flagged
    against its earlier twin. Every doc enters the index regardless of
    its own verdict (flag-and-audit semantics — dropping flagged docs
    instead is a filter on the pairs table downstream), which keeps
    each batch's verdicts a pure function of (corpus ∪ earlier
    batches) — exactly replayable. Same exactly-once ledger as the
    kNN/IVF/PCA syncs: replayed epochs no-op, a crash between the
    three staged writes and the flip leaves only invisible orphans
    that the replay overwrites.

    Per-epoch cost, honestly: O(batch) shingle/band hashing + one
    band-key shuffle for candidates + a PARTITION-PRUNED fetch of the
    committed grams buckets the candidate corpus docs hash into, for
    exact-Jaccard verification (the candidate side is batch-sized, so
    the join broadcasts it into the fetch) — the grams ledger is
    bucketed by doc id inside each epoch exactly so this never scans
    all committed grams (``_write_grams_epoch``; pruning pinned by
    test_minhash_sync_verify_partition_prunes).

    CHECKPOINT-WIPE HAZARD (shared by all the syncs): exactly-once
    keys on foreachBatch's ``epoch_id`` scoped to the CHECKPOINT
    LINEAGE (the pointer's ``checkpoint_token`` — ledger.py:drain).
    Wiping the checkpoint's CONTENTS at the same path is a proven
    fixed point for an UNCHANGED source (the re-drain replays epochs
    0..last and no-ops) — but wiping it AFTER new files landed
    renumbers epochs from 0, so the not-yet-processed files can be
    misread as replays and silently skipped. Recover from a lost
    checkpoint by re-draining the same source listing at the same
    checkpoint path, or a FRESH checkpoint dir over a source holding
    ONLY the files past the pointer's high-water mark (a new
    checkpoint path declares a new lineage: every file in its source
    is treated as new — pointing it at already-drained files
    double-applies them). ``fence_sources=True`` removes that last
    footgun: each committed epoch records the source file paths it
    applied in a ``sources`` ledger table, and every batch anti-joins
    its ``input_file_name()`` against the committed set, so
    re-pointed files fold as empty bookkeeping-only epochs
    (``EpochLedger.drain`` docstring has the full contract)."""
    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )

    led = _minhash_ledger(root)

    def fold(ptr: dict, epoch: int, batch_df: DataFrame) -> dict:
        # ONE shingle+band pass per batch: the fold's index build doubles
        # as the probe's query side (probe_minhash_index new_grams/
        # new_banded contract), cached across the three writes below
        bg, bb = build_minhash_index(
            batch_df,
            ptr["id_col"],
            ptr["text_col"],
            ptr["num_hashes"],
            ptr["bands"],
            ptr["shingle_n"],
        )
        led.write_epoch(_probe_pruned(spark, root, ptr, bg, bb), "pairs", epoch)
        # ptr.get, no default: a pre-bucketing root (no grams_buckets)
        # must keep writing UNBUCKETED epochs — one dataset, one layout
        _write_grams_epoch(bg, root, epoch, ptr.get("grams_buckets"))
        led.write_epoch(bb, "bands", epoch)
        bb.unpersist()
        bg.unpersist()
        return {"max_epoch": epoch}

    led.drain(
        spark, source_path, schema, checkpoint_dir, fold,
        max_files_per_trigger, on_batch_start, fence_sources=fence_sources,
    )


def load_synced_dedup_pairs(
    spark: SparkSession, root: str, as_of_epoch: int | None = None
) -> DataFrame:
    """All committed near-dup pairs: epochs ≤ the pointer, staged
    orphans invisible. Columns (new_doc, corpus_doc, jaccard_micro);
    batches are disjoint so epochs never repeat a pair.
    ``as_of_epoch`` time-travels to the verdicts as of any past batch
    (epoch partitions are immutable once committed) — the audit shape
    "what did dedup flag before batch k landed".

    Epoch 0 (a freshly-initialized root, or ``as_of_epoch=0``) is a
    legal committed state with NO pairs directory yet — the base
    corpus is indexed but nothing has been probed — so it returns the
    EMPTY verdict set (doc-id type taken from the grams ledger), not
    an AnalysisException, matching the other synced readers' epoch-0
    validity."""
    from pyspark.sql.types import LongType, StructField, StructType

    ptr = read_index_pointer(root)
    epoch = _resolve_as_of(ptr, "max_epoch", as_of_epoch)
    pairs = (
        None
        if epoch == 0
        else _ledger_frames(spark, root, "pairs", ptr, epoch)
    )
    if pairs is None:
        id_type = read_synced_grams(spark, root).schema["doc"].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("new_doc", id_type),
                    StructField("corpus_doc", id_type),
                    StructField("jaccard_micro", LongType()),
                ]
            ),
        )
    return pairs.drop("epoch")


def vacuum_generations(
    spark: SparkSession, root: str, keep_last: int = 1
) -> int:
    """End the readability of graph generations older than the newest
    ``keep_last`` — the retention knob for the DELTA-GENERATION layout
    (optimization r15): readable generations are the pointer's
    ``graph_base_gen`` full snapshot plus one churn-sized delta epoch
    per commit, so dropping history means REBASING — materialize the
    oldest KEPT generation as a new full snapshot (one corpus-sized
    write, paid per vacuum instead of per micro-batch as the pre-r15
    layout did), flip ``graph_base_gen``, then drop the old snapshot
    and the folded delta epochs. Crash-safe like every verb: the
    staged snapshot is invisible until the flip (readers resolve the
    floor from the pointer), a retry overwrites it. Never touches
    anything staged above the committed head. Returns the number of
    generations whose readability ended."""
    import shutil

    ptr = read_index_pointer(root)
    head = int(ptr["generation"])
    floor = int(ptr.get("graph_base_gen", 0) or 0)
    committed = sorted(_graph_committed_gens(root, floor, head))
    kept = committed[-keep_last:] if keep_last else committed[-1:]
    new_floor = kept[0]
    doomed = [g for g in committed if g < new_floor]
    if not doomed:
        return 0
    if new_floor != floor:
        snap = _graph_at(spark, root, ptr, new_floor)
        S.save_knn_graph(
            snap, _graph_gen_path(root, new_floor), ptr["id_col"],
            n_buckets=ptr["n_buckets"],
        )
        _flip_pointer(root, {**ptr, "graph_base_gen": new_floor})
    graph_dir = os.path.join(root, "graph")
    for d in os.listdir(graph_dir):
        if not d.startswith("gen="):
            continue
        g = int(d.split("=", 1)[1])
        # every other snapshot at or below the head is dead weight —
        # the superseded floor, or a crash orphan no reader resolves
        if g <= head and g != new_floor:
            shutil.rmtree(os.path.join(graph_dir, d))
    for e in _live_epochs(root, "graph_delta"):
        if e <= new_floor:
            shutil.rmtree(_epoch_path(root, "graph_delta", e))
    return len(doomed)


def sync_hybrid_cdc_stream(
    spark: SparkSession,
    source_path: str,
    schema,
    bm25_root: str,
    ivf_root: str,
    pairs_path: str,
    checkpoint_base: str,
    op_col: str = "op",
    max_files_per_trigger: int = 1,
) -> dict:
    """ONE CDC stream of (id, text, vector, op ∈ I/U/D) rows applied to
    BOTH serving indexes — the write-path companion of
    ``record_epoch_pair``: re-vectoring or retiring a document used to
    mean hand-feeding two separate CDC streams (one per ledger) and
    remembering to pair them; this verb drains the SAME source files
    through the BM25 CDC arm (which reads the id/text/op columns) and
    the IVF CDC arm (id/vector/op — both folds project only their own
    columns, so one wide source serves both), each under its own
    checkpoint lineage inside ``checkpoint_base``, then appends one
    cross-ledger pairing record pinning the two committed heads.

    Consistency story, honestly: the two drains are SEQUENTIAL — a
    crash between them leaves the BM25 ledger ahead of the IVF ledger,
    exactly the state the pairing discipline exists for. The pairs
    file is only appended AFTER both drains complete, so every
    recorded pair names heads that both ledgers actually committed; a
    reader serving at the latest pair (``hybrid_rrf_synced_asof``'s
    shape) never observes the torn middle, and re-running this verb
    after the crash finishes the lagging drain (each arm's own
    exactly-once replay skip makes the finished one a no-op) and then
    records the pair. Returns the appended pair record.

    Column names come from each root's pointer (``id_col`` /
    ``text_col`` / ``vec_col``), so the two indexes may disagree on
    the id column's NAME as long as the stream carries both."""
    import os as _os

    sync_bm25_cdc_stream(
        spark, source_path, schema, bm25_root,
        checkpoint_dir=_os.path.join(checkpoint_base, "bm25"),
        op_col=op_col, max_files_per_trigger=max_files_per_trigger,
    )
    sync_ivf_cdc_stream(
        spark, source_path, schema, ivf_root,
        checkpoint_dir=_os.path.join(checkpoint_base, "ivf"),
        op_col=op_col, max_files_per_trigger=max_files_per_trigger,
    )
    return record_epoch_pair(
        pairs_path, {"bm25": bm25_root, "ivf": ivf_root}
    )


def ledger_root_kind(ptr: dict) -> str:
    """Sniff which sync family owns a ledger root from its pointer's
    distinguishing keys (each ``init_*_root`` writes a disjoint
    signature): ``term_buckets`` → bm25; ``generation`` → a graph
    root (with ``n_probes`` → the combined graph+IVF root, whose
    postings also live under the epoch ledger); ``num_hashes`` →
    minhash dedup; ``min_cosine`` → semantic dedup; otherwise an
    ``id_col`` means plain IVF and its absence the PCA moment ledger
    (which keys on nothing but ``vec_col``). The same discrimination
    ``delete_index_ids`` applies piecemeal, factored for callers."""
    if "term_buckets" in ptr:
        return "bm25"
    if "generation" in ptr:
        return "graph_ivf" if "n_probes" in ptr else "graph"
    if "num_hashes" in ptr:
        return "minhash"
    if "min_cosine" in ptr:
        return "semantic"
    return "ivf" if "id_col" in ptr else "pca"


def maintain_root(
    spark: SparkSession,
    root: str,
    max_tail_epochs: int = 8,
    purge_deleted: bool = False,
    keep_generations: int = 2,
) -> dict:
    """ONE operational retention verb for any ledger root — the policy
    layer the per-arm ``compact_* / vacuum_*`` verbs leave to the
    operator: sniff the root's family from its pointer
    (``ledger_root_kind``), measure the LIVE TAIL (committed epochs
    above ``compact_upto`` — the directory growth that degrades
    file-listing and epoch-union reads as a stream keeps folding), and
    when it exceeds ``max_tail_epochs`` run that family's own
    compaction followed by its vacuum. Graph-bearing roots
    additionally prune saved generations down to the newest
    ``keep_generations`` (each generation is a corpus-sized graph —
    the worst storage growth in the family). ``purge_deleted`` routes
    to each family's hard-removal mode (tombstone purge; BM25's
    netting compact), inheriting their ``purge_floor`` as-of refusal
    semantics.

    Schedule it after every drain (it no-ops cheaply while the tail is
    short — one pointer read and one directory listing) or from a
    periodic job; every step is the arm's own crash-safe staged
    compact + pointer flip, so a crash mid-maintenance leaves the root
    exactly as committed. Returns
    ``{kind, tail_epochs, compacted_epochs, vacuumed_dirs,
    generations_dropped}``."""
    ptr = read_index_pointer(root)
    kind = ledger_root_kind(ptr)
    out = {
        "kind": kind,
        "tail_epochs": 0,
        "compacted_epochs": 0,
        "vacuumed_dirs": 0,
        "generations_dropped": 0,
    }
    if kind == "graph":
        # plain graph roots: the log tail (applied/removed epochs above
        # the rebase floor) is the compaction surface; generations are
        # pruned separately to the keep dial
        gen = int(ptr["generation"])
        floor = int(ptr.get("corpus_rebase_gen", 0) or 0)
        out["tail_epochs"] = len(
            {
                e
                for t in ("applied", "removed")
                for e in _live_epochs(root, t)
                if floor < e <= gen
            }
        )
        if out["tail_epochs"] > max_tail_epochs:
            out["compacted_epochs"] = rebase_graph_corpus(spark, root)
            out["vacuumed_dirs"] = vacuum_graph_logs(root)
        out["generations_dropped"] = vacuum_generations(
            spark, root, keep_last=keep_generations
        )
        return out
    head = int(ptr["max_epoch"])
    cu = int(ptr.get("compact_upto", 0) or 0)
    out["tail_epochs"] = head - cu
    if head - cu > max_tail_epochs:
        if kind == "bm25":
            out["compacted_epochs"] = compact_bm25_epochs(
                spark, root, net=purge_deleted
            )
            out["vacuumed_dirs"] = vacuum_bm25_epochs(root)
        elif kind == "minhash":
            out["compacted_epochs"] = compact_minhash_epochs(
                spark, root, purge_deleted=purge_deleted
            )
            out["vacuumed_dirs"] = vacuum_minhash_epochs(root)
        elif kind == "semantic":
            out["compacted_epochs"] = compact_semantic_epochs(
                spark, root, purge_deleted=purge_deleted
            )
            out["vacuumed_dirs"] = vacuum_semantic_epochs(root)
        elif kind == "pca":
            out["compacted_epochs"] = compact_pca_epochs(spark, root)
            out["vacuumed_dirs"] = vacuum_pca_epochs(root)
        else:  # ivf and graph_ivf share the posting-ledger compaction
            out["compacted_epochs"] = compact_ivf_epochs(
                spark, root, purge_deleted=purge_deleted
            )
            out["vacuumed_dirs"] = vacuum_ivf_epochs(root)
    if kind == "graph_ivf":
        out["generations_dropped"] = vacuum_generations(
            spark, root, keep_last=keep_generations
        )
    return out


def rebase_graph_corpus(spark: SparkSession, root: str) -> int:
    """RETENTION for the plain graph root's ledger side — the one
    directory growth ``vacuum_generations`` doesn't touch: the
    applied/removed logs gain one epoch dir per batch FOREVER, and
    every fold's corpus replay (``_corpus_at``) unions all of them.
    This verb folds the committed logs into one corpus snapshot
    (``corpus_rebase/upto=<generation>`` — staged invisible, then
    published by recording ``corpus_rebase_gen`` in the one pointer
    flip), after which replays read the snapshot plus only the log
    epochs ABOVE the floor: replay cost tracks churn since the last
    rebase, not write history — the graph-root analog of the posting
    ledgers' ``compact_*_epochs``.

    Contract notes: log epochs at or below the floor become
    physically droppable (``vacuum_graph_logs``) — like every purge
    floor, corpus reconstruction BELOW it ends explicitly; saved
    generation dirs are untouched (graph time travel is
    ``vacuum_generations``'s dial, not this one's). A crash between
    the staged snapshot and the flip leaves an invisible orphan the
    next rebase overwrites. Returns distinct log epochs folded (0 =
    no committed log state above the current floor — a no-op, no
    burned snapshot)."""
    ptr = read_index_pointer(root)
    if "generation" not in ptr or "n_probes" in ptr:
        raise ValueError(
            "rebase_graph_corpus is the PLAIN graph root's retention "
            "verb (corpus_base + applied/removed logs); IVF-backed "
            "graph roots derive their corpus from the posting ledger — "
            "compact_ivf_epochs is their compaction"
        )
    gen = int(ptr["generation"])
    floor = int(ptr.get("corpus_rebase_gen", 0) or 0)
    log_epochs = {
        e
        for t in ("applied", "removed")
        for e in _live_epochs(root, t)
        if floor < e <= gen
    }
    if not log_epochs:
        return 0
    corpus = _corpus_at(spark, root, ptr)
    corpus.write.mode("overwrite").parquet(
        os.path.join(root, "corpus_rebase", f"upto={gen}")
    )
    _flip_pointer(root, {**ptr, "corpus_rebase_gen": gen})
    return len(log_epochs)


def vacuum_graph_logs(root: str) -> int:
    """Sweep plain-graph log/base state a rebase superseded: applied/
    removed epoch dirs at or below the pointer's ``corpus_rebase_gen``
    (their rows live on in the snapshot), staged log orphans above the
    committed generation, rebase snapshots the pointer doesn't name,
    and — once a rebase floor exists — the original ``corpus_base``
    (never read again; the snapshot IS the base). The committed tail
    and the pointer-named snapshot are never touched."""
    import shutil

    ptr = read_index_pointer(root)
    gen = int(ptr["generation"])
    floor = int(ptr.get("corpus_rebase_gen", 0) or 0)
    removed = 0
    for t in ("applied", "removed"):
        for e in _live_epochs(root, t):
            if e <= floor or e > gen:
                shutil.rmtree(_epoch_path(root, t, e))
                removed += 1
    rdir = os.path.join(root, "corpus_rebase")
    if os.path.isdir(rdir):
        for d in os.listdir(rdir):
            if d.startswith("upto=") and int(d.split("=", 1)[1]) != floor:
                shutil.rmtree(os.path.join(rdir, d))
                removed += 1
    base_dir = os.path.join(root, "corpus_base")
    if floor > 0 and os.path.isdir(base_dir):
        shutil.rmtree(base_dir)
        removed += 1
    return removed
