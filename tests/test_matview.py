"""Incremental materialized-view maintenance (operators/matview.py):
insert/retract correctness vs direct recompute, group & bucket
eviction, partition-pruned delta reads, atomic generation commit
(crash debris invisible), exactly-once batch ids, and time travel."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators import matview as MV

GROUPS = ["k1", "k2"]
MEASURES = {"n": ("count", None), "total": ("sum", "v")}


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k1 string, k2 long, v double")


def _direct(df):
    return {
        (r["k1"], r["k2"]): (r["n"], r["total"])
        for r in df.groupBy(*GROUPS)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }


def _view(spark, path, **kw):
    return {
        (r["k1"], r["k2"]): (r["n"], r["total"])
        for r in MV.read_matview(spark, path, **kw).collect()
    }


def test_matview_insert_and_retract_matches_recompute(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0), ("a", 1, 5.0), ("b", 2, 1.0), (None, 3, 7.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)

    delta = _mk(spark, [("a", 1, 2.0), ("c", 9, 4.0), (None, 3, 1.0)])
    MV.apply_delta(spark, path, delta, GROUPS, MEASURES, n_buckets=4)
    assert _view(spark, path) == _direct(base.unionByName(delta))

    # retract one of the ("a", 1) rows: counts and sums both shrink
    retract = _mk(spark, [("a", 1, 5.0)]).withColumn("__sign", F.lit(-1))
    MV.apply_delta(spark, path, retract, GROUPS, MEASURES, sign_col="__sign", n_buckets=4)
    final = _view(spark, path)
    assert final[("a", 1)][0] == 2
    assert final[("a", 1)][1] == pytest.approx(12.0)
    assert final[(None, 3)] == (2, 8.0)


def test_matview_group_and_bucket_eviction(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0), ("b", 2, 1.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)

    # retract EVERY ("b", 2) row: the group disappears; if it was alone
    # in its bucket, the new generation has no dir for that bucket
    retract = _mk(spark, [("b", 2, 1.0)]).withColumn("__sign", F.lit(-1))
    stats = MV.apply_delta(
        spark, path, retract, GROUPS, MEASURES, sign_col="__sign", n_buckets=4
    )
    assert stats["applied"] and stats["gen"] == 1
    final = _view(spark, path)
    assert ("b", 2) not in final
    assert final[("a", 1)] == (1, 10.0)


def test_matview_delta_read_partition_prunes(spark, tmp_path):
    """The merge must read ONLY the bucket partitions the delta touches:
    the pruned current-generation scan carries a __bucket partition
    filter."""
    path = str(tmp_path / "mv")
    base = _mk(spark, [(f"g{i}", i, float(i)) for i in range(40)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=8)

    delta_agg = MV._with_bucket(
        MV._signed_agg(_mk(spark, [("g7", 7, 1.0)]), GROUPS, MEASURES, None),
        GROUPS,
        8,
    )
    touched = [r[0] for r in delta_agg.select("__bucket").distinct().collect()]
    assert len(touched) == 1
    cur = MV._gen_dir(path, 0)
    pruned = spark.read.parquet(cur).filter(F.col("__bucket").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__bucket" in pf


def test_matview_crash_debris_is_invisible_and_retry_clean(spark, tmp_path):
    """A crash BEFORE the pointer flip leaves a complete-looking next
    generation on disk — readers must stay on the committed generation,
    and a retried apply must land exactly once."""
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0), ("b", 2, 1.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    before = _view(spark, path)

    # simulate the crash: fabricate g0000001 debris (a full copy with
    # garbage content) without touching the pointer
    debris = MV._gen_dir(path, 1)
    shutil.copytree(MV._gen_dir(path, 0), debris)
    assert _view(spark, path) == before  # pointer still at gen 0

    MV.apply_delta(spark, path, _mk(spark, [("a", 1, 2.0)]), GROUPS, MEASURES, n_buckets=4)
    final = _view(spark, path)
    assert final[("a", 1)] == (2, 12.0)
    assert final[("b", 2)] == (1, 1.0)
    assert MV.current_generation(path)["gen"] == 1


def test_matview_batch_id_exactly_once(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    d = _mk(spark, [("a", 1, 2.0)])

    r1 = MV.apply_delta(spark, path, d, GROUPS, MEASURES, n_buckets=4, batch_id=7)
    assert r1["applied"]
    # at-least-once upstream redelivers the same batch: must be a no-op
    r2 = MV.apply_delta(spark, path, d, GROUPS, MEASURES, n_buckets=4, batch_id=7)
    assert not r2["applied"]
    assert _view(spark, path)[("a", 1)] == (2, 12.0)
    # next batch id applies
    r3 = MV.apply_delta(spark, path, d, GROUPS, MEASURES, n_buckets=4, batch_id=8)
    assert r3["applied"]
    assert _view(spark, path)[("a", 1)] == (3, 14.0)


def test_matview_time_travel_and_gc(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    d = _mk(spark, [("a", 1, 1.0)])
    MV.apply_delta(spark, path, d, GROUPS, MEASURES, n_buckets=4, keep_gens=2)
    MV.apply_delta(spark, path, d, GROUPS, MEASURES, n_buckets=4, keep_gens=2)

    assert _view(spark, path)[("a", 1)] == (3, 12.0)
    assert _view(spark, path, at_gen=1)[("a", 1)] == (2, 11.0)  # retained
    with pytest.raises(FileNotFoundError):
        MV.read_matview(spark, path, at_gen=0)  # GC'd (keep_gens=2)


def test_matview_rejects_non_abelian_measures(spark, tmp_path):
    with pytest.raises(ValueError, match="not maintainable"):
        MV.create_matview(
            spark,
            str(tmp_path / "mv"),
            _mk(spark, [("a", 1, 1.0)]),
            GROUPS,
            {"m": ("max", "v")},
        )


def test_matview_empty_delta_commits_batch_id(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    empty = _mk(spark, []).limit(0)
    stats = MV.apply_delta(spark, path, empty, GROUPS, MEASURES, n_buckets=4, batch_id=3)
    assert stats == {"applied": True, "gen": 0, "touched_buckets": 0}
    assert MV.current_generation(path)["last_batch_id"] == 3
    assert _view(spark, path) == _direct(base)


def test_matview_hardlinks_untouched_buckets(spark, tmp_path):
    """Untouched buckets must share inodes with the previous generation
    (no data copied forward)."""
    path = str(tmp_path / "mv")
    base = _mk(spark, [(f"g{i}", i, float(i)) for i in range(40)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=8)
    MV.apply_delta(spark, path, _mk(spark, [("g7", 7, 1.0)]), GROUPS, MEASURES, n_buckets=8)

    g0, g1 = MV._gen_dir(path, 0), MV._gen_dir(path, 1)
    shared = copied = 0
    for entry in os.listdir(g1):
        if not entry.startswith("__bucket="):
            continue
        old = os.path.join(g0, entry)
        if not os.path.isdir(old):
            continue
        for fn in os.listdir(os.path.join(g1, entry)):
            new_f = os.path.join(g1, entry, fn)
            old_f = os.path.join(old, fn)
            if os.path.exists(old_f) and os.path.samefile(new_f, old_f):
                shared += 1
            else:
                copied += 1
    assert shared > 0  # at least the 7 untouched buckets ride as links


def test_streaming_matview_sync_and_full_redrain_fixed_point(spark, tmp_path):
    """Drain a 3-batch file stream into a view (insert, insert,
    retract), then DELETE THE CHECKPOINT and re-drain from scratch:
    epoch ids replay 0..2 against the view's committed ledger, so the
    re-drain must be a detected no-op — the view is a fixed point."""
    import shutil as _shutil

    from spacex_data_engineering_pipeline_spark.streaming.matview_sync import (
        sync_matview_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [("a", 1, 10.0, 1), ("b", 2, 1.0, 1)],
        [("a", 1, 2.0, 1), ("c", 3, 4.0, 1)],
        [("b", 2, 1.0, -1)],  # retraction: group b vanishes
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k1 string, k2 long, v double, s int")
        dst = os.path.join(src, f"batch{i:04d}.parquet")
        tmp = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(tmp)
        fn = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, fn), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.createDataFrame([], "k1 string, k2 long, v double, s int").schema
    view = str(tmp_path / "view")
    MV.create_matview(
        spark, view, spark.createDataFrame([], "k1 string, k2 long, v double"),
        GROUPS, MEASURES, n_buckets=4,
    )
    ckpt = str(tmp_path / "ckpt")
    sync_matview_stream(
        spark, src, schema, view, GROUPS, MEASURES, ckpt, sign_col="s", n_buckets=4
    )
    want = {("a", 1): (2, 12.0), ("c", 3): (1, 4.0)}
    assert _view(spark, view) == want
    gen_after = MV.current_generation(view)

    # full re-drain with a FRESH checkpoint: all epochs replay
    _shutil.rmtree(ckpt)
    sync_matview_stream(
        spark, src, schema, view, GROUPS, MEASURES, ckpt, sign_col="s", n_buckets=4
    )
    assert _view(spark, view) == want
    assert MV.current_generation(view) == gen_after  # not even a new gen
