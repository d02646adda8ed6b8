"""Incremental materialized-view maintenance (operators/matview.py):
insert/retract correctness vs direct recompute, group & bucket
eviction, partition-pruned delta reads, and crash-swap repair."""

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


def _view(spark, path):
    return {
        (r["k1"], r["k2"]): (r["n"], r["total"])
        for r in MV.read_matview(spark, path).collect()
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
    n_dirs_before = len([d for d in os.listdir(path) if d.startswith("__bucket=")])

    # retract EVERY ("b", 2) row: the group disappears; if it was alone
    # in its bucket, the bucket dir must be dropped too
    retract = _mk(spark, [("b", 2, 1.0)]).withColumn("__sign", F.lit(-1))
    stats = MV.apply_delta(
        spark, path, retract, GROUPS, MEASURES, sign_col="__sign", n_buckets=4
    )
    final = _view(spark, path)
    assert ("b", 2) not in final
    assert final[("a", 1)] == (1, 10.0)
    n_dirs_after = len([d for d in os.listdir(path) if d.startswith("__bucket=")])
    assert n_dirs_after == n_dirs_before - stats["dropped_buckets"]


def test_matview_delta_read_partition_prunes(spark, tmp_path):
    """The merge must read ONLY the bucket partitions the delta touches:
    with a single-group delta, the pruned view scan lists at most one
    bucket dir's files."""
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
    pruned = spark.read.parquet(path).filter(F.col("__bucket").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__bucket" in pf


def test_matview_repairs_crashed_swap(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0), ("b", 2, 1.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    before = _view(spark, path)

    # simulate a crash between the two renames: a bucket dir parked
    # aside under the upsert protocol's aside prefix, original missing
    from spacex_data_engineering_pipeline_spark.operators.compact import _encode_base
    from spacex_data_engineering_pipeline_spark.operators.upsert import _OLD_PART_PREFIX

    bucket = next(d for d in os.listdir(path) if d.startswith("__bucket="))
    aside = os.path.join(path, _OLD_PART_PREFIX + _encode_base(bucket))
    os.replace(os.path.join(path, bucket), aside)

    assert _view(spark, path) == before  # read_matview repairs on entry

    # and apply_delta also repairs before merging
    os.replace(os.path.join(path, bucket), aside)
    MV.apply_delta(spark, path, _mk(spark, [("a", 1, 2.0)]), GROUPS, MEASURES, n_buckets=4)
    final = _view(spark, path)
    assert final[("a", 1)] == (2, 12.0)
    assert final[("b", 2)] == (1, 1.0)


def test_matview_rejects_non_abelian_measures(spark, tmp_path):
    with pytest.raises(ValueError, match="not maintainable"):
        MV.create_matview(
            spark,
            str(tmp_path / "mv"),
            _mk(spark, [("a", 1, 1.0)]),
            GROUPS,
            {"m": ("max", "v")},
        )


def test_matview_empty_delta_is_noop(spark, tmp_path):
    path = str(tmp_path / "mv")
    base = _mk(spark, [("a", 1, 10.0)])
    MV.create_matview(spark, path, base, GROUPS, MEASURES, n_buckets=4)
    stats = MV.apply_delta(
        spark, path, _mk(spark, []).limit(0), GROUPS, MEASURES, n_buckets=4
    )
    assert stats == {"touched_buckets": 0, "dropped_buckets": 0}
    assert _view(spark, path) == _direct(base)
