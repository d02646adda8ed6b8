"""Z-order layout (operators/zorder.py): interleave math, round-trip
fidelity, and the actual point — multi-dimensional file skipping that
a single-column sort cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.zorder import (
    files_overlapping_box,
    write_zordered,
    zorder_value,
)


def test_interleave_known_values(spark):
    # values span [0, 3] with bits=2 → quantization is the identity.
    # (x=0b11, y=0b01) → z = x0 | y0<<1 | x1<<2 | y1<<3
    #   = 1 | 1<<1 | 1<<2 | 0<<3 = 0b0111 = 7
    df = spark.createDataFrame(
        [(0, 0), (3, 1), (3, 3)], "x long, y long"
    )
    zdf, zcol = zorder_value(df, ["x", "y"], bits=2)
    got = {(r["x"], r["y"]): r[zcol] for r in zdf.collect()}
    assert got == {(0, 0): 0, (3, 1): 7, (3, 3): 15}


def test_zorder_preserves_rows(spark, sf_dir, tmp_path):
    from spacex_data_engineering_pipeline_spark.catalog import load_table

    li = load_table(spark, str(sf_dir), "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "zli")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    # checksum equality, order-insensitive
    chk = lambda d: d.agg(
        F.sum("l_orderkey"), F.sum("l_partkey"), F.sum(F.round("l_quantity", 2))
    ).collect()[0]
    assert chk(back) == chk(li)


def test_zorder_skips_files_where_linear_sort_cannot(spark, tmp_path):
    """A 2-D box predicate over a layout sorted by an UNRELATED column
    overlaps every file; the z-ordered layout excludes most files for
    the same box via footer min/max alone."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
    ).select("id", F.abs("a").alias("a"), F.abs("b").alias("b"))

    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["a", "b"], n_files=16)

    box = {"a": (100, 199), "b": (400, 499)}  # ~1% of the grid
    lin_hit, lin_total = files_overlapping_box(linear, box)
    z_hit, z_total = files_overlapping_box(zpath, box)
    assert lin_total == z_total == 16
    assert lin_hit == 16  # id-sort gives no (a, b) locality at all
    assert z_hit <= 6  # Morton clustering excludes most files

    # and the data that survives pruning is still the right data
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("a").between(100, 199) & F.col("b").between(400, 499))
        .count()
    )
    want = df.filter(
        F.col("a").between(100, 199) & F.col("b").between(400, 499)
    ).count()
    assert got == want


# ---------------------------------------------------------------------------
# file-stats secondary index (operators/fileindex.py)
# ---------------------------------------------------------------------------


def test_file_index_prunes_and_preserves_results(spark, tmp_path):
    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.operators import fileindex as FI
    from spacex_data_engineering_pipeline_spark.operators.zorder import (
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    path = str(tmp_path / "zli")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=16)

    idx = FI.build_file_index(spark, path, ["l_partkey", "l_suppkey"])
    rows = idx.collect()
    n_files = len({r["file"] for r in rows})
    assert n_files >= 8 and len(rows) == 2 * n_files

    box = {"l_partkey": (20, 40), "l_suppkey": (2, 6)}
    files = FI.prune_files(idx, box)
    assert 0 < len(files) < n_files  # the index actually excludes files

    pred = F.col("l_partkey").between(20, 40) & F.col("l_suppkey").between(2, 6)
    got = (
        FI.read_pruned(spark, files)
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("ck"),
        )
        .collect()[0]
    )
    want = (
        spark.read.parquet(path)
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("ck"),
        )
        .collect()[0]
    )
    assert (got["n"], got["ck"]) == (want["n"], want["ck"]) and got["n"] > 0


def test_file_index_save_load_and_empty_prune(spark, tmp_path):
    from spacex_data_engineering_pipeline_spark.operators import fileindex as FI

    df = spark.range(100).withColumnRenamed("id", "k")
    path = str(tmp_path / "t")
    df.coalesce(4).write.parquet(path)
    idx = FI.build_file_index(spark, path, ["k"])
    FI.save_file_index(idx, str(tmp_path / "idx"))
    idx2 = spark.read.parquet(str(tmp_path / "idx"))
    # box beyond the data: every file pruned; empty read needs schema
    assert FI.prune_files(idx2, {"k": (1000, 2000)}) == []
    out = FI.read_pruned(spark, [], schema="k long")
    assert out.count() == 0
    # an empty box is a caller bug (it would mean "read everything")
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        FI.prune_files(idx2, {})


def test_file_index_distributed_prune_and_batched_read(spark, tmp_path):
    """The 100 TB path: the surviving-file set stays a DataFrame and
    the read consumes it in bounded batches (batch_size=2 over ~8
    surviving files forces several union legs); result equals the
    direct filtered scan. The list API refuses to materialize beyond
    max_files."""
    import pytest

    from spacex_data_engineering_pipeline_spark.operators import fileindex as FI

    df = spark.range(1000).withColumnRenamed("id", "k")
    path = str(tmp_path / "t")
    df.repartitionByRange(16, "k").write.parquet(path)
    idx = FI.build_file_index(spark, path, ["k"])
    surv = FI.prune_files_df(idx, {"k": (100, 550)})
    n_surv = surv.count()
    assert 0 < n_surv < 16
    out = FI.read_pruned_df(spark, surv, batch_size=2).filter(
        "k BETWEEN 100 AND 550"
    )
    assert out.count() == 451
    assert sorted(r["k"] for r in out.collect()) == list(range(100, 551))
    with pytest.raises(ValueError, match="max_files"):
        FI.prune_files(idx, {"k": (100, 550)}, max_files=1)
    # empty survivor set still needs a schema
    empty = FI.prune_files_df(idx, {"k": (5000, 6000)})
    assert FI.read_pruned_df(spark, empty, schema="k long").count() == 0


def test_file_index_incremental_append_equals_rebuild(spark, tmp_path):
    import shutil

    from spacex_data_engineering_pipeline_spark.operators import fileindex as FI

    path = str(tmp_path / "t2")
    spark.range(100).withColumnRenamed("id", "k").coalesce(2).write.parquet(path)
    idx = FI.build_file_index(spark, path, ["k"]).cache()
    idx.count()

    # append a new batch of files (ingest), then drop one original file
    # (compaction) — the incremental index must track both
    extra = str(tmp_path / "extra")
    spark.range(100, 200).withColumnRenamed("id", "k").coalesce(2).write.parquet(extra)
    import os

    for i, f in enumerate(
        sorted(x for x in os.listdir(extra) if x.endswith(".parquet"))
    ):
        shutil.move(os.path.join(extra, f), os.path.join(path, f"appended-{i}.parquet"))
    victim = sorted(
        x for x in os.listdir(path) if x.startswith("part-")
    )[0]
    os.remove(os.path.join(path, victim))

    inc = FI.append_to_file_index(spark, path, ["k"], idx)
    full = FI.build_file_index(spark, path, ["k"])
    gi = {tuple(r) for r in inc.collect()}
    gf = {tuple(r) for r in full.collect()}
    assert gi == gf and len(gi) > 0
