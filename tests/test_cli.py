"""CLI contract tests: the executables a reference user would reach for
(SURVEY §3.1/§3.3 parity + the corpus-prep command), driven through
``main(argv)`` in-process so they share the test session's JVM."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.catalog import load_table
from spacex_data_engineering_pipeline_spark.cli import main


def test_cli_corpus_prep_and_shards(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "corpus_out")
    rc = main([
        "corpus",
        "--documents-parquet", os.path.join(sf_dir, "documents.parquet"),
        "--out", out_dir,
        "--shards", "4",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] >= stats["kept_docs"] > 0
    clean = spark.read.parquet(stats["clean_path"])
    assert {"doc_id", "text", "quality_score", "n_tokens", "n_scrubbed_email"} <= set(
        clean.columns
    )
    # exact dedup happened: content is unique
    assert clean.select("text").distinct().count() == clean.count()
    shards = spark.read.parquet(stats["shards_path"])
    assert shards.count() == clean.count()
    assert shards.filter(F.pmod("doc_id", F.lit(4)) != F.col("shard")).count() == 0


def test_cli_ingest_defaults_partitioned_layout(spark, sf_dir, tmp_path, capsys):
    """The CLI's default layout must be the scale-safe year-partitioned
    table (opt OUT via --no-partition-by-year), mirroring the pipeline
    default."""
    orders = load_table(spark, sf_dir, "orders").limit(200)
    raw = orders.select(
        F.col("o_orderkey").cast("string").alias("launch_id"),
        F.concat(F.lit("Mission "), F.col("o_orderkey")).alias("mission_name"),
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("date_utc"),
        (F.col("o_orderkey") % 2 == 0).alias("success"),
        F.array(F.col("o_orderkey").cast("string")).alias("payload_ids"),
        F.lit("pad-1").alias("launchpad_id"),
        F.lit(None).cast("string").alias("static_fire_date_utc"),
    )
    src = str(tmp_path / "raw.pq")
    raw.write.parquet(src)
    payloads = orders.select(
        F.col("o_orderkey").cast("string").alias("payload_id"),
        F.concat(F.lit("Payload "), F.col("o_orderkey")).alias("name"),
        F.col("o_totalprice").cast("double").alias("mass_kg"),
    )
    pay = str(tmp_path / "pay.pq")
    payloads.write.parquet(pay)
    wh = str(tmp_path / "wh")
    rc = main([
        "ingest", "--source-parquet", src, "--payloads-parquet", pay,
        "--warehouse", wh,
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["status"] == "success"
    # year-partitioned directories prove the default layout
    table_dir = os.path.join(wh, "raw_launches")
    assert any(e.startswith("launch_year=") for e in os.listdir(table_dir)), os.listdir(
        table_dir
    )


def test_cli_compact(spark, sf_dir, tmp_path, capsys):
    import json
    import os

    from spacex_data_engineering_pipeline_spark.cli import main

    src = os.path.join(sf_dir, "orders.parquet")
    table = str(tmp_path / "frag")
    spark.read.parquet(src).repartition(16).write.parquet(table)
    rc = main(["compact", "--table-path", table, "--target-file-mb", "1024"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["files_before"] >= 16 and stats["files_after"] == 1


def test_cli_retention(spark, sf_dir, tmp_path, capsys):
    import json
    import os

    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.cli import main

    src = os.path.join(sf_dir, "orders.parquet")
    orders = spark.read.parquet(src).withColumn("yr", F.year("o_orderdate"))
    table = str(tmp_path / "orders_ret")
    orders.write.partitionBy("yr").parquet(table)
    expect = orders.filter(F.col("o_orderdate") < "1997-01-01").count()
    rc = main([
        "retention", "--table-path", table, "--time-col", "o_orderdate",
        "--cutoff", "1997-01-01 00:00:00", "--partition-col", "yr",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == expect
    left = spark.read.parquet(table)
    assert left.filter(F.col("o_orderdate") < "1997-01-01").count() == 0


def test_cli_checksum_and_repair(spark, tmp_path, capsys):
    import json as _json

    from spacex_data_engineering_pipeline_spark.cli import main

    rows = [(y, y * 10 + i, f"n{i}") for y in (2020, 2021) for i in range(6)]
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(rows, ["year", "k", "name"])
    df.repartition("year").write.partitionBy("year").parquet(src)
    bad = [(y, k, ("X" if (y, k) == (2021, 20213) else n)) for y, k, n in rows]
    spark.createDataFrame(bad, ["year", "k", "name"]).repartition(
        "year"
    ).write.partitionBy("year").parquet(dst)

    assert main(["checksum", "--table-path", src, "--columns", "k,name"]) == 0
    whole = _json.loads(capsys.readouterr().out.strip())
    assert whole["n_rows"] == 12 and int(whole["checksum"]) > 0

    assert main([
        "repair", "--source-path", src, "--target-path", dst,
        "--partition-col", "year", "--columns", "k,name",
    ]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["diverged"] == [2021] and rep["rewritten"] == 1

    got = {tuple(r) for r in spark.read.parquet(dst).select("year", "k", "name").collect()}
    want = {tuple(r) for r in spark.read.parquet(src).select("year", "k", "name").collect()}
    assert got == want
