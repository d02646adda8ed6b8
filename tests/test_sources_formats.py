"""CSV/JSON launch-source variants + the MERGE INTO-style API.

All three file formats must conform to the SAME validated shape — the
format only changes how raw rows travel, never the domain semantics
(reference ingests from one REST shape; SURVEY §2.1 generalizes the
source seam).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.upsert import merge_into
from spacex_data_engineering_pipeline_spark.sources.launches import (
    LocalLaunchSource,
    validate_and_conform,
)

RAW_ROWS = [
    {
        "launch_id": "l1",
        "mission_name": "M1",
        "date_utc": "2021-01-01T00:00:00Z",
        "success": True,
        "payload_ids": ["p1", "p2"],
        "launchpad_id": "padA",
        "static_fire_date_utc": "2020-12-30T12:00:00Z",
    },
    {
        "launch_id": "l2",
        "mission_name": "M2",
        "date_utc": "2021-02-01T00:00:00Z",
        "success": None,
        "payload_ids": None,
        "launchpad_id": "padB",
        "static_fire_date_utc": None,
    },
    {  # invalid: no date — must be rejected by validation in every format
        "launch_id": "l3",
        "mission_name": "M3",
        "date_utc": None,
        "success": False,
        "payload_ids": ["p9"],
        "launchpad_id": "padA",
        "static_fire_date_utc": None,
    },
]


def _conform_sorted(source):
    valid, stats = validate_and_conform(source.fetch_all())
    # fill the observation with a single-pass action FIRST: a global
    # sort's range-partitioner SAMPLES its child before shuffling, i.e.
    # executes the observed node twice and would double the metrics
    valid = valid.persist()
    valid.count()
    rows = valid.drop("ingested_at").orderBy("launch_id").collect()
    valid.unpersist(blocking=False)
    return [r.asDict() for r in rows], stats


def test_json_source_matches_dataframe_source(spark, tmp_path):
    jpath = str(tmp_path / "launches.jsonl")
    with open(jpath, "w") as f:
        for r in RAW_ROWS:
            f.write(json.dumps(r) + "\n")

    base_rows, base_stats = _conform_sorted(
        LocalLaunchSource(
            spark,
            spark.createDataFrame(
                [tuple(r[c] for c in (
                    "launch_id", "mission_name", "date_utc", "success",
                    "payload_ids", "launchpad_id", "static_fire_date_utc",
                )) for r in RAW_ROWS],
                "launch_id string, mission_name string, date_utc string, "
                "success boolean, payload_ids array<string>, launchpad_id string, "
                "static_fire_date_utc string",
            ),
        )
    )
    json_rows, json_stats = _conform_sorted(LocalLaunchSource.from_json(spark, jpath))
    assert json_rows == base_rows
    assert json_stats.rejected == base_stats.rejected == 1
    assert [r["launch_id"] for r in json_rows] == ["l1", "l2"]
    assert json_rows[1]["payload_ids"] == []  # NULL normalized


def test_json_source_multiline_array_dump(spark, tmp_path):
    jpath = str(tmp_path / "dump.json")
    with open(jpath, "w") as f:
        json.dump(RAW_ROWS, f)  # one file, one JSON array — an API dump
    rows, stats = _conform_sorted(
        LocalLaunchSource.from_json(spark, jpath, multiline=True)
    )
    assert [r["launch_id"] for r in rows] == ["l1", "l2"]
    assert stats.rejected == 1


def test_csv_source_matches_json_source(spark, tmp_path):
    cpath = str(tmp_path / "launches.csv")
    with open(cpath, "w") as f:
        f.write(
            "launch_id,mission_name,date_utc,success,payload_ids,"
            "launchpad_id,static_fire_date_utc\n"
        )
        f.write("l1,M1,2021-01-01T00:00:00Z,true,p1|p2,padA,2020-12-30T12:00:00Z\n")
        f.write("l2,M2,2021-02-01T00:00:00Z,,,padB,\n")
        f.write("l3,M3,,false,p9,padA,\n")
    rows, stats = _conform_sorted(LocalLaunchSource.from_csv(spark, cpath))
    assert [r["launch_id"] for r in rows] == ["l1", "l2"]
    assert rows[0]["payload_ids"] == ["p1", "p2"]  # '|' split literally
    assert rows[1]["payload_ids"] == []
    assert rows[0]["success"] is True and rows[1]["success"] is None
    assert stats.rejected == 1


# -- MERGE INTO-style API ----------------------------------------------------


@pytest.mark.parametrize("partition_col", [None, "part"])
def test_merge_into_counters_and_source_wins(spark, tmp_path, partition_col):
    path = str(tmp_path / f"tbl_{partition_col}")
    base = spark.createDataFrame(
        [(1, "a", 2000), (2, "b", 2001)], "id long, v string, part int"
    )
    r1 = merge_into(spark, path, base, on="id", partition_col=partition_col)
    assert r1.inserted == 2 and r1.updated_or_unchanged == 0

    batch = spark.createDataFrame(
        [(2, "B", 2001), (3, "c", 2002)], "id long, v string, part int"
    )
    r2 = merge_into(spark, path, batch, on="id", partition_col=partition_col)
    assert r2.inserted == 1  # id=3 is new
    assert r2.updated_or_unchanged == 1  # id=2 matched

    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    # WHEN MATCHED THEN UPDATE SET *: source wins with no order_by
    assert got == {1: "a", 2: "B", 3: "c"}
    # no plan-internal marker column leaks into the table
    assert "__src" not in spark.read.parquet(path).columns


def test_merge_into_order_by_overrides_survivor(spark, tmp_path):
    path = str(tmp_path / "tbl_ord")
    base = spark.createDataFrame([(1, "new", 5)], "id long, v string, ver long")
    merge_into(spark, path, base, on="id")
    stale = spark.createDataFrame([(1, "old", 3)], "id long, v string, ver long")
    r = merge_into(spark, path, stale, on="id", order_by=[F.col("ver").desc()])
    assert r.inserted == 0 and r.updated_or_unchanged == 1
    assert spark.read.parquet(path).first().v == "new"  # higher ver survives


def test_orc_source_matches_json_source(spark, tmp_path):
    """ORC round-trips the same rows/validation stats as the JSON path —
    the source contract is format-independent."""
    jpath = str(tmp_path / "launches.jsonl")
    with open(jpath, "w") as f:
        for row in RAW_ROWS:
            f.write(json.dumps(row) + "\n")
    jrows, jstats = _conform_sorted(LocalLaunchSource.from_json(spark, jpath))

    opath = str(tmp_path / "launches.orc")
    LocalLaunchSource.from_json(spark, jpath).fetch_all().write.orc(opath)
    orows, ostats = _conform_sorted(LocalLaunchSource.from_orc(spark, opath))
    assert orows == jrows
    assert ostats.rejected == jstats.rejected == 1


def test_metalog_compaction(tmp_path):
    """Compacting the one-file-per-run log keeps the freshest rows in a
    single part and is invisible to every reader."""
    from datetime import datetime, timezone

    from spacex_data_engineering_pipeline_spark.pipeline import metalog as ML
    import pyarrow as pa

    schema = pa.schema([
        pa.field("id", pa.int64()),
        pa.field("last_fetched_date", pa.timestamp("us", tz="UTC")),
        pa.field("updated_at", pa.timestamp("us", tz="UTC")),
    ])
    path = str(tmp_path / "state")
    for i in range(1, 8):
        ML.append_row(path, {
            "id": i,
            "last_fetched_date": datetime(2021, 1, i, tzinfo=timezone.utc),
            "updated_at": datetime(2021, 1, i, tzinfo=timezone.utc),
        }, schema)
    before_latest = ML.latest_row(path)
    import glob as g
    assert len(g.glob(path + "/*.parquet")) == 7

    removed = ML.compact(path, schema, keep_last=3)
    assert removed == 7
    assert len(g.glob(path + "/*.parquet")) == 1
    rows = ML.read_rows(path)
    assert [r["id"] for r in sorted(rows, key=lambda r: r["id"])] == [5, 6, 7]
    assert ML.latest_row(path) == before_latest
    # idempotent: a second compaction is a no-op
    assert ML.compact(path, schema, keep_last=3) == 0
