"""Launch-domain parity tests: fixture launches/payloads exercising the
reference's edge cases (3-state success, NULL-chain mass semantics,
top-5 ties, theta-filtered delays), the 4 analytics queries checked
against DuckDB, the aggregation invariants from the reference's
test_aggregations.py, and the incremental pipeline end-to-end.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import duckdb
import pytest
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.pipeline.ingest import (
    IncrementalIngestionPipeline,
)
from spacex_data_engineering_pipeline_spark.plans import launch_analytics as LA
from spacex_data_engineering_pipeline_spark.plans.aggregations import (
    AggregationService,
    compute_global_metrics,
)
from spacex_data_engineering_pipeline_spark.sources.launches import (
    LocalLaunchSource,
    enrich_with_payload_mass,
    validate_and_conform,
)

from .oracle_compare import compare_to_oracle

UTC = timezone.utc


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + "Z"


def _raw_launches() -> list[dict]:
    """Deterministic API-shaped rows (ISO strings with Z) covering:
    success true/false/NULL; empty/NULL/multi payload lists; a payload id
    that doesn't exist; static fire after launch (theta-filtered); a
    3-way top-mass tie; two invalid rows (no id / bad date).
    """
    base = datetime(2020, 1, 1, 12, 0, 0, tzinfo=UTC)
    rows = []
    for i in range(30):
        d = base + timedelta(days=30 * i)
        rows.append(
            {
                "launch_id": f"launch_{i:04d}",
                "mission_name": f"Mission {i}",
                "date_utc": _iso(d),
                "success": None if i % 10 == 0 else (i % 3 != 0),
                "payload_ids": (
                    []
                    if i % 7 == 0
                    else [f"pl_{i}_{j}" for j in range(1 + i % 3)]
                ),
                "launchpad_id": None if i % 11 == 0 else f"pad_{i % 4}",
                "static_fire_date_utc": (
                    None
                    if i % 4 == 0
                    # one deliberately AFTER launch (filtered by theta pred)
                    else _iso(d + timedelta(hours=5))
                    if i == 13
                    else _iso(d - timedelta(hours=24 + i))
                ),
            }
        )
    rows[3]["payload_ids"] = ["pl_3_0", "missing_payload"]  # lookup-failure tolerance
    rows[5]["payload_ids"] = None  # NULL array → normalized to []
    # invalid rows: dropped + counted by validation
    rows.append({"launch_id": None, "mission_name": "bad", "date_utc": _iso(base),
                 "success": True, "payload_ids": [], "launchpad_id": None,
                 "static_fire_date_utc": None})
    rows.append({"launch_id": "launch_bad_date", "mission_name": "bad2",
                 "date_utc": "not-a-date", "success": False, "payload_ids": [],
                 "launchpad_id": "pad_1", "static_fire_date_utc": None})
    return rows


def _payloads() -> list[dict]:
    """Masses incl. NULL, zero, negative (all must be excluded from
    totals), plus ties engineered so three launches share a total."""
    rows = []
    for i in range(30):
        for j in range(1 + i % 3):
            pid = f"pl_{i}_{j}"
            if i in (22, 23, 24):
                # engineered 3-way TOTAL tie: 15000 split across the
                # launch's payload count
                mass = 15000.0 / (1 + i % 3)
            elif i % 5 == 0 and j == 0:
                mass = None
            elif i % 6 == 0 and j == 0:
                mass = 0.0
            elif i == 13 and j == 0:
                mass = -15.0
            else:
                mass = 100.0 * (i + 1) + 10.0 * j
            rows.append({"payload_id": pid, "name": f"P{i}.{j}", "mass_kg": mass})
    return rows


RAW_SCHEMA = (
    "launch_id string, mission_name string, date_utc string, success boolean, "
    "payload_ids array<string>, launchpad_id string, static_fire_date_utc string"
)


@pytest.fixture(scope="module")
def launch_tables(spark, tmp_path_factory):
    """Conformed+enriched launches parquet + a DuckDB connection over it."""
    tmp = tmp_path_factory.mktemp("launchdom")
    raw = spark.createDataFrame(_raw_launches(), RAW_SCHEMA)
    payloads = spark.createDataFrame(_payloads(), "payload_id string, name string, mass_kg double")
    valid, stats = validate_and_conform(raw)
    launches = enrich_with_payload_mass(valid, payloads)
    lp = str(tmp / "launches.parquet")
    launches.write.parquet(lp)
    # observe-based: the reject count rode the write action above (and
    # must not double-count even though the enrichment plan references
    # the valid side twice)
    assert stats.rejected == 2
    assert stats.batch_max_date is not None
    con = duckdb.connect()
    con.execute(f"CREATE VIEW launches AS SELECT * FROM read_parquet('{lp}/*.parquet')")
    return {"launches": spark.read.parquet(lp), "payloads": payloads, "duck": con, "dir": tmp}


def test_mass_null_chain(launch_tables):
    rows = {r.launch_id: r for r in launch_tables["launches"].collect()}
    # launch_0000: empty payload list → NULL (not 0)
    assert rows["launch_0000"].total_payload_mass_kg is None
    # launch_0007: empty payload list (7 % 7 == 0) → NULL
    assert rows["launch_0007"].total_payload_mass_kg is None
    # launch_0005: NULL payload list → normalized [] → NULL
    assert rows["launch_0005"].total_payload_mass_kg is None
    # launch_0010: NULL-mass payload excluded, the other one counts
    assert rows["launch_0010"].total_payload_mass_kg == pytest.approx(1110.0)
    # launch_0013: negative mass excluded; second payload (j=1) counts
    assert rows["launch_0013"].total_payload_mass_kg == pytest.approx(1410.0)
    # launch_0003: missing payload id tolerated, existing one counts
    assert rows["launch_0003"].total_payload_mass_kg == pytest.approx(400.0)
    # engineered tie group
    ties = [rows[f"launch_{i:04d}"].total_payload_mass_kg for i in (22, 23, 24)]
    assert set(ties) == {15000.0}


def test_top_payload_masses_vs_oracle(launch_tables):
    df = LA.top_payload_masses(launch_tables["launches"], 5)
    compare_to_oracle(
        df,
        launch_tables["duck"],
        """
        SELECT launch_id, mission_name, date_utc, total_payload_mass_kg,
               success, launchpad_id
        FROM launches WHERE total_payload_mass_kg IS NOT NULL
        ORDER BY total_payload_mass_kg DESC, launch_id ASC LIMIT 5
        """,
    )


def test_site_utilization_vs_oracle(launch_tables):
    df = LA.launch_site_utilization(launch_tables["launches"])
    compare_to_oracle(
        df,
        launch_tables["duck"],
        """
        SELECT launchpad_id AS launch_site, COUNT(*) AS total_launches,
               ROUND(AVG(total_payload_mass_kg), 2) AS average_payload_mass_kg
        FROM launches WHERE launchpad_id IS NOT NULL
        GROUP BY launchpad_id
        """,
    )


def test_delay_by_year_vs_oracle(launch_tables):
    df = LA.time_between_static_fire_and_launch(launch_tables["launches"])
    compare_to_oracle(
        df,
        launch_tables["duck"],
        """
        SELECT CAST(EXTRACT(YEAR FROM date_utc) AS BIGINT) AS launch_year,
               COUNT(*) AS launches_with_static_fire,
               ROUND(AVG(CAST(FLOOR((EPOCH(date_utc) - EPOCH(static_fire_date_utc)) / 3600) AS BIGINT)), 2) AS avg_delay_hours,
               MAX(CAST(FLOOR((EPOCH(date_utc) - EPOCH(static_fire_date_utc)) / 3600) AS BIGINT)) AS max_delay_hours
        FROM launches
        WHERE static_fire_date_utc IS NOT NULL AND date_utc IS NOT NULL
          AND static_fire_date_utc <= date_utc
        GROUP BY EXTRACT(YEAR FROM date_utc)
        """,
    )


def test_sql_surface_matches_dataframe_surface(spark, launch_tables):
    launch_tables["launches"].createOrReplaceTempView("launches")
    for name, builder in [
        ("top_payload_masses", lambda: LA.top_payload_masses(launch_tables["launches"])),
        ("launch_site_utilization", lambda: LA.launch_site_utilization(launch_tables["launches"])),
        ("time_between_engine_test_and_actual_launch",
         lambda: LA.time_between_static_fire_and_launch(launch_tables["launches"])),
    ]:
        sql_rows = sorted(map(tuple, spark.sql(LA.SQL_QUERIES[name]).collect()))
        df_rows = sorted(map(tuple, builder().collect()))
        assert sql_rows == df_rows, f"SQL vs DataFrame mismatch for {name}"


def test_global_metrics_and_invariants(launch_tables):
    launches = launch_tables["launches"]
    m = compute_global_metrics(launches).asDict()
    total = launches.count()
    # reference test_aggregations.py:59-84 invariants
    assert m["total_launches"] == total
    assert m["total_successful_launches"] + m["total_failed_launches"] <= total
    assert m["success_rate"] == pytest.approx(
        round(100.0 * m["total_successful_launches"] / total, 2)
    )
    duck = launch_tables["duck"].execute(
        """
        SELECT COUNT(*), COUNT(CASE WHEN success THEN 1 END),
               COUNT(CASE WHEN NOT success THEN 1 END),
               COUNT(DISTINCT launchpad_id),
               ROUND(AVG(CASE WHEN total_payload_mass_kg > 0 THEN total_payload_mass_kg END), 2)
        FROM launches
        """
    ).fetchone()
    assert (
        m["total_launches"],
        m["total_successful_launches"],
        m["total_failed_launches"],
        m["total_launch_sites"],
        m["average_payload_mass_kg"],
    ) == duck


def test_aggregation_service_snapshots_and_trends(spark, launch_tables):
    svc = AggregationService(spark, str(launch_tables["dir"] / "snapshots.parquet"))
    assert svc.latest() is None
    launches = launch_tables["launches"]
    first = svc.append_snapshot(launches, "initial", launches_added_in_batch=30)
    second = svc.append_snapshot(launches, "incremental", launches_added_in_batch=0)
    latest = svc.latest()
    assert latest["id"] == second["id"] == 2
    assert latest["pipeline_run_id"].startswith("pipeline_")
    hist = svc.history(10).collect()
    assert [h.id for h in hist] == [2, 1]
    # history non-increasing in updated_at (reference test_aggregations.py:97-109)
    assert all(
        hist[i].updated_at >= hist[i + 1].updated_at for i in range(len(hist) - 1)
    )
    trends = {t.id: t for t in svc.trends().collect()}
    assert trends[1].launch_count_delta is None
    assert trends[2].launch_count_delta == 0
    assert trends[2].success_rate_delta == 0.0
    assert first["total_launches"] == latest["total_launches"]
    # perf-over-time analytics runs on the snapshot table
    perf = LA.launch_performance_over_time(svc.snapshots()).collect()
    assert len(perf) == 1 and perf[0].avg_success_rate is not None


def test_incremental_pipeline_end_to_end(spark, tmp_path):
    raw_all = spark.createDataFrame(_raw_launches(), RAW_SCHEMA)
    payloads = spark.createDataFrame(
        _payloads(), "payload_id string, name string, mass_kg double"
    )
    cutoff = "2021-06-01"
    batch1 = raw_all.filter(
        F.try_to_timestamp("date_utc").isNull()  # keep invalid rows in batch1
        | (F.try_to_timestamp("date_utc") < F.lit(cutoff))
    )
    paths = {
        "launches_path": str(tmp_path / "launches.pq"),
        "state_path": str(tmp_path / "state.pq"),
        "snapshots_path": str(tmp_path / "snaps.pq"),
    }

    # run 1: initial load sees only batch1
    p1 = IncrementalIngestionPipeline(
        spark, LocalLaunchSource(spark, batch1), payloads, **paths
    )
    r1 = p1.run()
    assert r1["snapshot_type"] == "initial" and not r1["early_exit"]
    assert r1["rejected_rows"] == 2  # both invalid rows are in batch1's date range
    n1 = spark.read.parquet(paths["launches_path"]).count()
    assert n1 == r1["inserted"] > 0

    # run 2: source now has everything → incremental picks up the rest
    p2 = IncrementalIngestionPipeline(
        spark, LocalLaunchSource(spark, raw_all), payloads, **paths
    )
    r2 = p2.run()
    assert r2["snapshot_type"] == "incremental" and not r2["early_exit"]
    assert r2["inserted"] == 30 - n1
    assert spark.read.parquet(paths["launches_path"]).count() == 30
    # PK uniqueness after upserts
    assert (
        spark.read.parquet(paths["launches_path"]).select("launch_id").distinct().count()
        == 30
    )

    # run 3: nothing new → change detection early-exits
    r3 = p2.run()
    assert r3["early_exit"] and r3["inserted"] == 0

    # snapshots: one per effective run, counts consistent with the table
    svc = AggregationService(spark, paths["snapshots_path"])
    hist = svc.history(10).collect()
    assert [h.snapshot_type for h in hist] == ["incremental", "initial"]
    assert hist[0].total_launches == 30
    assert hist[0].launches_added_in_batch == r2["inserted"]


def test_poisoned_batch_advances_watermark(spark, tmp_path):
    """A batch whose rows are ALL rejected by validation must still
    advance the watermark, or the same poisoned rows are refetched and
    re-rejected on every subsequent run."""
    good = spark.createDataFrame(
        [("l1", "M1", "2021-01-01T00:00:00Z", True, [], "padA", None)], RAW_SCHEMA
    )
    poisoned = good.unionByName(
        spark.createDataFrame(
            [(None, "bad", "2021-06-01T00:00:00Z", True, [], "padA", None)],
            RAW_SCHEMA,
        )
    )
    payloads = spark.createDataFrame([], "payload_id string, name string, mass_kg double")
    paths = {
        "launches_path": str(tmp_path / "l.pq"),
        "state_path": str(tmp_path / "s.pq"),
        "snapshots_path": str(tmp_path / "a.pq"),
    }
    p = IncrementalIngestionPipeline(
        spark, LocalLaunchSource(spark, good), payloads, **paths
    )
    p.run()  # initial load: watermark at 2021-01-01
    wm1 = p.last_fetched_date()

    p2 = IncrementalIngestionPipeline(
        spark, LocalLaunchSource(spark, poisoned), payloads, **paths
    )
    r = p2.run()  # fetches only the poisoned (later) row → all rejected
    assert r["rejected_rows"] == 1 and r["inserted"] == 0
    wm2 = p2.last_fetched_date()
    assert wm2 > wm1, "watermark must advance past a fully-rejected batch"
    # next run: the poisoned row is NOT refetched (change detection may
    # still probe, but the fetch window is empty → early exit, 0 rejects)
    r2 = p2.run()
    assert r2["rejected_rows"] == 0 and r2["early_exit"]
