"""Driver-side I/O for the pipeline's METADATA tables — the watermark
state log and the snapshot-per-run aggregate series.

Both tables are O(pipeline runs): one row appended per run, read back
whole. Routing those reads/writes through Spark costs a full job
(~0.3-0.5 s scheduler floor) per touch for data that fits in a page —
at 100 TB the DATA plane is Spark's, but run metadata belongs on the
driver, exactly like Delta Lake commits its transaction log with plain
driver-side file writes. Files stay ordinary parquet in the same
directory layout Spark wrote before, so every Spark reader
(`AggregationService.snapshots()`, trends/history queries, tests that
open the paths directly) is unaffected; pyarrow and Spark part files
can coexist in one directory.

Timestamp convention: Spark writes TimestampType as µs adjusted-to-UTC
(the session is pinned UTC, ``session.py``); we mirror it with
``timestamp[us, tz=UTC]`` columns and return NAIVE UTC datetimes —
byte- and value-compatible with what ``DataFrame.collect`` returned
when Spark did these reads.
"""

from __future__ import annotations

import glob
import os
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

_TS = pa.timestamp("us", tz="UTC")

STATE_ARROW_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("last_fetched_date", _TS),
        pa.field("updated_at", _TS, nullable=False),
    ]
)

SNAPSHOT_ARROW_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int64(), nullable=False),
        pa.field("total_launches", pa.int64(), nullable=False),
        pa.field("total_successful_launches", pa.int64(), nullable=False),
        pa.field("total_failed_launches", pa.int64(), nullable=False),
        pa.field("success_rate", pa.float64()),
        pa.field("earliest_launch_date", _TS),
        pa.field("latest_launch_date", _TS),
        pa.field("total_launch_sites", pa.int64()),
        pa.field("average_payload_mass_kg", pa.float64()),
        pa.field("average_delay_hours", pa.float64()),
        pa.field("updated_at", _TS, nullable=False),
        pa.field("last_processed_launch_date", _TS),
        pa.field("snapshot_type", pa.string()),
        pa.field("launches_added_in_batch", pa.int64()),
        pa.field("pipeline_run_id", pa.string()),
    ]
)


def _to_utc_aware(v):
    if isinstance(v, datetime):
        return v.replace(tzinfo=timezone.utc) if v.tzinfo is None else v
    return v


def _to_utc_naive(v):
    if isinstance(v, datetime) and v.tzinfo is not None:
        return v.astimezone(timezone.utc).replace(tzinfo=None)
    return v


def append_row(path: str, record: dict, schema: pa.Schema) -> None:
    """Append one row as a fresh parquet part file — no Spark job.
    Filename follows the part-file convention (no leading ``_``/``.``,
    ``.parquet`` suffix) so Spark's directory listing picks it up."""
    os.makedirs(path, exist_ok=True)
    row = {
        name: _to_utc_aware(record.get(name))
        for name in schema.names
    }
    table = pa.Table.from_pylist([row], schema=schema)
    fname = f"part-meta-{uuid.uuid4().hex}.snappy.parquet"
    pq.write_table(table, os.path.join(path, fname), compression="snappy")


def read_rows(path: str) -> list[dict]:
    """All rows of a metadata table as dicts with naive-UTC datetimes
    (what Spark ``collect`` returns under the pinned-UTC session)."""
    if not os.path.exists(path):
        return []
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    rows: list[dict] = []
    for f in files:
        for r in pq.read_table(f).to_pylist():
            rows.append({k: _to_utc_naive(v) for k, v in r.items()})
    return rows


def latest_row(path: str, order_keys: tuple[str, ...] = ("updated_at", "id")) -> dict | None:
    """The freshest row by lexicographic ``order_keys`` — the driver-side
    equivalent of ``ORDER BY updated_at DESC, id DESC LIMIT 1``."""
    rows = read_rows(path)
    if not rows:
        return None
    return max(rows, key=lambda r: tuple(r[k] for k in order_keys))


def state_summary(path: str) -> tuple[datetime | None, int]:
    """(watermark of the freshest state row, max id) in one read."""
    rows = read_rows(path)
    if not rows:
        return None, 0
    top = max(rows, key=lambda r: (r["updated_at"], r["id"]))
    return top["last_fetched_date"], max(r["id"] for r in rows)


def compact(
    path: str,
    schema: pa.Schema,
    keep_last: int = 100,
    order_keys: tuple[str, ...] = ("updated_at", "id"),
) -> int:
    """Fold the one-part-file-per-run log down to a single part holding
    the freshest ``keep_last`` rows — the Delta-checkpoint move for this
    metadata layout. Without it a long-lived pipeline pays O(runs) file
    listings on every probe; with it the log is O(keep_last) forever.
    Crash-safe: the compacted part is written BEFORE the old parts are
    removed, and every intermediate state is a valid (superset) log.
    Returns the number of part files removed.
    """
    if not os.path.exists(path):
        return 0
    old_files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if len(old_files) <= 1:
        return 0
    rows = read_rows(path)
    rows.sort(key=lambda r: tuple(r[k] for k in order_keys))
    keep = rows[-keep_last:]
    aware = [
        {name: _to_utc_aware(r.get(name)) for name in schema.names} for r in keep
    ]
    table = pa.Table.from_pylist(aware, schema=schema)
    fname = f"part-meta-{uuid.uuid4().hex}.snappy.parquet"
    pq.write_table(table, os.path.join(path, fname), compression="snappy")
    for f in old_files:
        os.remove(f)
    return len(old_files)
