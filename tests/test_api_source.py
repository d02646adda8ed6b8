"""SpaceXApiSource against a local mock of the v4 REST API.

A stdlib ``http.server`` on loopback serves canned ``/launches``,
``/launches/latest`` and paginated ``/launches/query`` responses in the
API's REAL field naming (``id``/``name``/``payloads``/``launchpad`` —
the aliases the reference maps in src/models.py:13-24), so the
connector's request shaping and response parsing run for real without
network: the MongoDB-style ``$gte`` payload, ascending sort, the
pagination loop, the 50-page cap, and the empty-page guard
(reference api.py:80-174).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from spacex_data_engineering_pipeline_spark.sources.launches import SpaceXApiSource

N_LAUNCHES = 250  # 3 pages at PAGE_SIZE=100


def _launch(i: int) -> dict:
    return {
        "id": f"launch_{i:04d}",
        "name": f"Mission {i}",
        "date_utc": f"2022-01-{i % 28 + 1:02d}T{i % 24:02d}:00:00.000Z",
        "success": i % 3 != 0,
        "payloads": [f"pl_{i}a", f"pl_{i}b"],
        "launchpad": f"pad_{i % 4}",
        "static_fire_date_utc": None if i % 5 == 0 else f"2021-12-{i % 28 + 1:02d}T00:00:00.000Z",
        "rocket": "rocket_x",  # extra API fields must be ignored
    }


LAUNCHES = [_launch(i) for i in range(N_LAUNCHES)]


class _MockApi(BaseHTTPRequestHandler):
    post_payloads: list[dict] = []
    endless_pages = False  # always claim hasNextPage (50-page-cap mode)

    def log_message(self, *args):  # silence per-request stderr noise
        pass

    def _send(self, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/launches":
            self._send(LAUNCHES)
        elif self.path == "/launches/latest":
            self._send(LAUNCHES[-1])
        else:
            self.send_error(404)

    def do_POST(self):
        if self.path != "/launches/query":
            self.send_error(404)
            return
        payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _MockApi.post_payloads.append(payload)
        page = payload["options"]["page"]
        limit = payload["options"]["limit"]
        if _MockApi.endless_pages:
            self._send(
                {"docs": LAUNCHES[:limit], "hasNextPage": True, "page": page}
            )
            return
        gte = payload["query"]["date_utc"]["$gte"]
        matching = sorted(
            (l for l in LAUNCHES if l["date_utc"].replace("Z", "+00:00") >= gte),
            key=lambda l: l["date_utc"],
        )
        docs = matching[(page - 1) * limit : page * limit]
        self._send(
            {
                "docs": docs,
                "totalDocs": len(matching),
                "page": page,
                "hasNextPage": page * limit < len(matching),
            }
        )


@pytest.fixture(scope="module")
def mock_api():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockApi)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_fetch_all_maps_api_aliases(spark, mock_api):
    src = SpaceXApiSource(spark, base_url=mock_api)
    rows = {r.launch_id: r for r in src.fetch_all().collect()}
    assert len(rows) == N_LAUNCHES
    r7 = rows["launch_0007"]
    # alias mapping id/name/payloads/launchpad → canonical raw columns
    assert r7.mission_name == "Mission 7"
    assert r7.payload_ids == ["pl_7a", "pl_7b"]
    assert r7.launchpad_id == "pad_3"
    assert r7.date_utc.endswith("Z")  # raw ISO strings pass through


def test_fetch_latest_single_row(spark, mock_api):
    src = SpaceXApiSource(spark, base_url=mock_api)
    got = src.fetch_latest().collect()
    assert len(got) == 1 and got[0].launch_id == f"launch_{N_LAUNCHES - 1:04d}"


def test_fetch_after_paginates_and_shapes_query(spark, mock_api):
    _MockApi.post_payloads.clear()
    _MockApi.endless_pages = False
    src = SpaceXApiSource(spark, base_url=mock_api)
    wm = datetime(2022, 1, 1, tzinfo=timezone.utc)
    got = src.fetch_after(wm).collect()
    assert len(got) == N_LAUNCHES  # every launch is past the watermark
    assert len({r.launch_id for r in got}) == N_LAUNCHES  # no page overlap
    # 250 matches at limit 100 → exactly pages 1, 2, 3
    assert [p["options"]["page"] for p in _MockApi.post_payloads] == [1, 2, 3]
    for p in _MockApi.post_payloads:
        assert p["query"]["date_utc"]["$gte"] == wm.isoformat()
        assert p["options"]["sort"] == {"date_utc": 1}
        assert p["options"]["limit"] == SpaceXApiSource.PAGE_SIZE


def test_fetch_after_empty_result_keeps_schema(spark, mock_api):
    _MockApi.post_payloads.clear()
    src = SpaceXApiSource(spark, base_url=mock_api)
    df = src.fetch_after(datetime(2099, 1, 1, tzinfo=timezone.utc))
    assert df.count() == 0
    assert df.columns == [
        "launch_id", "mission_name", "date_utc", "success",
        "payload_ids", "launchpad_id", "static_fire_date_utc",
    ]
    assert len(_MockApi.post_payloads) == 1  # empty page stops the loop


def test_fetch_after_respects_page_cap(spark, mock_api):
    _MockApi.post_payloads.clear()
    _MockApi.endless_pages = True
    try:
        src = SpaceXApiSource(spark, base_url=mock_api)
        got = src.fetch_after(datetime(2022, 1, 1, tzinfo=timezone.utc))
        n = got.count()
    finally:
        _MockApi.endless_pages = False
    # a server that always claims another page must stop at MAX_PAGES
    assert len(_MockApi.post_payloads) == SpaceXApiSource.MAX_PAGES
    assert n == SpaceXApiSource.MAX_PAGES * SpaceXApiSource.PAGE_SIZE
