#!/usr/bin/env python
"""Mimic the driver: vanilla SparkSession (no engine configs), import
__spark_entry__, smoke entry(), then run queries() vs oracle_sql() via
DuckDB at sf0.01 with order-insensitive compare.

Also writes CORRECTNESS_local.json (same per-query record shape as the
driver's CORRECTNESS_r*.json: rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err) covering the FULL catalog — the driver's own
gate checks a frozen subset of keys, so this artifact is the
gate-fidelity (sf0.01) evidence for every query added since.
"""
import sys, os, json, math
from datetime import datetime, date
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import duckdb
from pyspark.sql import SparkSession

# deliberately vanilla — whatever the driver would build, possibly non-UTC tz
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-mimic")
    .config("spark.sql.session.timeZone", "Asia/Kathmandu")  # hostile tz probe
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
print("ENTRY rows:", len(rows), "schema ok:", bool(rows))

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal): return float(v)
    if isinstance(v, datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date): return v.isoformat()
    return v

def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try: return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError): return False
    return a == b

qs, osql = e.queries(), e.oracle_sql()
only = set(sys.argv[1:])  # optional key filter: spot-check touched queries
if only:
    missing = only - set(qs)
    assert not missing, f"unknown keys: {sorted(missing)}"
    qs = {k: v for k, v in qs.items() if k in only}
fails = []
records = {}
for name, fn in sorted(qs.items()):
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    records[name] = rec
    try:
        df = fn(spark, SF)
        s_cols = df.columns
        s_rows = [tuple(norm(v) for v in r) for r in df.collect()]
        rec["spark_rows"] = len(s_rows)
    except Exception as exc:
        rec["err"] = f"spark: {type(exc).__name__}: {str(exc)[:200]}"
        print(f"{name}: SPARK ERROR {rec['err']}"); fails.append(name); continue
    if name not in osql:
        rec["err"] = "no_oracle"
        print(f"{name}: rows-only, {len(s_rows)} rows"); continue
    try:
        res = con.execute(osql[name])
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(norm(v) for v in r) for r in res.fetchall()]
    except Exception as exc:
        rec["err"] = f"oracle: {type(exc).__name__}: {str(exc)[:200]}"
        print(f"{name}: ORACLE ERROR {rec['err']}"); fails.append(name); continue
    rec["oracle_rows"] = len(d_rows)
    rec["rows_match"] = len(s_rows) == len(d_rows)
    rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
    ok = rec["rows_match"] and rec["schema_match"]
    if ok:
        idx = [s_cols.index(c) for c in d_cols]
        s_sorted = sorted([tuple(r[i] for i in idx) for r in s_rows], key=lambda r: tuple((v is None, str(v)) for v in r))
        d_sorted = sorted(d_rows, key=lambda r: tuple((v is None, str(v)) for v in r))
        bad = [(sr, dr) for sr, dr in zip(s_sorted, d_sorted) if not all(eq(a, b) for a, b in zip(sr, dr))]
        ok = not bad
        if bad: print(f"  sample mismatch {name}: {bad[:2]}")
    rec["hash_match"] = bool(ok)
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(s_rows)} rows)")
    if not ok: fails.append(name)

if not only:  # a filtered spot-check must not clobber the full artifact
    out = os.path.join(REPO, "CORRECTNESS_local.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=2)
        f.write("\n")
    print(f"wrote {out} ({len(records)} queries)")
print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
