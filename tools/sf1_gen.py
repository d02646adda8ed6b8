"""Generate a deterministic sf1.0 dataset (10× sf0.1) under /tmp.

The driver ships sf0.001/0.01/0.1; the scale question the verdicts keep
asking — "which slopes hold at 10× the bench SF?" — needs an sf1.0.
This derives one from the driver's own sf0.1 parquet (never synthesizing
distributions from scratch): each fact table is replicated 10× with
copy-shifted keys, chosen so the REALISTIC densities survive:

- orders/lineitem/customer/part/supplier: keys shift by a span ≥ the
  key domain per copy — referential integrity holds within each copy,
  distinct-key cardinalities grow 10×, join fan-outs stay constant.
- nation/region stay fixed (TPC-H dims don't scale with SF).
- events: event_id/user_id shift — 10× events over the SAME one-month
  window (10× arrival rate, 10× concurrent users: the honest scale-up
  for watermark/state sizing), ts untouched.
- documents: doc_id shifts AND every token gains a per-copy suffix, so
  copy families share NO shingles: vocabulary grows with the corpus
  (as real corpora do) and near-dup density stays that of sf0.1 —
  replicating text verbatim would instead make every doc a 10-way
  exact duplicate and measure pair-output blowup, not operator scaling
  (the round-3 10× probe did exactly that, deliberately).
- embeddings: vec_id shifts, vectors rotate by the copy index — same
  norms, new directions, so LSH/IVF bucket occupancies grow ~10×
  without manufacturing 10-way exact-cosine duplicates.

Run: python tools/sf1_gen.py [dst]   (default /tmp/sf1.0; idempotent —
skips tables whose parquet already exists).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-copy key shifts, comfortably above each key's sf0.1 domain
SHIFTS = {
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

FIXED_DIMS = ("region", "nation")
FACTS = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _copy_select(df, table: str, i: int):
    cols = []
    for name in df.columns:
        c = F.col(name)
        if name in SHIFTS:
            c = (c + F.lit(i * SHIFTS[name])).alias(name)
        elif name == "c_name" and i > 0:
            # re-derive the name from the SHIFTED key: leaving names
            # untouched would make every c_name a 10-way verbatim
            # duplicate (the exact failure mode the docstring bans for
            # documents) — at sf1.0 that manufactured 26.9M edit pairs
            # (the all-copies cross product: 262500*100 + 15000*45),
            # measuring pair-output blowup, not operator scaling.
            c = F.format_string(
                "Customer#%09d",
                F.col("c_custkey") + F.lit(i * SHIFTS["c_custkey"]),
            ).alias(name)
        elif name == "s_name" and i > 0:
            c = F.format_string(
                "Supplier#%09d",
                F.col("s_suppkey") + F.lit(i * SHIFTS["s_suppkey"]),
            ).alias(name)
        elif table == "documents" and name == "text" and i > 0:
            c = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit(f"_{i}")),
                ),
                " ",
            ).alias("text")
        elif table == "documents" and name == "n_chars":
            # keep the length column truthful for the suffixed text
            continue  # re-derived below, after text is final
        elif table == "embeddings" and name == "embedding" and i > 0:
            n = F.size("embedding")
            c = F.concat(
                F.slice("embedding", i + 1, 4096),  # tail from rotation point
                F.slice("embedding", 1, i),
            ).alias("embedding")
        cols.append(c)
    out = df.select(*cols)
    if table == "documents":
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    return out


def generate(dst: str = "/tmp/sf1.0") -> None:
    spark = get_spark(app_name="sf1_gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for table in FIXED_DIMS + FACTS:
        out = os.path.join(dst, f"{table}.parquet")
        if os.path.exists(out):
            print(f"{table}: exists, skipped")
            continue
        t0 = time.perf_counter()
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        if table in FIXED_DIMS:
            scaled = df
        else:
            parts = [_copy_select(df, table, i) for i in range(COPIES)]
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        tmp = out + "_tmp"
        scaled.write.mode("overwrite").parquet(tmp)
        # match the driver's single-file-per-table layout? No — keep
        # multi-file: a 100 TB table is never one file, and the scan
        # paths must cope with many splits anyway.
        os.replace(tmp, out)
        n = spark.read.parquet(out).count()
        print(f"{table}: {n} rows in {time.perf_counter() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
