"""Decade-up (~200k vectors) crossover measurement for the vector tier
(verdict r8 task 1): every 100 TB claim was measured at sf1.0 = 20k
embeddings, where full-probe IVF ≈ exact grid — the regime where the
approximation and the maintenance math WIN was asserted, never shown.
This probe builds a 10× corpus (200k vectors, dim 64) and measures:

1. exact ``knn_graph`` (block grid) wall — the rebuild cost,
2. ``knn_graph_ivf`` at fixed probe fractions (6.25% / 12.5%) with
   recall graded against the exact graph — expect wall ≈ probe-mass ×
   exact once the corpus is big enough that routing overhead amortizes,
3. ``knn_graph_upsert`` folding a 0.1% re-vectored batch into a SAVED +
   LOADED base graph vs the full rebuild — the |affected|·N claim
   (operators/similarity.py:knn_graph_upsert docstring).

Corpus derivation (same policy as tools/sf1_gen.py — derive from driver
testdata, never synthesize distributions): 10 copies of the sf1.0
embeddings (themselves 10 rotated copies of sf0.1's 2,000). sf1.0 copy
j carries rotation j ∈ 0..9; a decade copy i must compose to a
transform DISTINCT for all 100 (j, i) combos or copies collide into
exact-cosine duplicates. With dim 64, plain rotation by 10·i wraps
(rot 64 ≡ rot 0 manufactures cos=1 twins); so copies i ≥ 5 NEGATE the
vector (orthogonal, norm-preserving) and rotate by 10·(i−5): total
transforms {rot r : r ∈ 0..49} ∪ {−rot r : r ∈ 0..49} — 100 distinct
directions per base vector, bucket occupancies grow 10× honestly.

Stage-RESUMABLE: each measurement persists into
``<dst>/probe_state.json`` (and the exact graph into parquet) as it
completes, so an interrupted run re-measures only what's missing.

Run: python tools/knn_decade_probe.py [sf1_dir] [dst]
     (defaults /tmp/sf1.0 /tmp/sf_decade; corpus build is idempotent)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators import similarity as S
from spacex_data_engineering_pipeline_spark.session import get_spark

COPIES = 10
ID_SHIFT = 100_000_000  # sf1.0 vec_ids reach ~9.0M; decade copies clear them


def build_corpus(spark, sf1_dir: str, dst: str) -> str:
    out = os.path.join(dst, "embeddings.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(dst, exist_ok=True)
    base = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
    parts = []
    for i in range(COPIES):
        rot = 10 * (i if i < 5 else i - 5)
        v = F.col("embedding").cast("array<double>")
        if rot:
            v = F.concat(F.slice(v, rot + 1, 4096), F.slice(v, 1, rot))
        if i >= 5:
            v = F.transform(v, lambda x: -x)
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * ID_SHIFT)).alias("vec_id"),
                v.alias("embedding"),
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    tmp = out + "_tmp"
    scaled.repartition(32).write.mode("overwrite").parquet(tmp)
    os.replace(tmp, out)
    return out


def _load_state(dst: str) -> dict:
    p = os.path.join(dst, "probe_state.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_state(dst: str, state: dict) -> None:
    p = os.path.join(dst, "probe_state.json")
    with open(p + ".tmp", "w") as f:
        json.dump(state, f, indent=2, sort_keys=True)
    os.replace(p + ".tmp", p)


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_decade"
    spark = get_spark(app_name="knn-decade")
    spark.sparkContext.setLogLevel("ERROR")
    path = build_corpus(spark, sf1_dir, dst)
    emb = spark.read.parquet(path).filter(F.col("embedding").isNotNull())
    n = emb.count()
    k = 5
    state = _load_state(dst)
    state.update({"n_vectors": n, "k": k, "dim": 64})

    # 1. exact grid — the rebuild cost the other arms are judged against
    exact_path = os.path.join(dst, "exact_graph.parquet")
    if "exact_wall" not in state or not os.path.exists(exact_path):
        t0 = time.perf_counter()
        exact = S.knn_graph(emb, "vec_id", "embedding", k=k, n_blocks=16)
        exact.write.mode("overwrite").parquet(exact_path + "_tmp")
        wall = round(time.perf_counter() - t0, 1)
        if os.path.exists(exact_path):
            import shutil

            shutil.rmtree(exact_path)
        os.replace(exact_path + "_tmp", exact_path)
        state["exact_wall"] = wall  # includes the parquet write (~N·k rows)
        _save_state(dst, state)
    print(json.dumps({"exact_wall": state["exact_wall"]}), flush=True)
    exact = spark.read.parquet(exact_path)
    ex_edges = set()
    for r in exact.toLocalIterator():
        ex_edges.add((r["vec_id"], r["neighbor"]))

    # 2. IVF at fixed probe fractions — nlist ~ sqrt(N) (FAISS guidance)
    n_clusters = 448
    done = {(r["n_clusters"], r["n_probe"]) for r in state.get("ivf", [])}
    state.setdefault("ivf", [])
    for n_probe in (28, 56):  # 6.25% and 12.5% probe mass
        if (n_clusters, n_probe) in done:
            continue
        t0 = time.perf_counter()
        ap = S.knn_graph_ivf(
            emb, "vec_id", "embedding", k=k,
            n_clusters=n_clusters, n_probe=n_probe,
        )
        hit = 0
        for r in ap.toLocalIterator():
            if (r["vec_id"], r["neighbor"]) in ex_edges:
                hit += 1
        wall = round(time.perf_counter() - t0, 1)
        rec = {
            "n_clusters": n_clusters,
            "n_probe": n_probe,
            "probe_frac": round(n_probe / n_clusters, 4),
            "wall": wall,
            "speedup_vs_exact": round(state["exact_wall"] / wall, 2),
            "recall": round(hit / len(ex_edges), 4),
        }
        state["ivf"].append(rec)
        _save_state(dst, state)
        print(json.dumps(rec), flush=True)

    # 3. upsert on a SAVED+LOADED graph vs rebuild: 0.1% of ids arrive
    # re-vectored (reversed arrays — same norms, new directions)
    if "upsert_loaded" not in state:
        work = tempfile.mkdtemp(prefix="decade_graph_")
        try:
            t0 = time.perf_counter()
            S.save_knn_graph(exact, work, "vec_id", n_buckets=64)
            state["save_wall"] = round(time.perf_counter() - t0, 1)
            upd_n = n // 1000
            updates = (
                emb.orderBy("vec_id").limit(upd_n)
                .select(
                    "vec_id",
                    F.reverse(F.col("embedding").cast("array<double>")).alias(
                        "embedding"
                    ),
                )
            )
            t0 = time.perf_counter()
            loaded = S.load_knn_graph(spark, work)
            upserted = S.knn_graph_upsert(
                emb, updates, "vec_id", "embedding", k=k, base_graph=loaded
            )
            upd_rows = upserted.count()
            wall = time.perf_counter() - t0
            state["upsert_loaded"] = {
                "n_updates": upd_n,
                "wall": round(wall, 1),
                "rows": upd_rows,
                "speedup_vs_rebuild": round(state["exact_wall"] / wall, 1),
            }
            _save_state(dst, state)
            print(json.dumps(state["upsert_loaded"]), flush=True)
        finally:
            import shutil

            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(state))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
