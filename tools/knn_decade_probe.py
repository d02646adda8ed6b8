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

Round-11 additions (verdict r10 tasks 3+4):

4. the exact-grid wall is measured TWICE (two-run rule): run 1 builds
   and persists the graph, run 2 recomputes+writes to a throwaway dir
   on the warm JVM with nothing else on the host — run 2 is the clean
   anchor every speedup divides by (the round-9 742 s carried ≤15%
   admitted test-activity contamination),
5. a PLANTED-CLUSTER 200k corpus: the rotation-spread corpus above is
   deliberately direction-UNIFORM (recall ≈ probe mass by
   construction — the worst case); real embedding corpora cluster.
   Derivation stays testdata-only: the 2,000 sf0.1 embeddings are the
   cluster centers; member j of cluster i is
   normalize((1-eps)*c_i + eps*c_{(i+j+1) mod 2000}), eps=0.2,
   j in 0..99 — 100 distinct members per center (within-cluster cosine
   ~0.94, member-to-center ~0.97, cross-cluster ~ the near-orthogonal
   center cosines), 200k total. IVF recall at the SAME 6.25%/12.5%
   probe masses is graded against the clustered exact graph — the
   honest "recall at probe-mass on clustered data at decade scale"
   number SCALE_NOTES previously extrapolated from 20k.

Stage-RESUMABLE: each measurement persists into
``<dst>/probe_state.json`` (and the exact graph into parquet) as it
completes, so an interrupted run re-measures only what's missing.

Run: python tools/knn_decade_probe.py [sf1_dir] [dst] [sf01_dir]
     (defaults /tmp/sf1.0 /tmp/sf_decade /root/testdata/sf0.1; the
     clustered arm seeds from sf01_dir's embeddings — thread it on
     hosts that keep testdata elsewhere; corpus builds are idempotent)
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


CLUSTER_MEMBERS = 100
CLUSTER_EPS = 0.2


def build_clustered_corpus(spark, dst: str, sf01_dir: str) -> str:
    """200k planted-cluster corpus derived from ``sf01_dir``'s
    embeddings (2,000 unit vectors, dim 64, vec_id 0..1999 contiguous):
    center i spawns CLUSTER_MEMBERS members by mixing eps of partner
    c_{(i+j+1) mod 2000} into it and re-normalizing. vec_id encodes the
    planted cluster as vec_id // CLUSTER_MEMBERS — diagnostics only;
    the operators never see it.
    """
    out = os.path.join(dst, "embeddings_clustered.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(dst, exist_ok=True)
    base = (
        spark.read.parquet(os.path.join(sf01_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("c"))
    )
    n_centers = base.count()
    exploded = (
        base.withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.lit(CLUSTER_MEMBERS - 1)))
        )
        .withColumn(
            "pi", (F.col("vec_id") + F.col("j") + 1) % F.lit(n_centers)
        )
    )
    partners = base.select(
        F.col("vec_id").alias("pi"), F.col("c").alias("p")
    )
    mixed = F.zip_with(
        F.col("c"),
        F.col("p"),
        lambda a, b: F.lit(1.0 - CLUSTER_EPS) * a + F.lit(CLUSTER_EPS) * b,
    )
    joined = exploded.join(F.broadcast(partners), "pi").withColumn(
        "m", mixed
    )
    norm = F.sqrt(
        F.aggregate(F.col("m"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    members = joined.select(
        (F.col("vec_id") * CLUSTER_MEMBERS + F.col("j")).alias("vec_id"),
        F.transform(F.col("m"), lambda x: x / norm).alias("embedding"),
    )
    tmp = out + "_tmp"
    members.repartition(32).write.mode("overwrite").parquet(tmp)
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
    sf01_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
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
    # two-run rule (verdict r10 task 4): re-measure the exact arm on the
    # warm JVM into a throwaway dir — this clean second run is the anchor
    # all speedups divide by (the r9 742 s anchor carried ≤15% admitted
    # concurrent-test contamination).
    if "exact_wall_run2" not in state:
        t0 = time.perf_counter()
        rerun = S.knn_graph(emb, "vec_id", "embedding", k=k, n_blocks=16)
        rerun.write.mode("overwrite").parquet(exact_path + "_rerun")
        state["exact_wall_run2"] = round(time.perf_counter() - t0, 1)
        import shutil

        shutil.rmtree(exact_path + "_rerun", ignore_errors=True)
        _save_state(dst, state)
    exact_anchor = state["exact_wall_run2"]
    print(
        json.dumps(
            {
                "exact_wall": state["exact_wall"],
                "exact_wall_run2": exact_anchor,
            }
        ),
        flush=True,
    )
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
            "speedup_vs_exact": round(exact_anchor / wall, 2),
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
                "speedup_vs_rebuild": round(exact_anchor / wall, 1),
            }
            _save_state(dst, state)
            print(json.dumps(state["upsert_loaded"]), flush=True)
        finally:
            import shutil

            shutil.rmtree(work, ignore_errors=True)

    # 4. planted-cluster corpus (verdict r10 task 3): IVF recall at the
    # SAME probe masses on data that actually clusters — where routing
    # should concentrate a query's true neighbors into few cells.
    cl_path = build_clustered_corpus(spark, dst, sf01_dir)
    cl = spark.read.parquet(cl_path).filter(F.col("embedding").isNotNull())
    cl_n = cl.count()
    cl_state = state.setdefault("clustered", {})
    cl_state.update(
        {"n_vectors": cl_n, "eps": CLUSTER_EPS, "members": CLUSTER_MEMBERS}
    )
    cl_exact_path = os.path.join(dst, "clustered_exact_graph.parquet")
    if "exact_wall" not in cl_state or not os.path.exists(cl_exact_path):
        t0 = time.perf_counter()
        cl_exact = S.knn_graph(cl, "vec_id", "embedding", k=k, n_blocks=16)
        cl_exact.write.mode("overwrite").parquet(cl_exact_path + "_tmp")
        cl_state["exact_wall"] = round(time.perf_counter() - t0, 1)
        if os.path.exists(cl_exact_path):
            import shutil

            shutil.rmtree(cl_exact_path)
        os.replace(cl_exact_path + "_tmp", cl_exact_path)
        _save_state(dst, state)
    cl_exact = spark.read.parquet(cl_exact_path)
    cl_edges = set()
    within = 0
    for r in cl_exact.toLocalIterator():
        cl_edges.add((r["vec_id"], r["neighbor"]))
        if r["vec_id"] // CLUSTER_MEMBERS == r["neighbor"] // CLUSTER_MEMBERS:
            within += 1
    cl_state["within_cluster_edge_frac"] = round(within / len(cl_edges), 4)
    print(
        json.dumps(
            {
                "clustered_exact_wall": cl_state["exact_wall"],
                "within_cluster_edge_frac": cl_state[
                    "within_cluster_edge_frac"
                ],
            }
        ),
        flush=True,
    )
    cl_done = {
        (r["n_clusters"], r["n_probe"]) for r in cl_state.get("ivf", [])
    }
    cl_state.setdefault("ivf", [])
    for n_probe in (28, 56):
        if (n_clusters, n_probe) in cl_done:
            continue
        t0 = time.perf_counter()
        ap = S.knn_graph_ivf(
            cl, "vec_id", "embedding", k=k,
            n_clusters=n_clusters, n_probe=n_probe,
        )
        hit = 0
        for r in ap.toLocalIterator():
            if (r["vec_id"], r["neighbor"]) in cl_edges:
                hit += 1
        wall = round(time.perf_counter() - t0, 1)
        rec = {
            "n_clusters": n_clusters,
            "n_probe": n_probe,
            "probe_frac": round(n_probe / n_clusters, 4),
            "wall": wall,
            "speedup_vs_exact": round(cl_state["exact_wall"] / wall, 2),
            "recall": round(hit / len(cl_edges), 4),
        }
        cl_state["ivf"].append(rec)
        _save_state(dst, state)
        print(json.dumps(rec), flush=True)

    print(json.dumps(state))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
