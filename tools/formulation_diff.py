"""Two-formulation diff harness (round-5 lesson, promoted to a tool).

The round-5 twin-id generator collision was caught only by running TWO
independent exact implementations of the same pipeline at the largest
SF and diffing — neither the sf0.01 oracle gate nor pytest had ever
exercised the colliding ids. This tool makes that check repeatable:

For each blocked near-dup pipeline (sign-LSH near-dup, SemDeDup) it
builds the IDENTICAL candidate set (the shared blocking stage), then
verifies it two independent ways:

- **blocked verify** — the production path: ``grouped_allpairs_cosine``
  (applyInPandas; numpy ``np.cumsum`` strict left-to-right sums);
- **join verify** — the superseded formulation, kept alive HERE as the
  cross-check: a self-join on the block key with the JVM higher-order
  ``cosine`` fold (``functions/vectors.py``), a completely separate
  compute path (Catalyst codegen vs Arrow/numpy) pinned bitwise equal
  in pytest.

The survivor sets — (id_a, id_b, cos rounded to 6dp) — must be
IDENTICAL. Any diff is a bug in one formulation, a data-generator
artifact, or an exactness leak; all three are exactly what this
harness exists to surface, at a scale the per-round gates never reach.

Run: python tools/formulation_diff.py [sf_dir ...]
     (default: /tmp/sf1.0 if present, else /root/testdata/sf0.1)
Exit code 0 = all formulations agree at every SF given.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from spacex_data_engineering_pipeline_spark.functions.vectors import cosine
from spacex_data_engineering_pipeline_spark.operators import similarity as S
from spacex_data_engineering_pipeline_spark.session import get_spark

MIN_COSINE = 0.95


def join_verify(
    with_vec: DataFrame,
    group_cols: list[str],
    id_col: str,
    vec_col: str,
    min_cosine: float,
) -> DataFrame:
    """Self-join formulation: materialize candidate pairs carrying both
    vectors, evaluate the JVM HOF cosine per pair row. Deliberately the
    expensive shape — it exists to disagree with the blocked path if
    anything is wrong, not to be fast."""
    a = with_vec.select(
        *group_cols,
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = with_vec.select(
        *group_cols,
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    pairs = a.join(b, on=group_cols).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cos_sim", F.round(cosine(F.col("__va"), F.col("__vb")), 6)
        )
        .filter(F.col("cos_sim") >= min_cosine)
        .select("id_a", "id_b", "cos_sim")
        .dropDuplicates(["id_a", "id_b"])
    )


def blocked_verify(
    with_vec: DataFrame,
    group_cols: list[str],
    id_col: str,
    vec_col: str,
    min_cosine: float,
) -> DataFrame:
    survivors = S.grouped_allpairs_cosine(
        with_vec, group_cols, id_col, vec_col, min_cosine
    )
    return (
        survivors.dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", F.round(F.col("cos_raw"), 6))
        .filter(F.col("cos_sim") >= min_cosine)
        .select("id_a", "id_b", "cos_sim")
    )


def _collect_set(df: DataFrame) -> set[tuple]:
    return {(r["id_a"], r["id_b"], r["cos_sim"]) for r in df.collect()}


def _diff(name: str, sf_dir: str, with_vec: DataFrame, group_cols: list[str]) -> bool:
    with_vec = with_vec.persist()
    try:
        t0 = time.time()
        blocked = _collect_set(
            blocked_verify(with_vec, group_cols, "vec_id", "embedding", MIN_COSINE)
        )
        t1 = time.time()
        joined = _collect_set(
            join_verify(with_vec, group_cols, "vec_id", "embedding", MIN_COSINE)
        )
        t2 = time.time()
    finally:
        with_vec.unpersist()
    ok = blocked == joined
    print(
        f"{name} @ {sf_dir}: blocked={len(blocked)} pairs {t1-t0:.1f}s | "
        f"join={len(joined)} pairs {t2-t1:.1f}s | "
        f"{'IDENTICAL' if ok else 'DIFF'}"
    )
    if not ok:
        only_b = sorted(blocked - joined)[:10]
        only_j = sorted(joined - blocked)[:10]
        print(f"  only-blocked (first 10): {only_b}")
        print(f"  only-join    (first 10): {only_j}")
    return ok


def _diff_knn(sf_dir: str, emb: DataFrame) -> bool:
    """knn_graph (grid cells, BLAS prune + strict-sum recompute) must
    equal per-query ``brute_force_topk`` (self excluded) row for row —
    rank, neighbor id, and 6dp cosine — on a sample of 16 vectors from
    both ends of the id range."""
    lo = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(8).collect()]
    hi = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy(F.col("vec_id").desc()).limit(8).collect()
    ]
    sample = sorted(set(lo + hi))
    t0 = time.time()
    graph = {}
    rows = (
        S.knn_graph(emb, "vec_id", "embedding", k=5, n_blocks=8)
        .filter(F.col("vec_id").isin(sample))
        .collect()
    )
    for r in rows:
        graph.setdefault(r["vec_id"], []).append((r["rnk"], r["neighbor"], r["cos_sim"]))
    t1 = time.time()
    ok = True
    for qid in sample:
        vec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        brute = [
            (i + 1, r["vec_id"], r["cos_sim"])
            for i, r in enumerate(
                S.brute_force_topk(
                    emb.filter(F.col("vec_id") != qid), "vec_id", "embedding", vec, 5
                ).collect()
            )
        ]
        got = sorted(graph.get(qid, []))
        if got != brute:
            ok = False
            print(f"  knn mismatch for vec_id={qid}:")
            print(f"    graph: {got}")
            print(f"    brute: {brute}")
    t2 = time.time()
    print(
        f"knn_graph @ {sf_dir}: full graph + sample collect {t1-t0:.1f}s | "
        f"16-query brute force {t2-t1:.1f}s | "
        f"{'IDENTICAL' if ok else 'DIFF'}"
    )
    return ok


def _diff_phash(spark, sf_dir: str) -> bool:
    """Perceptual-hash banding vs brute force (round 9): the banded
    pipeline's hamming ≤ 3 pairs (4×16-bit pigeonhole ⇒ recall 1 BY
    THEOREM) must equal an exhaustive all-pairs XOR-popcount sweep over
    the hash table — a disjoint formulation (numpy bit tricks
    driver-side over N² pairs, ~1.25e9 popcounts at sf1.0's 50k docs)
    that exists to disagree if banding ever loses a bucket. Audio gets
    the same check at its pigeonhole radius (3 bands ⇒ hamming ≤ 2)."""
    import numpy as np

    from spacex_data_engineering_pipeline_spark.catalog import load_table
    from spacex_data_engineering_pipeline_spark.operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    ok = True
    for label, attach, bands_fn, pairs_fn, radius in (
        ("phash", M.attach_patterned_ppm, M.phash_bands,
         lambda m: M.phash_near_dup_pairs(m, max_hamming=3), 3),
        ("audio_fp", M.attach_patterned_wav, M.audio_fingerprint_bands,
         lambda m: M.audio_near_dup_pairs(m, max_hamming=2), 2),
    ):
        t0 = time.time()
        media = attach(docs, "doc_id", "n_chars", "text")
        sig_col = "phash" if label == "phash" else "afp"
        sig = bands_fn(media).filter(F.col(sig_col).isNotNull()).select(
            "media_id", sig_col
        ).collect()
        ids = np.array([r["media_id"] for r in sig], dtype=np.int64)
        hs = np.array(
            [r[sig_col] & ((1 << 64) - 1) for r in sig], dtype=np.uint64
        )
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in pairs_fn(media).collect()
        }
        t1 = time.time()
        popcnt8 = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.uint8
        )
        brute = {}
        chunk = 2048
        for lo in range(0, len(hs), chunk):
            x = hs[lo : lo + chunk, None] ^ hs[None, :]
            # byte-wise popcount via a 256-entry lookup over the raw bytes
            d = (
                popcnt8[x.view(np.uint8).reshape(x.shape[0], x.shape[1], 8)]
                .sum(axis=-1, dtype=np.int64)
            )
            for i in range(x.shape[0]):
                gi = lo + i
                for j in np.nonzero(d[i] <= radius)[0]:
                    if ids[gi] < ids[j]:
                        brute[(int(ids[gi]), int(ids[j]))] = int(d[i, j])
        t2 = time.time()
        same = banded == brute
        ok &= same
        print(
            f"{label} @ {sf_dir}: banded {len(banded)} pairs {t1-t0:.1f}s | "
            f"brute {len(brute)} pairs over {len(hs)}² {t2-t1:.1f}s | "
            f"{'IDENTICAL' if same else 'DIFF'}"
        )
        if not same:
            only_b = set(banded) - set(brute)
            only_x = set(brute) - set(banded)
            print(f"  banded-only: {sorted(only_b)[:5]}  brute-only: {sorted(only_x)[:5]}")
    return ok


def main(sf_dirs: list[str]) -> int:
    from spacex_data_engineering_pipeline_spark.catalog import load_table
    from spacex_data_engineering_pipeline_spark.plans.queries import (
        _semantic_dedup_blocked,
    )

    spark = get_spark(app_name="formulation_diff")
    all_ok = True
    for sf_dir in sf_dirs:
        # 1. sign-LSH near-dup: identical banded candidate stage
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
            .filter(F.col("embedding").isNotNull())
        )
        pert = emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + F.lit(100_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x),
            ).alias("embedding"),
        )
        aug = emb.unionByName(pert)
        banded = S.banded_signatures(
            aug, "vec_id", "embedding", n_planes=8,
            seeds=(42, 137, 9001, 271828), dim=64,
        )
        all_ok &= _diff("lsh_near_dup", sf_dir, banded, ["band", "bucket"])

        # 2. SemDeDup: identical cluster-blocked stage
        blocked = _semantic_dedup_blocked(spark, sf_dir, k=64)
        all_ok &= _diff("semantic_dedup", sf_dir, blocked, ["cluster"])

        # 3. kNN graph: the block-grid + matmul-prune production path vs
        # an independent per-query brute force (mapInPandas partial
        # top-k, a disjoint kernel) on a 16-row sample spanning the id
        # range — the full graph is computed, only the compare samples.
        all_ok &= _diff_knn(sf_dir, emb)

        # 4. pHash / audio-fingerprint banding vs exhaustive popcount
        all_ok &= _diff_phash(spark, sf_dir)
    print("RESULT:", "ALL IDENTICAL" if all_ok else "FORMULATIONS DISAGREE")
    return 0 if all_ok else 1


if __name__ == "__main__":
    dirs = sys.argv[1:]
    if not dirs:
        dirs = ["/tmp/sf1.0" if os.path.isdir("/tmp/sf1.0") else "/root/testdata/sf0.1"]
    raise SystemExit(main(dirs))
