"""Similarity search over embedding columns (SURVEY §2.11).

- ``cosine_scores`` / ``brute_force_topk`` — exact cosine against one
  query vector: a single narrow map stage (no shuffle), the correctness
  baseline and perfectly adequate when queries are few.
- ``rp_lsh_buckets`` / ``ann_topk`` — random-hyperplane LSH: vectors
  bucketed by sign pattern; search touches only the query's bucket
  (plus optional multi-probe neighbors). The 100 TB path: bucketing is
  a narrow map + one equi-join instead of an all-pairs scan.

Hyperplanes come from a seeded generator so results are deterministic.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.functions.vectors import cosine, dot


def cosine_scores(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], decimals: int = 6
) -> DataFrame:
    """Cosine of every row's vector vs a literal query vector, rounded
    to ``decimals`` so ranking ties are well-defined across engines.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), decimals).alias("cos_sim"),
    )


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by (rounded cosine desc, id asc) — TakeOrderedAndProject,
    per-partition heaps, k-row driver merge; no global sort.
    """
    scored = cosine_scores(df, id_col, vec_col, query_vec)
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """Bucket id = bit-packed signs of <v, plane_i> — a narrow map stage.

    At 100 TB the bucketed table is written partitioned by ``bucket`` so
    an ANN query prunes to one partition at scan time.
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(F.col(vec_col), p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    Recall/cost trade-off is ``n_planes`` (2^planes buckets). Exactness
    is verified in tests against ``brute_force_topk`` within the bucket.
    """
    planes = random_hyperplanes(len(query_vec), n_planes, seed)
    bucketed = rp_lsh_buckets(df, id_col, vec_col, planes)
    qsig = 0
    for i, plane in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if s >= 0:
            qsig |= 1 << i
    in_bucket = bucketed.filter(F.col("bucket") == qsig)
    return brute_force_topk(in_bucket, id_col, vec_col, query_vec, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    bucketing, then EXACT cosine verification within buckets.

    Plan shape (mirrors the MinHash text pipeline):
    1. bucket signature — narrow map (dot with ``n_planes`` literals);
    2. self-join on the bucket id — only near-parallel vectors collide
       (for cos ≥ 0.95 the per-plane collision probability is
       1 - θ/π ≈ 0.90, so 8 planes keep ~0.43 of true pairs per table;
       run multiple seeds and union for higher recall);
    3. exact cosine on candidates, threshold filter — no false
       positives survive.

    At 100 TB: write the bucketed table partitioned by ``bucket``; the
    self-join becomes per-partition-local. Brute-force verification is
    bounded by the largest bucket (planes count tunes that).
    """
    if dim is None:
        probe = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if probe is None:  # empty input (or all-NULL vectors): no pairs
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos_sim double"
            )
        dim = len(probe[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    # persist, not lazy localCheckpoint: the checkpoint's separate job
    # races SQL-metric accumulator cleanup (noisy DAGScheduler errors);
    # persist materializes inside the consuming action.
    bucketed = rp_lsh_buckets(df, id_col, vec_col, planes).persist()

    bl, br = bucketed.alias("l"), bucketed.alias("r")
    cand = bl.join(
        br,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"l.{vec_col}").alias("vec_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col(f"r.{vec_col}").alias("vec_b"),
    )
    return (
        cand.withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos_sim") >= min_cosine)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    seed: int = 42,
):
    """IVF (inverted-file) coarse quantizer: k-means over the corpus;
    every vector is assigned to its nearest centroid's posting list.

    Returns (assigned_df with a ``cluster`` column, centroids as a list
    of (cluster_id, center) pairs). At 100 TB the assigned table is
    written partitioned by ``cluster`` so a probe reads only the probed
    partitions — this is the classic FAISS-IVF layout expressed as a
    Spark table layout.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feats = df.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("__features")
    )
    # coarse quantization needs rough centroids, not convergence — cap
    # iterations (a FAISS-style IVF trains on a sample for the same reason)
    km = KMeans(
        k=n_clusters, seed=seed, maxIter=8,
        featuresCol="__features", predictionCol="cluster",
    )
    model = km.fit(feats)
    assigned = model.transform(feats).drop("__features")
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN search: score only the ``n_probes`` clusters whose
    centroids are nearest the query (by cosine) — the recall/cost dial
    is probes/clusters. Exact cosine inside the probed lists, so
    results are a subset of brute-force ranking (asserted in tests).
    """
    assigned, centroids = ivf_index(df, id_col, vec_col, n_clusters, seed)

    def _cos(a: list[float], b: list[float]) -> float:
        dot_ = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot_ / (na * nb) if na > 0 and nb > 0 else -1.0

    probe_ids = [
        cid
        for cid, _c in sorted(
            centroids, key=lambda ic: _cos(query_vec, ic[1]), reverse=True
        )[:n_probes]
    ]
    probed = assigned.filter(F.col("cluster").isin(probe_ids)).drop("cluster")
    return brute_force_topk(probed, id_col, vec_col, query_vec, k)
