"""sf1.0 recall/wall measurement of the approximate kNN-graph arm
(verdict r7 task 1 'Done' criterion): exact grid vs knn_graph_ivf at
FAISS-guideline cluster counts, recall graded against the exact graph.

    python tools/knn_ivf_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.catalog import load_table
from spacex_data_engineering_pipeline_spark.operators import similarity as S
from spacex_data_engineering_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    spark = get_spark(app_name="knn-ivf-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    n = emb.count()
    k = 5
    t0 = time.perf_counter()
    exact = S.knn_graph(emb, "vec_id", "embedding", k=k, n_blocks=8)
    ex_edges = {
        (r["vec_id"], r["neighbor"]) for r in exact.toLocalIterator()
    }
    wall_exact = round(time.perf_counter() - t0, 2)
    out = {"sf_dir": sf_dir, "n_vectors": n, "k": k, "exact_wall": wall_exact,
           "ivf": []}
    n_clusters = 64  # ~√N·0.45 at 20k — FAISS nlist territory
    for n_probe in (4, 8, 16, n_clusters):
        t0 = time.perf_counter()
        ap = S.knn_graph_ivf(
            emb, "vec_id", "embedding", k=k,
            n_clusters=n_clusters, n_probe=n_probe,
        )
        edges = {(r["vec_id"], r["neighbor"]) for r in ap.toLocalIterator()}
        wall = round(time.perf_counter() - t0, 2)
        out["ivf"].append(
            {
                "n_clusters": n_clusters,
                "n_probe": n_probe,
                "wall": wall,
                "recall": round(len(edges & ex_edges) / len(ex_edges), 4),
            }
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
