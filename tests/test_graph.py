"""Fixed-iteration integer PageRank (operators/graph.py) vs a
hand-rolled Python reference on a small symmetric graph."""

from __future__ import annotations


def _py_pagerank(edges, iterations, damping_pct=85, init=1_000_000):
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    r = {n: init for n in nodes}
    base = (100 - damping_pct) * init // 100
    for _ in range(iterations):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * damping_pct) // (deg[s] * 100)
        r = nxt
    return r


def _sym(pairs):
    return [(s, d) for a, b in pairs for s, d in ((a, b), (b, a))]


def test_pagerank_one_iteration_hand_values(spark):
    from spacex_data_engineering_pipeline_spark.operators.graph import pagerank_fixed

    edges = _sym([(1, 2), (2, 3), (1, 3), (3, 4)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micros"] for r in pagerank_fixed(df, 1).collect()}
    assert got == {1: 858333, 2: 858333, 3: 1_850_000, 4: 433333}


def test_pagerank_matches_python_reference(spark):
    from spacex_data_engineering_pipeline_spark.operators.graph import pagerank_fixed

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6)]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 4):
        got = {r["node"]: r["rank_micros"] for r in pagerank_fixed(df, k).collect()}
        assert got == _py_pagerank(edges, k)


def test_triangle_count_known_graph(spark):
    from spacex_data_engineering_pipeline_spark.operators.graph import (
        triangle_count,
    )

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (no new ones)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 7, 4)


def test_triangle_count_triangle_free(spark):
    from spacex_data_engineering_pipeline_spark.operators.graph import (
        triangle_count,
    )

    # star graph: no triangles
    df = spark.createDataFrame([(1, i) for i in range(2, 8)], ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == 0 and r["n_edges"] == 6 and r["n_nodes"] == 7


def test_connected_components_long_path_converges_logarithmically(spark):
    import warnings

    from spacex_data_engineering_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # a 600-node path: plain min-label propagation needs ~600 rounds;
    # with pointer jumping it must finish well inside max_iter=20
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(600)], ["a", "b"]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # max_iter warning would fail this
        labels = connected_components(edges, "a", "b", max_iter=20)
    rows = labels.collect()
    assert len(rows) == 601
    assert {r["component"] for r in rows} == {0}


def test_integer_pagerank_star_graph(spark):
    """Centrality sanity on a star: the hub (everyone links to it, it
    links back) must out-rank every leaf, leaves tie exactly (integer
    determinism — identical in-edge sets give identical rank units),
    and total rank stays within the budget (truncation only leaks
    mass, never creates it)."""
    from spacex_data_engineering_pipeline_spark.operators.graphrank import (
        RANK_SCALE,
        integer_pagerank,
    )

    hub, leaves = 0, list(range(1, 9))
    edges = [(hub, l) for l in leaves] + [(l, hub) for l in leaves]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["rank_q"] for r in
           integer_pagerank(e, "src", "dst", n_iter=5).collect()}
    assert set(out) == {hub, *leaves}
    assert all(out[hub] > out[l] for l in leaves)
    assert len({out[l] for l in leaves}) == 1  # exact leaf tie
    assert 0 < sum(out.values()) <= RANK_SCALE
    # pure function of the edge SET: layout invariance
    out2 = {r["node"]: r["rank_q"] for r in
            integer_pagerank(e.repartition(16), "src", "dst", n_iter=5)
            .collect()}
    assert out == out2


def test_approx_graph_chain_ordering_overlap(spark):
    """The production composition — IVF kNN graph → mutual-kNN →
    integer PageRank — at a REDUCED probe width must preserve the
    centrality ORDERING the exact chain produces: on clustered data
    (16 planted Gaussian clusters, the real-corpus shape) with
    n_probe=2 of n_clusters=16 (12.5% of pair space), the top-decile
    node sets of the two chains overlap ≥ 0.7. This is the verdict-r8
    ask: the 100 TB substrate is the approximate graph, so the signal
    consumers read (who is central) must survive the approximation,
    not just per-edge recall."""
    import numpy as np

    from spacex_data_engineering_pipeline_spark.operators import similarity as S
    from spacex_data_engineering_pipeline_spark.operators.graphrank import (
        integer_pagerank,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(16, 32)) * 5.0
    rows = []
    for i in range(800):
        c = i % 16
        rows.append((i, (centers[c] + rng.normal(size=32) * 0.3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def chain(graph_df):
        g = graph_df.select("vec_id", "neighbor").localCheckpoint(eager=True)
        a, b = g.alias("a"), g.alias("b")
        mutual = a.join(
            b,
            (F.col("a.vec_id") == F.col("b.neighbor"))
            & (F.col("a.neighbor") == F.col("b.vec_id")),
        ).select(F.col("a.vec_id").alias("src"), F.col("a.neighbor").alias("dst"))
        out = integer_pagerank(mutual, "src", "dst", n_iter=5).collect()
        ranked = sorted(out, key=lambda r: (-r["rank_q"], r["node"]))
        return [r["node"] for r in ranked]

    exact_order = chain(S.knn_graph(df, "vec_id", "embedding", k=5))
    approx_order = chain(
        S.knn_graph_ivf(df, "vec_id", "embedding", k=5, n_clusters=16, n_probe=2)
    )
    decile = max(1, len(exact_order) // 10)
    top_exact = set(exact_order[:decile])
    top_approx = set(approx_order[:decile])
    overlap = len(top_exact & top_approx) / decile
    assert overlap >= 0.7, f"top-decile ordering overlap {overlap:.2f} < 0.7"
