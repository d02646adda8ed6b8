"""Round-5 north-star operators: bigram-LM scoring, weight-proportional
sampling, fixed-point k-means assignment. Each test pins the EXACT
semantics against an independent pure-Python computation (not Spark
re-run through Spark), the same style as the MinHash/SimHash pins.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators import cluster, lm
from spacex_data_engineering_pipeline_spark.operators.sampling import (
    weight_proportional_sample,
)


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def _py_bigram_nll(corpus: dict[int, str]) -> dict[int, tuple[int, float]]:
    """Independent add-one bigram LM: per-doc (n_bigrams, avg_nll)."""
    toks = {d: t.split() for d, t in corpus.items()}
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(c1)
    out = {}
    for d, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        nll = [
            math.log(c1[a] + v) - math.log(c2.get((a, b), 0) + 1)
            for a, b in pairs
        ]
        out[d] = (len(pairs), round(sum(nll) / len(nll), 6))
    return out


def test_bigram_lm_exact_vs_python(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the cat sat",
        3: "dog",  # single token: no bigrams, must vanish
        4: "zx qq zx qq zx",  # repeated bigrams: multiplicity matters
        5: "   ",  # whitespace-only: no tokens at all
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in lm.score_docs_nll(docs, "doc_id", "text").collect()
    }
    assert got == _py_bigram_nll(corpus)


def test_bigram_lm_duplicate_doc_scores_lower(spark):
    """A document repeated 10× drags its own bigram probabilities up —
    the boilerplate-detection property the filter exists for."""
    rows = [(i, "copy paste copy paste copy") for i in range(10)]
    rows.append((99, "entirely novel sequence of rare words"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = {
        r["doc_id"]: r["avg_nll"]
        for r in lm.score_docs_nll(docs, "doc_id", "text").collect()
    }
    assert scores[0] == scores[5]  # identical docs score identically
    assert scores[99] > scores[0]  # novel text is higher-NLL


# ---------------------------------------------------------------------------
# weight-proportional sampling
# ---------------------------------------------------------------------------


def _py_coin(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


def test_weight_proportional_exact_and_invariant(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "w"])
    kept = {
        r["k"]
        for r in weight_proportional_sample(
            df, "k", "w", max_weight=100, rate_num=1, rate_den=2
        ).collect()
    }
    expect = {
        k
        for k, w in rows
        if _py_coin(str(k), "wsample") * 100 * 2 < w * (1 << 32) * 1
    }
    assert kept == expect and 0 < len(kept) < 400
    # partitioning-invariance: the defining contract
    kept2 = {
        r["k"]
        for r in weight_proportional_sample(
            df.repartition(13, "w"), "k", "w", 100, 1, 2
        ).collect()
    }
    assert kept2 == kept


def test_weight_proportional_monotone_in_weight_and_rate(spark):
    rows = [(i, w) for i in range(200) for w in (10, 100)]
    df = spark.createDataFrame(rows, ["k", "w"])
    # same key at higher weight is kept whenever the lower weight was
    low = {
        r["k"]
        for r in weight_proportional_sample(
            df.filter(F.col("w") == 10), "k", "w", 100
        ).collect()
    }
    high = {
        r["k"]
        for r in weight_proportional_sample(
            df.filter(F.col("w") == 100), "k", "w", 100
        ).collect()
    }
    assert low <= high
    # raising the rate only ADDS rows (monotone re-sampling, no churn)
    half = {
        r["k"]
        for r in weight_proportional_sample(
            df.filter(F.col("w") == 100), "k", "w", 100, 1, 2
        ).collect()
    }
    assert half <= high


def test_weight_proportional_validation():
    with pytest.raises(ValueError):
        weight_proportional_sample(None, "k", "w", 0)
    with pytest.raises(ValueError):
        weight_proportional_sample(None, "k", "w", 1 << 40, rate_den=1 << 30)
    # the WEIGHT side wraps too: max_weight * 2^32 * rate_num >= 2^62
    with pytest.raises(ValueError):
        weight_proportional_sample(None, "k", "w", 1 << 20, rate_num=1 << 12)


def test_weight_proportional_validate_weights_guard(spark):
    df = spark.createDataFrame([(1, 5), (2, 250)], ["k", "w"])
    # violating row (w=250 > max_weight=100) fails the job when asked
    with pytest.raises(Exception, match="weight outside"):
        weight_proportional_sample(
            df, "k", "w", max_weight=100, validate_weights=True
        ).collect()
    # clean data passes with the guard on, identical kept-set
    ok = spark.createDataFrame([(i, (i * 37) % 100 + 1) for i in range(50)], ["k", "w"])
    kept_g = {r["k"] for r in weight_proportional_sample(
        ok, "k", "w", 100, validate_weights=True).collect()}
    kept = {r["k"] for r in weight_proportional_sample(ok, "k", "w", 100).collect()}
    assert kept_g == kept


# ---------------------------------------------------------------------------
# k-means assignment
# ---------------------------------------------------------------------------


def _py_assign(vecs, cents):
    q = lambda v: [math.floor(x * cluster.QUANT) for x in v]
    out = {}
    for vid, v in vecs:
        qv = q(v)
        best = min(
            (sum((a - b) ** 2 for a, b in zip(qv, q(c))), i)
            for i, c in enumerate(cents)
        )
        out[vid] = (best[1], best[0])
    return out


def test_kmeans_assign_exact_and_tiebreak(spark):
    cents = [[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]]  # c2 duplicates c0
    vecs = [
        (1, [0.1, 0.1]),
        (2, [0.9, -0.2]),
        (3, [0.5, 0.0]),  # exactly between c0 and c1 pre-quantization
        (4, [-0.7, 0.3]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster"], r["qdist"])
        for r in cluster.kmeans_assign(df, "vec_id", "embedding", cents).collect()
    }
    assert got == _py_assign(vecs, cents)
    # duplicate centroid: every vector must pick the LOWER id, never 2
    assert all(c != 2 for c, _ in got.values())


def test_kmeans_assign_real_centroid_ids_and_nulls(spark):
    """cluster labels are the ACTUAL centroid ids (robust to gaps in
    the id space), ties break to the lowest ID even when centroids are
    passed unsorted, and NULL vectors are filtered per the vector-
    surface contract instead of crashing np.stack."""
    cents = [[1.0, 0.0], [0.0, 0.0], [0.0, 0.0]]  # ids 17, 5, 3: 5 dups 3
    ids = [17, 5, 3]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.1]),  # nearest the duplicated origin -> id 3, not 5
            (2, [0.9, 0.0]),  # nearest id 17
            (3, None),  # NULL vector: dropped, not a crash
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in cluster.kmeans_assign(
            df, "vec_id", "embedding", cents, centroid_ids=ids
        ).collect()
    }
    assert got == {1: 3, 2: 17}
    with pytest.raises(ValueError):
        cluster.kmeans_assign(df, "vec_id", "embedding", cents, centroid_ids=[1])


def test_expectations_quoted_name_survives(spark):
    from spacex_data_engineering_pipeline_spark.operators import expect as E

    df = spark.createDataFrame([(1,), (None,)], "`o'key` long")
    out = E.run_expectations(df, [E.completeness("`o'key`")]).collect()
    assert len(out) == 1
    assert out[0]["constraint"] == "completeness(`o'key`)"
    assert out[0]["metric"] == 0.5


def test_kmeans_update_sums_match_numpy(spark):
    import numpy as np

    rng = [(i, [((i * 7 + j * 13) % 19 - 9) / 10.0 for j in range(4)]) for i in range(60)]
    cents = [rng[0][1], rng[1][1], rng[2][1]]
    df = spark.createDataFrame(
        [(i, v) for i, v in rng], "vec_id long, embedding array<double>"
    )
    assigned = cluster.kmeans_assign(df, "vec_id", "embedding", cents)
    sums = {
        (r["cluster"], r["j"]): (r["qsum"], r["n"])
        for r in cluster.cluster_coordinate_sums(
            assigned, df, "vec_id", "embedding"
        ).collect()
    }
    # independent recompute
    py = _py_assign(rng, cents)
    expect: dict[tuple[int, int], list[int]] = {}
    for vid, v in rng:
        c = py[vid][0]
        for j, x in enumerate(v):
            qx = math.floor(x * cluster.QUANT)
            cur = expect.setdefault((c, j), [0, 0])
            cur[0] += qx
            cur[1] += 1
    assert sums == {k: tuple(v) for k, v in expect.items()}
    # the shuffle is model-sized: k*dim rows exactly
    assert len(sums) == len({c for c, _ in py.values()}) * 4


def _py_lloyd(vecs, cents_by_id, max_iters):
    """Pure-Python quantized Lloyd: floor-div update, empty clusters
    keep their centroid, stop at integer fixed point."""
    q = lambda v: [math.floor(x * cluster.QUANT) for x in v]
    qvecs = [(vid, q(v)) for vid, v in vecs]
    cents = {cid: q(c) for cid, c in cents_by_id.items()}
    iters = 0
    for _ in range(max_iters):
        assign = {}
        for vid, qv in qvecs:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(qv, cq)), cid)
                for cid, cq in sorted(cents.items())
            )
            assign[vid] = best[1]
        new = {cid: list(v) for cid, v in cents.items()}
        members: dict[int, list[list[int]]] = {}
        for vid, qv in qvecs:
            members.setdefault(assign[vid], []).append(qv)
        for cid, vs in members.items():
            new[cid] = [
                sum(col) // len(vs) for col in zip(*vs)
            ]
        iters += 1
        if new == cents:
            break
        cents = new
    final = {}
    for vid, qv in qvecs:
        best = min(
            (sum((a - b) ** 2 for a, b in zip(qv, cq)), cid)
            for cid, cq in sorted(cents.items())
        )
        final[vid] = (best[1], best[0])
    return final, cents, iters


def test_kmeans_fit_fixed_point_matches_python(spark):
    """kmeans_fit: the full Lloyd loop converges to the same integer
    fixed point as an independent pure-Python implementation — same
    final assignment, same centroids, same round count (early stop
    before max_iters on this well-separated set)."""
    vecs = [
        (i, [bx + dx / 10.0, by + dy / 10.0])
        for i, (bx, by, dx, dy) in enumerate(
            (bx, by, (i * 7) % 3 - 1, (i * 5) % 3 - 1)
            for i, (bx, by) in enumerate(
                [(0.0, 0.0)] * 6 + [(5.0, 5.0)] * 6 + [(-5.0, 5.0)] * 6
            )
        )
    ]
    # deliberately bad init: both seeds in the SAME true cluster
    init = {10: vecs[0][1], 20: vecs[1][1]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    got_df, got_cents, got_iters = cluster.kmeans_fit(
        df,
        "vec_id",
        "embedding",
        [init[10], init[20]],
        centroid_ids=[10, 20],
        max_iters=10,
    )
    got = {
        r["vec_id"]: (r["cluster"], r["qdist"]) for r in got_df.collect()
    }
    py_final, py_cents, py_iters = _py_lloyd(vecs, init, 10)
    assert got == py_final
    assert got_cents == py_cents
    assert got_iters == py_iters
    assert got_iters < 10  # genuinely converged, not capped


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------


def _py_bpe(corpus: list[str], n_merges: int):
    """Pure-Python Sennrich BPE reference: (merge table, final vocab)."""
    wf: dict[str, int] = {}
    for text in corpus:
        for w in text.lower().split():
            if w and all("a" <= c <= "z" for c in w):
                wf[w] = wf.get(w, 0) + 1
    sym = {w: list(w) for w in wf if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in sym.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wf[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, s in sym.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sym[w] = out
    return merges, sym


def test_bpe_train_matches_python_reference(spark):
    from spacex_data_engineering_pipeline_spark.operators import bpe

    corpus = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest",
        "Mixed-CASE and punct! are filtered 123",
        "aaa aaa aaab",  # overlapping-merge semantics: 'aaa' -> [aa, a]
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    merges, sym = bpe.train_bpe(docs, "text", n_merges=6)
    py_merges, py_sym = _py_bpe(corpus, 6)
    assert merges == py_merges
    got = {r["w"]: list(r["s"]) for r in sym.collect()}
    assert got == py_sym


def test_bpe_overlap_and_tiebreak():
    from spacex_data_engineering_pipeline_spark.operators.bpe import _apply_merge_py

    assert _apply_merge_py(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge_py(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _apply_merge_py(["x", "y", "z"], "y", "z") == ["x", "yz"]


def test_bpe_encode_matches_python_reference(spark):
    """encode_token_counts must equal per-word application of the
    Python Sennrich reference: the broadcast-join formulation (vocab
    carries fully-merged symbol counts) is an optimization, not a
    semantics change; 1-char words count as one token."""
    from spacex_data_engineering_pipeline_spark.operators import bpe

    corpus = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest a",
        "aaa aaa aaab a b",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    _, py_sym = _py_bpe(corpus, 6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.encode_token_counts(docs, "text", "doc_id", 6).collect()
    }
    for i, t in enumerate(corpus):
        ws = [w for w in t.lower().split() if w.isalpha() and w.isascii()]
        want = sum(len(py_sym[w]) if w in py_sym else 1 for w in ws)
        assert got[i] == (len(ws), want), f"doc {i}"


# ---------------------------------------------------------------------------
# declarative expectations (operators/expect.py)
# ---------------------------------------------------------------------------


def test_expectations_metrics_and_null_semantics(spark):
    from spacex_data_engineering_pipeline_spark.operators import expect as E

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, None), (4, "z", -1.0)],
        "id long, status string, v double",
    )
    out = {
        r["constraint"]: (r["metric"], r["passed"])
        for r in E.run_expectations(
            df,
            [
                E.completeness("status"),
                E.uniqueness("id"),
                E.in_range("v", 0.0, 10.0),
                E.accepted_values("status", ["a", "b"]),
                E.min_count(3),
            ],
        ).collect()
    }
    assert out["completeness(status)"] == (0.75, False)
    assert out["uniqueness(id)"] == (0.75, False)
    # NULL v is excluded from the range denominator: 1 of 3 in [0,10]... 5 and -1 and 50 -> 1/3
    assert out["in_range(v)"] == (round(1 / 3, 6), False)
    # NULL status excluded: a,b of a,b,z -> 2/3
    assert out["accepted_values(status)"] == (round(2 / 3, 6), False)
    assert out["min_count"] == (4.0, True)


def test_expectations_single_scan_and_ri(spark):
    from spacex_data_engineering_pipeline_spark.operators import expect as E

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    ri = E.referential_integrity(child, "k", parent, "p").collect()[0]
    # non-NULL child keys: 1,2,2,9 -> 3 of 4 matched
    assert (ri["constraint"], ri["metric"], ri["passed"]) == (
        "referential(k)",
        0.75,
        False,
    )
    # the row-level audit is ONE aggregation pass over ONE scan
    audit = E.run_expectations(
        child, [E.completeness("k"), E.uniqueness("k"), E.min_count(1)]
    )
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        E.run_expectations(child, [])


# ---------------------------------------------------------------------------
# Arrow cosine twin: bitwise-exact vs the HOF fold
# ---------------------------------------------------------------------------


def test_cosine_arrow_bitwise_equals_hof(spark):
    """cosine_arrow must produce the EXACT bits of the zip_with +
    aggregate fold (same left-to-right summation) — a last-ulp drift
    here could flip a ROUND(·, 6) oracle grade. 500 pseudo-random
    64-dim pairs plus zero-norm / NULL edges, compared with struct
    packing so -0.0 vs 0.0 or NaN sneaking through would fail too."""
    import struct

    from pyspark.sql import functions as F

    from spacex_data_engineering_pipeline_spark.functions.vectors import (
        cosine,
        cosine_arrow,
    )

    rows = []
    for i in range(500):
        a = [(((i * 131 + j * 17) % 997) - 498) / 499.0 for j in range(64)]
        b = [(((i * 257 + j * 29) % 991) - 495) / 496.0 for j in range(64)]
        rows.append((i, a, b))
    rows.append((9001, [0.0] * 64, [1.0] * 64))  # zero norm -> NULL
    rows.append((9002, None, [1.0] * 64))  # NULL input -> NULL
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    got = df.select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("hof"),
        cosine_arrow(F.col("a"), F.col("b")).alias("arrow"),
    ).collect()
    assert len(got) == 502
    for r in got:
        if r["hof"] is None or r["arrow"] is None:
            assert r["hof"] is None and r["arrow"] is None, r
        else:
            assert struct.pack("<d", r["hof"]) == struct.pack(
                "<d", r["arrow"]
            ), (r["id"], r["hof"].hex(), r["arrow"].hex())
