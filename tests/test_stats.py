"""Unit tests for the statistics tier (operators/stats.py) and the
deterministic portable-hash sampling (operators/sampling.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.operators.sampling import (
    hash_bernoulli_sample,
    stratified_hash_sample,
)
from spacex_data_engineering_pipeline_spark.operators.stats import (
    group_trend,
    robust_outlier_stats,
    welch_t,
)


def test_group_trend_recovers_exact_line(spark):
    # y = 3x + 7 exactly, per group — slope/intercept must be exact, r2 == 1
    rows = [("g1", float(x), 3.0 * x + 7.0) for x in range(10)]
    rows += [("g2", float(x), -2.0 * x + 1.0) for x in range(5)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert out["g1"]["n_points"] == 10
    assert math.isclose(out["g1"]["slope"], 3.0, abs_tol=1e-9)
    assert math.isclose(out["g1"]["intercept"], 7.0, abs_tol=1e-9)
    assert math.isclose(out["g1"]["r2"], 1.0, abs_tol=1e-9)
    assert math.isclose(out["g2"]["slope"], -2.0, abs_tol=1e-9)


def test_welch_t_matches_hand_computation(spark):
    a = [10.0, 12.0, 14.0, 16.0]
    b = [20.0, 21.0, 19.0]
    rows = [("g", True, v) for v in a] + [("g", False, v) for v in b]
    df = spark.createDataFrame(rows, ["g", "promo", "v"])
    r = welch_t(df, ["g"], F.col("promo"), "v").collect()[0]
    n_a, n_b = len(a), len(b)
    m_a = sum(a) / n_a
    m_b = sum(b) / n_b
    v_a = sum((x - m_a) ** 2 for x in a) / (n_a - 1)
    v_b = sum((x - m_b) ** 2 for x in b) / (n_b - 1)
    se2 = v_a / n_a + v_b / n_b
    t = (m_a - m_b) / math.sqrt(se2)
    dfree = se2**2 / (
        (v_a / n_a) ** 2 / (n_a - 1) + (v_b / n_b) ** 2 / (n_b - 1)
    )
    assert r["n_a"] == n_a and r["n_b"] == n_b
    assert math.isclose(r["t_stat"], round(t, 4), abs_tol=1e-9)
    assert math.isclose(r["welch_df"], round(dfree, 2), abs_tol=1e-9)


def test_welch_t_degenerate_arm_yields_null(spark):
    df = spark.createDataFrame(
        [("g", True, 1.0), ("g", False, 2.0), ("g", False, 3.0)],
        ["g", "promo", "v"],
    )
    r = welch_t(df, ["g"], F.col("promo"), "v").collect()[0]
    assert r["t_stat"] is None and r["welch_df"] is None


def test_robust_outliers_known_values(spark):
    # values 1..9 plus an outlier 1000: median 5.5, MAD 2.5
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    r = robust_outlier_stats(df, ["g"], "v", k=6.0).collect()[0]
    assert r["n_rows"] == 10
    assert math.isclose(r["median_value"], 5.5, abs_tol=1e-9)
    assert math.isclose(r["mad_value"], 2.5, abs_tol=1e-9)
    # only 1000 deviates more than 6 * 2.5 = 15 from 5.5
    assert r["n_outliers"] == 1


def _py_coin(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


def test_hash_sample_matches_python_md5_and_is_partition_invariant(spark):
    keys = [f"k{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    rate = 0.3
    expected = {k for k in keys if _py_coin(k, "s1") < int(rate * (1 << 32))}
    got1 = {r["k"] for r in hash_bernoulli_sample(df, "k", rate, "s1").collect()}
    got2 = {
        r["k"]
        for r in hash_bernoulli_sample(
            df.repartition(7), "k", rate, "s1"
        ).collect()
    }
    assert got1 == expected
    assert got2 == expected  # invariant under repartitioning


def test_hash_sample_monotone_in_rate_and_salt_independent(spark):
    keys = [f"k{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    s10 = {r["k"] for r in hash_bernoulli_sample(df, "k", 0.1, "s").collect()}
    s30 = {r["k"] for r in hash_bernoulli_sample(df, "k", 0.3, "s").collect()}
    assert s10 <= s30  # raising the rate only adds keys
    assert 0.05 < len(s10) / len(keys) < 0.15
    other = {r["k"] for r in hash_bernoulli_sample(df, "k", 0.3, "t").collect()}
    # different salts give (statistically) independent draws
    overlap = len(s30 & other) / len(keys)
    assert 0.03 < overlap < 0.16  # ~0.09 expected


def test_stratified_rates_respected(spark):
    rows = [("en", f"e{i}") for i in range(1000)] + [
        ("fr", f"f{i}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["lang", "k"])
    out = stratified_hash_sample(
        df, "lang", "k", {"en": 0.1, "fr": 1.0}, default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("fr") == 200  # rate 1.0 keeps everything
    assert 50 < by_lang.get("en", 0) < 170


def test_hash_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    import pytest

    with pytest.raises(ValueError):
        hash_bernoulli_sample(df, "k", 1.5)


# ---------------------------------------------------------------------------
# edit-distance join (operators/editjoin.py)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_join_matches_bruteforce_with_indels(spark):
    # deterministic corpus with substitutions, insertions, deletions,
    # mixed lengths and short strings (exercises the short route)
    import random

    from spacex_data_engineering_pipeline_spark.operators.editjoin import (
        edit_distance_join,
    )

    rng = random.Random(7)
    alpha = "abc"
    words = set()
    while len(words) < 60:
        words.add("".join(rng.choice(alpha) for _ in range(rng.randint(0, 8))))
    words = sorted(words)
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, ["id", "s"])
    for d in (1, 2):
        got = {
            (r["a_id"], r["b_id"], r["edit_dist"])
            for r in edit_distance_join(df, "id", "s", max_d=d).collect()
        }
        want = {
            (i, j, _lev(words[i], words[j]))
            for i in range(len(words))
            for j in range(i + 1, len(words))
            if _lev(words[i], words[j]) <= d
        }
        assert got == want, f"d={d}: {len(got)} vs {len(want)}"


def test_edit_join_null_strings_never_pair(spark):
    from spacex_data_engineering_pipeline_spark.operators.editjoin import (
        edit_distance_join,
    )

    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], ["id", "s"]
    )
    got = {(r["a_id"], r["b_id"]) for r in edit_distance_join(df, "id", "s").collect()}
    assert got == {(1, 3)}


# ---------------------------------------------------------------------------
# CDC log replay (operators/scd.py apply_cdc_log)
# ---------------------------------------------------------------------------


def test_apply_cdc_log_inverts_snapshot_diff(spark):
    from spacex_data_engineering_pipeline_spark.operators.scd import (
        apply_cdc_log,
        snapshot_diff,
    )

    s1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    s2 = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    diff = snapshot_diff(s1, s2, ["k"])
    log = diff.select(
        "k",
        F.col("new_name").alias("name"),
        F.col("new_v").alias("v"),
        F.lit(1).alias("seq"),
        F.when(F.col("change_type") == "delete", "D").otherwise("U").alias("op"),
    )
    got = {tuple(r) for r in apply_cdc_log(s1, log, ["k"], "seq", "op").collect()}
    want = {tuple(r) for r in s2.collect()}
    assert got == want


def test_apply_cdc_log_sequence_precedence(spark):
    from spacex_data_engineering_pipeline_spark.operators.scd import apply_cdc_log

    base = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    log = spark.createDataFrame(
        [
            (1, 11.0, 1, "U"),
            (1, 0.0, 2, "D"),
            (1, 12.0, 3, "U"),  # re-insert after delete: latest seq wins
            (2, 5.0, 1, "U"),
            (2, 0.0, 2, "D"),  # ends deleted
        ],
        ["k", "v", "seq", "op"],
    )
    got = {tuple(r) for r in apply_cdc_log(base, log, ["k"], "seq", "op").collect()}
    assert got == {(1, 12.0)}


def test_apply_cdc_log_negative_seq_beats_base(spark):
    """Base rows carry sequence -inf (Long.MIN_VALUE + source rank 0),
    so a log op with a negative — even very negative — sequence still
    deterministically wins over the base snapshot."""
    from spacex_data_engineering_pipeline_spark.operators.scd import apply_cdc_log

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    log = spark.createDataFrame(
        [(1, 99.0, -5, "U"), (2, 0.0, -(2**63), "D")],
        "k int, v double, seq long, op string",
    )
    got = {tuple(r) for r in apply_cdc_log(base, log, ["k"], "seq", "op").collect()}
    assert got == {(1, 99.0)}


def test_apply_cdc_log_rejects_missing_columns(spark):
    import pytest

    from spacex_data_engineering_pipeline_spark.operators.scd import apply_cdc_log

    base = spark.createDataFrame([(1, 10.0)], ["k", "v"])
    bad = spark.createDataFrame([(1, 1, "U")], ["k", "seq", "op"])
    with pytest.raises(ValueError):
        apply_cdc_log(base, bad, ["k"], "seq", "op")


def test_fastss_join_matches_bruteforce_with_indels(spark):
    import random

    from spacex_data_engineering_pipeline_spark.operators.editjoin import (
        deletion_neighborhood_join,
    )

    rng = random.Random(11)
    words = set()
    while len(words) < 60:
        words.add("".join(rng.choice("abc") for _ in range(rng.randint(0, 8))))
    words = sorted(words)
    df = spark.createDataFrame(list(enumerate(words)), ["id", "s"])
    for d in (1, 2):
        got = {
            (r["a_id"], r["b_id"], r["edit_dist"])
            for r in deletion_neighborhood_join(df, "id", "s", max_d=d).collect()
        }
        want = {
            (i, j, _lev(words[i], words[j]))
            for i in range(len(words))
            for j in range(i + 1, len(words))
            if _lev(words[i], words[j]) <= d
        }
        assert got == want, f"d={d}: {len(got)} vs {len(want)}"


def test_fastss_shared_prefix_posting_bound(spark):
    # the motivating shape: identical long prefixes; every deletion
    # variant posting stays O(alphabet), unlike prefix segments
    from spacex_data_engineering_pipeline_spark.operators.editjoin import (
        deletion_neighborhood_join,
    )

    names = [f"Customer#{i:09d}" for i in range(300)]
    df = spark.createDataFrame(list(enumerate(names)), ["id", "s"])
    got = {
        (r["a_id"], r["b_id"])
        for r in deletion_neighborhood_join(df, "id", "s", max_d=1).collect()
    }
    want = {
        (i, j)
        for i in range(300)
        for j in range(i + 1, 300)
        if _lev(names[i], names[j]) <= 1
    }
    assert got == want


def test_fastss_hot_posting_chunk_grid_exact(spark):
    """Force the triangular chunk-grid path (hot_posting_threshold low
    enough that the mass-duplicate string's postings qualify) and
    assert the output is identical to the plain-self-join path on a
    skewed corpus: 80 copies of one boilerplate string + near
    neighbors + unrelated strings, ids shuffled so chunk order and id
    order disagree (the orientation-coverage regression trap)."""
    import random

    from spacex_data_engineering_pipeline_spark.operators.editjoin import (
        deletion_neighborhood_join,
    )

    rng = random.Random(7)
    strings = (
        ["boilerplate"] * 80
        + ["boilerplate", "boilerplat", "bo1lerplate"]
        + ["".join(rng.choice("xyz") for _ in range(6)) for _ in range(40)]
    )
    ids = list(range(len(strings)))
    rng.shuffle(ids)
    df = spark.createDataFrame(list(zip(ids, strings)), ["id", "s"])
    plain = {
        tuple(r)
        for r in deletion_neighborhood_join(
            df, "id", "s", max_d=1, hot_posting_threshold=10**9
        ).collect()
    }
    chunked = {
        tuple(r)
        for r in deletion_neighborhood_join(
            df, "id", "s", max_d=1, hot_posting_threshold=5, n_chunks=4
        ).collect()
    }
    assert chunked == plain
    assert len(plain) >= 80 * 79 // 2  # the duplicate clique is present


def test_weighted_median_hand_case(spark):
    from spacex_data_engineering_pipeline_spark.operators.stats import (
        weighted_median,
    )

    # values 1..4 with weights 1,1,1,10: total 13, half 6.5 — the
    # running weight first reaches 6.5 at value 4 (cum 13)
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 10.0)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert r["weighted_median"] == 4.0
    # uniform weights recover the (lower) median
    rows2 = [("h", float(v), 1.0) for v in range(1, 6)]
    df2 = spark.createDataFrame(rows2, ["g", "v", "w"])
    assert weighted_median(df2, ["g"], "v", "w").collect()[0][
        "weighted_median"
    ] == 3.0


def test_weighted_median_bucketed_matches_bruteforce(spark):
    import random

    from spacex_data_engineering_pipeline_spark.operators.stats import (
        weighted_median,
    )

    rng = random.Random(3)
    rows = []
    for g in ("a", "b"):
        for _ in range(500):
            rows.append((g, float(rng.randint(0, 10_000)), float(rng.randint(1, 50))))
    df = spark.createDataFrame(rows, ["g", "v", "w"]).repartition(13)
    got = {
        r["g"]: r["weighted_median"]
        for r in weighted_median(df, ["g"], "v", "w").collect()
    }

    def brute(g):
        items = sorted((v, w) for gg, v, w in rows if gg == g)
        total = sum(w for _, w in items)
        # lower-median with RANGE-frame tie semantics: ties share their
        # cumulative weight
        cum = 0.0
        i = 0
        while i < len(items):
            j = i
            block = 0.0
            while j < len(items) and items[j][0] == items[i][0]:
                block += items[j][1]
                j += 1
            cum += block
            if cum * 2 >= total:
                return items[i][0]
            i = j

    assert got == {"a": brute("a"), "b": brute("b")}


def test_apply_cdc_log_randomized_matches_simulation(spark):
    import random

    from spacex_data_engineering_pipeline_spark.operators.scd import apply_cdc_log

    rng = random.Random(23)
    for _ in range(3):
        base_rows = [(k, float(rng.randint(0, 99))) for k in range(30)]
        log_rows = []
        for seq in range(1, 60):
            k = rng.randint(0, 40)  # some ops target unseen keys
            op = rng.choice(["U", "U", "I", "D"])
            log_rows.append((k, float(rng.randint(100, 199)), seq, op))
        base = spark.createDataFrame(base_rows, ["k", "v"])
        log = spark.createDataFrame(log_rows, ["k", "v", "seq", "op"])
        got = {
            (r["k"], r["v"])
            for r in apply_cdc_log(base, log, ["k"], "seq", "op").collect()
        }
        state = dict(base_rows)
        for k, v, seq, op in sorted(log_rows, key=lambda r: r[2]):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v
        assert got == set(state.items())
