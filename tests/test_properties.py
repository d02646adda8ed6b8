"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixtures — upsert idempotency/count accounting, Jaccard
bounds and symmetry, quality-score range, n-gram counts.

Strategy note: hypothesis drives the INPUT GENERATION; each example runs
through real Spark jobs, so examples are capped low (Spark job dispatch
is ~100ms) — the value is the adversarial shrinking, not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spacex_data_engineering_pipeline_spark.functions.text import (
    quality_score,
    token_count,
    word_ngrams,
)
from spacex_data_engineering_pipeline_spark.operators.upsert import merge_dedup

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

text_st = st.text(
    alphabet=st.sampled_from("abc def! 🙂\t\n"), min_size=0, max_size=60
)


@given(st.lists(text_st, min_size=1, max_size=6))
@SETTINGS
def test_text_function_invariants(texts):
    spark = _spark()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    rows = df.select(
        token_count(F.col("t")).alias("n"),
        quality_score(F.col("t")).alias("q"),
        F.size(word_ngrams(F.col("t"), 3)).alias("g3"),
    ).collect()
    for r, t in zip(rows, texts):
        n_py = len(t.split())
        assert r.n == n_py, f"token count mismatch for {t!r}"
        assert 0.0 <= r.q <= 1.0
        assert r.g3 == max(0, n_py - 2)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_upsert_merge_properties(rows):
    """merge_dedup: output has exactly one row per key; the survivor is
    the order_by-max; merging a batch with itself is idempotent."""
    spark = _spark()
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v, _x) in enumerate(rows)], "key long, ver long, uid long"
    )
    order = [F.col("ver").desc(), F.col("uid").desc()]
    merged = merge_dedup(None, df, "key", order)
    out = {r.key: (r.ver, r.uid) for r in merged.collect()}
    expected = {}
    for i, (k, v, _x) in enumerate(rows):
        if k not in expected or (v, i) > expected[k]:
            expected[k] = (v, i)
    assert out == expected
    # idempotency: merging the merged result with itself changes nothing
    again = {r.key: (r.ver, r.uid) for r in merge_dedup(merged, merged, "key", order).collect()}
    assert again == out


@given(
    st.lists(st.sampled_from("abcde"), min_size=3, max_size=12),
    st.lists(st.sampled_from("abcde"), min_size=3, max_size=12),
)
@SETTINGS
def test_jaccard_bounds_and_symmetry(words_a, words_b):
    from spacex_data_engineering_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    spark = _spark()
    df = spark.createDataFrame(
        [(1, " ".join(words_a), "blk"), (2, " ".join(words_b), "blk")],
        "doc_id long, text string, source string",
    )
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", "source", n=2, min_jaccard_micro=0).collect()
    assert len(pairs) <= 1
    if pairs:
        jm = pairs[0].jaccard_micro
        assert 0 <= jm <= 1_000_000
        if " ".join(words_a) == " ".join(words_b):
            assert jm == 1_000_000
        # ground truth in python
        ga = {" ".join(words_a[i : i + 2]) for i in range(len(words_a) - 1)}
        gb = {" ".join(words_b[i : i + 2]) for i in range(len(words_b) - 1)}
        truth = math.floor(len(ga & gb) * 1_000_000 / len(ga | gb))
        assert jm == truth


def _spark():
    from spacex_data_engineering_pipeline_spark.session import get_spark

    return get_spark(app_name="property-tests", shuffle_partitions=4)


@given(
    st.lists(
        st.tuples(
            st.integers(-(10**12), 10**12),  # sparse/negative/huge ids
            st.integers(0, 10**6),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([1, 3, 16]),
)
@SETTINGS
def test_global_offset_property(rows, n_parts):
    """The distributed prefix sum equals the Python running total for
    ANY unique id set — sparse, negative, 64-bit-range ids included
    (the bucket math must not lose precision or mis-order)."""
    from spacex_data_engineering_pipeline_spark.operators.pack import with_global_offset

    spark = _spark()
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.off
        for r in with_global_offset(df, "id", "v", out_col="off", n_partitions=n_parts).collect()
    }
    run = 0
    expected = {}
    for i, v in sorted(rows):
        expected[i] = run
        run += v
    assert got == expected


@given(st.integers(0, 313), st.sampled_from([2, 4, 7]))
@SETTINGS
def test_closed_form_ntile_matches_sql_ntile(n, k):
    """The quartile query's closed-form bucket assignment — q = n div k,
    r = n mod k, first r buckets take q+1 rows — must agree with SQL
    NTILE for every (n, k), remainder edge cases included (that is what
    lets the distributed-rank rewrite keep the NTILE oracle)."""
    q, r = divmod(n, k)
    head = r * (q + 1)
    # independent reference: materialize NTILE's bucket sizes directly
    # (first r buckets q+1 rows, rest q) and read assignments off it
    sizes = [q + 1] * r + [q] * (k - r)
    ref_assign = [b for b, s in enumerate(sizes, start=1) for _ in range(s)]
    assert len(ref_assign) == n
    for rank in range(1, n + 1):
        mine = (
            (rank - 1) // (q + 1) + 1
            if rank <= head
            else r + (rank - head - 1) // max(q, 1) + 1
        )
        assert mine == ref_assign[rank - 1]
        assert 1 <= mine <= min(k, max(n, 1))


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr", None]),  # few, large strata (+NULL group)
            st.one_of(                                  # order values, MAY tie or be NULL
                st.none(), st.integers(-(10**12), 10**12)
            ),
            st.integers(0, 10**9),                      # unique tiebreak source
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[2],
    ),
    st.sampled_from([1, 3, 16]),
)
@SETTINGS
def test_distributed_rank_property(rows, n_buckets):
    """with_distributed_rank equals a plain per-group row_number over
    (order, tiebreak) for ANY input — ties in the order column, sparse
    and negative 64-bit values, NULL order values (NULLS FIRST, like
    the Window it replaces), NULL group keys, empty groups, any bucket
    count."""
    from spacex_data_engineering_pipeline_spark.operators.pack import (
        with_distributed_rank,
    )

    spark = _spark()
    df = spark.createDataFrame(rows, "g string, val long, tb long")
    got = {
        r.tb: r.rnk
        for r in with_distributed_rank(
            df, "val", part_cols=["g"], tiebreak_cols=["tb"],
            out_col="rnk", n_buckets=n_buckets,
        ).collect()
    }
    expected = {}
    by_g: dict[str | None, list] = {}
    for g, val, tb in rows:
        by_g.setdefault(g, []).append((val, tb))
    for g, items in by_g.items():
        ordered = sorted(  # Spark default: ascending NULLS FIRST
            items, key=lambda t: (t[0] is not None, t[0] if t[0] is not None else 0, t[1])
        )
        for i, (val, tb) in enumerate(ordered):
            expected[tb] = i + 1
    assert got == expected


# pure-Python property: no Spark session, so examples are cheap
@settings(max_examples=200, deadline=None)
@given(
    steps=st.lists(st.integers(0, 30), min_size=1, max_size=50),
    gap=st.integers(1, 25),
    nb=st.integers(1, 5),
)
def test_session_update_fn_equals_gaps_and_islands(steps, gap, nb):
    """Feeding chronological contiguous batches through the stateful
    session update (with a final timeout flush) yields exactly the
    batch gaps-and-islands sessions — for every event pattern, gap
    horizon, and batch split, including equal timestamps straddling a
    batch boundary."""
    import itertools

    import pandas as pd

    from spacex_data_engineering_pipeline_spark.streaming.stateful import (
        _make_session_update,
    )

    ts = list(itertools.accumulate(steps))
    vals = [float(i % 7) for i in range(len(ts))]

    ref_sessions = []
    cur = [0]
    for i in range(1, len(ts)):
        if ts[i] - ts[i - 1] >= gap:
            ref_sessions.append(cur)
            cur = [i]
        else:
            cur.append(i)
    ref_sessions.append(cur)
    expected = {
        (ts[ix[0]], ts[ix[-1]], len(ix), float(sum(vals[i] for i in ix)))
        for ix in ref_sessions
    }

    class StubState:
        hasTimedOut = False
        _t = None

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

        def setTimeoutTimestamp(self, ms):
            pass

        def remove(self):
            self._t = None

    fn = _make_session_update(gap)
    state = StubState()
    frames = []
    n = len(ts)
    bounds = [round(j * n / nb) for j in range(nb + 1)]
    for j in range(nb):
        rows = range(bounds[j], bounds[j + 1])
        if not len(rows):
            continue
        pdf = pd.DataFrame(
            {"ts_us": [ts[i] for i in rows], "value_micros": [vals[i] for i in rows]}
        )
        frames += list(fn((1,), [pdf], state))
    if state.exists:  # the watermark would eventually fire the timeout
        state.hasTimedOut = True
        frames += list(fn((1,), [], state))
        assert not state.exists, "timeout emission must REMOVE state"

    got = {
        (r.session_start_us, r.session_end_us, r.n_events, r.total_value_micros)
        for f in frames
        for r in f.itertuples()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1000.0,
                max_value=1000.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=5,
    )
)
@SETTINGS
def test_sq8_quantizer_invariants(vecs):
    """SQ8 invariants for ANY float32 vector: codes bounded in
    [-127, 127] (never -128), per-dimension reconstruction error
    ≤ scale/254 + ulp slack (half-up rounding's worst case), zero
    vectors quantize to all-zero codes with scale 0, and the code of
    the max-|x| dimension saturates to ±127."""
    from spacex_data_engineering_pipeline_spark.functions.vectors import (
        sq8_codes,
    )

    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<double>",
    )
    amax, codes = sq8_codes(F.col("v"))
    rows = df.select("id", amax.alias("s"), codes.alias("c")).collect()
    for r, v in zip(sorted(rows, key=lambda r: r.id), vecs):
        v = [float(x) for x in v]
        s = max(abs(x) for x in v)
        assert math.isclose(r.s, s, rel_tol=0, abs_tol=0), "scale is max|x|"
        assert all(-127 <= c <= 127 for c in r.c), "codes bounded"
        if s == 0:
            assert all(c == 0 for c in r.c), "zero vector → zero codes"
            continue
        for x, c in zip(v, r.c):
            recon = c * s / 127.0
            assert abs(x - recon) <= s / 254.0 + 1e-9 * s, (
                f"recon error bound violated: x={x} c={c} s={s}"
            )
        sat = [c for x, c in zip(v, r.c) if abs(x) == s]
        assert any(abs(c) == 127 for c in sat), "max dimension saturates"
