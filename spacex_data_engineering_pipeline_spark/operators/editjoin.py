"""Edit-distance similarity self-join (PassJoin-style segment index).

Finds all pairs of strings within Levenshtein distance ``d`` WITHOUT
the all-pairs O(n²) verify that kills at scale. The candidate
generator uses the PassJoin partition scheme (Li, Deng, Feng — "PASS-
JOIN: a partition-based method for similarity joins", PVLDB 5(3)):

- Every string ``s`` (length L ≥ d+1) is split into ``d+1`` disjoint
  segments. If ``ed(s, t) ≤ d``, at most ``d`` edits touch ``s``, so
  by pigeonhole AT LEAST ONE segment is untouched and must appear in
  ``t`` verbatim, at a start position shifted by at most ``d``.
  Candidate recall is therefore EXACTLY 1 — no probabilistic misses,
  unlike MinHash/SimHash banding.
- Index side emits each segment keyed by (source length L, segment
  index i, segment text). Probe side emits, for every length
  L ∈ [len(t)−d, len(t)+d] and every segment slot, the substrings of
  ``t`` of the matching segment length at start positions within ±d
  of the canonical segment start. Join on the composite key yields
  the candidate pairs; one Levenshtein verify pass (JVM built-in)
  confirms.
- Strings shorter than ``d+1`` can't host d+1 non-empty segments;
  any partner of such a string has length ≤ 2d, so ALL strings of
  length ≤ 3d go through a tiny length-bucketed bucket join instead.
  Both routes may emit a pair; the union is deduplicated before
  verification.

Scale shape: the index/probe join shuffles on (L, i, segment-text) —
fixed-fanout per row ((d+1)·(2d+1)·(2d+1) probe rows, d is a small
constant), join matches are Σ|posting|² per distinct segment key
(same regime as the n-gram inverted-index joins), and verification is
``F.levenshtein`` — whole-stage-codegen, no Python. An all-pairs
formulation would shuffle n²; this shuffles Σ postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segment_bounds(d: int):
    """Closed-form PassJoin segment layout for d+1 segments of a
    length-L string: segment i has length base+1 for i < L mod (d+1)
    else base, starting at i*base + min(i, L mod (d+1))."""
    k = d + 1

    def seg_len(L, i):
        return (L / k).cast("int") + F.when(
            F.lit(i) < (L % k), F.lit(1)
        ).otherwise(F.lit(0))

    def seg_start(L, i):
        return (L / k).cast("int") * i + F.least(F.lit(i), (L % k))

    return seg_len, seg_start


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_d: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``str_col`` values are within
    Levenshtein distance ``max_d``; emits ``(id_a, id_b, edit_dist)``.

    Exact (recall 1, precision 1): segment pigeonhole guarantees every
    true pair becomes a candidate; the Levenshtein verify removes
    false candidates. NULL strings never pair (SQL join semantics).
    """
    if max_d < 1:
        raise ValueError("max_d must be >= 1")
    d = int(max_d)
    k = d + 1
    seg_len, seg_start = _segment_bounds(d)

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("len"),
    ).filter(F.col("s").isNotNull())

    long_side = base.filter(F.col("len") >= k)

    # --- index: d+1 segments per string --------------------------------
    idx_parts = []
    for i in range(k):
        L = F.col("len")
        idx_parts.append(
            long_side.select(
                F.col("id").alias("a_id"),
                F.col("s").alias("a_s"),
                L.alias("a_len"),
                F.lit(i).alias("seg_i"),
                F.substring(
                    F.col("s"), seg_start(L, i) + 1, seg_len(L, i)
                ).alias("seg"),
            )
        )
    index = idx_parts[0]
    for p in idx_parts[1:]:
        index = index.unionAll(p)

    # --- probe: substrings at canonical start ± d, for every candidate
    # source length within ± d of this string's own length ---------------
    probe_parts = []
    for i in range(k):
        for dl in range(-d, d + 1):
            for delta in range(-d, d + 1):
                M = F.col("len")
                L = M + dl  # candidate partner length
                sl = seg_len(L, i)
                st = seg_start(L, i) + delta
                valid = (
                    (L >= k)
                    & (sl > 0)
                    & (st >= 0)
                    & (st + sl <= M)
                )
                probe_parts.append(
                    base.filter(valid).select(
                        F.col("id").alias("b_id"),
                        F.col("s").alias("b_s"),
                        L.alias("a_len"),
                        F.lit(i).alias("seg_i"),
                        F.substring(F.col("s"), st + 1, sl).alias("seg"),
                    )
                )
    probe = probe_parts[0]
    for p in probe_parts[1:]:
        probe = probe.unionAll(p)

    seg_pairs = (
        index.join(probe, ["a_len", "seg_i", "seg"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "a_s", "b_id", "b_s")
    )

    # --- short-string route: every partner of a string shorter than
    # d+1 has length <= 2d, so the <= 3d bucket covers all such pairs --
    shorts = base.filter(F.col("len") <= 3 * d)
    sa = shorts.select(
        F.col("id").alias("a_id"),
        F.col("s").alias("a_s"),
        F.col("len").alias("la"),
    )
    sb = shorts.select(
        F.col("id").alias("b_id"),
        F.col("s").alias("b_s"),
        F.col("len").alias("lb"),
    )
    # equi-join on the partner length (fan-out 2d+1 per row) so the
    # plan is a hash join, not a nested loop — the length-window
    # predicate is folded into the key
    sa_fanned = sa.withColumn(
        "lb", F.explode(F.array(*[F.col("la") + F.lit(dl) for dl in range(-d, d + 1)]))
    )
    short_pairs = (
        sa_fanned.join(sb, "lb")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "a_s", "b_id", "b_s")
    )

    candidates = seg_pairs.unionAll(short_pairs).dropDuplicates(
        ["a_id", "b_id"]
    )
    return (
        candidates.withColumn(
            "edit_dist", F.levenshtein(F.col("a_s"), F.col("b_s"))
        )
        .filter(F.col("edit_dist") <= d)
        .select("a_id", "b_id", "edit_dist")
    )


def _chunked_self_pairs(
    variants: DataFrame,
    hot_threshold: int,
    n_chunks: int,
) -> DataFrame:
    """Candidate pairs (a_id, a_s, b_id, b_s) from a variant table
    ``(id, s, v)`` self-joined on ``v`` — with oversized postings
    split into a chunk grid so no single reducer owns a |posting|²
    cross.

    A variant key shared by p rows yields p² join rows IN ONE TASK
    under a plain self-join — at 100 TB one pathological posting (a
    boilerplate string, an empty-ish value) is a straggler no AQE
    split can fully rescue, because the hot key's build side is
    irreducible. Here postings with ≥ ``hot_threshold`` rows route
    through a triangular chunk grid instead: each row gets a
    deterministic chunk c = hash(id) mod g, the left role fans out to
    cells (c, j ≥ c), the right role to cells (i ≤ c, c), and the
    join key becomes (v, i, j) — every unordered pair meets in exactly
    the cell (min(cx,cy), max(cx,cy)), per-cell work is (p/g)², and
    the g(g+1)/2 cells spread over the cluster. Fan-out per hot row is
    ~g, paid only by hot postings. Cold postings take the plain
    self-join untouched. Same trick as operators/skew.py's hot-key
    split, adapted to a SELF-join's triangular output.
    """
    sizes = variants.groupBy("v").agg(F.count(F.lit(1)).alias("__p"))
    # by construction ≤ |variants| / hot_threshold keys survive —
    # bounded driver metadata, same class as skew.py's hot-key probe
    hot = [
        r["v"]
        for r in sizes.filter(F.col("__p") >= hot_threshold)
        .select("v")
        .collect()
    ]
    a_cols = [
        F.col("id").alias("a_id"),
        F.col("s").alias("a_s"),
        "v",
    ]
    b_cols = [
        F.col("id").alias("b_id"),
        F.col("s").alias("b_s"),
        "v",
    ]
    if not hot:
        a = variants.select(*a_cols)
        b = variants.select(*b_cols)
        return (
            a.join(b, "v")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "a_s", "b_id", "b_s")
        )
    is_hot = F.coalesce(F.col("v").isin(hot), F.lit(False))
    cold = variants.filter(~is_hot)
    cold_pairs = (
        cold.select(*a_cols)
        .join(cold.select(*b_cols), "v")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "a_s", "b_id", "b_s")
    )
    g = int(n_chunks)
    hotv = variants.filter(is_hot).withColumn(
        "__c", F.pmod(F.xxhash64(F.col("id")), F.lit(g)).cast("int")
    )
    # left role: row with chunk c covers cells (c, j) for j >= c
    left = hotv.select(
        *a_cols,
        F.col("__c").alias("__ci"),
        F.explode(
            F.sequence(F.col("__c"), F.lit(g - 1))
        ).alias("__cj"),
    )
    # right role: row with chunk c covers cells (i, c) for i <= c
    right = hotv.select(
        *b_cols,
        F.explode(
            F.sequence(F.lit(0), F.col("__c"))
        ).alias("__ci"),
        F.col("__c").alias("__cj"),
    )
    # a cross-chunk pair meets in exactly ONE orientation (left=the
    # smaller chunk), so a_id<b_id filtering would drop pairs whose id
    # order disagrees with the chunk order — canonicalize by id
    # instead (diagonal cells emit both orientations; the caller's
    # pair-dedup collapses them)
    swap = F.col("a_id") > F.col("b_id")
    hot_pairs = (
        left.join(right, ["v", "__ci", "__cj"])
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.when(swap, F.col("b_id")).otherwise(F.col("a_id")).alias("a_id"),
            F.when(swap, F.col("b_s")).otherwise(F.col("a_s")).alias("a_s"),
            F.when(swap, F.col("a_id")).otherwise(F.col("b_id")).alias("b_id"),
            F.when(swap, F.col("a_s")).otherwise(F.col("b_s")).alias("b_s"),
        )
    )
    return cold_pairs.unionAll(hot_pairs)


def deletion_neighborhood_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_d: int = 1,
    hot_posting_threshold: int = 10_000,
    n_chunks: int = 16,
) -> DataFrame:
    """Exact edit-distance self-join via the FastSS deletion
    neighborhood (Bocek/Hunt/Stiller, "Fast Similarity Search in
    Large Dictionaries", 2007): same output contract as
    :func:`edit_distance_join` — all pairs (id_a < id_b, edit_dist)
    within Levenshtein distance ``max_d``.

    Candidates join on the UP-TO-d-DELETIONS variants of each string:
    if ``ed(s, t) ≤ d``, deleting the edited positions from both sides
    of an optimal alignment (≤ d deletions each) yields a COMMON
    variant, so recall is exactly 1; one ``levenshtein`` verify pass
    restores precision.

    WHEN to prefer this over the segment index: keyspaces with long
    SHARED PREFIXES (ids, SKUs, URLs — e.g. every TPC-H customer name
    starts with ``Customer#``) degenerate PassJoin's prefix segment
    into one giant posting (a single-key Σ|posting|² cross: measured
    231 s vs 10 s at sf0.1 on customer names, 24×). A deletion variant keeps
    the DISCRIMINATING characters in the key, so posting lists stay
    O(alphabet) regardless of shared prefixes. The trade: each string
    emits O(L^d) variant keys, so FastSS wants short strings / small d
    and PassJoin wants long strings — both are exact; pick by shape.

    Postings with ≥ ``hot_posting_threshold`` rows (mass-duplicate
    strings, boilerplate values) are additionally split into an
    ``n_chunks``-way triangular grid (:func:`_chunked_self_pairs`) so
    no reducer owns a |posting|² cross alone — exactness unchanged.
    """
    if max_d < 1:
        raise ValueError("max_d must be >= 1")
    d = int(max_d)
    base = df.select(
        F.col(id_col).alias("id"), F.col(str_col).alias("s")
    ).filter(F.col("s").isNotNull())

    del1 = (
        "transform(sequence(1, length({v})), i -> "
        "concat(substring({v}, 1, i - 1), substring({v}, i + 1, length({v}))))"
    )
    # exact-j-deletion layers, unioned: layer 0 is the string itself
    layer = base.withColumn("v", F.col("s"))
    variants = layer
    for _ in range(d):
        layer = layer.select(
            "id", "s", F.explode(F.expr(del1.format(v="v"))).alias("v")
        )
        variants = variants.unionAll(layer)
    # materialize the variant table ONCE: the posting-size probe, the
    # cold self-join and the hot grid would each recompute the
    # explode-union lineage otherwise (the probe alone added ~50% at
    # sf0.1); the checkpoint is variant-count-sized and truncates the
    # plan for every consumer
    variants = variants.dropDuplicates(["id", "v"]).localCheckpoint()

    candidates = _chunked_self_pairs(
        variants, hot_posting_threshold, n_chunks
    ).dropDuplicates(["a_id", "b_id"])
    return (
        candidates.withColumn(
            "edit_dist", F.levenshtein(F.col("a_s"), F.col("b_s"))
        )
        .filter(F.col("edit_dist") <= d)
        .select("a_id", "b_id", "edit_dist")
    )
