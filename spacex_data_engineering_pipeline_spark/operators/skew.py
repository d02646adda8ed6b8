"""Skew mitigation: key salting for joins and aggregations.

AQE's skew-join splitting (on by default in the engine session) handles
most skew at runtime by splitting oversized shuffle partitions. Salting
is the static fallback for the cases AQE can't fix — a single hot key
inside one shuffle block (high-cardinality aggregation state, or a
build-side that must replicate).

``salted_aggregate``: two-phase aggregation — phase 1 groups by
(key, salt) so a hot key's rows spread over ``n_salts`` reducers; phase
2 merges the partials per key. Works for any algebraic aggregate
(sum/count/min/max → re-aggregable partials).

``salted_join``: explodes the DIMENSION side ``n_salts``× and salts the
fact side's key randomly-but-deterministically (hash of a unique
column), so one hot fact key spreads across ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int, out_col: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts) derived from a
    unique column — reproducible across retries (rand() is not)."""
    return df.withColumn(out_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    unique_col: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 computes partials per (key, salt);
    phase 2 merges partials per key (count merges via sum).
    """
    mergers = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = with_salt(df, unique_col, n_salts)
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, mergers[fn])(out).alias(out)
            for out, (_col, fn) in aggs.items()
        ]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the dimension side ``n_salts``×,
    salt the fact side, join on (key, salt). The hot fact key's rows
    land on ``n_salts`` different reducers instead of one.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported:
    replicating the dim side would emit each UNMATCHED dim row
    ``n_salts`` times under right/full-outer semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — the "
            "replicated dim side duplicates unmatched rows under "
            "right/full-outer semantics"
        )
    salted_facts = with_salt(facts, fact_unique_col, n_salts)
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    # qualify via the dataframe objects: unqualified F.col would be
    # ambiguous whenever fact and dim share the key column name
    joined = salted_facts.join(
        replicated_dim,
        (salted_facts[fact_key] == replicated_dim[dim_key])
        & (salted_facts["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


def hot_key_salted_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_unique_col: str,
    n_salts: int = 16,
    hot_threshold: int | None = 100_000,
    how: str = "inner",
    hot_factor: float = 8.0,
) -> DataFrame:
    """Targeted skew mitigation: salt ONLY the hot keys.

    Blanket salting (:func:`salted_join`) replicates the whole dim
    side ``n_salts``× even though skew usually lives in a handful of
    keys — at 100 TB that's n_salts× the broadcast/shuffle bytes for
    the 99% of keys that never needed it. This variant:

    1. probes per-key fact counts (one column-pruned aggregation) and
       collects the keys above ``hot_threshold`` — by construction a
       SMALL set (at most |fact| / hot_threshold keys, e.g. ≤ 1000
       hot keys per 100M rows at the default), safe to broadcast;
    2. routes the fact side by membership: cold keys take the plain
       equi-join (AQE free to broadcast/sort-merge as usual), hot
       keys take the salted path with the dim slice replicated only
       for THOSE keys;
    3. unions the two results — semantically identical to the plain
       join for 'inner'/'left' (each fact row takes exactly one
       route; dim replication only ever meets its own salt).

    This is the explicit form of AQE's skew-join split, usable where
    AQE can't see the skew (e.g. first shuffle of a stage, or
    pre-aggregated inputs), and the action the
    ``customer_order_skew_profile`` diagnostic points at.
    """
    counts = facts.groupBy(fact_key).agg(F.count(F.lit(1)).alias("__n"))
    if hot_threshold is None:
        # adaptive: hot = keys holding > hot_factor x the MEAN per-key
        # count. A fixed absolute threshold silently degrades as the
        # corpus grows (at 10x data every key crossed it and the whole
        # join took the salted route — 8x dim replication for the 99%
        # that never needed it); the mean tracks the corpus, so only
        # the true tail salts at any SF. counts is persisted across the
        # mean probe and the hot-key collect so the fact table is
        # scanned ONCE for both actions (without the persist each
        # action would recompute the full groupBy).
        counts = counts.persist()
        try:
            mean_row = counts.agg(F.avg("__n").alias("m")).first()
            hot_threshold = int(float(mean_row["m"] or 0.0) * hot_factor) + 1
            hot = [
                r[fact_key]
                for r in counts.filter(F.col("__n") >= hot_threshold)
                .select(fact_key)
                .collect()
            ]
        finally:
            counts.unpersist()
    else:
        hot = [
            r[fact_key]
            for r in counts.filter(F.col("__n") >= hot_threshold)
            .select(fact_key)
            .collect()
        ]
    if not hot:
        return facts.join(dim, facts[fact_key] == dim[dim_key], how)
    # NULL keys: isin(hot) is NULL for a NULL key, so both filter(is_hot)
    # and filter(~is_hot) would drop the row — route NULLs to the cold
    # path explicitly so how='left' keeps them (with NULL dim columns),
    # matching the plain join.
    is_hot = F.coalesce(facts[fact_key].isin(hot), F.lit(False))
    cold_out = facts.filter(~is_hot).join(
        dim, facts[fact_key] == dim[dim_key], how
    )
    hot_out = salted_join(
        facts.filter(is_hot),
        dim.filter(dim[dim_key].isin(hot)),
        fact_key,
        dim_key,
        fact_unique_col,
        n_salts=n_salts,
        how=how,
    )
    return cold_out.unionByName(hot_out)
