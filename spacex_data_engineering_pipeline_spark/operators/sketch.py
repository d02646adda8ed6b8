"""Sketch-accelerated EXACT heavy hitters.

The naive "terms above x% of all occurrences" plan shuffles the entire
vocabulary (groupBy term over every token) — at 100 TB that's a
shuffle keyed on billions of distinct terms to keep a handful of rows.
The scale discipline is the same as LSH dedup: a cheap one-pass SKETCH
proposes a small candidate set, an exact pass verifies it.

``freqItems`` (Spark's Karp–Papadimitriou–Shenker single-pass summary)
guarantees NO FALSE NEGATIVES for items above the support threshold, so
filtering the exact recount to the candidate list loses nothing — the
output is bit-identical to the brute-force plan (which is exactly what
the DuckDB oracle runs). The candidate set is ≤ 1/support items by
construction (driver-small); the exact pass is a broadcast `isin`
filter the scan absorbs, aggregating only candidate rows. The table is
scanned (never shuffled) thrice: count, sketch, verify — all map-side.

The CANDIDATE set can vary with partition order between runs; the
verified OUTPUT cannot (superset in, exact filter out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, col: str, min_share_micro: int, support: float | None = None
) -> DataFrame:
    """Rows of ``(col, cnt, share_micro)`` for every value of ``col``
    whose occurrence share is ≥ ``min_share_micro`` (parts per million)
    — EXACT results at sketch cost.

    ``support`` defaults to 90% of the share threshold: freqItems
    guarantees inclusion only for items strictly ABOVE support, so a
    margin keeps boundary-exact items in the candidate set.
    """
    share = min_share_micro / 1_000_000
    if support is None:
        support = max(share * 0.9, 1e-6)
    total = df.count()
    if total == 0:
        return (
            df.select(col)
            .limit(0)
            .withColumn("cnt", F.lit(0).cast("long"))
            .withColumn("share_micro", F.lit(0).cast("long"))
        )
    candidates = list(df.freqItems([col], support=support).first()[0])
    return (
        df.filter(F.col(col).isin(candidates))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        # integer-exact threshold: cnt/total ≥ share ⟺ cnt·1e6 ≥ total·micro
        # (explicit long literals: total·micro overflows INT32 beyond
        # ~2k-row corpora, and ANSI mode rightly throws instead of wrapping)
        .filter(
            F.col("cnt") * F.lit(1_000_000).cast("long")
            >= F.lit(total).cast("long") * F.lit(min_share_micro).cast("long")
        )
        .withColumn(
            "share_micro",
            F.floor((F.col("cnt") * F.lit(1_000_000)) / F.lit(total)).cast("long"),
        )
    )
