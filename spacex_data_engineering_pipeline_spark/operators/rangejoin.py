"""Bucketized range (interval-containment) join — match each left
point row to the right interval rows containing it, per key. Spark
plans a naive ``lo <= t AND t < hi`` join as a nested loop (or a
per-key cross product after the equi-part); this formulation turns it
into a plain hash equi-join.

Scheme: pick a bucket width; a point belongs to exactly ONE bucket
(``floor(epoch / w)``), an interval is exploded to every bucket it
overlaps (``sequence(floor(lo/w), floor((hi)/w))``). Equi-join on
(key, bucket) then re-check the exact bounds. Because the point has
one bucket and the interval lists each covered bucket once, every
qualifying (point, interval) pair meets exactly once — no dedupe.

Scale: right-side blow-up is ``span/width + 1`` rows per interval —
pick the width near the typical interval length so it stays O(1);
the join itself is a shuffle hash join on narrow (key, bucket) keys,
AQE-skew-splittable. This is the standard distributed interval-join
(IP-range lookup, session attribution, genomic overlap) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    point: str,
    lo: str,
    hi: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner interval join: left rows with timestamp ``point`` matched
    to right rows whose half-open interval ``[lo, hi)`` contains it,
    sharing the ``on`` key. Output: all left columns, then ``right``'s
    non-key columns. (Intervals may overlap; a point then matches each
    containing interval once.)

    Bucket indices derive from epoch seconds; for TIMESTAMP_NTZ inputs
    the session-timezone interpretation cancels out because both sides
    are bucketed by the same expression in the same session.
    """
    rcols = [c for c in right.columns if c not in on]

    def _bkt(col: str):
        return F.floor(F.unix_timestamp(F.col(col)) / F.lit(bucket_seconds))

    lt = left.withColumn("__bkt", _bkt(point))
    rt = right.withColumn(
        "__bkt", F.explode(F.sequence(_bkt(lo), _bkt(hi)))
    )
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on] + [
        F.col("l.__bkt") == F.col("r.__bkt"),
        F.col(f"l.{point}") >= F.col(f"r.{lo}"),
        F.col(f"l.{point}") < F.col(f"r.{hi}"),
    ]
    joined = lt.alias("l").join(rt.alias("r"), cond)
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in rcols],
    )
