"""As-of (temporal) join — for each left row, the latest right row with
``right_time <= left_time`` per key. Spark has no built-in; this is the
union+window formulation (pandas ``merge_asof`` / Flink temporal-join
semantics), the standard event-enrichment primitive a training-data
pipeline needs (attribute a purchase to the preceding click, join a
reading to the last calibration, etc.).

Scale — why union+window and not a range join:
- naive: equi-join on key with ``r.t <= l.t`` then per-pair argmax →
  materializes |L_k|·|R_k| rows per key before reducing; quadratic in
  hot keys.
- here: tag both sides, ONE hash shuffle on the key, one in-partition
  sort on (t, side), then a running ``last(right_payload,
  ignorenulls=True)`` — each row is touched once, memory is O(1) per
  partition beyond the sort. Skewed keys degrade to a sort, not a
  cross-product, and AQE can still split oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_tiebreak: Column | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus — per ``on`` key —
    the right row with the greatest ``right_time <= left_time``
    (``direction="backward"``, the default) or the smallest
    ``right_time >= left_time`` (``direction="forward"`` — "what
    happened NEXT": the other half of pandas ``merge_asof`` parity).
    NULL-extended when no right row qualifies.

    Right rows sharing an exact (key, time) are ordered by
    ``right_tiebreak`` so the match is deterministic — backward keeps
    the tiebreak-ascending LAST, forward the tiebreak-ascending FIRST
    (the mirror image; both are "the scan's most recent"). Pass one
    whenever (key, time) isn't unique on the right, or pre-dedupe.

    ``tolerance`` (merge_asof's third knob): a maximum allowed
    distance between the matched times, as a Column comparable to their
    difference — ``F.expr("INTERVAL 30 MINUTES")`` for timestamps, a
    numeric literal for numeric times. A match farther than the
    tolerance NULL-extends instead (the left row is kept either way).

    Output: all left columns, then ``right``'s non-key columns.

    Scale is direction-independent: forward is the same single key
    shuffle + one in-partition sort, just scanned from the other end;
    the tolerance adds one more running column, no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward'|'forward', got {direction!r}")
    lcols = left.columns
    rcols = [c for c in right.columns if c not in on]

    tie = right_tiebreak if right_tiebreak is not None else F.lit(0)
    rt = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
        tie.alias("__tie"),
    )
    lt = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(rt.schema["__r"].dataType).alias("__r"),
        F.lit(None).cast(rt.schema["__tie"].dataType).alias("__tie"),
    )
    rt = rt.withColumn("__l", F.lit(None).cast(lt.schema["__l"].dataType))

    # sort puts right rows BEFORE left rows at equal __t (side 0 < 1),
    # so a left row at time t sees a right row at exactly t (boundary
    # match in both directions). Backward scans time ascending — the
    # running last(right) is the greatest rt <= lt; forward scans time
    # DESCENDING — the running last(right) is the smallest rt >= lt.
    # Tiebreak flips with the scan so "last seen" stays deterministic.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(), F.col("__tie").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lt.unionByName(rt).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        # the matched right TIME rides the same window pass (no extra
        # shuffle or sort; just one more running column)
        matched = matched.withColumn(
            "__mt",
            F.last(
                F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
            ).over(w),
        )
    matched = matched.filter(F.col("__side") == 1)
    if tolerance is not None:
        dist = (
            F.col("__t") - F.col("__mt")
            if direction == "backward"
            else F.col("__mt") - F.col("__t")
        )
        matched = matched.withColumn(
            "__match",
            F.when(F.col("__mt").isNotNull() & (dist <= tolerance), F.col("__match")),
        )
    return matched.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__match")[c].alias(c) for c in rcols],
    )
