"""Stream-stream joins: correlating two live streams with bounded state.

A batch join can see both sides whole; a stream-stream join cannot —
each side must buffer rows until the other side's matching rows can no
longer arrive. Spark makes that sound iff BOTH sides carry watermarks
and the join condition bounds event-time distance (an interval
condition), so state for a row is dropped once the other stream's
watermark passes its interval. Without the time bound the state is
unbounded and Spark rejects the query at analysis time.

The canonical use here: attribute purchases to the click that preceded
them within an attribution window — the streaming form of the batch
as-of/interval join family (``operators/asof.py`` /
``operators/rangejoin.py``), with state sized by
(arrival rate × window + watermark delay), independent of stream age.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    attribution_window: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Inner stream-stream join: each purchase pairs with every click by
    the same user in the preceding ``attribution_window``.

    Both inputs are streaming DataFrames. Each side gets its own
    watermark; the equi-key (user) routes both streams through one
    hash shuffle, and the interval predicate
    ``click.ts ∈ [purchase.ts − window, purchase.ts]`` is what lets the
    state store evict: a buffered click is dropped once the purchase
    stream's watermark passes ``click.ts + window``.

    Event-time columns are cast to instants for the watermark (NTZ
    inputs keep wall-clock semantics — see streaming/event_time.py).
    """
    from spacex_data_engineering_pipeline_spark.streaming.event_time import (
        restore_ntz,
        to_instant_for_watermark,
    )

    c, c_ntz = to_instant_for_watermark(
        clicks.select(
            F.col(user_col).alias("click_user"),
            F.col(time_col).alias("click_ts"),
        ),
        "click_ts",
    )
    p, p_ntz = to_instant_for_watermark(
        purchases.select(
            F.col(user_col).alias("purchase_user"),
            F.col(time_col).alias("purchase_ts"),
            "*",
        ).drop(user_col, time_col),
        "purchase_ts",
    )
    c = c.withWatermark("click_ts", watermark_delay)
    p = p.withWatermark("purchase_ts", watermark_delay)
    joined = p.join(
        c,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).drop("click_user")
    # hand wall-clock columns back as wall-clock: the instant cast exists
    # only for the watermark, and leaking it out would re-render the
    # values in whatever timezone the consumer's session happens to use
    return joined.withColumn(
        "purchase_ts", restore_ntz(F.col("purchase_ts"), p_ntz)
    ).withColumn("click_ts", restore_ntz(F.col("click_ts"), c_ntz))


def clicks_with_purchase_outcome(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    attribution_window: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, paired with the
    purchase(s) the same user made within the FOLLOWING
    ``attribution_window`` — or a NULL purchase once the purchase
    stream's watermark proves none can still arrive.

    The outer side is the semantics inner joins can't give you: "which
    clicks converted, and which definitively didn't". The NULL row for
    an unmatched click is emitted ONLY when the right watermark passes
    ``click_ts + window`` (before that, a matching purchase could
    still be buffered) — so outer results are inherently
    watermark-delayed, and a bounded run needs a final event-time
    advance (sentinel rows / next batch) to flush the last buffers.
    State sizing is identical to the inner form: clicks buffer for
    ``window + delay`` of event time, keyed by user through one hash
    shuffle.
    """
    from spacex_data_engineering_pipeline_spark.streaming.event_time import (
        restore_ntz,
        to_instant_for_watermark,
    )

    c, c_ntz = to_instant_for_watermark(
        clicks.select(
            F.col(user_col).alias("click_user"),
            F.col(time_col).alias("click_ts"),
            "*",
        ).drop(user_col, time_col),
        "click_ts",
    )
    p, p_ntz = to_instant_for_watermark(
        purchases.select(
            F.col(user_col).alias("purchase_user"),
            F.col(time_col).alias("purchase_ts"),
        ),
        "purchase_ts",
    )
    c = c.withWatermark("click_ts", watermark_delay)
    p = p.withWatermark("purchase_ts", watermark_delay)
    joined = c.join(
        p,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "leftOuter",
    ).drop("purchase_user")
    return joined.withColumn(
        "click_ts", restore_ntz(F.col("click_ts"), c_ntz)
    ).withColumn("purchase_ts", restore_ntz(F.col("purchase_ts"), p_ntz))
