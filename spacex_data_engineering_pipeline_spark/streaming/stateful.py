"""Custom stateful streaming operator (SURVEY §2.11 scale path:
``applyInPandasWithState`` for semantics the built-in windowed
aggregations can't express).

``running_user_stats`` keeps per-user running totals ACROSS micro-
batches — the streaming analogue of the reference's incremental
aggregation counters (src/aggregations.py:267-284), but with state
owned by the engine's checkpoint instead of a hand-maintained snapshot
row. Arrow moves each group's batch; state is a single compact tuple
per key.

Scale: state lives in the state store partitioned by the grouping key —
per-key size here is O(1), so 10⁹ users is bounded by key count, not
event count. Use watermark + timeouts to expire idle keys in unbounded
deployments.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Attach to a streaming events source; emits the updated per-user
    running (count, value-sum) each micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
