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

import collections
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


# ---------------------------------------------------------------------------
# Sessionization with TTL state eviction — the state-MANAGEMENT dial the
# running-stats operator deliberately leaves open (NoTimeout). Here idle
# state is the PRODUCT: a session closes when its user goes quiet for the
# gap horizon, and the closed row is emitted exactly once, by whichever
# side notices first — an in-batch gap between two of the user's events,
# or an EventTimeTimeout firing once the watermark passes
# last_event + gap. Timed-out state is REMOVED, so state size tracks
# concurrently-active users, not users-ever-seen: the unbounded-
# deployment contract running_user_stats only documents, enforced.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value_micros", DoubleType(), False),
    ]
)

# (session_start_us, last_event_us, n_events, total_value_micros)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType(), False),
        StructField("last_event_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value_micros", DoubleType(), False),
    ]
)


def _make_session_update(gap_us: int):
    """Build the per-key update function for gap-based sessionization.

    Determinism contract (why this equals the batch gaps-and-islands
    rewrite when micro-batches arrive in event-time order): a timeout
    fires at batch k+1 only if watermark_k > last_event + gap; with
    range-split chronological files every later event has
    ts >= watermark_k + delay > last_event + gap, i.e. the gap rule
    would have started a new session anyway — timeout closing and
    in-batch gap closing agree on every boundary. A gap of EXACTLY the
    horizon starts a new session, matching the batch
    ``events_session_windows`` pin.
    """

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        (user_id,) = key
        if user_id is not None and user_id < 0:
            # watermark-carrier sentinel rows: negative keys advance the
            # event-time watermark (so pending timeouts fire) but never
            # open state or emit sessions. They must NOT be filtered out
            # upstream — a filter pushed below the EventTimeWatermark
            # node would drop them before the watermark ever sees them.
            # The Arrow batch iterator must still be fully consumed
            # (applyInPandasWithState protocol); deque(maxlen=0) drains
            # it without materializing.
            collections.deque(pdfs, maxlen=0)
            return
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    "total_value_micros": [total],
                }
            )
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        ts = pdf["ts_us"].to_numpy().astype(np.int64)
        vals = pdf["value_micros"].to_numpy().astype(np.float64)

        # carried state joins the batch timeline as a zero-weight MARKER
        # at its last event time: gap computation then sees the true
        # interleaving even when in-watermark late rows sort before the
        # carried last event (a naive "compare against carry.last only
        # at position 0" both splits sessions a straddling carry event
        # would bridge AND could regress session_end on late rows).
        carry = state.get if state.exists else None
        if carry is not None:
            ts = np.concatenate((ts, [np.int64(carry[1])]))
            vals = np.concatenate((vals, [0.0]))
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]

        prev = np.concatenate(([ts[0]], ts[:-1]))
        breaks = (ts - prev) >= gap_us
        # segment boundaries: index where each in-batch session starts
        idx = np.flatnonzero(np.concatenate(([True], breaks[1:])))
        seg_start = ts[idx].copy()
        seg_end = ts[np.concatenate((idx[1:] - 1, [len(ts) - 1]))]
        seg_n = np.diff(np.concatenate((idx, [len(ts)]))).astype(np.int64)
        seg_total = np.add.reduceat(vals, idx)

        closed: list[tuple[int, int, int, float]] = []
        if carry is not None:
            # fold the carried aggregates into the marker's segment
            # (the marker itself contributed n=1, value=0: back it out)
            mpos = int(np.flatnonzero(order == len(order) - 1)[0])
            mseg = int(np.searchsorted(idx, mpos, side="right") - 1)
            seg_n[mseg] += carry[2] - 1
            seg_total[mseg] += carry[3]
            if carry[0] < seg_start[mseg]:
                seg_start[mseg] = carry[0]
        closed.extend(
            (int(seg_start[i]), int(seg_end[i]), int(seg_n[i]), float(seg_total[i]))
            for i in range(len(idx) - 1)
        )

        last = (
            int(seg_start[-1]),
            int(seg_end[-1]),
            int(seg_n[-1]),
            float(seg_total[-1]),
        )
        state.update(last)
        # fire once the watermark passes last_event + gap (ms, rounded up
        # so micro-precision never fires a timeout early)
        state.setTimeoutTimestamp(-((last[1] + gap_us) // -1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value_micros": [c[3] for c in closed],
                }
            )

    return update


def sessionized_user_stats(
    events_stream: DataFrame, gap_us: int = 30 * 60 * 1_000_000
) -> DataFrame:
    """Per-user inactivity sessions with TTL'd state (append mode).

    Input contract: a streaming DataFrame with an event-time WATERMARK
    already defined, plus ``user_id``, ``ts_us`` (epoch micros on the
    same timeline the watermark advances on) and ``value_micros``
    columns. Output rows are CLOSED sessions only — each emitted
    exactly once, state removed on timeout.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_session_update(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
