"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``functions/events.sessionize`` (lag + running sum);
this is the streaming-native version for continuously-arriving events:
per-user state carries (last event epoch, session count, event count,
max session size, current session size) across micro-batches, each
trigger emits the user's UPDATED running aggregates, and the final
emission per user equals the batch answer — asserted in tests (the same
exact-baseline idiom the probabilistic ops use).

State is O(1) per user — five longs — so at 10^9 users the state store
holds ~40 GB across the cluster, streaming's equivalent of the batch
job's shuffle-by-user.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id long, n_sessions long, n_events long, max_session_events long"
)
STATE_SCHEMA = (
    "last_epoch long, n_sessions long, n_events long, max_session long, "
    "cur_session long"
)


def _update_user(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One state transition per (user, micro-batch): vectorized within the
    batch (numpy gap analysis), O(1) carried state."""
    (user_id,) = key
    if state.exists:
        last_epoch, n_sessions, n_events, max_session, cur_session = state.get
    else:
        last_epoch, n_sessions, n_events, max_session, cur_session = (
            -(10**15), 0, 0, 0, 0,
        )
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        epochs = (pdf["ts"].astype("datetime64[us]").astype("int64") // 1_000_000).to_numpy()
        prev = np.concatenate(([last_epoch], epochs[:-1]))
        new_session = (epochs - prev) > SESSION_GAP_S
        if not state.exists and n_events == 0:
            new_session[0] = True
        # split into runs at session starts; update the carried aggregates
        starts = np.flatnonzero(new_session)
        if len(starts) == 0:
            cur_session += len(epochs)
        else:
            # events before the first boundary extend the carried session
            cur_session += int(starts[0])
            max_session = max(max_session, cur_session)
            bounds = np.append(starts, len(epochs))
            run_lens = np.diff(bounds)
            n_sessions += len(starts)
            max_session = max(max_session, int(run_lens.max()))
            cur_session = int(run_lens[-1])
        n_events += len(epochs)
        last_epoch = int(epochs[-1])
    state.update((last_epoch, n_sessions, n_events, max_session, cur_session))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
            "max_session_events": [max(max_session, cur_session)],
        }
    )


def stream_sessionize(
    events_stream: DataFrame,
) -> DataFrame:
    """events stream -> per-user running session aggregates (update mode).
    ``events_stream`` must carry (user_id, event_id, ts)."""
    return (
        events_stream.select(
            events_stream["user_id"].cast("long").alias("user_id"),
            events_stream["event_id"].cast("long").alias("event_id"),
            events_stream["ts"].cast("timestamp").alias("ts"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
