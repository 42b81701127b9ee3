"""Custom stateful streaming operator: gap-based session windows via
applyInPandasWithState (SURVEY §2.12 — the applyInPandasWithState extension
point the reference's batch lifecycle never had).

Per user key, state = the currently-open session (start, last, count).
Events arriving within `gap` extend it; a larger gap CLOSES the session
(emitted downstream) and opens a new one. Closed sessions are exactly-once
per session in append mode; the open session lives in the state store until
a later batch (or a timeout policy, in production) closes it.

ORDERING CONTRACT: events may arrive in any order WITHIN a micro-batch (the
handler sorts each batch's timestamps), but batches must be in-order ACROSS
batches per key — an event older than the open session's last timestamp
extends the session backwards-in-time rather than reopening history. That
is the standard contract for watermarkless gap sessionization; feed
out-of-order sources through a watermarked buffer first if cross-batch
disorder is possible (file sources: commit each append atomically, e.g. one
file per append, so a micro-batch never splits an append mid-commit).

The batch twin is workload.events.events_sessionize — same session
boundaries, computed with lag+running-sum windows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, start_us bigint, end_us bigint, n_events bigint"
STATE_SCHEMA = "start bigint, last bigint, n bigint"


def sessionize_stateful(events: DataFrame, gap_us: int = 1800 * 1_000_000) -> DataFrame:
    """events: streaming DF with (user_id bigint, tus bigint). Returns the
    stream of CLOSED sessions (user_id, start_us, end_us, n_events)."""

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["tus"])
        for t in sorted(ts):
            if last is not None and t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, n = None, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "start_us", "end_us", "n_events"])

    return events.groupBy("user_id").applyInPandasWithState(
        handle,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
