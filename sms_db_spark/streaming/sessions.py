"""Custom stateful streaming operator: gap-based per-user sessionization
via applyInPandasWithState.

The batch twin is plans/compat_queries.q32_sessionize (lag/gap/cumsum
windows); here the same semantics run incrementally over an unbounded
stream — the operator Spark's built-in windowed aggregations can't
express (session assignment depends on arbitrary-past state, not a fixed
window), which is exactly the applyInPandasWithState use case.

State per user_id: (session_start_ms, last_ts_ms, n_events). A new event
within gap_ms extends the open session; a later event CLOSES it — the
closed session is emitted downstream and the new event opens fresh
state. Arrow-batched: the per-group pandas path is the sanctioned slow
lane for custom stateful logic (SURVEY §2.8).

Scale: state is keyed by user_id (hash-partitioned, uniform); each
group's state is three scalars, so the state store stays O(active
users). A production deployment adds GroupStateTimeout.EventTimeTimeout
+ watermark to close sessions for users who go silent; the test path
uses NoTimeout so availableNow triggers are deterministic.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("session_end_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("last_ts_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

DEFAULT_GAP_MS = 30 * 60 * 1000


def _make_update_fn(gap_ms: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, cnt = state.get
        else:
            start = last = cnt = None

        closed: list[tuple[int, int, int, int]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts_ms"])
        for t in sorted(ts_all):
            if start is None:
                start, last, cnt = t, t, 1
            elif t - last <= gap_ms:
                last, cnt = max(last, t), cnt + 1
            else:
                closed.append((user_id, start, last, cnt))
                start, last, cnt = t, t, 1

        state.update((start, last, cnt))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
        )

    return update


def stream_sessions(
    spark: SparkSession,
    drop_dir: str,
    gap_ms: int = DEFAULT_GAP_MS,
) -> DataFrame:
    """Streaming frame of CLOSED sessions from event files in drop_dir."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(drop_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
