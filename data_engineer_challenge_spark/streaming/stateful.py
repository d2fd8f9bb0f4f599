"""Custom stateful streaming operator via ``applyInPandasWithState``
(pyspark guide: stateful processing) — per-user lifetime counters that
survive across micro-batches, the building block for streaming feature
pipelines (e.g. "events seen per user so far" joined onto training
rows)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, total_value double"
STATE_SCHEMA = "total_events long, total_value double"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_value = state.get
    else:
        total_events, total_value = 0, 0.0
    for pdf in batches:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total_events],
            "total_value": [total_value],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user totals carried in GroupState across
    micro-batches (emitted once per updated user per batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
