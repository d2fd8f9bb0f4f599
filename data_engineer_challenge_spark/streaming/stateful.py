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


# -- streaming heavy-hitter candidates (bounded state per shard) ------

HH_OUTPUT_SCHEMA = "shard long, key long, mg_count long"
HH_STATE_SCHEMA = "keys array<long>, counts array<long>"


def _mg_update(capacity: int):
    """GroupState carrier for one SHARD's Misra-Gries summary across
    micro-batches: state is two parallel arrays of at most ``capacity``
    entries no matter how many distinct keys the shard ever sees —
    the streaming half of operators/frequent.py (same batch-merge
    reduction, same survival guarantee summed over shards)."""

    def update(key, batches, state):
        import numpy as np

        (shard,) = key
        if state.exists:
            keys, counts = state.get
            mg = dict(zip(keys, counts))
        else:
            mg = {}
        for pdf in batches:
            for k, c in pdf["key"].value_counts().items():
                mg[k] = mg.get(k, 0) + int(c)
            if len(mg) > capacity:
                arr = np.fromiter(mg.values(), dtype=np.int64)
                cut = int(np.partition(arr, -capacity - 1)[-capacity - 1])
                mg = {k: c - cut for k, c in mg.items() if c - cut > 0}
        state.update((list(mg.keys()), list(mg.values())))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(mg),
                "key": list(mg.keys()),
                "mg_count": list(mg.values()),
            }
        )

    return update


def streaming_heavy_hitter_candidates(
    events: DataFrame, col: str, capacity: int = 128, n_shards: int = 8
) -> DataFrame:
    """Streaming Misra-Gries candidate summaries: rows shard by
    ``hash(col) % n_shards`` (so state is bounded by
    ``n_shards × capacity`` counters TOTAL, regardless of key
    cardinality or stream length), each shard folds its rows into a
    GroupState MG summary across micro-batches, and each batch emits
    the shard's current survivors. Any key whose global count exceeds
    ``total_rows / capacity`` is guaranteed present in the union of
    the final shard summaries (the per-shard eviction argument of
    ``operators/frequent.py``, with shards in place of partitions).
    Downstream, the batch verify pass (`frequent.heavy_hitters`'s
    second phase) turns candidates into exact counts."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.pmod(F.xxhash64(F.col(col)), F.lit(n_shards)).alias("shard"),
        F.col(col).alias("key"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_update(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
