"""Deterministic deduplication (SURVEY.md §2.3 J1, §4.3.1).

The reference deduplicates patients with pandas ``drop_duplicates``
keeping the *first* occurrence in file order (exo_1.py:32-34). Spark's
``dropDuplicates`` keeps an arbitrary row under shuffle, so keep-first
must impose an explicit order: rank rows per key by a stable order
column and keep rank 1.

Scale: the window shuffles once on the dedup key — same cost as any
grouped operator, no global ordering involved. Skewed keys fall to AQE
skew handling; there is no single-partition bottleneck.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RANK = "__dedup_rank"


def keep_first_dedup(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Keep exactly the first row per ``keys`` under ``order_by``.

    ``order_by`` must be a total order within each key group (include a
    tiebreaker column) or "first" is not well defined.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RANK, F.row_number().over(w))
        .filter(F.col(_RANK) == 1)
        .drop(_RANK)
    )


def exact_dedup(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Order-insensitive exact dedup (keys default to all columns).

    When any row per key is acceptable this is cheaper than
    :func:`keep_first_dedup`: Catalyst plans it as a hash aggregate
    with map-side partial combine, so duplicate-heavy data shrinks
    before the shuffle.
    """
    return df.dropDuplicates(list(keys) if keys else None)
