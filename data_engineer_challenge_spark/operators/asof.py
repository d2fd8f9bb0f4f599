"""As-of (point-in-time) join — an operator Spark lacks natively
(pyspark guide: common OLAP patterns).

Implemented as the scalable union trick, not a range cross-join:
tag left and right rows, union them, and within each key carry the
most recent right payload forward with ``last(ignorenulls)`` over an
ordered window. Cost is one shuffle + sort on (key, time) — the same
as any windowed operator — versus the O(|L|·|R|) per-key product of a
naive inequality join. DuckDB's native ``ASOF JOIN`` serves as the
oracle in plans/advanced.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row on the
    ``direction`` side within the same ``on`` key:
    ``'backward'`` (default) the latest right with
    ``right_ts <= left_ts``; ``'forward'`` the earliest right with
    ``right_ts >= left_ts`` — pandas ``merge_asof`` semantics, one
    shuffle+sort either way (forward is the same union trick traversed
    in descending time).

    ``tolerance`` bounds the match's staleness: a match farther than
    ``tolerance`` from ``left_ts`` is discarded (null payload under
    ``'left'``, row dropped under ``'inner'``). Units: whatever
    ``ts - ts`` means for the column type — seconds (with fraction)
    for timestamps, plain difference for numerics — the attribution
    -window knob ("last click within 30 minutes" → 1800.0).

    ``how='left'`` keeps unmatched left rows (null payload);
    ``'inner'`` drops them. Right-side ties on (key, ts) resolve to the
    row latest in ``right_payload`` column order — pass a tiebreaker
    column in the payload and dedup beforehand if ties are possible.

    The right row travels as ONE struct and the forward-fill carries
    the struct (non-null for every right row, whatever its fields
    hold), so a matched row whose payload columns are legitimately
    NULL is still the match — nulls inside the payload neither fall
    back to a stale earlier row nor drop the row under ``'inner'``.

    Right rows with a NULL ``right_ts`` are dropped up front: "as of
    an unknown time" matches nothing, and in the ascending nulls-first
    window such a row would otherwise sort before every real row and
    be forward-filled as a bogus match for left rows with no true
    predecessor.
    """
    from pyspark.sql import types as T

    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how={how!r}: expected 'inner' or 'left'")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join direction={direction!r}: expected 'backward' or 'forward'"
        )

    right = right.filter(F.col(right_ts).isNotNull())
    marker = "__asof_side"
    ts = "__asof_ts"
    rrow = "__asof_row"
    rts_field = "__asof_rts"  # matched right_ts, for the tolerance test
    payload_cols = list(right_payload)
    rrow_type = T.StructType(
        [*[right.schema[c] for c in payload_cols],
         T.StructField(rts_field, right.schema[right_ts].dataType)]
    )

    lefts = (
        left.withColumn(marker, F.lit(1))
        .withColumn(ts, F.col(left_ts))
        .withColumn(rrow, F.lit(None).cast(rrow_type))
    )
    rights = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(marker),
        F.struct(
            *[F.col(c) for c in payload_cols],
            F.col(right_ts).alias(rts_field),
        ).alias(rrow),
    )
    left_cols = [c for c in left.columns]
    union = lefts.select(*left_cols, ts, F.col(marker), rrow).unionByName(
        rights.select(
            *[
                F.col(c)
                if c in rights.columns
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left_cols
            ],
            ts,
            marker,
            rrow,
        ),
        allowMissingColumns=False,
    )

    # rights sort before lefts at equal ts (marker ascending in BOTH
    # directions) → the join is inclusive; forward simply traverses
    # time descending so "most recent previous" becomes "next".
    # nulls FIRST in both traversals: a left row with NULL left_ts
    # ("as of an unknown time") must see no right rows before it and
    # stay unmatched — plain desc() sorts nulls LAST, which would
    # fill such a row with the minimum-ts right payload
    order = [
        F.col(ts) if direction == "backward" else F.col(ts).desc_nulls_first(),
        F.col(marker),
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = union.withColumn(rrow, F.last(rrow, ignorenulls=True).over(w))
    out = filled.filter(F.col(marker) == 1)
    if tolerance is not None:
        # staleness in the column's own difference units (timestamps
        # cast to double = epoch seconds with fraction); non-negative
        # by construction of the traversal direction
        rts = F.col(rrow).getField(rts_field).cast("double")
        lts = F.col(ts).cast("double")
        stale = (lts - rts) if direction == "backward" else (rts - lts)
        out = out.withColumn(
            rrow, F.when(stale <= F.lit(float(tolerance)), F.col(rrow))
        )
    out = out.drop(marker, ts)
    if how == "inner":
        out = out.filter(F.col(rrow).isNotNull())
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col(rrow).getField(c))
    return out.drop(rrow)
