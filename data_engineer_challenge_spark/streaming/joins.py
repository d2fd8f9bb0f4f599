"""Stream-stream event-time interval join (Structured Streaming).

The attribution shape: match each right-stream event (click) to the
left-stream events (impressions) of the same key it followed within a
time bound. Batch engines express this as a range join
(operators/range_join.py); on unbounded streams the same join needs
state, and the watermark + the time-range condition are what BOUND
that state: once the watermark passes ``left_ts + within``, a buffered
left row can never match a future right row and Spark evicts it —
without both constraints the join's state grows with the stream
forever, the failure mode that kills stream-stream joins at 100 TB.

The streaming join and its batch twin (same predicate on static
frames) are asserted equivalent in tests/test_streaming.py — the
stream-vs-batch equivalence contract every operator in streaming/
carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l",
    right_prefix: str = "r",
    how: str = "inner",
) -> DataFrame:
    """Join right events landing in ``[left.ts, left.ts + within]``
    for the same ``key``. Both inputs need an event-time column
    ``ts``; output columns are prefixed to keep the two sides apart.
    Works identically on static frames (no watermark applied), which
    is what the equivalence tests exploit.

    ``how='left_outer'`` is the attribution shape real pipelines
    need: an impression with NO click inside its window must still
    come out (null-extended) — dropping it would silently bias every
    downstream conversion-rate aggregate. Streaming semantics: the
    unmatched left row is emitted only when the watermark passes
    ``left.ts + within`` (the window is PROVABLY closed — emitting
    earlier could contradict a late-arriving click), so rows whose
    window is still open at end-of-stream are withheld; the batch
    twin is the plain left join restricted to closed windows. The
    same watermark bound is what lets the engine evict the buffered
    row, keeping state finite.

    ``how='full_outer'`` additionally surfaces unmatched RIGHT rows —
    the reconciliation shape (orphaned clicks audit both streams at
    once): a click with no impression in ``[click.ts - within,
    click.ts]`` emits null-extended once the watermark passes its own
    event time (the latest impression that could still match it). Same
    eviction story on both buffers; the batch twin is the plain full
    join restricted to rows whose closing instant precedes the final
    watermark on their respective side."""
    if how not in (
        "inner",
        "left_outer", "leftouter", "left",
        "full_outer", "fullouter", "full", "outer",
    ):
        raise ValueError(
            "interval_join supports inner / left_outer / full_outer, "
            f"got {how!r}"
        )
    lcols = [F.col(c).alias(f"{left_prefix}_{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{right_prefix}_{c}") for c in right.columns]
    l = left.select(*lcols)
    r = right.select(*rcols)
    if left.isStreaming:
        l = l.withWatermark(f"{left_prefix}_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark(f"{right_prefix}_ts", watermark)
    lk, rk = f"{left_prefix}_{key}", f"{right_prefix}_{key}"
    lts, rts = f"{left_prefix}_ts", f"{right_prefix}_ts"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    broadcast dimension snapshot — the standard "attach customer
    attributes to the event stream" pattern. Stateless (unlike a
    stream-stream join): the static side is re-resolved per
    micro-batch, so a dimension refresh (e.g. a SnapshotTable
    ``replace``) is picked up on the next batch without restarting
    the query. Left join: events with no dimension row pass through
    null-extended rather than vanishing (dropping them would silently
    bias every downstream aggregate)."""
    cols = [
        c
        for c in (dim.columns if dim_cols is None else dim_cols)
        if c != key  # key joins once; repeating it would create a
        # duplicate column and an AMBIGUOUS_REFERENCE failure
    ]
    return stream.join(
        F.broadcast(dim.select(key, *cols)), key, "left"
    )
