"""Mergeable HyperLogLog distinct-count sketches (Apache DataSketches
via Spark's native ``hll_sketch_agg`` family — JVM-side, no UDF).

``COUNT(DISTINCT)`` at 100 TB has the same failure mode as the naive
heavy-hitter aggregate (operators/frequent.py): one hash-set entry per
distinct value. The sketch answer is mergeable summaries (Agarwal et
al., PODS'12): each partition/day/shard folds its values into a fixed
``2^lg_k``-register HLL sketch, and sketches UNION losslessly — the
union of two sketches equals the sketch of the concatenated input, by
construction (register-wise max), independent of order and grouping.

That union property is what makes PERSISTED rollups work: materialize
one tiny sketch per (group, day) once, and any later "distinct users
over an arbitrary day range / group subset" is a union of pre-built
sketches — no rescan of the raw events, ever. The rollup table is a
few KB per group-day regardless of how many events fed it.

Accuracy contract: a DataSketches HLL stays in its exact (coupon
list/set) mode until the distinct count approaches ~3/4 of ``2^lg_k``
and is EXACT there; beyond, the dense estimator's relative standard
error is ~1.04/sqrt(2^lg_k) (~0.8% at lg_k=14). The registered query
keeps its DuckDB ``COUNT(DISTINCT)`` oracle because the test corpus
sits squarely in the exact regime (1,500 distinct users at sf0.1 vs a
~12k promotion point); the beyond-exact-regime error bound is pinned
separately in tests with a 100k-distinct synthetic input.

Reference scope: the reference engine has no approximate tier at all
(SURVEY §2.6 — its one distinct count is a pandas nunique); this is
the 100 TB profiling capability BASELINE.json's north star names.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default register count exponent: 2^14 registers = 16 KiB dense,
#: exact to ~12k distinct, ±0.8% beyond — the profiling sweet spot
DEFAULT_LG_K = 14


def build_distinct_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch (binary column) per group — the build side of a
    persisted rollup. Map-side partial aggregation applies: each task
    folds its rows into a local sketch and only sketches shuffle."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def merge_distinct_estimate(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Union pre-built sketches (optionally re-grouped coarser than
    they were built) and estimate. ``allowDifferentLgConfigK=False``:
    mixing register sizes silently degrades every union to the
    coarser sketch — refuse instead; rebuild with one lg_k."""
    merged = F.hll_union_agg(sketch_col, F.lit(False))
    agg = F.hll_sketch_estimate(merged).alias(estimate_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)
