"""Skew-mitigation join (pyspark guide: partitioning & shuffle).

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on session-wide); explicit
salting remains the tool when one side must broadcast-replicate, e.g. a
hot key carrying 30% of a 100 TB fact table. The big side scatters each
hot key across ``n_salts`` shuffle partitions (deterministic hash of
the whole row — no rand(), so retries/speculative tasks agree); the
small side replicates every row ``n_salts`` times. Result is
row-identical to the unsalted join (tested).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    if how not in ("inner", "left"):
        # outer variants would keep each of the n_salts replicas of an
        # unmatched small-side row — not row-identical to the plain join
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    keys = list(on)
    salt = "__salt"
    big_salted = big.withColumn(
        salt, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_salted.join(small_salted, keys + [salt], how).drop(salt)
