"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast) — the driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from data_engineer_challenge_spark import plans

from .conftest import SF_SMOKE
from .oracle import assert_matches_oracle

plans._load()
SPECS = [s for s in plans.REGISTRY.values() if s.oracle is not None]
ROWS_ONLY = [s for s in plans.REGISTRY.values() if s.oracle is None]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_query_matches_oracle(spark, spec):
    df = spec.builder(spark, SF_SMOKE)
    assert_matches_oracle(df, spec.oracle, SF_SMOKE)


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=lambda s: s.name)
def test_rows_only_query_runs(spark, spec):
    df = spec.builder(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
