from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os

    from data_engineer_challenge_spark.session import get_spark

    # r15 (VERDICT r14 #3: one pytest invocation must fit the driver's
    # verify window): the suite session ran local[4] — a two-shard-era
    # setting — while the box has 32 cores and the driver runs ONE
    # invocation. local[10] cuts the compute-bound tier (PQ/IVF
    # kernels, provenance trainers, oracle replays); scheduling-bound
    # tests are unaffected. Override with SPARK_GRAFT_TEST_CPUS for
    # manual multi-shard runs.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "10"))
    spark = get_spark(
        app_name="tests",
        master=f"local[{cpus}]",
        shuffle_partitions=min(cpus, 8),
    )
    yield spark
