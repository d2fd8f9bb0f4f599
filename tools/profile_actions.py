"""Action-level wall profile of one registry query (r15 measurement
harness, guide §1): monkeypatches every PySpark call that triggers
jobs on this codebase's paths (count / collect / localCheckpoint /
persist-materialize / writer.parquet / noop save) to log
(call site, seconds), then runs the query builder + noop sink once
and prints the log sorted by cost.

Usage: python tools/profile_actions.py <query> [sf_dir]
"""
import os
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

LOG: list[tuple[str, float]] = []


def _site() -> str:
    for fr in reversed(traceback.extract_stack()[:-2]):
        f = fr.filename
        if "/pyspark/" in f or "profile_actions" in f:
            continue
        return f"{f.split('/')[-1]}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapped(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        LOG.append((f"{name}@{_site()}", time.perf_counter() - t0))
        return out

    setattr(cls, name, wrapped)


def main() -> None:
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Spark 4 split: classic instances override the public DataFrame's
    # methods, so the patch must land on the classic class
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("count", "collect", "localCheckpoint", "inputFiles"):
        _wrap(DataFrame, m)
    for m in ("parquet", "save"):
        _wrap(DataFrameWriter, m)

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="profile", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    plans.all_queries()
    builder = plans.REGISTRY[query].builder
    # warm pass at smoke scale (codegen cost out of the profile)
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        try:
            builder(spark, warm).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:
            print("warmup failed:", exc, file=sys.stderr)
        spark.catalog.clearCache()
    LOG.clear()
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    t_build = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    agg: dict[str, tuple[int, float]] = {}
    for site, dt in LOG:
        n, s = agg.get(site, (0, 0.0))
        agg[site] = (n + 1, s + dt)
    print(f"== {query}  total {total:.3f}s  (builder {t_build:.3f}s)")
    acc = sum(s for _, s in agg.values())
    print(f"   sum of logged actions {acc:.3f}s")
    for site, (n, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"{s:8.3f}s  x{n:<3d} {site}")
    print("-- sequence --")
    for site, dt in LOG:
        print(f"{dt:8.3f}s  {site}")


if __name__ == "__main__":
    main()
