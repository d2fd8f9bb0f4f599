"""Time a subset of registry queries with bench.py's exact method
(sf0.001 warmup, min of 2, noop sink, cache cleared between runs).
Usage: python tools/bench_subset.py name [name...]"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    names = sys.argv[1:]
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="bench-subset", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    plans.all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            plans.REGISTRY[n].builder(spark, warm).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:  # visible, not swallowed (r15 ADVICE):
            # a builder broken at sf0.001 would otherwise be timed cold
            # with no hint the warmup never ran
            print(
                f"warmup failed for {n}: {type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
    spark.catalog.clearCache()
    out = {}
    for n in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            plans.REGISTRY[n].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            e = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = e if best is None else min(best, e)
        out[n] = round(best, 4)
        print(n, out[n], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
