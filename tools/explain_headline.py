"""Capture .explain('formatted') for every headline bench query.

Usage: python tools/explain_headline.py <outdir> [suffix] [names...]

Writes <outdir>/<query>_<suffix>.txt for each headline query (default:
every entry in bench.HEADLINE; pass names to restrict). Queries whose
builders execute actions (multi-commit rows) still run those actions —
the captured plan is the FINAL returned DataFrame's, which is what the
bench times via the noop sink.
"""
import io
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from bench import HEADLINE
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="explain", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    plans.all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = only or list(HEADLINE)
    for name in names:
        df = plans.REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
