"""Post-execution AQE plan capture (r15, VERDICT r14 #4): static
.explain() shows the pre-execution plan (isFinalPlan=false), so AQE
runtime rewrites — SMJ→SHJ under
maxShuffledHashJoinLocalMapThreshold, coalesced reads, runtime
broadcast conversions — never appear in the committed dumps. This
EXECUTES the query (collect — driver-sized results only) and dumps the
FINAL adaptive plan.

Usage: python tools/explain_runtime.py <outdir> <query> [query...]
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="explain-runtime", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    plans.all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = plans.REGISTRY[name].builder(spark, sf_dir)
        n = len(df.collect())  # execute THIS queryExecution to finality
        plan = df._jdf.queryExecution().executedPlan().toString()
        out = os.path.join(outdir, f"{name}_runtime.txt")
        with open(out, "w") as fh:
            fh.write(f"== post-execution adaptive plan ({n} rows) ==\n")
            fh.write(plan)
        print("wrote", out, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
