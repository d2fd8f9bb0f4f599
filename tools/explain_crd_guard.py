"""Plan + timing receipt for the curation delta tick's carried-survivor
guard (r15, VERDICT r14 #1).

Reproduces the bench row's tick-2 shape (copy-on-write takedown: the
rewritten directory re-emits every survivor as -old +new) and captures
``.explain("formatted")`` of the n_mixed guard frame in BOTH forms —
the r14 full-row intersect (text columns cross the Exchange) and the
r15 narrow (doc_id, xxhash64, null-bitmap) form — plus an interleaved
A/B timing of the two guard actions in the same session.

Usage: python tools/explain_crd_guard.py <outdir>
"""
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.snapshot import (
        SnapshotTable,
    )
    from data_engineer_challenge_spark.plans.helpers import scratch_dir
    from data_engineer_challenge_spark.session import get_spark
    from data_engineer_challenge_spark.tables import load_table

    spark = get_spark(app_name="crd-guard", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    corpus = SnapshotTable(spark, scratch_dir("crdguard_corpus_"))
    corpus.append(docs.where("doc_id % 4 != 3"), txn="b0")
    v0 = corpus.current_version()
    corpus.delete_where([("doc_id", "<", 50)])
    v1 = corpus.current_version()

    # the tick-2 delta: the takedown's rewrite re-emits the touched
    # directory's survivors on both sides
    delta = corpus.read_changes_signed(v0, v1)
    plus_raw = delta.where(F.col("__sign") == 1).drop("__sign")
    minus_raw = delta.where(F.col("__sign") == -1).drop("__sign")
    cols = plus_raw.columns

    # r14 form: whole-row intersect + exceptAll (text in the Exchange)
    carried_full = plus_raw.intersect(minus_raw)
    guard_full = plus_raw.join(
        carried_full.select("doc_id").distinct(), "doc_id"
    ).exceptAll(carried_full)

    # r15 form: narrow (doc_id, hash, null-bitmap) rows
    nb = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        nb = nb + F.when(
            F.col(c).isNull(), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    def narrow(df):
        return df.select(
            "doc_id",
            F.xxhash64(*[F.col(c) for c in cols]).alias("__h"),
            nb.alias("__nb"),
        )

    plus_n = narrow(plus_raw)
    carried_n = plus_n.intersect(narrow(minus_raw))
    guard_n = plus_n.join(
        carried_n.select("doc_id").distinct(), "doc_id"
    ).exceptAll(carried_n)

    for name, df in (
        ("curation_delta_guard_before", guard_full),
        ("curation_delta_guard_after", guard_n),
    ):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, flush=True)

    # interleaved A/B of the guard action (A,B,B,A — min per side)
    def run(df):
        t0 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0

    run(guard_full), run(guard_n)  # warm both code paths
    a = []
    b = []
    for order in ((a, guard_full), (b, guard_n), (b, guard_n), (a, guard_full)):
        order[0].append(run(order[1]))
        spark.catalog.clearCache()
    print(f"guard_full min {min(a):.3f}s runs {[round(x,3) for x in a]}")
    print(f"guard_narrow min {min(b):.3f}s runs {[round(x,3) for x in b]}")


if __name__ == "__main__":
    main()
