"""Driver-side point serving vs Spark probe at the 100x vector tier
(VERDICT r11 #3): measure `IVFVectorIndex.probe_local` — the pure
pyarrow+numpy single-query path — against the same store's single-query
`probe_adc`, with the answers asserted bit-identical before timing.
Splices one SCALE.md section (inserted between the 100x-vector and
log-growth sections on first run, replaced in place after)."""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import (  # noqa: E402
    LOGGROWTH_HEADER,
    OUT100V,
    _splice_section,
    build_corpus100_vec,
)

HEADER = (
    "## Point serving — driver-side probe_local vs Spark probe_adc "
    "(200k vectors, VERDICT r11 #3)"
)

STORE = "/tmp/scale100_ivfpq_local"


def _splice(body: str) -> None:
    path = os.path.join(REPO_ROOT, "SCALE.md")
    with open(path) as f:
        whole = f.read()
    if "\n" + HEADER in whole:
        _splice_section(HEADER, body, [LOGGROWTH_HEADER])
        return
    # first insertion: place before the log-growth section
    if "\n" + LOGGROWTH_HEADER in whole:
        head, tail = whole.split("\n" + LOGGROWTH_HEADER, 1)
        out = (
            head.rstrip("\n")
            + "\n"
            + body
            + "\n"
            + LOGGROWTH_HEADER
            + tail
        )
    else:
        out = whole.rstrip("\n") + "\n" + body
    with open(path, "w") as f:
        f.write(out)


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )
    from data_engineer_challenge_spark.session import get_spark

    plans._load()
    spark = get_spark(app_name="scale-point-serving")
    if not os.path.isdir(f"{OUT100V}/embeddings.parquet"):
        print("building 100x vector corpus ...", flush=True)
        build_corpus100_vec(spark)
    emb = spark.read.parquet(f"{OUT100V}/embeddings.parquet")
    n = emb.count()
    cents, _np_def = _corpus_quantizer(OUT100V, emb)
    t0 = time.perf_counter()
    n_probe = IVFVectorIndex.select_n_probe(emb, cents, 0.90)
    width = IVFVectorIndex.select_adc_width(emb, CODEBOOKS, 0.75)
    cfg_s = round(time.perf_counter() - t0, 1)

    if os.path.isdir(os.path.join(STORE, "meta")):
        idx = IVFVectorIndex.open(spark, STORE)
        build_s = "(reused)"
        print("reusing existing store", flush=True)
    else:
        shutil.rmtree(STORE, ignore_errors=True)
        t0 = time.perf_counter()
        idx = IVFVectorIndex(
            spark, STORE, cents, pq_codebooks=CODEBOOKS
        )
        idx.build(emb)
        build_s = f"{round(time.perf_counter() - t0, 1)} s"

    qrows = (
        emb.filter(F.col("vec_id") % 500 == 0)
        .orderBy("vec_id")
        .limit(3)
        .collect()
    )

    # equality pin before any timing: same answers, all three queries
    for r in qrows:
        queries = emb.where(
            F.col("vec_id") == r["vec_id"]
        ).select(F.col("vec_id").alias("q_id"), "embedding")
        want = [
            (row["c_id"], row["cos_sim"], row["rank"])
            for row in idx.probe_adc(
                queries, k=10, n_probe=n_probe, shortlist=width
            )
            .orderBy("rank")
            .collect()
        ]
        got = idx.probe_local(
            list(r["embedding"]), k=10, n_probe=n_probe, shortlist=width
        )
        assert got == want, f"divergence at q={r['vec_id']}"
    print("equality pin: 3/3 queries bit-identical", flush=True)

    # Spark single-query latency (the 100x-vector section's posture)
    q0 = qrows[0]
    one = emb.where(F.col("vec_id") == q0["vec_id"]).select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).localCheckpoint()
    spark_walls = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.probe_adc(
            one, k=10, n_probe=n_probe, shortlist=width
        ).collect()
        spark_walls.append(time.perf_counter() - t0)

    # driver-side latency: cold = first touch (pyarrow reads of the
    # probed lists into the resident cache), warm = RAM-resident
    qv = list(q0["embedding"])
    idx._plc_state = None  # drop any cache from the equality pin
    t0 = time.perf_counter()
    idx.probe_local(qv, k=10, n_probe=n_probe, shortlist=width)
    cold_s = round(time.perf_counter() - t0, 2)
    local_walls = []
    for _ in range(10):
        t0 = time.perf_counter()
        idx.probe_local(qv, k=10, n_probe=n_probe, shortlist=width)
        local_walls.append(time.perf_counter() - t0)
    # a different warm query (same probed-cell working set not
    # guaranteed — it may touch cold lists): the realistic mix
    q1 = qrows[1]
    t0 = time.perf_counter()
    idx.probe_local(
        list(q1["embedding"]), k=10, n_probe=n_probe, shortlist=width
    )
    other_s = round(time.perf_counter() - t0, 2)

    sp = round(min(spark_walls), 3)
    lo_min = round(min(local_walls) * 1000, 1)
    lo_mean = round(statistics.mean(local_walls) * 1000, 1)
    print(
        f"spark single {sp}s; local cold {cold_s}s warm min "
        f"{lo_min}ms mean {lo_mean}ms; other-query {other_s}s",
        flush=True,
    )

    body = (
        f"{HEADER}\n\n"
        f"`probe_local` answers ONE query against the persisted "
        f"PQ-coded store entirely on the driver — pyarrow reads of "
        f"the probed `cid=` lists' code columns, `np_adc_luts` for "
        f"the ADC stage, numpy rescore — no Spark job. Probed lists "
        f"become RESIDENT numpy arrays on first touch (the FAISS "
        f"in-RAM-index posture; any store mutation invalidates the "
        f"cache via a directory-state fingerprint). Answers are "
        f"**bit-identical to `probe_adc`** for the same (query, k, "
        f"n_probe, shortlist): pinned here on 3 queries before "
        f"timing, and in tests/test_text_dedup.py::"
        f"test_probe_local_matches_probe_adc (raw + residual stores, "
        f"across a supersede + tombstone).\n\n"
        f"Store: the 100x tier's {n:,} vectors, k={len(cents)} "
        f"quantizer, n_probe={n_probe}, shortlist={width} (the "
        f"recall-targeted defaults above; config sweeps {cfg_s} s "
        f"one-off, build {build_s}).\n\n"
        f"| path | single-query latency |\n"
        f"|---|---|\n"
        f"| `probe_adc` (Spark job, min of 3) | {sp} s |\n"
        f"| `probe_local`, cold (first touch reads the {n_probe} "
        f"probed lists) | {cold_s} s |\n"
        f"| `probe_local`, warm (resident lists, min of 10) | "
        f"{lo_min} ms |\n"
        f"| `probe_local`, warm (mean of 10) | {lo_mean} ms |\n"
        f"| `probe_local`, different query (mixed-residency) | "
        f"{other_s} s |\n\n"
        f"Warm serving is {round(sp * 1000 / lo_min)}x under the "
        f"Spark single-query number — job overhead (planning, "
        f"scheduling, JVM round-trips) plus re-reading lists a "
        f"server keeps in RAM. Cold is an honest first-touch cost "
        f"(∝ the probed fraction of the store; a serving process "
        f"pays it once per list, exactly like FAISS loading an "
        f"index). The batch path (`probe_adc` over a query fleet) "
        f"remains the right tool whenever queries arrive together — "
        f"it amortizes one scan across all queries. `probe_local` "
        f"is the interactive tier: the point-lookup latency class "
        f"the reference served from sqlite (exo_2.py:204-217), "
        f"answered from the SAME store the cluster maintains, no "
        f"export step.\n"
    )
    _splice(body)
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
