"""Dedup-side point serving at the 100x docs tier (r13): measure
`MinHashIndex.probe_local` — the pure Python/numpy/pyarrow
one-document near-dup check — against the same store's one-document
Spark `probe`, decisions asserted identical before timing. Splices
one SCALE.md section directly after the text point-serving section."""

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
    OUT100,
    _splice_section,
    build_corpus100,
)

HEADER = (
    "## Point serving, dedup side — driver-side probe_local vs Spark "
    "probe (500k docs, r13)"
)

STORE = "/tmp/scale100_mhidx"


def main() -> None:
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )
    from data_engineer_challenge_spark.session import get_spark

    plans._load()
    spark = get_spark(app_name="scale-dedup-serving")
    if not os.path.isdir(f"{OUT100}/documents.parquet"):
        print("building 100x docs corpus ...", flush=True)
        build_corpus100(spark)
    docs = spark.read.parquet(f"{OUT100}/documents.parquet")
    n = docs.count()

    # index 80%; the held-out 20% supplies probe documents with
    # planted near-dups (the corpus's own structure)
    indexed = docs.filter(F.col("doc_id") % 5 != 0)
    if os.path.isdir(os.path.join(STORE, "meta")):
        idx = MinHashIndex.open(spark, STORE)
        build_s = "(reused)"
        print("reusing existing store", flush=True)
    else:
        import shutil

        shutil.rmtree(STORE, ignore_errors=True)
        t0 = time.perf_counter()
        idx = MinHashIndex(spark, STORE, threshold=0.5)
        idx.build(indexed.select("doc_id", "text"))
        build_s = f"{round(time.perf_counter() - t0, 1)} s"
        print(f"built store: {build_s}", flush=True)

    probe_side = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text"
    )
    # one hit (a planted near-dup) + one miss, from a small batch probe
    sample = probe_side.limit(400).localCheckpoint()
    hits = idx.probe(sample).collect()
    idx.release()
    # fail LOUD before the timing section (r13 review: an unguarded
    # None deref after the multi-minute build lost the run)
    if not hits:
        raise SystemExit(
            "scale_dedup_serving: the 400-doc sample yielded no "
            "near-dup hits — widen the sample or lower the threshold"
        )
    hit_id = hits[0]["new_id"]
    hit_row = sample.where(F.col("doc_id") == hit_id).first()
    miss_row = None
    hit_ids = {h["new_id"] for h in hits}
    for r in sample.collect():
        if r["doc_id"] not in hit_ids:
            miss_row = r
            break
    if miss_row is None:
        raise SystemExit(
            "scale_dedup_serving: every sampled doc is a hit — no "
            "miss document to time; widen the sample"
        )

    local = MinHashIndex.open_local(STORE)
    # decision pin before timing: local == spark on both documents
    for r in (hit_row, miss_row):
        one = sample.where(F.col("doc_id") == r["doc_id"])
        want = {
            (x["dup_of"], x["jaccard"]) for x in idx.probe(one).collect()
        }
        idx.release()
        got = set(local.probe_local(r["text"]))
        assert got == want, r["doc_id"]
    print("decision pin: hit + miss identical", flush=True)

    # Spark one-document probe latency
    one = sample.where(F.col("doc_id") == hit_row["doc_id"]).localCheckpoint()
    spark_walls = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.probe(one).collect()
        idx.release()
        spark_walls.append(time.perf_counter() - t0)

    # driver-side: cold then warm (same doc), plus the miss document
    local._mhl_state = None
    t0 = time.perf_counter()
    local.probe_local(hit_row["text"])
    cold_s = round(time.perf_counter() - t0, 2)
    walls = []
    for _ in range(10):
        t0 = time.perf_counter()
        local.probe_local(hit_row["text"])
        walls.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    local.probe_local(miss_row["text"])
    miss_s = round((time.perf_counter() - t0) * 1000, 1)

    sp = round(min(spark_walls), 3)
    lo_min = round(min(walls) * 1000, 1)
    lo_mean = round(statistics.mean(walls) * 1000, 1)
    print(
        f"spark single {sp}s; local cold {cold_s}s warm min {lo_min}ms "
        f"mean {lo_mean}ms; miss doc {miss_s}ms",
        flush=True,
    )

    body = (
        f"{HEADER}\n\n"
        f"`MinHashIndex.probe_local` answers the ingest loop's own "
        f"question — is this ONE document a near-duplicate of "
        f"anything indexed? — entirely on the driver (serve_query "
        f"`--text`): operators/localhash.py's bit-exact xxHash64 / "
        f"Murmur3 replicas recompute the shingle chain and the "
        f"`pmod(hash(bh), N)` bucket keys, the banding is literally "
        f"the vectorized kernel's numpy, and the verify is the same "
        f"exact-Jaccard max fold. Decisions are **identical to "
        f"`probe()`** (pinned here on a planted near-dup hit and a "
        f"clean miss before timing; hits/misses/short-texts/"
        f"post-append in tests).\n\n"
        f"Store: {n:,}-doc corpus, 80% indexed (threshold 0.5, "
        f"63 hashes / 21 bands, build {build_s}).\n\n"
        f"| path | single-document latency |\n"
        f"|---|---|\n"
        f"| `probe` (Spark job, min of 3) | {sp} s |\n"
        f"| `probe_local`, cold (first touch reads the touched "
        f"buckets) | {cold_s} s |\n"
        f"| `probe_local`, warm (resident buckets, min of 10) | "
        f"{lo_min} ms |\n"
        f"| `probe_local`, warm (mean of 10) | {lo_mean} ms |\n"
        f"| `probe_local`, miss document (warm) | {miss_s} ms |\n\n"
        f"Same split as the vector and text tiers: warm serving is "
        f"{round(sp * 1000 / max(lo_min, 0.1))}x under the Spark "
        f"single-document number. The cold cost touches ≤ bands "
        f"band-buckets + the candidates' shingle buckets (bounded by "
        f"parameters, not corpus size). Batch ingest stays on "
        f"`probe()` — one banding pass amortized across the whole "
        f"micro-batch; `probe_local` is the interactive tier, "
        f"completing the probe_local family across all three "
        f"persisted retrieval/dedup stores.\n"
    )
    _splice_section(HEADER, body, [LOGGROWTH_HEADER])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
