"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Before timing, each headline query runs once at the sf0.001 smoke
scale: that pays the one-time JVM JIT / whole-stage-codegen
compilation cost outside the measurement, so timings reflect
data-scale throughput rather than first-call compilation (a real
cluster amortizes compilation across the job the same way). Timed runs
materialize every row to a noop sink — no driver-transfer cost.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "flagship_regional_revenue",
    "q1_pricing_summary",
    "top_orders_per_customer",
    "events_sessionization",
    "events_asof_last_click",
    "docs_minhash_neardup",
    "docs_simhash_neardup",
    "documents_clean_corpus",
    "emb_knn_bruteforce",
    "emb_lsh_neardup_pairs",
    # r3 additions (extra coverage; r2-overlap entries stay comparable)
    "emb_ivf_topk",
    "events_approx_stats",
    "docs_neardup_clusters",  # the iterative tier (label propagation)
    # r4 additions
    "doc_fingerprint_winnowing",
    "docs_fingerprint_overlap_pairs",
    "emb_quantized_knn",
    # r5 additions: transactional commit/time-travel (cost model:
    # one write of the source rows + manifest commits + version read),
    # bounded-state heavy hitters (two-pass Misra-Gries + verify),
    # Gopher repetition metrics (two keyed shuffles over 2-grams)
    "snapshot_time_travel",
    "events_heavy_hitters",
    "docs_repetition_stats",
    # r6 addition: incremental view maintenance end to end (two
    # appends + subtractive delete + append, four delta-sized folds)
    "ivm_maintained_view",
    # r6 additions: semantic corpus pruning (map-only assignment +
    # one cell-keyed shuffle), mergeable HLL distinct rollup (two
    # sketch aggregation levels, no raw re-shuffle)
    "emb_semantic_dedup",
    "events_distinct_sketch_rollup",
    # r6 addition: mergeable quantile-sketch rollup (bounded-state
    # build + daily-sketch merge — at sf0.1 the genuinely-approximate
    # compression path runs: 739-row day groups vs the query's
    # capacity of 512, pinned in tests/test_approx.py)
    "events_value_quantile_rollup",
    # r6 addition: cross-document segment dedup (ids-only keep-first
    # shuffle + per-doc decision aggregate; text re-sliced map-side)
    "docs_segment_dedup",
    # r6 addition: corpus unigram-LM surprisal (two map-only token
    # passes; vocab-sized rarity model broadcast back, integer-exact)
    "doc_unigram_surprisal",
    # r6 late additions (both driver-surface): hybrid sparse+dense
    # RRF retrieval (two TakeOrdered branches + a k-row fusion join),
    # point-in-time feature assembly (one user_id shuffle, six window
    # functions sharing it)
    "docs_hybrid_rrf_search",
    "events_training_examples",
    # r6 late addition: arbitrary-alignment exact passage dedup
    # (stride-1 windows: O(corpus tokens) map-only hashing, ids-only
    # keep-first shuffle, island join bounded by duplication)
    "docs_exact_substring_dedup",
    # r7 additions: persisted BM25 inverted index, build + pruned
    # probe (cost model: one tokenize/postings pass over the corpus +
    # a probe reading only the query terms' t_bucket= partitions);
    # DSIR importance resampling (three token passes + one ids-only
    # shuffle; 4096-row model broadcast)
    "inverted_index_probe",
    "docs_dsir_selection",
    # r8 additions: the learned quality scorer (map-only broadcast dot
    # product — the cheapest curation stage, benched to prove it);
    # hybrid RRF through the persisted index (now the driver-surface
    # variant; the recompute twin stays above for round-over-round
    # comparability)
    "docs_quality_classifier",
    "docs_hybrid_rrf_via_index",
    # r8 late addition: the composed curation funnel (quality gate ->
    # exact dedup -> DSIR over survivors) — the end-to-end pipeline
    # cost, now a driver-surface row
    "docs_curation_funnel",
    # r9 addition: PQ/ADC compressed-index retrieval (map-only 4-bit
    # encoding over frozen codebooks, LUT-broadcast ADC shortlist,
    # exact rescore of 60/query — the 32x-compression ANN tier)
    "emb_pq_adc_knn",
    # r11 additions (both now driver-surface): the delta-aware
    # curation refresh (three SnapshotTable commits + three delta
    # ticks — action-count-dominated like ivm_maintained_view, the
    # whole incremental story IS the row) and the reproducible epoch
    # shuffle (one hash projection + one partitioned rank window)
    "docs_curation_refresh_delta",
    "docs_global_shuffle_order",
    # r12 additions — the retrieval/mining tier rotated onto the
    # driver surface (per-query Arrow MMR greedy; label-partitioned
    # hard-negative mining; RM3's two-stage feedback loop; the sparse
    # match-stream snippet search) and the corpus-release capstone
    # (filter bank -> funnel -> cluster split -> decontamination ->
    # shuffled packing under one hash — the composed-pipeline cost)
    "emb_mmr_rerank",
    "emb_hard_negatives",
    "docs_rm3_search",
    "docs_search_snippets",
    "docs_corpus_release",
    # r13: the crawl tier's driver row — WARC parse + HTML extract +
    # cross-tick MinHash probe + MERGE across two ticks (fixture
    # build included; the action-count shape, like refresh_delta)
    "warc_ingest_refresh",
    # r13: the rotated-on compressed-retrieval row (PQ encode → ADC
    # LUT → coarse-term restore → exact rescore, corpus-scan form)
    "emb_pq_residual_adc_knn",
]

#: Calibration anchors (the EXPLAIN.md receipt set, frozen): four
#: cheap, code-stable queries whose idle best-of-2 levels are pinned
#: from the r11 idle session. Emitting this run's measurements next
#: to those references makes every BENCH artifact carry its own
#: load calibration (VERDICT r11 #7) — a judge (or a later round)
#: divides by the anchor factor instead of needing a post-hoc
#: EXPLAIN note about box load.
CALIBRATION_ANCHORS_IDLE = {
    "docs_minhash_neardup": 1.45,
    "events_sessionization": 0.34,
    "emb_knn_bruteforce": 0.85,
    "events_approx_stats": 0.51,
}

#: the FROZEN r2 entry set: summed separately so the round-over-round
#: total compares like-for-like even as HEADLINE grows — the top-level
#: "value" covers everything run this round. An explicit list, not a
#: HEADLINE slice: reordering HEADLINE must not change what this means.
R2_COMPARABLE = [
    "flagship_regional_revenue",
    "q1_pricing_summary",
    "top_orders_per_customer",
    "events_sessionization",
    "events_asof_last_click",
    "docs_minhash_neardup",
    "docs_simhash_neardup",
    "documents_clean_corpus",
    "emb_knn_bruteforce",
    "emb_lsh_neardup_pairs",
    "warehouse_merge_batch",
]


def _bench_merge_batch(spark, sf_dir: str, warm_dir: str | None = None) -> float:
    """Time one partition-pruned MERGE micro-batch: ~40 updated keys
    into a 256-bucket orders table — the streaming path's steady-state
    shape, where the batch touches a small fraction of the partitions
    and the merge cost is proportional to the touched fraction, not
    the table size. Table build is setup, only the merge is timed; a
    full build+merge at the smoke scale runs first so the timed merge
    doesn't carry one-time codegen cost (same policy as the query
    warmup pass)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.merge import ParquetWarehouse

    def _run(data_dir: str) -> float:
        tmp = tempfile.mkdtemp(prefix="bench-wh-")
        try:
            wh = ParquetWarehouse(spark, tmp)
            orders = spark.read.parquet(f"{data_dir}/orders.parquet")
            wh.overwrite_partitioned("orders", orders, ["o_orderkey"], n_buckets=256)
            batch = orders.filter(F.col("o_orderkey") % 3733 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1
            )
            t0 = time.perf_counter()
            wh.merge_upsert("orders", batch, ["o_orderkey"])
            return round(time.perf_counter() - t0, 4)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if warm_dir:
        _run(warm_dir)  # warmup: result discarded
    return _run(sf_dir)


def _bench_image_neardup(spark, sf_dir: str) -> float:
    """Time the perceptual image near-dup tier (VERDICT r10 #7 — the
    one §2.10 family with pytest coverage but no bench presence):
    ``image_neardup_pairs`` (dHash → 4×16-bit band-blocked equi-join →
    exact hamming verify) over a synthetic BMP corpus sized ∝ sf
    (20 000·sf images, min 200; half are one-pixel-perturbed copies of
    the other half, so the banded join has real work at every scale).
    Corpus synthesis + cache is setup, OUTSIDE the timed region —
    timed is decode+hash+join+verify, min of 2 like the headline rows;
    the per-call cached dHash frame is released between runs so run 2
    re-pays the Python decode pass honestly."""
    import numpy as np

    from data_engineer_challenge_spark.operators.codecs import encode_bmp
    from data_engineer_challenge_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_neardup_pairs,
    )
    from data_engineer_challenge_spark.operators.text_dedup import (
        release_cached,
    )

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n = max(200, int(20000 * sf))
    n_base = n // 2
    rng = np.random.default_rng(1105)
    bases = rng.integers(0, 256, size=(n_base, 32, 32, 3), dtype=np.uint8)
    rows = []
    for i in range(n):
        img = bases[i % n_base]
        if i >= n_base:  # near-dup twin: one pixel flipped
            img = img.copy()
            img[i % 32, (i // 7) % 32] ^= 0xFF
        rows.append(
            (i, "image", bytes(encode_bmp(img)), ("image/bmp", 32, 32, None))
        )
    media = (
        spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32).cache()
    )
    media.count()  # materialize the corpus before timing starts
    try:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            image_neardup_pairs(media).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = time.perf_counter() - t0
            release_cached()  # drop the per-call cached dHash frame
            best = elapsed if best is None else min(best, elapsed)
    finally:
        media.unpersist()
    return round(best, 4)


def _bench_refresh_delta_tick(spark, sf_dir: str) -> float:
    """Steady-state delta-refresh tick (the build-once-probe-many
    discipline applied to continuous curation): the headline
    `docs_curation_refresh_delta` row is the composed PROOF (three
    ticks + seven commits under the driver's hash); this row is what
    a deployment actually pays per refresh — corpus seeded and
    bootstrap-scored as setup OUTSIDE the timer, then one ~5%-append
    incremental tick timed. Two disjoint append batches give min-of-2
    without replay no-ops polluting the timing."""
    from data_engineer_challenge_spark.operators.snapshot import (
        SnapshotTable,
    )
    from data_engineer_challenge_spark.plans.helpers import scratch_dir
    from data_engineer_challenge_spark.streaming.ingest import (
        curation_refresh_delta_tick,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    corpus = SnapshotTable(spark, scratch_dir("bench_crd_corpus_"))
    sel = SnapshotTable(spark, scratch_dir("bench_crd_sel_"))
    state = scratch_dir("bench_crd_state_")
    corpus.append(docs.where("doc_id % 10 != 0"), txn="seed")
    curation_refresh_delta_tick(spark, corpus, sel, state)  # bootstrap
    best = None
    for i in range(2):
        corpus.append(
            docs.where(f"doc_id % 10 = 0 and (doc_id div 10) % 2 = {i}"),
            txn=f"b{i}",
        )
        t0 = time.perf_counter()
        r = curation_refresh_delta_tick(spark, corpus, sel, state)
        elapsed = time.perf_counter() - t0
        if not r["fired"]:
            raise SystemExit("bench: delta tick did not fire")
        spark.catalog.clearCache()
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 4)


def _bench_index_serving(spark, sf_dir: str) -> tuple[dict, dict]:
    """Build-once-probe-many (r8, VERDICT r7 #3): the registered
    ``inverted_index_probe`` / ``ivf_index_probe`` rows rebuild a
    throwaway index per call — right for the hash check, but it
    conflates the one-off build with the serving path. Here each
    index builds ONCE (timed, reported under ``index_builds``), then
    the probe runs three times against the prebuilt store and the
    min lands as a headline row — the number that makes the indexes'
    reason-to-exist measurable (probe ≪ corpus recompute)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )
    from data_engineer_challenge_spark.plans.similarity import (
        _IVF_CENTROIDS,
    )
    from data_engineer_challenge_spark.plans.text import (
        _BM25_B, _BM25_K1, _BM25_TERMS, _BM25_TOPK,
    )

    builds: dict[str, float] = {}
    probes: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="bench-idx-")

    def _min_of(fn, runs: int = 3, cleanup=None) -> float:
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            e = time.perf_counter() - t0
            if cleanup is not None:
                cleanup()  # drop probe-internal caches BETWEEN runs —
                # a warm-cache repeat would overstate the serving claim
            best = e if best is None else min(best, e)
        return round(best, 4)

    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.perf_counter()
        tidx = InvertedTextIndex(spark, os.path.join(root, "text"))
        tidx.build(docs)
        builds["inverted_index_build"] = round(time.perf_counter() - t0, 4)
        probes["inverted_index_probe_only"] = _min_of(
            lambda: tidx.probe(
                _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK
            )
        )
        # the hybrid retriever's serving shape: sparse branch through
        # the SAME prebuilt index + the dense branch + RRF fusion —
        # the registered docs_hybrid_rrf_via_index row is honest
        # build+probe, this is the per-query-set cost it amortizes to
        from data_engineer_challenge_spark.plans.similarity import (
            _hybrid_fuse,
        )

        probes["hybrid_rrf_probe_only"] = _min_of(
            lambda: _hybrid_fuse(
                spark,
                sf_dir,
                tidx.probe(
                    _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, topk=_BM25_TOPK
                ).select("doc_id", F.col("rank").alias("r_sparse")),
            )
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        vidx = IVFVectorIndex(
            spark, os.path.join(root, "ivf"), _IVF_CENTROIDS
        )
        vidx.build(emb)
        builds["ivf_index_build"] = round(time.perf_counter() - t0, 4)
        queries = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        probes["ivf_index_probe_only"] = _min_of(
            lambda: vidx.probe(queries, k=10, n_probe=12)
        )

        # the IVF-PQ member (r9): coded store built once, the ADC
        # probe's candidate scan reads only the 4-bit code columns
        from data_engineer_challenge_spark.plans.pq_codebooks import (
            CODEBOOKS as _PQ_CB,
        )

        t0 = time.perf_counter()
        pidx = IVFVectorIndex(
            spark,
            os.path.join(root, "ivfpq"),
            _IVF_CENTROIDS,
            pq_codebooks=_PQ_CB,
        )
        pidx.build(emb)
        builds["ivfpq_index_build"] = round(time.perf_counter() - t0, 4)
        probes["ivfpq_probe_only"] = _min_of(
            lambda: pidx.probe_adc(
                queries, k=10, n_probe=12, shortlist=60
            )
        )

        # the residual-coded twin (r11): same quantizer/probe config,
        # codes cover the coarse-quantizer residual under the frozen
        # residual-trained codebooks — the measured-better serving
        # option (SCALE.md's raw-vs-residual table); its probe cost
        # differs from ivfpq_probe_only only by the (query x cell)
        # ⟨q, c⟩ correction riding the probe plan
        from data_engineer_challenge_spark.plans.pq_residual_codebooks import (  # noqa: E501
            RESIDUAL_CODEBOOKS as _PQ_RCB,
        )

        t0 = time.perf_counter()
        ridx = IVFVectorIndex(
            spark,
            os.path.join(root, "ivfpq_res"),
            _IVF_CENTROIDS,
            pq_codebooks=_PQ_RCB,
            pq_residual=True,
        )
        ridx.build(emb)
        builds["ivfpq_residual_index_build"] = round(
            time.perf_counter() - t0, 4
        )
        probes["ivfpq_residual_probe_only"] = _min_of(
            lambda: ridx.probe_adc(
                queries, k=10, n_probe=12, shortlist=60
            )
        )

        # the dedup family member: MinHashIndex over 80% of the
        # corpus, the 20% micro-batch probed against the prebuilt
        # store (the dedup_index_probe split, same rationale)
        from data_engineer_challenge_spark.operators.dedup_index import (
            MinHashIndex,
        )

        t0 = time.perf_counter()
        midx = MinHashIndex(spark, os.path.join(root, "minhash"))
        midx.build(docs.filter(F.col("doc_id") % 5 != 0))
        builds["minhash_index_build"] = round(time.perf_counter() - t0, 4)
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        probes["minhash_index_probe_only"] = _min_of(
            lambda: midx.probe(batch), cleanup=midx.release
        )

        # the passage-dedup member (r9, VERDICT r8 #6 — the last
        # persisted index without a serving split): WindowHashIndex
        # over the same 80% of the corpus, the held-out 20% batch
        # probed for already-indexed spans. The probe's pruning claim
        # (≤ touched h_bucket= partitions, broadcast window join) gets
        # its number here; probe() caches and releases internally, so
        # no cleanup hook is needed between runs.
        from data_engineer_challenge_spark.operators.passage import (
            WindowHashIndex,
        )

        t0 = time.perf_counter()
        widx = WindowHashIndex(spark, os.path.join(root, "windowhash"))
        widx.append(docs.filter(F.col("doc_id") % 5 != 0))
        builds["windowhash_index_build"] = round(
            time.perf_counter() - t0, 4
        )
        probes["windowhash_probe_only"] = _min_of(
            lambda: widx.probe(batch)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return builds, probes


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    # console progress bars helped head-truncate BENCH_r12.json (the
    # driver's tail capture keeps the last ~2 KB of output; progress
    # frames pushed the artifact's head out) — the bench session runs
    # silent (r13, VERDICT r12 #5)
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    plans.all_queries()  # load + enforce the 50-row driver cap
    # bench over the FULL registry: pytest-oracled (driver=False)
    # entries like events_heavy_hitters are headline-benchable too
    queries = {n: s.builder for n, s in plans.REGISTRY.items()}
    missing = [n for n in HEADLINE if n not in queries]
    if missing:
        # fail LOUD: silently dropping a renamed headline entry would
        # shrink the totals and read as a phantom speedup across rounds
        raise SystemExit(f"bench: headline queries not in registry: {missing}")
    names = list(HEADLINE)

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
        spark.catalog.clearCache()  # warm code paths, not cached data

    # METHOD (frozen since r2, do not change between rounds): min of
    # two runs per query — the queries are deterministic, so the lower
    # time is the truer data-scale cost and the higher one is GC /
    # machine-noise (this box is shared); each run is self-contained —
    # caches clear between runs. (r1 was single-run; r1→r2 comparisons
    # carry that method change, r2 onward are like-for-like.)
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            # materialize every row/column, no driver-transfer cost
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 4)
    timings["warehouse_merge_batch"] = _bench_merge_batch(
        spark, sf_dir, warm_dir=warm_dir if os.path.isdir(warm_dir) else None
    )
    # r11 addition: the multimodal perceptual-dedup tier over a
    # synthetic BMP corpus (decode+dhash+banded join+verify)
    timings["image_neardup_pairs"] = _bench_image_neardup(spark, sf_dir)
    # r11 addition: the steady-state incremental refresh (setup
    # outside the timer; the composed proof row above carries the
    # whole three-tick story)
    timings["curation_delta_tick_only"] = _bench_refresh_delta_tick(
        spark, sf_dir
    )
    index_builds, probe_timings = _bench_index_serving(spark, sf_dir)
    timings.update(probe_timings)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    anchors = {
        n: timings[n]
        for n in CALIBRATION_ANCHORS_IDLE
        if n in timings
    }
    ratios = [
        timings[n] / ref
        for n, ref in CALIBRATION_ANCHORS_IDLE.items()
        if n in timings and ref > 0
    ]
    load_factor = (
        round(
            math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3
        )
        if ratios
        else None
    )
    full_payload = (
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "r2_comparable_subtotal": round(
                    sum(t for n, t in timings.items() if n in R2_COMPARABLE), 4
                ),
                # one-off index construction, reported OUTSIDE the
                # headline total (the probe-only rows above are in it)
                "index_builds": index_builds,
                # self-calibration (VERDICT r11 #7): this run's
                # anchor measurements vs their pinned idle levels;
                # anchor_load_factor is the geometric mean ratio —
                # ≈1.0 on an idle box, >1 under load. Totals divide
                # by it for cross-round comparison without post-hoc
                # notes.
                "calibration": {
                    "anchors_sec": anchors,
                    "anchors_idle_ref_sec": CALIBRATION_ANCHORS_IDLE,
                    "anchor_load_factor": load_factor,
                },
            }
    )
    print(json.dumps(full_payload))
    # local full artifact (r14, VERDICT r13 #8): the driver's tail
    # capture head-cuts the full per-query line, so round-over-round
    # diffs depended on regex recovery. Persist the complete payload
    # in-repo; commit it alongside the round's bench run.
    try:
        with open(
            os.path.join(REPO_ROOT, "tools", "bench_last.json"), "w"
        ) as fh:
            json.dump(full_payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # read-only checkout must not kill the bench
        print(f"bench_last.json not written: {exc}", file=sys.stderr)
    # truncation armor, r15 ordering (VERDICT r14 #2): r13 printed the
    # compact total-only line LAST, which protected the totals from a
    # head-cut tail capture — but the driver parses exactly the FINAL
    # line, so its per-query comparison came back empty (PERF_r14
    # per_query: {}). The contract intent is "the last line is THE
    # result", so the FINAL line now carries the per-query map itself,
    # kept tail-capture-small (2-dp rounding, no spaces, calibration
    # block reduced to the factor; ~1.6 KB for 53 rows — measured
    # against the ~2 KB capture window). The compact total-only line
    # moves to SECOND-TO-LAST as the fallback for a window that still
    # cuts the final line's head.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "r2_comparable_subtotal": round(
                    sum(
                        t
                        for n, t in timings.items()
                        if n in R2_COMPARABLE
                    ),
                    4,
                ),
                "anchor_load_factor": load_factor,
                "compact": "per-query timings are in the full JSON "
                "line above and the final line below",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": {n: round(t, 2) for n, t in timings.items()},
                "sf": sf,
                "r2_comparable_subtotal": round(
                    sum(
                        t
                        for n, t in timings.items()
                        if n in R2_COMPARABLE
                    ),
                    2,
                ),
                "index_builds": {
                    n: round(t, 2) for n, t in index_builds.items()
                },
                "anchor_load_factor": load_factor,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
