"""10× scale smoke (VERDICT r5 #8): evidence, not a gate.

Synthesizes a ~sf1 corpus from sf0.1 — 10 copies of ``documents`` with
offset ids and a per-copy consonant/vowel rotation (``F.translate``)
so copies are textually unrelated (cross-copy Jaccard collapses and
the near-dup structure stays per-copy-shaped instead of exploding into
10-way clique pairs), and 10 copies of ``embeddings`` with offset ids
and a per-copy affine perturbation. Runs the dedup/ANN headline
builders at both scales with bench.py's method (sf0.001 warmup, noop
sink, min of two timed runs) and rewrites SCALE.md with wall-times,
output rows, and the MinHash candidate→survivor funnel.

Usage: python tools/scale_smoke.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale10"
COPIES = 10
OUT30 = "/tmp/scale30"
COPIES30 = 30
# full [a-z0-9] Caesar rotation (step 3 per copy): EVERY token
# changes between copies, so cross-copy Jaccard/SimHash similarity
# collapses and the near-dup structure stays per-copy-shaped instead
# of exploding into 10-way clique pairs
ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"

QUERIES = [
    "doc_unigram_surprisal",
    "docs_minhash_neardup",
    "docs_simhash_neardup",
    "documents_clean_corpus",
    "docs_neardup_clusters",
    "doc_fingerprint_winnowing",
    "docs_fingerprint_overlap_pairs",
    "emb_ivf_topk",
    "emb_quantized_knn",
    "emb_lsh_neardup_pairs",
    # r6 late additions: retrieval, segment dedup, export sharding,
    # and the events tier (heavy hitters / sessionization / the
    # point-in-time feature assembly) — the keyed-shuffle shapes the
    # first table's map-heavy dedup plans don't exercise
    "docs_bm25_search",
    "docs_segment_dedup",
    "docs_exact_substring_dedup",
    "docs_range_sharded_export",
    "events_heavy_hitters",
    "events_sessionization",
    "events_training_examples",
    # r7 addition: DSIR selection (three token passes + one doc_id
    # shuffle; the 4096-row model is corpus-size-free)
    "docs_dsir_selection",
    # r8 addition: learned quality scorer (one gram pass, 256-row
    # weight broadcast, one per-doc aggregate — should be among the
    # flattest ratios in the table)
    "docs_quality_classifier",
]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(COPIES):
        r = (i * 3) % len(ALPHA)
        rot = ALPHA[r:] + ALPHA[:r]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                F.translate("text", ALPHA, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUT}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(COPIES):
        # rotate the components by i positions: norm-preserving,
        # decorrelates copies (cosine between a vector and its
        # rotation is ~0 for generic vectors), identity for i=0
        k = i % dim
        vec = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice("embedding", k + 1, dim - k),
                F.slice("embedding", 1, k),
            )
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 100_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUT}/embeddings.parquet")

    # events x10: user/event ids offset per copy, so the distinct-user
    # universe really grows 10x (15,000 at 10x — deliberately PAST the
    # lg_k=14 sketch's ~12k exact-coupon promotion point, so the 10x
    # run exercises the dense estimator the oracle regime never does)
    from data_engineer_challenge_spark.tables import load_table

    # load_table, not a raw parquet read: it owns the events.ts
    # nanos/micros footer sniff — driver testdata has shipped both
    ev = load_table(spark, BASE, "events")
    parts = []
    for i in range(COPIES):
        parts.append(
            ev.withColumn(
                "event_id", F.col("event_id") + i * 100_000_000
            ).withColumn("user_id", F.col("user_id") + i * 100_000_000)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUT}/events.parquet")


def timed(spark, builder, sf_dir: str) -> tuple[float, int]:
    """bench.py's frozen method: builder + noop write inside the
    timer (iterative builders do real work at build time), min of 2,
    caches cleared between runs."""
    from data_engineer_challenge_spark.operators.text_dedup import (
        release_cached,
    )

    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        release_cached()
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    rows = builder(spark, sf_dir).count()
    spark.catalog.clearCache()
    release_cached()
    return round(best, 3), rows


def minhash_funnel(spark, sf_dir: str) -> tuple[int, int]:
    """(candidate pairs, verified survivors) under the registered
    config: threshold→-1 keeps every banded candidate."""
    from data_engineer_challenge_spark.operators.text_dedup import (
        minhash_candidate_pairs,
        release_cached,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(
        shingle_n=2, num_hashes=63, bands=21, max_bucket_size=1000
    )
    cands = minhash_candidate_pairs(
        docs, "doc_id", "text", threshold=-1.0, **kw
    ).count()
    release_cached()
    surv = minhash_candidate_pairs(
        docs, "doc_id", "text", threshold=0.8, **kw
    ).count()
    release_cached()
    return cands, surv


def sketch_accuracy(spark, sf_dir: str) -> tuple[float, float]:
    """(wall sec, max relative error vs exact) for the sketch rollup."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans

    b = plans.REGISTRY["events_distinct_sketch_rollup"].builder
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    b(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    est = {
        r["event_type"]: r["distinct_users"]
        for r in b(spark, sf_dir).collect()
    }
    from data_engineer_challenge_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rel = max(abs(est[k] - exact[k]) / exact[k] for k in exact)
    return round(dt, 3), rel


def quantile_accuracy(spark, sf_dir: str) -> tuple[float, float]:
    """(wall sec, max RANK error vs exact) for the quantile rollup
    under the registered capacity=512 config — at 1x (sf0.1) the
    739-row day groups already compress; at 10x every group does."""
    import numpy as np

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.tables import load_table

    b = plans.REGISTRY["events_value_quantile_rollup"].builder
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    b(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    est = {r["event_type"]: r for r in b(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    worst = 0.0
    for et, row in est.items():
        vals = np.sort(
            np.array(
                [
                    r["value"]
                    for r in ev.where(
                        f"event_type = '{et}' AND value IS NOT NULL"
                    )
                    .select("value")
                    .collect()
                ]
            )
        )
        for name, p in [("p25", 0.25), ("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            rank = float(np.searchsorted(vals, row[name])) / len(vals)
            worst = max(worst, abs(rank - p))
    return round(dt, 3), worst


def kmv_accuracy(spark, sf_dir: str) -> tuple[float, dict]:
    """(wall sec, {metric: (est, exact)}) for the KMV cohort-overlap
    query — 1x cohorts (~750/705 distinct) already exceed k=512; 10x
    is 10x deeper into the estimator regime."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.tables import load_table

    b = plans.REGISTRY["events_cohort_overlap_sketch"].builder
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    b(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r = b(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.where("event_type = 'view' AND value >= 150")
        .select("user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
    )
    bb = (
        ev.where("event_type = 'purchase' AND value >= 150")
        .select("user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
    )
    na, nb = a.count(), bb.count()
    ni = a.intersect(bb).count()
    nu = a.union(bb).distinct().count()
    return round(dt, 3), {
        "n_view_hi": (r["n_view_hi"], na),
        "n_purchase_hi": (r["n_purchase_hi"], nb),
        "n_intersect": (r["n_intersect"], ni),
        "n_union": (r["n_union"], nu),
        "jaccard": (r["jaccard"], ni / nu if nu else 0.0),
    }


def semantic_dedup_scale(spark) -> list[tuple[str, float, int, int]]:
    """(label, sec, pairs, dropped) rows: 1x frozen k=16; 10x frozen
    k=16 (the WRONG shape — fixed quantizer under 10x density, cells
    go quadratic); 10x retrained k=160 (the documented k ∝ N knob:
    per-cell density restored, cost back to ~corpus-linear)."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.similarity import (
        kmeans_centroids,
        nearest_centroid,
        semantic_dedup,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS

    out = []

    def run(label, sf_dir, cents, vectorized=False):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        res = semantic_dedup(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            cents,
            threshold=0.35,
            vectorized_assign=vectorized,
        )
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        dropped = res.where(~F.col("is_kept")).count()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        assigned = emb.withColumn(
            "cell", nearest_centroid(F.col("embedding"), cents)
        )
        sizes = assigned.groupBy("cell").count()
        pairs = sizes.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long")
        ).collect()[0][0]
        out.append((label, round(dt, 3), int(pairs), int(dropped)))

    run("warmup", "/root/testdata/sf0.001", CENTROIDS)
    out.clear()  # warmup pays codegen outside the measurements
    run("1x, frozen k=16", BASE, CENTROIDS)
    run("10x, frozen k=16 (wrong shape)", OUT, CENTROIDS)
    big = spark.read.parquet(f"{OUT}/embeddings.parquet")
    k160 = kmeans_centroids(big, k=160, iters=4, sample_mod=4, vectorized=True)
    run("10x, retrained k=160, expression argmax", OUT, k160)
    # vectorized=None = the DEFAULT path: k=160 >= ARROW_ASSIGN_MIN_K,
    # so the auto-switch takes the Arrow kernel with no caller opt-in
    run(
        "10x, retrained k=160, default path (auto Arrow kernel)",
        OUT,
        k160,
        vectorized=None,
    )
    return out


def build_corpus30(spark) -> None:
    """30x documents + embeddings only (the 30x tier skips events).

    Rotation step is 5 per copy (gcd(5, 36) = 1, so all 30 copies get
    DISTINCT [a-z0-9] rotations — the 10x builder's step-3 would
    collide at copy 12 and fabricate exact cross-copy duplicates);
    embeddings rotate components by copy index (distinct for 30 copies
    at dim >= 30, norm-preserving, decorrelating)."""
    from pyspark.sql import functions as F

    shutil.rmtree(OUT30, ignore_errors=True)
    os.makedirs(OUT30)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(COPIES30):
        r = (i * 5) % len(ALPHA)
        rot = ALPHA[r:] + ALPHA[:r]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                F.translate("text", ALPHA, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUT30}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(COPIES30):
        k = i % dim
        vec = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice("embedding", k + 1, dim - k),
                F.slice("embedding", 1, k),
            )
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 100_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUT30}/embeddings.parquet")


#: the volume-binding tier the 30x smoke re-measures (VERDICT r6 #6):
#: the 10x table is fixed-overhead-dominated; 30x starts binding data
#: volume on exactly the dedup/ANN paths the 100 TB narrative leans on
QUERIES30 = [
    "docs_minhash_neardup",
    "docs_exact_substring_dedup",
    "emb_semantic_dedup",
    "ivf_index_probe",
    # r7 selection flagship: three token passes + a corpus-size-free
    # 4096-row model — should stay near-linear as volume binds
    "docs_dsir_selection",
    # r9 (VERDICT r8 #7): the composed three-stage flagship — the
    # "what this engine is for" pipeline gets its volume datapoints
    "docs_curation_funnel",
    # r9: the PQ/ADC tier. r10: past 1000 vectors the registered row
    # runs the Arrow kernels (bit-identical, pinned), so both scales
    # here measure the kernel path — the ratio is now genuine data
    # volume, not the r9 expression-compile wall (which was +2% for
    # 10x by EXPLAIN.md's receipt and is gone from this config)
    "emb_pq_adc_knn",
    # r11 (VERDICT r10 #5): the dataloader composition — epoch
    # shuffle feeding sequence packing, two windows on ONE shard
    # partitioning (single exchange, plan-pinned); should scale like
    # a lone partitioned window
    "docs_shuffled_packing",
]


def ivfpq_serving(spark, sf_dir, root, cents, n_probe) -> dict:
    """IVF-PQ index-resident serving at a synthetic tier (VERDICT r9
    #4; generalized across tiers at r11 for VERDICT r10 #1) — build
    the PQ-coded store ONCE under the tier's memoized k ∝ N
    quantizer, then measure probe_adc (Arrow ADC kernel, codes-only
    pruned scan, exact rescore) on the standard query set, with
    recall@10 vs exact brute force and the pruned-list fraction
    beside the wall. The shortlist width is the measured decision
    (select_adc_width at the 0.75 floor the sf0.1 pin enforces).
    Also measures the PLAIN (uncoded) pruned probe on the same store
    — pruning-only recall, isolating the list-pruning approximation
    from the ADC one the composed number carries."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.perf_counter()
    width = IVFVectorIndex.select_adc_width(emb, CODEBOOKS, 0.75)
    width_s = round(time.perf_counter() - t0, 3)
    _shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    idx = IVFVectorIndex(spark, root, cents, pq_codebooks=CODEBOOKS)
    idx.build(emb)
    build_s = round(time.perf_counter() - t0, 3)
    queries = emb.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk_vectorized(
            queries,
            emb.select(F.col("vec_id").alias("c_id"), "embedding"),
            k=10,
        ).collect()
    }
    walls = []
    got = set()
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got = {
            (r["q_id"], r["c_id"])
            for r in idx.probe_adc(
                queries, k=10, n_probe=n_probe, shortlist=width
            ).collect()
        }
        walls.append(time.perf_counter() - t0)
    plain_walls = []
    got_plain = set()
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got_plain = {
            (r["q_id"], r["c_id"])
            for r in idx.probe(
                queries, k=10, n_probe=n_probe
            ).collect()
        }
        plain_walls.append(time.perf_counter() - t0)
    # interactive serving: ONE query through the same store/config —
    # the latency floor a dataloader or API caller sees (the batch
    # rows above amortize planning across the query set)
    one = queries.orderBy("q_id").limit(1).localCheckpoint()
    single_walls = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        idx.probe_adc(
            one, k=10, n_probe=n_probe, shortlist=width
        ).collect()
        single_walls.append(time.perf_counter() - t0)
    return {
        "single_q_s": round(min(single_walls), 3),
        "build_s": build_s,
        "probe_s": round(min(walls), 3),
        "recall": len(got & exact) / len(exact),
        "probe_plain_s": round(min(plain_walls), 3),
        "recall_plain": len(got_plain & exact) / len(exact),
        "n_probe": n_probe,
        "k": len(cents),
        "shortlist": width,
        "width_s": width_s,
        "n": emb.count(),
        "n_queries": queries.count(),
    }


def rebucket_cost(spark) -> list[tuple[str, int, int, float]]:
    """maybe_rebucket rewrite cost at two store sizes (VERDICT r9
    #7): the 2x-growth trigger amortizes the O(N) rewrite to O(1) per
    appended row ONLY if the rewrite itself stays ~linear in store
    size — measure it. Each store builds under the frozen k=16
    quantizer (the grown-small-store scenario), then a forced
    maybe_rebucket at the production 256-rows/list target retrains
    k = ceil(N/256) and rewrites everything; the wall divides by rows
    for the per-row figure the amortization claim needs."""
    import shutil as _shutil

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS

    if not os.path.isdir(f"{OUT}/embeddings.parquet"):
        build_corpus(spark)  # tier30-only invocation: 10x not built yet
    rows = []
    for tier, sf_dir in (("10x", OUT), ("30x", OUT30)):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        root = f"/tmp/scale_rebucket_{tier}"
        _shutil.rmtree(root, ignore_errors=True)
        idx = IVFVectorIndex(spark, root, [list(c) for c in CENTROIDS])
        idx.build(emb)
        n = emb.count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fired = idx.maybe_rebucket(
            min_n=1000, target_list_size=256, growth_factor=1.0
        )
        wall = time.perf_counter() - t0
        assert fired, (tier, n)
        rows.append((tier, int(n), int(idx.meta["k"]), round(wall, 3)))
    return rows


def refresh_delta(spark, sf_dir: str, root: str) -> dict:
    """Funnel + refresh composition with the delta path
    (VERDICT r9 #8, following #1): seed a corpus SnapshotTable with
    the 30x documents, run the initial delta-tick (scores everything
    once), append a 1% delta, and measure the incremental refresh
    against a full funnel recompute over the same final corpus —
    asserting the committed mix is IDENTICAL (the tick test's
    bit-identity contract, held at this tier too) and reporting
    per-stage survivor counts plus how much of the corpus table the
    delta tick actually read."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.snapshot import (
        SnapshotTable,
    )
    from data_engineer_challenge_spark.plans.text import curation_funnel
    from data_engineer_challenge_spark.streaming.ingest import (
        curation_refresh_delta_tick,
    )

    _shutil.rmtree(root, ignore_errors=True)
    docs30 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    corpus = SnapshotTable(spark, f"{root}/corpus")
    corpus.append(docs30, txn="load-1")
    sel = SnapshotTable(spark, f"{root}/sel")

    t0 = time.perf_counter()
    r1 = curation_refresh_delta_tick(spark, corpus, sel, f"{root}/state")
    initial_s = round(time.perf_counter() - t0, 3)

    # 1% delta: fresh ids, fresh text (rotation no existing copy
    # uses). The offset must clear EVERY tier's id space: copies use
    # +i*1e8, so the 100x corpus reaches ~9.9e9 — 5e10 is safely past
    # (7.7e9 collided with copy 77 and made the corpus carry duplicate
    # doc_ids, which voids the funnel's unique-id contract)
    base_docs = spark.read.parquet(f"{BASE}/documents.parquet")
    delta = base_docs.where("doc_id % 100 < 3").select(
        (F.col("doc_id") + 50_000_000_000).alias("doc_id"),
        "lang",
        F.translate("text", ALPHA, ALPHA[7:] + ALPHA[:7]).alias("text"),
    )
    corpus.append(delta, txn="load-2")

    t0 = time.perf_counter()
    r2 = curation_refresh_delta_tick(spark, corpus, sel, f"{root}/state")
    delta_s = round(time.perf_counter() - t0, 3)

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    full = curation_funnel(corpus.read())
    full_rows = sorted(map(tuple, full.collect()))
    full_s = round(time.perf_counter() - t0, 3)
    got = sorted(map(tuple, sel.read().collect()))
    assert got == full_rows, "delta refresh diverged from full funnel"

    # stage survivors of the refreshed (post-append) corpus, from the
    # tick's own state logs: corpus rows, gate-kept live docs, unique
    # fingerprints among them, selected
    stats = SnapshotTable(spark, f"{root}/state/stats").read()
    from pyspark.sql.window import Window as _W

    live = (
        stats.withColumn(
            "__rn",
            F.row_number().over(
                _W.partitionBy("doc_id").orderBy(F.col("__v").desc())
            ),
        )
        .where("__rn = 1")
        .where(~F.col("__dead"))
        .localCheckpoint()  # consumed twice below
    )
    n_corpus = corpus.read().count()
    n_kept = live.where("is_kept").count()
    n_uniq = (
        live.where("is_kept").select("fingerprint").distinct().count()
    )
    return {
        "initial_s": initial_s,
        "delta_s": delta_s,
        "full_s": full_s,
        "scored_initial": r1["docs_scored"],
        "scored_delta": r2["docs_scored"],
        "delta_files": len(r2["corpus_files"]),
        "corpus_files": len(corpus.read().inputFiles()),
        "stages": (n_corpus, n_kept, n_uniq, len(got)),
    }


def funnel_stages(spark, sf_dir: str) -> tuple[int, int, int, int]:
    """Per-stage survivor counts for the curation funnel (VERDICT r8
    #7): (corpus docs, gate-kept, post-dedup unique, selected). The
    stage kernels are the production ones (with_quality_score, the
    keep-first fingerprint rule, the _FUNNEL_TOPK cap) — only counted
    here, the timed row runs the full composition."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.plans.text import (
        _FUNNEL_TOPK, _WS, with_quality_score,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    kept = with_quality_score(docs).where(F.col("is_kept"))
    n_kept = kept.count()
    norm = F.trim(F.regexp_replace(F.lower("text"), _WS + "+", " "))
    n_uniq = (
        kept.select(F.md5(norm.cast("binary")).alias("fp"))
        .distinct()
        .count()
    )
    return n, n_kept, n_uniq, min(_FUNNEL_TOPK, n_uniq)


OUT100 = "/tmp/scale100"
COPIES100 = 100

#: the 100x tier (VERDICT r7 #7): two orders of magnitude on the two
#: cheapest flagship dedup paths — the ones whose 30x ratios (2.03x /
#: 3.28x) carried the 100 TB narrative
QUERIES100 = [
    "docs_minhash_neardup",
    "docs_exact_substring_dedup",
    # r8: the learned quality scorer — the funnel's cheapest stage
    # should show the flattest two-orders-of-magnitude ratio
    "docs_quality_classifier",
    # r9 (VERDICT r8 #7): the composed funnel at two orders of
    # magnitude, with per-stage survivor counts
    "docs_curation_funnel",
]


def build_corpus100(spark) -> None:
    """100x documents only (both tier-100 queries read documents).

    The rotation family tops out at 36 distinct copies (|[a-z0-9]|),
    so 100 copies use per-copy SEEDED RANDOM PERMUTATIONS of the
    alphabet instead: still a token bijection (within-copy near-dup
    structure preserved exactly), but every copy's mapping is distinct
    and two copies agree on a token only if every character maps
    identically — cross-copy Jaccard collapses just like the rotation
    tiers (cross-copy verified pairs are 0, funnel-checked)."""
    import random

    from pyspark.sql import functions as F

    shutil.rmtree(OUT100, ignore_errors=True)
    os.makedirs(OUT100)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(COPIES100):
        perm = list(ALPHA)
        random.Random(i).shuffle(perm)
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                F.translate("text", ALPHA, "".join(perm)).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.parquet(f"{OUT100}/documents.parquet")


OUT100V = "/tmp/scale100vec"
VEC_COPIES100 = 100


def build_corpus100_vec(spark) -> None:
    """100x embeddings (VERDICT r10 #1): ~200,000 vectors — the first
    vector tier where data volume, not fixed cost, can bind (the
    driver corpus is 500–2,000 rows; 30x topped out at 60k).

    Per-copy component rotations top out at ``dim`` distinct copies,
    so every copy ALSO multiplies by a per-copy seeded Rademacher ±1
    sign pattern: bitwise norm-preserving (±x negates, never rounds),
    and any two copies of one base vector decorrelate in expectation
    (E[cos] over a random sign pattern is 0) even where their
    rotation indices collide. Copy 0 is the identity — the base
    corpus embeds verbatim."""
    import random

    from pyspark.sql import functions as F

    shutil.rmtree(OUT100V, ignore_errors=True)
    os.makedirs(OUT100V)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(VEC_COPIES100):
        k = (i * 7) % dim
        vec = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice("embedding", k + 1, dim - k),
                F.slice("embedding", 1, k),
            )
        )
        if i:
            rng = random.Random(4000 + i)
            signs = F.array(
                *[
                    F.lit(1.0 if rng.random() < 0.5 else -1.0)
                    for _ in range(dim)
                ]
            )
            vec = F.zip_with(
                vec, signs, lambda x, s: (x * s).cast("float")
            )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 100_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.parquet(f"{OUT100V}/embeddings.parquet")


def tier100_vec(spark) -> dict:
    """The 100x VECTOR tier (VERDICT r10 #1): ~200k vectors through
    the scale-aware defaults — the memoized k ∝ N quantizer retrain
    (`_corpus_quantizer`, shared by `ivf_index_probe` and
    `emb_semantic_dedup`), the recall-target `select_n_probe` sweep,
    `select_adc_width`, and `probe_adc` serving — with recall@10
    columns vs exact brute force and the one-off retrain cost called
    out separately (every registered row below measures the
    AMORTIZED path; the retrain is paid once per corpus)."""
    from pyspark.sql import functions as F  # noqa: F401

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )

    build_corpus100_vec(spark)
    emb = spark.read.parquet(f"{OUT100V}/embeddings.parquet")
    n = emb.count()

    t0 = time.perf_counter()
    cents, np_def = _corpus_quantizer(OUT100V, emb)
    retrain_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    np_sel = IVFVectorIndex.select_n_probe(emb, cents, 0.90)
    npsel_s = round(time.perf_counter() - t0, 3)

    rows = []
    for name in ("ivf_index_probe", "emb_semantic_dedup"):
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t100, n100 = timed(spark, b, OUT100V)
        rows.append((name, t1, n1, t100, n100, round(t100 / t1, 2)))
        print("100xvec", name, t1, n1, t100, n100, flush=True)

    ivfpq = ivfpq_serving(
        spark, OUT100V, "/tmp/scale100_ivfpq", cents, np_sel
    )
    return {
        "n": n,
        "k": len(cents),
        "retrain_s": retrain_s,
        "np_def": np_def,
        "np_sel": np_sel,
        "npsel_s": npsel_s,
        "rows": rows,
        "ivfpq": ivfpq,
    }


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def refresh_log_growth(spark) -> dict:
    """Delta-refresh state-log growth bound (VERDICT r10 #6): drive
    50 REWRITE ticks (delete_where + re-append of a 500-doc slice —
    re-scored docs are what accrete superseded log rows; a pure
    append adds only live rows) against a 30x-seeded corpus, once
    with the default housekeeping (compact_every=16) and once with
    none, recording tick wall / current-log rows / current-version
    bytes at checkpoints — so "answers never depend on housekeeping"
    carries a cost curve showing what it buys. Copy-0's 5,000 docs
    seed as ten slice-aligned 500-doc commits so each tick's
    delete_where prunes to one directory (the documented COW shape);
    bytes are the CURRENT log version's files (what the rank pass
    reads) — total on-disk additionally retains superseded versions
    for time travel, a retention-policy knob, not a read cost."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.snapshot import (
        SnapshotTable,
    )
    from data_engineer_challenge_spark.streaming.ingest import (
        curation_refresh_delta_tick,
    )

    docs30 = spark.read.parquet(f"{OUT30}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    checkpoints = (1, 10, 25, 50)

    def _live_mb(table: SnapshotTable) -> float:
        return round(
            sum(
                os.path.getsize(p.replace("file:", ""))
                for p in table.read().inputFiles()
            )
            / 1e6,
            1,
        )

    out: dict = {}
    for label, compact_every in (
        ("compact_every=16 (default)", 16),
        ("no housekeeping", None),
    ):
        root = (
            "/tmp/scale30_loggrowth_"
            + ("hk" if compact_every else "none")
        )
        _shutil.rmtree(root, ignore_errors=True)
        corpus = SnapshotTable(spark, f"{root}/corpus")
        for s in range(10):  # slice-aligned commits: COW prunes to one
            corpus.append(
                docs30.where(
                    f"doc_id >= {500 * s} and doc_id < {500 * (s + 1)}"
                ).coalesce(1),
                txn=f"seed-{s}",
            )
        corpus.append(docs30.where("doc_id >= 5000"), txn="seed-rest")
        sel = SnapshotTable(spark, f"{root}/sel")
        state = f"{root}/state"
        curation_refresh_delta_tick(
            spark, corpus, sel, state, compact_every=compact_every
        )
        stats = SnapshotTable(spark, f"{state}/stats")
        grams = SnapshotTable(spark, f"{state}/grams")
        rows = []
        for t in range(1, 51):
            s = (t - 1) % 10
            lo, hi = 500 * s, 500 * (s + 1)
            corpus.delete_where(
                [("doc_id", ">=", lo), ("doc_id", "<", hi)]
            )
            corpus.append(
                docs30.where(f"doc_id >= {lo} and doc_id < {hi}")
                .select(
                    "doc_id",
                    "lang",
                    F.concat(
                        F.col("text"), F.lit(f" rewrite{t}")
                    ).alias("text"),
                )
                .coalesce(1),
                txn=f"t{t}",
            )
            t0 = time.perf_counter()
            r = curation_refresh_delta_tick(
                spark, corpus, sel, state, compact_every=compact_every
            )
            wall = time.perf_counter() - t0
            assert r["fired"] and r["docs_scored"] == 500, (label, t, r)
            if t in checkpoints:
                rows.append(
                    (
                        t,
                        round(wall, 3),
                        stats.read().count(),
                        grams.read().count(),
                        round(_live_mb(stats) + _live_mb(grams), 1),
                    )
                )
        out[label] = rows
        if compact_every:
            # retention datapoint (r11): total on-disk state history
            # before/after an explicit min_age=0 vacuum — what the
            # tick's own age-guarded sweep converges to in a
            # long-running deployment
            before_mb = round(_dir_bytes(state) / 1e6, 1)
            stats.vacuum(keep_versions=1, min_age_seconds=0)
            grams.vacuum(keep_versions=1, min_age_seconds=0)
            out["vacuum"] = (
                before_mb,
                round(_dir_bytes(state) / 1e6, 1),
            )
        _shutil.rmtree(root, ignore_errors=True)
    return out


def tier100(spark) -> tuple:
    """Run the 100x tier; returns (query rows, funnel, stage counts,
    delta-refresh composition)."""
    from data_engineer_challenge_spark import plans

    build_corpus100(spark)
    rows = []
    for name in QUERIES100:
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t100, n100 = timed(spark, b, OUT100)
        rows.append((name, t1, n1, t100, n100, round(t100 / t1, 2)))
        print("100x", name, t1, n1, t100, n100, flush=True)
    c100, s100 = minhash_funnel(spark, OUT100)
    stages100 = funnel_stages(spark, OUT100)
    refresh100 = refresh_delta(spark, OUT100, "/tmp/scale100_refresh")
    return rows, (c100, s100), stages100, refresh100


def ivf_recall30(spark) -> list[tuple[str, float, float]]:
    """(config, probe sec, recall@10 vs exact brute force) at 30x.

    One frozen row (k=16 / n_probe=12, 75% of lists probed — pruning
    barely bites) plus an n_probe SWEEP on a retrained k=240
    quantizer (10% / 20% / 40% of lists). The sweep is the honest
    artifact: the 30x synthetic embeddings are per-copy component
    rotations of random unit vectors — decorrelated, near-uniform on
    the sphere, i.e. the ADVERSARIAL case for IVF (no cluster
    structure for the lists to capture), so recall at a fixed probed
    fraction is a floor, not an estimate of real-corpus behavior."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS

    emb = spark.read.parquet(f"{OUT30}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk(queries, corpus, k=10).collect()
    }
    rows = []
    k240 = kmeans_centroids(emb, k=240, iters=4, sample_mod=8)
    for label, cents, n_probe in [
        ("frozen k=16, n_probe=12 (registered)", CENTROIDS, 12),
        ("retrained k=240, n_probe=24 (10% of lists)", k240, 24),
        ("retrained k=240, n_probe=48 (20% of lists)", k240, 48),
        ("retrained k=240, n_probe=96 (40% of lists)", k240, 96),
    ]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got = {
            (r["q_id"], r["c_id"])
            for r in ivf_topk(
                queries, corpus, n_probe=n_probe, k=10, centroids=cents
            ).collect()
        }
        dt = time.perf_counter() - t0
        rows.append((label, round(dt, 3), len(got & exact) / len(exact)))
    return rows


def tier30(spark) -> tuple:
    """Run the 30x tier; returns (query rows, funnel, recall rows,
    semantic rows, funnel stage counts, n_probe selection info)."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.similarity import (
        nearest_centroid,
    )

    build_corpus30(spark)
    rows = []
    for name in QUERIES30:
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t30, n30 = timed(spark, b, OUT30)
        rows.append((name, t1, n1, t30, n30, round(t30 / t1, 2)))
        print("30x", name, t1, n1, t30, n30, flush=True)

    c30, s30 = minhash_funnel(spark, OUT30)
    recall = ivf_recall30(spark)
    stages30 = funnel_stages(spark, OUT30)

    # r9: emb_semantic_dedup's registered path is now scale-aware (it
    # shares ivf_index_probe's memoized k ∝ N quantizer decision), so
    # the QUERIES30 row above ALREADY measures the default retrained
    # path. This block reports the retrained quantizer's cell-pair
    # statistics, and runs the recall-target n_probe sweep
    # (select_n_probe, VERDICT r8 #4) against the same quantizer.
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )

    emb = spark.read.parquet(f"{OUT30}/embeddings.parquet")
    cents_def, np_def = _corpus_quantizer(OUT30, emb)
    dropped = (
        plans.REGISTRY["emb_semantic_dedup"].builder(spark, OUT30)
        .where(~F.col("is_kept"))
        .count()
    )
    pairs = (
        emb.withColumn(
            "cell", nearest_centroid(F.col("embedding"), cents_def)
        )
        .groupBy("cell")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long"))
        .collect()[0][0]
    )
    sem = [(
        f"30x, registered default (retrained k={len(cents_def)})",
        next(t30 for n, _t1, _n1, t30, _n30, _r in rows
             if n == "emb_semantic_dedup"),
        int(pairs), int(dropped),
    )]
    np_sel = IVFVectorIndex.select_n_probe(emb, cents_def, 0.90)
    nprobe_info = (len(cents_def), np_def, np_sel)
    ivfpq = ivfpq_serving(
        spark, OUT30, "/tmp/scale30_ivfpq", cents_def, np_sel
    )
    rebucket = rebucket_cost(spark)
    refresh = refresh_delta(spark, OUT30, "/tmp/scale30_refresh")
    return (
        rows, (c30, s30), recall, sem, stages30, nprobe_info,
        ivfpq, rebucket, refresh,
    )


def main() -> None:
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    plans._load()
    build_corpus(spark)

    # warmup at smoke scale (bench.py policy: compilation outside the
    # measurement)
    for name in QUERIES:
        try:
            plans.REGISTRY[name].builder(
                spark, "/root/testdata/sf0.001"
            ).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()

    rows_out = []
    for name in QUERIES:
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t10, n10 = timed(spark, b, OUT)
        rows_out.append((name, t1, n1, t10, n10, round(t10 / t1, 2)))
        print(name, t1, n1, t10, n10, flush=True)

    c1, s1 = minhash_funnel(spark, BASE)
    c10, s10 = minhash_funnel(spark, OUT)

    sk1_t, sk1_e = sketch_accuracy(spark, BASE)
    sk10_t, sk10_e = sketch_accuracy(spark, OUT)
    q1_t, q1_e = quantile_accuracy(spark, BASE)
    q10_t, q10_e = quantile_accuracy(spark, OUT)
    kv1_t, kv1 = kmv_accuracy(spark, BASE)
    kv10_t, kv10 = kmv_accuracy(spark, OUT)
    sd_rows = semantic_dedup_scale(spark)
    (t30_rows, (c30, s30), recall30, sem30, stages30, nprobe_info,
     ivfpq30, rebucket30, refresh30) = tier30(spark)
    t100_rows, (c100, s100), stages100, refresh100 = tier100(spark)
    vec100 = tier100_vec(spark)
    lg = refresh_log_growth(spark)

    with open(os.path.join(REPO_ROOT, "SCALE.md"), "w") as f:
        f.write(
            "# SCALE — synthetic 10x smoke (evidence, no gate)\n\n"
            "Corpus: sf0.1 `documents` (5,000 rows) x10 with offset ids "
            "and a per-copy full-[a-z0-9] Caesar rotation (cross-copy "
            "Jaccard collapses, so the near-dup structure stays "
            "per-copy-shaped); `embeddings` (2,000 rows) x10 with "
            "offset ids and per-copy component rotation "
            "(norm-preserving, decorrelating). Method = bench.py's "
            "(warmup at sf0.001, noop sink, min of 2 with caches "
            "cleared). local[32].\n"
            "Generated by tools/scale_smoke.py. NOTE: the two "
            "hash-randomized tiers (simhash, hyperplane-LSH) re-draw "
            "their fingerprints per rotated copy; on template-heavy "
            "synthetic text the near-threshold pair mass is volatile "
            "under a re-hash, so their 10x row counts exceed 10x by "
            "data, not by engine (cross-copy pairs are 0 — verified).\n\n"
            "\n**Reading:** wall-time ratios for 10x data sit well "
            "under 10x — fixed-overhead-dominated, the signature of "
            "shuffle-light partition-parallel plans before volume "
            "binds; Jaccard-verified output rows scale exactly 10x "
            "(rotation is a token bijection). The events rows scale "
            "on offset user ids, so keyed shuffles (sessionization, "
            "the feature-assembly windows, MG heavy hitters) see 10x "
            "distinct keys, not fatter groups. `events_heavy_hitters` "
            "legitimately returns 0 rows at sf0.1 and 10x (1,500+ "
            "users, max share < 1/128 — the support threshold); both "
            "MG passes still run in full, and the sf0.01 driver row "
            "reports 15 real hitters.\n\n"
            "| query | 1x sec | 1x rows | 10x sec | 10x rows | time ratio |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, t1, n1, t10, n10, r in rows_out:
            f.write(f"| `{name}` | {t1} | {n1} | {t10} | {n10} | {r}x |\n")
        f.write(
            "\n## MinHash candidate → survivor funnel "
            "(registered 63-hash/21-band config)\n\n"
            "| scale | banded candidate pairs | verified (j >= 0.8) | "
            "survival |\n|---|---|---|---|\n"
            f"| 1x | {c1} | {s1} | {s1 / max(c1, 1):.2%} |\n"
            f"| 10x | {c10} | {s10} | {s10 / max(c10, 1):.2%} |\n"
        )
        f.write(
            "\n## Distinct-sketch rollup accuracy across the exact/dense "
            "boundary\n\n1x holds 1,500 distinct users (inside the "
            "lg_k=14 exact coupon regime); 10x holds 15,000 — past the "
            "~12k promotion point, so the DENSE estimator answers and "
            "the error bound (±0.8% RSE) takes over from exactness. "
            "Max relative error vs exact COUNT(DISTINCT), per event "
            "type:\n\n"
            "| scale | sec | max rel. error |\n|---|---|---|\n"
            f"| 1x | {sk1_t} | {sk1_e:.3%} |\n"
            f"| 10x | {sk10_t} | {sk10_e:.3%} |\n"
        )
        f.write(
            "\n## Quantile-sketch rollup accuracy in the compression "
            "regime\n\nUnder the registered capacity=512/k=64 config "
            "the sf0.1 day groups (≤ 739 rows) already compress, and "
            "the 10x corpus compresses every group. Max RANK error of "
            "p25/p50/p90/p99 vs the exact sorted series, across event "
            "types (bound: ~W/k per compression level ≈ 1.6%):\n\n"
            "| scale | sec | max rank error |\n|---|---|---|\n"
            f"| 1x | {q1_t} | {q1_e:.3%} |\n"
            f"| 10x | {q10_t} | {q10_e:.3%} |\n"
        )

        def _kv_rows(kv: dict) -> str:
            return "".join(
                f"| {m} | {est:.1f} | {exact:.1f} | "
                f"{abs(est - exact) / max(exact, 1e-9):.2%} |\n"
                if m != "jaccard"
                else f"| {m} | {est:.4f} | {exact:.4f} | "
                f"{abs(est - exact):.4f} (abs) |\n"
                for m, (est, exact) in kv.items()
            )

        f.write(
            "\n## KMV set-operation estimates past the exact regime\n\n"
            "k=512; 1x cohorts hold ~750/705 distinct users (already "
            "past k), 10x is 10x deeper. Estimator vs exact "
            "(KMV RSE ~ 1/sqrt(k) ≈ 4.4%; intersection compounds two "
            "estimates):\n\n"
            f"**1x** ({kv1_t} s):\n\n"
            "| metric | estimate | exact | error |\n|---|---|---|---|\n"
            + _kv_rows(kv1)
            + f"\n**10x** ({kv10_t} s):\n\n"
            "| metric | estimate | exact | error |\n|---|---|---|---|\n"
            + _kv_rows(kv10)
        )
        f.write(
            "\n## SemDeDup: the k ∝ N knob, measured\n\nWithin-cell "
            "work is quadratic, so a FIXED quantizer under 10x density "
            "is deliberately the wrong shape — the documented contract "
            "is that cell count scales with the corpus. Retraining "
            "(seeded k-means, k=160, 1/4 hash-sample of the 10x "
            "corpus) restores per-cell density, and the Arrow "
            "assignment kernel (assign_cells_vectorized, bit-identical "
            "to the expression argmax — test-pinned) is what carries "
            "assignment once k grows past the literal-projection "
            "regime:\n\n"
            "| config | sec | within-cell pairs | dropped |\n"
            "|---|---|---|---|\n"
        )
        for label, dt, pairs, dropped in sd_rows:
            f.write(f"| {label} | {dt} | {pairs} | {dropped} |\n")
        _write_tier30(
            f, t30_rows, c30, s30, recall30, sem30, stages30,
            nprobe_info, ivfpq30, rebucket30, refresh30,
        )
        _write_tier100(f, t100_rows, c100, s100, stages100, refresh100)
        _write_tier100vec(f, vec100)
        _write_loggrowth(f, lg)
    print("wrote SCALE.md")


TIER30_HEADER = "## 30x tier — volume starts binding (VERDICT r6 #6)"


def _write_tier30(
    f, t30_rows, c30, s30, recall30, sem30, stages30,
    nprobe_info, ivfpq30, rebucket30, refresh30,
) -> None:
    k_def, np_def, np_sel = nprobe_info
    f.write(
        f"\n{TIER30_HEADER}\n\n"
        "Corpus: sf0.1 documents x30 (150,000 rows; step-5 "
        "rotations, all 30 DISTINCT — step 3 would collide at copy "
        "12) and embeddings x30 (60,000 rows; per-copy component "
        "rotation). The 10x table is fixed-overhead-dominated; "
        "this tier re-measures the dedup/ANN paths the 100 TB "
        "narrative leans on plus the r7 selection flagship "
        "(docs_dsir_selection: three token passes + a "
        "corpus-size-free 4096-row model) and, since r9, the "
        "composed curation funnel, same method (warmup, "
        "noop sink, min of 2, caches cleared). A linear engine would "
        "show ~3x the 10x wall; ratios are vs 1x. Since r9 BOTH "
        "registered vector paths are scale-aware: "
        "`emb_semantic_dedup` and `ivf_index_probe` share ONE "
        "memoized quantizer decision (plans/similarity."
        "_corpus_quantizer), which FIRES at this tier — 60,000 "
        f"vectors >= IVF_AUTO_MIN_N retrains k = ceil(N/256) = "
        f"{k_def} constant-sized lists/cells (probes {np_def}, ~10% "
        "of lists). The semantic-dedup row below therefore measures "
        "the DEFAULT retrained path (r8's frozen-k=16 row showed "
        "19.37x — the documented wrong shape, now auto-avoided; "
        "bit-equality below the threshold is pinned by "
        "test_semantic_dedup_scaled_auto_switch). The `emb_pq_adc_knn` row runs the r10 Arrow ADC kernels at BOTH scales (the auto-switch fires past 1000 vectors): r9's ~7 s expression-compile wall is gone, so the 1x wall collapsed to ~0.5 s and the ratio now measures genuine data volume instead of fixed cost — absolute 30x wall is ~2x FASTER than the r9 expression form's despite the larger ratio. The recall sweep "
        "below is the same production list-pruning regime. The "
        "one-off quantizer retrain is memoized per corpus "
        "(deterministic seeded k-means — the offline-training "
        "posture made executable), so the rows measure the "
        "amortized path; the first call pays the retrain once "
        "(~8 s at 30x).\n\n"
        "| query | 1x sec | 30x sec | 30x rows | time ratio |\n"
        "|---|---|---|---|---|\n"
    )
    for name, t1, n1, t30, n30, r in t30_rows:
        f.write(f"| `{name}` | {t1} | {t30} | {n30} | {r}x |\n")
    n_docs, n_kept, n_uniq, n_sel = stages30
    f.write(
        "\n**Curation funnel stage survivors at 30x** (VERDICT r8 "
        "#7). The frozen classifier gates SCRAMBLED copies hard — "
        "rotated text is out-of-distribution for weights trained on "
        "the real corpus vocabulary, so the gate keeps mostly the "
        "identity copy's keepers; the composed cost is still "
        "dominated by stage 1's full-corpus scoring pass, which is "
        "exactly what the timed row measures:\n\n"
        "| stage | rows |\n|---|---|\n"
        f"| corpus | {n_docs} |\n"
        f"| quality gate kept | {n_kept} |\n"
        f"| post exact-dedup | {n_uniq} |\n"
        f"| DSIR selected | {n_sel} |\n"
        "\n**MinHash funnel at 30x** (same 63-hash/21-band "
        "config):\n\n"
        "| scale | banded candidate pairs | verified (j >= 0.8) | "
        "survival |\n|---|---|---|---|\n"
        f"| 30x | {c30} | {s30} | {s30 / max(c30, 1):.2%} |\n"
        "\n**IVF recall@10 vs exact brute force at 30x** "
        "(vec_id%500 query set, 120 queries). The 30x embeddings "
        "are per-copy component rotations of random unit vectors — "
        "decorrelated, near-uniform on the sphere, the ADVERSARIAL "
        "case for IVF (no cluster structure for the lists to "
        "capture). The retrained sweep is therefore a recall FLOOR "
        "at each probed fraction, and its cost column shows the "
        "lever is linear: double n_probe, double probe cost. On a "
        "corpus with real cluster structure (the regime IVF "
        "targets) recall at 10% of lists is far higher — the "
        "sf0.01/sf0.1 recall pins (>= 0.95, test-enforced) and the "
        "frozen row here show pruning-light configs recover "
        "near-exact recall; production picks n_probe against a "
        "measured recall target, exactly like this sweep:\n\n"
        "| config | probe sec | recall@10 |\n|---|---|---|\n"
    )
    for label, dt, rec in recall30:
        f.write(f"| {label} | {dt} | {rec:.3f} |\n")
    f.write(
        "\n**Recall-target n_probe selection** (r9, VERDICT r8 #4): "
        "`IVFVectorIndex.select_n_probe` — the sweep above as a "
        "library call (deterministic held-out queries vs exact brute "
        "force, doubling ladder) — selects **n_probe = "
        f"{np_sel}** of {k_def} lists ({np_sel / k_def:.0%}) for "
        "recall >= 0.90 on this structureless adversarial corpus "
        "(the fixed 10% rule probes "
        f"{np_def}; on clustered real corpora the sweep selects far "
        "narrower — the sf0.1 pin in "
        "test_select_n_probe_recall_target).\n"
        "\n**SemDeDup at 30x — the registered scale-aware default** "
        "(shared quantizer decision, auto Arrow assignment kernel "
        "past ARROW_ASSIGN_MIN_K):\n\n"
        "| config | sec | within-cell pairs | dropped |\n"
        "|---|---|---|---|\n"
    )
    for label, dt, pairs, dropped in sem30:
        f.write(f"| {label} | {dt} | {pairs} | {dropped} |\n")
    f.write(
        "\n**IVF-PQ index-resident serving at 30x** (r10, VERDICT r9 "
        "#4 — `probe_adc`, the config you'd run at 100x: Arrow ADC "
        "kernel over the stored 8-byte codes, codes-only pruned "
        "scan, exact rescore of the measured shortlist). n_probe is "
        "the recall-target selection above; the shortlist width is "
        "`select_adc_width`'s 0.75-floor pick on this adversarial "
        "corpus (r10, VERDICT r9 #3 — the sf0.1 pin enforces the "
        "same floor). Recall is end-to-end @10 vs exact brute "
        "force — it composes BOTH approximations (pruned lists x "
        "coded shortlist), which is why it sits at/under the sweep "
        "rows above; real clustered corpora sit far higher at the "
        "same widths:\n\n"
        "| metric | value |\n|---|---|\n"
        f"| corpus | {ivfpq30['n']} vectors |\n"
        f"| index build (once) | {ivfpq30['build_s']} s |\n"
        f"| probe_adc wall (min of 2) | {ivfpq30['probe_s']} s |\n"
        f"| n_probe | {ivfpq30['n_probe']} of {ivfpq30['k']} lists "
        f"({ivfpq30['n_probe'] / ivfpq30['k']:.0%}) |\n"
        f"| ADC shortlist (select_adc_width, 0.75 floor) | "
        f"{ivfpq30['shortlist']} |\n"
        f"| recall@10 vs exact | {ivfpq30['recall']:.3f} |\n"
        + (
            f"| single-query probe_adc (interactive latency) | "
            f"{ivfpq30['single_q_s']} s |\n"
            if "single_q_s" in ivfpq30
            else ""
        )
        + "\n**Rebucket rewrite cost vs store size** (r10, VERDICT r9 "
        "#7): `maybe_rebucket` rewrites the whole store (it is also "
        "a full compaction); the 2x growth trigger amortizes that "
        "O(N) rewrite to O(1) per appended row ONLY if the rewrite "
        "stays ~linear in store size. Measured on forced rebuckets "
        "of frozen-k=16 IVF stores at the production 256-rows/list "
        "target (retrain + full reassign + swap):\n\n"
        "| store | rows | k_new | rewrite wall | ms / 1k rows |\n"
        "|---|---|---|---|---|\n"
    )
    for tier, n, k_new, wall in rebucket30:
        f.write(
            f"| {tier} | {n} | {k_new} | {wall} s | "
            f"{1000 * wall / (n / 1000):.0f} |\n"
        )
    r = refresh30
    n_c, n_k, n_u, n_s = r["stages"]
    f.write(
        "\n**Delta-aware curation refresh at 30x** (r10, VERDICT r9 "
        "#1/#8): the corpus seeds a SnapshotTable, the initial "
        "delta-tick scores everything once, then a ~1% append "
        "refreshes incrementally. The committed mix is asserted "
        "IDENTICAL to the full funnel recompute (the bit-identity "
        "contract, held at this tier), and the corpus TABLE is read "
        "∝ delta — the residual delta-tick cost is the narrow "
        "metadata + integer-histogram re-rank the docstring's "
        "exactness floor requires (DSIR's totals couple every "
        "weight), which is corpus-proportional but carries none of "
        "the text-scoring term:\n\n"
        "| metric | value |\n|---|---|\n"
        f"| initial delta-tick (scores all) | {r['initial_s']} s "
        f"({r['scored_initial']} docs scored) |\n"
        f"| 1%-append delta tick | {r['delta_s']} s "
        f"({r['scored_delta']} docs scored) |\n"
        f"| full funnel recompute (comparator) | {r['full_s']} s |\n"
        f"| corpus files read by the delta tick | {r['delta_files']} "
        f"of {r['corpus_files']} |\n"
        "\nPer-stage survivors of the refreshed corpus (from the "
        "tick's own state logs — the r9 funnel-composition "
        "invariants hold under the delta fold):\n\n"
        "| stage | rows |\n|---|---|\n"
        f"| corpus | {n_c} |\n"
        f"| quality gate kept (live) | {n_k} |\n"
        f"| post exact-dedup | {n_u} |\n"
        f"| DSIR selected | {n_s} |\n"
    )


TIER100_HEADER = (
    "## 100x tier — two orders of magnitude on the flagship dedup "
    "paths (VERDICT r7 #7)"
)


def _write_tier100(f, t100_rows, c100, s100, stages100, refresh100) -> None:
    f.write(
        f"\n{TIER100_HEADER}\n\n"
        "Corpus: sf0.1 documents x100 (500,000 rows; per-copy SEEDED "
        "RANDOM alphabet permutations — the rotation family tops out "
        "at 36 distinct copies, a random bijection per copy keeps "
        "within-copy near-dup structure exact while cross-copy "
        "Jaccard collapses). Same method (warmup, noop sink, min of "
        "2, caches cleared). A linear engine would show ~10x the 10x "
        "wall; ratios are vs 1x.\n\n"
        "| query | 1x sec | 100x sec | 100x rows | time ratio |\n"
        "|---|---|---|---|---|\n"
    )
    for name, t1, n1, t100, n100, r in t100_rows:
        f.write(f"| `{name}` | {t1} | {t100} | {n100} | {r}x |\n")
    n_docs, n_kept, n_uniq, n_sel = stages100
    f.write(
        "\n**Curation funnel stage survivors at 100x** (the 30x "
        "section's out-of-distribution caveat applies — the gate "
        "rejects scrambled copies hard, and the timed row's cost is "
        "stage 1's full-corpus scoring pass):\n\n"
        "| stage | rows |\n|---|---|\n"
        f"| corpus | {n_docs} |\n"
        f"| quality gate kept | {n_kept} |\n"
        f"| post exact-dedup | {n_uniq} |\n"
        f"| DSIR selected | {n_sel} |\n"
        "\n**MinHash funnel at 100x** (same 63-hash/21-band "
        "config):\n\n"
        "| scale | banded candidate pairs | verified (j >= 0.8) | "
        "survival |\n|---|---|---|---|\n"
        f"| 100x | {c100} | {s100} | {s100 / max(c100, 1):.2%} |\n"
    )
    r = refresh100
    f.write(
        "\n**Delta-aware curation refresh at 100x** (r10 — the tier "
        "where the claim matters: full-recompute cost grows with the "
        "corpus, the delta tick's residual is the metadata + integer-"
        "histogram re-rank; committed mix asserted IDENTICAL to the "
        "full funnel at this scale too):\n\n"
        "| metric | value |\n|---|---|\n"
        f"| initial delta-tick (scores all) | {r['initial_s']} s "
        f"({r['scored_initial']} docs scored) |\n"
        f"| 1%-append delta tick | {r['delta_s']} s "
        f"({r['scored_delta']} docs scored) |\n"
        f"| full funnel recompute (comparator) | {r['full_s']} s |\n"
        f"| corpus files read by the delta tick | {r['delta_files']} "
        f"of {r['corpus_files']} |\n"
    )


TIER100VEC_HEADER = (
    "## 100x vector tier — ~200k vectors through the scale-aware "
    "defaults (VERDICT r10 #1)"
)


def _write_tier100vec(f, v: dict) -> None:
    ivfpq = v["ivfpq"]
    f.write(
        f"\n{TIER100VEC_HEADER}\n\n"
        "Corpus: sf0.1 embeddings x100 "
        f"({v['n']} vectors; per-copy component rotation × a per-copy "
        "seeded Rademacher ±1 sign pattern — bitwise norm-preserving, "
        "decorrelating even where rotation indices collide past dim "
        "copies). Every prior vector 'scale' wall was fixed-cost on "
        "the 500–2,000-row driver corpus; this is the first tier "
        "where vector data volume binds. Same adversarial-corpus "
        "caveat as the 30x section: decorrelated near-uniform vectors "
        "are the WORST case for IVF list pruning, so every recall "
        "here is a floor, not a real-corpus estimate.\n\n"
        "**Scale-aware decisions (one-off per corpus, memoized):**\n\n"
        "| decision | value | cost |\n|---|---|---|\n"
        f"| quantizer retrain (k = ceil(N/256)) | k = {v['k']} | "
        f"{v['retrain_s']} s, paid once (`_corpus_quantizer` memo) |\n"
        f"| select_n_probe (0.90 target) | {v['np_sel']} of {v['k']} "
        f"lists ({v['np_sel'] / v['k']:.0%}; fixed 10% rule: "
        f"{v['np_def']}) | {v['npsel_s']} s sweep |\n"
        f"| select_adc_width (0.75 floor) | {ivfpq['shortlist']} | "
        f"{ivfpq['width_s']} s ladder |\n"
        "\n**Registered queries through the defaults** (amortized "
        "path — the retrain above is NOT in these walls; method as "
        "every tier: warmup, noop sink, min of 2, caches cleared):\n\n"
        "| query | 1x sec | 100x sec | 100x rows | time ratio |\n"
        "|---|---|---|---|---|\n"
    )
    for name, t1, n1, t100, n100, r in v["rows"]:
        f.write(f"| `{name}` | {t1} | {t100} | {n100} | {r}x |\n")
    f.write(
        "\n**IVF-PQ index-resident serving at 100x** (the SCALE 30x "
        "row's big sibling — `probe_adc`, Arrow ADC kernel, "
        "codes-only pruned scan, exact rescore; recall composes BOTH "
        "approximations). The plain-probe row isolates list pruning "
        "from the ADC coding:\n\n"
        "| metric | value |\n|---|---|\n"
        f"| corpus | {ivfpq['n']} vectors |\n"
        f"| queries | {ivfpq['n_queries']} |\n"
        f"| index build (once) | {ivfpq['build_s']} s |\n"
        f"| probe_adc wall (min of 2) | {ivfpq['probe_s']} s |\n"
        f"| n_probe | {ivfpq['n_probe']} of {ivfpq['k']} lists "
        f"({ivfpq['n_probe'] / ivfpq['k']:.0%}) |\n"
        f"| ADC shortlist | {ivfpq['shortlist']} |\n"
        f"| recall@10 vs exact (composed) | {ivfpq['recall']:.3f} |\n"
        f"| plain pruned probe wall (exact cosine, same lists) | "
        f"{ivfpq['probe_plain_s']} s |\n"
        f"| recall@10 vs exact (pruning only) | "
        f"{ivfpq['recall_plain']:.3f} |\n"
        f"| single-query probe_adc (interactive latency) | "
        f"{ivfpq['single_q_s']} s |\n"
    )


LOGGROWTH_HEADER = (
    "## Delta-refresh state-log growth across 50 ticks "
    "(VERDICT r10 #6)"
)


def _write_loggrowth(f, lg: dict) -> None:
    f.write(
        f"\n{LOGGROWTH_HEADER}\n\n"
        "50 REWRITE ticks (delete_where + re-append of a 500-doc "
        "slice — re-scores are what accrete superseded log rows; "
        "pure appends add only live rows) against the 30x-seeded "
        "corpus (150k docs; copy-0 seeds slice-aligned so each "
        "delete's COW rewrite prunes to one directory), with the "
        "tick's own housekeeping on (compact_every=16, the default — "
        "folds both logs to live rows every 16 appended log "
        "versions, AFTER the selection commit) and off. Committed "
        "answers are bit-identical either way (the tick tests pin "
        "it); this table is what housekeeping buys: the logs' "
        "CURRENT version stays ~live-sized instead of accreting one "
        "superseded row per re-scored doc per tick. Row counts and "
        "MB are the current log version — what every tick's rank "
        "pass reads; total on-disk additionally retains superseded "
        "versions for time travel (a retention knob, not a read "
        "cost):\n\n"
        "| variant | tick | tick wall | stats rows | grams rows | "
        "live state MB |\n|---|---|---|---|---|---|\n"
    )
    for label, rows in lg.items():
        if label == "vacuum":
            continue
        for t, wall, n_stats, n_grams, mb in rows:
            f.write(
                f"| {label} | {t} | {wall} s | {n_stats} | "
                f"{n_grams} | {mb} |\n"
            )
    if "vacuum" in lg:
        before_mb, after_mb = lg["vacuum"]
        f.write(
            "\nRetention (r11): the housekeeping tick also vacuums "
            "the logs' superseded VERSIONS (keep_versions=4, 600 s "
            "in-flight age guard; the rolling txn map rides every "
            "manifest, so replay no-ops survive the prune — "
            "test-pinned). Total on-disk state history after the "
            f"50-tick housekeeping walk: {before_mb} MB → "
            f"{after_mb} MB after an explicit min_age=0 sweep (what "
            "the age-guarded in-tick sweep converges to in a "
            "long-running deployment).\n"
        )


def _splice_section(header: str, body: str, later_headers: list[str]) -> None:
    """Replace ONE SCALE.md section in place: everything before
    ``header`` is kept verbatim, ``body`` (which must start with the
    header) replaces the old section, and the FIRST of
    ``later_headers`` still present is preserved from there down.

    When ``header`` is ABSENT, the section INSERTS (before the first
    later header present, else at the end) — without this guard the
    old code treated the whole file as "head" and re-appended the
    later sections, duplicating them on every run (the r13 capstone
    incident tripled the file). ``later_headers`` must only name
    sections that genuinely come AFTER this one."""
    path = os.path.join(REPO_ROOT, "SCALE.md")
    with open(path) as f:
        whole = f.read()
    if "\n" + header not in whole:
        for h in later_headers:
            if "\n" + h in whole:
                head2, tail2 = whole.split("\n" + h, 1)
                out = (
                    head2.rstrip("\n") + "\n" + body + "\n" + h + tail2
                )
                break
        else:
            out = whole.rstrip("\n") + "\n" + body
        with open(path, "w") as f:
            f.write(out)
        return
    head, rest = whole.split("\n" + header, 1)
    # r14: bound the replacement at the NEXT "## " header present in
    # the file, NOT at a hand-maintained later_headers list — every
    # SCALE.md section starts with "## ", so the structural bound is
    # always right, while stale lists silently swallowed every
    # section below (r13: the capstone run ate the crawl walk; the
    # vector-ticks run would have eaten capstone+crawl). The
    # later_headers parameter still drives the insert-position branch
    # above; here it is only a sanity floor: if it names a section
    # that the structural bound would drop, fail loudly.
    nxt = rest.find("\n## ")
    tail = rest[nxt:] if nxt != -1 else ""
    for h in later_headers:
        if "\n" + h in whole and "\n" + h not in tail:
            raise RuntimeError(
                f"_splice_section: later header {h!r} exists but "
                "would be dropped — section order changed?"
            )
    with open(path, "w") as f:
        f.write(head.rstrip("\n") + "\n" + body.rstrip("\n") + "\n" + tail.lstrip("\n"))


def main_tier100_only() -> None:
    """Re-run ONLY the 100x tier and splice its section into the
    existing SCALE.md (the tables above it and the vector/log-growth
    sections below it are kept verbatim)."""
    import io

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke-100x")
    plans._load()
    for name in QUERIES100:
        try:
            plans.REGISTRY[name].builder(
                spark, "/root/testdata/sf0.001"
            ).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    t100_rows, (c100, s100), stages100, refresh100 = tier100(spark)
    buf = io.StringIO()
    _write_tier100(buf, t100_rows, c100, s100, stages100, refresh100)
    _splice_section(
        TIER100_HEADER, buf.getvalue(),
        [TIER100VEC_HEADER, LOGGROWTH_HEADER],
    )
    print("wrote SCALE.md (100x section only)")


def main_vec100_only() -> None:
    """Re-run ONLY the 100x vector tier and splice its section into
    the existing SCALE.md."""
    import io

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke-100xvec")
    plans._load()
    for name in ("ivf_index_probe", "emb_semantic_dedup"):
        try:
            plans.REGISTRY[name].builder(
                spark, "/root/testdata/sf0.001"
            ).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    vec100 = tier100_vec(spark)
    buf = io.StringIO()
    _write_tier100vec(buf, vec100)
    _splice_section(TIER100VEC_HEADER, buf.getvalue(), [LOGGROWTH_HEADER])
    print("wrote SCALE.md (100x vector section only)")


def main_loggrowth_only() -> None:
    """Re-run ONLY the state-log growth sweep and splice its section
    into the existing SCALE.md (requires the 30x corpus; builds it if
    missing)."""
    import io

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke-loggrowth")
    plans._load()
    if not os.path.isdir(f"{OUT30}/documents.parquet"):
        build_corpus30(spark)
    lg = refresh_log_growth(spark)
    buf = io.StringIO()
    _write_loggrowth(buf, lg)
    _splice_section(LOGGROWTH_HEADER, buf.getvalue(), [])
    print("wrote SCALE.md (log-growth section only)")


def main_tier30_only() -> None:
    """Re-run ONLY the 30x tier and splice its section into the
    existing SCALE.md (the 10x tables above it and the 100x section
    below it are kept verbatim)."""
    import io

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke-30x")
    plans._load()
    for name in QUERIES30:
        try:
            plans.REGISTRY[name].builder(
                spark, "/root/testdata/sf0.001"
            ).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    (t30_rows, (c30, s30), recall30, sem30, stages30, nprobe_info,
     ivfpq30, rebucket30, refresh30) = tier30(spark)
    path = os.path.join(REPO_ROOT, "SCALE.md")
    with open(path) as f:
        whole = f.read()
    head = whole.split("\n" + TIER30_HEADER)[0]
    # preserve the 100x section if present (it follows the 30x one)
    tail = ""
    if "\n" + TIER100_HEADER in whole:
        tail = "\n" + TIER100_HEADER + whole.split(
            "\n" + TIER100_HEADER, 1
        )[1]
    buf = io.StringIO()
    _write_tier30(
        buf, t30_rows, c30, s30, recall30, sem30, stages30,
        nprobe_info, ivfpq30, rebucket30, refresh30,
    )
    with open(path, "w") as f:
        f.write(head.rstrip("\n") + "\n" + buf.getvalue() + tail)
    print("wrote SCALE.md (30x section only)")


if __name__ == "__main__":
    if "--tier30-only" in sys.argv:
        main_tier30_only()
    elif "--tier100-only" in sys.argv:
        main_tier100_only()
    elif "--vec100-only" in sys.argv:
        main_vec100_only()
    elif "--loggrowth-only" in sys.argv:
        main_loggrowth_only()
    else:
        main()
