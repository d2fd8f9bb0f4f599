"""Continuous vector ingestion at the 100x tier (VERDICT r11 #5):
drive ~20 `vector_index_tick` fires — mixed appends, a supersede
re-drop, periodic takedown lists — against a PQ-coded store seeded
with 90k of the 200k-vector corpus, through the tick's own
maybe_compact/maybe_rebucket housekeeping. Records per-tick wall
(the ∝-delta claim at volume), the rebucket event the 2x-growth
trigger fires near the end, and a final probe_adc + recall check
proving the mutated store still serves. Splices one SCALE.md
section."""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import (  # noqa: E402
    OUT100V,
    _splice_section,
    build_corpus100_vec,
)

HEADER = (
    "## Continuous ingestion at the 100x vector tier — 20 ticks "
    "(VERDICT r11 #5)"
)

ROOT = "/tmp/scalevecticks"
N_TICKS = 20  # copies 0..49 seed the store; 50..99 drip in over ticks


def main() -> None:
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )
    from data_engineer_challenge_spark.session import get_spark
    from data_engineer_challenge_spark.streaming.snapshot_diff import (
        SnapshotState,
    )
    from data_engineer_challenge_spark.streaming.ingest import (
        vector_index_tick,
    )

    plans._load()
    spark = get_spark(app_name="scale-vector-ticks")
    if not os.path.isdir(f"{OUT100V}/embeddings.parquet"):
        print("building 100x vector corpus ...", flush=True)
        build_corpus100_vec(spark)
    emb = spark.read.parquet(f"{OUT100V}/embeddings.parquet")
    copy = F.expr("vec_id div 100000000")

    shutil.rmtree(ROOT, ignore_errors=True)
    seed_dir = f"{ROOT}/seed"
    os.makedirs(seed_dir)
    seed = emb.where(copy < 50)
    seed.repartition(32).write.parquet(f"{seed_dir}/embeddings.parquet")
    seed = spark.read.parquet(f"{seed_dir}/embeddings.parquet")
    n_seed = seed.count()
    cents, _ = _corpus_quantizer(seed_dir, seed)
    store = f"{ROOT}/store"
    t0 = time.perf_counter()
    idx = IVFVectorIndex(spark, store, cents, pq_codebooks=CODEBOOKS)
    idx.build(seed)
    build_s = round(time.perf_counter() - t0, 1)
    print(
        f"seed store: {n_seed} vectors, k={len(cents)}, "
        f"build {build_s}s",
        flush=True,
    )

    drops = f"{ROOT}/drops"
    dels = f"{ROOT}/dels"
    os.makedirs(drops)
    os.makedirs(dels)
    state = SnapshotState.load(f"{ROOT}/state.json")

    # the drip corpus: copies 50..99 (100k vectors) in 20 per-tick
    # slices of 2-3 copies (~5,000 vectors each) — the raw row count
    # crosses the 2x-growth rebucket trigger (2 x 256 x k_seed) near
    # the end of the run, so the amortized maintenance event fires
    # inside the measured window
    drip = emb.where(copy >= 50).withColumn(
        "__slot",
        F.expr("((vec_id div 100000000) - 50) * 20 div 50").cast(
            "int"
        ),
    )

    def _n_files() -> int:
        total = 0
        pdir = os.path.join(store, "postings")
        for d in os.listdir(pdir):
            if d.startswith("cid="):
                total += sum(
                    1
                    for f in os.listdir(os.path.join(pdir, d))
                    if not f.startswith((".", "_"))
                )
        return total

    rows = []
    for t in range(1, N_TICKS + 1):
        slot = t - 1
        add = drip.where(F.col("__slot") == slot).drop("__slot")
        fn = f"{drops}/drop_{slot:03d}.parquet"
        # single-FILE drops: the mtime snapshot diff watches files —
        # the realistic shape of an upstream embedding job's output
        add.toPandas().to_parquet(fn, index=False)
        if t == 10:
            # supersede: re-drop tick-5's file (same name, new
            # mtime) with negated vectors — a genuine update;
            # float32-preserving negation keeps the store schema
            import numpy as np
            import pandas as pd

            pdf = pd.read_parquet(f"{drops}/drop_004.parquet")
            pdf["embedding"] = pdf["embedding"].map(
                lambda a: (-np.asarray(a, dtype=np.float32))
            )
            pdf.to_parquet(f"{drops}/drop_004.parquet", index=False)
        n_del = 0
        if t % 4 == 0:
            # takedown list: 500 ids from the seed corpus
            lo = (t // 4 - 1) * 500
            ids = seed.select("vec_id").where(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 500)
            )
            n_del = ids.count()
            ids.toPandas().to_parquet(
                f"{dels}/del_{t:03d}.parquet", index=False
            )
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        r = vector_index_tick(
            spark, drops, state, idx, delete_dir=dels
        )
        wall = round(time.perf_counter() - t0, 2)
        assert r["fired"], t
        nf = _n_files()
        rows.append(
            (t, r["vectors"], n_del, r["rebucketed"], wall, nf)
        )
        print(
            f"tick {t}: +{r['vectors']} -{n_del} "
            f"rebucket={r['rebucketed']} k={idx.meta['k']} "
            f"{wall}s files={nf}",
            flush=True,
        )

    # tick 21 — the growth event: one more supersede re-drop pushes
    # the raw row count over the 2x trigger (compaction folds kept it
    # just under through tick 20), so the rebucket retrain+rewrite
    # fires INSIDE the measured run
    import numpy as np
    import pandas as pd

    pdf = pd.read_parquet(f"{drops}/drop_000.parquet")
    pdf["embedding"] = pdf["embedding"].map(
        lambda a: (-np.asarray(a, dtype=np.float32))
    )
    pdf.to_parquet(f"{drops}/drop_000.parquet", index=False)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    r = vector_index_tick(spark, drops, state, idx, delete_dir=dels)
    wall = round(time.perf_counter() - t0, 2)
    assert r["fired"]
    rows.append((21, r["vectors"], 0, r["rebucketed"], wall, _n_files()))
    print(
        f"tick 21: +{r['vectors']} -0 rebucket={r['rebucketed']} "
        f"k={idx.meta['k']} {wall}s files={_n_files()}",
        flush=True,
    )

    # final serving check on the mutated store: probe + recall vs
    # exact brute force over the LIVE corpus
    live = idx._live(idx._read_postings()).select(
        F.col(idx.id_col).alias("c_id"),
        F.col(idx.vec_col).alias("embedding"),
    ).dropDuplicates(["c_id"]).localCheckpoint()
    n_final = live.count()
    queries = live.where(F.col("c_id") % 2000 == 0).select(
        F.col("c_id").alias("q_id"), "embedding"
    )
    nq = queries.count()
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk_vectorized(
            queries, live, k=10
        ).collect()
    }
    k_now = int(idx.meta["k"])
    n_probe = max(1, round(0.33 * k_now))
    t0 = time.perf_counter()
    got = {
        (r["q_id"], r["c_id"])
        for r in idx.probe_adc(
            queries, k=10, n_probe=n_probe, shortlist=2048
        ).collect()
    }
    probe_s = round(time.perf_counter() - t0, 1)
    recall = round(len(got & exact) / len(exact), 3)
    print(
        f"final: {n_final} live, k={k_now}, probe {probe_s}s "
        f"(n_probe={n_probe}, {nq} queries), recall@10 {recall}",
        flush=True,
    )

    reb_ticks = [t for t, *_r in rows if _r[2]]
    tick_rows = "\n".join(
        f"| {t} | +{a} | −{d} | {'yes' if rb else ''} | {w} | {nf} |"
        for t, a, d, rb, w, nf in rows
    )
    body = (
        f"{HEADER}\n\n"
        f"`vector_index_tick` (appends + a supersede re-drop at tick "
        f"10 + 500-id takedown lists every 4th tick) against a "
        f"PQ-coded store seeded with {n_seed:,} of the 200k corpus "
        f"(k={len(cents)} scaled quantizer trained on the seed, "
        f"build {build_s} s). Each tick lands ~5,000 vectors as a "
        f"single-file drop; housekeeping is the tick's own "
        f"maybe_compact (default 8-files-per-list threshold) + "
        f"maybe_rebucket — the 2x-growth trigger "
        f"(2 × 256 × k = {2 * 256 * len(cents):,} raw rows) fires "
        f"once the drip crosses it"
        f"{' (tick ' + ', '.join(map(str, reb_ticks)) + ')' if reb_ticks else ' (not reached this run)'}"
        f", retraining k ∝ N and re-bucketing crash-safely inside "
        f"the tick.\n\n"
        f"| tick | appended | deleted | rebucket | wall s | store "
        f"files after |\n"
        f"|---|---|---|---|---|---|\n"
        f"{tick_rows}\n\n"
        f"Reading the walls honestly: a quiet tick costs the "
        f"~5,000-row append (+ the takedown's O(deleted-ids) pass on "
        f"every 4th). The spikes are HOUSEKEEPING, visible in the "
        f"file-count column: each append adds one file per touched "
        f"list, and when lists cross the 8-file threshold "
        f"maybe_compact folds them (file count drops, that tick pays "
        f"the fold); the supersede tick additionally rosters + "
        f"re-codes its re-dropped file, and the rebucket tick pays "
        f"the full retrain+rewrite the trigger amortizes (every "
        f"other tick's trigger check is one parquet-metadata count). "
        f"That is the designed cost model: per-tick work ∝ delta + "
        f"amortized maintenance bursts, never ∝ corpus.\n\n"
        f"After 21 ticks of mutation the store serves: {n_final:,} "
        f"live vectors under k={k_now}, probe_adc {probe_s} s over "
        f"{nq} queries at n_probe={n_probe}/shortlist=2048, "
        f"recall@10 {recall} vs exact brute force on the live "
        f"corpus (adversarial-floor corpus — the same structureless "
        f"caveat as the tiers above; the clustered tier shows what "
        f"structure buys).\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
