"""SCALE row for the corpus-release capstone (r13, VERDICT r12 #5):
run `docs_corpus_release` end-to-end at 1x (sf0.1) and 30x
(/tmp/scale30 — reused when present), recording wall AND per-stage
survivor counts (filter bank → funnel → train split → decontamination
→ packing) so the composition's scaling can be read against its
stages' own audited sublinearity. Splices ONE SCALE.md section,
placed before the continuous-ingestion section."""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import (  # noqa: E402
    OUT30,
    _splice_section,
    build_corpus30,
)

HEADER = "## 30x/100x tiers — the corpus-release capstone (VERDICT r12 #5)"
# later_headers must name every section genuinely BELOW this one (the
# _splice_section contract). r13 late added the crawl-tier walk AFTER
# the capstone; an empty list here made the r14 re-run swallow it
# (splice-to-EOF) — caught in review, section restored from git.
LATER: list = [
    "## Crawl-tier continuous ingestion — WARC ticks at the 30x corpus (r13)"
]


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.plans.dedup import (
        docs_leakage_safe_split,
    )
    from data_engineer_challenge_spark.plans.release import _RELEASE_RULES
    from data_engineer_challenge_spark.plans.text import (
        _FP_CAP,
        _FP_MIN_SHARED,
        _winnow_fingerprints,
        curation_funnel,
        filter_bank_flags,
    )
    from data_engineer_challenge_spark.session import get_spark
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    spark = get_spark(app_name="scale-release")
    if not os.path.isdir(f"{OUT30}/documents.parquet"):
        print("building 30x corpus ...", flush=True)
        build_corpus30(spark)

    tier_list = [("1x", "/root/testdata/sf0.1"), ("30x", OUT30)]
    if "--tier100" in sys.argv:
        from tools.scale_smoke import OUT100, build_corpus100

        if not os.path.isdir(f"{OUT100}/documents.parquet"):
            print("building 100x corpus ...", flush=True)
            build_corpus100(spark)
        tier_list.append(("100x", OUT100))

    tiers = []
    for tier, sf_dir in tier_list:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()

        # per-stage survivor counts — the SAME frames the registered
        # builder chains (plans/release.py), counted stage by stage
        gate = None
        for r in _RELEASE_RULES:
            cond = F.col(r) == 1
            gate = cond if gate is None else gate & cond
        filtered = (
            filter_bank_flags(docs, carry=("lang", "text"))
            .where(gate)
            .select("doc_id", "lang", "text")
        )
        n_filtered = filtered.count()
        mix = curation_funnel(filtered).localCheckpoint()
        n_mix = mix.count()
        splits = docs_leakage_safe_split(spark, sf_dir).localCheckpoint()
        tmix = mix.join(
            splits.where(F.col("split") == "train").select("doc_id"),
            "doc_id",
        ).localCheckpoint()
        n_train = tmix.count()
        # DISK_ONLY, like the registered builder (r14): the pool is
        # corpus-sized; an on-heap eager checkpoint of it is what
        # needed the 24 GB driver at 30x+ — spilled, default heap works
        from pyspark.storagelevel import StorageLevel

        rare = (
            _winnow_fingerprints(docs)
            .withColumn(
                "__n", F.count(F.lit(1)).over(Window.partitionBy("fp"))
            )
            .filter(F.col("__n") <= _FP_CAP)
            .select("doc_id", "fp")
            .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
        )
        left = rare.join(tmix.select("doc_id"), "doc_id")
        right = rare.join(
            splits.where(F.col("split") == "heldout").select("doc_id"),
            "doc_id",
        ).select(F.col("doc_id").alias("__hid"), "fp")
        n_contam = (
            left.join(right, "fp")
            .groupBy("doc_id", "__hid")
            .agg(F.count(F.lit(1)).alias("__n_shared"))
            .filter(F.col("__n_shared") >= _FP_MIN_SHARED)
            .select("doc_id")
            .distinct()
            .count()
        )
        n_released = n_train - n_contam

        # the registered query, end to end, min of 2 (bench method)
        builder = plans.REGISTRY["docs_corpus_release"].builder
        best = None
        n_seqs = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = builder(spark, sf_dir)
            out.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        n_seqs = (
            builder(spark, sf_dir)
            .select("shard_id", "seq_id")
            .distinct()
            .count()
        )
        tiers.append(
            (
                tier,
                n_docs,
                n_filtered,
                n_mix,
                n_train,
                n_contam,
                n_released,
                n_seqs,
                round(best, 1),
            )
        )
        print(
            f"{tier}: docs={n_docs} bank={n_filtered} funnel={n_mix} "
            f"train={n_train} contam={n_contam} released={n_released} "
            f"seqs={n_seqs} wall={round(best, 1)}s",
            flush=True,
        )

    rows = "\n".join(
        f"| {t} | {d:,} | {f:,} | {m} | {tr} | {c} | {rel} | {sq} "
        f"| {w} |"
        for t, d, f, m, tr, c, rel, sq, w in tiers
    )
    w1 = tiers[0][-1]
    ratios = ", ".join(
        f"{t} data costs {round(w / w1, 1)}x wall"
        for t, *_r, w in tiers[1:]
    )
    body = (
        f"{HEADER}\n\n"
        f"`docs_corpus_release` — the five-stage composed release "
        f"(filter bank → curation funnel → leakage-safe cluster split "
        f"→ winnowing decontamination → shuffled packing) under one "
        f"registered builder — end to end (min of 2, noop sink), with "
        f"the per-stage survivor counts the composition's scaling "
        f"should be read against:\n\n"
        f"| tier | docs | bank keepers | funnel mix | train side | "
        f"contaminated | released | packed seqs | wall s |\n"
        f"|---|---|---|---|---|---|---|---|---|\n"
        f"{rows}\n\n"
        f"{ratios} — the composition inherits its "
        f"stages' sublinearity. Why: the funnel's DSIR top-k pins the "
        f"mix at ≤ 100 docs regardless of corpus size, so stages 4-5 "
        f"(the ids-only contamination join over rare fingerprints and "
        f"the two windows over one shard_id Exchange — the plan-pinned "
        f"packing stage) operate on catalog-sized survivor sets at "
        f"every tier; what scales with the corpus is stage 1's "
        f"map-only flag pass, the funnel's statistics passes, the "
        f"cluster split's banded candidate join (its own 30x/100x "
        f"rows above), and the winnowing fingerprint scan — all "
        f"shuffle-bounded by ids/fingerprints, never by text volume "
        f"after stage 1. The one Exchange that grows superlinearly in "
        f"candidate volume is the split's banded self-join "
        f"(hashpartitioning on band key) — the near-dup tier's "
        f"audited cost, not the release's own.\n"
    )
    _splice_section(HEADER, body, LATER)
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
