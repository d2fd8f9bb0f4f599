"""SCALE receipts for the release capstone at a CORPUS-PROPORTIONAL
mix (r14, VERDICT r13 #6): the registered `docs_corpus_release` pins
its funnel at top-k=100 docs, so its 30x/100x rows never exercise the
post-funnel stages (decontamination join, packing windows) on a
release that GROWS with the corpus — which is what a real pretraining
release does. This walk replaces the funnel's top-k with the
token-budget prefix rule (`docs_token_budget_selection`'s machinery:
rank by DSIR log-weight, keep the highest-weight prefix whose
cumulative tokens fit a budget sized ∝ corpus tokens) and times every
stage separately at 1x and 30x.

Splices ONE SCALE.md section (appended last)."""

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

HEADER = (
    "## Corpus-proportional release — token-budgeted mix at 1x/30x "
    "(VERDICT r13 #6)"
)
#: released tokens as a fraction of corpus tokens — the budget grows
#: WITH the corpus, which is the whole point of this walk
BUDGET_FRACTION = 0.05


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    from data_engineer_challenge_spark.plans.dedup import (
        docs_leakage_safe_split,
    )
    from data_engineer_challenge_spark.plans.helpers import md5_long
    from data_engineer_challenge_spark.plans.release import (
        _GSHUF_SALT,
        _GSHUF_SHARDS,
        _PACK_LEN,
        _RELEASE_RULES,
    )
    from data_engineer_challenge_spark.plans.text import (
        _FP_CAP,
        _FP_MIN_SHARED,
        _winnow_fingerprints,
        curation_funnel,
        filter_bank_flags,
    )
    from data_engineer_challenge_spark.functions.tokenize import (
        word_tokens as tokens,
    )
    from data_engineer_challenge_spark.session import get_spark
    from data_engineer_challenge_spark.tables import load_table

    spark = get_spark(app_name="scale-release-prop")
    if not os.path.isdir(f"{OUT30}/documents.parquet"):
        print("building 30x corpus ...", flush=True)
        build_corpus30(spark)

    tiers = []
    for tier, sf_dir in (
        ("1x", "/root/testdata/sf0.1"),
        ("30x", OUT30),
    ):
        docs = load_table(spark, sf_dir, "documents")
        ntok = docs.select(
            "doc_id",
            F.size(tokens("text")).cast("long").alias("n_tokens"),
        ).localCheckpoint()
        n_docs = docs.count()
        total_tokens = ntok.agg(F.sum("n_tokens")).first()[0]
        budget = int(total_tokens * BUDGET_FRACTION)

        walls = {}
        # stage 1+2: filter bank + funnel, token-budget prefix instead
        # of top-k — at most `budget` docs fit (every doc ≥ 1 token),
        # so the pre-limit keeps the global running-sum window
        # budget-bounded (docs_token_budget_selection's discipline)
        t0 = time.perf_counter()
        gate = None
        for r in _RELEASE_RULES:
            cond = F.col(r) == 1
            gate = cond if gate is None else gate & cond
        filtered = (
            filter_bank_flags(docs, carry=("lang", "text"))
            .where(gate)
            .select("doc_id", "lang", "text")
        )
        ranked = (
            curation_funnel(filtered, topk=n_docs)
            .join(ntok, "doc_id")
            .orderBy(F.desc("log_weight"), "doc_id")
            .limit(budget)
        )
        w = Window.orderBy(F.desc("log_weight"), "doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        mix = (
            ranked.withColumn("cum", F.sum("n_tokens").over(w))
            .where(F.col("cum") <= budget)
            .select(
                "doc_id", "lang", "quality_score", "log_weight",
                "n_tokens",
            )
            .localCheckpoint()
        )
        n_mix = mix.count()
        walls["mix"] = round(time.perf_counter() - t0, 1)

        # stage 3: leakage-safe cluster split over the FULL corpus
        t0 = time.perf_counter()
        splits = docs_leakage_safe_split(spark, sf_dir).localCheckpoint()
        tmix = mix.join(
            splits.where(F.col("split") == "train").select("doc_id"),
            "doc_id",
        ).localCheckpoint()
        n_train = tmix.count()
        walls["split"] = round(time.perf_counter() - t0, 1)

        # stage 4: winnowing decontamination of the (now
        # corpus-proportional) train mix against the held-out pool
        t0 = time.perf_counter()
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
        contaminated = (
            left.join(right, "fp")
            .groupBy("doc_id", "__hid")
            .agg(F.count(F.lit(1)).alias("__n_shared"))
            .filter(F.col("__n_shared") >= _FP_MIN_SHARED)
            .select("doc_id")
            .distinct()
        )
        released = tmix.join(
            contaminated, "doc_id", "left_anti"
        ).localCheckpoint()
        n_released = released.count()
        walls["decontam"] = round(time.perf_counter() - t0, 1)

        # stage 5: shuffled packing over the RELEASED set (the
        # registered builder's exact layout — salted-hash epoch order,
        # two windows over one shard_id Exchange)
        t0 = time.perf_counter()
        h = md5_long(
            F.concat(
                F.lit(_GSHUF_SALT), F.col("doc_id").cast("string")
            )
        )
        hashed = released.select(
            "doc_id",
            "lang",
            "n_tokens",
            h.alias("h"),
            (h % _GSHUF_SHARDS).alias("shard_id"),
        )
        rankedp = hashed.where(F.col("n_tokens") > 0).withColumn(
            "pos",
            F.row_number()
            .over(Window.partitionBy("shard_id").orderBy("h", "doc_id"))
            .cast("long"),
        )
        wp = (
            Window.partitionBy("shard_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
        packed = rankedp.withColumn("cum", cum).select(
            "doc_id",
            "shard_id",
            "pos",
            F.expr(f"cum div {_PACK_LEN}").alias("seq_id"),
        )
        n_seqs = packed.select("shard_id", "seq_id").distinct().count()
        walls["pack"] = round(time.perf_counter() - t0, 1)

        total = round(sum(walls.values()), 1)
        tiers.append(
            (tier, n_docs, budget, n_mix, n_train, n_released,
             n_seqs, walls, total)
        )
        print(
            f"{tier}: docs={n_docs} budget={budget} mix={n_mix} "
            f"train={n_train} released={n_released} seqs={n_seqs} "
            f"walls={walls} total={total}s",
            flush=True,
        )

    rows = "\n".join(
        f"| {t} | {d:,} | {b:,} | {m:,} | {tr:,} | {rel:,} | {sq:,} "
        f"| {w['mix']} | {w['split']} | {w['decontam']} | {w['pack']} "
        f"| {tot} |"
        for t, d, b, m, tr, rel, sq, w, tot in tiers
    )
    t1, t30 = tiers
    ratios = {
        k: round(t30[7][k] / t1[7][k], 1) if t1[7][k] else float("inf")
        for k in t1[7]
    }
    body = (
        f"{HEADER}\n\n"
        f"The registered capstone's funnel pins the mix at top-k=100 "
        f"docs, structurally exempting stages 4-5 from growth; here "
        f"the mix is the token-budget PREFIX "
        f"(`docs_token_budget_selection`'s rule) at "
        f"{int(BUDGET_FRACTION * 100)}% of corpus tokens — the "
        f"release grows ∝ corpus, so the decontamination join and "
        f"the packing windows finally carry corpus-proportional row "
        f"counts. Default-heap driver (the r14 DISK_ONLY fingerprint "
        f"pool).\n\n"
        f"| tier | docs | token budget | mix docs | train side | "
        f"released | packed seqs | mix s | split s | decontam s | "
        f"pack s | total s |\n"
        f"|---|---|---|---|---|---|---|---|---|---|---|---|\n"
        f"{rows}\n\n"
        f"30x data: mix {ratios['mix']}x, split {ratios['split']}x, "
        f"decontam {ratios['decontam']}x, pack {ratios['pack']}x "
        f"wall. The released set grew "
        f"{round(t30[5] / max(t1[5], 1))}x (∝ corpus, as sized); "
        f"every stage stays sub-linear in wall vs the 30x data "
        f"growth or tracks the release size it actually processes: "
        f"the decontamination join is ids/fingerprints-only "
        f"(SortMergeJoin on fp — the one Exchange whose input grows "
        f"with BOTH the train mix and the held-out pool, making it "
        f"the stage to watch at 1000x; a bloom side-filter on fp is "
        f"the next lever if it ever dominates), and packing's two "
        f"windows still ride ONE shard_id Exchange whose row count "
        f"is the release, not the corpus.\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
