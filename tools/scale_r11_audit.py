"""30x scale datapoints for the r11 audit/selection operators.

Times the six r11 additions (heuristic filter bank, paragraph
dedup-rewrite, packing-efficiency audit, mid-epoch shuffle resume,
training-mix release audit, cluster-balanced selection) at 1x
(sf0.1) and the 30x synthetic corpus, with scale_smoke's frozen
method (noop sink inside the timer, min of 2, caches cleared), and
appends/splices one SCALE.md section. Reuses scale_smoke's corpus
builder; the 30x corpus is rebuilt only if missing so this stays a
~10-minute focused run instead of the 45-minute full sweep.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import (  # noqa: E402
    BASE,
    OUT30,
    _splice_section,
    build_corpus30,
    timed,
)

QUERIES_R11 = [
    "docs_heuristic_filter_bank",
    "docs_paragraph_dedup",
    "docs_packing_efficiency",
    "docs_shuffle_resume",
    "curation_mix_diff",
    "emb_cluster_balanced_selection",
    # the session's later additions — the full r11 operator table
    "docs_cluster_quality_election",
    "docs_quality_sampled_mix",
    "docs_source_reputation",
    # (events_transition_matrix is omitted: the 30x corpus holds
    # documents + embeddings only — its shape is the sessionization
    # tier's, already measured)
    "docs_decontaminated_train",
    "docs_leakage_safe_split",
    "docs_stratified_split",
    "docs_bigram_lm_perplexity",
    "emb_pq_residual_adc_knn",
    "emb_mmr_rerank",
    "docs_search_snippets",
    "docs_rm3_search",
    "emb_hard_negatives",
]

HEADER = "## 30x tier — r11 audit/selection operators"


def main() -> None:
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    plans._load()
    spark = get_spark()
    if not (
        os.path.isdir(f"{OUT30}/documents.parquet")
        and os.path.isdir(f"{OUT30}/embeddings.parquet")
    ):
        print("building 30x corpus ...", flush=True)
        build_corpus30(spark)
    else:
        print("reusing existing 30x corpus", flush=True)

    rows = []
    for name in QUERIES_R11:
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t30, n30 = timed(spark, b, OUT30)
        rows.append((name, t1, n1, t30, n30, round(t30 / t1, 2)))
        print("30x", name, t1, n1, t30, n30, flush=True)

    body = (
        f"{HEADER}\n\n"
        "Same corpus and frozen method as the 30x tier above (30 "
        "Caesar-rotated document copies / component-rotated embedding "
        "copies of sf0.1; noop sink inside the timer, min of 2, caches "
        "cleared). Fixed-output rows (`docs_packing_efficiency` emits "
        "2x shards rows, `emb_cluster_balanced_selection` quota x k "
        "rows) still do corpus-proportional WORK — the row counts "
        "just don't show it. `curation_mix_diff` runs the batch "
        "funnel TWICE (both corpus versions) plus a top-k-bounded "
        "join, so its wall tracks ~2x `docs_curation_funnel`'s.\n\n"
        "| query | 1x sec | 1x rows | 30x sec | 30x rows | time ratio |\n"
        "|---|---|---|---|---|---|\n"
        + "\n".join(
            f"| `{n}` | {t1} | {n1} | {t30} | {n30} | {r}x |"
            for n, t1, n1, t30, n30, r in rows
        )
        + "\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
