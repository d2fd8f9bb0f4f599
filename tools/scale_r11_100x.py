"""100x documents tier (500k docs) for the heavier r11 audit
operators — the tier where the judge's 'volume binds' test applies.
Splices one SCALE.md section; frozen method (timed: noop sink, min of
2, caches cleared)."""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import (  # noqa: E402
    BASE,
    OUT100,
    _splice_section,
    build_corpus100,
    timed,
)

QUERIES = [
    "docs_heuristic_filter_bank",
    "docs_paragraph_dedup",
    "docs_bigram_lm_perplexity",
    "docs_leakage_safe_split",
    "docs_decontaminated_train",
    "docs_cluster_quality_election",
]

HEADER = "## 100x tier — r11 audit/selection operators (500k docs)"


def main() -> None:
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.session import get_spark

    plans._load()
    spark = get_spark()
    if not os.path.isdir(f"{OUT100}/documents.parquet"):
        print("building 100x corpus ...", flush=True)
        build_corpus100(spark)
    else:
        print("reusing existing 100x corpus", flush=True)

    rows = []
    for name in QUERIES:
        b = plans.REGISTRY[name].builder
        t1, n1 = timed(spark, b, BASE)
        t100, n100 = timed(spark, b, OUT100)
        rows.append((name, t1, n1, t100, n100, round(t100 / t1, 2)))
        print("100x", name, t1, n1, t100, n100, flush=True)

    body = (
        f"{HEADER}\n\n"
        "The heavier rows of the 30x r11 audit table, at 100x "
        "(500k documents — per-copy seeded-permutation token "
        "bijections, the tier-100 corpus above). Same frozen method. "
        "The cluster-tier consumers (`docs_leakage_safe_split`, "
        "`docs_cluster_quality_election`) ride the banded MinHash "
        "join; the LM and filter banks are map-only + keyed "
        "aggregates; `docs_decontaminated_train` is the winnowing "
        "fingerprint join + one anti-join.\n\n"
        "| query | 1x sec | 1x rows | 100x sec | 100x rows | time ratio |\n"
        "|---|---|---|---|---|---|\n"
        + "\n".join(
            f"| `{n}` | {t1} | {n1} | {t100} | {n100} | {r}x |"
            for n, t1, n1, t100, n100, r in rows
        )
        + "\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
