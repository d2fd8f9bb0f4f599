"""Regenerate QUERIES.md from the plans registry.

Usage: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADER = """# QUERIES — registered engine inventory

Auto-generated from `data_engineer_challenge_spark/plans` (the registry
behind `__spark_entry__.queries()`/`oracle_sql()`). `oracle` = exact
DuckDB hash-compare, run by the driver at sf0.01 for the 50 driver-
surface queries and by the local pytest harness for every registered
query (the driver records only the first 50 registrations, so
redundant-or-infrastructure entries are marked `oracle (pytest)` and
verified locally; see plans/__init__.py register(driver=False)).

| query | check | summary |
|---|---|---|
"""


def summary_of(builder) -> str:
    doc = (builder.__doc__ or "").strip()
    para = doc.split("\n\n")[0]
    flat = " ".join(para.split())
    if len(flat) > 158:
        flat = flat[:155] + "..."
    return flat.replace("|", "\\|")


def main() -> None:
    from data_engineer_challenge_spark import plans

    plans._load()
    lines = [HEADER]
    n_driver = 0
    n_oracle = 0
    for name in sorted(plans.REGISTRY):
        spec = plans.REGISTRY[name]
        if spec.oracle is None:
            check = "rows-only"
        elif spec.driver:
            check = "oracle"
            n_driver += 1
        else:
            check = "oracle (pytest)"
        if spec.oracle is not None:
            n_oracle += 1
        lines.append(f"| `{name}` | {check} | {summary_of(spec.builder)} |\n")
    with open(os.path.join(REPO_ROOT, "QUERIES.md"), "w") as f:
        f.writelines(lines)
    print(
        f"wrote QUERIES.md: {len(plans.REGISTRY)} queries, "
        f"{n_oracle} oracled, {n_driver} on the driver surface"
    )


if __name__ == "__main__":
    main()
