"""Point-serving CLI — answer ONE vector query from a persisted
IVF-PQ store with NO SparkSession and NO JVM (r12, VERDICT r11 #3):

    python tools/serve_query.py --store /path/to/ivfpq \\
        --vec "0.12,-0.3,..." [--k 10] [--n-probe 8] [--shortlist 60]

Prints one JSON line: {"results": [[c_id, cos_sim, rank], ...],
"wall_ms": ..., "n_probe": ..., "shortlist": ...}. Answers are
bit-identical to the cluster's `probe_adc` for the same config
(pinned in tests). `--n-probe` defaults to the store's persisted
`n_probe` hint when one exists (written by maybe_rebucket /
select_n_probe), else 2. The process imports pyspark's MODULE (a
plain Python import) but never starts a session — serving latency is
the pyarrow read (first touch) + resident-numpy scoring measured in
SCALE.md's point-serving table."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True, help="IVFVectorIndex path")
    ap.add_argument(
        "--vec",
        required=True,
        help="query vector: comma-separated floats, or @file.json "
        "holding a JSON array",
    )
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--n-probe",
        type=int,
        default=None,
        help="lists to probe (default: the store's persisted hint, "
        "else 2)",
    )
    ap.add_argument("--shortlist", type=int, default=60)
    args = ap.parse_args()

    if args.vec.startswith("@"):
        with open(args.vec[1:]) as f:
            vec = [float(x) for x in json.load(f)]
    else:
        vec = [float(x) for x in args.vec.split(",")]

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    idx = IVFVectorIndex.open_local(args.store)
    # identity check, not truthiness: an explicit --n-probe 0 must
    # error, never be silently replaced by the store hint (r13 review)
    if args.n_probe is not None and args.n_probe <= 0:
        ap.error("--n-probe must be positive")
    n_probe = (
        args.n_probe
        if args.n_probe is not None
        else (idx.n_probe_hint or 2)
    )
    t0 = time.perf_counter()
    res = idx.probe_local(
        vec, k=args.k, n_probe=n_probe, shortlist=args.shortlist
    )
    wall_ms = round((time.perf_counter() - t0) * 1000, 1)
    print(
        json.dumps(
            {
                "results": [[c, s, r] for c, s, r in res],
                "wall_ms": wall_ms,
                "n_probe": n_probe,
                "shortlist": args.shortlist,
            }
        )
    )


if __name__ == "__main__":
    main()
