"""Raw vs residual IVF-PQ serving at the 100x vector tier (~200k
vectors) — the scale_residual.py comparison at the tier where vector
volume binds. Same method: shared scale-aware quantizer, shared
recall-targeted n_probe, shared shortlist (the tier's documented 5120
select_adc_width decision), codebooks trained on THIS corpus both
ways. Splices one SCALE.md section."""

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

HEADER = "## Residual vs raw PQ coding — IVF-PQ serving at 100x (r11)"
SHORTLIST = 5120  # the tier's documented select_adc_width decision
N_PROBE = 256  # the tier's documented select_n_probe(0.90) decision


def main() -> None:
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
        residual_vec,
        train_pq_codebooks,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        assign_cells_vectorized,
        brute_force_topk_vectorized,
    )
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark()
    if not os.path.isdir(f"{OUT100V}/embeddings.parquet"):
        print("building 100x vector corpus ...", flush=True)
        build_corpus100_vec(spark)
    emb = spark.read.parquet(f"{OUT100V}/embeddings.parquet")
    cents, _np_def = _corpus_quantizer(OUT100V, emb)
    print(f"quantizer k={len(cents)}", flush=True)

    t0 = time.perf_counter()
    raw_cbs = train_pq_codebooks(emb)
    raw_train_s = round(time.perf_counter() - t0, 3)
    assigned = assign_cells_vectorized(emb, cents).localCheckpoint()
    res_vec = assigned.select(
        "vec_id",
        residual_vec(F.col("embedding"), cents, "cell").alias(
            "embedding"
        ),
    ).localCheckpoint()
    t0 = time.perf_counter()
    res_cbs = train_pq_codebooks(res_vec)
    res_train_s = round(time.perf_counter() - t0, 3)
    print(
        f"codebooks: raw {raw_train_s}s, residual {res_train_s}s",
        flush=True,
    )

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
    print(f"exact set over {len(exact)//10} queries", flush=True)

    rows = []
    for label, cbs, residual in (
        ("raw codes", raw_cbs, False),
        ("residual codes", res_cbs, True),
    ):
        root = f"/tmp/scale100_respq_{'res' if residual else 'raw'}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        idx = IVFVectorIndex(
            spark, root, cents, pq_codebooks=cbs, pq_residual=residual
        )
        idx.build(emb)
        build_s = round(time.perf_counter() - t0, 3)
        walls, got = [], set()
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            got = {
                (r["q_id"], r["c_id"])
                for r in idx.probe_adc(
                    queries, k=10, n_probe=N_PROBE, shortlist=SHORTLIST
                ).collect()
            }
            walls.append(time.perf_counter() - t0)
        rows.append(
            (
                label,
                build_s,
                round(min(walls), 3),
                round(len(got & exact) / len(exact), 4),
            )
        )
        print("100x", label, rows[-1], flush=True)

    body = (
        f"{HEADER}\n\n"
        f"The 30x comparison above, at the ~200k-vector tier: same "
        f"scale-aware quantizer (k={len(cents)}), same documented "
        f"n_probe={N_PROBE} / shortlist={SHORTLIST} serving config, "
        f"codebooks trained on this corpus both ways (raw "
        f"{raw_train_s} s / residual {res_train_s} s, offline "
        "one-offs). Same adversarial-corpus caveat as every vector "
        "tier: decorrelated near-uniform vectors are the floor case.\n\n"
        "| store | build s | probe_adc s (min of 2) | recall@10 vs exact |\n"
        "|---|---|---|---|\n"
        + "\n".join(
            f"| {l} | {b} | {p} | {r} |" for l, b, p, r in rows
        )
        + "\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
