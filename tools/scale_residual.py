"""Raw-coded vs residual-coded IVF-PQ serving at the 30x vector tier.

Both stores share EVERYTHING except what the codes cover: the same
30x corpus (60k vectors), the same scale-aware quantizer, the same
recall-targeted n_probe, the same shortlist, and codebooks trained by
the same deterministic trainer ON THIS corpus — raw codebooks on the
raw vectors, residual codebooks on the coarse-quantizer residuals.
The delta is therefore the residual-coding decision alone (IVFADC,
Jégou et al. §IV.B). Splices one SCALE.md section.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_smoke import OUT30, _splice_section, build_corpus30  # noqa: E402

HEADER = "## Residual vs raw PQ coding — IVF-PQ serving at 30x (r11)"
SHORTLIST = 2560  # the tier's documented select_adc_width decision


def main() -> None:
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
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
    if not os.path.isdir(f"{OUT30}/embeddings.parquet"):
        print("building 30x corpus ...", flush=True)
        build_corpus30(spark)
    emb = spark.read.parquet(f"{OUT30}/embeddings.parquet")
    cents, _np_def = _corpus_quantizer(OUT30, emb)
    n_probe = IVFVectorIndex.select_n_probe(emb, cents, 0.90)
    print(f"quantizer k={len(cents)}, n_probe={n_probe}", flush=True)

    t0 = time.perf_counter()
    raw_cbs = train_pq_codebooks(emb)
    raw_train_s = round(time.perf_counter() - t0, 3)
    assigned = assign_cells_vectorized(emb, cents).localCheckpoint()
    res_frame = assigned.select(
        "vec_id",
        F.col("cell").alias("cid"),
        F.col("embedding").alias("__raw"),
    )
    # residuals via the Arrow assignment output + a zip_with against
    # the literal centroid table (the residual_vec expression, inlined
    # here because the kernel already produced the cell ids)
    from data_engineer_challenge_spark.operators.pq import residual_vec

    res_vec = res_frame.select(
        "vec_id",
        residual_vec(F.col("__raw"), cents, "cid").alias("embedding"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    res_cbs = train_pq_codebooks(res_vec)
    res_train_s = round(time.perf_counter() - t0, 3)
    print(
        f"codebooks trained: raw {raw_train_s}s, residual {res_train_s}s",
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

    rows = []
    for label, cbs, residual in (
        ("raw codes", raw_cbs, False),
        ("residual codes", res_cbs, True),
    ):
        root = f"/tmp/scale30_respq_{'res' if residual else 'raw'}"
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
                    queries, k=10, n_probe=n_probe, shortlist=SHORTLIST
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
        print("30x", label, rows[-1], flush=True)

    body = (
        f"{HEADER}\n\n"
        f"Same 30x corpus (60k vectors), same scale-aware quantizer "
        f"(k={len(cents)}), same recall-targeted n_probe={n_probe}, "
        f"same shortlist={SHORTLIST}, codebooks trained by the same "
        f"deterministic trainer on THIS corpus (raw {raw_train_s} s / "
        f"residual {res_train_s} s, offline one-offs) — the only "
        "difference is what the 8 bytes/vector cover. Residual coding "
        "(IVFADC) spends the bits on the smaller-variance signal and "
        "restores the coarse term exactly as one ⟨q, c⟩ per (query, "
        "probed cell), so recall rises at identical probe cost; the "
        "registered `emb_pq_residual_adc_knn` row carries the full "
        "DuckDB oracle for the same semantics at driver scale.\n\n"
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
