"""SCALE receipts for the OPQ pre-rotation (r14, VERDICT r13 #5):
does a frozen orthogonal rotation (operators/opq.py, Ge et al. 2013)
narrow the recall-targeted ADC shortlist on the 200k vector tier?

Two corpora, same 4,096-row deterministic training sample, same
trainer for both arms (raw PQ = identity rotation), same
`select_adc_width(recall_target=0.9)` sweep:

- the ADVERSARIAL 200k corpus (/tmp/scale100vec — isotropic by
  construction: rotated/sign-flipped copies of near-iid embeddings).
  The honest expectation is ~no change: OPQ redistributes variance
  across subspaces, and an isotropic corpus is the fixed point of
  that redistribution.
- an ANISOTROPIC variant (per-dim power-law scaling, the spectrum
  shape real text encoders emit) — where the lever should pay.

Splices ONE SCALE.md section (appended last)."""

from __future__ import annotations

import os
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

HEADER = "## OPQ rotation — PQ code quality at the 200k tier (VERDICT r13 #5)"
RECALL_TARGET = 0.9
#: power-law spectrum for the anisotropic arm (deterministic)
ANISO_EXP = -0.7
ANISO_GAIN = 4.0


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.opq import (
        _train_codebooks_np,
        quantization_error,
        rotate_vectorized,
        sample_vectors,
        train_opq,
    )
    from data_engineer_challenge_spark.session import get_spark

    spark = get_spark(app_name="scale-opq")
    if not os.path.isdir(f"{OUT100V}/embeddings.parquet"):
        print("building 100x vector corpus ...", flush=True)
        build_corpus100_vec(spark)
    emb = spark.read.parquet(f"{OUT100V}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    scale = [
        float((i + 1) ** ANISO_EXP * ANISO_GAIN) for i in range(dim)
    ]
    aniso = emb.select(
        "vec_id",
        F.zip_with(
            "embedding",
            F.lit(scale).cast("array<float>"),
            lambda v, s: v * s,
        ).alias("embedding"),
    )

    rows = []
    for name, corpus in (
        ("adversarial (isotropic)", emb),
        ("anisotropic (power-law spectrum)", aniso),
    ):
        X = sample_vectors(corpus)
        raw_cbs_np = _train_codebooks_np(X, 8, 16, 4)
        raw_cbs = [
            [[float(np.float32(v)) for v in row] for row in C]
            for C in raw_cbs_np
        ]
        t0 = time.perf_counter()
        R, opq_cbs = train_opq(X)
        train_s = round(time.perf_counter() - t0, 1)
        e_raw = round(quantization_error(X, raw_cbs), 4)
        e_opq = round(
            quantization_error(np.asarray(X) @ np.asarray(R), opq_cbs), 4
        )
        t0 = time.perf_counter()
        w_raw = IVFVectorIndex.select_adc_width(
            corpus, raw_cbs, RECALL_TARGET
        )
        raw_s = round(time.perf_counter() - t0, 1)
        rotated = rotate_vectorized(corpus, R).localCheckpoint()
        try:
            t0 = time.perf_counter()
            w_opq = IVFVectorIndex.select_adc_width(
                rotated, opq_cbs, RECALL_TARGET
            )
            opq_s = round(time.perf_counter() - t0, 1)
        finally:
            del rotated
        rows.append((name, e_raw, e_opq, w_raw, w_opq, train_s))
        print(
            f"{name}: sample-MSE raw {e_raw} opq {e_opq} "
            f"(x{round(e_opq / e_raw, 3)}); shortlist@{RECALL_TARGET} "
            f"raw {w_raw} ({raw_s}s sweep) opq {w_opq} ({opq_s}s); "
            f"train {train_s}s",
            flush=True,
        )

    n = emb.count()
    table = "\n".join(
        f"| {name} | {er} | {eo} | {round(eo / er, 3)} | {wr:,} "
        f"| {wo:,} | {round(wo / wr, 3) if wr else '—'} |"
        for name, er, eo, wr, wo, ts in rows
    )
    iso, ani = rows
    body = (
        f"{HEADER}\n\n"
        f"`operators/opq.py` (Ge et al. 2013, OPQ-NP): a frozen "
        f"orthogonal pre-rotation trained deterministically on a "
        f"4,096-row hash-ordered sample (~{rows[0][5]} s on the "
        f"driver — the offline-quantizer posture), applied as one "
        f"Arrow map pass before the existing encode/ADC kernels; "
        f"orthogonality preserves every distance, so the exact "
        f"rescore and all recall numbers stay comparable. Both arms "
        f"use the SAME trainer (raw PQ = identity rotation) and the "
        f"same `select_adc_width(recall_target={RECALL_TARGET})` "
        f"sweep over the {n:,}-vector corpus:\n\n"
        f"| corpus | sample MSE raw | MSE OPQ | ratio | shortlist "
        f"raw | shortlist OPQ | ratio |\n"
        f"|---|---|---|---|---|---|---|\n"
        f"{table}\n\n"
        f"Read: on the DELIBERATELY structureless adversarial corpus "
        f"the rotation is honest about its limits — MSE improves "
        f"only ~{round((1 - iso[2] / iso[1]) * 100)}% (an isotropic "
        f"corpus is near the fixed point of variance "
        f"redistribution), and the doubling-ladder shortlist "
        f"{'narrows to ' + format(iso[4], ',') if iso[4] < iso[3] else 'stays at ' + format(iso[4], ',')} "
        f"— r13's 20,480-wide shortlist on this corpus was the price "
        f"of the corpus, not a missing lever. On the anisotropic "
        f"arm — the spectrum real encoders emit — OPQ cuts sample "
        f"MSE ~{round((1 - ani[2] / ani[1]) * 100)}% and the "
        f"{RECALL_TARGET}-recall shortlist "
        f"{'narrows ' + format(ani[3], ',') + ' → ' + format(ani[4], ',') if ani[4] < ani[3] else 'reads ' + format(ani[4], ',')}"
        f" — the standard lever, available when the data has "
        f"structure to exploit.\n"
    )
    _splice_section(HEADER, body, [])
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
