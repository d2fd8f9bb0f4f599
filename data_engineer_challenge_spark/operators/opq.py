"""Optimized Product Quantization (OPQ) — Ge, He, Ke & Sun,
"Optimized Product Quantization for Approximate Nearest Neighbor
Search" (CVPR 2013, public method): learn an ORTHOGONAL rotation
``R`` so that product-quantizing the rotated vectors ``x·R``
minimizes reconstruction error, then encode/serve in the rotated
space. PQ splits dimensions into fixed subspaces; when variance or
correlation is unevenly spread across that split, some subspaces
waste their codewords while others underfit — the rotation
redistributes the energy so every subspace's ``ksub`` codewords do
useful work. Distances are preserved exactly (R is orthogonal:
``⟨xR, yR⟩ = ⟨x, y⟩`` up to float rounding), so the exact-rescore
stage and every recall number remain comparable with the unrotated
pipeline.

This module follows the repo's frozen-artifact discipline
(plans/pq_codebooks.py posture): training is DETERMINISTIC — a
hash-ordered sample, linspace-seeded Lloyd per subspace, SVD-solved
Procrustes updates — so a frozen rotation re-derives bit-identically
on the same platform (provenance-testable), and at 100 TB the
rotation trains offline on a driver-bounded sample and ships as a
constant beside the codebooks.

Scale shape: applying the rotation is one Arrow map pass
(``rotate_vectorized`` — a (batch × dim) · (dim × dim) matmul per
batch, no shuffle); everything downstream (encode, ADC, shortlist,
rescore) is the existing operators/pq.py machinery on the rotated
column, unchanged.

Honest caveat (measured in SCALE.md): on a corpus that is already
ISOTROPIC — per-dim variance uniform, cross-dim correlation ~0, the
deliberately structureless adversarial tier — the identity split is
near-optimal already and OPQ buys only a few percent; the lever
pays on anisotropic/correlated embeddings, which is what real text
encoders emit (power-law spectra).

Reference scope: the reference engine has no vector surface at all
(SURVEY §2.10 — driven by BASELINE.json's "similarity search").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default OPQ-NP alternation depth: ``OPQ_ITERS`` rotation updates,
#: each over codebooks retrained with ``OPQ_INNER_ITERS`` Lloyd steps
OPQ_ITERS = 8
OPQ_INNER_ITERS = 4
#: driver-bounded training sample (the quantizer-training posture:
#: offline, on a sample, never the full corpus)
OPQ_SAMPLE_N = 4096


def sample_vectors(
    df: DataFrame,
    n: int = OPQ_SAMPLE_N,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Deterministic driver-bounded training sample: the ``n`` rows
    with the smallest ``xxhash64(seed, id)`` (the k-means-init /
    held-out-query device — replays pick identical rows), collected
    in (hash, id) order so the numpy array's ROW ORDER is itself
    reproducible (the Lloyd fold below sums in row order). Returns a
    float64 ``(n, dim)`` array."""
    import numpy as np

    rows = (
        df.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
        )
        .withColumn("__h", F.xxhash64(F.lit(seed), F.col("__id")))
        .orderBy("__h", "__id")
        .limit(n)
        .collect()
    )
    return np.asarray([r["__v"] for r in rows], dtype=np.float64)


def _kmeans_subspace(Xs, ksub: int, iters: int):
    """Deterministic Lloyd over one subspace sample: seeds are the
    ``ksub`` rows at linspace positions of the (already
    deterministically ordered) sample — spread through the hash
    order, no RNG state; L2 argmin breaks ties toward the lowest
    codeword index (numpy argmin); means accumulate in fixed row
    order; an emptied cluster keeps its previous codeword."""
    import numpy as np

    n = len(Xs)
    seeds = np.linspace(0, n - 1, num=ksub).round().astype(int)
    C = Xs[seeds].copy()
    for _ in range(iters):
        d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(ksub):
            mask = assign == j
            if mask.any():
                C[j] = Xs[mask].mean(axis=0)
    return C


def _train_codebooks_np(XR, m: int, ksub: int, iters: int):
    sub = XR.shape[1] // m
    return [
        _kmeans_subspace(XR[:, i * sub : (i + 1) * sub], ksub, iters)
        for i in range(m)
    ]


def _encode_decode_np(XR, cbs):
    """Reconstruction of ``XR`` under per-subspace L2-argmin coding —
    the training loop's target for the Procrustes step."""
    import numpy as np

    m = len(cbs)
    sub = XR.shape[1] // m
    Y = np.empty_like(XR)
    for i, C in enumerate(cbs):
        s = XR[:, i * sub : (i + 1) * sub]
        a = ((s[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(
            axis=1
        )
        Y[:, i * sub : (i + 1) * sub] = C[a]
    return Y


def train_opq(
    X,
    m: int = 8,
    ksub: int = 16,
    iters: int = OPQ_ITERS,
    inner_iters: int = OPQ_INNER_ITERS,
):
    """OPQ-NP (Ge et al. 2013 §4, the non-parametric alternation) on
    a float64 sample ``X``: starting from ``R = I``, alternate
    (a) retrain per-subspace codebooks on ``X·R``, (b) set ``Y`` to
    the coded reconstruction and solve the orthogonal Procrustes
    problem ``min_R ‖X·R − Y‖_F`` via one SVD (``R = U·Vᵀ`` of
    ``XᵀY``). Returns ``(R, codebooks)`` where ``R`` is a
    ``dim × dim`` nested list (row-major: rotate with ``x @ R``) and
    ``codebooks`` is the operators/pq.py literal format
    (float32-rounded, the frozen-codebook convention) trained on the
    FINAL rotation.

    Deterministic end to end: the sample row order is the caller's
    (``sample_vectors``), Lloyd seeding/ties/folds are fixed, and
    the SVD runs on the same matrix every replay — the provenance
    test retrains and compares equal."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    R = np.eye(dim)
    for _ in range(iters):
        XR = X @ R
        cbs = _train_codebooks_np(XR, m, ksub, inner_iters)
        Y = _encode_decode_np(XR, cbs)
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    cbs = _train_codebooks_np(X @ R, m, ksub, inner_iters)
    codebooks = [
        [
            [float(np.float32(v)) for v in row]
            for row in C
        ]
        for C in cbs
    ]
    return [[float(v) for v in row] for row in R], codebooks


def quantization_error(X, codebooks):
    """Mean squared reconstruction error of coding ``X`` with
    ``codebooks`` — the objective OPQ minimizes; exposed for the
    SCALE receipts and the improvement pin test."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    cbs = [np.asarray(C, dtype=np.float64) for C in codebooks]
    Y = _encode_decode_np(X, cbs)
    return float(((X - Y) ** 2).sum(axis=1).mean())


def rotate_vectorized(
    df: DataFrame,
    rotation,
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply the frozen rotation as ONE Arrow map pass — each batch
    is a ``(rows × dim) @ (dim × dim)`` float64 matmul, cast back to
    the INPUT element type (float32 in, float32 out — the corpus
    convention; float64 stays float64), all other columns passed
    through untouched. No shuffle, no join: the rotation rides
    whatever scan feeds it, exactly like the encode kernel it
    precedes."""
    import numpy as np

    R = np.asarray(rotation, dtype=np.float64)
    # dtype-preserving (r14 review): the rotated column keeps the
    # input element type — float32 input takes a float32 round-trip
    # (the probe_local single-query path mirrors exactly this),
    # float64 stays float64. Forcing float32 silently narrowed
    # double-vector appends to a rotated store, breaking the
    # "comparable with an unrotated store over the same data" claim.
    elem = df.schema[vec_col].dataType.elementType.simpleString()
    out_np = np.float32 if elem == "float" else np.float64
    schema = ", ".join(
        f"`{c}` array<{elem}>"
        if c == vec_col
        else f"`{c}` {df.schema[c].dataType.simpleString()}"
        for c in df.columns  # column order preserved: downstream
        # writers (partitioned stores) see the caller's schema shape
    )

    def rot(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Xb = np.stack(
                pdf[vec_col].map(
                    lambda a: np.asarray(a, dtype=np.float64)
                )
            )
            out = (Xb @ R).astype(out_np)
            data = {
                c: (list(out) if c == vec_col else pdf[c])
                for c in pdf.columns
            }
            yield pd.DataFrame(data)

    return df.mapInPandas(rot, schema=schema)
