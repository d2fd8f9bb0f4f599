"""Deterministic distributed logistic regression over hashed
bag-of-n-gram features — the trainer behind the learned quality
classifier (the CCNet / GPT-3 "Wikipedia-vs-CommonCrawl" filter
stage, public method: Wenzek et al. 2019 CCNet; Brown et al. 2020
GPT-3 §A; Joulin et al. 2016 fastText).

The MODEL is fastText's linear architecture: mean-pooled hashed
features through a single logistic unit,

    p(doc) = sigmoid( bias + Σ_g w[bucket(g)] / n_grams(doc) ).

The TRAINER is full-batch gradient descent with a fixed iteration
count — chosen over SGD precisely because it is *deterministic*: the
gradient is a sum over documents, and sums of doubles depend on
accumulation order (partition boundaries), so every cross-document
sum goes through an exact wide-decimal cast (the plans/helpers.dec_sum
discipline) and the weight update happens driver-side in plain float64.
Same inputs → bit-identical weights, regardless of partitioning or
parallelism — which is what lets the frozen production weights
(plans/quality_weights.py) carry an executable-provenance pytest
(tests re-run this trainer and assert equality), the same posture as
``operators/bpe.train_bpe`` and ``similarity.kmeans_centroids``.

Scale shape: each iteration is two aggregates over the (doc, bucket,
count) feature frame — per-doc logits (one shuffle keyed by doc, with
the D-row weight table broadcast), then per-bucket gradients (one
shuffle keyed by bucket, ≤ D result rows). The feature frame is cached
once; the model state (D doubles + bias) lives on the driver and is
re-broadcast per iteration — corpus-size-free, exactly how a
production run trains on a hash-sample and ships the weights as a
constant. The per-iteration collect is ≤ D rows (driver-bounded by
parameter).

Reference scope: the reference engine has no model-training surface
(SURVEY §2.10 — LLM-pipeline tier driven by BASELINE.json's
quality-filtering stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..localrel import local_rows_df

#: exact cross-row accumulator for gradient/logit sums — wider scale
#: than plans/helpers.DEC because training compounds rounding across
#: iterations (the 4dp OUT rounding there is a cross-engine RESULT
#: semantic; here both consumers are this very function)
_ACC = "decimal(38,18)"


def sigmoid(col):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def train_logreg_hashed(
    feats: DataFrame,
    labels: DataFrame,
    buckets: int,
    iters: int = 24,
    lr: float = 300.0,
    lr_bias: float = 2.0,
) -> tuple[float, list[float]]:
    """Train mean-pooled hashed-feature logistic regression.

    ``feats``: one row per (doc, bucket) — columns ``doc_id``,
    ``b`` (long, in [0, buckets)), ``c`` (long count), ``n`` (long,
    the doc's TOTAL gram count, denormalized onto every row so the
    mean-pool never needs a second aggregate). Docs with zero grams
    carry no rows and are excluded — mirroring the scorer, which can
    only emit feature-bearing docs.
    ``labels``: ``doc_id``, ``y`` (double in {0.0, 1.0}).

    Returns ``(bias, weights)`` with ``len(weights) == buckets``.
    Deterministic: zero init, fixed iteration count, exact decimal
    cross-document sums, float64 driver-side updates.

    Two learning rates because the mean-pooled features sum to 1
    across buckets: a single bucket's average activation is ~1/D, so
    its loss curvature is ~D² smaller than the bias term's — one
    shared rate either stalls the weights or oscillates the bias.
    ``lr`` (weights) defaults near the bucket count; ``lr_bias``
    stays in the classic GD range.
    """
    x = (
        feats.join(labels, "doc_id")
        .select(
            "doc_id",
            "b",
            (F.col("c").cast("double") / F.col("n")).alias("x"),
            "y",
        )
        # pin: re-read twice per iteration. persist (not
        # localCheckpoint): checkpointed frames are invisible to the
        # cache manager, so they could never be RELEASED — storage
        # grew linearly in iters for the life of the session (r8
        # ADVICE). Values are identical either way (deterministic
        # plan, exact decimal sums), so the frozen-weights provenance
        # is untouched.
        .persist()
    )
    n_docs = x.select("doc_id").distinct().count()
    if n_docs == 0:
        raise ValueError("train_logreg_hashed: no feature-bearing docs")
    bias = 0.0
    w = [0.0] * buckets

    prev_err = None  # last iteration's pinned frame, freed each loop
    for _ in range(iters):
        wdf = F.broadcast(
            local_rows_df(
                x.sparkSession,
                [(b, w[b]) for b in range(buckets)],
                "b long, w double",
            )
        )
        # per-doc error: exact decimal dot product -> double sigmoid.
        # Pinned: both gradient aggregates below consume it, and an
        # unpinned plan would recompute the join+aggregate per consumer
        # (~2x per-iteration cost, r8 review finding); values are
        # unchanged, so the trained weights are bit-identical.
        # persist, not localCheckpoint — see x above.
        err = (
            x.join(wdf, "b")
            .groupBy("doc_id", "y")
            .agg(
                F.sum((F.col("w") * F.col("x")).cast(_ACC))
                .cast("double")
                .alias("s")
            )
            .select(
                "doc_id",
                (sigmoid(F.lit(bias) + F.col("s")) - F.col("y")).alias(
                    "e"
                ),
            )
            .persist()
        )
        # per-bucket gradient + bias gradient, both exact-decimal
        # cross-document sums (order-independent), ≤ buckets+1 rows
        g = (
            x.join(err, "doc_id")
            .groupBy("b")
            .agg(
                F.sum((F.col("e") * F.col("x")).cast(_ACC))
                .cast("double")
                .alias("gb")
            )
            .collect()
        )
        g0 = (
            err.agg(F.sum(F.col("e").cast(_ACC)).cast("double").alias("g"))
            .collect()[0]["g"]
        )
        # both gradient collects have consumed err — release the
        # PREVIOUS iteration's checkpointed blocks now (r8 ADVICE:
        # without this, block-manager storage grows linearly in iters
        # for the life of the session)
        if prev_err is not None:
            prev_err.unpersist()
        prev_err = err
        for r in g:
            w[int(r["b"])] -= lr * r["gb"] / n_docs
        bias -= lr_bias * g0 / n_docs
    if prev_err is not None:
        prev_err.unpersist()
    x.unpersist()
    return bias, w
