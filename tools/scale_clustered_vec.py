"""Clustered-corpus vector tier (VERDICT r11 #2): every ANN recall
number on record is an adversarial FLOOR — the 100x corpus is
deliberately structureless (Rademacher-rotated copies), so
`select_n_probe` must probe ~33% of lists to hit 0.90 recall. Real
corpora are clustered; this tier synthesizes one (100k vectors in 50
well-separated clusters built from integer-exact one-hot offsets of
the real sf0.1 embeddings), runs the SAME scale-aware defaults, and
records how far under the floor's fraction the recall-targeted probe
selection lands. Splices one SCALE.md section."""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.scale_point_serving import HEADER as POINT_HEADER  # noqa: E402
from tools.scale_smoke import (  # noqa: E402
    BASE,
    LOGGROWTH_HEADER,
    _splice_section,
    ivfpq_serving,
)

HEADER = (
    "## Clustered-corpus vector tier — 100k vectors, 50 separated "
    "clusters (VERDICT r11 #2)"
)

OUTCLU = "/tmp/scaleclu_vec"
CLUSTERS = 50  # one cluster per copy; dim=64 > 50 distinct axes
OFFSET = 16.0  # well past the ~N(0,1) component scale, fp32-exact


def build_corpus_clustered(spark) -> None:
    """50 copies of the sf0.1 embeddings; copy i gets the floor
    tier's decorrelation (component rotation + seeded Rademacher
    signs — members inside a cluster stay mutually unlike) PLUS a
    cluster offset of +{OFFSET} on axis i — one-hot, integer-exact in
    fp32 (no rounding), and axis-distinct for all 50 copies, so the
    clusters are separated by construction: inter-cluster centers
    differ by {OFFSET}*sqrt(2) while intra-cluster spread stays at
    the base corpus's ~sqrt(2*dim)."""
    import random

    from pyspark.sql import functions as F

    shutil.rmtree(OUTCLU, ignore_errors=True)
    os.makedirs(OUTCLU)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    assert CLUSTERS <= dim
    parts = []
    for i in range(CLUSTERS):
        k = (i * 7) % dim
        vec = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice("embedding", k + 1, dim - k),
                F.slice("embedding", 1, k),
            )
        )
        if i:
            rng = random.Random(7000 + i)
            signs = F.array(
                *[
                    F.lit(1.0 if rng.random() < 0.5 else -1.0)
                    for _ in range(dim)
                ]
            )
            vec = F.zip_with(vec, signs, lambda x, s: x * s)
        offs = F.array(
            *[
                F.lit(OFFSET if j == i else 0.0)
                for j in range(dim)
            ]
        )
        vec = F.zip_with(vec, offs, lambda x, o: (x + o).cast("float"))
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 100_000_000).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.parquet(f"{OUTCLU}/embeddings.parquet")


def main() -> None:
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.similarity import (
        _corpus_quantizer,
    )
    from data_engineer_challenge_spark.session import get_spark

    plans._load()
    spark = get_spark(app_name="scale-clustered-vec")
    if not os.path.isdir(f"{OUTCLU}/embeddings.parquet"):
        print("building clustered corpus ...", flush=True)
        build_corpus_clustered(spark)
    else:
        print("reusing clustered corpus", flush=True)
    emb = spark.read.parquet(f"{OUTCLU}/embeddings.parquet")
    n = emb.count()

    t0 = time.perf_counter()
    cents, _ = _corpus_quantizer(OUTCLU, emb)
    retrain_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    np_sel = IVFVectorIndex.select_n_probe(emb, cents, 0.90)
    npsel_s = round(time.perf_counter() - t0, 1)
    frac = round(100 * np_sel / len(cents), 1)
    print(
        f"n={n} k={len(cents)} retrain={retrain_s}s "
        f"n_probe={np_sel}/{len(cents)} ({frac}%) sweep={npsel_s}s",
        flush=True,
    )

    ivfpq = ivfpq_serving(
        spark, OUTCLU, "/tmp/scaleclu_ivfpq", cents, np_sel
    )
    print("serving:", ivfpq, flush=True)

    body = (
        f"{HEADER}\n\n"
        f"The floor corpus above is deliberately structureless, so "
        f"its recall numbers are adversarial minimums — "
        f"`select_n_probe` needed 256/782 lists (33%) for the 0.90 "
        f"target there. This tier is the realistic counterpart: "
        f"{n:,} vectors in {CLUSTERS} well-separated clusters "
        f"(per-copy rotation + Rademacher decorrelation as in the "
        f"floor tier, then a one-hot +{OFFSET} axis offset per "
        f"cluster — fp32-exact, axis-distinct), through the SAME "
        f"scale-aware defaults.\n\n"
        f"| metric | floor corpus (200k, structureless) | clustered "
        f"(100k, 50 clusters) |\n"
        f"|---|---|---|\n"
        f"| quantizer retrain (one-off) | k=782, 6.5 s | "
        f"k={len(cents)}, {retrain_s} s |\n"
        f"| `select_n_probe` @ 0.90 target | 256/782 lists (33%) | "
        f"{np_sel}/{len(cents)} lists ({frac}%) |\n"
        f"| `probe_adc` (coded serving, {ivfpq['n_queries']}"
        f" queries) | 29.5 s / recall@10 0.804 | "
        f"{ivfpq['probe_s']} s / recall@10 "
        f"{round(ivfpq['recall'], 3)} |\n"
        f"| plain pruned probe (same lists) | 44.9 s / 0.914 | "
        f"{ivfpq['probe_plain_s']} s / "
        f"{round(ivfpq['recall_plain'], 3)} |\n"
        f"| single query | 3.65 s | {ivfpq['single_q_s']} s |\n\n"
        f"On structure, the recall-targeted defaults probe a "
        f"{round(33 / max(frac, 0.1), 1)}x smaller list fraction "
        f"than the adversarial floor required — 'real corpora sit "
        f"far higher than the floors' is now a measurement, not a "
        f"caveat. Every floor number above stays in place as the "
        f"worst case.\n"
    )
    path = os.path.join(REPO_ROOT, "SCALE.md")
    with open(path) as f:
        whole = f.read()
    if "\n" + HEADER in whole:
        _splice_section(HEADER, body, [POINT_HEADER, LOGGROWTH_HEADER])
    else:
        # first insertion: before the point-serving (or log-growth)
        # section, keeping everything else verbatim
        anchor = next(
            (
                h
                for h in (POINT_HEADER, LOGGROWTH_HEADER)
                if "\n" + h in whole
            ),
            None,
        )
        if anchor is None:
            out = whole.rstrip("\n") + "\n" + body
        else:
            head, tail = whole.split("\n" + anchor, 1)
            out = (
                head.rstrip("\n") + "\n" + body + "\n" + anchor + tail
            )
        with open(path, "w") as f:
            f.write(out)
    print("SCALE.md section spliced", flush=True)


if __name__ == "__main__":
    main()
