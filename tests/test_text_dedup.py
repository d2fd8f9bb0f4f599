"""Planted-duplicate tests for the approximate dedup operators: LSH
tiers must find what the exhaustive baselines find."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_challenge_spark.operators.text_dedup import (
    hamming64,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
    simhash64,
)

BASE = (
    "spark query engine shuffles data between executors during wide "
    "transformations and the optimizer prunes columns at the parquet scan "
    "while the scheduler assigns tasks to free slots across the cluster"
)
NEAR = BASE.replace("free slots", "available slots")  # one-word edit
FAR = (
    "completely different document about cooking pasta with tomato sauce "
    "basil garlic and olive oil simmered slowly over low heat for an hour"
)


def _docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)]  # 4 == exact dup of 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            _docs(spark), "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_fingerprint_properties(spark):
    out = {
        r["doc_id"]: r["sh"]
        for r in _docs(spark).select("doc_id", simhash64("text").alias("sh")).collect()
    }
    assert out[1] == out[4]  # identical text → identical fingerprint
    df = spark.createDataFrame(
        [(out[1], out[2]), (out[1], out[3])], "a long, b long"
    ).select(hamming64(F.col("a"), F.col("b")).alias("d"))
    d_near, d_far = [r["d"] for r in df.collect()]
    assert d_near < d_far  # near-dup closer than unrelated text


def test_simhash_pairs_find_exact_dup(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidate_pairs(
            _docs(spark), "doc_id", "text", max_hamming=6
        ).collect()
    }
    assert (1, 4) in pairs
    assert (1, 3) not in pairs


def test_minhash_covers_global_exhaustive_pairs(spark):
    """docs_minhash_neardup's oracle is the GLOBAL exhaustive Jaccard
    join, so its 8×4 banding must recover every true pair — a hard
    superset over the within-lang exhaustive set (the global set ⊇ it)
    and exact equality against its own oracle's pair list."""
    from data_engineer_challenge_spark import plans
    from tests.oracle import duckdb_oracle

    plans._load()
    sf = "/root/testdata/sf0.001"
    spec = plans.REGISTRY["docs_minhash_neardup"]
    lsh = {
        (r["id_a"], r["id_b"]) for r in spec.builder(spark, sf).collect()
    }
    want = {
        (int(r.id_a), int(r.id_b))
        for r in duckdb_oracle(spec.oracle, sf).itertuples()
    }
    assert want, "fixture should contain planted near-dups"
    assert lsh == want, f"missed={want - lsh} extra={lsh - want}"


def test_clean_corpus_banding_covers_exhaustive_pairs(spark):
    """documents_clean_corpus swaps the oracle's exhaustive within-lang
    Jaccard join for MinHash banding (16 bands × 2 rows) — identical
    results require candidates ⊇ true pairs, asserted here as a hard
    superset, not a recall ratio."""
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.001"
    exhaustive = {
        (r["id_a"], r["id_b"])
        for r in plans.REGISTRY["baseline_ngram_jaccard_pairs"].builder(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    banded = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            docs, "doc_id", "text", bands=16, block_cols=("lang",)
        ).collect()
    }
    assert exhaustive, "fixture should contain planted near-dups"
    assert exhaustive <= banded, f"banding missed: {exhaustive - banded}"


def test_ivf_recall_vs_bruteforce(spark):
    """The frozen sample-trained quantizer IVF (k-means k=16 on the
    1/2 hash-sample, n_probe=12) must reach recall ≥ 0.9 at the
    driver's correctness scale (sf0.01); measured 0.96, so there is
    real margin. The embeddings are near-uniform on the sphere, so
    this is the data-hardest regime for IVF — recall tracks probed
    fraction."""
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["q_id"], r["c_id"])
        for r in plans.REGISTRY["emb_knn_bruteforce"].builder(spark, sf).collect()
    }
    approx = {
        (r["q_id"], r["c_id"])
        for r in plans.REGISTRY["emb_ivf_topk"].builder(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ivf recall too low: {recall}"


def test_ivf_fused_matches_expression_form(spark):
    """The fused one-pass IVF (driver-side probes + single Arrow pass)
    must be bit-identical to the expression form with the same frozen
    centroids — same rows, same cos_sim doubles, same ranks."""
    import pyspark.sql.functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.similarity import ivf_topk
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    expr = sorted(
        map(tuple, ivf_topk(q, c, n_probe=12, k=10, centroids=CENTROIDS).collect())
    )
    fused = sorted(
        map(tuple, plans.REGISTRY["emb_ivf_topk"].builder(spark, sf).collect())
    )
    assert expr == fused


def test_kmeans_quantizer_deterministic_and_sampled(spark):
    """Same seed → identical centroids; the hash-sampled fit returns
    the same shape (k × dim) from a fraction of the rows."""
    from data_engineer_challenge_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_centroids(emb, k=4, iters=3)
    b = kmeans_centroids(emb, k=4, iters=3)
    assert a == b
    s = kmeans_centroids(emb, k=4, iters=3, sample_mod=4)
    assert len(s) == 4 and all(len(c) == len(a[0]) for c in s)
    assert s != a  # fitted on a strict subset


def test_lsh_neardup_recall_vs_label_blocked(spark):
    """Hyperplane-bucket blocking must recover a solid share of the
    label-blocked exhaustive near-dup pairs (cosine similar vectors
    land in the same sign-pattern bucket with high probability)."""
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.001"
    exhaustive = {
        (r["id_a"], r["id_b"])
        for r in plans.REGISTRY["baseline_emb_neardup_pairs"].builder(spark, sf).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in plans.REGISTRY["emb_lsh_neardup_pairs"].builder(spark, sf).collect()
    }
    assert exhaustive
    recall = len(lsh & exhaustive) / len(exhaustive)
    assert recall >= 0.25, f"lsh recall too low: {recall}"


def test_connected_components_known_graph(spark):
    from data_engineer_challenge_spark.operators.graph import (
        connected_components,
        dedup_clusters,
    )

    # two clusters {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    cc = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    clusters = {r["node"]: (r["canonical"], r["keep"]) for r in dedup_clusters(pairs).collect()}
    assert clusters[1] == (1, True) and clusters[4] == (1, False)
    assert clusters[10] == (10, True) and clusters[22] == (20, False)


def test_connected_components_raises_on_non_convergence(spark):
    """min-label propagation advances one hop per round; a cluster
    whose diameter exceeds max_iterations must raise rather than
    return two 'canonical' survivors inside one true cluster."""
    import pytest

    from data_engineer_challenge_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )  # diameter 8
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iterations=3)
    # and a sufficient budget converges to one component
    cc = {
        r["node"]: r["component"]
        for r in connected_components(chain, max_iterations=10).collect()
    }
    assert set(cc.values()) == {0}


def test_neardup_clusters_consistent_with_pairs(spark):
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.001"
    pairs = plans.REGISTRY["baseline_ngram_jaccard_pairs"].builder(spark, sf).collect()
    clusters = {
        r["node"]: r["canonical"]
        for r in plans.REGISTRY["docs_neardup_clusters"].builder(spark, sf).collect()
    }
    assert pairs and clusters
    for r in pairs:  # paired docs must share a component
        assert clusters[r["id_a"]] == clusters[r["id_b"]]


def test_vectorized_knn_matches_expression_knn(spark):
    """Bit-exact equality, cos_sim included: the vectorized path
    accumulates per-dimension in the same order as the expression
    fold, so the two forms share one oracle."""
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.001"
    exact = {
        (r["q_id"], r["c_id"], r["rank"], r["cos_sim"])
        for r in plans.REGISTRY["emb_knn_bruteforce"].builder(spark, sf).collect()
    }
    fast = {
        (r["q_id"], r["c_id"], r["rank"], r["cos_sim"])
        for r in plans.REGISTRY["emb_knn_vectorized"].builder(spark, sf).collect()
    }
    assert fast == exact


def test_lsh_pairs_match_numpy_brute_force(spark):
    """Property check against an independent numpy reference: the LSH
    result must equal EXACTLY the set {(a, b): a < b, same bucket in
    >= 1 table, cos > threshold} — the reference recomputes bucket
    assignment from the same plane matrix and exact cosine with
    ordinary float math, so any drift in the operator's quantization,
    bucket weighting, triangle masking, or cross-table dedup shows up
    as a set difference. Random-ish vectors come from a seeded
    generator (clustered so some near-dup pairs genuinely exist)."""
    import numpy as np

    from data_engineer_challenge_spark.operators.similarity import (
        _Q,
        _plane_matrix,
        lsh_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    n, dim, n_tables, n_planes, threshold = 120, 8, 4, 4, 0.6
    centers = rng.normal(size=(6, dim))
    mat = centers[rng.integers(0, 6, n)] + rng.normal(scale=0.25, size=(n, dim))

    planes = _plane_matrix(n_tables * n_planes, dim)
    q = np.floor(mat * _Q).astype(np.int64)
    proj = q @ planes.T
    bits = (proj >= 0).astype(np.int64).reshape(n, n_tables, n_planes)
    buckets = bits @ (1 << np.arange(n_planes, dtype=np.int64))
    norms = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / np.outer(norms, norms)
    want = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if (buckets[a] == buckets[b]).any() and cos[a, b] > threshold
    }

    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(
            df, threshold=threshold, n_tables=n_tables, n_planes=n_planes
        ).collect()
    }
    assert want, "fixture must produce non-trivial near-dup pairs"
    assert got == want, f"missed={want - got} extra={got - want}"


def test_lsh_pairs_duplicate_ids_emit_no_self_pairs(spark):
    """Two rows sharing a vec_id land in the same bucket; the grouped
    verify must not emit (id, id) self-pairs — the pair-join form's
    id_a < id_b value filter never could."""
    from data_engineer_challenge_spark.operators.similarity import lsh_neardup_pairs

    v = [1.0, 0.5, -0.25, 2.0]
    df = spark.createDataFrame(
        [(1, v), (1, v), (2, [x + 0.01 for x in v]), (3, [-x for x in v])],
        "vec_id long, embedding array<double>",
    )
    rows = lsh_neardup_pairs(df, threshold=0.9, n_tables=4, n_planes=2).collect()
    assert all(r["id_a"] != r["id_b"] for r in rows)
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (Schleimer et al. §2): two documents
    sharing a substring of length >= k + w - 1 must share at least one
    selected fingerprint; selection density over random text is ~
    2/(w+1). Also pins the partial-prefix-window variant: the first
    k-gram is always selected."""
    from data_engineer_challenge_spark.plans.text import (
        _FP_K,
        _FP_W,
        _winnow_fingerprints,
    )

    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    blob = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    shared = blob(_FP_K + _FP_W - 1)  # minimal guaranteed-shared run
    d1 = blob(120) + shared + blob(90)
    d2 = blob(77) + shared + blob(133)
    d3 = blob(260)  # unrelated
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    fps = _winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    for d, text in ((1, d1), (2, d2), (3, d3)):
        n_grams = len(text) - _FP_K + 1
        density = len(by_doc[d]) / n_grams
        # ~2/(w+1) = 0.4 at w=4, wide tolerance (distinct-set collapse)
        assert 0.2 < density < 0.6, (d, density)


def test_fingerprint_overlap_pairs_find_planted_copy(spark):
    """A document embedding a long copied passage from another must
    surface in docs_fingerprint_overlap_pairs even when the rest of
    the text is unrelated (the partial-plagiarism case bag-of-shingles
    Jaccard dilutes)."""
    import random

    from data_engineer_challenge_spark.plans.text import (
        _FP_MIN_SHARED,
        docs_fingerprint_overlap_pairs,
    )
    from data_engineer_challenge_spark import plans

    rng = random.Random(13)
    words = lambda n: " ".join(  # noqa: E731
        "".join(rng.choice("abcdefghij") for _ in range(5)) for _ in range(n)
    )
    passage = words(40)  # ~240 chars of copied text
    a = words(30) + " " + passage
    b = passage + " " + words(35)
    others = [(i, words(60)) for i in range(10, 16)]
    docs = spark.createDataFrame(
        [(1, a), (2, b), *others], "doc_id long, text string"
    )

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            (r["id_a"], r["id_b"]): r["n_shared"]
            for r in docs_fingerprint_overlap_pairs(spark, td).collect()
        }
    assert (1, 2) in out and out[(1, 2)] >= _FP_MIN_SHARED
    assert all(p == (1, 2) for p in out), out


def test_winnowing_arrow_matches_expression_form(spark):
    """The md5-tier Arrow winnowing kernel must be bit-identical to the
    pure-expression md5 plan — same md5 integer math (digest[:8] >> 4
    == first 15 hex digits), same window-min semantics, same distinct
    set. (The production poly tier has its own parity test below.)"""
    from data_engineer_challenge_spark.plans.text import (
        _winnow_fingerprints,
        _winnow_fingerprints_expr,
    )
    from data_engineer_challenge_spark.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints(docs, tier="md5").collect()
    }
    b = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints_expr(docs).collect()
    }
    assert a and a == b

    # the corpus is pure ASCII, so pin multibyte parity explicitly:
    # k-gram positions are CHARACTER offsets in Python slicing, Spark
    # substr and DuckDB substr alike — an accented doc must fingerprint
    # identically through the Arrow kernel (str slice -> utf-8 encode)
    # and the expression plan (char substr -> binary cast)
    accented = spark.createDataFrame(
        [
            (1, "le médecin a prescrit une radiographie à l'hôpital ce matin"),
            (2, "der größte Teil enthält umlaute äöü und scharfes ß überall"),
        ],
        "doc_id long, text string",
    )
    aa = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints(accented, tier="md5").collect()
    }
    bb = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints_expr(accented).collect()
    }
    assert aa and aa == bb


def test_winnowing_poly_tier_matches_reference_math(spark):
    """The production poly tier's vectorized mod-(2^61-1) arithmetic
    must equal a from-first-principles Python evaluation of the same
    polynomial (arbitrary-precision ints, no numpy) run through the
    same window-min selection — on multibyte text too, since the
    kernel reads codepoints via utf-32 decode while the oracle uses
    DuckDB unicode(substr(...))."""
    from data_engineer_challenge_spark.plans.text import (
        _FP_K,
        _FP_W,
        _POLY_P,
        _POLY_POW,
        _winnow_fingerprints,
        _winnow_norm,
    )

    docs = spark.createDataFrame(
        [
            (1, "le médecin a prescrit une radiographie à l'hôpital ce matin"),
            (2, "der größte Teil enthält umlaute äöü und scharfes ß überall"),
            (3, "plain ascii filler text repeated a few times " * 4),
            (4, "x" * _FP_K),  # exactly one k-gram
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in _winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    want = {}
    for r in _winnow_norm(docs).collect():
        t = r["t"]
        hs = [
            sum(ord(t[i + j]) * c for j, c in enumerate(_POLY_POW)) % _POLY_P
            for i in range(len(t) - _FP_K + 1)
        ]
        sel = {
            min(hs[max(0, i - (_FP_W - 1)) : i + 1]) for i in range(len(hs))
        }
        want[r["doc_id"]] = sel
    assert got == want and got[4] and all(got.values())


def test_quantized_knn_recall_vs_bruteforce(spark):
    """int8 quantization with a 3x shortlist must recover nearly all of
    the exact top-10: per-query recall >= 0.8, mean recall >= 0.9 on
    the sf0.001 corpus (64-dim vectors lose little ordering at 8
    bits)."""
    from data_engineer_challenge_spark import plans

    from .conftest import SF_SMOKE

    plans._load()
    sf = SF_SMOKE
    exact = {}
    for r in plans.REGISTRY["emb_knn_bruteforce"].builder(spark, sf).collect():
        exact.setdefault(r["q_id"], set()).add(r["c_id"])
    quant = {}
    for r in plans.REGISTRY["emb_quantized_knn"].builder(spark, sf).collect():
        quant.setdefault(r["q_id"], set()).add(r["c_id"])
    assert set(quant) == set(exact)
    recalls = [
        len(exact[q] & quant[q]) / len(exact[q]) for q in exact
    ]
    assert min(recalls) >= 0.8, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_minhash_index_incremental_probe(spark, tmp_path):
    """Incremental dedup lifecycle: build an index on a corpus, probe a
    new micro-batch — exact copies and near-dups of INDEXED docs are
    flagged with the right dup_of, fresh docs pass — then append the
    survivors and verify a re-probe now catches their duplicates."""
    from data_engineer_challenge_spark.operators.dedup_index import MinHashIndex
    from data_engineer_challenge_spark.tables import load_table

    import pytest

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    idx = MinHashIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    idx.build(docs)

    base = {r["doc_id"]: r["text"] for r in docs.limit(3).collect()}
    (k0, t0), (k1, t1) = list(base.items())[:2]
    near = t1.rsplit(" ", 1)[0] + " zzz"  # drop last word, add one
    batch = spark.createDataFrame(
        [
            (100001, t0),          # exact copy of an indexed doc
            (100002, near),        # near-dup of an indexed doc
            (100003, "totally fresh content " * 30 + "unseen words here"),
        ],
        "doc_id long, text string",
    )
    # probe reports EVERY indexed match over threshold (the corpus has
    # its own near-dup families, so an exact copy of doc A also matches
    # A's near-dups) — assert on the best match per new doc, which is
    # row-order independent
    dups: dict = {}
    for r in idx.probe(batch).collect():
        if r["new_id"] not in dups or r["jaccard"] > dups[r["new_id"]]["jaccard"]:
            dups[r["new_id"]] = r
    assert 100001 in dups and dups[100001]["dup_of"] == k0
    assert dups[100001]["jaccard"] == 1.0
    assert 100002 in dups and dups[100002]["dup_of"] == k1
    assert 100003 not in dups

    # append the survivor; its future copies must now be caught
    fresh = batch.filter(F.col("doc_id") == 100003)
    idx.append(fresh)
    copy = spark.createDataFrame(
        [(100004, "totally fresh content " * 30 + "unseen words here")],
        "doc_id long, text string",
    )
    redups = {r["new_id"]: r["dup_of"] for r in idx.probe(copy).collect()}
    assert redups == {100004: 100003}

    # parameter drift is an error, not a silent recall hole
    with pytest.raises(ValueError, match="hash family"):
        MinHashIndex(spark, str(tmp_path / "idx"), num_hashes=32, bands=16)


def test_minhash_index_probe_prunes_posting_buckets(spark, tmp_path):
    """The 100 TB layout claim, made literal: postings are written
    hash-partitioned as bands/bh_bucket=<pmod(hash(bh), N)>/ and a
    probe reads ONLY the buckets its own band hashes land in — the
    stored-postings FileScan must carry a non-empty PartitionFilters
    on bh_bucket, and a one-document probe must touch a strict subset
    of the bucket directories on disk."""
    import os

    from data_engineer_challenge_spark.operators.dedup_index import MinHashIndex
    from data_engineer_challenge_spark.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    idx = MinHashIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    idx.build(docs)

    # layout: the postings dir is partitioned by bucket, and the whole
    # corpus populates (nearly) all of them
    bucket_dirs = [
        d
        for d in os.listdir(tmp_path / "idx" / "bands")
        if d.startswith("bh_bucket=")
    ]
    assert len(bucket_dirs) > 1

    one = docs.limit(1).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    probed = idx.probe(one)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the stored-bands scan prunes on the partition column — a
    # non-empty PartitionFilters naming bh_bucket in the FileScan.
    # (Identify the scan by its column list, not its path: plan
    # strings truncate long Locations at 100 chars.)
    # (a cached subtree can render its scan more than once in the
    # plan string — every occurrence must carry the filter)
    bands_scans = [
        seg
        for seg in plan.split("FileScan parquet")[1:]
        if seg.lstrip().startswith("[band#")
    ]
    assert bands_scans, plan
    for seg in bands_scans:
        pf = seg.split("PartitionFilters: [")[1].split("]")[0]
        assert "bh_bucket" in pf and pf.strip(), plan
    # ...and so does the shingle VERIFY scan (id_bucket pruning from
    # the materialized candidate set)
    sh_scans = [
        seg
        for seg in plan.split("FileScan parquet")[1:]
        if seg.lstrip().startswith("[id#")
    ]
    assert sh_scans, plan
    for seg in sh_scans:
        spf = seg.split("PartitionFilters: [")[1].split("]")[0]
        assert "id_bucket" in spf and spf.strip(), plan
    # ...to a strict subset: one doc emits `bands` postings, hashing
    # into at most `bands` buckets — fewer than the corpus populated.
    # Recompute the touched set with the index's own bucket expression.
    _, one_banded = idx._prepare(one, "doc_id", "text")
    touched = {r[0] for r in one_banded.select("bh_bucket").distinct().collect()}
    assert touched and len(touched) < len(bucket_dirs), (touched, bucket_dirs)
    # and correctness is unchanged: the renamed copy still matches its
    # indexed original through the pruned scan
    assert probed.count() >= 1


def test_winnowing_parity_fuzz(spark):
    """Hypothesis-style fuzz (fixed seed, no external deps): random
    unicode-ish texts — accents, runs of whitespace, empty, shorter
    than k, exactly k — must fingerprint identically through the Arrow
    kernel and the expression plan."""
    import random

    from data_engineer_challenge_spark.plans.text import (
        _FP_K,
        _winnow_fingerprints,
        _winnow_fingerprints_expr,
    )

    rng = random.Random(42)
    alphabet = "abcdé ïöß\t\n  xyz09"
    rows = []
    for i in range(40):
        n = rng.choice([0, 3, _FP_K - 1, _FP_K, _FP_K + 1, 50, 200])
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints(docs, tier="md5").collect()
    }
    b = {
        (r["doc_id"], r["fp"])
        for r in _winnow_fingerprints_expr(docs).collect()
    }
    assert a == b

    # same fuzz corpus through the production poly tier vs the
    # arbitrary-precision reference polynomial
    from data_engineer_challenge_spark.plans.text import (
        _FP_W,
        _POLY_P,
        _POLY_POW,
        _winnow_norm,
    )

    got = {}
    for r in _winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {}
    for r in _winnow_norm(docs).collect():
        t = r["t"]
        hs = [
            sum(ord(t[i + j]) * c for j, c in enumerate(_POLY_POW)) % _POLY_P
            for i in range(len(t) - _FP_K + 1)
        ]
        want[r["doc_id"]] = {
            min(hs[max(0, i - (_FP_W - 1)) : i + 1]) for i in range(len(hs))
        }
    assert got == want


def test_quantized_knn_recall_at_bench_scale(spark):
    """The 3k shortlist factor was tuned at sf0.001/0.01; at sf0.1 —
    10x the driver's correctness scale, 10x the candidate density per
    query — the int8 two-stage retrieval must still recover the exact
    top-10 (measured: min and mean recall both 1.0, so the pins below
    have real margin)."""
    from data_engineer_challenge_spark import plans

    plans._load()
    sf = "/root/testdata/sf0.1"
    exact = {}
    for r in plans.REGISTRY["emb_knn_bruteforce"].builder(spark, sf).collect():
        exact.setdefault(r["q_id"], set()).add(r["c_id"])
    quant = {}
    for r in plans.REGISTRY["emb_quantized_knn"].builder(spark, sf).collect():
        quant.setdefault(r["q_id"], set()).add(r["c_id"])
    assert set(quant) == set(exact)
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert min(recalls) >= 0.9, recalls
    assert sum(recalls) / len(recalls) >= 0.95, recalls


def test_ivf_index_probe_prunes_partitions_and_appends(spark, tmp_path):
    """The persisted IVF index: (1) a probe's postings scan reads ONLY
    the touched cid= partitions (non-empty PartitionFilters + a strict
    subset of list directories in inputFiles), (2) append adds vectors
    to their lists without touching others, and the next probe finds
    them, (3) reopening with a different quantizer is refused."""
    import re as _re

    from data_engineer_challenge_spark.operators.ann_index import IVFVectorIndex
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFVectorIndex(spark, str(tmp_path / "ivf"), CENTROIDS)
    idx.build(emb)

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = idx.probe(queries, k=5, n_probe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the postings scan is the one reading the partition column `cid`
    # (tmp paths get elided in plan text, so match on the column list)
    scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "cid#" in l.split("Batched")[0]
    ]
    assert scans and all("PartitionFilters: [cid#" in l for l in scans), plan
    # the static IN-list prunes to a STRICT subset of the inverted
    # lists (inputFiles() reports the pre-pruning listing, so the
    # plan's own partition filter is the honest evidence)
    in_list = _re.search(r"PartitionFilters: \[cid#\d+ IN \(([\d,]+)\)", plan)
    assert in_list, plan
    touched = {int(x) for x in in_list.group(1).split(",")}
    assert 0 < len(touched) < len(CENTROIDS)  # strict subset of lists
    rows = got.collect()
    assert rows and all(r["rank"] <= 5 for r in rows)

    # append a planted vector identical to a query's: it must surface
    # as that query's rank-1 neighbor on the next probe
    q0 = queries.limit(1).collect()[0]
    idx.append(
        spark.createDataFrame(
            [(999_999, q0["embedding"])], "vec_id long, embedding array<float>"
        )
    )
    after = {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in idx.probe(queries, k=5, n_probe=2).collect()
    }
    # cos=1.0 ties with the query's own corpus copy; ties break on
    # ascending c_id, so the planted twin is exactly rank 2
    assert after[(q0["q_id"], 2)] == 999_999

    # parameter guard: different centroid set refused on reopen
    import pytest

    other = [[v + 1.0 for v in c] for c in CENTROIDS]
    with pytest.raises(ValueError, match="inverted lists"):
        IVFVectorIndex(spark, str(tmp_path / "ivf"), other)


def test_ivf_index_replayed_append_folds_and_compacts(spark, tmp_path):
    """A crashed-and-retried append leaves bit-identical duplicate
    rows in the inverted lists; probe answers must not change (the
    per-candidate max fold — without it a duplicate would hold two of
    the k slots), and maybe_compact physically removes the duplicates
    and bounds each list to one file, answers still identical."""
    import os

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.compaction import (
        _data_files,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFVectorIndex(spark, str(tmp_path / "ivf"), CENTROIDS)
    idx.build(emb.where("vec_id % 2 = 0"))
    idx.append(emb.where("vec_id % 2 = 1"))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = [tuple(r) for r in idx.probe(queries, k=5, n_probe=2)
            .orderBy("q_id", "rank").collect()]

    # replay the append twice (crash-retry, then a state-loss retry)
    idx.append(emb.where("vec_id % 2 = 1"))
    idx.append(emb.where("vec_id % 2 = 1"))
    got = [tuple(r) for r in idx.probe(queries, k=5, n_probe=2)
           .orderBy("q_id", "rank").collect()]
    assert got == want

    n_total = emb.count()
    posts = str(tmp_path / "ivf" / "postings")
    assert spark.read.parquet(posts).count() > n_total  # bloat exists
    assert idx.maybe_compact(max_files_per_list=0) >= 1
    assert spark.read.parquet(posts).count() == n_total  # dedup'd
    for d in os.listdir(posts):
        if d.startswith("cid="):
            assert len(_data_files(os.path.join(posts, d))) == 1
    got2 = [tuple(r) for r in idx.probe(queries, k=5, n_probe=2)
            .orderBy("q_id", "rank").collect()]
    assert got2 == want


def test_index_probe_multiplicity_stable_under_replayed_postings(spark, tmp_path):
    """The heal/replay path re-appends a batch's postings+shingles;
    probe answers must keep the same ROW MULTIPLICITY (one row per
    (new_id, dup_of) pair), not one per stored copy."""
    from pyspark.sql import types as T

    from data_engineer_challenge_spark.operators.dedup_index import MinHashIndex

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    base = spark.createDataFrame([(1, BASE)], schema)
    idx = MinHashIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    idx.build(base)
    idx.append(base)  # replayed append: duplicate postings + shingles
    probe = spark.createDataFrame([(2, NEAR)], schema)
    rows = idx.probe(probe).collect()
    assert [(r["new_id"], r["dup_of"]) for r in rows] == [(2, 1)]


def test_index_semantic_dedup_matches_standalone(spark, tmp_path):
    """The index-resident SemDeDup must reach decision-identical
    output to the standalone operator on the same corpus + quantizer:
    the stored cid partition value replaces the three per-run argmax
    projections, and everything downstream (dominance rule, audit
    frame) is the same math."""
    from data_engineer_challenge_spark.operators.ann_index import IVFVectorIndex
    from data_engineer_challenge_spark.operators.similarity import semantic_dedup
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFVectorIndex(spark, str(tmp_path / "ivf_sd"), CENTROIDS)
    idx.build(emb)
    want = {
        tuple(r)
        for r in semantic_dedup(emb, CENTROIDS, threshold=0.35).collect()
    }
    got = {tuple(r) for r in idx.semantic_dedup(threshold=0.35).collect()}
    assert got == want and len(got) == emb.count()
    # and appended vectors join the dedup universe incrementally
    dup = emb.orderBy("vec_id").limit(1).collect()[0]
    idx.append(
        spark.createDataFrame(
            [(999_999, dup["embedding"])], "vec_id long, embedding array<float>"
        )
    )
    after = {
        r["vec_id"]: (r["dup_of"], r["is_kept"])
        for r in idx.semantic_dedup(threshold=0.35).collect()
    }
    assert after[999_999] == (dup["vec_id"], False)  # exact twin dominated


def test_prefix_filter_equals_exhaustive_and_boundary_exactness(spark):
    """prefix_jaccard_pairs must equal the exhaustive all-pairs join
    EXACTLY (recall 1.0 is the operator's contract) — including at the
    float-hostile boundary: a pair at Jaccard exactly 4/5 = 0.8, where
    a float ceil(0.8·5) = ceil(4.0000000000000004) = 5 would shorten
    the prefix to one shingle and could drop the pair."""
    from data_engineer_challenge_spark.operators.setjoin import (
        prefix_jaccard_pairs,
    )
    from data_engineer_challenge_spark.operators.text_dedup import (
        jaccard,
        release_cached,
        word_shingles,
    )

    # an exactly-0.8 pair: A has bigrams {b1..b5}, B has {b1..b4}
    # (a strict subset — nothing new): J = 4/5.
    rows = [
        (1, "t1 t2 t3 t4 t5 t6"),    # {t1t2, t2t3, t3t4, t4t5, t5t6}
        (2, "t1 t2 t3 t4 t5"),       # {t1t2, t2t3, t3t4, t4t5}
        (3, "x1 x2 x3 x4 x5 x6"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_jaccard_pairs(docs, "doc_id", "text", 0.8).collect()
    }
    release_cached()
    assert got == {(1, 2, 0.8)}

    # seeded random corpus: equality with the exhaustive join
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30))))
        for i in range(120)
    ]
    # plant near-dups: copy with a small tail edit
    rows += [(1000 + i, rows[i][1] + " w0 w1") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_pairs(docs, "doc_id", "text", 0.8).collect()
    }
    release_cached()
    sh = docs.select("doc_id", word_shingles("text", 2).alias("s")).filter(
        F.size("s") > 0
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    want = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    # (a short base doc dilutes below 0.8 when the tail is appended,
    # so not all 10 plants survive the threshold — most must)
    assert got == want and len(want) >= 5


def test_exact_substring_dedup_catches_unaligned_copy(spark, tmp_path):
    """The upgrade over docs_segment_dedup, demonstrated: a 40-token
    passage copied into another document at offset 7 (crossing every
    32-token segment boundary) is invisible to aligned segments but
    must be cut by the stride-1 window tier — and the FIRST occurrence
    must survive untouched."""
    import os

    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans

    plans._load()
    passage = " ".join(f"copied{i}" for i in range(40))
    original = "intro words here " + passage + " trailing original tail"
    # 7 unique lead tokens -> the copy sits at offset 7, never
    # segment-aligned; unique tail so the docs are otherwise unrelated
    copy = (
        "seven distinct lead tokens precede this theft "
        + passage
        + " utterly different ending entirely"
    )
    clean = " ".join(f"unrelated{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, original, "en", "t", len(original)),
         (1, copy, "en", "t", len(copy)),
         (2, clean, "en", "t", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.write.parquet(f"{sf}/documents.parquet")

    seg = {
        r["doc_id"]: r
        for r in plans.REGISTRY["docs_segment_dedup"]
        .builder(spark, sf)
        .collect()
    }
    xs = {
        r["doc_id"]: r
        for r in plans.REGISTRY["docs_exact_substring_dedup"]
        .builder(spark, sf)
        .collect()
    }
    # aligned segments: no 32-token block of the copy equals any block
    # of the original (offset 7), so segment dedup keeps everything
    assert seg[1]["n_kept"] == seg[1]["n_segs"]
    # stride-1 windows: the copied passage is cut from doc 1...
    assert xs[1]["n_tokens_cut"] >= 32
    assert "copied0" not in xs[1]["dedup_text"].split()
    # ...its unique lead survives, and the original is untouched
    assert "seven" in xs[1]["dedup_text"].split()
    assert xs[0]["n_tokens_cut"] == 0
    assert xs[2]["n_tokens_cut"] == 0


def test_window_hash_index_incremental_probe(spark, tmp_path):
    """The incremental twin of the batch passage dedup: a passage
    already INDEXED is cut from a later batch at any alignment; fresh
    text passes through; replaying append converges; reopening with a
    different window length is refused."""
    import pytest as _pytest

    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    passage = " ".join(f"indexed{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(0, "corpus prefix " + passage + " corpus suffix")],
        "doc_id long, text string",
    )
    idx = WindowHashIndex(spark, str(tmp_path / "xsidx"))

    # fresh index: pass-through with zero cuts
    first = idx.probe(corpus).collect()[0]
    assert first["n_tokens_cut"] == 0
    idx.append(corpus)

    batch = spark.createDataFrame(
        [(1, "five odd offset lead words here " + passage + " new tail"),
         (2, " ".join(f"fresh{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in idx.probe(batch).collect()}
    assert out[1]["n_tokens_cut"] >= 32
    assert "indexed0" not in out[1]["dedup_text"].split()
    assert "five" in out[1]["dedup_text"].split()
    assert out[2]["n_tokens_cut"] == 0

    # probe result must be pinned BEFORE append mutates the store
    res = idx.probe(batch)
    idx.append(batch)
    again = {r["doc_id"]: r for r in res.collect()}
    assert again[2]["n_tokens_cut"] == 0  # no self-match through laziness

    # replayed append: membership semantics, answers unchanged
    idx.append(batch)
    replay = {r["doc_id"]: r for r in idx.probe(
        spark.createDataFrame(
            [(3, "zz " + passage + " yy")], "doc_id long, text string"
        )
    ).collect()}
    assert replay[3]["n_tokens_cut"] >= 32

    with _pytest.raises(ValueError, match="window length"):
        WindowHashIndex(spark, str(tmp_path / "xsidx"), window=16)


def test_window_hash_index_maybe_rebucket(spark, tmp_path):
    """The fourth persisted store joins the r9 rebucket discipline:
    h_buckets scales with the corpus. Pins: probe answers identical
    across the rewrite (a previously-indexed passage still cuts at
    any alignment, fresh text still passes), bucket layout at the new
    count, open() restores, stale ctor args refuse, docs/ roster
    untouched."""
    import os as _os

    import pytest as _pytest

    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    path = str(tmp_path / "whidx")
    idx = WindowHashIndex(spark, path, h_buckets=2)
    passage = " ".join(f"indexed{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(i, f"lead{i} words here " + passage + f" tail{i}")
         for i in range(5)],
        "doc_id long, text string",
    )
    idx.append(corpus)
    roster_before = sorted(
        r["doc_id"] for r in idx.indexed_ids().collect()
    )
    batch = spark.createDataFrame(
        [(100, "five odd offset lead words go " + passage + " new tail"),
         (101, " ".join(f"fresh{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    before = {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_cut"], r["dedup_text"])
        for r in idx.probe(batch).collect()
    }
    assert before[100][1] >= 32 and before[101][1] == 0

    assert idx.maybe_rebucket(target_bucket_rows=10**6) is False
    assert idx.maybe_rebucket(
        target_bucket_rows=10, growth_factor=1.0
    ) is True
    k_new = idx.meta["h_buckets"]
    assert k_new > 2
    buckets = {
        n for n in _os.listdir(_os.path.join(path, "windows"))
        if n.startswith("h_bucket=")
    }
    assert len(buckets) > 2
    assert all(int(b.split("=")[1]) < k_new for b in buckets)

    after = {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_cut"], r["dedup_text"])
        for r in idx.probe(batch).collect()
    }
    assert after == before
    assert sorted(
        r["doc_id"] for r in idx.indexed_ids().collect()
    ) == roster_before

    with _pytest.raises(ValueError, match="rebucketed store reopens"):
        WindowHashIndex(spark, path, h_buckets=2)
    re_idx = WindowHashIndex.open(spark, path)
    assert re_idx.meta["h_buckets"] == k_new
    assert {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_cut"], r["dedup_text"])
        for r in re_idx.probe(batch).collect()
    } == before


def test_window_hash_index_probe_prunes_buckets(spark, tmp_path):
    """The stored-windows FileScan must carry a non-empty
    PartitionFilters on h_bucket (partition pruning, not a full scan),
    listing at most the batch's touched buckets."""
    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    idx = WindowHashIndex(spark, str(tmp_path / "xsidx2"), h_buckets=16)
    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    idx.append(corpus)
    batch = spark.createDataFrame(
        [(100, " ".join(f"w3t{j}" for j in range(40)))],
        "doc_id long, text string",
    )
    probed = idx.probe(batch)
    assert probed.count() == 1
    # the probe's eager localCheckpoint truncates its plan, so replay
    # the probe's EXACT internal read recipe (same touched-bucket
    # computation, same filter) and pin the pruning on that
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.passage import (
        tokenized,
        window_hashes,
    )

    wins_b = window_hashes(tokenized(batch, "doc_id", "text"), 32)
    touched = sorted(
        r[0]
        for r in wins_b.select(idx._bucket_expr().alias("b"))
        .distinct()
        .collect()
    )
    assert 0 < len(touched) < 16  # a strict subset exists to prune to
    stored = (
        idx.spark.read.schema("h string, doc_id long, pos int, h_bucket int")
        .parquet(str(tmp_path / "xsidx2" / "windows"))
        .filter(F.col("h_bucket").isin(touched))
    )
    plan = stored._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans
    pf = scans[0].split("PartitionFilters: [")[1].split("]")[0]
    assert "h_bucket" in pf and pf.strip(), scans[0]
    # the IN-list is exactly the touched buckets — a strict subset of
    # the 16 partition dirs, so the scan lists only those directories
    import re as _re

    in_list = _re.search(r"h_bucket#\d+ IN \(([^)]*)\)", pf)
    assert in_list, pf
    assert len(in_list.group(1).split(",")) == len(touched) < 16


def test_exact_substring_dedup_matches_python_reference(spark):
    """Property check: the distributed passage kernel (stride-1
    windows → keep-first → interval union → map-side cut) must equal
    an exhaustive O(n²) Python reference on adversarial corpora — a
    two-token alphabet forces dense window collisions, overlapping
    self-repeats, and cross-document repeats at every alignment."""
    import hashlib
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from data_engineer_challenge_spark.operators.passage import (
        cut_islands,
        spans_to_islands,
        tokenized,
        window_hashes,
    )

    WLEN = 32

    def reference(docs: dict[int, list[str]]) -> dict[int, tuple[int, str]]:
        # first occurrence per window CONTENT, global (doc_id, pos) order
        first: dict[tuple, tuple] = {}
        for did in sorted(docs):
            ts = docs[did]
            for pos in range(len(ts) - WLEN + 1):
                key = tuple(ts[pos : pos + WLEN])
                first.setdefault(key, (did, pos))
        out = {}
        for did in sorted(docs):
            ts = docs[did]
            cut = [False] * len(ts)
            for pos in range(len(ts) - WLEN + 1):
                if first[tuple(ts[pos : pos + WLEN])] != (did, pos):
                    for i in range(pos, pos + WLEN):
                        cut[i] = True
            kept = [t for t, c in zip(ts, cut) if not c]
            out[did] = (sum(cut), " ".join(kept))
        return out

    rng = random.Random(0xC0FFEE)
    for trial in range(6):
        docs = {}
        n_docs = rng.randint(2, 5)
        base = [rng.choice("ab") for _ in range(rng.randint(40, 90))]
        for did in range(n_docs):
            if rng.random() < 0.5:
                # splice a shifted copy of another doc's span in
                ts = [rng.choice("ab") for _ in range(rng.randint(35, 80))]
                src = base[rng.randint(0, 5) :]
                at = rng.randint(0, len(ts))
                ts = ts[:at] + src + ts[at:]
            else:
                ts = [rng.choice("ab") for _ in range(rng.randint(35, 90))]
            docs[did] = ts

        df = spark.createDataFrame(
            [(did, " ".join(ts)) for did, ts in docs.items()],
            "doc_id long, text string",
        )
        base_df = tokenized(df, "doc_id", "text")
        wins = window_hashes(base_df, WLEN)
        rn = F.row_number().over(
            W.partitionBy("h").orderBy("doc_id", "pos")
        )
        dup = (
            wins.withColumn("rn", rn)
            .where(F.col("rn") > 1)
            .select(
                "doc_id",
                F.col("pos").alias("s"),
                (F.col("pos") + WLEN).alias("e"),
            )
        )
        got = {
            r["doc_id"]: (r["n_tokens_cut"], r["dedup_text"])
            for r in cut_islands(base_df, spans_to_islands(dup)).collect()
        }
        assert got == reference(docs), f"trial {trial}: {got}"


def test_window_hash_index_probe_shuffled_fallback(spark, tmp_path):
    """Past broadcast_max_windows the probe swaps the batch-side
    broadcast for a shuffled hash join (a ~1 GiB WARC segment's window
    set is at or past Spark's broadcast limits). Same answers — the
    knob changes how the probe executes, never what it returns — and
    reopening with a different value passes the meta check (it is a
    runtime knob, not a layout parameter)."""
    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    passage = " ".join(f"stored{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(0, "aa " + passage + " bb")], "doc_id long, text string"
    )
    idx = WindowHashIndex(spark, str(tmp_path / "xsf"))
    idx.append(corpus)
    batch = spark.createDataFrame(
        [(1, "odd offset lead " + passage + " tail"),
         (2, " ".join(f"novel{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    want = {
        r["doc_id"]: (r["n_tokens_cut"], r["dedup_text"])
        for r in idx.probe(batch).collect()
    }
    assert want[1][0] >= 32 and want[2][0] == 0
    # reopen with the threshold forced to 0: every probe takes the
    # shuffled branch; answers must be identical
    small = WindowHashIndex(
        spark, str(tmp_path / "xsf"), broadcast_max_windows=0
    )
    got = {
        r["doc_id"]: (r["n_tokens_cut"], r["dedup_text"])
        for r in small.probe(batch).collect()
    }
    assert got == want


def test_window_hash_index_compaction_bounds_files(spark, tmp_path):
    """Many small appends accumulate one file-set per tick per bucket;
    maybe_compact rewrites fat buckets to ONE sorted file each —
    probe answers identical before/after, and the store's data-file
    count drops to O(buckets)."""
    import os

    from data_engineer_challenge_spark.operators.compaction import (
        _data_files,
    )
    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    idx = WindowHashIndex(spark, str(tmp_path / "xsc"), h_buckets=4)
    # 10 ticks of one doc each — every bucket collects ~10 file-sets
    for t in range(10):
        idx.append(spark.createDataFrame(
            [(t, " ".join(f"tick{t}w{j}" for j in range(40)))],
            "doc_id long, text string",
        ))
    batch = spark.createDataFrame(
        [(100, "lead " + " ".join(f"tick3w{j}" for j in range(40)) + " tail"),
         (101, " ".join(f"unseen{j}" for j in range(40)))],
        "doc_id long, text string",
    )
    want = {
        r["doc_id"]: (r["n_tokens_cut"], r["dedup_text"])
        for r in idx.probe(batch).collect()
    }
    assert want[100][0] >= 32 and want[101][0] == 0
    windows = tmp_path / "xsc" / "windows"
    pre = {
        d: len(_data_files(str(windows / d)))
        for d in os.listdir(windows) if d.startswith("h_bucket=")
    }
    assert max(pre.values()) > 8  # appends really did accumulate
    n = idx.maybe_compact(max_files_per_bucket=8)
    assert n >= 1
    post = {
        d: len(_data_files(str(windows / d)))
        for d in os.listdir(windows) if d.startswith("h_bucket=")
    }
    # every compacted bucket is now exactly one data file
    for d, v in post.items():
        if pre[d] > 8:
            assert v == 1, (d, v)
    got = {
        r["doc_id"]: (r["n_tokens_cut"], r["dedup_text"])
        for r in idx.probe(batch).collect()
    }
    assert got == want
    # idempotent: already-compacted buckets are left alone
    assert idx.maybe_compact(max_files_per_bucket=8) == 0


def test_compaction_heal_crash_states(spark, tmp_path):
    """Every crash point of the parked-previous swap repairs on the
    next index open: stray temp → dropped; parked with live missing →
    restored; parked with live present → dropped. Probe answers are
    the pre-crash answers in all three states."""
    import os
    import shutil

    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    path = str(tmp_path / "xsh")
    idx = WindowHashIndex(spark, path, h_buckets=4)
    for t in range(3):
        idx.append(spark.createDataFrame(
            [(t, " ".join(f"h{t}w{j}" for j in range(40)))],
            "doc_id long, text string",
        ))
    batch = spark.createDataFrame(
        [(9, "x " + " ".join(f"h1w{j}" for j in range(40)) + " y")],
        "doc_id long, text string",
    )
    want = idx.probe(batch).collect()[0]["n_tokens_cut"]
    assert want >= 32
    windows = os.path.join(path, "windows")
    buckets = [d for d in os.listdir(windows) if d.startswith("h_bucket=")]
    victim = buckets[0]
    # crash state 1: temp written, live intact
    shutil.copytree(
        os.path.join(windows, victim),
        os.path.join(windows, ".compact-" + victim),
    )
    idx2 = WindowHashIndex(spark, path, h_buckets=4)
    assert not os.path.isdir(os.path.join(windows, ".compact-" + victim))
    assert idx2.probe(batch).collect()[0]["n_tokens_cut"] == want
    # crash state 2: live parked, replacement not yet renamed in
    os.rename(
        os.path.join(windows, victim),
        os.path.join(windows, ".old-" + victim),
    )
    idx3 = WindowHashIndex(spark, path, h_buckets=4)
    assert os.path.isdir(os.path.join(windows, victim))  # restored
    assert idx3.probe(batch).collect()[0]["n_tokens_cut"] == want
    # crash state 3: swap done, parked copy not yet removed
    shutil.copytree(
        os.path.join(windows, victim),
        os.path.join(windows, ".old-" + victim),
    )
    idx4 = WindowHashIndex(spark, path, h_buckets=4)
    assert not os.path.isdir(os.path.join(windows, ".old-" + victim))
    assert idx4.probe(batch).collect()[0]["n_tokens_cut"] == want


def test_minhash_index_compaction_preserves_probes(spark, tmp_path):
    """MinHashIndex compaction: band postings fold to distinct rows,
    shingles to one row per id; probe answers identical, fat buckets
    drop to one file."""
    import os

    from data_engineer_challenge_spark.operators.compaction import (
        _data_files,
    )
    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )

    idx = MinHashIndex(spark, str(tmp_path / "mhc"), bh_buckets=4)
    text = "the quick brown fox jumps over the lazy dog again and again"
    for t in range(10):
        idx.append(spark.createDataFrame(
            [(t, text + f" tick{t}")], "doc_id long, text string"
        ))
    batch = spark.createDataFrame(
        [(100, text + " tick3")], "doc_id long, text string"
    )
    want = {
        (r["new_id"], r["dup_of"]): round(r["jaccard"], 9)
        for r in idx.probe(batch).collect()
    }
    idx.release()
    assert want  # the near-copy matched something stored
    bands = tmp_path / "mhc" / "bands"
    pre = {
        d: len(_data_files(str(bands / d)))
        for d in os.listdir(bands) if d.startswith("bh_bucket=")
    }
    assert max(pre.values()) > 8
    assert idx.maybe_compact(max_files_per_bucket=8) >= 1
    post = {
        d: len(_data_files(str(bands / d)))
        for d in os.listdir(bands) if d.startswith("bh_bucket=")
    }
    for d, v in post.items():
        if pre[d] > 8:
            assert v == 1, (d, v)
    got = {
        (r["new_id"], r["dup_of"]): round(r["jaccard"], 9)
        for r in idx.probe(batch).collect()
    }
    idx.release()
    assert got == want


def test_inverted_index_probe_prunes_buckets_and_pushes_terms(
    spark, tmp_path
):
    """The BM25 probe's postings FileScan must carry BOTH a non-empty
    PartitionFilters on t_bucket (reads only the query terms' bucket
    dirs — a strict subset) AND the term IN-list pushed to the parquet
    reader (row-group skipping via min/max once compaction sorts by
    term)."""
    import re as _re

    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )

    idx = InvertedTextIndex(spark, str(tmp_path / "inv"), t_buckets=16)
    corpus = spark.createDataFrame(
        [(i, f"filler{i} words spark window vector doc body {i}")
         for i in range(30)],
        "doc_id long, text string",
    )
    idx.build(corpus)
    probed = idx.probe(("spark", "window", "vector"), topk=5)
    assert probed.count() == 5
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the rank window rides a TakeOrderedAndProject (per-partition
    # top-k, never a full sort) — the docs_bm25_search discipline
    assert "TakeOrderedAndProject" in plan
    # match on the partition column, not the path: toString truncates
    # long Location strings before the "postings" dir name
    scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "t_bucket" in l
    ]
    assert scans, plan
    for s in scans:
        pf = s.split("PartitionFilters: [")[1].split("]")[0]
        in_list = _re.search(r"t_bucket#\d+ IN \(([^)]*)\)", pf)
        assert in_list, pf
        assert 0 < len(in_list.group(1).split(",")) < 16  # strict subset
        pushed = s.split("PushedFilters: [")[1].split("]")[0]
        assert "In(term" in pushed, pushed


def test_ivf_build_scaled_auto_switch(spark, tmp_path, monkeypatch):
    """The scale-aware IVF default (VERDICT r7 #2, the SemDeDup
    ARROW_ASSIGN_MIN_K posture): below IVF_AUTO_MIN_N the frozen
    quantizer + registered n_probe run UNCHANGED (oracle shape —
    probe answers bit-identical to the direct frozen build); past it
    the quantizer retrains k ∝ N at one list per IVF_TARGET_LIST_SIZE
    vectors and n_probe covers IVF_PROBE_LIST_FRACTION of the lists —
    the config whose per-query probe work stays flat as the corpus
    grows."""
    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    # small corpus (500 < 50,000): frozen shape, registered n_probe
    idx, n_probe = IVFVectorIndex.build_scaled(
        spark, str(tmp_path / "auto_small"), emb,
        small_centroids=CENTROIDS, small_n_probe=12,
    )
    assert idx.meta["k"] == len(CENTROIDS) and n_probe == 12
    direct = IVFVectorIndex(spark, str(tmp_path / "frozen"), CENTROIDS)
    direct.build(emb)
    want = [tuple(r) for r in direct.probe(queries, k=5, n_probe=12)
            .orderBy("q_id", "rank").collect()]
    got = [tuple(r) for r in idx.probe(queries, k=5, n_probe=12)
           .orderBy("q_id", "rank").collect()]
    assert got == want

    # past the (monkeypatched) threshold: k = ceil(N / list_size),
    # n_probe = ceil(fraction * k)
    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 100)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 20)
    idx2, n_probe2 = IVFVectorIndex.build_scaled(
        spark, str(tmp_path / "auto_big"), emb,
        small_centroids=CENTROIDS, small_n_probe=12,
        sample_mod=None,
    )
    assert idx2.meta["k"] == 25  # ceil(500 / 20)
    assert n_probe2 == 3  # ceil(0.1 * 25)
    # the retrained index still answers: every self-query's rank-1
    # neighbor is itself (its own list is always its nearest)
    self_hits = {
        r["q_id"]: r["c_id"]
        for r in idx2.probe(queries, k=1, n_probe=n_probe2).collect()
    }
    assert all(q == c for q, c in self_hits.items())


def test_ivf_maybe_rebucket_growth(spark, tmp_path, monkeypatch):
    """VERDICT r8 #2: a store built small that grows past the
    threshold retrains k ∝ N and re-buckets. Pins: (a) the trigger
    fires only past min_n AND fat lists, (b) k_new = ⌈N/target⌉ with
    the mean list back at target size, (c) FULL-width probes (exact
    within the live set) are bit-identical before/after — no row lost
    or duplicated by the rewrite, (d) the rebucketed store probes
    identically to a FRESH index built with the same retrained
    quantizer (layout equivalence), (e) reopening with the stale
    build-time centroids raises, while ``open()`` restores the store
    with its persisted quantizer and probe-width hint."""
    import json as _json
    import os as _os

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    small = [list(c) for c in CENTROIDS[:2]]  # k=2: lists fatten fast
    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, small)
    idx.build(emb.where("vec_id < 80"))

    # under min_n: no trigger even though lists are fat (80/2 > 50)
    assert idx.maybe_rebucket() is False
    idx.append(emb.where("vec_id >= 80"))

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    # full-width probe = exact search over live rows
    before = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ]

    # past min_n (500 ≥ 200) and mean list 250 > 2×25: trigger
    assert idx.maybe_rebucket() is True
    assert idx.meta["k"] == 20  # ceil(500 / 25)
    assert idx.n_probe_hint == 2  # ceil(0.1 * 20)
    posts = spark.read.option("mergeSchema", "true").parquet(
        _os.path.join(path, "postings")
    )
    sizes = posts.groupBy("cid").count().collect()
    assert posts.count() == 500  # no row lost or duplicated
    assert sum(r["count"] for r in sizes) / len(sizes) <= 2 * 25

    after = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=20)
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert after == before  # exact-search equivalence preserved

    # (d) layout equivalence vs a fresh build with the same quantizer
    fresh = IVFVectorIndex(spark, str(tmp_path / "fresh"), idx.centroids)
    fresh.build(emb)
    for np_ in (2, 4):
        assert [
            tuple(r)
            for r in idx.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ] == [
            tuple(r)
            for r in fresh.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ]

    # (e) stale constants refuse; open() restores quantizer + hint
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rebucketed store reopens"):
        IVFVectorIndex(spark, path, small)
    re = IVFVectorIndex.open(spark, path)
    assert re.meta == idx.meta and re.n_probe_hint == 2
    assert [
        tuple(r)
        for r in re.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ] == [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ]
    # second trigger check is a no-op (lists at target size)
    assert idx.maybe_rebucket() is False
    # meta committed atomically: no staged file left behind
    assert not _os.path.exists(_os.path.join(path, "meta", "meta.json.new"))
    stored = _json.load(open(_os.path.join(path, "meta", "meta.json")))
    assert stored["centroids_md5"] == idx.meta["centroids_md5"]


def test_ivf_rebucket_crash_windows_resolve(spark, tmp_path, monkeypatch):
    """Every rebucket crash window resolves at open to an entirely-old
    or entirely-new store: (A) crash after the postings swap but
    before the meta commit → rolls FORWARD (staged meta matches the
    live layout's quantizer marker); (B) crash before any swap with a
    staged meta → rolls BACK (staged dropped, live store untouched);
    (C) crash between the two renames (postings parked, replacement
    not yet in place) → staged dropped, parked postings restored."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    small = [list(c) for c in CENTROIDS[:2]]
    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, small)
    idx.build(emb)
    old_meta = dict(idx.meta)
    assert idx.maybe_rebucket() is True
    new_meta = dict(idx.meta)
    meta_json = _os.path.join(path, "meta", "meta.json")
    staged = meta_json + ".new"
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ]

    # (A) re-create "crashed before meta commit": meta.json holds the
    # OLD fingerprint, staged holds the NEW one, live layout is new
    with open(meta_json, "w") as f:
        _json.dump(old_meta, f)
    with open(staged, "w") as f:
        _json.dump(new_meta, f)
    re = IVFVectorIndex.open(spark, path)
    assert re.meta == new_meta and not _os.path.exists(staged)
    assert [
        tuple(r)
        for r in re.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ] == want

    # (B) staged meta for a layout that never swapped in → dropped
    bogus = dict(new_meta, centroids_md5="deadbeef")
    with open(staged, "w") as f:
        _json.dump(bogus, f)
    re2 = IVFVectorIndex.open(spark, path)
    assert re2.meta == new_meta and not _os.path.exists(staged)

    # (C) mid-swap crash: postings parked, staged present → staged
    # dropped, parked restored, store answers as before
    _os.rename(
        _os.path.join(path, "postings"),
        _os.path.join(path, ".old-postings"),
    )
    with open(staged, "w") as f:
        _json.dump(bogus, f)
    re3 = IVFVectorIndex.open(spark, path)
    assert _os.path.isdir(_os.path.join(path, "postings"))
    assert not _os.path.exists(
        _os.path.join(path, ".old-postings")
    ) and not _os.path.exists(staged)
    assert [
        tuple(r)
        for r in re3.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ] == want
    _shutil.rmtree(path)


def test_ivf_supersede_ordinal_regression_raises(spark, tmp_path):
    """r8 ADVICE: a superseding append whose ordinal is strictly below
    an id's rostered maximum would be silently masked forever (mtime
    moved backwards: clock skew / cp -p restore). It now fails loudly;
    an EQUAL ordinal (crashed-tick replay, bit-identical rows) stays
    allowed."""
    import pytest as _pytest

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    idx = IVFVectorIndex(
        spark, str(tmp_path / "ivf"), [[1.0, 0.0], [0.0, 1.0]]
    )

    def drop(vec, ordinal, supersede):
        idx.append(
            spark.createDataFrame(
                [(1, vec)], "vec_id long, embedding array<double>"
            ),
            ordinal=ordinal,
            supersede=supersede,
        )

    drop([1.0, 0.1], 100, False)
    drop([0.1, 1.0], 200, True)  # genuine update
    drop([0.1, 1.0], 200, True)  # replay at the same ordinal: fine
    with _pytest.raises(ValueError, match="regresses 1 id"):
        drop([0.9, 0.2], 150, True)  # mtime went backwards


def test_ivf_mixed_schema_marker_on_plain_append(spark, tmp_path):
    """r8 ADVICE: a pre-ordinal store that receives a PLAIN (non-
    supersede) append holds mixed file schemas with no latest/ roster;
    single-footer inference could drop ``__ord``. The append now sets
    a content-keyed marker and every later read merges footers, so the
    ordinal column — and with it compaction's latest-wins fold —
    survives the mix."""
    import os as _os

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, [[1.0, 0.0], [0.0, 1.0]])
    # forge a pre-ordinal store: rows WITHOUT __ord directly in a list
    spark.createDataFrame(
        [(1, [1.0, 0.05]), (2, [0.9, 0.2])],
        "vec_id long, embedding array<double>",
    ).write.parquet(_os.path.join(path, "postings", "cid=0"))

    idx.append(
        spark.createDataFrame(
            [(3, [0.05, 1.0])], "vec_id long, embedding array<double>"
        ),
        ordinal=7,
    )
    assert _os.path.exists(_os.path.join(path, "meta", "mixed_schema"))
    posts = idx._read_postings()
    assert "__ord" in posts.columns and posts.count() == 3

    # supersede across the mix: the NEW row wins the fold + the probe
    idx.append(
        spark.createDataFrame(
            [(1, [0.02, 1.0])], "vec_id long, embedding array<double>"
        ),
        ordinal=9,
        supersede=True,
    )
    q = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "q_id long, embedding array<double>",
    )
    got = {(r["q_id"], r["c_id"]) for r in idx.probe(q, k=3, n_probe=2).collect()}
    assert (11, 1) in got  # new vector serves
    idx.maybe_compact(max_files_per_list=0)
    assert idx._read_postings().count() == 3  # stale row reclaimed
    got2 = {
        (r["q_id"], r["c_id"]) for r in idx.probe(q, k=3, n_probe=2).collect()
    }
    assert got2 == got


def test_select_n_probe_recall_target(spark):
    """VERDICT r8 #4: the recall-target sweep picks the smallest swept
    probe width whose held-out top-k recall meets the target — pinned
    at sf0.1 against the frozen k=16 quantizer: the selected width
    must actually achieve the target when measured independently, and
    a stricter target can only widen the probe."""
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk_vectorized,
        ivf_topk_vectorized,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    np_90 = IVFVectorIndex.select_n_probe(emb, CENTROIDS, 0.90)
    np_99 = IVFVectorIndex.select_n_probe(emb, CENTROIDS, 0.99)
    assert 1 <= np_90 <= np_99 <= len(CENTROIDS)

    # independent recall measurement on the SAME deterministic
    # held-out query set the sweep used
    queries = (
        emb.select(F.col("vec_id").alias("q_id"), "embedding")
        .withColumn("__h", F.xxhash64(F.lit(7), F.col("q_id")))
        .orderBy("__h")
        .limit(64)
        .drop("__h")
    )
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk_vectorized(queries, corpus, k=10).collect()
    }
    got = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk_vectorized(
            queries, corpus, centroids=CENTROIDS, n_probe=np_90, k=10
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.90


def test_pq_adc_recall_and_self_consistency(spark):
    """The PQ/ADC two-stage retriever (emb_pq_adc_knn): (a) final
    recall@10 vs exact brute force meets the registered shortlist's
    measured floor on the structureless synthetic corpus (0.80 at
    shortlist=60 — the adversarial case; clustered corpora sit
    higher); (b) encoding is self-consistent: a vector equal to a
    codeword in every subspace encodes to exactly those codes (L2
    argmin of zero distance, ties impossible)."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.pq import encode_pq
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk_vectorized(queries, corpus, k=10).collect()
    }
    got = {
        (r["q_id"], r["c_id"])
        for r in plans.REGISTRY["emb_pq_adc_knn"].builder(spark, sf).collect()
    }
    assert len(got & exact) / len(exact) >= 0.75

    # (b) codeword self-encoding: concat codeword k_s from each
    # subspace s -> codes must be exactly (k_0..k_7)
    want = [3, 0, 15, 7, 1, 12, 9, 4]
    vec = [float(x) for s, k in enumerate(want) for x in CODEBOOKS[s][k]]
    row = encode_pq(
        spark.createDataFrame(
            [(1, vec)], "vec_id long, embedding array<float>"
        ),
        CODEBOOKS,
    ).collect()[0]
    got_codes = [row[f"code{s}"] for s in range(8)]
    # float32 storage round-trips exactly (codebooks ARE float32)
    assert got_codes == want


def test_pq_vectorized_bit_equality(spark):
    """VERDICT r9 #2: the Arrow ADC tier must be BIT-IDENTICAL to the
    literal-expression forms it replaces, so the auto-switch can never
    change an answer. Pins: (a) encode_pq_vectorized == encode_pq on
    the full corpus; (b) adc_score_cross_vectorized == the
    codes × broadcast(luts) expression scan, every double equal; (c)
    the registered emb_pq_adc_knn returns identical rows with the
    kernel forced ON below the threshold and forced OFF above it."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.pq import (
        M_SUBSPACES,
        adc_luts,
        adc_score,
        adc_score_cross_vectorized,
        encode_pq,
        encode_pq_vectorized,
        np_adc_luts,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    import data_engineer_challenge_spark.plans.similarity as S

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")

    a = sorted(map(tuple, encode_pq(emb, CODEBOOKS).collect()))
    b = sorted(map(tuple, encode_pq_vectorized(emb, CODEBOOKS).collect()))
    assert a == b and len(a) > 0

    q = emb.filter(F.col("vec_id") % 100 == 0)
    codes = encode_pq(emb, CODEBOOKS)
    q_luts = q.select(
        F.col("vec_id").alias("q_id"),
        *[
            lut.alias(f"lut{s}")
            for s, lut in enumerate(
                adc_luts(F.col("embedding"), CODEBOOKS)
            )
        ],
    )
    expr = codes.crossJoin(F.broadcast(q_luts)).select(
        "q_id",
        F.col("vec_id").alias("c_id"),
        adc_score(M_SUBSPACES).alias("__adc"),
    )
    luts = {
        r["vec_id"]: np_adc_luts(list(r["embedding"]), CODEBOOKS)
        for r in q.select("vec_id", "embedding").collect()
    }
    kern = adc_score_cross_vectorized(
        codes, luts, M_SUBSPACES, id_col="vec_id"
    )
    assert sorted(map(tuple, expr.collect())) == sorted(
        map(tuple, kern.collect())
    )

    # (c) the registered row is switch-independent: force each path
    # at sf0.01 (normally below the threshold => expression)
    old = S._PQ_VECTORIZE_MIN_N
    try:
        S._PQ_VECTORIZE_MIN_N = 1  # force the kernel
        k_rows = sorted(
            map(tuple, S.emb_pq_adc_knn(spark, sf).collect())
        )
        S._PQ_VECTORIZE_MIN_N = 10**9  # force the expression
        e_rows = sorted(
            map(tuple, S.emb_pq_adc_knn(spark, sf).collect())
        )
    finally:
        S._PQ_VECTORIZE_MIN_N = old
    assert k_rows == e_rows and len(k_rows) > 0


def test_select_adc_width_recall_target(spark):
    """VERDICT r9 #3: the shortlist width becomes a measured recall
    decision (select_n_probe's PQ twin) — pinned at sf0.1 against the
    frozen codebooks: the selected width, measured INDEPENDENTLY
    through the registered two-stage semantics, actually meets its
    target, and a stricter target can only widen the shortlist."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
        M_SUBSPACES,
        adc_score_cross_vectorized,
        encode_pq_vectorized,
        np_adc_luts,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk_vectorized,
        cosine,
    )
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table
    from pyspark.sql.window import Window as _W

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    w75 = IVFVectorIndex.select_adc_width(emb, CODEBOOKS, 0.75)
    w90 = IVFVectorIndex.select_adc_width(emb, CODEBOOKS, 0.90)
    n = emb.count()
    assert 10 <= w75 <= w90 <= n

    # independent recall measurement at w75 on the SAME deterministic
    # held-out queries the sweep used
    queries = (
        emb.select(F.col("vec_id").alias("q_id"), "embedding")
        .withColumn("__h", F.xxhash64(F.lit(7), F.col("q_id")))
        .orderBy("__h")
        .limit(64)
        .drop("__h")
        .localCheckpoint()
    )
    cand = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk_vectorized(queries, cand, k=10).collect()
    }
    luts = {
        r["q_id"]: np_adc_luts(list(r["embedding"]), CODEBOOKS)
        for r in queries.collect()
    }
    scored = adc_score_cross_vectorized(
        encode_pq_vectorized(emb, CODEBOOKS), luts, M_SUBSPACES,
        id_col="vec_id",
    )
    short = (
        scored.withColumn(
            "__sr",
            F.row_number().over(
                _W.partitionBy("q_id").orderBy(
                    F.col("__adc").desc(), F.col("c_id")
                )
            ),
        )
        .where(F.col("__sr") <= w75)
        .select("q_id", "c_id")
    )
    got = {
        (r["q_id"], r["c_id"])
        for r in short.join(
            queries.select("q_id", F.col("embedding").alias("__qv")),
            "q_id",
        )
        .join(cand.select("c_id", F.col("embedding").alias("__cv")), "c_id")
        .select(
            "q_id", "c_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                _W.partitionBy("q_id").orderBy(
                    F.col("cos_sim").desc(), F.col("c_id")
                )
            ),
        )
        .where(F.col("rank") <= 10)
        .collect()
    }
    assert len(got & exact) / len(exact) >= 0.75


def test_ivf_tombstone_delete(spark, tmp_path):
    """r9: explicit removals via roster tombstones (closes the
    documented add/update-only limitation). Pins: a deleted id
    vanishes from probe AND semantic_dedup without touching postings;
    a replayed delete is a value-level no-op; a later re-add at a
    higher ordinal resurrects the id; compaction physically reclaims
    the dead rows; a regressing delete fails loudly; supersede
    machinery keeps working beside tombstones."""
    import pytest as _pytest

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    idx = IVFVectorIndex(
        spark, str(tmp_path / "ivf"), [[1.0, 0.0], [0.0, 1.0]]
    )
    rows = [(1, [1.0, 0.05]), (2, [0.9, 0.1]), (3, [0.05, 1.0])]
    idx.build(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    q = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "q_id long, embedding array<double>",
    )

    def hits():
        return {
            (r["q_id"], r["c_id"])
            for r in idx.probe(q, k=3, n_probe=2).collect()
        }

    assert (10, 2) in hits()
    ids = spark.createDataFrame([(2,)], "vec_id long")
    idx.delete(ids, ordinal=100)
    after = hits()
    assert not any(c == 2 for _, c in after)
    assert (10, 1) in after  # neighbors unaffected
    # semantic_dedup over the index also masks the deleted id
    sd = {r["vec_id"] for r in idx.semantic_dedup(threshold=-1.0).collect()}
    assert sd == {1, 3}

    # replayed delete: identical roster row, answers unchanged
    idx.delete(ids, ordinal=100)
    assert hits() == after

    # a tombstone below the rostered max is a semantic NO-OP — the
    # fold keeps the higher action either way — so it is skipped, not
    # raised (r9 ADVICE: raising wedged every retry of a tick whose
    # takedown list carried an archive-preserved old mtime)
    idx.delete(ids, ordinal=50)
    assert hits() == after
    latest = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "ivf" / "latest")
    )
    assert (  # skipped means NOT written, not written-and-out-voted
        latest.where("__rord = 50").count() == 0
    )

    # compaction physically reclaims the dead rows
    assert idx.maybe_compact(max_files_per_list=0) >= 1
    posts = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "ivf" / "postings")
    )
    assert posts.count() == 2
    assert hits() == after

    # re-add at a higher ordinal resurrects (and re-scores) the id
    idx.append(
        spark.createDataFrame(
            [(2, [0.1, 0.95])], "vec_id long, embedding array<double>"
        ),
        ordinal=200,
        supersede=True,
    )
    scores = {
        (r["q_id"], r["c_id"]): r["cos_sim"]
        for r in idx.probe(q, k=3, n_probe=2).collect()
    }
    assert scores[(11, 2)] > 0.9  # the NEW vector answers
    assert scores[(10, 2)] < 0.2  # the old (deleted) vector does not

    # a REPLAYED tombstone after a later re-add must no-op, not raise
    # (the crashed-tick livelock: delete@100 applied, crash before the
    # offset commit, supersede re-add@200 lands, the retry re-runs
    # delete@100 — the id must stay alive and the tick must not wedge)
    idx.delete(ids, ordinal=100)
    assert {
        (r["q_id"], r["c_id"]): r["cos_sim"]
        for r in idx.probe(q, k=3, n_probe=2).collect()
    }[(11, 2)] > 0.9  # still served by the ord-200 vector

    # delete interleaves with supersede history: remove it again
    idx.delete(ids, ordinal=300)
    assert not any(c == 2 for _, c in hits())


def test_ivf_equal_ordinal_tombstone_append_guard(spark, tmp_path):
    """r9 ADVICE: the roster fold breaks an ordinal TIE toward the
    tombstone, so a FRESH supersede append at exactly a deleted id's
    tombstone ordinal would be accepted and silently masked forever —
    append now raises on it. But a REPLAY of an add that was rostered
    at that ordinal before the tie-winning delete landed (the crashed
    add-then-delete tick) must no-op, not wedge."""
    import pytest as _pytest

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    def mk(name):
        idx = IVFVectorIndex(
            spark, str(tmp_path / name), [[1.0, 0.0], [0.0, 1.0]]
        )
        idx.build(
            spark.createDataFrame(
                [(1, [1.0, 0.05]), (2, [0.05, 1.0])],
                "vec_id long, embedding array<double>",
            )
        )
        return idx

    upd = spark.createDataFrame(
        [(1, [0.1, 0.95])], "vec_id long, embedding array<double>"
    )
    ids = spark.createDataFrame([(1,)], "vec_id long")
    q = spark.createDataFrame(
        [(11, [0.0, 1.0])], "q_id long, embedding array<double>"
    )

    # fresh append at the tombstone's exact ordinal: loud failure
    a = mk("a")
    a.delete(ids, ordinal=100)
    with _pytest.raises(ValueError, match="ties 1 id"):
        a.append(upd, ordinal=100, supersede=True)
    # the guard rejected it — nothing silently masked, id stays dead
    assert not any(
        r["c_id"] == 1 for r in a.probe(q, k=3, n_probe=2).collect()
    )
    # a higher ordinal (the error's own advice) resurrects normally
    a.append(upd, ordinal=101, supersede=True)
    assert any(
        r["c_id"] == 1 for r in a.probe(q, k=3, n_probe=2).collect()
    )

    # replay exemption: add@100 committed BEFORE delete@100 (the tie
    # legitimately resolved toward the delete); a crashed-tick retry
    # re-runs the add at the same ordinal — must no-op, not raise
    b = mk("b")
    b.append(upd, ordinal=100, supersede=True)
    b.delete(ids, ordinal=100)
    masked = {
        (r["q_id"], r["c_id"])
        for r in b.probe(q, k=3, n_probe=2).collect()
    }
    assert not any(c == 1 for _, c in masked)  # tie -> delete wins
    b.append(upd, ordinal=100, supersede=True)  # replay: no raise
    assert {
        (r["q_id"], r["c_id"])
        for r in b.probe(q, k=3, n_probe=2).collect()
    } == masked


def test_ivf_mixed_schema_marker_straddled_store(spark, tmp_path):
    """r9 ADVICE: a store that became mixed BEFORE the marker logic
    existed can have a post-ordinal file sorting FIRST in its list
    dir — the old single-footer sniff concluded 'uniform' and never
    wrote the marker, so single-file inference could still drop
    ``__ord``. The scan now keeps reading footers until a pre-ordinal
    file is found (then caches the verdict in a marker, either way),
    so the straddled store heals on its next append."""
    import os as _os

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )

    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, [[1.0, 0.0], [0.0, 1.0]])
    # post-ordinal rows land first (their part files sort first) ...
    idx.append(
        spark.createDataFrame(
            [(3, [0.98, 0.1])], "vec_id long, embedding array<double>"
        ),
        ordinal=7,
    )
    # ... then forge the legacy pre-ordinal file with a LATER-sorting
    # name inside the same cid= dir (the r8-era straddle)
    import pandas as pd

    legacy = pd.DataFrame(
        {"vec_id": [1], "embedding": [[1.0, 0.05]]}
    )
    legacy.to_parquet(
        _os.path.join(path, "postings", "cid=0", "zzz-legacy.parquet"),
        index=False,
    )

    idx.append(
        spark.createDataFrame(
            [(4, [0.05, 1.0])], "vec_id long, embedding array<double>"
        ),
        ordinal=9,
    )
    assert _os.path.exists(_os.path.join(path, "meta", "mixed_schema"))
    posts = idx._read_postings()
    assert "__ord" in posts.columns and posts.count() == 3

    # a genuinely uniform store caches the negative verdict instead
    u = IVFVectorIndex(
        spark, str(tmp_path / "uniform"), [[1.0, 0.0], [0.0, 1.0]]
    )
    u.build(
        spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
    )
    u.append(
        spark.createDataFrame(
            [(2, [0.0, 1.0])], "vec_id long, embedding array<double>"
        ),
        ordinal=5,
    )
    assert _os.path.exists(
        _os.path.join(str(tmp_path / "uniform"), "meta", "ordinal_uniform")
    )
    assert not _os.path.exists(
        _os.path.join(str(tmp_path / "uniform"), "meta", "mixed_schema")
    )


def test_ivf_pq_probe_adc(spark, tmp_path):
    """IVF-PQ serving through the persisted index: (a) with every
    list probed, probe_adc lands on EXACTLY the registered
    emb_pq_adc_knn rows for the same shortlist — the index changes
    where bytes are read, not what comes back; (b) the ADC stage's
    candidate scan projects ONLY the code columns (ReadSchema excludes
    the vector column — the compressed-list bandwidth claim,
    plan-pinned) and prunes to the probed cid= partitions; (c) open()
    restores the full ADC capability from persisted codebooks, while
    a plain (non-PQ) reopen refuses; (d) a superseding update re-codes
    the vector — the stale version's codes stop answering."""
    import re as _re

    import pytest as _pytest

    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    path = str(tmp_path / "ivfpq")
    idx = IVFVectorIndex(spark, path, CENTROIDS, pq_codebooks=CODEBOOKS)
    idx.build(emb)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    # (a) full-width probe == the registered corpus-scan query
    want = [
        tuple(r)
        for r in plans.REGISTRY["emb_pq_adc_knn"].builder(spark, sf)
        .orderBy("q_id", "rank")
        .collect()
    ]
    res = idx.probe_adc(
        queries, k=10, n_probe=len(CENTROIDS), shortlist=60
    )
    got = [tuple(r) for r in res.orderBy("q_id", "rank").collect()]
    assert got == want
    # the Arrow kernel (default) and the literal-expression form are
    # bit-identical through the index too (r9 #2)
    got_expr = [
        tuple(r)
        for r in idx.probe_adc(
            queries,
            k=10,
            n_probe=len(CENTROIDS),
            shortlist=60,
            vectorized=False,
        )
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert got_expr == want

    # (b) plan pin on a PARTIAL probe: codes scan has no vector column
    partial = idx.probe_adc(queries, k=10, n_probe=4, shortlist=60)
    plan = partial._jdf.queryExecution().executedPlan().toString()
    scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "cid" in l
    ]
    assert scans
    code_scans = [s for s in scans if "code0" in s]
    assert code_scans, plan
    for s in code_scans:
        schema = s.split("ReadSchema: ")[-1]
        assert "embedding" not in schema, s
        pf = s.split("PartitionFilters: [")[1].split("]")[0]
        assert _re.search(r"cid#\d+ (IN \(|INSET )", pf), pf

    # (c) open() restores ADC; plain reopen refuses the PQ store
    re_idx = IVFVectorIndex.open(spark, path)
    assert re_idx.meta.get("pq_md5") == idx.meta["pq_md5"]
    assert [
        tuple(r)
        for r in re_idx.probe_adc(
            queries, k=10, n_probe=len(CENTROIDS), shortlist=60
        ).orderBy("q_id", "rank").collect()
    ] == want
    with _pytest.raises(ValueError, match="rebucketed store reopens"):
        IVFVectorIndex(spark, path, CENTROIDS)

    # (d) supersede re-codes: move one query vector's nearest corpus
    # neighbor far away; the stale codes must stop answering rank-1
    vid = want[0][1]  # rank-1 c_id of the first query (its self-hit)
    moved = emb.where(F.col("vec_id") == vid).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    idx.append(moved, ordinal=999, supersede=True)
    after = {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in idx.probe_adc(
            queries, k=10, n_probe=len(CENTROIDS), shortlist=60
        ).collect()
    }
    q0 = want[0][0]
    assert after[(q0, 1)] != vid  # negated vector no longer the top hit

    # compaction folds the coded postings (latest ordinal per id,
    # stale cross-list row reclaimed) and answers are unchanged
    assert idx.maybe_compact(max_files_per_list=0) >= 1
    assert {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in idx.probe_adc(
            queries, k=10, n_probe=len(CENTROIDS), shortlist=60
        ).collect()
    } == after
    posts = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "ivfpq" / "postings")
    )
    assert posts.count() == emb.count()  # one physical row per id


def test_pq_kernel_id_type_contracts(spark, tmp_path):
    """ADVICE r10: the Arrow PQ kernels must not narrow the id-type
    contract relative to the expression forms they replace. Pins:
    (a) encode_pq_vectorized copies the id column's declared type
    from the input schema (string ids round-trip, codes equal to
    encode_pq's); (b) probe_adc with STRING query ids answers
    identically on the vectorized (default) and expression paths —
    the hardcoded-long probe frame used to crash this."""
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
        encode_pq,
        encode_pq_vectorized,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")

    # (a) string-typed ids pass through the encode kernel unchanged
    s_emb = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias(
            "vec_id"
        ),
        "embedding",
    )
    enc_k = encode_pq_vectorized(s_emb, CODEBOOKS)
    assert enc_k.schema["vec_id"].dataType.simpleString() == "string"
    assert sorted(map(tuple, enc_k.collect())) == sorted(
        map(tuple, encode_pq(s_emb, CODEBOOKS).collect())
    )

    # (b) string query ids through the persisted IVF-PQ serving path
    idx = IVFVectorIndex(
        spark, str(tmp_path / "ivfpq_sq"), CENTROIDS,
        pq_codebooks=CODEBOOKS,
    )
    idx.build(emb)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.concat(F.lit("q-"), F.col("vec_id").cast("string")).alias(
            "q_id"
        ),
        "embedding",
    )
    kern = idx.probe_adc(queries, k=10, n_probe=4, shortlist=60)
    assert kern.schema["q_id"].dataType.simpleString() == "string"
    got = sorted(map(tuple, kern.collect()))
    want = sorted(
        map(
            tuple,
            idx.probe_adc(
                queries, k=10, n_probe=4, shortlist=60,
                vectorized=False,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_resolve_relayout_crash_windows(tmp_path):
    """compaction.commit_relayout's resolve contract, pure-python
    (r9): a staged meta whose md5 matches EVERY data dir's marker
    rolls FORWARD; any other state rolls back — swapped dirs restore
    from their parked twins (which outlive every pre-commit crash),
    and a swapped dir whose parked twin is gone (impossible by
    construction) fails loudly instead of serving a mixed store."""
    import hashlib
    import json
    import os

    import pytest as _pytest

    from data_engineer_challenge_spark.operators.compaction import (
        resolve_relayout,
    )

    def setup(stage_meta, markers, parked=(), old_content="old"):
        root = tmp_path / f"s{setup.n}"
        setup.n += 1
        (root / "meta").mkdir(parents=True)
        (root / "meta" / "meta.json").write_text(json.dumps({"v": 0}))
        payload = json.dumps(stage_meta, sort_keys=True).encode()
        (root / "meta" / "meta.json.new").write_bytes(payload)
        want = hashlib.md5(payload).hexdigest()
        for d, mark in markers.items():
            (root / d).mkdir()
            if mark is not None:
                (root / d / ".layout_md5").write_text(
                    want if mark == "match" else "deadbeef"
                )
        for d in parked:
            (root / f".old-{d}").mkdir()
            (root / f".old-{d}" / "sentinel").write_text(old_content)
        return root, want

    setup.n = 0

    # (A) every marker matches -> forward: staged becomes meta.json
    root, _ = setup({"v": 1}, {"A": "match", "B": "match"})
    resolve_relayout(str(root), ["A", "B"])
    assert json.loads((root / "meta" / "meta.json").read_text()) == {"v": 1}
    assert not (root / "meta" / "meta.json.new").exists()

    # (B) partial swap -> rollback: swapped dir restores from parked,
    # unswapped dir untouched, staged dropped
    root, _ = setup({"v": 1}, {"A": "match", "B": None}, parked=("A",))
    resolve_relayout(str(root), ["A", "B"])
    assert json.loads((root / "meta" / "meta.json").read_text()) == {"v": 0}
    assert (root / "A" / "sentinel").read_text() == "old"  # restored
    assert not (root / ".old-A").exists()
    assert not (root / "meta" / "meta.json.new").exists()

    # (C) swapped dir with no parked twin -> loud failure, not a mix
    root, _ = setup({"v": 1}, {"A": "match", "B": "stale"})
    with _pytest.raises(RuntimeError, match="parked previous is gone"):
        resolve_relayout(str(root), ["A", "B"])

    # (D) no staged meta -> no-op
    root, _ = setup({"v": 1}, {"A": "stale"})
    os.remove(root / "meta" / "meta.json.new")
    resolve_relayout(str(root), ["A"])
    assert json.loads((root / "meta" / "meta.json").read_text()) == {"v": 0}


def test_text_index_maybe_rebucket(spark, tmp_path):
    """VERDICT r8 missing #2, the text-store half: t_buckets scales
    with the corpus. Pins: trigger semantics, probe answers
    bit-identical across the rewrite, pruning still strict under the
    new (larger) bucket count, stale ctor args refuse while open()
    restores the store, stats/docs side-tables untouched."""
    import json as _json
    import os as _os
    import re as _re

    import pytest as _pytest

    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )

    path = str(tmp_path / "tidx")
    idx = InvertedTextIndex(spark, path, t_buckets=4)
    corpus = spark.createDataFrame(
        [(i, f"filler{i} words spark window vector doc body {i}")
         for i in range(30)],
        "doc_id long, text string",
    )
    idx.build(corpus)
    terms = ("spark", "window", "vector")
    before = [
        tuple(r)
        for r in idx.probe(terms, topk=10).orderBy("rank").collect()
    ]
    stats_before = sorted(
        map(tuple, spark.read.parquet(_os.path.join(path, "stats")).collect())
    )

    # under the threshold: no-op
    assert idx.maybe_rebucket(target_bucket_rows=10**6) is False
    # ~240 posting rows > 1.0 * 2 * 4: trigger; k_new = ceil(n/2)
    assert idx.maybe_rebucket(
        target_bucket_rows=2, growth_factor=1.0
    ) is True
    k_new = idx.meta["t_buckets"]
    assert k_new > 4
    assert _json.load(
        open(_os.path.join(path, "meta", "meta.json"))
    )["t_buckets"] == k_new

    probed = idx.probe(terms, topk=10)
    after = [tuple(r) for r in probed.orderBy("rank").collect()]
    assert after == before  # bit-identical answers
    # pruning still strict: the probe reads ≤ len(terms) of the NEW
    # bucket count
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scans = [
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "t_bucket" in l
    ]
    assert scans
    for s in scans:
        pf = s.split("PartitionFilters: [")[1].split("]")[0]
        in_list = _re.search(r"t_bucket#\d+ IN \(([^)]*)\)", pf)
        assert in_list, pf
        assert 0 < len(in_list.group(1).split(",")) <= len(terms)
    # side tables untouched
    assert sorted(
        map(tuple, spark.read.parquet(_os.path.join(path, "stats")).collect())
    ) == stats_before

    with _pytest.raises(ValueError, match="rebucketed store reopens"):
        InvertedTextIndex(spark, path, t_buckets=4)
    re_idx = InvertedTextIndex.open(spark, path)
    assert re_idx.meta["t_buckets"] == k_new
    assert [
        tuple(r)
        for r in re_idx.probe(terms, topk=10).orderBy("rank").collect()
    ] == before
    assert not _os.path.exists(
        _os.path.join(path, "meta", "meta.json.new")
    )


def test_text_index_rebucket_preserves_positions(spark, tmp_path):
    """Rebucketing a POSITIONAL store must carry the pos arrays
    through the rewrite: index-resident phrase answers are
    bit-identical before/after, the positions flag survives in the
    meta, and open() restores the positional capability."""
    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )

    path = str(tmp_path / "tposidx")
    idx = InvertedTextIndex(spark, path, t_buckets=4, positions=True)
    corpus = spark.createDataFrame(
        [(i, f"lead{i} spark window vector spark window tail{i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    idx.build(corpus)
    phrase = ("spark", "window")
    before = sorted(
        map(tuple, idx.phrase_occurrences(phrase).collect())
    )
    assert before and all(t[1] == 2 for t in before)  # 2 occurrences

    assert idx.maybe_rebucket(
        target_bucket_rows=2, growth_factor=1.0
    ) is True
    assert idx.meta["positions"] is True  # flag survives the meta swap
    assert sorted(
        map(tuple, idx.phrase_occurrences(phrase).collect())
    ) == before

    re_idx = InvertedTextIndex.open(spark, path)
    assert re_idx.meta["positions"] is True
    assert sorted(
        map(tuple, re_idx.phrase_occurrences(phrase).collect())
    ) == before


def test_minhash_index_maybe_rebucket(spark, tmp_path):
    """VERDICT r8 missing #2, the MinHash half: bands AND shingles
    re-bucket under ONE commit (they share bh_buckets — a mixed store
    would silently miss candidates). Pins: probe answers identical
    across the rewrite, both partition layouts at the new count,
    open() restores, stale ctor args refuse."""
    import os as _os

    import pytest as _pytest

    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )

    path = str(tmp_path / "midx")
    idx = MinHashIndex(spark, path, bh_buckets=2)
    corpus = spark.createDataFrame(
        [(i, BASE + f" filler{i}") for i in range(1, 21)]
        + [(100, FAR)],
        "doc_id long, text string",
    )
    idx.build(corpus)
    batch = spark.createDataFrame(
        [(200, BASE + " filler1"), (201, FAR), (202, NEAR)],
        "doc_id long, text string",
    )
    before = sorted(map(tuple, idx.probe(batch).collect()))
    idx.release()
    assert before  # the planted dups actually probe

    assert idx.maybe_rebucket(target_bucket_rows=10**6) is False
    assert idx.maybe_rebucket(
        target_bucket_rows=5, growth_factor=1.0
    ) is True
    k_new = idx.meta["bh_buckets"]
    assert k_new > 2
    buckets = {
        n
        for n in _os.listdir(_os.path.join(path, "bands"))
        if n.startswith("bh_bucket=")
    }
    assert all(int(b.split("=")[1]) < k_new for b in buckets)
    assert len(buckets) > 2  # genuinely finer layout
    sh_buckets = {
        n
        for n in _os.listdir(_os.path.join(path, "shingles"))
        if n.startswith("id_bucket=")
    }
    assert all(int(b.split("=")[1]) < k_new for b in sh_buckets)

    after = sorted(map(tuple, idx.probe(batch).collect()))
    idx.release()
    assert after == before

    with _pytest.raises(ValueError, match="rebucketed store reopens"):
        MinHashIndex(spark, path, bh_buckets=2)
    re_idx = MinHashIndex.open(spark, path)
    assert re_idx.meta["bh_buckets"] == k_new
    assert sorted(map(tuple, re_idx.probe(batch).collect())) == before
    re_idx.release()


def test_minhash_rebucket_cross_process_reader(spark, tmp_path, monkeypatch):
    """VERDICT r9 #6 — the cross-process READER side of the relayout
    swap: a reader process that OPENS the store at any point of the
    all-park-then-all-swap window must see entirely-old or
    entirely-new, never a mix across MinHash's two dirs. The window
    states are captured deterministically (a snapshot before/after
    the real commit_relayout, plus the two mid-window states built by
    replaying its documented file steps — the
    test_resolve_relayout_crash_windows construction), and a genuine
    SEPARATE process (own JVM, own SparkSession) opens and probes
    each: pre-park → old layout, old answers; partial park (bands
    swapped, shingles not) → resolve rolls BACK, both dirs old, old
    answers; all-swapped pre-commit → resolve rolls FORWARD, both
    dirs new, identical answers; post-commit → new. A mixed store
    would silently MISS candidates — equality of every probe result
    is the no-mix proof."""
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import shutil as _shutil
    import subprocess as _sp
    import sys as _sys

    from data_engineer_challenge_spark.operators import compaction
    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )

    path = str(tmp_path / "midx")
    idx = MinHashIndex(spark, path, bh_buckets=2)
    corpus = spark.createDataFrame(
        [(i, BASE + f" filler{i}") for i in range(1, 21)] + [(100, FAR)],
        "doc_id long, text string",
    )
    idx.build(corpus)
    batch = spark.createDataFrame(
        [(200, BASE + " filler1"), (201, FAR), (202, NEAR)],
        "doc_id long, text string",
    )
    batch_pq = str(tmp_path / "batch.parquet")
    batch.write.parquet(batch_pq)
    before = sorted(map(tuple, idx.probe(batch).collect()))
    idx.release()
    assert before

    # capture the window's endpoints around the REAL commit_relayout
    snaps = {n: str(tmp_path / n) for n in ("pre", "partial", "staged", "post")}
    real_commit = compaction.commit_relayout
    captured = {}

    def capturing(p, dirnames, new_meta):
        _shutil.copytree(p, snaps["pre"])
        captured["meta"] = new_meta
        captured["dirs"] = list(dirnames)
        real_commit(p, dirnames, new_meta)
        _shutil.copytree(p, snaps["post"])

    monkeypatch.setattr(compaction, "commit_relayout", capturing)
    assert idx.maybe_rebucket(target_bucket_rows=5, growth_factor=1.0)
    k_new = idx.meta["bh_buckets"]
    assert k_new > 2 and captured["dirs"] == ["bands", "shingles"]

    # derive the two mid-window states from the pre snapshot by
    # replaying commit_relayout's documented steps
    payload = _json.dumps(captured["meta"], sort_keys=True).encode()
    digest = _hashlib.md5(payload).hexdigest()

    def stage(dst, park_swap):
        _shutil.copytree(snaps["pre"], dst)
        for d in captured["dirs"]:
            with open(
                _os.path.join(dst, ".compact-" + d, ".layout_md5"), "w"
            ) as f:
                f.write(digest)
        with open(
            _os.path.join(dst, "meta", "meta.json.new"), "wb"
        ) as f:
            f.write(payload)
        for d in park_swap:
            _os.rename(
                _os.path.join(dst, d), _os.path.join(dst, ".old-" + d)
            )
            _os.rename(
                _os.path.join(dst, ".compact-" + d),
                _os.path.join(dst, d),
            )

    stage(snaps["partial"], park_swap=["bands"])  # bands in, shingles not
    stage(snaps["staged"], park_swap=["bands", "shingles"])  # pre-commit

    # the cross-process reader: ONE fresh interpreter + SparkSession
    # opens every window state and probes the same batch
    reader = f"""
import json, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from data_engineer_challenge_spark.operators.dedup_index import MinHashIndex
batch = spark.read.parquet({batch_pq!r})
out = {{}}
for name, p in json.loads(sys.argv[1]).items():
    ix = MinHashIndex.open(spark, p)
    rows = sorted(map(tuple, ix.probe(batch).collect()))
    ix.release()
    out[name] = {{"rows": rows, "bh_buckets": ix.meta["bh_buckets"]}}
print("RESULT " + json.dumps(out))
"""
    proc = _sp.run(
        [_sys.executable, "-c", reader, _json.dumps(snaps)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    got = _json.loads(line[0][len("RESULT "):])

    for name in snaps:
        assert [tuple(r) for r in got[name]["rows"]] == before, name
    # layout verdicts: rolled-back states serve the OLD bucket count,
    # rolled-forward / committed states the new one
    assert got["pre"]["bh_buckets"] == 2
    assert got["partial"]["bh_buckets"] == 2  # rollback, no mix
    assert got["staged"]["bh_buckets"] == k_new  # roll-forward
    assert got["post"]["bh_buckets"] == k_new
    # the partial state's reader healed BOTH dirs back to old layout —
    # no cross-dir mix survives its open
    for d, pcol in (("bands", "bh_bucket="), ("shingles", "id_bucket=")):
        parts = [
            n
            for n in _os.listdir(_os.path.join(snaps["partial"], d))
            if n.startswith(pcol)
        ]
        assert all(int(p.split("=")[1]) < 2 for p in parts), (d, parts)


def test_semantic_dedup_scaled_auto_switch(spark, monkeypatch):
    """The registered ``emb_semantic_dedup`` is scale-aware (VERDICT
    r8 #1, mirroring test_ivf_build_scaled_auto_switch): below
    IVF_AUTO_MIN_N the frozen k=16 quantizer runs UNCHANGED — the
    audit frame is bit-identical to calling the operator directly with
    the frozen centroids (oracle replay untouched); past the
    (monkeypatched) threshold the cell count retrains k ∝ N and the
    result equals the operator called directly with the retrained
    centroids (decision-identical, just auto-selected)."""
    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.similarity import (
        semantic_dedup,
    )
    from data_engineer_challenge_spark.plans import similarity as plans_sim
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")

    # below the threshold: frozen shape, bit-identical to the direct call
    plans_sim._SCALED_QUANTIZERS.clear()
    got = [
        tuple(r)
        for r in plans_sim.emb_semantic_dedup(spark, sf)
        .orderBy("vec_id")
        .collect()
    ]
    want = [
        tuple(r)
        for r in semantic_dedup(
            emb, centroids=CENTROIDS, id_col="vec_id",
            vec="embedding", threshold=0.35,
        ).orderBy("vec_id").collect()
    ]
    assert got == want

    # past the threshold: k = ceil(500/10) = 50 ≥ ARROW_ASSIGN_MIN_K,
    # so the Arrow assignment kernel engages on the default path too
    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 100)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 10)
    plans_sim._SCALED_QUANTIZERS.clear()
    scaled = plans_sim.emb_semantic_dedup(spark, sf)
    cents, _ = plans_sim._corpus_quantizer(sf, emb)
    assert len(cents) == 50 and len(cents) >= ann_index.IVF_AUTO_MIN_N / 10
    got2 = [tuple(r) for r in scaled.orderBy("vec_id").collect()]
    want2 = [
        tuple(r)
        for r in semantic_dedup(
            emb, centroids=cents, id_col="vec_id",
            vec="embedding", threshold=0.35,
        ).orderBy("vec_id").collect()
    ]
    assert got2 == want2
    assert max(r[1] for r in got2) > 15  # genuinely more cells than frozen k=16
    plans_sim._SCALED_QUANTIZERS.clear()


def test_scaled_quantizer_memo_cap_and_key(spark, tmp_path):
    """The quantizer memo evicts FIFO at its cap (long sessions across
    many corpora must not grow it unboundedly) and its key folds in the
    part-file count + max part mtime, so an entry-preserving corpus
    rewrite — same part names, same directory mtime — still
    invalidates it (r8 ADVICE)."""
    import os as _os

    from data_engineer_challenge_spark.plans import similarity as plans_sim
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    plans_sim._SCALED_QUANTIZERS.clear()
    for i in range(plans_sim._SCALED_QUANTIZER_CAP + 5):
        plans_sim._SCALED_QUANTIZERS[("dummy", i, 0, 0)] = ([], 1)
    plans_sim._corpus_quantizer(sf, emb)
    assert len(plans_sim._SCALED_QUANTIZERS) <= plans_sim._SCALED_QUANTIZER_CAP

    # directory-style corpus: bump ONE part file's mtime via utime —
    # the directory's own mtime does not move, so only the
    # max-part-mtime key component can catch the rewrite
    sf2 = str(tmp_path / "sf")
    emb_dir = _os.path.join(sf2, "embeddings.parquet")
    emb.limit(50).coalesce(1).write.parquet(emb_dir)
    emb2 = spark.read.parquet(emb_dir)
    plans_sim._corpus_quantizer(sf2, emb2)
    real_dir = _os.path.join(_os.path.realpath(sf2), "embeddings.parquet")
    before = {k for k in plans_sim._SCALED_QUANTIZERS if k[0] == real_dir}
    assert before
    part = next(
        n for n in _os.listdir(emb_dir) if n.endswith(".parquet")
    )
    pst = _os.stat(_os.path.join(emb_dir, part))
    # bump PAST the directory-wide max (+1 s), not by one 10 ms kernel
    # tick: file mtimes quantize to the tick, so a +tick bump can land
    # exactly on _SUCCESS's timestamp and leave the max — and the
    # key — unchanged (observed flake)
    cur_max = max(
        _os.stat(_os.path.join(emb_dir, n)).st_mtime_ns
        for n in _os.listdir(emb_dir)
        if not n.endswith(".crc")
    )
    _os.utime(
        _os.path.join(emb_dir, part),
        ns=(pst.st_atime_ns, cur_max + 10**9),
    )
    plans_sim._corpus_quantizer(sf2, emb2)
    after = {k for k in plans_sim._SCALED_QUANTIZERS if k[0] == real_dir}
    assert after - before  # a new key was minted for the "rewritten" corpus
    plans_sim._SCALED_QUANTIZERS.clear()


def test_ivf_pq_residual_store(spark, tmp_path):
    """Residual IVFADC (Jégou et al. TPAMI 2011 §IV.B — PQ codes
    cover ``vec - centroid[cell]``, the coarse term restored at
    scoring time as ⟨q, c⟩): (a) the residual encode kernel is
    bit-identical to the residual_vec + encode_pq expression form;
    (b) reconstructing through residual codes leaves strictly less
    quantization error than the raw-coded store's codebooks — the
    entire reason the mode exists; (c) probe_adc over a residual
    store is bit-identical between the Arrow-kernel and expression
    paths; (d) open() restores the residual flag from meta, and the
    flag is part of the meta fingerprint (reopening the store as a
    raw-coded index refuses); (e) end-to-end recall@10 at the same
    (n_probe, shortlist) is at least the raw store's."""
    import numpy as np

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
        encode_pq,
        encode_pq_vectorized,
        residual_vec,
        train_pq_codebooks,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk,
        nearest_centroid,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    assigned = emb.select(
        "vec_id",
        "embedding",
        nearest_centroid(F.col("embedding"), CENTROIDS).alias("cid"),
    )
    res_frame = assigned.select(
        "vec_id",
        residual_vec(F.col("embedding"), CENTROIDS).alias("embedding"),
    )
    cbs_res = train_pq_codebooks(res_frame, m=8, ksub=16)

    # (a) kernel == expression for residual encoding
    expr_codes = sorted(
        map(
            tuple,
            encode_pq(
                assigned, cbs_res, residual_centroids=CENTROIDS
            ).collect(),
        )
    )
    kern_codes = sorted(
        map(
            tuple,
            encode_pq_vectorized(
                assigned, cbs_res, residual_centroids=CENTROIDS
            ).collect(),
        )
    )
    assert expr_codes == kern_codes

    # (b) residual reconstruction error < raw reconstruction error
    rows = assigned.collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    cells = np.array([r.cid for r in rows])
    C = np.array(CENTROIDS, dtype=np.float64)
    by_id = {r.vec_id: i for i, r in enumerate(rows)}

    def recon_err(codes_rows, cbs, residual):
        sub = len(cbs[0][0])
        err = 0.0
        for cr in codes_rows:
            i = by_id[cr[0]]
            xh = np.concatenate(
                [np.array(cbs[s][cr[1 + s]]) for s in range(len(cbs))]
            )
            if residual:
                xh = xh + C[cells[i]]
            err += float(((X[i] - xh) ** 2).sum())
        return err / len(codes_rows)

    raw_codes = [tuple(r) for r in encode_pq(emb, CODEBOOKS).collect()]
    err_raw = recon_err(raw_codes, CODEBOOKS, residual=False)
    err_res = recon_err(kern_codes, cbs_res, residual=True)
    assert err_res < err_raw

    # build both stores, probe at the same config
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r.q_id, r.c_id)
        for r in brute_force_topk(
            queries,
            emb.select(F.col("vec_id").alias("c_id"), "embedding"),
            k=10,
        ).collect()
    }

    def build(path, cbs, residual):
        idx = IVFVectorIndex(
            spark,
            str(tmp_path / path),
            CENTROIDS,
            pq_codebooks=cbs,
            pq_residual=residual,
        )
        idx.build(emb)
        return idx

    raw_idx = build("raw", CODEBOOKS, False)
    res_idx = build("res", cbs_res, True)
    kwargs = dict(k=10, n_probe=len(CENTROIDS), shortlist=60)
    res_rows = res_idx.probe_adc(queries, **kwargs)
    got_res = [
        tuple(r) for r in res_rows.orderBy("q_id", "rank").collect()
    ]

    # (c) kernel == expression through the residual probe
    got_expr = [
        tuple(r)
        for r in res_idx.probe_adc(queries, vectorized=False, **kwargs)
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert got_expr == got_res

    # (d) reopen restores the flag; reopening as raw-coded refuses
    reopened = IVFVectorIndex.open(spark, str(tmp_path / "res"))
    assert reopened.pq_residual is True
    import pytest as _pytest

    with _pytest.raises(ValueError, match="was built with"):
        IVFVectorIndex(
            spark,
            str(tmp_path / "res"),
            CENTROIDS,
            pq_codebooks=cbs_res,
            pq_residual=False,
        )

    # (e) recall at the same config: residual >= raw
    def recall(rows_):
        got = {(r[0], r[1]) for r in rows_}
        return len(got & exact) / len(exact)

    raw_rows = [
        tuple(r)
        for r in raw_idx.probe_adc(queries, **kwargs).collect()
    ]
    assert recall(got_res) >= recall(raw_rows)


def test_pq_residual_registered_switch_independent(spark):
    """The registered residual-ADC row must return identical rows
    with the Arrow kernel forced ON below the threshold and the
    expression form forced above it (the emb_pq_adc_knn pin, applied
    to the residual twin — covers the ⟨q, c⟩ correction's two
    construction paths: driver-side python fold vs the dot
    expression), and its recall@10 at the same shortlist must be at
    least the raw row's (the reason residual coding exists)."""
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.operators.similarity import (
        brute_force_topk,
    )
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    import data_engineer_challenge_spark.plans.similarity as S

    sf = "/root/testdata/sf0.01"
    old = S._PQ_VECTORIZE_MIN_N
    try:
        S._PQ_VECTORIZE_MIN_N = 1  # force the kernel
        k_rows = sorted(
            map(tuple, S.emb_pq_residual_adc_knn(spark, sf).collect())
        )
        S._PQ_VECTORIZE_MIN_N = 10**9  # force the expression
        e_rows = sorted(
            map(tuple, S.emb_pq_residual_adc_knn(spark, sf).collect())
        )
    finally:
        S._PQ_VECTORIZE_MIN_N = old
    assert k_rows == e_rows and len(k_rows) > 0

    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r.q_id, r.c_id)
        for r in brute_force_topk(
            q,
            emb.select(F.col("vec_id").alias("c_id"), "embedding"),
            k=10,
        ).collect()
    }
    raw = {
        (r[0], r[1])
        for r in plans.REGISTRY["emb_pq_adc_knn"]
        .builder(spark, sf)
        .collect()
    }
    res = {(r[0], r[1]) for r in k_rows}
    assert len(res & exact) >= len(raw & exact)


def test_select_adc_width_residual_narrower(spark):
    """Residual-aware width selection: with residual-trained codebooks
    and the coarse-term correction, the recall-targeted shortlist is
    never WIDER than the raw selection at the same target (the
    SCALE.md sweep's curve shift, as a decision function), and a
    stricter target can only widen it — the raw selector's
    monotonicity contract, inherited."""
    from pyspark.sql import functions as F

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.pq import (
        residual_vec,
        train_pq_codebooks,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        nearest_centroid,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.plans.pq_residual_codebooks import (
        RESIDUAL_CODEBOOKS,
    )
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    target = 0.75
    w_raw = IVFVectorIndex.select_adc_width(emb, CODEBOOKS, target)
    # the sf0.1 residual codebooks: retrain on this corpus's residuals
    # (the frozen artifact is sf0.01-trained — selection must measure
    # the codebooks it will serve with)
    assigned = emb.select(
        "vec_id",
        "embedding",
        nearest_centroid(F.col("embedding"), CENTROIDS).alias("cid"),
    )
    rcb = train_pq_codebooks(
        assigned.select(
            "vec_id",
            residual_vec(F.col("embedding"), CENTROIDS).alias(
                "embedding"
            ),
        )
    )
    w_res = IVFVectorIndex.select_adc_width(
        emb, rcb, target, residual_centroids=CENTROIDS
    )
    assert w_res <= w_raw
    w_res_strict = IVFVectorIndex.select_adc_width(
        emb, rcb, min(0.95, target + 0.1), residual_centroids=CENTROIDS
    )
    assert w_res_strict >= w_res


def test_mmr_rerank_switch_independent(spark):
    """emb_mmr_rerank must return identical rows with the Arrow
    brute-force shortlist forced ON and the expression crossJoin
    forced OFF (the emb_pq_adc_knn switch pin, applied to the MMR
    shortlist stage — the greedy consumes integer micro-units, so any
    float drift between the two shortlist paths would move a pick)."""
    from data_engineer_challenge_spark import plans

    plans._load()
    import data_engineer_challenge_spark.plans.similarity as S

    sf = "/root/testdata/sf0.01"
    old = S._PQ_VECTORIZE_MIN_N
    try:
        S._PQ_VECTORIZE_MIN_N = 1  # force the kernel
        k_rows = sorted(
            map(tuple, S.emb_mmr_rerank(spark, sf).collect())
        )
        S._PQ_VECTORIZE_MIN_N = 10**9  # force the expression
        e_rows = sorted(
            map(tuple, S.emb_mmr_rerank(spark, sf).collect())
        )
    finally:
        S._PQ_VECTORIZE_MIN_N = old
    assert k_rows == e_rows and len(k_rows) > 0


def test_hard_negatives_switch_independent_and_label_disjoint(spark):
    """emb_hard_negatives: identical rows with the per-label Arrow
    kernel forced ON vs the labeled crossJoin expression (the MMR
    switch pin), and no negative ever shares its anchor's label."""
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    import data_engineer_challenge_spark.plans.similarity as S

    sf = "/root/testdata/sf0.01"
    old = S._PQ_VECTORIZE_MIN_N
    try:
        S._PQ_VECTORIZE_MIN_N = 1
        k_rows = sorted(
            map(tuple, S.emb_hard_negatives(spark, sf).collect())
        )
        S._PQ_VECTORIZE_MIN_N = 10**9
        e_rows = sorted(
            map(tuple, S.emb_hard_negatives(spark, sf).collect())
        )
    finally:
        S._PQ_VECTORIZE_MIN_N = old
    assert k_rows == e_rows and len(k_rows) > 0

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf, "embeddings").collect()
    }
    for q_id, neg_id, _cos, _rank in k_rows:
        assert labels[q_id] != labels[neg_id]


def test_training_triplets_semantics(spark):
    """Triplets: positives share the anchor's label, negatives don't,
    margin arithmetic checks out, and the switch pin holds (kernel
    forced ON == expression forced OFF)."""
    from data_engineer_challenge_spark import plans
    from data_engineer_challenge_spark.tables import load_table

    plans._load()
    import data_engineer_challenge_spark.plans.similarity as S

    sf = "/root/testdata/sf0.01"
    old = S._PQ_VECTORIZE_MIN_N
    try:
        S._PQ_VECTORIZE_MIN_N = 1
        k_rows = sorted(
            map(tuple, S.emb_training_triplets(spark, sf).collect())
        )
        S._PQ_VECTORIZE_MIN_N = 10**9
        e_rows = sorted(
            map(tuple, S.emb_training_triplets(spark, sf).collect())
        )
    finally:
        S._PQ_VECTORIZE_MIN_N = old
    assert k_rows == e_rows and len(k_rows) > 0

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf, "embeddings").collect()
    }
    for q_id, pos_id, pos_cos, neg_id, neg_cos, margin in k_rows:
        assert labels[q_id] == labels[pos_id] and q_id != pos_id
        assert labels[q_id] != labels[neg_id]
        assert abs(margin - round(pos_cos - neg_cos, 6)) < 1e-12


def test_probe_local_matches_probe_adc(spark, tmp_path):
    """probe_local (driver-side point serving, no Spark job) must
    answer BIT-identically to probe_adc for the same (query, k,
    n_probe, shortlist) — raw-coded and residual-coded stores, and
    across a supersede + tombstone (the roster/live mask replayed in
    pandas must agree with _live's)."""
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.plans.pq_residual_codebooks import (
        RESIDUAL_CODEBOOKS,
    )
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(3)
        .collect()
    )

    def check(idx):
        for r in qrows:
            queries = emb.where(
                F.col("vec_id") == r["vec_id"]
            ).select(F.col("vec_id").alias("q_id"), "embedding")
            want = [
                (row["c_id"], row["cos_sim"], row["rank"])
                for row in idx.probe_adc(
                    queries, k=10, n_probe=4, shortlist=60
                )
                .orderBy("rank")
                .collect()
            ]
            got = idx.probe_local(
                list(r["embedding"]), k=10, n_probe=4, shortlist=60
            )
            assert got == want, r["vec_id"]

    for name, cbs, residual in [
        ("raw", CODEBOOKS, False),
        ("res", RESIDUAL_CODEBOOKS, True),
    ]:
        idx = IVFVectorIndex(
            spark,
            str(tmp_path / name),
            CENTROIDS,
            pq_codebooks=cbs,
            pq_residual=residual,
        )
        idx.build(emb)
        check(idx)

    # mutation coverage on the raw store: supersede one corpus vector
    # and tombstone another — both paths must keep agreeing through
    # the roster mask
    idx = IVFVectorIndex.open(spark, str(tmp_path / "raw"))
    vid0 = int(qrows[0]["vec_id"])
    moved = emb.where(F.col("vec_id") == vid0 + 1).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    idx.append(moved, ordinal=999, supersede=True)
    idx.delete(
        emb.where(F.col("vec_id") == vid0 + 2).select("vec_id"),
        ordinal=1000,
    )
    check(idx)


def test_probe_local_survives_same_k_rebucket(spark, tmp_path):
    """r12 review: maybe_rebucket can retrain the SAME k with
    different centroid values (k_new = max(old_k, ceil(n/target))),
    and a length-keyed centroid cache would keep ranking cells
    against the OLD centroids over the NEW layout. probe_local must
    track the rebucket and stay bit-identical to probe_adc."""
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    idx = IVFVectorIndex(
        spark,
        str(tmp_path / "ivfpq"),
        CENTROIDS,
        pq_codebooks=CODEBOOKS,
    )
    idx.build(emb)
    q = emb.orderBy("vec_id").first()
    qv = list(q["embedding"])
    idx.probe_local(qv, k=10, n_probe=4, shortlist=60)  # warm cache
    assert idx.maybe_rebucket(
        min_n=100, target_list_size=256, growth_factor=0.0
    )
    assert int(idx.meta["k"]) == len(CENTROIDS)  # SAME k, new values
    queries = emb.where(F.col("vec_id") == q["vec_id"]).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = [
        (r["c_id"], r["cos_sim"], r["rank"])
        for r in idx.probe_adc(queries, k=10, n_probe=4, shortlist=60)
        .orderBy("rank")
        .collect()
    ]
    got = idx.probe_local(qv, k=10, n_probe=4, shortlist=60)
    assert got == want


def test_serve_query_cli_sparkless(spark, tmp_path):
    """tools/serve_query.py must answer from a persisted store in a
    SUBPROCESS that never starts a SparkSession or JVM (open_local),
    bit-identical to probe_adc in this session."""
    import json as _json
    import subprocess
    import sys

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    store = str(tmp_path / "ivfpq")
    idx = IVFVectorIndex(spark, store, CENTROIDS, pq_codebooks=CODEBOOKS)
    idx.build(emb)
    q = emb.orderBy("vec_id").first()
    want = [
        [r["c_id"], r["cos_sim"], r["rank"]]
        for r in idx.probe_adc(
            emb.where(F.col("vec_id") == q["vec_id"]).select(
                F.col("vec_id").alias("q_id"), "embedding"
            ),
            k=10,
            n_probe=4,
            shortlist=60,
        )
        .orderBy("rank")
        .collect()
    ]
    vec = ",".join(str(float(x)) for x in q["embedding"])
    r = subprocess.run(
        [
            sys.executable,
            "tools/serve_query.py",
            "--store",
            store,
            "--vec",
            vec,
            "--n-probe",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={
            **__import__("os").environ,
            # a JVM accidentally started in the serving process would
            # need these; their absence doesn't matter for the pure
            # pyarrow path and keeps the test honest about "no Spark"
            "SPARK_LOCAL_IP": "127.0.0.1",
        },
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["results"] == want
    # sanity: the subprocess never built a Spark context (a JVM launch
    # writes this banner to stderr)
    assert "SparkContext" not in r.stderr


def test_compaction_budget_bounds_per_tick_folds(spark, tmp_path):
    """r13 (VERDICT r12 #2): a uniform drop fattens EVERY cid= list at
    once, so an unbounded maybe_compact periodically rewrites the
    whole store in one tick (~122 s bursts in the r12 21-tick table).
    With ``budget=K`` each call folds exactly the K fattest lists
    (file-count desc, name asc — deterministic), probe answers are
    unchanged throughout, and successive calls drain the backlog —
    bounded per-tick maintenance instead of an unstaggered-LSM
    burst."""
    import os

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.compaction import (
        _data_files,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFVectorIndex(spark, str(tmp_path / "ivf"), CENTROIDS)
    idx.build(emb.where("vec_id % 3 = 0"))
    # two uniform appends: every list gains file-sets in the same tick
    idx.append(emb.where("vec_id % 3 = 1"))
    idx.append(emb.where("vec_id % 3 = 2"))
    posts = str(tmp_path / "ivf" / "postings")

    def files_per_list() -> dict[str, int]:
        return {
            d: len(_data_files(os.path.join(posts, d)))
            for d in os.listdir(posts)
            if d.startswith("cid=")
        }

    before = files_per_list()
    # threshold 1 (not 0): a folded single-file dir must DROP OUT of
    # eligibility or the drain loop below could never terminate
    eligible = [d for d, k in before.items() if k > 1]
    assert len(eligible) >= 4  # the burst scenario: many fat lists

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=len(CENTROIDS))
        .orderBy("q_id", "rank")
        .collect()
    ]

    # budgeted call folds EXACTLY budget dirs — the fattest ones
    assert idx.maybe_compact(max_files_per_list=1, budget=2) == 2
    after = files_per_list()
    folded = sorted(d for d in eligible if after[d] == 1)
    assert len(folded) == 2
    # fattest-first, name-asc ties: no unfolded dir may have strictly
    # more files than a folded one had
    folded_min = min(before[d] for d in folded)
    assert all(
        before[d] <= folded_min or after[d] == 1 for d in eligible
    )
    # probes correct mid-backlog (uncompacted lists are just more files)
    got = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=len(CENTROIDS))
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert got == want

    # successive budgeted ticks drain the backlog to zero
    for _ in range(100):
        if idx.maybe_compact(max_files_per_list=1, budget=2) == 0:
            break
    else:
        raise AssertionError("budgeted compaction never drained")
    assert all(k == 1 for k in files_per_list().values())
    got2 = [
        tuple(r)
        for r in idx.probe(queries, k=5, n_probe=len(CENTROIDS))
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert got2 == want


def test_reselect_serving_after_rebucket(spark, tmp_path, monkeypatch):
    """r13 (VERDICT r12 #3): a rebucketed store kept serving its
    build-time n_probe hint while recall silently drifted (0.656 at
    the end of the r12 21-tick walk). reselect_serving re-runs the
    held-out sweep against the CURRENT quantizer over the LIVE rows,
    returns the recall MEASURED at the chosen width, and persists the
    hint so open()/open_local() serve it."""
    import json as _json
    import os as _os

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, [list(c) for c in CENTROIDS[:2]])
    idx.build(emb.where("vec_id < 80"))
    idx.append(emb.where("vec_id >= 80"))
    assert idx.maybe_rebucket() is True
    stale_hint = idx.n_probe_hint  # the fraction rule, unmeasured

    res = idx.reselect_serving(0.9)
    # the receipt: measured recall at the chosen width meets the
    # target unless even full-width probing cannot (it can here —
    # probing every list IS exact search on a raw store)
    assert res["recall"] >= 0.9
    assert 1 <= res["n_probe"] <= idx.meta["k"]
    assert res["adc_shortlist"] is None  # raw store: no coded width
    assert idx.n_probe_hint == res["n_probe"]

    # persisted: the quantizer file carries the hint...
    qf = _os.path.join(
        path, "meta", f"quantizer-{idx.meta['centroids_md5']}.json"
    )
    with open(qf) as f:
        quant = _json.load(f)
    assert quant["n_probe"] == res["n_probe"]
    assert quant["centroids"] == idx.centroids  # untouched
    # ...and BOTH reopen paths serve it
    assert IVFVectorIndex.open(spark, path).n_probe_hint == res["n_probe"]
    assert IVFVectorIndex.open_local(path).n_probe_hint == res["n_probe"]
    del stale_hint


def test_reselect_serving_coded_store_persists_adc_width(
    spark, tmp_path, monkeypatch
):
    """Coded stores also re-select the ADC shortlist width: the
    quantizer file gains adc_shortlist and open()/open_local()
    restore it as adc_shortlist_hint."""
    import json as _json
    import os as _os

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import (
        CODEBOOKS,
    )
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivfpq")
    idx = IVFVectorIndex(
        spark, path, [list(c) for c in CENTROIDS],
        pq_codebooks=CODEBOOKS,
    )
    idx.build(emb)
    res = idx.reselect_serving(0.8)
    assert res["adc_shortlist"] is not None and res["adc_shortlist"] >= 10
    assert idx.adc_shortlist_hint == res["adc_shortlist"]
    qf = _os.path.join(
        path, "meta", f"quantizer-{idx.meta['centroids_md5']}.json"
    )
    with open(qf) as f:
        quant = _json.load(f)
    assert quant["adc_shortlist"] == res["adc_shortlist"]
    ro = IVFVectorIndex.open(spark, path)
    assert ro.adc_shortlist_hint == res["adc_shortlist"]
    assert ro.n_probe_hint == res["n_probe"]
    assert (
        IVFVectorIndex.open_local(path).adc_shortlist_hint
        == res["adc_shortlist"]
    )


def test_serve_query_cli_text_mode_sparkless(spark, tmp_path):
    """The CLI's --terms mode (r13, VERDICT r12 #4) answers a BM25
    query from a persisted InvertedTextIndex in a subprocess that
    never starts a SparkSession or JVM, bit-identical to probe() in
    this session."""
    import json as _json
    import subprocess
    import sys

    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = str(tmp_path / "tix")
    idx = InvertedTextIndex(spark, store, t_buckets=16)
    idx.build(docs.select("doc_id", "text"))
    terms = ("spark", "window", "vector")
    want = [
        [r["doc_id"], r["score"], r["rank"]]
        for r in idx.probe(terms, topk=10).orderBy("rank").collect()
    ]
    r = subprocess.run(
        [
            sys.executable,
            "tools/serve_query.py",
            "--store",
            store,
            "--terms",
            ",".join(terms),
            "--topk",
            "10",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={
            **__import__("os").environ,
            "SPARK_LOCAL_IP": "127.0.0.1",
        },
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["results"] == want
    assert out["terms"] == list(terms)
    assert "SparkContext" not in r.stderr


def test_compaction_budget_auto_equilibrium(spark, tmp_path):
    """budget="auto" (the ingest ticks' default) self-sizes to
    max(32, ceil(n_dirs / max_files)) — on a small store the floor
    dominates and auto folds everything eligible in one call (no
    backlog), while the formula guarantees drain >= arrival for any
    bucket count under uniform drops."""
    import math

    from data_engineer_challenge_spark.operators import compaction
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFVectorIndex(spark, str(tmp_path / "ivf"), CENTROIDS)
    idx.build(emb.where("vec_id % 2 = 0"))
    idx.append(emb.where("vec_id % 2 = 1"))
    # small store: auto = max(32, ceil(n_dirs/1)) >= every eligible
    # dir, so one call drains the whole backlog
    assert idx.maybe_compact(max_files_per_list=1, budget="auto") >= 1
    assert idx.maybe_compact(max_files_per_list=1, budget="auto") == 0
    # the formula itself (unit level): 400 dirs at threshold 8 must
    # budget >= 50, never the bare floor
    assert max(32, math.ceil(400 / max(8, 1))) == 50
    # and explicit ints stay literal (the fattest-first test's pin)
    del compaction


def test_localhash_replicas_match_spark(spark):
    """operators/localhash: the pure-Python Murmur3/xxHash64 replicas
    behind the sparkless probe_local family must be BIT-IDENTICAL to
    Spark's F.hash / F.xxhash64 — strings (ASCII/multibyte/empty/
    32-byte-stripe lengths), longs (full signed range), and the
    multi-argument left-chained xxhash64 fold."""
    from data_engineer_challenge_spark.operators.localhash import (
        spark_murmur3_long,
        spark_murmur3_string,
        spark_xxhash64_longs,
        spark_xxhash64_string,
    )

    words = ["data", "", "ab", "abc", "abcd", "église", "学习",
             "x" * 31, "y" * 32, "z" * 100, "mixed tokens 123"]
    for r in (
        spark.createDataFrame([(w,) for w in words], "t string")
        .select("t", F.hash("t").alias("m"), F.xxhash64("t").alias("x"))
        .collect()
    ):
        assert spark_murmur3_string(r["t"]) == r["m"], r["t"]
        assert spark_xxhash64_string(r["t"]) == r["x"], r["t"]
    longs = [0, 1, -1, 2**62, -(2**62), 1234567890123456789,
             -987654321987654321]
    for r in (
        spark.createDataFrame([(v,) for v in longs], "l long")
        .select("l", F.hash("l").alias("m"), F.xxhash64("l").alias("x"))
        .collect()
    ):
        assert spark_murmur3_long(r["l"]) == r["m"], r["l"]
        assert spark_xxhash64_longs((r["l"],)) == r["x"], r["l"]
    pairs = [(1, 2), (-5, 7), (2**60, -(2**61)), (0, 0)]
    for r in (
        spark.createDataFrame(pairs, "a long, b long")
        .select("a", "b", F.xxhash64("a", "b").alias("x"))
        .collect()
    ):
        assert spark_xxhash64_longs((r["a"], r["b"])) == r["x"]


def test_minhash_probe_local_matches_probe(spark, tmp_path):
    """MinHashIndex.probe_local (r13 — the dedup tier's sparkless
    point serving) must return EXACTLY probe()'s (dup_of, jaccard)
    set for a one-document batch: same token/shingle xxhash64 chain,
    same affine banding + FNV fold, same bucket pruning, same
    exact-Jaccard max-fold verify and threshold. Pinned on near-dup
    hits, a clean miss, a too-short text, and across an append
    (resident cache invalidates via the store fingerprint)."""
    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "mh")
    idx = MinHashIndex(spark, path, threshold=0.5)
    idx.build(docs.filter(F.col("doc_id") % 5 != 0))

    local = MinHashIndex.open_local(path)
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text"
    )
    rows = probe_batch.orderBy("doc_id").collect()

    def spark_answer(doc_id):
        one = probe_batch.where(F.col("doc_id") == doc_id)
        got = idx.probe(one).collect()
        idx.release()
        return {(r["dup_of"], r["jaccard"]) for r in got}

    # every probe-side doc: local == spark, hits and misses alike
    n_hits = 0
    for r in rows[:25]:
        want = spark_answer(r["doc_id"])
        got = set(local.probe_local(r["text"]))
        assert got == want, r["doc_id"]
        n_hits += bool(want)
    assert n_hits >= 1  # the corpus plants near-dups; prove a hit path

    assert local.probe_local("one") == []  # < shingle_n tokens
    assert local.probe_local("") == []

    # mutate the store: cache must drop, answers must track
    idx.append(probe_batch.where(F.col("doc_id") % 10 == 0))
    sample = rows[5]["text"]
    got2 = set(local.probe_local(sample))
    one = probe_batch.where(F.col("doc_id") == rows[5]["doc_id"])
    want2 = {(r["dup_of"], r["jaccard"]) for r in idx.probe(one).collect()}
    idx.release()
    assert got2 == want2


def test_serve_query_cli_dedup_mode_sparkless(spark, tmp_path):
    """The CLI's --text mode (r13) near-dup-checks one raw document
    against a persisted MinHashIndex in a subprocess that never
    starts a SparkSession or JVM, decision-identical to probe() in
    this session."""
    import json as _json
    import subprocess
    import sys

    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = str(tmp_path / "mh")
    idx = MinHashIndex(spark, store, threshold=0.5)
    idx.build(docs.filter(F.col("doc_id") % 5 != 0))
    # pick a probe-side doc that HAS an indexed near-dup
    probe_batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text"
    )
    hits = idx.probe(probe_batch).collect()
    idx.release()
    assert hits, "fixture corpus should plant at least one near-dup"
    hit_id = hits[0]["new_id"]
    want = sorted(
        ((r["dup_of"], r["jaccard"]) for r in hits if r["new_id"] == hit_id),
        key=lambda t: (-t[1], t[0]),
    )
    text = probe_batch.where(F.col("doc_id") == hit_id).first()["text"]
    tf = tmp_path / "doc.txt"
    tf.write_text(text)
    r = subprocess.run(
        [
            sys.executable,
            "tools/serve_query.py",
            "--store",
            store,
            "--text",
            f"@{tf}",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_LOCAL_IP": "127.0.0.1"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["is_duplicate"] is True
    assert [tuple(x) for x in out["results"]] == want
    assert "SparkContext" not in r.stderr


def test_window_hash_probe_local_matches_probe(spark, tmp_path):
    """WindowHashIndex.probe_local (r13 — the passage tier's
    sparkless point serving, the probe_local family's fourth and
    last member) must return EXACTLY probe()'s (n_tokens,
    n_tokens_cut, dedup_text) for a one-document batch: same window
    md5s, same pmod(hash(h), N) bucket pruning, same adjacent-merging
    island union and half-open cut. Pinned on an indexed-passage hit
    at an odd alignment, a fresh-text miss, a multi-span doc, an
    empty doc, and across an append."""
    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    path = str(tmp_path / "wh")
    idx = WindowHashIndex(spark, path, window=8)
    passage_a = " ".join(f"alpha{i}" for i in range(20))
    passage_b = " ".join(f"beta{i}" for i in range(15))
    corpus = spark.createDataFrame(
        [(0, f"intro words {passage_a} outro"),
         (1, f"other doc holding {passage_b} tail words here")],
        "doc_id long, text string",
    )
    idx.append(corpus)

    local = WindowHashIndex.open_local(path)
    probes = [
        f"lead tokens then {passage_a} and fresh tail",        # hit
        " ".join(f"fresh{i}" for i in range(30)),              # miss
        f"x {passage_a} y {passage_b} z",                      # two spans
        "short text",                                          # < window
    ]
    for i, text in enumerate(probes):
        one = spark.createDataFrame(
            [(100 + i, text)], "doc_id long, text string"
        )
        want = idx.probe(one).collect()
        assert len(want) == 1
        wr = want[0]
        got = local.probe_local(text)
        assert got == (
            wr["n_tokens"], wr["n_tokens_cut"], wr["dedup_text"]
        ), text[:40]
    assert local.probe_local("") is None  # empty doc: probe emits no row
    # the hit actually cut something (guard against a vacuous pin)
    assert local.probe_local(probes[0])[1] > 0

    # append new text; the resident membership cache must drop
    extra = " ".join(f"gamma{i}" for i in range(12))
    idx.append(spark.createDataFrame(
        [(2, f"padding {extra} padding2")], "doc_id long, text string"
    ))
    text = f"now containing {extra} too plus filler words"
    one = spark.createDataFrame([(200, text)], "doc_id long, text string")
    wr = idx.probe(one).collect()[0]
    assert local.probe_local(text) == (
        wr["n_tokens"], wr["n_tokens_cut"], wr["dedup_text"]
    )


def test_serve_query_cli_passage_mode_sparkless(spark, tmp_path):
    """The CLI's --cut-text mode (r13) passage-trims one raw document
    against a persisted WindowHashIndex in a subprocess with no JVM,
    identical to probe() in this session."""
    import json as _json
    import subprocess
    import sys

    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )

    store = str(tmp_path / "wh")
    idx = WindowHashIndex(spark, store, window=8)
    passage = " ".join(f"alpha{i}" for i in range(20))
    idx.append(spark.createDataFrame(
        [(0, f"intro {passage} outro")], "doc_id long, text string"
    ))
    text = f"lead tokens then {passage} and fresh tail"
    one = spark.createDataFrame([(9, text)], "doc_id long, text string")
    wr = idx.probe(one).collect()[0]
    tf = tmp_path / "doc.txt"
    tf.write_text(text)
    r = subprocess.run(
        [
            sys.executable, "tools/serve_query.py",
            "--store", store, "--cut-text", f"@{tf}",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_LOCAL_IP": "127.0.0.1"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_tokens"] == wr["n_tokens"]
    assert out["n_tokens_cut"] == wr["n_tokens_cut"] > 0
    assert out["dedup_text"] == wr["dedup_text"]
    assert "SparkContext" not in r.stderr


def test_text_probe_local_duplicated_query_term(spark, tmp_path):
    """r13 review: probe() populates EVERY tf{i} slot whose term
    matches, so a duplicated query term contributes its BM25
    component once per occurrence in the fixed-order sum —
    probe_local must replicate that (the first cut mapped postings
    only to the term's last slot, halving the duplicate's weight and
    re-ranking mixed queries)."""
    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "tix")
    idx = InvertedTextIndex(spark, path, t_buckets=8)
    idx.build(docs.select("doc_id", "text"))
    local = InvertedTextIndex.open_local(path)
    for q in [("data", "data"), ("data", "quality", "data"),
              ("the", "data", "the", "the")]:
        want = [
            (r["doc_id"], r["score"], r["rank"])
            for r in idx.probe(q, topk=15).orderBy("rank").collect()
        ]
        assert local.probe_local(q, topk=15) == want, q


def test_probe_local_survives_cross_process_rebucket(spark, tmp_path):
    """r13 review: a serving handle must RELOAD persisted meta when
    the store fingerprint changes — a rebucket in another process
    changes the bucket modulus, and a handle that only dropped its
    cache would read bucket dirs at the old modulus and silently
    miss everything. Simulated with a second (mutator) handle per
    store family: text, minhash, passage."""
    from data_engineer_challenge_spark.operators.dedup_index import (
        MinHashIndex,
    )
    from data_engineer_challenge_spark.operators.passage import (
        WindowHashIndex,
    )
    from data_engineer_challenge_spark.operators.text_index import (
        InvertedTextIndex,
    )
    from data_engineer_challenge_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    # ---- text ----
    tpath = str(tmp_path / "tix")
    t_mut = InvertedTextIndex(spark, tpath, t_buckets=2)
    t_mut.build(docs.where("doc_id % 2 = 0").select("doc_id", "text"))
    serving = InvertedTextIndex.open_local(tpath)
    q = ("data", "quality")
    assert serving.probe_local(q, topk=10) == [
        (r["doc_id"], r["score"], r["rank"])
        for r in t_mut.probe(q, topk=10).orderBy("rank").collect()
    ]  # warm the stale handle
    t_mut.append(docs.where("doc_id % 2 = 1").select("doc_id", "text"))
    assert t_mut.maybe_rebucket(target_bucket_rows=10) is True
    assert serving.meta["t_buckets"] == 2  # stale until next probe
    want = [
        (r["doc_id"], r["score"], r["rank"])
        for r in t_mut.probe(q, topk=10).orderBy("rank").collect()
    ]
    assert serving.probe_local(q, topk=10) == want
    assert serving.meta["t_buckets"] == t_mut.meta["t_buckets"] > 2

    # ---- minhash ----
    mpath = str(tmp_path / "mh")
    m_mut = MinHashIndex(spark, mpath, threshold=0.5, bh_buckets=2)
    m_mut.build(docs.filter(F.col("doc_id") % 5 != 0))
    m_serving = MinHashIndex.open_local(mpath)
    probe_rows = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(10)
        .collect()
    )
    m_serving.probe_local(probe_rows[0]["text"])  # warm
    assert m_mut.maybe_rebucket(target_bucket_rows=10) is True
    for r in probe_rows:
        one = docs.where(F.col("doc_id") == r["doc_id"]).select(
            "doc_id", "text"
        )
        want = {
            (x["dup_of"], x["jaccard"])
            for x in m_mut.probe(one).collect()
        }
        m_mut.release()
        assert set(m_serving.probe_local(r["text"])) == want, r["doc_id"]
    assert m_serving.meta["bh_buckets"] == m_mut.meta["bh_buckets"] > 2

    # ---- passage ----
    wpath = str(tmp_path / "wh")
    w_mut = WindowHashIndex(spark, wpath, window=8, h_buckets=2)
    passage = " ".join(f"alpha{i}" for i in range(20))
    # enough distinct window rows that mean bucket rows exceed the
    # rebucket trigger below
    filler = [
        (10 + k, " ".join(f"fill{k}w{i}" for i in range(40)))
        for k in range(5)
    ]
    w_mut.append(spark.createDataFrame(
        [(0, f"intro {passage} outro"), *filler],
        "doc_id long, text string",
    ))
    w_serving = WindowHashIndex.open_local(wpath)
    text = f"lead tokens then {passage} tail"
    w_serving.probe_local(text)  # warm
    assert w_mut.maybe_rebucket(
        target_bucket_rows=10, growth_factor=1.0
    ) is True
    one = spark.createDataFrame([(9, text)], "doc_id long, text string")
    wr = w_mut.probe(one).collect()[0]
    assert w_serving.probe_local(text) == (
        wr["n_tokens"], wr["n_tokens_cut"], wr["dedup_text"]
    )
    assert wr["n_tokens_cut"] > 0
    assert w_serving.meta["h_buckets"] == w_mut.meta["h_buckets"] > 2


def test_ivf_probe_local_survives_cross_process_rebucket(
    spark, tmp_path, monkeypatch
):
    """r13 review (the IVF member of the stale-meta fix): a serving
    handle holding build-time centroids must detect a rebucket done
    through ANOTHER handle via the store fingerprint and reload
    meta + quantizer + hints from their persisted files — otherwise
    it would assign the query to cells of a layout that no longer
    exists."""
    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivfpq")
    mut = IVFVectorIndex(
        spark, path, [list(c) for c in CENTROIDS[:2]],
        pq_codebooks=CODEBOOKS,
    )
    mut.build(emb.where("vec_id < 80"))

    serving = IVFVectorIndex.open_local(path)
    q = emb.orderBy("vec_id").first()
    qv = list(q["embedding"])
    serving.probe_local(qv, k=5, n_probe=2, shortlist=60)  # warm

    mut.append(emb.where("vec_id >= 80"))
    assert mut.maybe_rebucket() is True
    k_new = mut.meta["k"]
    assert k_new > 2

    # full-width probe on the NEW layout, both paths
    one = emb.where(F.col("vec_id") == q["vec_id"]).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = [
        (r["c_id"], r["cos_sim"], r["rank"])
        for r in mut.probe_adc(one, k=5, n_probe=k_new, shortlist=60)
        .orderBy("rank")
        .collect()
    ]
    got = serving.probe_local(qv, k=5, n_probe=k_new, shortlist=60)
    assert got == want
    assert serving.meta["centroids_md5"] == mut.meta["centroids_md5"]
    assert len(serving.centroids) == k_new


def test_ivf_staged_rebucket_matches_oneshot(spark, tmp_path, monkeypatch):
    """r14 (VERDICT r13 #3): maybe_rebucket(stage_rows=) spreads the
    growth event across budgeted ticks. Pins: (a) phase sequence
    plan → stages → swap, with False returned until the swap; (b) the
    staged store lands the SAME quantizer (same md5 — deterministic
    retrain over the same live set) and probes IDENTICALLY to the
    one-shot rebucket at every width; (c) probes BETWEEN phases keep
    serving the old layout unchanged; (d) protocol state survives a
    process hand-off (reopen via open() mid-flight and finish there);
    (e) cleanup: no manifest/staging left after the swap."""
    import json as _json
    import os as _os

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    small = [list(c) for c in CENTROIDS[:2]]
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    def mk(name):
        idx = IVFVectorIndex(spark, str(tmp_path / name), small)
        idx.build(emb.where("vec_id < 80"))
        idx.append(emb.where("vec_id >= 80"))
        return idx

    A, B = mk("oneshot"), mk("staged")
    before = [
        tuple(r)
        for r in B.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ]
    assert A.maybe_rebucket() is True

    # (a) plan tick
    assert B.maybe_rebucket(stage_rows=150) is False
    assert B.rebucket_phase.startswith("plan")
    man_path = _os.path.join(str(tmp_path / "staged"), ".rebucket", "manifest.json")
    man = _json.load(open(man_path))
    assert man["n_stages"] == 4  # ceil(500 / 150)
    # (c) old layout still serves, untouched
    assert B.meta["k"] == 2
    assert [
        tuple(r)
        for r in B.probe(queries, k=5, n_probe=2)
        .orderBy("q_id", "rank")
        .collect()
    ] == before

    # two stage ticks on this handle...
    assert B.maybe_rebucket(stage_rows=150) is False
    assert B.rebucket_phase == "stage 1/4"
    assert B.maybe_rebucket(stage_rows=150) is False
    # (d) ...then hand the store to a FRESH handle mid-flight (open()
    # must preserve the in-flight manifest + staging)
    B2 = IVFVectorIndex.open(spark, str(tmp_path / "staged"))
    assert _os.path.exists(man_path)
    assert B2.maybe_rebucket(stage_rows=150) is False
    assert B2.rebucket_phase == "stage 3/4"
    assert B2.maybe_rebucket(stage_rows=150) is False
    assert B2.maybe_rebucket(stage_rows=150) is True  # swap
    assert B2.rebucket_phase == "swap"

    # (b) same quantizer, identical probes vs the one-shot store
    assert B2.meta["centroids_md5"] == A.meta["centroids_md5"]
    assert B2.meta["k"] == A.meta["k"] == 20
    for np_ in (2, 4, 20):
        assert [
            tuple(r)
            for r in B2.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ] == [
            tuple(r)
            for r in A.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ], np_
    posts = spark.read.option("mergeSchema", "true").parquet(
        _os.path.join(str(tmp_path / "staged"), "postings")
    )
    assert posts.count() == 500  # no row lost or duplicated
    # (e) protocol state cleaned up
    assert not _os.path.exists(man_path)
    assert not _os.path.isdir(
        _os.path.join(str(tmp_path / "staged"), ".rebucket-postings")
    )
    # no re-trigger: lists are back at target size
    assert B2.maybe_rebucket(stage_rows=150) is False


def test_ivf_staged_rebucket_delta_and_crash_windows(
    spark, tmp_path, monkeypatch
):
    """The staged protocol under churn and crashes: (A) rows appended
    and superseded MID-STAGING are served correctly after the swap
    (the swap's (id, __ord) anti-join delta catches post-plan rows;
    the roster masks staged-then-superseded copies); (B) a stage tick
    whose manifest advance crashed replays its slice — duplicate
    staged rows fold away in probes; (C) a swap that committed but
    crashed before cleanup resolves at open (manifest dropped); an
    orphan staging dir with no manifest is swept."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    small = [list(c) for c in CENTROIDS[:2]]
    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, small)
    idx.build(emb.where("vec_id < 80"))
    idx.append(emb.where("vec_id >= 80 and vec_id < 450"), ordinal=1)

    man_path = _os.path.join(path, ".rebucket", "manifest.json")
    assert idx.maybe_rebucket(stage_rows=120) is False  # plan (450 rows)
    n_stages = _json.load(open(man_path))["n_stages"]
    assert idx.maybe_rebucket(stage_rows=120) is False  # stage 1

    # (B) crash-replay: rewind the manifest as if the advance was lost
    man = _json.load(open(man_path))
    man["next_stage"] -= 1
    _json.dump(man, open(man_path, "w"))
    assert idx.maybe_rebucket(stage_rows=120) is False  # slice replayed

    # (A) mid-staging churn: new rows + a superseding update of an id
    # whose slice may already have staged
    idx.append(emb.where("vec_id >= 450"), ordinal=2)
    upd = emb.where("vec_id = 10").withColumn(
        "embedding",
        F.transform("embedding", lambda v: v * F.lit(2.0)).cast(
            "array<float>"
        ),
    )
    idx.append(upd, ordinal=3, supersede=True)

    while not idx.maybe_rebucket(stage_rows=120):
        pass  # drain remaining stages + swap
    assert idx.rebucket_phase == "swap"

    # post-swap serving must equal a FRESH index built with the same
    # final quantizer over the CURRENT live set (delta + roster mask)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    live = emb.where("vec_id != 10").unionByName(upd)
    fresh = IVFVectorIndex(spark, str(tmp_path / "fresh"), idx.centroids)
    fresh.build(live)
    for np_ in (2, idx.meta["k"]):
        assert [
            tuple(r)
            for r in idx.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ] == [
            tuple(r)
            for r in fresh.probe(queries, k=5, n_probe=np_)
            .orderBy("q_id", "rank")
            .collect()
        ], np_

    # (C) committed-swap-crash-before-cleanup: recreate the manifest
    # with the NOW-LIVE md5; open() must sweep it
    _os.makedirs(_os.path.dirname(man_path), exist_ok=True)
    _json.dump(
        {"new_md5": idx.meta["centroids_md5"]}, open(man_path, "w")
    )
    _os.makedirs(_os.path.join(path, ".rebucket-postings"), exist_ok=True)
    re = IVFVectorIndex.open(spark, path)
    assert not _os.path.exists(man_path)
    assert not _os.path.isdir(_os.path.join(path, ".rebucket-postings"))
    # orphan staging dir with no manifest is swept too
    _os.makedirs(_os.path.join(path, ".rebucket-postings"), exist_ok=True)
    IVFVectorIndex.open(spark, path)
    assert not _os.path.isdir(_os.path.join(path, ".rebucket-postings"))
    del re, _shutil


def test_ivf_staged_rebucket_plan_time_serving_sweep(
    spark, tmp_path, monkeypatch
):
    """r14: with recall_target set, the staged protocol runs BOTH
    serving sweeps at PLAN time (they depend on quantizer + live
    rows, not file layout), persists the hints with the new
    quantizer, and installs the measured receipt at the swap — no
    post-swap reselect needed."""
    import json as _json
    import os as _os

    from data_engineer_challenge_spark.operators import ann_index
    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.plans.ivf_centroids import CENTROIDS
    from data_engineer_challenge_spark.plans.pq_codebooks import CODEBOOKS
    from data_engineer_challenge_spark.tables import load_table

    monkeypatch.setattr(ann_index, "IVF_AUTO_MIN_N", 200)
    monkeypatch.setattr(ann_index, "IVF_TARGET_LIST_SIZE", 25)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    small = [list(c) for c in CENTROIDS[:2]]
    path = str(tmp_path / "ivf")
    idx = IVFVectorIndex(spark, path, small, pq_codebooks=CODEBOOKS)
    idx.build(emb.where("vec_id < 80"))
    idx.append(emb.where("vec_id >= 80"))

    assert (
        idx.maybe_rebucket(stage_rows=200, recall_target=0.9) is False
    )  # plan
    man = _json.load(
        open(_os.path.join(path, ".rebucket", "manifest.json"))
    )
    serving = man["serving"]
    assert serving is not None and serving["n_probe"] >= 1
    assert serving["adc_shortlist"] is not None  # coded store
    assert 0.9 <= serving["recall"] <= 1.0
    # hints already persisted beside the NEW quantizer
    quant = _json.load(
        open(_os.path.join(path, "meta", f"quantizer-{man['new_md5']}.json"))
    )
    assert quant["n_probe"] == serving["n_probe"]
    assert quant["adc_shortlist"] == serving["adc_shortlist"]

    while not idx.maybe_rebucket(stage_rows=200, recall_target=0.9):
        pass  # stages + swap
    assert idx.rebucket_phase == "swap"
    assert idx.staged_serving == serving
    assert idx.n_probe_hint == serving["n_probe"]
    assert idx.adc_shortlist_hint == serving["adc_shortlist"]
    # open() serves the persisted hints
    re = IVFVectorIndex.open(spark, path)
    assert re.n_probe_hint == serving["n_probe"]
    assert re.adc_shortlist_hint == serving["adc_shortlist"]


def test_ivf_opq_rotated_store(spark, tmp_path):
    """r14: OPQ rotation as a first-class IVFVectorIndex capability.
    A store built with ``opq_rotation=R`` holds rotated vectors and
    rotates queries itself; it must be BIT-IDENTICAL to a plain
    store built over a pre-rotated corpus and probed with
    pre-rotated queries — for probe, probe_adc, across append, and
    through the open() round-trip (plain reopen refuses via the meta
    fingerprint); probe_local rotates the single query through the
    same float32 round-trip as the batch kernel."""
    import numpy as np
    import pytest

    from data_engineer_challenge_spark.operators.ann_index import (
        IVFVectorIndex,
    )
    from data_engineer_challenge_spark.operators.opq import (
        rotate_vectorized,
        sample_vectors,
        train_opq,
    )
    from data_engineer_challenge_spark.operators.similarity import (
        kmeans_centroids,
    )
    from data_engineer_challenge_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    scale = [float((i + 1) ** -0.7 * 4) for i in range(64)]
    corpus = emb.select(
        "vec_id",
        F.zip_with(
            "embedding",
            F.lit(scale).cast("array<float>"),
            lambda v, s: v * s,
        ).alias("embedding"),
    ).localCheckpoint()

    R, cbs = train_opq(
        sample_vectors(corpus, n=500), iters=3, inner_iters=3
    )
    rotated = rotate_vectorized(corpus, R).localCheckpoint()
    cents = kmeans_centroids(
        rotated.where("vec_id < 400"), k=8, iters=3, seed=42
    )

    a = IVFVectorIndex(
        spark,
        str(tmp_path / "rot"),
        cents,
        pq_codebooks=cbs,
        opq_rotation=R,
    )
    a.build(corpus.where("vec_id < 400"))
    b = IVFVectorIndex(
        spark, str(tmp_path / "plain"), cents, pq_codebooks=cbs
    )
    b.build(rotated.where("vec_id < 400"))

    qs_raw = corpus.where("vec_id % 100 = 3").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    qs_rot = rotated.where("vec_id % 100 = 3").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    def rows(idx, qs, method, **kw):
        return [
            tuple(r)
            for r in getattr(idx, method)(qs, k=5, **kw)
            .orderBy("q_id", "rank")
            .collect()
        ]

    # identity: rotated store + raw queries == plain store + rotated
    # queries, bit for bit, exact and coded paths
    assert rows(a, qs_raw, "probe", n_probe=8) == rows(
        b, qs_rot, "probe", n_probe=8
    )
    assert rows(a, qs_raw, "probe_adc", n_probe=8, shortlist=40) == rows(
        b, qs_rot, "probe_adc", n_probe=8, shortlist=40
    )

    # append keeps the identity
    a.append(corpus.where("vec_id >= 400"))
    b.append(rotated.where("vec_id >= 400"))
    assert rows(a, qs_raw, "probe_adc", n_probe=8, shortlist=40) == rows(
        b, qs_rot, "probe_adc", n_probe=8, shortlist=40
    )

    # open() restores the rotation; plain reopen refuses
    re = IVFVectorIndex.open(spark, str(tmp_path / "rot"))
    assert re.opq_rotation == a.opq_rotation
    assert rows(re, qs_raw, "probe", n_probe=8) == rows(
        a, qs_raw, "probe", n_probe=8
    )
    with pytest.raises(ValueError, match="was built with"):
        IVFVectorIndex(
            spark, str(tmp_path / "rot"), cents, pq_codebooks=cbs
        )

    # probe_local rotates the single query identically (decision
    # parity with probe_adc on one query)
    qrow = qs_raw.where("q_id = 3").first()
    want = [
        (r["c_id"], r["rank"])
        for r in a.probe_adc(
            qs_raw.where("q_id = 3"), k=5, n_probe=8, shortlist=40
        ).collect()
    ]
    got = [
        (cid, rank)
        for cid, _score, rank in a.probe_local(
            qrow["embedding"], k=5, n_probe=8, shortlist=40
        )
    ]
    assert got == sorted(want, key=lambda t: t[1])
