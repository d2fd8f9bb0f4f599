"""Multimodal (image) tier on the driver surface: BMP decode → dHash
→ banded hamming near-dup join under the driver's own hash (r14,
VERDICT r13 #1 — the codecs/dHash family was the only one with zero
registry presence).

The reference's binary-document ingestion class (reference
exo_2.py:38-56 — opaque bytes scanned from disk, decoded once, only
extracted features kept) is the pattern; images are its multimodal
twin. The fixture follows the ``warc_ingest_refresh`` precedent
(plans/crawl.py): payloads are synthesized DETERMINISTICALLY from
table integers so a DuckDB oracle can replay every stage in integer
arithmetic — the pixel grid, the luma neighbor-compare bits, the
16-bit band keys, and the exact hamming verify.

Why the oracle is exact and not approximate: each image is an 8×9
grayscale grid (R=G=B), so ``codecs.dhash64``'s pipeline collapses to
integer comparisons — luma ``0.299v+0.587v+0.114v`` is monotone in the
single channel value (equal ints → bit-equal floats; different ints →
difference ≥ ~0.999, five orders above float64 rounding), and
``resize_nearest(·, 8, 9)`` of an 8×9 input is the identity
(``arange(8)*8//8`` and ``arange(9)*9//9`` are both identity maps).
The SQL therefore compares the generating integers directly and packs
the same 64 bits the decoder produces from the BMP bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from ..parallelism import spread
from . import register

#: fixture classes — doc_id % 2 == 0 → base image (media_id =
#: doc_id); doc_id % 10 == 0 additionally gets a perturbed TWIN
#: (media_id = doc_id + _TWIN_OFFSET) whose single changed pixel
#: flips ≤ 2 of the 64 dHash bits, so the 4×16-bit pigeonhole
#: GUARANTEES a band match and the pair lands in the output with
#: hamming ≤ 2. doc_id < _CAP bounds the fixture at any sf.
_CAP = 6000
_TWIN_OFFSET = 10_000_000
_MAX_HAMMING = 10
#: the perturbed pixel: raveled index 31 = (row 3, col 4) — interior,
#: so it touches exactly the two comparisons (3,3)→(3,4) and
#: (3,4)→(3,5)
_PERT_K = 31
_PERT_DELTA = 96
#: pixel value modulus — prime and < 256 so values are valid uint8
#: and the quadratic mix below doesn't collapse to ``src mod 256``
#: residue classes (a LINEAR formula mod 256 would make every pair of
#: sources 256 apart pixel-identical)
_PIX_MOD = 251


#: pixel value at raveled position k (= r*9 + c) of source image
#: src: the quadratic integer mix (13·src² + 7·src·(k+1) + 5k² + 3k
#: + 1) mod _PIX_MOD — max term 13·5999² ≈ 4.7e8, no overflow on
#: either engine. The formula is inlined at BOTH of its two
#: consumers (the synth kernel's numpy and the oracle's BIGINT SQL);
#: keep them in sync when touching either.


@register(
    "image_dhash_neardup",
    # r14: the multimodal tier's first registry row (VERDICT r13 #1).
    # The build session put it on the driver surface in
    # docs_simhash_neardup's slot; the optimization round froze the
    # declared surface at CORRECTNESS_r13's set, so it ships
    # driver=False — still exactly oracle-checked by the pytest
    # harness (tests/test_queries_vs_oracle.py over the full registry).
    driver=False,
    oracle=f"""
    WITH ids AS (
        SELECT doc_id AS src FROM documents
        WHERE doc_id % 2 = 0 AND doc_id < {_CAP}
    ),
    imgs AS (
        SELECT src, src AS media_id, FALSE AS twin FROM ids
        UNION ALL
        SELECT src, src + {_TWIN_OFFSET} AS media_id, TRUE AS twin
        FROM ids WHERE src % 10 = 0
    ),
    px AS (
        SELECT i.media_id, k.k // 9 AS r, k.k % 9 AS c,
               CASE WHEN i.twin AND k.k = {_PERT_K}
                    THEN ((13*i.src*i.src + 7*i.src*(k.k+1)
                           + 5*k.k*k.k + 3*k.k + 1) % {_PIX_MOD}
                          + {_PERT_DELTA}) % {_PIX_MOD}
                    ELSE (13*i.src*i.src + 7*i.src*(k.k+1)
                          + 5*k.k*k.k + 3*k.k + 1) % {_PIX_MOD}
               END AS v
        FROM imgs i, (SELECT unnest(range(0, 72)) AS k) k
    ),
    bits AS (
        -- dhash64 packs ravel index i at bit position 63-i; the bit
        -- at (r, c) is (pixel(r, c+1) > pixel(r, c)) for c in 0..7
        SELECT a.media_id, 63 - (a.r * 8 + a.c) AS bitpos,
               CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        FROM px a JOIN px b
          ON b.media_id = a.media_id AND b.r = a.r AND b.c = a.c + 1
        WHERE a.c < 8
    ),
    bands AS (
        -- band i = (hash >>> 16i) & 0xFFFF, rebuilt bit-by-bit so no
        -- signed-shift edge case at bit 63
        SELECT media_id, bitpos // 16 AS band,
               SUM(bit * (CAST(1 AS BIGINT) << (bitpos % 16))) AS bh
        FROM bits GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.media_id < b.media_id
    )
    SELECT c.id_a, c.id_b,
           CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INTEGER)
               AS hamming
    FROM cand c
    JOIN bits x ON x.media_id = c.id_a
    JOIN bits y ON y.media_id = c.id_b AND y.bitpos = x.bitpos
    GROUP BY c.id_a, c.id_b
    HAVING SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= {_MAX_HAMMING}
    """,
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs under the hash check: synthesize
    one 8×9 grayscale BMP per selected document id (plus a
    one-pixel-perturbed twin per tenth id), run the REAL multimodal
    chain — ``codecs.decode_bmp`` → ``codecs.dhash64`` → 4×16-bit band
    join → exact hamming verify (``operators/multimodal.
    image_neardup_pairs``) — and match the oracle's integer replay of
    the pixel math.

    What the hash proves end to end: the BMP container round-trip
    (bottom-up BGR rows, row padding), the dHash bit packing (ravel
    order, sign bit = bit 63, signed-long masking), the
    ``shiftrightunsigned`` band extraction, the banded candidate
    equi-join, and ``bit_count``-XOR hamming verification. Every twin
    pair is guaranteed out (≤ 2 flipped bits ⇒ pigeonhole band match);
    any accidental band collision is verified identically on both
    engines, so the result is deterministic, not probabilistic.

    Scale shape: payload synthesis and decode+hash are both map-only
    Arrow passes — image BYTES never shuffle, only the 8-byte hash
    enters the band join (the text SimHash tier's exact shape, shared
    banding code). Candidates come from the 16-bit-band equi-join,
    never an all-pairs cross."""
    import numpy as np

    from ..operators.codecs import encode_bmp
    from ..operators.multimodal import image_neardup_pairs

    ids = (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < _CAP))
        .select(F.col("doc_id").alias("src"))
    )
    spec = ids.select(
        F.col("src").alias("media_id"), "src", F.lit(False).alias("twin")
    ).unionByName(
        ids.where(F.col("src") % 10 == 0).select(
            (F.col("src") + _TWIN_OFFSET).alias("media_id"),
            "src",
            F.lit(True).alias("twin"),
        )
    )

    ks = np.arange(72, dtype=np.int64)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for src, twin in zip(pdf["src"], pdf["twin"]):
                v = (
                    13 * int(src) * int(src)
                    + 7 * int(src) * (ks + 1)
                    + 5 * ks * ks
                    + 3 * ks
                    + 1
                ) % _PIX_MOD
                if twin:
                    v[_PERT_K] = (v[_PERT_K] + _PERT_DELTA) % _PIX_MOD
                img = np.repeat(
                    v.reshape(8, 9, 1).astype(np.uint8), 3, axis=2
                )
                payloads.append(encode_bmp(img))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = (
        spread(spec, "media_id")
        .mapInPandas(synth, schema="media_id long, payload binary")
        .withColumn("kind", F.lit("image"))
        .withColumn("meta", F.struct(F.lit("image/bmp").alias("mime")))
    )
    return image_neardup_pairs(media, max_hamming=_MAX_HAMMING)
