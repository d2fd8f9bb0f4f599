"""Multimodal (image/audio/video) column operators (driver north star;
generalizes the binary-document source, SURVEY §2.1 S2-S4).

Media are opaque ``binary`` columns plus a typed metadata struct; the
Spark-side plumbing — schema, Arrow batch shape, partition sizing — is
real and tested. The default codec is ``operators.codecs.stdlib_decode``:
genuinely decodes uncompressed BMP/PPM images and PCM WAV audio with
zero external dependencies (struct + numpy + the stdlib ``wave``
module), and raises ``NotImplementedError`` for compressed formats —
that remaining seam is where a production deployment injects a
Pillow/ffmpeg-backed callable (tests also exercise injected fakes).

Scale shape: decode/feature steps run via ``mapInPandas`` so one Arrow
batch of binary payloads crosses to Python per partition; outputs drop
the payload column immediately so raw bytes never shuffle. Batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB media set it low (e.g. 32) to cap executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# (payload bytes, kind) -> fixed-length feature vector
DecodeFn = Callable[[bytes, str], list[float]]


def _default_decoder(payload: bytes, kind: str) -> list[float]:
    from .codecs import stdlib_decode

    return stdlib_decode(payload, kind)


def extract_features(
    media: DataFrame,
    decode: DecodeFn = _default_decoder,
    feature_dim: int = 16,
) -> DataFrame:
    """media rows → (media_id, kind, feature array<float>).

    The payload column is dropped inside the UDF output, so only the
    small feature vectors flow downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(payload, kind)
                for payload, kind in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, features array<float>"
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    decode_frame: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video → one row per sampled frame timestamp.

    Timestamp fan-out is pure Spark (sequence + explode on metadata —
    no Python, no payload movement); only the per-frame decode crosses
    to Python, and only when a decoder is injected.
    """
    # endpoint EXCLUSIVE: a 5000 ms clip sampled every 1000 ms has
    # frames at 0..4000 — a timestamp at exactly duration_ms is out of
    # range for a real decoder (ffmpeg seek at t == duration fails).
    # Zero/absent durations yield NO frames (the naive sequence(0, -1)
    # would generate a DESCENDING range, not an empty one).
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    ts = F.when(
        dur > 0, F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
    ).otherwise(F.array().cast("array<int>"))
    frames = (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", F.explode(ts).alias("frame_ms"))
    )
    if decode_frame is None:
        return frames.select("media_id", "frame_ms")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                decode_frame(payload, int(ms))
                for payload, ms in zip(pdf["payload"], pdf["frame_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "frame": out,
                }
            )

    return frames.mapInPandas(run, schema="media_id long, frame_ms int, frame binary")


def media_profile(media: DataFrame) -> DataFrame:
    """Corpus profile from metadata + payload sizes (no decode; the
    only payload access is ``length``)."""
    return media.groupBy("kind", F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )


def _decode_image(payload: bytes, mime: str | None):
    from . import codecs

    if payload[:2] == b"BM":
        return codecs.decode_bmp(payload)
    if payload[:2] == b"P6":
        return codecs.decode_ppm(payload)
    if payload[:8] == codecs._PNG_SIG:
        return codecs.decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(f"image codec for {mime!r} not built in")


def image_dhash(
    media: DataFrame,
    decode_image: Callable[[bytes, str | None], "object"] | None = None,
) -> DataFrame:
    """Per-image 64-bit perceptual dHash (``codecs.dhash64``):
    ``(media_id, dhash)``, map-only — decode happens once per payload
    inside an Arrow batch and only the 8-byte hash leaves Python, so
    raw image bytes never shuffle. ``decode_image`` is the injectable
    codec seam (default: the stdlib BMP/PPM decoders); the hash is
    masked into Spark's signed long range (sign bit = bit 63), exactly
    like the text SimHash's bit-63 handling."""
    dec = decode_image or _decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import dhash64

        for pdf in batches:
            hs = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                h = dhash64(dec(payload, mime))
                hs.append(h - (1 << 64) if h >= 1 << 63 else h)
            yield pd.DataFrame({"media_id": pdf["media_id"], "dhash": hs})

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", F.col("meta.mime").alias("mime")
    )
    return imgs.mapInPandas(run, schema="media_id long, dhash long")


def image_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 10,
    decode_image: Callable[[bytes, str | None], "object"] | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash + the same 4×16-bit
    band-blocking the text SimHash tier uses (pigeonhole: hamming ≤ 3
    guarantees an exact band match; up to ``max_hamming`` is caught
    with high probability), exact hamming verification on candidates.
    Candidates come from a band equi-join of 8-byte hashes — image
    bytes are touched exactly once, in the map-only hash pass."""
    from .text_dedup import _CACHED_FRAMES, hamming64

    # cache before the self-join: left/right re-alias the frame, so
    # Catalyst cannot reuse the exchange and the Python decode+hash
    # pass would run TWICE per call (same measured trap the text
    # simhash/minhash siblings cache around); released via
    # text_dedup.release_cached, same lifetime contract
    hs = image_dhash(media, decode_image=decode_image).cache()
    _CACHED_FRAMES.append(hs)
    bands = hs.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), 16 * i)
                        .bitwiseAND(F.lit((1 << 16) - 1))
                        .alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "dhash", "b.band", "b.bh")
    left = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("dhash").alias("__ha"),
        "band",
        "bh",
    )
    right = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("dhash").alias("__hb"),
        "band",
        "bh",
    )
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("__ha"), F.col("__hb")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _decode_audio(payload: bytes, mime: str | None):
    from . import codecs

    if payload[:4] == b"RIFF":
        return codecs.decode_wav(payload)
    raise NotImplementedError(f"audio codec for {mime!r} not built in")


def audio_landmarks(
    media: DataFrame,
    decode_audio: Callable[[bytes, str | None], "object"] | None = None,
) -> DataFrame:
    """Per-audio-item constellation fingerprints
    (``codecs.spectral_landmarks``): ``(media_id, lmhash, t)`` — one
    row per landmark, map-only. Decode + STFT happen once per payload
    inside an Arrow batch; only (long, int) landmark rows leave
    Python, so raw audio bytes never shuffle. ``decode_audio`` is the
    injectable codec seam (default: the stdlib PCM WAV decoder)."""
    dec = decode_audio or _decode_audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import spectral_landmarks

        for pdf in batches:
            ids, hs, ts = [], [], []
            for mid, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                rate, samples = dec(payload, mime)
                for h, t in spectral_landmarks(rate, samples):
                    ids.append(mid)
                    hs.append(h)
                    ts.append(t)
            yield pd.DataFrame({"media_id": ids, "lmhash": hs, "t": ts})

    auds = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", F.col("meta.mime").alias("mime")
    )
    return auds.mapInPandas(run, schema="media_id long, lmhash long, t int")


def audio_match_pairs(
    media: DataFrame,
    min_votes: int = 16,
    max_hash_freq: int = 64,
    decode_audio: Callable[[bytes, str | None], "object"] | None = None,
) -> DataFrame:
    """Audio near-duplicate / containment matching (Wang 2003): pairs
    of audio items sharing ``min_votes``+ landmark hashes at ONE
    consistent time offset — ``(id_a, id_b, votes, offset_frames)``.

    The offset-histogram vote is what separates a true match from
    chance hash collisions: a re-encoded / amplitude-scaled /
    time-shifted copy reproduces the same (f1, f2, dt) hashes
    displaced by a constant frame offset, so its join hits pile onto
    one ``(pair, offset)`` cell, while collisions spread thin.

    Scale shape: candidates come from an equi-join on ``lmhash``
    carrying only (media_id, t) — the audio-domain twin of the
    winnowing fingerprint-overlap join — with over-common hashes
    (> ``max_hash_freq`` occurrences: silence, codec artifacts —
    the audio analogue of boilerplate shingles) dropped BEFORE the
    join, capping any single hash's join fan-out."""
    from .text_dedup import _CACHED_FRAMES

    lm = audio_landmarks(media, decode_audio=decode_audio).cache()
    _CACHED_FRAMES.append(lm)
    rare = lm.groupBy("lmhash").agg(F.count(F.lit(1)).alias("__n")).where(
        F.col("__n") <= max_hash_freq
    )
    lm = lm.join(rare.select("lmhash"), "lmhash")
    left = lm.select(
        "lmhash", F.col("media_id").alias("id_a"), F.col("t").alias("ta")
    )
    right = lm.select(
        "lmhash", F.col("media_id").alias("id_b"), F.col("t").alias("tb")
    )
    votes = (
        left.join(right, "lmhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("ta") - F.col("tb")).alias("offset_frames"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("votes").desc(), F.col("offset_frames")
    )
    return (
        votes.withColumn("__rk", F.row_number().over(best))
        .where((F.col("__rk") == 1) & (F.col("votes") >= min_votes))
        .select("id_a", "id_b", "votes", "offset_frames")
    )
