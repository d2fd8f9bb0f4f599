"""Pure-stdlib media codecs for the multimodal tier (SURVEY §2.10).

The container ships no Pillow/ffmpeg/librosa, but four formats need
no external library at all: BMP (24/32-bit, 8-bit palette, RLE8) and
binary PPM images (8- and 16-bit, struct + numpy), PNG (the DEFLATE
stream is stdlib ``zlib``; the five scanline filters are plain
arithmetic; Adam7 interlace deinterlaced per spec), and PCM WAV audio
(the stdlib ``wave`` module). These make the multimodal pipeline genuinely
runnable end-to-end, and JPEG (baseline AND progressive Huffman DCT)
decodes natively via the from-spec codec in ``operators/jpeg.py``.
The remaining compressed formats (arithmetic-coded JPEG, MP3, H.264)
stay the documented injection seam — :func:`stdlib_decode` raises
``NotImplementedError`` for them exactly like the bare seam did for
everything.

All features are deterministic arithmetic over the decoded samples, so
tests assert exact values (a solid-color image's channel mean IS the
color).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

FEATURE_DIM = 16


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP → (h, w, 3) uint8 RGB array: uncompressed 24/32-bit,
    uncompressed 8-bit palette, and RLE8-compressed 8-bit palette
    (BI_RLE8 per the public format spec: count/value pairs plus the
    0-count escapes — end-of-line, end-of-bitmap, delta, absolute
    run padded to a word boundary)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<iiihhI", data, 14
    )
    bottom_up = h > 0
    h = abs(h)
    if bpp == 8 and comp in (0, 1):
        (clr_used,) = struct.unpack_from("<I", data, 46)
        n_pal = clr_used or 256
        pal = np.frombuffer(
            data, np.uint8, n_pal * 4, 14 + hdr_size
        ).reshape(n_pal, 4)[:, 2::-1]  # BGRA entries → RGB
        if comp == 0:
            row_size = (w + 3) // 4 * 4
            rows = np.frombuffer(
                data, np.uint8, row_size * h, pix_off
            ).reshape(h, row_size)
            idx = rows[:, :w]
        else:
            idx = _bmp_rle8(data, pix_off, w, h)
        if bottom_up:
            idx = idx[::-1]
        return np.ascontiguousarray(pal[idx])
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    bytes_px = bpp // 8
    row_size = (bytes_px * w + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8, row_size * h, pix_off).reshape(h, row_size)
    px = rows[:, : w * bytes_px].reshape(h, w, bytes_px)
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px[..., 2::-1])  # BGR(A) → RGB


def _bmp_rle8(data: bytes, pos: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 → (h, w) palette-index array (rows in STORED order —
    the caller applies the bottom-up flip). Unwritten pixels are 0
    (the spec leaves delta-skipped cells undefined; 0 is the common
    renderer choice)."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            end = min(x + cnt, w)
            if y < h:
                out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated BMP RLE8 delta")
            x, y = x + data[pos], y + data[pos + 1]
            pos += 2
        else:  # absolute run of `val` raw indices, word-aligned
            if pos + val > n:
                raise ValueError("truncated BMP RLE8 absolute run")
            run = np.frombuffer(data, np.uint8, val, pos)
            end = min(x + val, w)
            if y < h:
                out[y, x:end] = run[: end - x]
            x = end
            pos += val + (val & 1)  # pad to word boundary
    return out


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 RGB array."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' comments run to end of line
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    pos += 1  # single whitespace after maxval
    if maxval > 255:
        # 2-byte samples, MSB first (the spec's "most significant
        # byte first"); scale to 8-bit with correct rounding
        raw = np.frombuffer(data, ">u2", w * h * 3, pos).astype(np.uint32)
        scaled = (raw * 255 + maxval // 2) // maxval
        return scaled.astype(np.uint8).reshape(h, w, 3)
    return np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → channels at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB array, pure stdlib.

    Covers the common profile: bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline
    filters, non-interlaced AND Adam7-interlaced (each pass is an
    independently-filtered sub-image scattered into the full grid).
    The IDAT payload is stdlib ``zlib``; unfiltering is exact integer
    arithmetic, so the decode is bit-exact — a PNG and BMP of the same
    pixels produce the identical feature vector / dHash (tested).
    Alpha is dropped (features/dHash are luma-driven); 16-bit files
    raise ``NotImplementedError`` and fall to the injection seam."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    plte: np.ndarray | None = None
    w = h = depth = ctype = interlace = 0
    seen_ihdr = False
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            seen_ihdr = True
        elif ctag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
    if not seen_ihdr:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported")
    nch = _PNG_CHANNELS.get(ctype)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:  # truncated/corrupt IDAT -> the contract
        raise ValueError(f"PNG IDAT stream corrupt: {ex}") from None
    if interlace:
        px = _png_adam7(raw, w, h, nch)
    else:
        if len(raw) != (w * nch + 1) * h:
            raise ValueError("PNG pixel data size mismatch")
        out, _ = _png_unfilter(raw, 0, w, h, nch)
        px = out.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return np.ascontiguousarray(plte[px[..., 0]])
    if nch == 1 or ctype == 4:  # gray / gray+alpha → replicate luma
        return np.ascontiguousarray(np.repeat(px[..., :1], 3, axis=2))
    return np.ascontiguousarray(px[..., :3])  # RGB / RGBA (alpha dropped)


#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2 — the
#: seven passes partition the pixel grid exactly)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_adam7(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    """Adam7 deinterlace: each pass is an independently-filtered
    sub-image (its scanline filters reference the PASS's own previous
    row/left pixel, per the spec); unfilter each and scatter into the
    full grid."""
    px = np.zeros((h, w, nch), np.uint8)
    rpos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes zero bytes
        sub, rpos = _png_unfilter(raw, rpos, pw, ph, nch)
        px[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
    if rpos != len(raw):
        raise ValueError("PNG pixel data size mismatch")
    return px


def _png_unfilter(
    raw: bytes, rpos: int, w: int, h: int, nch: int
) -> tuple[np.ndarray, int]:
    """Undo the five PNG scanline filters over one (sub-)image of
    ``h`` rows of ``w`` pixels; returns the (h, w*nch) byte grid and
    the cursor past the consumed scanlines."""
    stride = w * nch
    if len(raw) - rpos < (stride + 1) * h:
        raise ValueError("PNG pixel data size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    bpp = nch  # bytes per complete pixel at depth 8
    for y in range(h):
        ftype = raw[rpos]
        line = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int64)
        rpos += stride + 1
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-channel cumulative sum mod 256
            cur = line.reshape(w, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif ftype in (3, 4):  # Average/Paeth — sequential in x
            # (depends on the current row's unfiltered left neighbor,
            # so no cumsum trick applies). Plain-Python lists: per-
            # element numpy indexing is ~5-10x slower than int math on
            # lists, and this loop is the decode seam's hot path. A
            # Paeth-heavy production corpus (libpng's default filter)
            # still wants an injected Pillow decoder — documented.
            cl = line.tolist()
            pl = prev.tolist()
            if ftype == 3:
                for x in range(stride):
                    left = cl[x - bpp] if x >= bpp else 0
                    cl[x] = (cl[x] + ((left + pl[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = cl[x - bpp] if x >= bpp else 0
                    up = pl[x]
                    upleft = pl[x - bpp] if x >= bpp else 0
                    p = left + up - upleft
                    pa = p - left if p >= left else left - p
                    pb = p - up if p >= up else up - p
                    pc = p - upleft if p >= upleft else upleft - p
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = upleft
                    cl[x] = (cl[x] + pred) & 0xFF
            cur = np.asarray(cl, np.int64)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, rpos


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit truecolor PNG bytes (round-trip
    partner of :func:`decode_png`; also the test-fixture generator).
    ``filter_type`` selects the scanline filter applied to EVERY row
    (0-4) so tests can exercise each unfilter path — residuals are
    computed vectorized from the unfiltered pixels."""
    if filter_type not in range(5):
        raise ValueError(f"filter_type {filter_type} out of range")
    h, w = img.shape[:2]
    stride = w * 3
    arr = img.reshape(h, stride).astype(np.int64)
    zeros = np.zeros(3, np.int64)
    lines = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        line = arr[y]
        left = np.concatenate([zeros, line[:-3]])
        upleft = np.concatenate([zeros, prev[:-3]])
        if filter_type == 0:
            res = line
        elif filter_type == 1:
            res = line - left
        elif filter_type == 2:
            res = line - prev
        elif filter_type == 3:
            res = line - ((left + prev) >> 1)
        else:  # Paeth, vectorized predictor
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            res = line - pred
        lines.append(bytes([filter_type]) + (res & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV → (sample_rate, mono float64 samples in [-1, 1])."""
    with wave.open(io.BytesIO(data)) as wf:
        rate = wf.getframerate()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    a = np.frombuffer(raw, dtype).astype(np.float64).reshape(-1, ch).mean(axis=1)
    if sw == 1:
        a = (a - 128.0) / 128.0
    else:
        a = a / float(1 << (8 * sw - 1))
    return rate, a


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — the deterministic, library-free
    downsample for thumbnailing / fixed-grid features."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def image_features(img: np.ndarray) -> list[float]:
    """16-dim deterministic feature vector: per-channel mean (3) and
    std (3), a 3×3 luma grid (9), aspect ratio (1).

    Means, stds and aspect are computed on the ORIGINAL image; only
    the 3×3 luma grid sees a nearest-neighbor upsample for sub-3 px
    inputs — ``np.array_split`` would otherwise yield empty chunks
    whose mean is NaN, silently poisoning any downstream cosine math
    (and upsampling duplicates rows unevenly, which would bias the
    global stats). Features are always finite (tested)."""
    aspect = img.shape[1] / img.shape[0]
    f = img.astype(np.float64) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    grid_img = img
    if img.shape[0] < 3 or img.shape[1] < 3:
        grid_img = resize_nearest(img, max(3, img.shape[0]), max(3, img.shape[1]))
    g = grid_img.astype(np.float64) / 255.0
    luma = 0.299 * g[..., 0] + 0.587 * g[..., 1] + 0.114 * g[..., 2]
    cells = [
        float(c.mean())
        for row in np.array_split(luma, 3, axis=0)
        for c in np.array_split(row, 3, axis=1)
    ]
    return [*means.tolist(), *stds.tolist(), *cells, float(aspect)]


def audio_features(rate: int, samples: np.ndarray) -> list[float]:
    """16-dim deterministic feature vector: duration (1), overall RMS
    (1), zero-crossing rate (1), 13 windowed RMS values."""
    duration = len(samples) / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    zcr = (
        float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
        if len(samples) > 1
        else 0.0
    )
    windows = [
        float(np.sqrt(np.mean(w**2))) if len(w) else 0.0
        for w in np.array_split(samples, 13)
    ]
    return [duration, rms, zcr, *windows]


def stdlib_decode(payload: bytes, kind: str) -> list[float]:
    """DecodeFn over the formats this environment can honestly decode:
    BMP/PPM/PNG images, baseline + progressive Huffman JPEG, PCM WAV
    audio. Anything else (arithmetic-coded JPEG, MP3, video codecs)
    raises ``NotImplementedError`` — that part of the seam still wants
    an injected Pillow/ffmpeg-backed callable."""
    if payload[:2] == b"BM":
        return image_features(decode_bmp(payload))
    if payload[:2] == b"P6":
        return image_features(decode_ppm(payload))
    if payload[:8] == _PNG_SIG:
        return image_features(decode_png(payload))
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return image_features(decode_jpeg(payload))
    if payload[:4] == b"RIFF":
        return audio_features(*decode_wav(payload))
    raise NotImplementedError(
        f"no stdlib codec for kind={kind!r} magic={payload[:4]!r} — "
        "inject a DecodeFn for compressed formats"
    )


def spectral_landmarks(
    rate: int,
    samples: np.ndarray,
    frame: int = 512,
    hop: int = 256,
    bands: int = 6,
    fan_out: int = 3,
    max_dt: int = 8,
) -> list[tuple[int, int]]:
    """Shazam-style constellation fingerprint: ``[(landmark_hash, t)]``.

    STFT (Hann window, numpy rfft) → per frame, the argmax bin in each
    of ``bands`` geometric frequency bands, kept only where it rises
    above the frame's mean magnitude (a flat/noisy band yields no
    peak) → each peak anchors up to ``fan_out`` landmark pairs with
    peaks in the next ``max_dt`` frames, hashed as
    ``(f1, f2, dt)`` packed into one int. Every step is deterministic
    arithmetic — same payload, same landmarks, any engine.

    The property downstream matching relies on (Wang 2003): a copy of
    the audio — rescaled in amplitude, mildly noisy, or time-shifted
    by whole hops — reproduces largely the SAME hashes at a CONSTANT
    frame offset, so true matches concentrate their join hits at one
    ``dt`` while chance collisions scatter."""
    if len(samples) < frame:
        return []
    n = (len(samples) - frame) // hop + 1
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(samples[idx] * win, axis=1))
    nbins = spec.shape[1]
    edges = np.unique(
        np.round(np.geomspace(1, nbins - 1, bands + 1)).astype(np.int64)
    )
    peaks_by_frame: list[list[int]] = []
    for t in range(n):
        row = spec[t]
        thresh = row.mean()
        frame_peaks = []
        for b in range(len(edges) - 1):
            lo, hi = int(edges[b]), int(edges[b + 1])
            j = lo + int(np.argmax(row[lo:hi]))
            if row[j] > thresh:
                frame_peaks.append(j)
        peaks_by_frame.append(frame_peaks)
    out: list[tuple[int, int]] = []
    for t, anchors in enumerate(peaks_by_frame):
        for f1 in anchors:
            paired = 0
            for dt in range(1, max_dt + 1):
                if t + dt >= n or paired >= fan_out:
                    break
                for f2 in peaks_by_frame[t + dt]:
                    if paired >= fan_out:
                        break
                    out.append(((f1 * nbins + f2) * (max_dt + 1) + dt, t))
                    paired += 1
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (round-trip partner of
    :func:`decode_bmp`; also the test-fixture generator)."""
    h, w = img.shape[:2]
    row_size = (3 * w + 3) // 4 * 4
    pix = np.zeros((h, row_size), dtype=np.uint8)
    pix[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    data = pix.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<iiihhIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): grayscale → 8×9 nearest-neighbor
    thumbnail → one bit per adjacent-column luma comparison. The
    classic perceptual fingerprint: stable under re-encoding, resizing
    and small edits, so near-identical images land within a few
    hamming bits — the image-side analogue of SimHash for text.
    Returns a non-negative int in [0, 2^64) stored as a Python int
    (callers narrow to Spark long via two 32-bit halves or by masking
    into the signed range)."""
    f = img.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    small = resize_nearest(luma, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out
