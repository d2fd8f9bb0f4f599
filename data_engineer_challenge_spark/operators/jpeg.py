"""Pure-stdlib baseline JPEG codec (ITU-T T.81, public spec).

Closes the last injection seam the multimodal tier carried: BMP/PPM/
PNG/WAV already decode natively (operators/codecs.py); JPEG — the
format most real image corpora actually hold — previously required an
injected Pillow-backed callable. This module implements the baseline
sequential DCT process from the public specification: segment parsing
(DQT/SOF0/DHT/DRI/SOS), canonical Huffman decoding, run-length AC
expansion, dequantization, 8×8 inverse DCT (a precomputed separable
transform matrix — two numpy matmuls per block), chroma upsampling for
4:2:0/4:2:2/4:4:4 sampling, restart-marker resync, and JFIF YCbCr→RGB.
Progressive (SOF2) and arithmetic-coded streams raise
``NotImplementedError`` and fall back to the injection seam, exactly
like the unsupported PNG/BMP variants do.

The encoder exists so the codec is testable without third-party
libraries (the same posture as ``encode_png``/``encode_bmp``): 4:4:4
baseline, Annex-K-style quality-scaled quantization tables, and
SELF-DEFINED fixed-length Huffman tables (5-bit DC / 8-bit AC codes —
legal per the spec, since the tables travel in DHT segments; chosen
over the published "typical" tables so no 162-entry constant needs
transcribing, at a compression-ratio cost irrelevant to tests). The
correctness tests do NOT rely on encode/decode bug-cancelling: the
test suite hand-crafts bitstreams byte-by-byte from the spec (DC-only
blocks whose IDCT is a known flat value) and asserts exact pixels.

Scale posture: decoding runs inside the Arrow ``mapInPandas`` batch
kernels (operators/multimodal.py) — per-file Python cost, zero
shuffle; at 100 TB the binary payloads never leave their scan tasks.

Reference scope: the reference engine has no media tier at all; this
backs the multimodal columns SURVEY.md §2 extends the engine with.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- DCT

_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

#: Annex K Table K.1/K.2 luminance/chrominance quantization tables
#: (public spec constants), natural row order.
_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# ------------------------------------------------------------ decoder


class _BitReader:
    """MSB-first bit reader over one entropy-coded interval (stuffing
    already stripped)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("JPEG scan truncated")
        v = 0
        for b in self.bits[p : p + n]:
            v = (v << 1) | int(b)
        self.pos = p + n
        return v


def _build_huff(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s low-order bits to a signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split entropy-coded data at restart markers, stripping 0xFF00
    byte stuffing; returns the intervals plus the trailing marker's
    offset."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: interval boundary
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB. Grayscale replicates to
    three channels (the ``decode_png`` convention).

    Error contract: corrupt or truncated streams raise ``ValueError``
    (unsupported-but-valid processes raise ``NotImplementedError``) —
    a real corpus always contains truncated files, and the batch
    kernels screen for exactly these two types; a leaked
    ``IndexError``/``struct.error`` would fail the whole Spark stage."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as ex:
        raise ValueError(f"truncated or corrupt JPEG: {ex}") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, comps) with comps = [(id, hi, vi, tq)]
    restart = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        while data[i + 1] == 0xFF:  # optional fill bytes before marker
            i += 1
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length field
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = vals  # stored zigzag -> natural order
                qt[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline huffman
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "Huffman (SOF0/SOF1) is built in — inject a decoder "
                "for progressive/arithmetic streams"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17 : p + 17 + nsym]
                (huff_ac if tc else huff_dc)[th] = _build_huff(
                    counts, symbols
                )
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                scan_tables[cs] = (td, ta)
            intervals, i = _split_scan(data, i)
            return _decode_scan(
                frame, qt, huff_dc, huff_ac, scan_tables,
                intervals, restart,
            )
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, qt, huff_dc, huff_ac, scan_tables,
                 intervals, restart) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for cid, hi, vi, _ in comps
    }
    n_mcu = mcux * mcuy
    per_interval = restart if restart else n_mcu
    mcu = 0
    for interval in intervals:
        if mcu >= n_mcu:
            break
        reader = _BitReader(interval)
        preds = {cid: 0 for cid, *_ in comps}  # DC resets per interval
        for _ in range(min(per_interval, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, hi, vi, tq_id in comps:
                td, ta = scan_tables[cid]
                dct, act = huff_dc[td], huff_ac[ta]
                q = qt[tq_id]
                for by in range(vi):
                    for bx in range(hi):
                        coefs = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(reader, dct)
                        preds[cid] += _extend(reader.read(s), s)
                        coefs[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC overrun")
                            coefs[k] = _extend(reader.read(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coefs  # dezigzag
                        block = block.reshape(8, 8) * q
                        px = _idct2(block) + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1
    # upsample each component to full-resolution grid, crop to (h, w)
    chans = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
            )
        chans.append(p[:h, :w])
    if len(chans) == 1:
        g = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    if len(chans) != 3:
        raise NotImplementedError(
            f"JPEG with {len(chans)} components unsupported"
        )
    y, cb, cr = chans[0], chans[1] - 128.0, chans[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _fixed_tables() -> tuple[list[int], bytes, list[int], bytes,
                             dict, dict]:
    """Self-defined fixed-length code tables (module docstring): DC
    categories 0..11 as canonical 5-bit codes, every valid AC (run,
    size) symbol as a canonical 8-bit code. Neither set reaches the
    all-ones code of its length."""
    dc_counts = [0] * 16
    dc_counts[4] = 12  # twelve 5-bit codes
    dc_syms = bytes(range(12))
    dc_enc = {s: (5, c) for c, s in enumerate(dc_syms)}
    ac_list = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_list)  # 162 8-bit codes
    ac_syms = bytes(ac_list)
    ac_enc = {s: (8, c) for c, s in enumerate(ac_list)}
    return dc_counts, dc_syms, ac_counts, ac_syms, dc_enc, ac_enc


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return (
        np.clip((base * s + 50) // 100, 1, 255)
        .astype(np.int32)
        .reshape(8, 8)
    )


def _encode_block(writer, block, q, pred, dc_enc, ac_enc) -> int:
    coefs = np.round(_fdct2(block.astype(np.float64) - 128.0) / q)
    coefs = coefs.astype(np.int64).reshape(64)[_ZIGZAG]  # zigzag order
    dc = int(coefs[0])
    diff = dc - pred
    s = _category(diff)
    ln, code = dc_enc[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_enc[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]
        writer.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Baseline 4:4:4 JPEG of an ``(H, W, 3)`` RGB or ``(H, W)``
    grayscale uint8 array."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        chans = [img.astype(np.float64)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        chans = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    qts = [_scaled_qt(_QT_LUM, quality)]
    if not gray:
        qts.append(_scaled_qt(_QT_CHROM, quality))
    dc_counts, dc_syms, ac_counts, ac_syms, dc_enc, ac_enc = (
        _fixed_tables()
    )
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for tq, q in enumerate(qts):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)  # natural->zigzag
        seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    writer = _BitWriter()
    by = -(-h // 8)
    bx = -(-w // 8)
    padded = []
    for ch in chans:
        p = np.empty((by * 8, bx * 8))
        p[:h, :w] = ch
        p[h:, :w] = ch[h - 1 : h, :]  # edge-replicate padding
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)
    preds = [0] * ncomp
    for y in range(by):
        for x in range(bx):
            for c in range(ncomp):
                q = qts[0 if c == 0 else 1]
                preds[c] = _encode_block(
                    writer,
                    padded[c][y * 8 : y * 8 + 8, x * 8 : x * 8 + 8],
                    q, preds[c], dc_enc, ac_enc,
                )
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
