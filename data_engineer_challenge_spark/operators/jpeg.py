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

Progressive DCT (SOF2, T.81 Annex G) decodes natively too: spectral
selection bands, successive approximation (DC first/refine, AC
first/refine with EOB-run accumulation and correction bits per
G.1.2.2-G.1.2.3), multi-scan coefficient accumulation, and one shared
batched reconstruction. Arithmetic-coded and lossless processes
(SOF3/5-7/9-11/13-15) raise ``NotImplementedError`` and fall back to
the injection seam, exactly like the unsupported PNG/BMP variants do.

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
    except (IndexError, KeyError, struct.error) as ex:
        raise ValueError(f"truncated or corrupt JPEG: {ex}") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (H, W, comps) with comps = [(id, hi, vi, tq)]
    progressive = False
    coefs: dict[int, np.ndarray] | None = None  # cid -> (BH, BW, 64)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only Huffman DCT processes "
                "(baseline SOF0/SOF1, progressive SOF2) are built in — "
                "inject a decoder for arithmetic/lossless streams"
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
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                scan_comps.append((cs, td, ta))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            approx = seg[3 + 2 * ns]
            ah, al = approx >> 4, approx & 15
            intervals, i = _split_scan(data, i)
            if not progressive:
                return _decode_scan(
                    frame, qt, huff_dc, huff_ac,
                    {cs: (td, ta) for cs, td, ta in scan_comps},
                    intervals, restart,
                )
            if coefs is None:
                coefs = _alloc_coefs(frame)
            _decode_prog_scan(
                frame, coefs, huff_dc, huff_ac, scan_comps,
                ss, se, ah, al, intervals, restart,
            )
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, qt, coefs)
    raise ValueError("JPEG has no scan data")


def _alloc_coefs(frame) -> dict[int, np.ndarray]:
    """Per-component coefficient accumulators for progressive scans,
    ZIGZAG order (band indices Ss..Se address zigzag positions), sized
    to the MCU-padded block grid so interleaved DC scans and
    non-interleaved AC scans address the same arrays."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return {
        cid: np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        for cid, hi, vi, _ in comps
    }


def _ac_first(reader, act, coef, ss, se, al, eobrun) -> int:
    """One block of an AC first scan (T.81 G.1.2.2): run-length +
    EOB-run decoding into the Ss..Se band, values shifted by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, act)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG AC overrun")
        coef[k] = _extend(reader.read(size), size) << al
        k += 1
    return 0


def _ac_refine(reader, act, coef, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (T.81 G.1.2.3): correction
    bits for already-nonzero coefficients, new ±1<<Al insertions after
    runs of zero-HISTORY positions, EOB-run bookkeeping."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, act)
            r, size = rs >> 4, rs & 15
            val = 0
            if size == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                # per G.1.2.3 size is always 1 in a refinement scan
                val = p1 if reader.read(1) else m1
            # advance over zero-history coefficients; already-nonzero
            # positions receive a correction bit and don't count
            while True:
                c = int(coef[k])
                if c != 0:
                    if reader.read(1) and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
                if k > se:
                    break
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        # inside an EOB run every remaining nonzero coefficient in
        # the band still carries one correction bit
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if reader.read(1) and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(frame, coefs, huff_dc, huff_ac, scan_comps,
                      ss, se, ah, al, intervals, restart) -> None:
    """Accumulate one progressive scan into the coefficient arrays.

    Interleaved scans (ns > 1, DC only per A.2.3) advance in MCU
    units; single-component scans advance over the component's own
    ceil(cw/8) x ceil(ch/8) block grid (A.2.2). Restart intervals
    count those units and reset DC predictors and the EOB run."""
    h, w, comps = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if len(scan_comps) > 1:
        if ss != 0:
            raise ValueError("JPEG interleaved AC scan is illegal")
        units = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            blocks = []
            for cs, td, ta in scan_comps:
                _, hi, vi, _ = by_id[cs]
                for by in range(vi):
                    for bx in range(hi):
                        blocks.append(
                            (cs, my * vi + by, mx * hi + bx, td, ta)
                        )
            units.append(blocks)
    else:
        cs, td, ta = scan_comps[0]
        _, hi, vi, _ = by_id[cs]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        units = [
            [(cs, b // bw, b % bw, td, ta)] for b in range(bh * bw)
        ]
    per_interval = restart if restart else len(units)
    u = 0
    for interval in intervals:
        if u >= len(units):
            break
        reader = _BitReader(interval)
        preds = {cs: 0 for cs, _, _ in scan_comps}
        eobrun = 0
        for _ in range(min(per_interval, len(units) - u)):
            for cs, by, bx, td, ta in units[u]:
                coef = coefs[cs][by, bx]
                if ss == 0:  # DC scan
                    if ah == 0:
                        s = _huff_decode(reader, huff_dc[td])
                        preds[cs] += _extend(reader.read(s), s)
                        coef[0] = preds[cs] << al
                    elif reader.read(1):
                        coef[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine(
                        reader, huff_ac[ta], coef, ss, se, al, eobrun
                    )
            u += 1
    if u < len(units):
        raise ValueError("JPEG progressive scan truncated")


def _reconstruct_progressive(frame, qt, coefs) -> np.ndarray:
    """Dequantize + batched IDCT of the accumulated coefficients; one
    shared reconstruction regardless of how many scans contributed."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hi, vi, tq_id in comps:
        z = coefs[cid]
        bh, bw = z.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[:, :, _ZIGZAG] = z  # dezigzag
        blocks = nat.reshape(bh, bw, 8, 8) * qt[tq_id]
        px = _A.T @ blocks @ _A + 128.0
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble(comps, planes, h, w, hmax, vmax)


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
    return _assemble(comps, planes, h, w, hmax, vmax)


def _assemble(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to the full-resolution grid, crop
    to (h, w), and color-convert (shared by the baseline and
    progressive paths)."""
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
    size) symbol plus the progressive EOBn symbols (r<<4 with size 0,
    r = 0..14) as canonical 8-bit codes. Neither set reaches the
    all-ones code of its length."""
    dc_counts = [0] * 16
    dc_counts[4] = 12  # twelve 5-bit codes
    dc_syms = bytes(range(12))
    dc_enc = {s: (5, c) for c, s in enumerate(dc_syms)}
    ac_list = [r << 4 for r in range(15)] + [0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_list)  # 176 8-bit codes
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


def _block_coefs(block, q) -> np.ndarray:
    """FDCT + quantize one 8x8 block -> 64 zigzag-ordered ints."""
    coefs = np.round(_fdct2(block.astype(np.float64) - 128.0) / q)
    return coefs.astype(np.int64).reshape(64)[_ZIGZAG]


def _encode_block(writer, coefs, pred, dc_enc, ac_enc) -> int:
    """Baseline sequential entropy coding of one zigzag coef vector."""
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


# ------------------------------------------- progressive scan emitters


class _ProgACState:
    """EOB-run + buffered-correction-bit state shared across blocks of
    one progressive AC scan (T.81 G.1.2.2-G.1.2.3 encode side)."""

    __slots__ = ("eobrun", "pending")

    def __init__(self):
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owed at next EOBn

    def flush(self, writer, ac_enc) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            ln, code = ac_enc[nbits << 4]
            writer.write(code, ln)
            if nbits:
                writer.write(self.eobrun - (1 << nbits), nbits)
            for b in self.pending:
                writer.write(b, 1)
            self.pending.clear()
            self.eobrun = 0


def _emit_ac_first(writer, ac_enc, coefs, ss, se, al, st) -> None:
    """AC first scan for one block: point-transformed band Ss..Se."""
    r = 0
    for k in range(ss, se + 1):
        v = int(coefs[k])
        if v < 0:
            t = (-v) >> al
            t2 = ~t
        else:
            t = v >> al
            t2 = t
        if t == 0:
            r += 1
            continue
        st.flush(writer, ac_enc)
        while r > 15:
            ln, code = ac_enc[0xF0]
            writer.write(code, ln)
            r -= 16
        nbits = t.bit_length()
        ln, code = ac_enc[(r << 4) | nbits]
        writer.write(code, ln)
        writer.write(t2 & ((1 << nbits) - 1), nbits)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush(writer, ac_enc)


def _emit_ac_refine(writer, ac_enc, coefs, ss, se, al, st) -> None:
    """AC refinement scan for one block: newly-significant ±1
    insertions plus correction bits for history-nonzero positions."""
    absval = [abs(int(coefs[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for idx, t in enumerate(absval):
        if t == 1:
            eob = idx + 1
    r = 0
    br: list[int] = []  # this block's buffered correction bits
    for idx, t in enumerate(absval):
        if t == 0:
            r += 1
            continue
        while r > 15 and idx < eob:
            st.flush(writer, ac_enc)
            ln, code = ac_enc[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:  # history-nonzero: owes one correction bit
            br.append(t & 1)
            continue
        st.flush(writer, ac_enc)
        ln, code = ac_enc[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(coefs[ss + idx]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush(writer, ac_enc)


def encode_jpeg(
    img: np.ndarray, quality: int = 90, progressive: bool = False
) -> bytes:
    """4:4:4 JPEG of an ``(H, W, 3)`` RGB or ``(H, W)`` grayscale
    uint8 array. ``progressive=True`` emits an SOF2 stream with a
    spectral-selection + successive-approximation scan script (DC
    first at Al=1 then a DC refinement; per-component AC bands 1-5 and
    6-63 first at Al=1 then band-matched refinements to Al=0), so the
    quantized coefficients — and therefore the decoded pixels — are
    bit-identical to the baseline stream of the same image."""
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
    seg(0xC2 if progressive else 0xC0, bytes(sof))
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)

    by = -(-h // 8)
    bx = -(-w // 8)
    coef = []
    for c, ch in enumerate(chans):
        p = np.empty((by * 8, bx * 8))
        p[:h, :w] = ch
        p[h:, :w] = ch[h - 1 : h, :]  # edge-replicate padding
        p[:, w:] = p[:, w - 1 : w]
        q = qts[0 if c == 0 else 1]
        cc = np.empty((by, bx, 64), dtype=np.int64)
        for y in range(by):
            for x in range(bx):
                cc[y, x] = _block_coefs(
                    p[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8], q
                )
        coef.append(cc)

    def sos_seg(comp_ids: list[int], ss: int, se: int,
                ah: int, al: int) -> None:
        body = bytearray([len(comp_ids)])
        for c in comp_ids:
            body += bytes([c + 1, 0x00])  # DC table 0, AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(body))

    if not progressive:
        sos_seg(list(range(ncomp)), 0, 63, 0, 0)
        writer = _BitWriter()
        preds = [0] * ncomp
        for y in range(by):
            for x in range(bx):
                for c in range(ncomp):
                    preds[c] = _encode_block(
                        writer, coef[c][y, x], preds[c], dc_enc, ac_enc
                    )
        out.extend(writer.flush())
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    def dc_scan(ah: int, al: int) -> None:
        sos_seg(list(range(ncomp)), 0, 0, ah, al)
        wtr = _BitWriter()
        preds = [0] * ncomp
        for y in range(by):
            for x in range(bx):
                for c in range(ncomp):
                    dc0 = int(coef[c][y, x, 0])
                    if ah == 0:
                        dc = dc0 >> al
                        diff = dc - preds[c]
                        preds[c] = dc
                        s = _category(diff)
                        ln, code = dc_enc[s]
                        wtr.write(code, ln)
                        if s:
                            wtr.write(
                                diff if diff >= 0
                                else diff + (1 << s) - 1, s,
                            )
                    else:
                        wtr.write((dc0 >> al) & 1, 1)
        out.extend(wtr.flush())

    def ac_scan(c: int, ss: int, se: int, ah: int, al: int) -> None:
        sos_seg([c], ss, se, ah, al)
        wtr = _BitWriter()
        st = _ProgACState()
        emit = _emit_ac_refine if ah else _emit_ac_first
        for y in range(by):
            for x in range(bx):
                emit(wtr, ac_enc, coef[c][y, x], ss, se, al, st)
        st.flush(wtr, ac_enc)
        out.extend(wtr.flush())

    dc_scan(0, 1)
    dc_scan(1, 0)
    for c in range(ncomp):
        ac_scan(c, 1, 5, 0, 1)
        ac_scan(c, 6, 63, 0, 1)
    for c in range(ncomp):
        ac_scan(c, 1, 5, 1, 0)
        ac_scan(c, 6, 63, 1, 0)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
