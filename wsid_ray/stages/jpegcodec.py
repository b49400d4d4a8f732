"""Baseline sequential JPEG (JFIF) codec — pure numpy + stdlib
(VERDICT r04 item 3, following the r4 PNG-decoder pattern).

Public spec: ITU-T T.81 / ISO 10918-1 (baseline sequential DCT, Huffman
entropy coding) with the Annex K example quantisation and Huffman tables;
JFIF colour transform per ITU-R BT.601.

Decoder coverage: 8-bit baseline sequential (SOF0), 1 or 3 components,
sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn),
multi-table DQT/DHT segments.  Progressive (SOF2), arithmetic coding and
12-bit precision raise ``NotImplementedError`` naming the library tier.

Encoder coverage (fixture generator): greyscale or RGB 4:4:4 / 4:2:0 at a
given quality, Annex K tables.  ``encode_jpeg_with_recon`` also returns
the exact raster a spec-conformant decoder reproduces (dequant + IDCT +
clamp + upsample + colour transform over the ENCODER's quantised
coefficients — no Huffman involved), so oracle artifacts can check the
decoder's entropy-decode layer against an independent reconstruction.

Determinism contract shared by encode-recon and decode: float64 DCT
basis, ``floor(x + 0.5)`` rounding in the colour transforms and the final
sample clamp — identical formulas on both paths.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position k -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantisation tables (natural order, row-major)
STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (counts per code length 1..16, symbols)
DC_LUM = ((0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
          tuple(range(12)))
DC_CHROMA = ((0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
             tuple(range(12)))
AC_LUM = ((0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125), (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
AC_CHROMA = ((0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119), (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))


def _dct_basis() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1)·u·π/16); pixels = Aᵀ·C·A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    A[0] /= np.sqrt(2.0)
    return A


_A = _dct_basis()


def idct_block(coef: np.ndarray) -> np.ndarray:
    """(…, 8, 8) dequantised coefficients -> spatial float64 samples."""
    return _A.T @ coef @ _A


def dct_block(pix: np.ndarray) -> np.ndarray:
    return _A @ pix @ _A.T


def _half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def _clamp_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(_half_up(x), 0, 255).astype(np.uint8)


def _canonical_codes(counts, symbols):
    """(counts per length, symbols) -> {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(counts, symbols):
    """symbol -> (length, code) for the encoder."""
    return {sym: lc for lc, sym in _canonical_codes(counts, symbols).items()}


def _extend(value: int, size: int) -> int:
    """T.81 F.12: map a `size`-bit magnitude to its signed coefficient."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= nbits
        out = self.acc >> self.n
        self.acc &= (1 << self.n) - 1
        return out

    def decode_huff(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `pos` -> (restart segments, next marker
    offset).  0xFF00 stuffing removed; RSTn markers split segments."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:   # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                      # a real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline JFIF -> flat uint8 raster (grey row-major, or RGB
    interleaved).  See module doc for coverage."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:   # EOI
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:   # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                pq_, tq = seg[o] >> 4, seg[o] & 15
                if pq_ != 0:
                    raise NotImplementedError(
                        "16-bit quantisation tables (12-bit JPEG) not "
                        "supported by the builtin decoder")
                z = np.frombuffer(seg, np.uint8, 64, o + 1).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = z
                qts[tq] = nat
                o += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                counts = tuple(seg[o + 1:o + 17])
                nsym = sum(counts)
                syms = tuple(seg[o + 17:o + 17 + nsym])
                huffs[(tc, th)] = _canonical_codes(counts, syms)
                o += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "builtin JPEG decoder handles baseline sequential (SOF0) "
                "only; install Pillow for progressive/arithmetic/lossless")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 15})
            segs, pos = _split_entropy(payload, pos)
            return _decode_scan(frame, scan, qts, huffs, segs,
                                restart_interval)
        # APPn / COM and anything else: skipped
    raise ValueError("JPEG stream has no SOS scan")


def _decode_scan(frame, scan, qts, huffs, segs, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["dc_t"] = huffs[(0, s["dc"])]
        c["ac_t"] = huffs[(1, s["ac"])]
        c["qt"] = qts[c["tq"]]
        c["q"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        c["pred"] = 0

    seg_i = 0
    reader = _BitReader(segs[0])
    zz = ZIGZAG
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            reader = _BitReader(segs[seg_i])
            for c in order:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in order:
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    coef = np.zeros(64, np.int64)
                    ssss = reader.decode_huff(c["dc_t"])
                    diff = _extend(reader.read(ssss), ssss)
                    c["pred"] += diff
                    coef[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(c["ac_t"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:   # ZRL
                                k += 16
                                continue
                            break          # EOB
                        k += r
                        coef[zz[k]] = _extend(reader.read(s), s)
                        k += 1
                    c["q"][my * c["v"] + v, mx * c["h"] + hh] = coef
    planes = []
    for c in comps:
        # batched dequant+IDCT+clamp — the IDENTICAL numeric path the
        # encoder's independent reconstruction uses (_recon_plane), so
        # recon-vs-decode comparisons isolate the entropy layer
        p = _recon_plane(c["q"], c["qt"], mcuy * c["v"] * 8,
                         mcux * c["h"] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:   # nearest-neighbour chroma upsampling
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return planes[0].ravel()
    if len(planes) != 3:
        raise NotImplementedError("1- or 3-component JPEG only")
    return _ycbcr_to_rgb(*planes).ravel()


def _ycbcr_to_rgb(Y, Cb, Cr) -> np.ndarray:
    Yf = Y.astype(np.float64)
    cb = Cb.astype(np.float64) - 128.0
    cr = Cr.astype(np.float64) - 128.0
    r = _clamp_u8(Yf + 1.402 * cr)
    g = _clamp_u8(Yf - 0.344136 * cb - 0.714136 * cr)
    b = _clamp_u8(Yf + 1.772 * cb)
    return np.stack([r, g, b], axis=-1)


def _rgb_to_ycbcr(img: np.ndarray):
    R = img[..., 0].astype(np.float64)
    G = img[..., 1].astype(np.float64)
    B = img[..., 2].astype(np.float64)
    Y = _clamp_u8(0.299 * R + 0.587 * G + 0.114 * B)
    Cb = _clamp_u8(-0.168736 * R - 0.331264 * G + 0.5 * B + 128.0)
    Cr = _clamp_u8(0.5 * R - 0.418688 * G - 0.081312 * B + 128.0)
    return Y, Cb, Cr


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # 1-fill per spec


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mult) * mult
    pw = -(-w // mult) * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _quantize_plane(plane: np.ndarray, qt: np.ndarray):
    """uint8 plane (already padded to 8) -> (by, bx, 64) quantised
    coefficients in natural order, int64."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (plane.astype(np.float64) - 128.0).reshape(
        by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = _A @ blocks @ _A.T
    return _half_up(coefs / qt.reshape(8, 8)).astype(np.int64).reshape(
        by, bx, 64)


def _recon_plane(q: np.ndarray, qt: np.ndarray, h: int, w: int) -> np.ndarray:
    """Quantised coefficients -> the exact uint8 plane any conformant
    decoder reproduces (dequant + IDCT + level shift + clamp)."""
    by, bx, _ = q.shape
    deq = (q * qt).astype(np.float64).reshape(by, bx, 8, 8)
    pix = _A.T @ deq @ _A + 128.0
    full = _clamp_u8(pix).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return full[:h, :w]


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(coef[0])
    diff = dc - pred
    ssss = _size_of(diff)
    ln, code = dc_codes[ssss]
    bw.write(code, ln)
    if ssss:
        mag = diff if diff > 0 else diff + (1 << ssss) - 1
        bw.write(mag, ssss)
    zz = coef[ZIGZAG]
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _size_of(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        mag = v if v > 0 else v + (1 << s) - 1
        bw.write(mag, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]   # EOB
        bw.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_with_recon(img: np.ndarray, quality: int = 75,
                           subsample: int = 1, restart_interval: int = 0):
    """(h, w) grey or (h, w, 3) RGB uint8 -> (jfif bytes, recon raster).

    ``recon`` is the flat uint8 raster a conformant baseline decoder
    reproduces — computed from the quantised coefficients WITHOUT the
    Huffman layer, so comparing it against ``decode_jpeg_baseline`` of
    the returned bytes checks the entropy codec for real.  ``subsample``:
    1 = 4:4:4, 2 = 4:2:0 chroma (colour only).  ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs."""
    grey = img.ndim == 2
    h, w = img.shape[:2]
    lqt = _scaled_qt(STD_LUM_QT, quality)
    cqt = _scaled_qt(STD_CHROMA_QT, quality)

    if grey:
        comps = [{"plane": img, "qt": lqt, "tq": 0, "h": 1, "v": 1}]
    else:
        Y, Cb, Cr = _rgb_to_ycbcr(img)
        if subsample == 2:
            def down(p):
                p = _pad_edge(p, 2).astype(np.float64)
                q = (p[0::2, 0::2] + p[0::2, 1::2]
                     + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                return _clamp_u8(q)
            comps = [{"plane": Y, "qt": lqt, "tq": 0, "h": 2, "v": 2},
                     {"plane": down(Cb), "qt": cqt, "tq": 1, "h": 1,
                      "v": 1},
                     {"plane": down(Cr), "qt": cqt, "tq": 1, "h": 1,
                      "v": 1}]
        else:
            comps = [{"plane": Y, "qt": lqt, "tq": 0, "h": 1, "v": 1},
                     {"plane": Cb, "qt": cqt, "tq": 1, "h": 1, "v": 1},
                     {"plane": Cr, "qt": cqt, "tq": 1, "h": 1, "v": 1}]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        plane = c["plane"][:ch, :cw]
        # pad the plane to the full MCU grid (mcu count set by luma)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        gw, gh = mcux * c["h"] * 8, mcuy * c["v"] * 8
        p = np.pad(plane, ((0, gh - plane.shape[0]),
                           (0, gw - plane.shape[1])), mode="edge")
        c["q"] = _quantize_plane(p, c["qt"])
        c["ch"], c["cw"] = ch, cw

    # ---- entropy-coded data (interleaved MCUs) ----
    dc_l = _encode_codes(*DC_LUM)
    ac_l = _encode_codes(*AC_LUM)
    dc_c = _encode_codes(*DC_CHROMA)
    ac_c = _encode_codes(*AC_CHROMA)
    bw = _BitWriter()
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dc_t = dc_l if ci == 0 else dc_c
            ac_t = ac_l if ci == 0 else ac_c
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    coef = c["q"][my * c["v"] + v, mx * c["h"] + hh]
                    preds[ci] = _encode_block(bw, coef, preds[ci],
                                              dc_t, ac_t)
    bw.flush()

    # ---- headers ----
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0))
    zl = np.zeros(64, np.uint8)
    zl[:] = lqt[ZIGZAG]
    out += _seg(0xDB, b"\x00" + zl.tobytes())
    if not grey:
        zc = np.zeros(64, np.uint8)
        zc[:] = cqt[ZIGZAG]
        out += _seg(0xDB, b"\x01" + zc.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, c in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (c["h"] << 4) | c["v"], c["tq"])
    out += _seg(0xC0, sof)

    def dht(tc, th, spec):
        counts, syms = spec
        return _seg(0xC4, bytes(((tc << 4) | th,)) + bytes(counts)
                    + bytes(syms))
    out += dht(0, 0, DC_LUM) + dht(1, 0, AC_LUM)
    if not grey:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes((len(comps),))
    for i in range(len(comps)):
        sos += bytes((i + 1, 0x00 if i == 0 else 0x11))
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"

    # ---- independent reconstruction (no Huffman) ----
    recs = []
    for c in comps:
        mcux_ = -(-w // (8 * hmax))
        mcuy_ = -(-h // (8 * vmax))
        full = _recon_plane(c["q"], c["qt"], mcuy_ * c["v"] * 8,
                            mcux_ * c["h"] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            full = np.repeat(np.repeat(full, ry, axis=0), rx, axis=1)
        recs.append(full[:h, :w])
    if grey:
        recon = recs[0].ravel()
    else:
        recon = _ycbcr_to_rgb(*recs).ravel()
    return bytes(out), recon


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsample: int = 1) -> bytes:
    return encode_jpeg_with_recon(img, quality, subsample)[0]
