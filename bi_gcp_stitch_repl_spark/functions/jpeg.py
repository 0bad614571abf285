"""Pure numpy/stdlib baseline JPEG codec + MJPEG-in-AVI container.

Everything here derives from the public JPEG specification (ITU-T T.81 /
ISO 10918-1: baseline sequential DCT, Annex K reference quantization and
Huffman tables, Annex F entropy coding) and the public RIFF/AVI layout —
no third-party code. Together with ``codecs.py`` (PNG/netpbm/WAV/Y4M)
this makes the DEFAULT multimodal decode path cover a real *compressed*
format: an MJPEG AVI is the simplest honest stand-in for camera/container
video, and every stage (RIFF demux → per-frame JPEG entropy decode →
dequant → IDCT → chroma upsample) is real computation, not a stub.

Scope (loudly rejecting the rest, same policy as codecs.py):
- decode: baseline DCT (SOF0), 8-bit, 1 component (grayscale) or 3
  (YCbCr, JFIF), sampling factors 1 or 2 per axis, restart markers;
- encode: grayscale or YCbCr 4:4:4 / 4:2:0, Annex K tables at the given
  libjpeg-style quality, standard Annex K Huffman tables;
- AVI: 'MJPG' video-only files — one '00dc' chunk per frame, each a
  complete JFIF JPEG (the MJPEG convention).

Scale note: like the other codecs these run per-payload inside
Arrow-batched ``mapInPandas`` — constant per-row cost, embarrassingly
parallel; a C-backed codec slots into the same ``decoder=`` seam.

Determinism: the IDCT/DCT are float64 matrix products with a fixed
operation order, so decode results are bit-stable across runs and
partitions; the catalog oracle (`x_mjpeg_avi_roundtrip`) additionally
restricts itself to DC-exact constant frames where decode is EXACT.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables from the public spec (ITU-T T.81 Annex K) -----------------------

#: zigzag scan order: ZIGZAG[i] = position in the 8x8 block (row*8+col) of
#: the i-th coefficient in scan order (Figure A.6 / Annex K)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

#: Annex K.3 standard Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: X_freq = A @ x @ A.T."""
    a = np.zeros((8, 8))
    for k in range(8):
        alpha = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            a[k, n] = alpha * np.cos((2 * n + 1) * k * np.pi / 16)
    return a


_A = _dct_matrix()

# The JPEG FDCT/IDCT convention (T.81 A.3.3) differs from the orthonormal
# transform only by fixed per-coefficient scale factors already folded
# into A here: forward S = A @ (x - 128) @ A.T, inverse x = A.T @ S @ A
# + 128. Verified A @ A.T = I to 1e-15 in tests.


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K table (public formula):
    scale = 5000/q (q<50) else 200-2q; entries clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# --- Huffman ---------------------------------------------------------------


def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical ordering (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, huffval).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # trailing pad: feed 1-bits (spec-legal at scan end)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    # marker (e.g. RSTn handled by caller slicing) — treat
                    # as end-of-data padding
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t-bit magnitude v to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code)."""
    t = int(abs(v)).bit_length()
    if v >= 0:
        return t, v
    return t, v + (1 << t) - 1


# --- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, str]:
    """Baseline JFIF JPEG → ((H, W, C) uint8, mode 'L'|'RGB')."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2: optional FF padding)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                full = np.zeros(64, np.int32)
                full[ZIGZAG] = tab
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential DCT (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            smap = {}
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                smap[cs] = (tables >> 4, tables & 0xF)
            data_start = pos + 2 + seglen
            scan = (smap, data_start)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    smap, data_start = scan
    # entropy-coded data runs to EOI; RSTn markers segment it
    data = payload[data_start:]
    comps = frame["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c in comps
    ]
    reader = _BitReader(data)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and skip the RSTn marker
                reader.nbits = 0
                reader.acc = 0
                while (
                    reader.pos + 1 < len(reader.data)
                    and reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                pred = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_t, ac_t = smap[comp["id"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int32)
                        t = reader.read_symbol(huff_dc[dc_t])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        # dequant in natural order: zz is zigzag-ordered,
                        # qt is natural-ordered → place then multiply
                        nat = np.zeros(64, np.float64)
                        nat[ZIGZAG] = zz
                        block = nat.reshape(8, 8) * qt[comp["tq"]]
                        pix = _A.T @ block @ _A + 128.0
                        y0, x0 = (my * comp["v"] + by) * 8, (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] != max_h or comp["v"] != max_v:
            p = np.repeat(
                np.repeat(p, max_v // comp["v"], 0), max_h // comp["h"], 1
            )
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        arr = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return arr[:, :, None], "L"
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), "RGB"


# --- encoder ---------------------------------------------------------------


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """FDCT + quantize + entropy-encode one 8x8 block; returns new DC pred."""
    coef = _A @ (block - 128.0) @ _A.T
    q = np.round(coef / quant).astype(np.int32)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t, bitsv = _magnitude(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(bitsv, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s, bitsv = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(bitsv, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray, quality: int = 75, subsample: bool = False
) -> bytes:
    """(H, W[, C]) uint8 → baseline JFIF JPEG bytes. C=1 grayscale; C=3
    RGB (converted to YCbCr; ``subsample=True`` emits 4:2:0)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("1 or 3 channels")
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if ch == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-filter 2x2 (pad to even first)
            def box(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), "edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            planes = [y, box(cb), box(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    max_h = max(s[0] for s in samps)
    max_v = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge")
        )

    dc_l = _build_codes(*HUFF_DC_LUMA)
    ac_l = _build_codes(*HUFF_AC_LUMA)
    dc_c = _build_codes(*HUFF_DC_CHROMA)
    ac_c = _build_codes(*HUFF_AC_CHROMA)

    writer = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
                quant = ql if ci == 0 else qc
                dcc = dc_l if ci == 0 else dc_c
                acc = ac_l if ci == 0 else ac_c
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        pred[ci] = _encode_block(
                            writer, p[y0 : y0 + 8, x0 : x0 + 8], quant,
                            pred[ci], dcc, acc,
                        )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tab: np.ndarray) -> bytes:
        return seg(
            0xDB, bytes([tq]) + bytes(int(x) for x in tab.reshape(-1)[ZIGZAG])
        )

    def dht(tc: int, th: int, table: tuple) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    ncomp = len(planes)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    sos_body = bytes([ncomp])
    for ci, (sh, sv) in enumerate(samps):
        tq = 0 if ci == 0 else 1
        sof_body += bytes([ci + 1, (sh << 4) | sv, tq])
        td = 0 if ci == 0 else 1
        sos_body += bytes([ci + 1, (td << 4) | td])
    sos_body += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if ncomp == 3:
        out += dqt(1, qc)
    out += seg(0xC0, sof_body)
    out += dht(0, 0, HUFF_DC_LUMA)
    out += dht(1, 0, HUFF_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, HUFF_DC_CHROMA)
        out += dht(1, 1, HUFF_AC_CHROMA)
    out += seg(0xDA, sos_body)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- MJPEG-in-AVI container ------------------------------------------------


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Minimal video-only MJPG AVI: RIFF(AVI )[hdrl[avih, strl[strh,
    strf]], movi['00dc' × n], idx1]. Every mainstream demuxer accepts
    this layout (public RIFF/AVI spec)."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I", 10**6 // fps, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF,
        0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi_items = [chunk(b"00dc", f) for f in jpeg_frames]
    movi = lst(b"movi", b"".join(movi_items))
    # idx1: offsets relative to the start of the 'movi' fourcc data
    idx = bytearray()
    off = 4
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = hdrl + movi + chunk(b"idx1", bytes(idx))
    return chunk(b"RIFF", b"AVI " + body)


def iter_avi_mjpeg_frames(payload: bytes, every_n: int = 1):
    """Lazily yield decoded ``(H, W, C) uint8`` frames from an MJPG AVI
    ('00dc'/'00db' chunks, each a complete JPEG). Signature-compatible
    with ``codecs.iter_y4m_frames`` — the extract_video_frames seam.
    ``every_n`` pushes stride sampling into the demuxer: skipped chunks
    yield ``None`` after a chunk-size pointer advance — the (dominant)
    Huffman/IDCT work only runs for kept frames."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    pos = 12
    movi_start = movi_end = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if fourcc == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            movi_start, movi_end = pos + 12, pos + 8 + size
            break
        pos += 8 + size + (size % 2)
    if movi_start is None:
        raise ValueError("no movi list")
    pos = movi_start
    found = False
    idx = 0
    while pos + 8 <= min(movi_end, len(payload)):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + size]
        if fourcc[2:4] in (b"dc", b"db") and data[:2] == b"\xff\xd8":
            found = True
            if idx % every_n:
                yield None
            else:
                arr, _mode = decode_jpeg(data)
                yield arr
            idx += 1
        pos += 8 + size + (size % 2)
    if not found:
        raise ValueError("no MJPEG frames in movi")


def sniff_video_frames(payload: bytes, every_n: int = 1):
    """Magic-byte dispatch to the right frame iterator — the DEFAULT
    decoder for ``multimodal.extract_video_frames``: Y4M (raw) or MJPG
    AVI (compressed).

    Normalizes the channel contract across containers: yielded frames
    are grayscale ``(H, W, 1)`` or RGB ``(H, W, 3)``. JPEG decode
    already emits RGB; Y4M color frames (raw YUV planes) are converted
    with the same BT.601 matrix — without this, a downstream PNG encode
    of a Y4M frame would write YUV bytes into RGB channels and channel 0
    would mean Y for one container but RED for the other."""
    from .codecs import Y4M_SIG, iter_y4m_frames, yuv_to_rgb

    if payload[: len(Y4M_SIG)] == Y4M_SIG:
        return (
            f if f is None or f.shape[2] == 1 else yuv_to_rgb(f)
            for f in iter_y4m_frames(payload, every_n=every_n)
        )
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return iter_avi_mjpeg_frames(payload, every_n=every_n)
    raise ValueError("unrecognized video container")
