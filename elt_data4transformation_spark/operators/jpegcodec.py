"""Pure-stdlib+numpy baseline JPEG codec: minimal writer + decoder.

Closes the multimodal ``_decode_real`` JPEG gate the same way the PNG
and PDF stubs were closed (operators/pngcodec.py, pdftext.py): no
image library ships in this container, so the codec is implemented
from the PUBLIC JPEG specification (ITU-T T.81) — baseline sequential
DCT, 8-bit, 3-component YCbCr with no chroma subsampling (4:4:4) on
encode; the decoder additionally accepts single-component grayscale.
The writer embeds its own valid canonical Huffman tables (fixed-length
codes — the spec permits any tables, they travel in the DHT segment;
compression ratio is irrelevant for fixture payloads) and the
standard Annex-K quantization tables under the usual quality scaling.
Lossy by nature: tests assert reconstruction-error bounds, not
bit-equality, plus exact marker-structure and corrupt-input
quarantine behavior.

Reference parity target: the reference treats fetched media as opaque
bytes + metadata; decode here extends that surface the way a
multimodal training pipeline needs it.
"""

from __future__ import annotations

import struct

import numpy as np

# standard Annex-K base quantization tables (row-major 8x8)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# zigzag scan order: (row, col) pairs in transmission order
_ZIG = sorted(
    ((i, j) for i in range(8) for j in range(8)),
    key=lambda t: (t[0] + t[1], t[1] if (t[0] + t[1]) % 2 == 0 else t[0]),
)

# orthonormal 8x8 DCT-II matrix
_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# writer Huffman tables: OUR OWN fixed-length canonical codes (valid
# per T.81 — tables are arbitrary and travel in DHT; fixed lengths
# keep encode/decode trivially correct at the cost of compression):
# DC = 12 category symbols at 4 bits (codes 0..11, all-ones unused),
# AC = the 162 (run,size) symbols at 8 bits (codes 0..161, ditto).
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMS)  # all codes 4 bits long (index 3 = len 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # all codes 8 bits long
_DC_CODE = {s: (i, 4) for i, s in enumerate(_DC_SYMS)}
_AC_CODE = {s: (i, 8) for i, s in enumerate(_AC_SYMS)}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    bw: _BitWriter, block: np.ndarray, q: np.ndarray, dc_prev: int
) -> int:
    coef = _T @ (block - 128.0) @ _T.T
    quant = np.round(coef / q).astype(int)
    dc = int(quant[0, 0])
    diff = dc - dc_prev
    size = _category(diff)
    bw.put(*_DC_CODE[size])
    if size:
        bw.put(_magnitude_bits(diff, size), size)
    zz = [int(quant[i, j]) for i, j in _ZIG][1:]
    run = 0
    last_nz = max((k for k, v in enumerate(zz) if v), default=-1)
    for k, v in enumerate(zz):
        if k > last_nz:
            break
        if v == 0:
            run += 1
            if run == 16:
                bw.put(*_AC_CODE[0xF0])  # ZRL
                run = 0
            continue
        size = _category(v)
        bw.put(*_AC_CODE[(run << 4) | size])
        bw.put(_magnitude_bits(v, size), size)
        run = 0
    if last_nz < 63 - 1:
        bw.put(*_AC_CODE[0x00])  # EOB
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht(tc: int, th: int, bits: list[int], syms: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)


def write_jpeg(width: int, height: int, rgb: bytes, quality: int = 85) -> bytes:
    """Encode raw interleaved RGB bytes (len = w*h*3) as a baseline
    JFIF JPEG (YCbCr 4:4:4, our fixed Huffman tables, Annex-K
    quantization under libjpeg-convention quality scaling)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b,  # Y
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,  # Cb
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,  # Cr
    ]
    ql, qc = _quality_tables(quality)
    qs = [ql, qc, qc]
    # edge-replicated padding to 8x8 multiples (the standard choice —
    # replication keeps padded blocks smooth, minimizing ringing)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = [
        np.pad(c, ((0, ph - height), (0, pw - width)), mode="edge")
        for c in comps
    ]
    bw = _BitWriter()
    dc_prev = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                dc_prev[ci] = _encode_block(
                    bw,
                    padded[ci][by : by + 8, bx : bx + 8],
                    qs[ci],
                    dc_prev[ci],
                )
    bw.flush()

    def zz_bytes(q: np.ndarray) -> bytes:
        return bytes(int(q[i, j]) for i, j in _ZIG)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _seg(0xDB, bytes([0x00]) + zz_bytes(ql))
    out += _seg(0xDB, bytes([0x01]) + zz_bytes(qc))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling: 4:4:4
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht(0, 0, _DC_BITS, _DC_SYMS))
    out += _seg(0xC4, _dht(1, 0, _AC_BITS, _AC_SYMS))
    out += _seg(0xC4, _dht(0, 1, _DC_BITS, _DC_SYMS))
    out += _seg(0xC4, _dht(1, 1, _AC_BITS, _AC_SYMS))
    sos = bytes([3])
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tdta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _build_decode_table(bits: list[int], syms: list[int]) -> dict:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def read_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential JPEG (8-bit, 4:4:4 or grayscale,
    no progressive/restart/arithmetic modes). Returns (width, height,
    pixels) shaped (h, w, 3) uint8 (grayscale replicated). Raises
    ValueError on anything outside the supported subset — callers
    quarantine, never crash the stage."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    width = height = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZIG):
                    tbl[r, c] = seg[i + 1 + k]
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                syms = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, syms)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component supported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("scan/frame component mismatch")
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("no SOS marker")
    if not comps or not width or not height:
        raise ValueError("missing SOF before SOS")

    # entropy-coded bytes run until the EOI marker
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(data[pos:end])
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    planes = [np.zeros((ph, pw)) for _ in comps]
    dc_prev = [0] * len(comps)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, comp in enumerate(comps):
                dct = huff[(0, comp["td"])]
                act = huff[(1, comp["ta"])]
                size = _huff_decode(br, dct)
                diff = _extend(br.bits(size), size) if size else 0
                dc_prev[ci] += diff
                quant = np.zeros((8, 8))
                quant[0, 0] = dc_prev[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k >= 64:
                        raise ValueError("AC index overflow")
                    r, c = _ZIG[k]
                    quant[r, c] = _extend(br.bits(size), size)
                    k += 1
                coef = quant * qt[comp["tq"]]
                planes[ci][by : by + 8, bx : bx + 8] = (
                    _T.T @ coef @ _T + 128.0
                )
    planes = [p[:height, :width] for p in planes]
    if len(comps) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, np.stack([y, y, y], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=2,
    )
    return width, height, rgb
