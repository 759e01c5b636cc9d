"""Pure-stdlib+numpy baseline JPEG codec: minimal writer + decoder.

Closes the multimodal ``_decode_real`` JPEG gate the same way the PNG
and PDF stubs were closed (operators/pngcodec.py, pdftext.py): no
image library ships in this container, so the codec is implemented
from the PUBLIC JPEG specification (ITU-T T.81) — baseline sequential
DCT, 8-bit, 3-component YCbCr. The writer emits 4:4:4 (default),
4:2:2, or 4:2:0 chroma subsampling and optional DRI/RSTn restart
intervals; the decoder accepts any 1–2 horizontal/vertical sampling
factors (covering 4:4:4, 4:2:2, 4:4:0, 4:2:0 — the dominant
real-world baseline shapes), restart markers, and single-component
grayscale. The writer embeds its own valid canonical Huffman tables
(fixed-length codes — the spec permits any tables, they travel in the
DHT segment; compression ratio is irrelevant for fixture payloads)
and the standard Annex-K quantization tables under the usual quality
scaling. Lossy by nature: tests assert reconstruction-error bounds,
not bit-equality, plus exact marker-structure and corrupt-input
quarantine behavior.

Quarantine contract: ``read_jpeg`` raises ``ValueError`` on ANY
malformed input — explicit validation for the common cases, plus a
blanket KeyError/IndexError/struct.error → ValueError trap so no
corrupt payload can ever escape the callers' quarantine handlers and
kill a Spark stage.

Reference parity target: the reference treats fetched media as opaque
bytes + metadata; decode here extends that surface the way a
multimodal training pipeline needs it.
"""

from __future__ import annotations

import struct

import numpy as np

# hard ceiling on decoded frame size: fixture/pipeline payloads are far
# smaller, and a forged SOF claiming 65535x65535 would otherwise demand
# ~100 GB of planes before the entropy check could reject it
_MAX_DECODE_PIXELS = 1 << 24  # 16.7 MP

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

# component sampling factors (h, v) per mode: Y, Cb, Cr
_SAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


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

    def marker(self, m: int) -> None:
        """Emit a raw marker (byte-aligned, NOT byte-stuffed)."""
        self.flush()
        self.out += bytes([0xFF, m])


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


def _block_mean(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Downsample a plane by (fy, fx) block averaging (the standard
    chroma-subsampling filter), edge-padding to multiples first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph = (h + fy - 1) // fy * fy
    pw = (w + fx - 1) // fx * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def write_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode raw interleaved RGB bytes (len = w*h*3) as a baseline
    JFIF JPEG (YCbCr, our fixed Huffman tables, Annex-K quantization
    under libjpeg-convention quality scaling). ``subsampling`` is
    "444" (default), "422", or "420"; ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that-many MCUs."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    if subsampling not in _SAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    samp = _SAMPLING[subsampling]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
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
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component plane: chroma block-mean downsampled, then
    # edge-replicated padding to the MCU grid (replication keeps
    # padded blocks smooth, minimizing ringing)
    planes = []
    for (h, v), c in zip(samp, comps):
        d = _block_mean(c, vmax // v, hmax // h)
        ph, pw = mcuy * v * 8, mcux * h * 8
        planes.append(
            np.pad(
                d,
                ((0, ph - d.shape[0]), (0, pw - d.shape[1])),
                mode="edge",
            )
        )
    bw = _BitWriter()
    dc_prev = [0, 0, 0]
    total = mcux * mcuy
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (h, v) in enumerate(samp):
                for by in range(v):
                    for bx in range(h):
                        row = (my * v + by) * 8
                        col = (mx * h + bx) * 8
                        dc_prev[ci] = _encode_block(
                            bw,
                            planes[ci][row : row + 8, col : col + 8],
                            qs[ci],
                            dc_prev[ci],
                        )
            mcu_idx += 1
            if (
                restart_interval
                and mcu_idx % restart_interval == 0
                and mcu_idx < total
            ):
                bw.marker(0xD0 + rst % 8)
                rst += 1
                dc_prev = [0, 0, 0]
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
    for (cid, tq), (h, v) in zip(((1, 0), (2, 1), (3, 1)), samp):
        sof += bytes([cid, (h << 4) | v, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht(0, 0, _DC_BITS, _DC_SYMS))
    out += _seg(0xC4, _dht(1, 0, _AC_BITS, _AC_SYMS))
    out += _seg(0xC4, _dht(0, 1, _DC_BITS, _DC_SYMS))
    out += _seg(0xC4, _dht(1, 1, _AC_BITS, _AC_SYMS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
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

    def expect_rst(self, n: int) -> None:
        """Byte-align (discarding pad bits) and consume the RSTn
        marker that must follow a completed restart interval."""
        self._n = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != n % 8:
            raise ValueError("restart marker out of sequence")
        self.pos += 2


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
    """Decode a baseline sequential JPEG (8-bit; grayscale or 3
    components with any 1–2 sampling factors — 4:4:4 / 4:2:2 / 4:4:0 /
    4:2:0; DRI/RSTn restart intervals honored; no progressive or
    arithmetic modes). Returns (width, height, pixels) shaped
    (h, w, 3) uint8 (grayscale replicated). Raises ValueError on
    anything outside the supported subset OR any malformed input —
    callers quarantine, never crash the stage."""
    try:
        return _read_jpeg(data)
    except (KeyError, IndexError, struct.error) as exc:
        # blanket trap: no malformed payload may escape the callers'
        # (ValueError, ...) quarantine handlers as a stage-killing
        # KeyError/IndexError (undeclared table ids, short segments,
        # lone trailing 0xFF, scan/frame id mismatches, ...)
        raise ValueError(f"malformed JPEG ({type(exc).__name__})") from exc


def _read_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    while pos < len(data):
        if pos + 2 > len(data):
            raise ValueError("truncated marker")
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
        if seglen < 2 or len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                if i + 65 > len(seg):
                    raise ValueError("short DQT segment")
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
                if i + 17 > len(seg):
                    raise ValueError("short DHT segment")
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(seg):
                    raise ValueError("short DHT symbol list")
                syms = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, syms)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("short SOF segment")
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            if width * height > _MAX_DECODE_PIXELS:
                raise ValueError("SOF dimensions exceed decoder pixel cap")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component supported")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("short SOF component list")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0xF
                if ncomp == 1:
                    h = v = 1  # single-component scans are 1x1 per spec
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError("sampling factors outside 1..2")
                comps.append({"id": cid, "tq": tq, "h": h, "v": v})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode unsupported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("short DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if not seg:
                raise ValueError("empty SOS segment")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("scan/frame component mismatch")
            if len(seg) < 1 + 2 * ns:
                raise ValueError("short SOS segment")
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                        break
                else:
                    raise ValueError("scan component id not in frame")
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("no SOS marker")
    if not comps or not width or not height:
        raise ValueError("missing SOF before SOS")
    for comp in comps:
        if "td" not in comp:
            raise ValueError("frame component missing from scan")
        if comp["tq"] not in qt:
            raise ValueError("undeclared quantization table")
        if (0, comp["td"]) not in huff or (1, comp["ta"]) not in huff:
            raise ValueError("undeclared Huffman table")

    # entropy-coded bytes run until the EOI marker
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(data[pos:end])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # a declared frame needs >= 1 entropy bit per 8x8 block (EOB);
    # reject before allocating planes so a tiny payload claiming huge
    # SOF dims raises ValueError, not MemoryError
    blocks = mcux * mcuy * sum(c["h"] * c["v"] for c in comps)
    if blocks > 8 * max(0, end - pos):
        raise ValueError("SOF dimensions exceed entropy data size")
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    dc_prev = [0] * len(comps)
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_idx
                and mcu_idx % restart_interval == 0
            ):
                br.expect_rst(rst)
                rst += 1
                dc_prev = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dct = huff[(0, comp["td"])]
                act = huff[(1, comp["ta"])]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        size = _huff_decode(br, dct)
                        diff = (
                            _extend(br.bits(size), size) if size else 0
                        )
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
                        row = (my * comp["v"] + by) * 8
                        col = (mx * comp["h"] + bx) * 8
                        planes[ci][row : row + 8, col : col + 8] = (
                            _T.T @ coef @ _T + 128.0
                        )
            mcu_idx += 1
    # upsample subsampled chroma by pixel replication, crop to size
    full = []
    for comp, p in zip(comps, planes):
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, np.stack([y, y, y], axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=2,
    )
    return width, height, rgb
