"""Pure-stdlib PNG codec: minimal writer + full five-filter decoder.

Closes the multimodal `_decode_real` stub the honest way the PDF stub
was closed (operators/pdftext.py): no image library ships in this
container, so the codec itself is implemented from the public PNG
specification (RFC 2083) — 8-bit truecolor RGB, non-interlaced, any
of the five scanline filters on decode, filter 0 on encode. That is
enough to round-trip real binary image payloads through the Spark
multimodal plumbing and to verify decoded pixel statistics against an
arithmetic oracle.

Reference parity target: the reference treats fetched media as opaque
bytes + metadata (study_scraper fulltext fetcher); decode here extends
that surface the way a training-data pipeline needs it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def write_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw interleaved RGB bytes (len = w*h*3) as a PNG."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    raw = bytearray()
    stride = width * 3
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        raw += rgb[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def read_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an 8-bit truecolor non-interlaced PNG.

    Returns (width, height, pixels) with pixels shaped (h, w, 3).
    Raises ValueError on anything outside the supported subset — the
    caller (multimodal.decode_png_features) catches it and emits a
    NULL-features row rather than failing the stage."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos, width = 8, None
    height = bitdepth = colortype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc_got = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc_got) != 4:
            raise ValueError("truncated chunk")
        if struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF) != crc_got:
            raise ValueError("chunk CRC mismatch")
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if (bitdepth, colortype, interlace) != (8, 2, 0):
        raise ValueError("unsupported PNG subset")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline payload size")
    raw = raw.reshape(height, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = 3
    for y in range(height):
        cur = rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        f = filters[y]
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up — vectorized, no per-pixel carry
            out[y] = cur + prev
        elif f == 1:
            # Sub — the filter libpng picks most often. The left-pixel
            # recurrence is a per-channel prefix sum, and mod-256
            # addition is linear, so cumsum in a wide dtype then mask:
            # fully vectorized, no per-byte Python.
            lanes = cur.reshape(-1, bpp).astype(np.uint32)
            out[y] = (
                np.cumsum(lanes, axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average/Paeth: nonlinear left-carry, loop
            line = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if f == 3:
                    rec = (int(cur[x]) + ((left + up) >> 1)) & 0xFF
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                    rec = (int(cur[x]) + pred) & 0xFF
                line[x] = rec
            out[y] = line
        else:
            raise ValueError(f"unknown filter {f}")
    return width, height, out.reshape(height, width, 3)
