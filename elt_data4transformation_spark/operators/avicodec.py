"""Pure-stdlib AVI (RIFF) MJPEG container codec: writer + reader.

With the baseline JPEG codec in place (operators/jpegcodec.py), a REAL
video container becomes expressible without ffmpeg: Motion-JPEG in an
AVI is just RIFF framing around per-frame JPEGs — the PUBLIC Microsoft
RIFF/AVI layout ('RIFF'+'AVI ', LIST hdrl {avih, LIST strl {strh
'vids'/'MJPG', strf BITMAPINFOHEADER}}, LIST movi {'00dc' frame
chunks, word-aligned}, idx1 index). This closes the remaining
real-video-container gate in the multimodal surface: container parse
AND per-frame image decode are both real bytes end-to-end.

The reader walks the chunk tree defensively and raises ValueError for
anything outside the supported subset (missing headers, non-MJPG
streams, truncated chunks) — callers quarantine, never crash a stage.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # word alignment
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def write_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Wrap per-frame JPEG bytes into a standard AVI MJPEG file."""
    if not frames:
        raise ValueError("at least one frame required")
    bufsize = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I4x4x4x4x",
        1_000_000 // fps,  # dwMicroSecPerFrame
        bufsize * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        bufsize,  # dwSuggestedBufferSize
        width,
        height,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate
        0,  # dwStart
        len(frames),  # dwLength
        bufsize,  # dwSuggestedBufferSize
        -1,  # dwQuality
        0,  # dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_frames = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_frames)
    # idx1: one entry per frame, offsets relative to the movi list's
    # type fourcc (the common convention)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(
            struct.pack("<4sII I", b"00dc", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for the chunks of a
    RIFF region, skipping alignment padding; raise on truncation."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (n,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + n > end:
            raise ValueError("truncated chunk")
        yield fourcc, pos + 8, n
        pos += 8 + n + (n % 2)


def read_avi_mjpeg(data: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI MJPEG file: returns (width, height, [jpeg frame
    bytes]). Raises ValueError for non-AVI, non-MJPG, or truncated
    input — the quarantine contract."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_len)
    if 8 + riff_len > len(data):
        raise ValueError("truncated RIFF payload")
    width = height = 0
    compression = b""
    frames: list[bytes] = []
    for fourcc, p, n in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        listtype = data[p : p + 4]
        if listtype == b"hdrl":
            for f2, p2, n2 in _walk(data, p + 4, p + n):
                if f2 == b"avih":
                    width, height = struct.unpack(
                        "<II", data[p2 + 32 : p2 + 40]
                    )
                elif f2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    for f3, p3, n3 in _walk(data, p2 + 4, p2 + n2):
                        if f3 == b"strh":
                            if data[p3 : p3 + 4] != b"vids":
                                raise ValueError("first stream not video")
                            compression = data[p3 + 4 : p3 + 8]
        elif listtype == b"movi":
            for f2, p2, n2 in _walk(data, p + 4, p + n):
                # only the declared video stream (stream 00) — a
                # multi-stream AVI writes 01dc/01wb chunks that must
                # not interleave foreign frames into the MJPEG list
                if f2[:2] == b"00" and f2[2:4] in (b"dc", b"db"):
                    frames.append(data[p2 : p2 + n2])
    if compression != b"MJPG":
        raise ValueError(f"unsupported codec {compression!r}")
    if not width or not height or not frames:
        raise ValueError("missing headers or frames")
    return int(width), int(height), frames
