"""Pure-stdlib IMA ADPCM WAV codec: COMPRESSED audio, no ffmpeg.

Closes the compressed-audio decode gate the same no-external-libs way
the JPEG/AVI/PNG/PDF gates were closed: IMA (DVI) ADPCM is a publicly
documented codec (IMA Digital Audio Pack, WAV format tag 0x11) that
stores 4 bits per sample with an adaptive step size — the classic
telephony/game-audio compression. The writer emits a standard mono
ADPCM WAV (fmt tag 0x11 with wSamplesPerBlock extension + the
mandatory fact chunk); the reader parses the RIFF chunks and decodes
block by block (4-byte block header: int16 predictor + step index,
then low-nibble-first 4-bit codes). Lossy by design: tests assert
error bounds against the known source PCM, plus corrupt-input
quarantine.
"""

from __future__ import annotations

import struct

import numpy as np

# public IMA ADPCM tables
_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]

BLOCK_ALIGN = 256  # bytes per ADPCM block (common choice)
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def _encode_nibble(sample: int, state: list) -> int:
    """Quantize one sample against (predictor, index) state, updating
    the state with the DECODER's reconstruction (encoder and decoder
    track identical state — the ADPCM invariant)."""
    pred, index = state
    step = _STEPS[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    # reconstruct exactly like the decoder
    delta = step >> 3
    if nib & 1:
        delta += step >> 2
    if nib & 2:
        delta += step >> 1
    if nib & 4:
        delta += step
    pred = _clamp16(pred - delta if nib & 8 else pred + delta)
    index = max(0, min(88, index + _INDEX_ADJ[nib & 7]))
    state[0], state[1] = pred, index
    return nib


def write_wav_adpcm(pcm: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a mono int16 PCM array as a standard IMA ADPCM WAV."""
    pcm = np.asarray(pcm, dtype=np.int64)
    blocks = bytearray()
    i = 0
    state = [int(pcm[0]) if len(pcm) else 0, 0]
    n = len(pcm)
    while i < n:
        # block header carries the first sample verbatim
        state[0] = _clamp16(int(pcm[i]))
        blocks += struct.pack("<hBB", state[0], state[1], 0)
        i += 1
        nibs = []
        for _ in range(SAMPLES_PER_BLOCK - 1):
            if i < n:
                nibs.append(_encode_nibble(int(pcm[i]), state))
                i += 1
            else:
                nibs.append(0)  # pad the final block
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            blocks.append(lo | (hi << 4))
    n_blocks = (len(blocks) + BLOCK_ALIGN - 1) // BLOCK_ALIGN
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11,  # WAVE_FORMAT_IMA_ADPCM
        1,  # mono
        rate,
        rate * BLOCK_ALIGN // SAMPLES_PER_BLOCK,  # avg bytes/sec
        BLOCK_ALIGN,
        4,  # bits per sample
        2,  # cbSize
        SAMPLES_PER_BLOCK,
    )
    fact = struct.pack("<I", n)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    assert n_blocks * BLOCK_ALIGN >= len(blocks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_wav_adpcm(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono IMA ADPCM WAV: returns (sample_rate, int16 PCM
    array trimmed to the fact-chunk sample count). Raises ValueError
    for non-ADPCM or malformed input — the quarantine contract."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    n_samples = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (n,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + n > len(data):
            raise ValueError("truncated chunk")
        body = data[pos + 8 : pos + 8 + n]
        if cid == b"fmt ":
            if n < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"fact":
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            payload = body
        pos += 8 + n + (n % 2)
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _, block_align, bits = fmt
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (fmt tag {tag:#x})")
    if channels != 1 or bits != 4:
        raise ValueError("only mono 4-bit IMA ADPCM supported")
    out = []
    for b0 in range(0, len(payload), block_align):
        block = payload[b0 : b0 + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block")
        pred, index, _ = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError("invalid step index")
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = _STEPS[index]
                delta = step >> 3
                if nib & 1:
                    delta += step >> 2
                if nib & 2:
                    delta += step >> 1
                if nib & 4:
                    delta += step
                pred = _clamp16(pred - delta if nib & 8 else pred + delta)
                index = max(0, min(88, index + _INDEX_ADJ[nib & 7]))
                out.append(pred)
    pcm = np.array(out, dtype=np.int16)
    if n_samples is not None:
        if n_samples > len(pcm):
            raise ValueError("fact chunk exceeds decoded samples")
        pcm = pcm[:n_samples]
    return rate, pcm
