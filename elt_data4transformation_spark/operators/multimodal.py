"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema (binary payload +
metadata struct), partition-parallel batch iteration, stable output
schema. The actual media decode is STUBBED: the image/audio libraries
are not in this container, so ``decode_features`` computes
deterministic byte-level pseudo-features and the real decoder hook
raises NotImplementedError (clearly marked) — swap `_decode_real` for
PIL/ffmpeg at deployment and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, header_hex string, "
    "digest string, fake_width long, fake_height long"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a multimodal lake row: binary payload + typed metadata
    struct (mime, n_bytes) — the §1.1 lake-table shape with media."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, mime: str) -> dict:
    """Real media decode hook — NOT implemented in this container."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg; deterministic fake used instead"
    )


def _decode_fake(payload: bytes) -> dict:
    """Deterministic stand-in features derived only from the bytes."""
    return {
        "digest": hashlib.sha256(payload).hexdigest(),
        "fake_width": 64 + (len(payload) % 64) * 16,
        "fake_height": 64 + (len(payload) % 7) * 32,
    }


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, meta)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload)
                feats = _decode_fake(b)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "mime": meta["mime"],
                        "n_bytes": len(b),
                        "header_hex": b[:4].hex(),
                        **feats,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "n_bytes", "header_hex",
                    "digest", "fake_width", "fake_height",
                ],
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, offset long, frame_digest string"


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 256,
    every_nth: int = 2,
) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: treat the binary
    payload as fixed-stride frames, keep every ``every_nth`` frame, emit
    (doc_id, frame_idx, offset, md5 digest) per sampled frame.

    The real frame decode (ffmpeg seek + decode) is stubbed exactly like
    `_decode_real`; the batch iteration, explode shape (one input row ->
    many frame rows) and output schema are the production contract. Runs
    as Arrow-batched mapInPandas — at 100 TB each task samples its own
    partition's payloads; no shuffle until the caller aggregates."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max((len(b) - frame_size) // stride + 1, 0)
                for idx in range(0, n_frames, every_nth):
                    off = idx * stride
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "offset": off,
                            "frame_digest": hashlib.md5(
                                b[off : off + frame_size]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "offset", "frame_digest"],
            )

    return df.select("doc_id", "payload").mapInPandas(fn, schema=FRAME_SCHEMA)
