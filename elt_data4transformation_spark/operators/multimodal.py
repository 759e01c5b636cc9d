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
