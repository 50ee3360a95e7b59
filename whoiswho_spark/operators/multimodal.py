"""Multimodal column plumbing: opaque BINARY payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
decode kernels are clearly-marked deterministic stubs — but the
Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partitioning) is real and tested. Swap `_fake_decode` for a real
decoder (PIL/ffmpeg) on a cluster with the libs installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, media_type string, "
    "width int, height int, checksum string"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives plausible
    dimensions from the payload hash. NOT a real decode — replace with
    PIL.Image.open when available."""
    if payload is None:
        payload = b""
    h = hashlib.md5(payload).hexdigest()
    return {
        "width": 64 + int(h[:4], 16) % 1984,
        "height": 64 + int(h[4:8], 16) % 1984,
        "checksum": h,
    }


def real_decode(payload: bytes):
    """The real decode path — gated on libraries absent here."""
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this environment; "
        "use _fake_decode-backed plumbing (extract_media_meta) or install "
        "PIL/ffmpeg on the cluster"
    )


def extract_media_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload BINARY) → typed metadata via mapInPandas: the batch
    shape, schema, and partition behavior of a real decode stage."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf[payload_col]
                    ],
                    "media_type": "image/fake",
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        decode_batches, schema=MEDIA_META_SCHEMA
    )
