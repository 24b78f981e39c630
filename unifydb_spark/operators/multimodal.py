"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched pandas stages.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for large blobs) carried next to
typed metadata; decode/resize/frame-sample run inside ``mapInPandas`` so
bytes move driver-free, Arrow-batched, one Python worker per input split —
the *only* sane Python boundary at scale. Partitioning, schema, and batch
shape here are the real production plumbing; only the codec call itself is
stubbed (no PIL/ffmpeg in this container): ``decode_image`` raises
NotImplementedError when a real codec is requested, and the default
"metadata decode" derives deterministic pseudo-features (md5-seeded) so the
pipeline is end-to-end testable against a SQL oracle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, "
    "pseudo_width int, pseudo_height int"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    (stand-in for image bytes) + typed metadata struct."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.encode(t, "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(t).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decode path — requires an image codec, absent in this
    container. The mapInPandas plumbing around it is real and tested."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; install and replace this stub"
    )


def extract_features(binary_df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.
    Deterministic fake 'decode': content hash + md5-seeded pseudo
    dimensions (what a real decoder would read from the image header).
    ``real_decode=True`` routes through decode_image (stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if real_decode:
                    decode_image(raw)
                h = hashlib.md5(raw).hexdigest()
                out.append(
                    (
                        int(doc_id),
                        len(raw),
                        h,
                        64 + int(h[0], 16),
                        64 + int(h[1], 16),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_bytes", "content_md5",
                    "pseudo_width", "pseudo_height",
                ],
            )

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def features_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle for the fake decode (md5 over the same utf-8 bytes)."""
    return f"""
        SELECT doc_id,
               octet_length(encode({text_col})) AS n_bytes,
               md5({text_col}) AS content_md5,
               (64 + strpos('0123456789abcdef', substr(md5({text_col}), 1, 1)) - 1)::INT AS pseudo_width,
               (64 + strpos('0123456789abcdef', substr(md5({text_col}), 2, 1)) - 1)::INT AS pseudo_height
        FROM {table} ORDER BY doc_id
    """
