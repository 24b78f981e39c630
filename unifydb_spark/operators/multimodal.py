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


RESIZE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, out_w int, out_h int, "
    "out_bytes bigint, resized_md5 string"
)


def resize_images(
    binary_df: DataFrame, out_w: int = 224, out_h: int = 224
) -> DataFrame:
    """Arrow-batched resize stage. The real codec call is stubbed (no
    PIL here) — the deterministic fake keeps the byte-budget arithmetic
    a real resize has (output capped at out_w*out_h*3 RGB bytes) and
    derives the output digest from (input digest, target dims) so the
    whole stage is oracle-checkable. Batch shape/schema/partitioning are
    the production plumbing: one row in, one row out, bytes never leave
    the executor."""
    w, h = int(out_w), int(out_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                digest = hashlib.md5(raw).hexdigest()
                resized = hashlib.md5(
                    (digest + f"|{w}x{h}").encode()
                ).hexdigest()
                out.append((int(doc_id), n, w, h, min(n, w * h * 3), resized))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_bytes", "out_w", "out_h",
                    "out_bytes", "resized_md5",
                ],
            )

    return binary_df.mapInPandas(run, schema=RESIZE_SCHEMA)


def resize_sql(
    table: str = "documents",
    text_col: str = "text",
    out_w: int = 224,
    out_h: int = 224,
) -> str:
    w, h = int(out_w), int(out_h)
    return f"""
        SELECT doc_id, octet_length(encode({text_col})) AS n_bytes,
               {w} AS out_w, {h} AS out_h,
               least(octet_length(encode({text_col})), {w * h * 3}) AS out_bytes,
               md5(md5({text_col}) || '|{w}x{h}') AS resized_md5
        FROM {table} ORDER BY doc_id
    """


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, ts_ms bigint, frame_md5 string"
)


def frame_sample(
    video_df: DataFrame, every_n: int = 24
) -> DataFrame:
    """Frame sampling over synthetic video rows (payload + fps +
    duration_s metadata): emit one row per sampled frame — frame index,
    millisecond offset, per-frame digest. One input row fans out to
    n_frames/every_n output rows INSIDE the Arrow batch (the 1→N shape a
    real ffmpeg frame extractor has); no shuffle, no driver involvement,
    output size is bounded by duration*fps/every_n per video. The frame
    'decode' is the deterministic digest fake (no ffmpeg in container);
    everything else is the production plumbing."""
    step = int(every_n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, fps, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["fps"], pdf["duration_s"]
            ):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                total = int(fps) * int(dur)
                for frame in range(0, total, step):
                    out.append(
                        (
                            int(doc_id),
                            frame,
                            frame * 1000 // int(fps),
                            hashlib.md5(
                                (digest + f"#{frame}").encode()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "ts_ms", "frame_md5"]
            )

    return video_df.mapInPandas(run, schema=FRAME_SCHEMA)


def frame_sample_sql(
    table: str = "documents",
    text_col: str = "text",
    fps_expr: str = "24",
    duration_expr: str = "1 + doc_id % 30",
    every_n: int = 24,
) -> str:
    step = int(every_n)
    return f"""
        WITH v AS (
          SELECT doc_id, md5({text_col}) AS digest,
                 CAST({fps_expr} AS BIGINT) AS fps,
                 CAST({duration_expr} AS BIGINT) AS duration_s
          FROM {table}
        )
        SELECT doc_id, frame_idx, frame_idx * 1000 // fps AS ts_ms,
               md5(digest || '#' || CAST(frame_idx AS VARCHAR)) AS frame_md5
        FROM (
          SELECT doc_id, digest, fps,
                 unnest(range(0, fps * duration_s, {step})) AS frame_idx
          FROM v
        )
        ORDER BY doc_id, frame_idx
    """


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
