"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (the reference carries only four scalar types,
`/root/reference/src/values/value.rs:4-12`). Design for 100 TB media:

- media rows are ``(id, media_type, payload BINARY, meta STRUCT)`` — the
  payload is opaque to Spark; all pruning happens on the typed metadata
  columns, so a metadata-only query never reads payload bytes (Parquet
  column pruning).
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: whole partitions stream through Python in
  columnar batches, never row-at-a-time.
- the actual codec step is STUBBED (no image/audio libs in this
  environment): `decode_stub` derives deterministic pseudo-features from
  the payload bytes. The Spark-side plumbing — schema, batch iteration,
  partitioning — is real and tested; swap `decode_stub` for a PIL/ffmpeg
  call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a media table. Payload is opaque; meta is typed and prunable.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),  # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("declared_w", T.IntegerType()),
        T.StructField("declared_h", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. REPLACE WITH a real codec (PIL/ffmpeg)
    in production — this environment has no media libraries.

    The fake is arithmetic on the byte stream so the DuckDB oracle can
    reproduce it: width/height derive from byte length, checksum is the
    sum of all byte values.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (n % 64) + 16,
        "height": ((n // 64) % 64) + 16,
        "checksum": sum(payload),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    ``mapInPandas``: each partition arrives as an iterator of columnar
    batches; we decode batch-at-a-time. No shuffle — features inherit the
    media table's partitioning.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized over the whole Arrow batch: one concatenated byte
            # buffer + reduceat, instead of per-row Python `sum(payload)`
            # (10-100x at real payload sizes).
            payloads = pdf["payload"]
            n = payloads.map(len).to_numpy(dtype=np.int64)
            if len(payloads):
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                starts = np.zeros(len(n), dtype=np.int64)
                np.cumsum(n[:-1], out=starts[1:])
                # reduceat misbehaves on zero-length segments; guard them.
                checksum = np.zeros(len(n), dtype=np.int64)
                nz = n > 0
                if nz.any():
                    seg = np.add.reduceat(buf.astype(np.int64), starts[nz])
                    # reduceat sums start[i]..start[i+1]; trailing segment
                    # runs to the end of buf, which is exactly payload end.
                    checksum[nz] = seg
            else:
                checksum = np.zeros(0, dtype=np.int64)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n,
                "width": ((n % 64) + 16).astype(np.int32),
                "height": (((n // 64) % 64) + 16).astype(np.int32),
                "checksum": checksum,
            })

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage stub: passes payload through, records the target dims
    in metadata. A real implementation decodes, resamples, re-encodes
    inside the same mapInPandas batch loop."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = out["meta"].map(
                lambda m: {**(m if isinstance(m, dict) else m.asDict()),
                           "declared_w": target_w, "declared_h": target_h}
            )
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    "frame" (every_n_bytes stride through the payload). Demonstrates the
    1→N row fan-out shape of real frame extraction."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.IntegerType()),
        T.StructField("frame_byte", T.IntegerType()),
    ])

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((mid, idx, off, payload[off]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_off", "frame_byte"])

    return media.mapInPandas(_sample, schema=out_schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: project the synthetic `documents` table into a media table
    (text bytes as payload) so the multimodal plumbing is exercised on the
    driver fixtures without real image data."""
    source = F.col("source") if "source" in docs.columns else F.lit("unknown")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            source.alias("source"),
            F.lit(0).alias("declared_w"),
            F.lit(0).alias("declared_h"),
        ).alias("meta"),
    )
