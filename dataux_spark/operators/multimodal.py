"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that must be right at 100 TB):
  - A modality column is `binary` payload + a metadata struct
    (mime/width/height/duration/sample_rate). Payloads ride in parquet as
    byte arrays; predicates and joins touch only metadata, so column
    pruning keeps scans payload-free until a decode stage actually needs
    bytes.
  - Decode / feature-extract / resize / frame-sample run as Arrow-batched
    `mapInPandas` stages: per-partition batch iterators, payload bytes
    never cross the driver.
  - This container has no image/audio libs, so the actual codec call is
    stubbed (`decoder=` injection point, deterministic fake by default;
    a real deployment passes e.g. a PIL/ffmpeg-backed callable). The
    Spark-side plumbing — schema, batching, partitioning — is real and
    tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MODALITY_META_SCHEMA = (
    "mime string, width int, height int, duration_ms int, sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, digest string, "
    "feat array<double>"
)


def attach_binary_payload(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Fixture builder: wrap a text column as a fake image payload with a
    metadata struct — stands in for real (payload, metadata) parquet
    columns, exercising the same schema and pruning behavior."""
    payload = F.encode(F.col(content_col), "UTF-8")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(content_col)) % 640 + 1).cast("int").alias("width"),
        (F.length(F.col(content_col)) % 480 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes, mime: str) -> list[float]:
    """Deterministic stand-in for a codec: 4 moments of the byte stream.
    A real decoder (PIL/torchaudio/ffmpeg) plugs in via `decoder=`;
    raising NotImplementedError there is also acceptable behavior for
    unsupported mimes."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    s = sum(payload)
    mean = s / n
    var = sum((b - mean) ** 2 for b in payload) / n
    return [float(n), round(mean, 6), round(var, 6), float(payload[0])]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder: Callable[[bytes, str], list[float]] = _fake_decode,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode/feature stage over (payload, meta) via mapInPandas.

    Arrow batches stream per partition; the decoder sees raw bytes + mime.
    Output: id, mime, n_bytes, md5 digest, feature vector."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            mimes = pdf["meta"].map(lambda m: m["mime"] if m is not None else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": mimes,
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feat": [
                        decoder(bytes(b) if b is not None else b"", m)
                        for b, m in zip(payloads, mimes)
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage placeholder: real impl maps payload→payload with a
    codec inside mapInPandas (identical plumbing to extract_features).
    Here: metadata-only rewrite + payload passthrough, preserving schema."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )
