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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, ts_ms bigint, frame binary"


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    decoder: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame-sampling stage: one (payload, meta) row → `n_frames` rows at
    evenly spaced timestamps — the video/audio analog of explode, run as an
    Arrow-batched mapInPandas so payload bytes stay executor-side.

    A real deployment's `decoder` seeks the container per timestamp
    (ffmpeg-style) and returns the decoded frame; the default stub emits a
    deterministic 16-byte md5-derived fake frame (codec libs are not in
    this container — the Spark plumbing, schema, and batch shape are real).
    `duration_ms` falls back to payload length (1 byte ≈ 1 ms) when the
    metadata lacks it, so ts_ms = frame_idx * duration // n_frames is
    deterministic and oracle-checkable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for _id, payload, meta in zip(pdf[id_col], pdf["payload"], pdf["meta"]):
                b = bytes(payload) if payload is not None else b""
                dur = None if meta is None else meta.get("duration_ms")
                if dur is None:
                    dur = len(b)
                for i in range(n_frames):
                    out["doc_id"].append(_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * int(dur) // n_frames)
                    out["frame"].append(
                        decoder(b, i) if decoder is not None
                        else hashlib.md5(b + bytes([i % 256])).digest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


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


def _fake_luma_grid(payload: bytes) -> list[float]:
    """Deterministic 64-cell stand-in for decode→grayscale→8x8 downsample:
    md5-expanded payload bytes. Byte-identical payloads collide exactly;
    a real decoder makes VISUALLY-near payloads collide nearly — either
    way the downstream banding operates on a 64-bit fingerprint."""
    import hashlib

    cells: list[float] = []
    h = payload or b"\x00"
    while len(cells) < 64:
        h = hashlib.md5(h).digest()
        cells.extend(float(b) for b in h)
    return cells[:64]


def perceptual_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """64-bit perceptual hash per (payload, meta) row — the image-dedup
    fingerprint (pHash family): the decoder yields a 64-cell luma grid
    (real deployment: decode → grayscale → 8x8 downsample, or DCT
    low-frequency block for classic pHash), and bit i is set iff
    grid[i] > mean(grid). Runs as Arrow-batched mapInPandas; payload
    bytes never cross the driver. Returns (<id_col>, phash) — the id
    column keeps its input name and type."""
    dec = decoder
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            mimes = pdf["meta"].map(lambda m: m["mime"] if m is not None else None)
            for _id, payload, mime in zip(pdf[id_col], pdf["payload"], mimes):
                b = bytes(payload) if payload is not None else b""
                grid = dec(b, mime) if dec is not None else _fake_luma_grid(b)
                mean = sum(grid) / len(grid)
                h = 0
                for i, v in enumerate(grid[:64]):
                    if v > mean:
                        h |= 1 << i
                # store as signed 64-bit (Spark long)
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(_id)
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return df.mapInPandas(run, schema=f"`{id_col}` {id_type}, phash long")


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 8,
    decoder: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """Multimodal near-dup pairs: perceptual hashes fed through the SAME
    combination-blocked hamming join as text SimHash
    (dedup.hamming_pairs, WWW'07 — growing key cardinality, so the
    candidate stage stays linear at corpus scale) — one decode pass, one
    banded shuffle, never n² over payloads. Returns (id_a, id_b,
    hamming)."""
    from dataux_spark.operators.dedup import hamming_pairs

    hashes = perceptual_hash(df, id_col, decoder).select(
        F.col(id_col).alias("_id"), "phash"
    )
    return hamming_pairs(hashes, "phash", max_hamming, chunks)


def curate_media_metadata(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    bytes_col: str = "n_bytes",
    min_side: int = 64,
    max_aspect: float = 2.5,
    max_bytes: int = 20_000_000,
) -> DataFrame:
    """Metadata-stage media curation — the gate an image/video pipeline
    runs BEFORE any decode is scheduled (decoding is the expensive step;
    a 100 TB crawl drops 30-50% of media on metadata alone, so the gate
    must run on the typed metadata columns, never the payload): keep =
    both sides >= min_side AND aspect ratio within [1/max_aspect,
    max_aspect] AND payload under max_bytes. Alongside the flag, the two
    labels a training mix is stratified on: aspect bucket
    (portrait/landscape/square at the 5% tolerance used by common
    dataset cards) and resolution tier by min side (LAION-style
    <256 / 256-511 / 512-1023 / >=1024 steps).

    Pure JVM CASE arithmetic in the scan projection — zero shuffles,
    total labeling (a row with NULL metadata keeps keep=0 and tier
    'unknown' rather than disappearing). Returns the input plus
    (aspect_bucket, res_tier, keep)."""
    w, h, b = F.col(width_col), F.col(height_col), F.col(bytes_col)
    ratio = w.cast("double") / h
    ok = (
        w.isNotNull() & h.isNotNull() & b.isNotNull()
        & (F.least(w, h) >= min_side)
        & (ratio >= 1.0 / max_aspect) & (ratio <= max_aspect)
        & (b <= max_bytes)
    )
    aspect = (
        F.when(w.isNull() | h.isNull(), "unknown")
        .when(ratio > 1.05, "landscape")
        .when(ratio < 0.95, "portrait")
        .otherwise("square")
    )
    side = F.least(w, h)
    # least() skips NULLs (returns the surviving operand), so the unknown
    # tier must test the operands, not the least
    tier = (
        F.when(w.isNull() | h.isNull(), "unknown")
        .when(side < 256, "lt256")
        .when(side < 512, "256")
        .when(side < 1024, "512")
        .otherwise("1024")
    )
    return df.select(
        "*",
        aspect.alias("aspect_bucket"),
        tier.alias("res_tier"),
        F.coalesce(ok.cast("int"), F.lit(0)).alias("keep"),
    )
