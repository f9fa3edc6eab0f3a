"""Dataset export — the terminal sink of a curation pipeline: the
curated corpus leaves Spark as deterministic, size-balanced shards plus
a verifiable manifest, so the training side can (a) shuffle-read shards
independently and (b) prove the bytes that arrived are the bytes that
were exported. Beyond-reference extension; the reference's result
writers (sparse zero-fill / exec results) stop at row delivery.

Shard assignment is the house md5 hash-band (operators/sampling) — the
same key that drives epoch_shuffle and hash_split — so export is
retry-stable (a re-run assigns every doc to the same shard; a writer
retry overwrites the same files) and growth-stable (new docs never move
old docs between shards). The manifest digest is an order-insensitive
mod-prime sum of per-row content hashes: any dropped, duplicated, or
altered row changes it, and both the summand (< 2^31) and the running
sum (< 2^31 x row count) stay inside BIGINT on any engine — a raw
sum of 60-bit hashes would silently wrap in Spark but promote to
HUGEINT in DuckDB, so the arithmetic is pinned mod-first by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_P = 2147483647  # 2^31 - 1 (Mersenne); summands < 2^31 keep sums in BIGINT


def _row_digest(id_col: str, content_col: str):
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.md5(F.col(content_col)))
    )
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % _P


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    shards: int = 8,
    seed: int | str = 42,
) -> DataFrame:
    """The manifest half of the export (separable so the driver gate can
    check it without a filesystem): per shard, row count, content bytes,
    and the order-insensitive content digest described in the module
    docstring. One shard-key groupBy; every expression is a JVM scan
    projection. Returns (shard, n_rows, n_chars, digest)."""
    from dataux_spark.operators.sampling import hash_frac

    shard = F.floor(hash_frac(id_col, seed) * shards).cast("int").alias("shard")
    return (
        df.select(
            shard,
            F.length(F.col(content_col)).alias("_chars"),
            _row_digest(id_col, content_col).alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_chars").alias("n_chars"),
            (F.sum("_h") % _P).cast("bigint").alias("digest"),
        )
    )


def export_shards(
    df: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    content_col: str = "text",
    shards: int = 8,
    seed: int | str = 42,
) -> None:
    """Write the corpus as shard=N parquet partitions plus a _manifest
    parquet the reader verifies against (shard_manifest above, computed
    from the SAME frame in the same job). One shuffle on the shard key;
    shard count chooses the file-size operating point (at 100 TB pick
    shards so each lands near the 1 GB parquet sweet spot — the manifest
    arithmetic is count-independent)."""
    from dataux_spark.operators.sampling import hash_frac

    shard = F.floor(hash_frac(id_col, seed) * shards).cast("int").alias("shard")
    (
        df.select("*", shard)
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{out_path}/data")
    )
    shard_manifest(df, id_col, content_col, shards, seed).write.mode(
        "overwrite"
    ).parquet(f"{out_path}/_manifest")


def verify_shards(spark: SparkSession, out_path: str,
                  id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """Reader-side integrity check: recompute each shard's count/digest
    from the data files and join against the stored manifest. Returns
    (shard, ok, n_rows, manifest_rows, digest, manifest_digest) — any
    dropped/duplicated/altered row flips ok to false for its shard."""
    data = spark.read.parquet(f"{out_path}/data")
    manifest = spark.read.parquet(f"{out_path}/_manifest")
    got = (
        data.select(
            "shard",
            F.length(F.col(content_col)).alias("_chars"),
            _row_digest(id_col, content_col).alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum("_h") % _P).cast("bigint").alias("digest"),
        )
    )
    m = manifest.select(
        "shard",
        F.col("n_rows").alias("manifest_rows"),
        F.col("digest").alias("manifest_digest"),
    )
    return got.join(m, "shard", "full").select(
        "shard",
        (
            F.col("n_rows").eqNullSafe(F.col("manifest_rows"))
            & F.col("digest").eqNullSafe(F.col("manifest_digest"))
        ).alias("ok"),
        "n_rows", "manifest_rows", "digest", "manifest_digest",
    )
