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
altered row changes it. Because modular addition distributes over
partial sums, the digest is computed as a TWO-LEVEL aggregate — rows
fold into _B sub-buckets per shard with `% P` applied to each partial,
then the _B partials (each < 2^31) fold with a final `% P` — so the
running sum is bounded by construction: the inner sum wraps only if a
single (shard, bucket) pair exceeds 2^32 rows, i.e. a shard of ~1.8e13
rows, and the outer sum peaks below 2^43. A single-level raw sum of
the 31-bit summands would wrap int64 at 2^32 rows per shard (~4.3B —
reachable at the 100 TB scale this module targets) while DuckDB
promotes to HUGEINT, silently diverging; the mod-first two-level shape
makes the arithmetic identical on any engine at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_P = 2147483647  # 2^31 - 1 (Mersenne); summands < 2^31 keep sums in BIGINT
_B = 4096  # digest sub-buckets per shard; bounds every partial sum (see above)


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
    docstring. Two groupBys, but the second runs over only shards x _B
    rows (the first is map-side combined), so the cost is one shuffle of
    pre-aggregated partials; every expression is a JVM scan projection.
    Returns (shard, n_rows, n_chars, digest)."""
    from dataux_spark.operators.sampling import hash_frac

    shard = F.floor(hash_frac(id_col, seed) * shards).cast("int").alias("shard")
    return (
        df.select(
            shard,
            F.length(F.col(content_col)).alias("_chars"),
            _row_digest(id_col, content_col).alias("_h"),
        )
        .groupBy("shard", F.pmod(F.col("_h"), F.lit(_B)).alias("_b"))
        .agg(
            F.count("*").alias("_n"),
            F.sum("_chars").alias("_c"),
            (F.sum("_h") % _P).alias("_hp"),
        )
        .groupBy("shard")
        .agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_c").alias("n_chars"),
            (F.sum("_hp") % _P).cast("bigint").alias("digest"),
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
            _row_digest(id_col, content_col).alias("_h"),
        )
        .groupBy("shard", F.pmod(F.col("_h"), F.lit(_B)).alias("_b"))
        .agg(F.count("*").alias("_n"), (F.sum("_h") % _P).alias("_hp"))
        .groupBy("shard")
        .agg(
            F.sum("_n").alias("n_rows"),
            (F.sum("_hp") % _P).cast("bigint").alias("digest"),
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
