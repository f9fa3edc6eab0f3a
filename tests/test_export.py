"""Dataset export: deterministic shards, verifiable manifest."""

from pyspark.sql import functions as F

from dataux_spark.operators.export import (
    export_shards,
    shard_manifest,
    verify_shards,
)
from dataux_spark.queries import read_table

SF = "/root/testdata/sf0.001"


def test_export_roundtrip_verifies_and_is_lossless(spark, tmp_path):
    docs = read_table(spark, SF, "documents")
    out = str(tmp_path / "export")
    export_shards(docs, out, shards=4)
    v = verify_shards(spark, out).collect()
    assert len(v) == 4 and all(r.ok for r in v)
    # lossless: every doc_id survives exactly once across shards
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == docs.count()
    assert data.select("doc_id").distinct().count() == docs.count()


def test_verify_catches_tamper_and_loss(spark, tmp_path):
    docs = read_table(spark, SF, "documents")
    out = str(tmp_path / "export")
    export_shards(docs, out, shards=2)
    data = spark.read.parquet(f"{out}/data")
    # drop one row from shard 0 and rewrite that shard's data in place
    victim = data.filter(F.col("shard") == 0).select("doc_id").first().doc_id
    (
        data.filter(~((F.col("shard") == 0) & (F.col("doc_id") == victim)))
        .repartition("shard")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(f"{out}/data")
    )
    v = {r.shard: r.ok for r in verify_shards(spark, out).collect()}
    assert v[0] is False and v[1] is True


def test_shard_assignment_growth_stable(spark):
    docs = read_table(spark, SF, "documents")
    full = {r.shard: (r.n_rows, r.digest)
            for r in shard_manifest(docs, shards=4).collect()}
    # removing docs never MOVES a surviving doc to a different shard:
    # the kept half's per-shard counts are <= the full corpus's
    half = {r.shard: r.n_rows for r in
            shard_manifest(docs.filter(F.col("doc_id") % 2 == 0),
                           shards=4).collect()}
    assert all(half[s] <= full[s][0] for s in half)


def test_digest_two_level_fold_matches_flat_mod_sum(spark):
    """The digest is computed as a two-level aggregate (partial % P per
    sub-bucket, then % P over the partials) so the running sum is bounded
    at any shard size; modular addition distributes over the partials, so
    the VALUE must equal the flat per-row mod-sum — pinned here against a
    driver-side Python fold over the raw row digests."""
    from dataux_spark.operators.export import _P, _row_digest
    from dataux_spark.operators.sampling import hash_frac

    docs = read_table(spark, SF, "documents")
    shard = F.floor(hash_frac("doc_id", 42) * 4).cast("int").alias("shard")
    rows = docs.select(shard, _row_digest("doc_id", "text").alias("h")).collect()
    flat = {}
    for r in rows:
        flat[r.shard] = (flat.get(r.shard, 0) + r.h) % _P
    got = {r.shard: r.digest for r in shard_manifest(docs, shards=4).collect()}
    assert got == flat
