"""The training-data prep flow as a runnable script — run with:

    python3 examples/corpus_prep.py

Profiles the corpus, then executes the composed prep pipeline (URL
dedup -> boilerplate-line removal -> model-scored quality gate ->
fingerprint dedup -> near-dup drop -> stratified resample ->
train/val/test split) and writes the split manifests to a temp dir.
Every stage is a library operator; see dataux_spark/operators/."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataux_spark import get_spark
from dataux_spark.operators.dedup import prefix_jaccard_pairs, tokens
from dataux_spark.operators.profile import column_profile, equi_width_histogram
from dataux_spark.operators.sampling import hash_split, stratified_hash_sample
from dataux_spark.queries import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("corpus-prep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, SF_DIR, "documents")

    print("== corpus profile ==")
    column_profile(docs, ["doc_id", "n_chars", "lang", "source"]).show()
    equi_width_histogram(docs, "n_chars", 8).show()

    print("== data contracts (expectations gate) ==")
    from dataux_spark.operators.quality import (
        Expectation,
        expectation_report,
        split_on_expectations,
    )

    rules = [
        Expectation("text_nonempty", "text IS NOT NULL AND length(text) > 0", "warn"),
        Expectation("len_in_range", "n_chars BETWEEN 60 AND 500", "drop"),
        Expectation("lang_known", "lang IN ('en','es','de','fr')", "drop"),
    ]
    expectation_report(docs, rules).show(truncate=False)
    docs, quarantined = split_on_expectations(docs, rules)
    print(f"quarantined {quarantined.count()} rows; they carry their violations:")
    quarantined.select("doc_id", F.array_join("violations", ",").alias("why")).show(3)

    print("== crawl hygiene: URL dedup, boilerplate lines, model score ==")
    from dataux_spark.operators.text import (
        hashed_linear_quality,
        remove_boilerplate_lines,
    )
    from dataux_spark.operators.web import url_dedup_keepers

    # the fixture has no URL column — derive a deterministic one the way
    # a crawl manifest would carry it, then keep only URL-dedup keepers
    with_urls = docs.withColumn(
        "url",
        F.concat(F.lit("https://www.site"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".com/doc/"), (F.col("doc_id") % 150).cast("string"),
                 F.lit("/?utm_source=crawl")),
    )
    keepers = url_dedup_keepers(with_urls, "url", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    print(f"URL dedup: {docs.count()} docs -> {keepers.count()} keepers")
    docs = docs.join(keepers, "doc_id")

    print("== domain-level curation: rollup, diversity cap, PageRank trust ==")
    from dataux_spark.operators.graph import pagerank
    from dataux_spark.operators.sampling import cap_per_group
    from dataux_spark.operators.web import domain_rollup, registered_domain_col

    domain_rollup(with_urls, "url", "doc_id", metric_col="n_chars").show()
    with_dom = with_urls.withColumn("domain", registered_domain_col(F.col("url")))
    capped = cap_per_group(with_dom, "domain", "doc_id", 100)
    print(f"domain cap (<=100/domain): {with_dom.count()} -> {capped.count()}")
    # link graph between domains (derived here; a crawl carries real edges)
    edges = with_dom.select(
        F.col("domain").alias("src"),
        F.concat(F.lit("site"), ((F.col("doc_id") + 1) % 3).cast("string"),
                 F.lit(".com")).alias("dst"),
    )
    print("domain trust (3-iteration PageRank):")
    pagerank(edges, iters=3).orderBy(F.col("rank").desc()).show()
    cleaned = remove_boilerplate_lines(docs, "text", "doc_id", min_docs=3)
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )
    scored = hashed_linear_quality(docs, "text", "doc_id", threshold=-0.05)
    scored.groupBy("keep").count().show()
    docs = docs.join(scored.filter("keep = 1").select("doc_id"), "doc_id")

    print("== prep pipeline ==")
    base = docs.select(
        "doc_id", "text", "lang", "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))).alias("fp"),
    ).filter(F.col("n_tokens") >= 30)
    from pyspark.sql import Window as W

    w = W.partitionBy("fp").orderBy(F.col("n_chars").desc(), "doc_id")
    uniq = base.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    # prefix-filter candidates (lang-restricted in the join): identical
    # pair set to blocked all-pairs, but linear — lang blocks alone grow
    # with the corpus and go quadratic (SCALE.md round-8)
    pairs = prefix_jaccard_pairs(uniq, "text", "doc_id", threshold=0.5,
                                 block_cols=["lang"])
    drops = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    surv = uniq.join(drops, "doc_id", "left_anti")
    samp = stratified_hash_sample(surv, "lang", {"en": 0.5, "de": 1.0}, "doc_id",
                                  default_rate=0.8)
    split = hash_split(samp, "doc_id")
    split.groupBy("lang", "split").count().orderBy("lang", "split").show()

    print("== target-aware selection (DSIR) + semantic dedup ==")
    from dataux_spark.operators.dedup import semantic_dedup
    from dataux_spark.operators.text import dsir_select_topk

    picked = dsir_select_topk(
        surv, "text", "doc_id", F.col("lang") == "en", k=200, dim=512
    )
    print(f"DSIR selection: {surv.count()} survivors -> {picked.count()} target-like")

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter("vec_id < 8").select("vec_id", "embedding").collect()
    ]
    sem = semantic_dedup(emb, "embedding", "vec_id", cents, threshold=0.95)
    sem.groupBy("keep").count().show()

    print("== lexical serving index (BM25, bucket-pruned probes) ==")
    from dataux_spark.operators.text import bm25_index_topk, build_bm25_index

    idx = tempfile.mkdtemp(prefix="bm25_idx_")
    build_bm25_index(docs, "text", "doc_id", idx)
    bm25_index_topk(spark, idx, ["spark", "query", "join"], "doc_id", k=5).show()

    out = tempfile.mkdtemp(prefix="corpus_prep_")
    split.select("doc_id", "lang", "split").write.partitionBy("split").parquet(f"{out}/manifest")
    print(f"manifest written to {out}/manifest")

    print("== provenance linkage (symmetric-delete blocking) ==")
    from dataux_spark.operators.linkage import blocked_entity_match

    registry = docs.select(
        F.col("doc_id").alias("rec_id"), "lang",
        # a dirtied source registry: case noise on half, a stray char on
        # the rest — the master-data join every corpus pipeline hits
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.concat(F.col("source"), F.lit("x"))).alias("source"),
    )
    matches = blocked_entity_match(
        docs.select("doc_id", "lang", "source"), registry,
        block_on=["lang"], fuzzy_col="source",
        left_id="doc_id", right_id="rec_id",
        max_distance=1, symdelete=True,  # lang alone would go quadratic
    )
    print(f"linked {matches.count()} docs to the dirty registry")

    print("== shard export + reader-side integrity verify ==")
    from dataux_spark.operators.export import export_shards, verify_shards

    export_shards(samp, f"{out}/shards", shards=4)
    v = verify_shards(spark, f"{out}/shards")
    v.orderBy("shard").show()
    assert all(r.ok for r in v.collect()), "export integrity check failed"
    print(f"verified export at {out}/shards")


if __name__ == "__main__":
    main()
