"""Web-corpus URL hygiene — canonicalization and URL-keyed dedup.

Crawl-scale pipelines dedup by canonical URL before any content pass
(one fetch of the same page arrives under dozens of spellings: scheme
case, www., default ports, trailing slashes, tracking params, fragment,
param order). Beyond-reference extension: the reference's url builtins
(qlbridge urlmain/urlminusqs, registered in functions/registry.py for
dialect parity) operate per-row in Python; these operators are the
corpus-scale counterpart — pure JVM regexp/array expressions that run in
the scan projection with zero shuffles, and an RE2-compatible rule set
so an oracle on any engine replays them byte-for-byte.

Canonical form (host-keyed, scheme dropped — http/https duplicates fold):
  host:   lowercased, leading "www." and default :80/:443 stripped
  path:   trailing slashes stripped (case preserved — paths are
          case-sensitive on most origins)
  query:  tracking params dropped (utm_*, fbclid, gclid, ref, mc_[ce]id),
          empties dropped, remainder SORTED so param order can't split a
          group; omitted entirely when nothing survives
  fragment: dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: dropped query-param key patterns (anchored at the key, RE2-safe)
TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "ref", "mc_[ce]id")


def canonical_url_col(url, drop_params: tuple[str, ...] = TRACKING_PARAMS):
    """Column expression: canonical key for a URL column (see module doc).
    Malformed input degrades gracefully — no scheme/host means empty host
    and the raw string is not guessed at (a crawl pipeline filters those
    rows on `url_canon != ''`)."""
    host = F.lower(F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    pat = "^(" + "|".join(drop_params) + ")="
    kept = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"),
            lambda p: (~p.rlike(pat)) & (p != ""),
        )
    )
    q = F.array_join(kept, "&")
    return F.when(
        host == "", F.lit("")
    ).otherwise(
        F.concat(
            host,
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        )
    )


def canonicalize_urls(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(id, url_canon) — scan projection, zero shuffle."""
    return df.select(
        F.col(id_col), canonical_url_col(F.col(url_col)).alias("url_canon")
    )


def url_dedup_keepers(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-keyed exact dedup: one row per canonical URL with the keeper
    (smallest id — deterministic) and the duplicate count. ONE groupBy on
    the canonical key (uniform md5-grade key distribution at crawl scale;
    a hot canonical key would mean billions of literal same-URL rows,
    which upstream fetch dedup precludes). Rows with no parseable host
    (url_canon = '') are excluded — they cannot be meaningfully keyed."""
    return (
        canonicalize_urls(df, url_col, id_col)
        .filter(F.col("url_canon") != "")
        .groupBy("url_canon")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
    )
