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


#: multi-part public suffixes recognized by the built-in eTLD+1 rule.
#: Deliberately a SHORT built-in set covering the common ccTLD second
#: levels: real deployments broadcast-join the full Mozilla public
#: suffix list as a table; the extraction rule below is unchanged
#: either way (longest matching suffix + one label).
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.ar", "com.tr", "co.kr",
)


def host_col(url):
    """Lowercased host of a URL column, any port stripped. Empty string
    when no scheme://host prefix parses (same degradation contract as
    canonical_url_col)."""
    host = F.lower(F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
    return F.regexp_replace(host, r":\d+$", "")


def registered_domain_col(url, suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES):
    """Column expression: the registered domain (eTLD+1) of a URL — the
    grouping key of domain-level corpus curation (per-domain quality
    stats, blocklists, diversity caps). Rule: if the host's last two
    labels form a known multi-part suffix, keep three labels, else keep
    two; hosts with ≤2 labels pass through whole. Pure JVM split/array
    ops in the scan projection — zero shuffles, and an oracle can
    replay the identical rule."""
    host = host_col(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    dom = F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*suffixes), last3).otherwise(last2)
    )
    return F.when(host == "", F.lit("")).otherwise(dom)


def domain_rollup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    metric_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain corpus health: doc count, distinct hosts,
    distinct canonical URLs, and (optionally) the mean of a quality
    metric — the table a curation pass filters against (domain caps,
    low-quality-domain blocklists a la C4/RefinedWeb). ONE groupBy on
    the domain key; host/canonical/domain are all scan-projection
    expressions. Unparseable URLs (empty domain) are excluded. Returns
    (domain, n_docs, n_hosts, n_urls[, avg_metric])."""
    base = df.select(
        F.col(id_col),
        registered_domain_col(F.col(url_col)).alias("domain"),
        host_col(F.col(url_col)).alias("_host"),
        canonical_url_col(F.col(url_col)).alias("_canon"),
        *([F.col(metric_col)] if metric_col else []),
    ).filter(F.col("domain") != "")
    aggs = [
        F.count("*").alias("n_docs"),
        F.countDistinct("_host").alias("n_hosts"),
        F.countDistinct("_canon").alias("n_urls"),
    ]
    if metric_col:
        aggs.append(F.round(F.avg(metric_col), 6).alias("avg_metric"))
    return base.groupBy("domain").agg(*aggs)
