"""Declared query inventory — one entry per operator class from SURVEY §2,
each with a DuckDB-oracle SQL twin for the driver's correctness gate.

Every query is written Spark-first (DataFrame API → Catalyst plans the
physical strategy). Column aliases match the oracle exactly; doubles that
aggregate over floating sums are rounded on BOTH sides so summation order
cannot flip the hash.

Scale notes (the point is 100 TB, tested at sf0.1):
  - groupBy/join columns are the natural shuffle keys; small dims
    (region/nation/supplier/customer at TPC-H ratios) stay under the
    broadcast threshold so joins plan as BroadcastHashJoin — no shuffle of
    the fact table.
  - top-k = orderBy().limit() → TakeOrderedAndProject (no global sort).
  - aggregations are partial+final (map-side combine) by construction.
  - filters/projections are pushed to the parquet scan (verified via
    .explain in tests/bench).

Reference citations per query are in each docstring (file:line into
/root/reference) so parity with the dataux test surface is checkable.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dataux_spark.operators.dedup import SATURATION_CAND_PER_DOC as _SAT
from dataux_spark.sqlutil import session_cache

# One kwargs source for every adaptive-router call site in this module AND
# for the route resolution in tools/explain_audit.py (ADVICE r10: the audit
# must resolve routes with the values the entries actually used, not
# re-typed literals that can silently desynchronize). Keys of *_BLOCKS are
# the registry entries that route; None = unblocked census.
ADAPTIVE_JACCARD_KW: dict = {"threshold": 0.5, "shingle_n": 3}
ADAPTIVE_JACCARD_BLOCKS: dict[str, list[str] | None] = {
    "dedup_prefix_jaccard": None,
    "dedup_clusters": ["lang"],
    "dedup_source_matrix": ["lang"],
    "dedup_savings_report": ["lang"],
}
ADAPTIVE_CONTAINMENT_KW: dict = {"threshold": 0.8, "shingle_n": 3}


def _prefix_candidate_pairs_ctes(threshold: float, g: str = "g",
                                 block: str | None = None) -> str:
    """DuckDB replay of the AllPairs prefix-filter candidate scheme
    (operators/dedup.prefix_tokens + prefix_jaccard_pairs) — the r12
    LINEAR-candidate oracle spelling for the near-dup families (VERDICT
    r11 item 4: the exact all-pairs `a JOIN b ON a._id < b._id` oracles
    ran ~10 min each at sf0.1, so those five entries were value-checked
    only at sf0.01 by the sweep). Emits CTEs tok/freq/ranked/prefix/cand
    chained off an existing gram CTE `g` with columns (_id, grams
    [, block]); `cand` is a DISTINCT (id_a, id_b) candidate set that is
    a SUPERSET of every pair with J >= threshold (same-`block` when
    given) by the prefix-filtering theorem, so an exact-Jaccard verify
    over `cand` equals the quadratic all-pairs answer — the oracle now
    replays the SAME candidate-then-verify shape the Spark operators
    use, at candidate-linear cost (~seconds at sf0.1 instead of
    minutes). The rarest-first (df asc, tok asc) prefix rank is the
    dedup_route_census oracle's proven spelling."""
    blk_sel = f", {block}" if block else ""
    blk_rank = f", t.{block}" if block else ""
    blk_cond = f" AND a.{block} = b.{block}" if block else ""
    return f"""tok AS (
      SELECT _id{blk_sel}, len(grams) AS sz, unnest(grams) AS tok FROM {g}
    ), freq AS (
      SELECT tok, count(*) AS df FROM tok GROUP BY tok
    ), ranked AS (
      SELECT t._id{blk_rank}, t.tok, t.sz,
             row_number() OVER (PARTITION BY t._id
                                ORDER BY f.df ASC, t.tok ASC) AS pos
      FROM tok t JOIN freq f USING (tok)
    ), prefix AS (
      SELECT _id{blk_sel}, tok FROM ranked
      WHERE pos <= sz - ceil({threshold} * sz) + 1
    ), cand AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM prefix a JOIN prefix b
        ON a.tok = b.tok AND a._id < b._id{blk_cond}
    )"""


def _containment_candidate_pairs_ctes(threshold: float, g: str = "g") -> str:
    """Containment twin of _prefix_candidate_pairs_ctes: the asymmetric
    prefix-filter candidate scheme (operators/dedup.containment_pairs).
    The CONTAINED side keeps its rarest-first prefix, the container side
    indexes ALL its shingles, and C(a→b) >= t forces |B| >= ceil(t·|A|)
    (size filter) plus a shared prefix token — so `cand` is a superset
    of every qualifying DIRECTIONAL pair and the exact containment
    verify over it equals the quadratic all-pairs answer."""
    return f"""tok AS (
      SELECT _id, len(grams) AS sz, unnest(grams) AS tok FROM {g}
    ), freq AS (
      SELECT tok, count(*) AS df FROM tok GROUP BY tok
    ), ranked AS (
      SELECT t._id, t.tok, t.sz,
             row_number() OVER (PARTITION BY t._id
                                ORDER BY f.df ASC, t.tok ASC) AS pos
      FROM tok t JOIN freq f USING (tok)
    ), prefix AS (
      SELECT _id, sz, tok FROM ranked
      WHERE pos <= sz - ceil({threshold} * sz) + 1
    ), cand AS (
      SELECT DISTINCT a._id AS id_a, t._id AS id_b
      FROM prefix a JOIN tok t USING (tok)
      WHERE a._id <> t._id AND t.sz >= ceil({threshold} * a.sz)
    )"""

# --------------------------------------------------------------------- io

_NANOS_TS = {"events": ["ts"]}  # parquet TIMESTAMP(NANOS) columns per table


def read_table(
    spark: SparkSession, sf_dir: str, name: str, fresh: bool = False
) -> DataFrame:
    """Read one driver table; converts nanos timestamps to µs (matches
    DuckDB's ns→µs truncation).

    `fresh=True` bypasses the memo and returns a frame with new attribute
    ids — required ONLY for frame-qualified self-joins of the same table
    (`a["k"] == b["k"]`), where the shared plan object would raise
    AMBIGUOUS_SELF_JOIN at analysis (loudly, at dev time). No current
    query needs it; column-name joins and subtree reuse are unaffected.

    The LAZY source frame is memoized per (session, dir, table) — r13
    optimization (guide §6 file listing/metadata): every
    `spark.read.parquet` call re-infers the schema from footers (~80 ms
    measured at sf0.1), and the bench re-builds each query's frame per
    timed run, so repeated metadata inference was ~15-20% of several
    per-query walls. A catalog-backed engine resolves a table name to a
    schema without touching storage — this memo is that catalog. It
    caches NO data or results: the returned DataFrame is an unexecuted
    plan, and every action on it scans the parquet afresh. The cache
    dies with the session object (stored as an attribute on it), so
    cross-session isolation (e.g. check.py --vanilla) is automatic. The
    driver testdata dirs are immutable; anything that mutates tables
    (DML COW copies, maintenance rewrites) works on its own temp paths
    and never reads them through here."""
    cache = session_cache(spark, "_dataux_read_cache")
    key = (sf_dir, name)
    if not fresh:
        cached = cache.get(key)
        if cached is not None:
            return cached
    if name in _NANOS_TS:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros(CAST(`{col}` DIV 1000 AS LONG))"))
    cache[key] = df
    return df


def _r2(c):  # stable money rounding
    return F.round(c, 2)


# ------------------------------------------------------------------ queries
# Each function: (spark, sf_dir) -> DataFrame.  ORACLE holds the DuckDB twin.

ORACLE: dict[str, str] = {}
_REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def _q(name: str, oracle: str | None = None):
    # the name must be an identifier — a SQL string here means the name
    # argument was dropped and the oracle slid into its place (a real
    # regression once: four entries silently lost their oracles)
    assert re.fullmatch(r"\w+", name), f"_q name is not an identifier: {name!r}"

    def deco(fn):
        assert fn.__name__.startswith(name) or name.startswith(fn.__name__), (
            f"_q name {name!r} does not match function {fn.__name__!r}"
        )
        _REGISTRY[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --- filters / projection (reference SURVEY §2.2) -------------------------

@_q(
    "point_filter",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 42",
)
def point_filter(spark, sf_dir):
    """Point predicate pushed to the parquet scan.
    Reference shape: WHERE author = "aaron" (backends/mongo/mgo_test.go:427-436)."""
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_q(
    "filter_and_or",
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
    "WHERE (o_orderstatus = 'F' AND o_totalprice > 150000) "
    "OR (o_orderstatus = 'O' AND o_totalprice < 1000)",
)
def filter_and_or(spark, sf_dir):
    """Nested AND/OR boolean tree (reference WHERE walkers,
    backends/elasticsearch/sqltoes.go:403-586)."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 1000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@_q(
    "filter_like",
    "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%green%'",
)
def filter_like(spark, sf_dir):
    """LIKE with %-wildcards (reference mgo_test.go:631-652)."""
    return (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%green%"))
        .select("p_partkey", "p_name")
    )


@_q(
    "filter_in",
    "SELECT c_custkey, c_mktsegment FROM customer "
    "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
)
def filter_in(spark, sf_dir):
    """IN list (reference mgo_test.go:654-670)."""
    return (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@_q(
    "filter_between",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
    "WHERE l_quantity BETWEEN 5 AND 10",
)
def filter_between(spark, sf_dir):
    """Numeric BETWEEN (reference mgo_test.go:694-716)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(5, 10))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@_q(
    "filter_between_dates",
    "SELECT o_orderkey, o_orderdate FROM orders "
    "WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-06-30 00:00:00'",
)
def filter_between_dates(spark, sf_dir):
    """Date BETWEEN incl. todate semantics (reference mgo_test.go:717-733)."""
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1996-01-01", "1996-06-30"))
        .select("o_orderkey", "o_orderdate")
    )


@_q(
    "field_vs_field",
    "SELECT count(*) AS ct FROM lineitem WHERE l_discount > l_tax",
)
def field_vs_field(spark, sf_dir):
    """Field-to-field predicate (reference: WHERE author != title →
    Mongo $where JS, backends/mongo/sql_to_mgo.go:532-539)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") > F.col("l_tax")).agg(F.count("*").alias("ct"))


# --- aggregation (reference SURVEY §2.4) ----------------------------------

@_q(
    "count_star",
    "SELECT count(*) AS ct FROM lineitem",
)
def count_star(spark, sf_dir):
    """count(*) (reference mgo_test.go:320-333; pushed to source when
    possible, mgo_results.go:112-119 — Spark: parquet row-group stats)."""
    return read_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("ct"))


@_q(
    "count_distinct",
    "SELECT count(DISTINCT l_partkey) AS dct, count(*) AS ct FROM lineitem",
)
def count_distinct(spark, sf_dir):
    """Exact distinct count. Reference exposes approximate `cardinality`
    (sqltoes.go:599-611); exact distinct is checked here (approx is not
    oracle-comparable), approx variant in cardinality_approx."""
    return read_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("dct"), F.count("*").alias("ct")
    )


@_q(
    "cardinality_approx",
    # r13 (VERDICT r12 item 4): converted from rows-only to a CONTRACT
    # oracle — the HLL estimate itself cannot be replayed cross-engine
    # (Spark HLL++ vs DuckDB's sketch differ by design), but the
    # CONTRACT "estimate within the configured 5% rsd of exact" is plain
    # SQL: the entry returns the exact count (replayable) beside the
    # bound-check BOOLEAN, so a drifting sketch now hash-mismatches
    # instead of passing a rows-only gate. Measured margin: relerr
    # 0.025/0.027/0.024 at sf0.001/0.01/0.1 vs the 0.05 bound.
    "SELECT count(DISTINCT l_partkey) AS exact_dct, "
    "CAST(count(*) AS BIGINT) AS ct, TRUE AS approx_ok FROM lineitem",
)
def cardinality_approx(spark, sf_dir):
    """cardinality(f) — approx distinct, the ES cardinality agg
    (reference backends/elasticsearch/sqltoes.go:599-611, es_test.go:192-227).
    Contract-checked (r13): the HLL++ estimate must land within the
    default 5% relative standard deviation of the exact count, computed
    in the SAME single aggregate (one corpus pass, both aggregates
    map-side combined); exact twin is count_distinct."""
    return read_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("exact_dct"),
        F.count("*").alias("ct"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey").cast("double")
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("approx_ok"),
    )


@_q(
    "agg_minmax_sum_avg",
    "SELECT round(min(l_extendedprice), 2) AS mn, round(max(l_extendedprice), 2) AS mx, "
    "round(sum(l_extendedprice), 2) AS sm, round(avg(l_extendedprice), 4) AS av FROM lineitem",
)
def agg_minmax_sum_avg(spark, sf_dir):
    """min/max/sum/avg single-value aggs (reference sqltoes.go:599-612)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        _r2(F.min("l_extendedprice")).alias("mn"),
        _r2(F.max("l_extendedprice")).alias("mx"),
        _r2(F.sum("l_extendedprice")).alias("sm"),
        F.round(F.avg("l_extendedprice"), 4).alias("av"),
    )


@_q(
    "group_by_agg",
    "SELECT l_returnflag, l_linestatus, count(*) AS ct, "
    "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
    "GROUP BY l_returnflag, l_linestatus",
)
def group_by_agg(spark, sf_dir):
    """Multi-column GROUP BY (reference mgo_test.go:599-613,
    cass_test.go:365-384). Spark: partial+final HashAggregate — the
    reference's explicit Partial/GroupByFinal split (planner/executor.go:
    104-110,150-155) is automatic here."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("ct"), _r2(F.sum("l_quantity")).alias("sum_qty"))
    )


@_q(
    "pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "round(sum(l_quantity), 2) AS sum_qty, "
    "round(sum(l_extendedprice), 2) AS sum_base_price, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
    "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
    "round(avg(l_quantity), 4) AS avg_qty, "
    "round(avg(l_extendedprice), 4) AS avg_price, "
    "round(avg(l_discount), 4) AS avg_disc, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the flagship scan+agg. All expressions stay inside
    whole-stage codegen; one shuffle on the (tiny-cardinality) group key."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
        _r2(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            )
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@_q(
    "revenue_filter",
    "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24",
)
def revenue_filter(spark, sf_dir):
    """TPC-H Q6 shape — selective filter + single agg; everything pushes
    to the scan except the product-sum."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "agg_over_expression",
    "SELECT round(avg(length(CAST(o_orderpriority AS VARCHAR))), 6) AS title_avg FROM orders",
)
def agg_over_expression(spark, sf_dir):
    """AVG(CHAR_LENGTH(CAST(x AS CHAR))) — agg over computed expression,
    polyfilled in the reference (mgo_test.go:383-408)."""
    return read_table(spark, sf_dir, "orders").agg(
        F.round(F.avg(F.length(F.col("o_orderpriority").cast("string"))), 6).alias("title_avg")
    )


@_q(
    "having",
    "SELECT o_custkey, count(*) AS ct FROM orders GROUP BY o_custkey HAVING count(*) >= 20",
)
def having(spark, sf_dir):
    """HAVING (reference recognized + polyfill-TODO, sql_to_cql.go:207-209;
    full semantics here)."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("ct"))
        .filter(F.col("ct") >= 20)
    )


@_q(
    "terms_topk",
    "SELECT o_orderpriority AS key, count(*) AS count FROM orders "
    "GROUP BY o_orderpriority ORDER BY count DESC, key LIMIT 3",
)
def terms_topk(spark, sf_dir):
    """terms(field, k) — ES terms agg shape (sqltoes.go:612-634,
    esresults.go:183-219): top-k keys with counts."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("key"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("key"))
        .limit(3)
    )


# --- sort / limit / top-k (reference SURVEY §2.5) -------------------------

@_q(
    "topk_order_limit",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def topk_order_limit(spark, sf_dir):
    """ORDER BY DESC + LIMIT → TakeOrderedAndProject, no global sort
    (reference mgo_test.go:755-778). o_orderkey tiebreak keeps it
    deterministic."""
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_q(
    "order_multi_offset",
    "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
    "ORDER BY o_orderdate, o_orderkey LIMIT 10 OFFSET 20",
)
def order_multi_offset(spark, sf_dir):
    """Multi-column ORDER BY + LIMIT + OFFSET (reference parses OFFSET,
    sql_to_mgo.go:220; full semantics here)."""
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(20)
        .limit(10)
    )


# --- joins (reference SURVEY §2.3) ----------------------------------------

@_q(
    "join_inner",
    "SELECT c.c_mktsegment, count(*) AS ct, round(sum(o.o_totalprice), 2) AS total "
    "FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_mktsegment",
)
def join_inner(spark, sf_dir):
    """2-way INNER equi-join — the reference's one join strategy
    (mgo_test.go:780-818, cross-source multi_backend_test.go:168-200).
    customer is sf-scaled, so no forced broadcast: Catalyst/AQE picks a
    broadcast join while the build side fits the threshold and degrades
    to a shuffle join at scale instead of OOMing (the reference's
    engine-side merge join exists for exactly this reason,
    planner/executor.go:84-96)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("ct"), _r2(F.sum("o_totalprice")).alias("total"))
    )


@_q(
    "join_3way",
    "SELECT n.n_name, count(*) AS ct, round(sum(l.l_extendedprice), 2) AS volume "
    "FROM lineitem l "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "GROUP BY n.n_name",
)
def join_3way(spark, sf_dir):
    """3-way join through two dims. nation is constant-size → explicit
    broadcast; supplier scales with the data, so its join strategy is
    left to Catalyst/AQE (broadcast under threshold, shuffle join
    beyond)."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("ct"), _r2(F.sum("l_extendedprice")).alias("volume"))
    )


@_q(
    "join_5way_regional_revenue",
    "SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'ASIA' "
    "GROUP BY n.n_name",
)
def join_5way_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape — 6-table join, structured so the region predicate
    reaches the big tables BEFORE the one large shuffle: region(ASIA)⋈nation
    is 5 rows, broadcast down to customer and supplier first (each shrinks
    ~5×), so the sf-scaled joins run on pre-reduced sides. Only the
    constant-size region/nation frames carry explicit broadcast hints;
    the sf-scaled sides (supplier, customer, orders, lineitem) are left
    to Catalyst/AQE so the plan degrades to shuffle joins instead of
    OOMing at 100×. At 100 TB the early region pruning is a 5× cut in
    shuffled bytes vs joining the dims last."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c2 = c.join(F.broadcast(asia), c.c_nationkey == asia.n_nationkey).select(
        "c_custkey", "c_nationkey"
    )
    o2 = o.join(c2, o.o_custkey == c2.c_custkey).select("o_orderkey", "c_nationkey")
    s2 = s.join(F.broadcast(asia), s.s_nationkey == asia.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey).select(
        "l_orderkey", "l_extendedprice", "l_discount", "s_nationkey", "n_name"
    )
    return (
        li2.join(
            o2,
            (li2.l_orderkey == o2.o_orderkey) & (li2.s_nationkey == o2.c_nationkey),
        )
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@_q(
    "q3_shipping_priority",
    "SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
    "o_orderdate "
    "FROM customer, orders, lineitem "
    "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND o_orderdate < TIMESTAMP '1997-06-30' AND l_shipdate > TIMESTAMP '1997-06-30' "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, l_orderkey LIMIT 10",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment + two date filters, 3-way join, top-10 by
    revenue. Filters applied per-table BEFORE the joins (pushdown to each
    scan); customer is sf-scaled so its join strategy is AQE's choice
    (broadcast under threshold, shuffle join beyond); deterministic
    tie-break on l_orderkey keeps the LIMIT boundary oracle-stable."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-30")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-30")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@_q(
    "q6_forecast_revenue",
    "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate —
    every predicate pushes to the parquet scan, the aggregate is one
    scalar partial+final. The canonical predicate-pushdown benchmark
    query."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "q9_product_profit",
    # adapted Q9: the testdata ships no partsupp table, so profit drops the
    # ps_supplycost term (revenue-only profit) — the join tree and
    # grouping (part-name filter, supplier nation, ship year) are Q9's
    "SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit "
    "FROM lineitem, part, supplier, nation "
    "WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey "
    "AND s_nationkey = n_nationkey AND p_name LIKE '%red%' "
    "GROUP BY 1, 2",
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year), adapted:
    no partsupp table in the testdata, so the ps_supplycost term drops
    (documented in the oracle comment). Plan: the part-name filter
    reduces lineitem via one join before the small supplier/nation dims
    attach; one (nation, year) aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    pa = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    su = read_table(spark, sf_dir, "supplier")
    na = read_table(spark, sf_dir, "nation")
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(na, su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("profit"))
    )


@_q(
    "q16_supplier_part_cnt",
    # adapted Q16: partsupp's (partkey, suppkey) relation is stood in by
    # the DISTINCT observed supply links in lineitem; the complaint
    # exclusion drops (no s_comment column)
    "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt "
    "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
    "JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'MEDIUM%' "
    "AND p_size IN (1, 4, 7) "
    "GROUP BY p_brand, p_type, p_size",
)
def q16_supplier_part_cnt(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship), adapted: the
    partsupp link table is reconstructed as DISTINCT (l_partkey,
    l_suppkey) from lineitem. The dedup happens BEFORE the part join and
    the negated filters land on the part scan; one count-distinct
    aggregate on the (brand, type, size) key."""
    li = read_table(spark, sf_dir, "lineitem")
    pa = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7)
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(pa, ps.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q20_excess_suppliers",
    # adapted Q20: no partsupp.ps_availqty, so "excess stock" becomes a
    # shipped-quantity threshold over red parts in 1996 — the EXISTS-chain
    # semi-join shape is Q20's
    "SELECT s_name FROM supplier WHERE s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey"
    "  WHERE p_name LIKE 'red%'"
    "  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    "  GROUP BY l_suppkey HAVING sum(l_quantity) > 400)",
)
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess stock), adapted: availqty
    threshold becomes shipped-quantity-of-red-parts-in-1996 > 400 (no
    partsupp table). The inner aggregate reduces before the semi join;
    supplier is never inflated."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    pa = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    su = read_table(spark, sf_dir, "supplier")
    hot = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return su.join(
        hot, su.s_suppkey == hot.l_suppkey, "leftsemi"
    ).select("s_name")


@_q(
    "q2_min_cost_supplier",
    # adapted Q2: no partsupp, so the supply relation is reconstructed as
    # per-(partkey, suppkey) MIN observed unit price from lineitem; the
    # correlated min-cost-in-region subquery is Q2's
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, round(cost, 2) AS supply_cost
    FROM ps JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 5 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND cost = (SELECT min(ps2.cost) FROM ps ps2
                  JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                  WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier), adapted: the partsupp
    supply relation is stood in by the MIN observed unit price per
    (l_partkey, l_suppkey) in lineitem (same reconstruction as q16/q20).
    The oracle keeps Q2's correlated subquery; the Spark plan computes
    the per-part regional min ONCE as a window over the already-joined
    candidates — no second lineitem pass and no self-join, one partkey
    shuffle for the window. nation x region (constant 25 x 5 rows) is
    the only forced broadcast; supplier and part are sf-scaled and left
    to AQE. Equality against the window min is exact: both sides of the
    comparison are the same IEEE doubles computed once."""
    li = read_table(spark, sf_dir, "lineitem")
    pa = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "STANDARD")
    )
    su = read_table(spark, sf_dir, "supplier")
    na = read_table(spark, sf_dir, "nation")
    re = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = su.join(
        F.broadcast(na.join(re, na.n_regionkey == re.r_regionkey)),
        su.s_nationkey == F.col("n_nationkey"),
    )
    cand = ps.join(pa, ps.l_partkey == pa.p_partkey).join(
        eu, ps.l_suppkey == eu.s_suppkey
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            _r2(F.col("cost")).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@_q(
    "q11_important_stock",
    # adapted Q11: stock value = shipped extendedprice x quantity per part
    # over ASIA-region suppliers; TPC-H's 0.0001/SF fraction (which needs
    # to know SF) becomes the scale-stable "above 2x the mean part value"
    """
    WITH val AS (
      SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, round(value, 2) AS stock_value
    FROM val WHERE value > (SELECT avg(value) * 2 FROM val)
    ORDER BY stock_value DESC, p_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): per-part value
    held by one region's suppliers, kept where it exceeds a global
    threshold. Q11's 0.0001/SF fraction bakes the scale factor into the
    query text; here the threshold is 2x the mean part value, which
    selects "disproportionately heavy" parts identically at every SF.
    The Spark plan aggregates once, reduces the threshold to ONE row,
    and broadcasts it back over the aggregate (provably bounded — same
    pattern as streaming.merged_topk); no second lineitem pass."""
    li = read_table(spark, sf_dir, "lineitem")
    su = read_table(spark, sf_dir, "supplier")
    na = read_table(spark, sf_dir, "nation")
    re = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = su.join(
        F.broadcast(na.join(re, na.n_regionkey == re.r_regionkey)),
        su.s_nationkey == F.col("n_nationkey"),
    )
    val = (
        li.join(asia, li.l_suppkey == asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    thresh = val.agg((F.avg("value") * 2).alias("_th"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("value") > F.col("_th"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _r2(F.col("value")).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


@_q(
    "q10_returned_items",
    "SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM customer, orders, lineitem "
    "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' "
    "AND l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 20",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-items revenue per customer in a date
    window, top-20. Both big-table filters (date window, returnflag) hit
    the scans before the orderkey shuffle."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_q(
    "q18_large_volume_customer",
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, "
    "round(o_totalprice, 2) AS totalprice, round(sum(l_quantity), 2) AS qty_sum "
    "FROM customer, orders, lineitem "
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300) "
    "AND c_custkey = o_custkey AND o_orderkey = l_orderkey "
    "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice "
    "ORDER BY totalprice DESC, o_orderkey LIMIT 100",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers). The oracle keeps the
    classic IN-subquery; the Spark plan computes the qty aggregate ONCE and
    carries it through the join — no second lineitem pass, and the HAVING
    filter lands before the orders join, so the expensive side is reduced
    first (same rows: l_orderkey is unique after the groupBy)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            _r2(F.col("o_totalprice")).alias("totalprice"),
            _r2(F.col("_qty")).alias("qty_sum"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@_q(
    "q4_order_priority",
    "SELECT o_orderpriority, count(*) AS order_count FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' "
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "            AND l_shipdate > o_orderdate) "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelates to a
    LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate) on
    top of the orderkey equi-key — Spark keeps the hash join on the equi
    part and applies the residual in the join, so lineitem is never
    materialized per-order. Date window prunes orders at the scan."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_q(
    "q12_priority_lines",
    "SELECT l_linestatus, "
    "count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count, "
    "count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_linestatus ORDER BY l_linestatus",
)
def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape (shipmode→linestatus on the slimmed schema):
    conditional aggregation via count(when(...)) — one pass, map-side
    partial aggs, no second join. The lineitem date window is the selective
    predicate and lands in PushedFilters; the orderkey shuffle join carries
    only (l_orderkey, l_linestatus) against (o_orderkey, o_orderpriority)
    after pruning."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_q(
    "q14_promo_revenue",
    "SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
    "/ sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue "
    "FROM lineitem, part WHERE l_partkey = p_partkey "
    "AND l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'",
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): ratio of conditional to total
    revenue in one aggregate pass. The month filter prunes lineitem at
    the scan so the join touches ~1/80 of the fact table; part is
    sf-scaled, so the join strategy is left to Catalyst/AQE rather than
    force-broadcast."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@_q(
    "q19_disjunctive_revenue",
    "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem, part WHERE "
    "(p_partkey = l_partkey AND p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) "
    "OR (p_partkey = l_partkey AND p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) "
    "OR (p_partkey = l_partkey AND p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)",
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunction of conjunctions).
    The equi-key p_partkey = l_partkey is common to every disjunct, so the
    plan is a single hash join on partkey with the OR-of-ANDs as the join
    residual — NOT a cartesian product; Catalyst also derives the
    per-side OR filters (brand-set on part, quantity envelope on lineitem)
    and pushes them into the scans. part is sf-scaled → no forced
    broadcast; AQE picks the strategy."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    clause = lambda brand, qlo, qhi, slo, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("p_size").between(slo, shi)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(
            clause("Brand#12", 1, 11, 1, 5)
            | clause("Brand#23", 10, 20, 1, 10)
            | clause("Brand#34", 20, 30, 1, 15)
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@_q(
    "q22_dormant_customers",
    "SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal "
    "FROM customer "
    "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0) "
    "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
    "                AND o_orderdate >= TIMESTAMP '1999-01-01') "
    "GROUP BY c_mktsegment ORDER BY c_mktsegment",
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity, adapted: segment replaces
    phone prefix, dormancy = no order since 1999): scalar subquery computed
    once and broadcast via crossJoin (one tiny row — no shuffle of
    customer), then LEFT ANTI join against date-pruned orders. At scale the
    anti join shuffles only (o_custkey) after the date filter."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_q(
    "q7_volume_shipping",
    "SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM ("
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "CAST(year(l_shipdate) AS INT) AS l_year, "
    "l_extendedprice * (1 - l_discount) AS volume "
    "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN customer ON c_custkey = o_custkey "
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
    "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
    "AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    ") GROUP BY supp_nation, cust_nation, l_year "
    "ORDER BY supp_nation, cust_nation, l_year",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations). Plan: the two
    single-nation dims broadcast into supplier and customer→orders (nation
    is constant-size → explicit hint), cutting both fact sides to ~1/12.5
    of rows BEFORE the big lineitem⋈orders orderkey join; the nation-pair
    disjunction is a join residual, not a cross join. The nation-filtered
    supplier frame still scales with sf, so its join into lineitem is
    AQE's choice. Reference: INNER equi-join chain is the one join
    strategy dataux has (planner/executor.go:84-96)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    supp = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    ord_n = o.join(cust, o.o_custkey == cust.c_custkey).select("o_orderkey", "cust_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(ord_n, li.l_orderkey == ord_n.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_r2(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_q(
    "q8_market_share",
    "SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) "
    "/ sum(volume), 4) AS mkt_share FROM ("
    "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
    "l_extendedprice * (1 - l_discount) AS volume, "
    "n2.n_name AS nation "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "JOIN region ON n1.n_regionkey = r_regionkey "
    "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'"
    ") GROUP BY o_year ORDER BY o_year",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): 8-table join tree. The
    constant-size frames (region, nation) carry explicit broadcast hints;
    the sf-scaled sides (type-filtered part, supplier⋈nation, customer,
    orders) are AQE's choice so nothing force-broadcasts a frame that
    grows with the data. The share ratio is a conditional-sum over the
    same aggregate pass — no second scan."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nat = (
        c.join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            c.c_nationkey == n.n_nationkey,
        ).select("c_custkey")
    )
    supp_nat = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    ord_c = o.join(cust_nat, o.o_custkey == cust_nat.c_custkey).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .join(ord_c, li.l_orderkey == ord_c.o_orderkey)
        .select("o_year", "nation", vol.alias("volume"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_q(
    "q13_customer_distribution",
    "SELECT c_count, count(*) AS custdist FROM ("
    "SELECT c_custkey, count(o_orderkey) AS c_count "
    "FROM customer LEFT OUTER JOIN orders "
    "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
    "GROUP BY c_custkey) c_orders "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    with an ON-clause filter on the null-producing side (semantically
    different from a WHERE — customers whose every order is urgent still
    appear with c_count=0), then a two-level aggregation. Both aggs are
    partial+final; the second groupBy keys on the tiny c_count domain, so
    its exchange is bounded by the distribution's support, not row count."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_q(
    "q15_top_supplier",
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
    "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue FROM supplier JOIN revenue "
    "ON s_suppkey = supplier_no "
    "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue) "
    "ORDER BY s_suppkey",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier via the revenue view): the quarter's
    per-supplier revenue is computed ONCE (cached view in spirit; Spark
    reuses the exchange under AQE), the max is a 1-row broadcast back onto
    it — no re-scan of lineitem for the scalar subquery. Rounded to 2dp
    before the max comparison on both sides so float ties are exact."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    s = read_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_q(
    "q17_small_quantity_revenue",
    "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand = 'Brand#23' "
    "AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 "
    "                  WHERE l2.l_partkey = p_partkey)",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated avg
    decorrelates to a per-partkey aggregate joined back. The brand filter
    reduces lineitem FIRST, so the per-part avg is computed only over the
    brand's partkeys (semi-joined scan), not all of lineitem — the
    decorrelated aggregate inherits the outer filter's pruning. Both the
    brand-part frame and the per-partkey aggregate scale with sf, so
    neither is force-broadcast."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(p, li.l_partkey == p.p_partkey).drop("p_partkey")
    part_avg = brand_li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        brand_li.join(part_avg, brand_li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@_q(
    "q21_waiting_suppliers",
    "SELECT s_name, count(*) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "WHERE o_orderstatus = 'F' "
    "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY "
    "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
    "            AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
    "                AND l3.l_suppkey <> l1.l_suppkey "
    "                AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100",
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to this
    schema: "late" = shipped >60 days after the order date (no
    commit/receipt dates in the testdata).

    Shape notes: both correlated subqueries are per-order facts about the
    SAME partition key — "some other supplier on the order" (EXISTS) is
    n_distinct_suppliers ≥ 2, "no other late supplier" (NOT EXISTS) is
    n_distinct_late_suppliers = 1 — so the whole query is ONE shuffle of
    F-order lines on orderkey with two windowed collect_sets, instead of
    the literal semi + anti self-joins (which re-scan and re-broadcast
    lineitem; Catalyst also hoists the selective late filter above them).
    q4_order_priority keeps the pure semi-join demonstration; this one
    shows the scale-correct plan."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    w = W.partitionBy("l_orderkey")
    waiting = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .withColumn("is_late", F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "is_late")
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
        )
        .filter(F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@_q(
    "join_left_outer",
    "SELECT n.n_name, count(c.c_custkey) AS ct FROM nation n "
    "LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey "
    "GROUP BY n.n_name",
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER join — beyond-reference extension (reference implements
    only INNER, SURVEY §2.3); count(col) counts non-null only."""
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("ct"))
    )


@_q(
    "join_semi",
    "SELECT count(*) AS ct FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join (EXISTS) — extension."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("ct"))


@_q(
    "join_anti",
    "SELECT count(*) AS ct FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS) — extension."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("ct"))


# --- set operations / distinct (SURVEY §2.6 — extensions) ----------------

@_q(
    "set_union",
    "SELECT k FROM (SELECT o_custkey AS k FROM orders UNION "
    "SELECT c_custkey AS k FROM customer) t",
)
def set_union(spark, sf_dir):
    """UNION (distinct) — extension; reference has no set ops."""
    o = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.union(c).distinct()


@_q(
    "set_intersect_except",
    "SELECT 'both' AS tag, count(*) AS ct FROM "
    "(SELECT DISTINCT o_custkey FROM orders INTERSECT SELECT DISTINCT c_custkey FROM customer) a "
    "UNION ALL "
    "SELECT 'only_cust' AS tag, count(*) AS ct FROM "
    "(SELECT DISTINCT c_custkey FROM customer EXCEPT SELECT DISTINCT o_custkey FROM orders) b",
)
def set_intersect_except(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    c = read_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")).distinct()
    both = c.intersect(o).agg(F.count("*").alias("ct")).select(F.lit("both").alias("tag"), "ct")
    only = c.exceptAll(o).agg(F.count("*").alias("ct")).select(
        F.lit("only_cust").alias("tag"), "ct"
    )
    return both.unionAll(only)


@_q(
    "distinct_projection",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_projection(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --- window functions (SURVEY §2.7 — extensions) --------------------------

@_q(
    "window_topk_per_group",
    "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
    "CAST(row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn "
    "FROM orders WHERE o_custkey < 50) t WHERE rn <= 2",
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group via row_number window — extension."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )


@_q(
    "window_running_sum",
    "SELECT o_custkey, o_orderkey, "
    "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running "
    "FROM orders WHERE o_custkey < 20",
)
def window_running_sum(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 20)
        .select(
            "o_custkey",
            "o_orderkey",
            _r2(F.sum("o_totalprice").over(w)).alias("running"),
        )
    )


# --- grouping sets / rollup (extensions) ----------------------------------

@_q(
    "rollup_counts",
    "SELECT l_returnflag, l_linestatus, count(*) AS ct, round(sum(l_quantity), 2) AS qty "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def rollup_counts(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("ct"), _r2(F.sum("l_quantity")).alias("qty"))
    )


@_q(
    "grouping_sets_counts",
    "SELECT l_returnflag, l_linestatus, count(*) AS ct, round(sum(l_extendedprice), 2) AS rev "
    "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))",
)
def grouping_sets_counts(spark, sf_dir):
    """Explicit GROUPING SETS (extension; reference has none — SURVEY
    §2.4). One shuffle: Spark expands the sets map-side, partial+final
    aggregates over the expanded keys."""
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS ct, "
        "round(sum(l_extendedprice), 2) AS rev FROM {li} "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))",
        li=read_table(spark, sf_dir, "lineitem"),
    )


@_q(
    "cube_counts",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS ct "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
)
def cube_counts(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("ct"))
    )


# --- scalar expression surface (SURVEY §2.8) ------------------------------

@_q(
    "case_string_math",
    "SELECT upper(substr(c_name, 1, 8)) AS uname, "
    "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band, "
    "round(abs(c_acctbal), 2) AS mag "
    "FROM customer WHERE c_custkey <= 100",
)
def case_string_math(spark, sf_dir):
    """String funcs + CASE + math — qlbridge builtin library surface
    (loaded wholesale, runtestserver.go:74)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        F.upper(F.substring("c_name", 1, 8)).alias("uname"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        _r2(F.abs(F.col("c_acctbal"))).alias("mag"),
    )


@_q(
    "qlbridge_builtins",
    "SELECT c_custkey, "
    "md5(c_name) AS name_md5, "
    "sha256(c_name) AS name_sha256, "
    "base64(encode(c_name)) AS name_b64, "
    "CAST(length(c_name) AS INT) AS name_len, "
    "concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat "
    "FROM customer WHERE c_custkey <= 200",
)
def qlbridge_builtins(spark, sf_dir):
    """qlbridge builtin spellings through the dialect macro expander —
    hash.*, encoding.b64encode, len, join(args.., sep) (reference loads the
    library wholesale: frontends/mysqlfe/testmysql/runtestserver.go:74).
    Everything expands to JVM-native expressions (md5/sha2/base64/length/
    concat_ws) — no Python in the plan."""
    from dataux_spark.engine import Engine

    eng = Engine(spark)
    eng.register_parquet_dir("tpch", sf_dir)
    return eng.sql(
        "SELECT c_custkey, "
        "hash.md5(c_name) AS name_md5, "
        "hash.sha256(c_name) AS name_sha256, "
        "encoding.b64encode(c_name) AS name_b64, "
        "len(c_name) AS name_len, "
        "join(c_mktsegment, CAST(c_nationkey AS CHAR), '-') AS seg_nat "
        "FROM customer WHERE c_custkey <= 200"
    )


@_q(
    "qlbridge_strfuncs",
    "SELECT c_custkey, "
    "array_to_string(string_split(c_name, '#'), '|') AS name_parts, "
    "contains(c_name, '5') AS has5, "
    "replace(c_name, 'Customer#', 'C') AS short_name, "
    "(c_name IS NOT NULL OR c_mktsegment IS NOT NULL) AS any_present, "
    "(coalesce(CAST(c_mktsegment AS VARCHAR), '') NOT IN ('', 'false', '0') "
    " AND coalesce(CAST(c_custkey AS VARCHAR), '') NOT IN ('', 'false', '0')) AS all_truthy, "
    "round(pow(c_acctbal, 2), 2) AS bal_sq, "
    "round(sqrt(abs(c_acctbal)), 4) AS bal_sqrt "
    "FROM customer WHERE c_custkey <= 200",
)
def qlbridge_strfuncs(spark, sf_dir):
    """qlbridge string/logic builtins through the dialect: split (plain-
    string, regex-quoted), any/all (existence/truthiness), plus natives that
    share qlbridge's spelling (contains/replace/pow/sqrt).  Library loaded
    wholesale in the reference (runtestserver.go:74); everything expands
    JVM-native — no Python in the plan."""
    from dataux_spark.engine import Engine

    eng = Engine(spark)
    eng.register_parquet_dir("tpch", sf_dir)
    # name_parts is flattened to a '|'-joined string: the correctness
    # driver's canonicalizer sorts cell values and arrays are unhashable
    # there, so both sides emit a scalar.
    return eng.sql(
        "SELECT c_custkey, "
        "join(split(c_name, '#'), '|') AS name_parts, "
        "contains(c_name, '5') AS has5, "
        "replace(c_name, 'Customer#', 'C') AS short_name, "
        "any(c_name, c_mktsegment) AS any_present, "
        "all(c_mktsegment, c_custkey) AS all_truthy, "
        "round(pow(c_acctbal, 2), 2) AS bal_sq, "
        "round(sqrt(abs(c_acctbal)), 4) AS bal_sqrt "
        "FROM customer WHERE c_custkey <= 200"
    )


@_q(
    "qlbridge_datefuncs",
    "SELECT strftime(o_orderdate, '%Y-%m') AS ym, "
    "CAST((dayofweek(o_orderdate))*24 AS INT) AS how, "
    "count(*) AS ct "
    "FROM orders WHERE o_orderkey <= 2000 GROUP BY 1, 2",
)
def qlbridge_datefuncs(spark, sf_dir):
    """qlbridge date builtins: extract(t, strftime-fmt) via Arrow-batched
    qb_strftime, hourofweek via native dayofweek/hour arithmetic (Go
    weekday is 0=Sunday — dialect shifts Spark's 1-based).  Oracle twin uses
    DuckDB strftime/dayofweek (also 0=Sunday)."""
    from dataux_spark.engine import Engine

    eng = Engine(spark)
    eng.register_parquet_dir("tpch", sf_dir)
    return eng.sql(
        "SELECT extract(o_orderdate, '%Y-%m') AS ym, "
        "hourofweek(o_orderdate) AS how, count(*) AS ct "
        "FROM orders WHERE o_orderkey <= 2000 GROUP BY 1, 2"
    )


@_q(
    "date_extract",
    "SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo, "
    "count(*) AS ct FROM orders GROUP BY 1, 2",
)
def date_extract(spark, sf_dir):
    """Date part extraction + group (reference date funcs via qlbridge)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.count("*").alias("ct"))
    )


# --- events / time-series -------------------------------------------------

@_q(
    "events_hourly_agg",
    "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS ct, "
    "round(sum(value), 2) AS total "
    "FROM events GROUP BY 1, 2",
)
def events_hourly_agg(spark, sf_dir):
    """Time-bucketed aggregation over the event stream table — the batch
    twin of the Structured Streaming windowed agg (extension; reference has
    no stream operators, SURVEY §2.11)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("ct"), _r2(F.sum("value")).alias("total"))
    )


@_q(
    "pack_sequences",
    "WITH t AS (SELECT source, doc_id, "
    "len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens FROM documents), "
    "c AS (SELECT source, doc_id, n_tokens, "
    "sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t) "
    "SELECT source, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id, "
    "count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens "
    "FROM c GROUP BY source, chunk_id",
)
def pack_sequences(spark, sf_dir):
    """Sequence packing (extension): per-source token stream cut every 512
    tokens; reports docs and token mass per chunk. Per-shard windows — no
    global sort — so packing scales with the number of shards."""
    from dataux_spark.operators.text import pack_chunks

    d = read_table(spark, sf_dir, "documents")
    return (
        pack_chunks(d, "text", "doc_id", "source", budget=512)
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
        )
    )


@_q(
    "quality_quantile_filter",
    "WITH med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY lang) "
    "SELECT d.lang, count(*) AS kept, CAST(min(d.n_chars) AS BIGINT) AS min_chars "
    "FROM documents d JOIN med USING (lang) WHERE d.n_chars >= med.med "
    "GROUP BY d.lang",
)
def quality_quantile_filter(spark, sf_dir):
    """Per-group quantile thresholding (extension — the standard per-language
    length/quality pruning move): keep docs at or above their language's
    median length. The per-lang medians are a tiny aggregate broadcast back
    over the scan; Spark percentile == DuckDB quantile_cont (both linear
    interpolation)."""
    d = read_table(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    return (
        d.join(F.broadcast(med), "lang")
        .filter(F.col("n_chars") >= F.col("med"))
        .groupBy("lang")
        .agg(F.count("*").alias("kept"), F.min("n_chars").alias("min_chars"))
    )


@_q(
    "profile_columns",
    """
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_nulls,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS DOUBLE) AS min_val,
           CAST(max(doc_id) AS DOUBLE) AS max_val
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars),
           count(DISTINCT n_chars),
           CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE)
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM documents
    """,
)
def profile_columns(spark, sf_dir):
    """ANALYZE-style column health profile (operators/profile.py
    column_profile): row/null/exact-distinct counts + numeric ranges for
    every column in ONE scan (multi-distinct via a single Expand), pivoted
    to per-column rows with stack(). The oracle recomputes each column's
    measures independently."""
    from dataux_spark.operators.profile import column_profile

    d = read_table(spark, sf_dir, "documents")
    return column_profile(d, ["doc_id", "n_chars", "lang", "source"])


@_q(
    "profile_histogram",
    """
    WITH r AS (
      SELECT CAST(min(n_chars) AS DOUBLE) AS rlo,
             CAST(max(n_chars) AS DOUBLE) AS rhi
      FROM documents
    ), b AS (
      SELECT CAST(least(10, 1 + CAST(floor(
               (CAST(n_chars AS DOUBLE) - rlo) / ((rhi - rlo) / 10)
             ) AS BIGINT)) AS BIGINT) AS bucket, rlo, rhi
      FROM documents, r WHERE n_chars IS NOT NULL
    )
    SELECT bucket, round(rlo + (bucket - 1) * (rhi - rlo) / 10, 6) AS lo,
           round(rlo + bucket * (rhi - rlo) / 10, 6) AS hi,
           count(*) AS ct
    FROM b GROUP BY bucket, rlo, rhi ORDER BY bucket
    """,
)
def profile_histogram(spark, sf_dir):
    """Equi-width document-length histogram (operators/profile.py
    equi_width_histogram): bucket by the explicit floor formula so the
    oracle reproduces boundary behavior exactly; range from a broadcast
    1-row min/max aggregate, roll-up map-side combined."""
    from dataux_spark.operators.profile import equi_width_histogram

    return equi_width_histogram(read_table(spark, sf_dir, "documents"), "n_chars", 10)


@_q(
    "profile_embeddings_qa",
    # the oracle replays the scan-projection QA exactly: per-vector dim,
    # NaN flag, 6dp-rounded L2 norm, then the 1-row report
    """
    WITH per AS (
      SELECT CAST(embedding IS NULL AS INT) AS _null,
             CASE WHEN embedding IS NULL THEN NULL ELSE len(embedding) END AS _dim,
             CASE WHEN embedding IS NULL THEN NULL
                  ELSE CAST(len(list_filter(embedding, x -> isnan(x))) > 0 AS INT)
             END AS _nan,
             CASE WHEN embedding IS NULL
                    OR len(list_filter(embedding, x -> isnan(x))) > 0 THEN NULL
                  ELSE round(sqrt(list_sum(list_transform(
                         embedding, x -> CAST(x AS DOUBLE) * x))), 6)
             END AS _norm
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(coalesce(sum(CASE WHEN _dim <> 64 THEN 1 END), 0) AS BIGINT)
             AS wrong_dim,
           CAST(sum(_null) AS BIGINT) AS null_vectors,
           CAST(coalesce(sum(_nan), 0) AS BIGINT) AS nan_vectors,
           CAST(coalesce(sum(CASE WHEN _norm = 0.0 THEN 1 END), 0) AS BIGINT)
             AS zero_vectors,
           round(min(_norm), 6) AS norm_min,
           round(avg(_norm), 6) AS norm_avg,
           round(max(_norm), 6) AS norm_max
    FROM per
    """,
)
def profile_embeddings_qa(spark, sf_dir):
    """Embedding-table QA gate (operators/profile.embedding_profile):
    wrong-dimension / NULL / NaN / zero-norm counts plus the norm range,
    in one scan with zero shuffles before the 1-row aggregate — the
    check an embeddings delivery passes before any ANN or clustering
    run spends a shuffle on it (an un-normalized batch from a different
    encoder surfaces as a norm_max excursion here, not as silently wrong
    cosines downstream). All vector math is JVM higher-order
    expressions; per-vector norms round 6dp so the report is
    engine-reproducible."""
    from dataux_spark.operators.profile import embedding_profile

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_profile(emb, "embedding", expected_dim=64).select(
        "n_vectors",
        F.col("wrong_dim").cast("bigint").alias("wrong_dim"),
        F.col("null_vectors").cast("bigint").alias("null_vectors"),
        F.col("nan_vectors").cast("bigint").alias("nan_vectors"),
        F.col("zero_vectors").cast("bigint").alias("zero_vectors"),
        "norm_min", "norm_avg", "norm_max",
    )


@_q(
    "profile_histogram_depth",
    # the oracle replays edge computation (quantile_cont == Spark
    # percentile, 9dp-rounded), the count-of-edges-below membership fold
    # over the interior edges, and the per-bucket rollup
    """
    WITH edges AS (
      SELECT list_transform(quantile_cont(CAST(l_extendedprice AS DOUBLE),
             [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]), e -> round(e, 9)) AS e
      FROM lineitem
    ), b AS (
      SELECT 1 + list_sum(list_transform(e[2:8], ed ->
               CASE WHEN round(CAST(l_extendedprice AS DOUBLE), 9) >= ed
                    THEN 1 ELSE 0 END)) AS bucket, e
      FROM lineitem CROSS JOIN edges
      WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           e[CAST(bucket AS INT)] AS lo, e[CAST(bucket AS INT) + 1] AS hi,
           CAST(count(*) AS BIGINT) AS ct
    FROM b GROUP BY 1, 2, 3 ORDER BY bucket
""",
)
def profile_histogram_depth(spark, sf_dir):
    """Equi-DEPTH histogram (operators/profile.equi_depth_histogram) of
    lineitem prices: 8 quantile-edge buckets each holding ~1/8 of rows —
    the skew-proof binning (feature deciles, optimizer-style stats)
    equi-width cannot give. Edges are ONE 1-row exact-percentile
    aggregate broadcast back over the scan; membership is a
    count-of-edges-below fold, never an ntile global sort. At 100 TB
    swap the exact percentile for approx_percentile — the plan shape is
    unchanged."""
    from dataux_spark.operators.profile import equi_depth_histogram

    li = read_table(spark, sf_dir, "lineitem")
    return equi_depth_histogram(li, "l_extendedprice", bins=8)


@_q(
    "profile_robust_means",
    # the oracle replays the grouped quantile band (quantile_cont ==
    # percentile, 9dp-rounded), the inside/clamp rules, and the three
    # 6dp means
    """
    WITH e AS (
      SELECT event_type AS _g,
             round(quantile_cont(CAST(value AS DOUBLE), 0.05), 9) AS lo,
             round(quantile_cont(CAST(value AS DOUBLE), 0.95), 9) AS hi
      FROM events GROUP BY 1
    )
    SELECT event_type AS "group", CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(value AS DOUBLE)), 6) AS mean,
           round(avg(CASE WHEN round(CAST(value AS DOUBLE), 9) >= lo
                           AND round(CAST(value AS DOUBLE), 9) <= hi
                          THEN round(CAST(value AS DOUBLE), 9) END), 6)
             AS trimmed_mean,
           round(avg(least(greatest(round(CAST(value AS DOUBLE), 9), lo), hi)), 6)
             AS winsorized_mean
    FROM events JOIN e ON e._g = event_type
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def profile_robust_means(spark, sf_dir):
    """Outlier-robust location report (operators/profile.
    robust_mean_report): per event type, the mean / 5%-trimmed mean /
    winsorized mean triple — a single fat-tail row moves the mean but
    cannot move the robust pair past the quantile band. One grouped
    exact-percentile aggregate joined back (group-cardinality-sized,
    never an ntile sort) + one conditional-agg pass."""
    from dataux_spark.operators.profile import robust_mean_report

    ev = read_table(spark, sf_dir, "events")
    return robust_mean_report(ev, "value", "event_type", trim=0.05)


@_q(
    "profile_drift_psi",
    # the oracle replays the full PSI pipeline: reference-frame edges,
    # the identical clamped floor bucketing on BOTH sides, the dense
    # 1..bins spine (so empty buckets still contribute), smoothed
    # proportions, (p'-q')*ln(p'/q') per bucket. Counts cast BIGINT
    # (DuckDB coalesce/sum would widen), proportions/terms rounded 6dp.
    """
    WITH r AS (
      SELECT CAST(min(n_chars) AS DOUBLE) AS rlo,
             CAST(max(n_chars) AS DOUBLE) AS rhi
      FROM documents WHERE doc_id % 2 = 0
    ), pc AS (
      SELECT CAST(least(10, greatest(1, 1 + CAST(floor(
               (CAST(n_chars AS DOUBLE) - rlo) / ((rhi - rlo) / 10)
             ) AS BIGINT))) AS BIGINT) AS bucket, count(*) AS nr
      FROM documents, r WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
      GROUP BY 1
    ), qc AS (
      SELECT CAST(least(10, greatest(1, 1 + CAST(floor(
               (CAST(n_chars AS DOUBLE) - rlo) / ((rhi - rlo) / 10)
             ) AS BIGINT))) AS BIGINT) AS bucket, count(*) AS nc
      FROM documents, r WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
      GROUP BY 1
    ), spine AS (
      SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS bucket
    ), j AS (
      SELECT s.bucket, CAST(coalesce(pc.nr, 0) AS BIGINT) AS n_ref,
             CAST(coalesce(qc.nc, 0) AS BIGINT) AS n_cur
      FROM spine s
      LEFT JOIN pc ON s.bucket = pc.bucket
      LEFT JOIN qc ON s.bucket = qc.bucket
    ), pq AS (
      SELECT bucket, n_ref, n_cur,
             CAST(n_ref AS DOUBLE) / sum(n_ref) OVER () AS p,
             CAST(n_cur AS DOUBLE) / sum(n_cur) OVER () AS q
      FROM j
    )
    SELECT bucket, n_ref, n_cur,
           round(p, 6) AS p_ref, round(q, 6) AS q_cur,
           round((greatest(p, 1e-6) - greatest(q, 1e-6)) *
                 ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 6) AS psi_term
    FROM pq
    """,
)
def profile_drift_psi(spark, sf_dir):
    """Population-Stability-Index drift monitor (operators/profile.py
    distribution_drift_psi): the even-doc_id half of the corpus is the
    deployed reference, the odd half the incoming batch; bucket edges
    come from the reference min/max and both sides share the clamped
    floor bucketing, so out-of-range new data folds into edge buckets
    instead of vanishing. Two linear censuses, then O(bins) rows — the
    check a pipeline runs per crawl batch before mixing it in."""
    from dataux_spark.operators.profile import distribution_drift_psi

    docs = read_table(spark, sf_dir, "documents")
    return distribution_drift_psi(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
        bins=10,
    )


@_q(
    "stats_trend_per_type",
    # identical closed-form normal equations: x = fractional days since
    # 2024-01-01 (epoch() is fractional in DuckDB exactly like Spark's
    # timestamp→double cast), sums rounded only at the final outputs
    """
    WITH d AS (
      SELECT event_type,
             (epoch(ts) - 1704067200.0) / 86400.0 AS x,
             value::DOUBLE AS y
      FROM events
    ), a AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM d GROUP BY event_type
    )
    SELECT event_type, n,
           round(CASE WHEN n*sxx - sx*sx > 0
                 THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END, 6) AS slope,
           round(CASE WHEN n*sxx - sx*sx > 0
                 THEN (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
                 END, 6) AS intercept,
           round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                 THEN (n*sxy - sx*sy) * (n*sxy - sx*sy) /
                      ((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 6) AS r2
    FROM a
    """,
)
def stats_trend_per_type(spark, sf_dir):
    """Per-event-type OLS time trend of value (operators/stats.py
    trend_per_group): closed-form normal equations from one pass of
    algebraic sufficient statistics — one O(groups) shuffle, no
    iteration. x is centered to fractional days since the corpus epoch so
    the x² sums stay well inside double precision at any scale."""
    from dataux_spark.operators.stats import trend_per_group

    e = read_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: go through LTZ under the UTC session zone so
    # the double is the same UTC epoch DuckDB's epoch() produces
    x = (
        F.col("ts").cast("timestamp_ltz").cast("double") - F.lit(1704067200.0)
    ) / F.lit(86400.0)
    return trend_per_group(e, ["event_type"], x, F.col("value"))


@_q(
    "stats_ab_ttest",
    # arm replayed via the package's md5 bucket spelling; var_samp on both
    # engines; Welch t and Satterthwaite df recomputed from the same
    # per-arm aggregates
    """
    WITH d AS (
      SELECT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':exp1'), 1, 8))::UBIGINT
              % 2) AS arm,
             value::DOUBLE AS v
      FROM events
    ), a AS (
      SELECT event_type, arm, count(*) AS n, avg(v) AS m, var_samp(v) AS s2
      FROM d GROUP BY event_type, arm
    ), w AS (
      SELECT event_type,
             max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 0 THEN m END) AS m0,
             max(CASE WHEN arm = 1 THEN m END) AS m1,
             max(CASE WHEN arm = 0 THEN s2 END) AS s20,
             max(CASE WHEN arm = 1 THEN s2 END) AS s21
      FROM a GROUP BY event_type
    )
    SELECT event_type, n0, n1,
           round(m0, 6) AS mean0, round(m1, 6) AS mean1,
           round((m1 - m0) / sqrt(s20/n0 + s21/n1), 6) AS t_stat,
           round((s20/n0 + s21/n1) * (s20/n0 + s21/n1) /
                 ((s20/n0)*(s20/n0)/(n0-1) + (s21/n1)*(s21/n1)/(n1-1)),
                 6) AS df
    FROM w
    """,
)
def stats_ab_ttest(spark, sf_dir):
    """Per-event-type Welch two-sample t-test (operators/stats.py
    welch_ttest) between md5-hash-split user arms — the deterministic
    cluster-safe A/B readout: one (group, arm) shuffle of algebraic
    partials, then one O(groups) pivot aggregate."""
    from dataux_spark.operators.stats import welch_ttest

    e = read_table(spark, sf_dir, "events")
    return welch_ttest(e, ["event_type"], "user_id", "value", salt="exp1")


@_q(
    "retrieval_eval_ndcg",
    # ranking + relevance + all three metrics replayed: per-nation top-10
    # suppliers by (acctbal desc, suppkey), relevant = acctbal > 5000,
    # binary-relevance nDCG with the standard ideal normalization
    """
    WITH ranked AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT s_nationkey AS query_id, s_suppkey AS doc_id,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rank
        FROM supplier) t WHERE rank <= 10
    ), rel AS (
      SELECT s_nationkey AS query_id, s_suppkey AS doc_id
      FROM supplier WHERE s_acctbal > 5000
    ), rel_n AS (
      SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id
    ), per_q AS (
      SELECT r.query_id,
             sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit,
             min(CASE WHEN rel.doc_id IS NOT NULL THEN r.rank END) AS first_rank,
             sum(CASE WHEN rel.doc_id IS NOT NULL
                 THEN 1.0 / log2(r.rank + 1) ELSE 0.0 END) AS dcg
      FROM ranked r LEFT JOIN rel
        ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
      GROUP BY r.query_id
    )
    SELECT p.query_id, n.n_rel,
           round(n_hit::DOUBLE / n.n_rel, 6) AS recall_at_k,
           round(coalesce(1.0 / first_rank, 0.0), 6) AS mrr_at_k,
           round(dcg / list_sum(list_transform(
                 range(1, CAST(least(n.n_rel, 10) AS BIGINT) + 1),
                 i -> 1.0 / log2(i + 1))), 6) AS ndcg_at_k
    FROM per_q p JOIN rel_n n ON n.query_id = p.query_id
    """,
)
def retrieval_eval_ndcg(spark, sf_dir):
    """Retrieval-quality eval (operators/stats.py ranking_metrics):
    recall@10 / MRR@10 / nDCG@10 of a ranked frame against a relevance
    frame — here per-nation supplier rankings scored against a balance
    ground truth, so every formula is replayable; the same operator
    grades ANN/BM25 rankings against exact top-k in tests. O(queries·k)
    rows end to end — eval cost independent of corpus size."""
    from dataux_spark.operators.stats import ranking_metrics

    sup = read_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    ranked = (
        sup.select(
            F.col("s_nationkey").alias("query_id"),
            F.col("s_suppkey").alias("doc_id"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 10)
    )
    relevant = sup.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("query_id"), F.col("s_suppkey").alias("doc_id")
    )
    return ranking_metrics(ranked, relevant, k=10)


_QUALITY_RULES_SQL = [
    # (name, predicate, action) — the oracle spells each predicate
    # identically; violation = NOT coalesce(pred, FALSE) on both engines
    # (NULL predicate result counts as a violation, the strict side of
    # CHECK-constraint three-valued logic)
    ("text_nonempty", "text IS NOT NULL AND length(text) > 0", "warn"),
    ("len_in_range", "n_chars BETWEEN 60 AND 500", "drop"),
    ("lang_known", "lang IN ('en','es','de','fr')", "drop"),
    ("chars_consistent", "n_chars = length(text)", "fail"),
]


def _quality_rules():
    from dataux_spark.operators.quality import Expectation

    return [Expectation(n, p, a) for n, p, a in _QUALITY_RULES_SQL]


@_q(
    "quality_expectations_report",
    "\nUNION ALL\n".join(
        f"SELECT '{n}' AS rule, '{a}' AS action, count(*) AS n_rows, "
        f"CAST(sum(CASE WHEN NOT coalesce({p}, FALSE) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_violations, "
        f"round(CAST(sum(CASE WHEN NOT coalesce({p}, FALSE) THEN 1 ELSE 0 END) "
        "AS DOUBLE) * 100.0 / greatest(count(*), 1), 4) AS violation_pct "
        "FROM documents"
        for n, p, a in _QUALITY_RULES_SQL
    ),
)
def quality_expectations_report(spark, sf_dir):
    """Declarative data-contract report (operators/quality.py
    expectation_report) — the Delta-Live-Tables EXPECT shape: four named
    rules over documents, each a JVM boolean inside ONE scan projection,
    the whole set folded into a single conditional-sum aggregate row and
    stack()-pivoted to per-rule stats. Adding a rule adds a column to
    the partial aggregate, not a pass. The oracle recomputes each rule's
    violation count independently."""
    from dataux_spark.operators.quality import expectation_report

    return expectation_report(
        read_table(spark, sf_dir, "documents"), _quality_rules()
    )


@_q(
    "quality_quarantine_rows",
    """
    SELECT doc_id, lang, n_chars,
           array_to_string(list_sort(list_filter([
             CASE WHEN NOT coalesce(text IS NOT NULL AND length(text) > 0,
                  FALSE) THEN 'text_nonempty' END,
             CASE WHEN NOT coalesce(n_chars BETWEEN 60 AND 500, FALSE)
                  THEN 'len_in_range' END,
             CASE WHEN NOT coalesce(lang IN ('en','es','de','fr'), FALSE)
                  THEN 'lang_known' END,
             CASE WHEN NOT coalesce(n_chars = length(text), FALSE)
                  THEN 'chars_consistent' END
           ], x -> x IS NOT NULL)), ',') AS violations
    FROM documents
    WHERE NOT coalesce(n_chars BETWEEN 60 AND 500, FALSE)
       OR NOT coalesce(lang IN ('en','es','de','fr'), FALSE)
       OR NOT coalesce(n_chars = length(text), FALSE)
    ORDER BY doc_id
    """,
)
def quality_quarantine_rows(spark, sf_dir):
    """The quarantine half of the gate (operators/quality.py
    split_on_expectations): rows breaking any drop/fail rule, each
    carrying the sorted array of EVERY contract it broke (warn included
    — the quarantine record tells the row's whole story), flattened to a
    comma-joined string for the cross-engine hash. One projected scan,
    zero shuffles before the display sort."""
    from dataux_spark.operators.quality import split_on_expectations

    _, bad = split_on_expectations(
        read_table(spark, sf_dir, "documents"), _quality_rules()
    )
    return (
        bad.select(
            "doc_id", "lang", "n_chars",
            F.array_join("violations", ",").alias("violations"),
        ).orderBy("doc_id")
    )


def _sampling_oracles():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    split = (
        f"SELECT CASE WHEN {f} < 0.9 THEN 'train' WHEN {f} < 0.95 THEN 'val' "
        f"ELSE 'test' END AS split, count(*) AS ct FROM documents GROUP BY 1"
    )
    fd = hash_frac_sql("d.doc_id")
    temp = (
        "WITH c AS (SELECT lang, pow(count(*), -0.5) AS r FROM documents GROUP BY lang), "
        "p AS (SELECT lang, r / (SELECT max(r) FROM c) AS keep_p FROM c) "
        "SELECT d.lang, count(*) AS kept FROM documents d JOIN p USING (lang) "
        f"WHERE {fd} < p.keep_p GROUP BY d.lang"
    )
    return split, temp


_SPLIT_ORACLE, _TEMP_ORACLE = _sampling_oracles()


@_q("split_hash_counts", _SPLIT_ORACLE)
def split_hash_counts(spark, sf_dir):
    """Deterministic train/val/test split by md5-bucket bands (extension —
    the reproducible-split op every training pipeline needs; rand() can't
    survive task retries). Pure map over the scan; the oracle recomputes
    the identical bucket function in DuckDB, so assignment parity is pinned
    bit-for-bit, not statistically."""
    from dataux_spark.operators.sampling import hash_split

    d = read_table(spark, sf_dir, "documents")
    return hash_split(d, "doc_id").groupBy("split").agg(F.count("*").alias("ct"))


@_q("sample_temperature_mix", _TEMP_ORACLE)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-flattened language mixture (τ=0.5): per-group keep
    probability ∝ count^(τ-1), normalized so the rarest language keeps
    everything; selection is hash-deterministic per doc. One tiny counts
    aggregate broadcast back over the fact scan — no fact shuffle."""
    from dataux_spark.operators.sampling import temperature_resample

    d = read_table(spark, sf_dir, "documents")
    return (
        temperature_resample(d, "doc_id", "lang", tau=0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("kept"))
    )


@_q(
    "corpus_source_report",
    # language entropy per source: -sum p ln p over the language mix —
    # the mixture-health number a corpus dashboard leads with
    """
    WITH lc AS (
      SELECT source, lang, count(*) AS n
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT source, sum(n) AS nt FROM lc GROUP BY source
    )
    SELECT lc.source,
           CAST(max(tot.nt) AS BIGINT) AS n_docs,
           count(*) AS n_langs,
           round(-sum((lc.n::DOUBLE / tot.nt) * ln(lc.n::DOUBLE / tot.nt)), 6)
             AS lang_entropy
    FROM lc JOIN tot USING (source)
    GROUP BY lc.source
    """,
)
def corpus_source_report(spark, sf_dir):
    """Per-source corpus health report: document count, language count,
    and language-mix entropy (-sum p ln p) — two map-side-combined
    shuffles on tiny keys ((source, lang) then source), the dashboard
    query a corpus pipeline fronts with."""
    d = read_table(spark, sf_dir, "documents")
    lc = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w_tot = lc.groupBy("source").agg(F.sum("n").alias("nt"))
    p = F.col("n").cast("double") / F.col("nt")
    return (
        lc.join(w_tot, "source")
        .groupBy("source")
        .agg(
            F.max("nt").cast("bigint").alias("n_docs"),
            F.count("*").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )


def _grouped_split_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("source")
    return (
        f"SELECT source, CASE WHEN {f} < 0.9 THEN 'train' "
        f"WHEN {f} < 0.95 THEN 'val' ELSE 'test' END AS split, "
        "count(*) AS ct, count(DISTINCT lang) AS n_langs "
        "FROM documents GROUP BY 1, 2"
    )


@_q("split_by_source", _grouped_split_oracle())
def split_by_source(spark, sf_dir):
    """Leakage-controlled split (sampling.grouped_hash_split): the band is
    hashed on the SOURCE, so every document of a source shares a split and
    near-dups within a source can never straddle train/test. The grouped
    roll-up proves each source maps to exactly one split (one row per
    source in the result); the oracle replays the group-keyed bucket
    function bit-for-bit."""
    from dataux_spark.operators.sampling import grouped_hash_split

    d = read_table(spark, sf_dir, "documents")
    return (
        grouped_hash_split(d, "source")
        .groupBy("source", "split")
        .agg(F.count("*").alias("ct"), F.countDistinct("lang").alias("n_langs"))
    )


def _stratified_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    return (
        f"SELECT doc_id, lang FROM documents WHERE {f} < "
        "CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 1.0 "
        "WHEN 'zh' THEN 0.5 ELSE 0.1 END"
    )


@_q("sample_stratified_lang", _stratified_oracle())
def sample_stratified_lang(spark, sf_dir):
    """Per-stratum deterministic sampling (sampling.stratified_hash_sample):
    the corpus-rebalancing pass — downsample the majority language, keep
    minority languages — as a zero-shuffle CASE-banded hash filter. The
    oracle recomputes the identical bucket function, pinning membership
    bit-for-bit."""
    from dataux_spark.operators.sampling import stratified_hash_sample

    d = read_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        d, "lang", {"en": 0.3, "de": 1.0, "zh": 0.5}, "doc_id", default_rate=0.1
    ).select("doc_id", "lang")


@_q(
    "sample_token_budget",
    # quality-first ranked cumsum per lang, kept while the running token
    # total (inclusive) fits the lang's budget — both engines compute the
    # identical integer window sum, so membership pins bit-for-bit
    """
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x != '')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, CAST(cum_tokens AS BIGINT) AS cum_tokens FROM c
    WHERE cum_tokens <= CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1500
                        ELSE 500 END
    """,
)
def sample_token_budget(spark, sf_dir):
    """Token-budget mixture curation (sampling.token_budget_select): per
    language, keep the longest documents until the language's token
    budget is spent — mixtures specified in TOKENS ("3000 en, 1500 de"),
    not rates. One shuffle on the group key + ordered running sum;
    deterministic tie-break on doc_id."""
    from dataux_spark.operators.sampling import token_budget_select
    from dataux_spark.operators.dedup import tokens

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    out = token_budget_select(
        d, "n_tok", {"en": 3000, "de": 1500}, "lang", "doc_id",
        order_col="n_chars", default_budget=500,
    )
    return out.select(
        "doc_id", "lang", F.col("_cum_tokens").alias("cum_tokens")
    )


def _weighted_priority_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    u = hash_frac_sql("doc_id", 42)
    return (
        "WITH p AS (SELECT doc_id, lang, "
        f"pow({u}, 1.0 / greatest(n_chars, 1)) AS pri FROM documents), "
        "r AS (SELECT doc_id, lang, pri, row_number() OVER ("
        "PARTITION BY lang ORDER BY pri DESC, doc_id) AS rn FROM p) "
        "SELECT doc_id, lang, round(pri, 6) AS priority FROM r WHERE rn <= 20"
    )


@_q("sample_weighted_priority", _weighted_priority_oracle())
def sample_weighted_priority(spark, sf_dir):
    """Weighted sampling without replacement
    (sampling.weighted_priority_sample) — Efraimidis–Spirakis A-ES:
    priority = u^(1/w) with the module's stable md5 uniform as u and
    document length as the weight w, top 20 per language. The oracle
    recomputes the identical priority arithmetic in DuckDB, so both
    MEMBERSHIP and the priority values gate bit-for-bit (to the shared
    6dp rounding). Plan: scan-projection priorities + one shuffle on the
    group key; the A-ES top-k merge property is what lets 1000 executors
    each keep a k-heap at 100 TB."""
    from dataux_spark.operators.sampling import weighted_priority_sample

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.greatest(F.col("n_chars"), F.lit(1)).cast("double").alias("w"),
    )
    out = weighted_priority_sample(d, "doc_id", "w", 20, by="lang")
    return out.select(
        "doc_id", "lang", F.round(F.col("_priority"), 6).alias("priority")
    )


def _pagerank_iter_sql(i: int) -> str:
    # one unrolled power-method iteration: dangling mass, contribution
    # sums, then the damped update — the same three steps (and the same
    # 9dp per-iteration rounding) the Spark loop performs
    p = i - 1
    return (
        f"d{i} AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r{p} r "
        f"LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL), "
        f"c{i} AS (SELECT e.dst, sum(r.rank / od.outdeg) AS csum FROM e "
        f"JOIN r{p} r ON r.node = e.src JOIN od ON od.src = e.src "
        f"GROUP BY e.dst), "
        f"r{i} AS (SELECT n.node, round(0.15 / (SELECT n FROM nn) + 0.85 * "
        f"(coalesce(c.csum, 0) + (SELECT dmass FROM d{i}) / (SELECT n FROM nn)), 9) "
        f"AS rank FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)"
    )


def _trustrank_iter_sql(i: int) -> str:
    # one unrolled TrustRank round: dangling mass, contributions, then
    # the seed-teleport update — teleport AND dangling both land on the
    # seed indicator s(v), exactly as the Spark loop in
    # operators/graph.trustrank
    p = i - 1
    return (
        f"d{i} AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r{p} r "
        f"LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL), "
        f"c{i} AS (SELECT e.dst, sum(r.rank / od.outdeg) AS csum FROM e "
        f"JOIN r{p} r ON r.node = e.src JOIN od ON od.src = e.src "
        f"GROUP BY e.dst), "
        f"r{i} AS (SELECT n.node, round(0.15 * n.s + 0.85 * "
        f"(coalesce(c.csum, 0) + (SELECT dmass FROM d{i}) * n.s), 9) "
        f"AS rank FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node)"
    )


@_q(
    "graph_trustrank",
    # the pagerank planted graph with seeds {1, 2, 6}; three unrolled
    # rounds replay the seed-teleport power method exactly
    "WITH e AS (SELECT DISTINCT doc_id % 30 AS src, "
    "(doc_id % 7) * 4 + (doc_id % 3) AS dst "
    "FROM documents WHERE doc_id % 5 != 0), "
    "nodes AS (SELECT node, CASE WHEN node IN (1, 2, 6) "
    "THEN 1.0 / 3 ELSE 0.0 END AS s FROM "
    "(SELECT src AS node FROM e UNION SELECT dst FROM e)), "
    "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), "
    "r0 AS (SELECT node, round(s, 9) AS rank FROM nodes), "
    + ", ".join(_trustrank_iter_sql(i) for i in (1, 2, 3))
    + " SELECT node, rank FROM r3",
)
def graph_trustrank(spark, sf_dir):
    """TrustRank (operators/graph.trustrank) over the pagerank planted
    graph with a 3-node trusted seed set: teleport and dangling mass
    land only on the seeds, so a node's score is its link-distance from
    known-good territory — the anti-spam complement of raw centrality
    (a farm can self-link into pagerank; it cannot self-link into
    trust). Same one-shuffle-per-round, 9dp-deterministic contract as
    graph_pagerank; unreached nodes converge to 0 by design."""
    from dataux_spark.operators.graph import trustrank

    d = read_table(spark, sf_dir, "documents")
    edges = d.filter(F.col("doc_id") % 5 != 0).select(
        (F.col("doc_id") % 30).alias("src"),
        ((F.col("doc_id") % 7) * 4 + (F.col("doc_id") % 3)).alias("dst"),
    )
    return trustrank(edges, seeds=[1, 2, 6], iters=3)


def _lpa_iter_sql(i: int) -> str:
    # one unrolled sync label-propagation round: neighbor-label counts,
    # per-node argmax with the (count desc, label asc) total tie order,
    # then the adopt-or-keep update — the same three steps as the Spark
    # loop in operators/graph.label_propagation
    p = i - 1
    return (
        f"f{i} AS (SELECT e.u AS node, l.label AS lbl, count(*) AS c "
        f"FROM e JOIN l{p} l ON l.node = e.v GROUP BY 1, 2), "
        f"b{i} AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() "
        f"OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM f{i}) "
        f"WHERE rn = 1), "
        f"l{i} AS (SELECT l.node, coalesce(b.lbl, l.label) AS label "
        f"FROM l{p} l LEFT JOIN b{i} b USING (node))"
    )


@_q(
    "graph_label_communities",
    # planted 3-block graph over documents (60 nodes, edges stay inside
    # their 20-node block); three unrolled sync-LPA rounds replay the
    # Spark loop exactly — neighbor counts, (count desc, label asc)
    # argmax, adopt-or-keep
    "WITH raw AS (SELECT doc_id % 60 AS s, "
    "(doc_id % 60) - ((doc_id % 60) % 20) "
    "+ (((doc_id % 60) % 20 + doc_id % 5 + 1) % 20) AS d FROM documents), "
    "und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b "
    "FROM raw WHERE s <> d), "
    "e AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und), "
    "l0 AS (SELECT DISTINCT u AS node, u AS label FROM e), "
    + ", ".join(_lpa_iter_sql(i) for i in (1, 2, 3))
    + " SELECT node, label FROM l3",
)
def graph_label_communities(spark, sf_dir):
    """Community detection by deterministic synchronous label
    propagation (operators/graph.label_propagation) over a planted
    3-block link graph — the "this link farm is one neighborhood"
    signal next to pagerank and triangle density. Three sync rounds,
    ties broken by smallest label so the whole trajectory is
    engine-exact; per round one node-keyed label join + count groupBy +
    argmax window, the label frame stays node-sized forever."""
    from dataux_spark.operators.graph import label_propagation

    d = read_table(spark, sf_dir, "documents")
    src = F.col("doc_id") % 60
    edges = d.select(
        src.alias("src"),
        (src - src % 20 + (src % 20 + F.col("doc_id") % 5 + 1) % 20).alias("dst"),
    )
    return label_propagation(edges, iters=3)


@_q(
    "graph_pagerank",
    # planted link graph over documents: 7 out-edges per surviving src
    # (CRT on doc_id mod 30/7/3), multiples of 5 stripped of out-edges
    # so the dangling-mass path is exercised (node 15 leaves the graph
    # entirely — only ever a src). Three unrolled iterations replay the
    # Spark loop exactly, 9dp rounding and all.
    "WITH e AS (SELECT DISTINCT doc_id % 30 AS src, "
    "(doc_id % 7) * 4 + (doc_id % 3) AS dst "
    "FROM documents WHERE doc_id % 5 != 0), "
    "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), "
    "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
    "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src), "
    "r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 9) AS rank FROM nodes), "
    + ", ".join(_pagerank_iter_sql(i) for i in (1, 2, 3))
    + " SELECT node, rank FROM r3",
)
def graph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (operators/graph.py) over a planted
    directed link graph — the web-graph centrality signal crawl
    curation feeds into domain trust scores. Three power-method rounds
    with uniform dangling-mass redistribution; each round is one
    contribution shuffle plus two broadcast 1-row aggregates, ranks
    rounded 9dp per round so the whole trajectory is engine-exact."""
    from dataux_spark.operators.graph import pagerank

    d = read_table(spark, sf_dir, "documents")
    edges = d.filter(F.col("doc_id") % 5 != 0).select(
        (F.col("doc_id") % 30).alias("src"),
        ((F.col("doc_id") % 7) * 4 + (F.col("doc_id") % 3)).alias("dst"),
    )
    return pagerank(edges, iters=3)


@_q(
    "graph_triangle_stats",
    # planted undirected graph over documents (60 nodes, each doc links
    # its residue to residue+1..+11 ahead); the oracle replays the whole
    # degree-ordered counting pipeline — canonicalize, degree, (deg,node)
    # orientation, wedge order, closing join, per-node incidence counts
    """
    WITH raw AS (
      SELECT doc_id % 60 AS s, (doc_id % 60 + doc_id % 11 + 1) % 60 AS d
      FROM documents
    ), e AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d
    ), deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node
    ), o AS (
      SELECT CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND a < b)
                  THEN a ELSE b END AS u,
             CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND a < b)
                  THEN b ELSE a END AS v,
             CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND a < b)
                  THEN db.degree ELSE da.degree END AS degv
      FROM e JOIN deg da ON da.node = a JOIN deg db ON db.node = b
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM o e1 JOIN o e2 ON e1.u = e2.u
       AND (e1.degv < e2.degv OR (e1.degv = e2.degv AND e1.v < e2.v))
      JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v
    ), pn AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY node
    )
    SELECT deg.node, degree, coalesce(triangles, 0) AS triangles,
           CASE WHEN degree >= 2
                THEN round(2.0 * coalesce(triangles, 0)
                           / (degree * (degree - 1.0)), 9)
                ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN pn ON pn.node = deg.node
    """,
)
def graph_triangle_stats(spark, sf_dir):
    """Per-node triangle counts + local clustering coefficient
    (operators/graph.triangle_stats) — the link-graph density signal
    next to pagerank in crawl curation (spam farms cluster, organic
    link neighborhoods don't). Degree-ordered compact-forward counting:
    each triangle found exactly once at its (deg,node)-smallest corner,
    so the wedge join emits O(m^1.5) rows worst-case instead of a hub's
    deg² pairs — the orientation IS the 100 TB story. Three node-keyed
    hash joins + one count; integer arithmetic end-to-end (coefficient
    rounded 9dp), so the oracle replays it bit-for-bit."""
    from dataux_spark.operators.graph import triangle_stats

    d = read_table(spark, sf_dir, "documents")
    edges = d.select(
        (F.col("doc_id") % 60).alias("src"),
        ((F.col("doc_id") % 60 + F.col("doc_id") % 11 + 1) % 60).alias("dst"),
    )
    return triangle_stats(edges)


@_q(
    "sample_pctl_normalize",
    # the oracle replays the per-group (score, id)-ordered percent_rank
    # over the identical n_chars score
    """
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (
             PARTITION BY source ORDER BY n_chars, doc_id), 6) AS pctl
    FROM documents
    """,
)
def sample_pctl_normalize(spark, sf_dir):
    """Per-group percentile-rank normalization
    (operators/sampling.percentile_rank_normalize): scores become
    "top X% of its source" so one global threshold means the same thing
    on every corpus — the cross-corpus calibration step before mixing.
    Deterministic (score, id) tie order, one group-keyed shuffle, no
    global sort anywhere."""
    from dataux_spark.operators.sampling import percentile_rank_normalize

    d = read_table(spark, sf_dir, "documents")
    return percentile_rank_normalize(
        d.select("doc_id", "source", "n_chars"), "n_chars", "source", "doc_id"
    )


def _kfold_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    return (
        f"SELECT CAST(floor({f} * 5) AS INT) AS fold, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_id, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM documents GROUP BY 1"
    )


@_q("sample_kfold_counts", _kfold_oracle())
def sample_kfold_counts(spark, sf_dir):
    """K-fold CV assignment (operators/sampling.kfold_assign): fold =
    md5 hash band of the doc id — deterministic, retry-stable, and
    growth-stable, so fold-i models stay comparable across corpus
    refreshes where a random ntile would reshuffle everything. Pure
    map on the scan; the gate checks per-fold membership exactly via
    count/min/id-sum (bit-exact band parity, same contract as
    split_hash_counts)."""
    from dataux_spark.operators.sampling import kfold_assign

    d = read_table(spark, sf_dir, "documents")
    return (
        kfold_assign(d, "doc_id", k=5)
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


def _shard_manifest_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    dig = ("(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15))"
           "::UBIGINT % 2147483647)")
    return (
        f"SELECT CAST(floor({f} * 8) AS INT) AS shard, "
        f"CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum(length(text)) AS BIGINT) AS n_chars, "
        f"CAST(sum({dig}) % 2147483647 AS BIGINT) AS digest "
        "FROM documents GROUP BY 1"
    )


@_q("export_shard_manifest", _shard_manifest_oracle())
def export_shard_manifest(spark, sf_dir):
    """Dataset-export manifest (operators/export.shard_manifest): per
    hash-band shard, row count, content bytes, and an order-insensitive
    mod-prime content digest — the integrity contract the training-side
    reader verifies before consuming an exported corpus
    (export.verify_shards). Shard assignment is the house md5 band, so
    export is retry- and growth-stable; the digest sums 31-bit row
    hashes mod a Mersenne prime, pinned mod-FIRST so the arithmetic
    never leaves BIGINT on any engine. One shard-key groupBy over scan
    projections."""
    from dataux_spark.operators.export import shard_manifest

    d = read_table(spark, sf_dir, "documents")
    return shard_manifest(d, "doc_id", "text", shards=8).select(
        "shard",
        "n_rows",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "digest",
    )


def _cap_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    return (
        "SELECT doc_id, source FROM ("
        "SELECT doc_id, source, row_number() OVER ("
        f"PARTITION BY source ORDER BY {f}, doc_id) AS rn "
        "FROM documents) t WHERE rn <= 7"
    )


@_q("sample_group_cap", _cap_oracle())
def sample_group_cap(spark, sf_dir):
    """Per-group diversity cap (sampling.cap_per_group): at most 7 docs
    per source, chosen by the stable md5 order — the web-curation "no
    domain dominates the corpus" pass, here keyed on the source column
    (at crawl scale the key is registered_domain_col). Growth-stable
    (a new doc never evicts a keeper unless it hashes into the top-7)
    and retry-reproducible; ONE group-key shuffle with WindowGroupLimit
    partial top-k map-side. The oracle replays the identical md5 rank."""
    from dataux_spark.operators.sampling import cap_per_group

    d = read_table(spark, sf_dir, "documents")
    return cap_per_group(d, "source", "doc_id", 7).select("doc_id", "source")


def _epoch_shuffle_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id", 1)
    return (
        "WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':1') AS hh, "
        f"CAST(floor({f} * 8) AS INT) AS shard FROM documents) "
        "SELECT doc_id, shard, "
        "CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS INT) "
        "AS shard_pos FROM h"
    )


@_q("epoch_shuffle_shards", _epoch_shuffle_oracle())
def epoch_shuffle_shards(spark, sf_dir):
    """Deterministic epoch shuffle (extension — the training-data serving
    reorder): seeded md5 sort key, hash-fraction band shards, per-shard
    rank (operators/sampling.epoch_shuffle). One uniform-key shuffle; a
    new seed is a fresh reproducible permutation. The oracle recomputes
    the identical key, band, and rank in DuckDB — full permutation parity,
    not a statistical check."""
    from dataux_spark.operators.sampling import epoch_shuffle

    d = read_table(spark, sf_dir, "documents")
    out = epoch_shuffle(d, "doc_id", seed=1, n_shards=8)
    return out.select("doc_id", "shard", F.col("shard_pos").cast("int").alias("shard_pos"))


@_q(
    "bucketed_join_revenue",
    "SELECT o.o_orderpriority, count(*) AS ct, round(sum(l.l_extendedprice), 2) AS rev "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderpriority",
)
def bucketed_join_revenue(spark, sf_dir):
    """Co-located bucketed join (bucketing.bucketize): both sides written
    bucketed on the join key (the one ingest-time shuffle), so the join
    itself plans exchange-free — the 100 TB lever that kills the
    lineitem⋈orders exchange. External bucketed tables under the temp dir
    (a vanilla driver session's warehouse is CWD); value-identical to the
    plain join per the oracle, exchange-freedom pinned by the plan audit
    and test_bucketing."""
    import os
    import tempfile

    from dataux_spark import bucketing

    slug = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(sf_dir)))
    tmp = tempfile.gettempdir()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    bucketing.bucketize(
        li, f"dataux_bli_{slug}", ["l_orderkey"], buckets=8,
        path=f"{tmp}/dataux_bli_{slug}",
    )
    bucketing.bucketize(
        o, f"dataux_bor_{slug}", ["l_orderkey"], buckets=8,
        path=f"{tmp}/dataux_bor_{slug}",
    )
    j = spark.table(f"dataux_bli_{slug}").join(
        spark.table(f"dataux_bor_{slug}"), "l_orderkey"
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("ct"),
        F.round(F.sum("l_extendedprice"), 2).alias("rev"),
    )


@_q(
    "compaction_roundtrip",
    # CAST the integer sum: DuckDB types sum(BIGINT) as HUGEINT (int128)
    # while Spark's sum-of-long is BIGINT — rows/schema/values all match but
    # the driver's typed-value hash differs (CORRECTNESS_r06's one mismatch).
    "SELECT lang, count(*) AS ct, CAST(sum(doc_id) AS BIGINT) AS id_sum, "
    "count(DISTINCT source) AS n_sources FROM documents GROUP BY lang",
)
def compaction_roundtrip(spark, sf_dir):
    """Clustered compaction (operators/maintenance.compact): rewrite the
    documents table into target-size files range-partitioned + sorted on
    (lang, doc_id), then prove the rewrite lossless by aggregating the
    compacted copy against the oracle's view of the original — same
    counts, id checksums, and source cardinality per language."""
    import os
    import tempfile

    from dataux_spark.operators.maintenance import compact

    slug = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(sf_dir)))
    dest = f"{tempfile.gettempdir()}/dataux_compact_{slug}"
    compact(
        spark, f"{sf_dir}/documents.parquet", dest, target_mb=1,
        sort_cols=["lang", "doc_id"],
    )
    return (
        spark.read.parquet(dest)
        .groupBy("lang")
        .agg(
            F.count("*").alias("ct"),
            F.sum("doc_id").alias("id_sum"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


@_q(
    "skew_salted_agg",
    "SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS ct "
    "FROM lineitem GROUP BY l_returnflag",
)
def skew_salted_agg(spark, sf_dir):
    """Salted two-stage aggregation (operators/skew.two_stage_agg): hot
    keys split across salt_n reducers in stage 1, partials merged on the
    bare keys in stage 2 — must be value-identical to the plain GROUP BY
    (the oracle), proving salting never changes the answer, only the
    shuffle distribution."""
    from dataux_spark.operators.skew import two_stage_agg

    li = read_table(spark, sf_dir, "lineitem")
    out = two_stage_agg(
        li, ["l_returnflag"], ["l_quantity"], count=True, uniquifier="l_orderkey"
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("ct"),
    )


@_q(
    "skew_salted_join",
    "SELECT s.s_name AS s_name, count(*) AS ct, round(sum(l.l_quantity), 2) AS sum_qty "
    "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY s.s_name",
)
def skew_salted_join(spark, sf_dir):
    """Salted equi-join (operators/skew.salted_join): the skewed fact side
    is salted, the small side explode-replicated across all salts, joined
    on (key, salt) — value-identical to the plain join per the oracle."""
    from dataux_spark.operators.skew import salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_orderkey"
    )
    su = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    j = salted_join(li, su, "suppkey", salt_n=8, uniquifier="l_orderkey")
    return j.groupBy("s_name").agg(
        F.count("*").alias("ct"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@_q(
    "join_bloom_reduced",
    # the oracle is the PLAIN join+agg — bloom reduction is answer-
    # preserving (false positives die in the real join, true keys always
    # pass their own bucket)
    "SELECT p.p_size AS p_size, count(*) AS ct, "
    "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE p.p_brand = 'Brand#23' GROUP BY p.p_size",
)
def join_bloom_reduced(spark, sf_dir):
    """Bloom/semi-join reduction (operators/skew.bloom_reduced_join —
    Bloomjoin, Mackert & Lohman VLDB'86): the selective dim filter
    (p_brand = one of 25 brands) leaves ~96% of lineitem joinless; the
    dim side's deduplicated hashed-bucket set broadcasts (bounded by the
    literal modulus — the Deduplicate node is the audit's boundedness
    witness) and drops those fact rows BEFORE the join shuffle. Result
    provably equals the plain join, which is the oracle."""
    from dataux_spark.operators.skew import bloom_reduced_join

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice", "l_discount"
    )
    pa = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select(F.col("p_partkey").alias("partkey"), "p_size")
    )
    j = bloom_reduced_join(li, pa, "partkey")
    return j.groupBy("p_size").agg(
        F.count("*").alias("ct"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@_q(
    "rollup_hourly_merge",
    "SELECT date_trunc('hour', ts) AS bucket, event_type AS \"key\", count(*) AS n_events, "
    "round(sum(value), 2) AS value_sum, min(value) AS value_min, max(value) AS value_max "
    "FROM events GROUP BY 1, 2",
)
def rollup_hourly_merge(spark, sf_dir):
    """Continuous-aggregate rollup (extension; TimescaleDB/Druid-style):
    materialize hourly algebraic partials for closed buckets (older than
    24h before the table's max ts), partitioned by bucket date, then answer
    the full-range hourly aggregate as rollup ∪ re-aggregated raw tail.
    The oracle aggregates raw events end-to-end — passing proves the
    materialize-and-merge path is lossless. At 100 TB the rollup answer
    reads bucket×key rows plus one refresh-interval of raw data instead of
    the whole table."""
    import os
    import tempfile

    from dataux_spark.operators.rollup import build_rollup, rollup_plus_tail

    e = read_table(spark, sf_dir, "events")
    max_ts = e.agg(F.date_trunc("hour", F.max("ts")).alias("m")).collect()[0].m
    cutoff = max_ts - __import__("datetime").timedelta(hours=24)
    path = os.path.join(
        tempfile.gettempdir(),
        f"dataux_rollup_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    build_rollup(e, path, cutoff)
    return rollup_plus_tail(spark, e, path, cutoff).select(
        "bucket",
        "key",
        "n_events",
        _r2(F.col("value_sum")).alias("value_sum"),
        "value_min",
        "value_max",
    )


@_q(
    "events_json_extract",
    "SELECT event_type, round(avg(CAST(json_extract(props, '$.k') AS DOUBLE)), 4) AS avg_k "
    "FROM events GROUP BY event_type",
)
def events_json_extract(spark, sf_dir):
    """JSON field extraction from a raw-JSON column (reference JsonType
    surfaced as raw blob, frontends/mysqlfe/results_mysql.go:248-249)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 4).alias("avg_k")
        )
    )


# --- LLM-pipeline operators: dedup / similarity / text / multimodal -------
# (beyond-reference extensions per BASELINE.json north star)

@_q(
    "dedup_exact",
    "SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS dup_count "
    "FROM documents GROUP BY md5(text)",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content-digest groupBy (operators/dedup.py)."""
    from dataux_spark.operators.dedup import exact_dedup

    return exact_dedup(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "dedup_fingerprint",
    "SELECT md5(array_to_string(list_sort(list_distinct("
    "regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')) AS fp, "
    "min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1",
)
def dedup_fingerprint(spark, sf_dir):
    """Sorted-distinct-token fingerprint dedup — catches token-shuffled
    duplicates (operators/dedup.py)."""
    from dataux_spark.operators.dedup import fingerprint_dedup

    return fingerprint_dedup(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "dedup_ngram_jaccard",
    # r12: the oracle replays the lang-blocked PREFIX-candidate scheme +
    # exact verify — equal to the old all-pairs SQL by the prefix
    # theorem, but candidate-linear, so the sf0.1 sweep value-checks it
    # too (the all-pairs spelling ran ~10 min at sf0.1)
    f"""
    WITH g AS (
      SELECT doc_id AS _id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(0.5, block="lang")}
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                 len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                len(list_distinct(a.grams || b.grams)), 6) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs ≥0.5 within lang blocks
    (operators/dedup.py: the verify stage of near-dup detection).
    QUADRATIC BY CONTRACT (r8 probe: 8.0x at 10x data) — this entry IS
    the family's exact blocked-all-pairs primitive, kept as the
    verify/oracle twin; production-scale pair generation goes through
    the three linear schemes (prefix-filter, MinHash-LSH, SimHash
    banding), and every OTHER registry entry that consumed this one now
    uses the prefix scheme (SCALE.md round-8)."""
    from dataux_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), "text", "doc_id", ["lang"], n=3, threshold=0.5
    )


@_q(
    "dedup_prefix_jaccard",
    # r12: the oracle replays the SAME prefix-candidate + exact-verify
    # shape the operator's prefix route uses (threshold interpolated from
    # ADAPTIVE_JACCARD_KW so SQL and Spark kwargs cannot drift) — equal
    # to the quadratic all-pairs answer by the prefix theorem, at
    # candidate-linear cost, so the sf0.1 sweep value-checks it too.
    f"""
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(ADAPTIVE_JACCARD_KW["threshold"])}
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                 len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                len(list_distinct(a.grams || b.grams)), 6)
          >= {ADAPTIVE_JACCARD_KW["threshold"]}
    """,
)
def dedup_prefix_jaccard(spark, sf_dir):
    """AllPairs/PPJoin prefix-filtered shingle-set similarity self-join —
    since r10 through the DATA-ADAPTIVE router (operators/dedup.py
    adaptive_jaccard_pairs, VERDICT r9 item 1): a one-pass prefix-key
    census picks the exact prefix scheme while the shingle vocabulary
    grows with the corpus, and switches candidate generation to
    minhash-LSH band keys + the SAME exact-Jaccard verify once the
    census reads the corpus as vocabulary-saturated (>8 estimated
    candidate pairs/doc — the measured n² regime). At driver scale the
    census picks the prefix route (3.2 est pairs/doc at sf0.01), so the
    exact all-pairs oracle is replayed losslessly; route equality on the
    saturated doubled corpus is pinned in tests/test_keygrowth.py."""
    from dataux_spark.operators.dedup import adaptive_jaccard_pairs

    return adaptive_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        block_cols=ADAPTIVE_JACCARD_BLOCKS["dedup_prefix_jaccard"],
        **ADAPTIVE_JACCARD_KW,
    )


@_q(
    "dedup_winnow_fingerprints",
    """
    WITH h AS (
      SELECT doc_id,
             list_transform(
               list_transform(
                 generate_series(1, greatest(len(toks) - 2, 1)),
                 i -> array_to_string(toks[i:i+2], ' ')),
               g -> substr(md5(g), 1, 16)) AS hs
      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents WHERE doc_id <= 300)
    ),
    w AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(hs) - 3, 1)),
               i -> list_min(hs[i:i+3]))) AS fps
      FROM h
    )
    SELECT DISTINCT doc_id, unnest(fps) AS fp FROM w
    """,
)
def dedup_winnow_fingerprints(spark, sf_dir):
    """Winnowing rolling-hash fingerprints (Schleimer et al., SIGMOD 2003):
    3-gram md5-prefix hashes, window-4 sliding min (operators/dedup.py
    winnow_fingerprints — all JVM higher-order functions, zero shuffle)."""
    from dataux_spark.operators.dedup import winnow_fingerprints

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    out = winnow_fingerprints(docs, "text", "doc_id", k=3, window=4)
    return out.select(F.col("_id").alias("doc_id"), "fp")


@_q(
    "dedup_minhash_lsh",
    # The operator's OUTPUT is exact-Jaccard-verified pairs ≥ threshold —
    # LSH only generates candidates, the verify stage recomputes true
    # Jaccard — so an EXACT pair oracle is legitimate (tests/test_dedup.py
    # asserts LSH == exact at this threshold; both sides deterministic).
    # r12: the exact answer is replayed via the prefix-candidate scheme
    # instead of all-pairs (equal by the prefix theorem, candidate-linear)
    # so the sf0.1 sweep value-checks this entry too.
    f"""
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(0.5)}
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                 len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                len(list_distinct(a.grams || b.grams)), 6) >= 0.5
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64)+LSH(16 bands) near-dup pairs, Jaccard-verified ≥0.5
    (operators/dedup.py). Equivalence to exact ngram_jaccard at high
    thresholds is asserted in tests/test_dedup.py."""
    from dataux_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=64, bands=16, shingle_n=3, threshold=0.5,
    )


@_q(
    "dedup_incremental_minhash",
    # Same oracle justification as dedup_minhash_lsh: the output is
    # exact-Jaccard-verified pairs, LSH only proposes candidates, and the
    # store probe == full recompute on cross pairs is asserted in tests —
    # so the exact cross-pairs SQL is the value oracle.
    """
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    )
    SELECT b._id AS batch_id, s._id AS store_id,
           round(len(list_intersect(b.grams, s.grams))::DOUBLE /
                 len(list_distinct(b.grams || s.grams)), 6) AS jaccard
    FROM g b JOIN g s ON b._id > 250 AND s._id <= 250
    WHERE round(len(list_intersect(b.grams, s.grams))::DOUBLE /
                len(list_distinct(b.grams || s.grams)), 6) >= 0.5
    """,
)
def dedup_incremental_minhash(spark, sf_dir):
    """Continuous-ingest NEAR-dup: the historical corpus's minhash
    signatures live in a persisted band-partitioned store; a new batch
    probes it without recomputing any historical signature
    (operators/dedup.build_minhash_store / incremental_minhash_candidates;
    probe == full recompute asserted in tests). Store = docs ≤250,
    batch = the rest; the oracle computes exact Jaccard on the cross
    pairs."""
    import os
    import tempfile

    from dataux_spark.operators.dedup import (
        build_minhash_store,
        incremental_minhash_candidates,
    )

    slug = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(sf_dir)))
    store = f"{tempfile.gettempdir()}/dataux_mhstore_{slug}"
    docs = read_table(spark, sf_dir, "documents")
    build_minhash_store(docs.filter(F.col("doc_id") <= 250), "text", "doc_id", store)
    return incremental_minhash_candidates(
        docs.filter(F.col("doc_id") > 250), "text", "doc_id", store, threshold=0.5
    )


@_q(
    "streaming_incremental_neardup",
    # Deterministic like dedup_incremental_minhash: the streaming probe
    # reports every exact-Jaccard-verified pair whose sides arrived in
    # different ingest units (store / micro-batch 1 / micro-batch 2),
    # reported (newer, older) — expressible as the unit-partitioned
    # cross-pairs exact-Jaccard SQL.
    """
    WITH g AS (
      SELECT doc_id AS _id,
             CASE WHEN doc_id <= 200 THEN 0
                  WHEN doc_id <= 250 THEN 1 ELSE 2 END AS unit,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    )
    SELECT b._id AS batch_id, s._id AS store_id,
           round(len(list_intersect(b.grams, s.grams))::DOUBLE /
                 len(list_distinct(b.grams || s.grams)), 6) AS jaccard
    FROM g b JOIN g s ON b.unit > s.unit
    WHERE round(len(list_intersect(b.grams, s.grams))::DOUBLE /
                len(list_distinct(b.grams || s.grams)), 6) >= 0.5
    """,
)
def streaming_incremental_neardup_pairs(spark, sf_dir):
    """Structured-Streaming ingest dedup (streaming/ops.py
    streaming_incremental_neardup): history docs (≤200) seed the persisted
    minhash store; the rest arrives as two one-file micro-batches, each
    probing the store then committing its signatures — so batch 2 is
    checked against batch 1 as well as history. Pairs are exact-Jaccard
    verified; the probe-then-commit loop is the foreachBatch contract a
    Kafka ingest would run unchanged."""
    import tempfile

    from dataux_spark import streaming as S
    from dataux_spark.operators.dedup import build_minhash_store

    docs = read_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="dataux_stream_nd_")
    store, pairs, incoming = f"{root}/store", f"{root}/pairs", f"{root}/in"
    build_minhash_store(docs.filter(F.col("doc_id") <= 200), "text", "doc_id", store)
    docs.filter((F.col("doc_id") > 200) & (F.col("doc_id") <= 250)).coalesce(1).write.parquet(
        f"{incoming}/b1.parquet"
    )
    docs.filter(F.col("doc_id") > 250).coalesce(1).write.parquet(f"{incoming}/b2.parquet")
    schema = spark.read.parquet(f"{incoming}/b1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_incremental_neardup(
        stream, "text", "doc_id", store, pairs, threshold=0.5
    ).awaitTermination()
    # Lazy read of the pairs sink — no driver collect. The mkdtemp root is
    # left for the OS tmp reaper: the frame must stay readable after this
    # builder returns, and pairs_path is append-mode so a shared dir
    # across calls would accumulate stale rows.
    return spark.read.parquet(pairs).select("batch_id", "store_id", "jaccard")


@_q(
    "streaming_url_dedup",
    # acceptance semantics in SQL: a canonical key is owned by the FIRST
    # micro-batch that carries it (batch 0 = doc_id <= 250), and the
    # keeper is the min doc_id within that owning batch — exactly the
    # probe-then-commit contract the stream executes
    """
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id <= 250 THEN 0 ELSE 1 END AS b,
             'site' || CAST(doc_id % 3 AS VARCHAR) || '.com/doc/' ||
             CAST(doc_id % 150 AS VARCHAR) AS url_canon
      FROM documents
    ),
    fb AS (SELECT url_canon, min(b) AS owner FROM planted GROUP BY url_canon)
    SELECT p.url_canon,
           min(p.doc_id) AS doc_id,
           CAST(f.owner AS BIGINT) AS batch
    FROM planted p JOIN fb f
      ON p.url_canon = f.url_canon AND p.b = f.owner
    GROUP BY p.url_canon, f.owner
    """,
)
def streaming_url_dedup(spark, sf_dir):
    """Structured-Streaming crawl-frontier URL dedup (streaming/ops.py
    streaming_url_dedup_ingest): documents arrive as two one-file
    micro-batches carrying planted URL spellings (uppercase host, www.,
    :443, tracking param — all folded by canonicalization); each batch
    keeps min-id-per-canonical-key, drops keys the store already
    accepted, appends survivors, commits its keys. The oracle states the
    end-to-end acceptance rule relationally: first-owning-batch wins,
    min id within it."""
    import tempfile

    from dataux_spark import streaming as S

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".COM:443/doc/"), (F.col("doc_id") % 150).cast("string"),
            F.lit("/?utm_source=crawl"),
        ).alias("url"),
    )
    root = tempfile.mkdtemp(prefix="dataux_stream_url_")
    store, accepted, incoming = f"{root}/store", f"{root}/accepted", f"{root}/in"
    docs.filter(F.col("doc_id") <= 250).coalesce(1).write.parquet(f"{incoming}/b1.parquet")
    docs.filter(F.col("doc_id") > 250).coalesce(1).write.parquet(f"{incoming}/b2.parquet")
    schema = spark.read.parquet(f"{incoming}/b1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_url_dedup_ingest(stream, "url", "doc_id", store, accepted).awaitTermination()
    # lazy read of the accepted sink; tmp root left for the OS reaper
    # (same lifetime rationale as streaming_incremental_neardup_pairs)
    return spark.read.parquet(accepted).select(
        "url_canon", "doc_id", F.col("batch").cast("bigint").alias("batch")
    )


def _simhash_md5_oracle(bits: int = 60) -> str:
    sums = ",\n             ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    packed = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""
    WITH t AS (
      SELECT doc_id AS _id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT _id,
             CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS BIGINT) AS h
      FROM t
    ), s AS (
      SELECT _id,
             {sums}
      FROM h GROUP BY _id
    )
    SELECT _id AS doc_id, CAST({packed} AS BIGINT) AS simhash FROM s
    """


@_q("dedup_simhash_md5", _simhash_md5_oracle())
def dedup_simhash_md5(spark, sf_dir):
    """Oracle-checkable SimHash twin (operators/dedup.simhash_md5): 60-bit
    md5-derived token hashes, integer div/mod bit extraction, sign-sum —
    the oracle replays every bit. Value-checking this pins the whole
    sign-sum bit pipeline; the xxhash64 production variant
    (dedup_simhash) shares the construction and keeps its banding/verify
    invariants in tests."""
    from dataux_spark.operators.dedup import simhash_md5

    return simhash_md5(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    ).select(F.col("_id").alias("doc_id"), "simhash")


@_q(
    "dedup_simhash",
    # r13 (VERDICT r12 item 4): converted from rows-only to a CONTRACT
    # oracle. The xxhash64 simhash VALUES can't replay in DuckDB (the
    # md5 twin dedup_simhash_md5 pins the bit arithmetic), but the
    # pipeline's completeness contract is replayable: token-identical
    # docs have hamming 0, and the WWW'07 combination blocking
    # guarantees a candidate key for EVERY pair within the radius — so
    # recall over the exactly-replayable truth set "token-identical
    # pairs" (planted 1%-copies ∪ organic) must be 1.0. A blocking or
    # verify regression that drops any such pair now hash-mismatches.
    """
    WITH base AS (
      SELECT doc_id,
             md5(array_to_string(
               regexp_split_to_array(lower(trim(text)), '\\s+'), ' ')) AS nh
      FROM documents WHERE text IS NOT NULL
    ), corpus AS (
      SELECT doc_id, nh FROM base
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, nh FROM base WHERE doc_id % 100 = 0
    ), truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM corpus a JOIN corpus b ON a.nh = b.nh AND a.doc_id < b.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs,
           CAST(count(*) AS BIGINT) AS n_caught,
           CAST(1.0 AS DOUBLE) AS identical_recall
    FROM truth
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs within hamming ≤ 3 (operators/dedup.py)
    — contract-checked (r13): the corpus is documents plus planted
    copies of every 100th doc under shifted ids, the truth set is every
    token-identical pair (md5 of the normalized token stream — the same
    tokens() normalization simhash hashes), and the entry returns
    measured recall of simhash_pairs over that truth set. Identical
    token streams give identical simhashes (hamming 0), and WWW'07
    combination blocking guarantees a shared candidate key at any
    distance ≤ the radius, so recall MUST be exactly 1.0 — value-pinning
    the blocking + verify pipeline that the rows-only gate never
    checked. The truth join rides md5 digests, never full texts."""
    from dataux_spark.operators.dedup import simhash_pairs, tokens

    # NULL-text guard (r13 review): Spark's concat_ws maps a NULL token
    # array to '' while DuckDB's array_to_string yields NULL, so a NULL
    # text row would enter Spark's truth set (nh = md5('')) but not the
    # oracle's — filter NULLs identically on both sides instead.
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    planted = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(planted)
    pairs = simhash_pairs(corpus, "text", "doc_id", max_hamming=3)
    nh = corpus.select(
        "doc_id", F.md5(F.concat_ws(" ", tokens(F.col("text")))).alias("nh")
    )
    truth = (
        nh.alias("a")
        .join(nh.alias("b"), F.col("a.nh") == F.col("b.nh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    flagged = truth.join(
        pairs.select("id_a", "id_b").withColumn("_hit", F.lit(1)),
        ["id_a", "id_b"],
        "left",
    )
    # ONE aggregate over the flagged truth frame — no scalar crossJoin
    # spine, so the entry keeps its plan-audit contract (hash-keyed
    # joins only, never a nested-loop join).
    return flagged.agg(
        F.count("*").alias("n_truth_pairs"),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias(
            "n_caught"
        ),
    ).select(
        "n_truth_pairs",
        "n_caught",
        F.round(
            F.col("n_caught").cast("double") / F.col("n_truth_pairs"), 6
        ).alias("identical_recall"),
    )


@_q(
    "dedup_clusters",
    # r12: the pair frame is replayed via the lang-blocked prefix-candidate
    # scheme + exact verify (== all-pairs by the prefix theorem, at
    # candidate-linear cost) before the exact transitive closure
    f"""
    WITH RECURSIVE g AS (
      SELECT doc_id AS _id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(ADAPTIVE_JACCARD_KW["threshold"], block="lang")}, pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
      WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(list_distinct(a.grams || b.grams)), 6)
            >= {ADAPTIVE_JACCARD_KW["threshold"]}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ), reach AS (
      SELECT DISTINCT a AS node, a AS r FROM edges
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT node, min(r) AS cluster FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark, sf_dir):
    """Duplicate clustering: near-dup pairs → connected components via
    distributed min-label propagation (operators/dedup.py). The oracle
    computes exact transitive closure with a recursive CTE — label
    propagation must converge to the same clusters. Pair generation is
    the r10 data-adaptive router (adaptive_jaccard_pairs): the exact
    prefix-filter scheme with the lang restriction inside the candidate
    join while the prefix-key census reads unsaturated (it does at
    driver scale — pair set bit-identical by the prefix-filtering
    theorem), minhash-LSH candidates + the same exact verify once the
    corpus saturates its vocabulary (the r9 gate's n² finding, now a
    code path, not a SCALE.md prescription)."""
    from dataux_spark.operators.dedup import adaptive_jaccard_pairs, connected_components

    pairs = adaptive_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        block_cols=ADAPTIVE_JACCARD_BLOCKS["dedup_clusters"],
        **ADAPTIVE_JACCARD_KW,
    )
    return connected_components(pairs)


@_q(
    "text_bigram_pppl",
    # the oracle refits the interpolated model exactly: unigram + bigram
    # censuses, the Jelinek-Mercer mixture with (1.0 - 0.7) spelled as
    # the same IEEE subtraction Spark's Python literal performs, ln/exp
    # parity as in text_unigram_pppl
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), bgrows AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
      FROM toks WHERE len(t) >= 2
    ), bg AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bgrows
    ), uni AS (
      SELECT term, count(*) AS cu
      FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
    ), totals AS (
      SELECT CAST(sum(cu) + count(*) AS DOUBLE) AS denom FROM uni
    ), cb AS (
      SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
    ), docbg AS (
      SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3
    )
    SELECT doc_id AS _id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           round(-sum(tf * ln(0.7 * cb.cb / u1.cu
                              + (1.0 - 0.7) * (u2.cu + 1)
                                / (SELECT denom FROM totals)))
                 / sum(tf), 6) AS mean_neg_logprob,
           round(exp(round(-sum(tf * ln(0.7 * cb.cb / u1.cu
                              + (1.0 - 0.7) * (u2.cu + 1)
                                / (SELECT denom FROM totals)))
                 / sum(tf), 6)), 4) AS pppl
    FROM docbg
    JOIN cb USING (w1, w2)
    JOIN uni u1 ON u1.term = w1
    JOIN uni u2 ON u2.term = w2
    GROUP BY doc_id
    """,
)
def text_bigram_pppl(spark, sf_dir):
    """Interpolated-bigram LM scoring (operators/text.
    bigram_logprob_scores): the unigram CCNet scorer one Markov order up
    — catches "right words, wrong order" text a unigram model scores as
    normal. Jelinek-Mercer mixture of the ML bigram with the add-one
    unigram floor; same census-as-checkpoint plan shape as
    text_unigram_pppl (two map-side-combined censuses, the unigram one
    checkpointed as the model, scalar
    totals folded as literals, one doc roll-up)."""
    from dataux_spark.operators.text import bigram_logprob_scores

    d = read_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(d, "text", "doc_id", lam=0.7).select(
        "_id", "n_bigrams", "mean_neg_logprob", "pppl"
    )


@_q(
    "text_lexical_drift",
    # the oracle replays both censuses, the deterministic top-200
    # combined vocabulary, the OOV fold, eps-smoothing, and the JS terms
    """
    WITH rc AS (
      SELECT tok, count(*) AS rn FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
        FROM documents WHERE lang = 'en') WHERE tok <> '' GROUP BY tok
    ), cc AS (
      SELECT tok, count(*) AS cn FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
        FROM documents WHERE lang <> 'en') WHERE tok <> '' GROUP BY tok
    ), both_c AS (
      SELECT coalesce(rc.tok, cc.tok) AS tok,
             coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
      FROM rc FULL JOIN cc ON rc.tok = cc.tok
    ), vocab AS (
      SELECT tok, rn, cn FROM both_c ORDER BY rn + cn DESC, tok LIMIT 200
    ), oov AS (
      SELECT '<OOV>' AS tok, coalesce(sum(rn), 0) AS rn, coalesce(sum(cn), 0) AS cn
      FROM both_c WHERE tok NOT IN (SELECT tok FROM vocab)
    ), space AS (
      SELECT * FROM vocab UNION ALL SELECT * FROM oov
    ), t AS (SELECT sum(rn) AS tr, sum(cn) AS tc FROM space)
    SELECT tok,
           round(greatest(rn / tr, 1e-6), 9) AS p_ref,
           round(greatest(cn / tc, 1e-6), 9) AS q_cur,
           round(0.5 * greatest(rn / tr, 1e-6)
                 * ln(greatest(rn / tr, 1e-6)
                      / ((greatest(rn / tr, 1e-6) + greatest(cn / tc, 1e-6)) / 2))
               + 0.5 * greatest(cn / tc, 1e-6)
                 * ln(greatest(cn / tc, 1e-6)
                      / ((greatest(rn / tr, 1e-6) + greatest(cn / tc, 1e-6)) / 2)),
                 9) AS js_term
    FROM space CROSS JOIN t
    """,
)
def text_lexical_drift(spark, sf_dir):
    """Jensen-Shannon lexical drift (operators/text.lexical_drift_js)
    between the English slice and the rest of the corpus — the
    token-level sibling of profile_drift_psi: catches vocabulary-level
    shifts (template floods, new spam vocab, language-mix moves) a
    numeric column monitor cannot see. Deterministic top-200 combined
    vocabulary with an explicit OOV fold (the PSI dense-spine rule:
    dropping the tail under-reports drift exactly when it is largest);
    everything after the two censuses is O(vocab_k) rows."""
    from dataux_spark.operators.text import lexical_drift_js

    d = read_table(spark, sf_dir, "documents")
    return lexical_drift_js(
        d.filter(F.col("lang") == "en"),
        d.filter(F.col("lang") != "en"),
        "text",
        vocab_k=200,
    )


@_q(
    "text_vocab_coverage",
    # the oracle replays census → deterministic (cnt desc, tok asc) top
    # rank → per-k cumulative coverage, with the identical tokenizer
    """
    WITH census AS (
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY tok
    ), total AS (SELECT sum(cnt) AS t FROM census),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
      FROM census ORDER BY cnt DESC, tok LIMIT 1000
    )
    SELECT k, CAST(sum(cnt) AS BIGINT) AS covered_occurrences,
           (SELECT CAST(t AS BIGINT) FROM total) AS total_occurrences,
           round(sum(cnt) / (SELECT t FROM total), 6) AS coverage
    FROM ranked CROSS JOIN (VALUES (10), (100), (1000)) AS ks(k)
    WHERE rn <= k GROUP BY k
    """,
)
def text_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (operators/text.vocab_coverage): what
    fraction of token occurrences the k most frequent types cover, for
    k in {10, 100, 1000} — the signal that sizes a tokenizer vocabulary
    before training one. One map-side-combined census shuffle (the only
    corpus-sized stage), a TakeOrderedAndProject top-max(k), and a rank
    window bounded by the ARGUMENT rather than the vocabulary, so
    nothing here is vocabulary-wide-single-partition. Deterministic
    (cnt desc, tok asc) rank makes the curve engine-exact."""
    from dataux_spark.operators.text import vocab_coverage

    d = read_table(spark, sf_dir, "documents")
    return vocab_coverage(d, "text", ks=[10, 100, 1000]).select(
        "k",
        "covered_occurrences",
        "total_occurrences",
        "coverage",
    )


@_q(
    "dedup_containment_pairs",
    # exact containment IS the value oracle — r12: replayed via the
    # asymmetric prefix-candidate scheme (contained prefix × container
    # full postings + size filter) + exact directional verify, equal to
    # the quadratic all-pairs answer by the filtering principle but
    # candidate-linear, so the sf0.1 sweep value-checks this entry too
    # (threshold interpolated from ADAPTIVE_CONTAINMENT_KW)
    f"""
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_containment_candidate_pairs_ctes(ADAPTIVE_CONTAINMENT_KW["threshold"])}
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE
                 / len(a.grams), 6) AS containment
    FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
                / len(a.grams), 6) >= {ADAPTIVE_CONTAINMENT_KW["threshold"]}
    """,
)
def dedup_containment_pairs(spark, sf_dir):
    """Directional containment join — since r11 through the DATA-ADAPTIVE
    router (operators/dedup.adaptive_containment_pairs, VERDICT r10
    item 1): (a, b) where |A∩B|/|A| >= 0.8, the quote-inclusion /
    partial-copy duplication Jaccard misses when a long container
    dominates the union. The census (contained prefix postings ×
    container full postings — one linear aggregate) picks the lossless
    asymmetric prefix scheme (containment_pairs) while the vocabulary
    grows with the corpus, and ratio-capped banded-MinHash candidates +
    the SAME exact directional verify once it saturates. At the driver
    gate's sf0.01 the census reads 1.07 est pairs/doc → the exact
    prefix route, so the all-pairs oracle replays losslessly by the
    filtering theorem; at sf0.1 it reads 61.6 → the banded route, whose
    output is bit-equal to the exact answer on this corpus (every true
    pair is near-symmetric: size ratios 0.80-1.25, J ≥ 0.80, well
    inside the ratio_cap=1.5 recall contract — measured r11, route
    equality at both sfs pinned in tests/test_keygrowth.py)."""
    from dataux_spark.operators.dedup import adaptive_containment_pairs

    d = read_table(spark, sf_dir, "documents")
    return adaptive_containment_pairs(d, "text", "doc_id", **ADAPTIVE_CONTAINMENT_KW)


@_q(
    "dedup_containment_small_side",
    # r12 (ADVICE r11 medium): value-check the banded route's exact
    # small-side supplement under the driver gate. Quote docs (first 12
    # tokens of every 25th document, ~10 shingles — containers run
    # 4-10× their size, far OUTSIDE the ratio_cap=1.5 recall contract)
    # are constructed IDENTICALLY here and in Spark; the oracle is the
    # exact containment answer via the linear prefix-candidate replay,
    # so equality proves banded ∪ small-side-exact == exact on a corpus
    # where banded alone measurably misses (61 vs 72 pairs at sf0.01,
    # 618 vs 743 at sf0.1).
    f"""
    WITH quotes AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string((regexp_split_to_array(trim(text), '\\s+'))[1:12],
                             ' ') AS text
      FROM documents WHERE doc_id % 25 = 0
    ), corpus AS (
      SELECT doc_id, text FROM documents UNION ALL SELECT * FROM quotes
    ), g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM corpus)
    ), {_containment_candidate_pairs_ctes(ADAPTIVE_CONTAINMENT_KW["threshold"])}
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(a.grams, b.grams))::DOUBLE
                 / len(a.grams), 6) AS containment
    FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
    WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
                / len(a.grams), 6) >= {ADAPTIVE_CONTAINMENT_KW["threshold"]}
    """,
)
def dedup_containment_small_side(spark, sf_dir):
    """The high-ratio containment regression harness (ADVICE r11): plant
    quote docs (first 12 tokens of every 25th document) whose containers
    are 4-10× their size — outside the banded route's ratio_cap=1.5
    recall contract, so the FORCED minhash route alone deterministically
    misses most quote→container pairs (the miss is pinned in
    tests/test_dedup.py). With the r12 `small_side_exact_max` supplement
    (operators/dedup.containment_minhash_pairs), contained docs ≤ 16
    shingles also run the lossless asymmetric prefix pass, and the union
    equals the EXACT all-pairs containment answer — which is what the
    oracle replays (linear prefix-candidate scheme), making the
    supplement's recall claim value-checked cross-engine at both sfs,
    not just pytest-pinned. Scale shape: the supplement's candidate join
    is prefix-postings(small docs only) × full postings — bounded by the
    small slice (4% of docs here), the documented reason it is opt-in."""
    from dataux_spark.operators.dedup import adaptive_containment_pairs

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    quotes = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12), " "
        ).alias("text"),
    )
    corpus = docs.unionByName(quotes)
    return adaptive_containment_pairs(
        corpus, "text", "doc_id", route="minhash", small_side_exact_max=16,
        **ADAPTIVE_CONTAINMENT_KW,
    )


# dedup_containment_recall_report corpus knobs (r13, VERDICT r12 item 3).
# The documents table is 500/500/5000 docs at the three sfs (avg ~54
# tokens, max ~100), so the full table stays tractable for the oracle's
# 108-md5-per-shingle replay (SUB=1 keeps the modulo shape in the shared
# SQL); sources are every 20th doc long enough that even the 5× prefix
# slice keeps ≥ 6 shingles (17 sources at sf0.01, 164 at sf0.1).
_RECALL_REPORT_RATIOS: list[tuple[int, str, float]] = [
    (0, "1.25x", 1.25), (1, "2x", 2.0), (2, "3x", 3.0), (3, "5x", 5.0),
]
_RECALL_REPORT_SUB: int = 1
_RECALL_REPORT_SRC: int = 20
_RECALL_REPORT_MIN_TOKS: int = 40


def _containment_recall_oracle() -> str:
    """Full SQL replay of the banded containment route's recall
    measurement: planting, shingling, the 36×3 md5-seeded minhash
    signatures (bit-for-bit — the simhash_md5 conversion trick), band
    tuples, the census-derived hot-bucket cap, shared-bucket catch test,
    and the per-ratio-band recall arithmetic. Band count and cap policy
    are interpolated from the SAME dedup module constants the live
    route uses (no-drift rule)."""
    from dataux_spark.operators import dedup as D

    t = ADAPTIVE_CONTAINMENT_KW["threshold"]
    j_floor = t / (D.CONTAINMENT_RATIO_CAP + 1.0 - t)
    r = D.CONTAINMENT_ROWS_PER_BAND
    bands = D.minhash_recall_bands(r, D.CONTAINMENT_TARGET_RECALL, j_floor)
    nh = bands * r
    vals = ", ".join(
        f"({bi}, '{lbl}', {rho})" for bi, lbl, rho in _RECALL_REPORT_RATIOS
    )
    hsel = ",\n             ".join(
        f"max(CASE WHEN seed % {r} = {j} THEN h END) AS h{j}" for j in range(r)
    )
    hjoin = " AND ".join(f"a.h{j} = b.h{j}" for j in range(r))
    cjoin = " AND ".join(f"c.h{j} = a.h{j}" for j in range(r))
    hcols = ", ".join(f"h{j}" for j in range(r))
    return f"""
    WITH srcs AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
      WHERE doc_id % {_RECALL_REPORT_SRC} = 0
        AND len(regexp_split_to_array(lower(trim(text)), '\\s+'))
            >= {_RECALL_REPORT_MIN_TOKS}
    ), planted AS (
      SELECT (b.bi + 1) * 10000000 + s.doc_id AS doc_id,
             s.doc_id AS src_id, b.ratio AS ratio,
             array_to_string(
               s.t[1:CAST(ceil(len(s.t) / CAST(b.rho AS DOUBLE)) AS INT)],
               ' ') AS text
      FROM srcs s, (VALUES {vals}) AS b(bi, ratio, rho)
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_RECALL_REPORT_SUB} = 0
      UNION ALL
      SELECT doc_id, text FROM planted
    ), gr0 AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM corpus)
    ), gr AS (
      SELECT _id, unnest(grams) AS gram FROM gr0
    ), sig AS (
      SELECT _id, s.s AS seed,
             min(CAST(CAST(('0x' || substr(md5(gr.gram || ':' ||
                 CAST(s.s AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)) AS h
      FROM gr, generate_series(0, {nh - 1}) AS s(s)
      GROUP BY _id, s.s
    ), bnd AS (
      SELECT _id, seed // {r} AS band,
             {hsel}
      FROM sig GROUP BY _id, seed // {r}
    ), census AS (
      SELECT band, {hcols}, count(*) AS c FROM bnd GROUP BY band, {hcols}
    ), cap AS (
      SELECT greatest({D.ROUTED_MAX_BUCKET_FLOOR},
               least({D.ROUTED_MAX_BUCKET_CEIL},
                 CAST(ceil(sqrt(2 * {D.SATURATION_CAND_PER_DOC} *
                   (SELECT count(*) FROM corpus))) AS BIGINT))) AS cap
    ), hit AS (
      SELECT DISTINCT p.doc_id AS cid, p.src_id AS sid
      FROM planted p
      JOIN bnd a ON a._id = p.doc_id
      JOIN bnd b ON b._id = p.src_id AND b.band = a.band AND {hjoin}
      JOIN census c ON c.band = a.band AND {cjoin}
      WHERE c.c <= (SELECT cap FROM cap)
    ), gsz AS (
      SELECT _id, len(grams) AS sz FROM gr0
    )
    SELECT p.ratio,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN h.cid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught,
           round(CAST(sum(CASE WHEN h.cid IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS recall,
           round(avg(CAST(gb.sz AS DOUBLE) / ga.sz), 4) AS avg_shingle_ratio
    FROM planted p
    JOIN gsz ga ON ga._id = p.doc_id
    JOIN gsz gb ON gb._id = p.src_id
    LEFT JOIN hit h ON h.cid = p.doc_id AND h.sid = p.src_id
    GROUP BY p.ratio
    ORDER BY p.ratio
    """


@_q("dedup_containment_recall_report", _containment_recall_oracle())
def dedup_containment_recall_report(spark, sf_dir):
    """Recall-by-ratio-band report for the SATURATED containment route
    (r13, VERDICT r12 item 3): quantifies what the DEFAULT banded path
    (ratio_cap=1.5, target_recall=0.98, no small-side supplement) loses
    on a mixed-ratio corpus — the planted small-side entry proves the
    supplement works; THIS entry measures the default's loss per
    container/contained size ratio, as a gate-checked table rather than
    a docstring argument.

    Construction: a deterministic corpus subsample plus planted
    contained docs (token-prefix slices, so containment = 1.0 by
    shingle-subset construction) at ratios 1.25× (inside the cap),
    2×, 3×, 5× (outside). Catch test = the pair shares ≥ 1 surviving
    band bucket under the SAME band math as the live route
    (minhash_recall_bands at the module constants) and the SAME
    census-derived hot-bucket cap — signatures use the md5-seeded twin
    (dedup.minhash_signatures_md5) so the oracle replays every hash,
    band tuple, census count, and the recall arithmetic bit-for-bit.
    Theory says recall ≈ 1−(1−(1/ρ)³)³⁶ at shingle ratio ρ — measured
    (r13): 1.0 at 1.25×, 1.0/0.988 at 2× (sf0.01/sf0.1), 0.59/0.63 at
    3×, 0.12/0.18 at 5× (the 3×/5× slices land at actual shingle
    ratios ~3.15/~5.6, so theory at the MEASURED ratio ≈ 0.67/0.20 —
    the banded route keeps its in-cap contract and loses most ≥5×
    pairs, exactly as documented). The table is cited in COVERAGE.md
    where the ratio-cap trade is documented (escape hatches: prefix
    route on unsaturated corpora, ratio_cap raise,
    small_side_exact_max supplement)."""
    from dataux_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sub = docs.filter(F.col("doc_id") % _RECALL_REPORT_SUB == 0)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    srcs = (
        docs.filter(F.col("doc_id") % _RECALL_REPORT_SRC == 0)
        .select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") >= _RECALL_REPORT_MIN_TOKS)
    )
    planted = srcs.select(
        "doc_id",
        "_t",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("bi"),
                        F.lit(lbl).alias("ratio"),
                        F.lit(rho).alias("rho"),
                    )
                    for bi, lbl, rho in _RECALL_REPORT_RATIOS
                ]
            )
        ).alias("b"),
    ).select(
        ((F.col("b.bi") + 1) * 10000000 + F.col("doc_id")).alias("cid"),
        F.col("doc_id").alias("src_id"),
        F.col("b.ratio").alias("ratio"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("_t"),
                F.lit(1),
                F.ceil(F.size("_t") / F.col("b.rho")).cast("int"),
            ),
        ).alias("text"),
    )
    corpus = sub.unionByName(
        planted.select(F.col("cid").alias("doc_id"), "text")
    )
    cap = D.routed_max_bucket(corpus.count())
    t = ADAPTIVE_CONTAINMENT_KW["threshold"]
    j_floor = t / (D.CONTAINMENT_RATIO_CAP + 1.0 - t)
    r = D.CONTAINMENT_ROWS_PER_BAND
    bands = D.minhash_recall_bands(r, D.CONTAINMENT_TARGET_RECALL, j_floor)
    g = D.gram_sets(
        corpus, "text", "doc_id", ADAPTIVE_CONTAINMENT_KW["shingle_n"]
    )
    sigs = D.minhash_signatures_md5(
        corpus, "text", "doc_id", bands * r, grams=g
    )
    banded = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col("sig")[b * r + j].alias(f"h{j}")
                            for j in range(r)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.*")
    keys = ["band"] + [f"h{j}" for j in range(r)]
    census = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= cap)
    )
    shared = (
        planted.select("cid", "src_id")
        .join(banded.select(F.col("_id").alias("cid"), *keys), "cid")
        .join(
            banded.select(F.col("_id").alias("src_id"), *keys),
            ["src_id", *keys],
        )
        .join(census, keys, "left_semi")
        .select("cid", "src_id")
        .distinct()
    )
    gsz = g.select("_id", F.size("_grams").alias("sz"))
    return (
        planted.select("cid", "src_id", "ratio")
        .join(
            gsz.select(F.col("_id").alias("cid"), F.col("sz").alias("sza")),
            "cid",
        )
        .join(
            gsz.select(F.col("_id").alias("src_id"), F.col("sz").alias("szb")),
            "src_id",
        )
        .join(shared.withColumn("_hit", F.lit(1)), ["cid", "src_id"], "left")
        .groupBy("ratio")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias(
                "n_caught"
            ),
            F.round(
                F.avg(F.col("szb").cast("double") / F.col("sza")), 4
            ).alias("avg_shingle_ratio"),
        )
        .select(
            "ratio",
            "n_pairs",
            "n_caught",
            F.round(
                F.col("n_caught").cast("double") / F.col("n_pairs"), 6
            ).alias("recall"),
            "avg_shingle_ratio",
        )
        .orderBy("ratio")
    )


@_q(
    "dedup_source_matrix",
    # exact Jaccard pairs (r12: replayed via the lang-blocked
    # prefix-candidate scheme + exact verify — == all-pairs by the prefix
    # theorem, candidate-linear) + the canonical-cell provenance rollup
    f"""
    WITH g AS (
      SELECT doc_id AS _id, lang, source,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, lang, source,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(ADAPTIVE_JACCARD_KW["threshold"], block="lang")}, pairs AS (
      SELECT a.source AS sa, b.source AS sb,
             round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                   len(list_distinct(a.grams || b.grams)), 6) AS j
      FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
      WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(list_distinct(a.grams || b.grams)), 6)
            >= {ADAPTIVE_JACCARD_KW["threshold"]}
    )
    SELECT least(sa, sb) AS group_a, greatest(sa, sb) AS group_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(j), 6) AS avg_jaccard
    FROM pairs GROUP BY 1, 2
    """,
)
def dedup_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix (operators/dedup.
    cross_group_dup_matrix over a LOSSLESS linear pair frame): near-dup
    pairs folded into canonical (source_a <= source_b) cells with counts
    and mean similarity — the provenance table that decides which source
    to down-weight before mixing. Pair generation is the r10
    data-adaptive router (adaptive_jaccard_pairs): the lossless
    prefix-filter scheme (lang-restricted inside the candidate join)
    while the prefix-key census reads unsaturated — NOT the
    lang/length-blocked all-pairs the r8 probe measured at 13.4x wall
    for 10x data — and minhash-LSH candidates + the same exact verify
    once the vocabulary saturates (the prefix scheme's own n² regime,
    measured r9). Everything after pair generation is pair-sized: two
    slim id-keyed lookups + one cell groupBy."""
    from dataux_spark.operators.dedup import (
        adaptive_jaccard_pairs,
        cross_group_dup_matrix,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = adaptive_jaccard_pairs(
        docs, "text", "doc_id",
        block_cols=ADAPTIVE_JACCARD_BLOCKS["dedup_source_matrix"],
        **ADAPTIVE_JACCARD_KW,
    )
    return cross_group_dup_matrix(pairs, docs, "doc_id", "source")


@_q(
    "skew_join_preflight",
    # the oracle replays both censuses, the pair products, the share
    # against the full total, and the deterministic (pairs desc, key)
    # top-10
    """
    WITH la AS (
      SELECT o_custkey AS key, count(*) AS n_left FROM orders GROUP BY 1
    ), rb AS (
      SELECT c_custkey AS key, count(*) AS n_right FROM customer GROUP BY 1
    ), p AS (
      SELECT key, n_left, n_right, n_left * n_right AS pairs
      FROM la JOIN rb USING (key)
    ), t AS (SELECT sum(pairs) AS total FROM p)
    SELECT key, CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(pairs AS BIGINT) AS pairs,
           round(pairs / (SELECT total FROM t), 6) AS share
    FROM p ORDER BY pairs DESC, key LIMIT 10
    """,
)
def skew_join_preflight(spark, sf_dir):
    """Join-cardinality preflight (operators/skew.
    join_cardinality_preflight) for orders ⋈ customer on custkey: the
    exact output cardinality and its hottest keys from two censuses —
    the "should I salt this?" question answered with numbers BEFORE the
    join's shuffle is paid. Census-sized work regardless of how badly
    the join itself would explode; the skew family's diagnostic
    companion to salted_join/two_stage_agg."""
    from dataux_spark.operators.skew import join_cardinality_preflight

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return join_cardinality_preflight(o, c, "o_custkey", "c_custkey", top=10)


@_q(
    "dedup_savings_report",
    # extends the dedup_clusters transitive-closure oracle with the ROI
    # rollup: per-cluster totals, keeper (= min id = cluster label)
    # weight, then the per-size histogram; pairs replayed r12 via the
    # lang-blocked prefix-candidate scheme (== all-pairs, linear)
    f"""
    WITH RECURSIVE g AS (
      SELECT doc_id AS _id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), {_prefix_candidate_pairs_ctes(ADAPTIVE_JACCARD_KW["threshold"], block="lang")}, pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
      WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(list_distinct(a.grams || b.grams)), 6)
            >= {ADAPTIVE_JACCARD_KW["threshold"]}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs
    ), reach AS (
      SELECT DISTINCT a AS node, a AS r FROM edges
      UNION
      SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    ), comp AS (
      SELECT node, min(r) AS cluster FROM reach GROUP BY node
    ), sized AS (
      SELECT comp.node, comp.cluster, d.n_chars AS w
      FROM comp JOIN documents d ON d.doc_id = comp.node
    ), per AS (
      SELECT cluster, count(*) AS sz, sum(w) AS tw FROM sized GROUP BY cluster
    ), keeper AS (
      SELECT cluster, w AS kw FROM sized WHERE node = cluster
    )
    SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz - 1) AS BIGINT) AS dup_docs,
           CAST(sum(tw - kw) AS BIGINT) AS chars_saved
    FROM per JOIN keeper USING (cluster) GROUP BY sz
    """,
)
def dedup_savings_report(spark, sf_dir):
    """Dedup ROI preflight (operators/dedup.dedup_savings_report): near-dup
    pairs → connected components → per-cluster-SIZE histogram of clusters,
    droppable docs, and chars reclaimed — the "is this dedup pass worth
    the rewrite" answer, computed without touching any keeper. Pair
    generation is the r10 data-adaptive router (adaptive_jaccard_pairs):
    the lossless prefix-filter scheme, lang-restricted in the candidate
    join, while the prefix-key census reads unsaturated (the
    blocked-all-pairs version this entry ORIGINALLY shipped with was
    quadratic outright — r8 probe, 13.4x; the prefix scheme that
    replaced it goes n² only on vocabulary-saturated corpora — r9 gate),
    and minhash-LSH candidates + the same exact verify on saturation;
    everything downstream is pair-graph-sized, and the keeper needs no
    window because min-label propagation already made the cluster label
    the keeper id. Oracle = exact transitive closure + the same rollup."""
    from dataux_spark.operators.dedup import (
        adaptive_jaccard_pairs,
        connected_components,
        dedup_savings_report as savings,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = adaptive_jaccard_pairs(
        docs, "text", "doc_id",
        block_cols=ADAPTIVE_JACCARD_BLOCKS["dedup_savings_report"],
        **ADAPTIVE_JACCARD_KW,
    )
    return savings(connected_components(pairs), docs).select(
        "cluster_size",
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        F.col("dup_docs").cast("bigint").alias("dup_docs"),
        F.col("chars_saved").cast("bigint").alias("chars_saved"),
    )


@_q(
    "dedup_route_census",
    # the oracle replays the ENTIRE routing signal bit-for-bit: grams
    # (the proven dedup_source_matrix replay), global doc-frequencies,
    # the rarest-first (df asc, tok asc) prefix rank, the per-key
    # Σ c·(c−1)/2 candidate bound, and the saturation decision — whose
    # threshold is interpolated from dedup.SATURATION_CAND_PER_DOC so
    # the SQL cannot drift from choose_jaccard_route's default (ADVICE
    # r10)
    f"""
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), tok AS (
      SELECT _id, len(grams) AS sz, unnest(grams) AS tok FROM g
    ), freq AS (
      SELECT tok, count(*) AS df FROM tok GROUP BY tok
    ), ranked AS (
      SELECT t._id, t.tok, t.sz,
             row_number() OVER (PARTITION BY t._id
                                ORDER BY f.df ASC, t.tok ASC) AS pos
      FROM tok t JOIN freq f USING (tok)
    ), prefix AS (
      SELECT _id, tok FROM ranked
      WHERE pos <= sz - ceil({ADAPTIVE_JACCARD_KW["threshold"]} * sz) + 1
    ), per AS (
      SELECT tok, count(*) AS c FROM prefix GROUP BY tok
    ), census AS (
      SELECT (SELECT count(*) FROM g) AS n_docs,
             count(*) AS n_keys,
             sum(c) AS n_prefix_rows,
             sum(c * (c - 1) / 2) AS est_pairs
      FROM per
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_prefix_rows AS BIGINT) AS n_prefix_rows,
           CAST(est_pairs AS BIGINT) AS est_pairs,
           round(est_pairs / greatest(n_docs, 1), 6) AS est_per_doc,
           CASE WHEN est_pairs > {_SAT} * greatest(n_docs, 1)
                THEN 'minhash' ELSE 'prefix' END AS route
    FROM census
    """,
)
def dedup_route_census(spark, sf_dir):
    """The adaptive candidate router's decision signal as a queryable
    one-row table (operators/dedup.prefix_candidate_census +
    choose_jaccard_route): distinct prefix-join keys, prefix rows, the
    exact Σ c·(c−1)/2 candidate upper bound of the prefix equi-join,
    est pairs per doc, and the route the census picks at the
    SATURATION_CAND_PER_DOC threshold (interpolated into body AND
    oracle from the one constant in operators/dedup.py, and pinned
    equal to choose_jaccard_route's live decision in
    tests/test_keygrowth.py — ADVICE r10). This is the observability
    surface for the r10 router — the DECISION itself is value-checked
    by the external gate (the oracle replays census and threshold in
    plain SQL), not just pinned in pytest; operators cite SCALE.md r10
    for the measured regimes (sf0.01 → prefix at 3.2/doc, sf0.1 →
    minhash at 86/doc). Scope: this census is the UNBLOCKED prefix
    frame — dedup_prefix_jaccard's routing signal. The lang-blocked
    entries (dedup_clusters / dedup_source_matrix /
    dedup_savings_report) census their own blocked prefix frame inside
    adaptive_jaccard_pairs, whose est_pairs is strictly smaller, so
    near the threshold they can legitimately route differently from
    the row reported here. Census cost is one linear aggregate — the
    same pass every adaptive_jaccard_pairs call pays for adaptivity."""
    from dataux_spark.operators.dedup import (
        gram_sets,
        prefix_candidate_census,
        prefix_tokens,
    )

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sets = gram_sets(
        docs, "text", "doc_id", ADAPTIVE_JACCARD_KW["shingle_n"]
    ).withColumnRenamed("_grams", "_set")
    k, n, p = prefix_candidate_census(
        prefix_tokens(sets, ADAPTIVE_JACCARD_KW["threshold"])
    )
    route = "minhash" if p > _SAT * max(n_docs, 1) else "prefix"
    return docs.sparkSession.createDataFrame(
        [(n_docs, k, n, p, round(p / max(n_docs, 1), 6), route)],
        "n_docs bigint, n_keys bigint, n_prefix_rows bigint, "
        "est_pairs bigint, est_per_doc double, route string",
    )


@_q(
    "dedup_containment_census",
    # the containment twin of dedup_route_census: replays the asymmetric
    # candidate census bit-for-bit — grams, doc frequencies, the
    # rarest-first prefix at the containment threshold, per-key
    # prefix-postings × (full-postings − 1) non-self products, and the
    # saturation decision at the shared SATURATION_CAND_PER_DOC constant
    # (both values interpolated so neither the threshold nor the prefix
    # rule can drift from the operator defaults)
    f"""
    WITH g AS (
      SELECT doc_id AS _id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ), tok AS (
      SELECT _id, len(grams) AS sz, unnest(grams) AS tok FROM g
    ), freq AS (
      SELECT tok, count(*) AS df FROM tok GROUP BY tok
    ), ranked AS (
      SELECT t._id, t.tok, t.sz,
             row_number() OVER (PARTITION BY t._id
                                ORDER BY f.df ASC, t.tok ASC) AS pos
      FROM tok t JOIN freq f USING (tok)
    ), prefix AS (
      SELECT _id, tok FROM ranked
      WHERE pos <= sz - ceil({ADAPTIVE_CONTAINMENT_KW["threshold"]} * sz) + 1
    ), pc AS (
      SELECT tok, count(*) AS c FROM prefix GROUP BY tok
    ), fc AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), census AS (
      SELECT (SELECT count(*) FROM g) AS n_docs,
             count(*) AS n_keys,
             sum(pc.c) AS n_prefix_rows,
             sum(pc.c * (fc.c - 1)) AS est_pairs
      FROM pc JOIN fc USING (tok)
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_prefix_rows AS BIGINT) AS n_prefix_rows,
           CAST(est_pairs AS BIGINT) AS est_pairs,
           round(est_pairs / greatest(n_docs, 1), 6) AS est_per_doc,
           CASE WHEN est_pairs > {_SAT} * greatest(n_docs, 1)
                THEN 'minhash' ELSE 'prefix' END AS route
    FROM census
    """,
)
def dedup_containment_census(spark, sf_dir):
    """The containment router's decision signal as a queryable one-row
    table (operators/dedup.containment_candidate_census +
    choose_containment_route — VERDICT r10 item 1): distinct prefix
    keys, prefix rows, the exact non-self Σ prefix-postings ×
    (full-postings − 1) row count of the asymmetric candidate
    equi-join, est pairs per doc, and the route the census picks at the
    shared SATURATION_CAND_PER_DOC threshold (interpolated into body
    AND oracle from the one constant in operators/dedup.py; pinned
    equal to choose_containment_route's live decision in
    tests/test_keygrowth.py). The DECISION is value-checked by the
    external gate exactly like dedup_route_census; measured r11 on the
    synthetic documents the census reads 1.07 est/doc at sf0.01
    (→ prefix, the lossless scheme) and 61.6 at sf0.1 (→ minhash) —
    the same unsaturated→saturated transition as the Jaccard census's
    3.2 → 86. Census cost is one linear aggregate — the same pass every
    adaptive_containment_pairs call pays."""
    from dataux_spark.operators.dedup import (
        containment_candidate_census,
        gram_sets,
        prefix_tokens,
    )

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sets = gram_sets(
        docs, "text", "doc_id", ADAPTIVE_CONTAINMENT_KW["shingle_n"]
    ).withColumnRenamed("_grams", "_set")
    toks = sets.select("_id", F.explode("_set").alias("_tok"))
    k, n, p = containment_candidate_census(
        prefix_tokens(sets, ADAPTIVE_CONTAINMENT_KW["threshold"]), toks
    )
    route = "minhash" if p > _SAT * max(n_docs, 1) else "prefix"
    return docs.sparkSession.createDataFrame(
        [(n_docs, k, n, p, round(p / max(n_docs, 1), 6), route)],
        "n_docs bigint, n_keys bigint, n_prefix_rows bigint, "
        "est_pairs bigint, est_per_doc double, route string",
    )


@_q(
    "dedup_incremental_batch",
    """
    WITH store AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id <= 250
    ),
    b AS (
      SELECT md5(text) AS digest, min(doc_id) AS doc_id
      FROM documents WHERE doc_id > 250 GROUP BY 1
    )
    SELECT b.doc_id, b.digest
    FROM b LEFT JOIN store USING (digest) WHERE store.digest IS NULL
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental dedup against a persisted digest store (continuous
    ingest: the historical corpus is fingerprinted ONCE, each new batch
    anti-joins slim digest rows — never a corpus rescan). Store = docs
    ≤250, batch = the rest; survivors are batch docs whose content is new
    (operators/dedup.build_fingerprint_store / incremental_dedup)."""
    import os
    import tempfile

    from dataux_spark.operators.dedup import build_fingerprint_store, incremental_dedup

    slug = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(sf_dir)))
    store = f"{tempfile.gettempdir()}/dataux_digeststore_{slug}"
    docs = read_table(spark, sf_dir, "documents")
    build_fingerprint_store(docs.filter(F.col("doc_id") <= 250), "text", "doc_id", store)
    out = incremental_dedup(docs.filter(F.col("doc_id") > 250), "text", "doc_id", store)
    return out.select(F.col("_id").alias("doc_id"), "digest")


@_q(
    "dedup_span_stats",
    """
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 16))) AS spans
      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ),
    e AS (SELECT doc_id, unnest(spans) AS span FROM s),
    c AS (SELECT span, count(*) AS nd FROM e GROUP BY span)
    SELECT e.doc_id, count(*) AS n_spans,
           sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
           round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS dup_span_frac
    FROM e JOIN c USING (span)
    GROUP BY e.doc_id
    """,
)
def dedup_span_stats(spark, sf_dir):
    """Exact-substring duplication profile (Lee et al., ACL 2022): per-doc
    fraction of distinct 5-token spans that occur verbatim in ≥2 documents
    (operators/dedup.duplicated_span_stats — span census + join-back, no
    pairwise stage). The oracle rebuilds the identical md5-prefix span
    hashes in SQL, so the whole census pipeline is value-checked."""
    from dataux_spark.operators.dedup import duplicated_span_stats

    out = duplicated_span_stats(
        read_table(spark, sf_dir, "documents"), "text", "doc_id", n=5, min_docs=2
    )
    return out.select(
        F.col("_id").alias("doc_id"), "n_spans", "n_dup_spans", "dup_span_frac"
    )


_TAXONOMY = {
    "joins": ["join", "merge", "hash"],
    "scan_exec": ["scan", "filter", "sort"],
    "streaming": ["stream", "window", "batch"],
    "storage": ["table", "column", "vector"],
}


@_q(
    "text_taxonomy_tags",
    """
    WITH d AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS toks
      FROM documents
    ), t(topic, terms) AS (VALUES
      ('joins', ['hash', 'join', 'merge']),
      ('scan_exec', ['filter', 'scan', 'sort']),
      ('storage', ['column', 'table', 'vector']),
      ('streaming', ['batch', 'stream', 'window'])
    )
    SELECT doc_id, topic,
           CAST(len(list_intersect(toks, terms)) AS INT) AS n_hits
    FROM d, t
    WHERE len(list_intersect(toks, terms)) >= 2
    """,
)
def text_taxonomy_tags(spark, sf_dir):
    """Dictionary/taxonomy topic tagging (operators/text.py
    tag_by_dictionary): curated keyword lists inlined as literal arrays,
    n_hits = distinct-term intersection size per topic — one zero-shuffle
    scan projection, no explode/join. min_hits=2 guards against single
    stray keywords."""
    from dataux_spark.operators.text import tag_by_dictionary

    docs = read_table(spark, sf_dir, "documents")
    return tag_by_dictionary(docs, "text", "doc_id", _TAXONOMY, min_hits=2)


@_q(
    "decontaminate_neardup",
    # exact corpus×benchmark shingle-Jaccard is the value oracle: LSH only
    # generates candidates and the verify stage recomputes true Jaccard
    # (same contract as dedup_minhash_lsh; banding recall at j≥0.5 with
    # r=4/16 bands makes the compare stable, pinned by test)
    """
    WITH g AS (
      SELECT doc_id AS _id, source,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, source,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    )
    SELECT c._id AS doc_id, b._id AS bench_id,
           round(len(list_intersect(c.grams, b.grams))::DOUBLE /
                 len(list_distinct(c.grams || b.grams)), 6) AS jaccard
    FROM g c JOIN g b ON c.source <> 'src0' AND b.source = 'src0'
    WHERE round(len(list_intersect(c.grams, b.grams))::DOUBLE /
                len(list_distinct(c.grams || b.grams)), 6) >= 0.5
    """,
)
def decontaminate_neardup(spark, sf_dir):
    """Cross-corpus NEAR-dup decontamination (operators/dedup.py
    decontaminate_neardup): corpus (source ≠ src0) × benchmark (src0)
    MinHash-banded candidate join with exact-Jaccard verify — catches
    lightly-edited eval items that beat the verbatim n-gram check. The
    benchmark's slim banded rows broadcast (limit() is the audit's
    boundedness witness); the corpus never shuffles."""
    from dataux_spark.operators.dedup import decontaminate_neardup as dnd

    docs = read_table(spark, sf_dir, "documents")
    return dnd(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0").limit(1000),
        "text",
        "doc_id",
        threshold=0.5,
    )


@_q(
    "decontaminate_ngrams",
    """
    WITH s AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 4, 1)),
               i -> substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 16))) AS spans
      FROM (SELECT doc_id, source,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
            FROM documents)
    ),
    b AS (SELECT DISTINCT unnest(spans) AS span FROM s WHERE source = 'src0'),
    e AS (SELECT doc_id, unnest(spans) AS span FROM s WHERE source <> 'src0')
    SELECT e.doc_id, count(*) AS n_spans,
           sum(CASE WHEN b.span IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_bench_hits,
           CASE WHEN sum(CASE WHEN b.span IS NOT NULL THEN 1 ELSE 0 END) >= 1
                THEN 1 ELSE 0 END AS contaminated
    FROM e LEFT JOIN b USING (span)
    GROUP BY e.doc_id
    """,
)
def decontaminate_ngrams(spark, sf_dir):
    """Benchmark decontamination: corpus docs (source ≠ src0) flagged by
    distinct 5-gram overlap with the benchmark set (source = src0) —
    operators/dedup.decontaminate; benchmark span set broadcast, zero-hit
    docs kept. The oracle replays the same span hashing + overlap count."""
    from dataux_spark.operators.dedup import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    out = decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "text",
        "doc_id",
        n=5,
        min_hits=1,
    )
    return out.select(
        F.col("_id").alias("doc_id"), "n_spans", "n_bench_hits", "contaminated"
    )


@_q(
    "embedding_neardup",
    # Replays the seeded-rotation sign-band scheme bit-for-bit: the SAME
    # md5-derived ±1 matrix (seed 1, first-hex-digit parity — DuckDB md5
    # == hashlib md5), the SAME floor(v·10^6) integer quantization (exact
    # order-free sums, so neither engine's aggregation order matters),
    # the SAME 25 planted near-duplicates (all arithmetic in double, so
    # both engines see identical vectors), band_bits = 18 =
    # ceil(log2(525)) + 8 pinned for the 525-row planted sf0.01 corpus
    # (adaptive_band_bits — the operator derives it from a count when
    # unpinned), and — r10 — n_bands = 5 = lsh_recall_bands(18, 0.9,
    # 0.99), the operator's DEFAULT sizing at this width (generate_series
    # 0..4 below), so the driver gate exercises the sized default rather
    # than a pinned 8.
    """
    WITH base AS (
      SELECT vec_id AS _id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    v AS (
      SELECT _id, v FROM base
      UNION ALL
      SELECT _id + 100000 AS _id, list_transform(v, x -> x + 0.001) AS v
      FROM base WHERE _id < 25
    ),
    q AS (
      SELECT _id, i.i AS i, CAST(floor(v[i.i] * 1000000) AS BIGINT) AS qi
      FROM v, generate_series(1, 64) AS i(i)
    ),
    s AS (
      SELECT b.b AS b, j.j AS j, i.i AS i,
             CASE WHEN CAST(('0x' || substr(md5(
                      '1:' || CAST(b.b AS VARCHAR) || ':' ||
                      CAST(j.j AS VARCHAR) || ':' ||
                      CAST((i.i - 1) AS VARCHAR)), 1, 1)) AS UBIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(0, 4) AS b(b),
           generate_series(0, 17) AS j(j),
           generate_series(1, 64) AS i(i)
    ),
    bits AS (
      SELECT q._id, s.b, s.j,
             CASE WHEN sum(q.qi * s.sgn) > 0
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
      FROM q JOIN s ON q.i = s.i
      GROUP BY q._id, s.b, s.j
    ),
    bands AS (
      SELECT _id, b AS band, sum(bit * (CAST(1 AS BIGINT) << j)) AS bv
      FROM bits GROUP BY _id, b
    ),
    cand AS (
      SELECT DISTINCT x._id AS id_a, y._id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bv = y.bv AND x._id < y._id
    )
    SELECT c.id_a, c.id_b, round(list_cosine_similarity(a.v, b.v), 6) AS cos
    FROM cand c JOIN v a ON c.id_a = a._id JOIN v b ON c.id_b = b._id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
)
def embedding_neardup(spark, sf_dir):
    """Embedding near-dup: seeded-rotation sign-band LSH candidates +
    exact cosine verify ≥0.4 (operators/dedup.embedding_signband_neardup).
    band_bits is pinned to 18 = adaptive_band_bits(525) so the static
    oracle can replay the banding bit-for-bit (md5-seeded Rademacher
    hyperplanes + exact integer-quantized dots) — the full
    candidates→verify pipeline is value-checked, not just row-counted.
    n_bands is left UNPINNED (r10) so the entry exercises the operator's
    sized default — lsh_recall_bands(18, 0.9, 0.99) = 5, the count the
    oracle's generate_series(0, 4) re-spells.
    The r8 axis-aligned 16×4-bit banding this replaces had 256 FIXED join
    keys (all-pairs with a constant at corpus scale, VERDICT r8); the
    seeded rotation's key space is n_bands·2^(log2(n)+8), growing with
    the corpus. At log2(n)+8-bit bands the synthetic corpus correctly has
    NO organic candidates (the r8 entry's 57 rows were artifacts of the
    saturated 4-bit banding), so the entry plants 25 deterministic
    near-duplicates (v + 0.001 per dim, all-double arithmetic both
    engines replay exactly) to keep the gate non-vacuous — every planted
    pair exercises signature, banding, candidate join and cosine verify
    with a non-trivial cos value. Exact all-pairs remains available as
    embedding_neardup_pairs (the verify-stage primitive)."""
    from dataux_spark.operators.dedup import embedding_signband_neardup

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    # the planted-id offset is a literal because the static oracle spells
    # the same `+ 100000` — guard that it cannot alias a real vec_id
    # (ADVICE r9; the count is a parquet-metadata read, not a scan)
    assert emb.count() < 100_000, (
        "embeddings outgrew the planted-id offset: raise 100000 in BOTH "
        "this entry and its oracle SQL"
    )
    planted = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(embedding, x -> x + 0.001D)").alias("embedding"),
    )
    return embedding_signband_neardup(
        emb.unionByName(planted), "embedding", "vec_id",
        threshold=0.4, band_bits=18, seed=1, dim=64,
    )


@_q(
    "embedding_band_sizing",
    # replays BOTH sizing identities in plain SQL: band width =
    # ceil(log2 n) + 8 (adaptive_band_bits) and band count =
    # ceil(ln(1−recall)/ln(1−p^bits)) with p = 1 − acos(cos)/π
    # (lsh_recall_bands, Charikar STOC'02) — plus the resulting recall
    # curve at three cosine levels; all ceil/round margins are far from
    # boundaries at every shipped corpus size (checked r10), so the
    # cross-engine compare is float-safe
    """
    WITH c AS (SELECT count(*) AS n FROM embeddings),
    s AS (
      SELECT n, greatest(4, CAST(ceil(log2(greatest(n, 2))) AS BIGINT) + 8)
               AS band_bits
      FROM c
    ), b AS (
      SELECT n, band_bits,
             greatest(1, CAST(ceil(
               ln(1 - 0.9) /
               ln(1 - pow(1 - acos(0.99) / pi(), band_bits))
             ) AS BIGINT)) AS n_bands
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           CAST(band_bits AS BIGINT) AS band_bits,
           CAST(n_bands AS BIGINT) AS n_bands,
           round(1 - pow(1 - pow(1 - acos(0.95) / pi(), band_bits), n_bands), 6)
             AS recall_cos95,
           round(1 - pow(1 - pow(1 - acos(0.99) / pi(), band_bits), n_bands), 6)
             AS recall_cos99,
           round(1 - pow(1 - pow(1 - acos(0.999) / pi(), band_bits), n_bands), 6)
             AS recall_cos999
    FROM b
    """,
)
def embedding_band_sizing(spark, sf_dir):
    """The sign-band family's sizing decision as a queryable one-row
    table (operators/dedup.adaptive_band_bits + lsh_recall_bands): for
    the corpus actually on disk, the adaptive band width, the band count
    the recall identity sizes at (target 0.9 @ cos 0.99), and the
    resulting recall at three cosine levels. The r10 companion of
    dedup_route_census — the second data-adaptive decision this engine
    makes (how wide and how many sign bands) is value-checked by the
    external gate via a plain-SQL replay of both identities, so a drift
    in either helper is a driver-visible mismatch, not a silent recall
    loss. One metadata-cheap count is the only input; no vector is
    read."""
    import math

    from dataux_spark.operators.dedup import adaptive_band_bits, lsh_recall_bands

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = adaptive_band_bits(n)
    bands = lsh_recall_bands(bits, target_recall=0.9, cos=0.99)

    def recall(c: float) -> float:
        p = (1 - math.acos(c) / math.pi) ** bits
        return round(1 - (1 - p) ** bands, 6)

    return spark.createDataFrame(
        [(n, bits, bands, recall(0.95), recall(0.99), recall(0.999))],
        "n_vectors bigint, band_bits bigint, n_bands bigint, "
        "recall_cos95 double, recall_cos99 double, recall_cos999 double",
    )


@_q(
    "embedding_neardup_knn",
    # same bit-for-bit replay structure as ann_knn_join (sqrt(n)-cell
    # quantizer, nprobe=2, exact rerank), folded to unordered pairs at
    # the cosine threshold
    """
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings
      WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
                      FROM embeddings)
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), s AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(v.vv, c.cvec) /
             (sqrt(list_dot_product(v.vv, v.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM v CROSS JOIN c
    ), cellof AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn = 1
    ), qc AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn <= 2
    ), cand AS (
      SELECT q.query_id, m.vec_id AS neighbor_id
      FROM qc q JOIN cellof m ON m.cell = q.cell AND m.vec_id != q.query_id
    ), rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qv.vv, nv.vv) /
                   (sqrt(list_dot_product(qv.vv, qv.vv)) *
                    sqrt(list_dot_product(nv.vv, nv.vv))), 6) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v nv ON nv.vec_id = cand.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM rer
    )
    SELECT DISTINCT least(query_id, neighbor_id) AS id_a,
           greatest(query_id, neighbor_id) AS id_b, cos
    FROM ranked WHERE rank <= 5 AND cos >= 0.4
    """,
)
def embedding_neardup_knn(spark, sf_dir):
    """Embedding near-dup, the IVF route (VERDICT r8's alternative scale
    path next to the sign-band entry): cell-blocked k-NN self-join
    (operators/similarity.knn_join — sqrt(n)-cell quantizer, nothing
    broadcast, candidate work ~n^1.5) folded to unordered pairs at the
    exact-cosine threshold. Complementary recall contract to sign-band
    LSH: k-NN recall is bounded by quantizer-cell recall and the per-row
    k, independent of how sign bits distribute — the route to prefer
    when embedding signs are heavily biased (hot sign-band buckets).
    Fully value-checked: the oracle replays quantizer, probe, rerank and
    the pair fold bit-for-bit."""
    import math

    from dataux_spark.operators.similarity import knn_join

    emb = read_table(spark, sf_dir, "embeddings")
    n_cells = math.ceil(math.sqrt(emb.count()))
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding").collect()
    ]
    res = knn_join(emb, emb, "embedding", "vec_id", cents, k=5, nprobe=2)
    return (
        res.filter(F.col("cos") >= 0.4)
        .select(
            F.least("query_id", "neighbor_id").alias("id_a"),
            F.greatest("query_id", "neighbor_id").alias("id_b"),
            "cos",
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _query_vecs(emb, n: int = 5):
    """The ANN query set: the first n vectors by key. The `.limit(n)`
    after the key filter keeps the same rows (vec_id is a key, so the
    filter already selects exactly n) but records the cardinality bound
    in the logical plan: the similarity operators broadcast the query
    side, and the GlobalLimit is the plan-level proof that the broadcast
    frame stays ≤n rows at ANY corpus scale —
    tools/explain_audit.py's forced-broadcast audit keys on it."""
    return emb.filter(F.col("vec_id") < n).limit(n)


@_q(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings)
    SELECT * FROM (
      SELECT q.query_id, c.neighbor_id,
             round(list_cosine_similarity(qv, cv), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, c.neighbor_id) AS INT) AS rank
      FROM q JOIN c ON q.query_id != c.neighbor_id
    ) t WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 5 query vectors — the exact ANN
    baseline (operators/similarity.py)."""
    from dataux_spark.operators.similarity import brute_force_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vecs(emb), "embedding", "vec_id", k=5)


@_q(
    "ann_quantized_topk",
    # the oracle reproduces the int8 lattice exactly: same per-vector
    # scale 127/max|x|, same explicit half-up floor (library round()
    # would diverge half-even vs half-away), integer dots are exact in
    # doubles (<=64*127^2), so membership, cosine, and rank all pin
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), m AS (
      SELECT vec_id, v,
             greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS mx
      FROM base
    ), qz AS (
      SELECT vec_id,
             list_transform(v, x -> floor(x * (127.0 / mx) + 0.5)) AS q
      FROM m
    ), qn AS (
      SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM qz
    ), qq AS (
      SELECT vec_id AS query_id, q AS vq, nrm AS qnorm FROM qn WHERE vec_id < 5
    ), cc AS (
      SELECT vec_id AS neighbor_id, q AS vc, nrm AS cnorm FROM qn
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT query_id, neighbor_id,
             round(list_dot_product(vc, vq) /
                   (greatest(cnorm, 1e-12) * greatest(qnorm, 1e-12)), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_dot_product(vc, vq) /
                 (greatest(cnorm, 1e-12) * greatest(qnorm, 1e-12)), 6) DESC,
               neighbor_id) AS INT) AS rank
      FROM cc JOIN qq ON neighbor_id != query_id
    ) t WHERE rank <= 5
    """,
)
def ann_quantized_topk(spark, sf_dir):
    """Cosine top-5 over int8-quantized embeddings
    (similarity.quantized_topk) — the memory-bound ANN path: tinyint
    arrays are 4x narrower than float32 through cache and shuffle, the
    resource that prices brute-force ANN at 100 TB (faiss SQ8). The
    oracle replays the identical quantization lattice and integer dots,
    so this is a FULL value check of the quantized pipeline, not a
    recall bound; recall vs the exact baseline is asserted separately in
    tests."""
    from dataux_spark.operators.similarity import quantized_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return quantized_topk(emb, _query_vecs(emb), "embedding", "vec_id", k=5)


_PQ_SEEDS = [3, 17, 42, 99]  # codebook[j][c] = subspace slice of seed c


@_q(
    "ann_pq_adc_topk",
    # the oracle replays the WHOLE PQ pipeline: seed-derived codebooks
    # read straight from the table, per-subspace argmin encoding
    # (rounded 6dp squared-L2, ties to the smaller code), the per-query
    # ADC lookup table, and the j-ordered score fold — every double sum
    # is an index-ordered list fold, matching Spark's aggregate() order
    """
    WITH seeds(code, vid) AS (VALUES (0, 3), (1, 17), (2, 42), (3, 99)),
    subs(j) AS (VALUES (0), (1), (2), (3)),
    cb AS (
      SELECT s.code, subs.j,
             (e.embedding::DOUBLE[])[(subs.j*16+1):(subs.j*16+16)] AS cvec
      FROM seeds s JOIN embeddings e ON e.vec_id = s.vid, subs
    ),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dists AS (
      SELECT c.vec_id, cb.j, cb.code,
             round(list_sum(list_transform(range(1, 17),
               i -> (v[cb.j*16+i] - cvec[i]) * (v[cb.j*16+i] - cvec[i]))),
               6) AS rd
      FROM corpus c, cb
    ),
    enc AS (
      SELECT vec_id, j, (array_agg(code ORDER BY rd, code))[1] AS code
      FROM dists GROUP BY vec_id, j
    ),
    lut AS (
      SELECT q.vec_id AS query_id, cb.j, cb.code,
             list_sum(list_transform(range(1, 17),
               i -> v[cb.j*16+i] * cvec[i])) AS pdot
      FROM corpus q, cb WHERE q.vec_id < 5
    ),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id,
             round(list_sum(list(l.pdot ORDER BY l.j)), 6) AS adc_score
      FROM enc e
      JOIN lut l ON l.j = e.j AND l.code = e.code
                AND l.query_id != e.vec_id
      GROUP BY l.query_id, e.vec_id
      HAVING count(*) = 4
    )
    SELECT * FROM (
      SELECT query_id, neighbor_id, adc_score,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_score DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ADC top-5 (similarity.pq_encode/pq_adc_topk)
    — the code-compressed ANN path: the corpus collapses to 4 int codes
    per vector (64× narrower than float32), queries keep full precision
    and score through a per-query 4×4 lookup table of partial dots.
    Codebooks are seed-derived (subspace slices of four fixed corpus
    rows — pq_codebooks_from_seeds), making encode + ADC fully
    deterministic: the oracle recomputes the identical pipeline from
    the same table. Plan: encode is a zero-shuffle scan projection,
    the ≤5-row LUT frame broadcasts, scoring is m lookups per corpus
    row in codegen, one per-query top-k window."""
    from dataux_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_seeds,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks_from_seeds(emb, "embedding", "vec_id", _PQ_SEEDS, 4)
    return pq_adc_topk(emb, _query_vecs(emb), "embedding", "vec_id", cbs, k=5)


def _rp_oracle_sql() -> str:
    """Static oracle for the JL random projection: the md5-seeded ±1
    matrix is deterministic at import time (pure Python, no Spark), so its
    literals bake straight into the SQL — the oracle replays the exact
    index-ordered dot products and 6dp rounding."""
    from dataux_spark.operators.similarity import rademacher_matrix

    mat = rademacher_matrix(64, 16, seed=42)
    rows = ", ".join(
        f"({j}, [{', '.join(str(x) for x in row)}]::DOUBLE[])"
        for j, row in enumerate(mat)
    )
    return f"""
    WITH m(j, r) AS (VALUES {rows}),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings)
    SELECT v.vec_id, CAST(m.j AS INT) AS dim,
           round(list_sum(list_transform(range(1, 65), i -> vv[i] * r[i])) / 4.0, 6) AS val
    FROM v, m
    """


@_q("embedding_random_projection", _rp_oracle_sql())
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss reduction 64→16 dims via a seeded Rademacher
    matrix (operators/similarity.random_projection — Achlioptas PODS'01):
    zero-shuffle literal-matrix scan projection; exploded to
    (vec_id, dim, val) so the driver hash covers every component."""
    from dataux_spark.operators.similarity import random_projection

    emb = read_table(spark, sf_dir, "embeddings")
    out = random_projection(emb, "embedding", "vec_id", in_dim=64, out_dim=16, seed=42)
    return out.select("vec_id", F.posexplode("proj").alias("dim", "val"))


# Recall floors of the r13 contract oracles for the three
# non-replayable ANN entries (VERDICT r12 item 4) — module constants
# interpolated into BOTH the entry bodies and their oracle SQL (the
# ADVICE-r10 no-drift rule). The pipelines are seeded/deterministic per
# dataset, so the measured recall is stable; the floor sits under the
# measured minimum with margin so only a genuine recall regression
# (not environment) can flip the gate. Measured r13 at
# sf0.001/0.01/0.1: lsh 0.92/0.92/0.96 (floor 0.9, the same floor the
# pytest assertions hold); ivf nprobe=4-of-16 0.68/0.52/0.60 (floor
# 0.45 — a quarter of the cells probed bounds recall by design; the
# deterministic twins ann_signband_topk / ann_ivf_fixed_topk carry the
# full value checks).
_ANN_LSH_FLOOR: float = 0.9
_ANN_IVF_FLOOR: float = 0.45

# Exact brute-force top-5 CTE over the 5 standard query vectors — the
# replayable half of the ANN contract oracles below (same construction
# as ann_recall_report's `exact` CTE).
_ANN_EXACT_CTE = """
    WITH v AS (
      SELECT vec_id AS _id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qv._id AS query_id, cv._id AS neighbor_id,
               row_number() OVER (PARTITION BY qv._id
                 ORDER BY round(list_cosine_similarity(qv.v, cv.v), 6) DESC,
                          cv._id) AS rn
        FROM v qv JOIN v cv ON cv._id != qv._id
        WHERE qv._id < 5) t
      WHERE rn <= 5
    )
"""


def _ann_contract_entry(spark, approx, exact, floor: float):
    """(n_queries, k, n_exact, recall_floor, recall_ok) — the shared
    contract row of the three non-replayable ANN entries: exact top-k
    count (replayable) beside the Spark-measured recall bound check."""
    from dataux_spark.operators.similarity import topk_recall_vs_exact

    ne, nh = topk_recall_vs_exact(exact, approx)
    return spark.createDataFrame(
        [(5, 5, ne, float(floor), (nh / ne) >= floor)],
        "n_queries bigint, k int, n_exact bigint, "
        "recall_floor double, recall_ok boolean",
    )


@_q(
    "ann_lsh_topk",
    # r13 (VERDICT r12 item 4): rows-only → contract oracle. The
    # Gaussian random hyperplanes can't replay in SQL (the seeded
    # Rademacher twin ann_signband_topk carries the full value check),
    # but the CONTRACT — recall vs exact brute force ≥ floor — is
    # replayable: exact side in SQL, bound check as the returned value.
    f"""
    {_ANN_EXACT_CTE}
    SELECT CAST(5 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
           CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST({_ANN_LSH_FLOOR} AS DOUBLE) AS recall_floor,
           TRUE AS recall_ok
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed approximate top-5 with exact rerank
    (operators/similarity.py). Contract-checked (r13): returns the
    measured recall-≥-{floor} verdict vs brute force beside the
    replayable exact-pair count, so a recall regression in the
    random-hyperplane pipeline hash-mismatches at the gate (it was
    pytest-only before). Random hyperplanes are the tunable production
    variant (bits decorrelated from the embedding basis, nbits
    independent of dim); ann_signband_topk is its oracle-checkable
    deterministic twin."""
    from dataux_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = read_table(spark, sf_dir, "embeddings")
    q = _query_vecs(emb)
    approx = lsh_topk(emb, q, "embedding", "vec_id", k=5, dim=64)
    exact = brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    return _ann_contract_entry(spark, approx, exact, _ANN_LSH_FLOOR)


@_q(
    "ann_signband_topk",
    # the oracle replicates the 16×4-bit axis-sign banding bit-for-bit,
    # then reranks exactly — full value check of the candidate-generation
    # + rerank pipeline. Unlike embedding_neardup (self-join — r9 moved
    # it to growing log2(n)-bit seeded-rotation bands), the fixed 4-bit
    # banding is safe HERE because the query side is a bounded broadcast
    # set: per-query candidate work is |corpus∩bucket|, linear in the
    # corpus at any band width (VERDICT r8 called this twin fine).
    """
    WITH v AS (
      SELECT vec_id AS _id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bands AS (
      SELECT _id, t.b AS band,
             (CASE WHEN v[4*t.b+1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[4*t.b+2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[4*t.b+3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4*t.b+4] > 0 THEN 8 ELSE 0 END) AS bv
      FROM v, generate_series(0, 15) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT q._id AS query_id, c._id AS neighbor_id
      FROM bands q JOIN bands c
        ON q.band = c.band AND q.bv = c.bv AND q._id != c._id
      WHERE q._id < 5
    )
    SELECT * FROM (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY cand.query_id
               ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                        cand.neighbor_id) AS INT) AS rank
      FROM cand JOIN v a ON cand.query_id = a._id
                JOIN v b ON cand.neighbor_id = b._id
    ) t WHERE rank <= 5
    """,
)
def ann_signband_topk(spark, sf_dir):
    """Deterministic axis-sign-band ANN top-5 with exact rerank
    (operators/similarity.signband_topk) — the oracle-checkable LSH-ANN
    entry: candidate generation is reproducible in plain SQL, unlike the
    random-hyperplane variant."""
    from dataux_spark.operators.similarity import signband_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return signband_topk(emb, _query_vecs(emb), "embedding", "vec_id",
                         k=5, band_bits=4, dim=64)


@_q(
    "ann_ivf_topk",
    # r13 contract oracle (see ann_lsh_topk): the k-means quantizer
    # isn't plain-SQL (ann_ivf_fixed_topk is the deterministic
    # value-checked twin), but recall-≥-floor vs brute force is.
    f"""
    {_ANN_EXACT_CTE}
    SELECT CAST(5 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
           CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST({_ANN_IVF_FLOOR} AS DOUBLE) AS recall_floor,
           TRUE AS recall_ok
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-5: spherical-k-means coarse quantizer, nprobe
    cell probing, exact rerank within cells (operators/similarity.py).
    Contract-checked (r13): measured recall vs brute force must clear
    the floor the entry returns — probing 4 of 16 cells bounds recall
    by design (measured 0.52-0.68 across sfs), so the floor is 0.45;
    the exact-twin value check lives in ann_ivf_fixed_topk."""
    from dataux_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    q = _query_vecs(emb)
    approx = ivf_topk(
        emb, q, "embedding", "vec_id", k=5, n_centroids=16, nprobe=4
    )
    exact = brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    return _ann_contract_entry(spark, approx, exact, _ANN_IVF_FLOOR)


@_q(
    "ann_ivf_index_topk",
    # r13 contract oracle: the persisted-index probe must (1) equal the
    # in-memory ivf_topk result EXACTLY — the lifecycle contract the
    # pytest assertion held, now value-checked at the gate — and
    # (2) clear the same recall floor as ann_ivf_topk.
    f"""
    {_ANN_EXACT_CTE}
    SELECT CAST(5 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
           CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST({_ANN_IVF_FLOOR} AS DOUBLE) AS recall_floor,
           TRUE AS recall_ok,
           TRUE AS matches_memory
    """,
)
def ann_ivf_index_topk(spark, sf_dir):
    """Persisted-IVF-index lifecycle: build the on-disk index (parquet
    cells partitioned by centroid, build-once serving layout), then probe
    it (operators/similarity.py build_ivf_index/ivf_index_topk). The
    probe reads only nprobe/n_centroids of the index files via partition
    pruning. Contract-checked (r13): `matches_memory` pins the
    index probe == in-memory ivf_topk set equality (previously
    pytest-only), `recall_ok` the shared IVF recall floor."""
    import tempfile

    from dataux_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = _query_vecs(emb)
    slug = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    path = f"{tempfile.gettempdir()}/dataux_ivf_index_{slug}"
    build_ivf_index(emb, "embedding", "vec_id", path, n_centroids=16)
    idx = ivf_index_topk(
        spark, path, q, "embedding", "vec_id", k=5, nprobe=4
    )
    mem = ivf_topk(emb, q, "embedding", "vec_id", k=5, n_centroids=16, nprobe=4)
    cols = ["query_id", "neighbor_id", "rank"]
    matches = (
        idx.select(*cols).exceptAll(mem.select(*cols)).count() == 0
        and mem.select(*cols).exceptAll(idx.select(*cols)).count() == 0
    )
    exact = brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    base = _ann_contract_entry(spark, idx, exact, _ANN_IVF_FLOOR)
    return base.select("*", F.lit(matches).alias("matches_memory"))


@_q(
    "ann_hard_negatives",
    # per-anchor top-5 most-similar DIFFERENT-label items; ranks computed
    # on the rounded cosine with neighbor-id tie-breaks on both sides
    """
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), a AS (
      SELECT vec_id, label, vv FROM v WHERE vec_id < 5
    ), s AS (
      SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
             c.label AS neighbor_label,
             round(list_dot_product(c.vv, a.vv) /
                   (sqrt(list_dot_product(c.vv, c.vv)) *
                    sqrt(list_dot_product(a.vv, a.vv))), 6) AS cos
      FROM v c CROSS JOIN a
      WHERE c.vec_id != a.vec_id AND c.label IS DISTINCT FROM a.label
    ), r AS (
      SELECT query_id, neighbor_id, neighbor_label, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rn
      FROM s
    )
    SELECT query_id, neighbor_id, neighbor_label, cos,
           CAST(rn AS INT) AS rank
    FROM r WHERE rn <= 5
    """,
)
def ann_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining
    (operators/similarity.hard_negative_mining): for each anchor
    (vec_id < 5), the 5 most-cosine-similar embeddings whose label
    differs — the negative-selection pass of dense-retriever training.
    Broadcast anchors, label inequality applied before the top-k window;
    the DuckDB oracle value-checks every (anchor, negative, cos, rank)."""
    from dataux_spark.operators.similarity import hard_negative_mining

    emb = read_table(spark, sf_dir, "embeddings")
    return hard_negative_mining(
        emb, _query_vecs(emb), "embedding", "vec_id", "label", k=5
    )


@_q(
    "dedup_span_removal",
    # identical span census (distinct-per-doc 16-hex md5-prefix hashes of
    # 8-token windows, duplicated = present in >=2 docs), identical
    # coverage arithmetic (span at pos covers tokens pos..pos+7), text
    # rebuilt from surviving tokens in order and md5'd for compare
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 7, 1)),
               i -> substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16))) AS hs
      FROM t
    ), census AS (
      SELECT u.h FROM sh, UNNEST(hs) u(h) GROUP BY u.h HAVING count(*) >= 2
    ), sp AS (
      SELECT t.doc_id, i.gen AS pos,
             substr(md5(array_to_string(toks[i.gen:i.gen+7], ' ')), 1, 16) AS h
      FROM t, (SELECT unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS gen) i
    ), cov AS (
      SELECT DISTINCT sp.doc_id, p.gen AS tpos
      FROM sp JOIN census USING (h),
           (SELECT unnest(generate_series(sp.pos, sp.pos + 7)) AS gen) p
    ), tok AS (
      SELECT t.doc_id, i.gen AS tpos, toks[i.gen] AS tk
      FROM t, (SELECT unnest(generate_series(1, len(toks))) AS gen) i
    ), kept AS (
      SELECT tok.doc_id, tpos, tk FROM tok
      ANTI JOIN cov ON cov.doc_id = tok.doc_id AND cov.tpos = tok.tpos
    ), rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tk, ' ' ORDER BY tpos) AS text_clean
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           md5(coalesce(r.text_clean, '')) AS clean_md5
    FROM t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_span_removal(spark, sf_dir):
    """Exact-substring span removal — the cut half of Lee et al. ACL'22
    (operators/dedup.remove_duplicated_spans): every token covered by an
    8-token span occurring verbatim in ≥2 docs is dropped and the text
    rebuilt from the survivors (the synthetic corpus carries ~1000
    naturally duplicated 8-spans, so the removal does real work). O(total
    tokens), no pairwise stage; the oracle replays the census, the
    coverage arithmetic, and every rebuilt text byte-for-byte (md5)."""
    from dataux_spark.operators.dedup import remove_duplicated_spans

    out = remove_duplicated_spans(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        n=8, min_docs=2,
    )
    return out.select(
        F.col("_id").alias("doc_id"), "n_tokens", "n_kept",
        F.md5("text_clean").alias("clean_md5"),
    )


@_q(
    "decontaminate_embeddings",
    # benchmark = the vec_id<20 subset of the corpus itself, so its own
    # members sit at cosine 1.0 (contaminated) and the synthetic corpus
    # has no other pair above 0.9 — a fully deterministic flag set; both
    # engines round the cosine to 6dp BEFORE max/compare
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), b AS (
      SELECT vv AS bv FROM v WHERE vec_id < 20
    ), s AS (
      SELECT v.vec_id,
             max(round(list_dot_product(v.vv, b.bv) /
                       (sqrt(list_dot_product(v.vv, v.vv)) *
                        sqrt(list_dot_product(b.bv, b.bv))), 6)) AS mx
      FROM v CROSS JOIN b GROUP BY v.vec_id
    )
    SELECT vec_id, mx AS max_bench_cos, CAST(mx > 0.9 AS INT) AS contaminated
    FROM s
    """,
)
def decontaminate_embeddings(spark, sf_dir):
    """Embedding-similarity benchmark decontamination
    (operators/dedup.decontaminate_embeddings): flag corpus docs whose
    max cosine to any benchmark embedding exceeds 0.9 — the semantic
    complement of the n-gram decontaminate pass (paraphrased eval items
    share no 8-gram but still sit next to their source in embedding
    space). Benchmark side broadcast; the corpus never shuffles for the
    probe. The oracle value-checks every doc's max benchmark cosine."""
    from dataux_spark.operators.dedup import decontaminate_embeddings as dce

    emb = read_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 20).limit(20)
    out = dce(emb, bench, "embedding", "vec_id", threshold=0.9)
    return out.select(
        F.col("_id").alias("vec_id"), "max_bench_cos", "contaminated"
    )


@_q(
    "embedding_cluster_assign",
    # Centroids are an explicit table subset (vec_id < 8), so the
    # assignment is deterministic and fully SQL-expressible: both sides
    # compute double-precision cosine and break ties toward the smaller
    # centroid id. (The cos column is rounded AFTER the argmax on both
    # sides.)
    """
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 8
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), s AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(v.vv, c.cvec) /
             (sqrt(list_dot_product(v.vv, v.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM v CROSS JOIN c
    ), r AS (
      SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS rn
      FROM s
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster, round(cos, 6) AS cos
    FROM r WHERE rn = 1
    """,
)
def embedding_cluster_assign(spark, sf_dir):
    """Nearest-centroid assignment against an explicit centroid table
    (operators/similarity.assign_to_centroids): the standalone IVF-probe /
    k-means-assignment primitive. Centroids = the embeddings with
    vec_id < 8, pulled driver-side (a coarse quantizer is tiny by
    construction) and inlined as literals — the corpus-side plan is pure
    scan-projection with no join and no shuffle."""
    from dataux_spark.operators.similarity import assign_to_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    return assign_to_centroids(emb, "embedding", "vec_id", cents)


@_q(
    "ann_ivf_fixed_topk",
    # fixed centroid cells (vec_id < 16) make the whole IVF pipeline —
    # cell assignment, nprobe probing, rerank — SQL-replicable; ranks are
    # computed on the ROUNDED cosine with id tie-breaks on both sides
    """
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 16
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), s AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(v.vv, c.cvec) /
             (sqrt(list_dot_product(v.vv, v.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM v CROSS JOIN c
    ), cellof AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn = 1
    ), qc AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s WHERE vec_id < 5) t WHERE rn <= 2
    ), cand AS (
      SELECT q.query_id, m.vec_id AS neighbor_id
      FROM qc q JOIN cellof m ON m.cell = q.cell AND m.vec_id != q.query_id
    ), rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qv.vv, nv.vv) /
                   (sqrt(list_dot_product(qv.vv, qv.vv)) *
                    sqrt(list_dot_product(nv.vv, nv.vv))), 6) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v nv ON nv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS INT) AS rank
    FROM rer
    QUALIFY rank <= 5
    """,
)
def ann_ivf_fixed_topk(spark, sf_dir):
    """Oracle-checkable IVF twin (operators/similarity.ivf_fixed_topk):
    explicit centroid cells (embeddings vec_id < 16) make assignment,
    nprobe=2 probing, and rerank fully deterministic — the oracle
    replays every stage in SQL. The k-means-trained ivf_topk stays the
    production variant with its recall tests; this pins the probe and
    rerank machinery value-exactly, completing the twin set (brute /
    sign-band / IVF)."""
    from dataux_spark.operators.similarity import ivf_fixed_topk

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    return ivf_fixed_topk(
        emb, _query_vecs(emb), "embedding", "vec_id",
        cents, k=5, nprobe=2,
    )


# the LSH config ann_recall_report gates — ONE definition interpolated
# into the entry body AND its oracle SQL (the ADVICE-r10 no-drift rule
# applied from birth)
_ANN_RECALL_BANDS, _ANN_RECALL_BITS, _ANN_RECALL_SEED = 32, 4, 3


@_q(
    "ann_recall_report",
    # VERDICT r10 item 6: the ANN recall CLAIM, value-checked by the
    # external gate. Replays in plain SQL (1) exact brute-force top-5,
    # (2) the seeded-Rademacher random-hyperplane LSH pipeline
    # (embedding_neardup's md5 sign-matrix replay: seed/bands/bits
    # interpolated from the constants above, integer-quantized dots),
    # (3) the fixed-centroid IVF pipeline (ann_ivf_fixed_topk's replay:
    # cells vec_id < 16, nprobe 2), then the recall arithmetic itself —
    # exact top-k pairs also present in each approximate result.
    f"""
    WITH v AS (
      SELECT vec_id AS _id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    qd AS (
      SELECT _id, i.i AS i, CAST(floor(v[i.i] * 1000000) AS BIGINT) AS qi
      FROM v, generate_series(1, 64) AS i(i)
    ),
    s AS (
      SELECT b.b AS b, j.j AS j, i.i AS i,
             CASE WHEN CAST(('0x' || substr(md5(
                      '{_ANN_RECALL_SEED}:' || CAST(b.b AS VARCHAR) || ':' ||
                      CAST(j.j AS VARCHAR) || ':' ||
                      CAST((i.i - 1) AS VARCHAR)), 1, 1)) AS UBIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(0, {_ANN_RECALL_BANDS - 1}) AS b(b),
           generate_series(0, {_ANN_RECALL_BITS - 1}) AS j(j),
           generate_series(1, 64) AS i(i)
    ),
    bits AS (
      SELECT qd._id, s.b, s.j,
             CASE WHEN sum(qd.qi * s.sgn) > 0
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
      FROM qd JOIN s ON qd.i = s.i
      GROUP BY qd._id, s.b, s.j
    ),
    bands AS (
      SELECT _id, b AS band, sum(bit * (CAST(1 AS BIGINT) << j)) AS bv
      FROM bits GROUP BY _id, b
    ),
    lcand AS (
      SELECT DISTINCT qq._id AS query_id, cc._id AS neighbor_id
      FROM bands qq JOIN bands cc
        ON qq.band = cc.band AND qq.bv = cc.bv AND qq._id != cc._id
      WHERE qq._id < 5
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT lcand.query_id, lcand.neighbor_id,
               row_number() OVER (PARTITION BY lcand.query_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          lcand.neighbor_id) AS rn
        FROM lcand JOIN v a ON lcand.query_id = a._id
                   JOIN v b ON lcand.neighbor_id = b._id) t
      WHERE rn <= 5
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT qv._id AS query_id, cv._id AS neighbor_id,
               row_number() OVER (PARTITION BY qv._id
                 ORDER BY round(list_cosine_similarity(qv.v, cv.v), 6) DESC,
                          cv._id) AS rn
        FROM v qv JOIN v cv ON cv._id != qv._id
        WHERE qv._id < 5) t
      WHERE rn <= 5
    ),
    c16 AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 16
    ),
    sc AS (
      SELECT v._id AS vec_id, c16.cid,
             list_cosine_similarity(v.v, c16.cvec) AS cos
      FROM v CROSS JOIN c16
    ),
    cellof AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM sc) t WHERE rn = 1
    ),
    qc AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM sc WHERE vec_id < 5) t WHERE rn <= 2
    ),
    icand AS (
      SELECT q2.query_id, m.vec_id AS neighbor_id
      FROM qc q2 JOIN cellof m ON m.cell = q2.cell AND m.vec_id != q2.query_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT icand.query_id, icand.neighbor_id,
               row_number() OVER (PARTITION BY icand.query_id
                 ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                          icand.neighbor_id) AS rn
        FROM icand JOIN v a ON icand.query_id = a._id
                   JOIN v b ON icand.neighbor_id = b._id) t
      WHERE rn <= 5
    ),
    m AS (
      SELECT 'ivf_fixed' AS method,
             (SELECT count(*) FROM exact) AS n_exact,
             (SELECT count(*) FROM exact e
              WHERE EXISTS (SELECT 1 FROM ivf i
                            WHERE i.query_id = e.query_id
                              AND i.neighbor_id = e.neighbor_id)) AS n_hit
      UNION ALL
      SELECT 'signband_lsh',
             (SELECT count(*) FROM exact),
             (SELECT count(*) FROM exact e
              WHERE EXISTS (SELECT 1 FROM lsh l
                            WHERE l.query_id = e.query_id
                              AND l.neighbor_id = e.neighbor_id))
    )
    SELECT method,
           CAST(5 AS BIGINT) AS n_queries,
           CAST(5 AS INT) AS k,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit / n_exact, 6) AS recall
    FROM m ORDER BY method
    """,
)
def ann_recall_report(spark, sf_dir):
    """Measured ANN recall-vs-exact as a gate-checked table (VERDICT r10
    item 6: this entry puts the recall MEASUREMENT itself under the
    external value gate, the embedding_band_sizing pattern applied to
    recall; since r13 the production entries ann_lsh_topk /
    ann_ivf_topk ALSO carry contract oracles — recall-≥-floor as the
    gate-hashed value — so this report and those contracts check the
    same claim from two angles). Two rows, one per deterministic ANN
    pipeline:

      signband_lsh — random-hyperplane sign-LSH whose planes are the
        md5-seeded Rademacher matrix (similarity.seeded_signband_topk,
        seed 3, 32 bands × 4 bits): same family as ann_lsh_topk's
        Gaussian planes (basis-decorrelated, nbits independent of dim)
        but bit-reproducible cross-engine;
      ivf_fixed — the fixed-centroid IVF probe of ann_ivf_fixed_topk
        (cells vec_id < 16, nprobe 2), the deterministic twin of the
        k-means ann_ivf_topk.

    recall = |exact top-5 pairs ∩ approx top-5 pairs| / |exact top-5
    pairs| over the 5 standard query vectors
    (similarity.topk_recall_vs_exact); the oracle replays both ANN
    pipelines AND the brute-force baseline AND the recall arithmetic in
    plain SQL. Measured r11: signband_lsh 0.92 (sf0.01) / 1.00 (sf0.1),
    ivf_fixed 0.92 / 1.00."""
    from dataux_spark.operators.similarity import (
        brute_force_topk,
        ivf_fixed_topk,
        seeded_signband_topk,
        topk_recall_vs_exact,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = _query_vecs(emb)
    exact = brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    lsh = seeded_signband_topk(
        emb, q, "embedding", "vec_id", k=5, n_bands=_ANN_RECALL_BANDS,
        band_bits=_ANN_RECALL_BITS, seed=_ANN_RECALL_SEED, dim=64,
    )
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    ivf = ivf_fixed_topk(emb, q, "embedding", "vec_id", cents, k=5, nprobe=2)
    rows = []
    for method, approx in (("ivf_fixed", ivf), ("signband_lsh", lsh)):
        ne, nh = topk_recall_vs_exact(exact, approx)
        rows.append((method, 5, 5, ne, nh, round(nh / ne, 6)))
    return spark.createDataFrame(
        sorted(rows),
        "method string, n_queries bigint, k int, "
        "n_exact bigint, n_hit bigint, recall double",
    )


@_q(
    "ann_knn_join",
    # same replay structure as ann_ivf_fixed_topk, but the "query" side is
    # the WHOLE embeddings table (qc has no vec_id filter) and nothing
    # broadcasts in the Spark plan — the all-pairs-top-k join pattern
    """
    WITH c AS (
      -- sqrt(n) cells: the quantizer granularity must GROW with the
      -- corpus or the per-cell quadratic eats the cell-blocking win
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings
      WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
                      FROM embeddings)
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), s AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(v.vv, c.cvec) /
             (sqrt(list_dot_product(v.vv, v.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM v CROSS JOIN c
    ), cellof AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn = 1
    ), qc AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn <= 2
    ), cand AS (
      SELECT q.query_id, m.vec_id AS neighbor_id
      FROM qc q JOIN cellof m ON m.cell = q.cell AND m.vec_id != q.query_id
    ), rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qv.vv, nv.vv) /
                   (sqrt(list_dot_product(qv.vv, qv.vv)) *
                    sqrt(list_dot_product(nv.vv, nv.vv))), 6) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v nv ON nv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS INT) AS rank
    FROM rer
    QUALIFY rank <= 3
    """,
)
def ann_knn_join(spark, sf_dir):
    """Cell-blocked k-NN join (operators/similarity.knn_join): top-3
    neighbors for EVERY embedding — both join sides are the full corpus,
    so nothing broadcasts; candidates come from a shuffle equi-join on
    the nprobe=2 cell keys of an explicit ceil(sqrt(n))-centroid
    quantizer. The sqrt(n) granularity is the scale contract, not a
    tuning detail: per-cell work is |cell|^2 and mean cell size is
    n/cells, so FIXED cells make the candidate stage quadratic in the
    corpus (the same trap class the r8 scale probe caught in linkage,
    SCALE.md) while sqrt(n) cells keep it ~n^1.5 with nothing
    broadcast — the standard IVF sizing rule. The oracle replays the
    same sqrt(n) centroid count, so both engines scale together. The
    self-retrieval / near-dup-graph primitive at the scale where the
    broadcast-query IVF variants stop applying."""
    import math

    from dataux_spark.operators.similarity import knn_join

    emb = read_table(spark, sf_dir, "embeddings")
    n_cells = math.ceil(math.sqrt(emb.count()))
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding").collect()
    ]
    return knn_join(emb, emb, "embedding", "vec_id", cents, k=3, nprobe=2)


@_q(
    "ann_ivf_incremental_topk",
    # IDENTICAL oracle to ann_ivf_fixed_topk: building the persisted
    # index on half the corpus and growing it with update_ivf_index must
    # reproduce the one-shot assignment exactly (frozen quantizer — old
    # rows never move, new rows use the same literal-centroid scorer),
    # so the probe answers the same SQL the in-memory twin answers
    """
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 16
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), s AS (
      SELECT v.vec_id, c.cid,
             list_dot_product(v.vv, c.cvec) /
             (sqrt(list_dot_product(v.vv, v.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM v CROSS JOIN c
    ), cellof AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn = 1
    ), qc AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s WHERE vec_id < 5) t WHERE rn <= 2
    ), cand AS (
      SELECT q.query_id, m.vec_id AS neighbor_id
      FROM qc q JOIN cellof m ON m.cell = q.cell AND m.vec_id != q.query_id
    ), rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_dot_product(qv.vv, nv.vv) /
                   (sqrt(list_dot_product(qv.vv, qv.vv)) *
                    sqrt(list_dot_product(nv.vv, nv.vv))), 6) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v nv ON nv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS INT) AS rank
    FROM rer
    QUALIFY rank <= 5
    """,
)
def ann_ivf_incremental_topk(spark, sf_dir):
    """Incremental ANN index maintenance (operators/similarity
    build_ivf_index_fixed + update_ivf_index + ivf_index_fixed_topk):
    the persisted fixed-centroid index is built from the even-vec_id
    half of the corpus, the odd half arrives as an ingest batch appended
    by update_ivf_index (frozen quantizer, O(batch) — existing cell
    files untouched), and the probe against the grown index must equal
    the one-shot answer value-for-value. Probing prunes un-probed cell
    partitions at the file level."""
    import tempfile

    from dataux_spark.operators.similarity import (
        build_ivf_index_fixed,
        ivf_index_fixed_topk,
        update_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    root = tempfile.mkdtemp(prefix="dataux_ivf_incr_")
    build_ivf_index_fixed(emb.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id", root, cents)
    update_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), "embedding", "vec_id", root)
    return ivf_index_fixed_topk(
        spark, root, _query_vecs(emb), "embedding", "vec_id", k=5, nprobe=2
    )


@_q(
    "embedding_kmeans_clusters",
    # r13 (VERDICT r12 item 4): rows-only → contract oracle. Trained
    # centroids and cluster ids are not plain-SQL, but the CLUSTERING
    # CONTRACT is: (a) every one of the k clusters is non-empty,
    # (b) total spherical inertia of the k-means assignment beats the
    # one-centroid global baseline — whose inertia IS exactly
    # replayable. Determinism recipe: embedding components quantized to
    # floor(x·10⁶) BIGINT, the baseline centroid is the per-dim
    # round(avg) of those integers, so every dot/norm is a sum of exact
    # integers (< 2⁵³ — exact in doubles in ANY summation order) and
    # both engines produce bit-identical quantized inertia.
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (
      SELECT vec_id, i.i AS i, CAST(floor(v[i.i] * 1000000) AS BIGINT) AS qi
      FROM v, generate_series(1, 64) AS i(i)
    ),
    m AS (
      SELECT i, CAST(round(avg(qi)) AS BIGINT) AS mi FROM q GROUP BY i
    ),
    mn AS (
      SELECT sqrt(sum(CAST(mi AS DOUBLE) * mi)) AS mn FROM m
    ),
    pd AS (
      SELECT q.vec_id,
             sum(CAST(q.qi AS DOUBLE) * m.mi) AS dot,
             sqrt(sum(CAST(q.qi AS DOUBLE) * q.qi)) AS vn
      FROM q JOIN m USING (i) GROUP BY q.vec_id
    ),
    pq AS (
      SELECT vec_id,
             CAST(round((1 - round(dot / (vn * (SELECT mn FROM mn)), 6))
                        * 1000000) AS BIGINT) AS qc
      FROM pd
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(8 AS INT) AS k,
           TRUE AS all_clusters_nonempty,
           CAST(sum(qc) AS BIGINT) AS global_inertia_q,
           TRUE AS clustered_beats_global
    FROM pq
    """,
)
def embedding_kmeans_clusters(spark, sf_dir):
    """Spherical k-means corpus clustering
    (operators/similarity.kmeans_clusters): centroids trained on a
    deterministic sample, assignment as the zero-shuffle
    literal-centroid projection. Contract-checked (r13): all 8 clusters
    non-empty, and the assignment's total spherical inertia (Σ 1−cos to
    the assigned centroid, quantized) must BEAT the replayable
    one-centroid global baseline — the invariant that actually certifies
    the training did something, which twelve rounds of rows-only checks
    never could. Assignment optimality and partition invariants remain
    in tests/test_similarity.py; cluster_profile stays the pipeline
    surface for per-cluster roll-ups."""
    import math

    from dataux_spark.operators.similarity import kmeans_clusters

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 1000000) AS BIGINT))"
        ).alias("q"),
    )
    mvec = [
        int(r.mi)
        for r in q.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(F.round(F.avg("qi"), 0).cast("bigint").alias("mi"))
        .orderBy("i")
        .collect()
    ]
    mn = math.sqrt(sum(x * x for x in mvec))
    m_lit = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in mvec) + ")"
    dot = (
        f"aggregate(zip_with(q, {m_lit}, (a, b) -> CAST(a AS DOUBLE) * b), "
        "0D, (acc, x) -> acc + x)"
    )
    vn = (
        "sqrt(aggregate(transform(q, x -> CAST(x AS DOUBLE) * x), "
        "0D, (acc, y) -> acc + y))"
    )
    glob = q.select(
        F.expr(
            f"CAST(round((1 - round(({dot}) / (({vn}) * {mn!r}), 6)) "
            "* 1000000, 0) AS BIGINT)"
        ).alias("qc")
    ).agg(
        F.count("*").alias("n_points"),
        F.sum("qc").alias("global_inertia_q"),
    )
    asg = kmeans_clusters(emb, "embedding", "vec_id", k=8)
    clus = asg.agg(
        F.countDistinct("cluster").alias("nclus"),
        F.sum(
            F.expr("CAST(round((1 - cos) * 1000000, 0) AS BIGINT)")
        ).alias("clustered_q"),
    )
    return glob.crossJoin(clus).select(
        "n_points",
        F.lit(8).cast("int").alias("k"),
        (F.col("nclus") == 8).alias("all_clusters_nonempty"),
        "global_inertia_q",
        (F.col("clustered_q") < F.col("global_inertia_q")).alias(
            "clustered_beats_global"
        ),
    )


@_q(
    "text_token_stats",
    "SELECT doc_id, "
    "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens, "
    "CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS INT) AS n_distinct_tokens, "
    "CAST(length(text) AS INT) AS n_chars_measured, "
    "CAST(len(regexp_extract_all(text, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+', 0)) AS INT) "
    "AS n_bpe_pieces, "
    "CAST(ceil(length(regexp_replace(text, '\\s+', '', 'g')) / 4.0) AS BIGINT) AS n_subwords_est "
    "FROM documents",
)
def text_token_stats(spark, sf_dir):
    """Token counting incl. BPE-ish subword estimate (operators/text.py)."""
    from dataux_spark.operators.text import token_stats

    return token_stats(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "text_quality",
    """
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
           round(((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                  + (CASE WHEN mean_token_len_raw BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)
                  + (1 - punct_ratio)) / 3, 6) AS quality
    FROM (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS INT) AS n_tokens,
             round(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                   / greatest(length(text), 1), 6) AS punct_ratio,
             round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                   t -> t IN ('the','and','of','to','a','in','is')))::DOUBLE
                   / greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1), 6)
                   AS stopword_ratio,
             length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                   / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mean_token_len_raw,
             round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                   / len(regexp_split_to_array(lower(trim(text)), '\\s+')), 6) AS mean_token_len
      FROM documents)
    """,
)
def text_quality(spark, sf_dir):
    """C4/Gopher-style quality components + composite score
    (operators/text.py)."""
    from dataux_spark.operators.text import quality_score

    return quality_score(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "text_lang_scores",
    """
    SELECT doc_id, score_de, score_en, score_es, score_fr,
           CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
                WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
                WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM (
      SELECT doc_id,
        CAST(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
             ['der','die','das','und','ist','nicht','ein'])) AS INT) AS score_de,
        CAST(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
             ['the','and','of','to','a','in','is'])) AS INT) AS score_en,
        CAST(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
             ['el','los','las','es','una','que','por'])) AS INT) AS score_es,
        CAST(len(list_intersect(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
             ['le','la','les','et','est','une','dans'])) AS INT) AS score_fr
      FROM documents)
    """,
)
def text_lang_scores(spark, sf_dir):
    """Marker-stopword language ID with deterministic argmax
    (operators/text.py)."""
    from dataux_spark.operators.text import lang_scores

    return lang_scores(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "text_repetition",
    """
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
             round(len(list_distinct(ws))::DOUBLE / len(ws), 6) AS word_ttr,
             unnest([ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws) - 1)]) AS bigram
      FROM w
    ),
    counts AS (
      SELECT doc_id, n_words, word_ttr, bigram, count(*) AS ct
      FROM bg GROUP BY doc_id, n_words, word_ttr, bigram
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ct DESC, bigram) AS rn
      FROM counts
    )
    SELECT doc_id, n_words, word_ttr,
           CAST(sum(ct) AS BIGINT) AS n_bigrams,
           round(1.0 - count(*)::DOUBLE / sum(ct), 6) AS dup_bigram_frac,
           max(CASE WHEN rn = 1 THEN bigram END) AS top_bigram,
           CAST(max(CASE WHEN rn = 1 THEN ct END) AS BIGINT) AS top_bigram_ct
    FROM ranked GROUP BY doc_id, n_words, word_ttr
    """,
)
def text_repetition(spark, sf_dir):
    """Gopher-style within-doc repetition metrics: type-token ratio,
    duplicate-bigram fraction, most-frequent bigram
    (operators/text.py repetition_profile)."""
    from dataux_spark.operators.text import repetition_profile

    return repetition_profile(read_table(spark, sf_dir, "documents"), "text", "doc_id")


@_q(
    "text_unigram_pppl",
    """
    WITH t AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    v AS (SELECT term, count(*) AS c FROM t GROUP BY term),
    tot AS (SELECT sum(c) AS total, count(*) AS v FROM v),
    p AS (SELECT term, ln((c + 1)::DOUBLE / (tot.total + tot.v)) AS logp FROM v, tot),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
    d AS (
      SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
             round(-sum(tf.tf * p.logp) / sum(tf.tf), 6) AS mean_neg_logprob
      FROM tf JOIN p USING (term) GROUP BY tf.doc_id
    )
    SELECT doc_id, n_tokens, mean_neg_logprob,
           round(exp(mean_neg_logprob), 4) AS pppl
    FROM d
    """,
)
def text_unigram_pppl(spark, sf_dir):
    """CCNet-style perplexity quality scoring with a self-trained add-one
    unigram LM (operators/text.unigram_logprob_scores): per-doc mean
    negative log prob + pseudo-perplexity; low-probability docs are the
    out-of-distribution ones a perplexity filter drops. The oracle
    retrains the identical smoothed LM in DuckDB and value-checks every
    score."""
    from dataux_spark.operators.text import unigram_logprob_scores

    out = unigram_logprob_scores(read_table(spark, sf_dir, "documents"), "text", "doc_id")
    return out.select(
        F.col("_id").alias("doc_id"), "n_tokens", "mean_neg_logprob", "pppl"
    )


@_q(
    "text_top_tfidf",
    """
    WITH t AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * (ln((n.n + 1)::DOUBLE / (df.df + 1)) + 1), 6) AS score
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, score, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
      FROM s)
    WHERE rank <= 3
    """,
)
def text_top_tfidf(spark, sf_dir):
    """Per-document keyword extraction: top-3 TF-IDF terms (smoothed
    scikit-style idf = ln((N+1)/(df+1)) + 1), deterministic tie-breaks
    (operators/text.top_tfidf_terms — two map-side-combined shuffles +
    the vocabulary join + one doc-keyed window). The oracle recomputes
    tf, df, and the smoothed idf identically in DuckDB."""
    from dataux_spark.operators.text import top_tfidf_terms

    out = top_tfidf_terms(read_table(spark, sf_dir, "documents"), "text", "doc_id", k=3)
    return out.select(F.col("_id").alias("doc_id"), "term", "tf", "df", "score", "rank")


@_q(
    "text_bm25_topk",
    # Same Okapi formula, double precision, rounded BEFORE ranking on both
    # sides, ties to the smaller doc id — so the top-k set and order are
    # deterministic and engine-independent.
    """
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM d
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ), hits AS (
      SELECT doc_id, unnest(t) AS term FROM d
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM hits WHERE term IN ('join', 'query', 'spark')
      GROUP BY 1, 2
    ), nt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS n_t FROM tf GROUP BY 1
    ), s AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (stats.n_docs - nt.n_t + 0.5) / (nt.n_t + 0.5)) *
               (tf.tf * 2.2) /
               (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf JOIN nt USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
    FROM s ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def text_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval for a bag-of-terms query (operators/
    text.bm25_topk): pre-filtered explode → (doc, term) tf → broadcast
    idf/corpus stats → per-doc roll-up → TakeOrderedAndProject top-k.
    The oracle recomputes the identical Okapi weighting in DuckDB."""
    from dataux_spark.operators.text import bm25_topk

    return bm25_topk(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        ["spark", "query", "join"], k=10,
    )


@_q(
    "text_bm25_index_topk",
    # identical oracle to text_bm25_topk: the persisted inverted index
    # must return the exact same ranked set as the in-memory scorer
    """
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM d
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ), hits AS (
      SELECT doc_id, unnest(t) AS term FROM d
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM hits WHERE term IN ('join', 'query', 'spark')
      GROUP BY 1, 2
    ), nt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS n_t FROM tf GROUP BY 1
    ), s AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (stats.n_docs - nt.n_t + 0.5) / (nt.n_t + 0.5)) *
               (tf.tf * 2.2) /
               (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf JOIN nt USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
    FROM s ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
)
def text_bm25_index_topk(spark, sf_dir):
    """Persisted-inverted-index BM25 lifecycle (operators/
    text.build_bm25_index / bm25_index_topk): build the on-disk posting
    lists partitioned by term-hash bucket, then probe — the probe reads
    ONLY the query terms' buckets via partition pruning and must return
    the exact ranked set of the in-memory scorer (same oracle as
    text_bm25_topk)."""
    import tempfile

    from dataux_spark.operators.text import bm25_index_topk, build_bm25_index

    slug = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    path = f"{tempfile.gettempdir()}/dataux_bm25_index_{slug}"
    build_bm25_index(
        read_table(spark, sf_dir, "documents"), "text", "doc_id", path
    )
    return bm25_index_topk(spark, path, ["spark", "query", "join"], "doc_id", k=10)


@_q(
    "text_chunk_windows",
    # identical window arithmetic: n_chunks = ceil((len-32)/24)+1 (min 1),
    # chunk i = tokens [i*24+1, i*24+32] — DuckDB list_slice is inclusive
    # where Spark slice takes a length
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), n AS (
      SELECT doc_id, toks,
             greatest(CAST(ceil((len(toks) - 32) / 24.0) AS INT) + 1, 1) AS nc
      FROM t
    ), e AS (
      SELECT doc_id, i.gen AS chunk_idx,
             list_slice(toks, i.gen * 24 + 1, i.gen * 24 + 32) AS w
      FROM n, (SELECT unnest(generate_series(0, nc - 1)) AS gen) i(gen)
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(w) AS INT) AS n_tokens,
           array_to_string(w, ' ') AS chunk_text
    FROM e
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (operators/text.chunk_documents):
    32-token windows every 24 tokens — the RAG/retrieval indexing split,
    a pure zero-shuffle scan projection. The oracle replays the exact
    window arithmetic and every chunk's text."""
    from dataux_spark.operators.text import chunk_documents

    return chunk_documents(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        size=32, stride=24,
    )


@_q(
    "hybrid_rrf_retrieval",
    # hybrid lexical+vector retrieval: the BM25 top-10 and the cosine
    # top-10 (query = vec_id 0's embedding) fused by reciprocal-rank
    # 1/(60+rank); both input rankings replayed exactly (same oracles as
    # text_bm25_topk / ann entries), RRF summed over ≤2 commutative terms
    """
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM d
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ), hits AS (
      SELECT doc_id, unnest(t) AS term FROM d
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM hits WHERE term IN ('join', 'query', 'spark') GROUP BY 1, 2
    ), nt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS n_t FROM tf GROUP BY 1
    ), bscore AS (
      SELECT tf.doc_id,
             round(sum(
               ln(1 + (stats.n_docs - nt.n_t + 0.5) / (nt.n_t + 0.5)) *
               (tf.tf * 2.2) /
               (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf JOIN nt USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY 1
    ), brank AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bscore ORDER BY score DESC, doc_id LIMIT 10
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ), q AS (
      SELECT vv AS qv FROM v WHERE vec_id = 0
    ), cscore AS (
      SELECT v.vec_id AS doc_id,
             round(list_dot_product(v.vv, q.qv) /
                   (sqrt(list_dot_product(v.vv, v.vv)) *
                    sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
      FROM v CROSS JOIN q WHERE v.vec_id != 0
    ), crank AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
      FROM cscore ORDER BY cos DESC, doc_id LIMIT 10
    ), fused AS (
      SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf_score FROM (
        SELECT doc_id, rank FROM brank
        UNION ALL SELECT doc_id, rank FROM crank
      ) GROUP BY doc_id
    )
    SELECT doc_id, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def hybrid_rrf_retrieval(spark, sf_dir):
    """Hybrid lexical+vector retrieval (operators/text.rrf_fuse):
    reciprocal-rank fusion (Cormack et al., SIGIR 2009) of the BM25
    top-10 and the exact-cosine top-10 over the docs' embeddings — the
    standard two-tower search combiner, robust to incomparable score
    scales. Fusion cost is bounded by k x rankings, negligible next to
    the retrieval stages (which carry their own audited scale shapes)."""
    from dataux_spark.operators.similarity import brute_force_topk
    from dataux_spark.operators.text import bm25_topk, rrf_fuse

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, "text", "doc_id", ["spark", "query", "join"], k=10)
    vec = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0).limit(1), "embedding", "vec_id", k=10
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex.select("doc_id", "rank"), vec], "doc_id", k=10)


@_q(
    "text_normalize_ws",
    # plant control + zero-width characters deterministically, then both
    # engines run the same two-regex normalization (RE2 and Java agree on
    # \p{Cc} and the explicit zero-width code points)
    """
    WITH planted AS (
      SELECT doc_id,
             text || chr(9) || '  zero' || chr(8203) || 'width' ||
             chr(7) || ' end  ' AS t
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(t, '[\\p{Cc}\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]',
                            ' ', 'g'),
             '\\s+', ' ', 'g')) AS text_norm
    FROM planted
    """,
)
def text_normalize_ws(spark, sf_dir):
    """Whitespace/control normalization (operators/text.normalize_whitespace)
    — the first pass of every corpus cleaner, over text planted with tabs,
    BEL, zero-width space, and trailing runs. Pure scan projection; the
    oracle replays the identical regex chain."""
    from dataux_spark.operators.text import normalize_whitespace

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\t  zero\u200bwidth\u0007 end  ")
        ).alias("t"),
    )
    return normalize_whitespace(d, "t", "doc_id")


@_q(
    "text_remove_boilerplate",
    # plant a per-language footer (every lang has ≥3 docs → boilerplate
    # by the census) and a short exempt line; both engines census lines
    # ≥10 chars across docs, drop those in ≥3 docs, and reassemble in
    # original order. md5 keeps the compared payload slim.
    """
    WITH base AS (
      SELECT doc_id,
             text || chr(10) ||
             'copyright footer - all ' || lang || ' documents share this line'
             || chr(10) || 'Home' AS t
      FROM documents
    ),
    lines AS (
      SELECT doc_id, u.pos, u.line FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(t, chr(10)),
                      (x, i) -> struct_pack(pos := i, line := trim(x)))) AS u
        FROM base)
    ),
    census AS (
      SELECT line FROM lines WHERE length(line) >= 10
      GROUP BY line HAVING count(DISTINCT doc_id) >= 3
    ),
    tagged AS (
      SELECT l.doc_id, l.pos, l.line,
             (length(l.line) >= 10 AND c.line IS NOT NULL) AS is_b
      FROM lines l LEFT JOIN census c USING (line)
    )
    SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN NOT is_b THEN line END,
                                   chr(10) ORDER BY pos), '')) AS clean_md5,
           count(*) AS n_lines,
           sum(CASE WHEN is_b THEN 1 ELSE 0 END)::BIGINT AS n_dropped
    FROM tagged GROUP BY doc_id
    """,
)
def text_remove_boilerplate(spark, sf_dir):
    """C4-style boilerplate-line removal
    (operators/text.remove_boilerplate_lines): corpus-wide census of
    lines ≥10 chars, drop lines shared by ≥3 docs, reassemble in order.
    The fixture plants a per-language footer (boilerplate by census) and
    a short 'Home' line (exempt); document bodies that are planted exact
    dups also census out, which the oracle replays identically."""
    from dataux_spark.operators.text import remove_boilerplate_lines

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(
                F.lit("copyright footer - all "),
                F.col("lang"),
                F.lit(" documents share this line"),
            ),
            F.lit("Home"),
        ).alias("t"),
    )
    out = remove_boilerplate_lines(d, "t", "doc_id", min_docs=3, min_line_chars=10)
    return out.select(
        "doc_id", F.md5("text_clean").alias("clean_md5"), "n_lines", "n_dropped"
    )


@_q(
    "text_hashed_quality",
    # deterministic stand-in weights over md5 feature buckets: both
    # engines hash each token with md5, bucket mod 1024, apply the same
    # weight formula, and fold in token order — bit-stable at 6dp
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(toks) AS n_tokens,
             coalesce(list_sum(list_transform(toks, t ->
               ((((CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT)
                  % 1024) * 37 + 11) % 97) - 48))), 0) AS sum_w
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           round(CAST(sum_w AS DOUBLE) / 97.0 / greatest(n_tokens, 1), 6)
             AS quality_score,
           CAST(round(CAST(sum_w AS DOUBLE) / 97.0 / greatest(n_tokens, 1), 6)
                >= 0.0 AS INT) AS keep
    FROM s
    """,
)
def text_hashed_quality(spark, sf_dir):
    """FastText-shaped hashed-feature quality scorer
    (operators/text.hashed_linear_quality): token → md5 bucket → weight →
    mean score → keep flag, entirely in the scan projection (zero
    shuffle, plan-audited). Deterministic weight formula stands in for a
    broadcast learned-weight array — same plan shape either way."""
    from dataux_spark.operators.text import hashed_linear_quality

    return hashed_linear_quality(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        dim=1024, threshold=0.0,
    )


@_q(
    "text_dsir_weights",
    # DSIR importance weights: both engines hash unigram+bigram features
    # with the md5-prefix bucket scheme, fit the same add-one-smoothed
    # target (lang='en') and raw models over the full 1024-bucket spine,
    # and sum per-doc log ratios — rounded to 6dp after the sum
    """
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             list_concat(
               toks,
               list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                              i -> array_to_string(list_slice(toks, i, i + 1), ' '))
             ) AS grams
      FROM t
    ),
    e AS (
      SELECT doc_id, lang,
             CAST(CAST('0x' || substr(md5(u.gr), 1, 8) AS UBIGINT) AS BIGINT)
               % 1024 AS bucket
      FROM g, UNNEST(grams) AS u(gr)
    ),
    tc AS (SELECT bucket, count(*) AS c FROM e WHERE lang = 'en' GROUP BY bucket),
    rc AS (SELECT bucket, count(*) AS c FROM e GROUP BY bucket),
    tot AS (SELECT (SELECT sum(c) FROM tc) AS t, (SELECT sum(c) FROM rc) AS r),
    lam AS (
      SELECT s.range AS bucket,
             ln((coalesce(tc.c, 0) + 1)::DOUBLE / (tot.t + 1024))
             - ln((coalesce(rc.c, 0) + 1)::DOUBLE / (tot.r + 1024)) AS lam
      FROM range(1024) s CROSS JOIN tot
      LEFT JOIN tc ON tc.bucket = s.range
      LEFT JOIN rc ON rc.bucket = s.range
    ),
    d AS (SELECT doc_id, bucket, count(*) AS tf FROM e GROUP BY doc_id, bucket)
    SELECT d.doc_id, CAST(sum(d.tf) AS BIGINT) AS n_grams,
           round(sum(d.tf * lam.lam), 6) AS log_weight
    FROM d JOIN lam USING (bucket) GROUP BY d.doc_id
    """,
)
def text_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/text.dsir_log_weights): hashed
    unigram+bigram likelihood ratio of a target model (lang='en' docs)
    over the raw-corpus model — the Data Selection with Importance
    Resampling score (Xie et al., NeurIPS 2023). The oracle refits both
    smoothed models in DuckDB and value-checks every doc's log weight."""
    from dataux_spark.operators.text import dsir_log_weights

    return dsir_log_weights(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        F.col("lang") == "en", dim=1024,
    )


@_q(
    "url_canonical_dedup",
    # plant deterministic URL spellings: uppercase scheme/host, www.,
    # default port, tracking params in scrambled order, trailing slash —
    # docs sharing (doc_id % 50) collapse to one canonical key; both
    # engines replay the identical RE2 rule set
    """
    WITH planted AS (
      SELECT doc_id,
             'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
             '.COM:443/Articles/Item' || CAST(doc_id % 50 AS VARCHAR) ||
             CASE WHEN doc_id % 3 = 0
                  THEN '/?utm_source=news&b=2&a=1&fbclid=x#frag'
                  ELSE '/' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_replace(
               regexp_extract(url, '(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
               '^[Ww][Ww][Ww]\\.', ''), ':(80|443)$', ''))
             || regexp_replace(
                  regexp_extract(url, '(?i)^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                  '/+$', '')
             || CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_canon
      FROM (
        SELECT doc_id, url,
               coalesce(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                 p -> NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid|ref|mc_[ce]id)=')
                      AND p != '')), '&'), '') AS q
        FROM planted)
    )
    SELECT url_canon, min(doc_id) AS keeper_id, count(*) AS n_dups
    FROM canon GROUP BY url_canon
    """,
)
def url_canonical_dedup(spark, sf_dir):
    """Crawl-prep URL hygiene (operators/web.py): canonicalize planted
    URL spellings (scheme/host case, www., :443, tracking params in
    scrambled order, trailing slash, fragment) and dedup on the
    canonical key — one groupBy, keeper = min doc_id. The oracle replays
    the identical RE2 rule set, so any canonicalization drift
    hash-fails. NOTE the oracle lowercases host via an explicit [Ww]
    class for the www-strip because it lowercases AFTER stripping; both
    orders yield the same canonical host."""
    from dataux_spark.operators.web import url_dedup_keepers

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".COM:443/Articles/Item"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("/?utm_source=news&b=2&a=1&fbclid=x#frag"),
            ).otherwise(F.lit("/")),
        ).alias("url"),
    )
    return url_dedup_keepers(d, "url", "doc_id")


@_q(
    "web_domain_rollup",
    # planted hosts exercise the eTLD+1 rule: www.-prefixed co.uk,
    # subdomained .com, bare com.au, bare .com — the first three keep
    # an extra label only when the 2-label suffix is multi-part. The
    # oracle replays host extraction, the suffix rule, and the
    # (no-params-planted) canonical form
    """
    WITH planted AS (
      SELECT doc_id, n_chars,
        CASE doc_id % 4
          WHEN 0 THEN 'https://www.site' || CAST(doc_id % 6 AS VARCHAR)
                      || '.co.uk/p/' || CAST(doc_id % 40 AS VARCHAR)
          WHEN 1 THEN 'https://blog.site' || CAST(doc_id % 6 AS VARCHAR)
                      || '.com/p/' || CAST(doc_id % 40 AS VARCHAR)
          WHEN 2 THEN 'http://site' || CAST(doc_id % 6 AS VARCHAR)
                      || '.com.au/p/' || CAST(doc_id % 40 AS VARCHAR)
          ELSE 'https://site' || CAST(doc_id % 6 AS VARCHAR)
               || '.com/p/' || CAST(doc_id % 40 AS VARCHAR) || '/'
        END AS url
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, n_chars,
        regexp_replace(lower(regexp_extract(url,
          '(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$', '') AS host,
        regexp_replace(lower(regexp_replace(regexp_extract(url,
          '(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':(80|443)$', '')),
          '^www\\.', '')
        || regexp_replace(regexp_extract(url,
             '(?i)^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '')
          AS canon
      FROM planted
    ),
    dom AS (
      SELECT doc_id, n_chars, host, canon,
        CASE
          WHEN len(string_split(host, '.')) <= 2 THEN host
          WHEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
               IN ('co.uk', 'org.uk', 'gov.uk', 'ac.uk', 'co.jp', 'ne.jp',
                   'or.jp', 'com.au', 'net.au', 'org.au', 'com.br', 'com.cn',
                   'com.mx', 'co.in', 'co.za', 'com.ar', 'com.tr', 'co.kr')
            THEN string_split(host, '.')[-3] || '.' ||
                 string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
          ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
        END AS domain
      FROM parsed
    )
    SELECT domain, count(*) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_urls,
           round(avg(n_chars), 6) AS avg_metric
    FROM dom WHERE domain != '' GROUP BY domain
    """,
)
def web_domain_rollup(spark, sf_dir):
    """Per-registered-domain corpus health (operators/web.py
    registered_domain_col + domain_rollup) — the table domain-level
    curation filters against (per-domain caps, low-quality blocklists a
    la C4/RefinedWeb). Planted URL spellings cover the eTLD+1 rule's
    branches (multi-part ccTLD suffixes, subdomains, www, ports,
    trailing slash); extraction is pure JVM split/regexp in the scan
    projection and the rollup is ONE groupBy on the domain key."""
    from dataux_spark.operators.web import domain_rollup

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.concat(
            F.element_at(
                F.array(
                    F.concat(F.lit("https://www.site"), (F.col("doc_id") % 6).cast("string"), F.lit(".co.uk/p/"), (F.col("doc_id") % 40).cast("string")),
                    F.concat(F.lit("https://blog.site"), (F.col("doc_id") % 6).cast("string"), F.lit(".com/p/"), (F.col("doc_id") % 40).cast("string")),
                    F.concat(F.lit("http://site"), (F.col("doc_id") % 6).cast("string"), F.lit(".com.au/p/"), (F.col("doc_id") % 40).cast("string")),
                    F.concat(F.lit("https://site"), (F.col("doc_id") % 6).cast("string"), F.lit(".com/p/"), (F.col("doc_id") % 40).cast("string"), F.lit("/")),
                ),
                (F.col("doc_id") % 4).cast("int") + 1,
            ).alias("url")
        ).alias("url"),
    )
    return domain_rollup(d, "url", "doc_id", metric_col="n_chars")


_PII_PLANT_SPARK = (
    "concat(text, ' contact user', doc_id, '@example.com or +1-555-0199 ip 10.0.0.', "
    "CAST(doc_id % 255 AS STRING), ' ssn 123-45-6789')"
)
_PII_PLANT_DUCK = (
    "text || ' contact user' || doc_id || '@example.com or +1-555-0199 ip 10.0.0.' || "
    "(doc_id % 255) || ' ssn 123-45-6789'"
)
_PII_RXS = [
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[IP]", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("[SSN]", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("[PHONE]", r"\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}([- .][0-9]{3,4})?"),
]


def _pii_oracle() -> str:
    expr = _PII_PLANT_DUCK
    for ph, rx in _PII_RXS:
        rx_sql = rx.replace("\\", "\\\\").replace("'", "''")
        expr = f"regexp_replace({expr}, e'{rx_sql}', '{ph.replace('[', '$$').replace(']', '$$')}', 'g')"
    # DuckDB regexp_replace treats [..] in the REPLACEMENT literally, but
    # escape via placeholder swap above then restore:
    expr = expr.replace("'$$EMAIL$$'", "'[EMAIL]'").replace("'$$IP$$'", "'[IP]'")
    expr = expr.replace("'$$SSN$$'", "'[SSN]'").replace("'$$PHONE$$'", "'[PHONE]'")
    counts = " + ".join(
        f"(length(red) - length(replace(red, '{ph}', ''))) / {len(ph)}"
        for ph, _ in _PII_RXS
    )
    return (
        f"WITH r AS (SELECT doc_id, {expr} AS red FROM documents WHERE doc_id < 200) "
        f"SELECT doc_id, red AS text_redacted, CAST({counts} AS BIGINT) AS n_redactions FROM r"
    )


@_q("text_redact_pii", _pii_oracle())
def text_redact_pii(spark, sf_dir):
    """PII scrub (operators/text.redact_pii): emails/IPs/SSNs/phones →
    typed placeholders, as a chain of JVM regexp_replace in the scan
    projection. Deterministic PII derived from doc_id is planted first so
    the oracle meaningfully exercises every pattern — both engines run the
    identical regex chain (Java regex vs RE2: the patterns avoid
    constructs the two disagree on)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    planted = docs.select("doc_id", F.expr(_PII_PLANT_SPARK).alias("text"))
    from dataux_spark.operators.text import redact_pii

    return redact_pii(planted, "text", "doc_id")


@_q(
    "multimodal_curation_gate",
    # planted metadata from doc arithmetic (width/height/bytes as doc_id
    # mixes); the oracle replays the CASE rules and the stratification
    # rollup exactly
    """
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN NULL
                  ELSE 40 + (doc_id * 7) % 1400 END AS width,
             CASE WHEN doc_id % 17 = 0 THEN NULL
                  ELSE 40 + (doc_id * 11) % 1100 END AS height,
             n_chars * 50 AS n_bytes
      FROM documents
    ), g AS (
      SELECT doc_id, width, height, n_bytes,
        CASE WHEN width IS NULL OR height IS NULL THEN 'unknown'
             WHEN width::DOUBLE / height > 1.05 THEN 'landscape'
             WHEN width::DOUBLE / height < 0.95 THEN 'portrait'
             ELSE 'square' END AS aspect_bucket,
        CASE WHEN width IS NULL OR height IS NULL THEN 'unknown'
             WHEN least(width, height) < 256 THEN 'lt256'
             WHEN least(width, height) < 512 THEN '256'
             WHEN least(width, height) < 1024 THEN '512'
             ELSE '1024' END AS res_tier,
        coalesce(CAST(width IS NOT NULL AND height IS NOT NULL
          AND n_bytes IS NOT NULL AND least(width, height) >= 64
          AND width::DOUBLE / height >= 1.0 / 2.5
          AND width::DOUBLE / height <= 2.5
          AND n_bytes <= 20000000 AS INT), 0) AS keep
      FROM m
    )
    SELECT aspect_bucket, res_tier, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(keep) AS BIGINT) AS n_keep
    FROM g GROUP BY 1, 2
    """,
)
def multimodal_curation_gate(spark, sf_dir):
    """Metadata-stage media curation
    (operators/multimodal.curate_media_metadata) + the stratification
    rollup: the gate an image pipeline runs BEFORE scheduling any decode
    — min-side, aspect-band, and byte-cap rules plus the aspect/
    resolution-tier labels a training mix stratifies on, all as JVM CASE
    arithmetic in the scan projection with one rollup groupBy. Metadata
    is planted from doc arithmetic (every 17th doc has NULL dims to
    exercise the total-labeling contract)."""
    from dataux_spark.operators.multimodal import curate_media_metadata

    d = read_table(spark, sf_dir, "documents")
    meta = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, None)
        .otherwise(40 + (F.col("doc_id") * 7) % 1400).alias("width"),
        F.when(F.col("doc_id") % 17 == 0, None)
        .otherwise(40 + (F.col("doc_id") * 11) % 1100).alias("height"),
        (F.col("n_chars") * 50).alias("n_bytes"),
    )
    return (
        curate_media_metadata(meta)
        .groupBy("aspect_bucket", "res_tier")
        .agg(F.count("*").alias("n"), F.sum("keep").cast("bigint").alias("n_keep"))
    )


@_q(
    "multimodal_features",
    "SELECT doc_id, 'image/fake' AS mime, "
    "CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes, md5(text) AS digest "
    "FROM documents",
)
def multimodal_features(spark, sf_dir):
    """Binary-column decode plumbing: payload+metadata struct →
    Arrow-batched mapInPandas feature extraction (operators/multimodal.py).
    The oracle checks the SQL-expressible outputs (byte count, digest);
    the stubbed decoder's feature vector is covered by tests."""
    from dataux_spark.operators.multimodal import attach_binary_payload, extract_features

    docs = read_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs, "text", "doc_id"))
    return feats.select("doc_id", "mime", "n_bytes", "digest")


@_q(
    "multimodal_phash_neardup",
    # Full value oracle for the pHash near-dup pipeline at hamming 0
    # (VERDICT r9 item 5, upgraded from the suggested rows-only check):
    # under the default md5-grid stand-in decoder, byte-identical
    # payloads produce identical 64-bit pHashes (distance 0) while
    # differing payloads land ~32 bits apart (md5 avalanche; P(<=3) ~
    # 2^-50 per pair, and the corpus is deterministic — verified zero
    # organic pairs at sf0.01), so the complete expected output is
    # exactly the planted identical-payload pairs. The nonzero-hamming
    # path of the SAME join is pinned bit-identical to brute force in
    # tests (test_keygrowth.py; test_text_multimodal.py drives it with a
    # locality-preserving decoder so real near-pairs exercise it).
    """
    WITH v AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 25
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
    FROM v a JOIN v b ON a.text = b.text AND a.doc_id < b.doc_id
    """,
)
def multimodal_phash_neardup(spark, sf_dir):
    """Multimodal near-dup pairs: perceptual hash over binary payloads →
    the WWW'07 combination-blocked hamming join (operators/multimodal.
    phash_neardup_pairs — the r9 hamming fix's multimodal half, now
    driver-gated). Payloads are the documents fixture wrapped as fake
    image bytes (attach_binary_payload); 25 planted byte-identical
    copies keep the gate non-vacuous (doc_id + 100000, replayed by the
    oracle's UNION — same planted-payload pattern as embedding_neardup)
    since the corpus has no organic exact-payload duplicates."""
    from dataux_spark.operators.multimodal import (
        attach_binary_payload,
        phash_neardup_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    assert docs.count() < 100_000, (
        "documents outgrew the planted-id offset: raise 100000 in BOTH "
        "this entry and its oracle SQL"
    )
    planted = docs.filter(F.col("doc_id") < 25).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100_000)
    )
    both = docs.unionByName(planted)
    return phash_neardup_pairs(
        attach_binary_payload(both, "text", "doc_id"), "doc_id", max_hamming=3
    )


def _lang_profile_values() -> str:
    from dataux_spark.operators.text import lang_trigrams

    return ", ".join(f"('{l}', '{t}')" for l, t in lang_trigrams())


@_q(
    "text_langid_ngram",
    f"""
    WITH prof(lang, tri) AS (VALUES {_lang_profile_values()}),
    t AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(length(p) - 2, 1)),
               i -> substr(p, i, 3))) AS tri
      FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p
            FROM documents WHERE doc_id <= 400)
    ),
    c AS (
      SELECT doc_id, lang, count(*) AS matches
      FROM t JOIN prof USING (tri) GROUP BY doc_id, lang
    ),
    r AS (
      SELECT doc_id, lang, matches, row_number() OVER (
        PARTITION BY doc_id ORDER BY matches DESC, lang DESC) AS rn
      FROM c
    )
    SELECT doc_id, lang, matches FROM r WHERE rn = 1
    """,
)
def text_langid_ngram(spark, sf_dir):
    """Char-n-gram language ID (operators/text.langid_ngram): trigram
    explode → broadcast profile join → per-doc argmax. The oracle shares
    the SAME generated trigram profile literal."""
    from dataux_spark.operators.text import langid_ngram

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 400)
    out = langid_ngram(docs, "text", "doc_id")
    return out.select(F.col("_id").alias("doc_id"), "lang", "matches")


@_q(
    "multimodal_frame_sample",
    "SELECT d.doc_id, CAST(t.i AS INTEGER) AS frame_idx, "
    "CAST((t.i * octet_length(d.text::BLOB)) // 4 AS BIGINT) AS ts_ms "
    "FROM documents d, (SELECT unnest(generate_series(0, 3)) AS i) t "
    "WHERE d.doc_id <= 500",
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: one payload row → n evenly spaced frame
    rows via Arrow-batched mapInPandas (operators/multimodal.frame_sample).
    The oracle checks the SQL-expressible outputs (row fan-out, timestamp
    spacing from the byte-length duration fallback); the stubbed frame
    bytes are covered by tests."""
    from dataux_spark.operators.multimodal import attach_binary_payload, frame_sample

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 500)
    frames = frame_sample(attach_binary_payload(docs, "text", "doc_id"), n_frames=4)
    return frames.select("doc_id", "frame_idx", "ts_ms")


# --- subqueries / CTE / cross-source / lateral / array ops ----------------

@_q(
    "cross_source_join",
    "SELECT n.n_name, count(*) AS ct FROM supplier s "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def cross_source_join(spark, sf_dir):
    """Cross-source join — the reference's flagship federation feature
    (backends/tests/multi_backend_test.go:168-200): one side comes from a
    different registered backend (a MemorySource, as a Mongo/ES source
    would be), joined against the parquet source THROUGH the source
    registry — lazy on both sides, no driver-side collect. Catalyst
    broadcasts the dim side; same plan as a single-source join."""
    from dataux_spark.sources.memory import MemorySource

    other = MemorySource("other_backend")
    other.add("xsrc_nation", read_table(spark, sf_dir, "nation"))
    sup = read_table(spark, sf_dir, "supplier")
    nation = other.load(spark, "xsrc_nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("ct"))
    )


def _materialize_docs(sf_dir: str, table: str) -> str:
    """Materialize a (small) tpch table as a JSON doc collection under
    /tmp, keyed by sf_dir — the backing fixture that lets driver-gate
    entries read tpch data THROUGH a registered pushdown source. Same
    rows as the parquet, so the DuckDB oracle runs on the parquet view
    and any row the pushdown negotiation drops/duplicates hash-fails."""
    import json as _json
    import os
    import tempfile

    slug = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    path = f"{tempfile.gettempdir()}/dataux_docs_{slug}_{table}.json"
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{sf_dir}/{table}.parquet").to_pylist()
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            _json.dump(docs, fh, default=str)
        os.replace(tmp, path)
    return f"file://{path}"


@_q(
    "pushdown_mongo_filter_topk",
    # the doc-roundtrip source infers int64 (JSON has one integer type);
    # the oracle reads the int32 parquet twin — cast so the typed hash agrees
    "SELECT n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation "
    "WHERE n_regionkey >= 2 ORDER BY n_name LIMIT 10",
)
def pushdown_mongo_filter_topk(spark, sf_dir):
    """tpch nation read THROUGH a registered mongo-style FILTERS_LIMIT
    source: the range predicate pushes into the doc scan and the ORDER
    BY+LIMIT goes through the top-k negotiation (engine._try_topk_pushdown
    → Find().Sort().Limit() analog). The oracle reads the parquet twin —
    the driver gate fails if the negotiation drops, duplicates, or
    mis-orders rows (VERDICT r4 item 5: the driver, not just pytest, now
    covers the pushdown machinery)."""
    from dataux_spark.engine import Engine
    from dataux_spark.sources.mongo_style import MongoStyleSource

    e = Engine(spark)
    e.register_source(
        MongoStyleSource("mgotpch", {"mgo_nation": _materialize_docs(sf_dir, "nation")})
    )
    return e.sql(
        "SELECT n_name, n_regionkey FROM mgo_nation "
        "WHERE n_regionkey >= 2 ORDER BY n_name LIMIT 10"
    )


@_q(
    "pushdown_es_group_agg",
    "SELECT CAST(s_nationkey AS BIGINT) AS nk, count(*) AS ct, "
    "min(s_acctbal) AS min_bal, "
    "max(s_acctbal) AS max_bal FROM supplier GROUP BY s_nationkey",
)
def pushdown_es_group_agg(spark, sf_dir):
    """tpch supplier aggregated THROUGH a registered ES-style
    FILTERS_LIMIT_AGGS source: the whole grouped aggregate is offered to
    the source (engine._try_agg_pushdown → nested terms buckets analog,
    sqltoes.go:285-365) and executed source-side; count/min/max only, so
    the pushed Python arithmetic is exact against the DuckDB oracle."""
    from dataux_spark.engine import Engine
    from dataux_spark.sources.es_style import EsStyleRestSource

    e = Engine(spark)
    e.register_source(
        EsStyleRestSource("estpch", {"es_supplier": _materialize_docs(sf_dir, "supplier")})
    )
    return e.sql(
        "SELECT s_nationkey AS nk, count(*) AS ct, min(s_acctbal) AS min_bal, "
        "max(s_acctbal) AS max_bal FROM es_supplier GROUP BY s_nationkey"
    )


@_q(
    "pushdown_cass_key_topk",
    "SELECT s_name, s_suppkey FROM supplier "
    "WHERE s_nationkey = 5 AND s_suppkey >= 10 ORDER BY s_suppkey LIMIT 5",
)
def pushdown_cass_key_topk(spark, sf_dir):
    """tpch supplier read THROUGH a registered cassandra-style KEY_FILTERS
    source (partition key s_nationkey, clustering key s_suppkey): the key
    equality + numeric clustering range are CQL-servable and the ORDER BY
    on the clustering key pushes the whole top-k (sql_to_cql.go:570-600)."""
    from dataux_spark.engine import Engine
    from dataux_spark.infer import TableMeta
    from dataux_spark.sources.cassandra_style import CassandraStyleSource

    meta = TableMeta(name="cass_supplier", schema=None,
                     partition_keys=["s_nationkey"], clustering_keys=["s_suppkey"])
    e = Engine(spark)
    e.register_source(
        CassandraStyleSource(
            "casstpch", {"cass_supplier": (_materialize_docs(sf_dir, "supplier"), meta)}
        )
    )
    return e.sql(
        "SELECT s_name, s_suppkey FROM cass_supplier "
        "WHERE s_nationkey = 5 AND s_suppkey >= 10 ORDER BY s_suppkey LIMIT 5"
    )


@_q(
    "pushdown_datastore_ineq_topk",
    "SELECT c_name, c_acctbal FROM customer "
    "WHERE c_nationkey = 3 AND c_acctbal > 1000 ORDER BY c_acctbal LIMIT 10",
)
def pushdown_datastore_ineq_topk(spark, sf_dir):
    """tpch customer read THROUGH a registered datastore-style source: one
    equality + ONE inequality property (the native planner's
    single-inequality rule — a second range property would decline into
    the residual), with the ORDER BY leading on the inequality property
    per the datastore inequality-ordering composition rule
    (sql_to_datastore.go:70-125)."""
    from dataux_spark.engine import Engine
    from dataux_spark.sources.datastore_style import DatastoreStyleSource

    e = Engine(spark)
    e.register_source(
        DatastoreStyleSource(
            "dstpch", {"ds_customer": _materialize_docs(sf_dir, "customer")}
        )
    )
    return e.sql(
        "SELECT c_name, c_acctbal FROM ds_customer "
        "WHERE c_nationkey = 3 AND c_acctbal > 1000 ORDER BY c_acctbal LIMIT 10"
    )


@_q(
    "pushdown_lytics_filter",
    "SELECT n_name, CAST(n_nationkey AS BIGINT) AS n_nationkey FROM nation "
    "WHERE n_regionkey = 2 AND n_nationkey >= 8",
)
def pushdown_lytics_filter(spark, sf_dir):
    """tpch nation read THROUGH a registered lytics-style source: the
    pushed conjunction renders as a SegmentQL FilterStatement
    (generator.go:62-111) server-side; the oracle's parquet twin fails
    the gate if the generated filter drops or duplicates entities."""
    from dataux_spark.engine import Engine
    from dataux_spark.sources.lytics_style import LyticsStyleSource

    e = Engine(spark)
    e.register_source(
        LyticsStyleSource("lytpch", {"ly_nation": _materialize_docs(sf_dir, "nation")})
    )
    return e.sql(
        "SELECT n_name, n_nationkey FROM ly_nation "
        "WHERE n_regionkey = 2 AND n_nationkey >= 8"
    )


@_q(
    "grouped_terms_topk",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS ct
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus ORDER BY ct DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS term_key, ct AS term_count
    FROM r WHERE rn <= 2
    """,
)
def grouped_terms_topk(spark, sf_dir):
    """terms() as a per-group aggregate through Engine.sql (the ES nested
    terms-sub-agg surface the reference ships disabled,
    es_test.go:230-245): per order status, the top-2 priorities with
    counts. The packed struct array is exploded to scalar columns so the
    driver can value-hash it against the windowed-count oracle."""
    from dataux_spark.engine import Engine

    e = Engine(spark)
    e.register_parquet_dir("gterms_tpch", sf_dir)
    df = e.sql(
        "SELECT o_orderstatus, terms(o_orderpriority, 2) AS prio "
        "FROM orders GROUP BY o_orderstatus"
    )
    return df.select(
        "o_orderstatus", F.explode("prio").alias("t")
    ).select(
        "o_orderstatus",
        F.col("t.key").alias("term_key"),
        F.col("t.count").alias("term_count"),
    )


@_q(
    "pushdown_bq_full_query",
    "SELECT r_regionkey, count(*) AS ct, min(n_name) AS first_nation "
    "FROM nation JOIN region ON n_regionkey = r_regionkey "
    "GROUP BY r_regionkey",
)
def pushdown_bq_full_query(spark, sf_dir):
    """tpch read THROUGH a registered FULL-tier source (the BigQuery
    whole-query pushdown shape, sql_to_bq.go:99-104): every referenced
    table belongs to the source, so the engine ships the entire statement
    — join, group, aggregates — to the remote engine and gets back
    result-sized rows. Completes driver-gate coverage of all SIX tiers
    (scan-only / filters / filters+limit / key-filters / +aggs / FULL)."""
    from dataux_spark.engine import Engine

    e = Engine(spark)
    e.register_passthrough(
        "bqtpch",
        {
            "bq_nation": f"{sf_dir}/nation.parquet",
            "bq_region": f"{sf_dir}/region.parquet",
        },
    )
    return e.sql(
        "SELECT r_regionkey, count(*) AS ct, min(n_name) AS first_nation "
        "FROM bq_nation JOIN bq_region ON n_regionkey = r_regionkey "
        "GROUP BY r_regionkey"
    )


@_q(
    "correlated_subquery",
    "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders o "
    "WHERE o_totalprice > 3 * (SELECT avg(o2.o_totalprice) FROM orders o2 "
    "WHERE o2.o_custkey = o.o_custkey)",
)
def correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates this into an
    aggregate + join (the reference has no subquery support at all;
    SURVEY §4 'subquery decorrelation: absent')."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q_corr_orders")
    return spark.sql(
        "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM q_corr_orders o "
        "WHERE o_totalprice > 3 * (SELECT avg(o2.o_totalprice) FROM q_corr_orders o2 "
        "WHERE o2.o_custkey = o.o_custkey)"
    )


@_q(
    "cte_scalar_subquery",
    "WITH seg AS (SELECT c_mktsegment, round(avg(c_acctbal), 4) AS seg_avg "
    "FROM customer GROUP BY c_mktsegment) "
    "SELECT c_mktsegment, seg_avg, "
    "round(seg_avg - (SELECT round(avg(c_acctbal), 4) FROM customer), 4) AS delta "
    "FROM seg",
)
def cte_scalar_subquery(spark, sf_dir):
    """CTE + uncorrelated scalar subquery."""
    c = read_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("q_cte_customer")
    return spark.sql(
        "WITH seg AS (SELECT c_mktsegment, round(avg(c_acctbal), 4) AS seg_avg "
        "FROM q_cte_customer GROUP BY c_mktsegment) "
        "SELECT c_mktsegment, seg_avg, "
        "round(seg_avg - (SELECT round(avg(c_acctbal), 4) FROM q_cte_customer), 4) AS delta "
        "FROM seg"
    )


@_q(
    "explode_top_tokens",
    "SELECT tok, count(*) AS ct FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), "
    "'\\s+')) AS tok FROM documents) GROUP BY tok ORDER BY ct DESC, tok LIMIT 10",
)
def explode_top_tokens(spark, sf_dir):
    """Table function / lateral view: explode tokens → global top-10 terms
    (UDTF surface, SURVEY §2.9 — explode is Spark's generator; DuckDB twin
    is unnest)."""
    from dataux_spark.operators.dedup import tokens

    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("ct"))
        .orderBy(F.col("ct").desc(), F.col("tok"))
        .limit(10)
    )


@_q(
    "array_functions",
    "SELECT vec_id, round(list_max(embedding::DOUBLE[]), 6) AS mx, "
    "round(list_min(embedding::DOUBLE[]), 6) AS mn, "
    "round(list_sum(embedding::DOUBLE[]), 6) AS sm, len(embedding)::INT AS n "
    "FROM embeddings WHERE vec_id < 20",
)
def array_functions(spark, sf_dir):
    """Array/map expression surface over the embedding column (qlbridge
    Slice/Map value types, SURVEY §1.2) — higher-order aggregate stays
    JVM-side."""
    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    dvec = F.expr("transform(embedding, x -> cast(x as double))")
    return emb.select(
        "vec_id",
        F.round(F.array_max(dvec), 6).alias("mx"),
        F.round(F.array_min(dvec), 6).alias("mn"),
        F.round(F.expr(
            "aggregate(transform(embedding, x -> cast(x as double)), cast(0 as double), (a, x) -> a + x)"
        ), 6).alias("sm"),
        F.size("embedding").cast("int").alias("n"),
    )


# --- time-series: as-of join / range join / sessionization ----------------

@_q(
    "asof_join_events",
    "SELECT l.event_id, l.user_id, l.ts, r.value AS asof_value, r.ts AS asof_ts "
    "FROM (SELECT * FROM events WHERE event_type = 'click') l "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r "
    "ON l.user_id = r.user_id AND l.ts >= r.ts",
)
def asof_join_events(spark, sf_dir):
    """As-of join: each click gets the most recent prior error of the same
    user (operators/timeseries.py — union+window, one shuffle; DuckDB's
    native ASOF JOIN is the oracle)."""
    from dataux_spark.operators.timeseries import asof_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    return asof_join(clicks, errors, on="user_id", ts="ts", right_cols=["value"], prefix="asof_")


@_q(
    "range_join_price_bands",
    "SELECT b.band, count(*) AS ct, round(avg(p.p_retailprice), 4) AS avg_price "
    "FROM part p JOIN (VALUES ('b900', 900.0, 925.0), ('b925', 925.0, 950.0), "
    "('b950', 950.0, 975.0), ('b975', 975.0, 1000.0)) AS b(band, lo, hi) "
    "ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi "
    "GROUP BY b.band",
)
def range_join_price_bands(spark, sf_dir):
    """Range join via bucketized equi-join (operators/timeseries.py) —
    avoids the O(n·m) theta join a naive BETWEEN join would plan."""
    from dataux_spark.operators.timeseries import range_join

    part = read_table(spark, sf_dir, "part")
    # VALUES via spark.sql stays a JVM LocalRelation — createDataFrame on
    # Python rows plans as a Python-backed ExistingRDD scan (slow first
    # touch, no stats).
    bands = spark.sql(
        "SELECT * FROM VALUES ('b900', 900.0D, 925.0D), ('b925', 925.0D, 950.0D), "
        "('b950', 950.0D, 975.0D), ('b975', 975.0D, 1000.0D) AS b(band, lo, hi)"
    )
    joined = range_join(part, bands, "p_retailprice", "lo", "hi", bucket_width=25.0)
    return joined.groupBy("band").agg(
        F.count("*").alias("ct"), F.round(F.avg("p_retailprice"), 4).alias("avg_price")
    )


@_q(
    "sessionize_stats",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, count(*) AS n_events,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
           round(avg(dur_us / 1000000.0), 4) AS avg_session_sec
    FROM per_session GROUP BY user_id
    """,
)
def sessionize_stats(spark, sf_dir):
    """Sessionization (30-min gap) + per-user session stats
    (operators/timeseries.py — lag/flag/cumsum, one shuffle)."""
    from dataux_spark.operators.timeseries import session_stats

    return session_stats(read_table(spark, sf_dir, "events"), "user_id", "ts", 30.0)


@_q(
    "events_gap_fill_hourly",
    """
    WITH span AS (SELECT date_trunc('hour', min(ts)) AS lo,
                         date_trunc('hour', max(ts)) AS hi FROM events),
    hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM span),
    groups AS (SELECT DISTINCT event_type FROM events),
    sparse AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                      count(*) AS ct, round(sum(value), 2) AS total
               FROM events GROUP BY 1, 2)
    SELECT h.hour, g.event_type, CAST(coalesce(s.ct, 0) AS BIGINT) AS ct,
           coalesce(s.total, 0.0) AS total
    FROM hours h CROSS JOIN groups g
    LEFT JOIN sparse s ON s.hour = h.hour AND s.event_type = g.event_type
    """,
)
def events_gap_fill_hourly(spark, sf_dir):
    """Dense hourly per-type series with zero-filled gaps
    (operators/timeseries.gap_fill_hourly — the time_bucket_gapfill shape):
    spine = global hour sequence x distinct types, sparse hourly agg
    left-joined on, absent buckets become (0, 0.0)."""
    from dataux_spark.operators.timeseries import gap_fill_hourly

    return gap_fill_hourly(read_table(spark, sf_dir, "events"))


@_q(
    "session_paths_top",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), seqs AS (
      SELECT list(event_type ORDER BY ts, event_id) AS types
      FROM sess GROUP BY user_id, sid
      HAVING count(*) >= 2
    ), grams AS (
      SELECT unnest(list_transform(
               generate_series(1, len(types) - 1),
               i -> array_to_string(types[i:i+1], '>'))) AS path
      FROM seqs
    ), counted AS (
      SELECT path, count(*) AS ct FROM grams GROUP BY path
    )
    SELECT path, ct,
           CAST(row_number() OVER (ORDER BY ct DESC, path) AS INT) AS rank
    FROM counted ORDER BY ct DESC, path LIMIT 20
    """,
)
def session_paths_top(spark, sf_dir):
    """Top session navigation paths (operators/timeseries.session_paths):
    30-min-gap sessions, totally-ordered type sequences, sliding 2-gram
    counts, top-20. The oracle replays sessionization, ordering, and the
    n-gram expansion."""
    from dataux_spark.operators.timeseries import session_paths

    return session_paths(read_table(spark, sf_dir, "events"), n=2, k=20)


@_q(
    "cohort_retention_daily",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS age_days,
           count(*) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention_daily(spark, sf_dir):
    """Daily cohort-retention triangle (operators/timeseries.
    cohort_retention): cohort = first-activity day, counts of users
    active again at each age. Two keyed shuffles, small output."""
    from dataux_spark.operators.timeseries import cohort_retention

    return cohort_retention(read_table(spark, sf_dir, "events"))


@_q(
    "funnel_view_click_purchase",
    # the same iterative reach-time definition in SQL: step-i reach = the
    # earliest step-i event after the step-(i-1) reach, within 24h of the
    # first step-0 event
    """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, s0.t0, min(e.ts) AS t1
      FROM events e JOIN s0 ON s0.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s0.t0
        AND e.ts <= s0.t0 + INTERVAL 24 HOURS
      GROUP BY e.user_id, s0.t0
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        AND e.ts <= s1.t0 + INTERVAL 24 HOURS
      GROUP BY e.user_id
    )
    SELECT 0 AS step, 'view' AS step_name,
           (SELECT count(*) FROM s0) AS n_users
    UNION ALL
    SELECT 1, 'click', (SELECT count(*) FROM s1)
    UNION ALL
    SELECT 2, 'purchase', (SELECT count(*) FROM s2)
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase within 24h
    (operators/timeseries.funnel_counts): reach time per step is the
    earliest qualifying event after the previous step's reach, bounded
    by the first step's time — the standard product-analytics funnel,
    as len(steps) keyed aggregates + joins, nothing pairwise."""
    from dataux_spark.operators.timeseries import funnel_counts

    return funnel_counts(
        read_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@_q(
    "sequence_match_vcp",
    # the oracle is the greedy chain spelled as lateral joins: stage i+1
    # = the FIRST event of its type strictly after the bound stage-i
    # event in (ts, event_id) order — the identical row-value
    # comparison the window fold uses — with the anchor kept only when
    # the chain completes inside the window
    """
    SELECT a.user_id AS user, a.ts AS start_ts, c.cts AS end_ts,
           round(date_diff('microsecond', a.ts, c.cts) / 1000000.0, 6)
             AS duration_sec
    FROM events a
    LEFT JOIN LATERAL (
      SELECT b.ts AS bts, b.event_id AS bid FROM events b
      WHERE b.user_id = a.user_id AND b.event_type = 'click'
        AND (b.ts, b.event_id) > (a.ts, a.event_id)
      ORDER BY b.ts, b.event_id LIMIT 1
    ) b ON TRUE
    LEFT JOIN LATERAL (
      SELECT c2.ts AS cts FROM events c2
      WHERE c2.user_id = a.user_id AND c2.event_type = 'purchase'
        AND (c2.ts, c2.event_id) > (b.bts, b.bid)
      ORDER BY c2.ts, c2.event_id LIMIT 1
    ) c ON TRUE
    WHERE a.event_type = 'view' AND c.cts IS NOT NULL
      AND date_diff('microsecond', a.ts, c.cts) <= 86400000000
    """,
)
def sequence_match_vcp(spark, sf_dir):
    """MATCH_RECOGNIZE-lite sequence detection
    (operators/timeseries.match_sequence): every view anchor whose
    greedy first-next click then first-next purchase chain completes
    within 24h, with per-match duration. ONE user-keyed shuffle + one
    sort; each pattern stage is a min-of-struct over the FOLLOWING
    frame, so there is no self-join and no Python state machine — the
    lateral-join oracle replays the same greedy binding rule."""
    from dataux_spark.operators.timeseries import match_sequence

    return match_sequence(
        read_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        within_hours=24.0,
    )


@_q(
    "streaming_windowed_agg",
    "SELECT date_trunc('hour', ts) AS win_start, "
    "date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end, "
    "event_type, count(*) AS ct, round(sum(value), 2) AS total "
    "FROM events GROUP BY 1, 2, 3",
)
def streaming_windowed_agg(spark, sf_dir):
    """Structured Streaming windowed aggregation driven to completion
    (streaming/ops.py): readStream(events) → watermark → 1h windows →
    memory sink. The oracle is the equivalent batch SQL — the streaming
    result must equal the batch answer (complete mode)."""
    from dataux_spark import streaming as S

    out = S.run_to_memory(
        S.windowed_agg(S.stream_events(spark, sf_dir), "1 hour"),
        "q_stream_win",
        "complete",
    )
    return out


@_q(
    "streaming_sequence_match",
    # identical oracle to sequence_match_vcp: the greedy first-next
    # chain as lateral joins. The STREAMING matcher must reproduce the
    # batch window fold exactly when the bounded event set is replayed
    # through it — that replay-equivalence contract is what this entry
    # gates driver-side.
    """
    SELECT a.user_id AS user, a.ts AS start_ts, c.cts AS end_ts,
           round(date_diff('microsecond', a.ts, c.cts) / 1000000.0, 6)
             AS duration_sec
    FROM events a
    LEFT JOIN LATERAL (
      SELECT b.ts AS bts, b.event_id AS bid FROM events b
      WHERE b.user_id = a.user_id AND b.event_type = 'click'
        AND (b.ts, b.event_id) > (a.ts, a.event_id)
      ORDER BY b.ts, b.event_id LIMIT 1
    ) b ON TRUE
    LEFT JOIN LATERAL (
      SELECT c2.ts AS cts FROM events c2
      WHERE c2.user_id = a.user_id AND c2.event_type = 'purchase'
        AND (c2.ts, c2.event_id) > (b.bts, b.bid)
      ORDER BY c2.ts, c2.event_id LIMIT 1
    ) c ON TRUE
    WHERE a.event_type = 'view' AND c.cts IS NOT NULL
      AND date_diff('microsecond', a.ts, c.cts) <= 86400000000
    """,
)
def streaming_sequence_match(spark, sf_dir):
    """ONLINE sequence detection (streaming/ops.streaming_match_sequence):
    the event stream replayed through the applyInPandasWithState matcher —
    per-user open-chain state, first-next greedy binding, deadline-expired
    chains dropped so state is bounded by anchors inside one window, not
    stream length. The oracle is the batch lateral-join spelling; matching
    it end-to-end pins the streaming/batch equivalence contract the
    operator documents."""
    from dataux_spark import streaming as S

    return S.run_to_memory(
        S.streaming_match_sequence(
            S.stream_events(spark, sf_dir),
            ["view", "click", "purchase"],
            within_hours=24.0,
        ),
        "q_stream_seq",
        output_mode="append",
    )


@_q(
    "streaming_dedup",
    "SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events",
)
def streaming_dedup_count(spark, sf_dir):
    """Streaming exact dedup (streaming/ops.streaming_dedup): the event
    stream unioned with itself (every row duplicated) → watermarked
    dropDuplicates → memory sink; surviving-row count must equal the batch
    DISTINCT count. State is bounded by the watermark horizon — the
    ingest-time half of the corpus-dedup pipeline."""
    from dataux_spark import streaming as S

    doubled = S.stream_events(spark, sf_dir).union(S.stream_events(spark, sf_dir))
    out = S.run_to_memory(
        S.streaming_dedup(doubled, ["event_id"]), "q_stream_dedup", "append"
    )
    return out.agg(F.count("*").cast("bigint").alias("n_distinct"))


@_q(
    "streaming_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
           user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total
    FROM sess GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark, sf_dir):
    """Structured Streaming data-driven session windows (30-min gap) to
    completion in complete mode (streaming/ops.session_window_agg). The
    oracle is batch gap-sessionization: Spark's session_window spans
    first event → last event + gap, which the lag/cumsum SQL reproduces."""
    from dataux_spark import streaming as S

    return S.run_to_memory(
        S.session_window_agg(S.stream_events(spark, sf_dir), gap="30 minutes"),
        "q_stream_sess",
        "complete",
    )


@_q(
    "streaming_join",
    """
    SELECT l.user_id, l.event_id AS left_id, l.ts AS left_ts,
           r.event_id AS right_id, r.ts AS right_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'error'
     AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    WHERE l.ts < (SELECT max(ts) FROM events) - INTERVAL 3 HOUR
    """,
)
def streaming_join(spark, sf_dir):
    """Stream-stream join (clicks × errors, 1h lookback) in append mode.
    Append emission near the end of the stream depends on the final
    watermark, so BOTH sides restrict to the provably-stable region
    (left ts older than max ts - watermark - lookback): inside it the
    streaming output is exactly the batch join, which the oracle computes
    with the same cutoff."""
    from dataux_spark import streaming as S

    ev = S.stream_events(spark, sf_dir)
    out = S.run_to_memory(
        S.stream_stream_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "error"),
            lookback="1 hour",
        ),
        "q_stream_join",
    )
    batch = read_table(spark, sf_dir, "events")
    horizon = F.lit(batch.agg(F.max("ts")).first()[0]) - F.expr("INTERVAL 3 HOUR")
    return out.filter(F.col("left_ts") < horizon)


# --- pivot / percentiles / dedup-keep-best --------------------------------

@_q(
    "pivot_status_priority",
    "SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_orderstatus = 'F') AS F, "
    "count(*) FILTER (WHERE o_orderstatus = 'O') AS O, "
    "count(*) FILTER (WHERE o_orderstatus = 'P') AS P "
    "FROM orders GROUP BY o_orderpriority",
)
def pivot_status_priority(spark, sf_dir):
    """Pivot (wide conditional aggregation) — extension; reference has no
    pivot. Explicit value list keeps the plan a single pass."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@_q(
    "percentiles",
    "SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, "
    "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90, "
    "round(quantile_cont(l_extendedprice, 0.99), 4) AS p99 FROM lineitem",
)
def percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). The approximate path for 100 TB is percentile_approx —
    same API shape, sketch-mergeable."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@_q(
    "dedup_keep_best",
    """
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')) AS fp
      FROM documents
    ), ranked AS (
      SELECT doc_id, fp,
             row_number() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn
      FROM fp
    )
    SELECT fp, doc_id AS keep_id FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark, sf_dir):
    """Dedup with survivor selection: keep the highest-quality (here:
    longest) doc per fingerprint group — the production dedup pattern
    (don't keep an arbitrary member, keep the best)."""
    from dataux_spark.operators.dedup import tokens

    docs = read_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text"))))))
    w = W.partitionBy("fp").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select(F.col("doc_id"), F.col("n_chars"), fp.alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("fp", F.col("doc_id").alias("keep_id"))
    )


@_q(
    "link_entities_blocked",
    # the oracle replays the whole linkage pass: the planted dirty
    # registry, nation-blocked candidate pairs, levenshtein over the
    # identical normalization, threshold, best-per-left with the
    # (distance, right_id) tie-break
    """
    WITH dirty AS (
      SELECT c_custkey AS rec_id, c_nationkey,
        CASE CAST(c_custkey % 3 AS INTEGER)
          WHEN 0 THEN substr(c_name, 1, 9) || substr(c_name, 11)
          WHEN 1 THEN upper(c_name)
          ELSE c_name || 'x'
        END AS c_name
      FROM customer
    ), pairs AS (
      SELECT l.c_custkey, d.rec_id,
             l.c_name AS c_name_left, d.c_name AS c_name_right,
             CAST(levenshtein(
               regexp_replace(trim(lower(l.c_name)), '\\s+', ' ', 'g'),
               regexp_replace(trim(lower(d.c_name)), '\\s+', ' ', 'g')
             ) AS INTEGER) AS distance
      FROM customer l JOIN dirty d ON l.c_nationkey = d.c_nationkey
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY c_custkey ORDER BY distance, rec_id) AS rk
      FROM pairs WHERE distance <= 1
    )
    SELECT c_custkey, rec_id, c_name_left, c_name_right, distance
    FROM ranked WHERE rk = 1
    """,
)
def link_entities_blocked(spark, sf_dir):
    """Record linkage (operators/linkage.blocked_entity_match): match
    clean customers against a planted dirty registry (dropped character /
    case noise / appended character, keyed by custkey % 3) blocking on
    c_nationkey PLUS symmetric-delete name keys (symdelete=True):
    nation alone has fixed cardinality, so its blocks grow linearly with
    the data and the candidate stage quadratically — the r8 scale probe
    measured 17x wall at 10x data before the delete-key blocking (1.3x
    after; operators/linkage.py module docstring). The match set is
    provably unchanged (delete-neighborhood intersection is a superset
    of the edit-distance-1 pairs and the exact levenshtein filter was
    always there), so the oracle still replays plain nation blocking.
    Candidates come only from equi-joins (never a cartesian stage),
    scoring is the JVM levenshtein expression with its early-exit
    threshold form inside the join projection, and best-per-left is one
    window with a total (distance, rec_id) tie-break — so the match set
    is exactly reproducible, including the planted cross-entity
    ambiguities the tie-break settles."""
    from dataux_spark.operators.linkage import blocked_entity_match

    cust = read_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("rec_id"),
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.substring("c_name", 1, 9), F.expr("substr(c_name, 11)")),
        )
        .when(F.col("c_custkey") % 3 == 1, F.upper("c_name"))
        .otherwise(F.concat(F.col("c_name"), F.lit("x")))
        .alias("c_name"),
    )
    return blocked_entity_match(
        cust,
        dirty,
        block_on=["c_nationkey"],
        fuzzy_col="c_name",
        left_id="c_custkey",
        right_id="rec_id",
        max_distance=1,
        symdelete=True,
    ).select(
        "c_custkey",
        "rec_id",
        "c_name_left",
        "c_name_right",
        F.col("distance").cast("int").alias("distance"),
    )


@_q(
    "corpus_clean_pipeline",
    """
    WITH stats AS (
      SELECT doc_id, n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             md5(array_to_string(list_sort(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\\s+'))), ' ')) AS fp
      FROM documents
    ), kept AS (
      SELECT doc_id, fp,
             row_number() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn
      FROM stats WHERE n_tokens >= 30
    )
    SELECT count(*) AS n_kept,
           (SELECT count(*) FROM documents) AS n_total,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp
    FROM kept WHERE rn = 1
    """,
)
def corpus_clean_pipeline(spark, sf_dir):
    """The composed corpus-cleaning flow (quality gate → fingerprint dedup
    with survivor selection → summary): the canonical LLM-training-data
    pipeline, end to end in one plan. At 100 TB each stage is the same
    shape — scan-projection filters, one digest shuffle, one window."""
    from dataux_spark.operators.dedup import tokens

    docs = read_table(spark, sf_dir, "documents")
    total = docs.count()
    stats = docs.select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
        ).alias("fp"),
    ).filter(F.col("n_tokens") >= 30)
    w = W.partitionBy("fp").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    kept = stats.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.agg(
        F.count("*").alias("n_kept"),
        # lit() of a Python int infers IntegerType; count semantics are
        # bigint (and the oracle's count(*) is) — cast so the typed hash agrees
        F.lit(total).cast("bigint").alias("n_total"),
        F.countDistinct("fp").cast("bigint").alias("n_unique_fp"),
    )


@_q(
    "streaming_rollup_merge",
    # the streamed store must be LOSSLESS vs aggregating raw end-to-end,
    # same contract (and same oracle) as the batch rollup entry
    "SELECT date_trunc('hour', ts) AS bucket, event_type AS \"key\", "
    "count(*) AS n_events, round(sum(value), 2) AS value_sum, "
    "min(value) AS value_min, max(value) AS value_max "
    "FROM events GROUP BY 1, 2",
)
def streaming_rollup_merge(spark, sf_dir):
    """Streaming continuous-aggregate ingest (streaming/ops.py
    streaming_rollup_ingest): events arrive as two micro-batches split by
    event-id parity — so EVERY hourly bucket is split across batches —
    each reducing to algebraic partials in its own replay-safe batch
    partition; merged_rollup re-aggregates partials per bucket. Passing
    the raw-aggregation oracle proves the split-bucket merge is
    lossless."""
    import tempfile

    from dataux_spark import streaming as S

    ev = read_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="dataux_stream_rollup_")
    incoming, store = f"{root}/in", f"{root}/rollup"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/even.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/odd.parquet")
    schema = spark.read.parquet(f"{incoming}/even.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_rollup_ingest(stream, store).awaitTermination()
    return S.merged_rollup(spark, store)


@_q(
    "streaming_topk_merge",
    # the oracle replays the streamed sketch EXACTLY: per-(bucket, parity
    # micro-batch) counts, the deterministic capacity-8 truncation
    # (count desc, item asc), each sketch's dropped_max, then the
    # cross-sketch merge into [est_min, est_max] bounds — so the driver
    # gate checks the streaming summary's whole mergeable contract
    """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS bucket, (event_id % 2) AS b,
             user_id AS item, count(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT bucket, b, item, cnt, row_number() OVER (
        PARTITION BY bucket, b ORDER BY cnt DESC, item) AS rn
      FROM counts
    ), km AS (
      SELECT k.bucket, k.b, k.item, k.cnt, coalesce(d.dropped_max, 0) AS dm
      FROM (SELECT bucket, b, item, cnt FROM ranked WHERE rn <= 8) k
      LEFT JOIN (SELECT bucket, b, max(cnt) AS dropped_max FROM ranked
                 WHERE rn > 8 GROUP BY bucket, b) d USING (bucket, b)
    ), total AS (
      SELECT CAST(sum(dm) AS BIGINT) AS tdm
      FROM (SELECT DISTINCT bucket, b, dm FROM km)
    ), per_item AS (
      SELECT item, CAST(sum(cnt) AS BIGINT) AS est_min,
             CAST(sum(dm) AS BIGINT) AS pdm
      FROM km GROUP BY item
    )
    SELECT item, est_min,
           est_min + (SELECT tdm FROM total) - pdm AS est_max
    FROM per_item ORDER BY est_min DESC, item LIMIT 10
    """,
)
def streaming_topk_merge(spark, sf_dir):
    """Streaming heavy-hitters ingest (streaming/ops.streaming_topk_ingest
    + merged_topk): events arrive as two micro-batches split by event-id
    parity, each reducing to its own per-hour capacity-8 truncated top-K
    sketch in a replay-safe ingest_batch partition; the merged read
    combines every (bucket, batch) sketch into per-item
    [est_min, est_max] count bounds and ranks by est_min. The streaming
    twin of rollup_topk_range — same deterministic truncation
    (rollup.truncate_topk is literally shared), sketch grain widened from
    bucket to (bucket, micro-batch), so the oracle can replay the whole
    approximate pipeline bit-for-bit."""
    import tempfile

    from dataux_spark import streaming as S

    ev = read_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="dataux_stream_topk_")
    incoming, store = f"{root}/in", f"{root}/topk"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/even.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/odd.parquet")
    schema = spark.read.parquet(f"{incoming}/even.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_topk_ingest(stream, store, capacity=8).awaitTermination()
    return S.merged_topk(spark, store, k=10)


@_q(
    "streaming_cms_merge",
    # count-min merge is cell-wise ADDITION, so the streamed store's
    # estimates must equal the batch build's — the oracle is the batch
    # pipeline replay (identical to rollup_cms_estimates), which is
    # exactly the streaming/batch equivalence contract, driver-pinned
    """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS bucket, CAST(user_id AS VARCHAR) AS item,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), cells AS (
      SELECT bucket, r.rw AS row, cnt,
             ('0x' || substr(md5(item || ':' || CAST(r.rw AS VARCHAR)), 1, 8))::UBIGINT
               % 256 AS col
      FROM counts CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(rw)
    ), grid AS (
      SELECT row, col, sum(cnt) AS cnt FROM cells GROUP BY row, col
    ), probe AS (
      SELECT CAST(i.item AS VARCHAR) AS item, r.rw AS row,
             ('0x' || substr(md5(CAST(i.item AS VARCHAR) || ':' || CAST(r.rw AS VARCHAR)), 1, 8))::UBIGINT
               % 256 AS col
      FROM range(16) i(item) CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(rw)
    )
    SELECT item, CAST(min(coalesce(grid.cnt, 0)) AS BIGINT) AS est
    FROM probe LEFT JOIN grid USING (row, col)
    GROUP BY item
    """,
)
def streaming_cms_merge(spark, sf_dir):
    """Streaming count-min ingest then point estimates
    (streaming/ops.streaming_cms_ingest + the UNCHANGED batch reader
    rollup.cms_estimates): events arrive as two parity micro-batches,
    each landing its own per-hour counter grids in a replay-safe
    ingest_batch partition. Because count-min merge is cell-wise
    addition, splitting events across micro-batches cannot change the
    merged grid — so the oracle is the BATCH pipeline replay, and a
    green row here is the streaming/batch equivalence contract held at
    the driver gate."""
    import tempfile

    from dataux_spark import streaming as S
    from dataux_spark.operators.rollup import cms_estimates

    ev = read_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="dataux_stream_cms_")
    incoming, store = f"{root}/in", f"{root}/cms"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/even.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/odd.parquet")
    schema = spark.read.parquet(f"{incoming}/even.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_cms_ingest(stream, store, depth=4, width=256).awaitTermination()
    return cms_estimates(spark, store, [str(i) for i in range(16)], depth=4, width=256)


def _training_prep_oracle():
    from dataux_spark.operators.sampling import hash_frac_sql

    f = hash_frac_sql("doc_id")
    return f"""
    WITH base AS (
      SELECT doc_id, lang, n_chars,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), q AS (
      SELECT doc_id, lang, n_chars, toks,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
      FROM base WHERE len(toks) >= 30
    ), u AS (
      SELECT *, row_number() OVER (PARTITION BY fp
                                   ORDER BY n_chars DESC, doc_id) AS rn
      FROM q
    ), uq AS (
      SELECT doc_id, lang, toks FROM u WHERE rn = 1
    ), g AS (
      SELECT doc_id AS _id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM uq
    ), {_prefix_candidate_pairs_ctes(0.5)}, drops AS (
      -- corpus-wide exact >= 0.5 pairs, replayed r12 via the
      -- prefix-candidate scheme (== all-pairs by the prefix theorem,
      -- candidate-linear); the Spark side's LSH candidates + exact
      -- verify find the identical set (asserted in tests), with no
      -- language blocking on either side
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN g a ON a._id = c.id_a JOIN g b ON b._id = c.id_b
      WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE /
                  len(list_distinct(a.grams || b.grams)), 6) >= 0.5
    ), surv AS (
      SELECT doc_id, lang FROM uq
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    ), samp AS (
      SELECT doc_id, lang FROM surv
      WHERE {f} < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
                  ELSE 0.8 END
    )
    SELECT lang,
           CASE WHEN {f} < 0.9 THEN 'train'
                WHEN {f} < 0.95 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, min(doc_id) AS min_id
    FROM samp GROUP BY 1, 2
    """


@_q(
    "corpus_hygiene_pipeline",
    # the round-6 crawl-hygiene stages composed end-to-end; every stage's
    # standalone oracle passes, and this replays the full chain so the
    # composition (each stage feeding the next's input) is value-checked
    """
    WITH planted AS (
      SELECT doc_id, lang, n_chars,
             text || chr(10) ||
             'copyright footer - all ' || lang || ' documents share this line'
               AS t,
             'HTTPS://WWW.Site' || CAST(doc_id % 3 AS VARCHAR) ||
             '.COM:443/Doc/' || CAST(doc_id % 150 AS VARCHAR) || '/' AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, lang, n_chars, t,
             lower(regexp_replace(regexp_replace(
               regexp_extract(url, '(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
               '^[Ww][Ww][Ww]\\.', ''), ':(80|443)$', ''))
             || regexp_replace(
                  regexp_extract(url, '(?i)^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                  '/+$', '') AS url_canon
      FROM planted
    ),
    kept AS (
      SELECT * FROM canon
      WHERE doc_id = (SELECT min(c2.doc_id) FROM canon c2
                      WHERE c2.url_canon = canon.url_canon)
    ),
    lines AS (
      SELECT doc_id, u.pos, u.line FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(t, chr(10)),
                      (x, i) -> struct_pack(pos := i, line := trim(x)))) AS u
        FROM kept)
    ),
    census AS (
      SELECT line FROM lines WHERE length(line) >= 10
      GROUP BY line HAVING count(DISTINCT doc_id) >= 3
    ),
    cleaned AS (
      SELECT l.doc_id,
             coalesce(string_agg(CASE WHEN NOT (length(l.line) >= 10
                                               AND c.line IS NOT NULL)
                                      THEN l.line END,
                                 chr(10) ORDER BY l.pos), '') AS text_clean
      FROM lines l LEFT JOIN census c USING (line) GROUP BY l.doc_id
    ),
    toks AS (
      SELECT k.doc_id, k.lang, k.n_chars,
             list_filter(regexp_split_to_array(lower(trim(c.text_clean)), '\\s+'),
                         x -> x != '') AS tk
      FROM kept k JOIN cleaned c USING (doc_id)
    ),
    scored AS (
      SELECT doc_id, lang, n_chars, len(tk) AS n_tok,
             round(CAST(coalesce(list_sum(list_transform(tk, t ->
                   ((((CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) AS BIGINT)
                      % 1024) * 37 + 11) % 97) - 48))), 0) AS DOUBLE)
                   / 97.0 / greatest(len(tk), 1), 6) AS score
      FROM toks
    ),
    gated AS (SELECT * FROM scored WHERE score >= -0.05),
    budgeted AS (
      SELECT doc_id, lang, score,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM gated
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(cum_tokens) AS BIGINT) AS tokens,
           min(doc_id) AS min_id
    FROM budgeted
    WHERE cum_tokens <= CASE lang WHEN 'en' THEN 2500 ELSE 1200 END
    GROUP BY lang
    """,
)
def corpus_hygiene_pipeline(spark, sf_dir):
    """The round-6 crawl-hygiene stages composed as ONE lazy plan:
    URL-canonical dedup (keeper = min id) → corpus-wide boilerplate-line
    removal (census over the kept docs) → fastText-shaped hashed quality
    gate → per-language token-budget curation → per-lang roll-up. Each
    stage is a standalone operator with its own green oracle; this entry
    value-checks the COMPOSITION (stage outputs feeding the next stage's
    census/score/budget inputs). Plan shapes: zero-shuffle projections
    (canon, score), one dedup groupBy, one census shuffle + value join,
    one reassembly shuffle, one group-key cumsum — all linear, nothing
    pairwise. Kept fully lazy here so Catalyst prunes across stages;
    because Spark has no cross-branch CSE, the URL-dedup subtree is
    recomputed where later stages re-join it — at corpus scale a
    production run materializes each stage to the lake (the store-backed
    pattern), trading that recompute for one write per stage."""
    from dataux_spark.operators.sampling import token_budget_select
    from dataux_spark.operators.text import (
        hashed_linear_quality,
        remove_boilerplate_lines,
    )
    from dataux_spark.operators.web import url_dedup_keepers

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("copyright footer - all "), F.col("lang"),
                     F.lit(" documents share this line")),
        ).alias("t"),
        F.concat(
            F.lit("HTTPS://WWW.Site"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".COM:443/Doc/"), (F.col("doc_id") % 150).cast("string"),
            F.lit("/"),
        ).alias("url"),
    )
    # r14: the keeper-id set is materialized eagerly (localCheckpoint).
    # `kept` is referenced TWICE inside the boilerplate stage (census +
    # tag-join) and Spark has no cross-branch CSE, so the lazy spelling
    # re-ran the whole URL-dedup subtree (docs scan + url_canon groupBy)
    # once per reference. Checkpointing just the slim id list cuts the
    # plan from 10 parquet scans to 6 (plans/r14) — identical rows
    # (oracle-checked), interleaved 1.50 → 1.25 s at sf0.1. Lifecycle:
    # the checkpointed ids live exactly as long as the returned frame and
    # the ContextCleaner frees them on GC — no cache entry outlives the
    # caller. This is the slim form of the stage materialization the
    # docstring above describes for production (ids only, 8 B per unique
    # URL, spilling to disk via MEMORY_AND_DISK at crawl scale).
    keep = (
        url_dedup_keepers(docs, "url", "doc_id")
        .select(F.col("keeper_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    kept = docs.join(keep, "doc_id")
    cleaned = remove_boilerplate_lines(kept, "t", "doc_id", min_docs=3)
    scored = hashed_linear_quality(
        cleaned.select("doc_id", F.col("text_clean").alias("tc")),
        "tc", "doc_id", threshold=-0.05,
    )
    # r13: attach lang/n_chars from the RAW docs scan, not from `kept` —
    # scored's ids are already a subset of the URL-dedup keepers (they
    # descend from `kept` through the boilerplate/quality stages), so the
    # inner join returns identical rows either way, and this spelling
    # drops one full recompute of the URL-dedup subtree (no cross-branch
    # CSE) from the lazy plan: measured 3 → 2 occurrences of the dedup
    # groupBy in the physical plan.
    gated = (
        scored.filter(F.col("keep") == 1)
        .join(
            read_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "n_chars"),
            "doc_id",
        )
    )
    sel = token_budget_select(
        gated, "n_tokens", {"en": 2500}, "lang", "doc_id",
        order_col="quality_score", default_budget=1200,
    )
    return sel.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.max("_cum_tokens").cast("bigint").alias("tokens"),
        F.min("doc_id").alias("min_id"),
    )


@_q("training_prep_pipeline", _training_prep_oracle())
def training_prep_pipeline(spark, sf_dir):
    """The FULL training-data prep flow as one declarative plan — quality
    gate → fingerprint dedup (keep best) → near-dup drop (exact-Jaccard
    pairs within lang blocks, drop the larger id) → stratified language
    resample → train/val/test split → per-(lang, split) roll-up. Every
    stage is an operator used standalone elsewhere; composing them stays
    lazy so Catalyst prunes/pipelines across stage boundaries. At 100 TB
    the shapes are: scan projections, one digest window, banded-LSH
    candidate generation + exact verify (NOT blocked all-pairs — at
    sf0.1 the within-block pair join is already 10-50x slower, and LSH
    finds the identical ≥0.5 pair set, asserted in tests/test_dedup.py),
    two hash-band filters, one small roll-up. The oracle replays all six
    stages in SQL — exact pairwise Jaccard remains its spelling for the
    near-dup stage precisely because the LSH output equals it."""
    from dataux_spark.operators.dedup import minhash_lsh_pairs, tokens
    from dataux_spark.operators.sampling import hash_split, stratified_hash_sample

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", "lang", "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
        ).alias("fp"),
    )
    qual = base.filter(F.col("n_tokens") >= 30)
    w = W.partitionBy("fp").orderBy(F.col("n_chars").desc(), "doc_id")
    uniq = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    # bands=32 (r=2): P(a true j>=0.5 pair misses every band) = (1-j²)³²
    # <= 1e-4 — the recall knob turned up so equality with the exact
    # oracle is near-certain by construction, not a fixture accident;
    # candidates are still exact-verified, so false positives are zero
    # r13: the verify sides re-attach grams by candidate id only, so they
    # can shingle the cheaper pre-window `qual` frame (a superset of
    # uniq's ids with identical text → identical grams) instead of
    # re-running the fingerprint window per branch — signatures still
    # come from `uniq`, so the candidate id set is unchanged and the
    # output pairs are identical (oracle-checked). Drops two Window
    # stages + two md5-fingerprint computations from the physical plan.
    from dataux_spark.operators.dedup import gram_sets

    pairs = minhash_lsh_pairs(
        uniq, "text", "doc_id", num_hashes=64, bands=32, shingle_n=3, threshold=0.5,
        verify_grams=gram_sets(docs.select("doc_id", "text"), "text", "doc_id", 3),
    )
    drops = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    surv = uniq.join(drops, "doc_id", "left_anti")
    samp = stratified_hash_sample(
        surv, "lang", {"en": 0.5, "de": 1.0}, "doc_id", default_rate=0.8
    )
    return (
        hash_split(samp, "doc_id")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_id"))
    )


@_q(
    "dedup_semantic_keepset",
    # SemDeDup keep-set over embeddings + 50 planted exact duplicates
    # (vec_id+10000): centroids are the vec_id<8 subset, assignment and
    # the within-cluster smaller-id-similar rule are spelled in plain SQL,
    # cosines rounded to 6 places BEFORE the threshold compare both sides
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) AS vv
      FROM embeddings WHERE vec_id < 50
    ), c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 8
    ), s AS (
      SELECT b.vec_id, c.cid,
             list_dot_product(b.vv, c.cvec) /
             (sqrt(list_dot_product(b.vv, b.vv)) *
              sqrt(list_dot_product(c.cvec, c.cvec))) AS cos
      FROM base b CROSS JOIN c
    ), asg AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM s) t WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b2.vec_id FROM asg a1
      JOIN asg a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
      JOIN base b1 ON b1.vec_id = a1.vec_id
      JOIN base b2 ON b2.vec_id = a2.vec_id
      WHERE round(list_dot_product(b1.vv, b2.vv) /
                  (sqrt(list_dot_product(b1.vv, b1.vv)) *
                   sqrt(list_dot_product(b2.vv, b2.vv))), 6) > 0.95
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           (d.vec_id IS NULL) AS keep
    FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    """,
)
def dedup_semantic_keepset(spark, sf_dir):
    """SemDeDup semantic dedup (operators/dedup.semantic_dedup): nearest-
    centroid clustering + within-cluster keep-first pruning at cos > 0.95.
    The synthetic embeddings have no natural near-dups (max within-cluster
    cos ≈ 0.49), so 50 exact duplicates are planted at vec_id+10000 — the
    keep set must drop exactly the planted copies and keep everything
    else, and the driver gate value-checks that, not just row counts."""
    from dataux_spark.operators.dedup import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    base = emb.select("vec_id", "embedding").unionByName(planted)
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding").collect()
    ]
    return semantic_dedup(base, "embedding", "vec_id", cents, threshold=0.95)


@_q(
    "streaming_distinct_merge",
    # r13 (VERDICT r12 item 4): rows-only → contract oracle. The HLL
    # union is approximate (sparse/dense mode promotion varies with
    # ingest order) so the ESTIMATE has no bit-exact replay — but the
    # sketch contract does: per key, the streamed-then-merged estimate
    # must land within 5% of the exact distinct count (lg_k=12 ⇒ rsd
    # ≈1.6%; measured ≤2% at all sfs), and the rollup's event counts
    # must equal the batch truth exactly. Both the exact distinct and
    # the event count are plain SQL; the bound checks are the returned
    # booleans.
    """
    SELECT event_type AS key,
           CAST(count(*) AS BIGINT) AS n_events,
           count(DISTINCT user_id) AS exact_distinct,
           TRUE AS est_within_5pct,
           TRUE AS events_count_matches
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def streaming_distinct_merge(spark, sf_dir):
    """Streaming HLL-distinct ingest then range estimate
    (streaming/ops.streaming_distinct_ingest + the unchanged batch
    reader rollup.distinct_over_range): per-micro-batch Datasketches
    partials in replay-safe ingest_batch partitions, hll_union_agg
    merging across (bucket, batch) at read — returning users are never
    double-counted across micro-batches, which the naive per-batch sum
    would do. Fifth and last streaming sketch twin. Contract-checked
    (r13): per event_type, the merged estimate must sit within 5% of
    the exact distinct-user count (replayable), and the rollup's
    n_events roll-up must equal the batch count exactly — so a merge
    that double-counts across micro-batches (the bug class this
    operator exists to prevent) now hash-mismatches at the gate."""
    import tempfile

    from dataux_spark import streaming as S
    from dataux_spark.operators.rollup import distinct_over_range

    ev = read_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="dataux_stream_hll_")
    incoming, store = f"{root}/in", f"{root}/hll"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/even.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/odd.parquet")
    schema = spark.read.parquet(f"{incoming}/even.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_distinct_ingest(stream, store).awaitTermination()
    est = distinct_over_range(spark, store).select(
        "key",
        F.col("n_distinct_est").alias("_est"),
        F.col("n_events").alias("_est_events"),
    )
    exact = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    return (
        exact.join(est, "key")
        .select(
            "key",
            "n_events",
            "exact_distinct",
            (
                F.abs(F.col("_est").cast("double") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("est_within_5pct"),
            (F.col("_est_events") == F.col("n_events")).alias(
                "events_count_matches"
            ),
        )
        .orderBy("key")
    )


@_q(
    "streaming_quantile_merge",
    # histogram merge is bin-count ADDITION, so the streamed store's p95
    # must equal the batch build's — the oracle is the batch replay
    # (identical to rollup_quantile_range), driver-pinning the
    # streaming/batch equivalence contract for the fourth sketch family
    """
    WITH mm AS (
      SELECT min(CAST(value AS DOUBLE)) AS vmin, max(CAST(value AS DOUBLE)) AS vmax
      FROM events
    ), e AS (
      SELECT event_type AS key,
             least(127, CAST(floor((CAST(value AS DOUBLE) - mm.vmin) /
               (CASE WHEN mm.vmax - mm.vmin = 0 THEN 1.0
                     ELSE mm.vmax - mm.vmin END) * 128) AS INT)) AS bin
      FROM events CROSS JOIN mm
    ), c AS (
      SELECT key, bin, count(*) AS ct FROM e GROUP BY 1, 2
    ), r AS (
      SELECT key, bin, ct,
             sum(ct) OVER (PARTITION BY key ORDER BY bin) AS cum,
             sum(ct) OVER (PARTITION BY key) AS total
      FROM c
    ), p AS (
      SELECT *, CAST(ceil(0.95 * total) AS BIGINT) AS target FROM r
    ), f AS (
      SELECT *, row_number() OVER (PARTITION BY key ORDER BY bin) AS rn
      FROM p WHERE cum >= target
    )
    SELECT key, CAST(total AS BIGINT) AS n,
           round(mm.vmin + (bin + (target - (cum - ct)) / CAST(ct AS DOUBLE))
                 * ((CASE WHEN mm.vmax - mm.vmin = 0 THEN 1.0
                          ELSE mm.vmax - mm.vmin END) / 128), 6) AS q_est
    FROM f CROSS JOIN mm WHERE rn = 1
    """,
)
def streaming_quantile_merge(spark, sf_dir):
    """Streaming histogram-quantile ingest then range p95
    (streaming/ops.streaming_quantile_ingest + the UNCHANGED batch
    reader rollup.quantile_over_range): bin edges frozen up front from
    the reference frame (the PSI deployed-binning contract), events
    streamed as two parity micro-batches into replay-safe ingest_batch
    partitions, bin counts summed across (bucket, batch) at read. A
    green row is the streaming==batch equivalence held at the driver
    gate — same argument as streaming_cms_merge."""
    import tempfile

    from dataux_spark import streaming as S
    from dataux_spark.operators.rollup import quantile_over_range

    ev = read_table(spark, sf_dir, "events")
    mm = ev.agg(F.min(F.col("value").cast("double")).alias("lo"),
                F.max(F.col("value").cast("double")).alias("hi")).first()
    root = tempfile.mkdtemp(prefix="dataux_stream_qtl_")
    incoming, store = f"{root}/in", f"{root}/qtl"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/even.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/odd.parquet")
    schema = spark.read.parquet(f"{incoming}/even.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_quantile_ingest(
        stream, store, vmin=mm.lo, vmax=mm.hi, bins=128
    ).awaitTermination()
    return quantile_over_range(spark, store, q=0.95)


@_q(
    "rollup_quantile_range",
    # the histogram rollup's estimate is fully deterministic (equi-width
    # bins over the global min/max, rank = ceil(q*total), linear
    # interpolation in the holding bin) — the oracle replays every step
    """
    WITH mm AS (
      SELECT min(CAST(value AS DOUBLE)) AS vmin, max(CAST(value AS DOUBLE)) AS vmax
      FROM events
    ), e AS (
      SELECT event_type AS key,
             least(127, CAST(floor((CAST(value AS DOUBLE) - mm.vmin) /
               (CASE WHEN mm.vmax - mm.vmin = 0 THEN 1.0
                     ELSE mm.vmax - mm.vmin END) * 128) AS INT)) AS bin
      FROM events CROSS JOIN mm
    ), c AS (
      SELECT key, bin, count(*) AS ct FROM e GROUP BY 1, 2
    ), r AS (
      SELECT key, bin, ct,
             sum(ct) OVER (PARTITION BY key ORDER BY bin) AS cum,
             sum(ct) OVER (PARTITION BY key) AS total
      FROM c
    ), p AS (
      SELECT *, CAST(ceil(0.95 * total) AS BIGINT) AS target FROM r
    ), f AS (
      SELECT *, row_number() OVER (PARTITION BY key ORDER BY bin) AS rn
      FROM p WHERE cum >= target
    )
    SELECT key, CAST(total AS BIGINT) AS n,
           round(mm.vmin + (bin + (target - (cum - ct)) / CAST(ct AS DOUBLE))
                 * ((CASE WHEN mm.vmax - mm.vmin = 0 THEN 1.0
                          ELSE mm.vmax - mm.vmin END) / 128), 6) AS q_est
    FROM f CROSS JOIN mm WHERE rn = 1
    """,
)
def rollup_quantile_range(spark, sf_dir):
    """Histogram-quantile rollup lifecycle (operators/rollup.
    build_quantile_rollup / quantile_over_range): per-(bucket, key)
    fixed-bin value histograms — mergeable by summation, so any time
    window's p95 comes from bucket-sized state; unlike percentile_approx
    the whole estimate is deterministic and the oracle replays bin
    assignment, rank selection, and interpolation exactly."""
    import tempfile

    from dataux_spark.operators.rollup import (
        build_quantile_rollup,
        quantile_over_range,
    )

    ev = read_table(spark, sf_dir, "events")
    slug = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.strip("/"))
    path = f"{tempfile.gettempdir()}/dataux_qroll_{slug}"
    build_quantile_rollup(ev, path, bins=128)
    return quantile_over_range(spark, path, q=0.95)


@_q(
    "events_zscore_anomalies",
    # identical frame (50 preceding, excl. current), population stddev,
    # z rounded to 6dp before the |z|>3 compare, ties broken by event_id
    """
    WITH s AS (
      SELECT event_id, event_type AS key, value,
             avg(value) OVER w AS m,
             stddev_pop(value) OVER w AS sd,
             count(value) OVER w AS np
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, key,
           CASE WHEN np >= 10 AND sd > 0
                THEN round((value - m) / sd, 6) END AS z,
           coalesce(CAST(abs(CASE WHEN np >= 10 AND sd > 0
                                  THEN round((value - m) / sd, 6) END) > 3.0
                         AS INT), 0) AS is_anomaly
    FROM s
    """,
)
def events_zscore_anomalies(spark, sf_dir):
    """Rolling z-score anomaly flags over the events stream
    (operators/timeseries.rolling_zscore_anomalies): each value scored
    against its event-type's 50 preceding observations — one keyed
    window, the metric-monitoring pass. The oracle replays the identical
    frame and flag rule; cold keys (<10 priors) are unscored by design."""
    from dataux_spark.operators.timeseries import rolling_zscore_anomalies

    ev = read_table(spark, sf_dir, "events")
    return rolling_zscore_anomalies(
        ev, "ts", "event_type", "value", "event_id",
        window=50, min_n=10, threshold=3.0,
    ).select("event_id", "key", "z", "is_anomaly")


@_q(
    "events_active_users",
    # the oracle replays the (user, day) reduce, the bounded
    # window_days contribution explode, and the per-day distinct merge
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events
    ), dau AS (
      SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ), contrib AS (
      SELECT d + r.off AS day, u
      FROM ud CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6)) r(off)
    ), wau AS (
      SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS wau
      FROM contrib GROUP BY 1
    )
    SELECT day, dau, wau, round(dau::DOUBLE / wau, 6) AS stickiness
    FROM dau JOIN wau USING (day) ORDER BY day
    """,
)
def events_active_users(spark, sf_dir):
    """DAU / WAU / stickiness report
    (operators/timeseries.active_user_stats): trailing-7-day active
    users per calendar day WITHOUT a per-day distinct-over-range pass —
    the corpus reduces once to distinct (user, day) rows, each
    contributes itself to the 7 days it keeps a user active in (a
    constant-bounded explode on the reduced frame), and one per-day
    distinct finishes it. The engagement-reporting staple next to
    funnel/retention/attribution."""
    from dataux_spark.operators.timeseries import active_user_stats

    ev = read_table(spark, sf_dir, "events")
    return active_user_stats(ev, "ts", "user_id", window_days=7)


@_q(
    "events_last_touch",
    # the oracle replays the one-window attribution exactly: carried
    # ignorenulls last-touch over the (ts, id)-ordered preceding frame,
    # the 72h lookback gate, and the 'direct' fallback
    """
    WITH sub AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('purchase', 'click', 'view')
    ), carried AS (
      SELECT event_id, user_id AS "user", ts, event_type,
        last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END
                   IGNORE NULLS) OVER w AS tid,
        last_value(CASE WHEN event_type IN ('click', 'view') THEN ts END
                   IGNORE NULLS) OVER w AS tts,
        last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                   IGNORE NULLS) OVER w AS ttype
      FROM sub
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, "user", ts,
           CASE WHEN tid IS NOT NULL AND hrs <= 72.0 THEN ttype
                ELSE 'direct' END AS touch_type,
           CASE WHEN tid IS NOT NULL AND hrs <= 72.0 THEN tid END AS touch_id,
           CASE WHEN tid IS NOT NULL AND hrs <= 72.0 THEN hrs END
             AS hours_since_touch
    FROM (SELECT *, round(date_diff('second', tts, ts) / 3600.0, 6) AS hrs
          FROM carried)
    WHERE event_type = 'purchase'
    """,
)
def events_last_touch(spark, sf_dir):
    """Last-touch attribution (operators/timeseries.last_touch_attribution):
    every purchase credited to the user's most recent preceding click or
    view within 72h, else 'direct' — the funnel family's revenue-side
    report. ONE user-keyed sort window carries the last touch via
    ignorenulls last() over the strictly-preceding (ts, id) frame: no
    per-conversion as-of join, no range join, cost is the sessionize
    shape however many purchases a user makes. Total labeling of
    conversions."""
    from dataux_spark.operators.timeseries import last_touch_attribution

    ev = read_table(spark, sf_dir, "events")
    return last_touch_attribution(
        ev, "purchase", ["click", "view"], lookback_hours=72.0
    )


@_q(
    "events_seasonal_anomalies",
    # per-(event_type, hour-of-day) population baseline over the whole
    # frame, z rounded 6dp before the |z|>3 compare — the oracle replays
    # baseline, join-back, and flag rule; thin slots (<10 obs) unscored
    """
    WITH prof AS (
      SELECT event_type AS key, EXTRACT(hour FROM ts) AS hod,
             avg(value) AS m, stddev_pop(value) AS sd, count(value) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_id, key, CAST(hod AS INT) AS hod,
           CASE WHEN n >= 10 AND sd > 0
                THEN round((value - m) / sd, 6) END AS z,
           coalesce(CAST(abs(CASE WHEN n >= 10 AND sd > 0
                                  THEN round((value - m) / sd, 6) END) > 3.0
                         AS INT), 0) AS is_anomaly
    FROM events JOIN prof
      ON prof.key = event_type AND prof.hod = EXTRACT(hour FROM ts)
    """,
)
def events_seasonal_anomalies(spark, sf_dir):
    """Seasonal-profile anomaly flags
    (operators/timeseries.seasonal_profile_anomalies): each event scored
    against its event-type's hour-of-day baseline — catches
    wrong-for-the-slot values a rolling window normalizes away, and
    ignores the daily peak a rolling window would flag. One
    map-side-combined groupBy to a keys x 24 profile + one join back
    (AQE broadcasts the bounded profile at runtime); same 6dp-rounded
    flag rule and total-labeling contract as the rolling twin."""
    from dataux_spark.operators.timeseries import seasonal_profile_anomalies

    ev = read_table(spark, sf_dir, "events")
    return seasonal_profile_anomalies(
        ev, "ts", "event_type", "value", "event_id", min_n=10, threshold=3.0
    ).select(
        "event_id", "key", F.col("hod").cast("int").alias("hod"), "z", "is_anomaly"
    )


@_q(
    "cdc_incremental_aggregate",
    # incremental view maintenance: the oracle recomputes the FINAL-state
    # aggregate declaratively (same three commits applied as relational
    # transforms over the pristine parquet); exact DECIMAL(18,2) money
    # arithmetic on both sides, one deterministic double conversion at
    # the end
    """
    WITH f AS (
      SELECT CASE WHEN o_orderstatus = 'P' AND o_totalprice > 150000
                  THEN 'Z' ELSE o_orderstatus END AS k,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 10000)
      UNION ALL SELECT 'X', CAST(1.0 AS DECIMAL(18,2))
    )
    SELECT k AS key, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(v) AS DOUBLE) AS value_sum
    FROM f GROUP BY k
    """,
)
def cdc_incremental_aggregate(spark, sf_dir):
    """Incremental view maintenance from the CDC feed
    (operators/rollup.apply_cdc_delta): a per-status count/sum aggregate
    is materialized at version 0, three commits are applied (UPDATE
    moving rows across the key, DELETE, INSERT), and the stored
    aggregate is maintained from table_changes(0, 3) ALONE — the
    maintained result must equal a from-scratch recompute of the final
    state, which is exactly what the oracle computes. Delta cost is
    feed-sized; the table is never rescanned."""
    import tempfile

    from dataux_spark.engine import Engine
    from dataux_spark.operators.rollup import apply_cdc_delta

    td = tempfile.mkdtemp(prefix="cdc_ivm_")
    read_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(f"{td}/src")
    e = Engine(spark)
    e.register_writable_parquet("ivm_orders", f"{td}/src", f"{td}/work",
                                keys=["o_orderkey"])
    money = F.col("o_totalprice").cast("decimal(18,2)")
    base = (
        e.store.version_of("ivm_orders", 0)
        .groupBy(F.col("o_orderstatus").alias("key"))
        .agg(F.count("*").alias("n_rows"), F.sum(money).alias("value_sum"))
    )
    e.sql("UPDATE ivm_orders SET o_orderstatus = 'Z' "
          "WHERE o_orderstatus = 'P' AND o_totalprice > 150000")
    e.sql("DELETE FROM ivm_orders WHERE o_orderstatus = 'F' AND o_totalprice < 10000")
    e.sql("INSERT INTO ivm_orders (o_orderkey, o_custkey, o_orderstatus, o_totalprice) "
          "VALUES (999999001, 1, 'X', 1.0)")
    feed = e.store.changes("ivm_orders", 0, 3).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = apply_cdc_delta(base, feed, "o_orderstatus", "o_totalprice")
    return out.select(
        "key", "n_rows", F.col("value_sum").cast("double").alias("value_sum")
    )


# --- DML / CDC through the engine -----------------------------------------

@_q(
    "cdc_table_changes",
    "WITH upd AS (SELECT o_orderkey, o_orderpriority FROM orders "
    "             WHERE o_orderstatus = 'P' AND o_totalprice > 150000), "
    "     del AS (SELECT o_orderkey, o_orderpriority FROM orders "
    "             WHERE o_orderstatus = 'F' AND o_totalprice < 10000) "
    "SELECT o_orderkey, o_orderpriority, "
    "       'update_preimage' AS _change_type, 1 AS _commit_version FROM upd "
    "UNION ALL SELECT o_orderkey, '9-CDC', 'update_postimage', 1 FROM upd "
    "UNION ALL SELECT o_orderkey, o_orderpriority, 'delete', 2 FROM del "
    "UNION ALL SELECT 999999001, CAST(NULL AS VARCHAR), 'insert', 3",
)
def cdc_table_changes(spark, sf_dir):
    """DML + CDC end-to-end through Engine.sql(): orders copied into a
    writable copy-on-write table, three commits applied (UPDATE / DELETE /
    INSERT), then `table_changes(t, 0, 3)` returns the Delta-CDF-shaped
    feed — per-commit attribution, update pre/postimage pairs under the
    o_orderkey key. The oracle spells the exact expected feed from the
    pristine parquet, so the driver gate fails if any commit leaks
    unchanged rows into the feed, misses a change, or mislabels a commit.
    Scale shape: each pair diff reads only the part-files the commit
    actually rewrote (hard-linked files are skipped), so CDC cost follows
    changed data, not table size (reference has no CDC; versioned-store
    extension over SURVEY §3.3 DML)."""
    import tempfile

    from dataux_spark.engine import Engine

    td = tempfile.mkdtemp(prefix="cdc_q_")
    src = f"{td}/src"
    read_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    e = Engine(spark)
    e.register_writable_parquet("cdc_orders", src, f"{td}/work", keys=["o_orderkey"])
    e.sql("UPDATE cdc_orders SET o_orderpriority = '9-CDC' "
          "WHERE o_orderstatus = 'P' AND o_totalprice > 150000")
    e.sql("DELETE FROM cdc_orders WHERE o_orderstatus = 'F' AND o_totalprice < 10000")
    e.sql("INSERT INTO cdc_orders (o_orderkey, o_custkey, o_orderstatus, o_totalprice) "
          "VALUES (999999001, 1, 'X', 1.0)")
    return e.sql(
        "SELECT o_orderkey, o_orderpriority, _change_type, _commit_version "
        "FROM table_changes(cdc_orders, 0, 3)"
    )


@_q(
    "text_collocations_pmi",
    # the oracle mirrors the operator term by term: same tokenization,
    # same adjacent-bigram construction, same (cb*N)/(ca*cb) operand
    # order inside log2, same 6dp rounding and (pmi desc, bigram) order
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), bg AS (
      SELECT u.b AS bigram FROM (SELECT toks FROM t WHERE len(toks) >= 2) tt,
        UNNEST(list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1])) u(b)
    ), ug AS (
      SELECT u.w AS w, count(*) AS cw FROM t, UNNEST(toks) u(w) GROUP BY u.w
    ), bc AS (
      SELECT bigram, count(*) AS pair_count FROM bg GROUP BY bigram
      HAVING count(*) >= 3
    ), n AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM bg)
    SELECT bigram, pair_count,
           round(log2((CAST(pair_count AS DOUBLE) * (SELECT nb FROM n)) /
                      (CAST(a.cw AS DOUBLE) * CAST(b.cw AS DOUBLE))), 6) AS pmi
    FROM bc
    JOIN ug a ON a.w = split_part(bigram, ' ', 1)
    JOIN ug b ON b.w = split_part(bigram, ' ', 2)
    ORDER BY pmi DESC, bigram LIMIT 50
    """,
)
def text_collocations_pmi(spark, sf_dir):
    """Top-50 adjacent-bigram PMI collocations over the documents corpus
    (text.collocations_pmi) — the vocabulary-curation staple: high-PMI
    pairs are the multi-word units a tokenizer should keep whole. Plan:
    JVM zip_with bigram arrays (no window), two count groupBys, two
    vocabulary-sized hash joins after the >=min_count shrink, N on a
    1-row broadcast."""
    from dataux_spark.operators.text import collocations_pmi

    return collocations_pmi(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        min_count=3, k=50,
    )


@_q(
    "rollup_cms_estimates",
    # the oracle replays the count-min pipeline exactly: (bucket, item)
    # counts, the 4-row md5 cell hash, cell-wise grid sums over the full
    # range, then min-over-rows for 16 named probe items — including the
    # same hash collisions, so the one-sided error is checked too
    """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS bucket, CAST(user_id AS VARCHAR) AS item,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), cells AS (
      SELECT bucket, r.rw AS row, cnt,
             ('0x' || substr(md5(item || ':' || CAST(r.rw AS VARCHAR)), 1, 8))::UBIGINT
               % 256 AS col
      FROM counts CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(rw)
    ), grid AS (
      SELECT row, col, sum(cnt) AS cnt FROM cells GROUP BY row, col
    ), probe AS (
      SELECT CAST(i.item AS VARCHAR) AS item, r.rw AS row,
             ('0x' || substr(md5(CAST(i.item AS VARCHAR) || ':' || CAST(r.rw AS VARCHAR)), 1, 8))::UBIGINT
               % 256 AS col
      FROM range(16) i(item) CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(rw)
    )
    SELECT item, CAST(min(coalesce(grid.cnt, 0)) AS BIGINT) AS est
    FROM probe LEFT JOIN grid USING (row, col)
    GROUP BY item
    """,
)
def rollup_cms_estimates(spark, sf_dir):
    """Count-min sketch rollup, built then point-queried
    (rollup.build_cms_rollup/cms_estimates) — the fifth sketch family:
    per-hour 4 x 256 counter grids, merged cell-wise over the range,
    answering named-item frequency lookups with one-sided error (never
    under). The hash family is the house md5 primitive, so the oracle
    replays the grid — including its collisions — bit-for-bit. Scale
    shape: counts reduce map-side BEFORE the depth-explode, state per
    bucket is <= depth x width rows regardless of item cardinality, and
    the probe is a broadcast |items| x depth frame over the merged
    grid."""
    import tempfile

    from dataux_spark.operators.rollup import build_cms_rollup, cms_estimates

    path = tempfile.mkdtemp(prefix="dataux_cms_rollup_") + "/r"
    ev = read_table(spark, sf_dir, "events")
    build_cms_rollup(ev, path, item_col="user_id", depth=4, width=256)
    return cms_estimates(spark, path, [str(i) for i in range(16)], depth=4, width=256)


@_q(
    "rollup_topk_range",
    # the oracle replays the sketch EXACTLY — per-bucket counts, the
    # deterministic capacity-8 truncation (count desc, item asc), each
    # bucket's dropped_max, then the range merge into [est_min, est_max]
    # bounds — so the driver gate checks the approximate summary's whole
    # contract, not just its top-k membership
    """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS bucket, user_id AS item,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT bucket, item, cnt, row_number() OVER (
        PARTITION BY bucket ORDER BY cnt DESC, item) AS rn
      FROM counts
    ), km AS (
      SELECT k.bucket, k.item, k.cnt, coalesce(d.dropped_max, 0) AS dm
      FROM (SELECT bucket, item, cnt FROM ranked WHERE rn <= 8) k
      LEFT JOIN (SELECT bucket, max(cnt) AS dropped_max FROM ranked
                 WHERE rn > 8 GROUP BY bucket) d USING (bucket)
    ), total AS (
      SELECT CAST(sum(dm) AS BIGINT) AS tdm
      FROM (SELECT DISTINCT bucket, dm FROM km)
    ), per_item AS (
      SELECT item, CAST(sum(cnt) AS BIGINT) AS est_min,
             CAST(sum(dm) AS BIGINT) AS pdm
      FROM km GROUP BY item
    )
    SELECT item, est_min,
           est_min + (SELECT tdm FROM total) - pdm AS est_max
    FROM per_item ORDER BY est_min DESC, item LIMIT 10
    """,
)
def rollup_topk_range(spark, sf_dir):
    """Heavy-hitters rollup, built then range-queried
    (rollup.build_topk_rollup/topk_over_range) — the fourth sketch
    family: per-hour capacity-8 top-item summaries with dropped-max
    error bounds, merged over the full range into per-item
    [est_min, est_max] count bounds and ranked. Deterministic
    truncation makes the whole approximate pipeline oracle-checkable.
    Scale shape: one map-side-combined count shuffle + a
    WindowGroupLimit top-K per bucket at build; range reads touch
    buckets x capacity rows, partition-pruned by bucket_date."""
    import tempfile

    from dataux_spark.operators.rollup import build_topk_rollup, topk_over_range

    path = tempfile.mkdtemp(prefix="dataux_topk_rollup_") + "/r"
    ev = read_table(spark, sf_dir, "events")
    build_topk_rollup(ev, path, item_col="user_id", capacity=8)
    return topk_over_range(spark, path, k=10)


@_q(
    "dml_merge_result",
    # the oracle replays Delta's first-match-wins MERGE semantics in plain
    # SQL over the pristine parquet: matched rows resolve through the
    # ordered clause conditions (>200k delete, >150k re-prioritize, else
    # tag), unmatched targets carry, the conditional insert leg appends —
    # then both engines aggregate the FINAL table state
    """
    WITH src AS (
      SELECT o_orderkey AS k, o_totalprice AS p FROM orders WHERE o_custkey < 50
      UNION ALL
      SELECT 900000000 + c_custkey, c_acctbal FROM customer WHERE c_custkey <= 20
    ), matched AS (
      SELECT t.o_orderkey,
             CASE WHEN s.p > 200000 THEN NULL
                  WHEN s.p > 150000 THEN 'M-HIGH'
                  ELSE 'M-LOW' END AS pri,
             t.o_totalprice
      FROM orders t JOIN src s ON t.o_orderkey = s.k
    ), final AS (
      SELECT t.o_orderkey, t.o_orderpriority AS pri, t.o_totalprice
      FROM orders t ANTI JOIN src s ON t.o_orderkey = s.k
      UNION ALL
      SELECT o_orderkey, pri, o_totalprice FROM matched WHERE pri IS NOT NULL
      UNION ALL
      SELECT s.k, 'M-NEW', s.p FROM src s
      ANTI JOIN orders t ON t.o_orderkey = s.k
      WHERE s.p > 1000
    )
    SELECT pri AS o_orderpriority, count(*) AS ct,
           round(sum(o_totalprice), 2) AS total
    FROM final GROUP BY pri
    """,
)
def dml_merge_result(spark, sf_dir):
    """Multi-clause MERGE end-to-end through Engine.sql(), driver-gated:
    orders copied into a writable COW table, a mixed feed merged in
    (ordered WHEN MATCHED DELETE / conditional UPDATE / fallback UPDATE +
    conditional INSERT, first-match-wins — Delta's full grammar), then
    the FINAL table state aggregated. The oracle replays the clause
    resolution in plain SQL, so the driver gate fails if clause order,
    condition evaluation, the file-pruned rewrite, or the insert leg
    drops or duplicates a single row. Scale shape: the merge itself is
    the two-phase pruned COW commit (semi-join hit-file set, matched
    files rewritten, rest hard-linked — dml._merge)."""
    import tempfile

    from dataux_spark.engine import Engine

    td = tempfile.mkdtemp(prefix="mrg_q_")
    src = f"{td}/src"
    read_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    e = Engine(spark)
    e.register_writable_parquet("mrg_orders", src, f"{td}/work", keys=["o_orderkey"])
    feed = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        .unionByName(
            read_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 20)
            .select((F.lit(900000000) + F.col("c_custkey")).alias("k"),
                    F.col("c_acctbal").alias("p"))
        )
    )
    e.register_memory("mrg_feed_src", {"mrg_feed": feed})
    e.sql(
        "MERGE INTO mrg_orders t USING mrg_feed s ON t.o_orderkey = s.k "
        "WHEN MATCHED AND s.p > 200000 THEN DELETE "
        "WHEN MATCHED AND s.p > 150000 THEN UPDATE SET o_orderpriority = 'M-HIGH' "
        "WHEN MATCHED THEN UPDATE SET o_orderpriority = 'M-LOW' "
        "WHEN NOT MATCHED AND s.p > 1000 THEN INSERT "
        "(o_orderkey, o_orderpriority, o_totalprice) VALUES (s.k, 'M-NEW', s.p)"
    )
    return e.sql(
        "SELECT o_orderpriority, count(*) AS ct, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM mrg_orders GROUP BY o_orderpriority"
    )


# --------------------------------------------------- bench phase splits

# Store-building registry entries construct their persisted artifact
# INSIDE the query function so the driver's oracle gate stays
# self-contained — but that makes their single bench number measure the
# build, not the probe, polluting cross-round per-query comparison
# (VERDICT r7 item 3). Each entry here decomposes the same work into
#   build(spark, sf_dir) -> ctx     (timed once per bench run)
#   probe(spark, ctx)    -> DataFrame (timed per repetition)
# The registry functions above remain the correctness path; these reuse
# the identical operators so the split numbers describe the same plans.
# Entries marked once=True mutate state in probe (MERGE is not
# idempotent), so bench times their probe a single time instead of a
# median.


def _build_rollup_topk(spark, sf_dir):
    import tempfile

    from dataux_spark.operators.rollup import build_topk_rollup

    path = tempfile.mkdtemp(prefix="dataux_topk_phase_") + "/r"
    build_topk_rollup(read_table(spark, sf_dir, "events"), path,
                      item_col="user_id", capacity=8)
    return path


def _probe_rollup_topk(spark, path):
    from dataux_spark.operators.rollup import topk_over_range

    return topk_over_range(spark, path, k=10)


def _build_rollup_quantile(spark, sf_dir):
    import tempfile

    from dataux_spark.operators.rollup import build_quantile_rollup

    path = tempfile.mkdtemp(prefix="dataux_qroll_phase_") + "/r"
    build_quantile_rollup(read_table(spark, sf_dir, "events"), path, bins=128)
    return path


def _probe_rollup_quantile(spark, path):
    from dataux_spark.operators.rollup import quantile_over_range

    return quantile_over_range(spark, path, q=0.95)


def _build_simhash_hashes(spark, sf_dir):
    """Fingerprint half of dedup_simhash (VERDICT r9 item 3): the 64-agg
    simhash is the dominant ~2/3 of the fused number and — with no
    cross-branch CSE — runs once per self-join branch when unfused, so
    the fused per-query reading drowned regressions in the actual
    combination-blocking JOIN. Build = the caller-persisted hashes frame
    hamming_pairs' docstring contracts for pipelines; probe = the join."""
    from dataux_spark.operators.dedup import simhash

    h = simhash(read_table(spark, sf_dir, "documents"), "text", "doc_id").persist()
    h.count()  # materialize so the probe measures the join alone
    return h


def _probe_simhash_pairs(spark, hashes):
    from dataux_spark.operators.dedup import hamming_pairs

    return hamming_pairs(hashes, "simhash", max_hamming=3, chunks=8)


def _build_bm25_index(spark, sf_dir):
    import tempfile

    from dataux_spark.operators.text import build_bm25_index

    path = tempfile.mkdtemp(prefix="dataux_bm25_phase_") + "/i"
    build_bm25_index(read_table(spark, sf_dir, "documents"), "text", "doc_id", path)
    return path


def _probe_bm25_index(spark, path):
    from dataux_spark.operators.text import bm25_index_topk

    return bm25_index_topk(spark, path, ["spark", "query", "join"], "doc_id", k=10)


def _build_ivf_incremental(spark, sf_dir):
    import tempfile

    from dataux_spark.operators.similarity import (
        build_ivf_index_fixed,
        update_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    root = tempfile.mkdtemp(prefix="dataux_ivf_phase_")
    build_ivf_index_fixed(emb.filter(F.col("vec_id") % 2 == 0),
                          "embedding", "vec_id", root, cents)
    update_ivf_index(emb.filter(F.col("vec_id") % 2 == 1),
                     "embedding", "vec_id", root)
    return (root, _query_vecs(emb))


def _probe_ivf_incremental(spark, ctx):
    from dataux_spark.operators.similarity import ivf_index_fixed_topk

    root, qv = ctx
    return ivf_index_fixed_topk(spark, root, qv, "embedding", "vec_id", k=5, nprobe=2)


def _merge_source_frame(spark, sf_dir):
    """The COW source-copy frame _build_merge_table writes — shared with
    its build_frame fingerprint so the two cannot drift."""
    return read_table(spark, sf_dir, "orders").repartitionByRange(8, "o_orderkey")


def _build_merge_table(spark, sf_dir):
    """Setup half of dml_merge_result: copy orders into a fresh COW table
    and stage the feed — ~90% of the entry's one-shot wall time (r7
    measurement), which is parquet write throughput, not MERGE."""
    import tempfile

    from dataux_spark.engine import Engine

    td = tempfile.mkdtemp(prefix="mrg_phase_")
    src = f"{td}/src"
    _merge_source_frame(spark, sf_dir).write.parquet(src)
    e = Engine(spark)
    e.register_writable_parquet("mrg_ph_orders", src, f"{td}/work",
                                keys=["o_orderkey"])
    feed = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p"))
        .unionByName(
            read_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 20)
            .select((F.lit(900000000) + F.col("c_custkey")).alias("k"),
                    F.col("c_acctbal").alias("p"))
        )
    )
    e.register_memory("mrg_ph_feed_src", {"mrg_ph_feed": feed})
    return e


def _probe_merge(spark, e):
    """Operation half: the multi-clause MERGE itself (two-phase pruned
    COW commit) plus the final-state aggregate."""
    e.sql(
        "MERGE INTO mrg_ph_orders t USING mrg_ph_feed s ON t.o_orderkey = s.k "
        "WHEN MATCHED AND s.p > 200000 THEN DELETE "
        "WHEN MATCHED AND s.p > 150000 THEN UPDATE SET o_orderpriority = 'M-HIGH' "
        "WHEN MATCHED THEN UPDATE SET o_orderpriority = 'M-LOW' "
        "WHEN NOT MATCHED AND s.p > 1000 THEN INSERT "
        "(o_orderkey, o_orderpriority, o_totalprice) VALUES (s.k, 'M-NEW', s.p)"
    )
    return e.sql(
        "SELECT o_orderpriority, count(*) AS ct, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM mrg_ph_orders GROUP BY o_orderpriority"
    )


# build_frame (r11, VERDICT r10 item 3): the lazy frame each build phase
# WRITES, for plan-fingerprinting — sourced from the operator's own
# *_frame(s) helper (the writer calls the same function), never re-typed
# plan logic, so build-side drift is decidable from BENCH_PLANS exactly
# like probe drift. quantile's helper runs its eager min/max scalar pass
# when called; the others are fully lazy.


def _frame_rollup_topk(spark, sf_dir):
    from dataux_spark.operators.rollup import topk_rollup_frame

    return topk_rollup_frame(
        read_table(spark, sf_dir, "events"), item_col="user_id", capacity=8
    )


def _frame_rollup_quantile(spark, sf_dir):
    from dataux_spark.operators.rollup import quantile_rollup_frames

    return quantile_rollup_frames(read_table(spark, sf_dir, "events"), bins=128)[0]


def _frame_bm25_index(spark, sf_dir):
    from dataux_spark.operators.text import bm25_postings_frame

    return bm25_postings_frame(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def _frame_ivf_incremental(spark, sf_dir):
    from dataux_spark.operators.similarity import ivf_cells_frame

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    return ivf_cells_frame(
        emb.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id", cents
    )


def _frame_simhash(spark, sf_dir):
    from dataux_spark.operators.dedup import simhash

    return simhash(read_table(spark, sf_dir, "documents"), "text", "doc_id")


BENCH_PHASES: dict[str, dict] = {
    "rollup_topk_range": {"build": _build_rollup_topk,
                          "probe": _probe_rollup_topk,
                          "build_frame": _frame_rollup_topk},
    "rollup_quantile_range": {"build": _build_rollup_quantile,
                              "probe": _probe_rollup_quantile,
                              "build_frame": _frame_rollup_quantile},
    "text_bm25_index_topk": {"build": _build_bm25_index,
                             "probe": _probe_bm25_index,
                             "build_frame": _frame_bm25_index},
    "ann_ivf_incremental_topk": {"build": _build_ivf_incremental,
                                 "probe": _probe_ivf_incremental,
                                 "build_frame": _frame_ivf_incremental},
    # r10 (VERDICT r9 item 3): dedup_simhash's per-query number is
    # probe-only from BENCH_r10 on — r9's 2.50 s fused build+probe is
    # NOT comparable (the persisted-hashes probe measured ~1.06 s then)
    "dedup_simhash": {"build": _build_simhash_hashes,
                      "probe": _probe_simhash_pairs,
                      "build_frame": _frame_simhash},
    "dml_merge_result": {"build": _build_merge_table,
                         "probe": _probe_merge, "once": True,
                         "build_frame": _merge_source_frame},
}


# ------------------------------------------------------------------ export

# The external driver oracle-checks only the FIRST 50 entries of queries()
# in insertion order. Rounds 1-3 burned that entire window on the relational
# surface, so none of the LLM-pipeline operators (dedup / ANN / text /
# time-series / streaming) ever got a driver verdict. Export order is
# therefore decoupled from definition order: the never-driver-verified
# entries come first, padded to exactly 50 with a handful of relational
# regression canaries; everything that already has green CORRECTNESS_r03
# rows follows after the window.
_DRIVER_WINDOW: list[str] = [
    # Round-14 rotation (same policy as r13's: fresh driver verdicts for
    # everything whose results-path CODE changed this round, then the
    # stalest standing verdicts). Composition: (1) the TWO entries whose
    # plan fingerprint intentionally changed (text_dsir_weights — persist
    # removed from the λ spine; corpus_hygiene_pipeline — keeper-id
    # checkpoint, 10→6 scans); (2) 23 more entries whose code path was
    # touched by this round's optimizations (VALUES-literal store writes,
    # declared-cardinality state stores, parsed-expr rewrites,
    # checkpointed model censuses, named probe parameters, the gated
    # quantized kernel) — every one locally green at sf0.01 AND sf0.1
    # plus the --types audit, so this is freshness hygiene, not risk;
    # (3) fill to 50 with the 25 STALEST standing verdicts (all 21
    # remaining r9 entries — the r9 backlog is retired after this
    # window — plus the 4 oldest r10s in registry order). Staleness
    # computed from the committed CORRECTNESS_r*.json artifacts
    # (latest round each entry appears in).
    # --- (1) fingerprint-changed this round ---
    "text_dsir_weights",
    "corpus_hygiene_pipeline",
    # --- (2) results-path code touched this round ---
    "streaming_windowed_agg",
    "rollup_quantile_range",
    "streaming_quantile_merge",
    "ann_ivf_topk",
    "ann_ivf_index_topk",
    "ann_ivf_incremental_topk",
    "ann_quantized_topk",
    "embedding_cluster_assign",
    "dedup_semantic_keepset",
    "embedding_kmeans_clusters",
    "dedup_simhash",
    "dedup_simhash_md5",
    "embedding_neardup",
    "embedding_neardup_knn",
    "decontaminate_neardup",
    "text_unigram_pppl",
    "text_bigram_pppl",
    "text_bm25_index_topk",
    "rollup_cms_estimates",
    "streaming_cms_merge",
    "streaming_topk_merge",
    "streaming_distinct_merge",
    "streaming_sequence_match",
    # --- (3) stalest standing verdicts (21 r9 + 4 oldest r10) ---
    "text_repetition",
    "text_redact_pii",
    "multimodal_features",
    "text_langid_ngram",
    "multimodal_frame_sample",
    "cross_source_join",
    "correlated_subquery",
    "cte_scalar_subquery",
    "explode_top_tokens",
    "array_functions",
    "asof_join_events",
    "range_join_price_bands",
    "sessionize_stats",
    "events_gap_fill_hourly",
    "streaming_dedup",
    "streaming_session_window",
    "streaming_join",
    "pivot_status_priority",
    "percentiles",
    "dedup_keep_best",
    "dml_merge_result",
    "point_filter",
    "filter_and_or",
    "filter_like",
    "filter_in",
]



def _export_order() -> list[str]:
    missing = [n for n in _DRIVER_WINDOW if n not in _REGISTRY]
    assert not missing, f"_DRIVER_WINDOW names not registered: {missing}"
    rest = [n for n in _REGISTRY if n not in set(_DRIVER_WINDOW)]
    return _DRIVER_WINDOW + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _REGISTRY[n] for n in _export_order()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE[n] for n in _export_order() if n in ORACLE}
