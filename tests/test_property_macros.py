"""Property-based fuzzing of the dialect macro expander.

The expander (dialect.expand_macros) does textual surgery on SQL — the
invariants that must NEVER break, under arbitrary nesting/quoting:

  1. string literals pass through byte-identical (macro names inside
     quotes are data, not calls);
  2. SQL containing no macro spellings is returned unchanged;
  3. expansion output still parses and evaluates in Spark for random
     macro compositions (balanced parens survive nesting).

These are pure-python properties (no Spark for 1-2) so hypothesis can run
hundreds of cases per second.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataux_spark.dialect import expand_macros
import pytest

# multi-minute suite: excluded from the inner-loop fast path
# (`pytest -m "not slow"`); the full unmarked run remains the gate
pytestmark = pytest.mark.slow

# text fragments that LOOK like macros and must survive inside quotes
TRAPS = ["hash.md5(x)", "join(a,b)", "all(", "any(q)", "split(a,b)",
         "exists(x)", "len('s')", "eq(1,2)", "maptime('k')"]


@st.composite
def quoted_literal(draw):
    inner = draw(st.text(alphabet="abc ,()'`\"xyz.", max_size=20))
    trap = draw(st.sampled_from(TRAPS + [""]))
    body = (inner + trap).replace("'", "''")
    return f"'{body}'"


@given(lit=quoted_literal())
@settings(max_examples=300, deadline=None)
def test_literals_pass_through_untouched(lit):
    sql = f"SELECT {lit} AS v"
    out = expand_macros(sql)
    assert lit in out, f"literal mutated: {sql!r} -> {out!r}"


@given(
    cols=st.lists(
        st.sampled_from(["o_orderkey", "tbl.col", "`a.b`", "x_1"]),
        min_size=1, max_size=4,
    ),
    op=st.sampled_from(["=", "<", ">=", "<>"]),
    n=st.integers(min_value=-99, max_value=99),
)
@settings(max_examples=200, deadline=None)
def test_macro_free_sql_unchanged(cols, op, n):
    sql = f"SELECT {', '.join(cols)} FROM t WHERE {cols[0]} {op} {n}"
    assert expand_macros(sql) == sql


MACRO_EXPRS = [
    "hash.md5('a')",
    "len('abcd')",
    "split('a.b', '.')",
    "any(NULL, 'x')",
    "all('x', 1)",
    "join('a', 'b', '-')",
    "eq(1, 1)",
    "array.index(array(1, 2), 1)",
    "encoding.b64encode('q')",
]


@st.composite
def nested_macro(draw, depth=0):
    base = draw(st.sampled_from(MACRO_EXPRS))
    if depth < 2 and draw(st.booleans()):
        inner = draw(nested_macro(depth=depth + 1))
        # nest by wrapping in further calls that accept any value
        wrap = draw(st.sampled_from(["hash.md5(cast({} AS STRING))",
                                     "len(cast({} AS STRING))",
                                     "coalesce({}, NULL)"]))
        return wrap.format(inner)
    return base


@given(exprs=st.lists(nested_macro(), min_size=1, max_size=3))
@settings(max_examples=25, deadline=None)
def test_random_macro_compositions_evaluate(spark, exprs):
    sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    out = expand_macros(f"SELECT {sel}")
    assert out.count("(") == out.count(")")
    row = spark.sql(out).collect()[0]  # must parse + run
    assert len(row) == len(exprs)


# ---- round-5 rewrites: hash comments + qualified source.table names ------

from dataux_spark.dialect import split_statements  # noqa: E402


@given(lit=quoted_literal())
@settings(max_examples=300, deadline=None)
def test_hash_in_literal_survives_comment_strip(lit):
    """'#' inside a string literal is data; '#' in code starts a comment."""
    payload = lit[:-1] + "#notacomment'"
    sql = f"SELECT {payload} AS v # strip me"
    (stmt,) = split_statements(sql)
    assert payload in stmt
    assert "strip me" not in stmt


@given(
    inner=st.text(alphabet="abcxyz_ .", min_size=0, max_size=15),
    qualify=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_qualified_rewrite_never_touches_literals_or_unknown(inner, qualify):
    """The source.table rewrite fires only in table position for a
    registered (source, table) pair; literals and unknown qualifiers are
    byte-identical."""
    import re as _re

    class _FakeSrc:
        name = "fsrc"

        def tables(self):
            return ["ftbl"]

    class _Holder:
        sources = {"fsrc": _FakeSrc()}

    from dataux_spark.engine import Engine

    _Holder._QUALIFIED_REF_RE = Engine._QUALIFIED_REF_RE
    resolve = Engine._resolve_qualified_names
    ref = "fsrc.ftbl" if qualify else "nodb.ftbl"
    lit = "'" + inner.replace("'", "") + " fsrc.ftbl'"
    sql = f"SELECT {lit} AS s FROM {ref}"
    out = resolve(_Holder(), sql)
    assert lit in out, f"literal mutated: {out!r}"
    if qualify:
        assert _re.search(r"FROM\s+ftbl$", out)
    else:
        assert out == sql


# --------------------------------------------------------- DML sequences

_dml_op = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 9), st.integers(0, 99)),
    st.tuples(st.just("upsert"), st.integers(0, 9), st.integers(0, 99)),
    st.tuples(st.just("delete_lt"), st.integers(0, 9), st.just(0)),
    st.tuples(st.just("update_add"), st.integers(0, 9), st.integers(1, 5)),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(ops=st.lists(_dml_op, min_size=1, max_size=6), seq=st.integers(0, 10**9))
def test_random_dml_sequences_match_model(spark, ops, seq):
    """Random INSERT/UPSERT/DELETE/UPDATE sequences against a keyed memory
    table must leave exactly the state a row-list model predicts — plain
    INSERT appends (even duplicate keys), UPSERT replaces on the declared
    key, DELETE/UPDATE hit the same predicate rows, and every statement's
    affected-count matches the model's."""
    from dataux_spark import Engine

    t = f"dmlfuzz{seq % 100000}"
    e = Engine(spark)
    e.register_memory(
        "dmlfz" + t,
        {t: spark.createDataFrame([(0, 50)], "id long, v long")},
        keys={t: ["id"]},
    )
    model = [(0, 50)]
    for op, k, v in ops:
        if op == "insert":
            r = e.sql(f"INSERT INTO {t} (id, v) VALUES ({k}, {v})")
            model.append((k, v))
            assert r.affected == 1
        elif op == "upsert":
            r = e.sql(f"UPSERT INTO {t} (id, v) VALUES ({k}, {v})")
            model = [m for m in model if m[0] != k] + [(k, v)]
            assert r.affected == 1
        elif op == "delete_lt":
            r = e.sql(f"DELETE FROM {t} WHERE id < {k}")
            hit = [m for m in model if m[0] < k]
            model = [m for m in model if not m[0] < k]
            assert r.affected == len(hit)
        else:  # update_add
            r = e.sql(f"UPDATE {t} SET v = v + {v} WHERE id >= {k}")
            hit = [m for m in model if m[0] >= k]
            model = [(i, val + v) if i >= k else (i, val) for i, val in model]
            assert r.affected == len(hit)
    got = sorted(tuple(r) for r in e.sql(f"SELECT id, v FROM {t}").collect())
    assert got == sorted(model), (ops, got, sorted(model))


# ------------------------------------------------------ malformed input

_valid = [
    "SELECT o_orderkey FROM orders WHERE o_orderkey = 42",
    "SELECT count(*) AS ct FROM lineitem GROUP BY l_returnflag",
    "SHOW TABLES",
    "INSERT INTO nowhere (a) VALUES (1)",
    'SET @x = "y"',
]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(base=st.sampled_from(_valid), cut=st.integers(1, 40),
       junk=st.sampled_from(["", " FROM", " )", " WHERE", " 'x", " ;;", " `"]))
def test_malformed_sql_raises_queryerror_never_crashes(spark, base, cut, junk):
    """Truncated/mangled statements must either run (if still valid) or
    raise the engine's graceful QueryError — never a raw Py4J/analysis
    traceback and never a crash. The reference's frontend has the same
    contract: every protocol error becomes a MySQL error packet."""
    from dataux_spark import Engine
    from dataux_spark.engine import QueryError

    e = Engine(spark)
    e.register_parquet_dir("fuzzbad", "/root/testdata/sf0.001")
    sql = base[: max(8, len(base) - cut)] + junk
    try:
        e.sql(sql)
    except QueryError:
        pass  # the contract: graceful, typed, message-bearing


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(ops=st.lists(_dml_op, min_size=1, max_size=5), seq=st.integers(0, 10**9))
def test_random_dml_sequences_match_model_doc_store(spark, tmp_path_factory, ops, seq):
    """The same model-based DML fuzz through the DOC-STORE tier: the
    mongo-style mutator (file-backed Put/DeleteExpression) must leave
    exactly the state the row-list model predicts, with matching
    affected-counts, under random statement sequences."""
    import json as _json

    from dataux_spark import Engine
    from dataux_spark.sources.mongo_style import MongoStyleSource

    d = tmp_path_factory.mktemp("dmlfz_doc")
    t = f"mgfz{seq % 100000}"
    (d / "c.json").write_text(_json.dumps([{"id": 0, "v": 50}]))
    e = Engine(spark)
    e.register_source(MongoStyleSource("s" + t, {t: f"file://{d}/c.json"}))
    model = [(0, 50)]
    for op, k, v in ops:
        if op == "insert":
            r = e.sql(f"INSERT INTO {t} (id, v) VALUES ({k}, {v})")
            model.append((k, v))
            assert r.affected == 1
        elif op == "upsert":
            r = e.sql(f"UPSERT INTO {t} (id, v) VALUES ({k}, {v})")
            model = [m for m in model if m[0] != k] + [(k, v)]
            assert r.affected == 1
        elif op == "delete_lt":
            r = e.sql(f"DELETE FROM {t} WHERE id < {k}")
            hit = [m for m in model if m[0] < k]
            model = [m for m in model if not m[0] < k]
            assert r.affected == len(hit)
        else:
            r = e.sql(f"UPDATE {t} SET v = v + {v} WHERE id >= {k}")
            hit = [m for m in model if m[0] >= k]
            model = [(i, val + v) if i >= k else (i, val) for i, val in model]
            assert r.affected == len(hit)
    got = sorted(tuple(r) for r in e.sql(f"SELECT id, v FROM {t}").collect())
    assert got == sorted(model), (ops, got, sorted(model))


_cql_op = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 2), st.integers(0, 3), st.integers(0, 99)),
    st.tuples(st.just("delete_ge"), st.integers(0, 99), st.just(0), st.just(0)),
    st.tuples(st.just("update_add"), st.integers(0, 2), st.just(0), st.integers(1, 5)),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(ops=st.lists(_cql_op, min_size=1, max_size=5), seq=st.integers(0, 10**9))
def test_random_cql_sequences_match_model(spark, tmp_path_factory, ops, seq):
    """CQL-semantics fuzz: a dict keyed by the FULL (partition, clustering)
    key models the table — INSERT always replaces on that key (no
    duplicates can exist), UPDATE applies per key, DELETE by predicate.
    Affected counts and final state must match."""
    import json as _json

    from dataux_spark import Engine
    from dataux_spark.infer import TableMeta
    from dataux_spark.sources.cassandra_style import CassandraStyleSource

    d = tmp_path_factory.mktemp("cqlfz")
    t = f"cqlfz{seq % 100000}"
    (d / "t.json").write_text(_json.dumps([{"p": 0, "c": 0, "v": 50}]))
    meta = TableMeta(name=t, schema=None, partition_keys=["p"], clustering_keys=["c"])
    e = Engine(spark)
    e.register_source(CassandraStyleSource("s" + t, {t: (f"file://{d}/t.json", meta)}))
    model = {(0, 0): 50}
    for op, a, b, v in ops:
        if not model:  # emptied table: schemaless edge covered elsewhere
            break
        if op == "insert":
            r = e.sql(f"INSERT INTO {t} (p, c, v) VALUES ({a}, {b}, {v})")
            model[(a, b)] = v  # CQL INSERT == upsert on the primary key
            assert r.affected == 1
        elif op == "delete_ge":
            r = e.sql(f"DELETE FROM {t} WHERE v >= {a}")
            hit = [k for k, val in model.items() if val >= a]
            for k in hit:
                del model[k]
            assert r.affected == len(hit)
        else:
            r = e.sql(f"UPDATE {t} SET v = v + {v} WHERE p = {a}")
            hit = [k for k in model if k[0] == a]
            for k in hit:
                model[k] += v
            assert r.affected == len(hit)
    got = sorted(tuple(r) for r in e.sql(f"SELECT p, c, v FROM {t}").collect())
    want = sorted((p, c, v) for (p, c), v in model.items())
    if model:
        assert got == want, (ops, got, want)
