"""qlbridge builtin-library surface through Engine.sql().

The reference loads qlbridge's entire builtin function library
(frontends/mysqlfe/testmysql/runtestserver.go:74 — builtins.LoadAllBuiltins),
so its dialect accepts these spellings.  Dialect macros expand them to
JVM-native Spark expressions (dialect.expand_macros); only the strftime
formatter and the url/ua helpers are Python UDFs.
"""

import hashlib

import pytest


def one(eng, expr, alias="v"):
    return eng.sql(f"SELECT {expr} AS {alias}").collect()[0][alias]


def test_hash_family(engine):
    assert one(engine, "hash.md5('a')") == hashlib.md5(b"a").hexdigest()
    assert one(engine, "hash.sha1('a')") == hashlib.sha1(b"a").hexdigest()
    assert one(engine, "hash.sha256('a')") == hashlib.sha256(b"a").hexdigest()
    assert one(engine, "hash.sha512('a')") == hashlib.sha512(b"a").hexdigest()
    # sip-hash stand-in: deterministic 64-bit
    v1, v2 = one(engine, "hash.sip('abc')"), one(engine, "hash.sip('abc')")
    assert isinstance(v1, int) and v1 == v2
    assert one(engine, "hash.sip('abc')") != one(engine, "hash.sip('abd')")


def test_encoding_roundtrip(engine):
    assert one(engine, "encoding.b64encode('hello')") == "aGVsbG8="
    assert one(engine, "encoding.b64decode(encoding.b64encode('hello'))") == "hello"


def test_json_jmespath(engine):
    assert one(engine, "json.jmespath('{\"a\": {\"b\": 3}}', 'a.b')") == "3"
    assert one(engine, "json.jmespath('{\"name\": \"x\"}', 'name')") == "x"


def test_array_index_slice(engine):
    # qlbridge arrays are 0-based
    assert one(engine, "array.index(array(10, 20, 30), 1)") == 20
    assert one(engine, "array.slice(array(1, 2, 3, 4), 1, 3)") == [2, 3]
    assert one(engine, "array.slice(array(1, 2, 3, 4), 2)") == [3, 4]


def test_join_builtin_vs_join_keyword(engine):
    # function form: separator last (qlbridge) → concat_ws (separator first)
    assert one(engine, "join('a', 'b', 'c', '-')") == "a-b-c"
    # JOIN keyword followed by a subquery must NOT be treated as the builtin
    rows = engine.sql(
        "SELECT n.n_name FROM nation n JOIN (SELECT 0 AS rk) r ON n.n_regionkey = r.rk"
    ).collect()
    assert len(rows) > 0


def test_len_mapinvert(engine):
    assert one(engine, "len('abcd')") == 4
    assert one(engine, "mapinvert(map('a', '1', 'b', '2'))") == {"1": "a", "2": "b"}


def test_extract_strftime(engine):
    assert one(engine, "extract(todate('2020-02-03'), '%Y/%m')") == "2020/02"
    # ANSI EXTRACT must survive untouched
    assert one(engine, "EXTRACT(YEAR FROM DATE '2020-02-03')") == 2020


def test_unixtrunc_utc(engine):
    assert one(engine, "unixtrunc(timestamp'2020-01-01 00:00:00Z')") == "1577836800"
    assert one(engine, "unixtrunc(timestamp'2020-01-01 00:00:00Z', 'ms')") == "1577836800000"


def test_hourofweek(engine):
    # 2020-02-03 is a Monday; Go weekday Monday=1 → 1*24 + 5
    assert one(engine, "hourofweek(timestamp'2020-02-03 05:00:00')") == 29


def test_seconds(engine):
    assert one(engine, "seconds('1:30')") == 90.0
    assert one(engine, "seconds('01:01:01')") == 3661.0
    assert one(engine, "seconds('2.5')") == 2.5
    assert one(engine, "seconds('junk')") is None


def test_url_family(engine):
    u = "'http://www.example.io/blog/x?utm=1&k=2'"
    assert one(engine, f"urlmain({u})") == "www.example.io/blog/x"
    assert one(engine, f"urlminusqs({u}, 'utm')") == "http://www.example.io/blog/x?k=2"
    assert one(engine, "urldecode('a%20b+c')") == "a b c"


def test_useragent_heuristic(engine):
    bot = "'Mozilla/5.0 (compatible; Googlebot/2.1)'"
    chrome = "'Mozilla/5.0 (Windows NT 10.0) Chrome/120.0'"
    assert one(engine, f"useragent({bot}, 'bot')") == "true"
    assert one(engine, f"useragent({chrome}, 'bot')") == "false"
    assert one(engine, f"useragent({chrome}, 'browser')") == "chrome"
    assert one(engine, f"useragent({chrome}, 'os')") == "windows"


def test_macros_inside_where(engine):
    rows = engine.sql(
        "SELECT c_custkey FROM customer "
        "WHERE len(c_name) > 0 AND hash.md5(c_name) IS NOT NULL LIMIT 5"
    ).collect()
    assert len(rows) == 5


def test_function_form_comparisons(engine):
    r = engine.sql(
        "SELECT eq(1, 1) AS a, ne('x', 'y') AS b, gt(2, 1) AS c, "
        "ge(2, 2) AS d, lt(1, 2) AS e, le(3, 2) AS f, not(eq(1, 2)) AS g"
    ).collect()[0]
    assert (r.a, r.b, r.c, r.d, r.e, r.f, r.g) == (
        True, True, True, True, True, False, True,
    )


def test_split_plain_string_not_regex(engine):
    # qlbridge split is strings.Split — '.' and '|' are literal separators
    assert one(engine, "split('a.b.c', '.')") == ["a", "b", "c"]
    assert one(engine, "split('x|y', '|')") == ["x", "y"]
    assert one(engine, "split('25-989-741', '-')") == ["25", "989", "741"]


def test_any_all_builtins(engine):
    # any = at least one value exists; all = all truthy (qlbridge Any/All)
    assert one(engine, "any(NULL, 'x')") is True
    assert one(engine, "any(NULL, NULL)") is False
    assert one(engine, "all('x', 1)") is True
    assert one(engine, "all('', 'x')") is False
    assert one(engine, "all('x', false)") is False
    assert one(engine, "all('x', 0)") is False


def test_any_all_keyword_guard(engine):
    # UNION/EXCEPT ALL (SELECT..) keep ALL as the SQL keyword, untouched
    # (Spark has no quantified `> ANY (subq)` predicate to guard for)
    assert engine.sql("SELECT 1 AS x UNION ALL (SELECT 2 AS x)").count() == 2
    assert engine.sql("SELECT 1 AS x EXCEPT ALL (SELECT 2 AS x)").count() == 1


def test_maptime(engine):
    m = one(engine, "maptime('k', '2020-01-01')")
    assert list(m) == ["k"] and m["k"].year == 2020
    m1 = one(engine, "maptime('k')")  # 1-arg: now()
    assert list(m1) == ["k"] and m1["k"].year >= 2026


def test_domains_hosts_plural(engine):
    assert one(
        engine, "domains('http://www.a.com/x', 'http://sub.b.org/y', NULL)"
    ) == ["a.com", "b.org"]
    assert one(engine, "hosts('http://www.a.com/x')") == ["www.a.com"]


def test_native_passthrough_builtins(engine):
    # qlbridge names that coincide with Spark natives need no macro
    assert one(engine, "contains('abc', 'b')") is True
    assert one(engine, "replace('a-b', '-', '.')") == "a.b"
    assert one(engine, "pow(2, 10)") == 1024.0
    assert one(engine, "sqrt(9)") == 3.0
    assert len(one(engine, "uuid()")) == 36


def test_function_form_comparisons_in_where(engine):
    # numeric coercion like qlbridge: eq("5", 5) is true via implicit cast
    rows = engine.sql(
        "SELECT c_custkey FROM customer WHERE gt(c_custkey, 10) "
        "AND ne(c_mktsegment, 'BUILDING') AND le(c_custkey, 50)"
    ).collect()
    assert rows and all(10 < r.c_custkey <= 50 for r in rows)
    assert engine.sql("SELECT eq('5', 5) AS x").collect()[0].x is True


def test_typewriter(engine):
    row = engine.sql(
        "SELECT typewriter('42') AS i, typewriter('3.14') AS n, typewriter('true') AS b, "
        "typewriter('2016-01-02 15:04:05') AS t, typewriter('hello world') AS s"
    ).collect()[0]
    assert (row.i, row.n, row.b, row.t, row.s) == (
        "bigint", "double", "tinyint", "datetime", "varchar(255)",
    )


def test_useragent_map(engine):
    m = one(engine, "useragent.map('Mozilla/5.0 (Windows NT 10.0) Chrome/120.0')")
    assert m == {"bot": "false", "browser": "chrome", "os": "windows"}


def test_dialect_udfs_are_arrow_batched_not_row_at_a_time(engine):
    """Every dialect shim is an Arrow-batched pandas UDF: the physical
    plan must show ArrowEvalPython, never BatchEvalPython (the
    row-at-a-time path whose per-row pickling is the 10-100x slow
    path this registry explicitly bans)."""
    import contextlib
    import io

    df = engine.sql(
        "SELECT toint(CAST(c_custkey AS STRING)) AS i, email('A@B.com') AS e, "
        "host('https://x.org/p') AS h, useragent('Chrome', 'browser') AS ua "
        "FROM customer LIMIT 5"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_add_function_promotes_plain_callables_to_arrow(engine):
    engine.add_function("shout2", lambda s: s.upper() + "!" if s else None)
    import contextlib
    import io

    df = engine.sql("SELECT shout2(c_mktsegment) AS x FROM customer LIMIT 3")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "BatchEvalPython" not in buf.getvalue()
    assert all(r.x.endswith("!") for r in df.collect())


def test_hasprefix_loose_typing_never_errors(engine):
    """ADVICE r9: the native startswith/endswith rewrite must keep
    qlbridge's parse-what-you-can contract — a non-string argument
    coerces (CAST ... AS STRING guard) instead of raising an
    AnalysisException under Spark 4's ANSI typing. Accepted deviation
    from the retired pandas shim (which returned NULL): the guarded form
    compares the value's string form (COVERAGE.md §2.2)."""
    # c_custkey is bigint — pre-guard this raised UNRESOLVED/ANSI errors
    rows = engine.sql(
        "SELECT c_custkey, hasprefix(c_custkey, '1') AS p, "
        "hassuffix(c_custkey, 5) AS s "
        "FROM customer WHERE c_custkey IN (1, 15) ORDER BY c_custkey"
    ).collect()
    assert [(r.p, r.s) for r in rows] == [(True, False), (True, True)]
