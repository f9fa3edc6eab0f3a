"""FULL-tier whole-query passthrough (reference: BigQuery backend rewrites
the entire SELECT in the target dialect and runs it remotely,
backends/bigquery/sql_to_bq.go:99-104; dialect writer quote-swap at
backends/bigquery/resultreader.go:134).

The core property is polyfill equivalence: the same SQL must return the same
rows whether the FULL source executed it natively or declined and the engine
planned it in Spark — the reference's needsPolyFill contract.
"""

import pytest

from dataux_spark import Engine
from tests.conftest import SF_DIR

TABLES = {
    "customer": f"{SF_DIR}/customer.parquet",
    "orders": f"{SF_DIR}/orders.parquet",
}

SQL = (
    "SELECT c_mktsegment, count(*) AS ct, round(sum(o_totalprice), 2) AS rev "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "GROUP BY c_mktsegment"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def full_engine(spark):
    eng = Engine(spark)
    eng.register_passthrough("bq", TABLES)
    return eng


def test_full_pushdown_executes_natively(full_engine, monkeypatch):
    src = full_engine.sources["bq"]
    calls = []
    orig = src.execute_full
    monkeypatch.setattr(
        src, "execute_full", lambda spark, sql: calls.append(sql) or orig(spark, sql)
    )
    rows = _rows(full_engine.sql(SQL))
    assert calls, "FULL source was never offered the query"
    assert len(rows) == 5  # one per mktsegment


def test_polyfill_equivalence(full_engine, spark, monkeypatch):
    """Native passthrough rows == Spark-planned rows for the same SQL."""
    native = _rows(full_engine.sql(SQL))

    src = full_engine.sources["bq"]
    monkeypatch.setattr(src, "execute_full", lambda spark, sql: None)  # decline
    polyfilled = _rows(full_engine.sql(SQL))
    assert native == polyfilled


def test_decline_on_unsupported_function_falls_back(full_engine):
    """A query using an engine UDF the remote can't run is polyfilled
    transparently (reference: needsPolyFill on unsupported nodes)."""
    df = full_engine.sql(
        "SELECT hasprefix(c_name, 'Customer#0000001') AS p, count(*) AS ct "
        "FROM customer GROUP BY hasprefix(c_name, 'Customer#0000001')"
    )
    rows = _rows(df)
    assert len(rows) == 2 and {r[0] for r in rows} == {True, False}


def test_mixed_source_query_not_offered(spark):
    """Tables spanning sources → engine plan, not passthrough."""
    eng = Engine(spark)
    eng.register_passthrough("bq", {"customer": TABLES["customer"]})
    eng.register_parquet_dir("tpch", SF_DIR)
    rows = _rows(
        eng.sql(
            "SELECT count(*) AS ct FROM orders JOIN customer ON o_custkey = c_custkey"
        )
    )
    assert rows[0][0] > 0


def test_create_source_ddl_passthrough(spark):
    import json

    eng = Engine(spark)
    conf = json.dumps({"type": "passthrough", "tables": TABLES})
    eng.sql(f"CREATE SOURCE bq WITH {conf}")
    assert eng.sources["bq"].tier.value == "full"
    assert _rows(eng.sql("SELECT count(*) AS ct FROM customer"))[0][0] > 0


def test_db_backed_passthrough_remote_dml(spark, tmp_path):
    """FULL-tier remote writes (reference BigQuery write path,
    sql_to_bq.go:178-304): the whole DML statement ships to the remote
    engine, affected counts come back, and both read paths — native
    whole-query pushdown AND the declined-to-polyfill Spark plan — see
    the writes."""
    import duckdb

    from dataux_spark import Engine
    from dataux_spark.engine import QueryError
    from dataux_spark.sources.passthrough import DuckDBPassthroughSource

    db = str(tmp_path / "remote.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE bq_items (iid BIGINT, label VARCHAR, qty BIGINT)")
    con.execute("INSERT INTO bq_items VALUES (1, 'a', 10), (2, 'b', 20)")
    con.close()
    e = Engine(spark)
    e.register_source(DuckDBPassthroughSource("bqdb", db_path=db))
    assert "bq_items" in e.sources["bqdb"].tables()
    # remote INSERT (streaming-insert analog): affected count from the engine
    r = e.sql("INSERT INTO bq_items (iid, label, qty) VALUES (3, 'c', 30)")
    assert r.affected == 1
    # native whole-query read sees it
    assert e.sql("SELECT count(*) AS ct FROM bq_items").collect()[0][0] == 3
    # remote UPDATE / DELETE with affected counts
    assert e.sql("UPDATE bq_items SET qty = qty + 1 WHERE iid <= 2").affected == 2
    assert e.sql("DELETE FROM bq_items WHERE label = 'b'").affected == 1
    rows = sorted(tuple(r) for r in e.sql(
        "SELECT iid, label, qty FROM bq_items").collect())
    assert rows == [(1, "a", 11), (3, "c", 30)]
    # ...and the write really lives in the remote database file
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM bq_items").fetchone()[0] == 2
    con.close()
    # a parquet-backed (query-only) passthrough still rejects writes
    pq = str(tmp_path / "ro.parquet")
    spark.createDataFrame([(1,)], "x long").write.parquet(pq)
    e.register_source(DuckDBPassthroughSource("bqro", {"ro_items": pq}))
    with pytest.raises(QueryError, match="read-only|declined"):
        e.sql("INSERT INTO ro_items (x) VALUES (2)")


def test_db_mode_native_pushdown_and_empty_table_polyfill(spark, tmp_path):
    """Regression pair: (1) db-backed execute_full must connect to the
    database file (it once opened an empty in-memory duckdb, silently
    declining every query into the collect-the-table polyfill); (2) the
    Arrow-direct load path must survive an emptied remote table and keep
    nullable integers integral."""
    import duckdb

    from dataux_spark import Engine
    from dataux_spark.sources.passthrough import DuckDBPassthroughSource

    db = str(tmp_path / "r2.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE rt (k BIGINT, v BIGINT)")
    con.execute("INSERT INTO rt VALUES (1, NULL), (2, 20)")
    con.close()
    e = Engine(spark)
    src = DuckDBPassthroughSource("r2db", db_path=db)
    e.register_source(src)
    # native whole-query execution, not a decline
    native = src.execute_full(spark, "SELECT count(*) AS ct FROM rt")
    assert native is not None and native.collect()[0][0] == 2
    # nullable BIGINT survives the Arrow hop as an integral type
    lf = src.load(spark, "rt")
    assert dict(lf.dtypes)["v"] == "bigint"
    # empty the table remotely; both read paths must still work
    assert e.sql("DELETE FROM rt WHERE k >= 1").affected == 2
    assert e.sql("SELECT count(*) AS ct FROM rt").collect()[0][0] == 0
    assert src.load(spark, "rt").count() == 0
