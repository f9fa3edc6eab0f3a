"""Wire-serving smoke test — the round-6 decision on the reference's
MySQL-listener surface (vendored/mixer/proxy/listener.go:25-100,
frontends/mysqlfe/mysql_handler.go:130-166).

Decision (SURVEY §7.1): wire compatibility is permanently out of scope;
`Engine.sql()` is the parity contract. The engine is a library over any
SparkSession, so Spark's own serving layers (Spark Connect, Thrift
JDBC/ODBC server) expose it to remote clients unchanged. This test proves
that claim end-to-end wherever the Connect client dependency (grpcio) is
installed: it builds a `builder.remote("local[2]")` session — a REAL
client/server round trip through the Connect wire protocol, not a classic
in-process session — and drives `Engine.sql()` through it.

The benchmark container ships without grpcio (and pip installs are
disallowed), so here the test documents the path and skips.
"""

from __future__ import annotations

import pytest

grpc = pytest.importorskip("grpc", reason="Spark Connect client needs grpcio")


def test_engine_sql_through_spark_connect_session():
    from pyspark.sql import SparkSession

    remote = (
        SparkSession.builder.remote("local[2]")
        .appName("wire-serving-smoke")
        .getOrCreate()
    )
    try:
        from dataux_spark import Engine

        eng = Engine(remote)
        eng.register_memory(
            "wiremem",
            {"wire_t": remote.createDataFrame([(1, "a"), (2, "b")], "k long, v string")},
        )
        rows = eng.sql("SELECT v FROM wire_t WHERE k = 2").collect()
        assert [tuple(r) for r in rows] == [("b",)]
        eng.sql("SET @who = 'connect'")
        assert eng.sql("SELECT @who AS w").collect()[0][0] == "connect"
    finally:
        remote.stop()
