"""BigTable-style family→table discovery (reference: each column family is
a table whose Parent is the physical bigtable, columns inferred from ~10
rows, scanned with a FamilyFilter —
/root/reference/backends/bigtable/source.go:186-274)."""

import json

import pytest

from dataux_spark import Engine
from dataux_spark.infer import infer_family_tables
from dataux_spark.sources.bigtable_style import FamilyTableSource

# physical bigtable `events_bt`: cells keyed family:qualifier, sparse
ROWS = [
    {"rowkey": "u1", "profile:name": "Ann", "profile:age": 34,
     "activity:last_login": "2026-01-01", "activity:logins": 12},
    {"rowkey": "u2", "profile:name": "Bob",
     "activity:last_login": "2026-02-02", "activity:logins": 3},
    {"rowkey": "u3", "profile:name": "Cid", "profile:age": 51},  # no activity
]
# row 11+ would introduce a qualifier discovery must NOT see (sample cap)
LATE = [{"rowkey": f"x{i}", "profile:name": f"N{i}"} for i in range(7)] + [
    {"rowkey": "x99", "profile:ghost_qual": "late", "profile:name": "Zed"}
]


def test_sampled_family_discovery_caps_at_n():
    tables = infer_family_tables(ROWS + LATE, sample_n=10)
    assert set(tables) == {"profile", "activity"}
    assert [f.name for f in tables["profile"].fields] == ["rowkey", "name", "age"]
    # 11th row's ghost_qual is beyond the sample window — not discovered
    assert "ghost_qual" not in [f.name for f in tables["profile"].fields]
    assert [f.name for f in tables["activity"].fields] == [
        "rowkey", "last_login", "logins",
    ]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bt")
    (d / "events_bt.json").write_text(json.dumps(ROWS))
    e = Engine(spark)
    e.register_source(
        FamilyTableSource("bt", {"events_bt": f"file://{d}/events_bt.json"})
    )
    return e


def test_each_family_is_a_table_with_parent(eng):
    src = eng.sources["bt"]
    assert sorted(src.tables()) == ["activity", "profile"]
    assert src.parent == {"activity": "events_bt", "profile": "events_bt"}


@pytest.mark.slow  # multi-10s (r13 fast-path trim)
def test_family_filter_drops_cell_less_rows(eng):
    # u3 has no activity cells → FamilyFilter semantics exclude it
    rows = eng.sql("SELECT rowkey FROM activity ORDER BY rowkey").collect()
    assert [r[0] for r in rows] == ["u1", "u2"]
    prof = eng.sql("SELECT rowkey, name, age FROM profile ORDER BY rowkey").collect()
    assert [tuple(r) for r in prof] == [
        ("u1", "Ann", 34), ("u2", "Bob", None), ("u3", "Cid", 51),
    ]


def test_families_recompose_via_rowkey_join(eng):
    out = eng.sql(
        "SELECT p.name, a.logins FROM profile p "
        "JOIN activity a ON p.rowkey = a.rowkey "
        "WHERE a.logins > 5"
    ).collect()
    assert [tuple(r) for r in out] == [("Ann", 12)]


@pytest.mark.slow  # multi-10s (r13 fast-path trim)
def test_bigtable_family_mutations_rowkey_upsert(spark, tmp_path):
    """BigTable mutation semantics through the engine (reference
    sql_to_bt.go:242-396: SetCell per column keyed by the row key,
    deletes remove this family's cells): INSERT upserts on the rowkey
    within the family, a delete drops the row from THIS family table
    while other families keep it."""
    import json as _json

    from dataux_spark import Engine

    (tmp_path / "bt.json").write_text(_json.dumps(ROWS))
    e = Engine(spark)
    e.register_source(FamilyTableSource("btdml", {"bt_phys": f"file://{tmp_path}/bt.json"}))
    # new rowkey appends into the family
    r = e.sql('INSERT INTO profile (rowkey, name, age) VALUES ("u4", "Dee", 28)')
    assert r.affected == 1
    assert e.sql("SELECT count(*) AS ct FROM profile").collect()[0][0] == 4
    # existing rowkey replaces this family's cells, count unchanged
    r = e.sql('INSERT INTO profile (rowkey, name, age) VALUES ("u1", "Anna", 35)')
    assert r.affected == 1
    assert e.sql("SELECT count(*) AS ct FROM profile").collect()[0][0] == 4
    assert [tuple(x) for x in e.sql(
        'SELECT name, age FROM profile WHERE rowkey = "u1"').collect()] == [("Anna", 35)]
    # ...and the activity family still sees u1 untouched
    assert e.sql('SELECT logins FROM activity WHERE rowkey = "u1"').collect()[0][0] == 12
    # delete from one family: row vanishes from profile, survives in activity
    r = e.sql('DELETE FROM profile WHERE rowkey = "u2"')
    assert r.affected == 1
    assert e.sql('SELECT count(*) AS ct FROM profile WHERE rowkey = "u2"').collect()[0][0] == 0
    assert e.sql('SELECT count(*) AS ct FROM activity WHERE rowkey = "u2"').collect()[0][0] == 1
    # update read-modify-writes within the family
    r = e.sql('UPDATE profile SET age = age + 1 WHERE rowkey = "u3"')
    assert r.affected == 1
    assert e.sql('SELECT age FROM profile WHERE rowkey = "u3"').collect()[0][0] == 52


def test_bigtable_update_preserves_sibling_families(spark, tmp_path):
    """UPDATE routed through overwrite() must strip only THIS family's
    cells: u1 has activity cells, and updating its profile row must leave
    them untouched (regression: overwrite once dropped every doc that had
    any cell in the updated family, destroying sibling families)."""
    import json as _json

    from dataux_spark import Engine

    (tmp_path / "bt.json").write_text(_json.dumps(ROWS))
    e = Engine(spark)
    e.register_source(FamilyTableSource("btow", {"bt_p": f"file://{tmp_path}/bt.json"}))
    r = e.sql('UPDATE profile SET age = 99 WHERE rowkey = "u1"')
    assert r.affected == 1
    assert e.sql('SELECT age FROM profile WHERE rowkey = "u1"').collect()[0][0] == 99
    # sibling family survives for BOTH updated and untouched rows
    assert e.sql("SELECT count(*) AS ct FROM activity").collect()[0][0] == 2
    assert e.sql('SELECT logins FROM activity WHERE rowkey = "u1"').collect()[0][0] == 12
    assert e.sql('SELECT logins FROM activity WHERE rowkey = "u2"').collect()[0][0] == 3
