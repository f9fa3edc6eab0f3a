"""Function-shim surface (qlbridge builtin spellings) and parquet-backed
copy-on-write DML."""

import pytest
from pyspark.sql import Row

from dataux_spark import Engine


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    df = spark.createDataFrame(
        [
            Row(id=1, s="  Hello ", num="42", f="3.5", b="yes",
                mail="Bob@Example.COM", url="https://sub.example.com/a/b?x=1&y=2"),
            Row(id=2, s="world", num="nope", f=None, b="0",
                mail="not-an-email", url=None),
        ]
    )
    e.register_memory("fnsrc", {"t": df})
    return e


def one(eng, expr):
    return eng.sql(f"SELECT {expr} AS v FROM t WHERE id = 1").collect()[0][0]


def test_rename_shims(eng):
    assert one(eng, "tolower(s)") == "  hello "
    assert one(eng, "toupper(strip(s))") == "HELLO"
    assert one(eng, "oneof(f, num)") == "3.5"        # first non-null
    assert eng.sql("SELECT oneof(f, num) AS v FROM t WHERE id = 2").collect()[0][0] == "nope"


def test_conversion_shims(eng):
    assert one(eng, "toint(num)") == 42
    assert one(eng, 'toint("1,234")') == 1234
    assert eng.sql("SELECT toint(num) AS v FROM t WHERE id = 2").collect()[0][0] is None
    assert one(eng, "tonumber(f)") == 3.5
    assert one(eng, "tobool(b)") is True
    assert eng.sql("SELECT tobool(b) AS v FROM t WHERE id = 2").collect()[0][0] is False


def test_email_url_shims(eng):
    assert one(eng, "email(mail)") == "bob@example.com"
    assert one(eng, "emaildomain(mail)") == "example.com"
    assert one(eng, "emailname(mail)") == "bob"
    assert eng.sql("SELECT email(mail) AS v FROM t WHERE id = 2").collect()[0][0] is None
    assert one(eng, "host(url)") == "sub.example.com"
    assert one(eng, "domain(url)") == "example.com"
    assert one(eng, "urlpath(url)") == "/a/b"
    assert one(eng, 'qs(url, "y")') == "2"


def test_date_part_shims(eng, spark):
    e2 = Engine(spark)
    e2.register_memory("datesrc", {"d": spark.sql(
        "SELECT timestamp '2024-03-15 13:45:00' AS ts"
    )})
    row = e2.sql("SELECT yy(ts) AS y, mm(ts) AS m, dd(ts) AS d, hourofday(ts) AS h FROM d").collect()[0]
    assert tuple(row) == (2024, 3, 15, 13)


def test_merge_into(spark):
    eng = Engine(spark)
    target = spark.createDataFrame(
        [Row(id=1, name="a", qty=10), Row(id=2, name="b", qty=20), Row(id=3, name="c", qty=30)]
    )
    updates = spark.createDataFrame(
        [Row(id=2, name="b2", qty=5), Row(id=4, name="d", qty=40)]
    )
    eng.register_memory("mrg", {"tgt": target, "src": updates})
    r = eng.sql(
        "MERGE INTO tgt t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET name = s.name, qty = t.qty + s.qty "
        "WHEN NOT MATCHED THEN INSERT (id, name, qty) VALUES (s.id, s.name, s.qty)"
    )
    assert r.affected == 2  # 1 matched + 1 inserted
    rows = {r.id: (r.name, r.qty) for r in eng.sql("SELECT * FROM tgt").collect()}
    assert rows == {1: ("a", 10), 2: ("b2", 25), 3: ("c", 30), 4: ("d", 40)}


def test_parquet_backed_dml_roundtrip(spark, sf_dir, tmp_path):
    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_rw", f"{sf_dir}/nation.parquet", str(tmp_path / "nation_work"), keys=["n_nationkey"]
    )
    n0 = eng.sql("SELECT count(*) AS ct FROM nation_rw").collect()[0][0]
    r = eng.sql('INSERT INTO nation_rw (n_nationkey, n_name, n_regionkey) VALUES (999, "ATLANTIS", 0)')
    assert r.affected == 1
    assert eng.sql("SELECT count(*) AS ct FROM nation_rw").collect()[0][0] == n0 + 1

    r = eng.sql('UPDATE nation_rw SET n_name = "LEMURIA" WHERE n_nationkey = 999')
    assert r.affected == 1
    assert eng.sql("SELECT n_name FROM nation_rw WHERE n_nationkey = 999").collect()[0][0] == "LEMURIA"

    r = eng.sql('UPSERT INTO nation_rw (n_nationkey, n_name, n_regionkey) VALUES (999, "MU", 1)')
    assert r.affected == 1
    assert eng.sql("SELECT n_name FROM nation_rw WHERE n_nationkey = 999").collect()[0][0] == "MU"
    assert eng.sql("SELECT count(*) AS ct FROM nation_rw").collect()[0][0] == n0 + 1

    r = eng.sql("DELETE FROM nation_rw WHERE n_nationkey = 999")
    assert r.affected == 1
    assert eng.sql("SELECT count(*) AS ct FROM nation_rw").collect()[0][0] == n0

    # versioned copy-on-write dirs exist (v000000 initial + 4 commits)
    versions = sorted(p.name for p in (tmp_path / "nation_work").iterdir())
    assert versions == [f"v{i:06d}" for i in range(5)]


def test_time_travel_version_as_of(spark, sf_dir, tmp_path):
    """VERSION AS OF reads a historical copy-on-write snapshot (extension;
    Delta time-travel semantics over the versioned parquet store)."""
    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_tt", f"{sf_dir}/nation.parquet", str(tmp_path / "tt_work"),
        keys=["n_nationkey"],
    )
    n0 = eng.sql("SELECT count(*) AS ct FROM nation_tt").collect()[0][0]
    eng.sql('INSERT INTO nation_tt (n_nationkey, n_name, n_regionkey) VALUES (777, "OZ", 0)')
    eng.sql("DELETE FROM nation_tt WHERE n_nationkey = 777")

    assert eng.sql("SELECT count(*) AS ct FROM nation_tt").collect()[0][0] == n0
    assert eng.sql(
        "SELECT count(*) AS ct FROM nation_tt VERSION AS OF 0"
    ).collect()[0][0] == n0
    assert eng.sql(
        "SELECT count(*) AS ct FROM nation_tt VERSION AS OF 1"
    ).collect()[0][0] == n0 + 1
    # qualified columns resolve through the alias
    assert eng.sql(
        "SELECT nation_tt.n_name FROM nation_tt VERSION AS OF 1 "
        "WHERE nation_tt.n_nationkey = 777"
    ).collect()[0][0] == "OZ"
    # history surface
    hist = eng.sql("SHOW VERSIONS FROM nation_tt").collect()
    assert [r.version for r in hist] == [0, 1, 2]
    # out-of-range version is a graceful QueryError
    import pytest as _pt

    with _pt.raises(Exception):
        eng.sql("SELECT count(*) AS ct FROM nation_tt VERSION AS OF 9")


def test_repl_render_shapes(spark, sf_dir):
    """tools/repl.py result formatting: resultset grid, DML summary, OK."""
    import sys
    sys.path.insert(0, "tools")
    from repl import render

    from dataux_spark.dml import DmlResult

    eng = Engine(spark)
    eng.register_parquet_dir("tpch_repl", sf_dir)
    grid = render(eng.sql("SELECT n_name FROM nation WHERE n_nationkey = 0"))
    assert "n_name" in grid and "NATION_0" in grid and grid.endswith("1 row")
    assert render(DmlResult(3)) == "Query OK, 3 rows affected"
    assert render(None) == "OK"


def test_insert_select_append(spark, sf_dir):
    """INSERT INTO t SELECT ... appends a query result (positional with a
    column list, by-name without), with affected-row counts and
    read-your-writes."""
    from dataux_spark import Engine

    e = Engine(spark)
    e.register_parquet_dir("insel_tpch", sf_dir)
    empty = spark.createDataFrame([], "k long, name string")
    e.register_memory("insel_mem", {"insel_target": empty})
    r = e.sql(
        "INSERT INTO insel_target (k, name) "
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1"
    )
    assert r.affected == 5
    assert e.sql("SELECT count(*) AS ct FROM insel_target").collect()[0][0] == 5
    # by-name mapping, missing target col -> NULL via alignment
    r2 = e.sql("INSERT INTO insel_target SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 2")
    assert r2.affected == 5
    rows = e.sql("SELECT k, name FROM insel_target ORDER BY k").collect()
    assert len(rows) == 10 and sum(1 for r in rows if r.name is None) == 5


def test_pruned_cow_rewrites_only_matched_files(spark, sf_dir, tmp_path):
    """File-pruned copy-on-write: a selective UPDATE/DELETE on a
    parquet-backed table rewrites ONLY the part-files containing matched
    rows — untouched files carry into the new version as hard links
    (same inode), while results and time travel stay exact."""
    import os

    work = tmp_path / "pruned_work"
    # spread orders across many part files so pruning has something to skip
    src = str(tmp_path / "orders_multi")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("orders_rw", src, str(work), keys=["o_orderkey"])
    total = eng.sql("SELECT count(*) AS ct FROM orders_rw").collect()[0][0]
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_rw").collect()[0][0]

    r = eng.sql(f"UPDATE orders_rw SET o_orderstatus = 'Z' WHERE o_orderkey = {lo}")
    assert r.affected == 1
    assert eng.sql(
        f"SELECT o_orderstatus FROM orders_rw WHERE o_orderkey = {lo}"
    ).collect()[0][0] == "Z"
    assert eng.sql("SELECT count(*) AS ct FROM orders_rw").collect()[0][0] == total

    v0, v1 = work / "v000000", work / "v000001"
    def parts(d):
        return sorted(p for p in os.listdir(d) if p.startswith("part-") and not p.endswith(".crc"))
    linked = [p for p in parts(v1) if p in parts(v0)
              and os.stat(v1 / p).st_ino == os.stat(v0 / p).st_ino]
    rewritten = [p for p in parts(v1) if p not in parts(v0)]
    # range-partitioned on the key: exactly one file matched the point
    # predicate, the other seven hard-linked through
    assert len(linked) == 7 and rewritten
    # time travel still sees the pre-update value
    assert eng.sql(
        f"SELECT o_orderstatus FROM orders_rw VERSION AS OF 0 WHERE o_orderkey = {lo}"
    ).collect()[0][0] != "Z"

    # selective DELETE prunes the same way
    r = eng.sql(f"DELETE FROM orders_rw WHERE o_orderkey = {lo}")
    assert r.affected == 1
    assert eng.sql("SELECT count(*) AS ct FROM orders_rw").collect()[0][0] == total - 1
    v2 = work / "v000002"
    linked2 = [p for p in parts(v2)
               if (v1 / p).exists() and os.stat(v2 / p).st_ino == os.stat(v1 / p).st_ino]
    assert len(linked2) == 7
    # whole-table UPDATE (no WHERE) still takes the full-rewrite path
    r = eng.sql("UPDATE orders_rw SET o_orderpriority = '9-NONE'")
    assert r.affected == total - 1
    assert eng.sql(
        "SELECT count(DISTINCT o_orderpriority) AS c FROM orders_rw"
    ).collect()[0][0] == 1


def test_table_changes_cdc(spark, sf_dir, tmp_path):
    """table_changes(t, v0, v1) — Delta-CDF-shaped diff: per-commit
    attribution, update pre/postimage pairs under declared keys, and
    file pruning (hard-linked files never read)."""
    src = str(tmp_path / "cdc_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "orders_cdc", src, str(tmp_path / "cdc_work"), keys=["o_orderkey"]
    )
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_cdc").collect()[0][0]
    hi = eng.sql("SELECT max(o_orderkey) AS k FROM orders_cdc").collect()[0][0]
    r_upd = eng.sql(
        f"UPDATE orders_cdc SET o_orderpriority = '9-CDC' WHERE o_orderkey = {lo}"
    )  # v1
    r_del = eng.sql(f"DELETE FROM orders_cdc WHERE o_orderkey = {hi}")  # v2
    eng.sql(
        "INSERT INTO orders_cdc (o_orderkey, o_custkey, o_orderstatus, o_totalprice) "
        "VALUES (999999001, 1, 'X', 1.0)"
    )  # v3
    rows = eng.sql(
        "SELECT o_orderkey, _change_type, _commit_version "
        "FROM table_changes(orders_cdc, 0, 3) "
        "ORDER BY _commit_version, _change_type"
    ).collect()
    got = [(r._commit_version, r._change_type, r.o_orderkey) for r in rows]
    assert (1, "update_preimage", lo) in got and (1, "update_postimage", lo) in got
    assert (2, "delete", hi) in got
    assert (3, "insert", 999999001) in got
    # exactly these four changes: the update matched 1 row, rewrote 1 file,
    # and that file's other (unchanged) rows must not leak into the feed
    assert len(got) == 4, got
    assert r_upd.affected == 1 and r_del.affected == 1
    # windowed read: only the delete commit
    only_v2 = eng.sql(
        "SELECT _change_type FROM table_changes(orders_cdc, 1, 2)"
    ).collect()
    assert [r._change_type for r in only_v2] == ["delete"]
    # empty window is a schema-stable empty frame
    assert eng.sql("SELECT * FROM table_changes(orders_cdc, 2, 2)").count() == 0


def test_table_changes_keyless_multiset(spark, sf_dir, tmp_path):
    """Without declared keys the diff is the multiset EXCEPT ALL both
    ways: updates surface as delete+insert, duplicates counted."""
    src = str(tmp_path / "cdc_nk_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_nk", src, str(tmp_path / "cdc_nk_work"))
    eng.sql("UPDATE region_nk SET r_name = 'ZZZ' WHERE r_regionkey = 0")
    from collections import Counter

    rows = eng.sql(
        "SELECT r_regionkey, _change_type FROM table_changes(region_nk, 0, 1)"
    ).collect()
    c = Counter((r.r_regionkey, r._change_type) for r in rows)
    assert c == Counter({(0, "insert"): 1, (0, "delete"): 1})


def test_follow_changes_incremental_feed(spark, sf_dir, tmp_path):
    """CDC follower: first call materializes all commits so far, later
    calls only the new ones; the merged sink equals changes(0, cur)."""
    src = str(tmp_path / "cdcf_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        4, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "orders_f", src, str(tmp_path / "cdcf_work"), keys=["o_orderkey"]
    )
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_f").collect()[0][0]
    eng.sql(f"UPDATE orders_f SET o_orderstatus = 'Z' WHERE o_orderkey = {lo}")  # v1
    eng.sql(f"DELETE FROM orders_f WHERE o_orderkey = {lo}")  # v2

    sink = str(tmp_path / "cdcf_sink")
    assert eng.store.follow_changes("orders_f", sink) == 2
    feed = eng.store.read_change_feed(sink)
    got = sorted((r._commit_version, r._change_type) for r in feed.collect())
    assert got == [(1, "update_postimage"), (1, "update_preimage"), (2, "delete")]

    # incremental: a new commit adds exactly one partition
    eng.sql(
        "INSERT INTO orders_f (o_orderkey, o_custkey, o_orderstatus, o_totalprice) "
        "VALUES (999999002, 1, 'X', 2.0)"
    )  # v3
    assert eng.store.follow_changes("orders_f", sink) == 1
    feed2 = eng.store.read_change_feed(sink)
    assert feed2.filter("_commit_version = 3").collect()[0]._change_type == "insert"
    # idempotent when nothing changed
    assert eng.store.follow_changes("orders_f", sink) == 0
    # the materialized feed matches the direct CDC read
    direct = sorted(
        (r._commit_version, r._change_type, r.o_orderkey)
        for r in eng.store.changes("orders_f", 0, 3).collect()
    )
    via_sink = sorted(
        (r._commit_version, r._change_type, r.o_orderkey) for r in feed2.collect()
    )
    assert direct == via_sink


def test_vacuum_expires_old_versions(spark, sf_dir, tmp_path):
    """VACUUM: old version dirs are deleted, hard-linked files shared
    with retained versions survive, time travel to expired versions
    errors, current reads and SHOW VERSIONS reflect retention."""
    import os

    src = str(tmp_path / "vac_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        4, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "orders_vac", src, str(tmp_path / "vac_work"), keys=["o_orderkey"]
    )
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_vac").collect()[0][0]
    eng.sql(f"UPDATE orders_vac SET o_orderstatus = 'A' WHERE o_orderkey = {lo}")  # v1
    eng.sql(f"UPDATE orders_vac SET o_orderstatus = 'B' WHERE o_orderkey = {lo}")  # v2
    total = eng.sql("SELECT count(*) AS ct FROM orders_vac").collect()[0][0]

    r = eng.sql("VACUUM orders_vac RETAIN 2 VERSIONS")
    assert r.affected == 1  # v0 removed, v1+v2 kept
    work = tmp_path / "vac_work"
    assert not (work / "v000000").exists() and (work / "v000001").exists()
    # hard-linked files shared v1<-v2 still readable; current state intact
    assert eng.sql("SELECT count(*) AS ct FROM orders_vac").collect()[0][0] == total
    assert eng.sql(
        f"SELECT o_orderstatus FROM orders_vac WHERE o_orderkey = {lo}"
    ).collect()[0][0] == "B"
    assert eng.sql(
        f"SELECT o_orderstatus FROM orders_vac VERSION AS OF 1 WHERE o_orderkey = {lo}"
    ).collect()[0][0] == "A"
    # expired version unreachable, SHOW VERSIONS starts at 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="expired|out of range"):
        eng.sql("SELECT count(*) AS c FROM orders_vac VERSION AS OF 0").collect()
    vers = [r.version for r in eng.sql("SHOW VERSIONS FROM orders_vac").collect()]
    assert vers == [1, 2]
    # CDC over retained range still works
    assert eng.store.changes("orders_vac", 1, 2).count() == 2


def test_table_changes_zero_match_commit_is_empty_diff(spark, sf_dir, tmp_path):
    """A commit that matched no rows hard-links every file through; the
    CDC diff over it must be EMPTY, not an ambiguous-self-join error."""
    src = str(tmp_path / "zm_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_zm", src, str(tmp_path / "zm_work"),
                                  keys=["r_regionkey"])
    r = eng.sql("UPDATE region_zm SET r_name = 'X' WHERE r_regionkey = 999")
    assert r.affected == 0
    assert eng.store.changes("region_zm", 0, 1).count() == 0
    # follower handles the no-op commit too
    assert eng.store.follow_changes("region_zm", str(tmp_path / "zm_sink")) == 1


def test_follow_changes_vacuum_floor_semantics(spark, sf_dir, tmp_path):
    """An EXISTING follower whose mark predates the vacuum floor gets a
    clear reseed error (its commits are gone), never a FileNotFoundError;
    a FRESH follower seeds at the floor — its base state is the oldest
    retained snapshot — and can always start."""
    src = str(tmp_path / "fv_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_fv", src, str(tmp_path / "fv_work"),
                                  keys=["r_regionkey"])
    stale = str(tmp_path / "fv_stale")
    assert eng.store.follow_changes("region_fv", stale) == 0  # mark at v0
    eng.sql("UPDATE region_fv SET r_name = 'A' WHERE r_regionkey = 0")  # v1
    eng.sql("UPDATE region_fv SET r_name = 'B' WHERE r_regionkey = 1")  # v2
    eng.sql("VACUUM region_fv RETAIN 1 VERSIONS")  # floor = 2
    with pytest.raises(KeyError, match="expired by vacuum"):
        eng.store.follow_changes("region_fv", stale)
    # fresh consumer: starts at the floor, nothing lost from ITS view
    fresh = str(tmp_path / "fv_fresh")
    assert eng.store.follow_changes("region_fv", fresh) == 0
    eng.sql("UPDATE region_fv SET r_name = 'C' WHERE r_regionkey = 2")  # v3
    assert eng.store.follow_changes("region_fv", fresh) == 1


def test_shallow_clone_rejects_existing_target(spark, sf_dir, tmp_path):
    src = str(tmp_path / "ce_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_ce", src, str(tmp_path / "ce_work"),
                                  keys=["r_regionkey"])
    eng.sql("CREATE TABLE region_ce2 SHALLOW CLONE region_ce")
    with pytest.raises(Exception, match="already exists"):
        eng.sql("CREATE TABLE region_ce2 SHALLOW CLONE region_ce")
    with pytest.raises(Exception, match="not version-backed"):
        eng.sql("CREATE TABLE nope SHALLOW CLONE region")  # plain view


def test_optimize_commit_cdc_is_o1_marker(spark, sf_dir, tmp_path):
    """The OPTIMIZE commit carries a layout-only marker, so the CDC diff
    across it short-circuits without reading either snapshot."""
    import os

    src = str(tmp_path / "om_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_om", src, str(tmp_path / "om_work"),
                                  keys=["r_regionkey"])
    eng.sql("OPTIMIZE region_om")
    assert os.path.exists(str(tmp_path / "om_work" / "v000001" / "_layout_only"))
    assert eng.store.changes("region_om", 0, 1).count() == 0
    # a real commit after the optimize still diffs normally
    eng.sql("UPDATE region_om SET r_name = 'X' WHERE r_regionkey = 0")
    assert eng.store.changes("region_om", 1, 2).count() == 2


def test_shallow_clone_is_zero_copy_and_independent(spark, sf_dir, tmp_path):
    """SHALLOW CLONE: v0 of the clone hard-links the source's current
    snapshot (same inodes, no data copied); subsequent DML on either
    side never leaks into the other; vacuum on the source leaves the
    clone's bytes intact."""
    import os

    src = str(tmp_path / "cl_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_cl", src, str(tmp_path / "cl_work"),
                                  keys=["r_regionkey"])
    eng.sql("UPDATE region_cl SET r_name = 'SRC-V1' WHERE r_regionkey = 0")  # v1
    eng.sql("CREATE TABLE region_cl2 SHALLOW CLONE region_cl")

    # zero-copy: every clone file shares an inode with a source-v1 file
    v1 = str(tmp_path / "cl_work" / "v000001")
    c0 = str(tmp_path / "cl_work") + "__clone_region_cl2/v000000"
    src_inodes = {os.stat(f"{v1}/{n}").st_ino for n in os.listdir(v1)
                  if n.startswith("part-") and not n.endswith(".crc")}
    for n in os.listdir(c0):
        if n.startswith("part-") and not n.endswith(".crc"):
            assert os.stat(f"{c0}/{n}").st_ino in src_inodes

    # independent evolution
    eng.sql("UPDATE region_cl2 SET r_name = 'CLONE-V1' WHERE r_regionkey = 1")
    assert eng.sql("SELECT r_name FROM region_cl WHERE r_regionkey = 1"
                   ).collect()[0][0] != "CLONE-V1"
    assert eng.sql("SELECT r_name FROM region_cl2 WHERE r_regionkey = 0"
                   ).collect()[0][0] == "SRC-V1"
    # vacuum the source hard: clone still reads fine
    eng.sql("UPDATE region_cl SET r_name = 'SRC-V2' WHERE r_regionkey = 2")
    eng.sql("VACUUM region_cl RETAIN 1 VERSIONS")
    assert eng.sql("SELECT count(*) AS c FROM region_cl2").collect()[0][0] == 5
    assert eng.sql("SELECT r_name FROM region_cl2 WHERE r_regionkey = 0"
                   ).collect()[0][0] == "SRC-V1"


def test_optimize_zorder_is_a_cow_commit(spark, sf_dir, tmp_path):
    """OPTIMIZE rewrites layout as a new version: rows identical, CDC
    across the rewrite is empty, time travel spans it, and a selective
    predicate afterwards touches fewer files than before."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "opt_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(16).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("orders_opt", src, str(tmp_path / "opt_work"),
                                  keys=["o_orderkey"])
    total = eng.sql("SELECT count(*) AS c FROM orders_opt").collect()[0][0]
    r = eng.sql("OPTIMIZE orders_opt ZORDER BY (o_orderkey, o_totalprice)")
    assert r.affected >= 1
    assert eng.sql("SELECT count(*) AS c FROM orders_opt").collect()[0][0] == total
    # identical rows -> empty keyed CDC diff across the rewrite
    assert eng.store.changes("orders_opt", 0, 1).count() == 0
    # time travel still reaches the pre-optimize layout
    assert eng.sql("SELECT count(*) AS c FROM orders_opt VERSION AS OF 0"
                   ).collect()[0][0] == total
    # clustering took effect: a key-range predicate touches a strict
    # subset of the clustered files (pre-optimize random layout hits all)
    def touched(ver_dir):
        d = str(tmp_path / "opt_work" / ver_dir)
        df = spark.read.parquet(d).filter(F.col("o_orderkey") < 100)
        return (df.select(F.input_file_name()).distinct().count(),
                len([f for f in os.listdir(d)
                     if f.startswith("part-") and not f.endswith(".crc")]))
    t0, n0 = touched("v000000")
    t1, n1 = touched("v000001")
    # round-robin layout: every file hit. n0 is NOT pinned to the source's
    # 16 part files — the COW copy re-splits by files.minPartitionNum
    # (= cores), so the count follows SPARK_GRAFT_CPUS (8 under the test
    # default, 16+ at local[32]); the claim is "no pruning possible".
    assert t0 == n0 and n0 > 1
    assert t1 < n1 or n1 == 1      # clustered: pruned (or fully compacted)


def test_follow_changes_crashed_sink_not_treated_as_fresh(spark, sf_dir, tmp_path):
    """A sink holding commit partitions but no high-water mark (crashed
    mid-first-run) is NOT fresh: behind the vacuum floor it must get the
    reseed error, never a silent commit gap."""
    import os

    src = str(tmp_path / "cw_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_cw", src, str(tmp_path / "cw_work"),
                                  keys=["r_regionkey"])
    eng.sql("UPDATE region_cw SET r_name = 'A' WHERE r_regionkey = 0")  # v1
    sink = str(tmp_path / "cw_sink")
    eng.store.follow_changes("region_cw", sink)
    os.remove(f"{sink}/_hwm.json")  # simulate the crash window
    eng.sql("UPDATE region_cw SET r_name = 'B' WHERE r_regionkey = 1")  # v2
    eng.sql("VACUUM region_cw RETAIN 1 VERSIONS")  # floor = 2
    with pytest.raises(KeyError, match="expired by vacuum"):
        eng.store.follow_changes("region_cw", sink)


def test_merge_pruned_cow_rewrites_only_matched_files(spark, sf_dir, tmp_path):
    """Selective MERGE on a parquet-backed target takes the two-phase
    pruned path (mirror of test_pruned_cow_rewrites_only_matched_files):
    only the part-files holding a matched target row are rewritten, the
    insert leg appends, and every untouched file hard-links through."""
    import os

    src = str(tmp_path / "mrg_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "orders_mrg", src, str(tmp_path / "mrg_work"), keys=["o_orderkey"]
    )
    total = eng.sql("SELECT count(*) AS ct FROM orders_mrg").collect()[0][0]
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_mrg").collect()[0][0]
    eng.register_memory("mrg_updates", {"mrg_src_rows": spark.createDataFrame(
        [Row(k=int(lo), pr="9-MERGED"), Row(k=999999001, pr="9-NEW")],
        "k long, pr string",
    )})
    r = eng.sql(
        "MERGE INTO orders_mrg t USING mrg_src_rows s ON t.o_orderkey = s.k "
        "WHEN MATCHED THEN UPDATE SET o_orderpriority = s.pr "
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderpriority) VALUES (s.k, s.pr)"
    )
    assert r.affected == 2  # 1 matched + 1 inserted
    # results exact: updated row, inserted row, nothing else disturbed
    assert eng.sql(
        f"SELECT o_orderpriority FROM orders_mrg WHERE o_orderkey = {lo}"
    ).collect()[0][0] == "9-MERGED"
    assert eng.sql(
        "SELECT o_orderpriority FROM orders_mrg WHERE o_orderkey = 999999001"
    ).collect()[0][0] == "9-NEW"
    assert eng.sql("SELECT count(*) AS ct FROM orders_mrg").collect()[0][0] == total + 1

    v0 = tmp_path / "mrg_work" / "v000000"
    v1 = tmp_path / "mrg_work" / "v000001"

    def parts(d):
        return sorted(p for p in os.listdir(d)
                      if p.startswith("part-") and not p.endswith(".crc"))

    linked = [p for p in parts(v1) if p in parts(v0)
              and os.stat(v1 / p).st_ino == os.stat(v0 / p).st_ino]
    # range-partitioned on the ON key: ONE file held the matched row; the
    # other seven hard-linked through (the insert leg appends new files,
    # it never forces a rewrite)
    assert len(linked) == 7
    # time travel still sees the pre-merge state
    assert eng.sql(
        f"SELECT o_orderpriority FROM orders_mrg VERSION AS OF 0 "
        f"WHERE o_orderkey = {lo}"
    ).collect()[0][0] != "9-MERGED"
    # keyed CDC across the merge: one update pair + one insert
    kinds = sorted(
        r._change_type
        for r in eng.store.changes("orders_mrg", 0, 1).collect()
    )
    assert kinds == ["insert", "update_postimage", "update_preimage"]


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_cdc_long_range_bounded_plan(spark, sf_dir, tmp_path, monkeypatch):
    """changes() over a long commit history must not hand the driver one
    union branch per commit: every _CDC_UNION_BATCH commits the
    accumulated feed is localCheckpoint'ed, so the final plan holds at
    most one batch of live parquet-pair diffs plus checkpoint scans —
    while the feed's content stays exact."""
    from dataux_spark.dml import TableStore

    monkeypatch.setattr(TableStore, "_CDC_UNION_BATCH", 6)
    src = str(tmp_path / "long_src")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_long", src, str(tmp_path / "long_work"), keys=["n_nationkey"]
    )
    n_commits = 20
    for i in range(n_commits):
        eng.sql(f"UPDATE nation_long SET n_name = 'N{i}' "
                f"WHERE n_nationkey = {i % 25}")
    feed = eng.store.changes("nation_long", 0, n_commits)
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    # lineage was cut: checkpointed prefixes appear as in-memory scans...
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    # ...and live parquet relations are bounded by the batch size (each
    # keyed pair diff carries a handful of scan legs), not by n_commits
    live_scans = plan.count("Relation") + plan.count("parquet")
    assert live_scans < n_commits * 4
    # the feed itself is exact: one update pre/post pair per commit
    rows = feed.collect()
    assert len(rows) == 2 * n_commits
    by_commit = {}
    for r in rows:
        by_commit.setdefault(r._commit_version, []).append(r._change_type)
    assert all(sorted(v) == ["update_postimage", "update_preimage"]
               for v in by_commit.values())
    assert set(by_commit) == set(range(1, n_commits + 1))


def test_merge_multi_clause_delta_grammar(spark):
    """Delta's full MERGE clause set: ordered WHEN MATCHED [AND cond]
    UPDATE/DELETE + conditional INSERT, first-match-wins per row; rows
    matching no clause condition carry unchanged; unmatched source rows
    failing every insert condition are dropped."""
    eng = Engine(spark)
    target = spark.createDataFrame(
        [Row(id=1, name="a", qty=10), Row(id=2, name="b", qty=20),
         Row(id=3, name="c", qty=30), Row(id=4, name="d", qty=40)]
    )
    source = spark.createDataFrame(
        [Row(id=1, name="a2", qty=100),   # matched, qty>=50 -> DELETE
         Row(id=2, name="b2", qty=5),     # matched, qty<50  -> UPDATE
         Row(id=3, name="c2", qty=-1),    # matched, neither cond -> carried
         Row(id=8, name="h", qty=80),     # unmatched, qty>=50 -> INSERT
         Row(id=9, name="i", qty=3)]      # unmatched, qty<50 -> dropped
    )
    eng.register_memory("mc", {"mc_tgt": target, "mc_src": source})
    r = eng.sql(
        "MERGE INTO mc_tgt t USING mc_src s ON t.id = s.id "
        "WHEN MATCHED AND s.qty >= 50 THEN DELETE "
        "WHEN MATCHED AND s.qty > 0 THEN UPDATE SET name = s.name, qty = t.qty + s.qty "
        "WHEN NOT MATCHED AND s.qty >= 50 THEN INSERT (id, name, qty) VALUES (s.id, s.name, s.qty)"
    )
    assert r.affected == 3  # 1 updated + 1 deleted + 1 inserted
    rows = {r.id: (r.name, r.qty) for r in eng.sql("SELECT * FROM mc_tgt").collect()}
    assert rows == {2: ("b2", 25), 3: ("c", 30), 4: ("d", 40), 8: ("h", 80)}

    # first-match-wins ORDER: flip the two matched clauses and id=1
    # (qty 100 > 0) now hits UPDATE before the DELETE clause can fire
    eng.register_memory("mc2", {"mc2_tgt": target, "mc2_src": source})
    eng.sql(
        "MERGE INTO mc2_tgt t USING mc2_src s ON t.id = s.id "
        "WHEN MATCHED AND s.qty > 0 THEN UPDATE SET qty = s.qty "
        "WHEN MATCHED AND s.qty >= 50 THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows2 = {r.id: r.qty for r in eng.sql("SELECT * FROM mc2_tgt").collect()}
    assert rows2[1] == 100 and 9 in rows2  # updated not deleted; INSERT * unconditional

    # garbage clause text is rejected, not silently ignored (the engine
    # wraps the parse ValueError in its graceful QueryError)
    import pytest as _pt
    with _pt.raises(Exception, match="unsupported MERGE clause"):
        eng.sql("MERGE INTO mc_tgt t USING mc_src s ON t.id = s.id "
                "WHEN MATCHED THEN FROBNICATE")


def test_merge_delete_clause_pruned_on_backed_table(spark, sf_dir, tmp_path):
    """WHEN MATCHED THEN DELETE on a parquet-backed target goes through
    the same pruned COW path: only files holding matched rows rewrite."""
    import os

    src = str(tmp_path / "md_src")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet(
        "orders_md", src, str(tmp_path / "md_work"), keys=["o_orderkey"]
    )
    total = eng.sql("SELECT count(*) AS ct FROM orders_md").collect()[0][0]
    lo = eng.sql("SELECT min(o_orderkey) AS k FROM orders_md").collect()[0][0]
    eng.register_memory("md_mem", {"md_keys": spark.createDataFrame(
        [Row(k=int(lo))], "k long")})
    r = eng.sql("MERGE INTO orders_md t USING md_keys s ON t.o_orderkey = s.k "
                "WHEN MATCHED THEN DELETE "
                "WHEN NOT MATCHED AND s.k < 0 THEN INSERT (o_orderkey) VALUES (s.k)")
    assert r.affected == 1
    assert eng.sql("SELECT count(*) AS ct FROM orders_md").collect()[0][0] == total - 1
    v0, v1 = tmp_path / "md_work" / "v000000", tmp_path / "md_work" / "v000001"
    parts = lambda d: {p for p in os.listdir(d)
                       if p.startswith("part-") and not p.endswith(".crc")}
    linked = [p for p in parts(v1) & parts(v0)
              if os.stat(v1 / p).st_ino == os.stat(v0 / p).st_ino]
    assert len(linked) == 7


def test_restore_to_version_and_describe_history(spark, sf_dir, tmp_path):
    """RESTORE TABLE t TO VERSION AS OF v commits snapshot v forward as
    the new head: O(files) hard links (no data copy), history preserved
    across the restore (Delta semantics), CDC across the restore commit
    reports the honest delta, and vacuum-expired versions refuse.
    DESCRIBE HISTORY is the Delta spelling of SHOW VERSIONS."""
    import os

    src = str(tmp_path / "rs_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_rs", src, str(tmp_path / "rs_work"),
                                  keys=["r_regionkey"])
    eng.sql("UPDATE region_rs SET r_name = 'X1' WHERE r_regionkey = 1")  # v1
    eng.sql("DELETE FROM region_rs WHERE r_regionkey = 2")               # v2
    assert eng.sql("SELECT count(*) AS c FROM region_rs").collect()[0][0] == 4

    r = eng.sql("RESTORE TABLE region_rs TO VERSION AS OF 0")
    assert r.affected == 3  # the new head version number
    # state is the v0 snapshot again
    assert eng.sql("SELECT count(*) AS c FROM region_rs").collect()[0][0] == 5
    assert eng.sql("SELECT r_name FROM region_rs WHERE r_regionkey = 1"
                   ).collect()[0][0] != "X1"
    # O(files): the restored version holds hard links of v0's files
    w = tmp_path / "rs_work"
    parts = lambda d: {p for p in os.listdir(d)
                       if p.startswith("part-") and not p.endswith(".crc")}
    assert all(os.stat(w / "v000003" / p).st_ino == os.stat(w / "v000000" / p).st_ino
               for p in parts(w / "v000003"))
    # history preserved: time travel still reaches the pre-restore head
    assert eng.sql("SELECT count(*) AS c FROM region_rs VERSION AS OF 2"
                   ).collect()[0][0] == 4
    # Delta spelling of the version listing
    hist = eng.sql("DESCRIBE HISTORY region_rs").collect()
    assert [h.version for h in hist] == [0, 1, 2, 3]
    # CDC across the restore: the delete is undone (insert) and the
    # update rolled back (pre/post pair)
    kinds = sorted(r._change_type for r in eng.store.changes("region_rs", 2, 3).collect())
    assert kinds == ["insert", "update_postimage", "update_preimage"]
    # out-of-range / vacuumed versions refuse with the range error
    import pytest as _pt
    with _pt.raises(Exception, match="out of range"):
        eng.sql("RESTORE TABLE region_rs TO VERSION AS OF 9")
    eng.sql("VACUUM region_rs RETAIN 2 VERSIONS")
    with _pt.raises(Exception, match="expired by vacuum"):
        eng.sql("RESTORE TABLE region_rs TO VERSION AS OF 0")


def test_merge_multi_match_raises(spark, tmp_path):
    """Delta's multiple-source-rows-match guard: when any matched clause
    could modify a target row that several source rows match, MERGE must
    raise instead of silently duplicating the row through the join
    rewrite (one output row per matching PAIR) — on both the in-memory
    and the file-pruned copy-on-write paths."""
    eng = Engine(spark)
    target = spark.createDataFrame([Row(id=1, qty=10), Row(id=2, qty=20)])
    dup_src = spark.createDataFrame(
        [Row(id=1, qty=5), Row(id=1, qty=7), Row(id=3, qty=9)]
    )
    eng.register_memory("mm", {"mm_tgt": target, "mm_src": dup_src})
    with pytest.raises(Exception, match="multiple source rows"):
        eng.sql(
            "MERGE INTO mm_tgt t USING mm_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET qty = s.qty"
        )
    # target unchanged — the guard fired before any commit
    rows = {r.id: r.qty for r in eng.sql("SELECT * FROM mm_tgt").collect()}
    assert rows == {1: 10, 2: 20}
    # DELETE clauses hit the same guard (a row could be counted deleted
    # by one pair yet carried through by another)
    with pytest.raises(Exception, match="multiple source rows"):
        eng.sql(
            "MERGE INTO mm_tgt t USING mm_src s ON t.id = s.id "
            "WHEN MATCHED AND s.qty >= 7 THEN DELETE"
        )
    # parquet-backed path
    target.write.parquet(str(tmp_path / "mm_src_pq"))
    eng.register_writable_parquet(
        "mm_tgt_pq", str(tmp_path / "mm_src_pq"), str(tmp_path / "mm_work"),
        keys=["id"],
    )
    with pytest.raises(Exception, match="multiple source rows"):
        eng.sql(
            "MERGE INTO mm_tgt_pq t USING mm_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET qty = s.qty"
        )
    assert eng.sql("SELECT count(*) AS c FROM mm_tgt_pq").collect()[0][0] == 2


def test_merge_unmodified_multi_match_allowed(spark, tmp_path):
    """Delta raises only when the multiply-matched row WOULD BE modified:
    a target row several source rows match, where no WHEN MATCHED
    condition fires for any pair, must carry through exactly once (never
    duplicated by the pair-wise join rewrite) while clauses still apply
    to single-matched rows — on both the in-memory and the file-pruned
    copy-on-write paths (ADVICE r8: the old guard rejected these)."""
    eng = Engine(spark)
    target = spark.createDataFrame([Row(id=1, qty=10), Row(id=2, qty=20)])
    src = spark.createDataFrame(
        [Row(id=1, qty=1), Row(id=1, qty=2), Row(id=2, qty=99)]
    )
    eng.register_memory("um", {"um_tgt": target, "um_src": src})
    r = eng.sql(
        "MERGE INTO um_tgt t USING um_src s ON t.id = s.id "
        "WHEN MATCHED AND s.qty > 50 THEN UPDATE SET qty = s.qty"
    )
    assert r.affected == 1  # only id=2 updated
    rows = sorted((x.id, x.qty) for x in eng.sql("SELECT * FROM um_tgt").collect())
    assert rows == [(1, 10), (2, 99)]  # id=1 carried once, unchanged
    # DELETE clause: id=2 deleted, multi-matched id=1 untouched and single
    r = eng.sql(
        "MERGE INTO um_tgt t USING um_src s ON t.id = s.id "
        "WHEN MATCHED AND s.qty > 50 THEN DELETE"
    )
    rows = sorted((x.id, x.qty) for x in eng.sql("SELECT * FROM um_tgt").collect())
    assert rows == [(1, 10)]
    # but the moment a clause fires for a multi-matched row, still raise
    with pytest.raises(Exception, match="multiple source rows"):
        eng.sql(
            "MERGE INTO um_tgt t USING um_src s ON t.id = s.id "
            "WHEN MATCHED AND s.qty >= 2 THEN UPDATE SET qty = s.qty"
        )
    # parquet-backed copy-on-write path
    target.write.parquet(str(tmp_path / "um_pq"))
    eng.register_writable_parquet(
        "um_tgt_pq", str(tmp_path / "um_pq"), str(tmp_path / "um_work"), keys=["id"]
    )
    r = eng.sql(
        "MERGE INTO um_tgt_pq t USING um_src s ON t.id = s.id "
        "WHEN MATCHED AND s.qty > 50 THEN UPDATE SET qty = s.qty"
    )
    assert r.affected == 1
    rows = sorted((x.id, x.qty) for x in eng.sql("SELECT * FROM um_tgt_pq").collect())
    assert rows == [(1, 10), (2, 99)]


def test_merge_insert_only_multi_match_allowed(spark, tmp_path):
    """Insert-only MERGE (no WHEN MATCHED clause) never rewrites a target
    row, so multi-matches are legal (Delta's contract) — matched target
    rows must carry exactly once, and only genuinely-new ids insert."""
    eng = Engine(spark)
    target = spark.createDataFrame([Row(id=1, qty=10), Row(id=2, qty=20)])
    dup_src = spark.createDataFrame(
        [Row(id=1, qty=5), Row(id=1, qty=7), Row(id=3, qty=9)]
    )
    eng.register_memory("io", {"io_tgt": target, "io_src": dup_src})
    r = eng.sql(
        "MERGE INTO io_tgt t USING io_src s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)"
    )
    assert r.affected == 1
    rows = sorted((r.id, r.qty) for r in eng.sql("SELECT * FROM io_tgt").collect())
    assert rows == [(1, 10), (2, 20), (3, 9)]
    # backed path: no target file is rewritten — pure hard-link + append
    target.write.parquet(str(tmp_path / "io_pq"))
    eng.register_writable_parquet(
        "io_tgt_pq", str(tmp_path / "io_pq"), str(tmp_path / "io_work"), keys=["id"]
    )
    r = eng.sql(
        "MERGE INTO io_tgt_pq t USING io_src s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)"
    )
    assert r.affected == 1
    rows = sorted((r.id, r.qty) for r in eng.sql("SELECT * FROM io_tgt_pq").collect())
    assert rows == [(1, 10), (2, 20), (3, 9)]
    import os
    w = tmp_path / "io_work"
    old = {p: os.stat(w / "v000000" / p).st_ino for p in os.listdir(w / "v000000")
           if p.startswith("part-") and not p.endswith(".crc")}
    assert all(os.stat(w / "v000001" / p).st_ino == ino for p, ino in old.items())


def test_restore_validates_constraints(spark, tmp_path):
    """RESTORE runs the constraint gate like every commit: a snapshot
    that predates ALTER TABLE ADD CONSTRAINT and violates it must refuse
    to become the head (the one commit kind where validation cannot ride
    a write pass — restore writes nothing)."""
    eng = Engine(spark)
    spark.createDataFrame([Row(id=-1, v="bad"), Row(id=2, v="ok")]).write.parquet(
        str(tmp_path / "rc_src")
    )
    eng.register_writable_parquet(
        "rc_t", str(tmp_path / "rc_src"), str(tmp_path / "rc_work"), keys=["id"]
    )
    eng.sql("DELETE FROM rc_t WHERE id < 0")                                  # v1
    eng.sql("ALTER TABLE rc_t ADD CONSTRAINT id_nonneg CHECK (id >= 0)")       # head clean
    with pytest.raises(Exception, match="id_nonneg"):
        eng.sql("RESTORE TABLE rc_t TO VERSION AS OF 0")
    # refused restore left no partial state: head is still v1 and valid
    assert eng.sql("SELECT count(*) AS c FROM rc_t").collect()[0][0] == 1
    hist = eng.sql("DESCRIBE HISTORY rc_t").collect()
    assert [h.version for h in hist] == [0, 1]
    # dropping the constraint unblocks the restore
    eng.sql("ALTER TABLE rc_t DROP CONSTRAINT id_nonneg")
    eng.sql("RESTORE TABLE rc_t TO VERSION AS OF 0")
    assert eng.sql("SELECT count(*) AS c FROM rc_t").collect()[0][0] == 2
