"""A tour of the engine's federation surface — run with:

    python3 examples/federated_tour.py

Registers heterogeneous sources (parquet dir, an in-memory table, a
mongo-style document collection with pushdown), then drives the MySQL-
flavored SQL surface end to end: introspection, filters that partially
push down, a cross-source join, session variables, and DML routed
through the owning source's mutator."""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataux_spark import Engine, get_spark
from dataux_spark.sources.mongo_style import MongoStyleSource

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("federated-tour")
    spark.sparkContext.setLogLevel("ERROR")
    e = Engine(spark)

    # 1. a parquet-backed warehouse schema
    e.register_parquet_dir("tpch", SF_DIR)

    # 2. an in-memory dimension table (the reference's static/memdb source)
    e.register_memory(
        "dims",
        {"regions_x": spark.createDataFrame(
            [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA")], "rid long, rname string")},
        keys={"regions_x": ["rid"]},
    )

    # 3. a mongo-style document collection (filters/limit push down)
    d = tempfile.mkdtemp(prefix="tour_")
    docs = [{"id": f"u{i}", "seg": ["gold", "silver"][i % 2], "score": i * 7 % 50}
            for i in range(20)]
    with open(f"{d}/users.json", "w") as fh:
        json.dump(docs, fh)
    e.register_source(MongoStyleSource("crm", {"crm_users": f"file://{d}/users.json"}))

    print("== introspection ==")
    e.sql("SHOW TABLES FROM crm").show()
    e.sql("DESCRIBE crm_users").show()

    print("== pushdown + polyfill ==")
    # seg = 'gold' pushes to the source; the LIKE residual is Catalyst's
    e.sql("SELECT id, score FROM crm_users "
          "WHERE seg = 'gold' AND id LIKE 'u1%' ORDER BY score DESC").show()

    print("== cross-source join (parquet x memory) ==")
    e.sql("SELECT r.rname, count(*) AS nations FROM nation n "
          "JOIN regions_x r ON r.rid = n.n_regionkey GROUP BY r.rname "
          "ORDER BY r.rname").show()

    print("== session variables ==")
    e.sql("SET @minscore = 30")
    e.sql("SELECT count(*) AS hot FROM crm_users WHERE score >= @minscore").show()

    print("== DML through the owning source ==")
    print(e.sql('INSERT INTO crm_users (id, seg, score) VALUES ("u99", "gold", 49)'))
    print(e.sql('UPSERT INTO crm_users (id, seg, score) VALUES ("u99", "gold", 50)'))
    e.sql("SELECT id, score FROM crm_users WHERE id = 'u99'").show()
    print(e.sql("DELETE FROM crm_users WHERE id = 'u99'"))

    print("== versioned table: time travel + CDC ==")
    td = tempfile.mkdtemp(prefix="tour_cdc_")
    spark = e.spark
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.parquet(f"{td}/src")
    e.register_writable_parquet("region_rw", f"{td}/src", f"{td}/work",
                                keys=["r_regionkey"])
    print(e.sql("UPDATE region_rw SET r_name = 'EURASIA' WHERE r_regionkey = 3"))
    print(e.sql("DELETE FROM region_rw WHERE r_regionkey = 4"))
    e.sql("SELECT r_regionkey, r_name FROM region_rw VERSION AS OF 0 "
          "WHERE r_regionkey >= 3").show()
    e.sql("SELECT r_regionkey, r_name, _change_type, _commit_version "
          "FROM table_changes(region_rw, 0, 2) "
          "ORDER BY _commit_version, _change_type").show()
    n = e.store.follow_changes("region_rw", f"{td}/feed")
    print(f"CDC follower materialized {n} commits to {td}/feed")
    # Delta-grammar MERGE (clauses are ordered, first-match-wins); on a
    # backed table only the part-files holding matched rows rewrite
    e.register_memory("tour_mrg", {"region_feed": spark.createDataFrame(
        [(0, "AFRICA-2"), (99, "ATLANTIS")], "rid long, rname string")})
    print(e.sql(
        "MERGE INTO region_rw t USING region_feed s ON t.r_regionkey = s.rid "
        "WHEN MATCHED AND s.rname LIKE '%-2' THEN UPDATE SET r_name = s.rname "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT (r_regionkey, r_name) VALUES (s.rid, s.rname)"
    ))
    e.sql("SELECT r_regionkey, r_name FROM region_rw "
          "WHERE r_regionkey IN (0, 99)").show()
    print(e.sql("OPTIMIZE region_rw"))  # layout rewrite as a COW commit
    e.sql("CREATE TABLE region_dev SHALLOW CLONE region_rw")  # zero-copy branch
    print(e.sql("UPDATE region_dev SET r_name = 'DEV' WHERE r_regionkey = 0"))
    print(e.sql("VACUUM region_rw RETAIN 2 VERSIONS"))
    e.sql("SHOW VERSIONS FROM region_rw").show()

    print("tour complete")


if __name__ == "__main__":
    main()
