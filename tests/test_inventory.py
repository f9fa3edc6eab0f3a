"""Front-door inventory drift guard.

README.md's queries.py line states the registry size and oracle count;
it drifted twice (r7: said 195/189 while the registry was 206/199).
This test re-derives the numbers it must state from the registry and
greps them out of README.md, so the line cannot drift a third time
without failing CI. No Spark session needed.
"""

import re

from dataux_spark import queries as Q


def test_readme_inventory_counts_match_registry():
    n_queries = len(Q._REGISTRY)
    n_oracles = len(Q.ORACLE)
    n_rows_only = n_queries - n_oracles
    with open("/root/repo/README.md") as f:
        readme = f.read()
    m = re.search(
        r"(\d+) queries, (\d+) with\s+DuckDB-oracle SQL twins", readme
    )
    assert m, "README.md no longer states the queries/oracles inventory line"
    assert int(m.group(1)) == n_queries, (
        f"README says {m.group(1)} queries, registry has {n_queries}"
    )
    assert int(m.group(2)) == n_oracles, (
        f"README says {m.group(2)} oracles, registry has {n_oracles}"
    )
    m2 = re.search(r"the (\d+) rows-only entries", readme)
    assert m2 and int(m2.group(1)) == n_rows_only, (
        f"README rows-only count != {n_rows_only}"
    )


def test_driver_window_is_exactly_fifty_registered_names():
    w = Q._DRIVER_WINDOW
    assert len(w) == 50 and len(set(w)) == 50
    assert all(n in Q._REGISTRY for n in w)
    # export order puts the window first, then the rest, nothing lost
    order = Q._export_order()
    assert order[:50] == w
    assert sorted(order) == sorted(Q._REGISTRY)


def test_bench_phase_entries_are_registered():
    for name in Q.BENCH_PHASES:
        assert name in Q._REGISTRY, name
