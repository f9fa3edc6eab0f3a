"""Property fuzzing for the round-7 operators: each Spark result is
checked against an independent pure-Python model on random inputs —
the same rigor pattern as test_property_oracle.py's predicate trees."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
import pytest

# multi-minute suite: excluded from the inner-loop fast path
# (`pytest -m "not slow"`); the full unmarked run remains the gate
pytestmark = pytest.mark.slow

edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1, max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edges_strategy)
def test_triangle_stats_matches_bruteforce(spark, edges):
    from dataux_spark.operators.graph import triangle_stats

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1; tri[b] += 1; tri[c] += 1
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    got = {r.node: (r.degree, r.triangles)
           for r in triangle_stats(df).collect()}
    want = {n: (len(adj[n]), tri[n]) for n in adj}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=edges_strategy)
def test_label_propagation_matches_python_model(spark, edges):
    from dataux_spark.operators.graph import label_propagation

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):  # sync rounds, (count desc, label asc) argmax
        nxt = {}
        for n in adj:
            counts = {}
            for v in adj[n]:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    got = {r.node: r.label for r in label_propagation(df, iters=3).collect()}
    assert got == labels


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    items=st.lists(st.integers(0, 30), min_size=1, max_size=200),
    probes=st.lists(st.integers(0, 35), min_size=1, max_size=8, unique=True),
)
def test_cms_never_underestimates(spark, tmp_path_factory, items, probes):
    from dataux_spark.operators.rollup import build_cms_rollup, cms_estimates
    import datetime as dt

    path = str(tmp_path_factory.mktemp("cms")) + "/r"
    rows = [(i, dt.datetime(2024, 1, 1 + (i % 3), i % 24), v)
            for i, v in enumerate(items)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    build_cms_rollup(df, path, item_col="user_id", depth=3, width=16)
    truth = {}
    for v in items:
        truth[str(v)] = truth.get(str(v), 0) + 1
    est = {r.item: r.est for r in cms_estimates(
        spark, path, [str(p) for p in probes], depth=3, width=16).collect()}
    for p in probes:
        assert est[str(p)] >= truth.get(str(p), 0)
