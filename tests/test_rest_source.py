"""REST/JSON source tests — the Kube/Lytics scan-only backend analog
(fixed endpoints become tables; engine polyfills all SQL on top)."""

import json

import pytest

from dataux_spark import Engine
from dataux_spark.sources.rest import RestJsonSource

PODS = [
    {"metadata": {"name": "web-1", "namespace": "prod"},
     "status": {"phase": "Running", "restarts": 0}},
    {"metadata": {"name": "web-2", "namespace": "prod"},
     "status": {"phase": "Pending", "restarts": 3}},
    {"metadata": {"name": "job-1", "namespace": "batch"},
     "status": {"phase": "Running", "restarts": 1}},
]
NODES = {"items": [{"name": "n1", "cpu": 32}, {"name": "n2", "cpu": 64}]}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rest")
    (d / "pods.json").write_text(json.dumps(PODS))
    (d / "nodes.json").write_text(json.dumps(NODES))
    e = Engine(spark)
    e.register_source(
        RestJsonSource(
            "kube",
            {"pods": f"file://{d}/pods.json", "nodes": f"file://{d}/nodes.json"},
        )
    )
    return e


def test_endpoints_become_tables_with_dotted_columns(eng):
    out = eng.sql(
        'SELECT `metadata.name` FROM pods WHERE `status.phase` = "Running" ORDER BY `metadata.name`'
    ).collect()
    assert [r[0] for r in out] == ["job-1", "web-1"]


def test_items_wrapper_unwrapped(eng):
    assert eng.sql("SELECT sum(cpu) AS c FROM nodes").collect()[0][0] == 96


def test_polyfilled_agg_over_rest(eng):
    # scan-only source: group-by/having run engine-side (the polyfill)
    out = eng.sql(
        'SELECT `metadata.namespace` AS ns, count(*) AS ct FROM pods '
        "GROUP BY `metadata.namespace` HAVING count(*) >= 2"
    ).collect()
    assert [tuple(r) for r in out] == [("prod", 2)]
