"""ES REST shim: the handlers.cpp route surface driven over real HTTP —
search, count, bulk ingest (visible after refresh), mapping."""

from __future__ import annotations

import json
import urllib.request

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def es(spark):
    from serenedb_spark.server.es_http import EsShim, serve

    shim = EsShim(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    shim.create_index("docs", docs, {"text": "simple"}, key="doc_id")
    srv, port = serve(shim)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, obj=None, raw=None):
    data = (raw if raw is not None else json.dumps(obj or {})).encode()
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_search_route(es):
    out = _post(f"{es}/docs/_search", {
        "query": {"match": {"text": "spark"}}, "size": 5,
    })
    hits = out["hits"]["hits"]
    assert len(hits) == 5
    assert all(h["_score"] > 0 for h in hits)
    assert hits == sorted(hits, key=lambda h: -h["_score"])


def test_count_route(es):
    n = _post(f"{es}/docs/_count", {"query": {"term": {"text": "spark"}}})["count"]
    assert n > 0
    total = _post(f"{es}/docs/_count", {})["count"]
    assert total >= n


def test_mapping_route(es):
    with urllib.request.urlopen(f"{es}/docs/_mapping", timeout=60) as r:
        m = json.loads(r.read())
    assert m["docs"]["mappings"]["properties"]["text"]["analyzer"] == "simple"


def test_bulk_then_refresh_then_search(es):
    before = _post(f"{es}/docs/_count",
                   {"query": {"term": {"text": "zzztoken"}}})["count"]
    assert before == 0
    payload = "\n".join([
        '{"index": {"_index": "docs", "_id": "990001"}}',
        '{"text": "zzztoken appears here"}',
    ])
    out = _post(f"{es}/_bulk", raw=payload)
    assert out["errors"] is False
    _post(f"{es}/docs/_refresh")
    after = _post(f"{es}/docs/_count",
                  {"query": {"term": {"text": "zzztoken"}}})["count"]
    assert after == 1
