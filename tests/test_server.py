"""Web server (S2): routes, 'b: ' routing, LRU cache, and identity of
served results with the engine's query semantics."""

import json
import threading
import urllib.request

import pytest

from search_rs_spark.plans.build import build_index
from search_rs_spark.sources.webtext import reference_fixture


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_srv"))
    build_index(spark, reference_fixture(spark), out, corpus_fingerprint="srv3")

    from search_rs_spark.server import make_server

    server = make_server(out, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, server
    server.shutdown()


def _post(base, query, accept="application/json"):
    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        f"{base}/query", data=data, headers={"Accept": accept}
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read().decode()


import urllib.parse  # noqa: E402


def test_root_serves_form(served):
    base, _ = served
    with urllib.request.urlopen(f"{base}/", timeout=10) as r:
        body = r.read().decode()
    assert 'action="/query"' in body


def test_free_query_results(served):
    base, _ = served
    resp = json.loads(_post(base, "hello"))
    assert resp["tokens"] == ["hello"]
    paths = {d["path"].split("/")[-1] for d in resp["documents"]}
    assert paths == {"1.txt", "2.txt"}
    assert all(d["score"] > 0 for d in resp["documents"])
    assert isinstance(resp["time_ms"], int)


def test_boolean_routing(served):
    base, _ = served
    resp = json.loads(_post(base, "b: hello AND NOT world"))
    paths = {d["path"].split("/")[-1] for d in resp["documents"]}
    assert paths == {"2.txt"}
    assert all(d["score"] == 1.0 for d in resp["documents"])


def test_lru_cache_hits(served):
    base, server = served
    h0 = server.srs_cache.hits
    _post(base, "man world")
    _post(base, "man world")
    _post(base, "man world")
    assert server.srs_cache.hits >= h0 + 2
    assert server.srs_cache.size == 10


def test_html_response(served):
    base, _ = served
    body = _post(base, "hello", accept="text/html")
    assert "<ol>" in body and "results in" in body


def test_served_results_match_engine(served, spark):
    base, server = served
    resp = json.loads(_post(base, "hello world"))
    direct = server.srs_engine.free_query("hello world", 100)
    assert [(d["id"], round(d["score"], 9)) for d in resp["documents"]] == [
        (d, round(s, 9)) for d, u, s in direct
    ]

def test_cache_hit_skips_engine_execution(served):
    """The reference server answers repeated queries from the RESULT
    cache without touching the engine (main.rs:123-128): a cached query
    must not re-invoke free_query/boolean_query, and the served body
    must be byte-identical to the miss's."""
    base, server = served
    engine = server.srs_engine
    calls = []
    real_free, real_bool = engine.free_query, engine.boolean_query
    engine.free_query = lambda *a, **k: (calls.append("free"), real_free(*a, **k))[1]
    engine.boolean_query = (
        lambda *a, **k: (calls.append("bool"), real_bool(*a, **k))[1]
    )
    try:
        first = _post(base, "cachehit probe world")
        n_after_miss = len(calls)
        assert n_after_miss >= 1
        second = _post(base, "cachehit probe world")
        assert len(calls) == n_after_miss, "cache hit re-ran the engine"
        a, b = json.loads(first), json.loads(second)
        a.pop("cache_hits"), a.pop("cache_misses")
        b.pop("cache_hits"), b.pop("cache_misses")
        assert a == b
    finally:
        engine.free_query, engine.boolean_query = real_free, real_bool
