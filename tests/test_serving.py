"""Driver-local serving engine must equal the Spark DataFrame engine."""

import math
import time

import pytest

from search_rs_spark.operators.bm25 import free_query
from search_rs_spark.operators.boolean import boolean_query
from search_rs_spark.operators.serving import LocalEngine
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import synthesize_webtext


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_serve"))
    wt = synthesize_webtext(spark, 150, seed=17, vocab_size=250, mean_len=35)
    build_index(spark, wt, out, corpus_fingerprint="serve150")
    return SearchIndex.load(spark, out), LocalEngine.load(out)


@pytest.mark.parametrize(
    "q", ["the world of men", "time year people", "wrk lyfe", "the the"]
)
def test_local_equals_spark_free(engines, q):
    idx, local = engines
    s = [(r["doc_id"], r["score"]) for r in free_query(idx, q, 30).collect()]
    l = [(d, sc) for d, _u, sc in local.free_query(q, 30)]
    assert [d for d, _ in s] == [d for d, _ in l]
    for (sd, ss), (ld, ls) in zip(s, l):
        assert math.isclose(ss, ls, rel_tol=1e-9)


@pytest.mark.parametrize("q", ["the AND time", "people OR year", "NOT the"])
def test_local_equals_spark_boolean(engines, q):
    idx, local = engines
    s = [r["doc_id"] for r in boolean_query(idx, q).collect()]
    l = [d for d, u, _ in local.boolean_query(q) if u is not None]
    assert s == l


def test_driver_vocab_guard_fires_before_collect(engines, monkeypatch):
    """An over-threshold vocabulary must raise the routing RuntimeError
    WITHOUT collecting the vocabulary — at scale, collect-then-check
    would OOM the driver before the guard could fire. The row count
    comes from the stage manifest (no Spark job), so any collect during
    the check is a regression."""
    import pyspark.sql

    from search_rs_spark.plans import index as index_mod

    idx, _ = engines
    fresh = SearchIndex.load(idx.spark, idx.path)  # no cached driver vocab
    monkeypatch.setattr(index_mod, "DRIVER_VOCAB_MAX_TERMS", 1)

    def no_collect(self):
        raise AssertionError("driver_vocab collected before the size check")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", no_collect)
    with pytest.raises(RuntimeError, match="too large"):
        fresh.driver_vocab()


def test_local_latency_is_ms(engines):
    _, local = engines
    local.free_query("warmup", 10)
    t0 = time.time()
    for _ in range(20):
        local.free_query("the world of men", 100)
    per_query = (time.time() - t0) / 20
    assert per_query < 0.05, per_query  # ms-scale, not Spark-job-scale


def test_local_equals_spark_on_nostem_index(spark, tmp_path_factory):
    """Q1 ≡ B3 on BOTH surfaces: an index built with stem=False must get
    the tokenize-only query path in the driver-local engine too, or
    serving results diverge from the Spark engine on the same index."""
    out = str(tmp_path_factory.mktemp("idx_serve_nostem"))
    wt = synthesize_webtext(spark, 120, seed=23, vocab_size=200, mean_len=30)
    build_index(spark, wt, out, stem=False, corpus_fingerprint="serve120ns")
    idx = SearchIndex.load(spark, out)
    local = LocalEngine.load(out)
    assert local.stem is False
    for q in ["the world of men", "people years time"]:
        s = [(r["doc_id"], r["score"]) for r in free_query(idx, q, 20).collect()]
        l = [(d, sc) for d, _u, sc in local.free_query(q, 20)]
        assert [d for d, _ in s] == [d for d, _ in l], q
        for (sd, ss), (ld, ls) in zip(s, l):
            assert math.isclose(ss, ls, rel_tol=1e-9)
