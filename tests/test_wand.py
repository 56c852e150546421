"""Block-max WAND must be rank-identical to the exhaustive scorer."""

import math

import pytest

from search_rs_spark.operators.bm25 import free_query
from search_rs_spark.operators.wand import free_query_wand
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import synthesize_webtext


@pytest.fixture(scope="module")
def wand_index(spark, tmp_path_factory):
    wt = synthesize_webtext(spark, 300, seed=11, vocab_size=400, mean_len=50)
    out = str(tmp_path_factory.mktemp("idx_wand"))
    build_index(spark, wt, out, min_f=0, max_p=1.0, block_span=32)
    return SearchIndex.load(spark, out)


QUERIES = [
    ("the world of people", 10),
    ("man time year", 25),
    ("good great work life state", 5),
    ("the", 50),
    ("the the time", 10),
]


@pytest.mark.parametrize("q,k", QUERIES)
def test_wand_equals_exhaustive(wand_index, q, k):
    exact = [
        (r["doc_id"], round(r["score"], 9))
        for r in free_query(wand_index, q, k).collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 9))
        for r in free_query_wand(wand_index, q, k).collect()
    ]
    assert [d for d, _ in wand] == [d for d, _ in exact]
    for (wd, ws), (ed, es) in zip(wand, exact):
        assert math.isclose(ws, es, rel_tol=1e-9, abs_tol=1e-12)


def test_wand_empty_query(wand_index):
    assert free_query_wand(wand_index, "zzzzqqq", 10).count() == 0
