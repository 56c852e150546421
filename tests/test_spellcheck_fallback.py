"""When the vocabulary exceeds the driver threshold, query resolution
falls back to the distributed trigram-join spellcheck and results stay
identical."""

import math

import pytest

import search_rs_spark.plans.index as index_mod
from search_rs_spark.operators.bm25 import free_query
from search_rs_spark.operators.boolean import boolean_query
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import synthesize_webtext


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_fb"))
    wt = synthesize_webtext(spark, 120, seed=13, vocab_size=200, mean_len=30)
    build_index(spark, wt, out, corpus_fingerprint="fb120")
    return out


def test_fallback_matches_driver_path(spark, built, monkeypatch):
    idx_driver = SearchIndex.load(spark, built)
    want_free = [
        (r["doc_id"], r["score"]) for r in free_query(idx_driver, "the world tyme", 20).collect()
    ]
    want_bool = [r["doc_id"] for r in boolean_query(idx_driver, "the AND world").collect()]

    monkeypatch.setattr(index_mod, "DRIVER_VOCAB_MAX_TERMS", 0)
    idx_dist = SearchIndex.load(spark, built)
    got_free = [
        (r["doc_id"], r["score"]) for r in free_query(idx_dist, "the world tyme", 20).collect()
    ]
    got_bool = [r["doc_id"] for r in boolean_query(idx_dist, "the AND world").collect()]

    assert [d for d, _ in got_free] == [d for d, _ in want_free]
    for (gd, gs), (wd, ws) in zip(got_free, want_free):
        assert math.isclose(gs, ws, rel_tol=1e-9)
    assert got_bool == want_bool


def test_distributed_tie_break_matches_reference_order(spark):
    """Crafted (lev, -df) tie where first-trigram order and term_id
    order disagree: query 'wxyz' vs vocabulary ['axyz', 'wxyb'].
    Both are lev=1 with equal df; the reference scans trigram 'wxy'
    (pos 0) first, whose list holds 'wxyb' — the first minimum — so
    'wxyb' must win even though 'axyz' has the smaller term_id."""
    from search_rs_spark.operators.spellcheck import (
        DriverVocabulary,
        spellcheck_distributed,
    )

    terms, dfs = ["axyz", "wxyb"], [5, 5]
    driver = DriverVocabulary(terms=terms, dfs=dfs)
    assert driver.spellcheck_term("wxyz") == "wxyb"

    vocab_df = spark.createDataFrame(
        [(t, i, d) for i, (t, d) in enumerate(zip(terms, dfs))],
        ["term", "term_id", "df"],
    )
    got = spellcheck_distributed(vocab_df, ["wxyz"])
    assert got["wxyz"] == "wxyb"
