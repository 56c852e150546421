"""Export the reference-format binary index and decode it back.

Checks the full encode chain (per-term blobs, bit-level stitch,
offsets, front-coded alphas/docs) against the pure-Python oracle build
on the same corpus. The bit-layout itself is pinned by the codec
golden-vector tests (tests/test_codecs.py)."""

import pytest

from search_rs_spark.oracle import build_oracle
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.export import export_reference_index, load_reference_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import synthesize_webtext


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    wt = synthesize_webtext(spark, 80, seed=3, vocab_size=150, mean_len=30)
    corpus = [(r["url"], r["text"]) for r in wt.select("url", "text").collect()]
    out = str(tmp_path_factory.mktemp("idx_exp"))
    build_index(spark, wt, out, min_f=0, max_p=1.0, block_span=16)
    idx = SearchIndex.load(spark, out)
    prefix = str(tmp_path_factory.mktemp("ref_files")) + "/idx"
    stats = export_reference_index(idx, prefix)
    return load_reference_index(prefix), build_oracle(corpus), stats


def test_terms_and_dfs(exported):
    loaded, oracle, _ = exported
    assert loaded["terms"] == oracle.terms
    assert loaded["dfs"] == oracle.dfs


def test_docs(exported):
    loaded, oracle, _ = exported
    assert [u for u, _ in loaded["docs"]] == oracle.urls
    assert [l for _, l in loaded["docs"]] == oracle.doc_lens


def test_postings(exported):
    loaded, oracle, _ = exported
    for term, plist in zip(loaded["terms"], loaded["postings"]):
        assert plist == oracle.postings[term], term


def test_files_padded_to_16(exported):
    _, _, stats = exported
    for k in ("postings_bytes", "offsets_bytes", "alphas_bytes", "docs_bytes"):
        assert stats[k] % 16 == 0
