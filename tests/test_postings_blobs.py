"""encode_blobs=True writes reference-layout blobs per posting block."""

from search_rs_spark.functions.codecs import decode_postings
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import synthesize_webtext


def test_block_blobs_decode_to_arrays(spark, tmp_path):
    wt = synthesize_webtext(spark, 60, seed=29, vocab_size=120, mean_len=25)
    out = str(tmp_path / "idx")
    build_index(
        spark, wt, out, block_span=16, encode_blobs=True, corpus_fingerprint="blob60"
    )
    idx = SearchIndex.load(spark, out)
    rows = idx.postings.limit(50).collect()
    assert rows and all(r["postings_bytes"] is not None for r in rows)
    for r in rows:
        d, t, p = decode_postings(bytes(r["postings_bytes"]))
        assert d == list(r["doc_ids"])
        assert t == list(r["tfs"])
        assert p == [list(x) for x in r["positions"]]
