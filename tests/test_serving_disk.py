"""Term-pruned disk serving must equal LocalEngine (hence the Spark
engine) while reading only the query terms' postings and holding
nothing corpus-sized resident."""

import math

import pytest

from search_rs_spark.operators.serving import LocalEngine
from search_rs_spark.operators.serving_disk import DiskEngine
from search_rs_spark.plans.build import build_index
from search_rs_spark.sources.webtext import synthesize_webtext


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_servedisk"))
    wt = synthesize_webtext(spark, 150, seed=17, vocab_size=250, mean_len=35)
    build_index(spark, wt, out, corpus_fingerprint="servedisk150")
    return LocalEngine.load(out), DiskEngine.load(out)


@pytest.fixture(scope="module")
def nostem_engines(spark, tmp_path_factory):
    """stem=False index: the disk engine must honor the stats stem flag
    for query preprocessing exactly like the other engines (Q1 == B3)."""
    out = str(tmp_path_factory.mktemp("idx_servedisk_ns"))
    wt = synthesize_webtext(spark, 120, seed=23, vocab_size=200, mean_len=30)
    build_index(spark, wt, out, stem=False, corpus_fingerprint="servedisk_ns")
    return LocalEngine.load(out), DiskEngine.load(out)


@pytest.mark.parametrize(
    "q", ["the world of men", "time year people", "wrk lyfe", "the the"]
)
def test_disk_equals_local_free(engines, q):
    local, disk = engines
    l = local.free_query(q, 30)
    d = disk.free_query(q, 30)
    assert [(x[0], x[1]) for x in l] == [(x[0], x[1]) for x in d]
    for (_, _, ls), (_, _, ds_) in zip(l, d):
        assert math.isclose(ls, ds_, rel_tol=1e-12)


@pytest.mark.parametrize("q", ["the AND time", "people OR year", "NOT the"])
def test_disk_equals_local_boolean(engines, q):
    local, disk = engines
    assert local.boolean_query(q) == disk.boolean_query(q)


def test_disk_equals_local_free_nostem(nostem_engines):
    local, disk = nostem_engines
    assert not disk.stem
    l = local.free_query("the time world", 25)
    d = disk.free_query("the time world", 25)
    assert [(x[0], x[1]) for x in l] == [(x[0], x[1]) for x in d]


def test_disk_engine_holds_nothing_corpus_sized(engines):
    """The load-time footprint is stats + vocabulary only: no postings
    dict, no per-doc arrays (dls ride in the postings blocks; urls are
    fetched per result set)."""
    _, disk = engines
    assert not hasattr(disk, "postings")
    assert not hasattr(disk, "doc_lens")
    assert not hasattr(disk, "urls")


def test_disk_read_is_term_pruned(engines, monkeypatch):
    """The per-query postings read must filter to exactly the resolved
    query terms — the pruned-read contract the term-sorted layout
    exists for."""
    _, disk = engines
    seen = {}
    real = DiskEngine._read_postings

    def spy(self, tokens):
        seen["tokens"] = list(tokens)
        out = real(self, tokens)
        seen["terms_read"] = sorted(out.keys())
        return out

    monkeypatch.setattr(DiskEngine, "_read_postings", spy)
    disk.free_query("time year", 10)
    assert set(seen["terms_read"]) <= set(seen["tokens"])
    assert len(seen["tokens"]) <= 2


def test_row_group_pruning_bites(engines):
    """Plan-level pin of the I/O bound: with the term-sorted postings
    files, a single-term predicate must admit only row groups whose
    [min, max] term range covers it — strictly fewer rows materialized
    than the table holds (the fixture vocabulary is ~250 terms across
    multiple row groups only if files are small; assert on the
    fragment-level stats contract instead: every file reports term
    min/max so the pruning predicate is evaluable)."""
    import pyarrow.dataset as ds  # noqa: F401
    import pyarrow.parquet as pq

    _, disk = engines
    frags = list(disk._postings_ds.get_fragments())
    assert frags
    # resolve the term column INDEX by name from the file schema — a
    # hardcoded column(1) would silently check the wrong column if the
    # postings schema order ever changed (ADVICE round 6)
    pf0 = pq.ParquetFile(frags[0].path)
    term_idx = pf0.schema_arrow.get_field_index("term")
    assert term_idx >= 0
    total_rows = 0
    for frag in frags:
        md = pq.ParquetFile(frag.path).metadata
        total_rows += md.num_rows
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(term_idx)
            assert col.statistics is not None and col.statistics.has_min_max
    # and the stats must actually BITE: a single-term filtered read
    # materializes strictly fewer rows than the whole table
    import pyarrow.compute as pc

    one_term = pf0.read_row_group(0, columns=["term"])["term"][0].as_py()
    filtered = disk._postings_ds.to_table(
        columns=["term"], filter=pc.field("term") == one_term
    )
    assert 0 < filtered.num_rows < total_rows
