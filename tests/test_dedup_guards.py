"""Scale guards on the dedup operators: degenerate LSH band buckets
(e.g. thousands of identical boilerplate docs sharing one band
signature) must be dropped — bounding the candidate self-join — while
ordinary near-dup buckets keep working."""

import logging

import pytest

from pyspark.sql import functions as F

from search_rs_spark.operators.dedup import exact_dedup, minhash_lsh_pairs


@pytest.fixture(scope="module")
def boilerplate_corpus(spark):
    """1000 identical docs + one genuine near-dup pair + filler."""
    rows = [(i, "copyright notice all rights reserved contact us terms")
            for i in range(1000)]
    # jaccard 0.7, collides on band 2 (verified offline against the
    # operator's md5 scheme)
    rows.append((2000, "the quick brown fox jumps over the lazy dog today "
                       "while birds sing in the tall green trees outside"))
    rows.append((2001, "the quick brown fox jumps over the lazy cat today "
                       "while birds sing in the tall green trees outside"))
    rows.append((2002, "completely unrelated text about spark query engines"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_degenerate_buckets_are_capped_and_logged(spark, boilerplate_corpus, caplog):
    with caplog.at_level(logging.WARNING, logger="search_rs_spark.dedup"):
        pairs = minhash_lsh_pairs(
            boilerplate_corpus, threshold=0.5, max_bucket=50
        ).collect()
    assert any("degenerate band buckets" in r.message for r in caplog.records)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # the boilerplate flood is excluded (its buckets exceed the cap) ...
    assert not any(a < 1000 and b < 1000 for a, b in got)
    # ... but the genuine near-dup pair in its own small bucket survives
    assert (2000, 2001) in got


def test_uncapped_flood_is_quadratic_and_exact_dedup_owns_it(spark, boilerplate_corpus):
    """Without the cap the identical docs would produce ~500k candidate
    pairs; exact_dedup collapses them in one aggregation instead."""
    small = boilerplate_corpus.filter(
        (F.col("doc_id") < 40) | (F.col("doc_id") >= 2000)
    )
    uncapped = minhash_lsh_pairs(small, threshold=0.5, max_bucket=None).collect()
    flood_pairs = [(r["doc_a"], r["doc_b"]) for r in uncapped
                   if r["doc_a"] < 1000 and r["doc_b"] < 1000]
    assert len(flood_pairs) == 40 * 39 // 2  # quadratic in bucket size

    dd = exact_dedup(boilerplate_corpus)
    groups = dd.filter(F.col("group_n") > 1).select("keep_doc_id").distinct().collect()
    assert len(groups) == 1  # one duplicate group, min doc kept
    dup_n = dd.filter(F.col("is_duplicate")).count()
    assert dup_n == 999


def test_duplicate_clusters_are_transitive(spark):
    """A~B and B~C must land in one cluster even when A/C never share a
    band bucket — the pairwise output alone under-removes that case."""
    from search_rs_spark.operators.dedup import duplicate_clusters, minhash_lsh_pairs

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango").split()
    # single-spot diffs picked (deterministically, by probing the
    # sha256-lane hash family) so banding yields edges (0,1) and (1,2)
    # but NOT (0,2) — the exact shape where pairwise output under-removes
    mid = list(base)
    mid[3] = "uniform"  # B: differs from A in 1 spot
    far = list(mid)
    far[8] = "victor"  # C: differs from B in 1 more
    texts = {0: " ".join(base), 1: " ".join(mid), 2: " ".join(far)}
    rows = [(i, t) for i, t in texts.items()]
    rows += [(10 + i, f"unrelated document number {i} about spark engines "
                      f"and parquet tables variant {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs

    got = {r["doc_id"]: (r["cluster_rep"], r["is_duplicate"])
           for r in duplicate_clusters(docs, threshold=0.5).collect()}
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[2] == (0, True)  # transitive even if (0,2) not a pair
    for i in range(5):
        assert got[10 + i] == (10 + i, False)  # singletons self-represent


def test_cap_never_fires_on_the_oracle_corpus(spark, sf_dir, caplog):
    """The default cap must not perturb the driver-oracle corpus: no
    bucket there comes near MAX_BAND_BUCKET, so results are identical
    with and without the guard."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with caplog.at_level(logging.WARNING, logger="search_rs_spark.dedup"):
        capped = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert not any("degenerate" in r.message for r in caplog.records)
    raw = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, max_bucket=None).collect()
    }
    assert capped == raw