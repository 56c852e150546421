"""Partial resume, distributed spellcheck parity, physical-plan pins,
and snippet fetch."""

import json
import os

import pytest
from pyspark.sql import functions as F

from search_rs_spark.operators.bm25 import free_query, resolve_query_terms, scored_hits
from search_rs_spark.operators.snippets import with_snippets
from search_rs_spark.operators.spellcheck import DriverVocabulary, spellcheck_distributed
from search_rs_spark.plans.build import build_index
from search_rs_spark.plans.index import SearchIndex
from search_rs_spark.sources.webtext import reference_fixture, synthesize_webtext


def test_partial_resume_reruns_only_missing_stage(spark, tmp_path):
    out = str(tmp_path / "idx")
    wt = reference_fixture(spark)
    build_index(spark, wt, out, corpus_fingerprint="fix3")
    # invalidate one downstream stage
    os.remove(os.path.join(out, "postings", "_MANIFEST.json"))
    m = build_index(spark, wt, out, corpus_fingerprint="fix3")
    by_stage = {x["stage"]: x for x in m if "stage" in x}
    assert by_stage["tokens"].get("skipped")
    assert by_stage["vocabulary"].get("skipped")
    assert not by_stage["postings"].get("skipped")
    # changing params invalidates everything
    m2 = build_index(spark, wt, out, min_f=1, corpus_fingerprint="fix3")
    assert not any(x.get("skipped") for x in m2 if "stage" in x)


def test_distributed_spellcheck_matches_driver(spark, tmp_path):
    wt = synthesize_webtext(spark, 120, seed=5, vocab_size=200, mean_len=30)
    out = str(tmp_path / "idx")
    build_index(spark, wt, out, corpus_fingerprint="s120")
    idx = SearchIndex.load(spark, out)
    vocab_df = idx.vocabulary
    driver = idx.driver_vocab()

    probes = ["peopl", "wrld", "statx", "zz", "knowx", "the"]
    dist = spellcheck_distributed(vocab_df, probes)
    for p in probes:
        drv = driver.spellcheck_term(p)
        got = dist[p]
        if drv is None:
            assert got is None, (p, got)
        else:
            # same (lev, df) key; iteration order may differ on exact ties
            assert got is not None
            from search_rs_spark.operators.spellcheck import levenshtein

            kd = (levenshtein(p, drv), -driver.dfs[driver.term_to_index[drv]])
            kg = (levenshtein(p, got), -driver.dfs[driver.term_to_index[got]])
            assert kd == kg, (p, drv, got)


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_plan"))
    wt = synthesize_webtext(spark, 150, seed=9, vocab_size=250, mean_len=30)
    build_index(spark, wt, out, corpus_fingerprint="p150")
    return SearchIndex.load(spark, out), wt


def test_physical_plan_properties(spark, small_index):
    """Pin the plan shapes the engine depends on at scale."""
    idx, _ = small_index
    terms = resolve_query_terms(idx, "the world time")
    plan = scored_hits(idx, terms)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # query terms broadcast, never shuffled
    assert "term#" in plan and " IN (" in plan  # IN-filter reaches the scan

    # the distributed bounded top-k happens inside free_query's eager
    # scoring pass; pin it on the scoring plan it collects from
    from search_rs_spark.operators.bm25 import score_candidates
    from pyspark.sql import functions as F

    cleanup = []
    scoring = (
        score_candidates(idx, terms, k=10, cleanup=cleanup)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )
    topk_plan = scoring._jdf.queryExecution().executedPlan().toString()
    for c in cleanup:
        c.unpersist(blocking=False)
    assert "TakeOrderedAndProject" in topk_plan  # distributed bounded top-k

    # the returned DataFrame joins only the k winners (broadcast)
    result_plan = (
        free_query(idx, "the world time", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in result_plan


def test_snippets(spark, small_index):
    idx, wt = small_index
    res = free_query(idx, "the world", 5)
    snip = with_snippets(res, wt).collect()
    assert len(snip) == 5
    for r in snip:
        assert r["snippet"] and len(r["snippet"]) <= 250


def test_postings_shuffle_partitions_sizing():
    """Data-sized postings shuffle: never below the session conf, grows
    as ceil(fragments / POSTINGS_FRAGMENTS_PER_PARTITION). The 10M-doc
    corpus (912M fragments) must land well above 64 — the measured
    8g-heap failure point — and tiny corpora must stay at the conf."""
    from search_rs_spark.plans.build import (
        POSTINGS_FRAGMENTS_PER_PARTITION,
        postings_shuffle_partitions,
    )

    assert postings_shuffle_partitions(0, 32) == 32
    assert postings_shuffle_partitions(456_000, 32) == 32  # sf0.1 scale
    assert postings_shuffle_partitions(911_875_678, 64) == 228  # 10M docs
    assert (
        postings_shuffle_partitions(POSTINGS_FRAGMENTS_PER_PARTITION + 1, 1) == 2
    )


def test_postings_aggregate_reuses_explicit_partitioning(spark):
    """repartition(n, subset-of-grouping-keys) must satisfy the
    aggregate's distribution: exactly ONE shuffle exchange in the plan,
    so the data-sized partitioning actually controls the aggregate's
    task memory (no second conf-sized exchange behind it)."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("term_id"),
        (F.col("id") % 7).cast("string").alias("term"),
        (F.col("id") % 11).alias("block_id"),
        F.col("id").alias("doc_id"),
    )
    plan = (
        df.repartition(5, "term_id", "block_id")
        .groupBy("term_id", "term", "block_id")
        .agg(F.collect_list("doc_id").alias("docs"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
