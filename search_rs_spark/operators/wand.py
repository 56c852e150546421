"""Block-max WAND pruning for top-k BM25+window queries.

New capability on top of the reference (SURVEY.md §2.5): safe top-k
pruning that stays rank-identical to the exhaustive scorer
(operators/bm25.py). Classic block-max WAND (Ding & Suel, SIGIR 2011)
adapted to the combined score of mod.rs:284-285:

    score(d) = 3.0 * num_tokens / window(d) + bm25(d) / doc_len(d)

Upper bound per doc-id block span (build-time metadata, zero array
reads — the postings arrays are column-pruned away in the bound pass):

    ub(span) = sum over query terms present in the span of
               idf_t * block_max_t            (block_max folds /doc_len)
             + 3.0                            if ALL distinct query terms
                                              have postings in the span
             + 3.0 * num_tokens / 2^32 - ish  otherwise (window stays
                                              u32::MAX -> epsilon bonus)

Exact-top-k protocol (two bounded passes, both distributed):
1. score exactly the spans with the largest ub until >= 4k candidate
   docs are covered; take the running k-th best score as theta;
2. exactly score every remaining span with ub > theta (provably the
   only spans that could alter the top-k), merge, and take the top-k.

Safety: every doc's true score <= its span's ub, so a span with
ub <= theta cannot contribute a doc above the k-th best.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import resolve_query_terms, score_candidates
from .window_score import U32_MAX, WINDOW_SCORE_MULTIPLIER

COVERAGE_FACTOR = 4


def free_query_wand(index, query: str, k: int = 100) -> DataFrame:
    """Rank-identical to operators.bm25.free_query, with block pruning."""
    terms = resolve_query_terms(index, query)
    spark = index.spark
    if not terms:
        return (
            index.doc_lengths.select("doc_id", "url", F.lit(0.0).alias("score")).limit(0)
        )
    num_tokens = len(terms)
    distinct_terms = {t for _, t, _ in terms}
    n_distinct = len(distinct_terms)

    # duplicate query tokens score the same term twice (mod.rs:152-179),
    # so the bound carries a multiplicity per distinct term
    mult: dict[str, int] = {}
    idf_by_term: dict[str, float] = {}
    for _, t, d in terms:
        mult[t] = mult.get(t, 0) + 1
        idf_by_term[t] = float(index.idf(d))
    qdf = spark.createDataFrame(
        [(t, idf_by_term[t], mult[t]) for t in mult], ["term", "idf", "mult"]
    )

    # ---- pass 0: block metadata only (arrays pruned by parquet reader) ----
    meta = (
        index.postings.select("term", "block_id", "df_block", "block_max")
        .filter(F.col("term").isin(sorted(distinct_terms)))
        .join(F.broadcast(qdf), "term")
    )
    span_ub = meta.groupBy("block_id").agg(
        F.sum(F.col("idf") * F.col("block_max") * F.col("mult")).alias("ub_bm"),
        F.countDistinct("term").alias("n_terms"),
        F.max("df_block").alias("max_docs"),
    ).withColumn(
        "ub",
        F.col("ub_bm")
        + F.when(
            F.col("n_terms") == n_distinct,
            F.lit(WINDOW_SCORE_MULTIPLIER * 1.0),
        ).otherwise(F.lit(WINDOW_SCORE_MULTIPLIER * num_tokens / U32_MAX)),
    )

    spans = span_ub.select("block_id", "ub", "max_docs").orderBy(F.desc("ub")).collect()
    if not spans:
        return (
            index.doc_lengths.select("doc_id", "url", F.lit(0.0).alias("score")).limit(0)
        )

    first_ids = []
    covered = 0
    for r in spans:
        first_ids.append(r["block_id"])
        covered += r["max_docs"]
        if covered >= COVERAGE_FACTOR * k:
            break
    ub_by_block = {r["block_id"]: r["ub"] for r in spans}

    def exact_scores(block_ids: list[int]) -> DataFrame:
        return score_candidates(index, terms, block_ids=block_ids)

    first = exact_scores(first_ids)
    first_top = first.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    if len(first_top) >= k:
        theta = first_top[-1]["score"]
    else:
        theta = float("-inf")

    # >= (not >): a doc could score exactly ub and win a doc_id tie-break
    first_set = set(first_ids)
    remaining = [b for b in ub_by_block if b not in first_set and ub_by_block[b] >= theta]
    if remaining:
        scored = first.unionAll(exact_scores(remaining))
    else:
        scored = first
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        index.doc_lengths.join(F.broadcast(topk), "doc_id")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
