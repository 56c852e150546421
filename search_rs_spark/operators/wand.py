"""Block-max WAND pruning for top-k BM25+window queries.

New capability on top of the reference (SURVEY.md §2.5): safe top-k
pruning that stays rank-identical to the exhaustive scorer
(operators/bm25.py). Classic block-max WAND (Ding & Suel, SIGIR 2011)
adapted to the combined score of mod.rs:284-285:

    score(d) = 3.0 * num_tokens / window(d) + bm25(d) / doc_len(d)

Upper bound per doc-id block span (build-time metadata, zero array
reads — the postings arrays are column-pruned away in the bound pass):

    ub(span) = sum over query terms present in the span of
               idf_t * mult_t * block_max_t   (block_max folds /doc_len)
             + 3.0 * num_tokens / n_distinct  if ALL distinct query terms
                                              have postings in the span
             + 3.0 * num_tokens / 2^32        otherwise (window stays
                                              u32::MAX -> epsilon bonus)

The all-terms-present window bonus is ``3.0 * num_tokens / n_distinct``,
NOT a flat 3.0: duplicate query tokens (e.g. "the the time") share
positions, so the minimal covering window can be as small as the number
of DISTINCT terms, and the true window component reaches
``3.0 * num_tokens / n_distinct`` (= 3.0 only when all tokens are
distinct). A flat 3.0 would under-bound duplicate-token queries and
make pruning unsafe.

Exact-top-k protocol (two bounded passes, fully distributed — no
full-metadata collect, no literal IN-lists):
1. the coverage set = highest-ub spans whose cumulative doc coverage
   reaches COVERAGE_FACTOR * k, picked via distributed top-N
   (TakeOrderedAndProject over at most COVERAGE_FACTOR*k slim rows —
   every span holds >= 1 doc, so the top COVERAGE_FACTOR*k spans always
   suffice) + a cumulative-sum window over that bounded set; score those
   spans exactly and take the running k-th best score as theta (the only
   driver-side value: k winner rows);
2. exactly score every remaining span with ub >= theta (provably the
   only spans that could alter the top-k), merge, and take the top-k.
   Surviving-span sets up to MAX_LITERAL_BLOCKS inline as a literal
   scan filter (parquet row-group stats skip the pruned blocks' array
   columns entirely — the IO win pruning exists for); larger sets fall
   back to a broadcast semi join (prunes the explode, not the scan).

Safety: every doc's true score <= its span's ub, so a span with
ub < theta cannot contribute a doc at or above the k-th best
(>= keeps spans that could win a doc_id tie-break at exactly theta).

Measured regime (1M-doc Zipfian corpus, local[16]): the two bounded
passes cost ~8 s vs ~3.6 s for the exhaustive scorer — on this corpus
nearly every span holds all query terms, so the all-terms window bonus
blankets the ub spread and ub >= theta keeps ~99% of spans (243/245
measured): pruning cannot fire, and WAND would pay its pass structure
for nothing. :func:`free_query_wand` therefore COST-GATES the
protocol (see its docstring): two metadata-only checks route such
queries to the exhaustive scorer, so a caller always gets within a
hair of the better plan. The protocol's own regime is corpora where
the per-span metadata scan is far smaller than the posting arrays
(billions of docs / long head-term lists) or score mixes where the
bm25 spread dominates the window bonus; rank-identity with the
exhaustive path holds everywhere (tests/test_wand.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import free_query, materialize_topk, resolve_query_terms, score_candidates
from .window_score import U32_MAX, WINDOW_SCORE_MULTIPLIER

COVERAGE_FACTOR = 4

# cost gates (see free_query_wand): the block protocol only runs when
# the span pool is big enough that pruning CAN pay (pre-gate), and is
# abandoned when theta leaves too many spans alive for it to pay
# (post-theta gate). Both consult only the slim persisted span-ub
# metadata — one tiny aggregate each, never the posting arrays.
SPAN_GATE_FACTOR = 2  # pre-gate: need > this x coverage target spans
BLANKET_FRACTION = 0.95  # pre-gate: bail when >= this holds all terms
# zero-job blanket-estimate guard: the uniform-placement estimate is
# trusted only when every query term's df/N is at least this — below
# it, spatial clustering can make the real span-miss fraction large
# while the estimate says ~0, so mid-df queries go to the measured gate
HEAD_DF_FRACTION = 0.2
SURVIVOR_BAILOUT_FRACTION = 0.5  # post-gate: bail when >= this survives

# pre-gate (absolute volume, zero-job): the exhaustive scorer explodes
# exactly sum(df over distinct query terms) posting rows in ONE job
# chain; the protocol's two bounded passes + gate aggregates are ~6
# extra jobs of fixed structure. Below this volume the single pass is
# cheaper than the structure even when pruning would skip 90% of spans
# (measured: 1M-doc planted-rare-term corpus, sum_df ~= 1M, exhaustive
# 3.4-4.1 s vs protocol 7.3 s despite ~10% survivors). Calibrated to
# ~1M rows/s/core single-pass scoring on this class of hardware; the
# relative gates below handle the can-pruning-bite question, this one
# handles is-there-enough-work-to-prune.
MIN_PRUNABLE_POSTINGS = 4_000_000

# block restrictions at or under this many ids inline as a literal
# (row-group-prunable) scan filter; larger sets fall back to the
# broadcast semi-join (see scored_hits). Bounds plan-compile cost.
MAX_LITERAL_BLOCKS = 2048


def span_upper_bounds(index, terms: list[tuple[int, str, int]]) -> DataFrame:
    """(block_id, ub, max_docs) for every doc-id span touched by the
    query terms — metadata columns only, arrays never read."""
    spark = index.spark
    num_tokens = len(terms)
    distinct_terms = {t for _, t, _ in terms}
    n_distinct = len(distinct_terms)

    # duplicate query tokens score the same term twice (mod.rs:152-179),
    # so the bm25 side of the bound carries a multiplicity per distinct
    # term and the window side caps at num_tokens / n_distinct
    mult: dict[str, int] = {}
    idf_by_term: dict[str, float] = {}
    for _, t, d in terms:
        mult[t] = mult.get(t, 0) + 1
        idf_by_term[t] = float(index.idf(d))
    # same one-call VALUES form as scored_hits (createDataFrame's py4j
    # round trip costs ~0.15 s; terms are alnum-only, quotes escaped)
    rows = ", ".join(
        "('{}', CAST('{!r}' AS DOUBLE), {})".format(
            t.replace("'", "''"), float(idf_by_term[t]), int(mult[t])
        )
        for t in mult
    )
    qdf = spark.sql(f"SELECT * FROM VALUES {rows} AS t(term, idf, mult)")

    meta = (
        index.postings.select("term", "block_id", "df_block", "block_max")
        .filter(F.col("term").isin(sorted(distinct_terms)))
        .join(F.broadcast(qdf), "term")
    )
    return meta.groupBy("block_id").agg(
        F.sum(F.col("idf") * F.col("block_max") * F.col("mult")).alias("ub_bm"),
        F.countDistinct("term").alias("n_terms"),
        F.max("df_block").alias("max_docs"),
    ).withColumn(
        "ub",
        F.col("ub_bm")
        + F.when(
            F.col("n_terms") == n_distinct,
            F.lit(WINDOW_SCORE_MULTIPLIER * num_tokens / n_distinct),
        ).otherwise(F.lit(WINDOW_SCORE_MULTIPLIER * num_tokens / U32_MAX)),
    ).select(
        "block_id",
        "ub",
        "max_docs",
        # all-terms flag kept for the blanket cost gate (free_query_wand):
        # spans holding every distinct term share one uniform window
        # bonus, so when (nearly) all spans do, the ub spread is
        # bm-only and pruning cannot bite
        (F.col("n_terms") == n_distinct).alias("all_terms"),
    )


def free_query_wand(
    index,
    query: str,
    k: int = 100,
    force_protocol: bool | None = None,
    plan_cache: bool = True,
) -> DataFrame:
    """Rank-identical to operators.bm25.free_query, with block pruning.

    Cost-gated: the two-pass block protocol only pays when most spans
    can be skipped, so two metadata-only gates route the query to the
    plain exhaustive scorer (identical results by definition) when
    pruning cannot win:

    - pre-gate (absolute volume, zero-job): if sum(df) over the distinct
      query terms — exactly the posting-row count the exhaustive scorer
      explodes in its single pass — is under MIN_PRUNABLE_POSTINGS,
      there is not enough work for pruning to repay the protocol's
      multi-job structure no matter how well theta prunes (measured:
      1M-doc rare-term corpus, ~10% survivors, protocol still 2x
      slower). Bail before any job.
    - pre-gate (span pool): if the query touches <= SPAN_GATE_FACTOR *
      COVERAGE_FACTOR * k spans, the coverage set would swallow
      (nearly) the whole pool and pass 2 could skip almost nothing —
      the protocol is pure overhead (the measured 1M-doc regime:
      245 spans vs a 400-span coverage target, 2.3x slower than
      exhaustive). Zero-job when even the corpus's total block count
      is under the gate; else part of the one-aggregate pre-gate.
    - pre-gate (blanketing): if >= BLANKET_FRACTION of the spans
      contain ALL distinct query terms, the window bonus is uniform
      across (nearly) every span, the ub spread is bm-only, and
      block-max slack keeps ~99% of spans above any reachable theta
      (measured 243/245 at 1M docs; 10M-doc protocol run 10.6 s vs
      6.5 s exhaustive) — bail before pass 1. Shares one slim
      metadata aggregate with the span-pool gate. All-head-term
      queries short-circuit this check zero-job via a driver-side
      blanket estimate from the dfs (see inline comment) — the
      metadata aggregate itself scans the query terms' postings,
      which is exactly the work pruning was supposed to avoid.
    - post-theta gate: if >= SURVIVOR_BAILOUT_FRACTION of spans have
      ub >= theta after pass 1 (e.g. the all-terms window bonus
      blankets the ub spread), restricting pass 2 to survivors still
      scores almost everything while paying the two-pass structure —
      fall through to the exhaustive scorer.

    ``force_protocol=True`` disables both gates (tests pin the
    protocol's rank-identity directly); ``False`` forces the exhaustive
    path; ``None`` (default) applies the gates.
    """
    terms = resolve_query_terms(index, query)
    if not terms:
        return (
            index.doc_lengths.select("doc_id", "url", F.lit(0.0).alias("score")).limit(0)
        )
    if force_protocol is False:
        return free_query(index, query, k, plan_cache=plan_cache)

    if force_protocol is None:
        # zero-job forms of the pre-gates:
        # - single-distinct-term queries blanket trivially (every
        #   touched span holds "all" terms, so the window bonus is
        #   uniform and the ub spread is bm-only — the regime where
        #   block-max slack keeps ~everything above theta);
        # - the span pool can never exceed the corpus's total block
        #   count (ceil(num_docs / block_span), both in the stats
        #   json), so when even that ceiling is under the gate, bail
        #   without running ANY metadata job.
        import math

        if len({t for _, t, _ in terms}) == 1:
            return free_query(index, query, k, plan_cache=plan_cache)
        block_span = int(index.stats.get("block_span") or 1)
        max_spans = math.ceil(index.num_docs / block_span)
        if max_spans <= SPAN_GATE_FACTOR * COVERAGE_FACTOR * k:
            return free_query(index, query, k, plan_cache=plan_cache)
        # absolute-volume gate: dfs arrived with resolve_query_terms,
        # so this costs nothing (see MIN_PRUNABLE_POSTINGS)
        sum_df = sum({t: df for _, t, df in terms}.values())
        if sum_df <= MIN_PRUNABLE_POSTINGS:
            return free_query(index, query, k, plan_cache=plan_cache)
        # blanket estimate (zero-job): the in-plan blanket gate below
        # needs span_upper_bounds — a full postings scan of the query
        # terms that pruning then throws away when it fires (measured
        # 30M docs, 5 head terms: +40 s of discarded metadata pass,
        # wand-auto 140.5 s vs 100.5 s straight free_query). Estimate
        # the blanket fraction driver-side from the dfs instead: under
        # a uniform doc-placement model a span of `block_span` docs
        # misses term t with probability (1 - df_t/N)^block_span, so
        # the expected fraction of spans missing ANY term is at most
        # the sum over distinct terms (union bound). Head terms
        # (df/N >= 0.2) drive this to ~0 and bail here with ZERO jobs;
        # the paying planted-rare regime (df/N ~= 5e-5, block_span
        # 4096 -> miss ~= 0.81 per BASELINE.md) sails past and keeps
        # the protocol. For spatially CLUSTERED mid-df terms the
        # uniform model UNDERestimates the miss fraction (a term
        # confined to a doc-id range is absent from most spans even
        # when (1-df/N)^B ~= 0), so an estimate-only gate would bail
        # to the exhaustive scorer and forfeit a pruning win the
        # measured in-plan gate would have kept. Guard: take the
        # zero-job bail only when EVERY distinct term is unambiguously
        # head (df/N >= HEAD_DF_FRACTION — a term occupying >= 20% of
        # the corpus cannot be clustered out of most spans); anything
        # with a mid-df term falls through to the measured in-plan
        # gate below (the pre-round-5 status quo, rank-identical
        # either way; tests/test_wand.py pins the clustered regime).
        n = float(index.num_docs) or 1.0
        dfs = {t: df for _, t, df in terms}.values()
        miss_est = sum((1.0 - df / n) ** block_span for df in dfs)
        if (
            min(dfs) / n >= HEAD_DF_FRACTION
            and miss_est <= 1.0 - BLANKET_FRACTION
        ):
            return free_query(index, query, k, plan_cache=plan_cache)

    span_ub = span_upper_bounds(index, terms).persist()

    cleanup: list = []
    try:
        # ---- pass 1: coverage set, picked distributedly -------------------
        # top-N by ub is bounded by COVERAGE_FACTOR*k rows (each span
        # covers >= 1 doc), so the cumulative-sum window below runs over
        # a tiny, driver-independent set; blocks stay in DataFrames end
        # to end. Runs inside the try: the collect is a real Spark job,
        # and a failure here must still unpersist span_ub.
        target = COVERAGE_FACTOR * k
        cand = span_ub.orderBy(F.desc("ub"), F.asc("block_id")).limit(target)
        # Unpartitioned window, intentionally: cand is capped at
        # COVERAGE_FACTOR*k rows by the limit above, so the single-task
        # window is bounded and the `WindowExec: No Partition Defined`
        # warning it emits is expected.
        w = (
            Window.orderBy(F.desc("ub"), F.asc("block_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # the coverage set is bounded by COVERAGE_FACTOR*k rows
        # (collecting the ids is the protocol's pass-1 driver contact,
        # same order of bytes as the k winner rows) — but for k > 512
        # that exceeds MAX_LITERAL_BLOCKS, so the SCAN-side form
        # switches from an inlined IN filter to a broadcast semi-join
        # on a driver-local DataFrame (same ids, no plan-compile or
        # parquet inFilterThreshold blowup); the pass-2 exclusion
        # switches to an anti-join off the same table.
        first_blocks = sorted(
            int(r["block_id"])
            for r in cand.withColumn("cum", F.sum("max_docs").over(w))
            .filter(F.col("cum") - F.col("max_docs") < target)
            .select("block_id")
            .collect()
        )
        if len(first_blocks) <= MAX_LITERAL_BLOCKS:
            first_rep: "list[int] | DataFrame" = first_blocks
            first_df = None
        else:
            first_df = index.spark.createDataFrame(
                [(b,) for b in first_blocks], "block_id long"
            )
            first_rep = first_df
        if force_protocol is None:
            gate = span_ub.agg(
                F.count(F.lit(1)).alias("n_spans"),
                F.count_if(F.col("all_terms")).alias("n_full"),
            ).collect()[0]
            n_spans, n_full = gate["n_spans"], gate["n_full"]
            if (
                n_spans <= SPAN_GATE_FACTOR * target
                or n_full >= BLANKET_FRACTION * n_spans
            ):
                return free_query(index, query, k, plan_cache=plan_cache)
        # prefilter=False: the block restriction already bounds each
        # pass's candidate set (COVERAGE_FACTOR*k spans / ub survivors),
        # so score_candidates' own theta pre-pass would only add a
        # second persist + collect per pass — measured 10.4 s -> with
        # the inner prefilter off, the pass count halves
        first_top = (
            score_candidates(
                index, terms, blocks=first_rep, k=k, cleanup=cleanup,
                prefilter=False,
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        theta = first_top[-1]["score"] if len(first_top) >= k else float("-inf")

        # ---- post-theta gate: does pruning actually bite? -----------------
        # one count over the persisted slim span table; pass-1 work is
        # discarded on bailout (it was bounded by the coverage target)
        if force_protocol is None:
            survivors = span_ub.filter(F.col("ub") >= F.lit(theta)).count()
            if survivors >= SURVIVOR_BAILOUT_FRACTION * n_spans:
                return free_query(index, query, k, plan_cache=plan_cache)

        # ---- pass 2: every other span that could still alter the top-k ----
        # >= (not >): a doc could score exactly theta and win a doc_id
        # tie-break. Each pass's own doc-level prefilter (k) only drops
        # docs provably below >= k docs of the SAME pass, so the merged
        # top-k stays exact.
        remaining = span_ub.filter(F.col("ub") >= F.lit(theta))
        if first_df is None:
            remaining = remaining.filter(~F.col("block_id").isin(first_blocks))
        else:
            remaining = remaining.join(
                F.broadcast(first_df), "block_id", "left_anti"
            )
        remaining = remaining.select("block_id")
        # survivor ids: up to MAX_LITERAL_BLOCKS collect as literals so
        # the pass-2 scan row-group-prunes the skipped blocks (their
        # positions arrays are never read); beyond that, stay a
        # DataFrame semi-join. The limit bounds the driver contact.
        # An empty survivor set also skips pass 2's job chain entirely.
        surv = remaining.limit(MAX_LITERAL_BLOCKS + 1).collect()
        if not surv:
            second_top = []
        else:
            blocks2 = (
                sorted(int(r["block_id"]) for r in surv)
                if len(surv) <= MAX_LITERAL_BLOCKS
                else remaining
            )
            second_top = (
                score_candidates(
                    index, terms, blocks=blocks2, k=k, cleanup=cleanup,
                    prefilter=False,
                )
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
    finally:
        span_ub.unpersist(blocking=False)
        for c in cleanup:
            c.unpersist(blocking=False)

    merged = sorted(
        list(first_top) + list(second_top),
        key=lambda r: (-r["score"], r["doc_id"]),
    )[:k]
    return materialize_topk(index, merged)
