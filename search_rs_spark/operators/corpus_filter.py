"""End-to-end corpus filtering: the keep/drop decision a training-data
pipeline actually runs, composed from the individual analysis operators
(functions/text_analysis.py, operators/dedup.py) with machine-checkable
reasons.

Checks (each contributes a reason string when violated):
  too_short / too_long   token-count bounds
  low_quality            composite quality score below threshold
  wrong_lang             predicted language not in the allow-list
  exact_duplicate        not the min-doc_id copy of an identical text
  near_duplicate         not the representative of its near-dup cluster

``reasons`` is emitted as a comma-joined string (stable order, so both
engines hash identically and tabular tooling can sort it);
``keep = (reasons = '')``. The whole decision is one relational plan —
every component scales as its operator does (see their module docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import lang_id, lang_id_sql, quality_scores, QUALITY_SQL
from .dedup import (
    EXACT_DEDUP_SQL,
    duplicate_clusters,
    duplicate_clusters_sql,
    exact_dedup,
)

MIN_TOKENS = 10
MAX_TOKENS = 5_000
MIN_QUALITY = 0.5
ALLOWED_LANGS = ("en",)


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_quality: float = MIN_QUALITY,
    langs: tuple[str, ...] = ALLOWED_LANGS,
    persist_tracker: list | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, quality, lang_pred, reasons, keep).

    The components share ONE corpus scan and ONE tokenization: the
    (doc_id, text, toks) projection is persisted and every component
    reads it via its ``toks_col`` hook, where the previous composition
    re-scanned the source four times and re-ran the tokenizer regex in
    three of the subtrees (the round-6 finding: at single-box 10M the
    redundant concurrent subtree footprints were the composition's
    memory wall). ``persist_tracker`` receives the cache handles (the
    shared base plus the LSH pipeline's intermediates) — same contract
    as ``dedup.minhash_lsh_pairs``."""
    from ..functions.text_analysis import SPARK_TOKENS

    base = docs.select(
        "doc_id", "text", F.expr(SPARK_TOKENS).alias("toks")
    ).persist()
    if persist_tracker is not None:
        persist_tracker.append(base)
    q = quality_scores(base, toks_col="toks").select(
        "doc_id", "n_tokens", "quality"
    )
    l = lang_id(base, toks_col="toks").select("doc_id", "lang_pred")
    ed = exact_dedup(base).select(
        "doc_id", F.col("is_duplicate").alias("exact_dup")
    )
    nd = duplicate_clusters(
        base, toks_col="toks", persist_tracker=persist_tracker
    ).select("doc_id", F.col("is_duplicate").alias("near_dup"))
    j = q.join(l, "doc_id").join(ed, "doc_id").join(nd, "doc_id")
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
                F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
                F.when(F.col("quality") < min_quality, F.lit("low_quality")),
                F.when(
                    ~F.col("lang_pred").isin(*langs), F.lit("wrong_lang")
                ),
                F.when(F.col("exact_dup"), F.lit("exact_duplicate")),
                F.when(F.col("near_dup"), F.lit("near_duplicate")),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "quality",
        "lang_pred",
        reasons.alias("reasons"),
        (reasons == F.lit("")).alias("keep"),
    )


def corpus_filter_sql(
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_quality: float = MIN_QUALITY,
    langs: tuple[str, ...] = ALLOWED_LANGS,
) -> str:
    lang_list = ", ".join(f"'{x}'" for x in langs)
    return f"""
WITH q AS (
  SELECT doc_id, n_tokens, quality FROM ({QUALITY_SQL}) t
), l AS (
  SELECT doc_id, lang_pred FROM ({lang_id_sql()}) t
), ed AS (
  SELECT doc_id, is_duplicate AS exact_dup FROM ({EXACT_DEDUP_SQL}) t
), nd AS (
  SELECT doc_id, is_duplicate AS near_dup FROM ({duplicate_clusters_sql()}) t
), j AS (
  SELECT q.doc_id, q.n_tokens, q.quality, l.lang_pred, ed.exact_dup, nd.near_dup
  FROM q JOIN l USING (doc_id) JOIN ed USING (doc_id) JOIN nd USING (doc_id)
), r AS (
  SELECT *, coalesce(array_to_string(list_filter([
      CASE WHEN n_tokens < {min_tokens} THEN 'too_short' END,
      CASE WHEN n_tokens > {max_tokens} THEN 'too_long' END,
      CASE WHEN quality < {min_quality} THEN 'low_quality' END,
      CASE WHEN lang_pred NOT IN ({lang_list}) THEN 'wrong_lang' END,
      CASE WHEN exact_dup THEN 'exact_duplicate' END,
      CASE WHEN near_dup THEN 'near_duplicate' END
    ], x -> x IS NOT NULL), ','), '') AS reasons
  FROM j
)
SELECT doc_id, n_tokens, quality, lang_pred, reasons, reasons = '' AS keep
FROM r
"""
