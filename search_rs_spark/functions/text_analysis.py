"""Text-analysis operators for large-scale training-data pipelines.

Each operator has a Spark DataFrame implementation and a matching
ANSI-SQL (DuckDB-dialect) oracle string over the same ``documents``
table, used by the driver correctness gate. Formulas are deliberately
expressed with engine-portable primitives (``regexp_extract_all``,
``md5``, list lambdas) so both engines compute bit-identical results.

The shared tokenizer here is the *no-stem* variant of the reference
preprocessor (/root/reference/search/src/engine/preprocessor.rs:17-24):
extracting ``[a-z0-9]+`` runs of the lowercased text yields exactly the
same token list as the reference's replace-then-split (stemming is not
expressible in SQL, so the stemmed path is checked by pytest against
the Python oracle instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# identical token extraction in both engines
SPARK_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
DUCK_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "it", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "por", "con", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]


def _arr(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _lst(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, avg_token_len)."""
    t = F.expr(SPARK_TOKENS)
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique_tokens"),
        F.round(
            F.coalesce(
                F.aggregate(t, F.lit(0).cast("double"), lambda a, x: a + F.length(x))
                / F.nullif(F.size(t), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("avg_token_len"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len({DUCK_TOKENS}) AS n_tokens,
       len(list_distinct({DUCK_TOKENS})) AS n_unique_tokens,
       round(coalesce(
           list_sum(list_transform({DUCK_TOKENS}, x -> len(x)))::DOUBLE
           / nullif(len({DUCK_TOKENS}), 0), 0.0::DOUBLE), 6)::DOUBLE AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# language identification (stopword-ratio heuristic)
# ---------------------------------------------------------------------------


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax stopword-hit ratio.

    Tie-break: first language in LANG_ORDER; 'und' when no stopword hits.
    """
    t = F.expr(SPARK_TOKENS)
    d = docs.select("doc_id", t.alias("toks"))
    for lang in LANG_ORDER:
        d = d.withColumn(
            f"r_{lang}",
            F.coalesce(
                F.size(
                    F.filter(
                        F.col("toks"),
                        lambda x: F.array_contains(
                            F.expr(_arr(LANG_STOPWORDS[lang])), x
                        ),
                    )
                ).cast("double")
                / F.nullif(F.size("toks"), F.lit(0)),
                F.lit(0.0),
            ),
        )
    best = F.greatest(*[F.col(f"r_{lang}") for lang in LANG_ORDER])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(F.col(f"r_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(best, 6).alias("lang_score"),
    )


def lang_id_sql() -> str:
    ratios = ",\n       ".join(
        f"coalesce(len(list_filter(toks, x -> list_contains({_lst(LANG_STOPWORDS[lang])}, x)))::DOUBLE"
        f" / nullif(len(toks), 0), 0.0) AS r_{lang}"
        for lang in LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"r_{lang}" for lang in LANG_ORDER) + ")"
    case = "CASE WHEN " + best + " <= 0.0 THEN 'und' "
    for lang in LANG_ORDER:
        case += f"WHEN r_{lang} = {best} THEN '{lang}' "
    case += "END"
    return f"""
WITH tok AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
), r AS (
  SELECT doc_id, {ratios} FROM tok
)
SELECT doc_id, {case} AS lang_pred, round({best}, 6)::DOUBLE AS lang_score FROM r
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_EN = LANG_STOPWORDS["en"]


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, alnum_ratio, quality):
    0.4*min(n/100,1) + 0.3*min(4*stop_ratio,1) + 0.3*alnum_ratio."""
    t = F.expr(SPARK_TOKENS)
    d = docs.select(
        "doc_id",
        F.col("text"),
        t.alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.coalesce(
            F.size(
                F.filter(
                    F.col("toks"),
                    lambda x: F.array_contains(F.expr(_arr(_EN)), x),
                )
            ).cast("double")
            / F.nullif(F.size("toks"), F.lit(0)),
            F.lit(0.0),
        ).alias("stop_ratio"),
        F.coalesce(
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")).cast(
                "double"
            )
            / F.nullif(F.length("text"), F.lit(0)),
            F.lit(0.0),
        ).alias("alnum_ratio"),
    )
    q = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stop_ratio") * 4.0, F.lit(1.0)) * 0.3
        + F.col("alnum_ratio") * 0.3
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("alnum_ratio", 6).alias("alnum_ratio"),
        F.round(q, 6).alias("quality"),
    )


QUALITY_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len({DUCK_TOKENS}) AS n_tokens,
         coalesce(len(list_filter({DUCK_TOKENS},
             x -> list_contains({_lst(_EN)}, x)))::DOUBLE
             / nullif(len({DUCK_TOKENS}), 0), 0.0) AS stop_ratio,
         coalesce(len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE
             / nullif(len(text), 0), 0.0) AS alnum_ratio
  FROM documents
)
SELECT doc_id, n_tokens, round(stop_ratio, 6)::DOUBLE AS stop_ratio,
       round(alnum_ratio, 6)::DOUBLE AS alnum_ratio,
       round(least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.4::DOUBLE
             + least(stop_ratio * 4.0, 1.0::DOUBLE) * 0.3::DOUBLE
             + alnum_ratio * 0.3::DOUBLE, 6)::DOUBLE AS quality
FROM d
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 over the normalized token stream — an
    order-sensitive content fingerprint robust to whitespace/punct."""
    t = F.expr(SPARK_TOKENS)
    return docs.select(
        "doc_id", F.md5(F.concat_ws(" ", t)).alias("fp")
    )


FINGERPRINTS_SQL = f"""
SELECT doc_id, md5(array_to_string({DUCK_TOKENS}, ' ')) AS fp FROM documents
"""
