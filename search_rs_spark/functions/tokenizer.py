"""Tokenise + normalise + stem, matching the reference preprocessor.

Reference semantics (/root/reference/search/src/engine/preprocessor.rs:17-24):
replace every run matching ``[^a-zA-Z0-9\\s]+`` with a single space, split
on whitespace, lowercase each token, Snowball-English stem each token.

Two surfaces:

- :func:`tokenize_and_stem` — plain Python, used driver-side for query
  strings and by the pure-Python oracle.
- :func:`tokens_udf` — a vectorised ``pandas_udf`` returning
  ``array<string>`` for the Spark build pipeline (Arrow-batched; the
  per-token stem is memoised so Zipfian corpora stay cheap).
"""

from __future__ import annotations

import re

from .stemmer import stem

_NON_ALNUM = re.compile(r"[^a-zA-Z0-9\s]+")


def tokenize(text: str) -> list[str]:
    """Regex-clean, whitespace-split, lowercase (no stemming)."""
    if text is None:
        return []
    return [t.lower() for t in _NON_ALNUM.sub(" ", text).split()]


def tokenize_and_stem(text: str) -> list[str]:
    """Full reference preprocessing: tokenize then Snowball-English stem."""
    return [stem(t) for t in tokenize(text)]


def _make_tokens_series_fn(do_stem: bool):
    import pandas as pd

    def fn(texts):
        # Vectorised clean/lower/split; stemming mapped with a memoised
        # pure function (high hit rate on natural-language corpora).
        cleaned = texts.fillna("").str.replace(_NON_ALNUM, " ", regex=True).str.lower()
        splits = cleaned.str.split()
        if do_stem:
            return splits.map(lambda toks: [stem(t) for t in toks] if toks else [])
        return splits.map(lambda toks: toks if toks else [])

    return fn


def tokens_udf(do_stem: bool = True):
    """Build a pandas UDF ``string -> array<string>``.

    ``do_stem=False`` gives the tokenize-only variant (used by the
    SQL-oracle-checkable queries, since ANSI SQL cannot stem).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    return F.pandas_udf(_make_tokens_series_fn(do_stem), T.ArrayType(T.StringType()))


def term_positions(tokens: list[str]) -> tuple[list, list, list]:
    """Per-document posting fragments, first-occurrence term order:
    ``(terms, tfs, positions)`` parallel lists, 0-based ascending
    positions.

    This is the reference's per-document accumulation step
    (/root/reference/search/src/engine/builder.rs:87-113) done where the
    document already lives — inside its row — so the build needs no
    per-token shuffle at all: the (term, doc) aggregation that a
    posexplode + groupBy would shuffle the whole corpus for is complete
    before any exchange. Parallel flat lists, NOT per-term structs: the
    struct shape costs 3× in Python object churn + Arrow conversion
    (measured 7.6 s vs 2.6 s per 20 k docs single-threaded).
    """
    acc: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        acc.setdefault(t, []).append(i)
    return list(acc.keys()), [len(v) for v in acc.values()], list(acc.values())


TERM_POS_TYPE = (
    "terms array<string>, tfs array<int>, positions array<array<int>>"
)


def term_pos_udf(do_stem: bool = True):
    """Pandas UDF ``string -> struct<terms,tfs,positions>`` (parallel
    arrays) — the tokenize+stem pass fused with the per-document posting
    accumulation (map-side; see :func:`term_positions`)."""
    from pyspark.sql import functions as F

    tok_fn = _make_tokens_series_fn(do_stem)

    def fn(texts):
        import pandas as pd

        cols = tok_fn(texts).map(term_positions)
        return pd.DataFrame(
            {
                "terms": cols.map(lambda x: x[0]),
                "tfs": cols.map(lambda x: x[1]),
                "positions": cols.map(lambda x: x[2]),
            }
        )

    return F.pandas_udf(fn, TERM_POS_TYPE)
