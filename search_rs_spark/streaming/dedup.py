"""Stateful streaming deduplication gate.

A training-data ingest stream must drop re-crawls and mirror copies
*as they arrive*, not in a nightly batch pass — otherwise every
downstream consumer (tokenize, index, train) pays for the duplicates
first. This operator keeps only the FIRST document per content
fingerprint across the whole lifetime of the stream, using
``applyInPandasWithState``: the fingerprint is the group key, the
state is a single "seen" marker per key, and the state store makes
the decision durable across micro-batches and restarts (it lives in
the streaming checkpoint).

Scale shape: state is one boolean per distinct fingerprint, sharded
by the groupBy key across executors — the stream never holds
documents in state, only the marker, so state size is bounded by the
distinct-content count, not the crawl volume. Within a micro-batch,
ties are broken deterministically (min url) so replays emit the same
winner.

The reference engine is batch-only (SURVEY.md §1.5); this extends the
streaming ingest surface (streaming/ingest.py) with the dedup stage a
Common-Crawl-scale pipeline runs before indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fingerprint = md5 of the normalized token stream — same definition as
# functions.text_analysis.fingerprints, inlined here so the stream
# needs no extra projection step
_FP_EXPR = "md5(array_join(regexp_extract_all(lower(text), '[a-z0-9]+', 0), ' '))"

DEDUP_OUT_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, fp string"
)
_STATE_SCHEMA = "seen boolean"


def with_fingerprint(df: DataFrame) -> DataFrame:
    """(url, warc_ts, text, lang, fp) — content fingerprint column."""
    return df.filter(F.col("text").isNotNull()).select(
        "url", "warc_ts", "text", "lang", F.expr(_FP_EXPR).alias("fp")
    )


def _emit_first(key, pdf_iter, state):
    """Per-fingerprint state machine: emit the min-url row the first
    time the fingerprint is ever seen; emit nothing afterwards."""
    import pandas as pd

    best = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values("url").iloc[[0]]
        if best is None or cand.iloc[0]["url"] < best.iloc[0]["url"]:
            best = cand
    if state.exists or best is None:
        return
    state.update((True,))
    yield best


def dedup_stream(stream: DataFrame) -> DataFrame:
    """First-seen-wins streaming dedup over webtext.

    Input: a streaming DataFrame with (url, warc_ts, text, lang).
    Output (append mode): the same rows plus ``fp``, with every
    duplicate-content arrival after the first suppressed — including
    duplicates that arrive many micro-batches later, because the
    per-fingerprint marker persists in the state store.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        with_fingerprint(stream)
        .groupBy("fp")
        .applyInPandasWithState(
            _emit_first,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
