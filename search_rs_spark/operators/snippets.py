"""Snippet fetch (S4): join query results back to the corpus text.

Reference: the web server reads each result document and slices the
first ~250 chars (server/src/main.rs:138-147,161-163). Here it's a
broadcast join of the k result rows against the webtext table — the
corpus scan is pruned to the url column + text, and only k rows
survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNIPPET_CHARS = 250


def with_snippets(results: DataFrame, webtext: DataFrame, n_chars: int = SNIPPET_CHARS) -> DataFrame:
    """results (doc_id, url, score) + webtext (url, text, ...) ->
    (doc_id, url, score, snippet)."""
    return (
        webtext.select("url", F.substring("text", 1, n_chars).alias("snippet"))
        .join(F.broadcast(results), "url")
        .select("doc_id", "url", "score", "snippet")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
