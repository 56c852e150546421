"""Minimal covering window score (Q11).

Reference: ``Engine::compute_score``
(/root/reference/search/src/engine/mod.rs:255-286). All (position,
query_token_id) pairs of a document are sorted by position; a
two-pointer sweep finds the minimal window containing every distinct
query token id (where the target count is the FULL query token count,
duplicates included — ids are assigned by ``enumerate`` over the
spellchecked query tokens, mod.rs:152). If no window covers all
tokens the window length stays ``u32::MAX`` (4294967295), giving a
near-zero but non-zero score. Final combination (mod.rs:284-285):
``3.0 * num_tokens / window + 1.0 * bm25_normalized``.
"""

from __future__ import annotations

U32_MAX = 4294967295

WINDOW_SCORE_MULTIPLIER = 3.0  # mod.rs:24
BM25_SCORE_MULTIPLIER = 1.0  # mod.rs:25


def min_window(pairs: list[tuple[int, int]], num_tokens: int) -> int:
    """Minimal window length covering all ``num_tokens`` distinct ids.

    ``pairs`` = (position, token_id), unsorted. Returns U32_MAX when
    no window covers all ids (incl. when fewer distinct ids appear).
    """
    arr = sorted(pairs)
    window = U32_MAX
    j = 0
    seen: dict[int, int] = {}
    for pos, _tid in arr:
        seen[_tid] = seen.get(_tid, 0) + 1
        while len(seen) == num_tokens and j < len(arr):
            j_pos, j_id = arr[j]
            window = min(window, pos - j_pos + 1)
            seen[j_id] -= 1
            if seen[j_id] == 0:
                del seen[j_id]
            j += 1
    return window


def combined_score(bm25_normalized: float, pairs, num_tokens: int) -> float:
    w = min_window(pairs, num_tokens)
    return (
        WINDOW_SCORE_MULTIPLIER * (num_tokens / w)
        + BM25_SCORE_MULTIPLIER * bm25_normalized
    )


def window_score_udf(num_tokens: int):
    """pandas UDF: array<struct<qid int, positions array<int>>> -> double
    (the 3.0 * num_tokens / window term only)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def fn(tpos):
        out = []
        for entries in tpos:
            pairs = []
            for e in entries:
                qid = e["qid"]
                for p in e["positions"]:
                    pairs.append((int(p), int(qid)))
            out.append(WINDOW_SCORE_MULTIPLIER * num_tokens / min_window(pairs, num_tokens))
        return pd.Series(out, dtype="float64")

    return F.pandas_udf(fn, T.DoubleType())
