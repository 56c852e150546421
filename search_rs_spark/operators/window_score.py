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


def min_window_np(pos, ids, num_tokens: int) -> int:
    """Vectorised minimal covering window (numpy), equal to
    :func:`min_window` on sorted input (property-tested).

    For each right endpoint r, the minimal covering window ending at r
    starts at ``l(r) = min over ids of (last occurrence of id <= r)``;
    the answer is the min over r — the same quantity the reference's
    two-pointer sweep computes (mod.rs:264-281).
    """
    import numpy as np

    L = len(pos)
    if L == 0:
        return U32_MAX
    pos = np.asarray(pos, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    M = np.full((num_tokens, L), -1, dtype=np.int64)
    M[ids, np.arange(L)] = np.arange(L)
    M = np.maximum.accumulate(M, axis=1)
    m = M.min(axis=0)
    valid = m >= 0
    if not valid.any():
        return U32_MAX
    w = pos[valid] - pos[m[valid]] + 1
    return int(w.min())


_NUMPY_CUTOVER = 32  # below this, the python loop beats numpy overhead


def window_score_nested_udf(num_tokens: int):
    """pandas UDF over per-term rows: (qids array<int>, positions
    array<array<int>>) -> 3*nt/window.

    The fast path for large candidate sets: upstream groups the
    per-(doc, qid) POSITION ARRAYS as-is (a handful of rows per doc)
    instead of exploding every position through the shuffle — same
    bytes, ~tf× fewer shuffle rows. numpy flattens via concatenate +
    repeat, so no per-position Python objects."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def fn(qids, positions):
        out = []
        for q_arr, p_arrs in zip(qids, positions):
            lens = [len(p) for p in p_arrs]
            total = sum(lens)
            if total >= _NUMPY_CUTOVER:
                p = np.concatenate([np.asarray(x, dtype=np.int64) for x in p_arrs])
                q = np.repeat(np.asarray(q_arr, dtype=np.int64), lens)
                order = np.lexsort((q, p))
                w = min_window_np(p[order], q[order], num_tokens)
            else:
                pairs = sorted(
                    (int(p), int(q))
                    for q, ps in zip(q_arr, p_arrs)
                    for p in ps
                )
                w = min_window(pairs, num_tokens)
            out.append(WINDOW_SCORE_MULTIPLIER * num_tokens / w)
        return pd.Series(out, dtype="float64")

    return F.pandas_udf(fn, T.DoubleType())
