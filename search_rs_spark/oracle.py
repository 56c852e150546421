"""Pure-Python reference oracle.

A faithful, single-process reimplementation of the reference engine's
semantics (SURVEY.md §2, including quirks Q8/Q10 and the *intended*
df semantics of §1.4) used to check the Spark engine for
rank-identity on seeded corpora. Deliberately simple; structured like
the reference only in semantics, not in code.

Build: /root/reference/search/src/engine/builder.rs:44-130
Free query: mod.rs:138-207; boolean: mod.rs:94-136.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .functions.tokenizer import tokenize_and_stem
from .operators.boolean import infix_to_postfix
from .operators.spellcheck import DriverVocabulary
from .operators.window_score import U32_MAX, min_window

BM25_K1 = 1.2
BM25_B = 0.75
WINDOW_MULT = 3.0
BM25_MULT = 1.0


@dataclass
class OracleIndex:
    urls: list[str]  # doc_id -> url (url-sorted order)
    doc_lens: list[int]
    avgdl: float
    terms: list[str]  # term_id-ordered (sorted), post df-filter
    dfs: list[int]
    postings: dict[str, list[tuple[int, int, list[int]]]]  # term -> [(doc, tf, pos)]
    vocab: DriverVocabulary


def build_oracle(corpus: list[tuple[str, str]], min_f: int = 0, max_p: float = 1.0) -> OracleIndex:
    """corpus = [(url, text)]; docs are id'd in sorted-url order."""
    docs = sorted((u for u, t in corpus if t is not None))
    text_by_url = {u: t for u, t in corpus}
    urls, doc_lens = [], []
    raw_postings: dict[str, dict[int, list[int]]] = {}
    for doc_id, url in enumerate(docs):
        tokens = tokenize_and_stem(text_by_url[url])
        urls.append(url)
        doc_lens.append(len(tokens))
        for pos, t in enumerate(tokens):
            raw_postings.setdefault(t, {}).setdefault(doc_id, []).append(pos)

    n = len(docs)
    threshold = int(n * max_p)  # builder.rs:115 integer truncation
    kept = {
        t: by_doc
        for t, by_doc in raw_postings.items()
        if min_f < len(by_doc) <= threshold
    }
    terms = sorted(kept)
    dfs = [len(kept[t]) for t in terms]
    postings = {
        t: [(d, len(ps), ps) for d, ps in sorted(kept[t].items())] for t in terms
    }
    avgdl = (sum(doc_lens) / n) if n else 0.0
    return OracleIndex(
        urls=urls,
        doc_lens=doc_lens,
        avgdl=avgdl,
        terms=terms,
        dfs=dfs,
        postings=postings,
        vocab=DriverVocabulary(terms=terms, dfs=dfs),
    )


def oracle_free_query(idx: OracleIndex, query: str, k: int = 100):
    """-> [(doc_id, url, score)] desc by score, ties doc_id asc."""
    tokens = []
    for t in tokenize_and_stem(query):
        c = idx.vocab.spellcheck_term(t)
        if c is not None:
            tokens.append(c)
    if not tokens:
        return []
    n = float(len(idx.urls))
    scores: dict[int, float] = {}
    tpos: dict[int, list[tuple[int, int]]] = {}
    for qid, tok in enumerate(tokens):
        nq = float(idx.dfs[idx.terms.index(tok)])
        idf = math.log((n - nq + 0.5) / (nq + 0.5) + 1.0)
        for doc_id, tf, positions in idx.postings[tok]:
            dl = float(idx.doc_lens[doc_id])
            bm = idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / idx.avgdl))
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + bm
            tpos.setdefault(doc_id, []).extend((p, qid) for p in positions)

    num_tokens = len(tokens)
    results = []
    for doc_id, s in scores.items():
        s_norm = s / idx.doc_lens[doc_id]  # mod.rs:186 quirk
        w = min_window(tpos[doc_id], num_tokens)
        score = WINDOW_MULT * (num_tokens / w) + BM25_MULT * s_norm
        results.append((doc_id, idx.urls[doc_id], score))
    results.sort(key=lambda r: (-r[2], r[0]))
    return results[:k]


def oracle_boolean_query(idx: OracleIndex, query: str):
    """-> [(doc_id, url, 1.0)] in the reference's output order."""
    n = len(idx.urls)
    postfix = infix_to_postfix(query)
    stack: list[list[int]] = []
    for p in postfix:
        if p == "AND":
            b, a = set(stack.pop()), stack.pop()
            stack.append([d for d in a if d in b])
        elif p == "OR":
            b, a = stack.pop(), stack.pop()
            stack.append(sorted(set(a) | set(b)))
        elif p == "NOT":
            a = stack.pop()
            if not a:
                stack.append(list(range(1, n + 1)))  # postings.rs:179-181 quirk
            else:
                aset = set(a)
                stack.append([d for d in range(n) if d not in aset])
        else:
            c = idx.vocab.spellcheck_term(p)
            if c is None or c not in idx.postings:
                stack.append([])
            else:
                stack.append([d for d, _, _ in idx.postings[c]])
    result = stack.pop()
    return [(d, idx.urls[d] if d < n else None, 1.0) for d in result]
