"""Driver-local serving mode: ms-latency queries over the same index.

The DataFrame query path (operators/bm25.py) is the scale path; its
latency floor is Spark job scheduling (~0.5-1 s). The reference, a
single-process engine, answers in milliseconds at small scale
(mod.rs:200-206 stamps time_ms). This module closes that gap for
indexes that fit in RAM: it loads the SAME parquet tables (via
pyarrow, no Spark) into Python dicts and evaluates the SAME semantics
— the scoring/window/spellcheck code is shared with the Spark engine
and the oracle, so results are identical by construction.

Use: serving replicas / interactive CLIs at small-to-medium scale;
the Spark path for batch scoring and 100 TB-scale corpora.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from .boolean import infix_to_postfix
from .spellcheck import DriverVocabulary
from .window_score import (
    BM25_SCORE_MULTIPLIER,
    WINDOW_SCORE_MULTIPLIER,
    min_window,
)

BM25_K1 = 1.2
BM25_B = 0.75


@dataclass
class LocalEngine:
    urls: list[str]
    doc_lens: list[int]
    num_docs: int
    avgdl: float
    vocab: DriverVocabulary
    # term -> (doc_ids, tfs, positions) merged across blocks, doc order
    postings: dict
    # query preprocessing must equal build preprocessing (Q1 ≡ B3):
    # a stem=False index gets the tokenize-only query path, same as
    # bm25.resolve_query_terms
    stem: bool = True

    @classmethod
    def load(cls, path: str) -> "LocalEngine":
        import pyarrow.dataset as ds

        with open(os.path.join(path, "stats", "data.json")) as f:
            stats = json.load(f)

        dl_tab = (
            ds.dataset(os.path.join(path, "tokens"), format="parquet")
            .to_table(columns=["doc_id", "url", "doc_len"])
            .to_pydict()
        )
        n = stats["num_docs"]
        urls = [""] * n
        doc_lens = [0] * n
        for d, u, l in zip(dl_tab["doc_id"], dl_tab["url"], dl_tab["doc_len"]):
            urls[d] = u
            doc_lens[d] = l

        v_tab = (
            ds.dataset(os.path.join(path, "vocabulary"), format="parquet")
            .to_table(columns=["term", "term_id", "df"])
            .to_pydict()
        )
        order = sorted(range(len(v_tab["term_id"])), key=lambda i: v_tab["term_id"][i])
        terms = [v_tab["term"][i] for i in order]
        dfs = [v_tab["df"][i] for i in order]

        p_tab = (
            ds.dataset(os.path.join(path, "postings"), format="parquet")
            .to_table(columns=["term", "block_id", "doc_ids", "tfs", "positions"])
            .to_pydict()
        )
        by_term: dict = {}
        for t, b, dids, tfs, poss in zip(
            p_tab["term"], p_tab["block_id"], p_tab["doc_ids"], p_tab["tfs"], p_tab["positions"]
        ):
            by_term.setdefault(t, []).append((b, dids, tfs, poss))
        postings = {}
        for t, blocks in by_term.items():
            blocks.sort(key=lambda x: x[0])
            dids: list[int] = []
            tfs: list[int] = []
            poss: list[list[int]] = []
            for _b, d, f_, p in blocks:
                dids.extend(d)
                tfs.extend(f_)
                poss.extend(list(x) for x in p)
            postings[t] = (dids, tfs, poss)

        return cls(
            urls=urls,
            doc_lens=doc_lens,
            num_docs=n,
            avgdl=stats["avgdl"],
            vocab=DriverVocabulary(terms=terms, dfs=dfs),
            postings=postings,
            stem=bool(stats.get("stem", True)),
        )

    def free_query(self, query: str, k: int = 100):
        """-> [(doc_id, url, score)] — identical to operators.bm25."""
        from ..functions.tokenizer import tokenize, tokenize_and_stem

        toks = tokenize_and_stem(query) if self.stem else tokenize(query)
        tokens = []
        for t in toks:
            c = self.vocab.spellcheck_term(t)
            if c is not None:
                tokens.append(c)
        if not tokens:
            return []
        n = float(self.num_docs)
        avgdl = self.avgdl or 1.0
        scores: dict[int, float] = {}
        tpos: dict[int, list] = {}
        for qid, tok in enumerate(tokens):
            got = self.vocab.get(tok)
            if got is None:
                continue
            _, df = got
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            dids, tfs, poss = self.postings[tok]
            for d, tf, pos in zip(dids, tfs, poss):
                dl = float(self.doc_lens[d])
                bm = idf * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + bm
                tpos.setdefault(d, []).extend((p, qid) for p in pos)
        out = []
        nt = len(tokens)
        for d, s in scores.items():
            w = min_window(tpos[d], nt)
            score = WINDOW_SCORE_MULTIPLIER * (nt / w) + BM25_SCORE_MULTIPLIER * (
                s / self.doc_lens[d]
            )
            out.append((d, self.urls[d], score))
        out.sort(key=lambda r: (-r[2], r[0]))
        return out[:k]

    def boolean_query(self, query: str):
        """-> [(doc_id, url, 1.0)] — identical to operators.boolean."""
        postfix = infix_to_postfix(query)
        stack: list[list[int]] = []
        n = self.num_docs
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
                    stack.append(list(range(1, n + 1)))
                else:
                    s = set(a)
                    stack.append([d for d in range(n) if d not in s])
            else:
                c = self.vocab.spellcheck_term(p)
                if c is None or c not in self.postings:
                    stack.append([])
                else:
                    stack.append(list(self.postings[c][0]))
        return [
            (d, self.urls[d] if d < n else None, 1.0) for d in stack.pop()
        ]
