"""Term-pruned disk serving: ms-latency queries over indexes past RAM.

:class:`LocalEngine` (operators/serving.py) answers in milliseconds but
requires the WHOLE postings table resident in driver memory. This
module is the disk-offsets analogue of the reference's seek-and-decode
serving (index/mod.rs loads offsets and seeks one postings list): the
postings parquet is written term-sorted within term-hash-partitioned
files (plans/build.py postings stage: ``repartition(term)`` +
``sortWithinPartitions(term, block_id)``), so parquet row-group
statistics give tight min/max on ``term`` and a pyarrow predicate read
touches only the row groups holding the query's terms.

Resident state after :meth:`DiskEngine.load`: the stats json and the
vocabulary (term/term_id/df — needed whole for trigram spellcheck,
same as the reference loading vocabulary.alphas into memory). Nothing
corpus-sized: per-query I/O is O(query terms' postings + k url
lookups); BM25 needs no doc-length array because the build denormalizes
``dls`` into the postings blocks.

Result identity with LocalEngine (hence with the Spark engine and the
reference semantics) is pinned by tests/test_serving_disk.py.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

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
class DiskEngine:
    path: str
    num_docs: int
    avgdl: float
    vocab: DriverVocabulary
    stem: bool = True
    _postings_ds: object = field(default=None, repr=False)
    _tokens_ds: object = field(default=None, repr=False)

    @classmethod
    def load(cls, path: str) -> "DiskEngine":
        import pyarrow.dataset as ds

        with open(os.path.join(path, "stats", "data.json")) as f:
            stats = json.load(f)
        v_tab = (
            ds.dataset(os.path.join(path, "vocabulary"), format="parquet")
            .to_table(columns=["term", "term_id", "df"])
            .to_pydict()
        )
        order = sorted(range(len(v_tab["term_id"])), key=lambda i: v_tab["term_id"][i])
        eng = cls(
            path=path,
            num_docs=stats["num_docs"],
            avgdl=stats["avgdl"],
            vocab=DriverVocabulary(
                terms=[v_tab["term"][i] for i in order],
                dfs=[v_tab["df"][i] for i in order],
            ),
            stem=bool(stats.get("stem", True)),
        )
        # dataset objects hold file listings + footers lazily; keeping
        # them across queries amortizes the metadata walk
        eng._postings_ds = ds.dataset(os.path.join(path, "postings"), format="parquet")
        eng._tokens_ds = ds.dataset(os.path.join(path, "tokens"), format="parquet")
        return eng

    # -- pruned reads --------------------------------------------------------

    def _read_postings(self, tokens: list[str]) -> dict:
        """term -> (doc_ids, tfs, dls, positions) in doc order, merged
        across blocks — reads ONLY the row groups whose term min/max
        admits a query term (the files are term-sorted)."""
        import pyarrow.compute as pc

        tab = self._postings_ds.to_table(
            columns=["term", "block_id", "doc_ids", "tfs", "dls", "positions"],
            filter=pc.field("term").isin(tokens),
        ).to_pydict()
        by_term: dict = {}
        for t, b, dids, tfs, dls, poss in zip(
            tab["term"], tab["block_id"], tab["doc_ids"], tab["tfs"],
            tab["dls"], tab["positions"],
        ):
            by_term.setdefault(t, []).append((b, dids, tfs, dls, poss))
        out = {}
        for t, blocks in by_term.items():
            blocks.sort(key=lambda x: x[0])
            dids, tfs, dls, poss = [], [], [], []
            for _b, d, f_, l, p in blocks:
                dids.extend(d)
                tfs.extend(f_)
                dls.extend(l)
                poss.extend(list(x) for x in p)
            out[t] = (dids, tfs, dls, poss)
        return out

    def _urls_for(self, doc_ids: list[int]) -> dict:
        """doc_id -> url for a bounded id set (row-group-pruned: tokens
        files are doc_id-ranged by the build's rank exchange). Past the
        isin-pushdown sweet spot (large boolean results) stream the two
        slim columns instead."""
        import pyarrow.compute as pc

        if not doc_ids:
            return {}
        if len(doc_ids) <= 10_000:
            tab = self._tokens_ds.to_table(
                columns=["doc_id", "url"],
                filter=pc.field("doc_id").isin(doc_ids),
            ).to_pydict()
            return dict(zip(tab["doc_id"], tab["url"]))
        want = set(doc_ids)
        out: dict = {}
        for batch in self._tokens_ds.to_batches(columns=["doc_id", "url"]):
            for d, u in zip(batch["doc_id"].to_pylist(), batch["url"].to_pylist()):
                if d in want:
                    out[d] = u
        return out

    # -- queries (semantics identical to LocalEngine / operators.bm25) -------

    def free_query(self, query: str, k: int = 100):
        """-> [(doc_id, url, score)] — identical to LocalEngine."""
        from ..functions.tokenizer import tokenize, tokenize_and_stem

        toks = tokenize_and_stem(query) if self.stem else tokenize(query)
        tokens = []
        for t in toks:
            c = self.vocab.spellcheck_term(t)
            if c is not None:
                tokens.append(c)
        if not tokens:
            return []
        postings = self._read_postings(sorted(set(tokens)))
        n = float(self.num_docs)
        avgdl = self.avgdl or 1.0
        scores: dict[int, float] = {}
        doc_len: dict[int, int] = {}
        tpos: dict[int, list] = {}
        for qid, tok in enumerate(tokens):
            got = self.vocab.get(tok)
            if got is None or tok not in postings:
                continue
            _, df = got
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            dids, tfs, dls, poss = postings[tok]
            for d, tf, dl, pos in zip(dids, tfs, dls, poss):
                bm = idf * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * float(dl) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + bm
                doc_len[d] = dl
                tpos.setdefault(d, []).extend((p, qid) for p in pos)
        nt = len(tokens)
        ranked = []
        for d, s in scores.items():
            w = min_window(tpos[d], nt)
            score = WINDOW_SCORE_MULTIPLIER * (nt / w) + BM25_SCORE_MULTIPLIER * (
                s / doc_len[d]
            )
            ranked.append((d, score))
        ranked.sort(key=lambda r: (-r[1], r[0]))
        top = ranked[:k]
        urls = self._urls_for([d for d, _ in top])
        return [(d, urls.get(d), s) for d, s in top]

    def boolean_query(self, query: str):
        """-> [(doc_id, url, 1.0)] — identical to LocalEngine, including
        the reference's NOT-on-empty -> 1..=n quirk."""
        postfix = infix_to_postfix(query)
        operand_terms = []
        for p in postfix:
            if p not in ("AND", "OR", "NOT"):
                c = self.vocab.spellcheck_term(p)
                if c is not None:
                    operand_terms.append(c)
        postings = self._read_postings(sorted(set(operand_terms)))
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
                if c is None or c not in postings:
                    stack.append([])
                else:
                    stack.append(list(postings[c][0]))
        result = stack.pop()
        urls = self._urls_for([d for d in result if d < n])
        return [(d, urls.get(d), 1.0) for d in result]
