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
        admits a query term (the files are term-sorted).

        NUMPY layout per term (the round-6 per-posting Python loop was
        the serving bottleneck): doc_ids/tfs/dls as int64 ndarrays;
        positions as a flat int64 ndarray plus a per-posting length
        array, so the scorer never touches per-posting Python objects.
        """
        import numpy as np
        import pyarrow.compute as pc

        tab = self._postings_ds.to_table(
            columns=["term", "block_id", "doc_ids", "tfs", "dls", "positions"],
            filter=pc.field("term").isin(tokens),
        ).combine_chunks()
        terms = tab["term"].to_pylist()
        blocks_col = tab["block_id"].to_pylist()
        by_term: dict = {}
        for i, (t, b) in enumerate(zip(terms, blocks_col)):
            by_term.setdefault(t, []).append((b, i))

        # offset-based zero-copy views over the Arrow buffers: a head
        # term's postings are millions of elements, and per-row
        # ``.as_py()`` conversion (one Python object per posting) was
        # the remaining serving wall after vectorizing the scorer.
        def _list_col(name):
            col = tab[name].chunk(0) if tab[name].num_chunks else None
            if col is None:
                return None, None
            return np.asarray(col.values), np.asarray(col.offsets)

        did_v, did_o = _list_col("doc_ids")
        tf_v, tf_o = _list_col("tfs")
        dl_v, dl_o = _list_col("dls")
        pos_col = (
            tab["positions"].chunk(0) if tab["positions"].num_chunks else None
        )
        if pos_col is not None:
            pos_outer_off = np.asarray(pos_col.offsets)  # row -> posting range
            inner = pos_col.values  # ListArray of int positions
            pos_inner_off = np.asarray(inner.offsets)  # posting -> flat range
            pos_flat = np.asarray(inner.values)

        out = {}
        for t, blocks in by_term.items():
            blocks.sort()
            dids_parts, tfs_parts, dls_parts = [], [], []
            flat_parts, len_parts = [], []
            for _b, i in blocks:
                dids_parts.append(did_v[did_o[i] : did_o[i + 1]])
                tfs_parts.append(tf_v[tf_o[i] : tf_o[i + 1]])
                dls_parts.append(dl_v[dl_o[i] : dl_o[i + 1]])
                p0, p1 = pos_outer_off[i], pos_outer_off[i + 1]
                len_parts.append(np.diff(pos_inner_off[p0 : p1 + 1]))
                flat_parts.append(
                    pos_flat[pos_inner_off[p0] : pos_inner_off[p1]]
                )
            out[t] = (
                np.concatenate(dids_parts).astype(np.int64)
                if dids_parts
                else np.empty(0, np.int64),
                np.concatenate(tfs_parts).astype(np.int64)
                if tfs_parts
                else np.empty(0, np.int64),
                np.concatenate(dls_parts).astype(np.int64)
                if dls_parts
                else np.empty(0, np.int64),
                np.concatenate(flat_parts).astype(np.int64)
                if flat_parts
                else np.empty(0, np.int64),
                np.concatenate(len_parts).astype(np.int64)
                if len_parts
                else np.empty(0, np.int64),
            )
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
        import numpy as np

        from .window_score import min_windows_batch

        postings = self._read_postings(sorted(set(tokens)))
        n = float(self.num_docs)
        avgdl = self.avgdl or 1.0
        # Vectorized scoring pass (round-6 finding: the per-posting
        # Python loop dominated head-term latency). Arithmetic replays
        # the scalar loop exactly: same per-element operator order for
        # the bm term, accumulation in ascending-qid order (doc ids are
        # unique within one term's postings, so fancy-index += is one
        # add per doc per qid, like the dict accumulation), and the
        # batch window kernel is property-pinned bit-equal to
        # min_window. Results are identical to the loop (and to
        # LocalEngine — pinned in tests/test_serving_disk.py).
        per_qid = []
        for qid, tok in enumerate(tokens):
            got = self.vocab.get(tok)
            if got is None or tok not in postings:
                continue
            _, df = got
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            per_qid.append((qid, idf) + postings[tok])
        if not per_qid:
            return []
        uniq = np.unique(np.concatenate([p[2] for p in per_qid]))
        m = uniq.size
        scores = np.zeros(m, dtype=np.float64)
        dl_arr = np.ones(m, dtype=np.int64)
        pair_doc, pair_pos, pair_qid = [], [], []
        for qid, idf, dids, tfs, dls, flat, lens in per_qid:
            idx = np.searchsorted(uniq, dids)
            tf = tfs.astype(np.float64)
            dlf = dls.astype(np.float64)
            bm = (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * ((1.0 - BM25_B) + (BM25_B * dlf) / avgdl))
            )
            scores[idx] += bm
            dl_arr[idx] = dls
            pair_doc.append(np.repeat(idx, lens))
            pair_pos.append(flat)
            pair_qid.append(np.full(int(lens.sum()), qid, dtype=np.int64))
        nt = len(tokens)
        pdoc = np.concatenate(pair_doc)
        ppos = np.concatenate(pair_pos)
        pqid = np.concatenate(pair_qid)
        order = np.argsort(pdoc, kind="stable")
        w = min_windows_batch(
            ppos[order], pqid[order], np.bincount(pdoc, minlength=m), nt
        )
        final = WINDOW_SCORE_MULTIPLIER * (nt / w) + BM25_SCORE_MULTIPLIER * (
            scores / dl_arr
        )
        top = np.lexsort((uniq, -final))[:k]
        top_docs = [int(d) for d in uniq[top]]
        urls = self._urls_for(top_docs)
        return [(d, urls.get(d), float(s)) for d, s in zip(top_docs, final[top])]

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
        import numpy as np

        postings = self._read_postings(sorted(set(operand_terms)))
        # numpy set algebra over sorted duplicate-free id arrays —
        # identical results to the set/list form (operands are sorted
        # and duplicate-free by construction), and the NOT complement
        # no longer materializes a corpus-sized Python range list
        # (round-6 finding: corpus-sized driver state at 100M+)
        stack: list = []
        n = self.num_docs
        for p in postfix:
            if p == "AND":
                b, a = stack.pop(), stack.pop()
                stack.append(np.intersect1d(a, b))
            elif p == "OR":
                b, a = stack.pop(), stack.pop()
                stack.append(np.union1d(a, b))
            elif p == "NOT":
                a = stack.pop()
                if len(a) == 0:
                    # the reference's empty-operand quirk: 1..=n
                    stack.append(np.arange(1, n + 1, dtype=np.int64))
                else:
                    mask = np.ones(n, dtype=bool)
                    av = np.asarray(a, dtype=np.int64)
                    mask[av[av < n]] = False
                    stack.append(np.nonzero(mask)[0].astype(np.int64))
            else:
                c = self.vocab.spellcheck_term(p)
                if c is None or c not in postings:
                    stack.append(np.empty(0, dtype=np.int64))
                else:
                    stack.append(postings[c][0])
        result = [int(d) for d in stack.pop()]
        urls = self._urls_for([d for d in result if d < n])
        return [(d, urls.get(d), 1.0) for d in result]
