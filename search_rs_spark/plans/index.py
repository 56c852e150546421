"""Loaded index handle: the query-side view of the build outputs.

Spark analogue of ``Engine::load_index``
(/root/reference/search/src/engine/mod.rs:85-92): DataFrames for the
big tables, a tiny stats dict, and a lazily-built driver-side
vocabulary (term -> (term_id, df)) + trigram index used for
spellchecking — the moral equivalent of the reference loading
``idx.alphas`` into RAM (vocabulary.rs:44-97).

For corpora whose vocabulary is too large to hold driver-side, the
spellcheck falls back to a distributed trigram join
(operators/spellcheck.py); the driver-side path is used below a row
threshold.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.spellcheck import DriverVocabulary

DRIVER_VOCAB_MAX_TERMS = 2_000_000


@dataclass
class SearchIndex:
    spark: SparkSession
    path: str
    stats: dict
    _driver_vocab: "DriverVocabulary | None" = field(default=None, repr=False)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SearchIndex":
        with open(os.path.join(path, "stats", "data.json")) as f:
            stats = json.load(f)
        return cls(spark=spark, path=path, stats=stats)

    @property
    def doc_lengths(self) -> DataFrame:
        """(doc_id, url, doc_len) — a pruned view over the tokens table
        (columnar read skips the tokens arrays; no duplicate storage)."""
        from ..sources.catalog import read_stage

        return read_stage(self.spark, os.path.join(self.path, "tokens")).select(
            "doc_id", "url", "doc_len"
        )

    @property
    def vocabulary(self) -> DataFrame:
        from ..sources.catalog import read_stage

        return read_stage(self.spark, os.path.join(self.path, "vocabulary"))

    @property
    def postings(self) -> DataFrame:
        from ..sources.catalog import read_stage

        return read_stage(self.spark, os.path.join(self.path, "postings"))

    @property
    def num_docs(self) -> int:
        return int(self.stats["num_docs"])

    @property
    def avgdl(self) -> float:
        return float(self.stats["avgdl"])

    def driver_vocab(self) -> "DriverVocabulary":
        if self._driver_vocab is None:
            # size gate BEFORE the collect: at scale, collecting an
            # over-threshold vocabulary would OOM the driver before the
            # RuntimeError that routes callers to spellcheck_distributed
            # could fire. The stage manifest's row count (written at
            # build time, plans/checkpoint.py) answers it without a job;
            # a count() is the fallback for manifests from older layouts.
            n_terms = self._vocab_row_count()
            if n_terms > DRIVER_VOCAB_MAX_TERMS:
                raise RuntimeError(
                    f"vocabulary too large for driver-side spellcheck "
                    f"({n_terms} terms); use distributed spellcheck"
                )
            rows = (
                self.vocabulary.select("term", "term_id", "df")
                .orderBy("term_id")
                .collect()
            )
            # defense-in-depth: a manifest with a stale/wrong rows field
            # (hand-assembled index dirs) must not smuggle an oversized
            # vocabulary past the pre-collect gate unnoticed
            if len(rows) > DRIVER_VOCAB_MAX_TERMS:
                raise RuntimeError(
                    f"vocabulary too large for driver-side spellcheck "
                    f"({len(rows)} terms, manifest claimed {n_terms}); "
                    f"use distributed spellcheck"
                )
            self._driver_vocab = DriverVocabulary(
                terms=[r["term"] for r in rows], dfs=[r["df"] for r in rows]
            )
        return self._driver_vocab

    def _vocab_row_count(self) -> int:
        """Vocabulary cardinality WITHOUT collecting it: the stage
        manifest's ``rows`` field (written from parquet footers at build
        time), else one distributed count()."""
        from .checkpoint import MANIFEST

        mp = os.path.join(self.path, "vocabulary", MANIFEST)
        try:
            with open(mp) as f:
                rows = json.load(f).get("rows")
            if rows is not None:
                return int(rows)
        except (OSError, json.JSONDecodeError, ValueError):
            pass
        return self.vocabulary.count()

    def idf(self, df: int) -> float:
        """BM25 idf (mod.rs:158-159), intended-df semantics per SURVEY §1.4."""
        n = float(self.num_docs)
        nq = float(df)
        return math.log((n - nq + 0.5) / (nq + 0.5) + 1.0)
