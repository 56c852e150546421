"""Webtext corpus sources.

The engine's canonical input is a Common-Crawl-style table
``(url string, warc_ts timestamp, html binary, text string,
lang string)`` per the driver contract. Three providers:

- :func:`synthesize_webtext` — deterministic distributed generator
  (seeded per-row hashing, Zipfian vocabulary so head-term skew is
  real) for tests and benchmarks at any scale.
- :func:`webtext_from_documents` — adapter mapping the driver's
  ``documents.parquet`` (doc_id, text, lang, source, n_chars) onto the
  webtext shape.
- :func:`reference_fixture` — the reference's own 3-doc e2e corpus
  (/root/reference/search/test_data/docs: "hello world", "hello man",
  "man world"; test at engine/mod.rs:294-323).

Row-level invariant vs the reference: the ``html`` column is a
deterministic wrapper of ``text`` so that extracted text per url is
byte-checkable (``extract_text(html) == text``).
"""

from __future__ import annotations

import datetime
import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

# Deterministic synthetic vocabulary: a base word list expanded with
# numeric suffixes; rank r is drawn Zipf(s=1.07) so low ranks dominate.
_BASE_WORDS = (
    "the of and to in a is that for it with as was on be by this are or "
    "from at which but not have an they his one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through years where much your way "
    "down should because each just those people how too little state good "
    "very make world still own see men work long get here between both life "
    "being under never day same another know while last might us great old "
    "year off come since against go came right used take three"
).split()


def wrap_html(text: str) -> bytes:
    """Deterministic html wrapper; inverse is :func:`extract_text`."""
    return ("<html><head></head><body><p>" + text + "</p></body></html>").encode("utf-8")


def extract_text_py(html: bytes) -> str:
    s = html.decode("utf-8")
    start = s.index("<p>") + 3
    end = s.rindex("</p>")
    return s[start:end]


def _row_u64(seed: int, i: int, j: int) -> int:
    h = hashlib.blake2b(f"{seed}:{i}:{j}".encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big")


def _zipf_rank(u: float, n_words: int, s: float = 1.07) -> int:
    # inverse-CDF of a truncated Zipf via the continuous approximation
    if s == 1.0:
        return min(int(math.exp(u * math.log(n_words))), n_words) - 1
    c = (n_words ** (1.0 - s) - 1.0) * u + 1.0
    return min(int(c ** (1.0 / (1.0 - s))), n_words) - 1


def synthesize_webtext(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 2000,
    mean_len: int = 60,
    non_en_frac: float = 0.01,
    null_frac: float = 0.002,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic Common-Crawl-style corpus.

    Every row is a pure function of (seed, row index) — no RNG state is
    shared across partitions, so the output is identical at any
    parallelism level (the scaling-efficiency experiments rely on this).
    """
    words = list(_BASE_WORDS)
    k = 0
    while len(words) < vocab_size:
        words.append(f"{_BASE_WORDS[k % len(_BASE_WORDS)]}{k // len(_BASE_WORDS)}")
        k += 1
    words = words[:vocab_size]

    n_words = len(words)
    langs = ["de", "fr", "es", "zh", "pt"]

    def gen(it):
        import pandas as pd

        for pdf in it:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                url = f"https://example.org/{seed}/{i:012d}.html"
                u_len = _row_u64(seed, i, 0) / 2**64
                doc_len = max(1, int(math.exp(math.log(mean_len) + (u_len - 0.5) * 1.6)))
                u_lang = _row_u64(seed, i, 1) / 2**64
                if u_lang < null_frac:
                    text = None
                    lang = "en"
                elif u_lang < null_frac + non_en_frac:
                    lang = langs[i % len(langs)]
                    text = " ".join(
                        words[_zipf_rank(_row_u64(seed, i, 2 + j) / 2**64, n_words)]
                        for j in range(doc_len)
                    )
                else:
                    lang = "en"
                    text = " ".join(
                        words[_zipf_rank(_row_u64(seed, i, 2 + j) / 2**64, n_words)]
                        for j in range(doc_len)
                    )
                out["url"].append(url)
                out["warc_ts"].append(_EPOCH + datetime.timedelta(seconds=i))
                out["html"].append(wrap_html(text) if text is not None else None)
                out["text"].append(text)
                out["lang"].append(lang)
            yield pd.DataFrame(out)

    n_part = partitions or max(4, min(256, n_docs // 2000 or 1))
    base = spark.range(0, n_docs, numPartitions=n_part)
    return base.mapInPandas(gen, schema=WEBTEXT_SCHEMA)


def webtext_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: driver testdata ``documents.parquet`` -> webtext shape.

    ``url`` starts with the zero-padded doc_id (before ``source``, whose
    values are not zero-padded and would break lexicographic order —
    src1 < src10 < src2) so that the engine's url-ordered doc-id
    assignment reproduces the original doc_id order exactly.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("https://testdata.local/%012d/%s.txt", "doc_id", "source").alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><head></head><body><p>"), F.col("text"), F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def reference_fixture(spark: SparkSession) -> DataFrame:
    """The reference's 3-doc e2e corpus as webtext rows."""
    rows = [
        ("test_data/docs/1.txt", "hello world"),
        ("test_data/docs/2.txt", "hello man"),
        ("test_data/docs/3.txt", "man world"),
    ]
    data = [
        (url, _EPOCH, wrap_html(text), text, "en")
        for url, text in rows
    ]
    return spark.createDataFrame(data, schema=WEBTEXT_SCHEMA)
