"""Structured-Streaming incremental index ingest.

The reference's build is batch-only (SURVEY.md §1.5) — this is the
Spark-native extension for continuously arriving webtext: a file-source
stream over the corpus directory feeds ``foreachBatch``, each
micro-batch runs the same tokenize -> phase-1 aggregation as the batch
build (plans/build.py) and APPENDS per-url posting deltas. A finalize
step (batch) assigns url-ranked doc ids and folds deltas into the
standard index tables, so streaming ingest and batch build produce
identical indexes over the same corpus.

Keys are urls (not doc ids) during ingest because dense url-ranked doc
ids are only assignable once the corpus is frozen — same reason the
reference walks the whole directory before numbering (builder.rs:66).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens_udf
from ..sources.webtext import WEBTEXT_SCHEMA


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    stem: bool = True,
    available_now: bool = True,
):
    """Stream webtext parquet files -> per-url posting deltas.

    Returns the StreamingQuery; with ``available_now`` it drains the
    current directory contents and stops (test/backfill mode).
    """
    stream = (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .parquet(input_dir)
        .filter(F.col("text").isNotNull())
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        toks = batch_df.select(
            "url", tokens_udf(stem)(F.col("text")).alias("tokens")
        ).withColumn("doc_len", F.size("tokens"))
        exploded = toks.select(
            "url", "doc_len", F.posexplode("tokens").alias("pos", "term")
        )
        phase1 = exploded.groupBy("term", "url", "doc_len").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        phase1.write.mode("append").parquet(os.path.join(delta_dir, "term_url"))
        toks.select("url", "doc_len").write.mode("append").parquet(
            os.path.join(delta_dir, "doc_urls")
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_deltas(spark: SparkSession, delta_dir: str) -> dict[str, DataFrame]:
    """Fold streamed deltas into batch-equivalent index inputs:
    doc ids by url rank, term_doc in the batch build's shape."""
    from ..plans.ranks import with_global_rank

    doc_urls = (
        spark.read.parquet(os.path.join(delta_dir, "doc_urls")).dropDuplicates(["url"])
    )
    doc_map = with_global_rank(doc_urls.select("url", "doc_len"), "url", "doc_id")
    term_url = spark.read.parquet(os.path.join(delta_dir, "term_url"))
    term_doc = term_url.join(doc_map.select("url", "doc_id"), "url").select(
        "term", "doc_id", "doc_len", "tf", "positions"
    )
    return {
        "doc_lengths": doc_map.select("doc_id", "url", "doc_len"),
        "term_doc": term_doc,
    }
