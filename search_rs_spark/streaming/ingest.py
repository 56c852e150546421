"""Structured-Streaming incremental index ingest.

The reference's build is batch-only (SURVEY.md §1.5) — this is the
Spark-native extension for continuously arriving webtext: a file-source
stream over the corpus directory feeds ``foreachBatch``, each
micro-batch runs the same tokenize -> phase-1 aggregation as the batch
build (plans/build.py) and writes per-url posting deltas. A finalize
step (batch) assigns url-ranked doc ids and folds deltas into the
standard index tables, so streaming ingest and batch build produce
identical indexes over the same corpus.

Exactly-once delta semantics (foreachBatch alone is at-least-once):
each micro-batch OVERWRITES its own ``batch=<id>`` subdirectory, so a
retried batch replaces its previous (possibly partial) output instead
of appending duplicates; and finalize resolves re-crawled urls by
keeping each url's LATEST batch only — doc_len, tf and positions all
come from the same winning batch, never a mix.

Keys are urls (not doc ids) during ingest because dense url-ranked doc
ids are only assignable once the corpus is frozen — same reason the
reference walks the whole directory before numbering (builder.rs:66).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import term_pos_udf
from ..sources.webtext import WEBTEXT_SCHEMA


def _batch_path(delta_dir: str, table: str, batch_id: int) -> str:
    return os.path.join(delta_dir, table, f"batch={batch_id}")


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
        # same map-side (term, tf, positions) accumulation as the batch
        # build (plans/build.py): a doc is one row, so the micro-batch
        # needs no per-token shuffle at all
        toks = (
            batch_df.select("url", term_pos_udf(stem)(F.col("text")).alias("tp"))
            .select(
                "url",
                F.col("tp.terms").alias("terms"),
                F.col("tp.tfs").alias("tfs"),
                F.col("tp.positions").alias("positions"),
            )
            .withColumn("doc_len", F.aggregate("tfs", F.lit(0), lambda a, x: a + x))
        )
        phase1 = toks.select(
            "url",
            "doc_len",
            F.inline(F.arrays_zip("terms", "tfs", "positions")),
        ).withColumnsRenamed({"terms": "term", "tfs": "tf"})
        # idempotent: a replay of batch_id overwrites its own directory
        phase1.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(_batch_path(delta_dir, "term_url", batch_id))
        toks.select("url", "doc_len").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(
            _batch_path(delta_dir, "doc_urls", batch_id)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_deltas(spark: SparkSession, delta_dir: str, table: str) -> DataFrame:
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(delta_dir, table))
    )


def finalize_deltas(spark: SparkSession, delta_dir: str) -> dict[str, DataFrame]:
    """Fold streamed deltas into batch-equivalent index inputs:
    doc ids by url rank, term_doc in the batch build's shape.

    Re-crawled urls: only the url's latest batch contributes — its
    doc_urls row AND all its term_url rows — so tf/positions/doc_len
    stay mutually consistent and duplicates cannot inflate df.
    """
    from ..plans.ranks import with_global_rank

    doc_raw = _read_deltas(spark, delta_dir, "doc_urls")
    latest = doc_raw.groupBy("url").agg(F.max("batch_id").alias("batch_id"))
    doc_urls = doc_raw.join(latest, ["url", "batch_id"], "left_semi").dropDuplicates(
        ["url"]
    )
    doc_map = with_global_rank(doc_urls.select("url", "doc_len"), "url", "doc_id")
    term_url = (
        _read_deltas(spark, delta_dir, "term_url")
        .join(latest, ["url", "batch_id"], "left_semi")
        .dropDuplicates(["term", "url"])
    )
    term_doc = term_url.join(doc_map.select("url", "doc_id"), "url").select(
        "term", "doc_id", "doc_len", "tf", "positions"
    )
    return {
        "doc_lengths": doc_map.select("doc_id", "url", "doc_len"),
        "term_doc": term_doc,
    }
