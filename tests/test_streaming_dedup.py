"""Stateful streaming dedup: first content arrival wins, duplicates
are suppressed across micro-batches via the state store."""

import datetime

from pyspark.sql import functions as F

from search_rs_spark.streaming.dedup import dedup_stream, with_fingerprint

TS = datetime.datetime(2020, 1, 1)
SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _write(spark, rows, path):
    spark.createDataFrame(
        [(u, TS, None, t, "en") for u, t in rows], SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)


def test_dedup_across_micro_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    # batch 1: two distinct docs, plus an in-batch duplicate of doc a
    _write(
        spark,
        [
            ("a1", "hello world this is doc alpha"),
            ("a2", "Hello, WORLD!! this is doc alpha"),  # same normalized content
            ("b1", "completely different beta content"),
        ],
        in_dir,
    )
    # batch 2 (separate file): a re-crawl of alpha and one new doc
    _write(
        spark,
        [
            ("a3", "hello world this is doc alpha"),
            ("c1", "gamma text that is new"),
        ],
        in_dir,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = {r["url"]: r["fp"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # alpha: only the min-url first arrival; beta + gamma pass through
    assert set(out) == {"a1", "b1", "c1"}, out

    # fingerprints agree with the batch fingerprint definition
    batch = spark.createDataFrame(
        [("a1", TS, None, "hello world this is doc alpha", "en")], SCHEMA
    )
    fp = with_fingerprint(batch).collect()[0]["fp"]
    assert out["a1"] == fp


def test_dedup_null_text_dropped(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    _write(spark, [("u1", "some text"), ("u2", None)], in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    urls = [r["url"] for r in spark.sql("SELECT * FROM dedup_out2").collect()]
    assert urls == ["u1"]
