"""Row-level invariant from the driver contract: byte-identical
extracted text per url (html is a deterministic wrapper of text), and
generator determinism across parallelism levels."""

from pyspark.sql import functions as F

from search_rs_spark.sources.webtext import (
    extract_text_py,
    reference_fixture,
    synthesize_webtext,
    webtext_from_documents,
)


def _check_rows(rows):
    assert rows
    for r in rows:
        if r["text"] is None:
            assert r["html"] is None
        else:
            assert extract_text_py(bytes(r["html"])) == r["text"]


def test_extracted_text_byte_identical_synthetic(spark):
    _check_rows(synthesize_webtext(spark, 120, seed=31).collect())


def test_extracted_text_byte_identical_adapter(spark, sf_dir):
    _check_rows(webtext_from_documents(spark, sf_dir).limit(100).collect())


def test_extracted_text_byte_identical_fixture(spark):
    _check_rows(reference_fixture(spark).collect())


def test_adapter_url_order_reproduces_doc_id_order(spark, sf_dir):
    """The engine assigns doc_ids in sorted-url order; the adapter's url
    must therefore sort exactly like the parquet doc_id (zero-padded
    doc_id precedes the non-padded source segment)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wt = webtext_from_documents(spark, sf_dir)
    by_url = [r["url"] for r in wt.orderBy("url").collect()]
    by_doc_id = [
        r["url"]
        for r in wt.join(
            docs.select("doc_id", F.col("text").alias("t2")),
            F.expr("substring(url, 24, 12)").cast("long") == F.col("doc_id"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert by_url == by_doc_id
    # and the embedded id is recoverable and unique
    ids = [int(u.split("/")[3]) for u in by_url]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)


def test_engine_doc_ids_match_parquet_doc_ids(spark, sf_dir):
    """engine doc_id == parquet doc_id over the adapted corpus: the
    url-ranked internal id must reproduce the input's doc_id."""
    from search_rs_spark.plans.ranks import with_global_rank

    wt = webtext_from_documents(spark, sf_dir).filter(F.col("text").isNotNull())
    ranked = with_global_rank(wt.select("url"), "url", "engine_doc_id")
    got = ranked.withColumn(
        "parquet_doc_id", F.expr("substring(url, 24, 12)").cast("long")
    )
    bad = got.filter(F.col("engine_doc_id") != F.col("parquet_doc_id")).count()
    assert bad == 0


def test_generator_deterministic_across_parallelism(spark):
    a = synthesize_webtext(spark, 150, seed=8, partitions=2).collect()
    b = synthesize_webtext(spark, 150, seed=8, partitions=16).collect()
    ka = sorted((r["url"], r["text"], r["lang"]) for r in a)
    kb = sorted((r["url"], r["text"], r["lang"]) for r in b)
    assert ka == kb
    assert len({u for u, _, _ in ka}) == 150  # urls unique
