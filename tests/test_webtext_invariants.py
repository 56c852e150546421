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


def test_generator_deterministic_across_parallelism(spark):
    a = synthesize_webtext(spark, 150, seed=8, partitions=2).collect()
    b = synthesize_webtext(spark, 150, seed=8, partitions=16).collect()
    ka = sorted((r["url"], r["text"], r["lang"]) for r in a)
    kb = sorted((r["url"], r["text"], r["lang"]) for r in b)
    assert ka == kb
    assert len({u for u, _, _ in ka}) == 150  # urls unique
