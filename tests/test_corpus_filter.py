"""corpus_filter composition: the one-plan training-data keep/drop
decision must agree with each component operator run independently, on
a corpus planting every drop reason at once (the 10M pipeline's shape,
at test scale)."""

import pytest

from pyspark.sql import functions as F

from search_rs_spark.functions.text_analysis import lang_id, quality_scores
from search_rs_spark.operators.corpus_filter import corpus_filter
from search_rs_spark.operators.dedup import duplicate_clusters, exact_dedup


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """sf documents + one planted row per drop reason: an exact copy, a
    near copy (one token changed mid-doc), a too-short doc, and a
    non-English doc. Planted ids sit above the corpus range."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = docs.orderBy("doc_id").limit(1).collect()[0]
    long_en = " ".join(
        ("the quick brown fox jumps over the lazy dog and runs on").split() * 12
    )
    near = long_en.split()
    near[17] = "plantednear"
    rows = [
        (100_000, long_en),                  # kept source
        (100_001, long_en),                  # exact duplicate of it
        (100_002, " ".join(near)),           # near duplicate of it
        (100_003, "tiny doc"),               # too_short
        (100_004, ("der und die das ist nicht ein mit auf zu " * 8).strip()),  # wrong_lang
        (100_005, base["text"]),             # exact duplicate of a corpus doc
    ]
    return docs.unionAll(spark.createDataFrame(rows, ["doc_id", "text"]))


def test_planted_reasons_land(planted):
    got = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in corpus_filter(planted).filter(F.col("doc_id") >= 100_000).collect()
    }
    assert got[100_000][0] is True and got[100_000][1] == ""
    assert "exact_duplicate" in got[100_001][1]
    assert "near_duplicate" in got[100_002][1]
    assert "too_short" in got[100_003][1]
    assert "wrong_lang" in got[100_004][1]
    assert "exact_duplicate" in got[100_005][1]
    assert all(not k for k, _ in (got[i] for i in (100_001, 100_002, 100_003, 100_004, 100_005)))


def test_composition_equals_parts(planted):
    """keep must equal the conjunction of the independent operators'
    verdicts — the composed plan adds no semantics of its own."""
    cf = {r["doc_id"]: r for r in corpus_filter(planted).collect()}
    q = {r["doc_id"]: r for r in quality_scores(planted).collect()}
    l = {r["doc_id"]: r["lang_pred"] for r in lang_id(planted).collect()}
    ed = {r["doc_id"]: r["is_duplicate"] for r in exact_dedup(planted).collect()}
    nd = {r["doc_id"]: r["is_duplicate"] for r in duplicate_clusters(planted).collect()}
    assert set(cf) == set(q)
    for d, row in cf.items():
        expect_keep = (
            10 <= q[d]["n_tokens"] <= 5_000
            and q[d]["quality"] >= 0.5
            and l[d] == "en"
            and not ed[d]
            and not nd[d]
        )
        assert row["keep"] == expect_keep, (d, row["reasons"])


def test_keep_iff_no_reasons(planted):
    bad = corpus_filter(planted).filter(
        (F.col("keep") & (F.col("reasons") != ""))
        | (~F.col("keep") & (F.col("reasons") == ""))
    )
    assert bad.count() == 0
