"""Materialized bucket-partitioned ANN layout: probes must read only
the probed buckets' partitions (partition pruning) and agree with the
on-the-fly bucket path."""

import os

import pytest

import __spark_entry__ as entrymod
from search_rs_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
    lsh_bucketed_topk_layout,
    write_bucketed_embeddings,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "buckets")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    meta = write_bucketed_embeddings(emb, out)
    return out, meta


def test_layout_matches_on_the_fly_path(spark, layout):
    out, _ = layout
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = entrymod._query_vec(SF_DIR)
    fly = [(r["vec_id"], r["cos"]) for r in
           lsh_bucketed_topk(emb, qv, k=10, exclude_vec_id=0).collect()]
    lay = [(r["vec_id"], r["cos"]) for r in
           lsh_bucketed_topk_layout(spark, out, qv, k=10, exclude_vec_id=0).collect()]
    assert lay == fly

    exact = {r["vec_id"] for r in cosine_topk_bruteforce(emb, qv, 10, 0).collect()}
    assert len(exact & {v for v, _ in lay}) >= 5  # recall floor


def test_cosine_lsh_pairs_precision_and_recall(spark):
    """LSH near-dup pairs on planted duplicates: every returned pair is
    exact-verified (precision 1.0) and multi-table hashing recovers
    most planted pairs."""
    import math
    import random

    from search_rs_spark.operators.similarity import cosine_lsh_pairs, cosine_pairs

    rng = random.Random(7)
    dim = 16
    rows = []
    base_vecs = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        base_vecs.append(v)
        rows.append((i, v, 0))
    # plant 8 near-dups: id 1000+i is a tiny perturbation of id i
    planted = []
    for i in range(8):
        v = [x + rng.gauss(0, 0.02) for x in base_vecs[i]]
        rows.append((1000 + i, v, 0))
        planted.append((i, 1000 + i))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs(emb, threshold=0.95, max_vec_id=None).collect()
    }
    assert set(planted) <= exact  # the plants really are near-dups

    got = {(r["vec_a"], r["vec_b"]) for r in cosine_lsh_pairs(emb, 0.95).collect()}
    assert got <= exact  # precision 1.0 (exact-verified)
    recall = len(got & set(planted)) / len(planted)
    assert recall >= 0.75, (recall, sorted(got), sorted(planted))


def test_probe_scan_is_partition_pruned(spark, layout):
    out, meta = layout
    qv = entrymod._query_vec(SF_DIR)
    df = lsh_bucketed_topk_layout(spark, out, qv, k=10, probe_bits=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:3000]

    # probed fraction: probe_bits=1 touches n_planes+1 of the 2^n_planes
    # buckets; the scan's partition filter must list exactly that many
    import re

    n_planes = meta["n_planes"]
    n_dirs = len([d for d in os.listdir(out) if d.startswith("bucket=")])
    assert n_dirs > n_planes + 1  # pruning must actually skip partitions
    m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([^)]*)\)", plan)
    assert m, plan[:3000]
    assert len(m.group(1).split(",")) == n_planes + 1