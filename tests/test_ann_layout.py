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

def test_probe_buckets_ranked_enumeration_order_and_uniqueness():
    """The heap enumeration must equal brute force: all 2^n perturbation
    sets sorted by (sum of flipped squared margins, cost-rank tuple),
    truncated to n_probes — unique buckets, query bucket first."""
    import itertools

    from search_rs_spark.operators.similarity import (
        _hyperplanes,
        probe_buckets_ranked,
    )

    planes = _hyperplanes(8, 5, seed=21)
    qv = [0.3, -0.7, 0.05, 0.9, -0.2, 0.4, -0.55, 0.11]
    margins = [sum(p * v for p, v in zip(pl, qv)) for pl in planes]
    qb = "".join("1" if m >= 0 else "0" for m in margins)
    costs = sorted((m * m, i) for i, m in enumerate(margins))

    def bucket_for(ranks):
        b = list(qb)
        for r in ranks:
            i = costs[r][1]
            b[i] = "0" if b[i] == "1" else "1"
        return "".join(b)

    subsets = []
    for r in range(1, len(planes) + 1):
        for ranks in itertools.combinations(range(len(planes)), r):
            subsets.append((sum(costs[j][0] for j in ranks), ranks))
    subsets.sort()
    brute = [qb] + [bucket_for(ranks) for _, ranks in subsets]

    for n_probes in (1, 2, 7, 13, 32):
        got = probe_buckets_ranked(qv, planes, n_probes)
        assert got == brute[:n_probes], (n_probes, got, brute[:n_probes])
        assert len(set(got)) == len(got)
    assert probe_buckets_ranked(qv, planes, 99)[0] == qb


def test_ranked_multiprobe_recall_at_equal_budget():
    """Averaged over 50 queries, margin-ranked multiprobe at the SAME
    probed-bucket budget (7 of 64) must recall at least as much of the
    brute-force top-10 as the blanket 1-bit Hamming ball (a single
    query is noise at 500 vectors — the ranking wins in expectation,
    Lv et al. 2007), and 16 ranked probes must clear a recall floor.
    Pure driver-side: the probe-set CHOICE is what is being tested
    (probe_buckets* are pure functions); the Spark filter plumbing and
    row values are hash-gated by the sim_lsh_topk_multiprobe driver
    row. Measured at commit time: ham7 0.242, rank7 0.270, rank16
    0.462 — deterministic given the fixed corpus/planes/query seed."""
    import duckdb
    import numpy as np

    from search_rs_spark.operators.similarity import (
        _hyperplanes,
        probe_buckets,
        probe_buckets_ranked,
    )

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    V = np.array([np.asarray(x, dtype=np.float64) for x in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    n, dim = V.shape
    norms = np.linalg.norm(V, axis=1)
    planes = _hyperplanes(dim, 6)
    P = np.array(planes)
    buckets = np.array(
        ["".join("1" if b else "0" for b in row) for row in (V @ P.T >= 0)]
    )

    def recall(qi, probe):
        cos_all = (V @ V[qi]) / (norms * norms[qi])
        cos_all[qi] = -2.0
        exact = set(ids[np.argsort(-cos_all)[:10]])
        mask = np.isin(buckets, probe)
        mask[qi] = False
        if not mask.any():
            return 0.0
        got = set(ids[mask][np.argsort(-cos_all[mask])[:10]])
        return len(got & exact) / 10.0

    rng = np.random.default_rng(3)
    qs = rng.choice(n, 50, replace=False)
    ham7, rank7, rank16 = [], [], []
    for qi in qs:
        qv = [float(x) for x in V[qi]]
        ham7.append(recall(qi, probe_buckets(qv, planes, 1)))
        rank7.append(recall(qi, probe_buckets_ranked(qv, planes, 7)))
        rank16.append(recall(qi, probe_buckets_ranked(qv, planes, 16)))
    assert np.mean(rank7) >= np.mean(ham7), (np.mean(rank7), np.mean(ham7))
    assert np.mean(rank16) >= 0.4, np.mean(rank16)


@pytest.mark.parametrize("n_probes", [3, 8])
def test_layout_ranked_probe_is_partition_pruned(spark, layout, n_probes):
    """n_probes stays a PARTITION filter listing exactly n_probes
    buckets — a better-chosen directory set, same pruned access.
    n_probes=8 is the sim_lsh_topk_multiprobe_layout driver geometry."""
    import re

    out, _ = layout
    qv = entrymod._query_vec(SF_DIR)
    df = lsh_bucketed_topk_layout(spark, out, qv, k=10, n_probes=n_probes)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([^)]*)\)", plan)
    assert m, plan[:3000]
    assert len(m.group(1).split(",")) == n_probes
