"""IVF ANN: assignment, probe, materialized inverted-list layout
(partition-pruned), and spherical k-means refinement."""

import math

import pytest

import __spark_entry__ as entrymod
from search_rs_spark.operators.ivf import (
    assign_with_centroids,
    ivf_assign,
    ivf_topk,
    ivf_topk_layout,
    kmeans_refine,
    probe_centroids,
    seed_centroids,
    write_ivf_layout,
)
from search_rs_spark.operators.similarity import cosine_topk_bruteforce

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_assign_matches_numpy(spark, emb):
    """Every vector's assigned centroid equals the numpy argmax (same
    rounding + tie-break)."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in rows}
    cents = seed_centroids(emb, 16)

    expected = {}
    for vid, v in vecs.items():
        vn = math.sqrt(float(v @ v)) or 1.0
        best = None
        for cid, cv in cents:
            c = np.array(cv)
            cn = math.sqrt(float(c @ c)) or 1.0
            cos = round(float(v @ c) / (vn * cn), 6)
            key = (-cos, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        expected[vid] = best[1]

    got = {int(r["vec_id"]): int(r["centroid_id"]) for r in ivf_assign(emb, 16).collect()}
    assert got == expected


def test_ivf_topk_recall_and_subset_of_exact_scores(spark, emb):
    qv = entrymod._query_vec(SF_DIR)
    exact = {r["vec_id"]: r["cos"] for r in cosine_topk_bruteforce(emb, qv, 10, 0).collect()}
    approx = {r["vec_id"]: r["cos"] for r in ivf_topk(emb, qv, k=10, exclude_vec_id=0).collect()}
    hits = set(exact) & set(approx)
    assert len(hits) >= 5, (exact, approx)
    for vid in hits:  # scores are the exact cosine, not an approximation
        assert approx[vid] == exact[vid]


def test_layout_matches_flat_path_and_prunes(spark, emb, tmp_path):
    out = str(tmp_path / "ivf")
    write_ivf_layout(emb, out, n_centroids=16)
    qv = entrymod._query_vec(SF_DIR)

    flat = [(r["vec_id"], r["cos"]) for r in ivf_topk(emb, qv, k=10, exclude_vec_id=0).collect()]
    lay_df = ivf_topk_layout(spark, out, qv, k=10, exclude_vec_id=0)
    lay = [(r["vec_id"], r["cos"]) for r in lay_df.collect()]
    assert lay == flat

    # partition pruning: the scan must carry a centroid_id partition
    # filter, and read strictly fewer files than the full layout holds
    plan = lay_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan

    cents = seed_centroids(emb, 16)
    probe = set(probe_centroids(qv, cents))
    import re

    m = re.search(r"partition count: (\d+)", plan) or re.search(
        r"PartitionCount: (\d+)", plan
    )
    if m:  # plan prints the pruned partition count on this Spark version
        assert int(m.group(1)) <= len(probe)


def test_kmeans_objective_non_decreasing_and_improves_recall(spark, emb):
    cents, obj = kmeans_refine(emb, n_centroids=16, n_iter=4)
    assert len(obj) == 4
    for a, b in zip(obj, obj[1:]):
        assert b >= a - 1e-6, obj
    assert len(cents) == 16
    for _, cv in cents:
        assert abs(math.sqrt(sum(x * x for x in cv)) - 1.0) < 1e-9


def test_kmeans_separates_crafted_clusters(spark):
    """Two well-separated direction clusters: one round of refinement
    must put each cluster in its own cell."""
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        jitter = [(0.01 * ((i * 7 + j) % 5 - 2)) for j in range(4)]
        rows.append((i, "x", [b + j for b, j in zip(base, jitter)]))
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    cents, obj = kmeans_refine(emb, n_centroids=2, n_iter=3)
    assign = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in assign_with_centroids(emb, cents).collect()
    }
    # seeds are vec_id 0 (cluster A) and vec_id 1 (cluster B); after
    # refinement assignment by parity must be consistent
    groups = {assign[i] for i in range(0, 40, 2)}, {assign[i] for i in range(1, 40, 2)}
    assert groups[0] != groups[1] and len(groups[0]) == 1 and len(groups[1]) == 1


def test_kmeans_refine_bit_equals_local_replica(spark, emb):
    """The DISTRIBUTED refinement must produce bit-identical centroids
    to the pure-Python replica, at any parallelism: the per-dimension
    sums are exact decimal(38,20) aggregations (order-independent) and
    every float step mirrors exactly (sequential fold dot/norm, HALF_UP
    round-6 before the argmax, shared driver-side update). This is the
    equality that lets sim_ivf_topk_refined be DuckDB-hash-gated."""
    from search_rs_spark.operators.ivf import kmeans_refine_local

    rows = [
        (int(r["vec_id"]), list(r["embedding"]) if r["embedding"] is not None else None)
        for r in emb.select("vec_id", "embedding").collect()
    ]
    local_c, local_obj = kmeans_refine_local(rows, n_iter=2)

    spark_c, spark_obj = kmeans_refine(emb, n_iter=2)
    assert len(spark_c) == len(local_c)
    for (cid_s, cv_s), (cid_l, cv_l) in zip(spark_c, local_c):
        assert cid_s == cid_l
        assert cv_s == cv_l, f"centroid {cid_s} diverged"
    # objectives are float-averaged (not bit-pinned) but must agree well
    # and both be non-decreasing
    for a, b in zip(spark_obj, local_obj):
        assert abs(a - b) < 1e-9
    assert all(b >= a - 1e-12 for a, b in zip(spark_obj, spark_obj[1:]))

    # partitioning independence of the distributed side
    spark_c2, _ = kmeans_refine(emb.repartition(7), n_iter=2)
    assert spark_c2 == spark_c


def test_vec_sql_bit_identical_to_lit(spark):
    """_vec_sql / _dot_sql / _norm_sql claim bit-identity with the
    F.lit Column forms (repr round-trip + correctly-rounded
    Double.parseDouble). Pin it on adversarial doubles: subnormals,
    extremes, negative zero, values whose shortest repr uses scientific
    notation, and a float32-origin value."""
    import numpy as np
    from pyspark.sql import functions as F

    from search_rs_spark.operators.similarity import (
        _dot,
        _dot_sql,
        _norm,
        _norm_sql,
        _vec_sql,
    )

    vals = [
        0.1, -0.1, 1e-300, -1e-300, 5e-324, 1.7976931348623157e308,
        -0.0, 0.0, 1e-05, -1.2345678901234567, 2.0**-30,
        float(np.float32(0.30000001)), 3.141592653589793,
    ]
    df = spark.range(1).select(
        F.expr(_vec_sql(vals)).alias("s"),
        F.array(*[F.lit(float(x)) for x in vals]).alias("l"),
    )
    row = df.select(
        "s",
        "l",
        F.expr(_dot_sql("s", "s")).alias("dot_sql"),
        _dot(F.col("l"), F.col("l")).alias("dot_lit"),
        F.expr(_norm_sql("s")).alias("norm_sql"),
        _norm(F.col("l")).alias("norm_lit"),
    ).collect()[0]
    import struct as _s

    bits = lambda x: _s.pack("<d", x)
    assert [bits(a) for a in row["s"]] == [bits(b) for b in row["l"]]
    assert bits(row["dot_sql"]) == bits(row["dot_lit"])
    assert bits(row["norm_sql"]) == bits(row["norm_lit"])
