"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding similarity, next to the LSH one in
:mod:`search_rs_spark.operators.similarity`: partition the vector space
by a small set of centroids, assign every vector to its nearest
centroid (its "inverted list"), and answer a query by scanning only
the ``n_probe`` lists whose centroids are closest to the query.

Scale shape (the part that matters at 100 TB):

- the centroid table is C x dim floats (kilobytes) — it lives on the
  driver and folds into the plan as literals, so assignment is a
  single embarrassingly-parallel pass over the vectors, no shuffle;
- the inverted lists are a centroid-partitioned parquet layout
  (:func:`write_ivf_layout`), so a probe is a partition-pruned read of
  ``n_probe / n_centroids`` of the data — same storage story as the
  LSH layout, but with tunable-resolution Voronoi cells instead of
  fixed hyperplane signs;
- centroid refinement (:func:`kmeans_refine`, spherical Lloyd's) keeps
  centroids on the driver and distributes the two heavy steps —
  assignment and per-dimension sums — as JVM-side aggregations with
  map-side partial aggregation (no posexplode of the vectors, no
  Python in the loop).

The reference (tomfran/search-rs) has no embedding operators; this
module is part of the training-data-pipeline surface the task adds on
top. Exact brute force (similarity.cosine_topk_bruteforce) is the
recall oracle; assignment and probe are DuckDB-oracle-checked.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _cosine_topk, _dot_sql, _norm, _norm_sql, _vec_sql

IVF_N_CENTROIDS = 16
IVF_N_PROBE = 4


def seed_centroids(emb: DataFrame, n_centroids: int = IVF_N_CENTROIDS) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seeds: the non-null vectors with the
    ``n_centroids`` smallest ACTUAL vec_ids (orderBy + limit — a tiny
    top-N collect), so sparse or offset vec_id spaces (e.g.
    asset-derived embeddings where invalid payloads were dropped) still
    yield exactly ``n_centroids`` seeds. Raises when the table holds
    fewer than ``n_centroids`` non-null vectors rather than silently
    degrading every downstream assign/probe."""
    rows = (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(
            f"need {n_centroids} non-null embeddings to seed IVF centroids, "
            f"found {len(rows)}"
        )
    return sorted((int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows)


def _assign_expr(vcol: str, ncol: str, centroids: list[tuple[int, list[float]]]):
    """struct(cos, neg_cid) of the best (max cos, min cid) centroid.

    One JVM-side expression per centroid; ``array_max`` over the struct
    array picks max cos with ties broken toward the smallest cid (via
    the negated cid field). cos is rounded to 6 before the argmax so
    the DuckDB oracle's tie-breaks agree bit-for-bit.

    ``vcol``/``ncol`` are COLUMN NAMES: the whole expression is built
    as one SQL string and parsed once — the Column-node form cost
    n_centroids x dim py4j round trips (~1k calls ≈ 1 s of plan
    construction per 16x64 probe, the dominant cost of an on-the-fly
    IVF query at small scale)."""
    entries = []
    for cid, cv in centroids:
        cn = math.sqrt(sum(x * x for x in cv)) or 1.0
        cos_c = (
            f"round({_dot_sql(vcol, _vec_sql(cv))} / "
            f"({ncol} * CAST('{float(cn)!r}' AS DOUBLE)), 6)"
        )
        entries.append(f"struct({cos_c} AS cos, {-int(cid)} AS neg_cid)")
    return F.expr("array_max(array(" + ",".join(entries) + "))")


def _round6_java(x: float) -> float:
    """Spark's ``round(x, 6)`` on doubles, exactly: pass non-finite
    through (measured: Spark returns inf/NaN unchanged), else HALF_UP
    on the shortest round-trip decimal repr (Java
    ``BigDecimal.valueOf``), normalized with ``+ 0.0`` because
    BigDecimal has no negative zero (Python's Decimal does, so a tiny
    negative that rounds to zero would otherwise come back as -0.0 and
    diverge bit-wise from the JVM's +0.0)."""
    import math as _math

    if not _math.isfinite(x):
        return x
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)) + 0.0


def _assign_kernel_udf(centroids: list[tuple[int, list[float]]], dim: int):
    """Arrow-batched numpy twin of :func:`_assign_expr` for
    uniform-width, null-element-free rows (the JVM guard in
    :func:`_assign_col` routes every other row to the HOF form).

    Bit-identity argument, step by step against the HOF plan:

    - float -> double element casts == ``astype(float64)`` (exact
      widening);
    - the dot/norm fold ``acc = acc + x*y`` is replayed as ``dim``
      vectorized accumulation steps in the SAME left-to-right element
      order, each an IEEE double multiply then add — identical
      rounding sequence per row;
    - ``cos = dot / (norm * cn)`` with the same operand grouping;
    - the 6-dp HALF_UP rounding before the argmax is monotone, so the
      rounded argmax can only differ from the unrounded one among
      near-ties (gap < 1e-6); the kernel rounds exactly (Decimal,
      :func:`_round6_java`) for the few candidates within 2e-6 of the
      row max and picks (max rounded cos, min cid) — the HOF
      ``array_max``'s struct order with ties broken toward the
      smallest cid via the negated-cid field;
    - rows where any cosine is NaN reproduce Spark's double ordering
      (NaN greatest, all-NaN ties resolved by max neg_cid = smallest
      cid).

    Why a Python kernel at all: the HOF form interprets
    ``n_centroids x dim`` lambda calls per row (~1.3 ms/row at 16x64 —
    the dominant cost of every on-the-fly IVF operation), and the
    unrolled-expression alternative exceeds Janino's method-parameter
    limit at this width, falling back to interpreted eval. One numpy
    pass per Arrow batch does the same arithmetic at vector speed
    (guide §4.2); C x dim work per row is unchanged, so the kernel
    scales exactly like the expression it replaces.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    C = np.array([[float(x) for x in cv] for _, cv in centroids], dtype=np.float64)
    cids = np.array([int(cid) for cid, _ in centroids], dtype=np.int64)
    cns = np.array(
        [math.sqrt(sum(x * x for x in cv)) or 1.0 for _, cv in centroids],
        dtype=np.float64,
    )
    n_cent = len(centroids)

    def fn(embs):
        n = len(embs)
        out_cos = np.zeros(n, dtype=np.float64)
        out_neg = np.zeros(n, dtype=np.int32)
        # NaN travels as an explicit flag: pandas -> Arrow serialization
        # treats NaN in a float series as NULL, which would silently
        # rewrite a NaN cosine (possible with NaN/inf embedding values)
        # into null; the JVM side rebuilds double('NaN') from the flag
        out_nan = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.DataFrame(
                {"cos": out_cos, "neg_cid": out_neg, "nan": out_nan}
            )
        vals = embs.to_numpy()
        rows = np.fromiter(
            (
                (e is not None and len(e) == dim)
                for e in vals
            ),
            dtype=bool,
            count=n,
        )
        idx = np.nonzero(rows)[0]
        if idx.size == 0:
            return pd.DataFrame(
                {"cos": out_cos, "neg_cid": out_neg, "nan": out_nan}
            )
        V = np.stack([np.asarray(vals[i], dtype=np.float64) for i in idx])
        m = V.shape[0]
        # sequential fold over dimensions — the HOF aggregate's exact
        # (multiply, add) sequence, vectorized across the batch
        nrm = np.zeros(m, dtype=np.float64)
        D = np.zeros((m, n_cent), dtype=np.float64)
        for i in range(dim):
            col = V[:, i]
            nrm += col * col
            D += col[:, None] * C[None, :, i]
        nrm = np.sqrt(nrm)
        if (nrm == 0.0).any():
            # the HOF form raises ANSI DIVIDE_BY_ZERO for a zero-norm
            # vector; reproduce the failure instead of silently
            # emitting NaN where the expression would have errored
            raise ArithmeticError(
                "[DIVIDE_BY_ZERO] zero-norm embedding in IVF assignment "
                "(same failure the SQL expression raises under ANSI)"
            )
        with np.errstate(invalid="ignore", divide="ignore"):
            Q = D / (nrm[:, None] * cns[None, :])
        nan_mask = np.isnan(Q)
        any_nan = nan_mask.any(axis=1)
        cos_r = np.empty(m, dtype=np.float64)
        neg_r = np.empty(m, dtype=np.int32)
        # NaN rows: NaN sorts greatest; equal NaNs tie-break to max
        # neg_cid = smallest cid among the NaN entries
        nan_r = np.zeros(m, dtype=bool)
        for r in np.nonzero(any_nan)[0]:
            js = np.nonzero(nan_mask[r])[0]
            neg_r[r] = -int(cids[js].min())
            cos_r[r] = 0.0
            nan_r[r] = True
        ok = np.nonzero(~any_nan)[0]
        if ok.size:
            Qo = Q[ok]
            mx = Qo.max(axis=1)
            cand = Qo >= (mx[:, None] - 2e-6)
            for t, r in enumerate(ok):
                best = None
                for j in np.nonzero(cand[t])[0]:
                    rc = _round6_java(float(Qo[t, j]))
                    key = (rc, -int(cids[j]))
                    if best is None or key > best:
                        best = key
                cos_r[r] = best[0]
                neg_r[r] = best[1]
        out_cos[idx] = cos_r
        out_neg[idx] = neg_r
        out_nan[idx] = nan_r
        return pd.DataFrame({"cos": out_cos, "neg_cid": out_neg, "nan": out_nan})

    return F.pandas_udf(fn, "cos double, neg_cid int, nan boolean")


def _assign_col(emb_col: str, centroids: list[tuple[int, list[float]]]):
    """struct(cos, neg_cid) of the best centroid, computed straight off
    the raw ``array<float>`` column: the numpy kernel for well-formed
    rows (non-null, exact width, no null elements), the original HOF
    expression for everything else — equivalent on every input, since
    the HOF's own casts make it indifferent to operating on the raw
    column vs the pre-cast double array."""
    dim = len(centroids[0][1]) if centroids else 0
    guard = F.expr(
        f"{emb_col} IS NOT NULL AND size({emb_col}) = {dim} "
        f"AND size(array_compact({emb_col})) = {dim}"
    )
    k = _assign_kernel_udf(centroids, dim)(F.col(emb_col))
    kernel = F.struct(
        F.when(k["nan"], F.expr("double('NaN')")).otherwise(k["cos"]).alias("cos"),
        k["neg_cid"].alias("neg_cid"),
    )
    hof = _assign_expr(emb_col, _norm_sql(emb_col), centroids)
    return F.when(guard, kernel).otherwise(hof)


def ivf_assign(emb: DataFrame, n_centroids: int = IVF_N_CENTROIDS) -> DataFrame:
    """(vec_id, centroid_id, cos) — nearest-centroid assignment against
    the deterministic seeds (use :func:`assign_with_centroids` for
    refined centroids).

    Single pass, centroids folded in as literals: no shuffle, no join,
    whole-stage codegen end to end.
    """
    return assign_with_centroids(emb, seed_centroids(emb, n_centroids))


def assign_with_centroids(
    emb: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, centroid_id, cos) against explicit centroids (e.g. the
    output of :func:`kmeans_refine`). Numpy kernel fast path with the
    HOF expression as the ragged-row fallback (:func:`_assign_col`)."""
    best = _assign_col("embedding", centroids)
    return emb.select(
        "vec_id",
        (-best["neg_cid"]).alias("centroid_id"),
        best["cos"].alias("cos"),
    )


def ivf_assign_sql(n_centroids: int = IVF_N_CENTROIDS) -> str:
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS cn
  FROM embeddings WHERE embedding IS NOT NULL
  ORDER BY vec_id LIMIT {n_centroids}
), d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings
), s AS (
  SELECT d.vec_id, c.cid,
         round(list_sum(list_transform(list_zip(d.v, c.cv), p -> p[1] * p[2]))
               / (d.n * c.cn), 6) AS cos,
         row_number() OVER (
           PARTITION BY d.vec_id
           ORDER BY round(list_sum(list_transform(list_zip(d.v, c.cv),
                                                  p -> p[1] * p[2]))
                          / (d.n * c.cn), 6) DESC, c.cid ASC) AS rn
  FROM d CROSS JOIN c
)
SELECT vec_id, cid AS centroid_id, cos FROM s WHERE rn = 1
"""


def probe_centroids(
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    n_probe: int = IVF_N_PROBE,
) -> list[int]:
    """The ``n_probe`` centroid ids closest to the query, by
    (cos desc, cid asc) — same rounding/tie-break as the assignment."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    scored = []
    for cid, cv in centroids:
        cn = math.sqrt(sum(x * x for x in cv)) or 1.0
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, cv))
        scored.append((round(dot / (qn * cn), 6), cid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return sorted(cid for _, cid in scored[:n_probe])


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = IVF_N_CENTROIDS,
    n_probe: int = IVF_N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine over the vectors assigned to the
    query's ``n_probe`` nearest centroids. On the flat table this is a
    one-pass filter; the scale path is :func:`ivf_topk_layout`, where
    the same filter is partition pruning."""
    centroids = seed_centroids(emb, n_centroids)
    probe = probe_centroids(query_vec, centroids, n_probe)
    best = _assign_col("embedding", centroids)
    cand = emb.withColumn("centroid_id", -best["neg_cid"]).filter(
        F.col("centroid_id").isin(*probe)
    )
    return _cosine_topk(cand, query_vec, k, exclude_vec_id)


def ivf_topk_sql(
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = IVF_N_CENTROIDS,
    n_probe: int = IVF_N_PROBE,
    exclude_vec_id: int = 0,
) -> str:
    """Self-contained oracle: centroid ranking, probe selection,
    assignment, and the final top-k are all inside the SQL — nothing
    but the query literal is computed Python-side."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qlist = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH q AS (SELECT {qlist}::DOUBLE[] AS qv),
c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS cn
  FROM embeddings WHERE embedding IS NOT NULL
  ORDER BY vec_id LIMIT {n_centroids}
), probe AS (
  SELECT cid FROM c, q
  ORDER BY round(list_sum(list_transform(list_zip(cv, qv), p -> p[1] * p[2]))
                 / (cn * {qn!r}), 6) DESC, cid ASC
  LIMIT {n_probe}
), d AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings
), assigned AS (
  SELECT d.vec_id, d.label, d.v, d.n, c.cid,
         row_number() OVER (
           PARTITION BY d.vec_id
           ORDER BY round(list_sum(list_transform(list_zip(d.v, c.cv),
                                                  p -> p[1] * p[2]))
                          / (d.n * c.cn), 6) DESC, c.cid ASC) AS rn
  FROM d CROSS JOIN c
), cand AS (
  SELECT a.vec_id, a.label, a.v, a.n FROM assigned a
  JOIN probe p ON a.cid = p.cid
  WHERE a.rn = 1 AND a.vec_id <> {exclude_vec_id}
)
SELECT vec_id, label,
       round(list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2]))
             / (n * {qn!r}), 6) AS cos
FROM cand, q
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def ivf_topk_with_centroids(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = IVF_N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Approximate top-k against EXPLICIT centroids (e.g. the output of
    :func:`kmeans_refine`) — same plan shape as :func:`ivf_topk`:
    assignment inline on the scan, probe as a filter, exact cosine +
    TakeOrderedAndProject."""
    probe = probe_centroids(query_vec, centroids, n_probe)
    best = _assign_col("embedding", centroids)
    cand = emb.withColumn("centroid_id", -best["neg_cid"]).filter(
        F.col("centroid_id").isin(*probe)
    )
    return _cosine_topk(cand, query_vec, k, exclude_vec_id)


def ivf_topk_refined_sql(
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = IVF_N_PROBE,
    exclude_vec_id: int = 0,
) -> str:
    """Oracle for :func:`ivf_topk_with_centroids`: identical to
    :func:`ivf_topk_sql` except the centroid CTE is a VALUES literal of
    the (deterministically computed) refined centroids — the same
    mechanism that folds the seeds in. Centroid norms are folded as
    literals too (both engines compute them driver-side in Python)."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qlist = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    rows = ", ".join(
        "({cid}, [{cv}]::DOUBLE[], {cn!r})".format(
            cid=cid,
            cv=", ".join(repr(float(x)) for x in cv),
            cn=math.sqrt(sum(x * x for x in cv)) or 1.0,
        )
        for cid, cv in centroids
    )
    return f"""
WITH q AS (SELECT {qlist}::DOUBLE[] AS qv),
c AS (SELECT * FROM (VALUES {rows}) AS t(cid, cv, cn)),
probe AS (
  SELECT cid FROM c, q
  ORDER BY round(list_sum(list_transform(list_zip(cv, qv), p -> p[1] * p[2]))
                 / (cn * {qn!r}), 6) DESC, cid ASC
  LIMIT {n_probe}
), d AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings
), assigned AS (
  SELECT d.vec_id, d.label, d.v, d.n, c.cid,
         row_number() OVER (
           PARTITION BY d.vec_id
           ORDER BY round(list_sum(list_transform(list_zip(d.v, c.cv),
                                                  p -> p[1] * p[2]))
                          / (d.n * c.cn), 6) DESC, c.cid ASC) AS rn
  FROM d CROSS JOIN c
), cand AS (
  SELECT a.vec_id, a.label, a.v, a.n FROM assigned a
  JOIN probe p ON a.cid = p.cid
  WHERE a.rn = 1 AND a.vec_id <> {exclude_vec_id}
)
SELECT vec_id, label,
       round(list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2]))
             / (n * {qn!r}), 6) AS cos
FROM cand, q
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Materialized inverted-list layout: write once, probe many.
# ---------------------------------------------------------------------------

IVF_META = "_IVF_META.json"


def write_ivf_layout(
    emb: DataFrame, out_dir: str, n_centroids: int = IVF_N_CENTROIDS
) -> dict:
    """Persist embeddings PARTITIONED BY nearest centroid — the inverted
    lists as parquet partition directories, so a probe is a
    partition-pruned scan of only the probed lists. The centroids ride
    along in a meta json so probes need no recomputation."""
    import json
    import os

    centroids = seed_centroids(emb, n_centroids)
    # assignment inline on the scan (centroid literals) — no join, no
    # shuffle; the only data movement is the partitioned write itself
    best = _assign_col("embedding", centroids)
    assigned = emb.withColumn("centroid_id", -best["neg_cid"])
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(out_dir)
    meta = {"n_centroids": n_centroids, "centroids": centroids}
    with open(os.path.join(out_dir, IVF_META), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_topk_layout(
    spark,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = IVF_N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Approximate top-k over a :func:`write_ivf_layout` layout. The
    centroid filter is a PARTITION filter — only the probed lists'
    directories are scanned (plan-pinned in tests)."""
    import json
    import os

    with open(os.path.join(out_dir, IVF_META)) as f:
        meta = json.load(f)
    centroids = [(int(c), [float(x) for x in v]) for c, v in meta["centroids"]]
    probe = probe_centroids(query_vec, centroids, n_probe)
    cand = spark.read.parquet(out_dir).filter(F.col("centroid_id").isin(*probe))
    return _cosine_topk(cand, query_vec, k, exclude_vec_id)


# ---------------------------------------------------------------------------
# Centroid refinement: spherical k-means (Lloyd's), DataFrame-distributed.
# ---------------------------------------------------------------------------


def _update_centroids(
    centroids: list[tuple[int, list[float]]],
    rows: "dict[int, tuple[int, list]]",
) -> list[tuple[int, list[float]]]:
    """One Lloyd's centroid update from per-centroid (count, per-dim
    exact Decimal sums of the unit vectors). SHARED between the Spark
    refinement and the pure-Python replica so the driver-side float
    arithmetic (Decimal -> float division, norm, renormalize) is the
    same code path in both — a precondition for bit-equality."""
    new_centroids = []
    for cid, old in centroids:
        r = rows.get(cid)
        if r is None:  # empty list: keep the old centroid
            new_centroids.append((cid, old))
            continue
        cnt, sums = r
        mean = [float(s) / cnt for s in sums]
        nrm = math.sqrt(sum(x * x for x in mean))
        new_centroids.append((cid, [x / nrm for x in mean] if nrm else old))
    return new_centroids


def _round6(x: float) -> float:
    """Python replica of Spark's ``F.round(x, 6)`` on doubles: Java
    rounds BigDecimal.valueOf(x) (the shortest round-trip decimal
    repr, = Python's ``repr``) HALF_UP — NOT Python's banker's
    ``round``."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _to_dec20(x: float):
    """Python replica of Spark's double -> decimal(38,20) cast (via the
    shortest round-trip decimal repr, HALF_UP at 20 fractional
    digits)."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(x)).quantize(Decimal("1e-20"), ROUND_HALF_UP)


def kmeans_refine_local(
    vectors: list[tuple[int, list[float]]],
    n_centroids: int = IVF_N_CENTROIDS,
    n_iter: int = 5,
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Pure-Python, bit-exact replica of :func:`kmeans_refine` — the
    oracle side of the refined-centroid driver row (the refinement
    itself cannot run in DuckDB SQL; instead this replica computes the
    SAME centroids deterministically and they fold into
    :func:`ivf_topk_refined_sql` as literals).

    Bit-equality holds because every arithmetic step mirrors the Spark
    plan exactly: float32 -> float64 element casts, sequential
    left-to-right fold for dot/norm (Spark's ``aggregate`` HOF),
    HALF_UP rounding at 6 dp before the (cos desc, cid asc) argmax,
    per-element double division for the unit vectors, HALF_UP
    double -> decimal(38,20) casts, exact Decimal sums (order-free on
    both sides), and the shared :func:`_update_centroids` driver step.
    Pinned equal to the distributed version in tests/test_ivf.py.

    ``vectors``: (vec_id, embedding) rows; intended for oracle-scale
    inputs (the driver sf tables), not production corpora.
    """
    named = [
        (vid, [float(x) for x in vec])
        for vid, vec in vectors
        if vec is not None
    ]
    named.sort(key=lambda t: t[0])
    if len(named) < n_centroids:
        raise ValueError(
            f"need {n_centroids} non-null embeddings to seed IVF centroids, "
            f"found {len(named)}"
        )
    centroids = sorted((vid, list(vec)) for vid, vec in named[:n_centroids])
    dim = len(centroids[0][1])

    def _seq_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def _seq_norm(a: list[float]) -> float:
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    data = [(vid, vec, _seq_norm(vec)) for vid, vec in named]
    data = [(vid, vec, n) for vid, vec, n in data if n > 0]

    objectives: list[float] = []
    for _ in range(n_iter):
        cns = [(cid, cv, _seq_norm(cv)) for cid, cv in centroids]
        rows: dict[int, tuple[int, list]] = {}
        cos_sum: dict[int, float] = {}
        for _vid, vec, n in data:
            best = max(
                ((_round6(_seq_dot(vec, cv) / (n * cn)), -cid) for cid, cv, cn in cns)
            )
            cid = -best[1]
            u = [x / n for x in vec]
            if cid not in rows:
                rows[cid] = (0, [_to_dec20(0.0)] * dim)
            cnt, sums = rows[cid]
            rows[cid] = (cnt + 1, [s + _to_dec20(x) for s, x in zip(sums, u)])
            cos_sum[cid] = cos_sum.get(cid, 0.0) + best[0]
        total = sum(cnt for cnt, _ in rows.values())
        objectives.append(sum(cos_sum.values()) / total)
        centroids = _update_centroids(centroids, rows)
    return centroids, objectives


def kmeans_refine(
    emb: DataFrame,
    n_centroids: int = IVF_N_CENTROIDS,
    n_iter: int = 5,
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Refine the seeded centroids with ``n_iter`` rounds of spherical
    Lloyd's; returns (centroids, per-iteration mean cosine objective —
    non-decreasing, asserted in tests).

    Per round, the distributed work is one aggregation: assign each
    vector JVM-side (centroid literals, no join), then groupBy
    centroid with ``dim`` partial ``sum(u[i])`` aggregates + a count —
    map-side combined, shuffling only C x (dim+2) values per
    partition. No posexplode of the vectors, no Python in the loop;
    only the C x dim centroid matrix ever reaches the driver.

    DETERMINISM: the per-dimension sums run over ``decimal(38,20)``
    casts, so the aggregation is exact and ORDER-INDEPENDENT — the
    refined centroids are bit-identical regardless of partitioning or
    parallelism. That makes the whole refinement reproducible by the
    pure-Python replica :func:`kmeans_refine_local` (pinned equal in
    tests/test_ivf.py), which is what lets refined-centroid probes be
    DuckDB-hash-gated in the driver contract (sim_ivf_topk_refined).
    """
    head = emb.filter(F.col("embedding").isNotNull()).select("embedding").head()
    if head is None:
        raise ValueError("cannot refine centroids over an empty embeddings table")
    dim = len(head["embedding"])
    centroids = seed_centroids(emb, n_centroids)
    d = (
        emb.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .withColumn("n", _norm(F.col("v")))
        .filter(F.col("n") > 0)
        .persist()
    )
    objectives: list[float] = []
    try:
        for _ in range(n_iter):
            best = _assign_expr("v", "n", centroids)
            assigned = d.select(
                (-best["neg_cid"]).alias("centroid_id"),
                best["cos"].alias("cos"),
                F.transform("v", lambda x: x / F.col("n")).alias("u"),
            )
            agg = assigned.groupBy("centroid_id").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.avg("cos").alias("mean_cos"),
                # exact, order-independent accumulation (see docstring);
                # |u[i]| <= 1 so 18 integer digits cannot overflow
                # before ~1e18 vectors per centroid
                *[
                    F.sum(F.element_at("u", i + 1).cast("decimal(38,20)")).alias(
                        f"s{i}"
                    )
                    for i in range(dim)
                ],
            )
            collected = agg.collect()
            rows = {
                int(r["centroid_id"]): (
                    int(r["cnt"]),
                    [r[f"s{i}"] for i in range(dim)],
                )
                for r in collected
            }
            total = sum(cnt for cnt, _ in rows.values())
            objectives.append(
                sum(r["mean_cos"] * r["cnt"] for r in collected) / total
            )
            centroids = _update_centroids(centroids, rows)
    finally:
        d.unpersist()
    return centroids, objectives
