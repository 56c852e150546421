"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k cosine against one query
  vector; the baseline. JVM-side arithmetic via ``zip_with`` +
  ``aggregate`` (no Python in the hot path); the query vector is a
  literal folded into the plan, the scan is a single pass + top-k
  (TakeOrderedAndProject), no shuffle beyond the final k.
- :func:`cosine_pairs` — all pairs above a cosine threshold within a
  vec_id window (used as the embedding near-dup detector).
- :func:`lsh_bucketed_topk` — the scale path: sign-of-projection LSH
  buckets against deterministic hyperplanes derived from md5 (so both
  engines could reproduce them), probe only the query's bucket ± 1-bit
  neighbors. Approximate; tested for recall against brute force.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _vec_sql(vals) -> str:
    """array<double> literal as ONE SQL string. ``F.lit`` per element
    costs a py4j round trip each — a 16x64 centroid fold is ~1k calls
    (~1 s of pure plan construction per query); parsing one string is
    ~free. repr() emits the shortest round-trip decimal and
    Double.parseDouble is correctly rounded, so every element is the
    exact double ``F.lit(float(x))`` would embed (same downstream
    arithmetic bit-for-bit). The repr goes through a QUOTED-STRING cast
    (Double.parseDouble), not a bare numeric literal: bare ``-0.0``
    would parse as DECIMAL first, which has no signed zero."""
    return (
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vals) + ")"
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL-string twin of :func:`_dot` (operand order and cast
    placement identical, so results are bit-equal)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    """SQL-string twin of :func:`_norm`."""
    return (
        f"sqrt(aggregate(transform({a}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def _dot_lit_sql(a: str, vals) -> str:
    """dot(a, literal vals) — bit-identical to
    ``_dot_sql(a, _vec_sql(vals))`` but UNROLLED into flat
    left-associative arithmetic (``((0.0 + p0) + p1) + ...``, the exact
    fold sequence the aggregate HOF evaluates), so the projection runs
    in whole-stage codegen instead of the interpreted
    lambda-per-element HOF path (guide §4.1: builtins run with codegen;
    HOFs do not — measured 15-20% on the brute-force cosine scan).
    Guarded on ``size(a) = len(vals)``: ``zip_with`` null-pads the
    shorter operand, making the HOF form NULL on any length mismatch —
    the guard routes those rows to the original HOF expression so the
    two forms are equivalent on every input (the guard also keeps the
    unrolled ``a[i]`` accesses in-bounds under ANSI mode)."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST('{float(x)!r}' AS DOUBLE)"
        for i, x in enumerate(vals)
    )
    unrolled = f"(CAST(0.0 AS DOUBLE) + {terms})"
    return f"IF(size({a}) = {len(vals)}, {unrolled}, {_dot_sql(a, _vec_sql(vals))})"


def _norm_fixed_sql(a: str, n: int) -> str:
    """Unrolled twin of :func:`_norm_sql` for arrays of known width
    ``n`` — same guard/fallback contract as :func:`_dot_lit_sql` (a
    shorter/longer array norms over its ACTUAL elements in the HOF
    form, so the fallback, not null, is the equivalent branch)."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)" for i in range(n)
    )
    unrolled = f"sqrt(CAST(0.0 AS DOUBLE) + {terms})"
    return f"IF(size({a}) = {n}, {unrolled}, {_norm_sql(a)})"


def _cos_query_expr(vec_col: str, query_vec, qn: float):
    """round(cos(vec_col, query_vec), 6) as one parsed expression
    (unrolled codegen arithmetic; HOF fallback for ragged rows)."""
    return F.expr(
        f"round({_dot_lit_sql(vec_col, query_vec)} / "
        f"({_norm_fixed_sql(vec_col, len(query_vec))} * CAST('{float(qn)!r}' AS DOUBLE)), 6)"
    )


def cosine_topk_bruteforce(
    emb: DataFrame, query_vec: list[float], k: int = 10, exclude_vec_id: int | None = None
) -> DataFrame:
    """(vec_id, label, cos) — exact top-k by (cos desc, vec_id asc)."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    d = emb
    if exclude_vec_id is not None:
        d = d.filter(F.col("vec_id") != exclude_vec_id)
    scored = d.select(
        "vec_id",
        "label",
        _cos_query_expr("embedding", query_vec, qn).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def cosine_topk_sql(query_vec: list[float], k: int = 10, exclude_vec_id: int = 0) -> str:
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qlist = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH q AS (SELECT {qlist}::DOUBLE[] AS qv),
s AS (
  SELECT vec_id, label,
         round(
           list_sum(list_transform(list_zip(embedding::DOUBLE[], qv),
                                   p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
              * {qn!r}), 6) AS cos
  FROM embeddings, q
  WHERE vec_id <> {exclude_vec_id}
)
SELECT vec_id, label, cos FROM s ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def cosine_pairs(
    emb: DataFrame, threshold: float = 0.95, max_vec_id: int | None = 300
) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-dup pairs above threshold."""
    d = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    if max_vec_id is not None:
        d = d.filter(F.col("vec_id") < max_vec_id)
    d = d.withColumn("n", _norm(F.col("v")))
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_pairs_sql(threshold: float = 0.95, max_vec_id: int = 300) -> str:
    return f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings WHERE vec_id < {max_vec_id}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
             / (a.n * b.n), 6) AS cos
FROM d a JOIN d b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
            / (a.n * b.n), 6) >= {threshold}
"""


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bytes."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        j = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()
            for off in range(0, 16, 2):
                if len(vals) >= dim:
                    break
                u = int.from_bytes(h[off : off + 2], "big") / 65535.0
                vals.append(2.0 * u - 1.0)
            j += 1
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def lsh_bucket_expr(col, planes: list[list[float]]):
    """Bitstring bucket id: sign of projection onto each hyperplane.
    Plane vectors fold in as one parsed SQL literal each (_vec_sql) —
    not dim-many F.lit py4j round trips."""
    bits = [
        F.when(_dot(col, F.expr(_vec_sql(plane))) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return F.concat(*bits)


def probe_buckets(
    query_vec: list[float], planes: list[list[float]], probe_bits: int
) -> list[str]:
    """The query's LSH bucket plus every bucket within ``probe_bits``
    Hamming distance (multiprobe set)."""
    import itertools

    qb = ""
    for plane in planes:
        qb += "1" if sum(p * float(v) for p, v in zip(plane, query_vec)) >= 0 else "0"
    probe = {qb}
    n_planes = len(planes)
    for r in range(1, probe_bits + 1):
        for flips in itertools.combinations(range(n_planes), r):
            b = list(qb)
            for i in flips:
                b[i] = "0" if b[i] == "1" else "1"
            probe.add("".join(b))
    return sorted(probe)


def probe_buckets_ranked(
    query_vec: list[float], planes: list[list[float]], n_probes: int
) -> list[str]:
    """Margin-ranked multiprobe set (Lv et al., "Multi-Probe LSH",
    VLDB 2007): the ``n_probes`` buckets MOST LIKELY to hold the
    query's neighbors, enumerated in nondecreasing perturbation cost.

    Flipping plane ``i`` costs ``margin_i^2`` (the squared projection —
    a near-zero margin means the query sits on that hyperplane, so its
    neighbors fall on either side with ~equal probability); a candidate
    bucket's cost is the sum over its flipped planes. The classic
    heap enumeration yields perturbation sets in cost order without
    materializing the 2^n_planes lattice, so recall per probed bucket
    beats the blanket Hamming ball of :func:`probe_buckets` (which
    spends probes on high-margin flips as readily as low-margin ones).
    Deterministic: ties break on the cost-rank index tuple."""
    import heapq

    margins = [
        sum(p * float(v) for p, v in zip(plane, query_vec)) for plane in planes
    ]
    qb = "".join("1" if m >= 0 else "0" for m in margins)
    out = [qb]
    if n_probes <= 1 or not planes:
        return out
    costs = sorted((m * m, i) for i, m in enumerate(margins))

    def bucket_for(idxs: tuple) -> str:
        b = list(qb)
        for r in idxs:
            i = costs[r][1]
            b[i] = "0" if b[i] == "1" else "1"
        return "".join(b)

    heap: list[tuple[float, tuple]] = [(costs[0][0], (0,))]
    while heap and len(out) < n_probes:
        c, idxs = heapq.heappop(heap)
        out.append(bucket_for(idxs))
        last = idxs[-1]
        if last + 1 < len(costs):
            # standard lattice expansion: "shift" the last flip to the
            # next-costlier plane, or "expand" by adding it — together
            # these reach every perturbation set exactly once
            heapq.heappush(
                heap, (c - costs[last][0] + costs[last + 1][0], idxs[:-1] + (last + 1,))
            )
            heapq.heappush(heap, (c + costs[last + 1][0], idxs + (last + 1,)))
    return out


def _cosine_topk(cand: DataFrame, query_vec: list[float], k: int, exclude_vec_id):
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    return (
        cand.select(
            "vec_id",
            "label",
            _cos_query_expr("embedding", query_vec, qn).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    probe_bits: int = 2,
    exclude_vec_id: int | None = None,
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: multiprobe the query's LSH bucket and its
    neighbor buckets, computing buckets on the fly (one full pass). The
    SCALE path is the materialized layout
    (:func:`write_bucketed_embeddings` + :func:`lsh_bucketed_topk_layout`),
    where a probe reads only the probed buckets' partitions.

    ``n_probes`` set selects margin-RANKED multiprobe
    (:func:`probe_buckets_ranked`): exactly that many buckets, chosen
    by perturbation cost — the recall/latency knob. Unset keeps the
    blanket ``probe_bits`` Hamming ball."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    probe = (
        probe_buckets_ranked(query_vec, planes, n_probes)
        if n_probes is not None
        else probe_buckets(query_vec, planes, probe_bits)
    )
    bucketed = emb.withColumn("bucket", lsh_bucket_expr(F.col("embedding"), planes))
    cand = bucketed.filter(F.col("bucket").isin(*probe))
    return _cosine_topk(cand, query_vec, k, exclude_vec_id)


def cosine_lsh_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 3,
    seed: int = 13,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """(vec_a, vec_b, cos): embedding near-dup pairs at scale — the LSH
    candidate path for what :func:`cosine_pairs` verifies exhaustively.

    ``n_tables`` independent hyperplane sets each bucket every vector;
    candidate pairs share a bucket in >= 1 table (for cosine >= 0.95,
    per-table collision ~ (1 - arccos(0.95)/pi)^n_planes ~ 0.66, so 3
    tables give ~96% recall); candidates are deduped and verified with
    exact cosine, so precision is 1.0 by construction. ``max_bucket``
    drops degenerate buckets (e.g. zero-ish embeddings) before the
    self-join, same guard as dedup.minhash_lsh_pairs.
    """
    d = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("n", _norm(F.col("v")))

    tables = []
    dim = len(emb.select("embedding").head()["embedding"])
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        tables.append(
            d.select(
                "vec_id",
                F.lit(t).alias("table"),
                lsh_bucket_expr(F.col("v"), planes).alias("bucket"),
            )
        )
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionAll(t)
    bucketed = bucketed.persist()

    if max_bucket is not None:
        oversized = (
            bucketed.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("bucket_n"))
            .filter(F.col("bucket_n") > max_bucket)
        )
        bucketed = bucketed.join(
            F.broadcast(oversized.select("table", "bucket")),
            ["table", "bucket"],
            "left_anti",
        )

    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    with_vecs = cand.join(
        d.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na")),
        "vec_a",
    ).join(
        d.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb")),
        "vec_b",
    )
    return with_vecs.select(
        "vec_a",
        "vec_b",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
            "cos"
        ),
    ).filter(F.col("cos") >= threshold)


def _duck_bucket_expr(v_col: str, planes: list[list[float]]) -> str:
    """DuckDB expression mirroring :func:`lsh_bucket_expr`: the sign-of-
    projection bitstring against the given hyperplanes (folded in as
    double literals, exactly like the Spark plan folds them)."""
    cases = []
    for plane in planes:
        plist = "[" + ", ".join(repr(float(w)) for w in plane) + "]"
        cases.append(
            "(CASE WHEN list_sum(list_transform(list_zip("
            f"{v_col}, {plist}::DOUBLE[]), p -> p[1] * p[2])) >= 0 "
            "THEN '1' ELSE '0' END)"
        )
    return " || ".join(cases)


def lsh_topk_sql(
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    probe_bits: int = 2,
    exclude_vec_id: int = 0,
    seed: int = 13,
    n_probes: int | None = None,
) -> str:
    """Self-contained DuckDB oracle for :func:`lsh_bucketed_topk` AND
    :func:`lsh_bucketed_topk_layout` (the layout variant returns
    identical rows by construction — same deterministic hyperplanes,
    same probe set; only the storage access path differs). Hyperplanes
    and the multiprobe bucket set are deterministic md5-derived values
    computed here and folded into the SQL as literals. ``n_probes``
    mirrors the engine's margin-ranked multiprobe knob."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    probe = (
        probe_buckets_ranked(query_vec, planes, n_probes)
        if n_probes is not None
        else probe_buckets(query_vec, planes, probe_bits)
    )
    probe_list = ", ".join(f"'{b}'" for b in probe)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qlist = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
    return f"""
WITH q AS (SELECT {qlist}::DOUBLE[] AS qv),
d AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings
), b AS (
  SELECT vec_id, label, v, n, {_duck_bucket_expr("v", planes)} AS bucket FROM d
)
SELECT vec_id, label,
       round(list_sum(list_transform(list_zip(v, qv), p -> p[1] * p[2]))
             / (n * {qn!r}), 6) AS cos
FROM b, q
WHERE bucket IN ({probe_list}) AND vec_id <> {exclude_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def cosine_lsh_pairs_sql(
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 3,
    seed: int = 13,
    max_bucket: int | None = 10_000,
    dim: int = 64,
) -> str:
    """DuckDB oracle for :func:`cosine_lsh_pairs`: the same ``n_tables``
    hyperplane sets (literals), the same oversized-bucket drop, the
    same bucket-join candidate generation, dedup, and exact-cosine
    verification."""
    selects = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        selects.append(
            f"SELECT vec_id, {t} AS tbl, {_duck_bucket_expr('v', planes)} AS bucket FROM d"
        )
    bucketed = "\n  UNION ALL ".join(selects)
    cap = (
        f"HAVING count(*) <= {max_bucket}" if max_bucket is not None else ""
    )
    return f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS n
  FROM embeddings
), b AS (
  {bucketed}
), keepb AS (
  SELECT tbl, bucket FROM b GROUP BY tbl, bucket {cap}
), bk AS (
  SELECT b.vec_id, b.tbl, b.bucket FROM b JOIN keepb USING (tbl, bucket)
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM bk a JOIN bk c ON a.tbl = c.tbl AND a.bucket = c.bucket
                     AND a.vec_id < c.vec_id
)
SELECT * FROM (
  SELECT vec_a, vec_b,
         round(list_sum(list_transform(list_zip(da.v, db.v), p -> p[1] * p[2]))
               / (da.n * db.n), 6) AS cos
  FROM cand JOIN d da ON cand.vec_a = da.vec_id
            JOIN d db ON cand.vec_b = db.vec_id
) WHERE cos >= {threshold}
"""


# ---------------------------------------------------------------------------
# Materialized bucket-partitioned ANN layout: write once, probe many.
# ---------------------------------------------------------------------------

ANN_META = "_ANN_META.json"


def write_bucketed_embeddings(
    emb: DataFrame, out_dir: str, n_planes: int = 4, seed: int = 13
) -> dict:
    """Persist embeddings PARTITIONED BY their LSH bucket — the storage
    side the probe path assumes at scale. Each bucket becomes a
    parquet partition directory, so Catalyst partition-prunes a probe
    down to the probed buckets' files; every other bucket's data is
    never read. Raise ``n_planes`` as the corpus grows to keep the
    per-bucket partition size bounded (buckets halve per plane)."""
    import json
    import os

    dim = len(emb.select("embedding").head()["embedding"])
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.withColumn("bucket", lsh_bucket_expr(F.col("embedding"), planes))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
    meta = {"n_planes": n_planes, "seed": seed, "dim": dim}
    with open(os.path.join(out_dir, ANN_META), "w") as f:
        json.dump(meta, f)
    return meta


def lsh_bucketed_topk_layout(
    spark,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    probe_bits: int = 2,
    exclude_vec_id: int | None = None,
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k over a :func:`write_bucketed_embeddings`
    layout. The bucket filter is a PARTITION filter — only the probed
    bucket directories are scanned (plan-pinned in tests). ``n_probes``
    selects margin-ranked multiprobe exactly as in
    :func:`lsh_bucketed_topk` — still a partition filter, just a
    better-chosen directory set."""
    import json
    import os

    with open(os.path.join(out_dir, ANN_META)) as f:
        meta = json.load(f)
    planes = _hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    probe = (
        probe_buckets_ranked(query_vec, planes, n_probes)
        if n_probes is not None
        else probe_buckets(query_vec, planes, probe_bits)
    )
    cand = spark.read.parquet(out_dir).filter(F.col("bucket").isin(*probe))
    return _cosine_topk(cand, query_vec, k, exclude_vec_id)
