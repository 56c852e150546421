"""Scalable deterministic global ranking (dense 0-based ids).

The reference assigns doc_ids by a single-process sorted directory walk
(/root/reference/search/src/engine/builder.rs:66,112) and term_ids by a
BTreeMap's sorted order (builder.rs:117-123). The Spark equivalent must
NOT be a global single-partition ``row_number() OVER (ORDER BY x)`` —
that serializes the whole table through one task at scale. Instead:

1. ``repartitionByRange`` on the order key (disjoint sorted ranges),
2. a narrow per-partition index via ``monotonically_increasing_id``
   (which by contract packs the partition id into the upper bits and a
   per-partition record counter into the lower 33 — evaluated over the
   in-partition-sorted stream, so the counter IS the local sort index;
   pure JVM, no Python workers, no Arrow round-trip of the payload),
3. per-partition offsets = prefix sums of partition counts (a tiny
   P-row aggregate collected to the driver and folded back in as one
   constant-array literal — no window, no broadcast join).

The resulting rank equals the global sort rank regardless of partition
boundaries (AQE may coalesce adjacent range partitions — adjacent
ranges stay disjoint and ordered, so offsets still line up), so the
output is identical at any parallelism level (requires the order key
to be unique, which holds for urls and terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: record counter width


def with_global_rank(
    df: DataFrame,
    order_col: str,
    rank_col: str,
    num_partitions: int | None = None,
    persist_tracker: list | None = None,
) -> DataFrame:
    """Add a dense 0-based global rank by ``order_col`` (must be unique).

    ``persist_tracker``: the ranked intermediate is persisted because
    two consumers (the offsets aggregate and the final join) share it —
    and because ``monotonically_increasing_id`` must be computed exactly
    once (recomputation under a different partition layout would be
    nondeterministic). Callers that materialize the result exactly once
    (e.g. a checkpoint write) should pass a list and ``unpersist()`` its
    entries afterwards so the cache doesn't outlive the stage."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parted = df.repartitionByRange(num_partitions, F.col(order_col)).sortWithinPartitions(
        order_col
    )

    # one nondeterministic expression instance, decomposed afterwards
    # (CollapseProject never inlines a multiply-referenced
    # nondeterministic column, so _mid is evaluated exactly once, over
    # the sorted stream)
    indexed = (
        parted.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright(F.col("_mid"), _LOCAL_BITS).cast("int"))
        .withColumn(
            "_local_idx", F.col("_mid").bitwiseAND(F.lit((1 << _LOCAL_BITS) - 1))
        )
        .drop("_mid")
    )
    # the counts aggregate and the final pass both consume `indexed`;
    # persist so the upstream sort/scan runs once
    indexed = indexed.persist()
    if persist_tracker is not None:
        persist_tracker.append(indexed)

    # Per-partition counts COLLECTED to the driver (one slim P-row job —
    # the same bytes the broadcast-join form shipped anyway, since the
    # offsets relation was built driver-side for the broadcast), then
    # folded back in as ONE array literal: `element_at` on a constant
    # array is O(1) per row, and the plan loses the single-task window,
    # the broadcast exchange, and the join operator the previous form
    # carried (guide §2.4 — remove exchanges outright; at any scale the
    # offsets table is exactly num_partitions rows, so the literal stays
    # kilobytes up to tens of thousands of partitions).
    counts = indexed.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"), F.max("_local_idx").alias("_max_idx")
    ).collect()
    # Runtime invariant guarding the two Spark internals this rank
    # depends on (the 33-bit counter layout of
    # monotonically_increasing_id, and the optimizer never inlining the
    # multiply-referenced nondeterministic _mid): within every partition
    # the local counter must be exactly 0..cnt-1, i.e.
    # max(_local_idx) + 1 == cnt. A future Spark behavior change then
    # surfaces as a loud error instead of silently corrupted ids.
    for r in counts:
        if int(r["_cnt"]) != int(r["_max_idx"]) + 1:
            raise RuntimeError(
                f"monotonically_increasing_id contract violated in partition "
                f"{r['_pid']}: count={r['_cnt']} but max local index="
                f"{r['_max_idx']} — global rank assignment (plans/ranks.py) "
                f"is unsound on this Spark version"
            )
    by_pid = {int(r["_pid"]): int(r["_cnt"]) for r in counts}
    offsets: list[int] = []
    acc = 0
    for p in range(max(by_pid, default=-1) + 1):
        offsets.append(acc)
        acc += by_pid.get(p, 0)
    if offsets:
        off_expr = F.expr(
            "element_at(array("
            + ",".join(f"{v}L" for v in offsets)
            + "), _pid + 1)"
        )
    else:  # empty input: no rows evaluate the expression
        off_expr = F.lit(0)
    return indexed.withColumn(
        rank_col, (off_expr + F.col("_local_idx")).cast("long")
    ).drop("_pid", "_local_idx")
