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
   P-row aggregate, broadcast-joined back).

The resulting rank equals the global sort rank regardless of partition
boundaries (AQE may coalesce adjacent range partitions — adjacent
ranges stay disjoint and ordered, so offsets still line up), so the
output is identical at any parallelism level (requires the order key
to be unique, which holds for urls and terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    # the offsets aggregate and the final join both consume `indexed`;
    # persist so the upstream sort/scan runs once
    indexed = indexed.persist()
    if persist_tracker is not None:
        persist_tracker.append(indexed)

    counts = indexed.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"), F.max("_local_idx").alias("_max_idx")
    )
    # Runtime invariant guarding the two Spark internals this rank
    # depends on (the 33-bit counter layout of
    # monotonically_increasing_id, and the optimizer never inlining the
    # multiply-referenced nondeterministic _mid): within every partition
    # the local counter must be exactly 0..cnt-1, i.e.
    # max(_local_idx) + 1 == cnt. A future Spark behavior change then
    # surfaces as a loud error instead of silently corrupted ids. The
    # assert is folded into _offset (null-> +0) so column pruning cannot
    # drop it; it costs one comparison per partition, not per row.
    _chk = F.assert_true(
        F.col("_cnt") == F.col("_max_idx") + 1,
        F.format_string(
            "monotonically_increasing_id contract violated in partition %s: "
            "count=%s but max local index=%s — global rank assignment "
            "(plans/ranks.py) is unsound on this Spark version",
            "_pid", "_cnt", "_max_idx",
        ),
    )
    # Unpartitioned window, intentionally: it runs over the per-partition
    # COUNTS (at most `num_partitions` rows ≈ spark.sql.shuffle.partitions,
    # not data rows), so the single-task window is bounded and benign —
    # the `WindowExec: No Partition Defined` warning it emits is expected.
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(F.sum("_cnt").over(w), F.lit(0))
        + F.coalesce(_chk.cast("long"), F.lit(0)),
    ).select("_pid", "_offset")

    return (
        indexed.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local_idx")).cast("long"))
        .drop("_pid", "_local_idx", "_offset")
    )
