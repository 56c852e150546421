"""Round-6 dedup-at-scale measurement: the full LSH near-dup pipeline
(and its composition into ``corpus_filter``) at 10M+ pieces.

Phases (fresh JVM per timed leg, like scale_run.py):

  python scripts/dedup_scale.py gen  <n_docs> <corpus_dir>
  python scripts/dedup_scale.py run  <corpus_dir> [cores]

``gen`` synthesizes a deterministic webtext corpus and plants
  - 1%   EXACT duplicates (verbatim copies of every 100th base doc),
  - 0.5% NEAR duplicates (every 200th base doc with every 37th token
    replaced — ~3 tokens of ~120, shingle-Jaccard ~0.85, the regime
    LSH exists for),
with planted doc_ids >= n_docs so ground truth is an id-range check.
The corpus is materialized to parquet first so the operators — not the
generator — are what the ``run`` phase times.

``run`` times, min-of-1 (each stage is minutes-scale; the noise floor
that forces min-of-2 on sub-second legs is irrelevant here):
  1. exact_dedup            -> planted-exact found / false positives
  2. minhash_signatures     -> the round-6 kernel number (1 sha256 per
                               shingle, h hex lanes — vs round 5's 8
                               independent md5s that blocked this run)
  3. minhash_lsh_pairs      -> planted-near recall at the pair level
  4. duplicate_clusters     -> cluster closure over the pair graph
  5. corpus_filter          -> the composed training-data pipeline
                               (quality + lang + exact + near in one
                               relational plan), survivor counts
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SCRATCH = "/dev/shm/srs_scratch_dedup"

CONF = {
    "spark.local.dir": SCRATCH,
    "spark.task.maxFailures": "4",
    "spark.io.compression.codec": "zstd",
    "spark.cleaner.periodicGC.interval": "5min",
}

EXACT_EVERY = 100   # 1% planted exact dups
NEAR_EVERY = 200    # 0.5% planted near dups
MUT_EVERY = 37      # replace every 37th token in a near dup


def main() -> None:
    phase = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "40g")
    os.makedirs(SCRATCH, exist_ok=True)

    from search_rs_spark.session import get_spark

    if phase == "gen":
        n_docs, out = int(sys.argv[2]), sys.argv[3]
        from search_rs_spark.sources.webtext import synthesize_webtext

        spark = get_spark(cores=32, shuffle_partitions=32, extra_conf=CONF)
        t0 = time.time()
        raw = synthesize_webtext(
            spark, n_docs, seed=42, vocab_size=20000, mean_len=120,
            partitions=max(64, n_docs // 160_000),
        )
        base = raw.filter(F.col("text").isNotNull()).select(
            F.regexp_extract("url", r"/(\d{12})\.html$", 1).cast("long").alias("doc_id"),
            "text",
        )
        # materialize base FIRST, then plant from the parquet: planting
        # via union on the synth DataFrame would re-run the generator
        # once per branch (3 full passes). Base and planted rows live
        # in SEPARATE subdirs: appending planted rows to the same path
        # they are read from (the round-6 shape) risks a partially
        # planted corpus on mid-write failure or an AQE re-list
        # double-reading fresh files (ADVICE round 6).
        base.write.mode("overwrite").parquet(f"{out}/base")
        based = spark.read.parquet(f"{out}/base")
        exact = based.filter(F.col("doc_id") % EXACT_EVERY == 0).select(
            (F.lit(n_docs) + F.col("doc_id") / EXACT_EVERY).cast("long").alias("doc_id"),
            "text",
        )
        near = based.filter(F.col("doc_id") % NEAR_EVERY == 1).select(
            (F.lit(n_docs + n_docs // EXACT_EVERY + 1)
             + (F.col("doc_id") - 1) / NEAR_EVERY).cast("long").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda t, i: F.when(i % MUT_EVERY == 5, F.lit("plantednear")).otherwise(t),
                ),
            ).alias("text"),
        )
        exact.unionAll(near).write.mode("overwrite").parquet(f"{out}/planted")
        n = spark.read.parquet(f"{out}/base", f"{out}/planted").count()
        print(json.dumps({
            "phase": "gen", "n_base_requested": n_docs, "rows_written": n,
            "sec": round(time.time() - t0, 1),
        }))

    elif phase == "run":
        corpus_dir = sys.argv[2]
        cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        from search_rs_spark.operators import dedup
        from search_rs_spark.operators.corpus_filter import corpus_filter

        spark = get_spark(cores=cores, shuffle_partitions=64, extra_conf=CONF)
        # corpora from the split gen phase hold base/ + planted/ subdirs;
        # older flat corpora read as before
        if os.path.isdir(os.path.join(corpus_dir, "base")):
            docs = spark.read.parquet(
                os.path.join(corpus_dir, "base"), os.path.join(corpus_dir, "planted")
            )
        else:
            docs = spark.read.parquet(corpus_dir)
        n_total = docs.count()
        res = {"n_total": n_total, "cores": cores}
        # planted ground truth by id range: base ids < n_base (the
        # n_docs passed to gen), planted ids >= n_base
        n_base = int(sys.argv[4]) if len(sys.argv) > 4 else int(
            os.environ.get("DEDUP_N_BASE", "0"))
        if not n_base:
            raise SystemExit("pass n_base or set DEDUP_N_BASE=<n_docs passed to gen>")
        exact_lo = n_base
        near_lo = n_base + n_base // EXACT_EVERY + 1

        t0 = time.time()
        ed = dedup.exact_dedup(docs).filter("is_duplicate").select("doc_id")
        ed_ids = ed.persist()
        n_exact_found = ed_ids.count()
        def _stage(name, d):
            res[name] = d
            print(json.dumps({name: d}), flush=True)

        _stage("exact_dedup", {
            "sec": round(time.time() - t0, 1),
            "dups_found": n_exact_found,
            "planted_exact_found": ed_ids.filter(
                (F.col("doc_id") >= exact_lo) & (F.col("doc_id") < near_lo)).count(),
            "near_false_positives": ed_ids.filter(F.col("doc_id") >= near_lo).count(),
        })
        ed_ids.unpersist()

        t0 = time.time()
        n_sigs = dedup.minhash_signatures(docs).count()
        _stage("minhash_signatures", {"sec": round(time.time() - t0, 1), "rows": n_sigs})

        t0 = time.time()
        upstream: list = []
        pairs = dedup.minhash_lsh_pairs(docs, persist_tracker=upstream).persist()
        n_pairs = pairs.count()
        for h_ in upstream:
            h_.unpersist(blocking=False)
        dt_pairs = time.time() - t0
        # planted-near pair recall: (src, planted) with src = (p-near_lo)*200+1
        near_hits = pairs.filter(
            (F.col("doc_b") >= near_lo)
            & (F.col("doc_a") == (F.col("doc_b") - near_lo) * NEAR_EVERY + 1)
        ).count()
        n_near_planted = docs.filter(F.col("doc_id") >= near_lo).count()
        _stage("lsh_pairs", {
            "sec": round(dt_pairs, 1), "pairs": n_pairs,
            "planted_near_recall": round(near_hits / max(1, n_near_planted), 4),
            "planted_near_total": n_near_planted,
        })
        pairs.unpersist()

        t0 = time.time()
        cl = dedup.duplicate_clusters(docs).persist()
        n_dup = cl.filter("is_duplicate").count()
        _stage("duplicate_clusters", {
            "sec": round(time.time() - t0, 1),
            "marked_duplicate": n_dup,
            "survivors": n_total - n_dup,
        })
        cl.unpersist()

        t0 = time.time()
        cf = corpus_filter(docs).persist()
        n_keep = cf.filter("keep").count()
        reasons = {
            r["reason"]: r["n"]
            for r in cf.filter(~F.col("keep"))
            .select(F.explode(F.split("reasons", ",")).alias("reason"))
            .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        _stage("corpus_filter_pipeline", {
            "sec": round(time.time() - t0, 1),
            "kept": n_keep, "dropped": n_total - n_keep, "drop_reasons": reasons,
        })
        cf.unpersist()
        print(json.dumps(res))

    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
