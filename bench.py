"""Benchmark harness: index build + headline queries at one scale factor.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

``--scaling`` mode runs the build twice in fresh subprocesses at
local[8] and local[32] on the same input and reports the throughput
scaling efficiency (the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(sf_dir: str, cpus: int) -> dict:
    from search_rs_spark.operators import dedup, similarity
    from search_rs_spark.operators.bm25 import free_query
    from search_rs_spark.operators.boolean import boolean_query
    from search_rs_spark.plans.build import build_index
    from search_rs_spark.plans.index import SearchIndex
    from search_rs_spark.session import get_spark
    from search_rs_spark.sources.webtext import webtext_from_documents

    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 8), app="bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    out = tempfile.mkdtemp(prefix="srs_bench_idx_")
    queries: dict[str, float] = {}

    t0 = time.time()
    build_index(
        spark,
        webtext_from_documents(spark, sf_dir),
        out,
        min_f=0,
        max_p=1.0,
        resume=False,
        corpus_fingerprint=f"bench:{sf_dir}",
    )
    queries["build"] = round(time.time() - t0, 3)

    idx = SearchIndex.load(spark, out)
    # warm the driver vocabulary (spellcheck structures), as load_index does
    t0 = time.time()
    idx.driver_vocab()
    queries["load_vocab"] = round(time.time() - t0, 3)

    for i, q in enumerate(
        ["spark data query", "the fast merge sort window", "stream batch customer value row"]
    ):
        t0 = time.time()
        free_query(idx, q, k=100).collect()
        queries[f"free_q{i + 1}"] = round(time.time() - t0, 3)

    t0 = time.time()
    boolean_query(idx, "data AND query AND NOT join").collect()
    queries["boolean_q1"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.minhash_lsh_pairs(docs).collect()
    queries["dedup_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.exact_dedup(docs).count()
    queries["dedup_exact"] = round(time.time() - t0, 3)

    emb_path = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(emb_path):
        import duckdb

        qv = [
            float(x)
            for x in duckdb.sql(
                f"SELECT embedding FROM '{emb_path}' WHERE vec_id = 0"
            ).fetchone()[0]
        ]
        emb = spark.read.parquet(emb_path)
        t0 = time.time()
        similarity.cosine_topk_bruteforce(emb, qv, 10, 0).collect()
        queries["ann_brute"] = round(time.time() - t0, 3)

    shutil.rmtree(out, ignore_errors=True)
    total = round(sum(queries.values()), 3)
    return {
        "metric": "index_build_plus_query_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(sf_dir),
        "n_docs": n_docs,
        "cpus": cpus,
        "build_docs_per_sec": round(n_docs / queries["build"], 1),
    }


def run_scaling(sf_dir: str) -> dict:
    """Same index build at local[8] vs local[32] over the same
    materialized corpus; throughput scaling efficiency = (T8/T32)/4.

    The driver testdata at sf<=0.1 is too small for parallel scaling to
    be observable (fixed JVM/stage overhead dominates), so the scaling
    corpus is a larger deterministic synthetic webtext table
    (SPARK_GRAFT_SCALE_DOCS docs, default 60k), generated once and read
    by both runs — the sandbox stand-in for N vs 4N executors."""
    import subprocess

    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "60000"))
    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"srs_scaling_corpus_{n_docs}"
    )
    repo = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from search_rs_spark.session import get_spark; "
            "from search_rs_spark.sources.webtext import synthesize_webtext; "
            "spark = get_spark(cores=32, shuffle_partitions=32); "
            "synthesize_webtext(spark, %d, seed=42, vocab_size=20000, "
            "mean_len=120, partitions=64).write.mode('overwrite').parquet(%r)"
            % (repo, n_docs, corpus_dir)
        )
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800,
                       capture_output=True, text=True)

    pair = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_CORES", "8,32").split(",")
    ]
    n_lo, n_hi = pair[0], pair[1]
    times = {}
    for cores in (n_lo, n_hi):
        # one untimed warmup build per JVM (first-heavy-job heap growth /
        # JIT costs ~1 min regardless of core count and would drown the
        # scaling signal), then the measured steady-state build
        code = (
            "import sys, time, tempfile, shutil; sys.path.insert(0, %r); "
            "from search_rs_spark.session import get_spark; "
            "from search_rs_spark.plans.build import build_index; "
            "spark = get_spark(cores=%d, shuffle_partitions=%d); "
            "corpus = spark.read.parquet(%r); "
            "out = tempfile.mkdtemp(); "
            "build_index(spark, corpus, out, resume=False, "
            "corpus_fingerprint='warmup'); shutil.rmtree(out); "
            "best = None\n"
            "for rep in range(2):\n"
            "    out = tempfile.mkdtemp(); t0 = time.time()\n"
            "    build_index(spark, corpus, out, resume=False, "
            "corpus_fingerprint='scaling%%d' %% rep)\n"
            "    dt = time.time() - t0; shutil.rmtree(out)\n"
            "    best = dt if best is None or dt < best else best\n"
            "print('ELAPSED', best)"
            % (repo, cores, cores, corpus_dir)
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
        )
        for line in r.stdout.splitlines():
            if line.startswith("ELAPSED"):
                times[cores] = float(line.split()[1])
    ratio = n_hi / n_lo
    eff = (
        (times[n_lo] / times[n_hi]) / ratio
        if n_hi in times and n_lo in times
        else None
    )
    return {
        "metric": f"build_scaling_efficiency_{n_lo}_to_{n_hi}",
        "value": round(eff, 4) if eff else None,
        "unit": "ratio",
        "queries": {f"build_local{c}_sec": round(t, 2) for c, t in times.items()},
        "sf": _sf_label(sf_dir),
        "scale_docs": n_docs,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
