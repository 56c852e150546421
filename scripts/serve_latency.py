"""DiskEngine vs LocalEngine at 1M docs: per-query latency and resident
memory, plus result identity on the measured queries.

  python scripts/serve_latency.py <index_dir> [reps]

Prints one JSON line. Memory is RSS delta around load (ru_maxrss is a
high-water mark, so load order matters: the engine under test loads in
a fresh interpreter when run standalone — DiskEngine first, then
LocalEngine, so LocalEngine's corpus-sized load cannot be attributed
to DiskEngine).
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("selective", "merge sort window"),
    ("head2", "the time"),
    ("spellfix", "wrld lyfe"),
]


def rss_mb() -> float:
    """CURRENT resident set (MB) from /proc/self/statm — not the
    ru_maxrss high-water mark, which only ever grows: with both engines
    loaded in one process the high-water delta for the second engine
    was deflated by the first engine's transient peak (ADVICE round 6).
    Falls back to ru_maxrss where /proc is unavailable."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * (resource.getpagesize() / 1024.0) / 1024.0
    except (OSError, ValueError, IndexError):
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def bench(engine, reps: int):
    out = {}
    engine.free_query("warm up", 10)  # file handles + footers
    for name, q in QUERIES:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = engine.free_query(q, k=10)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = {"ms": round(best * 1000.0, 2), "rows": len(rows)}
    return out


def main() -> None:
    idx = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from search_rs_spark.operators.serving import LocalEngine
    from search_rs_spark.operators.serving_disk import DiskEngine

    res = {"index": idx, "reps": reps}

    r0 = rss_mb()
    t0 = time.time()
    disk = DiskEngine.load(idx)
    res["disk"] = {
        "load_sec": round(time.time() - t0, 2),
        "load_rss_mb": round(rss_mb() - r0, 1),
        "queries": bench(disk, reps),
    }

    r1 = rss_mb()
    t0 = time.time()
    local = LocalEngine.load(idx)
    res["local"] = {
        "load_sec": round(time.time() - t0, 2),
        "load_rss_mb": round(rss_mb() - r1, 1),
        "queries": bench(local, reps),
    }

    res["identical"] = all(
        [(d, round(s, 9)) for d, _, s in disk.free_query(q, 100)]
        == [(d, round(s, 9)) for d, _, s in local.free_query(q, 100)]
        for _, q in QUERIES
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
