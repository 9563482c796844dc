"""Hardware-calibration probe for the scaling bench: run the *actual*
parse workload (feedparse on real synthetic feed bytes) under plain
``multiprocessing`` — no Spark, no shuffle, no I/O — at N and 4N worker
processes over the same inputs.

Why this exists: the north rule asks for throughput scaling efficiency
>= 0.8 from N to 4N parallelism.  On a real cluster, N -> 4N means 4x
the *machines*; in this sandbox it means 4x the processes on ONE shared
32-vCPU guest, where per-core memory bandwidth and (host-side) SMT/tenant
contention shrink as occupancy grows.  No engine can scale better than
this probe: it is the epoch's dominant stage (the Arrow-batched parse)
stripped of every engine mechanism, so its N->4N ratio is the machine's
ceiling for the workload — the right denominator when judging the
engine's own efficiency.  (A pure-int burn loop is NOT representative:
it lives in registers/L1, scales ~linearly, and overstates the ceiling.)

Usage: python tools/parse_scaling_probe.py [n_feeds_per_proc] [N] [4N]
Prints one JSON line {"tp_n":..., "tp_4n":..., "ceiling":...}.

SUPERSEDED (round 4) by ``parse_kernel_probe.py``: this probe spawns a
fresh interpreter per worker and parses only a few hundred feeds per
process, so process spawn + imports (~1.5 s, scales ~perfectly with
procs) dominate the measured time and the reported ceiling is inflated
(0.94 here vs the true kernel's 0.68 at 8→32).  The v2 probe forks
AFTER imports, parses real corpus htmls from memory under a time floor,
and affinity-pins each leg.  Kept for the historical record of windows
≤ w23, which used it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# Deterministic feed corpus, generated once in the parent and inherited by
# fork — identical bytes at both parallelism levels.


def _make_feeds(n: int) -> list:
    from podcast_crawler_spark.sources.pagesgen import feed_xml

    return [feed_xml(i).encode("utf-8") for i in range(n)]


def _parse_chunk(args) -> int:
    feeds, reps = args
    from podcast_crawler_spark.feedparse.rssparse import parse_feed_result

    n = 0
    for _ in range(reps):
        for i, b in enumerate(feeds):
            parse_feed_result(b, f"https://probe.example/feed{i}.xml")
            n += 1
    return n


def measure(procs: int, feeds: list, reps: int) -> float:
    # pin to `procs` specific cores: an unpinned N-proc run floats across
    # all vCPUs, borrowing the whole chip's cache/turbo — not what an
    # N-core node gets (pool workers inherit the affinity at fork)
    if hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, range(procs))
    try:
        with mp.Pool(procs) as pool:
            t0 = time.time()
            done = sum(pool.map(_parse_chunk, [(feeds, reps)] * procs))
            return done / (time.time() - t0)
    finally:
        if hasattr(os, "sched_setaffinity"):
            os.sched_setaffinity(0, range(os.cpu_count() or 32))


def main() -> None:
    per_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    four_n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(os.environ.get("PROBE_REPS", "3"))
    feeds = _make_feeds(per_proc)
    # warm caches / fork pages once
    measure(2, feeds[:50], 1)
    # interleave the two levels and take best-of-k at each: this box is
    # shared, so alternating N / 4N samples sees the same noise regime
    best_n, best_4n = 0.0, 0.0
    for _ in range(int(os.environ.get("PROBE_ROUNDS", "2"))):
        best_n = max(best_n, measure(n, feeds, reps))
        best_4n = max(best_4n, measure(four_n, feeds, reps))
    out = {
        "workload": "feedparse.parse_feed_result (the epoch's parse stage)",
        "feeds_per_proc": per_proc * reps,
        "n_procs": n,
        "four_n_procs": four_n,
        "tp_n": round(best_n, 1),
        "tp_4n": round(best_4n, 1),
        "ceiling": round(best_4n / (4 * best_n), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
