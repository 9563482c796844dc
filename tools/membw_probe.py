"""Memory-BANDWIDTH scaling ceiling of this box — the second machine
ceiling the epoch is subject to.

``parse_kernel_probe.py`` measures the COMPUTE ceiling (the python
parse kernel, ~0.85-0.93 at 8→32 on this box).  But an epoch is parse
PLUS data movement — exchange write/read, politeness-window sort,
scratch persist, Arrow batches, parquet encode — and those phases are
bulk byte copies, not compute.  This probe measures how aggregate COPY
bandwidth scales with pinned process count: each worker repeatedly
memcpy's a buffer far larger than L3 (so every pass goes to DRAM),
fork-after-alloc, barrier start, time floor.

If aggregate GB/s is ~flat from 8 to 32 procs, bandwidth saturates
below 8 cores — and every byte-moving epoch phase is then expected to
scale 8→32 at E ≈ 1/4 NO MATTER what the engine does, while the parse
phase scales at the compute ceiling.  The blended epoch E follows from
the phase mix; on a real N→4N executor scale-out both ceilings are ~1
(per-executor bandwidth constant).

Usage: python tools/membw_probe.py [Ks...]   (default 1 2 8 32)
Prints one JSON line {"gbps": {K: total_GB_per_s}, ...}.
"""

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = 256
MIN_SECONDS = 4.0


def worker(start_evt, out_q):
    src = bytearray(os.urandom(BUF_MB * 1024 * 1024))
    dst = bytearray(len(src))
    mv_src, mv_dst = memoryview(src), memoryview(dst)
    start_evt.wait()
    t0 = time.time()
    passes = 0
    while time.time() - t0 < MIN_SECONDS:
        mv_dst[:] = mv_src  # one full DRAM read + write
        passes += 1
    dt = time.time() - t0
    out_q.put((passes * BUF_MB / 1024.0, dt))  # GB copied, seconds


def run_k(k):
    prev = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, set(range(k)))
    except OSError:
        prev = None
    ctx = mp.get_context("fork")
    start = ctx.Event()
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(start, q)) for _ in range(k)]
    for p in procs:
        p.start()
    time.sleep(1.0)  # allocations + urandom fill happen pre-barrier
    start.set()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    if prev is not None:
        os.sched_setaffinity(0, prev)
    return round(sum(gb / dt for gb, dt in res), 2)


def main():
    ks = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    for _ in range(2):  # alternate, keep max (kernel-probe discipline)
        for k in ks:
            v = run_k(k)
            if v > out.get(str(k), 0):
                out[str(k)] = v
    ratios = {}
    if "8" in out and "32" in out:
        ratios["8->32"] = round(out["32"] / (4 * out["8"]), 3)
    if "2" in out and "8" in out:
        ratios["2->8"] = round(out["8"] / (4 * out["2"]), 3)
    print(
        json.dumps(
            {
                "gbps": out,
                "scaling": ratios,
                "buf_mb": BUF_MB,
                "min_seconds": MIN_SECONDS,
            }
        )
    )


if __name__ == "__main__":
    main()
