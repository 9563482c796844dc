"""TRUE hardware-scaling curve of the parse kernel.

tools/parse_scaling_probe.py spawns fresh processes that each pay
interpreter start + imports before parsing a few hundred feeds — at
that sample size the measured "throughput" is import-dominated and its
N->4N ratio reflects process-spawn scaling, not parse scaling.  This
probe removes every such artifact:

  * real corpus htmls (a sample read from the bench parquet), in memory
  * workers are forked AFTER imports and after the sample is loaded
    (copy-on-write: zero import/IO cost inside the timed region)
  * each worker parses its slice repeatedly until a time floor, so the
    per-proc sample is seconds of pure kernel work
  * a barrier start so all K workers run concurrently

Prints one JSON line: {"per_proc": {K: feeds_per_sec_total}, ...}

Usage: python tools/parse_kernel_probe.py <corpus_pages_dir> [Ks...]
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.dataset as ds

from podcast_crawler_spark.feedparse.rssparse import parse_feed_result

SAMPLE = 6000
MIN_SECONDS = 6.0


def load_sample(path):
    d = ds.dataset(path, format="parquet")
    tbl = d.head(SAMPLE, columns=["url", "html"])
    urls = tbl.column("url").to_pylist()
    htmls = [bytes(h) for h in tbl.column("html").to_pylist()]
    return urls, htmls


def worker(urls, htmls, start_evt, out_q):
    start_evt.wait()
    n = len(urls)
    t0 = time.time()
    done = 0
    while time.time() - t0 < MIN_SECONDS:
        for i in range(n):
            parse_feed_result(htmls[i], urls[i])
        done += n
    out_q.put((done, time.time() - t0))


def run_k(k, urls, htmls):
    """K concurrent workers, parent affinity pinned to cores 0..k-1 before
    the fork (inherited) so the K-proc leg sees exactly K cores — the
    same discipline as the taskset-pinned bench legs."""
    prev = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, set(range(k)))
    except OSError:
        prev = None
    ctx = mp.get_context("fork")
    start = ctx.Event()
    q = ctx.Queue()
    procs = [
        ctx.Process(target=worker, args=(urls, htmls, start, q))
        for _ in range(k)
    ]
    for p in procs:
        p.start()
    time.sleep(0.5)  # let every fork reach the barrier
    start.set()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    if prev is not None:
        os.sched_setaffinity(0, prev)
    return round(sum(d / t for d, t in res), 1)


def main():
    corpus = sys.argv[1]
    ks = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8, 16, 32]
    urls, htmls = load_sample(corpus)
    # warm the kernel once in the parent (JIT-free python, but warms
    # any lazy module state) before forking
    for i in range(min(200, len(urls))):
        parse_feed_result(htmls[i], urls[i])
    # two alternating passes per K, keep the max: a ceiling wants the
    # best the hardware showed, and alternation means a transient noisy
    # minute cannot depress one K's both samples while inflating the
    # other's (the failure mode of a single end-of-window probe)
    out = {}
    for _ in range(2):
        for k in ks:
            v = run_k(k, urls, htmls)
            if v > out.get(str(k), 0):
                out[str(k)] = v
    per_proc = {k: round(v / int(k), 1) for k, v in out.items()}
    print(
        json.dumps(
            {
                "total_fps": out,
                "per_proc_fps": per_proc,
                "sample": len(urls),
                "min_seconds": MIN_SECONDS,
            }
        )
    )


if __name__ == "__main__":
    main()
