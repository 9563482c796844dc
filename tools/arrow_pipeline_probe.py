"""Pipeline-equivalent kernel probe: parse + the PYTHON side of the
Arrow data movement a Spark mapInPandas stage performs per batch.

``parse_kernel_probe.py`` measures the bare parse kernel (htmls already
in memory, results dropped) — the best case the machine can deliver.
The ENGINE's parse stage moves every html through
JVM→Arrow-IPC→python and every result through python→Arrow-IPC→JVM,
i.e. several additional full-data memory passes per feed.  Under full
box occupancy those passes compete for the same memory bandwidth as
the kernel itself, so the engine is expected to hit the bandwidth wall
at LOWER core counts than the bare kernel — this probe quantifies that
by adding exactly the python-side halves of the movement to the
kernel loop:

  * deserialize the input batch from Arrow IPC bytes (what the python
    worker does with the JVM's stream),
  * parse every feed,
  * build output arrays and serialize them to Arrow IPC bytes (what
    the worker sends back).

The JVM-side halves (serialize input / deserialize output / shuffle or
scratch write) are NOT emulated, so the measured ceiling is an UPPER
bound on what any Arrow-batched python stage could scale to on this
box.  Same discipline as the kernel probe: fork-after-import, barrier
start, affinity-pinned, time floor, two alternating passes keeping the
max.

Usage: python tools/arrow_pipeline_probe.py <corpus_pages_dir> [Ks...]
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.dataset as ds

from podcast_crawler_spark.feedparse.rssparse import parse_feed_result

SAMPLE = 6000
MIN_SECONDS = 6.0
BATCH = 2048  # pandas-UDF batch granularity (spark default 10k rows,
# smaller here so one sample is several batches like a real task)


def load_ipc_batches(path):
    d = ds.dataset(path, format="parquet")
    tbl = d.head(SAMPLE, columns=["url", "html"])
    bufs = []
    for b in tbl.to_batches(max_chunksize=BATCH):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, b.schema) as w:
            w.write_batch(b)
        bufs.append(sink.getvalue())
    return bufs, tbl.num_rows


def worker(bufs, start_evt, out_q):
    start_evt.wait()
    t0 = time.time()
    done = 0
    while time.time() - t0 < MIN_SECONDS:
        for buf in bufs:
            # python-side half 1: deserialize the JVM's stream
            with pa.ipc.open_stream(buf) as r:
                batch = r.read_next_batch()
            urls = batch.column("url").to_pylist()
            htmls = [
                None if h is None else h.as_py()
                for h in batch.column("html")
            ]
            titles, n_eps, errs = [], [], []
            for u, h in zip(urls, htmls):
                res = parse_feed_result(h or b"", u)
                pod = res.get("podcast") or {}
                eps = res.get("episodes") or []
                titles.append(pod.get("title"))
                n_eps.append(len(eps))
                errs.append(res.get("error_kind"))
            out = pa.record_batch(
                [
                    pa.array(urls, pa.string()),
                    pa.array(titles, pa.string()),
                    pa.array(n_eps, pa.int64()),
                    pa.array(errs, pa.string()),
                    # the dominant OUTPUT volume of the real stage is the
                    # episodes array + passthrough columns; re-emitting
                    # the html stands in for output bytes ≈ input bytes
                    batch.column("html"),
                ],
                names=["url", "title", "n_episodes", "err", "payload"],
            )
            # python-side half 2: serialize the reply stream
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, out.schema) as w:
                w.write_batch(out)
            sink.getvalue()
            done += batch.num_rows
    out_q.put((done, time.time() - t0))


def run_k(k, bufs):
    prev = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, set(range(k)))
    except OSError:
        prev = None
    ctx = mp.get_context("fork")
    start = ctx.Event()
    q = ctx.Queue()
    procs = [
        ctx.Process(target=worker, args=(bufs, start, q)) for _ in range(k)
    ]
    for p in procs:
        p.start()
    time.sleep(0.5)
    start.set()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    if prev is not None:
        os.sched_setaffinity(0, prev)
    return round(sum(d / t for d, t in res), 1)


def main():
    corpus = sys.argv[1]
    ks = [int(x) for x in sys.argv[2:]] or [8, 32]
    bufs, n = load_ipc_batches(corpus)
    out = {}
    for _ in range(2):
        for k in ks:
            v = run_k(k, bufs)
            if v > out.get(str(k), 0):
                out[str(k)] = v
    print(
        json.dumps(
            {
                "total_fps": out,
                "per_proc_fps": {
                    k: round(v / int(k), 1) for k, v in out.items()
                },
                "sample": n,
                "batch_rows": BATCH,
                "min_seconds": MIN_SECONDS,
                "note": "kernel + python-side Arrow IPC halves only; "
                "JVM halves not emulated (upper bound)",
            }
        )
    )


if __name__ == "__main__":
    main()
