"""S2 production fetch stage: a per-host-partition live fetcher.

The sandbox "fetch" is a join against the pages table
(``operators/frontier.fetch_join``) because this environment has no
network.  In production the same slot is filled by THIS operator: the
scheduled slice groups by ``host_hash`` and an ``applyInPandas`` task
fetches each host's URLs **sequentially in host_seq order** — one
connection per host, the politeness contract the scheduler already
planned (``planned_fetch_ts`` spacing).  This mirrors the reference's
worker loop: one task at a time per worker, 5 s timeout, UA
``PodcastCrawler/1.0`` (``/root/reference/src/crawler_refactor/
rss_fetcher.rs:15-98``; UA at ``rss_fetcher.rs:20``, timeout at
``rss_fetcher.rs:88``).

The transport is injected (``transport(url, timeout_s, user_agent) ->
bytes | None``) so the operator is unit-testable against a fake; the
stdlib ``urllib_transport`` below is the real default for deployments.
Any transport exception maps to a fetch failure (``html = null``) which
feeds the standard retry/backoff path (R1/R2) — the fetcher itself never
retries, exactly like the refactor's ``max_retries=0`` workers
(``distributor.rs:99``) that delegate retry to the timer queue.

Scale notes: one Spark task = one host group = one polite connection;
hot hosts are bounded by the politeness budget upstream (W5), so no
group exceeds ``per_host_budget`` rows and the stage parallelism is
``min(#hosts, cores)``.  The html payload is born inside the task and
flows map-side into the parse stage — it never crosses an exchange.
"""

from __future__ import annotations

import time
from datetime import datetime
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    StructField,
    StructType,
    TimestampType,
)

from .frontier import USER_AGENT

Transport = Callable[[str, float, str], Optional[bytes]]


def urllib_transport(url: str, timeout_s: float, user_agent: str) -> Optional[bytes]:
    """Stdlib HTTP transport: GET with the politeness UA and the
    reference's 5 s timeout semantics.  Non-200 → None (fetch failure)."""
    from urllib.parse import urlparse
    from urllib.request import Request, urlopen

    # scheme allowlist: the frontier admits *discovered* URLs, so a hostile
    # file:// or ftp:// link must never reach urlopen (which would happily
    # read local files into the pages table)
    if urlparse(url).scheme not in ("http", "https"):
        return None
    req = Request(url, headers={"User-Agent": user_agent})
    with urlopen(req, timeout=timeout_s) as resp:
        if getattr(resp, "status", 200) != 200:
            return None
        return resp.read()


def live_fetch(
    scheduled: DataFrame,
    transport: Transport,
    fetch_ts: datetime,
    timeout_s: float = 5.0,
    user_agent: str = USER_AGENT,
    pace: bool = False,
) -> DataFrame:
    """Fetch the scheduled slice live, one host per task, sequential in
    ``host_seq`` order.  Output schema matches ``fetch_join``: input
    columns + ``html binary, warc_ts timestamp, fetch_ok boolean`` — so
    the rest of the epoch (parse, upserts, frontier update) is unchanged
    whichever fetch mode runs.

    ``pace=True`` additionally sleeps each request until its
    ``planned_fetch_ts`` (wall-clock politeness); tests and backfills
    leave it off — ordering alone preserves per-host sequencing.
    """
    schema = StructType(
        scheduled.schema.fields
        + [
            StructField("html", BinaryType(), True),
            StructField("warc_ts", TimestampType(), True),
            StructField("fetch_ok", BooleanType(), False),
        ]
    )
    ts = fetch_ts.replace(tzinfo=None)

    def _fetch(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("host_seq", kind="mergesort")
        planned_col = (
            pdf["planned_fetch_ts"]
            if "planned_fetch_ts" in pdf.columns
            else pd.Series([None] * len(pdf), index=pdf.index)
        )
        bodies = []
        for url, planned in zip(pdf["url"], planned_col):
            if pace and pd.notna(planned):  # notna: None AND NaT skip pacing
                # sleep the FULL politeness gap (looped against wall clock —
                # a single sleep capped at timeout_s would silently under-
                # wait hosts whose crawl-delay exceeds the fetch timeout)
                while True:
                    wait = planned.timestamp() - time.time()
                    if wait <= 0:
                        break
                    time.sleep(wait)
            try:
                bodies.append(transport(url, timeout_s, user_agent))
            except Exception:
                bodies.append(None)  # any transport error = fetch failure
        out = pdf.copy()
        out["html"] = bodies
        ok = [b is not None for b in bodies]
        # warc_ts only on successful fetches — fetch_join leaves misses
        # null, and the swap-in contract is bit-for-bit column parity
        out["warc_ts"] = [ts if o else None for o in ok]
        out["fetch_ok"] = ok
        return out

    return scheduled.groupBy("host_hash").applyInPandas(_fetch, schema=schema)
