"""Persist the deterministic synthetic crawl corpus (N_FEEDS=200, the
corpus the driver-contract crawl queries run on) as parquet fixtures so
the DuckDB oracles can join/window over the SAME data the Spark queries
see — flipping crawl_seed_scan / crawl_schedule_order /
crawl_epoch_end2end from rows-only to fully oracle-checked.

Everything derives from ``sources/pagesgen.py``'s pure-Python generators
(keyed on (SEED, feed_id) — bit-identical on every run) plus the engine's
own feed parser for the episode-level rows; the parser itself is pinned
against the reference's fixture goldens by the pytest suite
(``tests/test_feedparse_goldens.py``), so these fixtures are derived
data, not hand-authored expectations.

Usage: python tools/gen_crawl_fixtures.py   (writes fixtures/crawl/)

``tests/test_entry_contract.py`` regenerates and asserts equality, so a
drift between generator and committed fixtures fails CI.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from podcast_crawler_spark.feedparse.rssparse import parse_feed_result
from podcast_crawler_spark.sources import pagesgen

N_FEEDS = 200  # __spark_entry__.N_FEEDS
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "crawl",
)

SEEDS_SCHEMA = pa.schema(
    [
        pa.field("id", pa.string()),
        pa.field("rank", pa.int32()),
        pa.field("name", pa.string()),
        pa.field("primary_genre_name", pa.string()),
        pa.field(
            "links",
            pa.list_(
                pa.struct(
                    [pa.field("name", pa.string()), pa.field("url", pa.string())]
                )
            ),
        ),
    ]
)

ROBOTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("user_agent", pa.string()),
        pa.field("disallow_prefixes", pa.list_(pa.string())),
        pa.field("crawl_delay_s", pa.float64()),
    ]
)

PAGES_SCHEMA = pa.schema([pa.field("url", pa.string())])

ROBOTS_TXT_SCHEMA = pa.schema(
    [pa.field("host", pa.string()), pa.field("body", pa.string())]
)

WARC_META_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("body_md5", pa.string()),
    ]
)

WARC_CDX_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("http_status", pa.int32()),
        pa.field("offset", pa.int64()),
        pa.field("rec_length", pa.int64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("body_md5", pa.string()),
    ]
)

PARSE_SCHEMA = pa.schema(
    [pa.field("url", pa.string()), pa.field("error_kind", pa.string())]
)

EPISODES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("guid", pa.string()),
        pa.field("title", pa.string()),
        pa.field("enclosure_url", pa.string()),
        pa.field("enclosure_length", pa.int64()),
        pa.field("pub_date", pa.timestamp("us")),
        pa.field("link", pa.string()),
    ]
)


def build_tables():
    seeds, robots_rows, pages, parse, episodes = [], {}, [], [], []
    robots_txt_rows = {}
    for fid in range(N_FEEDS):
        sid, rank, name, genre, links = pagesgen.seed_row(fid)
        seeds.append(
            {
                "id": sid,
                "rank": rank,
                "name": name,
                "primary_genre_name": genre,
                "links": [{"name": n, "url": u} for n, u in links],
            }
        )
        host = pagesgen.feed_host(fid)
        robots_rows[host] = {
            "host": host,
            "user_agent": "PodcastCrawler/1.0",
            "disallow_prefixes": ["/private/"],
            "crawl_delay_s": 2.0 if host in pagesgen._NETWORK_HOSTS else 0.5,
        }
        robots_txt_rows[host] = {"host": host, "body": pagesgen.robots_txt(host)}
        url = pagesgen.feed_url(fid)
        if fid % 97 == pagesgen.FAIL_NO_PAGE:
            continue  # fetch failure: no page row
        pages.append({"url": url})
        res = parse_feed_result(pagesgen.feed_xml(fid).encode("utf-8"), url)
        parse.append({"url": url, "error_kind": res["error_kind"]})
        if res["error_kind"] is None:
            for ep in res["episodes"]:
                episodes.append(
                    {
                        "url": url,
                        "guid": ep["guid"],
                        "title": ep["title"],
                        "enclosure_url": ep["enclosure_url"],
                        "enclosure_length": ep["enclosure_length"],
                        "pub_date": ep["pub_date"],
                        "link": ep["link"],
                    }
                )
    return (
        seeds,
        list(robots_rows.values()),
        pages,
        parse,
        episodes,
        list(robots_txt_rows.values()),
    )


def write_warc_fixture():
    """A WARC archive of the corpus pages plus an INDEPENDENTLY derived
    (url, n_bytes, body_md5) meta table: the meta comes straight from the
    generator's page bytes, never through the WARC parser — so the
    ``warc_scan`` oracle check proves the parser extracts every record's
    bytes intact."""
    import hashlib

    from podcast_crawler_spark.sources.warc import write_warc_file

    records, meta = [], []
    for fid in range(N_FEEDS):
        row = pagesgen.page_row(fid)
        if row is None:
            continue
        url, warc_ts, html, _text, _lang = row
        records.append((url, warc_ts, 200, html))
        meta.append(
            {
                "url": url,
                "n_bytes": len(html),
                "body_md5": hashlib.md5(html).hexdigest(),
            }
        )
    locs = write_warc_file(
        records, os.path.join(OUT, "crawl_sample.warc.gz"), compress=True
    )
    pq.write_table(
        pa.Table.from_pylist(meta, schema=WARC_META_SCHEMA),
        os.path.join(OUT, "crawl_warc_meta.parquet"),
    )
    # CDX meta: record locations from the WRITER's byte layout (write-side
    # truth) + identities from the generator's page bytes — nothing here
    # passed through the WARC parser the cdx_index query exercises.
    cdx = [
        {
            "url": url,
            "warc_ts": ts,
            "http_status": status,
            "offset": off,
            "rec_length": rlen,
            "n_bytes": m["n_bytes"],
            "body_md5": m["body_md5"],
        }
        for (url, ts, status, _body), (off, rlen), m in zip(records, locs, meta)
    ]
    pq.write_table(
        pa.Table.from_pylist(cdx, schema=WARC_CDX_SCHEMA),
        os.path.join(OUT, "crawl_warc_cdx.parquet"),
    )
    print(
        f"crawl_sample.warc.gz + crawl_warc_meta + crawl_warc_cdx: "
        f"{len(records)} records"
    )


def main():
    os.makedirs(OUT, exist_ok=True)
    seeds, robots, pages, parse, episodes, robots_txt = build_tables()
    for name, rows, schema in (
        ("crawl_seeds", seeds, SEEDS_SCHEMA),
        ("crawl_robots", robots, ROBOTS_SCHEMA),
        ("crawl_pages", pages, PAGES_SCHEMA),
        ("crawl_parse", parse, PARSE_SCHEMA),
        ("crawl_episodes", episodes, EPISODES_SCHEMA),
        ("crawl_robots_txt", robots_txt, ROBOTS_TXT_SCHEMA),
    ):
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
        print(f"{name}: {len(rows)} rows")
    write_warc_fixture()


if __name__ == "__main__":
    main()
