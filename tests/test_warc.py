"""WARC source: round-trip, gzip, truncation tolerance, status parsing."""

from __future__ import annotations

from datetime import datetime, timezone

from podcast_crawler_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_file,
)

TS = datetime(2025, 3, 1, 12, 0, tzinfo=timezone.utc)

RECORDS = [
    ("https://a.example/feed.xml", TS, 200, b"<rss>alpha</rss>"),
    ("https://b.example/feed.xml", TS, 404, b"not found"),
    ("https://c.example/x", TS, 200, b"\x00binary\r\n\r\npayload\x7f"),
]


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    for compress in (False, True):
        p = str(tmp_path / f"t{'gz' if compress else ''}.warc")
        write_warc_file(RECORDS, p, compress=compress)
        got = parse_warc_bytes(open(p, "rb").read())
        assert [(u, s, b) for u, _, s, b in got] == [
            (u, s, b) for u, _, s, b in RECORDS
        ]
        assert all(ts == TS for _, ts, _, _ in got)


def test_warc_truncated_final_record_dropped(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc_file(RECORDS, p)
    data = open(p, "rb").read()
    got = parse_warc_bytes(data[: len(data) - 20])  # cut into last record
    assert [u for u, *_ in got] == [u for u, *_ in RECORDS[:2]]


def test_read_warc_spark_matches_fixture_meta(spark):
    """The Spark reader over the committed fixture archive reproduces the
    independently derived (url, n_bytes) meta exactly."""
    import duckdb

    df = read_warc(spark, "/root/repo/fixtures/crawl/crawl_sample.warc.gz")
    got = {(r.url, len(bytes(r.html))) for r in df.collect()}
    want = set(
        map(
            tuple,
            duckdb.connect()
            .execute(
                "select url, n_bytes from"
                " '/root/repo/fixtures/crawl/crawl_warc_meta.parquet'"
            )
            .fetchall(),
        )
    )
    assert got == want and len(got) == 198
