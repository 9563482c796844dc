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


def test_record_offsets_match_writer_layout(tmp_path):
    from podcast_crawler_spark.sources.warc import parse_warc_records

    p = str(tmp_path / "o.warc")
    locs = write_warc_file(RECORDS, p, compress=False)
    data = open(p, "rb").read()
    got = parse_warc_records(data)
    assert [(off, ln) for *_, off, ln in got] == locs
    # each (offset, length) slice re-parses to exactly that one record
    for (url, _, status, body, off, ln) in got:
        sub = parse_warc_records(data[off : off + ln])
        assert len(sub) == 1
        assert (sub[0][0], sub[0][2], sub[0][3]) == (url, status, body)
    # offsets are into the UNCOMPRESSED stream for whole-file gzip too
    locs_gz = write_warc_file(RECORDS, p + ".gz", compress=True)
    assert locs_gz == locs
    got_gz = parse_warc_records(open(p + ".gz", "rb").read())
    assert [(off, ln) for *_, off, ln in got_gz] == locs


def test_read_warc_index_and_cdx_layout(spark, tmp_path):
    import hashlib

    from podcast_crawler_spark.sources.warc import cdx_index, read_warc_index

    p = str(tmp_path / "i.warc.gz")
    locs = write_warc_file(RECORDS, p, compress=True)
    idx = read_warc_index(spark, p)
    rows = {r.url: r for r in idx.collect()}
    assert len(rows) == 3
    for (url, _, status, body), (off, ln) in zip(RECORDS, locs):
        r = rows[url]
        assert (r.offset, r.rec_length) == (off, ln)
        assert r.n_bytes == len(body)
        assert r.body_md5 == hashlib.md5(body).hexdigest()
        assert r.filename == "i.warc.gz"
        assert r.http_status == status
    # serving layout: surt present, one range exchange, sorted within
    laid = cdx_index(idx, num_partitions=2)
    assert "surt" in laid.columns
    plan = laid._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.count("Exchange") == 1, plan
    # surt groups a host's captures regardless of subdomain ordering
    surts = sorted(r.surt for r in laid.collect())
    assert surts[0].startswith("example,a)")
