"""Spark parse stage ≡ pandas oracle; byte-identical extracted text per url
(the BASELINE.json per-row invariant) on the synthetic corpus and the
reference fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from podcast_crawler_spark.functions.udfs import (
    explode_episodes,
    parse_bool_col,
    parse_date_col,
    parse_pages,
)
from podcast_crawler_spark.sources.pagesgen import (
    FAIL_BAD_ENCLOSURE,
    FAIL_BAD_ENTITY,
    FAIL_MISSING_TITLE,
    gen_pages,
    reference_fixture_pages,
)

N_FEEDS = 120


def test_extracted_text_byte_identity(spark):
    pages = gen_pages(spark, N_FEEDS, partitions=4).cache()
    parsed = parse_pages(pages, passthrough=["url", "text"])
    rows = parsed.collect()
    assert len(rows) == pages.count()
    n_ok = 0
    for r in rows:
        if r.parse_error_kind is None:
            assert r.extracted_text is not None
            assert r.extracted_text == r.text, f"text mismatch for {r.url}"
            n_ok += 1
        else:
            assert r.text is None, f"golden text present for failing {r.url}"
    assert n_ok > 100  # most feeds parse


def test_parse_error_taxonomy(spark):
    pages = gen_pages(spark, 120, partitions=4)
    parsed = parse_pages(pages).select("url", "parse_error_kind")
    by_url = {r.url: r.parse_error_kind for r in parsed.collect()}
    from podcast_crawler_spark.sources.pagesgen import feed_url

    assert by_url[feed_url(FAIL_MISSING_TITLE)] == "missing_field"
    assert by_url[feed_url(FAIL_BAD_ENTITY)] == "invalid_xml"
    assert by_url[feed_url(FAIL_BAD_ENCLOSURE)] == "missing_field"


def test_reference_fixtures_through_spark(spark):
    pages = reference_fixture_pages(spark)
    if pages is None:
        import pytest

        pytest.skip("reference fixtures unavailable")
    parsed = parse_pages(pages, passthrough=["url", "text"]).collect()
    assert len(parsed) == 3
    titles = {r.podcast.title for r in parsed}
    assert titles == {"能量棒", "Tech Talks Daily Podcast", "其他垃圾"}
    for r in parsed:
        assert r.parse_error_kind is None
        assert r.extracted_text == r.text


def test_explode_episodes_inherits_podcast_id(spark):
    pages = gen_pages(spark, 50, partitions=2)
    parsed = parse_pages(pages)
    eps = explode_episodes(parsed)
    joined = (
        eps.select("rss_feed_url", "podcast_id")
        .withColumn("expected", F.xxhash64("rss_feed_url"))
        .filter(F.col("podcast_id") != F.col("expected"))
    )
    assert joined.count() == 0
    assert eps.filter(F.col("guid").isNull()).count() == 0
    assert eps.count() > 50


def test_parse_scalar_cols(spark):
    df = spark.createDataFrame(
        [("true",), ("no",), ("bogus",)], ["v"]
    ).withColumn("b", parse_bool_col(F.col("v")))
    assert [r.b for r in df.collect()] == [True, False, None]
    df = spark.createDataFrame(
        [
            ("Wed, 04 Dec 2024 10:06:00 GMT",),
            ("2024-12-04T10:06:00Z",),
            ("2024-12-04 10:06:00",),
            ("2024-12-04",),
            ("garbage",),
        ],
        ["v"],
    ).withColumn("d", parse_date_col(F.col("v")))
    vals = [r.d for r in df.collect()]
    assert vals[0] is not None and vals[0].isoformat().startswith("2024-12-04T10:06")
    assert vals[1] is not None
    assert vals[2] is not None
    assert vals[3] is not None
    assert vals[4] is None
