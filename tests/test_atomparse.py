"""Atom parser (RFC 4287) — semantics, error taxonomy, Spark batch
stage.  The reference declares error::InvalidAtom but never constructs
it (`infrastructure/error/parse.rs:53`, no usage sites) — this module
implements and exercises the support it only named."""

import pytest

from podcast_crawler_spark.feedparse.atomparse import parse_atom_feed
from podcast_crawler_spark.feedparse.rssparse import FeedParseError

ATOM = b"""<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>My Atom Pod</title>
  <subtitle>about &amp; stuff</subtitle>
  <rights>CC-BY</rights>
  <author><name>Alice</name></author>
  <logo>https://x.io/logo.png</logo>
  <link rel="alternate" href="https://x.io/"/>
  <entry>
    <title>Ep 1</title>
    <id>urn:uuid:abc</id>
    <published>2024-12-04T10:06:00Z</published>
    <updated>2024-12-05T10:06:00Z</updated>
    <summary>short one</summary>
    <content>full text</content>
    <link href="https://x.io/ep1"/>
    <link rel="enclosure" href="https://cdn.x.io/ep1.mp3?a=1&amp;b=2"
          type="audio/mpeg" length="123"/>
  </entry>
  <entry>
    <title>Ep 2</title>
    <updated>2024-12-06T00:00:00Z</updated>
  </entry>
</feed>"""


def test_atom_field_policy():
    p, eps = parse_atom_feed(ATOM, "https://x.io/atom.xml")
    assert p["title"] == "My Atom Pod"
    assert p["subtitle"] == "about & stuff"  # entity decoded
    assert p["copyright"] == "CC-BY" and p["author"] == "Alice"
    assert p["image_url"] == "https://x.io/logo.png"
    assert p["link"] == "https://x.io/"
    assert p["rss_feed_url"] == "https://x.io/atom.xml"
    e0, e1 = eps
    assert e0["guid"] == "urn:uuid:abc" and e0["link"] == "https://x.io/ep1"
    assert e0["enclosure_url"] == "https://cdn.x.io/ep1.mp3?a=1&b=2"
    assert e0["enclosure_type"] == "audio/mpeg"
    assert e0["enclosure_length"] == 123
    assert e0["description"] == "short one" and e0["summary"] == "full text"
    # published wins over updated; updated is the fallback
    assert e0["pub_date"].isoformat() == "2024-12-04T10:06:00+00:00"
    assert e1["pub_date"].isoformat() == "2024-12-06T00:00:00+00:00"


@pytest.mark.parametrize(
    "doc",
    [
        b"<rss><channel></channel></rss>",  # wrong root
        b"<feed><entry><id>x</id></entry></feed>",  # entry sans title
        b"<feed><title>t</title><entry><title>e<",  # truncated
    ],
)
def test_atom_error_taxonomy(doc):
    with pytest.raises(FeedParseError) as exc:
        parse_atom_feed(doc, "u")
    assert "invalid_atom" in str(exc.value)


def test_atom_spark_batch_stage(spark):
    from podcast_crawler_spark.sources.atomfeeds import parse_atom_feeds

    rows = [
        ("https://a.io/f.xml", ATOM.decode()),
        ("https://b.io/bad.xml", "<feed><title>t<"),
        ("https://c.io/none.xml", None),
    ]
    df = spark.createDataFrame(rows, "url string, xml string")
    got = parse_atom_feeds(df).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["feed_url"], []).append(r)
    assert len(by_url["https://a.io/f.xml"]) == 2
    assert all(r["parse_ok"] for r in by_url["https://a.io/f.xml"])
    bad = by_url["https://b.io/bad.xml"]
    assert len(bad) == 1 and not bad[0]["parse_ok"]
    assert bad[0]["error_kind"] == "invalid_atom"
    assert "https://c.io/none.xml" not in by_url
