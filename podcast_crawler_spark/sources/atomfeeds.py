"""Atom feed batch parsing: the Spark wrapper over
``feedparse.atomparse`` — one episodes row per entry, same column
contract as the RSS parse stage so downstream upserts are
format-agnostic.

Scale shape: Arrow-batched ``mapInPandas`` (the ``functions/udfs.py``
parse-stage discipline); malformed feeds contribute an error row, not a
poison pill (``parse_ok = false`` with the error kind — the reference's
per-task error taxonomy, ``infrastructure/error/parse.rs``, whose
``InvalidAtom`` variant this finally exercises).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from podcast_crawler_spark.feedparse.atomparse import parse_atom_feed
from podcast_crawler_spark.feedparse.rssparse import FeedParseError

ATOM_EPISODES_SCHEMA = StructType(
    [
        StructField("feed_url", StringType()),
        StructField("parse_ok", BooleanType()),
        StructField("error_kind", StringType()),
        StructField("podcast_title", StringType()),
        StructField("author", StringType()),
        StructField("ep_idx", IntegerType()),
        StructField("ep_title", StringType()),
        StructField("guid", StringType()),
        StructField("link", StringType()),
        StructField("enclosure_url", StringType()),
        StructField("enclosure_length", LongType()),
        StructField("pub_date_iso", StringType()),
        StructField("description", StringType()),
    ]
)


def parse_atom_feeds(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """``(url, xml)`` rows → one row per episode (or one error row per
    failed feed)."""
    import pandas as pd

    cols = [f.name for f in ATOM_EPISODES_SCHEMA.fields]

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                if xml is None:
                    continue
                try:
                    podcast, eps = parse_atom_feed(
                        xml.encode("utf-8"), url
                    )
                except FeedParseError as exc:
                    rows.append(
                        (url, False, str(exc).split("]")[0].strip("["),
                         None, None, None, None, None, None, None, None,
                         None, None)
                    )
                    continue
                for i, e in enumerate(eps):
                    rows.append(
                        (
                            url,
                            True,
                            None,
                            podcast["title"],
                            podcast["author"],
                            i,
                            e["title"],
                            e["guid"],
                            e["link"],
                            e["enclosure_url"],
                            e["enclosure_length"],
                            e["pub_date"].isoformat()
                            if e["pub_date"] is not None
                            else None,
                            e["description"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(url_col, xml_col).mapInPandas(
        _run, schema=ATOM_EPISODES_SCHEMA
    )
