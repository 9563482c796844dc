"""WARC source: Common-Crawl-style web archives → the pages table.

The engine's input contract is an Iceberg/parquet table of
``(url, warc_ts, html, ...)`` (BASELINE.json input_hint); the raw form
those pages arrive in from a Common-Crawl-style fetcher is WARC
(ISO 28500): concatenated records of

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...           (record headers)
    \\r\\n
    <Content-Length bytes of block>    (for response records: an HTTP
    \\r\\n\\r\\n                            message whose body is the page)

This reader turns ``*.warc`` / ``*.warc.gz`` files into page rows:

* ``spark.read.format("binaryFile")`` loads whole files (WARC is a
  stream format — records are not line-splittable, so the unit of
  parallelism is the file, exactly how Common Crawl shards its corpus
  into ~1 GB segment files: thousands of files ⇒ thousands of tasks).
* record parsing is bytes-level Python per file inside ``mapInPandas``
  — one Arrow batch per file, no shuffle; the html bytes are born in
  the task and flow map-side into parquet/Iceberg ingestion.
* gzip members are detected by magic bytes (Common Crawl gzips each
  record; whole-file gzip also works since members concatenate).

Only ``response`` records with a ``WARC-Target-URI`` yield rows;
malformed trailing bytes are tolerated (truncated final record is
dropped, matching how CC consumers skim damaged segments).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("http_status", IntegerType(), True),
    StructField("html", BinaryType(), True),
])

_CRLF2 = b"\r\n\r\n"


def _parse_http_payload(block: bytes) -> Tuple[Optional[int], bytes]:
    """Split an HTTP response message into (status, body)."""
    head, sep, body = block.partition(_CRLF2)
    if not sep:
        return None, block
    first = head.split(b"\r\n", 1)[0]
    parts = first.split()
    status = None
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    return status, body


def parse_warc_bytes(data: bytes) -> List[Tuple[str, Optional[datetime], Optional[int], bytes]]:
    """Parse one WARC file's bytes → [(url, ts, http_status, body)].
    Tolerates a truncated final record (dropped)."""
    if data[:2] == b"\x1f\x8b":  # gzip magic: member-per-record or whole-file
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        header_blob = data[pos:head_end]
        if not header_blob.startswith(b"WARC/"):
            break
        headers = {}
        for line in header_blob.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        block_start = head_end + len(_CRLF2)
        block_end = block_start + length
        if block_end > n:
            break  # truncated final record
        if (
            headers.get(b"warc-type") == b"response"
            and b"warc-target-uri" in headers
        ):
            url = headers[b"warc-target-uri"].decode("utf-8", "replace")
            ts = None
            if b"warc-date" in headers:
                try:
                    ts = datetime.strptime(
                        headers[b"warc-date"].decode(), "%Y-%m-%dT%H:%M:%SZ"
                    ).replace(tzinfo=timezone.utc)
                except ValueError:
                    ts = None
            status, body = _parse_http_payload(data[block_start:block_end])
            out.append((url, ts, status, body))
        pos = block_end
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → DataFrame(WARC_SCHEMA).  One task per file."""
    files = spark.read.format("binaryFile").load(path)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, ts, status, body in parse_warc_bytes(bytes(content)):
                    rows.append(
                        (url, ts.replace(tzinfo=None) if ts else None, status, body)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.select("content").mapInPandas(_run, schema=WARC_SCHEMA)


def write_warc_file(
    records: List[Tuple[str, datetime, int, bytes]],
    path: str,
    compress: bool = False,
) -> None:
    """Write (url, ts, status, body) records as a WARC file — fixture and
    test helper (driver-side; production archives come from the fetcher)."""
    buf = io.BytesIO()
    for url, ts, status, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: application/xml\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        buf.write(head + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as fh:
        fh.write(data)
