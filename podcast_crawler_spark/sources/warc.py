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
    LongType,
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


def parse_warc_records(
    data: bytes,
) -> List[Tuple[str, Optional[datetime], Optional[int], bytes, int, int]]:
    """Parse one WARC file's bytes → [(url, ts, http_status, body,
    offset, rec_length)].  Tolerates a truncated final record (dropped).

    ``offset``/``rec_length`` locate the record — headers through its
    trailing CRLF pair — in the UNCOMPRESSED stream (for per-member-gz
    archives à la Common Crawl, member boundaries coincide with record
    boundaries, so the same walk over member offsets yields the
    compressed variant)."""
    if data[:2] == b"\x1f\x8b":  # gzip magic: member-per-record or whole-file
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        rec_start = pos
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
        pos = block_end
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
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
            out.append((url, ts, status, body, rec_start, pos - rec_start))
    return out


def parse_warc_bytes(data: bytes) -> List[Tuple[str, Optional[datetime], Optional[int], bytes]]:
    """Parse one WARC file's bytes → [(url, ts, http_status, body)].
    Tolerates a truncated final record (dropped)."""
    return [
        (url, ts, status, body)
        for url, ts, status, body, _off, _len in parse_warc_records(data)
    ]


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


CDX_SCHEMA = StructType([
    StructField("filename", StringType(), False),
    StructField("offset", LongType(), False),
    StructField("rec_length", LongType(), False),
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("http_status", IntegerType(), True),
    StructField("n_bytes", LongType(), False),
    StructField("body_md5", StringType(), False),
])


def read_warc_index(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → CDX-style capture index rows (CDX_SCHEMA): where
    every capture lives (file, offset, length) plus its identity
    (url, ts, status, body size + digest).  The serving artifact of a
    Common-Crawl-style archive — random access to any capture without
    scanning segments.

    Same parallelism contract as :func:`read_warc` (one task per file,
    records born in-task); the page BYTES never leave the task — only
    the fixed-width index row (digest, not body) is emitted, so the
    exchange feeding the index sort is O(captures), not O(corpus)."""
    import hashlib

    files = spark.read.format("binaryFile").load(path)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                fname = str(pth).rsplit("/", 1)[-1]
                for url, ts, status, body, off, rlen in parse_warc_records(
                    bytes(content)
                ):
                    rows.append((
                        fname,
                        off,
                        rlen,
                        url,
                        ts.replace(tzinfo=None) if ts else None,
                        status,
                        len(body),
                        hashlib.md5(body).hexdigest(),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CDX_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(_run, schema=CDX_SCHEMA)


def cdx_index(idx: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    """Capture rows → the CDX serving layout: a ``surt`` key column
    (Common-Crawl/Wayback canonical ordering, ``functions/urlfns``)
    plus range-partitioning and within-partition sort by
    ``(surt, warc_ts)``.  Written as-is, the index is binary-searchable
    per file and a host/domain's captures are CONTIGUOUS (SURT reverses
    host labels), so domain lookups touch one partition range instead
    of all of them.  One range exchange of narrow index rows — the
    blobs stayed in their scan tasks."""
    from pyspark.sql import functions as F

    from ..functions.urlfns import surt_key

    out = idx.withColumn("surt", surt_key(F.col("url")))
    parts = (num_partitions,) if num_partitions else ()
    return out.repartitionByRange(*parts, "surt", "warc_ts").sortWithinPartitions(
        "surt", "warc_ts"
    )


def write_warc_file(
    records: List[Tuple[str, datetime, int, bytes]],
    path: str,
    compress: bool = False,
) -> List[Tuple[int, int]]:
    """Write (url, ts, status, body) records as a WARC file — fixture and
    test helper (driver-side; production archives come from the fetcher).

    Returns per-record ``(offset, rec_length)`` in the uncompressed
    stream, computed from the WRITER's own byte layout — write-side
    truth the CDX oracle checks the parser against, never derived
    through the parser."""
    buf = io.BytesIO()
    locs = []
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
        start = buf.tell()
        buf.write(head + http + b"\r\n\r\n")
        locs.append((start, buf.tell() - start))
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as fh:
        fh.write(data)
    return locs
