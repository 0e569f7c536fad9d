"""WARC ingestion — Common Crawl's actual container format (ISO 28500 /
WARC 1.0, public spec).

The pipeline's input_hint table (url, warc_ts, html, text, lang) is what a
crawl looks like AFTER ingestion; this module supplies the ingestion step
itself: parse ``.warc.gz`` files (each record its own gzip member, the
Common-Crawl convention — concatenated members decode in one stdlib
``gzip.decompress`` pass), keep ``WARC-Type: response`` records, split the
HTTP response envelope off, and emit input_hint-schema rows.

Spark shape: ``spark.read.format("binaryFile")`` gives one row per WARC
file (path, bytes); an Arrow ``mapInPandas`` stage fans each file out into
its records — a map-only plan, no shuffle. Common Crawl cuts WARCs at ~1 GB
so file-per-task parallelism is the natural unit; the segment files ARE the
partitions. A writer (``make_warc_gz``) assembles spec-conformant fixtures
so the parser is tested against real container bytes, and the parsed rows
feed ``operators.extract.extract_documents`` directly (end-to-end test).
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
# NOTE: no ^ anchors — pattern.match(data, pos) anchors at pos, but ^ would
# additionally require pos == 0 (non-MULTILINE), silently failing on every
# record after the first
_WARC_VERSION_RE = re.compile(rb"WARC/\d+\.\d+\r?\n")
_HTTP_STATUS_RE = re.compile(rb"HTTP/\d\.\d \d{3}")

INPUT_HINT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def make_warc_gz(records: list[dict]) -> bytes:
    """Assemble a real ``.warc.gz``: one gzip MEMBER per record (the
    Common-Crawl layout — a reader can seek to a record offset and inflate
    just that member). Record dicts: {"type": "response"|"request"|
    "metadata", "url": str, "date": datetime, "payload": bytes,
    "status": int (response only)}."""
    out = bytearray()
    for rec in records:
        rtype = rec.get("type", "response")
        url = rec.get("url", "")
        date = rec.get("date") or dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        payload = bytes(rec.get("payload", b""))
        if rtype == "response":
            status = int(rec.get("status", 200))
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
        else:
            http = payload
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
            + (
                'Content-Type: application/http; msgtype=response\r\n'
                if rtype == "response"
                else "Content-Type: application/octet-stream\r\n"
            )
            + f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        member = head + http + _CRLF + _CRLF
        out += gzip.compress(member)
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {"type", "url", "date", "payload"} per record. Accepts gzipped
    (single- or multi-member) and plain WARC bytes; response records get
    the HTTP envelope stripped (payload = body only). Tolerant: malformed
    records are skipped, never raised on."""
    try:
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)  # multi-member-aware
    except Exception:
        return
    pos = 0
    n = len(data)
    while pos < n:
        m = _WARC_VERSION_RE.match(data, pos)
        if m is None:
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        head_end = data.find(b"\r\n\r\n", m.end())
        if head_end < 0:
            return
        headers = _parse_headers(data[m.end() : head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # skip the record separator (two CRLFs) if present
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        rtype = headers.get("warc-type", "")
        payload = body
        if rtype == "response" and _HTTP_STATUS_RE.match(body):
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                payload = body[http_end + 4 :]
        yield {
            "type": rtype,
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "payload": payload,
        }


def read_warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """``.warc(.gz)`` files → input_hint-schema DataFrame of the response
    records. binaryFile scan (one row per WARC file) → Arrow fan-out into
    records; map-only, file-per-task parallelism (Common Crawl's ~1 GB
    segment files are the natural partition unit)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, payloads = [], [], []
            for blob in pdf["content"]:
                for rec in iter_warc_records(bytes(blob)):
                    if rec["type"] != "response" or not rec["url"]:
                        continue
                    urls.append(rec["url"])
                    tss.append(rec["date"])
                    payloads.append(rec["payload"])
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts_raw": tss,
                    "html": payloads,
                }
            )

    raw = files.mapInPandas(fan_out, schema="url string, warc_ts_raw string, html binary")
    return raw.select(
        "url",
        F.to_timestamp("warc_ts_raw", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("unknown").alias("lang"),
    )
