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

HTTP-envelope realism (all routine in real Common Crawl segments):
- ``Transfer-Encoding: chunked`` bodies are de-chunked (RFC 9112 §7.1);
- Content-Type is parsed (mime + charset); ``read_warc_documents`` keeps
  only mimes the extractor handles (html/xhtml/pdf + absent) and decodes
  the declared charset into the ``text`` column, re-encoding non-UTF-8
  HTML payloads to UTF-8 bytes in ``html`` so the downstream extraction
  branch (which assumes UTF-8) is correct for latin-1/KOI8/etc. pages;
- the charset re-encode is STRICT-gated: a payload whose declared charset
  decodes cleanly is re-encoded to UTF-8; a mislabeled one keeps its
  original bytes (baking U+FFFD over recoverable content is worse than a
  passthrough);
- ``WARC-Type: revisit`` dedup records (ubiquitous in real segments —
  their block is the bare HTTP headers of an identical refetch) never
  surface as documents;
- ``WARC-Truncated`` records are tolerated: parsed normally, payload
  as-stored, the flag surfaced per record;
- WARC 1.1 fractional-second dates are normalized and timestamp parsing
  uses ``try_to_timestamp`` — a malformed date yields NULL, never an
  ANSI-mode DateTimeException aborting the whole ingestion job.
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
_HTTP_STATUS_RE = re.compile(rb"HTTP/\d\.\d (\d{3})")

INPUT_HINT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _chunk_encode(payload: bytes, chunk_size: int = 97) -> bytes:
    """RFC 9112 §7.1 chunked transfer coding (fixture writer side)."""
    out = bytearray()
    for i in range(0, len(payload), chunk_size):
        piece = payload[i : i + chunk_size]
        out += f"{len(piece):x}".encode("ascii") + _CRLF + piece + _CRLF
    out += b"0" + _CRLF + _CRLF
    return bytes(out)


def make_warc_gz(records: list[dict]) -> bytes:
    """Assemble a real ``.warc.gz``: one gzip MEMBER per record (the
    Common-Crawl layout — a reader can seek to a record offset and inflate
    just that member). Record dicts: {"type": "response"|"request"|
    "metadata", "url": str, "date": datetime, "payload": bytes,
    "status": int, "content_type": str (HTTP Content-Type header value),
    "chunked": bool (emit Transfer-Encoding: chunked), "truncated": str
    (emit WARC-Truncated with this reason, e.g. "length")} — the last
    three, plus a ``date`` with microseconds (emitted as a WARC 1.1
    fractional-second timestamp), cover the envelope variants real
    Common Crawl segments contain."""
    out = bytearray()
    for rec in records:
        rtype = rec.get("type", "response")
        url = rec.get("url", "")
        date = rec.get("date") or dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        payload = bytes(rec.get("payload", b""))
        if rtype == "response":
            status = int(rec.get("status", 200))
            ctype = rec.get("content_type", "text/html; charset=utf-8")
            if rec.get("chunked"):
                body = _chunk_encode(payload)
                framing = "Transfer-Encoding: chunked\r\n"
            else:
                body = payload
                framing = f"Content-Length: {len(payload)}\r\n"
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n" + framing + "\r\n"
            ).encode("latin-1") + body
        elif rtype == "revisit":
            # dedup record (ubiquitous in real segments): the block is the
            # bare HTTP response HEADERS of the revisited fetch, no body
            status = int(rec.get("status", 200))
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                "Content-Type: text/html; charset=utf-8\r\n\r\n"
            ).encode("latin-1")
        else:
            http = payload
        if date.microsecond:  # WARC 1.1 fractional seconds
            date_s = date.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
        else:
            date_s = date.strftime("%Y-%m-%dT%H:%M:%SZ")
        trunc = (
            f"WARC-Truncated: {rec['truncated']}\r\n"
            if rec.get("truncated")
            else ""
        )
        if rtype == "revisit":
            trunc += (
                "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
                "identical-payload-digest\r\n"
                "WARC-Refers-To: <urn:uuid:00000000-0000-0000-0000-"
                "000000000001>\r\n"
            )
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date_s}\r\n"
            "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
            + trunc
            + (
                'Content-Type: application/http; msgtype=response\r\n'
                if rtype in ("response", "revisit")
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


def _dechunk(body: bytes) -> bytes:
    """Decode RFC 9112 §7.1 chunked transfer coding. Tolerant: on any
    framing error the bytes decoded so far are returned (a truncated
    capture mid-chunk is routine in crawl data)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_token = body[pos:eol].split(b";", 1)[0].strip()  # ignore ext
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            break  # terminal chunk (trailers ignored)
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2  # chunk data + its trailing CRLF
    return bytes(out)


def _parse_content_type(value: str) -> tuple[str, str | None]:
    """'text/html; charset=ISO-8859-1' → ('text/html', 'iso-8859-1')."""
    parts = value.split(";")
    mime = parts[0].strip().lower()
    charset = None
    for p in parts[1:]:
        p = p.strip()
        if p.lower().startswith("charset="):
            charset = p[8:].strip().strip('"').strip("'").lower() or None
    return mime, charset


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {"type", "url", "date", "payload", "mime", "charset",
    "truncated"} per record. Accepts gzipped (single- or multi-member) and
    plain WARC bytes; response records get the HTTP envelope stripped
    (payload = body only), chunked transfer coding de-chunked, and the
    Content-Type header parsed into (mime, charset). ``WARC-Truncated``
    records parse normally with the flag surfaced. Tolerant: malformed
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
        mime: str = ""
        charset: str | None = None
        status: int | None = None
        sm = _HTTP_STATUS_RE.match(body) if rtype == "response" else None
        if sm is not None:
            status = int(sm.group(1))
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                http_headers = _parse_headers(body[:http_end])
                payload = body[http_end + 4 :]
                if "chunked" in http_headers.get("transfer-encoding", "").lower():
                    payload = _dechunk(payload)
                ct = http_headers.get("content-type", "")
                if ct:
                    mime, charset = _parse_content_type(ct)
        yield {
            "type": rtype,
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "payload": payload,
            "mime": mime,
            "charset": charset,
            "status": status,
            "truncated": headers.get("warc-truncated", "") or None,
        }


# mimes the downstream extractor has a branch for; "" = no Content-Type
# header at all (tolerated — old servers), everything else (images, css,
# js, fonts, json APIs...) is dropped at ingestion
DEFAULT_KEEP_MIMES = frozenset(
    {"", "text/html", "application/xhtml+xml", "application/pdf"}
)

_WARC_DATE_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.\d{1,9})?Z$"
)

_TEXT_MIMES = frozenset({"", "text/html", "application/xhtml+xml"})


def read_warc_documents(
    spark: SparkSession,
    path: str,
    keep_mimes: frozenset[str] | set[str] = DEFAULT_KEEP_MIMES,
    keep_statuses: range | set[int] = range(200, 300),
    glob: str = "*.warc*",
) -> DataFrame:
    """``.warc(.gz)`` files → input_hint-schema DataFrame of the response
    records. binaryFile scan (one row per WARC file) → Arrow fan-out into
    records; map-only, file-per-task parallelism (Common Crawl's ~1 GB
    segment files are the natural partition unit).

    Envelope handling: only ``keep_mimes`` responses are emitted; chunked
    bodies are de-chunked in the fan-out; for text mimes the declared
    charset is decoded into the ``text`` column (source text — downstream
    extraction replaces it) and a non-UTF-8 payload is re-encoded to UTF-8
    in ``html`` so the extraction branch's UTF-8 assumption holds;
    truncated records are kept as stored. WARC 1.1 fractional-second dates
    are normalized in the fan-out, and parsing uses ``try_to_timestamp``:
    a malformed/missing date becomes a NULL ``warc_ts`` instead of an
    ANSI-mode DateTimeException aborting the job (ADVICE r3)."""
    import pandas as pd

    keep = frozenset(keep_mimes)
    # crawl landing dirs carry manifests/temp files alongside segments —
    # only *.warc* names are containers
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, payloads, texts = [], [], [], []
            for blob in pdf["content"]:
                for rec in iter_warc_records(bytes(blob)):
                    if rec["type"] != "response" or not rec["url"]:
                        continue
                    if rec["mime"] not in keep:
                        continue
                    # only successful fetches carry page content worth
                    # extracting (404/5xx bodies are server chrome); a
                    # record with NO parsed HTTP envelope (bare payload)
                    # is kept — old-crawl convention
                    if rec["status"] is not None and rec["status"] not in keep_statuses:
                        continue
                    payload = rec["payload"]
                    text = ""
                    if rec["mime"] in _TEXT_MIMES:
                        charset = rec["charset"] or "utf-8"
                        try:
                            text = payload.decode(charset, "replace")
                        except LookupError:  # unknown charset label
                            text = payload.decode("utf-8", "replace")
                        if charset not in ("utf-8", "utf8", "ascii", "us-ascii"):
                            try:
                                strict = payload.decode(charset)
                            except (UnicodeDecodeError, LookupError):
                                strict = None
                            if strict is not None:
                                payload = strict.encode("utf-8")
                            # else: mislabeled charset — keep the ORIGINAL
                            # bytes; re-encoding the replace-decoded string
                            # would bake U+FFFD over recoverable content
                            # (ADVICE r4)
                    dm = _WARC_DATE_RE.match(rec["date"])
                    tss.append(dm.group(1) + "Z" if dm else None)
                    urls.append(rec["url"])
                    payloads.append(payload)
                    texts.append(text)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts_raw": tss,
                    "html": payloads,
                    "text": texts,
                }
            )

    raw = files.mapInPandas(
        fan_out,
        schema="url string, warc_ts_raw string, html binary, text string",
    )
    return raw.select(
        "url",
        F.try_to_timestamp(
            "warc_ts_raw", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
        ).alias("warc_ts"),
        "html",
        "text",
        F.lit("unknown").alias("lang"),
    )


# ---------------------------------------------------------------------------
# WET export (r6) — Common Crawl's extracted-text derivative (the
# ``*.warc.wet.gz`` conversion files, ISO 28500 §6.8: ``WARC-Type:
# conversion`` records whose block is the plain text of the page). This
# is the pipeline's natural OUTPUT container: extraction results become
# seekable, member-per-record text shards any WARC tool can read back.


def make_wet_gz(records: list[dict]) -> bytes:
    """Assemble ``.wet.gz`` bytes: one gzip member per conversion record.
    Record dicts: {"url": str, "date": datetime, "text": str}."""
    from urllib.parse import quote

    return b"".join(make_wet_record_gz(rec) for rec in records)


def make_wet_record_gz(rec: dict) -> bytes:
    """One conversion record as ONE gzip member (ISO 28500 §D: WET files
    are member-per-record concatenations, so a sink can stream members to
    an open file without ever materializing the segment)."""
    from urllib.parse import quote

    # WARC-Target-URI must be a URI (ASCII): map raw IRI codepoints
    # to UTF-8 percent-escapes (RFC 3987 §3.1) instead of crashing
    # the sink task on .encode('latin-1') (code-review r6). ASCII
    # urls — including already-percent-encoded ones — pass through
    # byte-identical.
    url = quote(str(rec.get("url", "")), safe=":/?#[]@!$&'()*+,;=%-._~")
    date = rec.get("date") or dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    payload = str(rec.get("text", "")).encode("utf-8")
    if date.microsecond:
        date_s = date.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    else:
        date_s = date.strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_s}\r\n"
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000002>\r\n"
        "WARC-Refers-To: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("latin-1")
    return gzip.compress(head + payload + _CRLF + _CRLF)


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Distributed WET sink: each task writes its partition as one
    ``.wet.gz`` segment (tmp-file + atomic rename, so a killed task never
    leaves a half-segment a reader could pick up) and emits a manifest
    row (file, n_records). Map-only — the caller controls partitioning
    (and therefore segment sizing) upstream; Common Crawl's ~150 MB WET
    segments ≈ one task's worth. The returned manifest is lazy: an
    action on it IS the write.

    Memory + retry semantics (ADVICE r6): gzip members stream to the tmp
    file per record — per-task RSS is bounded by one Arrow batch, never
    the segment — and the segment name derives from the TASK IDENTITY
    (``part-{partitionId}``), so a retried or speculative attempt
    ``os.replace``-overwrites the first attempt's identical output
    instead of committing a duplicate uuid-named segment. The TMP path
    additionally carries ``taskAttemptId()`` so two live attempts of
    the same partition never write into one file (ADVICE r7)."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        name = f"part-{pid:05d}.warc.wet.gz"
        # tmp is keyed by ATTEMPT id, not just partition id: a speculative
        # attempt (or a zombie task racing its retry) must never share a
        # tmp path with another live attempt — 'wb' on a shared path would
        # interleave writes and os.replace could publish a corrupt gzip.
        # Each attempt writes privately; whichever replaces last wins with
        # identical content (the segment NAME stays partition-keyed).
        tmp = os.path.join(out_dir, f".{name}.{attempt}.tmp")
        n_recs = 0
        fh = None
        try:
            for pdf in batches:
                for url, ts, text in zip(
                    pdf[url_col], pdf[ts_col], pdf[text_col]
                ):
                    date = None
                    if ts is not None and not pd.isna(ts):
                        date = (
                            ts.to_pydatetime()
                            if hasattr(ts, "to_pydatetime")
                            else ts
                        )
                    if fh is None:
                        fh = open(tmp, "wb")
                    fh.write(
                        make_wet_record_gz(
                            {"url": url, "date": date, "text": text or ""}
                        )
                    )
                    n_recs += 1
        finally:
            if fh is not None:
                fh.close()
        if n_recs == 0:
            yield pd.DataFrame({"file": [], "n_records": []})
            return
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n_records": [n_recs]})

    return df.select(url_col, ts_col, text_col).mapInPandas(
        sink, schema="file string, n_records long"
    )


def read_wet_documents(spark: SparkSession, path: str) -> DataFrame:
    """``.wet(.gz)`` files → (url, warc_ts, text) rows from the
    conversion records; same binaryFile + Arrow fan-out shape as
    read_warc_documents (map-only, file-per-task)."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
        .select("content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf["content"]:
                for rec in iter_warc_records(bytes(blob)):
                    if rec["type"] != "conversion" or not rec["url"]:
                        continue
                    urls.append(rec["url"])
                    m = _WARC_DATE_RE.match(rec["date"])
                    tss.append(m.group(1) if m else None)
                    texts.append(rec["payload"].decode("utf-8", "replace"))
            yield pd.DataFrame({"url": urls, "_ts": tss, "text": texts})

    rows = files.mapInPandas(fan_out, schema="url string, _ts string, text string")
    return rows.select(
        "url",
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss")).alias(
            "warc_ts"
        ),
        "text",
    )


# ---------------------------------------------------------------------------
# WAT derivative (r7) — Common Crawl's metadata sibling of WET: one
# WARC-Type: metadata record per page whose payload is a JSON envelope
# (Envelope.WARC-Header-Metadata + Envelope.Payload-Metadata.HTML-Metadata
# with Head.Title and the outgoing Links). Same member-per-record gzip
# container, same streaming task-identity sink contract as write_wet.


def _warc_date_str(date) -> str:
    if date is None:
        date = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    if date.microsecond:
        return date.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    return date.strftime("%Y-%m-%dT%H:%M:%SZ")


def make_wat_record_gz(rec: dict) -> bytes:
    """One metadata record as ONE gzip member. Record dict:
    {"url": str, "date": datetime, "title": str|None,
    "links": list[str]}. The JSON payload is CANONICAL (sorted keys,
    compact separators) so equal inputs always produce identical bytes —
    the WET determinism contract extended to the JSON envelope."""
    import json
    from urllib.parse import quote

    url = quote(str(rec.get("url", "")), safe=":/?#[]@!$&'()*+,;=%-._~")
    date_s = _warc_date_str(rec.get("date"))
    html_meta: dict = {
        "Links": [{"url": u} for u in rec.get("links") or []],
    }
    if rec.get("title") is not None:
        html_meta["Head"] = {"Title": str(rec["title"])}
    envelope = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Date": date_s,
                "WARC-Target-URI": url,
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {"HTML-Metadata": html_meta}
            },
        }
    }
    payload = json.dumps(
        envelope, sort_keys=True, separators=(",", ":")
    ).encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_s}\r\n"
        "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000003>\r\n"
        "WARC-Refers-To: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("latin-1")
    return gzip.compress(head + payload + _CRLF + _CRLF)


def write_wat(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
) -> DataFrame:
    """Distributed WAT sink — the write_wet contract verbatim: one
    ``.warc.wat.gz`` segment per task, gzip members STREAMED to a tmp
    file per record (RSS bounded by one Arrow batch), segment name from
    the task identity (``part-{partitionId}``) so a retried attempt
    overwrites rather than duplicates, tmp+``os.replace`` atomic
    publish, lazy manifest (file, n_records) as the return frame."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        name = f"part-{pid:05d}.warc.wat.gz"
        # attempt-private tmp (see write_wet): concurrent speculative /
        # zombie attempts must not interleave into one tmp file.
        tmp = os.path.join(out_dir, f".{name}.{attempt}.tmp")
        n_recs = 0
        fh = None
        try:
            for pdf in batches:
                for url, ts, title, links in zip(
                    pdf[url_col], pdf[ts_col], pdf[title_col], pdf[links_col]
                ):
                    date = None
                    if ts is not None and not pd.isna(ts):
                        date = (
                            ts.to_pydatetime()
                            if hasattr(ts, "to_pydatetime")
                            else ts
                        )
                    if fh is None:
                        fh = open(tmp, "wb")
                    fh.write(
                        make_wat_record_gz(
                            {
                                "url": url,
                                "date": date,
                                "title": title,
                                "links": list(links)
                                if links is not None
                                else [],
                            }
                        )
                    )
                    n_recs += 1
        finally:
            if fh is not None:
                fh.close()
        if n_recs == 0:
            yield pd.DataFrame({"file": [], "n_records": []})
            return
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n_records": [n_recs]})

    return df.select(url_col, ts_col, title_col, links_col).mapInPandas(
        sink, schema="file string, n_records long"
    )


def read_wat_metadata(spark: SparkSession, path: str) -> DataFrame:
    """``.wat(.gz)`` files → (url, warc_ts, title, links array<string>)
    rows from the metadata records' JSON envelopes; binaryFile + Arrow
    fan-out, map-only, file-per-task. Records whose payload is not the
    expected envelope shape are skipped, never crash the task."""
    import json

    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wat*")
        .load(path)
        .select("content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, titles, links_out = [], [], [], []
            for blob in pdf["content"]:
                for rec in iter_warc_records(bytes(blob)):
                    if rec["type"] != "metadata" or not rec["url"]:
                        continue
                    try:
                        env = json.loads(rec["payload"].decode("utf-8"))[
                            "Envelope"
                        ]
                        hm = env["Payload-Metadata"][
                            "HTTP-Response-Metadata"
                        ]["HTML-Metadata"]
                    except (ValueError, KeyError, UnicodeDecodeError):
                        continue
                    urls.append(rec["url"])
                    m = _WARC_DATE_RE.match(rec["date"])
                    tss.append(m.group(1) if m else None)
                    head = hm.get("Head") or {}
                    titles.append(head.get("Title"))
                    links_out.append(
                        [
                            e["url"]
                            for e in hm.get("Links") or []
                            if isinstance(e, dict) and "url" in e
                        ]
                    )
            yield pd.DataFrame(
                {
                    "url": urls, "_ts": tss, "title": titles,
                    "links": links_out,
                }
            )

    rows = files.mapInPandas(
        fan_out,
        schema="url string, _ts string, title string, links array<string>",
    )
    return rows.select(
        "url",
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss")).alias(
            "warc_ts"
        ),
        "title",
        "links",
    )


# ---------------------------------------------------------------------------
# CDX derivative (r7) — the index member of the Common Crawl family
# (WARC capture / WET text / WAT metadata / CDX URL index). Segments are
# ``cdx-{partitionId}.gz``: one gzip STREAM of newline-terminated CDXJ
# lines, sorted by SURT key within the segment (a line BEGINS with its
# key and keys contain no spaces, so sorting lines sorts keys). The
# lines themselves are built entirely JVM-side (functions/web.cdx_line);
# Python appears only here, streaming pre-built strings to the file.
# For a globally sorted index, range-partition by key upstream:
#   df.repartitionByRange(n, "cdx_line").sortWithinPartitions("cdx_line")
# — then segment i's keys all precede segment i+1's.


def write_cdx(df: DataFrame, out_dir: str, line_col: str = "cdx_line") -> DataFrame:
    """Distributed CDX sink — the write_wet/write_wat contract: one
    segment per task named from the task identity (a retried or
    speculative attempt OVERWRITES, never duplicates), lines streamed to
    a tmp file through one gzip stream (mtime pinned to 0 so equal
    inputs give byte-identical segments), tmp + ``os.replace`` atomic
    publish, lazy manifest (file, n_records) as the return frame.
    Sorts within the partition here (Spark's sort, spill-aware) so the
    per-task Python loop stays O(1) memory."""
    import gzip as _gzip
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(line_col).sortWithinPartitions(line_col)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        name = f"cdx-{pid:05d}.gz"
        # attempt-private tmp (see write_wet): concurrent speculative /
        # zombie attempts must not interleave into one tmp file.
        tmp = os.path.join(out_dir, f".{name}.{attempt}.tmp")
        n_recs = 0
        gz = None
        try:
            for pdf in batches:
                for line in pdf[line_col]:
                    if gz is None:
                        gz = _gzip.GzipFile(
                            filename="", mode="wb", fileobj=open(tmp, "wb"),
                            mtime=0,
                        )
                    gz.write(line.encode("utf-8") + b"\n")
                    n_recs += 1
        finally:
            if gz is not None:
                fh = gz.fileobj
                gz.close()
                fh.close()
        if n_recs == 0:
            yield pd.DataFrame({"file": [], "n_records": []})
            return
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n_records": [n_recs]})

    return src.mapInPandas(sink, schema="file string, n_records long")


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """``cdx-*.gz`` segments → (surt_key, ts14, url, mime, digest,
    length, filename) rows. FULLY JVM-side: Spark's text reader
    decompresses .gz transparently, the key/timestamp/JSON split is one
    regexp_extract chain and the JSON fields come out of
    get_json_object — no Python operator in the read plan."""
    lines = (
        spark.read.format("text")
        .option("pathGlobFilter", "cdx-*.gz")
        .load(path)
    )
    v = F.col("value")
    js = F.regexp_extract(v, r"^\S+ \S+ (.*)$", 1)
    return lines.select(
        F.regexp_extract(v, r"^(\S+) ", 1).alias("surt_key"),
        F.regexp_extract(v, r"^\S+ (\S+) ", 1).alias("ts14"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.length").cast("long").alias("length"),
        F.get_json_object(js, "$.filename").alias("filename"),
    ).filter(F.col("surt_key") != "")


# ---------------------------------------------------------------------------
# WARC record-level random access (r8) — the wayback primitive


def iter_gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Walk a multi-member gzip container yielding (offset, length,
    inflated_bytes) per member — the structural fact CDX offset indexes
    rely on: Common Crawl writes ONE gzip member per WARC record, so a
    reader can fetch a single record with one byte-range read. Pure
    stdlib zlib with explicit offset bookkeeping (``gzip.decompress``
    inflates the whole container and discards the member boundaries).

    Feeds the decompressor in bounded CHUNKS over a memoryview: naively
    passing the whole remaining buffer per member makes ``unused_data``
    materialize a near-full copy of the container for EVERY member —
    O(members × container) bytes on a real segment (1 GB, ~100k
    records). Chunked feeding bounds the per-member overcopy to one
    chunk."""
    import zlib

    view = memoryview(data)
    n = len(view)
    pos = 0
    chunk_size = 1 << 20
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out: list[bytes] = []
        fed = 0
        try:
            while not d.eof and pos + fed < n:
                chunk = view[pos + fed : pos + fed + chunk_size]
                out.append(d.decompress(chunk))
                fed += len(chunk)
        except zlib.error:
            return
        if not d.eof:  # truncated trailing member
            return
        consumed = fed - len(d.unused_data)
        yield pos, consumed, b"".join(out)
        pos += consumed


def warc_member_index(data: bytes) -> list[dict]:
    """Per-member offset index of one ``.warc.gz`` segment: [{"offset",
    "length", "record_type", "url", "warc_date"}] — the (file, offset,
    length) triple is exactly what a CDXJ line's envelope carries, and
    ``read_warc_record_at`` consumes it without touching any other byte
    of the segment."""
    out: list[dict] = []
    for offset, length, raw in iter_gzip_members(data):
        rec = next(iter_warc_records(raw), None)
        out.append(
            {
                "offset": offset,
                "length": length,
                "record_type": (rec or {}).get("type", ""),
                "url": (rec or {}).get("url", ""),
                "warc_date": (rec or {}).get("date", ""),
            }
        )
    return out


def index_warc_segments(spark: SparkSession, path: str) -> DataFrame:
    """Distributed offset-index build over a directory of ``.warc.gz``
    segments: binaryFile scan (one row per segment — segments ARE the
    partitions) → Arrow fan-out to (filename, offset, length,
    record_type, url, warc_date) rows. Map-only; at archive scale this
    job IS how the CDX index gets built, and its output is the lookup
    table ``fetch_warc_records_at`` point-reads against."""
    import os as _os

    import pandas as pd

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                fname = _os.path.basename(p)
                for e in warc_member_index(bytes(blob)):
                    rows.append(
                        (
                            fname,
                            e["offset"],
                            e["length"],
                            e["record_type"],
                            e["url"],
                            e["warc_date"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "filename", "offset", "length",
                    "record_type", "url", "warc_date",
                ],
            )

    return src.mapInPandas(
        fan_out,
        schema=(
            "filename string, offset long, length long, "
            "record_type string, url string, warc_date string"
        ),
    )


def read_warc_record_at(path: str, offset: int, length: int) -> dict | None:
    """POINT LOOKUP: fetch exactly one WARC record by (file, offset,
    length) — seek + read ``length`` bytes + inflate that single gzip
    member. Never scans the container (the unit test proves it by
    corrupting every OTHER byte of the segment). On object storage this
    maps 1:1 to a byte-range GET — the wayback-machine access path the
    CDX quartet exists to serve."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    return next(iter_warc_records(blob), None)


def fetch_warc_records_at(index: DataFrame, warc_dir: str) -> DataFrame:
    """Distributed point-lookup stage: ``index`` rows (filename, offset,
    length) → one fetched-record row each (url, warc_date, n_bytes,
    payload). Each task seek-reads ONLY its rows' byte ranges — the work
    is O(selected records), independent of archive size; the plan is
    map-only over the (tiny) index frame, so Spark never opens the
    unselected segments at all."""
    import os as _os

    import pandas as pd

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, off, ln in zip(
                pdf["filename"], pdf["offset"], pdf["length"]
            ):
                rec = read_warc_record_at(
                    _os.path.join(warc_dir, str(fname)), int(off), int(ln)
                )
                if rec is None:
                    continue
                rows.append(
                    (
                        rec["url"],
                        rec["date"],
                        len(rec["payload"]),
                        bytes(rec["payload"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "n_bytes", "payload"]
            )

    return index.select("filename", "offset", "length").mapInPandas(
        fetch,
        schema="url string, warc_date string, n_bytes long, payload binary",
    )
