"""WARC (ISO 28500) reader/writer — Common-Crawl-style web archive ingest.

BASELINE.json's corpus is "Common-Crawl-style web pages"; Common Crawl
publishes them as WARC archives (~1 GB each, one gzip member per record
so archives stream-split). This module is the front door from that wire
format into the engine's page warehouse shape
``(url, warc_ts, html binary, …)``.

Scale model: **file-level parallelism** — a crawl snapshot is ~10^5
archives, far more than any executor count, so one task per archive is
the natural 100 TB partitioning (no intra-file split needed; gzip
members don't random-seek anyway). ``spark.read.format("binaryFile")``
distributes the archive list; ``mapInPandas`` parses each archive
inside its task with zero driver participation and 1→N record explode
inside the Arrow batch (same plumbing as operators/multimodal.py).

Wire format (public spec): each record is
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``;
``response`` records carry an HTTP response (status line + headers +
body) as payload. A ``.warc.gz`` is a concatenation of gzip members,
each holding one record (the Common Crawl layout); plain ``.warc`` and
multi-record members are handled too. Malformed records are skipped
with a per-file error count, never a task failure (error-isolation rule
of the media passes).
"""

from __future__ import annotations

import gzip
import io
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GZIP_MAGIC = b"\x1f\x8b"

RECORD_SCHEMA = (
    "src_file string, record_type string, url string, warc_ts string, "
    "http_status int, content_type string, payload binary, n_errors int"
)


def _decompress_archive(data: bytes) -> tuple[bytes, int]:
    """(decompressed bytes, decompress-error count) of a possibly
    multi-member gzip stream; non-gzip input passes through.

    Feeds each member bounded zero-copy memoryview windows, so the whole
    archive is O(total bytes). (The obvious per-member ``decompressobj``
    over ``data[pos:]`` re-copies the remaining tail once per member —
    O(members × size), hours of memcpy on a real ~10^5-member
    Common-Crawl archive. ``gzip.GzipFile`` is O(n) but discards every
    already-decompressed byte of the read() call that hits a truncated
    member, losing whole clean records.) A member cut off mid-stream
    keeps its clean decompressed prefix and counts ONE error, so
    truncation is never silent even when the lost part held the record
    header."""
    if not data.startswith(GZIP_MAGIC):
        return data, 0
    mv = memoryview(data)
    out: list[bytes] = []
    errors = 0
    pos, n = 0, len(data)
    while pos < n:
        if data[pos : pos + 2] != GZIP_MAGIC:
            # garbage between members: count it and RESYNC to the next magic
            # instead of silently dropping the rest of the archive (two
            # flipped bytes in one member header of a 10^5-member crawl
            # archive must not lose the other ~10^5 records)
            errors += 1
            nxt = data.find(GZIP_MAGIC, pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member_start = pos
        try:
            while pos < n and not d.eof:
                window = mv[pos : pos + (1 << 20)]
                out.append(d.decompress(window))
                # before eof the whole window is consumed (no max_length →
                # empty unconsumed_tail); at eof unused_data is the part of
                # THIS window past the member end — bounded, not the tail
                pos += len(window) - len(d.unused_data)
        except zlib.error:
            # corrupt member: keep its clean decompressed prefix, count ONE
            # error, resync to the next member boundary past its start
            errors += 1
            nxt = data.find(GZIP_MAGIC, max(pos, member_start + 1))
            if nxt < 0:
                break
            pos = nxt
            continue
        if not d.eof:
            return b"".join(out), errors + 1  # archive ends mid-member
    return b"".join(out), errors


def parse_warc(data: bytes) -> tuple[list[dict], int]:
    """All records of one WARC archive (bytes) → (records, n_errors).

    Record dict keys: record_type, url, warc_ts, http_status,
    content_type, payload (bytes; for ``response`` records the HTTP body
    with the HTTP header block stripped)."""
    records: list[dict] = []
    chunk, errors = _decompress_archive(data)
    off = 0
    while off < len(chunk):
        start = chunk.find(b"WARC/", off)
        if start < 0:
            break
        head_end = chunk.find(b"\r\n\r\n", start)
        if head_end < 0:
            errors += 1
            break
        headers: dict[str, str] = {}
        try:
            lines = chunk[start:head_end].decode("utf-8", "replace").split("\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            errors += 1
            off = head_end + 4
            continue
        payload = chunk[head_end + 4 : head_end + 4 + length]
        if len(payload) < length:  # truncated archive: corrupt body —
            errors += 1  # count it, never emit a silently-short record
            break
        off = head_end + 4 + length
        if chunk[off : off + 4] == b"\r\n\r\n":
            off += 4
        rtype = headers.get("warc-type", "")
        status = None
        ctype = headers.get("content-type", "")
        if rtype in ("response", "request") and payload.startswith(b"HTTP/"):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = payload[:http_end].split(b"\r\n", 1)[0]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                payload = payload[http_end + 4 :]
        records.append(
            {
                "record_type": rtype,
                "url": headers.get("warc-target-uri"),
                "warc_ts": headers.get("warc-date"),
                "http_status": status,
                "content_type": ctype,
                "payload": payload,
            }
        )
    return records, errors


def build_warc(
    records: list[dict], gzip_members: bool = True, warc_version: str = "1.0"
) -> bytes:
    """Records → archive bytes (inverse of :func:`parse_warc`).

    Record keys: url, warc_ts, payload (bytes), optional record_type
    (default ``response``), optional http_status (wraps the payload in an
    HTTP response envelope like a crawler capture)."""
    out = io.BytesIO()
    for rec in records:
        payload = rec["payload"]
        ctype = "application/octet-stream"
        if rec.get("http_status") is not None:
            payload = (
                f"HTTP/1.1 {rec['http_status']} OK\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode() + payload
            ctype = "application/http; msgtype=response"
        head = (
            f"WARC/{warc_version}\r\n"
            f"WARC-Type: {rec.get('record_type', 'response')}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {rec['warc_ts']}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        member = head + payload + b"\r\n\r\n"
        out.write(gzip.compress(member, mtime=0) if gzip_members else member)
    return out.getvalue()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one task per archive file, records exploded
    inside the Arrow batch. Columns: ``RECORD_SCHEMA``.

    ``n_errors`` carries the per-file malformed-record count on every row
    of that file (``SELECT src_file, max(n_errors) GROUP BY src_file`` is
    the operational truncation report); a file whose every record was lost
    still surfaces as one ``record_type='__parse_error__'`` row instead of
    silently shrinking the corpus."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def gen(batches):
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                recs, errs = parse_warc(bytes(blob))
                for r in recs:
                    rows.append(
                        (
                            fpath,
                            r["record_type"],
                            r["url"],
                            r["warc_ts"],
                            r["http_status"],
                            r["content_type"],
                            r["payload"],
                            errs,
                        )
                    )
                if not recs and errs:
                    rows.append(
                        (fpath, "__parse_error__", None, None, None, None, None, errs)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file", "record_type", "url", "warc_ts",
                    "http_status", "content_type", "payload", "n_errors",
                ],
            )

    return files.select("path", "content").mapInPandas(gen, RECORD_SCHEMA)


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archives → the north-rule page-table shape
    ``(url, warc_ts timestamp, html binary)``: successful response
    records only, ready for html→text extraction (functions/text.py) and
    cell geocoding. warc_ts parses the ISO-8601 WARC-Date."""
    recs = read_warc(spark, path)
    return (
        recs.filter(
            (F.col("record_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            "url",
            # try_to_timestamp, not to_timestamp: under Spark 4's default
            # ANSI mode a malformed (or fractional-second WARC/1.1)
            # WARC-Date would otherwise throw and kill the task — the
            # error-isolation rule says skip, never fail. Canonical
            # seconds-precision form first, then Spark's general ISO-8601
            # parser for fractional/offset variants; unparseable → NULL.
            F.coalesce(
                F.try_to_timestamp(
                    F.col("warc_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
                ),
                F.try_to_timestamp(F.col("warc_ts")),
            ).alias("warc_ts"),
            F.col("payload").alias("html"),
        )
    )
