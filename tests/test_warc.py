"""WARC source: wire-format round-trips, distributed file scan, pages shape."""

import gzip

import pytest
from pyspark.sql import functions as F

from grandine_spark.sources.warc import (
    build_warc,
    parse_warc,
    read_warc,
    read_warc_pages,
)


def _recs(n, prefix="http://a.example/p"):
    return [
        {
            "url": f"{prefix}{i}",
            "warc_ts": f"2017-03-0{1 + i % 9}T0{i % 10}:00:00Z",
            "http_status": 200,
            "payload": f"<html><body>page {i} éß</body></html>".encode(),
        }
        for i in range(n)
    ]


def test_bytes_roundtrip_gzip_members():
    recs = _recs(7)
    data = build_warc(recs, gzip_members=True)
    # per-record members: archive splits at gzip magics, like Common Crawl
    assert data.startswith(b"\x1f\x8b") and data.count(b"\x1f\x8b\x08") >= 7
    back, errs = parse_warc(data)
    assert errs == 0 and len(back) == len(recs)
    for want, got in zip(recs, back):
        assert got["url"] == want["url"]
        assert got["warc_ts"] == want["warc_ts"]
        assert got["http_status"] == 200
        assert got["payload"] == want["payload"]  # byte-identity
        assert got["record_type"] == "response"


def test_bytes_roundtrip_plain_and_multirecord_member():
    recs = _recs(3)
    plain = build_warc(recs, gzip_members=False)
    back, errs = parse_warc(plain)
    assert errs == 0 and [r["url"] for r in back] == [r["url"] for r in recs]
    # one gzip member holding ALL records (non-CC layout) also parses
    back2, errs2 = parse_warc(gzip.compress(plain))
    assert errs2 == 0 and len(back2) == 3


def test_malformed_record_is_skipped_not_fatal():
    good = build_warc(_recs(2), gzip_members=False)
    broken = b"WARC/1.0\r\nWARC-Type: response\r\nNo-Length: x\r\n\r\n"
    back, errs = parse_warc(broken + good)
    assert errs == 1
    assert [r["url"] for r in back] == ["http://a.example/p0", "http://a.example/p1"]


def test_truncated_record_counts_error_never_short_payload():
    """A cut-off archive (Content-Length beyond EOF) must surface as an
    error, not a silently-truncated page body."""
    plain = build_warc(_recs(2), gzip_members=False)
    cut = plain[: len(plain) - 20]  # clip into the 2nd record's payload
    back, errs = parse_warc(cut)
    assert errs == 1
    assert [r["url"] for r in back] == ["http://a.example/p0"]
    # gzip-member layout, member truncated mid-stream: clean prefix parses
    gz = build_warc(_recs(3), gzip_members=True)
    back2, errs2 = parse_warc(gz[: len(gz) - 15])
    assert [r["url"] for r in back2] == ["http://a.example/p0", "http://a.example/p1"]
    assert errs2 >= 1


def test_distributed_scan_and_pages_shape(spark, tmp_path):
    # several archives on disk → binaryFile scan → records, one task/file
    for f in range(3):
        (tmp_path / f"crawl-{f}.warc.gz").write_bytes(
            build_warc(_recs(5, prefix=f"http://h{f}.example/"))
        )
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert df.count() == 15
    assert df.filter(F.col("http_status") == 200).count() == 15
    assert df.select("src_file").distinct().count() == 3

    pages = read_warc_pages(spark, str(tmp_path / "*.warc.gz"))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html"]
    assert [str(f.dataType) for f in pages.schema.fields] == [
        "StringType()", "TimestampType()", "BinaryType()",
    ]
    row = pages.filter(F.col("url") == "http://h1.example/3").collect()[0]
    assert bytes(row.html).startswith(b"<html><body>page 3")
    assert row.warc_ts is not None and row.warc_ts.year == 2017

    # non-200 / non-response records are excluded from the page table
    mixed = _recs(2) + [
        {"url": "http://x/404", "warc_ts": "2017-01-01T00:00:00Z",
         "http_status": 404, "payload": b"gone"},
        {"url": "http://x/meta", "warc_ts": "2017-01-01T00:00:00Z",
         "record_type": "warcinfo", "payload": b"software: test"},
    ]
    (tmp_path / "mixed.warc.gz").write_bytes(build_warc(mixed))
    got = read_warc_pages(spark, str(tmp_path / "mixed.warc.gz"))
    assert got.count() == 2
    all_recs = read_warc(spark, str(tmp_path / "mixed.warc.gz"))
    assert all_recs.count() == 4  # reader itself surfaces everything

    # WARC/1.1 fractional-second and malformed dates must not kill the
    # task under Spark 4's default ANSI mode: fractional parses, garbage
    # lands as NULL (error-isolation rule)
    odd = [
        {"url": "http://x/frac", "warc_ts": "2017-01-01T00:00:00.123Z",
         "http_status": 200, "payload": b"f"},
        {"url": "http://x/bad", "warc_ts": "not-a-date",
         "http_status": 200, "payload": b"b"},
    ]
    (tmp_path / "odd.warc.gz").write_bytes(build_warc(odd))
    rows = {
        r.url: r.warc_ts
        for r in read_warc_pages(spark, str(tmp_path / "odd.warc.gz")).collect()
    }
    assert rows["http://x/frac"] is not None
    assert rows["http://x/frac"].microsecond == 123000
    assert rows["http://x/bad"] is None


def test_pages_feed_html_extract(spark, tmp_path):
    """WARC → pages → html→text extraction composes: the ingest output is
    directly consumable by the text pipeline (north-rule invariant)."""
    from grandine_spark.functions.text import extract_text_from_html

    recs = [
        {
            "url": "http://t.example/1",
            "warc_ts": "2017-05-05T05:05:05Z",
            "http_status": 200,
            "payload": b"<html><body><p>hello warc</p></body></html>",
        }
    ]
    (tmp_path / "one.warc.gz").write_bytes(build_warc(recs))
    pages = read_warc_pages(spark, str(tmp_path / "one.warc.gz"))
    out = pages.select(extract_text_from_html(F.col("html")).alias("t")).collect()
    assert out[0].t == "hello warc"
