"""Source tests: WARC round-trip (plain + gzip), lenient parsing, readers
with schema contracts, validate-on-read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.compiler import FieldRule, RuleSet
from xmlschemavalidator_spark.datagen import render_html
from xmlschemavalidator_spark.rules.attributes import RequiredAttr
from xmlschemavalidator_spark.sources import read_table, read_warc, validated_read, write_fake_warc
from xmlschemavalidator_spark.sources.readers import expect_schema


def _render(text: str) -> bytes:
    return (
        b"<html><head><title>p</title></head><body>" + text.encode() + b"</body></html>"
    )


def _pages_rows():
    return [
        {"url": "https://a.example/p1", "warc_ts": "2024-03-01T00:00:00Z", "html": _render("hello world")},
        {"url": "https://b.example/p2", "warc_ts": "2024-03-02T12:30:00Z", "html": _render("två tre fyra")},
    ]


def test_warc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "f.warc")
    write_fake_warc(path, _pages_rows())
    df = read_warc(spark, path)
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://a.example/p1", "https://b.example/p2"}
    assert rows["https://a.example/p1"]["text"] == "hello world"
    assert rows["https://b.example/p2"]["text"] == "två tre fyra"
    assert str(rows["https://b.example/p2"]["warc_ts"]).startswith("2024-03-02 12:30:00")
    assert bytes(rows["https://a.example/p1"]["html"]) == _render("hello world")[
        _render("hello world").index(b"<html>"):]


def test_warc_gzip(spark, tmp_path):
    path = str(tmp_path / "f.warc.gz")
    write_fake_warc(path, _pages_rows(), gz=True)
    assert read_warc(spark, path).count() == 2


def test_warc_lenient_on_garbage(spark, tmp_path):
    path = str(tmp_path / "bad.warc")
    good = _pages_rows()[:1]
    write_fake_warc(path, good)
    with open(path, "ab") as fh:
        fh.write(b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\ngarbage")
    df = read_warc(spark, path)
    assert df.count() == 1  # good record survives, garbage skipped


def test_warc_non_response_records_skipped(spark, tmp_path):
    path = str(tmp_path / "meta.warc")
    block = b"software: test"
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(block)).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"
    )
    with open(path, "wb") as fh:
        fh.write(rec)
    write_fake_warc(str(tmp_path / "resp.warc"), _pages_rows()[:1])
    assert read_warc(spark, str(tmp_path / "meta.warc")).count() == 0
    assert read_warc(spark, str(tmp_path / "*.warc")).count() == 1


def test_read_table_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    for fmt in ("parquet", "json", "csv", "orc"):
        p = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(p)
        back = read_table(spark, p, fmt=fmt, schema="id bigint, s string")
        assert [tuple(r) for r in back.collect()] == [(1, "a")]
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "x", fmt="xml")


def test_expect_schema_contract(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    expect_schema(df, {"id": "bigint"})
    with pytest.raises(ValueError, match="missing column 'nope'"):
        expect_schema(df, {"nope": "string"})
    with pytest.raises(ValueError, match="expected string, got bigint"):
        expect_schema(df, {"id": "string"})


def test_validated_read(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame([("u1", "x"), ("u2", None)], "url string, text string").write.parquet(p)
    rs = RuleSet(rules=[FieldRule("text_required", RequiredAttr(), column="text")])
    df, res = validated_read(
        spark, p, rs, key="url", expected={"url": "string", "text": "string"}
    )
    assert df.count() == 2
    assert [tuple(r) for r in res.violations.collect()] == [("u2", "text_required", None)]


def test_read_iceberg_actionable_error_without_runtime(spark):
    """This container has no Iceberg jar: the reader must explain how to
    enable it rather than surface DATA_SOURCE_NOT_FOUND."""
    import pytest

    from xmlschemavalidator_spark.sources.readers import read_iceberg

    with pytest.raises(RuntimeError, match="--packages org.apache.iceberg"):
        read_iceberg(spark, "db.pages", snapshot_id=123)


def test_wet_roundtrip(spark, tmp_path):
    """Common Crawl WET (conversion records): text is the raw payload,
    html is null, and responses in the same archive are ignored."""
    from xmlschemavalidator_spark.sources.warc import read_wet, write_fake_wet

    rows_in = [
        {"url": "http://a.com/1", "warc_ts": "2026-01-01T00:00:00Z",
         "text": "first page text with ümlauts"},
        {"url": "http://b.com/2", "warc_ts": "2026-01-02T00:00:00Z",
         "text": "second\npage\ntext"},
    ]
    p = str(tmp_path / "f.wet")
    write_fake_wet(p, rows_in)
    got = read_wet(spark, p).orderBy("url").collect()
    assert [r["url"] for r in got] == ["http://a.com/1", "http://b.com/2"]
    assert [r["text"] for r in got] == [rows_in[0]["text"], rows_in[1]["text"]]
    assert all(r["html"] is None and r["lang"] is None for r in got)
    # gz variant parses identically
    pg = str(tmp_path / "f.wet.gz")
    write_fake_wet(pg, rows_in, gz=True)
    assert read_wet(spark, pg).count() == 2


def test_wet_truncated_gz_and_bad_date_do_not_fail_the_job(spark, tmp_path):
    """Review regressions: a truncated .gz raises EOFError (not OSError)
    and must skip the file, not kill the job; a malformed WARC-Date
    coerces to null instead of raising."""
    from xmlschemavalidator_spark.sources.warc import read_wet, write_fake_wet

    good = {"url": "http://ok/1", "warc_ts": "2026-01-01T00:00:00Z", "text": "fine"}
    write_fake_wet(str(tmp_path / "good.wet"), [good])
    # truncated gzip member: EOFError path
    import gzip as _gz

    full = _gz.compress(b"anything compressible " * 50)
    (tmp_path / "trunc.wet.gz").write_bytes(full[: len(full) // 2])
    # malformed date in an otherwise-valid record
    bad_date = {"url": "http://ok/2", "warc_ts": "not-a-date", "text": "also fine"}
    write_fake_wet(str(tmp_path / "baddate.wet"), [bad_date])
    got = read_wet(spark, str(tmp_path)).orderBy("url").collect()
    assert [r["url"] for r in got] == ["http://ok/1", "http://ok/2"]
    assert got[1]["warc_ts"] is None and got[1]["text"] == "also fine"


def test_wat_roundtrip(spark, tmp_path):
    """Common Crawl WAT (metadata records, JSON payload): the outlink
    array is extractable without touching HTML; gz parses identically."""
    from xmlschemavalidator_spark.sources.warc import read_wat, write_fake_wat
    from xmlschemavalidator_spark.weburl import wat_outlinks

    def wat_json(urls, src="response"):
        links = ",".join(
            f'{{"path":"A@/href","url":"{u}"}}' for u in urls
        )
        return (
            f'{{"Envelope":{{"WARC-Header-Metadata":{{"WARC-Type":"{src}"}},'
            '"Payload-Metadata":{"HTTP-Response-Metadata":'
            f'{{"HTML-Metadata":{{"Links":[{links}]}}}}}}}}}}'
        )

    rows_in = [
        {"url": "http://a.com/1", "warc_ts": "2026-01-01T00:00:00Z",
         "wat_json": wat_json(["http://x.com/1", "http://y.com/2"])},
        # real WAT files carry request/warcinfo-derived metadata records
        # for the SAME url — the default read keeps response-derived only
        {"url": "http://a.com/1", "warc_ts": "2026-01-01T00:00:00Z",
         "wat_json": wat_json([], src="request")},
        {"url": "http://a.com/1", "warc_ts": "2026-01-01T00:00:00Z",
         "wat_json": '{"Envelope":{"WARC-Header-Metadata":'
                     '{"WARC-Type":"warcinfo"}}}'},
        {"url": "http://b.com/2", "warc_ts": "2026-01-02T00:00:00Z",
         "wat_json": wat_json([])},
    ]
    p = str(tmp_path / "f.wat")
    write_fake_wat(p, rows_in)
    got = read_wat(spark, p).orderBy("url").collect()
    assert [r["url"] for r in got] == ["http://a.com/1", "http://b.com/2"]
    # unfiltered read surfaces every metadata record
    assert read_wat(spark, p, source_record_type=None).count() == 4
    links = (
        read_wat(spark, p)
        .select("url", wat_outlinks(F.col("wat_json")).alias("links"))
        .orderBy("url")
        .collect()
    )
    assert links[0]["links"] == ["http://x.com/1", "http://y.com/2"]
    assert links[1]["links"] == []
    pg = str(tmp_path / "f.wat.gz")
    write_fake_wat(pg, rows_in, gz=True)
    assert read_wat(spark, pg).count() == 2


def test_warc_chunked_transfer_and_content_type(spark, tmp_path):
    """Real crawls capture chunked HTTP responses verbatim: the chunk
    framing must be stripped (byte-identical payload vs the unchunked
    write) and Content-Type surfaces as a column; a raw _dechunk of
    malformed framing returns the bytes unchanged."""
    from xmlschemavalidator_spark.sources.warc import _dechunk

    html = _render("hello chunked world with ümlauts")
    rows_in = [{"url": "http://a.com/1",
                "warc_ts": "2026-01-01T00:00:00Z", "html": html}]
    plain = str(tmp_path / "plain.warc")
    chunk = str(tmp_path / "chunk.warc")
    write_fake_warc(plain, rows_in)
    write_fake_warc(chunk, rows_in, chunked=True)
    got_plain = read_warc(spark, plain).collect()[0]
    got_chunk = read_warc(spark, chunk).collect()[0]
    assert bytes(got_chunk["html"]) == bytes(got_plain["html"]) == html
    assert got_plain["content_type"] == "text/html"
    assert got_chunk["text"] == got_plain["text"]
    # lenient: malformed size line -> raw bytes back, never an exception
    assert _dechunk(b"zz\r\nabc") == b"zz\r\nabc"
    assert _dechunk(b"3\r\nabc\r\n0\r\n\r\n") == b"abc"


def test_warc_response_meta_and_stats(spark, tmp_path):
    from xmlschemavalidator_spark.sources.warc import (
        read_warc_response_meta,
        warc_response_stats,
        write_fake_warc,
    )

    rows = [
        {"url": "http://a/1", "warc_ts": "2024-05-01T00:00:00Z",
         "html": b"<p>ok</p>", "status": 200,
         "content_type": "text/html; charset=UTF-8"},
        {"url": "http://a/2", "warc_ts": "2024-05-01T00:00:01Z",
         "html": b"<p>okok</p>", "status": 200,
         "content_type": "text/html"},
        {"url": "http://a/3", "warc_ts": "2024-05-01T00:00:02Z",
         "html": b"gone", "status": 404,
         "content_type": "text/plain"},
        {"url": "http://a/4", "warc_ts": "2024-05-01T00:00:03Z",
         "html": b"\x00\x01", "status": 301,
         "content_type": "application/octet-stream"},
    ]
    write_fake_warc(str(tmp_path / "a.warc"), rows[:2])
    write_fake_warc(str(tmp_path / "b.warc.gz"), rows[2:], gz=True)
    meta = read_warc_response_meta(spark, str(tmp_path))
    got = {r["url"]: r for r in meta.collect()}
    assert got["http://a/1"]["http_status"] == 200
    assert got["http://a/1"]["n_payload_bytes"] == len(b"<p>ok</p>")
    assert got["http://a/3"]["http_status"] == 404
    assert got["http://a/4"]["content_type"] == "application/octet-stream"
    assert "html" not in meta.columns  # metadata-only projection

    stats = {
        (r["http_status"], r["mime"]): (r["n"], r["total_payload_bytes"])
        for r in warc_response_stats(meta).collect()
    }
    # charset parameter stripped, lower-cased -> both 200s fold into text/html
    assert stats[(200, "text/html")] == (2, len(b"<p>ok</p>") + len(b"<p>okok</p>"))
    assert stats[(404, "text/plain")] == (1, 4)
    assert stats[(301, "application/octet-stream")] == (1, 2)


def test_warc_status_parse_is_lenient(spark, tmp_path):
    from xmlschemavalidator_spark.sources.warc import (
        read_warc_response_meta,
        write_fake_warc,
    )

    # hand-corrupt the status line: replace "HTTP/1.1 200 X" with garbage
    p = str(tmp_path / "c.warc")
    write_fake_warc(p, [{"url": "http://c/1", "warc_ts": "2024-05-01T00:00:00Z",
                         "html": b"zz", "status": 200}])
    data = open(p, "rb").read().replace(b"HTTP/1.1 200 X", b"HTTP-IS BROKEN")
    # keep Content-Length valid: pad to the original envelope length
    data = data.replace(b"HTTP-IS BROKEN", b"HTTP-IS BROKEN")
    open(p, "wb").write(data)
    [r] = read_warc_response_meta(spark, p).collect()
    assert r["http_status"] is None  # lenient: malformed status -> NULL
