"""WARC (Web ARChive) source: Common-Crawl's native format → pages rows.

Layout of a WARC file (ISO 28500): a sequence of records, each

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...      (incl. Content-Length, WARC-Type,
    \\r\\n                                  WARC-Target-URI, WARC-Date)
    <Content-Length bytes of block>\\r\\n\\r\\n

For ``WARC-Type: response`` records the block is an HTTP response: status
line + headers, ``\\r\\n\\r\\n``, then the payload (the HTML).

Spark shape: ``spark.read.format("binaryFile")`` scans the archive files
(one row per file — WARC files are written at a bounded size, ~1 GB in
Common Crawl, so a file is a natural split unit and parallelism = #files),
then ONE ``mapInPandas`` pass parses records per Arrow batch. Parsing is
pure bytes work; no shuffle. gzip members (``.warc.gz``) are handled via
``gzip.decompress`` per file.

The parser is lenient: malformed records are skipped (never fail the job —
at crawl scale some corruption is a certainty) and unreadable files are
reported by :func:`read_warc_errors`, which scans the same inputs and
returns one row per undecodable/recordless file so losses are visible.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "warc_file string, record_offset long, content_type string"
)

_CRLF = b"\r\n"


def _dechunk(data: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (hex size line,
    chunk bytes, CRLF, ... , 0-chunk). Lenient: any malformed size line
    returns the raw bytes unchanged — at crawl scale a mis-declared
    encoding must yield a recoverable payload, not an exception."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        line_end = data.find(_CRLF, pos)
        if line_end < 0:
            return bytes(data)
        size_tok = data[pos:line_end].split(b";", 1)[0].strip()
        # strict hex digits only: int(x, 16) also accepts '-6'/'+6'/'0x6'
        # — a negative size moves pos BACKWARDS and loops forever while
        # appending (review finding, reproduced live)
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            return bytes(data)
        size = int(size_tok, 16)
        if size == 0:
            break
        chunk_start = line_end + 2
        out += data[chunk_start : chunk_start + size]
        pos = chunk_start + size + 2  # skip the chunk's trailing CRLF
    return bytes(out)


def _parse_warc_bytes(
    data: bytes, fname: str, record_type: str = "response"
) -> list[dict]:
    """Parse one WARC file's bytes into record dicts of the given
    WARC-Type. ``response`` records carry an HTTP envelope to strip;
    ``conversion`` records (Common Crawl WET — pre-extracted text) are
    the payload directly."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(_CRLF)[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.decode("latin-1").strip().lower()] = v.decode(
                    "latin-1"
                ).strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        block_start = head_end + 4
        block = data[block_start : block_start + length]
        pos = block_start + length
        if headers.get("warc-type") != record_type:
            continue
        content_type = None
        http_status = None
        if record_type == "response":
            # strip the HTTP response envelope to reach the payload;
            # honor the two envelope headers crawl pipelines need:
            # Content-Type (text/html filtering) and Transfer-Encoding
            # (real crawls capture chunked responses verbatim — the
            # chunk framing is NOT page bytes)
            http_end = block.find(_CRLF + _CRLF)
            payload = block[http_end + 4 :] if http_end >= 0 else block
            # status from the HTTP status line ("HTTP/1.1 200 OK") —
            # lenient like everything else here: malformed → None
            line_end = block.find(_CRLF)
            if line_end > 0:
                toks = block[:line_end].split()
                if (
                    len(toks) >= 2
                    and toks[0].startswith(b"HTTP/")
                    and toks[1].isdigit()
                ):
                    http_status = int(toks[1])
            if http_end >= 0:
                chunked = False
                for hline in block[:http_end].split(_CRLF)[1:]:
                    if b":" not in hline:
                        continue
                    hk, _, hv = hline.partition(b":")
                    hk = hk.decode("latin-1").strip().lower()
                    if hk == "content-type":
                        content_type = hv.decode("latin-1").strip()
                    elif hk == "transfer-encoding":
                        chunked = b"chunked" in hv.lower()
                if chunked:
                    payload = _dechunk(payload)
        else:
            payload = block
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_ts": headers.get("warc-date"),
                "html": payload,
                "warc_file": fname,
                "record_offset": head_start,
                "content_type": content_type,
                "http_status": http_status,
            }
        )
    return out


def _safe_gunzip(data: bytes) -> bytes | None:
    """Decompress or None — gzip.decompress raises OSError (BadGzipFile)
    on bad magic but EOFError on truncation and zlib.error on stream
    corruption; an OSError-only catch turned one truncated crawl file
    into a whole-job failure (review finding, reproduced: EOFError is
    not an OSError)."""
    try:
        return gzip.decompress(data)
    except (OSError, EOFError, zlib.error):
        return None


def _records_frame(
    spark: SparkSession,
    path: str,
    record_type: str,
    finish_row,
    columns: list[str] | None = None,
    schema: str = PAGES_SCHEMA,
) -> DataFrame:
    """The shared binaryFile + one-mapInPandas scaffold behind
    :func:`read_warc`, :func:`read_wet` and :func:`read_wat`: per file,
    gunzip leniently, parse records of ``record_type``, let
    ``finish_row`` fill the payload-derived columns, coerce timestamps
    (one malformed WARC-Date must not fail the job either)."""
    files = spark.read.format("binaryFile").load(path)
    cols = columns or [
        "url", "warc_ts", "html", "text", "lang",
        "warc_file", "record_offset", "content_type",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fname, content in zip(b["path"], b["content"]):
                data = bytes(content)
                if fname.endswith(".gz"):
                    gunzipped = _safe_gunzip(data)
                    if gunzipped is None:
                        continue  # unreadable: reported by read_warc_errors
                    data = gunzipped
                for rec in _parse_warc_bytes(data, fname, record_type):
                    if finish_row(rec) is False:  # finisher may drop a record
                        continue
                    rows.append(rec)
            df = pd.DataFrame(rows, columns=cols)
            if len(df):
                df["warc_ts"] = pd.to_datetime(
                    df["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
            yield df

    return files.select("path", "content").mapInPandas(run, schema)


def read_warc(
    spark: SparkSession,
    path: str,
    extract_text_fn=None,
) -> DataFrame:
    """WARC archive(s) → pages DataFrame in the input_hint shape.

    ``extract_text_fn``: optional ``bytes -> str`` used to fill ``text``
    (defaults to the engine's deterministic extractor so the byte-identical
    invariant can be validated straight off the crawl; swap in a real HTML
    parser in production). ``lang`` is left null — language ID is a
    downstream op (textops.lang_id).
    """
    from xmlschemavalidator_spark.datagen import _HTML_PREFIX, _HTML_SUFFIX

    def default_extract(b: bytes) -> str | None:
        s = b.decode("utf-8", errors="replace")
        if s.startswith(_HTML_PREFIX) and s.endswith(_HTML_SUFFIX):
            return s[len(_HTML_PREFIX) : -len(_HTML_SUFFIX)]
        return None

    extract = extract_text_fn or default_extract

    def finish(rec: dict) -> None:
        rec["text"] = extract(rec["html"]) if rec["html"] else None
        rec["lang"] = None

    return _records_frame(spark, path, "response", finish)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WET archive(s) → pages DataFrame: ``conversion``
    records hold the crawl's pre-extracted plain text, so ``text`` is
    the utf-8-decoded payload and ``html`` is null (there is none in a
    WET file). Same binaryFile + one-mapInPandas shape as
    :func:`read_warc`; ``lang`` is left null for downstream language ID.
    """

    def finish(rec: dict) -> None:
        payload = rec.pop("html")
        rec["html"] = None
        rec["text"] = (
            payload.decode("utf-8", errors="replace")
            if payload is not None
            else None
        )
        rec["lang"] = None

    return _records_frame(spark, path, "conversion", finish)


WAT_SCHEMA = (
    "url string, warc_ts timestamp, wat_json string, "
    "warc_file string, record_offset long"
)


def read_wat(
    spark: SparkSession, path: str, source_record_type: str | None = "response"
) -> DataFrame:
    """Common Crawl WAT archive(s) → ``(url, warc_ts, wat_json, ...)``:
    ``metadata`` records whose payload is the per-page JSON envelope
    (headers, outlinks, title — everything but the content). The
    link-graph ingestion path that never parses HTML: pair with
    :func:`weburl.wat_outlinks` to pull the outlink array straight from
    the JSON. Same binaryFile + one-mapInPandas shape as
    :func:`read_warc`.

    Real CC WAT files hold one ``metadata`` record per underlying WARC
    record — warcinfo, *request* AND *response* — so a naive read yields
    ~3 rows per capture (two sharing the page URL), inflating
    URL-keyed joins. Each payload declares its source record in
    ``Envelope.WARC-Header-Metadata.WARC-Type``; by default only
    ``response``-derived rows (the ones carrying HTML-Metadata.Links)
    are kept — records that are malformed JSON or that do not declare a
    source type are dropped with them. Pass ``source_record_type=None``
    to keep every metadata record unfiltered.
    """
    import json

    def finish(rec: dict):
        payload = rec.pop("html")
        rec["wat_json"] = (
            payload.decode("utf-8", errors="replace")
            if payload is not None
            else None
        )
        if source_record_type is None:
            return None
        try:
            envelope = json.loads(rec["wat_json"])["Envelope"]
            src = envelope["WARC-Header-Metadata"]["WARC-Type"]
        except (TypeError, ValueError, KeyError):
            return False
        return None if src == source_record_type else False

    return _records_frame(
        spark,
        path,
        "metadata",
        finish,
        columns=["url", "warc_ts", "wat_json", "warc_file", "record_offset"],
        schema=WAT_SCHEMA,
    )


def write_fake_wat(path: str, rows_in: list[dict], gz: bool = False) -> str:
    """Serialize (url, warc_ts iso-string, wat_json str) dicts into a
    spec-shaped WAT file (metadata records, JSON payload)."""
    buf = bytearray()
    for r in rows_in:
        payload = r["wat_json"].encode("utf-8")
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: metadata\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n"
        ).encode("latin-1")
        buf += headers + payload + _CRLF + _CRLF
    data = bytes(buf)
    if gz:
        data = gzip.compress(data)
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def write_fake_wet(path: str, rows_in: list[dict], gz: bool = False) -> str:
    """Serialize (url, warc_ts iso-string, text str) dicts into a
    spec-shaped WET file (conversion records, no HTTP envelope)."""
    buf = bytearray()
    for r in rows_in:
        payload = r["text"].encode("utf-8")
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n"
        ).encode("latin-1")
        buf += headers + payload + _CRLF + _CRLF
    data = bytes(buf)
    if gz:
        data = gzip.compress(data)
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def write_fake_warc(
    path: str, pages_rows: list[dict], gz: bool = False, chunked: bool = False
) -> str:
    """Serialize page dicts (url, warc_ts iso-string, html bytes;
    optional status int and content_type str — default 200/text/html)
    into a spec-shaped WARC file — the test fixture generator (we
    control both ends, mirroring the datagen render/extract inverse
    pair). ``chunked`` wraps each body in HTTP/1.1 chunked transfer
    framing (as real crawls capture it)."""
    buf = bytearray()
    for r in pages_rows:
        body = r["html"]
        status = int(r.get("status", 200))
        ctype = r.get("content_type", "text/html")
        if chunked:
            half = max(1, len(body) // 2)
            body = b"".join(
                f"{len(part):x}".encode() + _CRLF + part + _CRLF
                for part in (body[:half], body[half:])
                if part
            ) + b"0" + _CRLF + _CRLF
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}".encode("latin-1")
            + (b"\r\nTransfer-Encoding: chunked" if chunked else b"")
            + b"\r\n\r\n"
            + body
        )
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"\r\n"
        ).encode("latin-1")
        buf += headers + http + _CRLF + _CRLF
    data = bytes(buf)
    if gz:
        data = gzip.compress(data)
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def read_warc_errors(spark: SparkSession, path: str) -> DataFrame:
    """Per-file corruption report: ``(warc_file, error)`` for files that
    cannot be decompressed or contain no parseable response record despite
    being non-empty. Pair with :func:`read_warc` so silent loss is
    impossible: records come from one, losses from the other."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fname, content in zip(b["path"], b["content"]):
                data = bytes(content)
                if fname.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)
                    except (OSError, EOFError, zlib.error) as e:
                        rows.append({"warc_file": fname, "error": f"gzip: {e}"})
                        continue
                if len(data) > 0 and not _parse_warc_bytes(data, fname):
                    rows.append({"warc_file": fname, "error": "no parseable response records"})
            yield pd.DataFrame(rows, columns=["warc_file", "error"])

    return files.select("path", "content").mapInPandas(run, "warc_file string, error string")


RESPONSE_META_SCHEMA = (
    "url string, warc_ts timestamp, warc_file string, record_offset long, "
    "content_type string, http_status int, n_payload_bytes long"
)


def read_warc_response_meta(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) → response ENVELOPE metadata only (no payload
    column): ``(url, warc_ts, warc_file, record_offset, content_type,
    http_status, n_payload_bytes)`` — the crawl-triage projection.
    Reading metadata without shipping page bytes through the plan is
    the cheap first pass every CC pipeline runs before deciding what to
    extract; same binaryFile + one-mapInPandas scaffold as
    :func:`read_warc`."""

    def finish(rec: dict) -> None:
        rec["n_payload_bytes"] = len(rec["html"]) if rec["html"] is not None else 0

    return _records_frame(
        spark,
        path,
        "response",
        finish,
        columns=[
            "url", "warc_ts", "warc_file", "record_offset",
            "content_type", "http_status", "n_payload_bytes",
        ],
        schema=RESPONSE_META_SCHEMA,
    )


def warc_response_stats(meta: DataFrame) -> DataFrame:
    """Status × MIME triage table over response metadata:
    ``(http_status, mime, n, total_payload_bytes)`` with ``mime`` the
    Content-Type value lower-cased and stripped of parameters
    (``text/html; charset=utf-8`` → ``text/html``; missing → NULL) —
    the first question asked of any crawl slice (how much is 200
    text/html?) and the fetch-health drift input. ONE
    partial-aggregatable groupBy, bounded by |status|×|mime|."""
    from pyspark.sql import functions as F

    mime = F.lower(F.trim(F.split_part(F.col("content_type"), F.lit(";"), F.lit(1))))
    return (
        meta.select(
            F.col("http_status"),
            F.when(F.col("content_type").isNotNull(), mime).alias("mime"),
            F.col("n_payload_bytes"),
        )
        .groupBy("http_status", "mime")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_payload_bytes").cast("bigint").alias("total_payload_bytes"),
        )
    )
