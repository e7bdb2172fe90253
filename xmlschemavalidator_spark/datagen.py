"""Deterministic synthetic web-page table (the BASELINE.json ``input_hint``
shape) + the html→text extraction pair.

Schema: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`` — Common-Crawl-style pages.

Generation is **pure Catalyst expressions over** ``spark.range(n)``: every
column derives from ``xxhash64(id, seed)`` arithmetic, so the table

* is bit-deterministic for a given (n, seed) at ANY parallelism,
* needs no driver-side materialization (generates 10^12 rows as happily as
  10^3 — the only cost is the scan it feeds),
* embeds planted violations at fixed rates for every engine check:
  FIXTURES.md §1 — ~2% out-of-enum langs, ~1% null text, ~1% domains
  missing from the dim table, ~0.5% duplicate urls, ~0.2% corrupted html
  (breaks the extract invariant), hot-key skew on lang ('en' ≈ 60%) and on
  two hot domains.

The extraction invariant: ``extract_text(html) == text`` byte-identically,
except for the planted corrupted rows. ``render_html`` and ``extract_text``
are exact inverses by construction (we control both ends — SURVEY.md §7
"hard parts"). ``extract_text`` ships in two equivalent forms: a Catalyst
expression (JVM fast path) and an Arrow-batched pandas UDF
(``extract_text_pandas``) proving the vectorized-UDF plumbing the
input_hint requires — never per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tiny embedded vocabulary — deterministic lorem-like tokens.
_VOCAB = (
    "the a data web page crawl index query spark rule schema valid facet "
    "type union choice range pattern length text html lang url partition "
    "shuffle join hash sketch drift stats batch stream scale byte token"
).split()

_LANGS_VALID = ["en", "de", "sv", "fr", "zh"]
_LANGS_BAD = ["xx", "yy"]
_DOMAINS = [f"site{i}.example.org" for i in range(18)] + [
    "hot-a.example.org",
    "hot-b.example.org",
]

_HTML_PREFIX = "<html><head><title>p</title></head><body>"
_HTML_SUFFIX = "</body></html>"


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic 64-bit hash stream: xxhash64 of (cols..., seed)."""
    return F.xxhash64(*cols, F.lit(seed))


def _pick(arr: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx % len(arr) + 1).cast("int"))


def render_html(text: Column) -> Column:
    """text → html binary; exact inverse of :func:`extract_text`."""
    return F.encode(F.concat(F.lit(_HTML_PREFIX), text, F.lit(_HTML_SUFFIX)), "UTF-8")


def extract_text(html: Column) -> Column:
    """html binary → text, byte-identical to the text it was rendered from
    (the per-row invariant of BASELINE.json input_hint). Catalyst-only:
    decode + fixed-affix strip — whole-stage-codegen friendly."""
    s = F.decode(html, "UTF-8")
    return F.substring(
        s, len(_HTML_PREFIX) + 1, F.length(s) - len(_HTML_PREFIX) - len(_HTML_SUFFIX)
    )


def _extract_text_batch(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8") if b is not None else None)
    return s.str.slice(len(_HTML_PREFIX), -len(_HTML_SUFFIX))


def extract_text_pandas(html: Column) -> Column:
    """Arrow-batched pandas UDF form of :func:`extract_text` — the shape
    real extraction (an HTML parser) would take. Vectorized over the whole
    Arrow batch; no per-row Python function calls in the Spark row loop.
    (Wrapped lazily: pandas_udf needs an active SparkSession to parse the
    return type, so decoration at import time would fail.)"""
    return pandas_udf(_extract_text_batch, "string")(html)


def pages(spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """The deterministic pages table. See module docstring for planted-defect
    rates. ``partitions`` controls input parallelism (defaults to Spark's)."""
    df = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    idc = F.col("id")

    # --- text: 3..40 vocab words picked by a per-(row, position) hash ------
    n_words = (F.pmod(_h(seed + 1, idc), F.lit(38)) + 3).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: _pick(_VOCAB, F.pmod(_h(seed + 2, idc, i), F.lit(len(_VOCAB)))),
    )
    text = F.array_join(words, " ")
    # ~1% null text
    text = F.when(F.pmod(_h(seed + 3, idc), F.lit(100)) == 0, F.lit(None)).otherwise(text)

    # --- lang: skewed enum + ~2% invalid --------------------------------
    r = F.pmod(_h(seed + 4, idc), F.lit(100))
    lang = (
        F.when(r < 2, _pick(_LANGS_BAD, F.pmod(_h(seed + 5, idc), F.lit(2))))
        .when(r < 62, F.lit("en"))  # hot key: ~60%
        .when(r < 74, F.lit("de"))
        .when(r < 84, F.lit("sv"))
        .when(r < 93, F.lit("fr"))
        .otherwise(F.lit("zh"))
    )

    # --- domain: 2 hot domains ~20% each, ~1% missing from the dim --------
    d = F.pmod(_h(seed + 6, idc), F.lit(100))
    domain = (
        F.when(d < 1, F.concat(F.lit("unknown"), F.pmod(_h(seed + 7, idc), F.lit(50)).cast("string"), F.lit(".example.net")))
        .when(d < 21, F.lit("hot-a.example.org"))
        .when(d < 41, F.lit("hot-b.example.org"))
        .otherwise(_pick(_DOMAINS[:18], F.pmod(_h(seed + 8, idc), F.lit(18))))
    )

    # --- url: ~0.5% exact duplicates via a tiny fixed pool ----------------
    dup = F.pmod(_h(seed + 9, idc), F.lit(200)) == 0
    url = F.when(
        dup,
        F.concat(F.lit("https://dup.example.org/page/"), F.pmod(idc, F.lit(7)).cast("string")),
    ).otherwise(
        F.concat(
            F.lit("https://"), domain, F.lit("/p/"),
            F.conv(F.abs(_h(seed + 10, idc)).cast("string"), 10, 16),
        )
    )

    # --- warc_ts: deterministic second in 2024 ----------------------------
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(_h(seed + 11, idc), F.lit(365 * 24 * 3600))
    )

    # --- html: render(text); ~0.2% corrupted (invariant violations) -------
    corrupt = F.pmod(_h(seed + 12, idc), F.lit(500)) == 0
    html_text = F.when(corrupt, F.concat(F.coalesce(text, F.lit("")), F.lit(" [CORRUPTED]"))).otherwise(
        F.coalesce(text, F.lit(""))
    )
    html = render_html(html_text)

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def documents(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic documents-shaped corpus ``(doc_id, text, lang,
    source, n_chars)`` at arbitrary row counts — the scale-rehearsal
    input (the sf testdata tops out at 5k docs). Same planted-defect
    philosophy as :func:`pages`: ~1% NULL text, ~2% invalid lang,
    ~0.5% exact-duplicate text pool (exercises dedup), n_chars consistent
    except ~0.2% (exercises the ExprRule). Pure column expressions over
    ``spark.range`` — generation parallelizes like any narrow job."""
    df = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)
    idc = F.col("id")
    n_words = (F.pmod(_h(seed + 21, idc), F.lit(38)) + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: _pick(_VOCAB, F.pmod(_h(seed + 22, idc, i), F.lit(len(_VOCAB)))),
    )
    text = F.array_join(words, " ")
    dup = F.pmod(_h(seed + 23, idc), F.lit(200)) == 0
    text = F.when(
        dup,
        F.concat(F.lit("duplicated boilerplate body number "),
                 F.pmod(idc, F.lit(7)).cast("string")),
    ).otherwise(text)
    text = F.when(F.pmod(_h(seed + 24, idc), F.lit(100)) == 0, F.lit(None)).otherwise(text)
    r = F.pmod(_h(seed + 25, idc), F.lit(100))
    lang = (
        F.when(r < 2, _pick(_LANGS_BAD, F.pmod(_h(seed + 26, idc), F.lit(2))))
        .when(r < 62, F.lit("en"))
        .when(r < 74, F.lit("de"))
        .when(r < 84, F.lit("sv"))
        .when(r < 93, F.lit("fr"))
        .otherwise(F.lit("zh"))
    )
    source = F.concat(F.lit("src"), F.pmod(_h(seed + 27, idc), F.lit(40)).cast("string"))
    n_chars = F.length(F.coalesce(text, F.lit("")))
    n_chars = F.when(
        F.pmod(_h(seed + 28, idc), F.lit(500)) == 0, n_chars + F.lit(7)
    ).otherwise(n_chars)
    return df.select(
        idc.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        n_chars.cast("int").alias("n_chars"),
    )


def domains_dim(spark: SparkSession) -> DataFrame:
    """The small dimension table for referential checks (FIXTURES.md §3) —
    broadcast-join sized by construction."""
    rows = [(d, "SE" if i % 3 == 0 else "US") for i, d in enumerate(_DOMAINS)]
    return spark.createDataFrame(rows, "domain string, country string")


def url_domain(url: Column) -> Column:
    """Extract the domain from a url — shared by generator and checks."""
    return F.regexp_extract(url, r"^https://([^/]+)/", 1)
