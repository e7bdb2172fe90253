"""URL & web-graph layer (weburl.py): canonicalization edge cases,
dedup/cap determinism, link extraction, and integer PageRank vs a pure
Python reference of the same arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.weburl import (
    canonical_host,
    canonical_url,
    degree_stats,
    domain_cap,
    domain_quality_gate,
    extract_links,
    pagerank,
    registered_domain,
    url_badword_filter,
    url_dedup,
)

from tests.conftest import rows


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "u string")
    return [r[0] for r in df.select(col_fn(F.col("u"))).collect()]


CANON_CASES = [
    # scheme+host lowercased, www stripped, default port dropped, frag dropped
    ("HTTPS://WWW.Example.COM:443/a/b/?x=1#frag",
     "https://example.com/a/b?x=1"),
    # userinfo dropped; non-default port kept; duplicate slashes collapsed
    ("http://User:Pw@sub.Shop.example.org:8080//catalog//x/",
     "http://sub.shop.example.org:8080/catalog/x"),
    # empty path -> '/', empty query dropped
    ("https://example.net?", "https://example.net/"),
    ("http://example.net:80/path", "http://example.net/path"),
    # tracking params removed, survivors sorted; '?' dropped when empty
    ("http://a.com/p?utm_source=tw&b=2&a=1", "http://a.com/p?a=1&b=2"),
    ("http://a.com/p?utm_campaign=x&fbclid=z", "http://a.com/p"),
    # root slash preserved
    ("http://a.com/", "http://a.com/"),
    # no scheme: pass through trimmed
    ("  relative/path?a=1 ", "relative/path?a=1"),
    (None, None),
]


def test_canonical_url_cases(spark):
    got = _eval(spark, canonical_url, [c[0] for c in CANON_CASES])
    assert got == [c[1] for c in CANON_CASES]


def test_canonical_url_keep_www(spark):
    got = _eval(
        spark,
        lambda c: canonical_url(c, strip_www=False),
        ["http://www.a.com/x"],
    )
    assert got == ["http://www.a.com/x"]


def test_canonical_host_and_registered_domain(spark):
    urls = [
        "https://WWW.news.Example.co.uk:443/x",
        "http://blog.test.org/y",
        "http://example.com/",
        "http://localhost/z",
        "http://1.2.3.4:8080/w",
    ]
    hosts = _eval(spark, lambda c: canonical_host(canonical_url(c)), urls)
    assert hosts == [
        "news.example.co.uk", "blog.test.org", "example.com",
        "localhost", "1.2.3.4",
    ]
    doms = _eval(
        spark,
        lambda c: registered_domain(canonical_host(canonical_url(c))),
        urls,
    )
    assert doms == [
        "example.co.uk", "test.org", "example.com", "localhost", "1.2.3.4",
    ]


def test_url_dedup_keeps_longest_then_smallest_id(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=t", 10),
            (2, "http://a.com/x", 30),        # longest for a.com/x -> kept
            (3, "http://a.com/x/", 30),       # tie with 2 on length: id 2 wins
            (4, "http://b.com/y", 5),         # unique -> kept
        ],
        "doc_id long, url string, n_chars long",
    )
    kept = url_dedup(df)
    assert rows(kept, "doc_id") == [(2,), (4,)]
    # canonical column is exposed on the kept rows
    assert "canonical_url" in kept.columns


def test_domain_cap_exact_and_salt_invariant(spark):
    data = [(i, f"d{i % 3}", (i * 7) % 50) for i in range(90)]
    df = spark.createDataFrame(data, "doc_id long, domain string, score long")
    capped = domain_cap(df, "domain", cap=5, order_col="score")
    # expected: per domain, top 5 by (score desc, doc_id asc)
    expect = []
    for d in ("d0", "d1", "d2"):
        grp = sorted(
            (r for r in data if r[1] == d), key=lambda r: (-r[2], r[0])
        )[:5]
        expect.extend((r[0],) for r in grp)
    assert rows(capped, "doc_id") == sorted(expect)
    # salting never changes the result set
    one_salt = domain_cap(df, "domain", cap=5, order_col="score", n_salts=1)
    assert rows(one_salt, "doc_id") == rows(capped, "doc_id")


def test_domain_cap_no_order_col_takes_smallest_ids(spark):
    df = spark.createDataFrame(
        [(i, "d") for i in range(20, 0, -1)], "doc_id long, domain string"
    )
    capped = domain_cap(df, "domain", cap=3)
    assert rows(capped, "doc_id") == [(1,), (2,), (3,)]


def test_url_badword_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "http://casino-royale.com/x"),
            (2, "http://example.com/Poker/tips"),
            (3, "http://example.com/cooking"),
        ],
        "doc_id long, url string",
    )
    kept = url_badword_filter(df, "url", ["casino", "poker"])
    assert rows(kept, "doc_id") == [(3,)]


def test_domain_quality_gate_exact_boundary(spark):
    # d_hi avg 20, d_lo avg 10, d_edge avg exactly 15
    df = spark.createDataFrame(
        [(1, "d_hi", 15), (2, "d_hi", 25),
         (3, "d_lo", 5), (4, "d_lo", 15),
         (5, "d_edge", 15), (6, "d_edge", 15)],
        "doc_id long, domain string, score long",
    )
    kept = domain_quality_gate(df, "domain", "score", min_avg=15.0)
    assert rows(kept, "doc_id") == [(1,), (2,), (5,), (6,)]


def test_extract_links(spark):
    html = (
        '<html><a href="http://a.com/1">one</a>'
        "<A HREF='http://b.com/2' rel=nofollow>two</A>"
        '<a class="x" data-href="http://no.com">not a link</a>'
        '<a href = "http://c.com/3#f">three</a></html>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    links = df.select(extract_links(F.col("html")).alias("l")).collect()[0][0]
    assert links == ["http://a.com/1", "http://b.com/2", "http://c.com/3#f"]


def test_degree_stats(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (1, 2)], "src long, dst long"
    )
    got = rows(degree_stats(edges), "node", "out_deg", "in_deg")
    assert got == [(1, 2, 1), (2, 1, 1), (3, 1, 2)]


def _pagerank_py(edges, iterations=10, damping_pct=85, scale=10**12):
    """Pure-Python replay of the exact integer arithmetic."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    out_deg = {}
    for s, _ in e:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        sums = {}
        for s, d in e:
            sums[d] = sums.get(d, 0) + rank[s] // out_deg[s]
        rank = {
            v: base + (damping_pct * sums.get(v, 0)) // 100 for v in nodes
        }
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        # star: hub 0 referenced by all spokes
        [(i, 0) for i in range(1, 8)] + [(0, 1)],
        # ring + chord
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)],
    ],
)
def test_pagerank_matches_python_reference(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict(rows(pagerank(df, iterations=6), "node", "rank_micro"))
    assert got == _pagerank_py(edges, iterations=6)


def test_pagerank_hub_outranks_leaf_spokes(spark):
    # node 1 receives the hub's ENTIRE mass each round (hub out_deg 1), so
    # hub and node 1 trade the top slot on a slowly-decaying 2-cycle; the
    # stable property is that both dwarf the leaf spokes 2..9, which only
    # ever hold the teleport base.
    edges = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = dict(rows(pagerank(df, iterations=10), "node", "rank_micro"))
    leaf_max = max(v for k, v in r.items() if k not in (0, 1))
    assert r[0] > 10 * leaf_max and r[1] > 10 * leaf_max
    assert r == _pagerank_py(edges, iterations=10)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_url_dedup_null_length_loses(spark):
    """Review regression: struct-min orders a NULL field first, so an
    un-coalesced NULL-length doc used to beat the longest text."""
    df = spark.createDataFrame(
        [(1, "http://a.com/x", None), (2, "http://a.com/x", 5000)],
        "doc_id long, url string, n_chars long",
    )
    assert rows(url_dedup(df), "doc_id") == [(2,)]


# --------------------------------------------------------------------------
# HyperBall harmonic centrality
# --------------------------------------------------------------------------

def _hyperball_py(edges, iterations=8):
    """Pure-Python replay of the exact sketch arithmetic."""
    import hashlib

    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    C = 0.709 * 64 * 64 * float(2**59)

    def reg(n):
        h = hashlib.md5(f"hb:{n}".encode()).hexdigest()
        j = int(h[0:4], 16) % 64
        v = int(h[4:18], 16)
        return j, (57 - v.bit_length()) if v else 57

    state = {n: {} for n in nodes}
    for n in nodes:
        j, rho = reg(n)
        state[n][j] = rho

    def ssum(regs):
        return sum(1 << (59 - m) for m in regs.values()) + (
            64 - len(regs)
        ) * (1 << 59)

    sums = {n: [ssum(state[n])] for n in nodes}
    for _ in range(iterations):
        new = {n: dict(state[n]) for n in nodes}
        for s, d in e:
            for j, rho in state[s].items():
                if new[d].get(j, -1) < rho:
                    new[d][j] = rho
        state = new
        for n in nodes:
            sums[n].append(ssum(state[n]))
    out = {}
    for n in nodes:
        est = [C / float(s) for s in sums[n]]
        h = (est[1] - est[0]) / 1.0
        for t in range(2, iterations + 1):
            h = h + (est[t] - est[t - 1]) / float(t)
        out[n] = h
    return out


def test_hyperball_matches_python_sketch_replay(spark):
    from xmlschemavalidator_spark.weburl import hyperball_harmonic

    edges = [(i, (i + 1) % 10) for i in range(10)] + [(i, 0) for i in range(2, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict(rows(hyperball_harmonic(df, iterations=4), "node", "harmonic"))
    ref = _hyperball_py(edges, iterations=4)
    assert set(got) == set(ref)
    for n, h in got.items():
        assert abs(h - ref[n]) <= 2e-4, (n, h, ref[n])


def test_hyperball_ranks_the_reachability_hub_first(spark):
    from xmlschemavalidator_spark.weburl import hyperball_harmonic

    # hub 0 is reachable from every spoke in 1 hop; spokes are reached
    # only via the single chain edge — exact harmonic centrality of the
    # hub dwarfs the rest, and the sketch must agree on the argmax
    edges = [(i, 0) for i in range(1, 20)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict(rows(hyperball_harmonic(df, iterations=3), "node", "harmonic"))
    top = max(got, key=got.get)
    assert top == 0


# --------------------------------------------------------------------------
# robots.txt
# --------------------------------------------------------------------------

ROBOTS_A = (
    "User-agent: Google\nDisallow: /g\n\n"
    "User-agent: *\nDisallow: /private/\nDisallow:\nDisallow: /tmp\n"
    "User-agent: Bing\nDisallow: /b"
)


def test_robots_disallow_prefixes(spark):
    from xmlschemavalidator_spark.weburl import robots_disallow_prefixes

    df = spark.createDataFrame([(ROBOTS_A,), ("User-agent: *\nDisallow: /",)],
                               "t string")
    got = [r[0] for r in df.select(robots_disallow_prefixes(F.col("t"))).collect()]
    # wildcard group only (not Google's /g or Bing's /b); empty Disallow dropped
    assert got == [["/private/", "/tmp"], ["/"]]


def test_robots_filter(spark):
    from xmlschemavalidator_spark.weburl import robots_filter

    docs = spark.createDataFrame(
        [
            (1, "http://a.com/private/x"),   # blocked by prefix
            (2, "http://a.com/tmpfile"),     # blocked: /tmp prefix matches
            (3, "http://a.com/public"),      # kept
            (4, "http://a.com/g"),           # kept: /g is Google's rule
            (5, "http://blocked.com/any"),   # blocked: Disallow: /
            (6, "http://norobots.com/x"),    # kept: no robots row
            (7, "http://WWW.A.com/private/y"),  # host canonicalization applies
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("blocked.com", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    kept = robots_filter(docs, "url", robots)
    assert rows(kept, "doc_id") == [(3,), (4,), (6,)]
    assert set(kept.columns) == {"doc_id", "url"}


def test_robots_group_regex_hardening(spark):
    """Review regressions: a comment mentioning 'user-agent: *' must not
    hijack the group; stacked User-agent lines share the rule block."""
    from xmlschemavalidator_spark.weburl import robots_disallow_prefixes

    cases = [
        ("# see user-agent: * notes\nUser-agent: Googlebot\nDisallow: /g\n"
         "User-agent: *\nDisallow: /real", ["/real"]),
        ("User-agent: *\nUser-agent: Googlebot\nDisallow: /x\n\n"
         "User-agent: Bing\nDisallow: /b", ["/x"]),
        ("User-agent: *\r\nDisallow: /a\r\nUser-agent: B\r\nDisallow: /c",
         ["/a"]),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r[0] for r in df.select(robots_disallow_prefixes(F.col("t"))).collect()]
    assert got == [want for _, want in cases]


def test_robots_filter_directory_index_and_merged_hosts(spark):
    """Review regressions: 'Disallow: /x/' must block the directory index
    '/x/' itself (raw path, not the canonical trailing-slash-stripped
    form), and duplicate robots rows normalizing to one host must merge
    instead of fan-out-duplicating kept docs."""
    from xmlschemavalidator_spark.weburl import robots_filter

    docs = spark.createDataFrame(
        [
            (1, "http://a.com/private/"),   # directory index: blocked
            (2, "http://a.com/open"),       # kept — exactly once
            (3, "http://a.com/extra/x"),    # blocked by the www row's rule
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/"),
            ("www.a.com", "User-agent: *\nDisallow: /extra/"),
        ],
        "host string, robots_txt string",
    )
    kept = robots_filter(docs, "url", robots)
    assert rows(kept, "doc_id") == [(2,)]
    assert kept.count() == 1  # no join fan-out duplication


# --------------------------------------------------------------------------
# triangle counting
# --------------------------------------------------------------------------

def _triangles_py(edges):
    """Brute-force reference: per-node triangle membership counts."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts = {}
    import itertools

    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize(
    "edges",
    [
        [(i, j) for i in range(4) for j in range(i + 1, 4)],  # K4
        # hub + ring + noise, duplicates and reversed edges included
        [(i, (i + 1) % 8) for i in range(8)]
        + [(0, i) for i in range(2, 7)]
        + [(3, 2), (2, 3), (5, 5)],
    ],
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from xmlschemavalidator_spark.weburl import triangle_count

    df = spark.createDataFrame(edges, "src long, dst long")
    got = dict(rows(triangle_count(df), "node", "n_triangles"))
    assert got == _triangles_py(edges)


def test_triangle_count_triangle_free(spark):
    from xmlschemavalidator_spark.weburl import triangle_count

    # bipartite graph: no triangles at all
    edges = [(i, 10 + j) for i in range(4) for j in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).count() == 0


def test_snapshot_dedup_keeps_newest_then_smallest_id(spark):
    from xmlschemavalidator_spark.weburl import snapshot_dedup

    df = spark.createDataFrame(
        [
            # a.com/x: three captures — newest ts wins
            (1, "http://A.com/x?utm_source=t", 1_700_000_000),
            (2, "http://a.com/x", 1_700_086_400),
            (3, "http://a.com/x/", 1_700_000_500),
            # b.com/y: ts tie — smaller id wins
            (4, "http://b.com/y", 1_700_000_000),
            (5, "http://b.com/y/", 1_700_000_000),
            # c.com/z: NULL ts loses to any dated capture
            (6, "http://c.com/z", None),
            (7, "http://c.com/z/", 1_600_000_000),
            # d.com/w: all captures undated — smallest id wins
            (8, "http://d.com/w", None),
            (9, "http://d.com/w/", None),
        ],
        "doc_id long, url string, warc_ts long",
    )
    kept = snapshot_dedup(df)
    assert rows(kept, "doc_id") == [(2,), (4,), (7,), (8,)]
    assert "canonical_url" in kept.columns


def test_anchor_texts_extraction_cases(spark):
    from xmlschemavalidator_spark.weburl import anchor_texts

    html = (
        '<p>x</p><a href="http://a.com/1">First  Link</a>'
        '<A CLASS="z" HREF="http://b.com/2">second\n\tlink </A>'
        '<a data-href="http://no.example">not a link</a>'
        '<a href="http://c.com/3"><b>nested markup skipped</b></a>'
        '<a href="/relative">rel</a>'
    )
    got = _eval(spark, anchor_texts, [html])[0]
    assert [(r["url"], r["text"]) for r in got] == [
        ("http://a.com/1", "First  Link"),
        ("http://b.com/2", "second\n\tlink "),
        ("/relative", "rel"),
    ]


def test_anchor_text_topk_counts_cap_and_rank(spark):
    from xmlschemavalidator_spark.weburl import anchor_text_topk

    # 6 docs link target T with anchor 'home', 3 with 'start page',
    # 1 with whitespace-variant 'home' (collapses to the same anchor);
    # relative and empty anchors drop
    pages = (
        [(i, '<a href="http://T.com/?utm_source=x">home</a>') for i in range(6)]
        + [(10 + i, '<a href="http://t.com/">start  page</a>') for i in range(3)]
        + [(20, '<a href="http://t.com">ho\tme</a>')]      # different anchor
        + [(21, '<a href="http://t.com"> home </a>')]      # same anchor
        + [(22, '<a href="/rel">home</a>'), (23, '<a href="http://t.com"></a>')]
    )
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = rows(
        anchor_text_topk(df, cap=2), "target", "anchor", "n_refs", "rank"
    )
    assert got == [
        ("http://t.com/", "home", 7, 1),
        ("http://t.com/", "start page", 3, 2),
    ]
    # cap=3 admits the singleton variant at rank 3
    got3 = rows(
        anchor_text_topk(df, cap=3), "target", "anchor", "n_refs", "rank"
    )
    assert ("http://t.com/", "ho me", 1, 3) in got3 and len(got3) == 3


def test_wat_outlinks_extraction_and_filter(spark):
    from xmlschemavalidator_spark.weburl import wat_outlinks

    j = (
        '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"HTML-Metadata":{"Links":[{"path":"A@/href","url":"http://a/1"},'
        '{"path":"IMG@/src","url":"http://a/i.png"},'
        '{"path":"A@/href","url":"http://b/2"}]}}}}}'
    )
    no_links = '{"Envelope":{"Payload-Metadata":{}}}'
    got = _eval(spark, wat_outlinks, [j, no_links])
    assert got == [["http://a/1", "http://a/i.png", "http://b/2"], None]
    got_a = _eval(
        spark, lambda c: wat_outlinks(c, only_anchors=True), [j]
    )
    assert got_a == [["http://a/1", "http://b/2"]]


def test_wat_outlinks_sql_parity(spark):
    """The DuckDB renderer returns the identical array for the identical
    JSON (incl. the only_anchors filter and the no-links NULL)."""
    import duckdb

    from xmlschemavalidator_spark.weburl import wat_outlinks, wat_outlinks_sql

    js = [
        '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"HTML-Metadata":{"Links":[{"path":"A@/href","url":"http://a/1"},'
        '{"path":"IMG@/src","url":"http://a/i.png"}]}}}}}',
        '{"Envelope":{"Payload-Metadata":{}}}',
        # malformed JSON: Spark get_json_object yields NULL; raw DuckDB
        # json_extract RAISES — the renderer's json_valid gate restores
        # parity (review finding, reproduced live)
        '{"truncated',
    ]
    for only in (False, True):
        spark_got = _eval(
            spark, lambda c: wat_outlinks(c, only_anchors=only), js
        )
        duck_got = [
            duckdb.sql(
                f"select {wat_outlinks_sql('j', only_anchors=only)} "
                f"from (select '{j}' as j)"
            ).fetchone()[0]
            for j in js
        ]
        assert spark_got == duck_got


def test_domain_lang_coherence_shares_and_ties(spark):
    from xmlschemavalidator_spark.weburl import domain_lang_coherence

    data = (
        [("a.com", "en")] * 5 + [("a.com", "de")] * 2   # en 5/7
        + [("b.com", "de"), ("b.com", "en")]             # 1-1 tie -> de
        + [("c.com", "zh")] * 3                          # pure
        + [("d.com", None), ("d.com", None), ("d.com", "en")]  # NULL->und
    )
    df = spark.createDataFrame(data, "domain string, lang string")
    got = rows(domain_lang_coherence(df, "domain"),
               "domain", "n_docs", "top_lang", "top_share_micro")
    assert got == [
        ("a.com", 7, "en", 714285),  # 5_000_000 div 7
        ("b.com", 2, "de", 500000),
        ("c.com", 3, "zh", 1000000),
        ("d.com", 3, "und", 666666),
    ]


def test_outlink_signals_counts_and_diversity(spark):
    from xmlschemavalidator_spark.weburl import outlink_signals

    html_farm = "".join(
        f'<a href="http://spam{i}.com/x">l</a>' for i in range(10)
    )
    html_local = (
        '<a href="http://my.site.com/a">1</a>'
        '<a href="https://site.com/b">2</a>'
        '<a href="/relative">3</a>'
        '<a href="http://other.org/c">4</a>'
    )
    df = spark.createDataFrame(
        [
            (1, "http://site.com/page", html_local),
            (2, "http://farm.net/", html_farm),
            (3, "http://empty.com/", "<p>no links</p>"),
        ],
        "doc_id long, url string, html string",
    )
    got = {r["doc"]: r for r in outlink_signals(df).collect()}
    # doc 1: 4 hrefs, 3 absolute; domains {site.com, site.com, other.org}
    # -> 2 distinct, 2 internal (my.site.com and site.com both = site.com)
    assert (got[1]["n_links"], got[1]["n_abs_links"]) == (4, 3)
    assert got[1]["n_target_domains"] == 2
    assert got[1]["n_internal_links"] == 2
    assert got[1]["domain_diversity_micro"] == 2 * 1000000 // 3
    # doc 2: 10 links, 10 distinct domains, none internal -> diversity 1.0
    assert got[2]["n_target_domains"] == 10
    assert got[2]["n_internal_links"] == 0
    assert got[2]["domain_diversity_micro"] == 1000000
    # doc 3: no links at all -> all zero
    assert tuple(got[3])[1:] == (0, 0, 0, 0, 0)


def _hits_py(edges, iterations=6, scale=10**12):
    """Pure-Python replay of hits()'s exact integer arithmetic."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iterations):
        raw_a = {v: 0 for v in nodes}
        for s, d in e:
            raw_a[d] += hub[s]
        total = sum(raw_a.values())
        auth = {v: raw_a[v] * scale // total for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for s, d in e:
            raw_h[s] += auth[d]
        total = sum(raw_h.values())
        hub = {v: raw_h[v] * scale // total for v in nodes}
    return hub, auth


@pytest.mark.parametrize(
    "edges",
    [
        # star: 0 is the authority, spokes are hubs
        [(i, 0) for i in range(1, 8)] + [(0, 1)],
        # bipartite hubs->authorities + a chord
        [(i, 10 + j) for i in range(3) for j in range(3)] + [(10, 1)],
    ],
)
def test_hits_matches_python_reference(spark, edges):
    from xmlschemavalidator_spark.weburl import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(df, iterations=4).collect()
    }
    hub, auth = _hits_py(edges, iterations=4)
    assert got == {v: (hub[v], auth[v]) for v in hub}


def test_hits_star_roles(spark):
    """On the pure star the center takes (almost) all authority and the
    spokes split hub mass evenly."""
    from xmlschemavalidator_spark.weburl import hits

    edges = [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in hits(df, iterations=3).collect()}
    assert got[0]["auth_micro"] == 10**12
    assert got[0]["hub_micro"] == 0
    spokes = [got[i]["hub_micro"] for i in range(1, 6)]
    assert len(set(spokes)) == 1 and abs(sum(spokes) - 10**12) < 5


def test_bfs_distances_chain_and_early_exit(spark):
    from xmlschemavalidator_spark.weburl import bfs_distances

    # 1->2->3->4, 9->3 (joins), 5 isolated target of nothing
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 3)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [1]).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # multi-source: min over seeds
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [1, 9]).collect()}
    assert got == {1: 0, 9: 0, 2: 1, 3: 1, 4: 2}
    # max_hops truncates
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [1], max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_distances_cycle_terminates(spark):
    from xmlschemavalidator_spark.weburl import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, [1], max_hops=50).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # revisiting 1 never re-relaxes


def test_common_neighbor_candidates_square(spark):
    from xmlschemavalidator_spark.weburl import common_neighbor_candidates

    # square 1-2-3-4-1 (undirected): diagonals (1,3) and (2,4) share 2
    # neighbors each and are non-adjacent; every adjacent pair shares 0.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src bigint, dst bigint"
    )
    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["jaccard_micro"])
        for r in common_neighbor_candidates(edges, min_common=2).collect()
    }
    # deg=2 everywhere: jaccard = 2/(2+2-2) = 1.0 -> 1_000_000 micro
    assert got == {(1, 3): (2, 1000000), (2, 4): (2, 1000000)}


def test_common_neighbor_hub_cap_and_audit(spark):
    from xmlschemavalidator_spark.weburl import (
        common_neighbor_candidates,
        wedge_hot_centers,
    )

    # star: hub 0 linked to 1..5 -> every leaf pair shares exactly {0}
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src bigint, dst bigint"
    )
    # min_common=1 finds all leaf pairs through the hub
    assert common_neighbor_candidates(edges, min_common=1).count() == 10
    # capping below the hub degree drops them all, and the audit says why
    assert (
        common_neighbor_candidates(
            edges, min_common=1, max_center_degree=4
        ).count()
        == 0
    )
    audit = wedge_hot_centers(edges, max_center_degree=4).collect()
    assert [(r["node"], r["deg"]) for r in audit] == [(0, 5)]


def test_label_propagation_two_cliques(spark):
    from xmlschemavalidator_spark.weburl import label_propagation

    # two triangles bridged by one edge: LPA separates them, CC wouldn't
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src bigint, dst bigint",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, iterations=5).collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_label_propagation_deterministic_rerun(spark):
    from xmlschemavalidator_spark.weburl import label_propagation

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20],
        "src bigint, dst bigint",
    )
    a = sorted(tuple(r) for r in label_propagation(edges, iterations=4).collect())
    b = sorted(tuple(r) for r in label_propagation(edges, iterations=4).collect())
    assert a == b  # total tie-break: no random resolution


def test_personalized_pagerank_seed_proximity(spark):
    from xmlschemavalidator_spark.weburl import personalized_pagerank

    # chain 1->2->3->4 plus far node 9->4: mass concentrates near seed 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 4)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["rank_micro"] for r in
           personalized_pagerank(edges, seeds=[1], iterations=10).collect()}
    assert got[1] > got[2] > got[3] > got[4] >= 0
    assert got[9] == 0  # unreachable from the seed, no teleport to it
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seeds"):
        personalized_pagerank(edges, seeds=[])


def test_url_shape_signals_values(spark):
    from xmlschemavalidator_spark.weburl import url_shape_signals

    df = spark.createDataFrame(
        [
            (1, "https://www.example.com/a/b/c?x=1&y=2#f"),
            (2, "http://10.0.0.1:8080/x"),
            (3, "http://a1b2c3.net/"),
            (4, None),
        ],
        "id bigint, url string",
    )
    sig = url_shape_signals(F.col("url"))
    got = {r["id"]: r for r in df.select(
        "id", *[v.alias(k) for k, v in sig.items()]
    ).collect()}
    r1 = got[1]
    assert r1["path_depth"] == 3 and r1["n_query_params"] == 2
    assert r1["is_https"] is True and r1["has_ip_host"] is False
    r2 = got[2]
    assert r2["has_ip_host"] is True and r2["is_https"] is False
    assert r2["path_depth"] == 1
    r3 = got[3]
    # host a1b2c3.net: 3 digits of 10 chars -> 300000 micro
    assert r3["host_digit_ratio_micro"] == 300000
    assert got[4]["url_len"] == 0 and got[4]["has_ip_host"] is False


def test_url_shape_fragment_question_mark_not_query(spark):
    from xmlschemavalidator_spark.weburl import url_shape_signals

    df = spark.createDataFrame(
        [(1, "https://h.com/page#sec?ref=1"), (2, "https://h.com/p?a=1#f?x")],
        "id bigint, url string",
    )
    sig = url_shape_signals(F.col("url"))
    got = {r["id"]: r for r in df.select(
        "id", *[v.alias(k) for k, v in sig.items()]
    ).collect()}
    assert got[1]["n_query_params"] == 0  # '?' lives in the fragment
    assert got[2]["n_query_params"] == 1  # real query before '#'


def test_kcore_peels_tail_and_keeps_core(spark):
    from xmlschemavalidator_spark.weburl import kcore

    # triangle 1-2-3 (2-core) with a tail 3-4-5 that must peel away in
    # two rounds (5 first, then 4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src bigint, dst bigint"
    )
    got = sorted(
        (r["node"], r["core_degree"]) for r in kcore(edges, k=2).collect()
    )
    assert got == [(1, 2), (2, 2), (3, 2)]


def test_kcore_empty_core_and_guards(spark):
    import pytest

    from xmlschemavalidator_spark.weburl import kcore

    # pure path graph: no 2-core at all
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    assert kcore(edges, k=2).count() == 0
    with pytest.raises(ValueError):
        kcore(edges, k=0)
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(edges, k=2, max_rounds=1)


def test_local_clustering_hand_computed(spark):
    from xmlschemavalidator_spark.weburl import local_clustering

    # triangle {1,2,3} + spoke 3-4, star 5-{6,7}, pair 8-9 (directed,
    # duplicated and self-looped edges must collapse)
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1), (2, 1),  # triangle + reverse dup
            (3, 4), (5, 6), (5, 7), (8, 9), (9, 9),  # self-loop drops
        ],
        "src long, dst long",
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["lcc_micro"])
        for r in local_clustering(edges).collect()
    }
    assert got[1] == (2, 1, 1_000_000)
    assert got[2] == (2, 1, 1_000_000)
    # node 3: neighbors {1,2,4} -> 3 pairs, 1 closed -> 333333
    assert got[3] == (3, 1, 333_333)
    assert got[4] == (1, 0, None)  # degree-1: undefined
    assert got[5] == (2, 0, 0)  # open wedge center: defined and zero
    assert got[6] == (1, 0, None) and got[8] == (1, 0, None)
    assert len(got) == 9


def test_ktruss_k4_keeps_clique_drops_fringe(spark):
    from xmlschemavalidator_spark.weburl import ktruss

    # K4 on {1,2,3,4} + triangle {4,5,6} + pendant 6-7 (+ dup/self noise)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (4, 6), (5, 6), (6, 7), (2, 1), (7, 7)],
        "src long, dst long",
    )
    got = sorted(
        (r["a"], r["b"], r["support"]) for r in ktruss(edges, k=4).collect()
    )
    # the lone triangle's edges have support 1 (< k-2=2) and peel; K4
    # edges keep support 2 within the survivor graph
    assert got == [(1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2), (3, 4, 2)]


def test_ktruss_cascade_to_empty(spark):
    from xmlschemavalidator_spark.weburl import ktruss

    # triangle strip {1,2,3},{2,3,4},{3,4,5},{4,5,6}: the middle edges
    # have support 2 ONLY until the rim peels -> multi-round cascade to 0
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5), (4, 6), (5, 6)],
        "src long, dst long",
    )
    assert ktruss(edges, k=4).count() == 0


def test_ktruss_matches_duckdb_oracle(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import ktruss, ktruss_oracle_sql

    rows = [(i % 23, (i * i + 1) % 23) for i in range(160)] + [
        (a, b) for a in range(50, 56) for b in range(a + 1, 56)  # planted K6
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = sorted(
        (r["a"], r["b"], r["support"]) for r in ktruss(edges, k=4).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = ktruss_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", k=4, rounds=8
    )
    oracle = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == oracle and len(got) > 0


def test_robots_sitemap_urls(spark):
    from xmlschemavalidator_spark.weburl import robots_sitemap_urls

    robots = (
        "User-agent: *\nDisallow: /private\n"
        "SITEMAP: https://a.com/sm.xml  \r\n"
        "sitemap:https://a.com/sm2.xml\n"
        "# sitemap: commented out is still matched? no - starts with #\n"
    )
    df = spark.createDataFrame([(robots,)], "robots string")
    [r] = df.select(robots_sitemap_urls(F.col("robots")).alias("s")).collect()
    assert r["s"] == ["https://a.com/sm.xml", "https://a.com/sm2.xml"]


def test_sitemap_entries_urlset_and_index(spark):
    from xmlschemavalidator_spark.weburl import sitemap_entries

    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>\n  https://a.com/p1 </loc><lastmod>2024-01-02</lastmod></url>"
        "<URL><loc>https://a.com/up</loc></URL>"  # wrong case tag: (?i) accepts
        "<url><lastmod>2024-01-03</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/sm-part1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame([(1, xml), (2, idx)], "doc long, xml string")
    got = sorted(
        (r["doc"], r["loc"], r["lastmod"], r["is_index"])
        for r in sitemap_entries(df, "xml").collect()
    )
    assert got == [
        (1, "https://a.com/p1", "2024-01-02", False),
        (1, "https://a.com/up", None, False),
        (2, "https://a.com/sm-part1.xml", "2024-02-01", True),
    ]


def test_sitemap_entries_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.weburl import sitemap_entries, sitemap_entries_sql

    xmls = [
        "<urlset><url><loc>https://x/%d</loc><lastmod>2024-01-0%d</lastmod></url>"
        "<sitemap><loc>https://x/idx%d.xml</loc></sitemap></urlset>" % (i, i % 9 + 1, i)
        for i in range(8)
    ]
    df = spark.createDataFrame(list(enumerate(xmls)), "doc long, xml string")
    got = sorted(
        (r["doc"], r["loc"], r["lastmod"], r["is_index"])
        for r in sitemap_entries(df, "xml").collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc": range(8), "xml": xmls}))
    oracle = sorted(
        map(
            tuple,
            con.execute(
                f"SELECT doc, e.loc, e.lastmod, e.is_index FROM ("
                f"SELECT doc, unnest({sitemap_entries_sql('xml')}) AS e FROM t)"
            ).fetchall(),
        )
    )
    assert got == oracle and len(got) == 16


def test_powerlaw_alpha_hand_computed_and_recovery(spark):
    import math

    from xmlschemavalidator_spark.weburl import powerlaw_alpha

    df = spark.createDataFrame([(1, 2), (2, 4), (3, 8)], "node long, deg long")
    [r] = powerlaw_alpha(df, "deg", kmin=2).collect()
    s = sum(math.floor(math.log(k / 1.5) * 1e6) for k in (2, 4, 8))
    assert (r["n"], r["sum_ln_micro"]) == (3, s)
    assert r["alpha"] == round(1.0 + 3.0 / (s / 1e6), 6)

    # recovery: inverse-CDF grid of a rounded alpha=2.5 Pareto tail with
    # xmin=3 — the kmin−½ discretization shift is only accurate for
    # kmin >= ~2 (CSN §3.5: at kmin=1 the approximation is badly biased,
    # which an earlier version of this test rediscovered)
    alpha = 2.5
    ks = [
        int(round(3.0 * (1.0 - (i + 0.5) / 4000) ** (-1.0 / (alpha - 1.0))))
        for i in range(4000)
    ]
    # estimate one notch above the generation boundary (kmin=4): rounding
    # over-represents the exact-xmin bin, the standard kmin-selection issue
    deg = spark.createDataFrame(list(enumerate(ks)), "node long, deg long")
    [e] = powerlaw_alpha(deg, "deg", kmin=4).collect()
    assert abs(e["alpha"] - alpha) < 0.1

    # tail below kmin excluded; undefined MLE -> NULL
    allmin = spark.createDataFrame([(1, 1), (2, 1)], "node long, deg long")
    [u] = powerlaw_alpha(allmin, "deg", kmin=1).collect()
    assert u["alpha"] is not None  # ln(1/0.5) > 0: defined even at k=kmin
    empty = spark.createDataFrame([(1, 0)], "node long, deg long")
    [z] = powerlaw_alpha(empty, "deg", kmin=1).collect()
    assert z["n"] == 0 and z["alpha"] is None


def test_structure_fingerprint_template_collision(spark):
    from xmlschemavalidator_spark.weburl import domain_template_stats

    tmpl = '<html><Head><title>%s</title></head><body><div class="a"><p>%s</p></div></body></html>'
    rows = [
        ("cms.example", tmpl % ("A", "text one")),
        ("cms.example", tmpl % ("B", "other text")),  # same scaffold
        ("cms.example", tmpl % ("C", "third")),
        ("blog.example", "<html><body><article><p>x</p></article></body></html>"),
        ("blog.example", "<html><body><ul><li>y</li></ul></body></html>"),
        ("blog.example", None),
    ]
    df = spark.createDataFrame(rows, "domain string, html string")
    got = {r["domain"]: (r["n_pages"], r["n_structures"], r["diversity_micro"])
           for r in domain_template_stats(df, "domain", "html").collect()}
    # tag-case differences fold; content differences don't matter
    assert got["cms.example"] == (3, 1, 333_333)
    assert got["blog.example"] == (2, 2, 1_000_000)


def test_crawl_rate_violations(spark):
    from xmlschemavalidator_spark.weburl import crawl_rate_violations

    rows = [
        ("a.com", "2024-01-01 00:00:00.1"),
        ("a.com", "2024-01-01 00:00:00.5"),
        ("a.com", "2024-01-01 00:00:00.9"),  # 3 hits in second 0 -> violation
        ("a.com", "2024-01-01 00:00:01.2"),
        ("b.com", "2024-01-01 00:00:00.3"),
        ("b.com", None),
    ]
    df = spark.createDataFrame(rows, "host string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = [
        (r["host"], r["window_start"], r["n_requests"])
        for r in crawl_rate_violations(df, "host", "ts", max_per_window=2).collect()
    ]
    epoch0 = 1704067200  # 2024-01-01T00:00:00Z
    assert got == [("a.com", epoch0, 3)]


def test_robots_crawl_delay_millis(spark):
    from xmlschemavalidator_spark.weburl import robots_crawl_delay_millis

    cases = [
        ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n", 2000),
        ("User-agent: *\ncrawl-delay: 0.5\n", 500),
        # declared only for another agent's group: not ours
        ("User-agent: gbot\nCrawl-delay: 9\n\nUser-agent: *\nDisallow: /\n", None),
        ("User-agent: *\nDisallow: /\n", None),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "robots string")
    got = [r[0] for r in df.select(robots_crawl_delay_millis(F.col("robots"))).collect()]
    assert got == [c[1] for c in cases]


def test_hreflang_alternates_and_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.weburl import (
        hreflang_alternates,
        hreflang_alternates_sql,
    )

    htmls = [
        '<link rel="alternate" hreflang="fr" href="https://x/fr">'
        "<LINK HREFLANG='de-AT' REL=alternate HREF='https://x/de'>"
        '<link rel="alternate" type="application/rss+xml" href="https://x/rss">'
        '<link rel="stylesheet" href="https://x/css">',
        "<p>no links</p>",
    ]
    df = spark.createDataFrame(list(enumerate(htmls)), "doc long, html string")
    got = sorted(
        (r["doc"], r["hreflang"], r["href"])
        for r in hreflang_alternates(df, "doc", "html").collect()
    )
    # the rss alternate has no hreflang -> dropped; stylesheet not rel=alternate
    assert got == [(0, "de-at", "https://x/de"), (0, "fr", "https://x/fr")]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc": range(2), "html": htmls}))
    oracle = sorted(
        map(
            tuple,
            con.execute(
                f"SELECT doc, e.hreflang, e.href FROM "
                f"(SELECT doc, unnest({hreflang_alternates_sql('html')}) AS e FROM t)"
            ).fetchall(),
        )
    )
    assert got == oracle


def test_edge_reciprocity_hand_computed(spark):
    from xmlschemavalidator_spark.weburl import edge_reciprocity

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 5), (1, 2)],
        "src long, dst long",
    )
    [r] = edge_reciprocity(edges).collect()
    # distinct simple digraph: (1,2),(2,1),(1,3),(3,4),(4,3) -> 4 of 5 reciprocal
    assert (r["n_edges"], r["n_reciprocal"]) == (5, 4)
    assert r["reciprocity"] == 0.8


_CANON_HTML_CASES = [
    # rel-then-href
    ('<html><head><link rel="canonical" href="https://ex.com/a"></head></html>',
     "https://ex.com/a"),
    # href-then-rel, single quotes, attr noise, case
    ("<LINK type='x' HREF='https://ex.com/b' REL='canonical'>",
     "https://ex.com/b"),
    # a stylesheet link before the canonical one must not bleed in
    ('<link href="s.css" rel="stylesheet"><link rel="canonical" href="/c">',
     "/c"),
    # whitespace inside quotes trimmed
    ('<link rel=" canonical " href=" https://ex.com/d ">', "https://ex.com/d"),
    # absent
    ("<html><head><title>t</title></head></html>", ""),
]


def test_rel_canonical_cases_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import rel_canonical, rel_canonical_sql

    got = _eval(spark, rel_canonical, [c[0] for c in _CANON_HTML_CASES])
    assert got == [c[1] for c in _CANON_HTML_CASES]
    for h, want in _CANON_HTML_CASES:
        d = duckdb.sql(
            f"select {rel_canonical_sql('h')} from (select '{h.replace(chr(39), chr(39)*2)}' as h)"
        ).fetchone()[0]
        assert d == want, (h, d, want)


def test_canonical_target_resolution(spark):
    from xmlschemavalidator_spark.weburl import canonical_target

    cases = [
        # absolute declaration wins over own url (and is normalized)
        ("https://m.ex.com/a?utm_source=x",
         '<link rel="canonical" href="HTTPS://WWW.EX.COM/a/">',
         "https://ex.com/a"),
        # root-relative resolves against the page's own scheme://host
        ("https://ex.com/deep/page",
         '<link rel="canonical" href="/top">',
         "https://ex.com/top"),
        # protocol-relative: disclosed fallback to own url
        ("https://ex.com/pp",
         '<link rel="canonical" href="//cdn.ex.com/x">',
         "https://ex.com/pp"),
        # no declaration: own url, normalized
        ("HTTP://WWW.Ex.com/z/", "<p>no head</p>", "http://ex.com/z"),
    ]
    df = spark.createDataFrame([(u, h) for u, h, _ in cases], "u string, h string")
    got = [r[0] for r in df.select(
        canonical_target(F.col("u"), F.col("h"))).collect()]
    assert got == [w for _, _, w in cases]


def test_canonical_declared_dedup_self_wins(spark):
    from xmlschemavalidator_spark.weburl import canonical_declared_dedup

    decl = '<link rel="canonical" href="https://ex.com/page">'
    rows_in = [
        # three variants declaring the same canonical; doc 2 IS the target
        (1, "https://m.ex.com/page?sid=9", decl),
        (2, "https://ex.com/page", decl),
        (3, "https://amp.ex.com/page", decl),
        # undeclared page: its own url is its target, survives alone
        (4, "https://ex.com/other", "<p>x</p>"),
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, url string, html string")
    kept = sorted(r["doc_id"] for r in canonical_declared_dedup(df).collect())
    assert kept == [2, 4]
    # without the self page, smallest url wins deterministically
    df2 = spark.createDataFrame(
        [r for r in rows_in if r[0] != 2], "doc_id long, url string, html string"
    )
    kept2 = sorted(r["doc_id"] for r in canonical_declared_dedup(df2).collect())
    assert kept2 == [3, 4]  # amp.ex.com < m.ex.com


def test_meta_robots_whole_token_and_none(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import (
        meta_robots_signals,
        meta_robots_signals_sql,
    )

    cases = [
        ('<meta name="robots" content="noindex, nofollow">', True, True, False),
        # content-then-name order; noarchive
        ("<meta content='NOARCHIVE' name='robots'>", False, False, True),
        # 'none' implies noindex+nofollow
        ('<meta name="robots" content="none">', True, True, False),
        # whole-token: 'noindexing' must NOT match
        ('<meta name="robots" content="noindexing">', False, False, False),
        # no meta robots at all
        ("<p>hi</p>", False, False, False),
    ]
    df = spark.createDataFrame([(h,) for h, *_ in cases], "h string")
    sig = meta_robots_signals(F.col("h"))
    got = df.select(*(c.alias(k) for k, c in sig.items())).collect()
    for r, (h, ni, nf, na) in zip(got, cases):
        assert (r["noindex"], r["nofollow"], r["noarchive"]) == (ni, nf, na), h
    sqls = meta_robots_signals_sql("h")
    for h, ni, nf, na in cases:
        hh = h.replace("'", "''")
        d = duckdb.sql(
            f"select {sqls['noindex']}, {sqls['nofollow']}, {sqls['noarchive']} "
            f"from (select '{hh}' as h)"
        ).fetchone()
        assert tuple(d) == (ni, nf, na), h


def test_og_properties_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import og_properties, og_properties_sql

    html = (
        '<meta property="og:title" content="A Title">'
        "<meta content='desc here' property='og:description'>"
        '<meta property="og:image" content="https://ex.com/i.png">'
    )
    df = spark.createDataFrame([(html,)], "h string")
    cols = og_properties(F.col("h"))
    [r] = df.select(*(c.alias(k) for k, c in cols.items())).collect()
    assert r["og_title"] == "A Title" and r["og_description"] == "desc here"
    assert r["og_image"] == "https://ex.com/i.png" and r["og_url"] == ""
    sqls = og_properties_sql("h")
    hh = html.replace("'", "''")
    d = duckdb.sql(
        f"select {sqls['og_title']}, {sqls['og_description']}, "
        f"{sqls['og_url']}, {sqls['og_image']} from (select '{hh}' as h)"
    ).fetchone()
    assert tuple(d) == ("A Title", "desc here", "", "https://ex.com/i.png")


_RSS_XML = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>Site Feed</title><link>https://ex.com</link>"
    "<item><title><![CDATA[First & Best]]></title>"
    "<link> https://ex.com/a1 </link>"
    "<pubDate>Mon, 02 Jan 2026 08:00:00 GMT</pubDate>"
    '<guid isPermaLink="false">tag:ex.com,2026:a1</guid></item>'
    "<item><title>No link, has guid</title><guid>g2</guid></item>"
    "<item><title>dropped: neither link nor id</title></item>"
    "</channel></rss>"
)

_ATOM_XML = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>'
    '<entry><title>Atom One</title><link rel="alternate" href="https://ex.com/e1"/>'
    "<updated>2026-01-03T04:05:06Z</updated><id>urn:e1</id></entry></feed>"
)


def test_feed_links_discovery(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import feed_links, feed_links_sql

    html = (
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        "<link href='/atom.xml' type='application/atom+xml' rel='alternate'>"
        '<link rel="stylesheet" type="text/css" href="/s.css">'
    )
    got = _eval(spark, feed_links, [html, "<p>none</p>"])
    assert got == [["/feed.xml", "/atom.xml"], []]
    hh = html.replace("'", "''")
    d = duckdb.sql(
        f"select {feed_links_sql('h')} from (select '{hh}' as h)"
    ).fetchone()[0]
    assert d == ["/feed.xml", "/atom.xml"]


def test_feed_entries_rss_atom_and_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import feed_entries, feed_entries_sql

    df = spark.createDataFrame(
        [(1, _RSS_XML), (2, _ATOM_XML)], "feed_id long, xml string"
    )
    got = sorted(
        map(tuple, feed_entries(df, "xml").collect()),
        key=lambda t: (t[0], t[3] or ""),
    )
    # rss: CDATA unwrapped, link ws-trimmed, guid kept; linkless-with-guid
    # kept; neither-link-nor-id dropped
    rss_rows = [t for t in got if t[0] == 1]
    assert len(rss_rows) == 2
    full = [t for t in rss_rows if t[4] is not None][0]
    assert full[2:] == ("rss", "First & Best", "https://ex.com/a1",
                        "Mon, 02 Jan 2026 08:00:00 GMT", "tag:ex.com,2026:a1")
    # atom entry (the feed-level <title> stays out: it's not in an <entry>)
    atom_rows = [t for t in got if t[0] == 2]
    assert atom_rows == [(2, _ATOM_XML, "atom", "Atom One",
                          "https://ex.com/e1", "2026-01-03T04:05:06Z", "urn:e1")]
    # DuckDB renders the identical entry array
    con = duckdb.connect()
    for xml, n_want in ((_RSS_XML, 2), (_ATOM_XML, 1)):
        xx = xml.replace("'", "''")
        d = con.execute(
            f"select {feed_entries_sql('x')} from (select '{xx}' as x)"
        ).fetchone()[0]
        assert len(d) == n_want
    xx = _RSS_XML.replace("'", "''")
    d = con.execute(
        f"select unnest({feed_entries_sql('x')}) from (select '{xx}' as x)"
    ).fetchall()
    spark_structs = sorted(
        [t[2:] for t in rss_rows], key=lambda s: (s[4] or "")
    )
    duck_structs = sorted(
        [tuple(r[0].values()) for r in d], key=lambda s: (s[4] or "")
    )
    assert spark_structs == duck_structs


def test_robots_filter_rfc_allow_precedence(spark):
    from xmlschemavalidator_spark.weburl import robots_filter, robots_filter_rfc

    robots_txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/press\n"
        "Disallow: /tmp\n"
        "Allow: /tmp\n"  # exact length tie: Allow wins per RFC 9309
    )
    robots = spark.createDataFrame(
        [("ex.com", robots_txt)], "host string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [
            (1, "https://ex.com/private/x"),          # blocked
            (2, "https://ex.com/private/press/r1"),   # re-opened by Allow
            (3, "https://ex.com/tmp/y"),              # tie -> Allow wins
            (4, "https://ex.com/public"),             # no rule
            (5, "https://other.com/private/x"),       # no robots row -> kept
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r["doc_id"] for r in robots_filter_rfc(docs, "url", robots).collect()
    )
    assert kept == [2, 3, 4, 5]
    # the Disallow-only legacy form blocks the carve-outs too
    legacy = sorted(
        r["doc_id"] for r in robots_filter(docs, "url", robots).collect()
    )
    assert legacy == [4, 5]


def test_robots_decision_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import (
        robots_allow_prefixes_sql,
        robots_decision_sql,
    )
    from xmlschemavalidator_spark.weburl import robots_disallow_prefixes_sql

    robots_txt = (
        "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /a/b/c\n"
    )
    rr = robots_txt.replace("\n", "\\n")
    for pq, want in (
        ("/a/x", True), ("/a/b/x", False), ("/a/b/c/x", True), ("/z", False)
    ):
        d = duckdb.sql(
            f"select {robots_decision_sql('pq', robots_disallow_prefixes_sql('r'), robots_allow_prefixes_sql('r'))} "
            f"from (select '{pq}' as pq, e'{rr}' as r)"
        ).fetchone()[0]
        assert d == want, (pq, d)


def test_pct_normalize_unreserved_only(spark):
    import duckdb

    from xmlschemavalidator_spark.weburl import pct_normalize, pct_normalize_sql

    cases = [
        # unreserved escapes decode, both hex cases
        ("https://ex.com/%7Euser/%41b%2Dc", "https://ex.com/~user/Ab-c"),
        ("https://ex.com/%7euser", "https://ex.com/~user"),
        # reserved escapes stay: decoding them would change meaning
        ("https://ex.com/a%2Fb?q=%3Fx%23y", "https://ex.com/a%2Fb?q=%3Fx%23y"),
        # %25 (the escape escape) never decodes and never cascades
        ("https://ex.com/100%2541", "https://ex.com/100%2541"),
        ("https://ex.com/plain", "https://ex.com/plain"),
    ]
    got = _eval(spark, pct_normalize, [c[0] for c in cases])
    assert got == [c[1] for c in cases]
    con = duckdb.connect()
    for raw, want in cases:
        d = con.execute(
            f"select {pct_normalize_sql('u')} from (select '{raw}' as u)"
        ).fetchone()[0]
        assert d == want, raw


def test_modularity_hand_computed(spark):
    """Two triangles joined by one bridge, the textbook partition:
    m=7, each triangle L_c=3, D_c=7 → intra 3e6//7=428571,
    expected 49e6//196=250000, q=178571 per side (Q≈0.357)."""
    from xmlschemavalidator_spark.weburl import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)],
        "node long, label long",
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    for lbl in (1, 4):
        r = rows[lbl]
        assert r["n_nodes"] == 3
        assert r["intra_edges"] == 3
        assert r["degree_sum"] == 7
        assert r["intra_micro"] == 428571
        assert r["expected_micro"] == 250000
        assert r["q_micro"] == 178571
    # the trivial one-community partition scores Q = 0 exactly
    one = spark.createDataFrame(
        [(n, 0) for n in range(1, 7)], "node long, label long"
    )
    (only,) = modularity(edges, one).collect()
    assert only["intra_micro"] == 1000000 and only["q_micro"] == 0


def test_spam_mass_separates_farm_from_trusted(spark):
    """A link farm boosting an isolated target carries high spam mass;
    the trusted core's pages stay low/negative."""
    from xmlschemavalidator_spark.weburl import spam_mass

    edges = []
    # trusted core: 1..4 ring, seed = 1
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 1)]:
        edges.append((a, b))
    # spam farm: 10..14 all point at 20; 20 points back at the farm
    for f in range(10, 15):
        edges.append((f, 20))
        edges.append((20, f))
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in spam_mass(df, [1], iterations=8).collect()}
    # the farm target earns ALL its rank outside trust: mass ~ 1
    assert out[20]["spam_mass_micro"] > 900_000
    assert out[20]["trust_micro"] == 0
    # the seed's own page is trust-dominated: mass at/below zero
    assert out[1]["spam_mass_micro"] <= 0
    assert all(
        out[n]["spam_mass_micro"] > 900_000 for n in range(10, 15)
    )


def test_path_templates(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.weburl import path_template, path_templates

    urls = [
        "http://shop.example.com/product/17",
        "http://shop.example.com/product/23",
        "http://shop.example.com/product/17",       # repeat fill
        "http://shop.example.com/user/deadbeef1234/profile",
        "http://shop.example.com/user/cafebabe9999/profile",
        "http://shop.example.com/about",
        "http://other.example.com/product/5",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {(r["host"], r["template"]): r for r in
           path_templates(df, "url", min_urls=2).collect()}
    p = got[("shop.example.com", "/product/{n}")]
    assert (p["n_urls"], p["n_variants"]) == (3, 2)
    u = got[("shop.example.com", "/user/{h}/profile")]
    assert (u["n_urls"], u["n_variants"]) == (2, 2)
    # min_urls drops singletons ('/about', other host's product)
    assert ("shop.example.com", "/about") not in got
    assert ("other.example.com", "/product/{n}") not in got

    # template column edge cases: short hex NOT generalized, empty path -> /
    [t] = df.limit(1).select(
        path_template(F.lit("https://x.com/ab12/9")).alias("t")
    ).collect()
    assert t["t"] == "/ab12/{n}"
    [t2] = df.limit(1).select(
        path_template(F.lit("https://x.com")).alias("t")
    ).collect()
    assert t2["t"] == "/"


# ---------------------------------------------------------------------------
# bowtie_decomposition
# ---------------------------------------------------------------------------


def test_bowtie_all_classes_hand_graph(spark):
    # 1<->2 core; 0->1 IN; 2->3 OUT; 0->4 tendril_in; 5->3 tendril_out;
    # 0->6->3 tube; 7<->8 disconnected. Pivot pinned at 1 (core).
    from xmlschemavalidator_spark.weburl import bowtie_decomposition

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (0, 1), (2, 3), (0, 4), (5, 3), (0, 6), (6, 3), (7, 8), (8, 7)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in bowtie_decomposition(edges, pivot=1).collect()
    }
    assert got == {
        0: "IN",
        1: "SCC",
        2: "SCC",
        3: "OUT",
        4: "TENDRIL_IN",
        5: "TENDRIL_OUT",
        6: "TUBE",
        7: "DISCONNECTED",
        8: "DISCONNECTED",
    }


def test_bowtie_default_pivot_and_empty(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.weburl import bowtie_decomposition

    # star: 0 -> 1..4 and 9 -> 0: max degree node 0 (deg 5) is the pivot;
    # SCC = {0} alone, everything forward is OUT, 9 is IN
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (9, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"] for r in bowtie_decomposition(edges).collect()
    }
    assert got[0] == "SCC" and got[9] == "IN"
    assert all(got[n] == "OUT" for n in (1, 2, 3, 4))
    # empty graph: empty result, no crash
    empty = edges.where(F.lit(False))
    assert bowtie_decomposition(empty).count() == 0


# ---------------------------------------------------------------------------
# morans_i
# ---------------------------------------------------------------------------


def test_morans_i_clustered_vs_alternating(spark):
    from xmlschemavalidator_spark.weburl import morans_i

    # ring of 20 nodes; attribute = block id (two homophilous halves)
    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    attrs = spark.createDataFrame(
        [(i, 1.0 if i < 10 else 5.0) for i in range(20)],
        "node long, val double",
    )
    [r] = morans_i(edges, attrs, "val").collect()
    assert r["i"] > r["expected_i"] and r["pattern"] == "clustered"
    # perfectly alternating attribute on the same ring: dispersed
    attrs = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(20)], "node long, val double"
    )
    [r] = morans_i(edges, attrs, "val").collect()
    assert r["i"] < r["expected_i"] and r["pattern"] == "dispersed"
    assert r["i"] == -1.0  # perfect alternation on a ring


def test_morans_i_degenerate(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.weburl import morans_i

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    # constant attribute: zero variance -> NULL
    attrs = spark.createDataFrame(
        [(i, 2.0) for i in range(4)], "node long, val double"
    )
    [r] = morans_i(edges, attrs, "val").collect()
    assert r["i"] is None and r["pattern"] == "none"
    # n < 4: NULL gate
    attrs = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "node long, val double"
    )
    [r] = morans_i(edges, attrs, "val").collect()
    assert r["i"] is None


def test_gearys_c_clustered_and_dispersed(spark):
    from xmlschemavalidator_spark.weburl import gearys_c

    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    # homophilous halves: small edge differences -> C < 1
    attrs = spark.createDataFrame(
        [(i, 1.0 if i < 10 else 5.0) for i in range(20)],
        "node long, val double",
    )
    [r] = gearys_c(edges, attrs, "val").collect()
    assert r["c"] < 1.0 and r["pattern"] == "clustered"
    # perfect alternation on the 20-ring: C = (n-1)·n·ΣΔ²/(2W·nΣz²)
    # = 19·20·20/(2·20·100) = 1.9 exactly (→2 as n grows)
    attrs = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(20)], "node long, val double"
    )
    [r] = gearys_c(edges, attrs, "val").collect()
    assert r["c"] == 1.9 and r["pattern"] == "dispersed"
    # constant attribute: NULL gate
    attrs = spark.createDataFrame(
        [(i, 7.0) for i in range(20)], "node long, val double"
    )
    [r] = gearys_c(edges, attrs, "val").collect()
    assert r["c"] is None and r["pattern"] == "none"
