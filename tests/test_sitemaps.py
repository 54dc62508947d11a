"""Sitemap discovery: Sitemap: directive extraction from robots
bodies (group-independent, relative resolution, latest fetch),
protocol-complete parsing (urlset / sitemapindex / plain text /
RSS / Atom / gzip incl. the 50MB bomb cap), S4 error rows, and the
frontier composition into the governance stack."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
    host_sitemaps,
    parse_sitemaps,
    sitemap_frontier,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries) -> bytes:
    rows = "".join(
        "<url><loc>%s</loc>%s%s%s</url>"
        % (
            loc,
            f"<lastmod>{lm}</lastmod>" if lm else "",
            f"<changefreq>{cf}</changefreq>" if cf else "",
            f"<priority>{pr}</priority>" if pr is not None else "",
        )
        for loc, lm, cf, pr in entries
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<urlset {_NS}>{rows}</urlset>"
    ).encode()


def _fetched(spark, rows):
    return spark.createDataFrame(
        rows, "sitemap_url string, content binary"
    )


def test_host_sitemaps_directive_extraction(spark):
    """Sitemap: lines extract case-insensitively from ANY group,
    resolve relative forms, dedup repeats, and follow the latest
    fetch per host."""
    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: x\nDisallow: /\n"
                "SITEMAP: https://a.example/sm.xml  # comment\n"
                "User-agent: *\nsitemap: https://a.example/sm.xml\n"
                "Sitemap: /local/sm2.xml\n",
                2,
            ),
            ("a.example", "Sitemap: https://a.example/old.xml\n", 1),
            ("b.example", "User-agent: *\nDisallow:\n", 1),  # none
        ],
        "host string, robots_txt string, fetched_at int",
    )
    got = {
        (r["host"], r["sitemap_url"])
        for r in host_sitemaps(robots, fetched_col="fetched_at").collect()
    }
    assert got == {
        ("a.example", "https://a.example/sm.xml"),
        ("a.example", "http://a.example/local/sm2.xml"),
    }


def test_parse_urlset_and_index(spark):
    sm = _urlset(
        [
            ("http://s.example/a", "2026-01-02", "daily", 0.8),
            ("http://s.example/b", None, None, None),
        ]
    )
    idx = (
        '<?xml version="1.0"?><sitemapindex %s>'
        "<sitemap><loc>http://s.example/sm1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>http://s.example/sm2.xml.gz</loc></sitemap>"
        "</sitemapindex>" % _NS
    ).encode()
    out = parse_sitemaps(
        _fetched(
            spark,
            [("http://s.example/sm.xml", sm), ("http://s.example/idx.xml", idx)],
        )
    ).collect()
    by_kind: dict = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["parse_error"] is None for r in out)
    urls = sorted(by_kind["urlset"], key=lambda r: r["position"])
    assert [(r["loc"], r["lastmod"], r["changefreq"], r["priority"]) for r in urls] == [
        ("http://s.example/a", "2026-01-02", "daily", 0.8),
        ("http://s.example/b", None, None, None),
    ]
    kids = sorted(by_kind["sitemapindex"], key=lambda r: r["position"])
    assert [r["loc"] for r in kids] == [
        "http://s.example/sm1.xml",
        "http://s.example/sm2.xml.gz",
    ]


def test_parse_text_gzip_feeds_and_errors(spark):
    text = b"http://t.example/1\n\nhttps://t.example/2\n"
    gz = gzip.compress(_urlset([("http://g.example/x", None, None, None)]))
    rss = (
        b"<rss version='2.0'><channel><title>t</title>"
        b"<item><link>http://r.example/p1</link>"
        b"<pubDate>Mon, 02 Jan 2026</pubDate></item>"
        b"</channel></rss>"
    )
    atom = (
        b"<feed xmlns='http://www.w3.org/2005/Atom'>"
        b"<entry><link rel='alternate' href='http://at.example/e1'/>"
        b"<updated>2026-03-01</updated></entry></feed>"
    )
    bad_xml = b"<urlset><url><loc>http://x/"
    bad_text = b"http://ok.example/1\nnot a url\n"
    # gzip bomb: 60MB of zeros compresses tiny; must degrade loudly
    bomb = gzip.compress(b"\x00" * (60 * 1024 * 1024))
    out = {
        r["sitemap_url"]: r
        for r in parse_sitemaps(
            _fetched(
                spark,
                [
                    ("u://text", text),
                    ("u://gz", gz),
                    ("u://rss", rss),
                    ("u://atom", atom),
                    ("u://badxml", bad_xml),
                    ("u://badtext", bad_text),
                    ("u://bomb", bomb),
                    ("u://empty", b""),
                ],
            )
        ).collect()
        if r["position"] in (0, None)
    }
    assert out["u://text"]["kind"] == "text"
    assert out["u://text"]["loc"] == "http://t.example/1"
    assert out["u://gz"]["kind"] == "urlset"
    assert out["u://gz"]["loc"] == "http://g.example/x"
    assert out["u://rss"]["kind"] == "feed"
    assert out["u://rss"]["loc"] == "http://r.example/p1"
    assert out["u://rss"]["lastmod"] == "Mon, 02 Jan 2026"
    assert out["u://atom"]["kind"] == "feed"
    assert out["u://atom"]["loc"] == "http://at.example/e1"
    for bad in ("u://badxml", "u://badtext", "u://bomb", "u://empty"):
        assert out[bad]["parse_error"] is not None, bad
        assert out[bad]["loc"] is None
    assert "50MB" in out["u://bomb"]["parse_error"]


def test_frontier_dedup_and_governance_composition(spark):
    """The frontier collapses canonical duplicates (freshest lastmod
    wins), then flows through robots → quota unchanged — the
    discovery-to-governance handoff."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
        per_host_quota,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        drop_disallowed,
    )

    sm = _urlset(
        [
            ("http://f.example/p?id=1&amp;utm_source=x", "2026-01-01", "daily", 0.9),
            ("HTTP://F.EXAMPLE:80/p?id=1", "2026-02-01", "weekly", 0.4),  # same canon
            ("http://f.example/blocked/1", "2026-01-01", None, None),
        ]
        + [(f"http://f.example/many/{i}", None, None, None) for i in range(10)]
    )
    entries = parse_sitemaps(
        _fetched(spark, [("http://f.example/sm.xml", sm)])
    )
    frontier = sitemap_frontier(entries)
    rows = {r["curl"]: r for r in frontier.collect()}
    assert len(rows) == 12  # 13 entries, one canonical collapse
    dup = rows["http://f.example/p?id=1"]
    assert dup["lastmod"] == "2026-02-01"  # freshest claim won
    assert dup["host"] == "f.example"
    # scheduler hints survive: changefreq from the winning claim,
    # priority = the strongest ask across duplicates
    assert dup["changefreq"] == "weekly"
    assert dup["priority"] == 0.9

    robots = spark.createDataFrame(
        [("f.example", "User-agent: *\nDisallow: /blocked/\n")],
        "host string, robots_txt string",
    )
    allowed = drop_disallowed(frontier, robots, url_col="curl")
    assert allowed.count() == 11
    capped = per_host_quota(allowed, k=5, url_col="curl")
    assert capped.count() == 5
    assert capped.columns == allowed.columns


def test_kernel_never_raises_on_mutations(spark):
    """Bit-flips and truncations anywhere: parse_error rows or valid
    entries, never a task failure."""
    base = _urlset([("http://m.example/a", "2026-01-01", "daily", 0.5)])
    cases = [("cut%d" % i, base[:i]) for i in range(0, len(base), 17)]
    mutated = []
    for pos in range(0, len(base), 23):
        m = bytearray(base)
        m[pos] ^= 0x5A
        mutated.append(("mut%d" % pos, bytes(m)))
    out = parse_sitemaps(_fetched(spark, cases + mutated))
    # EXACTLY one-or-more rows per input (no silently dropped
    # inputs), and the action completes
    assert out.count() >= len(cases) + len(mutated)
    assert out.select("sitemap_url").distinct().count() == len(cases) + len(mutated)
    assert out.filter(
        F.col("parse_error").isNull() & F.col("loc").isNull()
    ).count() == 0


def test_host_sitemaps_bare_directive_and_scope(spark):
    """Review edges: a bare 'Sitemap:' line declares nothing (it must
    not inject the homepage); the frontier drops cross-host locs by
    default (hostile-injection guard) and keeps them only on
    explicit enforce_scope=False."""
    robots = spark.createDataFrame(
        [("a.example", "Sitemap:\nSitemap:   \nSitemap: # c\n"
          "Sitemap: https://a.example/real.xml\n")],
        "host string, robots_txt string",
    )
    got = host_sitemaps(robots).collect()
    assert [(r["host"], r["sitemap_url"]) for r in got] == [
        ("a.example", "https://a.example/real.xml")
    ]

    sm = _urlset(
        [
            ("http://mine.example/ok", None, None, None),
            ("http://victim.example/injected", None, None, None),
        ]
    )
    entries = parse_sitemaps(
        _fetched(spark, [("http://mine.example/sm.xml", sm)])
    )
    scoped = {r["curl"] for r in sitemap_frontier(entries).collect()}
    assert scoped == {"http://mine.example/ok"}
    unscoped = {
        r["curl"]
        for r in sitemap_frontier(entries, enforce_scope=False).collect()
    }
    assert unscoped == {
        "http://mine.example/ok",
        "http://victim.example/injected",
    }


def test_dtd_entity_bodies_are_refused(spark):
    """A billion-laughs body must degrade to a parse_error row before
    any expansion happens — not depend on the host expat version."""
    laughs = (
        b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY lol "lol">'
        b'<!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">]>'
        b"<urlset><url><loc>&lol2;</loc></url></urlset>"
    )
    out = parse_sitemaps(_fetched(spark, [("u://lol", laughs)])).collect()
    assert len(out) == 1
    assert "DTD" in out[0]["parse_error"]


def test_refresh_candidates_against_seen_index(spark, tmp_path):
    """Discovery composes with the streaming seen-index: never-seen
    URLs and lastmod-newer URLs are refetch candidates; seen-and-
    unchanged (or claim-free) URLs drop."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
        refresh_candidates,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
        ParquetTable,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (
        fold_crawl_url_index,
    )

    sm = _urlset(
        [
            ("http://h.example/new", "2026-05-01", None, None),
            ("http://h.example/changed", "2026-05-01", None, None),
            ("http://h.example/stale", "2026-01-01", None, None),
            ("http://h.example/noclaim", None, None, None),
        ]
    )
    frontier = sitemap_frontier(
        parse_sitemaps(_fetched(spark, [("http://h.example/sm.xml", sm)]))
    )

    index = ParquetTable(spark, str(tmp_path / "seen"))
    pages = spark.createDataFrame(
        [
            (1, "http://h.example/changed", "2026-03-15", "<p>c</p>"),
            (2, "http://h.example/stale", "2026-03-15", "<p>s</p>"),
            (3, "http://h.example/noclaim", "2026-03-15", "<p>n</p>"),
        ],
        "doc_id long, url string, fetched_at string, html string",
    )
    fold_crawl_url_index(index, pages, batch_id=0)

    got = {
        r["curl"]: r["reason"]
        for r in refresh_candidates(frontier, index.read()).collect()
    }
    assert got == {
        "http://h.example/new": "never_fetched",
        "http://h.example/changed": "modified",
    }


def test_refresh_candidates_mixed_stamp_formats(spark):
    """Freshness verdicts when stamps don't parse as timestamps:
    exactly ONE side parsing means modified (lexical order across
    formats is an arbitrary verdict — e.g. a W3C lastmod sorts BELOW
    an epoch-int stored stamp, which would wrongly prove freshness);
    lexical order applies only when BOTH sides are unparseable and
    therefore share one caller-chosen format."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
        refresh_candidates,
    )

    frontier = spark.createDataFrame(
        [
            # W3C lastmod vs epoch-int stored stamp: lexically
            # "2026-05-01" < "9999999999" — the old fallback said
            # unmodified; one-side-parses must say modified
            ("http://h.example/w3c-vs-epoch", "2026-05-01"),
            # garbage lastmod vs parseable stored stamp: unknowable
            # claim -> conservative modified
            ("http://h.example/garbage-claim", "recently"),
            # both unparseable, shared format: lexical order holds
            ("http://h.example/epoch-newer", "9999999999"),
            ("http://h.example/epoch-older", "1000000000"),
        ],
        "curl string, lastmod string",
    )
    seen = spark.createDataFrame(
        [
            ("http://h.example/w3c-vs-epoch", "9999999999"),
            ("http://h.example/garbage-claim", "2026-03-15"),
            ("http://h.example/epoch-newer", "5000000000"),
            ("http://h.example/epoch-older", "5000000000"),
        ],
        "curl string, fetched_at string",
    )
    got = {
        r["curl"].rsplit("/", 1)[1]: r["reason"]
        for r in refresh_candidates(frontier, seen).collect()
    }
    assert got == {
        "w3c-vs-epoch": "modified",
        "garbage-claim": "modified",
        "epoch-newer": "modified",
    }  # epoch-older drops: both unparseable, lexically stale


def test_urlset_roundtrip_property(spark):
    """Generator round-trip: arbitrary URL/lastmod/priority entry
    lists (XML-escaped, incl. &, unicode paths, 0-priority) survive
    build → parse exactly, in order."""
    from xml.sax.saxutils import escape

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # XML 1.0 forbids C0 controls and noncharacters (parse_error is
    # CORRECT for them — hypothesis found the first class itself);
    # surrogates don't encode; Unicode whitespace (Zs/Zl/Zp) would be
    # strip()ed by the parser's child_text, failing exact round-trip
    path_chars = st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=["Cc", "Cs", "Cn", "Zs", "Zl", "Zp"],
            exclude_characters="<>\"'\r\n ",
        ),
        min_size=0,
        max_size=20,
    )
    entry = st.tuples(
        path_chars,
        st.one_of(st.none(), st.dates().map(str)),
        st.one_of(
            st.none(),
            st.floats(min_value=0.0, max_value=1.0).map(
                lambda f: round(f, 3)
            ),
        ),
    )

    @given(st.lists(entry, min_size=1, max_size=12))
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(entries):
        body = (
            '<?xml version="1.0" encoding="UTF-8"?><urlset %s>' % _NS
            + "".join(
                "<url><loc>%s</loc>%s%s</url>"
                % (
                    escape(f"http://rt.example/{p}"),
                    f"<lastmod>{lm}</lastmod>" if lm else "",
                    f"<priority>{pr}</priority>" if pr is not None else "",
                )
                for p, lm, pr in entries
            )
            + "</urlset>"
        ).encode()
        got = sorted(
            parse_sitemaps(_fetched(spark, [("u://rt", body)])).collect(),
            key=lambda r: r["position"],
        )
        assert all(r["parse_error"] is None for r in got)
        assert [
            (r["loc"], r["lastmod"], r["priority"]) for r in got
        ] == [
            (f"http://rt.example/{p}", lm, pr) for p, lm, pr in entries
        ]

    check()


def test_protocol_relative_sitemap_directive(spark):
    """'Sitemap: //cdn.example/m.xml' is protocol-relative, not a
    host-relative path (review r8)."""
    robots = spark.createDataFrame(
        [("a.example", "Sitemap: //cdn.example/m.xml\n")],
        "host string, robots_txt string",
    )
    got = host_sitemaps(robots).collect()
    assert [(r["host"], r["sitemap_url"]) for r in got] == [
        ("a.example", "http://cdn.example/m.xml")
    ]
