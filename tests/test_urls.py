"""URL canonicalization: RFC 3986 syntax normalizations, tracking
strip, param sort, grouping keys — plus the property that
canonicalization is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.urls import (
    canonical_url,
    url_host,
    url_registered_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_normalizations(spark):
    cases = [
        # scheme/host case, default port, fragment
        ("HTTP://WWW.Example.COM:80/Path#frag", "http://www.example.com/Path"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # userinfo dropped
        ("http://user:pw@example.com/x", "http://example.com/x"),
        # empty path -> /
        ("http://example.com", "http://example.com/"),
        # tracking params stripped, remainder sorted, empty query gone
        (
            "http://e.com/p?utm_source=tw&b=2&a=1&fbclid=XYZ",
            "http://e.com/p?a=1&b=2",
        ),
        ("http://e.com/p?utm_campaign=x", "http://e.com/p"),
        ("http://e.com/p?z=1&y=2&gclid=g#f", "http://e.com/p?y=2&z=1"),
        # trailing slash preserved (can be semantic)
        ("http://e.com/a/", "http://e.com/a/"),
        # unparseable passes through trimmed
        ("  not a url  ", "not a url"),
    ]
    got = _canon(spark, [c[0] for c in cases])
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)


def test_canonicalization_is_idempotent(spark):
    urls = [
        "HTTP://A.B:80/x?utm_a=1&q=2#z",
        "https://u@h.io:443",
        "http://e.com/p?b=2&a=1",
        # ADVICE r5: repeated params differing only in escape hex case
        # must sort on the NORMALIZED form — sorting the raw forms
        # made these two RFC-equivalent URLs canonicalize differently
        # and made re-canonicalizing the output change it again.
        "http://e.com/p?q=%4a&q=%4B",
        "http://e.com/p?q=%4A&q=%4B",
        # VERDICT r6: %-encoded unreserved chars decode (§6.2.2.2),
        # including a tracking param hiding behind %5F ('_') — both
        # must be stable under re-canonicalization
        "http://e.com/%41bc?utm%5Fsource=x&q=%7Ea",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice
    # ...and the two escape-case variants share ONE canonical key
    # (%4A/%4B are unreserved J/K, so §6.2.2.2 decodes them outright)
    assert once[3] == once[4] == "http://e.com/p?q=J&q=K"


def test_unreserved_percent_decoding(spark):
    """RFC 3986 §6.2.2.2: '%41bc' and 'Abc' are the SAME path — they
    must share one canonical key. Reserved escapes stay encoded
    (uppercased), so no wrong-merge is possible."""
    pairs = [
        ("http://e.com/%41bc", "http://e.com/Abc"),
        ("http://e.com/a%2D%2e%5F%7eb", "http://e.com/a-._~b"),
        ("http://e.com/p?q=%6a%31", "http://e.com/p?q=j1"),
    ]
    for enc, plain in pairs:
        got = _canon(spark, [enc, plain])
        assert got[0] == got[1] == plain, (enc, got)
    # reserved octets keep their (uppercased) escapes: %2F is NOT '/'
    assert _canon(spark, ["http://e.com/a%2fb%25c"]) == [
        "http://e.com/a%2Fb%25c"
    ]
    # tracking param spelled with an encoded underscore still strips
    assert _canon(spark, ["http://e.com/p?utm%5Fsource=x&a=1"]) == [
        "http://e.com/p?a=1"
    ]


def test_grouping_keys(spark):
    df = spark.createDataFrame(
        [
            ("https://News.Example.CO.uk:8443/x",),
            ("http://user@sub.a.example.com/y",),
            ("http://localhost/z",),
        ],
        "url string",
    )
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert rows[0]["h"] == "news.example.co.uk" and rows[0]["d"] == "co.uk"
    assert rows[1]["h"] == "sub.a.example.com" and rows[1]["d"] == "example.com"
    assert rows[2]["h"] == "localhost" and rows[2]["d"] == "localhost"


def test_url_dedup_collapses_variants(spark):
    """The operator's purpose: trivially-different fetches of one
    page share a canonical key."""
    variants = [
        "http://Example.com:80/page?utm_source=a",
        "HTTP://example.COM/page",
        "http://user@example.com/page#top",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    n = (
        df.select(canonical_url(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert n == 1


def test_review_fixes_ref_ip_trailing_dot_pct_case(spark):
    """Self-review r5 regression pins: `ref` is often semantic (NOT
    stripped); GA4 underscore utm names ARE stripped; IP hosts keep
    their whole address as the quota key; trailing-dot FQDNs collapse
    with their dotless form; percent-escape hex case normalizes."""
    # ref preserved, GA4 utm stripped
    assert _canon(spark, ["http://e.com/p?ref=electronics"]) == [
        "http://e.com/p?ref=electronics"
    ]
    assert _canon(spark, ["http://e.com/p?utm_source_platform=x&a=1"]) == [
        "http://e.com/p?a=1"
    ]
    # trailing-dot host
    assert _canon(spark, ["http://e.com./x", "http://E.com.:80/x"]) == [
        "http://e.com/x",
        "http://e.com/x",
    ]
    # percent-escape case
    assert _canon(
        spark, ["http://e.com/a%2fb?q=%3a", "http://e.com/a%2Fb?q=%3A"]
    ) == ["http://e.com/a%2Fb?q=%3A"] * 2
    # IP-literal quota keys stay whole
    df = spark.createDataFrame(
        [("http://192.168.0.1/x",), ("http://10.2.3.4:8080/y",),
         ("http://e.com./z",)],
        "url string",
    )
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert rows[0]["d"] == "192.168.0.1"
    assert rows[1]["d"] == "10.2.3.4"
    assert rows[2]["h"] == "e.com" and rows[2]["d"] == "e.com"
