"""robots.txt compliance filter: original-REP first-match semantics
via stdlib urllib.robotparser, evaluated parse-once-per-host; differential
against per-URL robotparser; REP defaults for missing/unparseable
rules."""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
    drop_disallowed,
    robots_allowed,
)

# stdlib robotparser is FIRST-match (original REP), so the Allow
# carve-out must precede the Disallow it overrides
_RULES_A = """
User-agent: *
Allow: /private/ok.html
Disallow: /private/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""

_RULES_B = """
User-agent: *
Disallow:
"""


def _frames(spark):
    urls = spark.createDataFrame(
        [
            (0, "http://a.example/index.html"),
            (1, "http://a.example/private/secret.html"),
            (2, "http://a.example/private/ok.html"),
            (3, "http://a.example/tmpfile"),
            (4, "http://b.example/anything"),
            (5, "http://norobots.example/x"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.example", _RULES_A),
            ("b.example", _RULES_B),
            ("broken.example", None),
        ],
        "host string, robots_txt string",
    )
    return urls, robots


def test_rep_semantics_and_defaults(spark):
    urls, robots = _frames(spark)
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots).collect()
    }
    assert got == {
        0: True,   # not matched by any disallow
        1: False,  # /private/ disallowed
        2: True,   # allow carve-out (precedes the disallow: first-match)
        3: False,  # /tmp prefix match
        4: True,   # empty disallow = allow everything
        5: True,   # host with no robots row: REP default allow
    }
    kept = {r["doc_id"] for r in drop_disallowed(urls, robots).collect()}
    assert kept == {0, 2, 4, 5}
    # pass-through columns and schema survive
    cols = robots_allowed(urls, robots).columns
    assert cols == ["doc_id", "url", "allowed"]


def test_agent_specific_group(spark):
    urls, robots = _frames(spark)
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, agent="specialbot").collect()
    }
    # specialbot is banned from all of a.example, unaffected elsewhere
    assert got[0] is False and got[1] is False and got[2] is False
    assert got[4] is True and got[5] is True


def test_differential_vs_per_url_robotparser(spark, sf_dir):
    """The grouped kernel must agree with calling robotparser per URL
    — same library, so this pins the PLUMBING (join, grouping,
    pass-through, null handling), not the rule semantics."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    hosts = [f"h{i}.example" for i in range(7)]
    rules = {
        h: f"User-agent: *\nDisallow: /doc/{i}\n" for i, h in enumerate(hosts)
    }
    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.concat(
                F.lit("http://"),
                F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example")),
                F.lit("/doc/"),
                (F.col("doc_id") % 13).cast("string"),
            ).alias("url"),
        )
    )
    robots = spark.createDataFrame(
        [(h, b) for h, b in rules.items()], "host string, robots_txt string"
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(docs, robots).collect()
    }
    for r in docs.collect():
        p = urllib.robotparser.RobotFileParser()
        host = r["url"].split("/")[2]
        p.parse(rules[host].splitlines())
        assert got[r["doc_id"]] == p.can_fetch("*", r["url"]), r["url"]


def test_duplicate_host_rows_collapse(spark):
    """ADVICE r5: a robots frame carrying several fetches of one
    host must not fan URL rows out (left join would duplicate every
    row for that host). With fetched_col the LATEST fetch wins;
    without it the collapse is deterministic."""
    urls = spark.createDataFrame(
        [(0, "http://a.example/private/x"), (1, "http://a.example/open")],
        "doc_id long, url string",
    )
    jan = "User-agent: *\nDisallow:\n"            # allow everything
    mar = "User-agent: *\nDisallow: /private/\n"  # later fetch disallows
    robots = spark.createDataFrame(
        [("a.example", jan, 1), ("a.example", mar, 3)],
        "host string, robots_txt string, fetched_at int",
    )
    out = robots_allowed(urls, robots, fetched_col="fetched_at").collect()
    assert len(out) == 2  # no row duplication
    got = {r["doc_id"]: r["allowed"] for r in out}
    assert got == {0: False, 1: True}  # March rules, not January's
    # reversed fetch order — same answer (max_by, not first)
    robots_rev = spark.createDataFrame(
        [("a.example", mar, 3), ("a.example", jan, 1)],
        "host string, robots_txt string, fetched_at int",
    )
    assert (
        {r["doc_id"]: r["allowed"]
         for r in robots_allowed(urls, robots_rev, fetched_col="fetched_at").collect()}
        == got
    )
    # without fetched_col: still exactly one row per URL, deterministic
    no_ts = robots_allowed(urls, robots.drop("fetched_at"))
    assert no_ts.count() == 2
    assert sorted(no_ts.collect()) == sorted(
        robots_allowed(urls, robots_rev.drop("fetched_at")).collect()
    )


def test_null_fetched_rows_still_enforce(spark):
    """ADVICE r6: bare max_by ignores NULL-ordering rows, so a host
    whose robots rows ALL carry null fetch times would silently lose
    its rules (Disallow bypassed). The struct ordering keeps them:
    all-null hosts enforce, and null sorts as OLDEST when a timed
    fetch exists."""
    urls = spark.createDataFrame(
        [(0, "http://a.example/private/x"), (1, "http://b.example/private/x")],
        "doc_id long, url string",
    )
    deny = "User-agent: *\nDisallow: /private/\n"
    allow_all = "User-agent: *\nDisallow:\n"
    robots = spark.createDataFrame(
        [
            ("a.example", deny, None),        # all-null host: rules must hold
            ("b.example", deny, None),        # null = oldest ...
            ("b.example", allow_all, 5),      # ... timed fetch wins
        ],
        "host string, robots_txt string, fetched_at int",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, fetched_col="fetched_at").collect()
    }
    assert got == {0: False, 1: True}


def test_fetched_tie_breaks_deterministically(spark):
    """Two fetches sharing the max fetch time: the lexically-greatest
    body wins, independent of input row order."""
    urls = spark.createDataFrame(
        [(0, "http://a.example/private/x")], "doc_id long, url string"
    )
    deny = "User-agent: *\nDisallow: /private/\n"   # 'U...D' > 'A...' no —
    allow_all = "User-agent: *\nDisallow:\n"        # deny > allow_all lexically
    assert deny > allow_all
    rows = [("a.example", allow_all, 7), ("a.example", deny, 7)]
    for ordering in (rows, rows[::-1]):
        robots = spark.createDataFrame(
            ordering, "host string, robots_txt string, fetched_at int"
        )
        out = robots_allowed(urls, robots, fetched_col="fetched_at").collect()
        assert out[0]["allowed"] is False  # deny body wins the tie


def test_drop_disallowed_renamed_columns(spark):
    """ADVICE r6: the filter form forwards host_col/body_col, so a
    robots frame with its own column names works end-to-end."""
    urls = spark.createDataFrame(
        [(0, "http://a.example/private/x"), (1, "http://a.example/open")],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n", 3)],
        "site string, body string, seen int",
    )
    kept = {
        r["doc_id"]
        for r in drop_disallowed(
            urls, robots, host_col="site", body_col="body", fetched_col="seen"
        ).collect()
    }
    assert kept == {1}


_RFC_RULES = """
User-agent: *
Disallow: /a/
Allow: /a/b
Disallow: /*.pdf$
Disallow: /page
Allow: /page
Disallow:
"""


def test_rfc9309_longest_match(spark):
    """RFC 9309 divergence matrix vs stdlib first-match: a later
    Allow with a LONGER pattern overrides a broader Disallow; ``*``
    wildcards and ``$`` anchors apply; Allow wins exact-length ties;
    empty Disallow is ignored."""
    cases = {
        0: ("http://a.example/a/x", False, False),   # /a/ disallows in both
        1: ("http://a.example/a/b1", True, False),   # longest-match carve-out
        2: ("http://a.example/doc.pdf", False, True),  # wildcard; stdlib literal
        3: ("http://a.example/doc.pdf?x=1", True, True),  # $ anchor: query breaks it
        4: ("http://a.example/page", True, False),   # tie: Allow wins; stdlib
                                                     # first-match hits the Disallow
        5: ("http://a.example/other", True, True),   # no rule matches
    }
    urls = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "doc_id long, url string"
    )
    robots = spark.createDataFrame(
        [("a.example", _RFC_RULES)], "host string, robots_txt string"
    )
    rfc = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, rep="rfc9309").collect()
    }
    assert rfc == {k: v[1] for k, v in cases.items()}
    # the documented divergences really diverge (stdlib column)
    std = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, rep="stdlib").collect()
    }
    for k, (_, _, std_want) in cases.items():
        assert std[k] is std_want, k


def test_rfc9309_group_selection(spark):
    """Most-specific agent token wins; same-token groups merge; *
    only as fallback."""
    body = """
User-agent: widebot
Disallow: /w/

User-agent: *
Disallow: /all/

User-agent: widebot
Disallow: /w2/
"""
    urls = spark.createDataFrame(
        [
            (0, "http://a.example/w/x"),
            (1, "http://a.example/w2/x"),
            (2, "http://a.example/all/x"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.example", body)], "host string, robots_txt string"
    )
    wide = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, agent="widebot", rep="rfc9309").collect()
    }
    # both widebot groups merge; the * group does NOT apply
    assert wide == {0: False, 1: False, 2: True}
    other = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, robots, agent="otherbot", rep="rfc9309").collect()
    }
    assert other == {0: True, 1: True, 2: False}


def test_hot_host_group_is_salted(spark):
    """VERDICT r6 scale fix: one host × many URLs must not form one
    pandas group. The salt is adaptive — ceil(host_rows /
    max_group_rows) buckets, capped — so this pins BOTH halves: a hot
    host splits into bounded groups (correct answers at 50k rows with
    a 4k bound) and a small host keeps exactly one bucket (the
    parse-once amortization for the crawl's long tail)."""
    import pyspark.sql.functions as SF

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        _n_salt_buckets,
    )

    n, bound = 50_000, 4096
    urls = spark.range(n).select(
        SF.col("id").alias("doc_id"),
        SF.concat(
            SF.lit("http://hot.example/page/"), SF.col("id").cast("string")
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [("hot.example", "User-agent: *\nDisallow: /page/1\n")],
        "host string, robots_txt string",
    )
    out = robots_allowed(urls, robots, max_group_rows=bound)
    agg = out.agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.sum(SF.col("allowed").cast("long")).alias("n_allowed"),
    ).collect()[0]
    assert agg["n"] == n
    # /page/1 prefix-matches 1, 1x, 1xx, 1xxx, 1xxxx
    assert agg["n_allowed"] == n - (1 + 10 + 100 + 1000 + 10000)
    # bucket arithmetic: 50k rows / 4k bound → 13 buckets; a 10-row
    # host → 1 bucket; NULL (unmatched) → 1; the hard cap applies
    got = (
        spark.createDataFrame(
            [(50_000,), (10,), (None,), (10**9,)], "nr long"
        )
        .select(_n_salt_buckets(SF.col("nr"), bound, 1024).alias("b"))
        .collect()
    )
    assert [r["b"] for r in got] == [13, 1, 1, 1024]
    # and the salt really bounds the hot host's groups: uniform
    # xxhash64 over 13 buckets keeps every group well under 2× ideal
    sizes = (
        urls.groupBy(SF.pmod(SF.xxhash64("url"), SF.lit(13)).alias("s"))
        .count()
        .collect()
    )
    assert len(sizes) == 13
    assert max(r["count"] for r in sizes) < 2 * n / 13


def test_small_hosts_keep_one_group(spark):
    """Long-tail shape: hosts under max_group_rows stay at one salt
    bucket, so the parse-once-per-host amortization survives the
    salting fix (self-review r7)."""
    import pyspark.sql.functions as SF

    urls = spark.range(300).select(
        SF.col("id").alias("doc_id"),
        SF.concat(
            SF.lit("http://h"),
            (SF.col("id") % 50).cast("string"),
            SF.lit(".example/p/"),
            SF.col("id").cast("string"),
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [(f"h{i}.example", "User-agent: *\nDisallow: /p/0\n") for i in range(50)],
        "host string, robots_txt string",
    )
    out = robots_allowed(urls, robots)  # default max_group_rows
    assert out.count() == 300
    # with 6 rows per host every host gets exactly 1 bucket
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        _MAX_GROUP_ROWS,
        _n_salt_buckets,
    )

    one = (
        spark.createDataFrame([(6,)], "nr long")
        .select(_n_salt_buckets(SF.col("nr"), _MAX_GROUP_ROWS, 1024).alias("b"))
        .collect()[0]["b"]
    )
    assert one == 1


def test_garbage_url_and_garbage_ua_do_not_crash(spark):
    """Self-review r7: a malformed URL ('http://[::1/x' makes
    robotparser raise) must degrade to allowed=False, not kill the
    stage — in BOTH modes; and an empty/garbage User-agent token
    ('User-agent:' / 'User-agent: /') must not suppress the * group
    in rfc9309 mode."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.urls import (
        url_host,
    )

    bad = "http://[::1/x"  # unbalanced bracket: robotparser raises
    urls = spark.createDataFrame(
        [(0, bad), (1, "http://a.example/ok")],
        "doc_id long, url string",
    )
    # the bad URL's rules row must JOIN (otherwise missing-robots
    # default-allow short-circuits before the parser ever runs), so
    # key it by the host expression the operator itself derives
    bad_host = (
        spark.createDataFrame([(bad,)], "url string")
        .select(url_host(F.col("url")).alias("h"))
        .collect()[0]["h"]
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n"),
         (bad_host, "User-agent: *\nDisallow: /nothing\n")],
        "host string, robots_txt string",
    )
    for rep in ("stdlib", "rfc9309"):
        got = {
            r["doc_id"]: r["allowed"]
            for r in robots_allowed(urls, robots, rep=rep).collect()
        }
        assert got[1] is True, rep
        assert got[0] is False, rep  # unevaluable, not a crash
    # garbage UA lines: '' would substring-match every agent and
    # shadow *; the parser must skip them
    body = "User-agent:\nDisallow: /\nUser-agent: *\nDisallow:\n"
    urls2 = spark.createDataFrame(
        [(0, "http://b.example/any")], "doc_id long, url string"
    )
    robots2 = spark.createDataFrame(
        [("b.example", body)], "host string, robots_txt string"
    )
    out = robots_allowed(urls2, robots2, agent="anybot", rep="rfc9309").collect()
    assert out[0]["allowed"] is True


def test_rfc9309_percent_normalization():
    """ADVICE r7: §2.2.2 matching happens on percent-NORMALIZED
    octets (RFC 3986 §6.2.2) — rule and path spellings that encode
    the same octets must match regardless of hex case or unreserved
    escaping; reserved escapes stay encoded so %2A/%24 never become
    wildcard/anchor metacharacters."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        _Rfc9309Matcher,
    )

    # lowercase %2f in the rule vs canonical uppercase %2F in the URL
    m = _Rfc9309Matcher("User-agent: *\nDisallow: /a%2fb\n", "*")
    assert m.can_fetch("http://x.example/a%2Fb") is False
    assert m.can_fetch("http://x.example/a%2fb") is False  # and vice versa
    assert m.can_fetch("http://x.example/a/b") is True  # a real slash differs
    # unreserved escape in the rule (%44 = 'D') vs plain path — both ways
    m2 = _Rfc9309Matcher("User-agent: *\nDisallow: /%44oc/\n", "*")
    assert m2.can_fetch("http://x.example/Doc/1") is False
    m3 = _Rfc9309Matcher("User-agent: *\nDisallow: /Doc/\n", "*")
    assert m3.can_fetch("http://x.example/%44oc/1") is False
    # %2A is a LITERAL asterisk octet, not a wildcard
    m4 = _Rfc9309Matcher("User-agent: *\nDisallow: /p%2Aq\n", "*")
    assert m4.can_fetch("http://x.example/pXXXq") is True
    assert m4.can_fetch("http://x.example/p%2Aq") is False
    # longest-match length is measured on NORMALIZED octets: the
    # Disallow '/%44oc/' is 7 raw but 5 normalized octets, so the
    # 6-octet Allow '/Doc/2' must outrank it
    m5 = _Rfc9309Matcher(
        "User-agent: *\nDisallow: /%44oc/\nAllow: /Doc/2\n", "*"
    )
    assert m5.can_fetch("http://x.example/Doc/2x") is True


def test_pct_normalize_py_twins_column_expression(spark):
    """Self-review r8: _pct_normalize_py must be the EXACT twin of
    urls._pct_normalize — including malformed escapes ('%zz' →
    '%ZZ'), short escapes ('%a' → '%A'), and a bare trailing '%' —
    or a rule pattern and a canonical_url-normalized path with the
    same spelling stop matching."""
    from pyspark.sql import functions as SF

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        _pct_normalize_py,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.urls import (
        _pct_normalize,
    )

    cases = [
        "/a%2fb", "/a%2Fb", "/%41%62c", "/x%zz", "/x%ZZ", "/p%2Aq",
        "/t%24", "/short%a", "/trail%", "/%", "/plain/path", "",
        "/%e4%b8%ad", "/mixed%4a%4A%zz%", "/q?x=%7e&y=%7E",
    ]
    got_py = [_pct_normalize_py(c) for c in cases]
    got_col = [
        r["n"]
        for r in spark.createDataFrame(
            list(enumerate(cases)), "i long, s string"
        )
        .select("i", _pct_normalize(SF.col("s")).alias("n"))
        .orderBy("i")
        .collect()
    ]
    assert got_py == got_col


def test_rfc9309_whole_token_group_match():
    """ADVICE r7: §2.2.1 group selection compares whole product
    tokens case-insensitively — token 'bot' must NOT capture agent
    'examplebot', and the agent's version suffix is ignored."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        _Rfc9309Matcher,
    )

    body = (
        "User-agent: bot\nDisallow: /b/\n\n"
        "User-agent: examplebot\nDisallow: /e/\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    # substring would have merged the 'bot' group here; exact match picks
    # only the examplebot group (case-insensitive, version stripped)
    m = _Rfc9309Matcher(body, "ExampleBot/2.1")
    assert m.can_fetch("http://x.example/e/1") is False
    assert m.can_fetch("http://x.example/b/1") is True
    assert m.can_fetch("http://x.example/star/1") is True
    # an agent matching NO token falls back to *
    m2 = _Rfc9309Matcher(body, "otherbot")
    assert m2.can_fetch("http://x.example/star/1") is False
    assert m2.can_fetch("http://x.example/e/1") is True


def test_host_crawl_delays_both_modes(spark):
    """Crawl-delay extraction (VERDICT r7 #7): per-agent group
    selection in each mode's own semantics — stdlib integer-only
    first-entry, rfc9309 whole-token merge with max-of-merged —
    latest fetch per host, null for missing/garbage."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        host_crawl_delays,
    )

    body_star = "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
    body_float = "User-agent: *\nCrawl-delay: 2.5\n"
    body_merge = (
        "User-agent: fastbot\nCrawl-delay: 1\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 9\n\n"
        "User-agent: fastbot\nCrawl-delay: 3\nDisallow: /b\n"
    )
    body_garbage = "User-agent: *\nCrawl-delay: soon\n"
    robots = spark.createDataFrame(
        [
            ("a.example", body_star, 1),
            ("a.example", "User-agent: *\nCrawl-delay: 7\n", 2),  # latest wins
            ("f.example", body_float, 1),
            ("m.example", body_merge, 1),
            ("g.example", body_garbage, 1),
            ("n.example", "User-agent: *\nDisallow: /\n", 1),  # none declared
        ],
        "host string, robots_txt string, fetched_at int",
    )

    def delays(agent, rep):
        return {
            r["host"]: r["crawl_delay"]
            for r in host_crawl_delays(
                robots, agent=agent, fetched_col="fetched_at", rep=rep
            ).collect()
        }

    rfc = delays("fastbot", "rfc9309")
    assert rfc["a.example"] == 7.0  # latest fetch, not max of fetches
    assert rfc["f.example"] == 2.5  # float accepted in rfc9309 mode
    assert rfc["m.example"] == 3.0  # merged fastbot groups: max(1, 3), not *'s 9
    assert rfc["g.example"] is None
    assert rfc["n.example"] is None

    std = delays("otherbot", "stdlib")
    assert std["a.example"] == 7.0
    assert std["m.example"] == 9.0  # stdlib: first applicable entry = *
    # stdlib ignores non-integer values — documented stdlib semantics
    assert std["f.example"] is None


def test_drop_disallowed_positional_compat(spark):
    """fetched_col keeps its historical 5th positional slot (newer
    params are keyword-only): a caller passing it positionally must
    get latest-fetch semantics, not a silently-disabled filter."""
    urls = spark.createDataFrame(
        [(0, "http://a.example/private/x")], "doc_id long, url string"
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow:\n", 1),
         ("a.example", "User-agent: *\nDisallow: /private/\n", 2)],
        "host string, robots_txt string, fetched_at int",
    )
    assert drop_disallowed(urls, robots, "*", "url", "fetched_at").count() == 0


def test_stale_robots_worklist(spark):
    """§2.4 freshness: latest-fetch per host vs a caller-supplied
    `now`; unknown/unparseable stamps are stale; fresh hosts drop."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
        stale_robots,
    )

    robots = spark.createDataFrame(
        [
            ("fresh.example", "User-agent: *\n", "2026-08-15T06:00:00"),
            ("fresh.example", "User-agent: *\n", "2026-08-13T00:00:00"),
            ("old.example", "User-agent: *\n", "2026-08-13T00:00:00"),
            ("nul.example", "User-agent: *\n", None),
            ("garbage.example", "User-agent: *\n", "soon"),
        ],
        "host string, robots_txt string, fetched_at string",
    )
    got = {
        r["host"]: r["age_hours"]
        for r in stale_robots(robots, "2026-08-15T12:00:00").collect()
    }
    assert set(got) == {"old.example", "nul.example", "garbage.example"}
    assert abs(got["old.example"] - 60.0) < 1e-6  # 2.5 days
    assert got["nul.example"] is None and got["garbage.example"] is None
    # a tighter budget pulls fresh.example in too (6h old vs 4h max)
    assert (
        stale_robots(robots, "2026-08-15T12:00:00", max_age_hours=4.0).count()
        == 4
    )

    # a garbage stamp must not lexically shadow a FRESH fetch of the
    # same host (review: stamps parse BEFORE the per-host max)
    mixed = spark.createDataFrame(
        [("m.example", "x", "soon"), ("m.example", "x", "2026-08-15T11:00:00")],
        "host string, robots_txt string, fetched_at string",
    )
    assert stale_robots(mixed, "2026-08-15T12:00:00").count() == 0

    # epoch-numeric stamps dispatch on type (the sibling APIs accept
    # them); native timestamps pass through
    import datetime

    epoch = spark.createDataFrame(
        [("e.example", "x", 1786536000),   # 2026-08-12ish: stale
         ("f.example", "x", 1787140500)],  # ~30min before now: fresh
        "host string, robots_txt string, fetched_at long",
    )
    now = datetime.datetime(2026, 8, 15, 12, 0, 0)
    got_e = [r["host"] for r in stale_robots(epoch, now).collect()]
    assert got_e == ["e.example"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="now"):
        stale_robots(robots, None)
