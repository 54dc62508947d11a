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
    pandas group. The group key is (host, xxhash64(url) % salt_buckets),
    so a hot host's largest group is ~n/salt_buckets — verified here on
    the exact salt expression, plus end-to-end correctness on 50k
    single-host URLs."""
    import pyspark.sql.functions as SF

    n, buckets = 50_000, 16
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
    out = robots_allowed(urls, robots, salt_buckets=buckets)
    agg = out.agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.sum(SF.col("allowed").cast("long")).alias("n_allowed"),
    ).collect()[0]
    assert agg["n"] == n
    # /page/1 prefix-matches 1, 1x, 1xx, 1xxx, 1xxxx
    assert agg["n_allowed"] == n - (1 + 10 + 100 + 1000 + 10000)
    # the salt bounds every group: max group size ~ n/buckets
    sizes = (
        urls.groupBy(SF.pmod(SF.xxhash64("url"), SF.lit(buckets)).alias("s"))
        .count()
        .collect()
    )
    assert len(sizes) == buckets
    assert max(r["count"] for r in sizes) < 2 * n / buckets
