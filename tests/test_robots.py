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
