"""HTML → text extraction: kernel correctness on structured/
malformed/entity-laden markup, boilerplate signals, S4 null
semantics, and the JVM regexp tier's agreement with the stdlib
parser on tag-simple documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
    extract_html_record,
    extract_text,
    strip_tags_expr,
)

_DOC = """<!DOCTYPE html><html><head>
<title> The  Page &amp; Title </title>
<style>body { color: red; }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<h1>Heading</h1>
<p>First paragraph with <b>bold</b> and <i>italic</i>.</p>
<div>Second   block.<br/>After the break.</div>
<ul><li>alpha</li><li>beta</li></ul>
<p>Entities: &lt;tag&gt; &amp; &quot;quotes&quot; &#39;apostrophe&#39;</p>
<footer><a href="/about">About us</a> | <a href="/contact">Contact</a></footer>
</body></html>"""


def test_kernel_extracts_structure_title_and_entities():
    title, text, n_links, density = extract_html_record(_DOC)
    assert title == "The Page & Title"
    lines = text.split("\n")
    assert lines[0] == "Heading"
    assert "First paragraph with bold and italic." in lines
    assert "Second block." in lines
    assert "After the break." in lines
    assert "alpha" in lines and "beta" in lines
    assert "Entities: <tag> & \"quotes\" 'apostrophe'" in lines
    # script/style content must never leak
    assert "color: red" not in text and "not text" not in text
    assert n_links == 2
    # link chars = "About us" + "Contact" = 8 + 7 = 15 of the total
    assert 0.0 < density < 0.5


def test_malformed_tag_soup_is_lenient_not_fatal():
    soup = "<p>open <div>nested <b>bold<p>again</div> tail <notatag"
    rec = extract_html_record(soup)
    assert rec is not None
    _, text, _, _ = rec
    for word in ("open", "nested", "bold", "again", "tail"):
        assert word in text
    assert extract_html_record("") == ("", "", 0, 0.0)
    assert extract_html_record(None) is None


def test_boilerplate_link_density_signal():
    nav = "<div>" + "".join(f'<a href="/{i}">item {i}</a>' for i in range(20)) + "</div>"
    content = "<p>" + "word " * 200 + "</p>"
    _, _, n_nav, d_nav = extract_html_record(nav)
    _, _, n_c, d_c = extract_html_record(content)
    assert n_nav == 20 and d_nav == 1.0
    assert n_c == 0 and d_c == 0.0


def test_spark_kernel_and_null_rows(spark):
    rows = [(0, _DOC), (1, None), (2, "<p>tiny</p>")]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in extract_text(df).collect()}
    assert got[0]["title"] == "The Page & Title"
    assert got[0]["n_links"] == 2
    assert got[1]["text"] is None and got[1]["n_links"] is None
    assert got[2]["text"] == "tiny"
    assert extract_text(df).columns == [
        "doc_id", "title", "text", "n_links", "link_density",
    ]


def test_jvm_tier_agrees_with_kernel_on_tag_simple_docs(spark, sf_dir):
    """Wrap real corpus sentences in paragraph/div/list markup (the
    tag-simple shape the regexp tier is specified for) and require
    byte-identical text from both tiers."""
    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        # strip markup metacharacters so the corpus text is genuinely
        # tag-simple regardless of how the driver regenerates it
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), r"[<>&]", " ").alias("text"),
        )
    )
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>t</title><style>x{}</style></head><body><h1>H</h1><p>"),
            F.col("text"),
            F.lit("</p><div>tail &amp; end</div><!-- note --></body></html>"),
        ).alias("html"),
    )
    sql_side = {
        r["doc_id"]: r["t"]
        for r in html.select(
            "doc_id", strip_tags_expr(F.col("html")).alias("t")
        ).collect()
    }
    kernel_side = {
        r["doc_id"]: r["text"] for r in extract_text(html).collect()
    }
    assert set(sql_side) == set(kernel_side)
    for k in sql_side:
        assert sql_side[k] == kernel_side[k], k


def test_jvm_tier_property_plaintext_roundtrip(spark):
    """Hypothesis: plain text (no markup metacharacters) wrapped in
    nested block tags extracts back to its whitespace-normalized self
    on BOTH tiers — the JVM expression is evaluated per example
    (self-review r5: the first version never actually called it)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=["L", "N"], max_codepoint=0x2FF
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=10, deadline=None)
    @given(ws=words)
    def check(ws):
        body = " ".join(ws)
        html = f"<div><p> {body} </p></div>"
        want = " ".join(body.split())
        rec = extract_html_record(html)
        assert rec is not None and rec[1] == want
        jvm = spark.range(1).select(
            strip_tags_expr(F.lit(html)).alias("t")
        ).collect()[0]["t"]
        assert jvm == want

    check()


def test_tiers_agree_on_edge_text_and_odd_whitespace(spark):
    """Self-review r5 regression pins: (a) a text node BEFORE the
    first block tag must not leave a leading space on the JVM tier;
    (b) literal non-ASCII whitespace (NBSP, \\x0b, \\u2028 — Java's
    \\s misses all of them) must collapse identically on both
    tiers."""
    cases = [
        "<html><body>hello<p>x</p></body></html>",
        "<p>tail</p>trailer  ",
        "<p>a\xa0b</p>",
        "<p>v\x0bw</p>",
        "<p>l m n</p>",
        "<p>wide　gap</p>",
    ]
    df = spark.createDataFrame(
        list(enumerate(cases)), "doc_id long, html string"
    )
    jvm = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", strip_tags_expr(F.col("html")).alias("t")
        ).collect()
    }
    for i, html in enumerate(cases):
        kernel_text = extract_html_record(html)[1]
        assert jvm[i] == kernel_text, (html, jvm[i], kernel_text)
    assert extract_html_record(cases[2])[1] == "a b"


def test_links_inside_skipped_subtrees_are_not_counted():
    """Self-review r5: anchors inside template/svg/noscript chrome
    are not rendered — counting them while excluding their characters
    made n_links contradict link_density."""
    html = (
        "<template>"
        + "".join(f'<a href="/{i}">x</a>' for i in range(20))
        + "</template><p>real text only</p>"
    )
    _, text, n_links, density = extract_html_record(html)
    assert text == "real text only"
    assert n_links == 0 and density == 0.0


def test_extraction_arbitrary_tag_soup_never_raises():
    """Hypothesis: any text — including unbalanced tags, stray
    metacharacters, control bytes — extracts to a record or a clean
    None; the kernel contract is that NOTHING escapes to the task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(soup=st.text(max_size=300))
    def check(soup):
        rec = extract_html_record(soup)
        if rec is not None:
            title, text, n_links, density = rec
            assert isinstance(text, str)
            assert n_links >= 0 and 0.0 <= density <= 1.0
            # normalized text never carries blank lines or edge space
            assert text == "\n".join(
                ln for ln in (" ".join(l.split()) for l in text.split("\n")) if ln
            )

    check()


def test_extract_text_passthrough(spark):
    """Passthrough columns echo row-aligned through the kernel (no
    re-join needed); clashes with output names are refused."""
    import pytest

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
        extract_text,
    )

    df = spark.createDataFrame(
        [
            (1, "<html><head><title>A</title></head><body>aa</body></html>",
             "http://x/1", 10.5),
            (2, "<html><head><title>B</title></head><body>bb</body></html>",
             "http://x/2", 20.5),
        ],
        "doc_id long, html string, curl string, score double",
    ).repartition(2)
    out = extract_text(df, passthrough=("curl", "score")).orderBy("doc_id")
    rows = out.collect()
    assert [(r["doc_id"], r["title"], r["curl"], r["score"]) for r in rows] == [
        (1, "A", "http://x/1", 10.5),
        (2, "B", "http://x/2", 20.5),
    ]
    # identical extraction values as the join-free baseline
    base = {r["doc_id"]: r["text"] for r in extract_text(df).collect()}
    assert {r["doc_id"]: r["text"] for r in rows} == base
    with pytest.raises(ValueError, match="clash"):
        extract_text(df, passthrough=("title",))


def test_extract_text_passthrough_case_mismatch(spark):
    """Spark resolves F.col case-insensitively but names the select
    output with the caller's spelling — the passthrough schema/kernel
    lookups must use those RESOLVED field names (review r8), so a
    case-variant spelling works end-to-end and echoes under it."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
        extract_text,
    )

    df = spark.createDataFrame(
        [(1, "<html><head><title>A</title></head><body>a</body></html>",
          "http://x/1")],
        "doc_id long, html string, curl string",
    )
    out = extract_text(df, passthrough=("Curl",))
    assert out.columns[-1] == "Curl"  # caller's spelling, resolved ok
    row = out.collect()[0]
    assert row["Curl"] == "http://x/1" and row["title"] == "A"
