"""HTML → text extraction — the step a crawl-curation pipeline runs
BEFORE every text operator in this package (quality signals, dedup,
lang-ID, tokenization all assume plain text; a web crawl delivers
markup).

Charter extension (SURVEY.md §2.10 text-analysis family). Reference
analog: none — the reference ingests spreadsheets; the algorithmic
ground is public (the C4/CCNet pipelines' extract-then-filter shape;
link-density boilerplate signals per Kohlschütter et al.'s
boilerplate features).

Two tiers, cross-checked against each other:

- :func:`extract_text` — the precise tier: an Arrow-batched
  ``mapInPandas`` kernel around stdlib ``html.parser`` (event-based,
  lenient on real-world tag soup — never raises on bad nesting).
  Emits the document text with block-element line structure
  preserved, the <title>, and structural boilerplate signals
  (link count, link-character density) downstream filters consume.
  Python-per-row is justified exactly as for the media codecs: the
  work is inherently per-document string parsing, embarrassingly
  parallel, with no cross-row state.
- :func:`strip_tags_expr` — the JVM tier: a pure
  ``regexp_replace`` chain (zero UDF, whole-stage codegen) that
  drops script/style/comment spans, converts block tags to
  newlines, strips remaining tags, and unescapes the common
  entities. It does NOT understand nesting — it is the bulk fast
  path for tag-simple corpora, and the differential tests pin that
  on such documents it agrees with the kernel after whitespace
  normalization.

Scale design: both tiers are map-only (no shuffle, no driver state);
the kernel streams Arrow batches, so executor memory is bounded by
the batch, and a corrupt document degrades to a null row (S4
semantics), never a task failure.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: content of these elements is never document text
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}

#: elements that imply a line break around their content
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "td", "th",
    "tr", "ul",
}

EXTRACT_SCHEMA = (
    "doc_id long, title string, text string, n_links long, "
    "link_density double"
)


class _Extractor(HTMLParser):
    """Event visitor: text accumulation with block-boundary newlines,
    skip-element suppression, title capture, link-character
    accounting. convert_charrefs=True (the default) resolves
    entities/charrefs before handle_data, so &amp; arrives as '&'."""

    def __init__(self, collect_hrefs: bool = False) -> None:
        super().__init__()
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.skip_depth = 0
        self.in_title = False
        self.anchor_depth = 0
        self.n_links = 0
        self.link_chars = 0
        self.total_chars = 0
        #: raw href values of counted anchors (same skip-subtree rule
        #: as n_links), collected only when asked — the text path pays
        #: nothing for the link-graph feature
        self.collect_hrefs = collect_hrefs
        self.hrefs: list[str] = []

    def _note_href(self, attrs) -> None:
        if not self.collect_hrefs:
            return
        for k, v in attrs:
            if k == "href" and v:
                self.hrefs.append(v)
                return

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            # anchors/blocks inside skipped subtrees (template/svg/
            # noscript chrome) are not rendered content: counting
            # them would make n_links inconsistent with link_density,
            # whose character accounting already excludes these spans
            return
        if tag == "title":
            self.in_title = True
        elif tag == "a":
            self.anchor_depth += 1
            self.n_links += 1
            self._note_href(attrs)
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self.skip_depth:
                self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag == "title":
            self.in_title = False
        elif tag == "a" and self.anchor_depth:
            self.anchor_depth -= 1
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if self.skip_depth:
            return
        # void/self-closing elements (<br/>, <hr/>): block break only
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")
        elif tag == "a":
            self.n_links += 1
            self._note_href(attrs)

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        self.parts.append(data)
        stripped = len(data.strip())
        self.total_chars += stripped
        if self.anchor_depth:
            self.link_chars += stripped


def _normalize(raw: str) -> str:
    """Whitespace canonicalization shared by both tiers: collapse
    intra-line whitespace, drop blank lines, strip edges — the form
    line-level dedup/boilerplate ops expect."""
    lines = []
    for line in raw.split("\n"):
        line = " ".join(line.split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_html_record(html: str | None):
    """(title, text, n_links, link_density) for one document, or None
    when the input is null/unparseable (S4 per-row skip). Lenient on
    tag soup by construction — html.parser is event-based and
    recovers from bad nesting; only a pathological input that breaks
    the parser itself degrades to None."""
    if html is None:
        return None
    try:
        p = _Extractor()
        p.feed(html)
        p.close()
    except Exception:
        return None
    title = " ".join("".join(p.title_parts).split())
    text = _normalize("".join(p.parts))
    density = (
        float(p.link_chars) / float(p.total_chars) if p.total_chars else 0.0
    )
    return title, text, p.n_links, round(density, 6)


def extract_text_kernel(
    batches: "Iterator",
) -> "Iterator":
    """mapInPandas kernel: (doc_id, html) batches → EXTRACT_SCHEMA
    rows. A failed document yields null title/text (and null signals),
    never a task failure."""
    import pandas as pd

    for batch in batches:
        titles, texts, links, dens = [], [], [], []
        for html in batch["html"]:
            rec = extract_html_record(html)
            if rec is None:
                titles.append(None)
                texts.append(None)
                links.append(None)
                dens.append(None)
            else:
                t, x, n, d = rec
                titles.append(t)
                texts.append(x)
                links.append(n)
                dens.append(d)
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "title": titles,
                "text": texts,
                "n_links": pd.array(links, dtype="Int64"),
                "link_density": pd.array(dens, dtype="Float64"),
            }
        )


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, title, text, n_links, link_density) per document —
    the precise stdlib-parser tier. Map-only; schema is
    :data:`EXTRACT_SCHEMA` plus any ``passthrough`` columns, echoed
    row-aligned through the kernel. Passthrough exists for exactly
    one reason: without it a caller needing one upstream column next
    to the extraction (the crawl path's canonical URL) must re-JOIN
    the kernel output back to its own input on doc_id — a whole
    shuffle join to recover a column the kernel had in hand."""
    if isinstance(passthrough, str):  # a bare name iterates to chars
        passthrough = (passthrough,)
    base = [F.col(id_col).alias("doc_id"), F.col(html_col).alias("html")]
    extra = list(passthrough)
    # casefolded: Spark resolves names case-insensitively by default,
    # so a 'Title' passthrough would collide with 'title' downstream
    folded = [c.lower() for c in extra]
    clash = set(folded) & {
        "doc_id", "title", "text", "n_links", "link_density", "html",
    }
    if clash or len(set(folded)) != len(folded):
        raise ValueError(
            "passthrough clashes with output columns or repeats a "
            f"name: {sorted(clash) or sorted(extra)}"
        )
    src = df.select(*base, *[F.col(c) for c in extra])
    if not extra:
        return src.mapInPandas(extract_text_kernel, EXTRACT_SCHEMA)
    # use the RESOLVED field names (Spark resolves F.col case-
    # insensitively, so the caller's spelling may differ from the
    # schema's — a case-mismatched passthrough would KeyError in the
    # schema lookup and in the kernel's pandas access otherwise)
    resolved = [f.name for f in src.schema.fields[len(base):]]
    schema = EXTRACT_SCHEMA + ", " + ", ".join(
        f"`{c}` {src.schema[c].dataType.simpleString()}" for c in resolved
    )

    def kernel(batches):
        for batch in batches:
            out = next(extract_text_kernel(iter([batch])))
            # the echo relies on the inner kernel's one-aligned-frame-
            # per-batch contract — loud if that ever changes
            if len(out) != len(batch):
                raise AssertionError(
                    "extract_text_kernel no longer yields one row per "
                    "input row; passthrough alignment would corrupt"
                )
            for c in resolved:
                out[c] = batch[c].reset_index(drop=True)
            yield out

    return src.mapInPandas(kernel, schema)


#: entity unescapes the JVM tier performs (the named set regexps can
#: reach without a lookup table; numeric charrefs stay literal there)
_SQL_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST, so &amp;lt; becomes &lt; not <
]


def strip_tags_expr(col: Column) -> Column:
    """JVM-side tag stripping: drop script/style/comment spans,
    break on block tags, strip the rest, unescape the common named
    entities, canonicalize whitespace — one codegen'd expression
    chain, zero Python. Nesting-blind by design (see module doc);
    the differential tests pin agreement with the kernel on
    tag-simple documents."""
    c = F.regexp_replace(
        col, r"(?is)<(script|style|noscript|template|svg|iframe)\b.*?</\1\s*>", " "
    )
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<title\b.*?</title\s*>", " ")
    block = "|".join(sorted(_BLOCK_TAGS))
    c = F.regexp_replace(c, rf"(?i)</?({block})\b[^>]*>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _SQL_ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    # collapse horizontal whitespace, then blank lines, then edges.
    # The class mirrors what the kernel's str.split() treats as
    # whitespace: Java's \s is ASCII-only and excludes NBSP & friends,
    # so literal \xa0 /   etc. in real HTML would otherwise
    # diverge the tiers (self-review r5)
    hws = (
        "[ \t\r\f\x0b\u0085\u00a0\u1680\u2000-\u200a"
        "\u2028\u2029\u202f\u205f\u3000]"
    )
    c = F.regexp_replace(c, hws + "+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    # trim BOTH residual spaces and newlines at the edges (a text
    # node before the first block tag leaves a leading space, not a
    # newline — self-review r5)
    return F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")




def extract_links_record(html: str | None, base_url: str | None):
    """Absolute out-link URLs of one document, or None when the input
    is null/unparseable (S4). Relative hrefs resolve against
    ``base_url`` (RFC 3986 §5 via urljoin); fragment-only,
    ``javascript:``/``mailto:``/``tel:``/``data:`` and other
    non-http(s) links drop — they are not fetchable pages. The same
    skip-subtree rule as ``n_links`` applies (chrome inside
    script/template/svg is not a rendered link)."""
    import urllib.parse

    if html is None:
        return None
    try:
        p = _Extractor(collect_hrefs=True)
        p.feed(html)
        p.close()
    except Exception:
        return None
    out = []
    for href in p.hrefs:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        try:
            absolute = (
                urllib.parse.urljoin(base_url, href) if base_url else href
            )
            absolute = urllib.parse.urldefrag(absolute)[0]
            scheme = urllib.parse.urlsplit(absolute).scheme.lower()
        except ValueError:
            continue  # malformed href: not a link, not a row failure
        if scheme in ("http", "https"):
            out.append(absolute)
    return out


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """The crawl LINK GRAPH edge list: one (doc_id, src, dst) row per
    fetchable out-link of each page — the input shape for
    :mod:`.pagerank` and for frontier expansion. Both endpoints are
    CANONICALIZED (``urls.canonical_url``, a post-kernel column
    expression): without it, rank votes split across trivially
    different spellings of one page (tracking params, case, default
    ports) — each becoming a phantom dangling node. Rows with a null
    id/url drop BEFORE the kernel (S4; a null in the batch would also
    coerce the Arrow long column to float64, corrupting hash-range
    ids). Map-only; parallel duplicate links within one page are KEPT
    (PageRank dedups, frontier expansion dedups by canonical URL).

    ONE kernel serves both edge shapes: this is
    ``explode(extract_link_lists(...).dsts)`` — a null/unparseable
    html emits an empty list there and therefore no edge rows here,
    and both endpoints arrive canonicalized. Deriving the exploded
    form from the per-page form (instead of keeping two kernels)
    means a future link-semantics change cannot diverge the batch
    and streaming edge sets."""
    lists = extract_link_lists(df, html_col, url_col, id_col)
    return lists.select("doc_id", "src", F.explode("dsts").alias("dst"))


LINK_LISTS_SCHEMA = "doc_id long, url string, dsts array<string>"


def extract_link_lists(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row PER PAGE: (doc_id, src, dsts) where ``dsts`` is the
    page's fetchable out-links in DOCUMENT order — the per-page shape
    the streaming edge index stores (one keyed-MERGE row per page;
    :mod:`..streaming.edge_index`). Exactly :func:`extract_links`
    reshaped: ``explode(dsts)`` reproduces its (src, dst) multiset
    row-for-row (intra-page duplicate links kept, both endpoints
    canonicalized — pinned differentially in tests). The array order
    is deterministic at any partitioning because it is produced
    INSIDE the kernel from one html string — a ``collect_list`` over
    the exploded shape would depend on shuffle arrival order.

    A page whose html is null/unparseable emits an EMPTY list, not a
    dropped row: the edge index REPLACES a page's stored list with
    the new winner's row, and a dropped row would leave the loser
    fetch's edges behind forever."""
    from .urls import canonical_url

    def kernel(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for doc_id, src, html in zip(
                batch["doc_id"], batch["url"], batch["html"]
            ):
                links = extract_links_record(html, src)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "url": src,
                        "dsts": links if links is not None else [],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "url", "dsts"])

    lists = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        F.col(html_col).alias("html"),
    ).filter(
        F.col("doc_id").isNotNull() & F.col("url").isNotNull()
    ).mapInPandas(kernel, LINK_LISTS_SCHEMA)
    return lists.select(
        "doc_id",
        canonical_url(F.col("url")).alias("src"),
        F.transform(F.col("dsts"), lambda d: canonical_url(d)).alias(
            "dsts"
        ),
    )
