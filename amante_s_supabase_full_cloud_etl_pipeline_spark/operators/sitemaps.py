"""Sitemap discovery — the crawl-frontier leg between robots
compliance and fetching (sitemaps.org protocol 0.9 + the Sitemap:
robots.txt directive from RFC 9309 §2.3 / the original protocol
note).

Charter extension (SURVEY.md §2.10 crawl-governance family;
reference analog: none). The crawl surface here already answers
may-we (:mod:`.robots`), how-much (:mod:`.crawl_quota`
``per_host_quota``), how-fast (``politeness_budget``) and
seen-before (:mod:`..streaming.crawl_index`); this module answers
WHERE TO LOOK — the site-declared URL inventory:

1. :func:`host_sitemaps` — ``Sitemap:`` lines out of stored
   robots.txt bodies. The directive is GROUP-INDEPENDENT (it applies
   regardless of user-agent sections), so extraction is a pure
   column expression (``regexp_extract_all`` + explode) over the
   one-row-per-host collapse — no Python, no parser state.
2. :func:`parse_sitemaps` — fetched sitemap bodies → one row per
   referenced URL (or per child sitemap for an index file). Formats
   per the protocol: XML urlset / sitemapindex (namespace-tolerant),
   plain-text URL-per-line, and the RSS 2.0 / Atom feed forms; gzip
   (``.xml.gz``) undone by magic, with a decompressed-size cap — the
   spec's own 50 MB limit, enforced so a crafted gzip bomb degrades
   to a ``parse_error`` row (the S4 contract) instead of an executor
   OOM. An Arrow ``mapInPandas`` kernel: XML needs a real parser.
3. :func:`sitemap_frontier` — urlset rows → deduplicated canonical
   URLs tagged with their source host, ready for the governance
   stack (robots filter → quota → budget) and the seen-index probe.

DuckDB cannot parse XML, so this family anchors on pytest
(hand-built fixtures incl. a published-example-shaped urlset,
malformed/truncated/bomb bodies, and a generator round-trip) — the
registry's 50 oracle slots stay untouched.

Scale shape: everything is map-only per sitemap blob (one task per
fetched file; a 50k-URL sitemap explodes worker-side), the robots
extraction is one projection over the per-host collapse, and the
frontier dedup is the same keep-min agg + semi-join the crawl index
uses — no windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: sitemaps.org: a sitemap file may not exceed 50 MB uncompressed —
#: enforced on decompression so a gzip bomb S4-degrades, never OOMs
_MAX_DECOMPRESSED = 50 * 1024 * 1024

SITEMAP_ENTRY_SCHEMA = StructType(
    [
        StructField("sitemap_url", StringType()),
        StructField("kind", StringType()),  # urlset | sitemapindex | feed | text
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
        StructField("position", LongType()),  # 0-based within the file
        StructField("parse_error", StringType()),
    ]
)


def host_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    fetched_col: str | None = None,
) -> DataFrame:
    """(host, sitemap_url) — every ``Sitemap:`` directive in each
    host's LATEST robots.txt (the directive is group-independent, so
    no user-agent selection applies; relative values are resolved
    against the host per the de-facto crawler behavior). Distinct:
    a directive repeated across groups yields one row."""
    from .robots import _latest_per_host

    one = _latest_per_host(robots, host_col, body_col, fetched_col)
    lines = one.select(
        F.col("__host").alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col("__robots"), F.lit("")),
                # case-insensitive, per-line; value = rest of line up
                # to a comment/EOL, trimmed
                F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\r\n]+)"),
                1,
            )
        ).alias("raw"),
    )
    url = F.trim(F.col("raw"))
    # a BARE 'Sitemap:' line (value empty after trim — common in the
    # wild) declares nothing: filter on the CAPTURE, before the
    # relative-resolution concat makes everything non-empty
    return (
        lines.filter(F.length(url) > 0)
        .select(
            "host",
            F.when(
                url.rlike(r"(?i)^https?://"), url
            )
            .when(  # protocol-relative '//cdn.example/map.xml'
                url.startswith("//"), F.concat(F.lit("http:"), url)
            )  # relative form: resolve against the host (http default —
            # the stored fetch layer normalizes scheme upstream)
            .otherwise(
                F.concat(
                    F.lit("http://"),
                    F.col("host"),
                    F.when(url.startswith("/"), url).otherwise(
                        F.concat(F.lit("/"), url)
                    ),
                )
            ).alias("sitemap_url"),
        )
        .distinct()
    )


def _parse_sitemap_blob(url: str, blob) -> list[dict]:
    """One fetched sitemap body → entry dicts (pure Python, called
    from the Arrow kernel). Never raises: malformed input yields one
    parse_error row."""
    import gzip
    import io
    import xml.etree.ElementTree as ET

    def err(msg: str) -> list[dict]:
        return [
            {
                "sitemap_url": url,
                "kind": None,
                "loc": None,
                "lastmod": None,
                "changefreq": None,
                "priority": None,
                "position": None,
                "parse_error": msg,
            }
        ]

    def entry(kind, pos, loc, lastmod=None, changefreq=None, priority=None):
        return {
            "sitemap_url": url,
            "kind": kind,
            "loc": loc,
            "lastmod": lastmod,
            "changefreq": changefreq,
            "priority": priority,
            "position": pos,
            "parse_error": None,
        }

    try:
        b = bytes(blob or b"")
        if b[:2] == b"\x1f\x8b":
            try:
                # bounded streaming decompress: read ONE byte past the
                # cap, not the whole bomb
                with gzip.GzipFile(fileobj=io.BytesIO(b)) as g:
                    b = g.read(_MAX_DECOMPRESSED + 1)
            except OSError as exc:
                return err(f"gzip: {exc}")
        if len(b) > _MAX_DECOMPRESSED:
            return err(
                f"exceeds the protocol's 50MB uncompressed limit"
            )
        text = b.decode("utf-8", "replace")
        stripped = text.lstrip("﻿ \t\r\n")
        if not stripped:
            return err("empty body")

        if "<!DOCTYPE" in text[:4096] or "<!ENTITY" in text:
            # sitemaps never legitimately carry DTDs; an inline
            # entity definition is the billion-laughs vector, whose
            # expansion guard would otherwise depend on the host's
            # expat version — refuse BEFORE parsing (defusedxml's
            # forbid_dtd rule, stdlib-only)
            return err("DTD/ENTITY declarations are not allowed")
        if stripped[0] != "<":
            # plain-text sitemap: one URL per line, nothing else
            out = []
            for line in stripped.splitlines():
                line = line.strip()
                if not line:
                    continue
                if not line.lower().startswith(("http://", "https://")):
                    return err(f"text sitemap: non-URL line {line[:40]!r}")
                out.append(entry("text", len(out), line))
            return out if out else err("empty body")

        try:
            root = ET.fromstring(b)
        except ET.ParseError as exc:
            return err(f"xml: {exc}")

        def local(tag: str) -> str:  # strip any namespace
            return tag.rsplit("}", 1)[-1].lower()

        def child_text(el, name):
            for c in el:
                if local(c.tag) == name:
                    return (c.text or "").strip() or None
            return None

        rname = local(root.tag)
        out = []
        if rname in ("urlset", "sitemapindex"):
            kind = rname
            member = "url" if rname == "urlset" else "sitemap"
            for el in root:
                if local(el.tag) != member:
                    continue
                loc = child_text(el, "loc")
                if not loc:
                    continue
                pr = child_text(el, "priority")
                try:
                    pr = float(pr) if pr is not None else None
                except ValueError:
                    pr = None
                out.append(
                    entry(
                        kind,
                        len(out),
                        loc,
                        lastmod=child_text(el, "lastmod"),
                        changefreq=child_text(el, "changefreq"),
                        priority=pr,
                    )
                )
            return out if out else err(f"{rname} with no entries")
        if rname == "rss":  # RSS 2.0: channel/item/link
            for ch in root:
                if local(ch.tag) != "channel":
                    continue
                for it in ch:
                    if local(it.tag) != "item":
                        continue
                    loc = child_text(it, "link")
                    if loc:
                        out.append(
                            entry(
                                "feed", len(out), loc,
                                lastmod=child_text(it, "pubdate"),
                            )
                        )
            return out if out else err("rss with no item links")
        if rname == "feed":  # Atom: entry/link[@href]
            for en in root:
                if local(en.tag) != "entry":
                    continue
                loc = None
                for c in en:
                    if local(c.tag) == "link" and c.get("href"):
                        # prefer rel=alternate (the page itself)
                        if c.get("rel") in (None, "alternate"):
                            loc = c.get("href")
                            break
                        loc = loc or c.get("href")
                if loc:
                    out.append(
                        entry(
                            "feed", len(out), loc,
                            lastmod=child_text(en, "updated"),
                        )
                    )
            return out if out else err("atom feed with no entry links")
        return err(f"unknown root element <{rname}>")
    except Exception as exc:  # never let a row kill the task (S4)
        return err(f"{type(exc).__name__}: {exc}")


def parse_sitemaps(
    fetched: DataFrame,
    url_col: str = "sitemap_url",
    blob_col: str = "content",
) -> DataFrame:
    """Fetched sitemap bodies → :data:`SITEMAP_ENTRY_SCHEMA` rows:
    one per referenced URL (``kind`` = urlset/text/feed) or per child
    sitemap (``kind`` = sitemapindex — fetch those and feed them back
    through; index expansion is a FETCH decision, not a parse one,
    so it stays with the caller). Malformed/oversized bodies yield
    one ``parse_error`` row each (S4)."""

    def kernel(batches):
        import pandas as pd

        for batch in batches:
            rows: list[dict] = []
            for url, blob in zip(batch[url_col], batch[blob_col]):
                rows.extend(
                    _parse_sitemap_blob(
                        str(url) if url is not None else None, blob
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SITEMAP_ENTRY_SCHEMA.fields]
            )

    return fetched.select(url_col, blob_col).mapInPandas(
        kernel, SITEMAP_ENTRY_SCHEMA
    )


def sitemap_frontier(
    entries: DataFrame, enforce_scope: bool = True
) -> DataFrame:
    """Page-URL entries (urlset/text/feed rows — NOT sitemapindex
    children) → the deduplicated fetch frontier: (url, curl, host,
    lastmod) with one row per canonical URL, keeping the
    lexically-greatest lastmod among duplicates (the freshest claim
    wins; W3C datetime strings order lexically within one format).
    Feed straight into ``drop_disallowed`` → ``per_host_quota`` →
    ``politeness_budget`` and the crawl seen-index probe.

    ``enforce_scope`` (default) DROPS locs whose host differs from
    the declaring sitemap's host — the protocol's location-scope rule
    at its security boundary: without it, one hostile sitemap injects
    arbitrary third-party URLs into the frontier tagged as the
    victim's. Cross-host sitemaps are only legitimate when the
    TARGET host's robots.txt declares them (sitemaps.org
    cross-submits); verify that through :func:`host_sitemaps` and
    pass ``enforce_scope=False`` for those files alone."""
    from .urls import canonical_url, url_host

    pages = entries.filter(
        F.col("parse_error").isNull()
        & F.col("kind").isin("urlset", "text", "feed")
    )
    if enforce_scope:
        pages = pages.filter(
            url_host(F.col("loc")) == url_host(F.col("sitemap_url"))
        )
    pages = pages.select(
        F.col("loc").alias("url"),
        canonical_url(F.col("loc")).alias("curl"),
        F.col("lastmod"),
        F.col("changefreq"),
        F.col("priority"),
    )
    # freshest lastmod claim wins the row; priority is the MAX claim
    # across duplicates (a scheduler should honor the strongest ask)
    won = pages.groupBy("curl").agg(
        F.max(F.struct("lastmod", "url", "changefreq")).alias("__w"),
        F.max("priority").alias("priority"),
    )
    return won.select(
        F.col("__w.url").alias("url"),
        "curl",
        url_host(F.col("curl")).alias("host"),
        F.col("__w.lastmod").alias("lastmod"),
        F.col("__w.changefreq").alias("changefreq"),
        "priority",
    )


def refresh_candidates(
    frontier: DataFrame,
    seen: DataFrame,
    fetched_col: str = "fetched_at",
) -> DataFrame:
    """Which frontier URLs deserve a (re)fetch — the join between
    discovery and the incremental crawl: ``frontier`` rows
    (:func:`sitemap_frontier` shape, keyed ``curl`` with ``lastmod``)
    against ``seen`` — the canonical-URL seen-index contents
    (``streaming/crawl_index.py`` ``index.read()``, keyed ``curl``
    with ``fetched_col``). Emits frontier columns + ``reason``:

    - ``never_fetched`` — no seen row for the canonical URL (a
      non-null join marker, so a seen row whose stored stamp is NULL
      still counts as seen);
    - ``modified`` — the sitemap claims ``lastmod`` strictly newer
      than the stored fetch stamp: compared as TIMESTAMPS when both
      sides parse (``try_to_timestamp`` — W3C datetimes with
      differing UTC offsets order correctly); when exactly ONE side
      parses the row counts as modified (a lexical compare across
      formats is an arbitrary verdict, and unknowable freshness
      cannot prove the fetch is current); lexical string order is
      the fallback only when BOTH sides fail to parse (then both
      must share one format; a crawl storing epoch ints should
      format them before calling). A seen row with a NULL stamp and
      a lastmod claim likewise counts as modified (the stamp's
      absence cannot prove freshness).

    URLs seen and unmodified (or whose sitemap makes no lastmod
    claim) drop — politely skipping the refetch is the point. Note
    the seen-index's ``fetched_at`` is a MAX fold across refetches
    (``streaming/crawl_index.py``), so acting on ``modified`` and
    folding the refetch CLEARS the flag for the next cycle. One left
    join on curl, same key the seen-index is compacted by, so the
    probe prunes; no windows."""
    stored = seen.select(
        F.col("curl"),
        F.col(fetched_col).alias("__fetched"),
        F.lit(True).alias("__seen"),
    )
    joined = frontier.join(stored, "curl", "left")
    lm_ts = F.try_to_timestamp(F.col("lastmod"))
    st_ts = F.try_to_timestamp(F.col("__fetched"))
    newer = (
        F.when(F.col("__fetched").isNull(), F.lit(True))
        .when(lm_ts.isNotNull() & st_ts.isNotNull(), lm_ts > st_ts)
        # exactly ONE side parses (the both-parse branch already
        # fired): a lexical compare across formats (W3C string vs
        # e.g. an epoch int formatted as string) is an arbitrary
        # verdict — treat as modified, since unknowable freshness
        # cannot prove the stored fetch is current
        .when(lm_ts.isNotNull() | st_ts.isNotNull(), F.lit(True))
        # both unparseable: the sides share one (non-timestamp)
        # format by contract, so lexical order is meaningful
        .otherwise(F.col("lastmod") > F.col("__fetched"))
    )
    reason = F.when(F.col("__seen").isNull(), F.lit("never_fetched")).when(
        F.col("lastmod").isNotNull() & newer, F.lit("modified")
    )
    return (
        joined.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .drop("__fetched", "__seen")
    )
