"""robots.txt compliance filtering — crawl governance for the
curation pipeline. Fetch-side crawlers enforce robots at request
time; PROCESSING pipelines re-check it because corpora outlive
fetches (a page crawled in January may be disallowed by March's
robots.txt — takedown and licensing reviews ask exactly this
question of stored corpora).

Charter extension (SURVEY.md §2.10). Two rule-evaluation modes, both
public specs, selected per call via ``rep=``:

- ``"stdlib"`` (default): the ORIGINAL first-match-in-rule-order REP
  via ``urllib.robotparser`` — the semantics every Python crawler
  already has. An ``Allow`` wins only when it precedes the
  ``Disallow`` it carves out of; ``*``/``$`` are literal characters.
- ``"rfc9309"``: RFC 9309 longest-match — what Googlebot and modern
  crawlers implement. The rule whose pattern matches with the most
  octets decides; ``Allow`` wins exact ties; ``*`` is a wildcard and
  a trailing ``$`` anchors the pattern at the end of the path
  (RFC 9309 §2.2.2-§2.2.3). ``Allow: /a/b`` therefore overrides a
  broader ``Disallow: /a/`` regardless of order. Rule patterns and
  URL paths are percent-normalized before matching (§2.2.2 via RFC
  3986: unreserved escapes decoded, remaining hex uppercased), so
  ``Disallow: /a%2fb`` matches the canonical ``/a%2Fb`` spelling.
  Agent-GROUP selection also differs: rfc9309 merges ALL groups
  whose product token EQUALS the agent's product token
  (case-insensitive whole-token comparison per §2.2.1 — token
  ``bot`` does NOT capture agent ``examplebot``; ``*`` only as
  fallback), while stdlib applies the FIRST applicable entry in
  file order, never merges, and matches by substring. A body with
  several groups naming overlapping agents can therefore diverge
  between the modes on group choice alone.

Scale design — the shape matters more than the parser:
- rules are DATA: a (host, robots_txt) DataFrame, joined to the URL
  set on host. NO driver-side collect of rule bodies (a crawl has
  millions of hosts; broadcasting a dict does not survive 100 TB).
- evaluation is ``applyInPandas`` grouped by (HOST, SALT): each
  group parses its robots.txt once and evaluates its slice of the
  host's URLs against the parsed matcher. The salt is ADAPTIVE —
  ``xxhash64(url) % ceil(host_rows / max_group_rows)`` (capped at
  ``max_salt_buckets``) — so the crawl's long tail (millions of
  hosts under the threshold) keeps ONE group per host and the
  parse-once amortization, while a wikipedia.org-sized host
  carrying 10⁷–10⁸ URLs splits into bounded groups instead of ONE
  straggler pandas frame that must fit in a single task's memory.
  Re-parsing the (tiny, RFC-capped-at-500-KiB) robots body once per
  salt bucket costs microseconds; an unbounded group costs minutes
  and an OOM. The per-host row count comes from a partial-agg
  ``groupBy(host).count()`` — one small extra exchange carrying one
  row per host, reused by the same-key robots join.
- hosts with no robots row (or an unparseable body) default to
  ALLOWED — the REP's own rule for missing robots.txt.
- several fetches of one host collapse to the LATEST before the
  join (``max_by`` over a (fetched, body) struct — the struct is
  never null, so rows with NULL fetch times still participate and
  sort as OLDEST, and exact fetch-time ties break deterministically
  on the lexically-greatest body).
"""

from __future__ import annotations

import re
import urllib.parse
import urllib.robotparser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import url_host

_SCHEMA_SUFFIX = "allowed boolean"

#: RFC 3986 §2.3 unreserved characters — the only octets whose
#: percent escapes may be decoded without changing URI semantics
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

def _pct_normalize_py(s: str) -> str:
    """RFC 3986 §6.2.2 percent normalization — the EXACT Python-side
    twin of ``urls._pct_normalize`` (same split-on-% shape, same
    treatment of malformed escapes): decode escapes of UNRESERVED
    characters (%41 ≡ A), uppercase the first two characters after
    every other ``%`` (%2f ≡ %2F — and "%zz" becomes "%ZZ" exactly
    as the column expression does, so a rule pattern and a
    canonical_url-normalized path with the same malformed spelling
    still match). RFC 9309 §2.2.2 compares rule patterns against the
    percent-encoded path, so BOTH sides must normalize identically
    or ``Disallow: /a%2fb`` never matches the canonical ``/a%2Fb``
    spelling. ``*`` and ``$`` are reserved sub-delims — their
    escapes (%2A, %24) stay ENCODED, so normalization can never
    conjure a wildcard or anchor out of literal data."""
    parts = s.split("%")
    out = [parts[0]]
    for frag in parts[1:]:
        hex2 = frag[:2].upper()
        rest = frag[2:]
        ch = None
        if len(hex2) == 2:
            try:
                ch = chr(int(hex2, 16))
            except ValueError:
                ch = None
        if ch is not None and ch in _UNRESERVED:
            out.append(ch + rest)
        else:
            out.append("%" + hex2 + rest)
    return "".join(out)

#: a host splits into ceil(rows / _MAX_GROUP_ROWS) salt buckets —
#: small hosts keep one group (parse-once), hot hosts stay bounded
_MAX_GROUP_ROWS = 65_536

#: hard cap on buckets per host (bounds the count-join fanout even
#: for a pathological single-host corpus)
_MAX_SALT_BUCKETS = 1024


def _n_salt_buckets(
    n_rows: Column, max_group_rows: int, max_salt_buckets: int
) -> Column:
    """Salt-bucket count for a host with ``n_rows`` URL rows (≥ 1;
    NULL n_rows — unmatched rows — gets 1). Exposed for the scale
    tests, which pin the bucket arithmetic directly."""
    return F.greatest(
        F.least(
            F.ceil(F.coalesce(n_rows, F.lit(1)) / F.lit(max_group_rows)),
            F.lit(max_salt_buckets),
        ),
        F.lit(1),
    )


class _Rfc9309Matcher:
    """RFC 9309 longest-match evaluator for ONE robots.txt body and
    ONE agent: parse once, then ``can_fetch(url)`` per URL.

    Group selection (§2.2.1): groups are headed by consecutive
    ``User-agent`` lines; ALL groups whose product token EQUALS the
    agent's product token (case-insensitive whole-token comparison —
    the part before ``/`` on both sides; token ``bot`` does NOT
    capture agent ``examplebot``) are merged; ``*`` groups only when
    no token matches. Rule matching (§2.2.2-§2.2.3): patterns and the
    URL's path+query are percent-normalized (RFC 3986 §6.2.2 —
    module doc) before comparison; a rule applies when its pattern
    prefix-matches the path+query with ``*`` as any-octets and
    trailing ``$`` as end anchor; the longest pattern wins (length
    measured on the normalized pattern, the octets actually
    compared); ``Allow`` wins length ties; empty patterns are
    ignored (``Disallow:`` = no rule); no applicable rule =
    allowed."""

    def __init__(self, body: str, agent: str) -> None:
        agent_token = agent.split("/")[0].strip().lower()
        groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
        uas: list[str] = []
        rules: list[tuple[str, bool]] = []
        delay: float | None = None
        in_header = False
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, sep, value = line.partition(":")
            if not sep:
                continue
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not in_header:  # a UA line after rules starts a new group
                    if uas:
                        groups.append((uas, rules, delay))
                    uas, rules, delay = [], [], None
                    in_header = True
                token = value.split("/")[0].strip().lower()
                # an EMPTY token ('User-agent:' / 'User-agent: /1.0')
                # is garbage, not a group name — and an agent whose
                # own product token is empty must not "match" it
                if token:
                    uas.append(token)
            elif key in ("allow", "disallow"):
                in_header = False
                if value:
                    rules.append((value, key == "allow"))
            elif key == "crawl-delay":
                # not in RFC 9309, but a de-facto member of the group
                # it appears in (Bing/Yandex semantics); float form
                # accepted, last occurrence in a group wins
                in_header = False
                try:
                    delay = float(value)
                except ValueError:
                    pass
            else:  # sitemap / unknown: not path rules
                in_header = False
        if uas:
            groups.append((uas, rules, delay))

        # §2.2.1 whole-token match: a group applies iff its token
        # EQUALS the agent's product token (case-insensitive); all
        # matching groups merge; '*' only when none matches
        matched = agent_token != "*" and any(
            ua == agent_token for g_uas, _, _ in groups for ua in g_uas
        )
        want = agent_token if matched else "*"
        self._rules: list[tuple[re.Pattern, int, bool]] = []
        #: crawl-delay for the selected group(s); merged groups take
        #: the MAX (the conservative politeness choice); None when no
        #: applicable group declares one
        self.crawl_delay: float | None = None
        for g_uas, g_rules, g_delay in groups:
            if want in g_uas:
                for pattern, allow in g_rules:
                    norm = _pct_normalize_py(pattern)
                    self._rules.append(
                        (self._compile(norm), len(norm), allow)
                    )
                if g_delay is not None and (
                    self.crawl_delay is None or g_delay > self.crawl_delay
                ):
                    self.crawl_delay = g_delay

    @staticmethod
    def _compile(pattern: str) -> re.Pattern:
        anchored = pattern.endswith("$")
        if anchored:
            pattern = pattern[:-1]
        rx = ".*".join(re.escape(p) for p in pattern.split("*"))
        return re.compile(rx + ("$" if anchored else ""))

    def can_fetch(self, url: str) -> bool:
        try:
            parts = urllib.parse.urlsplit(url)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            path = _pct_normalize_py(path)
        except Exception:  # garbage URL: unevaluable = not allowed
            return False
        best_len, best_allow = -1, True
        for rx, plen, allow in self._rules:
            if rx.match(path) and (
                plen > best_len or (plen == best_len and allow)
            ):
                best_len, best_allow = plen, allow
        return best_allow


def _build_matcher(body, agent: str, rep: str):
    """Parsed matcher with a ``can_fetch(url) -> bool`` method, or
    None when the body is null/unparseable (REP default = allow)."""
    if body is None:
        return None
    try:
        if rep == "rfc9309":
            return _Rfc9309Matcher(str(body), agent)
        parser = urllib.robotparser.RobotFileParser()
        parser.parse(str(body).splitlines())

        class _Std:
            def can_fetch(self, url: str) -> bool:
                # robotparser re-parses the URL and raises on garbage
                # ('http://[::1/x' → ValueError) — one malformed crawl
                # URL must not kill the stage; unevaluable = not
                # allowed, matching the null-URL convention
                try:
                    return parser.can_fetch(agent, url)
                except Exception:
                    return False

        return _Std()
    except Exception:
        return None


def _latest_per_host(
    robots: DataFrame,
    host_col: str,
    body_col: str,
    fetched_col: str | None,
) -> DataFrame:
    """``robots`` collapsed to ONE (__host, __robots) row per host —
    the latest fetch when ``fetched_col`` is given. Ordering structs
    are never null, so max_by never discards a row (bare max_by(v,
    ord) ignores NULL ord values — a host whose fetch times are all
    NULL would silently lose its rules); exact ties break on the
    lexically-greatest body, so the collapse is deterministic."""
    per_host = robots.select(
        F.col(host_col).alias("__host"),
        F.col(body_col).alias("__robots"),
        *([F.col(fetched_col).alias("__fetched")] if fetched_col else []),
    ).groupBy("__host")
    return (
        per_host.agg(
            F.max_by(
                "__robots", F.struct("__fetched", "__robots")
            ).alias("__robots")
        )
        if fetched_col
        else per_host.agg(F.max("__robots").alias("__robots"))
    )


def host_crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
    fetched_col: str | None = None,
    rep: str = "stdlib",
) -> DataFrame:
    """(host, crawl_delay double) — each host's declared
    ``Crawl-delay`` for ``agent``, one row per host (latest fetch via
    ``fetched_col``, like :func:`robots_allowed`); null when the host
    declares none (or the body is unparseable). Crawl-delay is not in
    RFC 9309 but is honored by major crawlers (Bing, Yandex); the two
    ``rep`` modes inherit their group-selection semantics:

    - ``"stdlib"``: ``urllib.robotparser.crawl_delay`` — first
      applicable entry, INTEGER seconds only (stdlib ignores float
      values; that is its documented behavior, kept verbatim);
    - ``"rfc9309"``: §2.2.1 whole-token group selection, float
      values accepted, merged groups take the MAX declared delay
      (the conservative politeness choice).

    Map-only: one vectorized evaluation per host row — the frame is
    already one-row-per-host, so no salting is needed (rule bodies
    are RFC-capped at 500 KiB; there is no hot-group hazard)."""
    if rep not in ("stdlib", "rfc9309"):
        raise ValueError(f"rep must be 'stdlib' or 'rfc9309', got {rep!r}")
    one = _latest_per_host(robots, host_col, body_col, fetched_col)

    def delay_of(body) -> float | None:
        if body is None:
            return None
        try:
            if rep == "rfc9309":
                return _Rfc9309Matcher(str(body), agent).crawl_delay
            parser = urllib.robotparser.RobotFileParser()
            parser.parse(str(body).splitlines())
            d = parser.crawl_delay(agent)
            return None if d is None else float(d)
        except Exception:
            return None

    @F.pandas_udf("double")
    def delays(bodies: pd.Series) -> pd.Series:
        return bodies.map(delay_of).astype("float64")

    return one.select(
        F.col("__host").alias("host"),
        delays(F.col("__robots")).alias("crawl_delay"),
    )


def robots_allowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    body_col: str = "robots_txt",
    fetched_col: str | None = None,
    rep: str = "stdlib",
    max_group_rows: int = _MAX_GROUP_ROWS,
    max_salt_buckets: int = _MAX_SALT_BUCKETS,
) -> DataFrame:
    """``urls`` + an ``allowed`` boolean per the REP (``rep=`` picks
    stdlib first-match or RFC 9309 longest-match — see module doc),
    evaluated against ``robots``: a (host, robots_txt) frame. All
    other url columns pass through. Evaluation parses each host's
    rules once per salt bucket; a host under ``max_group_rows`` URL
    rows keeps ONE bucket, a hot host splits into bounded buckets
    (adaptive salting — module doc).

    ``robots`` is collapsed to ONE row per host before the join —
    a corpus re-checked over time legitimately carries several
    fetches of the same host's rules, and joining them raw would
    duplicate every URL row for that host (and score copies against
    arbitrary bodies). Pass ``fetched_col`` (a timestamp/version
    column on ``robots``) to keep the LATEST fetch per host; rows
    with a NULL fetch time sort as oldest (never dropped), and exact
    ties break on the lexically-greatest body, so the collapse is
    deterministic in every case. Without ``fetched_col`` ties break
    on the lexically-greatest body alone — deterministic, but
    time-blind, so prefer ``fetched_col`` whenever fetch times
    exist."""
    if rep not in ("stdlib", "rfc9309"):
        raise ValueError(f"rep must be 'stdlib' or 'rfc9309', got {rep!r}")
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in urls.schema.fields
    ) + ", " + _SCHEMA_SUFFIX
    with_host = urls.withColumn("__host", url_host(F.col(url_col)))
    robots_one = _latest_per_host(robots, host_col, body_col, fetched_col)
    # adaptive salt: one small partial-agg exchange (one row per
    # host) sizes each host's bucket count; the long tail stays at
    # one bucket per host, hot hosts split (module doc)
    host_counts = with_host.groupBy("__host").agg(
        F.count(F.lit(1)).alias("__n_rows")
    )
    joined = (
        with_host.join(robots_one, "__host", "left")
        .join(host_counts, "__host", "left")
        .withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col(url_col)),
                _n_salt_buckets(
                    F.col("__n_rows"), max_group_rows, max_salt_buckets
                ),
            ),
        )
    )
    pass_cols = [f.name for f in urls.schema.fields]

    def evaluate(pdf):
        matcher = _build_matcher(pdf["__robots"].iloc[0], agent, rep)
        if matcher is None:
            allowed = [True] * len(pdf)
        else:
            allowed = [
                matcher.can_fetch(u) if u is not None else False
                for u in pdf[url_col]
            ]
        out = pdf[pass_cols].copy()
        out["allowed"] = allowed
        return out

    return joined.groupBy("__host", "__salt").applyInPandas(evaluate, out_schema)


def drop_disallowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    fetched_col: str | None = None,
    *,
    host_col: str = "host",
    body_col: str = "robots_txt",
    rep: str = "stdlib",
    max_group_rows: int = _MAX_GROUP_ROWS,
    max_salt_buckets: int = _MAX_SALT_BUCKETS,
) -> DataFrame:
    """The filter form: only rows whose URL the host's robots.txt
    allows for ``agent`` (missing/unparseable rules allow, per the
    REP). Accepts every :func:`robots_allowed` parameter, so it works
    with any robots-frame column naming and either evaluator.
    ``fetched_col`` keeps its historical 5th-positional slot; the
    newer parameters are keyword-only so existing positional callers
    cannot silently rebind (a fetch-time column landing in
    ``host_col`` would alias timestamps as hosts, match nothing, and
    default every URL to allowed)."""
    return (
        robots_allowed(
            urls,
            robots,
            agent=agent,
            url_col=url_col,
            host_col=host_col,
            body_col=body_col,
            fetched_col=fetched_col,
            rep=rep,
            max_group_rows=max_group_rows,
            max_salt_buckets=max_salt_buckets,
        )
        .filter(F.col("allowed"))
        .drop("allowed")
    )


def stale_robots(
    robots: DataFrame,
    now,
    max_age_hours: float = 24.0,
    host_col: str = "host",
    fetched_col: str = "fetched_at",
) -> DataFrame:
    """RFC 9309 §2.4 cache freshness — the robots-refetch worklist:
    (host, last_fetched, age_hours) for every host whose LATEST
    stored robots fetch is older than ``max_age_hours`` before
    ``now`` (the spec: cached robots "SHOULD NOT be used for more
    than 24 hours"). A host whose stamps are all NULL (or do not
    parse as timestamps) is stale — an unknowable age can't prove
    freshness, and silently trusting it would let one bad stamp pin
    ancient rules forever. Stamps parse BEFORE the per-host max (a
    raw-string max would let one garbage stamp lexically shadow a
    genuinely fresh fetch) and dispatch on the column type: native
    timestamps pass through, numerics are epoch seconds, strings go
    through ``try_to_timestamp``. ``now`` is passed in, never read
    from the clock (determinism — the repo-wide rule for replayable
    plans) and must be given: a NULL now would silently flag the
    whole fleet stale. One per-host max aggregation; map-only after
    it."""
    from pyspark.sql import types as T

    if now is None:
        raise ValueError("now must be an explicit timestamp, not None")
    dt = robots.schema[fetched_col].dataType
    col = F.col(fetched_col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        ts = col.cast("timestamp")
    elif isinstance(
        dt,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        ts = F.timestamp_seconds(col)
    else:
        ts = F.try_to_timestamp(col.cast("string"))
    latest = robots.groupBy(F.col(host_col).alias("host")).agg(
        F.max(ts).alias("last_fetched")
    )
    now_ts = F.to_timestamp(F.lit(now))
    age_h = (
        now_ts.cast("double") - F.col("last_fetched").cast("double")
    ) / F.lit(3600.0)
    return (
        latest.withColumn("age_hours", age_h)
        .filter(
            F.col("age_hours").isNull()
            | (F.col("age_hours") > F.lit(float(max_age_hours)))
        )
    )
