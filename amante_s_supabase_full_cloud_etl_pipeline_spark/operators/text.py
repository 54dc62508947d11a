"""Text-analysis operators for LLM training-data pipelines
(charter extension, SURVEY.md §2.10): token counting, quality
scoring, language ID, fingerprinting, shingling.

All pure Catalyst expressions (split/filter/transform/aggregate on
arrays) — JVM-side, whole-stage-codegen, no Python in the hot path.
At 100 TB these run as map-only stages over the documents table;
nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the heuristic language ID.
# Real deployments would swap in proper profiles (or a model via
# mapInPandas); the operator shape — per-language token-hit scoring +
# deterministic argmax — is what matters at scale.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "a", "in", "is", "it")),
    ("es", ("el", "la", "de", "que", "y", "en", "un", "es")),
    ("de", ("der", "die", "und", "das", "ist", "ein", "zu", "mit")),
    ("fr", ("le", "la", "et", "les", "des", "un", "une", "est")),
)

PUNCT_CLASS = r"[.,!?;:'\"()\-]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


BPE_ISH_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy: count alnum runs + individual symbol chars
    (a regex segmentation, not a learned vocab, but scales
    identically — pure map). Match-counting instead of lookaround
    splitting keeps the pattern RE2-compatible (DuckDB oracle)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(text)
    punct = total - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given word set."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def stopword_ratio(text: Column, words: tuple[str, ...] = LANG_MARKERS[0][1]) -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, words).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic ∈ [0,1]: length band + low
    punctuation + English-stopword presence. Deterministic double
    arithmetic (identical per-row in any engine)."""
    n_tok = token_count(text).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return (length_term + punct_term + stop_term) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, words) for lang, words in LANG_MARKERS}


def lang_id(text: Column) -> Column:
    """Deterministic argmax over per-language marker hits; ties and
    zero-hit texts → 'und' (undetermined). First-listed language wins
    ties after 'und' check for determinism."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # Build reversed so earlier languages take precedence on ties.
    for lang, _ in reversed(LANG_MARKERS):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def dup_token_count(toks: Column) -> Column:
    """Tokens beyond their first occurrence — the exact integer
    numerator of the Gopher-style word-repetition ratio. Summing the
    integer numerator/denominator separately keeps corpus-level
    ratios aggregation-order-independent (never sum per-doc double
    ratios)."""
    return F.size(toks) - F.size(F.array_distinct(toks))


def dup_bigram_count(toks: Column) -> Column:
    """Bigrams beyond their first occurrence (repetition signal one
    order up: catches looping phrases that word-level misses)."""
    grams = shingles_from_tokens(toks, 2)
    return F.size(grams) - F.size(F.array_distinct(grams))


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase + collapsed
    whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text. Stable
    across engines/runs — usable as an exact-dedup key at any scale."""
    return F.md5(normalize(text).cast("binary"))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a *materialized* token-array column.

    Callers must project the token array as a real column first
    (``withColumn``) — passing ``tokens(text)`` inline here would
    re-evaluate the split for every ``element_at`` reference (~3k
    string-splits per row at k=3), which Catalyst does not CSE inside
    lambda bodies. Measured 2× on the Jaccard near-dup query."""
    n = F.size(toks)
    # Guard the sequence bounds: sequence(0, -1) would count *down*.
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles straight from text — convenience for single
    use; hot paths should project tokens first (see
    :func:`shingles_from_tokens`)."""
    return shingles_from_tokens(tokens(text), k)


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, table A1) — the standard
# pretraining document filter family, as pure column expressions.
# ---------------------------------------------------------------------------

GOPHER_BULLETS = ("-", "*", "•")


def gopher_signals(text: Column) -> Column:
    """Struct of the Gopher rule inputs for one document:

    ``n_tok`` word count, ``mean_word_len``, ``symbol_word_ratio``
    (# and ellipsis per word), ``frac_bullet_lines``,
    ``frac_ellipsis_lines``, ``frac_alpha_words`` (words containing
    at least one letter), ``n_stop_hits`` (distinct-agnostic English
    stopword hits). Map-only; each signal is exact arithmetic, so
    corpus-level aggregation/thresholding is engine-portable."""
    toks = tokens(text)
    n_tok = F.size(toks)
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    char_sum = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    symbols = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.trim(ln), 1, 1).isin(*GOPHER_BULLETS),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
        )
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    return F.struct(
        n_tok.alias("n_tok"),
        safe(char_sum, n_tok).alias("mean_word_len"),
        safe(symbols, n_tok).alias("symbol_word_ratio"),
        safe(bullet, n_lines).alias("frac_bullet_lines"),
        safe(ellipsis, n_lines).alias("frac_ellipsis_lines"),
        safe(alpha, n_tok).alias("frac_alpha_words"),
        stopword_hits(text, LANG_MARKERS[0][1]).alias("n_stop_hits"),
    )


def gopher_filter(
    text: Column,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Boolean keep-predicate with the published Gopher thresholds as
    defaults (each overridable). Composes with any scan as a pushed
    map-side filter — the 100 TB shape is filter-at-source, never a
    separate pass."""
    s = gopher_signals(text)
    return (
        s["n_tok"].between(min_tokens, max_tokens)
        & s["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (s["symbol_word_ratio"] <= max_symbol_ratio)
        & (s["frac_bullet_lines"] <= max_bullet_frac)
        & (s["frac_ellipsis_lines"] <= max_ellipsis_frac)
        & (s["frac_alpha_words"] >= min_alpha_frac)
        & (s["n_stop_hits"] >= min_stop_hits)
    )
