"""Text-analysis expressions (SURVEY §2.10 E4) — JVM-side column
compositions over a string column. No Python UDFs: at 100 TB the text
path must stay inside whole-stage codegen.

All helpers return Columns so operators/queries can compose them freely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the n-gram/stopword language
# heuristic. Deliberately deterministic and dependency-free (real
# deployments would swap in fastText/CLD3 behind the same signature).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "las", "es", "y", "que"),
    "fr": ("le", "la", "les", "et", "est", "que", "un"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}

_WORD_SPLIT = r"\s+"
# BPE-ish tokenizer: words, numbers, or single non-space symbols —
# approximates subword pre-tokenization without an external vocab.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (empty strings filtered)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), _WORD_SPLIT), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column | str) -> Column:
    """Regex sub-word-ish tokens (letters / digit runs / symbols)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a materialized token array.

    IMPORTANT (perf): pass a *column reference* to an already-projected
    token array, not the tokens() expression itself — subexpressions
    inside lambda HOFs are re-evaluated per element, so an inlined
    split would tokenize the text once per shingle (measured 6×
    slowdown). Project tokens in a separate select first.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingled = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(shingled)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from text — convenience
    form for one-shot expressions; hot paths should project tokens()
    first and use word_shingles_from_tokens (see perf note there)."""
    return word_shingles_from_tokens(tokens(text), n)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(0.0)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(0.0)


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality ∈ [0,1]: long enough, word-like,
    not punctuation soup. Deterministic composition of the parts."""
    col = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(col) / F.lit(400.0), F.lit(1.0))
    word_score = F.least(token_count(col) / F.lit(60.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    score = (len_score + word_score + punct_penalty) / 3.0
    # portable round: engine ROUND(double) tie modes differ (plans/parity.py)
    return F.floor(score * 1e6 + 0.5) / 1e6


def lang_scores(text: Column | str) -> Column:
    """Map of lang -> marker-hit count (the language-ID evidence)."""
    toks_lower = F.transform(tokens(text), F.lower)
    pairs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        pairs.append(
            F.struct(
                F.lit(lang).alias("lang"),
                F.size(F.filter(toks_lower, lambda t: F.array_contains(arr, t))).alias("hits"),
            )
        )
    return F.array(*pairs)


def lang_guess(text: Column | str) -> Column:
    """argmax-by-hits language guess; ties break alphabetically;
    'und' (undetermined) when no marker hits at all."""
    scored = lang_scores(text)
    best = F.array_max(
        F.transform(
            scored,
            # order by (hits, reverse-alphabetical-lang) so max == ties-to-
            # alphabetical-first. The tiebreak must cover the WHOLE code
            # (ISO 639-1 is 2 chars): first-letter-only would leave 'en'
            # vs 'es' to the struct's next field, flipping the winner to
            # max(lang) = 'es' while argmax-alphabetical wants 'en'.
            lambda s: F.struct(
                s["hits"].alias("hits"),
                (
                    F.lit(-1)
                    * (
                        F.ascii(F.substring(s["lang"], 1, 1)) * F.lit(256)
                        + F.ascii(F.substring(s["lang"], 2, 1))
                    )
                ).alias("tiebreak"),
                s["lang"].alias("lang"),
            ),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """Canonical content fingerprint: lowercase, collapse whitespace,
    md5 — portable across engines (DuckDB md5 matches)."""
    col = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def top_token_fraction(toks: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token — the
    Gopher-style repetition signal. Pure per-row HOFs over an already-
    projected token array (see word_shingles_from_tokens perf note):
    O(distinct·n) per row, embarrassingly parallel, ZERO shuffles —
    at 100 TB this beats the explode + double-groupBy relational form,
    which shuffles every token twice."""
    counts = F.transform(
        F.array_distinct(toks), lambda d: F.size(F.filter(toks, lambda x: x == d))
    )
    return F.when(
        F.size(toks) > 0, F.array_max(counts) / F.size(toks)
    ).otherwise(F.lit(0.0))


def duplicate_bigram_fraction(toks: Column) -> Column:
    """Fraction of word bigrams that are repeats of an earlier bigram
    in the same document (1 − distinct/total) — catches loops and
    boilerplate that single-token frequency misses."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    return F.when(
        F.size(toks) >= 2,
        F.lit(1.0) - F.size(F.array_distinct(bigrams)) / (F.size(toks) - 1),
    ).otherwise(F.lit(0.0))


# PII patterns chosen for Java-regex / RE2 (DuckDB) parity: character
# classes and \b only, no lookarounds. Real deployments extend the
# table; the machinery (ordered regexp_replace chain + match counting)
# is the operator.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_match_count(text: Column | str) -> Column:
    """Total PII matches across all patterns (counted BEFORE
    redaction; order-independent because the patterns are disjoint)."""
    col = F.col(text) if isinstance(text, str) else text
    n = F.lit(0)
    for _name, pattern, _repl in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(col, F.lit(pattern), 0))
    return n


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder — an ordered
    regexp_replace chain, fully JVM-side (codegen), so redaction runs
    at scan speed over 100 TB. Email runs first so its local part
    can't be half-eaten by the phone/IP digit patterns."""
    col = F.col(text) if isinstance(text, str) else text
    out = col
    for _name, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out
