"""Text-analysis operators for the web-corpus pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All implemented as native Spark SQL expressions (JVM-side, whole-stage
codegen) with exact DuckDB twins for the driver's oracle checks —
each ``*_SQL`` / ``*_DUCKDB`` pair computes identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocabularies for the n-gram/stopword language-ID heuristic;
# zh is detected by CJK codepoint range instead of markers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "une"],
    "es": ["el", "los", "las", "es", "que", "por", "para", "una"],
    "ru": ["i", "v", "ne", "na", "chto", "eto", "kak", "po"],
}

STOPWORDS = LANG_MARKERS["en"]

#: Java's ``\s`` and RE2's ``\s`` DISAGREE on vertical tab (\x0B is
#: whitespace to Java only — same class of divergence as the PII
#: ``\b`` fix), so every cross-engine expression spells the
#: whitespace set explicitly: Java's set, parsed identically by both
#: engines.
WS_CLASS = "[ \\t\\n\\x0b\\f\\r]"
#: word or single punct (BPE-ish); the negated class excludes the
#: explicit whitespace set, not ``\s``
TOKEN_REGEX = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]"

#: Unicode case mapping ALSO diverges between engines: Java/Spark
#: applies FULL mappings (U+0130 'İ' -> 'i' + combining dot, 2 code
#: points; context-sensitive Greek final sigma), DuckDB's utf8proc
#: applies SIMPLE per-codepoint mappings, and Python sits between
#: (full İ, no final sigma).  Every cross-engine normalization
#: therefore lowercases ASCII ONLY via translate — identical in all
#: three engines, and for URL hosts also the RFC-correct rule.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_LOWER_TABLE = str.maketrans(ASCII_UPPER, ASCII_LOWER)


def ascii_lower_column(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def ascii_lower_duckdb(expr: str) -> str:
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def ascii_lower_py(s: str) -> str:
    return s.translate(_ASCII_LOWER_TABLE)


def _quote_list_sql(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --- language ID -----------------------------------------------------------------
def lang_id_sql_spark(text_col: str = "text") -> str:
    """argmax of marker-word votes; CJK codepoints force 'zh';
    all-zero votes -> 'und'."""
    votes = []
    lowered = f"translate({text_col}, '{ASCII_UPPER}', '{ASCII_LOWER}')"
    for lang, markers in LANG_MARKERS.items():
        votes.append(
            f"size(filter(split({lowered}, ' '), "
            f"w -> array_contains(array({_quote_list_sql(markers)}), w))) AS v_{lang}"
        )
    return votes


def _membership(markers: list[str]):
    # NB: the lambda must take exactly one arg — a two-arg lambda makes
    # F.filter pass (element, index).
    return lambda w: w.isin(markers)


def lang_id_column(text_col: str = "text") -> Column:
    words = F.split(ascii_lower_column(text_col), " ")
    votes = {
        lang: F.size(F.filter(words, _membership(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    best = None
    best_votes = None
    # deterministic argmax: iterate in fixed order, strict > to switch
    expr = F.lit("und")
    max_v = F.lit(0)
    for lang in LANG_MARKERS:
        v = votes[lang]
        expr = F.when(v > max_v, F.lit(lang)).otherwise(expr)
        max_v = F.greatest(max_v, v)
    _ = best, best_votes
    return F.when(has_cjk, F.lit("zh")).otherwise(expr)


def lang_id_duckdb(text_col: str = "text") -> str:
    """DuckDB twin of :func:`lang_id_column` (same deterministic
    argmax: later language in fixed order wins ties at strict >)."""
    vote = {
        lang: (
            f"len(list_filter(string_split("
            f"{ascii_lower_duckdb(text_col)}, ' '), "
            f"w -> list_contains([{_quote_list_sql(m)}], w)))"
        )
        for lang, m in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    expr = "'und'"
    max_v = "0"
    for lang in langs:
        v = vote[lang]
        expr = f"CASE WHEN {v} > {max_v} THEN '{lang}' ELSE {expr} END"
        max_v = f"greatest({max_v}, {v})"
    # RE2 (DuckDB) spells codepoints \x{4e00}; Java (Spark) uses 一.
    return (
        f"CASE WHEN regexp_matches({text_col}, '[\\x{{4e00}}-\\x{{9fff}}]') "
        f"THEN 'zh' ELSE {expr} END"
    )


# The alnum+space class spelled out as a translate() deletion list:
# counting chars OUTSIDE [A-Za-z0-9 ] via length(translate(text, LIST,
# '')) is value-identical to the regexp_replace formulation (both count
# code points) but runs as a per-char map lookup instead of a regex
# matcher — measured 33x faster on the sf0.1 corpus (0.47s vs 15.45s
# for 500k docs), and this expression sits on every gate pass of the
# cleaning pipeline.  The DuckDB twin keeps the regexp spelling.
_ALNUM_SPACE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)


# --- quality scoring ----------------------------------------------------------------
def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_chars = F.length(text)
    n_words = F.size(words)
    n_punct = F.length(F.translate(text, _ALNUM_SPACE, ""))
    punct_ratio = F.round(
        n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6
    )
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    stopword_ratio = F.round(
        stop_hits.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    mean_word_len = F.round(
        F.length(F.translate(text, " ", "")).cast("double")
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    return {
        "n_chars_computed": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "mean_word_len": mean_word_len,
    }


def quality_duckdb(text_col: str = "text") -> dict[str, str]:
    stop = _quote_list_sql(STOPWORDS)
    n_chars = f"length({text_col})"
    n_words = f"len(string_split({text_col}, ' '))"
    alnum = f"length(regexp_replace({text_col}, '[^A-Za-z0-9 ]', '', 'g'))"
    return {
        "n_chars_computed": f"CAST({n_chars} AS BIGINT)",
        "n_words": f"CAST({n_words} AS BIGINT)",
        "punct_ratio": f"round(({n_chars} - {alnum}) / CAST(greatest({n_chars}, 1) AS DOUBLE), 6)",
        "stopword_ratio": (
            f"round(len(list_filter(string_split({text_col}, ' '), "
            f"w -> list_contains([{stop}], w))) / CAST(greatest({n_words}, 1) AS DOUBLE), 6)"
        ),
        "mean_word_len": (
            f"round(length(replace({text_col}, ' ', '')) / "
            f"CAST(greatest({n_words}, 1) AS DOUBLE), 6)"
        ),
    }


PPM = 1_000_000  # parts-per-million scale for integer-exact ratios


def quality_columns_ppm(text_col: str = "text") -> dict[str, Column]:
    """Integer-exact twins of :func:`quality_columns`: every ratio is
    ``(numerator * 1e6) DIV denominator`` in PURE BIGINT arithmetic —
    no doubles anywhere, so the values are bit-identical across
    engines, engine VERSIONS, and partitionings (the float ``round(x,
    6)`` spelling is correct but hash-fragile: a driver environment
    with a different banker's-rounding half-case in either engine
    flips the last digit).  Used by the driver's ``text_analysis``
    hash row; the float forms remain the library API for gates."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_chars = F.length(text).cast("long")
    n_words = F.size(words).cast("long")
    n_punct = F.length(F.translate(text, _ALNUM_SPACE, "")).cast("long")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast(
        "long"
    )
    nospace = F.length(F.translate(text, " ", "")).cast("long")
    one = F.lit(1).cast("long")
    m = F.lit(PPM).cast("long")
    return {
        "n_chars_computed": n_chars,
        "n_words": n_words,
        "punct_ratio_ppm": _idiv(n_punct * m, F.greatest(n_chars, one)),
        "stopword_ratio_ppm": _idiv(stop_hits * m, F.greatest(n_words, one)),
        "mean_word_len_ppm": _idiv(nospace * m, F.greatest(n_words, one)),
    }


def _idiv(a: Column, b: Column) -> Column:
    """BIGINT floor division for non-negative operands (Spark's DIV),
    expressed arithmetically so it stays a Column expression:
    ``a DIV b == (a - a % b) / b`` exactly, and the final ``/`` is
    exact because the numerator is a multiple of ``b``."""
    exact = (a - F.pmod(a, b)) / b
    return exact.cast("long")


def quality_duckdb_ppm(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins of :func:`quality_columns_ppm` (`//` is integer
    floor division on BIGINTs; all operands non-negative)."""
    stop = _quote_list_sql(STOPWORDS)
    n_chars = f"length({text_col})"
    n_words = f"len(string_split({text_col}, ' '))"
    alnum = f"length(regexp_replace({text_col}, '[^A-Za-z0-9 ]', '', 'g'))"
    stop_hits = (
        f"len(list_filter(string_split({text_col}, ' '), "
        f"w -> list_contains([{stop}], w)))"
    )
    nospace = f"length(replace({text_col}, ' ', ''))"
    return {
        "n_chars_computed": f"CAST({n_chars} AS BIGINT)",
        "n_words": f"CAST({n_words} AS BIGINT)",
        "punct_ratio_ppm": (
            f"CAST((CAST({n_chars} - {alnum} AS BIGINT) * {PPM}) // "
            f"greatest({n_chars}, 1) AS BIGINT)"
        ),
        "stopword_ratio_ppm": (
            f"CAST((CAST({stop_hits} AS BIGINT) * {PPM}) // "
            f"greatest({n_words}, 1) AS BIGINT)"
        ),
        "mean_word_len_ppm": (
            f"CAST((CAST({nospace} AS BIGINT) * {PPM}) // "
            f"greatest({n_words}, 1) AS BIGINT)"
        ),
    }


# --- token counting -----------------------------------------------------------------
def token_count_column(text_col: str = "text") -> Column:
    """Whitespace + punctuation tokenizer count (BPE-ish regex)."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0))
    ).cast("long")


def token_count_duckdb(text_col: str = "text") -> str:
    return f"CAST(len(regexp_extract_all({text_col}, '{TOKEN_REGEX}')) AS BIGINT)"


def whitespace_token_count_column(text_col: str = "text") -> Column:
    return F.size(F.split(F.col(text_col), WS_CLASS + "+")).cast("long")


# --- fingerprinting -----------------------------------------------------------------
def fingerprint_column(text_col: str = "text") -> Column:
    """Normalized-text content fingerprint (md5 of whitespace-collapsed
    lowercase text) — the exact-dedup / near-dup anchor key.
    Whitespace is the explicit cross-engine class (``WS_CLASS``),
    never ``\\s`` (vertical-tab divergence)."""
    norm = F.regexp_replace(
        ascii_lower_column(text_col), WS_CLASS + "+", " "
    )
    return F.md5(F.trim(norm).cast("binary"))


def fingerprint_duckdb(text_col: str = "text") -> str:
    return (
        f"md5(trim(regexp_replace({ascii_lower_duckdb(text_col)}, "
        f"'{WS_CLASS}+', ' ', 'g')))"
    )
