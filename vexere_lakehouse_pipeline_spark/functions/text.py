"""Text-analysis column expressions for large-scale corpus processing.

Extension operators beyond the reference's surface (BASELINE north
star): language-ID, quality scoring, token counting, fingerprinting —
everything a training-data pipeline runs over a ``documents`` table.
All pure Column expressions (JVM-side, codegen) so they scan 100 TB of
text without touching Python.  The only reference analog is the
langdetect routing UDF (`predict/sentiment_analysis.py:10-14`), which
here becomes a deterministic stopword/charset heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-property classes, not literal char lists: Java's default \w
# is ASCII-only, so a bare [^\w\s] would count every diacritic letter
# as punctuation and junk Vietnamese documents via an inflated
# punct_ratio.  \p{L}/\p{N} are the Unicode Letter/Number categories,
# supported IDENTICALLY by Java regex and DuckDB's RE2 (both engines'
# oracles interpolate these same constants), cover Vietnamese (and
# every other script) without enumeration — and hit the regex engines'
# optimized property paths: measured 4x faster than the equivalent
# 77-char literal class on the sf0.1 corpus, which dominated the
# tokenize-heavy queries' runtime.
PUNCT_RE = r"[^\p{L}\p{N}_\s]"
# GPT-2-style pre-tokenizer shape: word pieces, numbers, or single
# non-space symbols.  (A real BPE merges further; this counts pre-tokens,
# which is the standard cheap proxy.)
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Token split on non-letterish runs — used to TOKENIZE for stopword
# matching and all shingle/vocab/fingerprint consumers.  \b-based
# matching is NOT engine-portable (Java's \b is Unicode-aware, RE2's is
# ASCII-only, so `\bvà\b` and even `\bto\b` inside 'toàn' disagree
# across engines); splitting on a shared class and testing token
# MEMBERSHIP is bit-identical everywhere.  \p{L}\p{N} instead of a
# literal a-z0-9+diacritics list: same cross-engine agreement (see
# PUNCT_RE note), ~4x faster in the JVM, and other-script words become
# tokens instead of being shredded into separators.
LETTERISH = r"\p{L}\p{N}"
LANG_TOKEN_SPLIT_RE = f"[^{LETTERISH}]+"

# Tiny per-language stopword panels for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von"),
    "vi": ("và", "của", "là", "có", "cho", "không", "được", "trong", "người", "một"),
}


def tokenize(col: Column | str) -> Column:
    """Lowercased word tokens as array<string> (empty tokens removed).

    Splits on LANG_TOKEN_SPLIT_RE — non-(letter|number) runs via the
    Unicode \\p{L}\\p{N} property classes — not a bare [^a-z0-9]+,
    which would treat every diacritic letter as a separator and shred
    the pipeline's primary language into fragments ('tiếng' -> 'ti',
    'ng') across all shingle/vocab/fingerprint consumers.  Java regex
    and DuckDB RE2 implement these property classes identically (see
    the constant's note), so both engines agree bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), LANG_TOKEN_SPLIT_RE), lambda t: t != ""
    )


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != "")).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-style pre-tokens (letters / digit runs / symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)).cast("long")


def stopword_hits(lower: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens equal to any panel word (token membership, not
    \b regex — see LANG_TOKEN_SPLIT_RE)."""
    toks = F.split(lower, LANG_TOKEN_SPLIT_RE)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_hits_sql(text_sql: str, words: tuple[str, ...]) -> str:
    """DuckDB SQL computing exactly :func:`stopword_hits`."""
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split_regex(lower({text_sql}), "
        f"'{LANG_TOKEN_SPLIT_RE}'), x -> x IN ({inlist})))"
    )


def detect_language(col: Column | str) -> Column:
    """Deterministic language-ID heuristic: score each language panel by
    stopword hits (+ a diacritic-class bonus for vi), pick the argmax,
    fall back to 'und' when nothing matches.

    Replaces the reference's langdetect `.apply` routing
    (predict/sentiment_analysis.py:10-14,45-46) with a scalable
    JVM-side expression; langdetect stays available as a pandas_udf in
    operators/nlp.py for users who want the model-based version.
    """
    c = F.col(col) if isinstance(col, str) else col
    lower = F.lower(c)
    scores = [
        F.struct(
            (stopword_hits(lower, words)
             + (F.size(F.regexp_extract_all(lower, F.lit("[ăâđêôơưạ-ỹ]"), 0))
                if lang == "vi" else F.lit(0))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in LANG_STOPWORDS.items()
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(col: Column | str) -> Column:
    """Struct of cheap quality signals used for corpus filtering:
    n_chars, n_words, avg_word_len, punct_ratio, digit_ratio,
    stopword_ratio (en panel), all doubles rounded to 4dp."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    words = tokenize(c)
    n_words = F.size(words).cast("double")
    total_word_chars = F.length(F.concat_ws("", words)).cast("double")
    # Runs on the LOWERED text: \p{L} makes case irrelevant to the
    # punct count itself, but the DuckDB oracles (star_ml.py) pin
    # lower(text) in their regexp_extract_all — keep the two sides
    # textually aligned rather than "simplifying" one of them.
    n_punct = F.size(
        F.regexp_extract_all(F.lower(c), F.lit(PUNCT_RE), 0)
    ).cast("double")
    n_digits = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0)).cast("double")
    n_stop = stopword_hits(F.lower(c), LANG_STOPWORDS["en"]).cast("double")
    safe = lambda num, den: F.round(num / F.nullif(den, F.lit(0.0)), 4)  # noqa: E731
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        safe(total_word_chars, n_words).alias("avg_word_len"),
        safe(n_punct, n_chars).alias("punct_ratio"),
        safe(n_digits, n_chars).alias("digit_ratio"),
        safe(n_stop, n_words).alias("stopword_ratio"),
    )


def word_shingles(col: Column | str, n: int = 5) -> Column:
    """Word n-gram shingles (array<string>), the dedup/fingerprint unit.

    Sliding window over the token array via transform(sequence(...)) —
    pure Column code, no UDF.  Documents shorter than ``n`` words yield
    a single shingle of the whole text.
    """
    # Let-bind the token array: higher-order-function lambdas defeat
    # Catalyst's common-subexpression elimination, so referencing
    # tokenize() four times below would re-run the regex split four
    # times per row.  Wrapping it in a 1-element array and binding it
    # as a transform() lambda variable evaluates it exactly once
    # (measured ~1.7x on the shingle explode).
    def body(words: Column) -> Column:
        sz = F.size(words)
        # Build shingles by zipping the word array with its own shifted
        # copies — O(n · len) and ~8x faster than a slice-per-index
        # transform (zip_with pads the shorter side with null; concat
        # then nulls out incomplete trailing shingles, which the filter
        # drops).
        acc = words
        for j in range(1, n):
            shifted = F.slice(words, j + 1, F.greatest(sz - j, F.lit(0)))
            acc = F.zip_with(
                acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
            )
        acc = F.filter(acc, lambda x: x.isNotNull())
        # ZERO tokens (punctuation/whitespace-only text) -> EMPTY set,
        # like NULL text below: the [''] whole-text fallback would give
        # every token-less doc the same single shingle, making '!!!'
        # and '???' exact duplicates across all dedup operators.
        return (
            F.when(sz >= n, acc)
            .when(sz > 0, F.array(F.concat_ws(" ", words)))
            .otherwise(F.array().cast("array<string>"))
        )

    c = F.col(col) if isinstance(col, str) else col
    out = F.element_at(F.transform(F.array(tokenize(c)), body), 1)
    # NULL text -> EMPTY shingle set (explodes to no rows; fingerprint
    # becomes NULL) — matching the SQL oracles, where md5(NULL)/NULL
    # band keys join nothing.  The previous [''] fallback made all
    # null-text docs mutual duplicates with fingerprint md5('').
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(out)


PII_URL_RE = r"https?://[^\s]+"
PII_EMAIL_RE = r"[\w.+-]+@[\w-]+\.[\w.-]+"


def redact_pii(col: Column | str) -> Column:
    """Replace URLs and email addresses with placeholder tokens.

    The standard pre-training scrub pass; both patterns use only
    RE2-safe syntax so Spark (Java regex) and DuckDB/Presto (RE2)
    produce identical output.  URLs first — an email-looking substring
    inside a URL is already gone by the time the email rule runs.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_url = F.regexp_replace(c, PII_URL_RE, "<URL>")
    return F.regexp_replace(no_url, PII_EMAIL_RE, "<EMAIL>")


def document_fingerprint(col: Column | str, n: int = 5) -> Column:
    """Winnowing-style fingerprint: the lexicographic min of md5 over
    word n-gram shingles.  Engine-portable (md5 is bit-stable across
    Spark/DuckDB/Presto) and robust to small in-document reorderings —
    the standard rolling-hash fingerprint reduced to its minimum
    selection."""
    return F.array_min(F.transform(word_shingles(col, n), F.md5))


# Unicode scrub table: the invisible/typographic characters a web
# corpus carries that tokenizers and dedup hashes must not see.
# Literal replace() pairs (ordered) — engine-portable because no regex
# replacement-metacharacter rules apply.  (ellipsis first: its
# replacement introduces '.', which no later rule touches.)
UNICODE_SCRUB: tuple[tuple[str, str], ...] = (
    ("…", "..."),   # horizontal ellipsis
    ("﻿", ""),      # BOM / zero-width no-break space
    ("​", ""),      # zero-width space
    ("‌", ""),      # zero-width non-joiner
    ("‍", ""),      # zero-width joiner
    (" ", " "),     # no-break space
    ("‘", "'"),     # left single quote
    ("’", "'"),     # right single quote
    ("“", '"'),     # left double quote
    ("”", '"'),     # right double quote
    ("–", "-"),     # en dash
    ("—", "-"),     # em dash
)


def normalize_unicode(col: Column | str) -> Column:
    """Apply the UNICODE_SCRUB table as an ordered literal-replace
    chain (pure Column projection, codegen'd)."""
    out = F.col(col) if isinstance(col, str) else col
    for src, dst in UNICODE_SCRUB:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def normalize_unicode_sql(expr: str) -> str:
    """DuckDB SQL computing exactly :func:`normalize_unicode`."""
    out = expr
    for src, dst in UNICODE_SCRUB:
        s = src.replace("'", "''")
        d = dst.replace("'", "''")
        out = f"replace({out}, '{s}', '{d}')"
    return out
