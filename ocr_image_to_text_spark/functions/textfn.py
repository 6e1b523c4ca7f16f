"""Scalar text functions (SURVEY.md §2.8) as JVM-side column expressions.

Everything here is whole-stage-codegen friendly (built-in functions only —
no Python in the hot path). Each builder has a matching DuckDB SQL twin in
__spark_entry__.oracle_sql() with identical structure, so the driver's
correctness gate checks these end-to-end.

Unicode note: Python's str.isalnum()/\\w are unicode-aware while the Java
character classes used here are ASCII; the synthetic corpora are ASCII, and
the oracle-equality tests cover the divergence-free domain. The
equality-critical cleaning path (X1/X2) deliberately does NOT live here —
it runs through Python-`re` pandas UDFs (operators/htmlx.clean_block).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- X7 entity regexes (ocr_app/utils/text_utils.py:208-230) ---------------
ENTITY_PATTERNS: dict[str, list[str]] = {
    "date": [
        r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b",
        r"\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b",
        r"(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b",
    ],
    "email": [r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"],
    "phone": [r"\b(?:\+\d{1,3}[- ]?)?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}\b"],
    "url": [r"https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+"],
}


def entity_matches(text: Column, entity_type: str) -> Column:
    """All matches of one entity family, concatenated across its patterns."""
    arrays = [F.regexp_extract_all(text, F.lit(p), 0) for p in ENTITY_PATTERNS[entity_type]]
    out = arrays[0]
    for a in arrays[1:]:
        out = F.concat(out, a)
    return out


# --- PII redaction (training-data pipeline; composes the X7 regexes) --------
# Masks each PII-class match with a typed placeholder. Order is part of the
# contract (email before url, so mailto-ish text can't be half-masked); the
# DuckDB twin chains regexp_replace(..., 'g') in the identical order.
REDACT_ORDER = ["email", "phone", "url"]


def redact_col(text: Column) -> Column:
    out = text
    for etype in REDACT_ORDER:
        for p in ENTITY_PATTERNS[etype]:
            out = F.regexp_replace(out, p, f"[{etype.upper()}]")
    return out


# --- X8 language id (src/utils.py:96-122, deterministic path) ---------------


def lang_col(text: Column) -> Column:
    return (
        F.when(text.isNull() | (F.length(text) < 20), "en")
        .when(text.rlike("[一-鿿]"), "zh")
        .when(text.rlike("[぀-ヿ]"), "ja")
        .when(text.rlike("[가-힯]"), "ko")
        .when(text.rlike("[؀-ۿ]"), "ar")
        .when(text.rlike("[Ѐ-ӿ]"), "ru")
        .otherwise("en")
    )


# --- X8 primary-path analog: deterministic profile-based language ID --------
# The reference's primary path calls the langdetect package
# (ocr_app/utils/text_utils.py:171-189) — a stochastic 3rd-party model
# boundary. This is the deterministic stand-in: script evidence via the
# same unicode ranges, then Cavnar–Trenkle-style stopword-profile scoring
# for latin-script texts, first-max-wins in profile order.

LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "et", "est", "dans", "pour", "que", "une"],
    "es": ["el", "los", "las", "es", "y", "con", "para", "por"],
}


def lang_ngram_col(text: Column) -> Column:
    words = F.array_distinct(
        F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(r"\w+"), 0))
    scores = {
        lang: F.size(F.filter(F.array(*[F.lit(w) for w in profile]),
                              lambda w: F.array_contains(words, w)))
        for lang, profile in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    out = (
        F.when(text.isNull() | (F.length(text) < 20), "en")
        .when(text.rlike("[一-鿿]"), "zh")
        .when(text.rlike("[぀-ヿ]"), "ja")
        .when(text.rlike("[가-힯]"), "ko")
        .when(text.rlike("[؀-ۿ]"), "ar")
        .when(text.rlike("[Ѐ-ӿ]"), "ru")
    )
    for i, lang in enumerate(langs):
        others = [scores[o] for o in langs if o != lang]
        cond = scores[lang] >= F.greatest(*others)
        out = out.when(cond, lang)
    return out.otherwise("en")  # unreachable (first when covers >= ties)


# --- A10 text statistics (ocr_app/ui/web_app.py:299-312) --------------------


def stats_cols(text: Column) -> list[Column]:
    words = F.split(F.trim(text), r"\s+")
    return [
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(words)).cast("long").alias("n_words"),
        F.length(text).cast("long").alias("n_chars"),
        F.size(F.split(text, "\n", -1)).cast("long").alias("n_lines"),
    ]


# --- A6 / A7 result-quality scores ------------------------------------------


def score_v1_col(text: Column) -> Column:
    """A6 — ocr_app/core/ocr_engine.py:415-437 (ASCII domain)."""
    alnum_space = F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    ratio = alnum_space / F.length(text)
    score = F.least(F.lit(1.0), F.length(text) / F.lit(100.0)) * ratio
    return F.when(text.isNull() | (F.length(text) == 0), F.lit(0.0)).otherwise(score)


def score_v2_col(text: Column) -> Column:
    """A7 — src/ocr_module.py:448-476 (ASCII domain)."""
    n_words = F.size(F.array_distinct(F.regexp_extract_all(F.lower(text), F.lit(r"\w+"), 0)))
    alnum = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", ""))
    score = (
        F.least(F.length(text) / F.lit(100.0), F.lit(10.0))
        + F.least(n_words / F.lit(10.0), F.lit(10.0))
        + (alnum / F.length(text)) * 10
        + F.when(text.contains("\n"), F.lit(5.0)).otherwise(F.lit(0.0))
        - F.when(F.length(text) < 20, F.lit(5.0)).otherwise(F.lit(0.0))
    )
    return F.when(text.isNull() | (F.length(text) == 0), F.lit(0.0)).otherwise(score)


def best_of_col(paddle: Column, easy: Column) -> Column:
    """A8 — src/ocr_module.py:414-432: argmax with paddle-wins-ties."""
    return (
        F.when((F.length(paddle) == 0) & (F.length(easy) == 0), F.lit(""))
        .when(F.length(paddle) == 0, F.lit("easy"))
        .when(F.length(easy) == 0, F.lit("paddle"))
        .when(score_v2_col(paddle) >= score_v2_col(easy), F.lit("paddle"))
        .otherwise(F.lit("easy"))
    )


# --- X4 legacy stride chunker (src/utils.py:10-24) — pure SQL ---------------


def chunks_legacy_cols(text: Column, chunk_size: int = 100, overlap: int = 20):
    """Returns (starts, chunks) array columns; explode with posexplode."""
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    starts = F.sequence(F.lit(0), n - 1, F.lit(chunk_size - overlap))
    chunks = F.transform(starts, lambda i: F.array_join(F.slice(words, i + 1, chunk_size), " "))
    return starts, chunks


# --- X5 / X6 keyword scores --------------------------------------------------


def keyword_score_x5_col(text: Column, query_words: list[str]) -> Column:
    """X5 — ocr_app/utils/text_utils.py:117-139 (un-normalized score)."""
    qw = F.array(*[F.lit(w) for w in sorted(set(query_words))])
    chunk_lower = F.lower(text)
    chunk_words = F.regexp_extract_all(chunk_lower, F.lit(r"\w+"), 0)
    word_matches = F.size(F.filter(qw, lambda w: F.array_contains(chunk_words, w)))
    phrase = F.size(F.filter(qw, lambda w: (F.length(w) > 3) & chunk_lower.contains(w)))
    return word_matches * F.lit(0.5) + phrase


def keyword_score_x6_col(text: Column, query_words: list[str]) -> Column:
    """X6 — src/utils.py:60-72: count of query words in the cleaned word set."""
    qw = F.array(*[F.lit(w) for w in sorted(set(query_words))])
    clean = F.trim(F.regexp_replace(F.lower(text), r"[^\w\s]", ""))
    chunk_words = F.split(clean, r"\s+")
    return F.size(F.filter(qw, lambda w: F.array_contains(chunk_words, w))).cast("long")


# --- X9 / X10 formatting ------------------------------------------------------


def markdown_col(text: Column) -> Column:
    """X9 — ocr_app/utils/text_utils.py:249-261 ('## ' onto the unstripped line)."""
    lines = F.split(text, "\n", -1)

    def fmt(l):
        s = F.trim(l)
        hdr = (s == F.upper(s)) & (s != F.lower(s)) & (F.length(s) < 50) & (F.length(s) > 3)
        return F.when(hdr, F.concat(F.lit("## "), l)).otherwise(l)

    return F.array_join(F.transform(lines, fmt), "\n")


def html_fmt_col(text: Column) -> Column:
    """X10 — ocr_app/utils/text_utils.py:262-274 (no escaping)."""
    lines = F.split(text, "\n", -1)

    def fmt(l):
        return F.when(F.length(F.trim(l)) == 0, F.lit("<br>")).otherwise(
            F.concat(F.lit("<p>"), l, F.lit("</p>"))
        )

    return F.concat(
        F.lit('<div class="ocr-text">\n'),
        F.array_join(F.transform(lines, fmt), "\n"),
        F.lit("\n</div>"),
    )


# --- X13 sentence split -------------------------------------------------------


def sentences_col(text: Column) -> Column:
    """X13 — rag_processor.py:197. Java regex supports the lookbehind natively;
    the DuckDB twin uses the replace-sentinel-then-split equivalent."""
    return F.split(text, r"(?<=[.!?])\s+", -1)


# --- token counting (training-data op) ----------------------------------------

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_cols(text: Column) -> list[Column]:
    ws = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))
    return [ws.cast("long").alias("n_ws_tokens"), bpe.cast("long").alias("n_bpe_tokens")]


# --- winnowing document fingerprint (training-data op) -------------------------
# Lives in operators/fingerprint.py (numpy rolling-hash kernel + generated
# DuckDB twin from one spec). The former md5-expression variant here was
# removed with the round-3 spec change so the spec exists in one place.
