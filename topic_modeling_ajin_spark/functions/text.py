"""Column-level text expression builders.

Re-expresses the reference's per-row Python string pipeline
(``preprocessing.py:206-284`` clean/normalize, ``LDA_Analysis.py:147-164``
tokenize/filter) as pure Catalyst expressions: every function here returns a
``Column`` built from ``pyspark.sql.functions`` only, so the whole text path
stays inside whole-stage codegen — no Python in the hot loop, and each
expression has a 1:1 ANSI-SQL equivalent for the DuckDB oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters the reference keeps: Hangul syllables, ASCII alnum, whitespace
# (preprocessing.py:213). Everything else is stripped, then runs of
# whitespace collapse to one space and the result is trimmed
# (preprocessing.py:215-217).
_KEEP_PATTERN = r"[^가-힣a-zA-Z0-9 ]"
_WS_PATTERN = r"\s+"

# Deterministic English stopword list used by the engine's text-quality /
# language-id heuristics (the reference ships a 1,380-line Korean
# stopwords.txt — loaded file-driven via sources; this tiny builtin set is
# for the synthetic English corpus and is mirrored verbatim in oracle SQL).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the",
    "a",
    "an",
    "and",
    "or",
    "of",
    "to",
    "in",
    "is",
    "on",
    "for",
    "with",
    "by",
    "at",
    "as",
)


def cleaned(col: Column | str) -> Column:
    """Regex clean (SURVEY P6): keep ``[가-힣a-zA-Z0-9 ]`` only, collapse
    whitespace, trim, lowercase. Mirrors ``preprocessing.py:206-217`` +
    lowercasing for a case-insensitive downstream pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(F.lower(c), _KEEP_PATTERN, "")
    c = F.regexp_replace(c, _WS_PATTERN, " ")
    return F.trim(c)


def normalized_ai(col: Column | str) -> Column:
    """Term normalization (SURVEY P7): the reference maps the standalone
    token "AI" (any case) to 인공지능 (``preprocessing.py:279-284``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(?i)\bai\b", "인공지능")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenize (SURVEY P8) of the *raw* text, lowercased —
    ``text.split()`` at ``LDA_Analysis.py:156``. Empty strings from leading
    separators are dropped."""
    c = F.col(col) if isinstance(col, str) else col
    # array_remove, not F.filter(lambda): higher-order functions are
    # CodegenFallback — this stays inside whole-stage codegen (2× on the
    # tokenize hot path)
    return F.array_remove(F.split(F.lower(c), _WS_PATTERN), "")


def word_tokens(col: Column | str) -> Column:
    """BPE-ish word tokenize: split on any non-alphanumeric run. The scale
    analogue of the reference's regex fallback tokenizer
    (``preprocessing.py:266-277``) for non-Korean corpora.

    NULL text tokenizes to the EMPTY array, not NULL — crawls deliver
    NULLs, and the quality/curation consumers treat a NULL document as an
    empty one (the oracle SQL ``_SQL_WORD_TOKS`` coalesces identically, so
    the cross-engine contract holds on NULL inputs too — r5 advice)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    return F.array_remove(F.split(F.lower(c), r"[^a-z0-9가-힣]+"), "")


# DuckDB twin of ``word_tokens`` — ONE definition per engine, kept next
# to the Spark expression exactly like hashing.sql_md5_base32, so the
# tokenizer (split class + NULL-text coalesce) can never drift between
# the modules that embed it in their oracle SQL (review finding: four
# verbatim copies had accumulated).
SQL_WORD_TOKENS_EXPR = (
    "list_filter(string_split_regex(lower(coalesce(text, '')), "
    "'[^a-z0-9가-힣]+'), w -> w <> '')"
)


def hangul_tokens(col: Column | str) -> Column:
    """Simple Hangul tokenize (SURVEY P10): ``re.findall('[가-힣]+')``
    (``preprocessing.py:266-277``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, r"[^가-힣]+"), "")


def length_band(tokens_col: Column, lo: int = 2, hi: int = 15) -> Column:
    """Token length band filter (SURVEY F4): keep ``lo <= len <= hi``
    (``LDA_Analysis.py:159``)."""
    return F.filter(
        tokens_col, lambda t: (F.length(t) >= F.lit(lo)) & (F.length(t) <= F.lit(hi))
    )


def without_stopwords(tokens_col: Column, stopwords: tuple[str, ...]) -> Column:
    """Stopword removal (SURVEY F6) as a pure array expression. For large
    stopword sets prefer ``pyspark.ml.feature.StopWordsRemover``; for the
    builtin list an ``array_except`` against a literal array keeps the whole
    expression codegen'd and order-preserving via ``filter``."""
    lit_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(tokens_col, lambda t: ~F.array_contains(lit_arr, t))


def truncated(col: Column | str, n: int = 200) -> Column:
    """Example-sentence truncation (SURVEY P11): ``s[:200] + '...'`` when
    longer (``LDA_Analysis.py:452``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))).otherwise(c)
