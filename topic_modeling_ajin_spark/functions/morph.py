"""Korean morphological tokenizer UDF (SURVEY P9) with regex fallback (P10).

The reference dispatches between Kiwi / Okt / a regex fallback, constructing
the analyzer lazily ONCE (``preprocessing.py:40-69,200-204``) and keeping
POS tags NNG/NNP/VA/VV with length ≥ 2 (``preprocessing.py:227-235``). The
Spark translation:

- an Arrow-batched ``pandas_udf``: one Python invocation per record batch,
  not per row;
- the analyzer initializes lazily **once per executor process** (module
  global inside the UDF closure) — the reference's lazy-init pattern moved
  to where it matters in a cluster;
- ``kiwipiepy`` is optional: absent (as in this container) the UDF runs the
  deterministic regex fallback exactly mirroring ``preprocessing.py:266-277``
  extended with latin runs for non-Korean corpora, so the same query is
  oracle-checkable in any environment.

The fallback is NOT a stub — it is the reference's own documented fallback
path (``preprocessing.py:67-69,258-260``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# Hangul runs or latin/digit runs of length >= 2 — the regex-fallback
# token shape (preprocessing.py:274 keeps len >= 2)
_FALLBACK_PATTERN = re.compile(r"[가-힣]{2,}|[a-z0-9]{2,}")

# POS tags the reference keeps for Kiwi (preprocessing.py:227-235)
KIWI_KEEP_TAGS = ("NNG", "NNP", "VA", "VV")

_ANALYZER = None
_ANALYZER_KIND: str | None = None


def _get_analyzer():
    """Per-executor lazy init: first call in each Python worker process
    pays the model load; every later batch reuses it."""
    global _ANALYZER, _ANALYZER_KIND
    if _ANALYZER_KIND is None:
        try:
            from kiwipiepy import Kiwi  # optional native dependency

            _ANALYZER = Kiwi()
            _ANALYZER_KIND = "kiwi"
        except ImportError:
            _ANALYZER = None
            _ANALYZER_KIND = "regex"
    return _ANALYZER, _ANALYZER_KIND


def analyzer_kind() -> str:
    """Which tokenizer this environment will run ('kiwi' or 'regex')."""
    return _get_analyzer()[1]


def _tokenize_series(texts: pd.Series) -> pd.Series:
    analyzer, kind = _get_analyzer()
    if kind == "kiwi":
        def tok(t: str) -> list[str]:
            if not t:
                return []
            return [
                m.form
                for m in analyzer.tokenize(t)
                if m.tag in KIWI_KEEP_TAGS and len(m.form) >= 2
            ]
    else:
        def tok(t: str) -> list[str]:
            if not t:
                return []
            return _FALLBACK_PATTERN.findall(t.lower())
    return texts.map(tok)


@pandas_udf(ArrayType(StringType()))
def morph_tokens_udf(texts: pd.Series) -> pd.Series:
    return _tokenize_series(texts)


def morph_tokens(col: Column | str) -> Column:
    """Morphological token array for a text column, dispatched at PLAN
    time: when kiwi is absent the fallback is a pure regexp column
    expression — same output as the UDF's regex branch, but JVM-side and
    inside whole-stage codegen, with zero Arrow transfer. Only the kiwi
    path (a real native analyzer) pays for a pandas UDF, and there the
    analyzer state lives per executor, never on the driver.

    The dispatch probe runs on the driver; engine contract is a
    homogeneous environment (executors with kiwi imply a driver with
    kiwi), the same assumption the reference's dispatcher makes
    (``preprocessing.py:40-69``)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    if analyzer_kind() == "regex":
        toks = F.regexp_extract_all(
            F.lower(c), F.lit(_FALLBACK_PATTERN.pattern), 0
        )
        # the UDF maps null/empty text to [], not null — match it
        return F.coalesce(toks, F.array().cast("array<string>"))
    return morph_tokens_udf(c)
