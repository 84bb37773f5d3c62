"""Cross-engine NULL-text parity (r5 advice).

The sf testdata corpus has no NULL ``text`` values, so the oracle gate
never exercises them — but crawls deliver NULLs, and the r5 fix coalesced
NULL→empty only on the Spark side. These tests run each per-document
quality/curation query on BOTH engines over a fixture that contains NULL,
empty, and normal documents, and assert the full value-hash parity the
driver's harness uses. The contract under test: a NULL document behaves
exactly like an empty one, on both engines.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from topic_modeling_ajin_spark.registry import load_all

# per-doc queries where NULL-vs-empty divergence is visible in the output
# rows (aggregate/explode queries drop a token-less doc on both engines
# either way); source_quality_report averages per-doc signals, so a
# NULL≠empty disagreement shifts its means too.
PARITY_QUERIES = (
    "token_stats",
    "quality_score",
    "langid_heuristic",
    "repetition_ratio",
    "curation_filter_report",
    "source_quality_report",
    "doc_stats",
)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    df = _normalize(df)
    if df.empty:
        return "empty"
    rows = sorted(df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).tolist())
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_docs")
    rows = [
        (0, None, "en", "crawl", 0),  # the NULL the crawl delivered
        (1, "", "en", "crawl", 0),  # empty — must behave identically
        (2, "the quick brown fox jumps over the lazy dog and the cat", "en", "news", 56),
        (3, "인공지능 기술 동향 분석 보고서", "ko", "report", 17),
        (4, "!!! ??? ...", "unk", "crawl", 11),  # punctuation-only
        (5, None, "ko", "crawl", 0),  # NULL in a second source bucket
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_null_text_cross_engine_parity(spark, null_sf_dir, registry, name):
    spec = registry[name]
    sdf = spec.fn(spark, null_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_sf_dir}/documents.parquet/*.parquet'"
    )
    odf = con.execute(spec.sql).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _value_hash(sdf) == _value_hash(odf), (
        f"{name}: value mismatch\nspark=\n{_normalize(sdf).sort_values(sorted(sdf.columns)).to_string()}"
        f"\noracle=\n{_normalize(odf).sort_values(sorted(odf.columns)).to_string()}"
    )


def test_null_text_scores_as_empty(spark, null_sf_dir, registry):
    """The semantic pin behind the parity: NULL text and '' text produce
    identical quality rows (doc 0 vs doc 1)."""
    q = registry["quality_score"].fn(spark, null_sf_dir).toPandas()
    q = q.set_index("doc_id")
    assert q.loc[0].tolist() == q.loc[1].tolist()
    assert q.loc[0, "n_tokens"] == 0
    assert q.loc[0, "quality"] == pytest.approx(0.25)
