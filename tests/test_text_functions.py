"""Unit tests for the text expression builders (SURVEY P6-P11, F4-F6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from topic_modeling_ajin_spark.functions import text as TX


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_cleaned_strips_specials_and_collapses_ws(spark):
    df = spark.createDataFrame([("  Hello, 월드!!  x(y)z  ",)], ["t"])
    assert df.select(TX.cleaned("t").alias("v")).collect()[0]["v"] == "hello 월드 xyz"


def test_normalized_ai_word_boundary(spark):
    df = spark.createDataFrame([("AI is ai-based, aid unchanged KAI",)], ["t"])
    out = df.select(TX.normalized_ai("t").alias("v")).collect()[0]["v"]
    assert out == "인공지능 is 인공지능-based, aid unchanged KAI"


def test_tokens_drops_empties_and_lowercases(spark):
    df = spark.createDataFrame([("  The  QUICK fox ",)], ["t"])
    assert df.select(TX.tokens("t").alias("v")).collect()[0]["v"] == [
        "the",
        "quick",
        "fox",
    ]


def test_length_band_and_stopwords(spark):
    df = spark.createDataFrame([(["a", "ab", "abcdefghijklmnop", "the", "fox"],)], ["t"])
    banded = df.select(TX.length_band(F.col("t")).alias("v")).collect()[0]["v"]
    assert banded == ["ab", "the", "fox"]
    no_stop = df.select(
        TX.without_stopwords(F.col("t"), TX.ENGLISH_STOPWORDS).alias("v")
    ).collect()[0]["v"]
    assert no_stop == ["ab", "abcdefghijklmnop", "fox"]


def test_truncated(spark):
    df = spark.createDataFrame([("x" * 10,), ("y" * 3,)], ["t"])
    out = [r["v"] for r in df.select(TX.truncated("t", 5).alias("v")).collect()]
    assert out == ["xxxxx...", "yyy"]


def test_hangul_tokens(spark):
    df = spark.createDataFrame([("인공지능 AI 광고 abc 모델",)], ["t"])
    out = df.select(TX.hangul_tokens("t").alias("v")).collect()[0]["v"]
    assert out == ["인공지능", "광고", "모델"]


def test_morph_udf_fallback_kind_and_tokens(spark, sf_dir):
    from topic_modeling_ajin_spark.functions.morph import analyzer_kind, morph_tokens
    from topic_modeling_ajin_spark.sources import load_table

    assert analyzer_kind() in ("kiwi", "regex")
    d = load_table(spark, sf_dir, "documents").limit(5)
    rows = d.select("text", morph_tokens("text").alias("m")).collect()
    assert rows
    for r in rows:
        assert all(len(t) >= 2 for t in r["m"])  # length filter applied
        assert all(t == t.lower() for t in r["m"])


def test_morph_regex_fallback_dispatches_to_codegen(spark):
    """VERDICT r2 item 6: without kiwi, morph_tokens must plan as a pure
    regexp expression — no Python/Arrow eval node — and map null to []."""
    from topic_modeling_ajin_spark.functions.morph import analyzer_kind, morph_tokens

    if analyzer_kind() != "regex":
        import pytest

        pytest.skip("kiwi installed: UDF path is the intended plan")
    df = spark.createDataFrame([("인공지능 AI ab 광고 x",), (None,)], ["t"])
    plan = df.select(morph_tokens("t").alias("m"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    rows = df.select(morph_tokens("t").alias("m")).collect()
    vals = {tuple(r["m"]) for r in rows}
    assert ("인공지능", "ai", "ab", "광고") in vals  # len>=2, lowered, in order
    assert () in vals  # null text -> empty array, matching the UDF branch


def test_minhash_kernel_empty_shingles_sentinel(spark):
    """ADVICE r1: the Arrow minhash kernel must not crash on zero-shingle
    docs — it emits the all-P sentinel (the expression form's fold init)."""
    from topic_modeling_ajin_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, [])],
        "doc_id long, shingles array<string>",
    )
    rows = {r["doc_id"]: r["sig"] for r in H.minhash_signatures(df, 4).collect()}
    assert rows[2] == [H.MINHASH_P] * 4
    assert all(v < H.MINHASH_P for v in rows[1])
    # kernel values == expression-form values on the non-empty doc
    expr = df.filter("doc_id = 1").select(
        H.minhash_signature(F.col("shingles"), 4).alias("sig")
    ).collect()[0]["sig"]
    assert rows[1] == expr


def test_cache_memo_and_clear(spark):
    from topic_modeling_ajin_spark.cache import clear_caches, memo

    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    a = memo(spark, ("t", "x"), build, persist=True)
    b = memo(spark, ("t", "x"), build, persist=True)
    assert a is b and len(calls) == 1
    assert a.storageLevel.useMemory
    released = clear_caches(spark)
    assert released >= 1
    c = memo(spark, ("t", "x"), build, persist=True)
    assert len(calls) == 2 and c is not a
    clear_caches(spark)


def test_fuzzy_pairs_find_planted_typos(spark):
    """Deletion-neighborhood join recovers exactly the planted
    edit-distance-1 pairs (substitution, deletion) and nothing else."""
    from topic_modeling_ajin_spark.operators.text_analysis import (
        fuzzy_pairs_from_vocab,
    )

    vocab = spark.createDataFrame(
        [("hash", 10), ("cash", 4), ("hashs", 2),  # substitution + insertion
         ("filter", 9), ("fitter", 3),             # substitution
         ("merge", 8), ("purge", 5),               # ed=2: must NOT pair
         ("배치처리", 6), ("배치저리", 2)],          # Hangul substitution
        "word string, c long",
    )
    pairs = {
        (r["word_a"], r["word_b"])
        for r in fuzzy_pairs_from_vocab(vocab).collect()
    }
    assert pairs == {
        ("cash", "hash"),
        ("hash", "hashs"),
        ("filter", "fitter"),
        ("배치저리", "배치처리"),
    }


def test_ngram_lm_perplexity_matches_brute_force(spark, sf_dir):
    """Pin the bigram-LM semantics with a hand-computed replay on the
    first docs: Laplace (cab+1)/(ctx+V), per-doc mean log-prob, ppl =
    exp(-mean)."""
    import math
    import re

    from topic_modeling_ajin_spark.operators.text_analysis import (
        _docs,
        q_ngram_lm_perplexity,
    )

    got = {
        r["doc_id"]: r
        for r in q_ngram_lm_perplexity(spark, sf_dir).collect()
    }

    docs = {
        r["doc_id"]: [
            w
            for w in re.split(r"[^a-z0-9가-힣]+", (r["text"] or "").lower())
            if w
        ]
        for r in _docs(spark, sf_dir).collect()
    }
    from collections import Counter

    bigrams = Counter()
    ctx = Counter()
    vocab = set()
    for toks in docs.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
            ctx[a] += 1
    V = len(vocab)

    checked = 0
    for doc_id, toks in sorted(docs.items()):
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            assert doc_id not in got  # <2 tokens => absent by definition
            continue
        ll = sum(
            math.log((bigrams[p] + 1) / (ctx[p[0]] + V)) for p in pairs
        )
        r = got[doc_id]
        assert r["n_bigrams"] == len(pairs)
        assert abs(r["avg_logp"] - ll / len(pairs)) < 1e-5
        assert abs(r["perplexity"] - math.exp(-ll / len(pairs))) < 1e-4 * max(
            1.0, r["perplexity"]
        )
        checked += 1
        if checked >= 25:
            break
    assert checked >= 10
