"""Unigram-LM trainer invariants + a full pure-Python training replay
(independent of both Spark and the DuckDB oracle)."""

from __future__ import annotations

import math
import re

from topic_modeling_ajin_spark.operators.unigram_lm import (
    UNI_EM_ROUNDS,
    UNI_MAXPIECE,
    UNI_MAXW,
    UNI_TOPM,
    _UROUND,
    q_unigram_lm_fertility,
    q_unigram_lm_segment,
    q_unigram_lm_vocab,
)


def _word_counts(spark, sf_dir) -> dict[str, int]:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts: dict[str, int] = {}
    for r in docs:
        for w in re.split(r"[^a-z0-9가-힣]+", (r["text"] or "").lower()):
            if w and len(w) <= UNI_MAXW:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _replay(counts: dict[str, int]):
    """Full training replay: seed inventory -> UNI_EM_ROUNDS hard-EM."""
    cand: dict[str, int] = {}
    for w, c in counts.items():
        for i in range(len(w)):
            for l in range(1, min(UNI_MAXPIECE, len(w) - i) + 1):  # noqa: E741
                p = w[i : i + l]
                cand[p] = cand.get(p, 0) + c
    topm = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_TOPM]
    inv = dict(topm)
    for p, n in cand.items():
        if len(p) == 1:
            inv[p] = n
    tot = sum(inv.values())
    lps = {p: round(math.log(n / tot), _UROUND) for p, n in inv.items()}
    inventory = sorted(inv)

    def viterbi(word: str) -> str:
        dp: list[tuple[float, str] | None] = [None] * (len(word) + 1)
        dp[0] = (0.0, "")
        for j in range(1, len(word) + 1):
            best = None
            for i in range(max(0, j - UNI_MAXPIECE), j):
                if dp[i] is None or word[i:j] not in lps:
                    continue
                c, s = dp[i]
                candt = (
                    c - lps[word[i:j]],
                    word[i:j] if s == "" else s + " " + word[i:j],
                )
                if best is None or candt < best:
                    best = candt
            dp[j] = best
        return dp[len(word)][1]

    seg: dict[str, str] = {}
    final: dict[str, int] = {}
    for _ in range(UNI_EM_ROUNDS):
        seg = {w: viterbi(w) for w in counts}
        final = {p: 0 for p in inventory}
        for w, s in seg.items():
            for p in s.split(" "):
                final[p] += counts[w]
        t = sum(final.values())
        lps = {
            p: round(math.log((c + 1) / (t + len(inventory))), _UROUND)
            for p, c in final.items()
        }
    return inventory, final, seg


def test_unigram_training_matches_python_replay(spark, sf_dir):
    counts = _word_counts(spark, sf_dir)
    inventory, final, seg = _replay(counts)

    got_seg = {
        r["word"]: (r["cnt"], r["seg"], r["n_pieces"])
        for r in q_unigram_lm_segment(spark, sf_dir).collect()
    }
    assert set(got_seg) == set(counts)
    for w, (cnt, s, np_) in got_seg.items():
        assert cnt == counts[w]
        assert s == seg[w], w
        assert np_ == len(s.split(" "))
        # segmentation invariants: pieces reconstruct the word exactly
        assert "".join(s.split(" ")) == w

    got_vocab = {
        r["piece"]: (r["n"], r["logp"])
        for r in q_unigram_lm_vocab(spark, sf_dir).collect()
    }
    assert set(got_vocab) == set(inventory)
    t = sum(final.values())
    for p in inventory:
        assert got_vocab[p][0] == final[p], p
        expected_lp = round(math.log((final[p] + 1) / (t + len(inventory))), 6)
        assert abs(got_vocab[p][1] - expected_lp) < 1e-9, p


def test_unigram_fertility_consistent_with_segmentation(spark, sf_dir):
    seg = q_unigram_lm_segment(spark, sf_dir).collect()
    row = q_unigram_lm_fertility(spark, sf_dir).collect()[0]
    n_words = sum(r["cnt"] for r in seg)
    n_pieces = sum(r["cnt"] * r["n_pieces"] for r in seg)
    assert row["n_words"] == n_words
    assert row["n_pieces"] == n_pieces
    assert abs(row["fertility"] - round(n_pieces / n_words, 6)) < 1e-9
    # a subword tokenizer never emits more pieces than characters
    assert all(r["n_pieces"] <= len(r["word"]) for r in seg)


def test_tokenizer_compare_composes_both_chains(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.bpe import bpe_doc_lengths
    from topic_modeling_ajin_spark.operators.unigram_lm import (
        q_tokenizer_compare,
    )

    rows = {r["tokenizer"]: r for r in q_tokenizer_compare(spark, sf_dir).collect()}
    assert set(rows) == {"bpe", "unigram"}
    lens = bpe_doc_lengths(spark, sf_dir).collect()
    n_words = sum(r["n_words"] for r in lens)
    n_bpe = sum(r["n_bpe"] for r in lens)
    assert rows["bpe"]["n_words"] == n_words
    assert rows["bpe"]["n_tokens"] == n_bpe
    fert = q_unigram_lm_fertility(spark, sf_dir).collect()[0]
    assert rows["unigram"]["n_words"] == fert["n_words"]
    assert rows["unigram"]["n_tokens"] == fert["n_pieces"]
    # a trained subword tokenizer emits at least one piece per word
    for r in rows.values():
        assert r["n_tokens"] >= r["n_words"]
        assert r["fertility"] >= 1.0


# ------- Viterbi optimality: DP == exhaustive search (no Spark needed)


def _all_segmentations(word, pieces):
    if not word:
        yield []
        return
    for l in range(1, min(UNI_MAXPIECE, len(word)) + 1):  # noqa: E741
        head = word[:l]
        if head in pieces:
            for rest in _all_segmentations(word[l:], pieces):
                yield [head] + rest


def test_viterbi_is_optimal_exhaustively():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from topic_modeling_ajin_spark.operators.unigram_lm import viterbi_path

    alphabet = "abc"
    words = st.text(alphabet, min_size=1, max_size=7)
    pieces_st = st.dictionaries(
        st.text(alphabet, min_size=1, max_size=UNI_MAXPIECE),
        st.floats(min_value=-12.0, max_value=-0.1),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=300, deadline=None)
    @given(word=words, extra=pieces_st)
    def check(word, extra):
        # alphabet always present so every word is segmentable (the
        # trainer's invariant); hypothesis adds arbitrary multi-char
        # pieces with arbitrary log-probs on top
        lps = {c: -1.0 for c in alphabet}
        lps.update(extra)
        got = viterbi_path(word, lps)
        best = min(
            (
                (-sum(lps[p] for p in segm), " ".join(segm))
                for segm in _all_segmentations(word, lps)
            ),
            key=lambda t: (t[0], t[1]),
        )
        assert got == best[1], (word, got, best)

    check()


def test_fertility_by_source_reconciles_with_doc_counts(spark, sf_dir):
    """Per-source sums must equal the doc-level unigram_token_counts
    grouped in python, and fertility = tokens / segmentable words."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.operators.unigram_lm import (
        q_tokenizer_fertility_by_source,
        q_unigram_token_counts,
    )
    from topic_modeling_ajin_spark.sources import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    agg: dict[str, list[int]] = {}
    for r in q_unigram_token_counts(spark, sf_dir).collect():
        a = agg.setdefault(src[r["doc_id"]], [0, 0, 0, 0])
        a[0] += 1
        a[1] += r["n_words"]
        a[2] += r["n_skipped"]
        a[3] += r["n_uni_tokens"]
    got = {
        r["source"]: r
        for r in q_tokenizer_fertility_by_source(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, nw, nsk, nt) in agg.items():
        r = got[s]
        assert (r["n_docs"], r["n_words"], r["n_skipped"], r["n_uni_tokens"]) == (
            nd, nw, nsk, nt
        )
        seg = nw - nsk
        want = round(nt / seg, 6) if seg > 0 else 0.0
        assert abs(r["fertility"] - want) < 1e-9
        assert r["fertility"] >= 1.0 or seg == 0  # a word is >= 1 piece
