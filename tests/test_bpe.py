"""BPE merge training: planted-fixture semantics tests.

The corpus-level oracle check (``check_oracles.py bpe_merges bpe_encode``)
proves cross-engine equality; these tests pin the ALGORITHM against
hand-computed Sennrich BPE so a refactor can't silently redefine the
semantics both engines share.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from topic_modeling_ajin_spark.operators import bpe as B


def _fit_on_words(spark, rows, n_merges):
    """Run the training loop directly on a planted (word, cnt) vocab."""
    seq = (
        spark.createDataFrame(rows, "word string, cnt long")
        .withColumn("seq", B._char_seq("word"))
        .persist()
    )
    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            B._pair_counts(seq)
            .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, n = best[0]["lhs"], best[0]["rhs"], int(best[0]["n"])
        merges.append((lhs, rhs, n))
        seq = B._apply_merge(seq, lhs, rhs)
    final = {
        r["word"]: list(r["seq"]) for r in seq.select("word", "seq").collect()
    }
    return merges, final


def test_bpe_matches_hand_computed_sennrich(spark):
    """The canonical toy corpus: low/lower/newest/widest weighted counts.
    Hand-derived first merges (count DESC, then lexicographic ties):
    'es'+'t' chain — es wins with 9 (newest 6 + widest 3), then est 9."""
    rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges, final = _fit_on_words(spark, rows, 3)
    # pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7 ... tie at 9
    # broken lexicographically: ('e','s') < ('s','t')
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    # round 3: (l,o)=7 vs (o,w)=7 -> ('l','o') wins the tie
    assert merges[2] == ("l", "o", 7)
    assert final["newest"] == ["n", "e", "w", "est"]
    assert final["lower"] == ["lo", "w", "e", "r"]


def test_bpe_greedy_nonoverlapping_runs(spark):
    """Greedy left-to-right on a run: 'aaaaa' under merge (a,a) becomes
    [aa, aa, a] — non-overlapping, leftover single at the END (the
    re.sub semantics real BPE trainers use)."""
    merges, final = _fit_on_words(spark, [("aaaaa", 1)], 1)
    assert merges[0] == ("a", "a", 4)  # 4 adjacent occurrences counted
    assert final["aaaaa"] == ["aa", "aa", "a"]


def test_bpe_merged_symbol_pairs_next_round(spark):
    """A merged symbol participates in the NEXT round's pair counts:
    (a,a)->aa, then (aa,aa) is countable and mergeable."""
    merges, final = _fit_on_words(spark, [("aaaa", 3)], 2)
    assert merges[0] == ("a", "a", 9)  # 3 adjacent pairs x cnt 3
    assert merges[1] == ("aa", "aa", 3)
    assert final["aaaa"] == ["aaaa"]


def test_bpe_encode_registered_query_shape(spark, sf_dir):
    """Registered surface: every vocab word round-trips — pieces re-concat
    to the word, n_pieces matches, and merges are rank-dense."""
    enc = B.q_bpe_encode(spark, sf_dir).collect()
    assert enc
    for r in enc:
        assert r["pieces"].replace(" ", "") == r["word"]
        assert r["n_pieces"] == len(r["pieces"].split(" "))
    m = B.q_bpe_merges(spark, sf_dir).collect()
    assert [r["rank"] for r in m] == list(range(1, len(m) + 1))
    assert all(r["merged"] == r["lhs"] + r["rhs"] for r in m)
