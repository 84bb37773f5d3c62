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


def test_bpe_token_counts_consistent_with_encode(spark, sf_dir):
    """Per-doc BPE counts re-derive from the encoded vocabulary: summing
    n_pieces over a doc's words (brute force in pandas) must equal the
    distributed join's answer; token-less docs report zeros."""
    from topic_modeling_ajin_spark.functions import text as TX
    from topic_modeling_ajin_spark.sources import load_table

    pieces = {
        r["word"]: r["n_pieces"]
        for r in B.q_bpe_encode(spark, sf_dir).collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", TX.word_tokens("text").alias("toks"))
        .collect()
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in B.q_bpe_token_counts(spark, sf_dir).collect()
    }
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        n_words = len(r["toks"])
        n_bpe = sum(pieces[w] for w in r["toks"])
        assert got[r["doc_id"]] == (n_words, n_bpe), r["doc_id"]
        assert n_bpe >= n_words  # a word is >= 1 piece


def test_pack_sequences_bpe_invariant(spark, sf_dir):
    """Packing invariant on BPE counts: the manifest equals a sequential
    pandas replay — every document starts in the pack whose
    [pack_id*B, (pack_id+1)*B) window contains its start offset, totals
    conserve, and no pack holds more than B worth of START offsets (a
    straddling doc's tokens count toward the pack where it begins)."""
    lens = sorted(
        (r["doc_id"], r["n_bpe_tokens"])
        for r in B.q_bpe_token_counts(spark, sf_dir).collect()
    )
    expected: dict[int, list] = {}
    cum = 0
    for doc_id, n in lens:
        pack = (cum) // B.BPE_PACK_BUDGET
        e = expected.setdefault(pack, [0, 0, doc_id, doc_id])
        e[0] += 1
        e[1] += n
        e[3] = doc_id
        cum += n
    got = {
        r["pack_id"]: [r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"]]
        for r in B.q_pack_sequences_bpe(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(v[1] for v in got.values()) == sum(n for _, n in lens)
