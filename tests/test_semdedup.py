"""SemDeDup invariants: candidate pairs never cross clusters, and the
kept/dropped decision matches a brute-force numpy replay of the greedy
centroid-nearest dominance rule within each cluster."""

from __future__ import annotations

import numpy as np

from topic_modeling_ajin_spark.operators.clustering import lloyd_fit
from topic_modeling_ajin_spark.operators.dedup import (
    SEMDEDUP_TAU,
    q_semantic_dedup,
)


def _round6(x: float) -> float:
    # numpy replay of the 6-dp grid both engines round onto; banker's-vs-
    # half-up only differs ON the grid boundary, which the fixture's
    # cosines do not hit (asserted below)
    return float(np.round(x, 6))


def test_semdedup_matches_bruteforce_and_never_crosses_clusters(spark, sf_dir):
    out = {
        r["vec_id"]: r
        for r in q_semantic_dedup(spark, sf_dir).collect()
    }
    assigned, centroids = lloyd_fit(spark, sf_dir)
    rows = assigned.collect()
    emb = {r["vec_id"]: np.array(r["emb"], dtype=np.float64) for r in rows}
    cluster = {r["vec_id"]: r["cluster"] for r in rows}
    cent = {c: np.array(v, dtype=np.float64) for c, v in centroids}

    assert set(out) == set(emb)  # one verdict per vector, none invented

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # brute-force replay, restricted to same-cluster pairs BY CONSTRUCTION
    prio = {
        v: (_round6(cos(emb[v], cent[cluster[v]])), v) for v in emb
    }
    expected_kept = {}
    n_dropped = 0
    for v in emb:
        dominated = False
        for u in emb:
            if u == v or cluster[u] != cluster[v]:
                continue
            if _round6(cos(emb[v], emb[u])) <= SEMDEDUP_TAU:
                continue
            # higher centroid-cosine wins; ties to the lower vec_id
            if (-prio[u][0], prio[u][1]) < (-prio[v][0], prio[v][1]):
                dominated = True
                break
        expected_kept[v] = 0 if dominated else 1
        n_dropped += 1 - expected_kept[v]

    for v, r in out.items():
        assert r["cluster"] == cluster[v]
        assert abs(r["cent_cos"] - prio[v][0]) < 1e-9
        assert r["kept"] == expected_kept[v], f"vec {v}"

    # the fixture must actually exercise the drop path
    assert n_dropped > 0

    # cross-cluster pairs can never cause a drop: every dropped vector
    # has a same-cluster dominating partner above tau (re-assert from the
    # engine's own output, independent of the replay above)
    for v, r in out.items():
        if r["kept"] == 1:
            continue
        partners = [
            u
            for u in emb
            if u != v
            and cluster[u] == cluster[v]
            and _round6(cos(emb[v], emb[u])) > SEMDEDUP_TAU
            and (-prio[u][0], prio[u][1]) < (-prio[v][0], prio[v][1])
        ]
        assert partners, f"dropped vec {v} has no same-cluster dominator"


def test_semdedup_default_k_is_sqrt_n(spark, sf_dir):
    """Operator default (k=None) derives k = sqrt(N) from one count over
    the persisted points table (r5 verdict: fixed k=10 makes the pair
    stage O(N^2/10) at 100x data). Verified structurally: every emitted
    cluster id is one of the sqrt(N) Lloyd seeds, and with k > 10 the fit
    genuinely differs from the pinned registered configuration."""
    import math

    from topic_modeling_ajin_spark.operators.clustering import _points
    from topic_modeling_ajin_spark.operators.dedup import (
        semantic_dedup,
        semdedup_default_k,
    )

    n = _points(spark, sf_dir).count()
    want_k = semdedup_default_k(n)
    assert want_k == max(2, math.isqrt(n)) > 10

    out = semantic_dedup(spark, sf_dir)  # k=None -> sqrt(N)
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    # seeds are the first-k vec_ids, so ids live in [0, want_k)
    assert clusters <= set(range(want_k))
    assert len(clusters) > 10  # finer than the pinned k=10 fit


def test_semdedup_hot_cluster_refuses_loudly(spark, tmp_path):
    """A degenerate corpus (every embedding identical) lands in ONE Lloyd
    cluster; the quadratic stage must refuse with the per-cluster pair
    budget named — BEFORE the pair join runs — rather than silently
    detonating at scale."""
    import pytest

    from topic_modeling_ajin_spark.operators.dedup import semantic_dedup

    d = str(tmp_path / "skew")
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    # budget is in UNORDERED a<b pairs — the rows the join generates
    # (r6 advice): 40 members -> C(40,2) = 780 pairs, so 779 refuses...
    with pytest.raises(ValueError, match="max_pairs_per_cluster"):
        semantic_dedup(spark, d, k=6, max_pairs_per_cluster=40 * 39 // 2 - 1)

    # ...and exactly 780 admits the bucket
    out = semantic_dedup(spark, d, k=6, max_pairs_per_cluster=40 * 39 // 2)
    got = {r["vec_id"]: r["kept"] for r in out.collect()}
    # identical vectors: cosine 1.0 > tau, centroid-cosine ties everywhere
    # -> the lowest vec_id survives, everything else is dropped
    assert got[0] == 1 and sum(got.values()) == 1


def test_semantic_decontam_flags_planted_paraphrase(spark, tmp_path):
    """A corpus vector colinear with a benchmark vector must be flagged
    with max_bench_cos 1.0; an orthogonal one must surface unflagged
    (verdict covers every corpus doc); benchmark rows themselves never
    appear in the verdict."""
    from topic_modeling_ajin_spark.operators.dedup import (
        q_semantic_decontam,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),    # benchmark item (vec_id < 50)
        (100, [2.0, 0.0, 0.0, 0.0]),  # paraphrase: cos 1.0 vs bench
        (101, [0.0, 3.0, 0.0, 0.0]),  # unrelated: cos 0.0
    ]
    d = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")
    got = {
        r["doc_id"]: (r["max_bench_cos"], r["flagged"])
        for r in q_semantic_decontam(spark, str(d)).collect()
    }
    assert got == {100: (1.0, True), 101: (0.0, False)}


def test_semantic_decontam_full_covers_missing_embeddings(spark, tmp_path):
    """r9 verdict task 3: every corpus doc must get a semantic verdict.
    Docs with a table embedding keep the table-space verdict verbatim;
    a doc with NO embeddings row is verdict-ed in the HASH space (its
    max cosine against the hash-encoded bench texts, replayed here with
    the pure-Python kernel); a token-less missing doc reports
    (0.0, false) — an empty doc cannot leak."""
    import numpy as np

    from topic_modeling_ajin_spark.functions.encoder import hash_embed_texts
    from topic_modeling_ajin_spark.operators.dedup import SEM_DECON_COS
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    bench_text = "aa bb cc dd ee ff"
    miss_text = "aa bb cc dd ee qqq"
    docs = [
        (1, bench_text),                 # benchmark item (doc_id < 50)
        (100, "aa bb cc dd ee zzz"),     # embedded near bench
        (101, "x1 x2 x3 x4 x5 x6"),      # embedded orthogonal
        (102, miss_text),                # NO embeddings row -> hash space
        (103, "   "),                    # NO embeddings row, token-less
    ]
    embs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (100, [2.0, 0.0, 0.0, 0.0]),     # cos 1.0 vs bench
        (101, [0.0, 1.0, 0.0, 0.0]),     # cos 0.0
    ]
    d = str(tmp_path / "data")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    spark.createDataFrame(
        embs, "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")
    got = {
        r["doc_id"]: (r["max_bench_cos"], r["flagged"], r["space"])
        for r in reg["semantic_decontam_full"].fn(spark, str(d)).collect()
    }
    # pure-Python hash-space replay for the missing doc
    hb, hm = hash_embed_texts([bench_text, miss_text])
    cos = float(np.dot(hb, hm))  # both unit-norm
    assert got == {
        100: (1.0, True, "table"),
        101: (0.0, False, "table"),
        102: (round(cos, 6), cos >= SEM_DECON_COS, "hash"),
        103: (0.0, False, "hash"),
    }


def test_decontam_gap_report_closes_embedding_coverage_gap(
    spark, tmp_path
):
    """r9 verdict task 3 (gap-report pin): the semantic side is now
    semantic_decontam_full, so a doc with NO embeddings row still gets a
    verdict — counted in n_hash_fallback, never in n_no_embedding /
    n_ngram_unevaluated (both structurally zero: the two gates cover the
    identical doc set, and a nonzero value means they drifted)."""
    import numpy as np

    from topic_modeling_ajin_spark.functions.encoder import hash_embed_texts
    from topic_modeling_ajin_spark.operators.dedup import SEM_DECON_COS
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_decontam_gap_report,
    )

    bench_text = "aa bb cc dd ee ff"
    miss_text = "aa bb cc dd ee qqq"
    docs = [
        (1, bench_text),                 # benchmark item (doc_id < 50)
        (100, "aa bb cc dd ee zzz"),     # shares 5-gram; embedded near 1
        (101, "x1 x2 x3 x4 x5 x6"),      # clean; embedded orthogonal
        (102, miss_text),                # shares 5-gram; NO embedding
    ]
    embs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (100, [2.0, 0.0, 0.0, 0.0]),     # cos 1.0 vs bench
        (101, [0.0, 1.0, 0.0, 0.0]),     # cos 0.0
    ]
    d = str(tmp_path / "data")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    spark.createDataFrame(
        embs, "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")
    hb, hm = hash_embed_texts([bench_text, miss_text])
    sem_102 = bool(float(np.dot(hb, hm)) >= SEM_DECON_COS)
    got = q_decontam_gap_report(spark, str(d)).collect()[0].asDict()
    assert got == {
        "n_docs": 3,
        "n_no_embedding": 0,
        "n_hash_fallback": 1,
        "n_ngram_flagged": 2,
        "n_semantic_flagged": 1 + int(sem_102),
        "n_both": 1 + int(sem_102),
        "n_ngram_only": 0 + int(not sem_102),
        "n_semantic_only": 0,
        "n_ngram_unevaluated": 0,
    }


def test_semantic_dedup_full_covers_missing_embeddings(spark, tmp_path):
    """r10 verdict task 3: every corpus doc must get a SemDeDup verdict.
    Docs with a table embedding keep the table-space verdict verbatim;
    docs with NO embeddings row are verdict-ed in the HASH space — a
    planted unembedded near-duplicate (identical text, so hash cosine
    is exactly 1.0 > tau in the same sign-LSH bucket) must be dropped
    keep-first, an unembedded singleton kept, and a token-less missing
    doc reported (cluster=-1, kept=1). The hash-space dominance is
    replayed here with the pure-Python hash kernel, so the expectation
    is independent of the Spark plan."""
    import math

    from topic_modeling_ajin_spark.functions.encoder import (
        hash_embed_texts,
    )
    from topic_modeling_ajin_spark.operators.dedup import (
        SEMDEDUP_HASH_TAU,
    )
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    texts = {
        0: "table zero aa bb",
        1: "table one cc dd",
        2: "table two ee ff",
        200: "boiler plate dup line qq ww",
        201: "boiler plate dup line qq ww",   # unembedded NEAR-DUP of 200
        202: "completely different words xyz uvw rst",
        203: "   ",                            # unembedded, token-less
    }
    embs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    got = {
        r["doc_id"]: (r["cluster"], r["kept"], r["space"])
        for r in reg["semantic_dedup_full"].fn(spark, str(d)).collect()
    }
    assert set(got) == set(texts), "every corpus doc gets a verdict"
    assert all(got[i][2] == "table" for i in (0, 1, 2))
    # orthogonal table vectors: nothing dominates anything
    assert all(got[i][1] == 1 for i in (0, 1, 2))

    # pure-Python hash-space replay: bucket = sign bits of the first 8
    # components, dominated iff a lower-id same-bucket doc has
    # round(cos, 6) > tau
    hvecs = dict(
        zip((200, 201, 202), hash_embed_texts([texts[i] for i in (200, 201, 202)]))
    )
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return num / na / nb

    for i in (200, 201, 202):
        dominated = any(
            j < i
            and bucket(hvecs[j]) == bucket(hvecs[i])
            and round(cos(hvecs[i], hvecs[j]), 6) > SEMDEDUP_HASH_TAU
            for j in (200, 201, 202)
            if j != i
        )
        assert got[i] == (bucket(hvecs[i]), 0 if dominated else 1, "hash")
    # the planted premise: 201 IS dominated (dup of 200), 200/202 kept
    assert got[200][1] == 1 and got[201][1] == 0 and got[202][1] == 1
    # token-less missing doc: zero vector, no bucket, kept
    assert got[203] == (-1, 1, "hash")

    # the savings report's coverage column counts the hash-space rows
    sav = reg["dedup_savings_report"].fn(spark, str(d)).collect()[0]
    assert sav["n_sem_hash_space"] == 4
    assert sav["n_semdedup_removed"] >= 1  # 201 at minimum


def test_semantic_dedup_full_hash_branch_refuses_hot_bucket(
    spark, tmp_path, monkeypatch
):
    """r11 verdict task 3: the hash-fallback dominance join carries the
    same per-bucket pair budget/loud-refusal discipline as every
    quadratic sibling — a large unembedded tail landing in one sign-LSH
    bucket must raise BEFORE the pair join detonates, naming the
    levers, instead of silently paying (N_tail/2^bits)^2."""
    import pytest

    from topic_modeling_ajin_spark.operators import dedup as dd
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    texts = {
        0: "table zero aa bb",
        200: "boiler plate dup line qq ww",
        201: "boiler plate dup line qq ww",  # same bucket as 200
    }
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    monkeypatch.setattr(dd, "SEMDEDUP_HASH_MAX_PAIRS_PER_BUCKET", 0)
    with pytest.raises(ValueError, match="hash-fallback bucket"):
        reg["semantic_dedup_full"].fn(spark, d).collect()


def test_semdedup_hash_recall_eval_matches_python_replay(spark, tmp_path):
    """r11 verdict task 8: the hash-fallback recall harness must measure
    EXACTLY the pair universe the fallback gate judges — all cosine >
    tau pairs among the hash embeddings of the unembedded tail, scored
    by whether they share a sign-LSH bucket. Replayed here in pure
    Python over the same hash-embedding kernel (planted tail with
    overlapping vocab so true pairs exist), plus the empty-tail
    convention (no unembedded docs -> 0 true pairs, recall 1.0)."""
    import math

    from topic_modeling_ajin_spark.functions.encoder import (
        hash_embed_texts,
    )
    from topic_modeling_ajin_spark.operators.dedup import (
        SEMDEDUP_HASH_TAU,
    )
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    texts = {
        0: "table embedded doc aa bb",
        200: "shared boiler plate line qq ww",
        201: "shared boiler plate line qq ww",   # identical: cos = 1.0
        202: "shared boiler plate line qq ww zz",  # near but below tau
        203: "totally different words xyz uvw rst",
        204: "   ",  # zero-norm: outside both sides
    }
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    tail = [i for i in sorted(texts) if i != 0 and texts[i].strip()]
    vecs = dict(zip(tail, hash_embed_texts([texts[i] for i in tail])))
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    pairs = [
        (a, b)
        for a in tail
        for b in tail
        if a < b and round(cos(vecs[a], vecs[b]), 6) > SEMDEDUP_HASH_TAU
    ]
    assert pairs, "planted tail must produce true pairs"
    n_bucketed = sum(
        1 for a, b in pairs if bucket(vecs[a]) == bucket(vecs[b])
    )
    got = reg["semdedup_hash_recall_eval"].fn(spark, d).collect()[0]
    assert got["n_true_pairs"] == len(pairs)
    assert got["n_bucketed_pairs"] == n_bucketed
    assert got["recall"] == round(n_bucketed / len(pairs), 6)
    assert got["n_truth_docs"] == len(tail)

    # empty tail (every doc embedded): the 1.0-by-convention row
    d2 = str(tmp_path / "data2")
    spark.createDataFrame(
        [(0, "only doc aa bb")], "doc_id long, text string"
    ).write.parquet(f"{d2}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d2}/embeddings.parquet")
    got2 = reg["semdedup_hash_recall_eval"].fn(spark, d2).collect()[0]
    assert tuple(got2) == (0, 0, 1.0, 0)


def test_fallback_bucket_width_derives_from_tail_size(
    spark, tmp_path, monkeypatch
):
    """r12 verdict task 3: the hash-fallback bucket width is an
    OPERATIONAL seam, not a source edit — the sign-bit count derives
    from the observed unembedded-tail size (integer rule, replayed by
    the DuckDB oracle from the same count), widening automatically
    when the tail outgrows the 8-bit space up to the hash-embedding
    dimensionality. A planted tail with the derivation forced wide
    must show the gate AND the recall harness judging in the widened
    space, verified against a pure-Python replay at the wider width."""
    import math

    from topic_modeling_ajin_spark.functions.encoder import (
        hash_embed_texts,
    )
    from topic_modeling_ajin_spark.operators import dedup as dd
    from topic_modeling_ajin_spark.operators import similarity as sim
    from topic_modeling_ajin_spark.registry import load_all

    # the integer rule itself: small tails keep the 8-bit space,
    # growth widens one bit at the target-occupancy boundary, and the
    # hash-embedding dimensionality caps the width
    assert sim.fallback_lsh_bits(0) == sim.LSH_BITS
    assert sim.fallback_lsh_bits(
        sim.FALLBACK_TARGET_BUCKET_DOCS << sim.LSH_BITS
    ) == sim.LSH_BITS
    assert sim.fallback_lsh_bits(
        (sim.FALLBACK_TARGET_BUCKET_DOCS << sim.LSH_BITS) + 1
    ) == sim.LSH_BITS + 1
    assert sim.fallback_lsh_bits(10**12) == sim.FALLBACK_MAX_BITS

    reg = load_all()
    texts = {0: "table zero aa bb"}
    texts.update(
        {
            i: f"tail doc t{i} shared boiler words qq ww"
            for i in range(200, 216)
        }
    )
    texts[300] = "planted duplicate pair line zz yy"
    texts[301] = "planted duplicate pair line zz yy"  # cos = 1.0
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    # force the derivation to the widened space: with a target of 0
    # expected docs per bucket, any non-empty tail saturates to the
    # dimensionality cap (a planted >16k-doc tail would do the same
    # through the unpatched rule)
    monkeypatch.setattr(sim, "FALLBACK_TARGET_BUCKET_DOCS", 0)
    bits = dd.fallback_bits_for(spark, d)
    assert bits == sim.FALLBACK_MAX_BITS > sim.LSH_BITS

    tail = sorted(i for i in texts if i != 0)
    vecs = dict(zip(tail, hash_embed_texts([texts[i] for i in tail])))
    bucket = lambda v: sum(  # noqa: E731
        1 << i for i in range(bits) if v[i] > 0
    )

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    got = {
        r["doc_id"]: (r["cluster"], r["kept"])
        for r in reg["semantic_dedup_full"].fn(spark, d).collect()
        if r["space"] == "hash"
    }
    assert set(got) == set(tail)
    for i in tail:
        dominated = any(
            j < i
            and bucket(vecs[j]) == bucket(vecs[i])
            and round(cos(vecs[i], vecs[j]), 6) > dd.SEMDEDUP_HASH_TAU
            for j in tail
            if j != i
        )
        assert got[i] == (bucket(vecs[i]), 0 if dominated else 1), i
    assert got[301][1] == 0 and got[300][1] == 1  # the planted pair

    # the recall harness runs green in the SAME widened space
    pairs = [
        (a, b)
        for a in tail
        for b in tail
        if a < b and round(cos(vecs[a], vecs[b]), 6) > dd.SEMDEDUP_HASH_TAU
    ]
    n_bucketed = sum(
        1 for a, b in pairs if bucket(vecs[a]) == bucket(vecs[b])
    )
    rec = reg["semdedup_hash_recall_eval"].fn(spark, d).collect()[0]
    assert rec["n_true_pairs"] == len(pairs) >= 1
    assert rec["n_bucketed_pairs"] == n_bucketed


def test_semdedup_recall_truth_side_is_budgeted(spark, tmp_path):
    """r12 verdict task 2: the recall harness's brute-force truth side
    is GROUND TRUTH, not a serving path — so its "sampled slice at
    scale" story must be code: a truth universe over the doc cap
    refuses loudly BEFORE the quadratic join, naming the
    truth_sample_mod lever; passing the lever measures the
    deterministic md5-keyed 1/m doc slice (both pair sides sliced
    together), with the slice size recorded in n_truth_docs — replayed
    here in pure Python."""
    import hashlib
    import math

    import pytest

    from topic_modeling_ajin_spark.functions.encoder import (
        hash_embed_texts,
    )
    from topic_modeling_ajin_spark.operators.dedup import (
        SEMDEDUP_HASH_TAU,
        semdedup_hash_recall,
    )

    texts = {0: "table embedded doc aa bb"}
    texts.update(
        {
            i: f"shared boiler plate line qq ww t{i % 2}"
            for i in range(200, 212)
        }
    )
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    # 12 tail docs over a 4-doc cap: loud refusal naming the lever
    with pytest.raises(ValueError, match="truth_sample_mod"):
        semdedup_hash_recall(spark, d, truth_max_docs=4)

    # the deterministic 1/3 slice fits the cap and matches the pure
    # Python replay of the same md5 rule over the same hash kernel
    m = 4
    tail = sorted(i for i in texts if i != 0)
    sliced = [
        i
        for i in tail
        if int(hashlib.md5(f"rtruth|{i}".encode()).hexdigest()[:8], 16)
        % m
        == 0
    ]
    assert 0 < len(sliced) <= 4, "planted slice must fit the cap"
    vecs = dict(zip(tail, hash_embed_texts([texts[i] for i in tail])))
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    pairs = [
        (a, b)
        for a in sliced
        for b in sliced
        if a < b and round(cos(vecs[a], vecs[b]), 6) > SEMDEDUP_HASH_TAU
    ]
    n_bucketed = sum(
        1 for a, b in pairs if bucket(vecs[a]) == bucket(vecs[b])
    )
    assert pairs, "planted slice must contain a true pair"
    got = semdedup_hash_recall(
        spark, d, truth_sample_mod=m, truth_max_docs=4
    ).collect()[0]
    assert got["n_truth_docs"] == len(sliced)
    assert got["n_true_pairs"] == len(pairs)
    assert got["n_bucketed_pairs"] == n_bucketed


def test_hash_tau_sweep_pins_the_gate_operating_point(spark, tmp_path):
    """r12 verdict task 6: the tau sweep is the audit face of the
    SEMDEDUP_HASH_TAU operating point — its row AT the gate's tau must
    equal the gate's actual hash-space drop count (the sweep can never
    disagree with the gate it tunes), monotonicity must hold across
    the grid (higher tau never drops more), and the pure-Python replay
    over the same hash kernel must reproduce every row."""
    import math

    from topic_modeling_ajin_spark.functions.encoder import (
        hash_embed_texts,
    )
    from topic_modeling_ajin_spark.operators.dedup import (
        SEMDEDUP_HASH_TAU,
        SEMDEDUP_HASH_TAU_GRID,
    )
    from topic_modeling_ajin_spark.registry import load_all

    assert SEMDEDUP_HASH_TAU in SEMDEDUP_HASH_TAU_GRID

    reg = load_all()
    texts = {
        0: "table embedded doc aa bb",
        200: "shared boiler plate line qq ww",
        201: "shared boiler plate line qq ww",    # identical: cos 1.0
        202: "shared boiler plate line qq ww zz",  # near, mid-tau band
        203: "shared boiler plate line qq yy zz",  # near, lower band
        204: "totally different words xyz uvw rst",
        205: "   ",                                # zero-norm: outside
    }
    d = str(tmp_path / "data")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    ).write.parquet(f"{d}/embeddings.parquet")

    tail = [i for i in sorted(texts) if i != 0 and texts[i].strip()]
    vecs = dict(zip(tail, hash_embed_texts([texts[i] for i in tail])))
    bucket = lambda v: sum(1 << i for i in range(8) if v[i] > 0)  # noqa: E731

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(y * y for y in b)
        )

    got = {
        r["tau"]: (r["n_pairs"], r["n_dropped_docs"])
        for r in reg["semdedup_hash_tau_sweep"].fn(spark, d).collect()
    }
    assert set(got) == set(SEMDEDUP_HASH_TAU_GRID)
    for tau in SEMDEDUP_HASH_TAU_GRID:
        pairs = [
            (a, b)
            for a in tail
            for b in tail
            if b < a
            and bucket(vecs[a]) == bucket(vecs[b])
            and round(cos(vecs[a], vecs[b]), 6) > tau
        ]
        assert got[tau] == (len(pairs), len({a for a, _ in pairs})), tau
    # the fixture exercises a real gradient, not all-or-nothing
    assert got[SEMDEDUP_HASH_TAU_GRID[0]][0] > got[SEMDEDUP_HASH_TAU][0] > 0
    # monotone: higher tau never drops more
    drops = [got[t][1] for t in SEMDEDUP_HASH_TAU_GRID]
    assert drops == sorted(drops, reverse=True)

    # THE pin: the sweep's row at the gate's tau equals the gate's
    # actual hash-space drop count
    gate_drops = (
        reg["semantic_dedup_full"]
        .fn(spark, d)
        .filter("space = 'hash' AND kept = 0")
        .count()
    )
    assert got[SEMDEDUP_HASH_TAU][1] == gate_drops > 0
