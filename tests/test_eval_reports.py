"""Invariants for the evaluation/report compositions: LSH recall harness,
CCNet perplexity buckets, temperature mixture shares."""

from __future__ import annotations

import math

from topic_modeling_ajin_spark.operators.dedup import (
    q_lsh_recall_eval,
    q_minhash_lsh_pairs,
    q_ngram_jaccard_pairs,
)
from topic_modeling_ajin_spark.operators.text_analysis import (
    q_ccnet_ppl_buckets,
    q_langid_heuristic,
    q_ngram_lm_perplexity,
)
from topic_modeling_ajin_spark.operators.curation import (
    q_mixture_temperature_plan,
)


def test_lsh_recall_consistency(spark, sf_dir):
    row = q_lsh_recall_eval(spark, sf_dir).collect()[0]
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in q_ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in q_minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert row["n_true_pairs"] == len(truth)
    assert row["n_lsh_pairs"] == len(lsh)
    assert row["n_hits"] == len(truth & lsh)
    # precision is 1 by construction: every LSH pair is exact-verified
    assert lsh <= truth
    expected = round(len(truth & lsh) / len(truth), 6) if truth else 0.0
    assert abs(row["recall"] - expected) < 1e-9


def test_ccnet_buckets_partition_and_order(spark, sf_dir):
    out = q_ccnet_ppl_buckets(spark, sf_dir).collect()
    ppl = {r["doc_id"]: r["perplexity"] for r in q_ngram_lm_perplexity(spark, sf_dir).collect()}
    lid = {r["doc_id"]: r["predicted"] for r in q_langid_heuristic(spark, sf_dir).collect()}
    joined = [(lid[d], p) for d, p in ppl.items() if d in lid]
    # bucket counts partition the joined docs per language
    per_lang: dict[str, int] = {}
    for lang, _ in joined:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    got_per_lang: dict[str, int] = {}
    means: dict[tuple[str, str], float] = {}
    for r in out:
        got_per_lang[r["lang_pred"]] = (
            got_per_lang.get(r["lang_pred"], 0) + r["n_docs"]
        )
        means[(r["lang_pred"], r["bucket"])] = r["mean_ppl"]
        assert r["mean_ppl"] <= r["max_ppl"] + 1e-9
    assert got_per_lang == per_lang
    # terciles are perplexity-ordered: head <= middle <= tail on means
    for lang in got_per_lang:
        h = means.get((lang, "head"))
        m = means.get((lang, "middle"))
        t = means.get((lang, "tail"))
        for lo, hi in ((h, m), (m, t), (h, t)):
            if lo is not None and hi is not None:
                assert lo <= hi + 1e-9


def test_mixture_temperature_plan_properties(spark, sf_dir):
    rows = q_mixture_temperature_plan(spark, sf_dir).collect()
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(
            r["upsample_factor"]
            - r["temp_share"] / r["natural_share"]
        ) < 1e-3
    # temperature flattens: the smallest language is upsampled the most,
    # and upsample factors are monotone decreasing in corpus share
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    factors = [r["upsample_factor"] for r in by_n]
    assert factors == sorted(factors, reverse=True)
    # share ∝ sqrt(n): verify against a direct replay
    ts = sum(math.sqrt(r["n_docs"]) for r in rows)
    for r in rows:
        assert abs(r["temp_share"] - math.sqrt(r["n_docs"]) / ts) < 1e-6


def test_semdedup_recall_matches_numpy(spark, sf_dir):
    import numpy as np

    from topic_modeling_ajin_spark.operators.clustering import lloyd_fit
    from topic_modeling_ajin_spark.operators.dedup import (
        SEMDEDUP_TAU,
        q_semdedup_recall_eval,
    )

    assigned, _ = lloyd_fit(spark, sf_dir)
    rows = assigned.collect()
    emb = {r["vec_id"]: np.array(r["emb"], dtype=np.float64) for r in rows}
    cluster = {r["vec_id"]: r["cluster"] for r in rows}
    ids = sorted(emb)
    n_true = n_buck = 0
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            a, b = emb[va], emb[vb]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if round(cos, 6) > SEMDEDUP_TAU:
                n_true += 1
                if cluster[va] == cluster[vb]:
                    n_buck += 1
    row = q_semdedup_recall_eval(spark, sf_dir).collect()[0]
    assert row["n_true_pairs"] == n_true
    assert row["n_bucketed_pairs"] == n_buck
    expected = round(n_buck / n_true, 6) if n_true else 1.0
    assert abs(row["recall"] - expected) < 1e-9
