"""Data-selection operator invariants, each checked against an
independent pure-Python/numpy replay (not the DuckDB oracle — that runs
in the gate; these catch shared-misconception bugs)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from topic_modeling_ajin_spark.operators.selection import (
    DOMAIN_CAP,
    DSIR_BUCKETS,
    DSIR_SELECT_K,
    DSIR_TARGET_LANG,
    JS_VOCAB,
    q_domain_cap_sample,
    q_dsir_logweights,
    q_dsir_select,
    q_source_js_divergence,
)


def _docs_pdf(spark, sf_dir) -> pd.DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()


def _toks(text) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9가-힣]+", (text or "").lower()) if w]


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------------------- domain caps


def test_domain_cap_respects_cap_and_keeps_best(spark, sf_dir):
    out = q_domain_cap_sample(spark, sf_dir).toPandas()
    per_source = out.groupby("source").size()
    assert (per_source <= DOMAIN_CAP).all()
    # ranks are 1..n per source, no gaps
    for _, g in out.groupby("source"):
        assert sorted(g["rk"]) == list(range(1, len(g) + 1))
    # kept is exactly min(cap, n_source) per source, and any source that
    # hit the cap kept only docs at least as good (quality, -doc_id) as
    # every doc it left out — replayed via the full quality projection
    docs = _docs_pdf(spark, sf_dir)
    from topic_modeling_ajin_spark.operators.text_analysis import q_quality_score

    qall = {
        r["doc_id"]: r["quality"]
        for r in q_quality_score(spark, sf_dir).collect()
    }
    kept_ids = set(out["doc_id"])
    for src, g in docs.groupby("source"):
        kept = [d for d in g["doc_id"] if d in kept_ids]
        left = [d for d in g["doc_id"] if d not in kept_ids]
        assert len(kept) == min(DOMAIN_CAP, len(g))
        if not left:
            continue
        worst_kept = min((qall[d], -d) for d in kept)
        best_left = max((qall[d], -d) for d in left)
        assert best_left < worst_kept


# ---------------------------------------------------------------- DSIR


def _dsir_replay(docs: pd.DataFrame) -> dict[int, tuple[int, float]]:
    """Pure-Python replay: per-doc (n_feats, log_w round 6)."""
    feats: list[tuple[int, str, int]] = []
    for r in docs.itertuples():
        t = _toks(r.text)
        fs = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        for f in fs:
            feats.append((r.doc_id, r.lang, _md5_u32(f) % DSIR_BUCKETS))
    traw = len(feats)
    ttgt = sum(1 for _, lang, _ in feats if lang == DSIR_TARGET_LANG)
    craw: dict[int, int] = {}
    ctgt: dict[int, int] = {}
    for _, lang, b in feats:
        craw[b] = craw.get(b, 0) + 1
        if lang == DSIR_TARGET_LANG:
            ctgt[b] = ctgt.get(b, 0) + 1
    lw = {
        b: math.log((ctgt.get(b, 0) + 1) / (ttgt + DSIR_BUCKETS))
        - math.log((c + 1) / (traw + DSIR_BUCKETS))
        for b, c in craw.items()
    }
    out: dict[int, list] = {}
    for d, _, b in feats:
        acc = out.setdefault(d, [0, 0.0])
        acc[0] += 1
        acc[1] += lw[b]
    return {d: (n, round(w, 6)) for d, (n, w) in out.items()}


def test_dsir_logweights_match_python_replay(spark, sf_dir):
    docs = _docs_pdf(spark, sf_dir)
    expected = _dsir_replay(docs)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in q_dsir_logweights(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d][0] == expected[d][0], d
        assert abs(got[d][1] - expected[d][1]) < 1e-9, d


def test_dsir_select_is_gumbel_topk_of_logweights(spark, sf_dir):
    lw = {
        r["doc_id"]: r["log_w"]
        for r in q_dsir_logweights(spark, sf_dir).collect()
    }
    scored = sorted(
        (
            -(
                w
                - math.log(
                    -math.log(
                        (_md5_u32(f"dsir{d}") + 0.5) / 4294967296.0
                    )
                )
            ),
            d,
        )
        for d, w in lw.items()
    )
    expected = [d for _, d in scored[: min(DSIR_SELECT_K, len(scored))]]
    out = q_dsir_select(spark, sf_dir).orderBy("rk").collect()
    assert [r["doc_id"] for r in out] == expected
    assert [r["rk"] for r in out] == list(range(1, len(expected) + 1))


# ------------------------------------------------------- JS divergence


def test_source_js_divergence_bounds_and_replay(spark, sf_dir):
    out = q_source_js_divergence(spark, sf_dir).toPandas()
    docs = _docs_pdf(spark, sf_dir)
    sources = sorted(docs["source"].unique())
    n = len(sources)
    assert len(out) == n * (n - 1) // 2
    assert ((out["jsd"] >= -1e-9) & (out["jsd"] <= math.log(2) + 1e-9)).all()

    # replay: counts over the global top-JS_VOCAB vocab, per-source
    # renormalized, full-support JSD (missing words = zero prob)
    cnt: dict[str, int] = {}
    per: dict[tuple[str, str], int] = {}
    for r in docs.itertuples():
        for w in _toks(r.text):
            if len(w) < 2:
                continue
            cnt[w] = cnt.get(w, 0) + 1
            per[(r.source, w)] = per.get((r.source, w), 0) + 1
    vocab = [w for _, w in sorted(((-c, w) for w, c in cnt.items()))[:JS_VOCAB]]
    vset = set(vocab)
    dist: dict[str, dict[str, float]] = {}
    for s in sources:
        c = {w: per.get((s, w), 0) for w in vset}
        t = sum(c.values())
        dist[s] = {w: v / t for w, v in c.items() if v}
    for r in out.itertuples():
        p, q = dist[r.s1], dist[r.s2]
        jsd = 0.0
        for w in vset:
            pw, qw = p.get(w, 0.0), q.get(w, 0.0)
            m = (pw + qw) / 2
            if pw:
                jsd += 0.5 * pw * math.log(pw / m)
            if qw:
                jsd += 0.5 * qw * math.log(qw / m)
        assert abs(r.jsd - jsd) < 1e-6, (r.s1, r.s2)
        assert r.n_shared == len(set(p) & set(q))


# ------------------------------------------------- simplified silhouette


def test_simplified_silhouette_matches_numpy(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.clustering import (
        lloyd_fit,
        q_simplified_silhouette,
    )

    assigned, centroids = lloyd_fit(spark, sf_dir)
    rows = assigned.collect()
    ids = np.array([c for c, _ in centroids])
    C = np.array([v for _, v in centroids], dtype=np.float64)
    sums: dict[int, list] = {}
    for r in rows:
        x = np.array(r["emb"], dtype=np.float64)
        d = np.sqrt(((x[None, :] - C) ** 2).sum(axis=1))
        own = int(np.searchsorted(ids, r["cluster"]))
        a = d[own]
        d[own] = np.inf
        b = d.min()
        hi = max(a, b)
        s = (b - a) / hi if np.isfinite(b) and hi > 0 else 0.0
        acc = sums.setdefault(r["cluster"], [0, 0.0])
        acc[0] += 1
        acc[1] += s
    out = {r["cluster"]: r for r in q_simplified_silhouette(spark, sf_dir).collect()}
    assert set(out) == set(sums)
    for c, (n, tot) in sums.items():
        assert out[c]["n_members"] == n
        assert abs(out[c]["mean_silhouette"] - tot / n) < 1e-6


def test_domain_cap_salted_parity(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.selection import (
        q_domain_cap_salted,
    )

    base = sorted(
        map(tuple, q_domain_cap_sample(spark, sf_dir).collect())
    )
    salted = sorted(
        map(tuple, q_domain_cap_salted(spark, sf_dir).collect())
    )
    assert salted == base


def test_curated_dsir_select_is_topk_within_manifest(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.curation import (
        q_training_corpus_manifest,
    )
    from topic_modeling_ajin_spark.operators.selection import (
        q_curated_dsir_select,
    )

    curated = {r["doc_id"] for r in q_training_corpus_manifest(spark, sf_dir).collect()}
    lw = {
        r["doc_id"]: r["log_w"]
        for r in q_dsir_logweights(spark, sf_dir).collect()
        if r["doc_id"] in curated
    }
    scored = sorted(
        (
            -(w - math.log(-math.log((_md5_u32(f"dsir{d}") + 0.5) / 4294967296.0))),
            d,
        )
        for d, w in lw.items()
    )
    expected = [d for _, d in scored[: min(DSIR_SELECT_K, len(scored))]]
    out = q_curated_dsir_select(spark, sf_dir).orderBy("rk").collect()
    assert [r["doc_id"] for r in out] == expected
    assert all(r["doc_id"] in curated for r in out)
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))


def test_length_percentiles_match_numpy(spark, sf_dir):
    """Exact interpolated percentiles per source must equal numpy's
    linear-interpolation quantiles over the same integer lengths."""
    import numpy as np
    import re

    from topic_modeling_ajin_spark.operators.selection import (
        q_doc_length_percentiles_by_source,
    )

    tok = re.compile(r"[^a-z0-9가-힣]+")
    by_src: dict[str, list[int]] = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks = [w for w in tok.split((r["text"] or "").lower()) if w]
        by_src.setdefault(r["source"], []).append(len(toks))
    got = {
        r["source"]: r
        for r in q_doc_length_percentiles_by_source(spark, sf_dir).collect()
    }
    assert set(got) == set(by_src)
    for s, ns in by_src.items():
        a = np.array(ns, dtype=float)
        r = got[s]
        assert r["n_docs"] == len(ns)
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75), ("p95", 95)):
            assert abs(r[col] - round(float(np.percentile(a, q)), 6)) < 1e-9, (s, col)
        assert abs(r["mean_tokens"] - round(sum(ns) / len(ns), 6)) < 1e-9
