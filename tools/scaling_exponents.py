"""Measured runtime-vs-rows scaling exponents (r9 verdict task 7).

SCALE.md claims near-linearity for the flagship chains; this harness
MEASURES it instead of asserting it: each representative headliner runs
COLD (all memos and cached tables cleared before every timed run) at
every available scale factor, and the reported exponent is the
least-squares slope of log(runtime) vs log(primary-table rows) over the
distinct input sizes (sf0.001 and sf0.01 share the 500-row documents
table, so documents-based queries contribute two distinct points:
500 -> 5000 rows).

Interpretation: a genuinely linear distributed chain measures BELOW 1.0
at these sizes (fixed per-job scheduling amortizes as data grows); a
quadratic pair join measures well above. The cap (1.4 for every claimed
near-linear chain) leaves headroom for timing noise while failing a
superlinear regression mechanically.

Usage:
    python tools/scaling_exponents.py            # all claimed queries
    python tools/scaling_exponents.py word_count # subset

Prints one table row per query and exits 1 if any exponent exceeds its
cap — the CI form of SCALE.md's linearity claims.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)

# query -> (primary table, exponent cap). All five are documents-driven;
# every one is claimed near-linear in SCALE.md (the LSH guard, the
# broadcast-vocab BM25 cut, the gate-ladder manifest, pointer-jumping CC).
CLAIMS: dict[str, tuple[str, float]] = {
    "word_count": ("documents", 1.4),
    "minhash_lsh_pairs": ("documents", 1.4),
    "bm25_topk": ("documents", 1.4),
    "training_corpus_manifest": ("documents", 1.4),
    "dedup_components": ("documents", 1.4),
    # r10 verdict tasks 5/8: the guard's linearity claim (hot-shingle-
    # routed exact-Jaccard pair stage) and the r10 chains whose cold
    # bench entries regressed — pinned here so drift fails mechanically
    "near_dup_discard": ("documents", 1.4),
    "doc_token_ids": ("documents", 1.4),
    "training_corpus_manifest_stripped": ("documents", 1.4),
    "training_corpus_manifest_tokens": ("documents", 1.4),
    # r11 verdict task 6: the QM-family cold entries spiked 3-4x in the
    # r11 driver bench with quality_model.py untouched — pinned here so
    # a REAL superlinear regression in the training/scoring chain fails
    # mechanically instead of being argued from contended bench medians
    "quality_model_score": ("documents", 1.4),
    "curation_funnel_by_source": ("documents", 1.4),
}


def stage_attribution(sf_dir: str, runs: int = 1, spark=None) -> dict:
    """Per-stage COLD timing for the stripped/tokens manifest chains
    (r10 verdict task 5 — attribute the cold regressions line by line):
    times, with caches cleared before each stage group,

      1. bpe_fit        — the 12-round merge training (driver-coordinated
                          jobs; the dominant irreducible cold cost),
      2. strip_table    — chunk fingerprinting + boilerplate strip
                          (_strip_chunks) given a warm BPE fit,
      3. stripped_rest  — the stripped manifest's remaining composition
                          given warm fit + strip (re-budget + gate joins),
      4. tokens_rest    — the token-budget manifest's remaining
                          composition given a warm fit.

    Within one session the BPE fit is memoized and therefore SHARED by
    the stripped and tokens chains — the double-pay only exists in
    harnesses that clear caches between queries (the driver bench); the
    numbers here say how much of each cold entry is the shared fit."""
    import time as _time

    from topic_modeling_ajin_spark.cache import clear_caches
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.session import get_spark

    reg = load_all()
    spark = spark or get_spark("scaling")
    spark.range(1).count()

    def cold(fn) -> float:
        clear_caches(spark)
        spark.catalog.clearCache()
        t0 = _time.perf_counter()
        fn()
        return _time.perf_counter() - t0

    def warm(fn) -> float:
        t0 = _time.perf_counter()
        fn()
        return _time.perf_counter() - t0

    from topic_modeling_ajin_spark.operators.bpe import _bpe_fit
    from topic_modeling_ajin_spark.operators.curation import _strip_chunks

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    out = {}
    out["bpe_fit"] = cold(lambda: _bpe_fit(spark, sf_dir))
    out["strip_table"] = warm(
        lambda: noop(_strip_chunks(spark, sf_dir)[1])
    )
    out["stripped_rest"] = warm(
        lambda: noop(
            reg["training_corpus_manifest_stripped"].fn(spark, sf_dir)
        )
    )
    out["tokens_rest"] = warm(
        lambda: noop(reg["training_corpus_manifest_tokens"].fn(spark, sf_dir))
    )
    out["stripped_cold_total"] = cold(
        lambda: noop(
            reg["training_corpus_manifest_stripped"].fn(spark, sf_dir)
        )
    )
    out["tokens_cold_total"] = cold(
        lambda: noop(reg["training_corpus_manifest_tokens"].fn(spark, sf_dir))
    )

    # quality-model family (r11 verdict task 6 — the QM cold entries
    # moved 3-4x in the r11 driver bench with quality_model.py untouched;
    # attribute the chain instead of assuming harness ordering):
    #   qm_fit        — logistic fit: ~60 deterministic gradient steps,
    #                   each ONE row of QM_DIM gradient sums over the
    #                   persisted feature table (driver-coordinated),
    #   qm_score_rest — quality_model_score given a warm fit (one
    #                   scoring scan of the memoized features),
    #   panel_rest    — quality_panel given warm fit+score (heuristic +
    #                   trained + LM perplexity joins),
    #   funnel_src_rest — curation_funnel_by_source given the warm gate
    #                   stack (the funnel flag join + rollup only).
    from topic_modeling_ajin_spark.operators.quality_model import _qm_fit

    out["qm_fit"] = cold(lambda: _qm_fit(spark, sf_dir))
    out["qm_score_rest"] = warm(
        lambda: noop(reg["quality_model_score"].fn(spark, sf_dir))
    )
    out["panel_rest"] = warm(
        lambda: noop(reg["quality_panel"].fn(spark, sf_dir))
    )
    out["qm_score_cold_total"] = cold(
        lambda: noop(reg["quality_model_score"].fn(spark, sf_dir))
    )
    out["panel_cold_total"] = cold(
        lambda: noop(reg["quality_panel"].fn(spark, sf_dir))
    )
    out["funnel_src_cold_total"] = cold(
        lambda: noop(reg["curation_funnel_by_source"].fn(spark, sf_dir))
    )
    out["funnel_src_rest"] = warm(
        lambda: noop(reg["curation_funnel_by_source"].fn(spark, sf_dir))
    )

    # hash-fallback semantic chain (r12 verdict task 7 — the fallback
    # work was priced only inside the manifest-family cold totals;
    # attribute it per step so a cold delta decomposes mechanically):
    #   hash_vectors      — cold build of the fallback vector table
    #                       (tail anti-join + hash embed + derived-width
    #                       sign buckets; empty on SFs whose embeddings
    #                       cover every doc — sf0.1's real 3,000-doc
    #                       tail is the measurement target),
    #   hash_bucket_stats — the hot-bucket guard aggregate over the
    #                       warm vector table (<= 2^bits rows),
    #   sdf_rest          — semantic_dedup_full given warm fallback
    #                       vectors (table-space verdict + the bucketed
    #                       dominance join),
    #   hash_recall_rest  — the recall harness's brute-force truth side
    #                       given warm vectors,
    #   tau_sweep_rest    — the operating-point sweep given warm
    #                       vectors (one bucket-bounded pair join).
    from topic_modeling_ajin_spark.operators.dedup import (
        _hash_fallback_vectors,
    )

    out["hash_vectors"] = cold(
        lambda: noop(_hash_fallback_vectors(spark, sf_dir))
    )
    out["hash_bucket_stats"] = warm(
        lambda: _hash_fallback_vectors(spark, sf_dir)
        .filter("bucket IS NOT NULL")
        .groupBy("bucket")
        .count()
        .collect()
    )
    out["sdf_rest"] = warm(
        lambda: noop(reg["semantic_dedup_full"].fn(spark, sf_dir))
    )
    out["hash_recall_rest"] = warm(
        lambda: noop(reg["semdedup_hash_recall_eval"].fn(spark, sf_dir))
    )
    out["tau_sweep_rest"] = warm(
        lambda: noop(reg["semdedup_hash_tau_sweep"].fn(spark, sf_dir))
    )
    out["sdf_cold_total"] = cold(
        lambda: noop(reg["semantic_dedup_full"].fn(spark, sf_dir))
    )
    return {k: round(v, 2) for k, v in out.items()}


def _rows(spark, sf_dir: str, table: str) -> int:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet").count()


def measure_cold(spark, fn, sf_dir: str, runs: int) -> float:
    """Median cold runtime: every run clears all memos and cached tables
    first, then executes fully through the no-op sink (the bench.py
    convention — no collect() discount)."""
    from topic_modeling_ajin_spark.cache import clear_caches

    ts = []
    for _ in range(runs):
        clear_caches(spark)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    s = sorted(ts)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def exponent(points: list[tuple[int, float]]) -> float:
    """Least-squares slope of log(t) vs log(n) over DISTINCT sizes; same-
    size points (the shared 500-row documents table) are merged by median
    before the fit."""
    by_n: dict[int, list[float]] = {}
    for n, t in points:
        by_n.setdefault(n, []).append(t)
    xs, ys = [], []
    for n, ts in sorted(by_n.items()):
        s = sorted(ts)
        m = len(s)
        med = s[m // 2] if m % 2 else (s[m // 2 - 1] + s[m // 2]) / 2
        xs.append(math.log(n))
        ys.append(math.log(max(med, 1e-9)))
    if len(xs) < 2:
        raise ValueError("need >= 2 distinct input sizes to fit a slope")
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


def run(names: list[str] | None = None, runs: int = 3, spark=None) -> dict:
    """Measure exponents for ``names`` (default: every CLAIMS entry).
    Returns {name: {"exponent": e, "cap": cap, "times": {sf: sec}}}."""
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.session import get_spark

    reg = load_all()
    spark = spark or get_spark("scaling")
    # absorb per-cluster startup (codegen, parquet reader, noop sink)
    spark.range(1).count()
    out: dict[str, dict] = {}
    for name in names or list(CLAIMS):
        table, cap = CLAIMS[name]
        pts, times = [], {}
        for sf_dir in SF_DIRS:
            n = _rows(spark, sf_dir, table)
            t = measure_cold(spark, reg[name].fn, sf_dir, runs)
            pts.append((n, t))
            times[os.path.basename(sf_dir)] = round(t, 3)
        out[name] = {
            "exponent": round(exponent(pts), 3),
            "cap": cap,
            "times": times,
        }
    return out


def main() -> None:
    if sys.argv[1:2] == ["--stages"]:
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF_DIRS[-1]
        res = stage_attribution(sf_dir)
        for k, v in res.items():
            print(f"{k:22s} {v:8.2f} s")
        return
    names = sys.argv[1:] or None
    if names:
        unknown = [n for n in names if n not in CLAIMS]
        if unknown:
            raise SystemExit(
                f"unknown query name(s) {unknown}; "
                f"claimed queries: {sorted(CLAIMS)}"
            )
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    res = run(names, runs=runs)
    bad = []
    print(f"{'query':35s} {'exponent':>8s} {'cap':>5s}  times (cold median)")
    for name, r in res.items():
        flag = ""
        if r["exponent"] > r["cap"]:
            bad.append(name)
            flag = "  <-- SUPERLINEAR"
        print(
            f"{name:35s} {r['exponent']:8.3f} {r['cap']:5.1f}  "
            f"{r['times']}{flag}"
        )
    if bad:
        raise SystemExit(
            f"superlinear exponent on claimed-near-linear queries: {bad}"
        )


if __name__ == "__main__":
    main()
