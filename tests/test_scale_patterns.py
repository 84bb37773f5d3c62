"""Scale-pattern tests: salted aggregation equivalence and bucketed
co-located joins (shuffle-free plan assertion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from topic_modeling_ajin_spark.plans import salted_agg, write_bucketed
from topic_modeling_ajin_spark.sources import load_table


def test_salted_agg_equals_direct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["cnt"], round(r["total"], 6))
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["cnt"], round(r["total"], 6))
        for r in salted_agg(e, "event_type", n_salt=16, sum_col="value").collect()
    }
    assert salted == direct


def test_salted_agg_deterministic_across_runs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, salted_agg(d, "lang").collect()))
    b = sorted(map(tuple, salted_agg(d, "lang").collect()))
    assert a == b  # xxhash64 salt, not rand(): reruns identical


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", "o_orderkey", 8, str(tmp_path / "b_orders"))
    write_bucketed(l, "b_lineitem", "l_orderkey", 8, str(tmp_path / "b_lineitem"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the bucketing (not a broadcast) is what
        # eliminates the exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.sum("l_quantity").alias("qty"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        # neither join input may re-shuffle: no Exchange below the join
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # sanity: same result as the plain parquet join
        direct = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, direct.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_is_pure_pushdown_scan(spark, sf_dir):
    """q6's range predicates must reach the parquet scan and the plan must
    contain no join and no wide shuffle — the scan + partial agg IS the query."""
    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan
    assert "Join" not in plan
    # only the final single-partition gather of partial sums
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan


def test_q5_snowflake_joins_all_broadcast(spark, sf_dir):
    """Every join in the q5 snowflake must be broadcast — a sort-merge join
    against region/nation/customer/supplier would shuffle the fact table."""
    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["q5_region_revenue"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_word_count_topk_has_no_global_sort(spark, sf_dir):
    """Top-k must compile to TakeOrderedAndProject (per-partition heaps),
    never a global Sort + Limit, and the scan must prune to the text column."""
    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["word_count"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<text:string>" in plan


def test_minhash_verify_broadcasts_candidates(spark, sf_dir):
    """The exact-Jaccard verification stage must broadcast the (tiny)
    LSH candidate set and intersect shingle arrays per row — never
    re-shuffle the corpus-sized shingle table on (doc_a, doc_b)."""
    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["minhash_lsh_pairs"].fn(spark, sf_dir))
    assert "array_intersect" in plan
    assert "BroadcastHashJoin" in plan


def test_plsa_fold_in_broadcasts_model(spark, sf_dir):
    """Fold-in must broadcast the K x V phi model into the evidence join
    (inference is embarrassingly parallel over docs); the held-out counts
    must never be shuffled on anything but doc-keyed aggregations."""
    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["plsa_fold_in"].fn(spark, sf_dir))
    # one broadcast of phi per fold-in round
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q11_plan_reuses_persisted_value_table(spark, sf_dir):
    """q11's part-sized value table must feed BOTH crossJoin sides from the
    persisted cache (ReuseExchange does not fire across them), and the
    1-row threshold must enter as a broadcast — never a shuffled join."""
    from topic_modeling_ajin_spark.registry import load_all

    df = load_all()["q11_important_stock"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan[:800]
    assert "BroadcastNestedLoopJoin" in plan
    # lineitem must be scanned at most once (the persisted subtree);
    # a second scan means the memo-persist regressed
    assert plan.count("file:") <= plan.count("InMemoryTableScan") + 4


def test_manifest_discard_side_broadcasts(spark, sf_dir):
    """The near-dup discard list is tiny: the manifest BASE JOIN's
    anti-join must broadcast it, not shuffle the doc-sized survivor
    stream. Pinned on _manifest_base — the plan that actually executes
    the gates; the registered query reads its localCheckpoint (r7)."""
    from topic_modeling_ajin_spark.operators.curation import _manifest_base

    plan = (
        _manifest_base(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "LeftAnti" in plan and "BroadcastExchange" in plan
    ), plan[:800]


def test_manifest_scans_persisted_filter_report(spark, sf_dir):
    """The round-6 perf fix pinned: the manifest base's keep-filter must
    read the persisted verdict table (InMemoryTableScan), not re-inline
    the staged token/ngram expression tree into the filter — losing the
    persist cost 113 s of 139 at sf0.1."""
    from topic_modeling_ajin_spark.operators.curation import _manifest_base
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_curation_filter_report,
    )

    q_curation_filter_report(spark, sf_dir)  # builds + registers the memo
    plan = (
        _manifest_base(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InMemoryTableScan" in plan


def test_manifest_composers_pay_no_giant_replan(spark, sf_dir):
    """r7 perf fix pinned: the REGISTERED manifest reads the memoized
    localCheckpoint — its plan is a small ExistingRDD scan, not the
    ~124k-line gate tree, so every composing query (strict/winnow/
    decontam manifests, curated_dsir_select) pays milliseconds of
    planning instead of ~5 s per action."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_training_corpus_manifest,
    )

    df = q_training_corpus_manifest(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan[:800]
    assert len(plan) < 20_000, len(plan)


def test_dsir_select_topk_and_broadcast_weights(spark, sf_dir):
    """DSIR resampling's global top-k must be TakeOrderedAndProject
    (per-partition heaps) and the bucket-weight table must broadcast —
    never a corpus-wide sort or a shuffled join on the weight side."""
    from topic_modeling_ajin_spark.operators.selection import q_dsir_select

    df = q_dsir_select(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_source_js_divergence_broadcasts_vocab(spark, sf_dir):
    """The vocabulary cut re-enters the per-source counts as a broadcast
    join; the only corpus-scaled exchange is the (source, word) count."""
    from topic_modeling_ajin_spark.operators.selection import (
        q_source_js_divergence,
    )

    df = q_source_js_divergence(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bm25_never_shuffles_full_postings(spark, sf_dir):
    """BM25's corpus-wide work must be ONE tokenize pass cut to query
    terms by a broadcast vocabulary filter BEFORE any aggregation — the
    full (doc_id, term) postings table must never shuffle, and no join
    may sort-merge. Since the r13 one-pass restructure the CUT postings
    are localCheckpointed at construction (corpus stats ride that same
    pass as observe metrics), so the returned plan reads the checkpoint
    (ExistingRDD) and never re-tokenizes the corpus; the idf and query
    joins remain model-sized broadcasts."""
    from topic_modeling_ajin_spark.operators.retrieval import q_bm25_topk

    plan = q_bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the broadcast vocab cut feeds the postings aggregation, not vice
    # versa: every hash aggregate keyed on term sits above the join
    assert "CartesianProduct" not in plan
    # the corpus pass happened once, at construction: the scoring plan
    # consumes the checkpointed cut postings, not a fresh corpus scan
    assert "ExistingRDD" in plan


def test_simhash16_is_shuffle_free(spark, sf_dir):
    """SimHash is a row-local function of each doc's own token array —
    the plan must contain no Exchange (the old explode + groupBy(doc_id)
    form shuffled every token row only to regroup rows that were never
    apart) and the fingerprint kernel must be the only Python node."""
    from topic_modeling_ajin_spark.operators.text_analysis import q_simhash16

    plan = (
        q_simhash16(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only allowed Exchange is parallelized()'s round-robin scan
    # fan-out; the old form's Exchange hashpartitioning(doc_id) — a
    # shuffle of every token row — must be gone
    assert "hashpartitioning" not in plan, plan[:800]
    assert "MapInPandas" in plan


def test_winnowing_window_is_doc_partitioned(spark, sf_dir):
    """Winnowing's sliding-min window must partition by doc_id (doc-local,
    no global window) and the pair stage must equi-join on the fingerprint
    value — never a cross join."""
    from topic_modeling_ajin_spark.operators.retrieval import (
        q_winnowing_overlap_pairs,
    )

    plan = (
        q_winnowing_overlap_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition(doc_id" in plan


def test_quality_panel_agreement_has_no_unpartitioned_window(spark, sf_dir):
    """r6 verdict task 2 pin: every rank window in the Spearman query
    must be partitioned (by the range-partition id) — the corpus never
    funnels through one WindowExec task."""
    from topic_modeling_ajin_spark.operators.quality_model import (
        q_quality_panel_agreement,
    )

    plan = (
        q_quality_panel_agreement(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_windows = plan.count("windowspecdefinition(")
    assert n_windows >= 1  # the per-partition cumsums
    assert n_windows == plan.count("windowspecdefinition(pid"), plan[:3000]


def test_winnowing_pairs_hot_guard_is_broadcast_anti_join(spark, sf_dir):
    """r6 verdict task 1 pin: the hot-fingerprint exclusion must compile
    to a broadcast LEFT ANTI join on fp (the hot list is tiny), and the
    pair stage stays an equi-join."""
    from topic_modeling_ajin_spark.operators.retrieval import (
        q_winnowing_overlap_pairs,
    )

    plan = (
        q_winnowing_overlap_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_strip_chunks_plan_is_doc_keyed(spark, sf_dir):
    """Chunk stripping must never globally sort or cross join: chunking
    is doc-local codegen, the offender join is keyed on the chunk md5,
    reassembly is a doc-keyed aggregate."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_strip_boilerplate_chunks,
    )

    plan = (
        q_strip_boilerplate_chunks(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition" not in plan  # no window at all


def test_doc_decontam_broadcasts_bench_side(spark, sf_dir):
    """The benchmark gram set is tiny by construction and must broadcast
    into the corpus probe — the corpus side never shuffles on the gram."""
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_doc_decontam,
    )

    plan = (
        q_doc_decontam(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_unbounded_rank_windows(spark, sf_dir):
    """zipf_fit / bpe_regex_tokens / collocations must take their global
    top-k with orderBy().limit(k) -> TakeOrderedAndProject (per-partition
    heaps) and only then re-rank the k survivors with a window. The
    Window node must therefore sit ABOVE the TakeOrderedAndProject in the
    physical plan — a Window whose input is the unbounded vocabulary /
    PMI-pair aggregate would print below it (and at 100 TB would sort
    10^8-10^9 rows in one task)."""
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    for name in ("zipf_fit", "bpe_regex_tokens", "collocations"):
        plan = _plan(reg[name].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, (name, plan[:800])
        assert "Window" in plan, (name, plan[:800])
        # tree prints root-first: the Window (re-rank of k survivors)
        # must appear before (= above) the TakeOrderedAndProject cut.
        assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name


def test_customer_quartiles_window_is_partitioned(spark, sf_dir):
    """r8 verdict task 1: customer_value_quartiles was the last
    unpartitioned ranking window (ntile(4) over the whole customer
    table — one task sorts everything at scale). The rewrite computes
    exact row numbers via the two-phase range-partitioned rank, so EVERY
    window spec in the plan must be partitioned by the range-partition
    id — an unpartitioned spec prints windowspecdefinition(<sort cols>)
    with no pid, a partitioned one leads with pid#."""
    import re

    from topic_modeling_ajin_spark.registry import load_all

    plan = _plan(load_all()["customer_value_quartiles"].fn(spark, sf_dir))
    spots = [m.end() for m in re.finditer(r"windowspecdefinition\(", plan)]
    assert spots, plan[:800]  # the row_number window must exist
    for at in spots:
        assert plan[at:].startswith("pid#"), plan[at - 30 : at + 60]


def test_range_partitioned_rank_equals_window_ntile(spark):
    """The two-phase range-partitioned exact rank + integer-DIV bucket
    expression must reproduce ntile(4) OVER (ORDER BY ...) bit-for-bit
    on adversarial inputs: N below the bucket count, N % 4 in every
    residue class, and heavy ties on the sort value (broken by the
    unique key, so the order stays total)."""
    from pyspark.sql import Window

    from topic_modeling_ajin_spark.operators.relational import (
        _range_partitioned_row_numbers,
    )

    for n, n_vals in ((1, 1), (3, 2), (4, 3), (5, 2), (23, 4), (97, 7)):
        rows = [(i, float((i * 7919) % n_vals)) for i in range(n)]
        df = spark.createDataFrame(rows, "k long, v double")
        ranked, total = _range_partitioned_row_numbers(
            df, [F.desc("v"), F.asc("k")], memo_key=("rank_prop", n, n_vals)
        )
        assert total == n
        q, r = divmod(n, 4)
        if q == 0:
            got = ranked.select("k", F.col("rn").cast("int").alias("b"))
        else:
            cut = r * (q + 1)
            got = ranked.select(
                "k",
                F.expr(
                    f"CAST(CASE WHEN rn <= {cut} THEN (rn - 1) DIV {q + 1} + 1 "
                    f"ELSE {r} + (rn - {cut} - 1) DIV {q} + 1 END AS INT)"
                ).alias("b"),
            )
        w = Window.orderBy(F.desc("v"), F.asc("k"))
        want = df.select("k", F.ntile(4).over(w).alias("b"))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), (n, n_vals)


# ---------------------------------------------------------------------------
# r9 verdict task 4: registry-WIDE plan-shape sweep. The per-query pins
# above only protect queries someone remembered to pin; this iterates
# EVERY registered query's executed plan and fails mechanically when a
# new registration ships a bad shape. The allowlists name the deliberate
# exceptions with their reasons — adding a name here is a conscious,
# reviewed act.

# Queries whose plan deliberately contains a BroadcastNestedLoopJoin:
# every entry broadcasts a BOUNDED side — a one-row scalar aggregate
# (the cross-join-a-total pattern), a K-bounded topic/centroid/plan
# table, the tiny benchmark split, or a top-k result — so the NL probe
# is O(rows x bounded) row-local work with no corpus shuffle.
BNLJ_ALLOW = {
    # one-row scalar broadcast (totals, fitted stats, thresholds)
    "analysis_summary", "ccnet_ppl_buckets", "cms_word_counts",
    "collocations", "daily_anomalies", "decontam_gap_report",
    "dsir_logweights", "dsir_select", "curated_dsir_select",
    "ewma_daily_events", "funnel_conversion", "mixture_plan",
    "mixture_sample", "mixture_sample_tokens",
    "mixture_temperature_plan", "mixture_temperature_plan_tokens",
    "mixture_policy_overlap", "dup_cluster_size_histogram",
    "dedup_savings_report", "mixture_token_fill_report",
    "ngram_lm_perplexity", "q11_important_stock",
    "q22_idle_rich_customers", "quality_panel",
    "quality_panel_agreement", "retrieval_overlap_eval",
    "source_distinctive_terms", "source_js_divergence",
    "source_quality_psi", "tokenizer_compare", "vocab_drift",
    # K-bounded topic/centroid/vocab side (K x K matrices, coherence
    # windows, keyword tables)
    "ctfidf_dedup_keywords", "ctfidf_keywords", "cv_coherence",
    "doc_topic_jaccard", "keyword_substr_filter", "npmi_coherence",
    "umass_coherence", "topic_cosine_similarity", "topic_diversity",
    "topic_info", "topic_jaccard_overlap", "topic_labels",
    "plsa_doc_topics", "plsa_fold_in", "plsa_topic_terms",
    # broadcast query/bench/codebook side of a similarity probe
    "ann_cosine_topk", "embed_ann_topk", "bm25_topk", "hard_negatives",
    "hybrid_rrf_topk", "ivf_cosine_topk", "ivf_recall_eval",
    "pq_adc_topk", "semantic_decontam", "semantic_decontam_full",
    "semdedup_recall_eval", "jaccard_threshold_sweep",
    # brute-force ground-truth side of the hash-fallback recall harness
    # — BOUNDED in code (r12 verdict task 2): the truth universe
    # refuses loudly over SEMDEDUP_RECALL_TRUTH_MAX_DOCS, and the
    # deterministic truth_sample_mod slice is the documented scale
    # path, recorded per run in n_truth_docs
    "semdedup_hash_recall_eval",
}

# Queries whose plan deliberately contains an UNPARTITIONED window with
# a bounded input (and no TakeOrderedAndProject cut below it):
UNPART_WINDOW_ALLOW = {
    # piece alphabet <= distinct chars + BPE_MERGES rows
    "bpe_piece_vocab",
    # calendar-grain daily series: rows bounded by #days in the corpus
    "ewma_daily_events",
}


def test_registry_wide_plan_shape_sweep(spark, sf_dir):
    """Every registered query's executed plan must be free of
    CartesianProduct, of BroadcastNestedLoopJoin (unless allowlisted
    with a bounded broadcast side), and of unpartitioned ranking
    windows (unless the plan takes a limit-k cut below the window, or
    the input is allowlisted as bounded). Allowlists must stay live:
    an entry naming no registered query fails too."""
    import re

    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    assert BNLJ_ALLOW <= set(reg), sorted(BNLJ_ALLOW - set(reg))
    assert UNPART_WINDOW_ALLOW <= set(reg), sorted(
        UNPART_WINDOW_ALLOW - set(reg)
    )

    def top_first_arg(s: str) -> str:
        depth, cur = 0, ""
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                break
            cur += ch
        return cur.strip()

    bad = []
    for name, spec in reg.items():
        plan = _plan(spec.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOW:
            bad.append((name, "BroadcastNestedLoopJoin"))
        unpart = any(
            " ASC" in top_first_arg(plan[m.end():])
            or " DESC" in top_first_arg(plan[m.end():])
            for m in re.finditer(r"windowspecdefinition\(", plan)
        )
        if unpart and name not in UNPART_WINDOW_ALLOW:
            cut_below = (
                "TakeOrderedAndProject" in plan
                and plan.index("Window") < plan.index("TakeOrderedAndProject")
            )
            if not cut_below:
                bad.append((name, "unpartitioned window"))
    assert not bad, bad


# --------------------------------------------------------------------------
# r10 verdict task 1 (the mechanical half): every FORCED F.broadcast in the
# package must have a boundedness justification here. A forced hint
# overrides Spark's size checks — if the build side turns out huge the job
# OOMs instead of degrading to a shuffle join — so it is only sound for
# tables whose size is a DESIGN GUARANTEE. Corpus-derived unbounded tables
# (word vocabularies, segmentation/id tables, discard lists, hot sets) must
# go through functions.joins.vocab_broadcast (size-aware: hint under the
# cap, plain shuffle join past it) or carry no hint at all (AQE decides
# from true runtime size). Keys are (file relative to the package, the
# broadcast argument's exact source text); the scan is AST-based so
# formatting differences don't split sites. Both directions fail: a new
# un-allowlisted F.broadcast AND a stale entry naming a site that no
# longer exists.

BROADCAST_ALLOW: dict[tuple[str, str], str] = {
    ("functions/joins.py", "vocab"):
        "the size-aware helper itself — hint applied only under the cap",
    ("operators/bpe.py", "piece_vocab(spark, sf_dir)"):
        "piece alphabet: <= distinct corpus characters + BPE_MERGES rows",
    ("operators/clustering.py", "cb"):
        "PQ codebook: PQ_SUB x 2^PQ_BITS rows by construction",
    ("operators/clustering.py", "cent"):
        "K-row centroid table (model-sized)",
    ("operators/clustering.py",
     "qres.select('query_id', 'coarse', F.slice('qres', m * PQ_SUB + 1,"
     " PQ_SUB).alias('q_sub'))"):
        "N_QUERIES-bounded query side of the ADC probe",
    ("operators/clustering.py", "qs"):
        "N_QUERIES-bounded query side",
    ("operators/curation.py", "budgets"):
        "per-language token budgets: K_langs rows",
    ("operators/curation.py", "m"):
        "one-row total_max aggregate",
    ("operators/curation.py", "plan"):
        "K_langs-row mixture plan",
    ("operators/curation.py", "tots"):
        "one-row totals aggregate",
    ("operators/curation.py", "tw"):
        "MIX_TARGETS constant table",
    ("operators/dedup.py", "bands"):
        "MINHASH_BANDS-row constant band table",
    ("operators/dedup.py", "bench"):
        "benchmark split: tiny by construction (a benchmark, not a corpus)",
    ("operators/dedup.py", "cand"):
        "LSH candidate pairs: band-join output, hot-bucket-capped",
    ("operators/dedup.py", "cent"):
        "K-row centroid table",
    ("operators/dedup.py", "covered"):
        "one-row coverage aggregate",
    ("operators/dedup.py", "hbench"):
        "hash-encoded benchmark split (tiny by construction)",
    ("operators/encoding.py", "q"):
        "ANN_QUERIES-bounded query side",
    ("operators/events.py", "stats"):
        "one-row fitted stats",
    ("operators/frequency.py", "cells"):
        "CMS sketch: CMS_DEPTH x CMS_WIDTH cells by construction",
    ("operators/frequency.py", "rows"):
        "CMS_DEPTH-row range",
    ("operators/metrics.py", "kw"):
        "K-topic keyword table (K x TOP_K rows)",
    ("operators/metrics.py", "labs.select(F.col('label').alias('j'))"):
        "K-row label list",
    ("operators/metrics.py", "norms"):
        "K-row per-topic norms",
    ("operators/metrics.py", "sizes"):
        "K-row per-topic sizes",
    ("operators/metrics.py", "t_total"):
        "one-row total",
    ("operators/plsa.py", "zs"):
        "K-row topic range",
    ("operators/quality_model.py", "ab"):
        "PSI_BINS-row calibration bins",
    ("operators/quality_model.py",
     "ab.sparkSession.range(PSI_BINS).select(F.col('id').cast('bigint')"
     ".alias('bin'))"):
        "PSI_BINS-row range",
    ("operators/quality_model.py", "atot"):
        "one-row total",
    ("operators/quality_model.py", "off_df"):
        "per-partition offsets: one row per shuffle partition",
    ("operators/relational.py", "ab"):
        "one-row avg-balance aggregate",
    ("operators/relational.py", "c"):
        "TPC-H customer dim (SF-bounded dimension, standard broadcast)",
    ("operators/relational.py", "mx"):
        "one-row max-revenue aggregate",
    ("operators/relational.py", "n"):
        "TPC-H nation dim: 25 rows",
    ("operators/relational.py", "nc"):
        "TPC-H nation projection: 25 rows",
    ("operators/relational.py", "ns"):
        "TPC-H nation projection: 25 rows",
    ("operators/relational.py", "off_df"):
        "per-partition offsets: one row per range partition",
    ("operators/relational.py", "p"):
        "TPC-H part dim (SF-bounded dimension)",
    ("operators/relational.py", "r"):
        "TPC-H region dim: 5 rows",
    ("operators/relational.py", "s"):
        "TPC-H supplier dim (SF-bounded dimension)",
    ("operators/relational.py", "s.select('s_suppkey')"):
        "TPC-H supplier key projection",
    ("operators/relational.py", "tot"):
        "one-row total",
    ("operators/retrieval.py", "idf"):
        "query-vocab idf: bounded by the query set's distinct terms",
    ("operators/retrieval.py", "qterm"):
        "query-term table: bounded by the query set",
    ("operators/retrieval.py", "qvocab"):
        "query vocabulary: bounded by the query set",
    ("operators/selection.py", "tots"):
        "one-row totals",
    ("operators/selection.py", "vocab"):
        "top-JS_VOCAB limit cut (explicit limit-k)",
    ("operators/selection.py", "w"):
        "DSIR bucket weights: 2^DSIR_BUCKETS_LOG2 rows by construction",
    ("operators/similarity.py", "centers_df"):
        "K-row centroid table",
    ("operators/similarity.py", "centv"):
        "K-row centroid table",
    ("operators/similarity.py", "q"):
        "N_QUERIES-bounded query side",
    ("operators/text_analysis.py", "bench"):
        "benchmark gram set (tiny by construction)",
    ("operators/text_analysis.py", "btot"):
        "one-row total",
    ("operators/text_analysis.py", "counts.withColumnRenamed('word', 'dst')"):
        "top-TEXTRANK_VOCAB limit cut (explicit limit-k)",
    ("operators/text_analysis.py", "counts.withColumnRenamed('word', 'src')"):
        "top-TEXTRANK_VOCAB limit cut (explicit limit-k)",
    ("operators/text_analysis.py", "tot"):
        "one-row total",
    ("operators/text_analysis.py", "tots"):
        "one-row totals",
    ("operators/text_analysis.py", "ua"):
        "per-side unigram totals over the DRIFT_VOCAB cut",
    ("operators/text_analysis.py", "ub"):
        "per-side unigram totals over the DRIFT_VOCAB cut",
    ("operators/text_analysis.py", "vocab"):
        "one-row countDistinct aggregate",
    ("operators/topics.py", "a"):
        "one-row average-mass aggregate",
    ("operators/topics.py", "centv"):
        "K-row centroid table",
    ("operators/topics.py", "ct"):
        "K-row class-mass table",
    ("operators/topics.py", "vocab_df"):
        "LDA term index: bounded by the vectorizer's df-pruned vocab "
        "(doc_frequency_pruning gates it)",
    ("operators/unigram_lm.py", "tot"):
        "one-row total",
    ("streaming/pipelines.py",
     "batch_side.groupBy(key).agg(F.count('*').alias('cb'))"):
        "micro-batch-side key counts (bounded by the trigger batch)",
    ("streaming/pipelines.py", "bench_grams"):
        "benchmark gram set (tiny by construction)",
    ("streaming/pipelines.py", "me"):
        "micro-batch probe side (bounded by the trigger batch; the store "
        "is probed in place, never shuffled)",
    ("streaming/pipelines.py", "plan"):
        "K_langs-row mixture plan",
    ("streaming/pipelines.py", "vec_me"):
        "micro-batch probe side (bounded by the trigger batch)",
}


def _broadcast_sites() -> set[tuple[str, str]]:
    """AST scan of the package for F.broadcast(...) call sites, keyed by
    (relative file, exact source text of the broadcast argument)."""
    import ast
    import pathlib

    import topic_modeling_ajin_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    sites: set[tuple[str, str]] = set()
    for p in sorted(root.rglob("*.py")):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
            ):
                arg = ast.unparse(node.args[0]) if node.args else ""
                sites.add((str(p.relative_to(root)), arg))
    return sites


def test_no_unjustified_forced_broadcasts():
    """Every forced F.broadcast call site in the package must carry a
    boundedness reason in BROADCAST_ALLOW (new sites fail until someone
    consciously justifies the build side's size guarantee), and the
    allowlist must stay live (an entry naming a vanished site fails so
    reasons can't rot). Corpus-unbounded sides belong in
    vocab_broadcast or unhinted AQE joins, not here."""
    sites = _broadcast_sites()
    allowed = set(BROADCAST_ALLOW)
    new = sorted(sites - allowed)
    stale = sorted(allowed - sites)
    assert not new, (
        "forced F.broadcast with no boundedness justification "
        f"(use vocab_broadcast or drop the hint): {new}"
    )
    assert not stale, f"stale BROADCAST_ALLOW entries: {stale}"
    assert all(r.strip() for r in BROADCAST_ALLOW.values())


def test_vocab_broadcast_is_size_aware(spark):
    """vocab_broadcast must FORCE a broadcast under the cap and drop the
    hint past it. With autoBroadcastJoinThreshold disabled, the only way
    a BroadcastHashJoin can appear is the explicit hint — so under-cap
    shows one and past-cap must not (the join degrades to a shuffle
    join instead of a potential OOM)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.functions.joins import vocab_broadcast

    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    vocab = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .persist()
    )
    vocab.count()
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        hinted = big.join(vocab_broadcast(vocab, cap=100), "k")
        hinted.count()
        plan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:600]

        unhinted = big.join(vocab_broadcast(vocab, cap=5), "k")
        unhinted.count()
        plan = unhinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:600]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )


# ---------------------------------------------------------------------------
# limit(k) lint (r11 verdict task 2): a .limit whose k is computed from a
# corpus count is a corpus-PROPORTIONAL top-k — TakeOrderedAndProject
# merges k rows on the driver and Catalyst trusts the limit's tiny size
# estimate enough to auto-broadcast the result, so at 100 TB a
# limit(floor(frac * N)) is a guaranteed driver OOM (the r11 curriculum
# cut). Every .limit in the package must therefore take a CONSTANT
# (an int literal or an UPPERCASE module constant expression); anything
# else needs a reasoned allowlist entry, and entries naming vanished
# sites fail so reasons can't rot.

LIMIT_ALLOW: dict[tuple[str, str], str] = {
    ("plots.py", "limit + 1"): (
        "caller-supplied row cap defaulting to MAX_ROWS=10k — plot sinks "
        "are row-capped by design and raise past the cap"
    ),
    ("operators/selection.py", "k"): (
        "function parameter; the registered face passes the "
        "DSIR_SELECT_K module constant, never a corpus count"
    ),
    ("operators/frequency.py", "top_n"): (
        "function parameter; registered faces pass module constants "
        "(top-k report sizes), never a corpus count"
    ),
}


def _limit_sites() -> set[tuple[str, str]]:
    """AST scan of the package for DataFrame .limit(...) call sites whose
    argument is NOT a compile-time constant expression (int literal or
    arithmetic over UPPERCASE module constants), keyed by (relative
    file, exact source text of the limit argument)."""
    import ast
    import pathlib

    import topic_modeling_ajin_spark as pkg

    def is_constant_expr(node: ast.AST) -> bool:
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and not sub.id.isupper():
                return False
            if isinstance(sub, ast.Call):
                return False
            if isinstance(sub, ast.Attribute):
                return False
        return True

    root = pathlib.Path(pkg.__file__).parent
    sites: set[tuple[str, str]] = set()
    for p in sorted(root.rglob("*.py")):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "limit"
                and node.args
                and not is_constant_expr(node.args[0])
            ):
                sites.add(
                    (str(p.relative_to(root)), ast.unparse(node.args[0]))
                )
    return sites


def test_no_corpus_proportional_limits():
    """Every non-constant .limit(k) call site in the package must carry
    a boundedness reason in LIMIT_ALLOW (a k derived from a corpus
    count() fails until someone consciously justifies it — the honest
    fix is a threshold/rank cut, e.g. _range_partitioned_row_numbers),
    and the allowlist must stay live: entries naming vanished sites
    fail so reasons can't rot."""
    sites = _limit_sites()
    allowed = set(LIMIT_ALLOW)
    new = sorted(sites - allowed)
    stale = sorted(allowed - sites)
    assert not new, (
        "non-constant .limit(k) with no boundedness justification — a "
        "corpus-proportional k is a driver OOM at scale; cut by "
        f"rank/threshold instead (see curriculum_phase_assignments): {new}"
    )
    assert not stale, f"stale LIMIT_ALLOW entries: {stale}"
    assert all(r.strip() for r in LIMIT_ALLOW.values())


def test_curriculum_cut_has_no_corpus_proportional_topk(spark, sf_dir):
    """r11 verdict task 2: the curriculum anneal cut must NOT compile to
    TakeOrderedAndProject(k = frac x N) + a broadcast of that k-row
    membership (a driver-side merge of ~20% of all manifest rows and an
    auto-broadcast Catalyst only allows because it trusts the limit's
    size estimate). The rank comes from the range-partitioned two-phase
    row-number instead: no TakeOrderedAndProject, no global-order Sort
    feeding a Limit, and the only window is partitioned on pid."""
    from topic_modeling_ajin_spark.registry import load_all

    df = load_all()["curriculum_phase_assignments"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" not in plan, plan[:800]
    assert "GlobalLimit" not in plan, plan[:800]


def test_vocab_broadcast_warns_on_unpersisted_lineage(spark, sf_dir):
    """r11 ADVICE: vocab_broadcast's cheap-count contract ('callers hand
    in persisted or checkpointed tables') is enforced, not assumed — an
    input whose sizing count would recompute a real lineage (the r10
    scale-killer shape: an unpersisted aggregation straight off a raw
    scan) warns loudly, while the call-site idioms (a thin
    filter/select over a persisted or checkpointed table, a plain file
    scan, an aggregate whose leaves are all cached or literal, or an
    explicit n_rows) stay silent."""
    import warnings

    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.functions.joins import vocab_broadcast
    from topic_modeling_ajin_spark.sources import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # aggregation over an unpersisted raw-scan lineage: the count re-runs it
    expensive = base.groupBy("lang").count()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        vocab_broadcast(expensive)
        assert any("recompute" in str(x.message) for x in w)

    # persisted parent + thin filter/select: silent
    cached = expensive.persist()
    cached.count()
    try:
        thin = cached.filter(F.col("count") >= 0).select("lang")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vocab_broadcast(thin)
            assert not w, [str(x.message) for x in w]
        # real work whose every leaf is the cache (the plsa/topics
        # idiom: an aggregation over a persisted table) — the count is
        # a cache scan, silent
        agg_over_cache = cached.groupBy("lang").agg(
            F.count("*").alias("n")
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vocab_broadcast(agg_over_cache)
            assert not w, [str(x.message) for x in w]
        # explicit n_rows: silent regardless of lineage
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vocab_broadcast(expensive, n_rows=5)
            assert not w, [str(x.message) for x in w]
    finally:
        cached.unpersist()

    # localCheckpoint bottoms out in LogicalRDD: silent
    ckpt = base.localCheckpoint()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        vocab_broadcast(ckpt.select("doc_id"))
        assert not w, [str(x.message) for x in w]
