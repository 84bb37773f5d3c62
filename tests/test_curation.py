"""Curation-operator invariants: packing conservation + no global sort,
chunk coverage, sampling determinism, shard balance, mixture feasibility,
redaction completeness."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from topic_modeling_ajin_spark.operators.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    MIX_TARGETS,
    N_SHARDS,
    PACK_BUDGET,
    q_chunk_documents,
    q_mixture_plan,
    q_pack_sequences,
    q_pii_redact,
    q_shuffle_shards,
    q_stratified_sample,
)
from topic_modeling_ajin_spark.functions import text as TX
from topic_modeling_ajin_spark.sources import load_table


def _total_tokens(spark, sf_dir) -> int:
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.sum(F.size(TX.word_tokens("text"))).alias("t")).first()["t"]


def test_pack_sequences_conserves_tokens_and_orders_packs(spark, sf_dir):
    rows = q_pack_sequences(spark, sf_dir).orderBy("pack_id").collect()
    assert sum(r["n_tokens"] for r in rows) == _total_tokens(spark, sf_dir)
    # packs partition the doc_id axis into ordered, non-overlapping ranges
    for prev, cur in zip(rows, rows[1:]):
        assert prev["last_doc"] < cur["first_doc"]
    assert sum(r["n_docs"] for r in rows) == load_table(spark, sf_dir, "documents").count()


def test_pack_sequences_plan_has_no_global_sort_partition(spark, sf_dir):
    df = q_pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the two-phase prefix sum must not fall back to a single-partition
    # global window (the thing that dies at 100 TB)
    assert "SinglePartition" not in plan, plan[:2000]


def test_chunk_documents_covers_every_token_once_per_stride(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(TX.word_tokens("text")).alias("n")
    )
    n_by_doc = {r["doc_id"]: r["n"] for r in d.collect()}
    chunks = q_chunk_documents(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in n_by_doc.items():
        if n == 0:
            assert doc_id not in by_doc
            continue
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # one chunk per stride start, each capped at CHUNK_SIZE
        starts = list(range(0, n, CHUNK_STRIDE))
        assert len(rows) == len(starts)
        for r, s in zip(rows, starts):
            assert r["n_tokens"] == min(CHUNK_SIZE, n - s)


def test_stratified_sample_is_deterministic_and_monotone(spark, sf_dir):
    a = sorted(r["doc_id"] for r in q_stratified_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q_stratified_sample(spark, sf_dir).collect())
    assert a == b
    # rate 1.0 language keeps everything
    d = load_table(spark, sf_dir, "documents")
    n_en = d.filter(F.col("lang") == "en").count()
    kept = q_stratified_sample(spark, sf_dir)
    assert kept.filter(F.col("lang") == "en").count() == n_en


def test_shuffle_shards_partition_all_docs(spark, sf_dir):
    rows = q_shuffle_shards(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == load_table(spark, sf_dir, "documents").count()
    assert all(0 <= r["shard"] < N_SHARDS for r in rows)
    assert sum(r["n_tokens"] for r in rows) == _total_tokens(spark, sf_dir)


def test_mixture_plan_is_feasible_and_tight(spark, sf_dir):
    rows = {r["lang"]: r for r in q_mixture_plan(spark, sf_dir).collect()}
    assert set(rows) == {l for l, _ in MIX_TARGETS}
    for r in rows.values():
        assert 0 < r["keep_rate"] <= 1.0 + 1e-9
        assert r["n_keep"] <= r["n_docs"]
    # the binding language is kept (nearly) whole: total_max = n/w there
    assert any(abs(r["keep_rate"] - 1.0) < 1e-6 for r in rows.values())


def test_pii_redact_leaves_no_digits(spark, sf_dir):
    rows = q_pii_redact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not re.search(r"[0-9]", r["redacted"])
        assert r["n_redactions"] >= 1  # every props payload carries a number


def test_mixture_sample_matches_plan_counts(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.curation import q_mixture_sample

    plan = {
        r["lang"]: r
        for r in q_mixture_plan(spark, sf_dir).collect()
    }
    sampled = {
        r["lang"]: r["n"]
        for r in q_mixture_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # only (and all) plan languages appear
    assert set(sampled) <= set(plan)
    for lang, p in plan.items():
        n_lang, rate, n_keep = p["n_docs"], p["keep_rate"], p["n_keep"]
        got = sampled.get(lang, 0)
        if rate >= 1.0:
            # the binding language keeps everything — exact
            assert got == n_lang == n_keep
        else:
            # Binomial(n_lang, rate): 4-sigma band around the target
            sigma = (n_lang * rate * (1 - rate)) ** 0.5
            assert abs(got - n_keep) <= max(5.0, 4 * sigma), (lang, got, n_keep)

    # rerun-stability: the sample is a pure function of doc_id
    again = {
        r["lang"]: r["n"]
        for r in q_mixture_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == sampled


def test_manifest_ships_only_semdedup_keepers(spark, sf_dir):
    """r5 verdict task 1 pin: every shipped doc_id must be kept=1 in
    semantic_dedup — the manifest may not ship a paraphrase duplicate —
    and the gate must actually bite (at least one doc that passes every
    OTHER gate is dropped by the semantic one)."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_training_corpus_manifest,
    )
    from topic_modeling_ajin_spark.operators.dedup import q_semantic_dedup

    sem = {
        r["vec_id"]: r["kept"]
        for r in q_semantic_dedup(spark, sf_dir).collect()
    }
    shipped = [
        r["doc_id"] for r in q_training_corpus_manifest(spark, sf_dir).collect()
    ]
    assert shipped and all(sem[d] == 1 for d in shipped)


def test_strict_manifest_is_boilerplate_free_subset(spark, sf_dir):
    """The strict variant = base manifest minus doc_boilerplate-flagged
    docs, nothing else."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_doc_boilerplate,
        q_training_corpus_manifest,
        q_training_corpus_manifest_strict,
    )

    base = {r["doc_id"] for r in q_training_corpus_manifest(spark, sf_dir).collect()}
    strict = {
        r["doc_id"]
        for r in q_training_corpus_manifest_strict(spark, sf_dir).collect()
    }
    flagged = {
        r["doc_id"]
        for r in q_doc_boilerplate(spark, sf_dir).filter("flagged").collect()
    }
    assert strict == base - flagged


def test_doc_boilerplate_counts_match_chunk_table(spark, sf_dir):
    """shared_ratio is n_shared/n_chunks over the memoized chunk table;
    n_shared counts occurrences of cross-document chunks."""
    from topic_modeling_ajin_spark.operators.curation import (
        _doc_chunk_hashes,
        q_chunk_dedup,
        q_doc_boilerplate,
    )

    ch = _doc_chunk_hashes(spark, sf_dir).collect()
    off = {r["chunk_md5"] for r in q_chunk_dedup(spark, sf_dir).collect()}
    want_chunks: dict[int, int] = {}
    want_shared: dict[int, int] = {}
    for r in ch:
        want_chunks[r["doc_id"]] = want_chunks.get(r["doc_id"], 0) + 1
        if r["chunk_md5"] in off:
            want_shared[r["doc_id"]] = want_shared.get(r["doc_id"], 0) + 1
    got = q_doc_boilerplate(spark, sf_dir).collect()
    assert {r["doc_id"]: r["n_chunks"] for r in got} == want_chunks
    assert {r["doc_id"]: r["n_shared"] for r in got} == {
        d: want_shared.get(d, 0) for d in want_chunks
    }


def test_staged_pipeline_matches_one_query_manifest(spark, sf_dir, tmp_path):
    """run_curation_pipeline (each gate materialized to parquet, manifest
    = joins over the stage tables) must be row-for-row identical to the
    one-query training_corpus_manifest — same docs, same carried
    columns. Also pins that every stage table actually landed on disk."""
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        CURATION_STAGES,
        q_training_corpus_manifest,
        q_training_corpus_manifest_strict,
        run_curation_pipeline,
    )

    out = str(tmp_path / "pipe")
    staged = run_curation_pipeline(spark, sf_dir, out, strict=True)
    got = [tuple(r) for r in staged.collect()]
    want = [
        tuple(r) for r in q_training_corpus_manifest_strict(spark, sf_dir).collect()
    ]
    assert got == want and len(got) > 0
    for stage in CURATION_STAGES:
        assert os.path.isdir(f"{out}/{stage}"), stage

    # non-strict skips materializing the boilerplate gate
    out2 = str(tmp_path / "pipe2")
    staged2 = run_curation_pipeline(spark, sf_dir, out2)
    want2 = [
        tuple(r) for r in q_training_corpus_manifest(spark, sf_dir).collect()
    ]
    assert [tuple(r) for r in staged2.collect()] == want2
    assert not os.path.exists(f"{out2}/doc_boilerplate")


def test_manifest_tokens_is_gates_intersect_token_mixture(spark, sf_dir):
    """r8 verdict task 4: training_corpus_manifest_tokens must ship
    exactly the docs that pass every non-mixture gate (quality rules,
    exact-dedup keeper, near-dup anti-join, SemDeDup) AND sit in the
    token-budgeted mixture — the gate set replicated here from the
    individually-oracled component queries, not from the manifest's own
    plumbing. Carried columns must match the component sources too."""
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    keep = {
        r["doc_id"]
        for r in reg["curation_filter_report"].fn(spark, sf_dir).collect()
        if r["keep"]
    }
    keepers = {
        r["keeper"] for r in reg["fingerprint_dedup"].fn(spark, sf_dir).collect()
    }
    discards = {
        r["discard_doc_id"]
        for r in reg["near_dup_discard"].fn(spark, sf_dir).collect()
    }
    sem = {
        r["vec_id"]
        for r in reg["semantic_dedup"].fn(spark, sf_dir).collect()
        if r["kept"] == 1
    }
    mixtok = {
        r["doc_id"]
        for r in reg["mixture_sample_tokens"].fn(spark, sf_dir).collect()
    }
    want = (keep & keepers & sem & mixtok) - discards
    rows = reg["training_corpus_manifest_tokens"].fn(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == want and len(rows) > 0
    # budgets flow from the BPE count table, lang from the mixture side
    bpec = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in reg["bpe_token_counts"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["n_bpe_tokens"] == bpec[r["doc_id"]]


def test_staged_pipeline_mixture_tokens_parity(spark, sf_dir, tmp_path):
    """run_curation_pipeline(mixture_tokens=True) must land the token
    sampler's verdict table and a manifest_tokens that is row-for-row
    the one-query training_corpus_manifest_tokens."""
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.registry import load_all

    out = str(tmp_path / "pipe_tok")
    run_curation_pipeline(spark, sf_dir, out, mixture_tokens=True)
    assert os.path.isdir(f"{out}/mixture_sample_tokens")
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/manifest_tokens").collect()
    )
    want = sorted(
        tuple(r)
        for r in load_all()["training_corpus_manifest_tokens"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert got == want and len(got) > 0


def test_export_shards_is_the_trainer_artifact(spark, sf_dir, tmp_path):
    """r8 verdict task 5: run_curation_pipeline(export=True) must finish
    the pipeline at shard-partitioned parquet a trainer mounts. Reading
    the shards back: (1) doc membership, budgets, and audit md5 are
    EXACTLY the stripped manifest; (2) every row's shard is the
    deterministic md5 rule, replayed in pure Python, and the shard=
    dirs exist on disk; (3) grouping rows by pack_id reproduces the
    registered pack_sequences_stripped aggregate; (4) every shipped
    cleaned_text hashes to its carried cleaned_md5 — the audit chain
    verifies the bytes that actually shipped."""
    import hashlib
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        N_SHARDS,
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    out = str(tmp_path / "pipe_exp")
    run_curation_pipeline(spark, sf_dir, out, export=True)
    rows = spark.read.parquet(f"{out}/shards").collect()
    ms = reg["training_corpus_manifest_stripped"].fn(spark, sf_dir).collect()
    assert {(r["doc_id"], r["n_bpe_tokens"], r["cleaned_md5"]) for r in rows} == {
        (r["doc_id"], r["n_bpe_tokens"], r["cleaned_md5"]) for r in ms
    } and len(rows) > 0
    shard_dirs = {
        int(d.split("=")[1])
        for d in os.listdir(f"{out}/shards")
        if d.startswith("shard=")
    }
    for r in rows:
        u = int(hashlib.md5(f"shard|{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert r["shard"] == u % N_SHARDS and r["shard"] in shard_dirs
        assert hashlib.md5(r["cleaned_text"].encode()).hexdigest() == r["cleaned_md5"]
    packs: dict[int, list] = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
    got_packs = sorted(
        (
            pid,
            len(rs),
            sum(r["n_bpe_tokens"] for r in rs),
            min(r["doc_id"] for r in rs),
            max(r["doc_id"] for r in rs),
        )
        for pid, rs in packs.items()
    )
    want_packs = sorted(
        tuple(r)
        for r in reg["pack_sequences_stripped"].fn(spark, sf_dir).collect()
    )
    assert got_packs == want_packs


def test_export_token_shards_ships_packed_token_ids(spark, sf_dir, tmp_path):
    """r9 verdict task 2: run_curation_pipeline(export_tokens=True) must
    ship the artifact a trainer mounts — shard-partitioned parquet of
    packed TOKEN-ID sequences over the token-budget manifest. Reading
    the shards back: (1) doc membership and budgets are EXACTLY the
    registered training_corpus_manifest_tokens, and every row's
    token_ids array matches the registered doc_token_ids oracle (ids
    string split) with len == n_bpe_tokens — budget conservation down
    to the id stream; (2) grouping rows by (phase, pack_id) reproduces
    the registered pack_sequences_phases aggregate — packs never mix
    curriculum phases, so the two-phase schedule is executable from
    the mounted shards alone (r11 verdict task 7); (3) seq_pos is the
    0-based doc_id-order position within each (phase, pack); (4) every
    row's shard is the deterministic md5 rule on phase + pack id,
    replayed in pure Python — whole packs never straddle shards; (5)
    per-phase token mass read from the shards equals the registered
    curriculum_phase_report."""
    import hashlib
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        N_SHARDS,
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    out = str(tmp_path / "pipe_tok")
    run_curation_pipeline(spark, sf_dir, out, export_tokens=True)
    rows = spark.read.parquet(f"{out}/token_shards").collect()
    mt = reg["training_corpus_manifest_tokens"].fn(spark, sf_dir).collect()
    assert {(r["doc_id"], r["n_bpe_tokens"]) for r in rows} == {
        (r["doc_id"], r["n_bpe_tokens"]) for r in mt
    } and len(rows) > 0

    ids = {
        r["doc_id"]: r["token_ids"]
        for r in reg["doc_token_ids"].fn(spark, sf_dir).collect()
    }
    for r in rows:
        want = [int(x) for x in ids[r["doc_id"]].split()] if ids[r["doc_id"]] else []
        assert list(r["token_ids"]) == want
        assert len(r["token_ids"]) == r["n_bpe_tokens"]

    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r["phase"], r["pack_id"]), []).append(r)
    got_packs = sorted(
        (
            phase,
            pid,
            len(rs),
            sum(r["n_bpe_tokens"] for r in rs),
            min(r["doc_id"] for r in rs),
            max(r["doc_id"] for r in rs),
        )
        for (phase, pid), rs in packs.items()
    )
    want_packs = sorted(
        tuple(r)
        for r in reg["pack_sequences_phases"].fn(spark, sf_dir).collect()
    )
    assert got_packs == want_packs

    shard_dirs = {
        int(d.split("=")[1])
        for d in os.listdir(f"{out}/token_shards")
        if d.startswith("shard=")
    }
    for (phase, pid), rs in packs.items():
        want_pos = list(range(len(rs)))
        got_pos = [
            r["seq_pos"] for r in sorted(rs, key=lambda r: r["doc_id"])
        ]
        assert got_pos == want_pos
        u = int(
            hashlib.md5(f"tshard|{phase}|{pid}".encode()).hexdigest()[:8],
            16,
        )
        shards = {r["shard"] for r in rs}
        assert shards == {u % N_SHARDS} and shards <= shard_dirs

    # (5) the shipped schedule IS the audited one: per-phase token mass
    # from the shards equals the registered curriculum_phase_report
    got_mass: dict[str, int] = {}
    for r in rows:
        got_mass[r["phase"]] = got_mass.get(r["phase"], 0) + r["n_bpe_tokens"]
    want_mass = {
        r["phase"]: r["n_tokens"]
        for r in reg["curriculum_phase_report"].fn(spark, sf_dir).collect()
    }
    assert got_mass == want_mass and set(got_mass) == {"anneal", "main"}


def test_staged_selection_matches_one_query_curated_dsir(
    spark, sf_dir, tmp_path
):
    """run_curation_pipeline(select=True) completes the curate->select
    materialized flow (r6 verdict task 8): the selection verdict tables
    land beside the curation gates and the parquet-joined DSIR pick is
    row-for-row identical to the one-query curated_dsir_select."""
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        SELECTION_STAGES,
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.operators.selection import (
        q_curated_dsir_select,
    )

    out = str(tmp_path / "pipe_sel")
    run_curation_pipeline(spark, sf_dir, out, select=True)
    for stage in SELECTION_STAGES:
        assert os.path.isdir(f"{out}/{stage}"), stage
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/curated_dsir_select").collect()
    )
    want = sorted(
        tuple(r) for r in q_curated_dsir_select(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


def test_packing_efficiency_matches_manifest(spark, sf_dir):
    from topic_modeling_ajin_spark.operators.curation import (
        PACK_BUDGET,
        q_pack_sequences,
        q_packing_efficiency,
    )

    packs = q_pack_sequences(spark, sf_dir).collect()
    r = q_packing_efficiency(spark, sf_dir).collect()[0]
    assert r["n_packs"] == len(packs)
    assert r["total_tokens"] == sum(p["n_tokens"] for p in packs)
    assert r["total_docs"] == sum(p["n_docs"] for p in packs)
    assert r["n_full"] == sum(1 for p in packs if p["n_tokens"] >= PACK_BUDGET)
    expect_fill = round(
        r["total_tokens"] / (len(packs) * PACK_BUDGET), 6
    )
    assert abs(r["fill_ratio"] - expect_fill) < 1e-9


def test_strip_boilerplate_chunks_planted(spark, tmp_path):
    """A chunk-aligned 32-token block shared by two docs is stripped from
    BOTH (cleaned text = each doc's unique remainder); a fully unique doc
    is untouched (cleaned_md5 == md5 of its own token stream)."""
    import hashlib

    from topic_modeling_ajin_spark.operators.curation import (
        STRIP_CHUNK,
        q_strip_boilerplate_chunks,
        strip_boilerplate_texts,
    )

    shared = [f"boiler{i}" for i in range(STRIP_CHUNK)]
    ua = [f"ua{i}" for i in range(10)]
    ub = [f"ub{i}" for i in range(20)]
    uc = [f"uc{i}" for i in range(40)]
    rows = [
        (1, " ".join(shared + ua)),
        (2, " ".join(shared + ub)),
        (3, " ".join(uc)),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    audit = {
        r["doc_id"]: r for r in q_strip_boilerplate_chunks(spark, d).collect()
    }
    md5 = lambda toks: hashlib.md5(" ".join(toks).encode()).hexdigest()
    assert audit[1]["n_stripped"] == 1 and audit[1]["n_chunks"] == 2
    assert audit[1]["n_tokens_kept"] == 10
    assert audit[1]["cleaned_md5"] == md5(ua)
    assert audit[2]["cleaned_md5"] == md5(ub)
    assert audit[3]["n_stripped"] == 0
    assert audit[3]["cleaned_md5"] == md5(uc)

    texts = {
        r["doc_id"]: r["cleaned_text"]
        for r in strip_boilerplate_texts(spark, d).collect()
    }
    assert texts[1] == " ".join(ua)
    assert texts[2] == " ".join(ub)
    assert texts[3] == " ".join(uc)


def test_doc_decontam_flags_benchmark_leakage(spark, tmp_path):
    """A corpus doc embedding a 5-gram from a benchmark doc (doc_id < 50)
    is flagged; a clean doc appears with flagged=false (LEFT-join
    completeness); benchmark docs are not corpus-side rows."""
    from topic_modeling_ajin_spark.operators.text_analysis import (
        q_doc_decontam,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, bench_text),  # benchmark stand-in
        (60, "intro words then quick brown fox jumps over closing remark"),
        (61, "completely clean document with entirely fresh vocabulary here"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in q_doc_decontam(spark, d).collect()}
    assert set(got) == {60, 61}
    assert got[60]["flagged"] and got[60]["n_shared_grams"] >= 1
    assert got[60]["n_bench_docs"] == 1
    assert not got[61]["flagged"] and got[61]["n_shared_grams"] == 0


def test_staged_winnow_manifest_matches_one_query(spark, sf_dir, tmp_path):
    """run_curation_pipeline(strict=True, winnow=True) must equal the
    one-query training_corpus_manifest_winnow row-for-row, with the
    winnow verdict table materialized beside the chunk gate's."""
    import os

    from topic_modeling_ajin_spark.operators.curation import (
        q_training_corpus_manifest_winnow,
        run_curation_pipeline,
    )

    out = str(tmp_path / "pipe_winnow")
    staged = run_curation_pipeline(spark, sf_dir, out, strict=True, winnow=True)
    assert os.path.isdir(f"{out}/doc_winnow_boilerplate")
    got = [tuple(r) for r in staged.collect()]
    want = [
        tuple(r)
        for r in q_training_corpus_manifest_winnow(spark, sf_dir).collect()
    ]
    assert got == want and len(got) > 0


def test_curation_funnel_is_monotone_and_matches_manifest(spark, sf_dir):
    """Funnel stages are monotone non-increasing and the last stage
    (mixture survivors of the full dedup chain) equals the base
    manifest's membership count."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_curation_funnel,
        q_training_corpus_manifest,
    )

    r = q_curation_funnel(spark, sf_dir).collect()[0]
    stages = [
        r["n_total"], r["n_rule_pass"], r["n_exact_kept"],
        r["n_near_kept"], r["n_sem_kept"], r["n_mixed"],
    ]
    assert all(a >= b for a, b in zip(stages, stages[1:]))
    assert stages[-1] == q_training_corpus_manifest(spark, sf_dir).count()
    assert stages[0] > stages[-1] > 0  # the funnel actually bites


def test_extended_funnel_matches_the_three_manifests(spark, sf_dir):
    """n_base/n_strict/n_winnow must equal the registered manifests'
    row counts exactly, and the decontam stage must equal the
    winnow-manifest membership minus bench members and flagged docs."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_curation_funnel_extended,
        q_training_corpus_manifest,
        q_training_corpus_manifest_strict,
        q_training_corpus_manifest_winnow,
    )
    from topic_modeling_ajin_spark.operators.text_analysis import (
        DECON_BENCH_MAX_DOC_ID,
        q_doc_decontam,
    )

    r = q_curation_funnel_extended(spark, sf_dir).collect()[0]
    assert r["n_base"] == q_training_corpus_manifest(spark, sf_dir).count()
    assert (
        r["n_strict"]
        == q_training_corpus_manifest_strict(spark, sf_dir).count()
    )
    winnow_ids = {
        x["doc_id"]
        for x in q_training_corpus_manifest_winnow(spark, sf_dir).collect()
    }
    assert r["n_winnow"] == len(winnow_ids)
    clean = {
        x["doc_id"]
        for x in q_doc_decontam(spark, sf_dir).collect()
        if not x["flagged"]
    }
    want = {
        d for d in winnow_ids if d >= DECON_BENCH_MAX_DOC_ID and d in clean
    }
    assert r["n_decontam"] == len(want)
    assert r["n_base"] >= r["n_strict"] >= r["n_winnow"] >= r["n_decontam"]


def test_stripped_manifest_ships_remainders(spark, sf_dir):
    """r7 verdict task 3: the stripped manifest = base manifest with each
    doc's chunk-stripped remainder — membership drops only docs whose
    remainder is empty (and every such drop is also a strict-gate drop),
    untouched docs keep their exact BPE budget, stripped docs shrink."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_doc_boilerplate,
        q_strip_boilerplate_chunks,
        q_training_corpus_manifest,
    )
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    base = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in q_training_corpus_manifest(spark, sf_dir).collect()
    }
    stripped = {
        r["doc_id"]: r
        for r in reg["training_corpus_manifest_stripped"]
        .fn(spark, sf_dir)
        .collect()
    }
    audit = {
        r["doc_id"]: r
        for r in q_strip_boilerplate_chunks(spark, sf_dir).collect()
    }

    # membership: base minus empty-remainder docs, nothing else
    assert set(stripped) == {
        d for d in base if audit[d]["n_tokens_kept"] > 0
    }
    # strict drops >= stripped drops: every doc the stripped manifest
    # drops (fully-boilerplate remainder) is flagged by the strict gate
    dropped = set(base) - set(stripped)
    flagged = {
        r["doc_id"]
        for r in q_doc_boilerplate(spark, sf_dir).filter("flagged").collect()
    }
    assert dropped <= flagged

    for d, row in stripped.items():
        a = audit[d]
        if a["n_stripped"] == 0:
            # untouched doc: budget identical to the base manifest's
            assert row["n_bpe_tokens"] == base[d], d
        else:
            assert row["n_bpe_tokens"] < base[d], d
        # BPE pieces >= words (every word encodes to >= 1 piece)
        assert row["n_bpe_tokens"] >= a["n_tokens_kept"], d
        # the verifiable-text chain: cleaned_md5 is the audit's
        assert row["cleaned_md5"] == a["cleaned_md5"], d


def test_data_card_equals_composed_queries(spark, sf_dir):
    """Every data-card figure must equal the composed registered query's
    own result on the same corpus — the card's design contract (r7
    verdict task 4)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.operators.curation import (
        q_corpus_data_card,
        q_strip_savings_report,
        q_training_corpus_manifest,
        q_training_corpus_manifest_decontam,
        q_training_corpus_manifest_winnow,
    )
    from topic_modeling_ajin_spark.operators.dedup import (
        q_fingerprint_dedup,
        q_near_dup_discard,
        q_semantic_dedup,
    )
    from topic_modeling_ajin_spark.operators.retrieval import (
        q_doc_winnow_boilerplate,
    )
    from topic_modeling_ajin_spark.registry import load_all

    card = q_corpus_data_card(spark, sf_dir).collect()[0].asDict()
    reg = load_all()
    ss = q_strip_savings_report(spark, sf_dir).collect()[0]
    ftok = reg["curation_funnel_tokens"].fn(spark, sf_dir).collect()[0]
    expect = {
        # r8 verdict task 8: the card leads with the BPE token mass that
        # budgets a run, pinned to the token funnel's own figures
        "t_total": ftok["t_total"],
        "t_mixed": ftok["t_mixed"],
        "n_unique_docs": q_fingerprint_dedup(spark, sf_dir).count(),
        "n_near_dup_discards": q_near_dup_discard(spark, sf_dir).count(),
        "n_semdedup_drops": q_semantic_dedup(spark, sf_dir)
        .filter(F.col("kept") == 0)
        .count(),
        "n_winnow_flagged": q_doc_winnow_boilerplate(spark, sf_dir)
        .filter("flagged")
        .count(),
        "n_tokens_stripped": ss["total_tokens"] - ss["total_tokens_kept"],
        "n_manifest": q_training_corpus_manifest(spark, sf_dir).count(),
        "n_manifest_winnow": q_training_corpus_manifest_winnow(
            spark, sf_dir
        ).count(),
        "n_manifest_decontam": q_training_corpus_manifest_decontam(
            spark, sf_dir
        ).count(),
        "n_manifest_stripped": reg["training_corpus_manifest_stripped"]
        .fn(spark, sf_dir)
        .count(),
        "n_manifest_tokens": reg["training_corpus_manifest_tokens"]
        .fn(spark, sf_dir)
        .count(),
        # r12 verdict task 4: the fallback-quality cells equal the
        # standalone recall harnesses
        "sem_table_recall": reg["semdedup_recall_eval"]
        .fn(spark, sf_dir)
        .collect()[0]["recall"],
        "sem_hash_recall": reg["semdedup_hash_recall_eval"]
        .fn(spark, sf_dir)
        .collect()[0]["recall"],
    }
    for k, v in expect.items():
        assert card[k] == v, (k, card[k], v)


def test_funnel_by_source_sums_to_corpus_funnel(spark, sf_dir):
    """Per-source funnel rows must sum to the corpus funnel exactly and
    each row must be stage-monotone (cumulative conjunctions)."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_curation_funnel,
        q_curation_funnel_by_source,
    )

    total = q_curation_funnel(spark, sf_dir).collect()[0].asDict()
    rows = [
        r.asDict() for r in q_curation_funnel_by_source(spark, sf_dir).collect()
    ]
    stages = [
        "n_total",
        "n_rule_pass",
        "n_exact_kept",
        "n_near_kept",
        "n_sem_kept",
        "n_mixed",
    ]
    for s in stages:
        assert sum(r[s] for r in rows) == total[s], s
    for r in rows:
        vals = [r[s] for s in stages]
        assert vals == sorted(vals, reverse=True), r["source"]


def test_funnel_tokens_by_source_sums_to_corpus_funnel(spark, sf_dir):
    """Per-source token-funnel rows must sum to the corpus token funnel
    exactly at every stage and be stage-monotone per row (shared flag
    table + shared stage aggregates make disagreement structurally
    impossible — this pins it stays that way)."""
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    total = reg["curation_funnel_tokens"].fn(spark, sf_dir).collect()[0].asDict()
    rows = [
        r.asDict()
        for r in reg["curation_funnel_tokens_by_source"].fn(spark, sf_dir).collect()
    ]
    stages = [
        "t_total",
        "t_rule_pass",
        "t_exact_kept",
        "t_near_kept",
        "t_sem_kept",
        "t_mixed",
    ]
    for s in stages:
        assert sum(r[s] for r in rows) == total[s], s
    for r in rows:
        vals = [r[s] for s in stages]
        assert vals == sorted(vals, reverse=True), r["source"]


def test_staged_strip_pipeline_matches_one_query(spark, sf_dir, tmp_path):
    """run_curation_pipeline(strip=True) must materialize cleaned texts
    whose md5 equals the audit's cleaned_md5, and a manifest_stripped
    table identical to the one-query stripped manifest."""
    import hashlib

    from topic_modeling_ajin_spark.operators.curation import (
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.registry import load_all

    out = str(tmp_path / "pipe")
    run_curation_pipeline(spark, sf_dir, out, strip=True)

    staged = sorted(
        map(
            tuple,
            spark.read.parquet(f"{out}/manifest_stripped")
            .select("doc_id", "lang", "quality", "n_bpe_tokens", "cleaned_md5")
            .collect(),
        )
    )
    one = sorted(
        map(
            tuple,
            load_all()["training_corpus_manifest_stripped"]
            .fn(spark, sf_dir)
            .collect(),
        )
    )
    assert staged == one and staged

    # the materialized cleaned texts hash to the audit's cleaned_md5 —
    # what ships IS what the audit certified
    audit = {
        r["doc_id"]: r["cleaned_md5"]
        for r in spark.read.parquet(
            f"{out}/strip_boilerplate_chunks"
        ).collect()
        if r["n_tokens_kept"] > 0
    }
    texts = spark.read.parquet(f"{out}/stripped_texts").collect()
    assert {r["doc_id"] for r in texts} == set(audit)
    for r in texts:
        assert (
            hashlib.md5(r["cleaned_text"].encode()).hexdigest()
            == audit[r["doc_id"]]
        ), r["doc_id"]


def test_funnel_tokens_monotone_and_ties_to_manifest(spark, sf_dir):
    """Token-mass funnel stages must be monotone, and the final stage's
    token mass must equal the base manifest's summed n_bpe_tokens (same
    membership, same budget table)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.operators.curation import (
        q_curation_funnel_tokens,
        q_training_corpus_manifest,
    )

    row = q_curation_funnel_tokens(spark, sf_dir).collect()[0].asDict()
    stages = [
        "t_total",
        "t_rule_pass",
        "t_exact_kept",
        "t_near_kept",
        "t_sem_kept",
        "t_mixed",
    ]
    vals = [row[s] for s in stages]
    assert vals == sorted(vals, reverse=True)
    man_tokens = (
        q_training_corpus_manifest(spark, sf_dir)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert row["t_mixed"] == man_tokens


def test_strip_savings_by_source_sums_to_report(spark, sf_dir):
    """Per-source strip savings must sum to the corpus report exactly."""
    from topic_modeling_ajin_spark.operators.curation import (
        q_strip_savings_by_source,
        q_strip_savings_report,
    )

    rep = q_strip_savings_report(spark, sf_dir).collect()[0]
    rows = q_strip_savings_by_source(spark, sf_dir).collect()
    for col in ("n_docs", "n_docs_affected", "total_tokens", "total_tokens_kept"):
        assert sum(r[col] for r in rows) == rep[col], col


def test_decontam_provenance_pure_python_replay(spark, sf_dir):
    """decontam_provenance must equal an independent pure-Python replay
    of the gram split (same tokenizer, same bench cut), and its bench
    membership must mirror decontamination_overlap's corpus view."""
    import re

    from topic_modeling_ajin_spark.operators.text_analysis import (
        DECON_BENCH_MAX_DOC_ID,
        DECON_NGRAM,
        q_decontam_provenance,
        q_decontamination_overlap,
    )
    from topic_modeling_ajin_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    gsets = {}
    for r in docs:
        toks = [w for w in re.split(r"\s+", (r["text"] or "").lower()) if w]
        gsets[r["doc_id"]] = {
            " ".join(toks[i : i + DECON_NGRAM])
            for i in range(len(toks) - DECON_NGRAM + 1)
        }
    bench = {d: g for d, g in gsets.items() if d < DECON_BENCH_MAX_DOC_ID}
    corpus = {d: g for d, g in gsets.items() if d >= DECON_BENCH_MAX_DOC_ID}
    expect = {}
    for bd, bg in bench.items():
        leaked = set()
        touched = set()
        for cd, cg in corpus.items():
            inter = bg & cg
            if inter:
                leaked |= inter
                touched.add(cd)
        if leaked:
            expect[bd] = (len(leaked), len(touched))
    got = {
        r["bench_doc"]: (r["n_leaked_grams"], r["n_corpus_docs"])
        for r in q_decontam_provenance(spark, sf_dir).collect()
    }
    assert got == expect
    # cross-view: corpus docs named by the overlap scan == corpus docs
    # counted here (both sides of the same join)
    ov_docs = {
        r["doc_id"] for r in q_decontamination_overlap(spark, sf_dir).collect()
    }
    touched_all = set()
    for bd, bg in bench.items():
        for cd, cg in corpus.items():
            if bg & cg:
                touched_all.add(cd)
    assert ov_docs == touched_all


def test_hot_shingles_names_planted_boilerplate(spark, sf_dir, tmp_path):
    """A shingle planted in > HOT_SHINGLE_CAP docs must be named with its
    exact doc count; the real corpus (healthy) may name none, and every
    named count must exceed the cap."""
    from topic_modeling_ajin_spark.operators.dedup import (
        HOT_SHINGLE_CAP,
        q_hot_shingles,
    )

    n = HOT_SHINGLE_CAP + 4
    rows = [
        (i, f"common nav footer unique{i}a unique{i}b unique{i}c")
        for i in range(n)
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {
        r["shingle"]: r["n_docs"] for r in q_hot_shingles(spark, str(d)).collect()
    }
    assert got == {"common nav footer": n}

    for r in q_hot_shingles(spark, sf_dir).collect():
        assert r["n_docs"] > HOT_SHINGLE_CAP


def test_jaccard_sweep_routes_hot_shingles_out_of_pair_join(
    spark, sf_dir, tmp_path
):
    """r8 verdict task 2: the sweep must be hot-shingle-guarded. Plant
    HOT_SHINGLE_CAP+4 docs sharing a 5-token boilerplate prefix (3 hot
    shingles, ~n²/2 candidate pairs if joined) plus one genuine near-dup
    pair built from cold shingles: the sweep must report ONLY the cold
    pair, with the exclusion visible in n_hot_excluded, and its plan
    must anti-join the hot set via broadcast."""
    from topic_modeling_ajin_spark.operators.dedup import (
        HOT_SHINGLE_CAP,
        q_jaccard_threshold_sweep,
    )

    n = HOT_SHINGLE_CAP + 4
    rows = [
        (i, f"common nav footer shared block unique{i}a unique{i}b unique{i}c")
        for i in range(n)
    ]
    # near-dup pair over cold shingles only: 10 tokens, last differs ->
    # 7 shared / 9 union = 0.7778 -> band floor(7*20/9) = 15
    alpha = " ".join(f"a{i}" for i in range(10))
    rows.append((1000, alpha))
    rows.append((1001, " ".join(alpha.split()[:-1]) + " beta"))
    # near-dup pair sharing hot AND cold shingles: the boilerplate
    # prefix (3 hot shingles) + the 10-token tail, last token differs.
    # 15 tokens -> 13 distinct shingles; shared = 12 (3 hot + 9 cold),
    # union = 14 -> the GATE's Jaccard is 12/14 = 0.857, band
    # floor(12*20/14) = 17. Banding over hot-filtered sets would give
    # 9/11 -> band 16: this row pins that the sweep keeps the gate's
    # full-set arithmetic for pairs the guard lets through.
    boiler = "common nav footer shared block "
    beta = " ".join(f"b{i}" for i in range(10))  # disjoint from alpha
    rows.append((2000, boiler + beta))
    rows.append((2001, boiler + " ".join(beta.split()[:-1]) + " gamma"))
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = q_jaccard_threshold_sweep(spark, str(d))
    got = sorted(
        (r["band"], r["n_pairs"], r["n_hot_excluded"]) for r in out.collect()
    )
    assert got == [(15, 1, 3), (17, 1, 3)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    # guard-silences-nothing: a corpus whose ONLY near-dup pairs ride on
    # hot shingles still reports the exclusion (sentinel row, 0 pairs)
    d2 = str(tmp_path / "docs2")
    spark.createDataFrame(
        [
            (i, f"common nav footer shared block unique{i}a unique{i}b unique{i}c")
            for i in range(n)
        ],
        "doc_id long, text string",
    ).write.parquet(f"{d2}/documents.parquet")
    sentinel = q_jaccard_threshold_sweep(spark, str(d2)).collect()
    assert [(r["band"], r["n_pairs"], r["n_hot_excluded"]) for r in sentinel] == [
        (None, 0, 3)
    ]


def test_data_card_by_source_equals_composed_funnels(spark, sf_dir):
    """r9 verdict task 8 (the card discipline): every cell of the
    per-source data card must equal the composing registered query's
    figure — both funnels' stage columns verbatim, the strip savings
    difference, and the documents-table basics — so the card can never
    drift from the tables it summarizes."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    card = {
        r["source"]: r.asDict()
        for r in reg["corpus_data_card_by_source"].fn(spark, sf_dir).collect()
    }
    f = {
        r["source"]: r.asDict()
        for r in reg["curation_funnel_by_source"].fn(spark, sf_dir).collect()
    }
    ft = {
        r["source"]: r.asDict()
        for r in reg["curation_funnel_tokens_by_source"]
        .fn(spark, sf_dir)
        .collect()
    }
    ss = {
        r["source"]: r["total_tokens"] - r["total_tokens_kept"]
        for r in reg["strip_savings_by_source"].fn(spark, sf_dir).collect()
    }
    from topic_modeling_ajin_spark.sources import load_table

    base = {
        r["source"]: (r["n_docs"], r["n_langs"])
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .collect()
    }
    assert set(card) == set(f) == set(ft) == set(base) and card
    for src, row in card.items():
        assert (row["n_docs"], row["n_langs"]) == base[src]
        assert row["n_docs"] == f[src]["n_total"]
        for c in ("n_rule_pass", "n_exact_kept", "n_near_kept",
                  "n_sem_kept", "n_mixed"):
            assert row[c] == f[src][c], (src, c)
        for c in ("t_total", "t_rule_pass", "t_exact_kept", "t_near_kept",
                  "t_sem_kept", "t_mixed"):
            assert row[c] == ft[src][c], (src, c)
        assert row["n_tokens_stripped"] == ss.get(src, 0)
        assert 0.0 <= row["mean_quality"] <= 1.0


def test_near_dup_discard_is_hot_shingle_guarded(spark, tmp_path):
    """r9 verdict task 1: the near-dup GATE the manifest family composes
    must route corpus-wide boilerplate shingles out of pair formation.
    Plant HOT_SHINGLE_CAP+4 docs sharing a 5-token boilerplate prefix
    (3 hot shingles -> ~n²/2 pairs if joined) plus three probe pairs:

    - a cold near-dup pair (3000, 3001): discarded as before;
    - a mixed pair (2000, 2001) whose Jaccard clears 0.8 ONLY with
      full-set arithmetic (9/11 = 0.818 full vs 6/8 = 0.75 cold-only):
      pins that guarded pairs keep the gate's exact figure;
    - a pair (4000, 4001) connected SOLELY by hot shingles (verbatim
      boilerplate): excluded from THIS gate by design — identical
      copies are the fingerprint/exact-dup family's population.

    The guarded pair table must stay linear in the boilerplate (2 pairs,
    not ~n²/2) and its plan must broadcast-anti-join the hot set."""
    from topic_modeling_ajin_spark.operators.dedup import (
        HOT_SHINGLE_CAP,
        hot_guarded_pair_stats,
        q_fingerprint_dedup,
        q_near_dup_discard,
    )

    n = HOT_SHINGLE_CAP + 4
    boiler = "common nav footer shared block"
    rows = [
        (i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(n)
    ]
    # mixed pair: boiler + 7-token tail, last token differs. 12 tokens ->
    # 10 shingles (3 hot, 7 cold); shared = 3 hot + 6 cold = 9, union 11
    # -> full Jaccard 0.818 >= 0.8; cold-only would be 6/8 = 0.75 < 0.8.
    tail = " ".join(f"b{i}" for i in range(7))
    rows.append((2000, f"{boiler} {tail}"))
    rows.append((2001, f"{boiler} {' '.join(tail.split()[:-1])} gamma"))
    # cold pair: 20 tokens, last differs -> 17/19 = 0.895 >= 0.8
    alpha = " ".join(f"a{i}" for i in range(20))
    rows.append((3000, alpha))
    rows.append((3001, " ".join(alpha.split()[:-1]) + " omega"))
    # hot-only pair: verbatim boilerplate, all 3 shingles hot
    rows.append((4000, boiler))
    rows.append((4001, boiler))
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )

    stats = hot_guarded_pair_stats(spark, str(d))
    pairs = sorted(
        (r["doc_a"], r["doc_b"], r["inter"], r["stot"])
        for r in stats.collect()
    )
    assert pairs == [(2000, 2001, 9, 20), (3000, 3001, 17, 36)]
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    discards = sorted(
        r["discard_doc_id"] for r in q_near_dup_discard(spark, str(d)).collect()
    )
    assert discards == [2001, 3001]
    # the hot-only dup the gate no longer sees IS caught by the exact gate
    fp = {
        r["keeper"]: r["n_copies"]
        for r in q_fingerprint_dedup(spark, str(d)).collect()
    }
    assert fp[4000] == 2


def test_guarded_gate_equals_unguarded_below_the_cap(spark, tmp_path):
    """On a corpus with NO hot shingles the guard must be a pure no-op:
    the hot-guarded near-dup discard equals the UNGUARDED exact rule,
    replayed here in pure Python (lower/split tokens, distinct 3-gram
    shingles, pairwise Jaccard >= 0.8, discard the higher id) on a
    corpus mixing near-dups, an exact pair, and unrelated docs."""
    from topic_modeling_ajin_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        q_near_dup_discard,
    )

    texts = {}
    base = [f"w{i}" for i in range(25)]
    texts[1] = " ".join(base)
    texts[2] = " ".join(base[:-1] + ["edited"])      # near-dup of 1
    texts[3] = " ".join(base)                        # exact dup of 1
    texts[4] = " ".join(f"x{i}" for i in range(20))  # unrelated
    texts[5] = " ".join(
        [f"x{i}" for i in range(19)] + ["tail"]
    )                                                # near-dup of 4
    texts[6] = "one two three four five six seven"   # unrelated short
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")

    def shingles(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    sh = {k: shingles(v) for k, v in texts.items()}
    expect = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= JACCARD_THRESHOLD:
                expect.add(b)
    got = {
        r["discard_doc_id"]
        for r in q_near_dup_discard(spark, str(d)).collect()
    }
    assert got == expect == {2, 3, 5}


def test_pack_sequences_stripped_conserves_budget(spark, sf_dir):
    """Stripped packs must conserve the stripped manifest's token mass,
    cover contiguous pack ids from 0, and fit the budget (every pack
    except possibly the last holds >= budget tokens counting straddle)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    packs = sorted(
        (r["pack_id"], r["n_docs"], r["n_tokens"])
        for r in reg["pack_sequences_stripped"].fn(spark, sf_dir).collect()
    )
    man_tokens = (
        reg["training_corpus_manifest_stripped"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert sum(p[2] for p in packs) == man_tokens
    ids = [p[0] for p in packs]
    assert ids == list(range(len(ids)))


def test_pack_sequences_tokens_conserves_manifest_mass(spark, sf_dir):
    """Token-budget packs must conserve the tokens manifest's BPE mass
    and cover contiguous pack ids from 0 — the stripped-pack discipline
    applied to the r9 chain's final consumer."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    packs = sorted(
        (r["pack_id"], r["n_docs"], r["n_tokens"])
        for r in reg["pack_sequences_tokens"].fn(spark, sf_dir).collect()
    )
    man_tokens = (
        reg["training_corpus_manifest_tokens"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert sum(p[2] for p in packs) == man_tokens
    ids = [p[0] for p in packs]
    assert ids == list(range(len(ids)))


def test_jaccard_sweep_consistent_with_near_dup_pairs(spark, sf_dir):
    """Pairs in bands at/above the gate threshold must sum to the exact
    baseline's pair count (same join, same arithmetic)."""
    from topic_modeling_ajin_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        SWEEP_BANDS,
        q_jaccard_threshold_sweep,
        q_ngram_jaccard_pairs,
    )

    sweep = q_jaccard_threshold_sweep(spark, sf_dir).collect()
    n_gate = q_ngram_jaccard_pairs(spark, sf_dir).count()
    gate_band = int(JACCARD_THRESHOLD * SWEEP_BANDS)
    # band is NULL on the no-surviving-pairs sentinel row (which still
    # carries n_hot_excluded so the guard is never silent)
    assert (
        sum(
            r["n_pairs"]
            for r in sweep
            if r["band"] is not None and r["band"] >= gate_band
        )
        == n_gate
    )


def test_simhash_histogram_consistent_with_gate(spark, sf_dir):
    """Histogram mass at/below the gate distance must equal the gate
    query's pair count (same candidates, same bit math)."""
    from topic_modeling_ajin_spark.operators.text_analysis import (
        _SIMHASH_HAM_MAX,
        q_simhash_hamming_histogram,
        q_simhash_near_dup,
    )

    hist = q_simhash_hamming_histogram(spark, sf_dir).collect()
    n_gate = q_simhash_near_dup(spark, sf_dir).count()
    assert (
        sum(r["n_pairs"] for r in hist if r["hamming"] <= _SIMHASH_HAM_MAX)
        == n_gate
    )


def test_mixture_sample_tokens_respects_budgets(spark, sf_dir):
    """Per-language kept token mass must start inside the engine-computed
    budget (straddle allowed on the last doc only), cut langs must have
    consumed their budget, and reruns are identical (md5 order, no RNG)."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.operators.curation import (
        MIXTOK_BUDGET,
        q_mixture_sample_tokens,
        q_mixture_temperature_plan_tokens,
    )
    from topic_modeling_ajin_spark.sources import load_table

    kept = q_mixture_sample_tokens(spark, sf_dir).collect()
    assert kept
    assert sorted(map(tuple, kept)) == sorted(
        map(tuple, q_mixture_sample_tokens(spark, sf_dir).collect())
    )
    plan = {
        r["lang"]: r["temp_share"]
        for r in q_mixture_temperature_plan_tokens(spark, sf_dir).collect()
    }
    budgets = {l: int(s * MIXTOK_BUDGET) for l, s in plan.items()}
    kept_by_lang: dict[str, int] = {}
    for r in kept:
        kept_by_lang[r["lang"]] = kept_by_lang.get(r["lang"], 0) + r["n_tokens"]
    from topic_modeling_ajin_spark.functions import text as TX

    total_by_lang = {
        r["lang"]: r["t"]
        for r in load_table(spark, sf_dir, "documents")
        .select("lang", F.size(TX.word_tokens("text")).alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    for lang, got in kept_by_lang.items():
        b = budgets[lang]
        if got < total_by_lang[lang]:  # the budget actually cut this lang
            # consumed at least the budget (last doc straddles), and the
            # pre-straddle mass is under it
            assert got >= b - 1, (lang, got, b)


def test_dup_cluster_histogram_conserves_corpus(spark, sf_dir):
    """Cluster sizes weighted by cluster counts (including the singleton
    row) must sum to the corpus size, and every histogram row must be
    internally consistent (n_docs == cluster_size * n_clusters)."""
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.sources import load_table

    reg = load_all()
    rows = reg["dup_cluster_size_histogram"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_mixture_policy_overlap_is_consistent(spark, sf_dir):
    """The policy-diff cells must satisfy the set identities against the
    composing registered samplers: counts decompose (both + only = each
    side), and each side's figures equal the samplers' own counts."""
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    r = reg["mixture_policy_overlap"].fn(spark, sf_dir).collect()[0]
    assert r["n_doc_policy"] == r["n_both"] + r["n_doc_only"]
    assert r["n_token_policy"] == r["n_both"] + r["n_token_only"]
    assert r["n_doc_policy"] == reg["mixture_sample"].fn(spark, sf_dir).count()
    assert (
        r["n_token_policy"]
        == reg["mixture_sample_tokens"].fn(spark, sf_dir).count()
    )
    assert r["t_both"] <= min(r["t_doc_policy"], r["t_token_policy"])


def test_contamination_by_source_matches_doc_decontam(spark, sf_dir):
    """Summing the per-source rows must reproduce the corpus-wide
    doc_decontam verdict tallies exactly."""
    from pyspark.sql import functions as F

    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    rows = reg["contamination_by_source"].fn(spark, sf_dir).collect()
    dc = reg["doc_decontam"].fn(spark, sf_dir)
    assert sum(r["n_docs"] for r in rows) == dc.count()
    assert sum(r["n_flagged"] for r in rows) == dc.filter(
        F.col("flagged")
    ).count()
    assert sum(r["n_shared_grams"] for r in rows) == (
        dc.agg(F.sum("n_shared_grams")).collect()[0][0]
    )


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# small alphabet forces shared shingles; an optional boilerplate block
# (> HOT_SHINGLE_CAP docs) exercises the guard path
_TOK = st.sampled_from([f"t{i}" for i in range(8)])
_DOC = st.lists(_TOK, min_size=3, max_size=10)


@settings(
    max_examples=6,
    deadline=None,
    # tmp_path is only a namespace: every example writes its own
    # uuid-named subdirectory, so cross-example reuse is safe
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_DOC, min_size=4, max_size=10),
    plant_boiler=st.booleans(),
)
def test_guarded_gate_property_matches_python_replay(
    spark, tmp_path, docs, plant_boiler
):
    """Property (r10): on ARBITRARY corpora the hot-guarded near-dup
    discard equals the pure-Python replay of the guarded rule (pairs
    connected by >= 1 non-hot shingle, FULL-set Jaccard >= 0.8, discard
    the higher id), is a subset of the unguarded brute-force rule, and
    differs from it only on pairs connected SOLELY by hot shingles."""
    import uuid

    from topic_modeling_ajin_spark.operators.dedup import (
        HOT_SHINGLE_CAP,
        JACCARD_THRESHOLD,
        q_near_dup_discard,
    )

    texts = {i: " ".join(d) for i, d in enumerate(docs)}
    if plant_boiler:
        # > CAP docs sharing a 5-token prefix -> 3 hot shingles
        for j in range(HOT_SHINGLE_CAP + 2):
            texts[100 + j] = f"b1 b2 b3 b4 b5 u{j}a u{j}b u{j}c"

    def shingle_set(t):
        toks = t.lower().split()
        return (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else set()
        )

    sh = {k: shingle_set(v) for k, v in texts.items() if shingle_set(v)}
    from collections import Counter

    df = Counter(s for ss in sh.values() for s in ss)
    hot = {s for s, c in df.items() if c > HOT_SHINGLE_CAP}

    brute, guarded = set(), set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter_set = sh[a] & sh[b]
            if not inter_set:
                continue
            j = len(inter_set) / len(sh[a] | sh[b])
            if j >= JACCARD_THRESHOLD:
                brute.add(b)
                if inter_set - hot:
                    guarded.add(b)

    d = str(tmp_path / f"prop-{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r["discard_doc_id"]
        for r in q_near_dup_discard(spark, str(d)).collect()
    }
    assert got == guarded
    assert got <= brute
    for b in brute - got:
        # every brute-only discard rides exclusively on hot shingles
        assert any(
            len(sh[a] & sh[b]) > 0 and not ((sh[a] & sh[b]) - hot)
            for a in ids
            if a < b
        )


def test_dedup_savings_report_matches_verdict_tables(spark, sf_dir):
    """Every cell of the savings line must equal a recount over the
    composing registered verdicts (docs and BPE token mass per tier)."""
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.sources import load_table

    reg = load_all()
    r = reg["dedup_savings_report"].fn(spark, sf_dir).collect()[0]
    tok = {
        t["doc_id"]: t["n_bpe_tokens"]
        for t in reg["bpe_token_counts"].fn(spark, sf_dir).collect()
    }
    all_ids = {
        d["doc_id"]
        for d in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    keepers = {
        k["keeper"] for k in reg["fingerprint_dedup"].fn(spark, sf_dir).collect()
    }
    ex = all_ids - keepers
    ndd = {
        n["discard_doc_id"]
        for n in reg["near_dup_discard"].fn(spark, sf_dir).collect()
    }
    sd = {
        s["vec_id"]
        for s in reg["semantic_dedup"].fn(spark, sf_dir).collect()
        if s["kept"] == 0
    }
    assert (r["n_exact_removed"], r["t_exact_removed"]) == (
        len(ex),
        sum(tok[d] for d in ex),
    )
    assert (r["n_near_dup_removed"], r["t_near_dup_removed"]) == (
        len(ndd),
        sum(tok[d] for d in ndd),
    )
    assert (r["n_semdedup_removed"], r["t_semdedup_removed"]) == (
        len(sd),
        sum(tok.get(d, 0) for d in sd),
    )


def test_quality_percentiles_by_source_are_ordered(spark, sf_dir):
    """Quartiles must be monotone within each source and bounded by
    [0, 1]; doc counts must sum to the corpus."""
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.sources import load_table

    reg = load_all()
    rows = reg["quality_percentiles_by_source"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p25"] <= r["p50"] <= r["p75"] <= 1.0
        assert 0.0 <= r["mean_quality"] <= 1.0
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total


def test_token_shards_ship_their_decode_context(spark, sf_dir, tmp_path):
    """r10 verdict missing-item #3: a trainer (or auditor) mounting the
    token-shard export must be able to decode AND reproduce the ids
    using only files under out_dir. This reads back the shipped
    tokenizer (piece_vocab + merges + meta hash), re-encodes sample
    docs' raw text with a PURE-PYTHON replay of the BPE apply (char
    split, merges in rank order, greedy non-overlapping fuse), maps
    pieces through the shipped id table, and requires the exact shard
    id stream; decoding ids back through the vocab must reproduce the
    docs' concatenated word stream. The tokenizer content-hash on every
    shard row must equal the meta row's and the recomputed one."""
    import hashlib
    import re

    from topic_modeling_ajin_spark.operators.curation import (
        run_curation_pipeline,
    )
    from topic_modeling_ajin_spark.sources import load_table

    out = str(tmp_path / "pipe_ctx")
    run_curation_pipeline(spark, sf_dir, out, export_tokens=True)

    # ---- everything below reads ONLY out_dir (plus raw corpus text)
    vocab = {
        r["piece"]: r["piece_id"]
        for r in spark.read.parquet(f"{out}/tokenizer/piece_vocab").collect()
    }
    inv_vocab = {i: p for p, i in vocab.items()}
    merges = [
        (r["lhs"], r["rhs"])
        for r in sorted(
            spark.read.parquet(f"{out}/tokenizer/merges").collect(),
            key=lambda r: r["rank"],
        )
    ]
    meta = spark.read.parquet(f"{out}/tokenizer/meta").collect()[0]
    assert meta["n_merges"] == len(merges)
    assert meta["n_pieces"] == len(vocab)

    def bpe_apply(word):
        seq = list(word)
        for lhs, rhs in merges:
            nxt = []
            for s in seq:
                if nxt and nxt[-1] == lhs and s == rhs:
                    nxt[-1] = lhs + rhs
                else:
                    nxt.append(s)
            seq = nxt
        return seq

    def words(text):
        return [
            w
            for w in re.split(r"[^a-z0-9가-힣]+", (text or "").lower())
            if w
        ]

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = spark.read.parquet(f"{out}/token_shards").collect()
    assert rows
    sample = sorted(rows, key=lambda r: r["doc_id"])[:20]
    for r in sample:
        ws = words(texts[r["doc_id"]])
        want_ids = [
            vocab[p] for w in ws for p in bpe_apply(w)
        ]
        assert list(r["token_ids"]) == want_ids
        # decode: ids -> pieces -> the doc's concatenated word stream
        assert "".join(inv_vocab[i] for i in r["token_ids"]) == "".join(ws)
        assert r["tokenizer_hash"] == meta["tokenizer_hash"]

    # the content-hash is reproducible from the shipped tables alone
    mrows = sorted(
        spark.read.parquet(f"{out}/tokenizer/merges").collect(),
        key=lambda r: r["rank"],
    )
    blob = "\n".join(f"{r['rank']}\t{r['lhs']}\t{r['rhs']}" for r in mrows)
    blob += "\n--\n" + "\n".join(
        f"{p}\t{i}" for p, i in sorted(vocab.items())
    )
    assert (
        hashlib.md5(blob.encode("utf-8")).hexdigest()
        == meta["tokenizer_hash"]
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc_id
            st.sampled_from(["ko", "en", "ja"]),         # lang
            st.integers(min_value=1, max_value=50),      # n tokens
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=400),
)
def test_token_budget_selection_property_matches_python_replay(
    spark, rows, budget
):
    """Property (r11): on ARBITRARY (doc_id, lang, n) tables the shared
    token_budget_selection rule equals a pure-Python replay — per-lang
    budget floor(round(sqrt(m)/ts, 6) x budget) (HALF_UP like Spark's
    round), docs filled in (md5-u32('mixtok|'||id), doc_id) order, a doc
    kept iff it STARTS inside the budget — and the whole-doc convention
    holds: kept token mass minus the last kept doc is strictly under the
    budget. This is the one definition both the batch sampler and the
    incremental manifest re-rank compose."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from topic_modeling_ajin_spark.operators.curation import (
        mixtok_u_expr,
        token_budget_selection,
    )

    d = spark.createDataFrame(
        rows, "doc_id long, lang string, n long"
    ).select("doc_id", "lang", "n", mixtok_u_expr())
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in token_budget_selection(d, budget=budget).collect()
    }

    # pure-python replay
    m: dict[str, int] = {}
    for _i, lang, n in rows:
        m[lang] = m.get(lang, 0) + n
    ts = sum(math.sqrt(v) for v in m.values())
    r6 = lambda x: float(  # noqa: E731 — Spark's HALF_UP round(…, 6)
        Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )
    b = {
        lang: math.floor(r6(math.sqrt(v) / ts) * budget)
        for lang, v in m.items()
    }
    u = lambda i: int(  # noqa: E731
        hashlib.md5(f"mixtok|{i}".encode()).hexdigest()[:8], 16
    )
    want = set()
    kept_mass: dict[str, list] = {}
    for lang in m:
        cum = 0
        for i, lg, n in sorted(
            (t for t in rows if t[1] == lang), key=lambda t: (u(t[0]), t[0])
        ):
            if cum < b[lang]:
                want.add((i, lang, n))
                kept_mass.setdefault(lang, []).append(n)
            cum += n
    assert got == want
    # whole-doc convention: total kept minus the LAST kept doc < budget
    for lang, ns in kept_mass.items():
        assert sum(ns) - ns[-1] < b[lang]


def test_manifest_never_silently_loses_unembedded_docs(spark, sf_dir, tmp_path):
    """r11 verdict task 1: the capstone manifest composes the
    FULL-coverage SemDeDup verdict, so a document with no embeddings
    row must appear in the manifest (hash-space kept) or be visibly
    dropped by a named gate — NEVER in neither (the r11 inner join on
    the table-space keep set made such docs vanish with no gate row,
    no funnel count, no card cell). Planted corpus: the sf tables with
    three manifest members' embeddings deleted."""
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.sources import load_table

    reg = load_all()
    # plant: strip the embeddings of three docs that ship at this SF
    planted = [
        r["doc_id"]
        for r in reg["training_corpus_manifest"]
        .fn(spark, sf_dir)
        .limit(3)
        .collect()
    ]
    assert len(planted) == 3
    d = str(tmp_path / "data")
    load_table(spark, sf_dir, "documents").write.parquet(
        f"{d}/documents.parquet"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(~emb["vec_id"].isin(planted)).write.parquet(
        f"{d}/embeddings.parquet"
    )

    full = {
        r["doc_id"]: (r["kept"], r["space"])
        for r in reg["semantic_dedup_full"].fn(spark, d).collect()
    }
    docs = [
        r["doc_id"]
        for r in load_table(spark, d, "documents").select("doc_id").collect()
    ]
    assert set(full) == set(docs), "every corpus doc gets a verdict"
    assert all(full[i][1] == "hash" for i in planted)

    man = {
        r["doc_id"]
        for r in reg["training_corpus_manifest"].fn(spark, d).collect()
    }
    # never-in-neither: each planted doc is in the manifest, or some
    # registered gate visibly accounts for it
    fr_keep = {
        r["doc_id"]
        for r in reg["curation_filter_report"]
        .fn(spark, d)
        .filter("keep")
        .collect()
    }
    keepers = {
        r["keeper"] for r in reg["fingerprint_dedup"].fn(spark, d).collect()
    }
    near_disc = {
        r["discard_doc_id"]
        for r in reg["near_dup_discard"].fn(spark, d).collect()
    }
    in_mix = {
        r["doc_id"] for r in reg["mixture_sample"].fn(spark, d).collect()
    }
    for i in planted:
        visible = (
            i in man
            or full[i][0] == 0
            or i not in fr_keep
            or i not in keepers
            or i in near_disc
            or i not in in_mix
        )
        assert visible, f"doc {i} vanished with no gate verdict"
    # and the funnel surfaces the fallback share as a first-class row
    fun = reg["curation_funnel"].fn(spark, d).collect()[0]
    assert fun["n_sem_hash_space"] == 3
    # coverage identity: the funnel's terminal stage IS the manifest size
    assert fun["n_mixed"] == len(man)


def test_funnel_hash_space_agrees_with_savings_report(spark, sf_dir):
    """The n_sem_hash_space coverage figure must be the SAME number in
    every face that reports it — the funnel, its by-source rollup, the
    data card, and dedup_savings_report all count docs whose SemDeDup
    verdict came from the hash-fallback space (r11 verdict task 1:
    'the manifest family must agree with dedup_savings_report')."""
    from topic_modeling_ajin_spark.registry import load_all

    reg = load_all()
    fun = reg["curation_funnel"].fn(spark, sf_dir).collect()[0]
    by_src = reg["curation_funnel_by_source"].fn(spark, sf_dir).collect()
    card = reg["corpus_data_card"].fn(spark, sf_dir).collect()[0]
    sav = reg["dedup_savings_report"].fn(spark, sf_dir).collect()[0]
    assert (
        fun["n_sem_hash_space"]
        == sum(r["n_sem_hash_space"] for r in by_src)
        == card["n_sem_hash_space"]
        == sav["n_sem_hash_space"]
    )


def test_export_token_shards_reranks_changed_snapshot(spark, tmp_path):
    """r12 ADVICE (medium): a same-session re-export after
    {out_dir}/manifest_tokens changed — exactly the per-snapshot
    cadence the incremental tail documents — must NOT serve the stale
    memoized curriculum rank: new snapshot docs would silently vanish
    through the inner phase join and survivors would keep stale
    phases. The memo is keyed on snapshot identity (row count +
    order-free doc_id hash), so the second export re-ranks the
    manifest it just read."""
    from topic_modeling_ajin_spark.operators.curation import (
        export_token_shards,
    )

    d = str(tmp_path / "data")
    spark.createDataFrame(
        [
            (
                i,
                "en",
                "src",
                "the is " + " ".join(f"w{i}x{j}" for j in range(6)),
            )
            for i in range(1, 10)
        ],
        "doc_id long, lang string, source string, text string",
    ).write.parquet(f"{d}/documents.parquet")
    out = str(tmp_path / "exp")

    def write_mt(ids):
        spark.createDataFrame(
            [(i, "en", round(1.0 - i / 100.0, 6), 6 + i) for i in ids],
            "doc_id long, lang string, quality double, n_bpe_tokens long",
        ).write.mode("overwrite").parquet(f"{out}/manifest_tokens")

    write_mt(range(1, 7))
    export_token_shards(spark, d, out)
    got1 = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/token_shards").collect()
    }
    assert got1 == set(range(1, 7))

    # SAME session, SAME out_dir, changed snapshot: 3 new docs
    write_mt(range(1, 10))
    export_token_shards(spark, d, out)
    rows = spark.read.parquet(f"{out}/token_shards").collect()
    assert {r["doc_id"] for r in rows} == set(range(1, 10)), (
        "new snapshot docs must never be silently absent from the shards"
    )
    # phases come from a FRESH rank over the new 9-doc snapshot:
    # floor(9 * 0.2) = 1 anneal doc, the quality-top doc 1
    phases = {r["doc_id"]: r["phase"] for r in rows}
    assert phases[1] == "anneal"
    assert all(phases[i] == "main" for i in range(2, 10))


def test_curriculum_phase_cuts_are_parameters(spark, tmp_path):
    """r12 verdict task 8: the curriculum schedule is a PARAMETER of
    curriculum_phases_for, not an edit of the rank rule. Over a fixed
    manifest (quality ties included): (1) every cut configuration's
    phase masses sum to N and match a pure-Python replay of the
    cumulative-fraction cut over (quality DESC, doc_id); (2) growing
    the anneal fraction only ever moves docs INTO anneal (monotone
    nesting — the rank rule is stable across fracs); (3) a three-phase
    decay ladder works through the same rule; (4) the default equals
    the registered ANNEAL_FRAC schedule; (5) bad configurations refuse
    loudly."""
    import pytest

    from topic_modeling_ajin_spark.operators.curation import (
        ANNEAL_FRAC,
        curriculum_phases_for,
    )

    n = 37
    rows = [(i, round(0.2 + ((i * 7) % 10) / 20.0, 6)) for i in range(n)]
    mt = spark.createDataFrame(rows, "doc_id long, quality double")
    key = ("test_curriculum_prop", "fixed")

    order = sorted(rows, key=lambda r: (-r[1], r[0]))

    def replay(phase_cuts, final="main"):
        want, lo, cum = {}, 0, 0.0
        for name, frac in phase_cuts:
            cum += frac
            hi = int(n * cum)
            for doc_id, _q in order[lo:hi]:
                want[doc_id] = name
            lo = hi
        for doc_id, _q in order[lo:]:
            want[doc_id] = final
        return want

    def got(phase_cuts, final="main"):
        return {
            r["doc_id"]: r["phase"]
            for r in curriculum_phases_for(
                mt, key, phase_cuts=phase_cuts, final_phase=final
            ).collect()
        }

    prev_anneal: set = set()
    for frac in (0.1, 0.2, 0.35, 0.5, 1.0):
        g = got((("anneal", frac),))
        assert len(g) == n  # masses sum to N
        assert g == replay((("anneal", frac),)), frac
        anneal = {d for d, p in g.items() if p == "anneal"}
        assert prev_anneal <= anneal, frac  # monotone nesting
        prev_anneal = anneal

    ladder = (("anneal", 0.1), ("mid", 0.3))
    g = got(ladder)
    assert len(g) == n and g == replay(ladder)
    assert {"anneal", "mid", "main"} == set(g.values())

    # the default IS the registered two-phase schedule
    assert got((("anneal", ANNEAL_FRAC),)) == {
        r["doc_id"]: r["phase"]
        for r in curriculum_phases_for(mt, key).collect()
    }

    for bad in (
        (("anneal", 0.0),),
        (("anneal", -0.1),),
        (("anneal", 0.6), ("mid", 0.6)),
        (("main", 0.2),),
    ):
        with pytest.raises(ValueError):
            curriculum_phases_for(mt, key, phase_cuts=bad)
