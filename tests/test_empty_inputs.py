"""Empty-input robustness: a pipeline that crashes on an empty partition
or a fresh (zero-row) table can't run unattended at 100 TB. Every
corpus-shaped operator here must return an EMPTY result, not raise.

Out of scope by design: model-fitting ops that assert a minimum corpus
(topic_reduction's fixed-label oracle guard, MLlib fits on empty input).
"""

from __future__ import annotations

import pytest

from topic_modeling_ajin_spark.registry import load_all
from topic_modeling_ajin_spark.sources import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# corpus-shaped queries that must degrade to zero rows on zero input
EMPTY_SAFE = (
    "word_count",
    "dedup_exact",
    "fingerprint_dedup",
    "minhash_lsh_pairs",
    "simhash16",
    "quality_score",
    "tfidf_top_terms",
    "langid_heuristic",
    "token_stats",
    "events_hourly",
    "sessionize_events",
    "ewma_daily_events",
    "event_transition_matrix",
    "scd2_user_status",
    "cohort_retention",
    "train_val_test_split",
    "cms_word_counts",
    "pack_sequences",
    "chunk_documents",
    "stratified_sample",
    "q1_pricing_summary",
    "embed_documents",
    "ngram_novelty",
    "collocations",
    "hard_negatives",
    "daily_anomalies",
    "event_trigram_sequences",
    "edit_distance_pairs",
    "source_distinctive_terms",
    "domain_cap_sample",
    "dsir_logweights",
    "dsir_select",
    "source_js_divergence",
    "ccnet_ppl_buckets",
    "mixture_temperature_plan",
    "unigram_lm_vocab",
    "unigram_lm_segment",
    "unigram_token_counts",
    "domain_cap_salted",
    "pack_sequences_unigram",
    # r10 additions
    "near_dup_discard",
    "hot_shingles",
    "bpe_piece_vocab",
    "doc_token_ids",
    "semantic_decontam",
    "semantic_decontam_full",
    "contamination_by_source",
    "corpus_data_card_by_source",
    # r11 additions
    "mixture_token_fill_report",
    "tokenizer_unmerged_report",
    "langid_confusion",
    "doc_pii_report",
)
# Also excluded (r11): tokenizer_card (one-row global fingerprint — a
# hash of the empty merge/piece tables is still one row, correct);
# semantic_dedup_full / semantic_dedup_by_space / token_shard_balance
# compose the Lloyd/SemDeDup model fit, excluded like every model fit.
# Also excluded (r12): pack_sequences_phases (composes the manifest's
# model fits, same class) and semdedup_hash_recall_eval (one-row global
# harness — the empty tail IS its recall-1.0-by-convention row).
# Also excluded (r10): jaccard_threshold_sweep and
# dup_cluster_size_histogram emit their never-silent sentinel/singleton
# row even on empty input (deliberate — the guard's activity and the
# singleton count must never vanish), and mixture_policy_overlap is a
# one-row global aggregate.
# Also excluded: k_anonymity_report and vocab_drift (global aggregates -> one
# NULL-stat row on empty input, correct SQL semantics), and the PQ/IVF-PQ
# codebook fits (a model fit on zero vectors is undefined, like MLlib fits).
# NOT in the list: q6_forecast_revenue and other global (no-GROUP BY)
# aggregates — SQL semantics give them exactly one all-NULL/0 row on empty
# input, which is correct, not a robustness failure.


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(0).write.parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_empty_input_yields_empty_output(spark, empty_sf_dir, name):
    df = load_all()[name].fn(spark, empty_sf_dir)
    assert df.count() == 0


# text operators that must tolerate NULL text values (crawls deliver them)
NULL_TEXT_SAFE = (
    "word_count",
    "dedup_exact",
    "fingerprint_dedup",
    "quality_score",
    "tfidf_top_terms",
    "minhash_lsh_pairs",
    "langid_heuristic",
    "cms_word_counts",
    "pack_sequences",
    "train_val_test_split",
    "embed_documents",
    "domain_cap_sample",
    "dsir_logweights",
    "source_js_divergence",
    # r10 additions
    "near_dup_discard",
    "doc_token_ids",
    "semantic_decontam_full",
)


@pytest.fixture(scope="module")
def nulls_sf_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 with a third of document texts nulled out."""
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        df.write.parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", NULL_TEXT_SAFE)
def test_null_texts_do_not_crash(spark, nulls_sf_dir, name):
    # must execute without raising; rows from the non-null majority remain
    load_all()[name].fn(spark, nulls_sf_dir).count()
