"""Attribute the cold corpus_data_card cost: clear all memos/caches, then
execute each composed registered sub-query sequentially via the noop sink.
Because every verdict table memoizes, the sequence reproduces the cold card
build while attributing wall time per component.

Usage: python tools/profile_card_cold.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CHAIN = (
    "quality_score",
    "fingerprint_dedup",
    "near_dup_discard",
    "doc_decontam",
    "curation_filter_report",
    "training_corpus_manifest",
    "semantic_dedup_full",
    "semdedup_recall_eval",
    "semdedup_hash_recall_eval",
    "doc_winnow_boilerplate",
    "strip_savings_report",
    "training_corpus_manifest_winnow",
    "training_corpus_manifest_decontam",
    "training_corpus_manifest_stripped",
    "training_corpus_manifest_tokens",
    "curation_funnel_tokens",
    "corpus_data_card",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = tuple(sys.argv[2:]) or DEFAULT_CHAIN
    from topic_modeling_ajin_spark.cache import clear_caches
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.session import get_spark

    registry = load_all()
    spark = get_spark("profile-card-cold")
    # warm the session (codegen, parquet reader, python workers)
    spark.range(1).count()
    for name in names:
        registry[name].fn(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
    clear_caches(spark)
    spark.catalog.clearCache()
    total = 0.0
    for name in names:
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:42s} {dt:8.2f}s  (cum {total:8.2f}s)", flush=True)


if __name__ == "__main__":
    main()
