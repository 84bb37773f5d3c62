"""End-to-end analysis pipelines — the engine's equivalents of the
reference's top-level entry points (SURVEY §3):

- ``run_word_frequency`` ≙ ``python preprocessing.py`` (§3.1,
  ``preprocessing.py:641-719``);
- ``run_full_analysis`` ≙ ``BERTopic_LDA_usage.py`` (§3.2,
  ``BERTopic_LDA_usage.py:20-69``): both topic branches — the c-TF-IDF
  (BERTopic-shape) path and the MLlib-LDA path — over one shared corpus,
  plus the metric suite and composed reports.

Every stage is a registry operator; this module only sequences them and
writes the outputs (parquet tables + a text report). Nothing here collects
more than K-row report tables to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .registry import load_all
from .report import render_text_report

# output name -> registry query, in dependency-friendly order
WORD_FREQUENCY_OUTPUTS = (
    "word_count",
    "word_freq_stats",
    "analysis_summary",
    "dedup_exact",
)

FULL_ANALYSIS_OUTPUTS = (
    # BERTopic-shape branch (c-TF-IDF over cluster labels)
    "ctfidf_keywords",
    "ctfidf_dedup_keywords",
    "topic_labels",
    "topic_info",
    "topic_representative_docs",
    # LDA branch
    "lda_topic_terms",
    "lda_doc_topics",
    # shared metric suite
    "topic_diversity",
    "topic_jaccard_overlap",
    "topic_cosine_similarity",
    "umass_coherence",
    "npmi_coherence",
    "cv_coherence",
)


def _write_outputs(
    spark: SparkSession, sf_dir: str, out_dir: str, names: tuple[str, ...]
) -> dict[str, str]:
    registry = load_all()
    written: dict[str, str] = {}
    for name in names:
        path = os.path.join(out_dir, name)
        registry[name].fn(spark, sf_dir).write.mode("overwrite").parquet(path)
        written[name] = path
    return written


def run_word_frequency(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """§3.1: scan → clean → tokenize → count → stats → sinks (word
    frequency workbook + text report)."""
    written = _write_outputs(spark, sf_dir, out_dir, WORD_FREQUENCY_OUTPUTS)
    report_path = os.path.join(out_dir, "analysis_report.txt")
    render_text_report(spark, sf_dir, report_path)
    written["analysis_report"] = report_path
    return written


def run_full_analysis(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """§3.2: the combined topic-modeling run — both branches + metrics +
    reports + figures, every tabular output a parquet table keyed by its
    operator name."""
    written = run_word_frequency(spark, sf_dir, out_dir)
    written.update(_write_outputs(spark, sf_dir, out_dir, FULL_ANALYSIS_OUTPUTS))
    written.update(run_visual_report(spark, sf_dir, os.path.join(out_dir, "figures")))
    return written


def run_visual_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """The reference's figure pass (``create_visualizations``,
    ``BERTopic_Analysis.py:730-833``; ``LDA_Analysis.py:614-677``): render
    every artifact family from the same registry outputs into SVG files
    plus one bundled HTML report — driver-side over K-row aggregates, via
    the stdlib-only S9 sinks."""
    from pyspark.sql import functions as F

    from . import plots

    registry = load_all()
    os.makedirs(out_dir, exist_ok=True)
    sections = []
    written: dict[str, str] = {}

    def render(name: str, svg: str) -> None:
        path = os.path.join(out_dir, f"{name}.svg")
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
        written[name] = path

    wf = plots.plot_word_frequency(
        registry["word_count"].fn(spark, sf_dir), count_col="cnt", top_n=20
    )
    render("word_frequency", wf)
    sections.append(("Word frequencies", wf))

    tk = plots.plot_topic_keywords(
        registry["ctfidf_keywords"].fn(spark, sf_dir),
        topic_col="label", word_col="keyword", weight_col="weight",
    )
    render("topic_keywords", tk)
    sections.append(("Topic keywords", tk))

    td = plots.plot_topic_distribution(
        registry["topic_info"].fn(spark, sf_dir).select(
            F.col("label").alias("topic"), "n_docs"
        )
    )
    render("topic_distribution", td)
    sections.append(("Documents per topic", td))

    hm = plots.plot_topic_heatmap(
        registry["topic_cosine_similarity"].fn(spark, sf_dir),
        row_col="i", col_col="j", value_col="cosine",
    )
    render("topic_heatmap", hm)
    sections.append(("Topic similarity", hm))

    dg = plots.plot_topic_hierarchy(
        registry["topic_merge_steps"].fn(spark, sf_dir),
        registry["topic_reduction"].fn(spark, sf_dir),
    )
    render("topic_hierarchy", dg)
    sections.append(("Topic hierarchy", dg))

    html = os.path.join(out_dir, "report.html")
    plots.export_html_report(html, sections)
    written["report_html"] = html
    return written
