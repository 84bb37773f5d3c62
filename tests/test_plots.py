"""S9 plot sinks: the dependency-free SVG/HTML renderers, fed by the
engine's real reduced query outputs at sf0.001 — parse the XML back and
assert the geometry encodes the data."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from topic_modeling_ajin_spark import plots
from topic_modeling_ajin_spark.registry import load_all

SVG = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _root(svg: str) -> ET.Element:
    return ET.fromstring(svg)  # raises on malformed XML


def _bars(root: ET.Element):
    return [e for e in root.iter(f"{SVG}path") if e.get("fill") == plots.SERIES]


def test_word_frequency_bars_encode_counts(spark, sf_dir, registry, tmp_path):
    out = tmp_path / "wf.svg"
    svg = plots.plot_word_frequency(
        registry["word_count"].fn(spark, sf_dir), out, count_col="cnt", top_n=10
    )
    root = _root(svg)
    bars = _bars(root)
    assert len(bars) == 10
    assert out.read_text() == svg
    # bar heights (from the path's baseline minus top y) must be
    # non-increasing left to right — the data is sorted by count desc
    tops = [float(b.get("d").split("L")[1].split(",")[1].split()[0]) for b in bars]
    assert tops == sorted(tops)  # larger count -> smaller top y
    # every mark carries a tooltip
    assert all(b.find(f"{SVG}title") is not None for b in bars)


def test_topic_keyword_panels_one_per_topic(spark, sf_dir, registry):
    df = registry["ctfidf_keywords"].fn(spark, sf_dir)
    svg = plots.plot_topic_keywords(
        df, topic_col="label", word_col="keyword", weight_col="weight"
    )
    root = _root(svg)
    expected = {f"Topic {r['label']}" for r in df.select("label").distinct().collect()}
    headings = [t for t in root.iter(f"{SVG}text") if (t.text or "") in expected]
    assert len(headings) == len(expected)
    assert len(_bars(root)) == df.count()


def test_topic_distribution_labels_every_bar(spark, sf_dir, registry):
    from pyspark.sql import functions as F

    df = registry["topic_info"].fn(spark, sf_dir).select(
        F.col("label").alias("topic"), "n_docs"
    )
    svg = plots.plot_topic_distribution(df)
    root = _root(svg)
    k = df.count()
    assert len(_bars(root)) == k
    counts = {str(r["n_docs"]) for r in df.collect()}
    texts = {t.text for t in root.iter(f"{SVG}text")}
    assert counts <= texts  # every count printed on its bar


def test_heatmap_cells_and_ramp(spark, sf_dir, registry):
    df = registry["topic_cosine_similarity"].fn(spark, sf_dir)
    svg = plots.plot_topic_heatmap(
        df, row_col="i", col_col="j", value_col="cosine"
    )
    root = _root(svg)
    cells = [
        e for e in root.iter(f"{SVG}rect") if e.get("fill") in plots.SEQ_RAMP
    ]
    assert len(cells) == df.count()
    # the diagonal is cosine=1.0 -> darkest ramp step
    assert any(e.get("fill") == plots.SEQ_RAMP[-1] for e in cells)


def test_topic_map_marker_per_topic(spark):
    rows = [(0, 0.1, 0.9, 120), (1, -0.4, 0.2, 80), (2, 0.7, -0.3, 40)]
    df = spark.createDataFrame(rows, ["label", "x", "y", "n_docs"])
    svg = plots.plot_topic_map(df, size_col="n_docs")
    root = _root(svg)
    circles = list(root.iter(f"{SVG}circle"))
    assert len(circles) == 3
    # radius scales with topic size
    rads = [float(c.get("r")) for c in circles]
    assert rads[0] > rads[1] > rads[2]
    labels = {t.text for t in root.iter(f"{SVG}text")}
    assert {"T0", "T1", "T2"} <= labels


def test_row_cap_guards_driver(spark):
    big = spark.range(plots.MAX_ROWS + 1).selectExpr(
        "cast(id as string) as word", "id as cnt"
    )
    with pytest.raises(ValueError, match="cluster-reduced"):
        plots.plot_word_frequency(big, count_col="cnt")


def test_html_report_bundles_sections(spark, sf_dir, registry, tmp_path):
    svg = plots.plot_word_frequency(
        registry["word_count"].fn(spark, sf_dir), count_col="cnt", top_n=5
    )
    out = tmp_path / "report.html"
    html = plots.export_html_report(out, [("Word frequencies", svg)])
    assert out.read_text() == html
    assert "<h2>Word frequencies</h2>" in html and "<svg" in html


def test_hierarchy_dendrogram_from_merge_log(spark, sf_dir, registry):
    steps = registry["topic_merge_steps"].fn(spark, sf_dir)
    mapping = registry["topic_reduction"].fn(spark, sf_dir)
    svg = plots.plot_topic_hierarchy(steps, mapping)
    root = _root(svg)
    n_leaves = mapping.count()
    leaf_labels = [
        t for t in root.iter(f"{SVG}text")
        if (t.text or "").startswith("T") and (t.text or "")[1:].isdigit()
    ]
    assert len(leaf_labels) == n_leaves
    # one horizontal bridge (carrying the merge tooltip) per merge step
    bridges = [
        e for e in root.iter(f"{SVG}line")
        if e.find(f"{SVG}title") is not None
    ]
    assert len(bridges) == steps.count()


def test_visual_report_pipeline_writes_all_figures(spark, sf_dir, tmp_path):
    from topic_modeling_ajin_spark.pipeline import run_visual_report

    written = run_visual_report(spark, sf_dir, str(tmp_path / "viz"))
    assert set(written) == {
        "word_frequency", "topic_keywords", "topic_distribution",
        "topic_heatmap", "topic_hierarchy", "report_html",
    }
    import os

    for name, path in written.items():
        assert os.path.getsize(path) > 0, name
        if path.endswith(".svg"):
            _root(open(path, encoding="utf-8").read())  # valid XML
