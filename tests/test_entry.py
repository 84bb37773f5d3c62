"""Driver-contract smoke tests: entry() runs, every registered query runs at
sf0.001 and returns a stable, non-degenerate result."""

from __future__ import annotations

import importlib


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_module().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"word", "cnt"}
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_queries_and_oracles_align(spark):
    mod = _entry_module()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_all_queries_run_sf0001(spark, sf_dir):
    mod = _entry_module()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # plan executes
