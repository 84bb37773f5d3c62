"""Property tests for the pure-Python plot-sink helpers (no Spark)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from topic_modeling_ajin_spark.plots import _fmt, _ticks


@given(st.floats(min_value=1e-6, max_value=1e12, allow_nan=False))
def test_ticks_cover_and_ascend(vmax):
    ticks = _ticks(vmax)
    assert ticks[0] == 0.0
    assert ticks[-1] >= vmax * (1 - 1e-9)  # axis always covers the data
    assert all(a < b for a, b in zip(ticks, ticks[1:]))
    assert len(ticks) <= 12  # recessive axis: a handful of round ticks


@given(st.integers(min_value=0, max_value=10**12))
def test_fmt_integers_have_no_decimal_point(n):
    assert "." not in _fmt(n)
    assert "." not in _fmt(float(n))


@given(st.floats(min_value=0.0001, max_value=0.9999, allow_nan=False))
def test_fmt_fractions_round_to_3dp(x):
    s = _fmt(x)
    assert len(s.split(".")[-1]) <= 3
