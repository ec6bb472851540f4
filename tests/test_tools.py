"""Unit tests for the measurement tooling (no Spark session needed).

The scaling evidence pipeline's summary math is load-bearing: a silent
regression there would mis-gate BENCH_scaling.json for a whole round, so
summarize_trail is a pure function pinned here against hand-computed
trails."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_interleaved import summarize_trail  # noqa: E402


def _pair(i, w4, w16, spin4=2500.0, spin16=2500.0, discarded=False):
    """Synthetic trail record with the fields summarize_trail reads.
    norm_eff/silicon_ratio are derived exactly as the coordinator does."""
    silicon = (16 * spin16) / (4 * spin4)
    speedup = w4 / w16
    return {
        "pair": i,
        "discarded": discarded,
        "wall4": w4,
        "wall16": w16,
        "spin4": {"per_core_mean": spin4, "aggregate": 4 * spin4},
        "spin16": {"per_core_mean": spin16, "aggregate": 16 * spin16},
        "silicon_ratio": silicon,
        "raw_eff": speedup / 4,
        "norm_eff": speedup / silicon,
    }


def test_summarize_clean_window():
    """Uniform grants, perfect 4x engine: every estimator reads 1.0 and
    nothing is weather-rejected."""
    trail = [_pair(0, 40.0, 10.0, discarded=True)] + [
        _pair(i, 40.0, 10.0) for i in range(1, 6)
    ]
    s = summarize_trail(trail, turns=1_000_000, lo=4, hi=16)
    assert s["eff_gate"] == pytest.approx(1.0)
    assert s["eff_min"] == pytest.approx(1.0)
    assert s["raw_eff_windowed"] == pytest.approx(1.0)
    assert s["n_valid"] == 5 and s["n_rejected"] == 0
    assert s["min_wall"] == {4: 40.0, 16: 10.0}


def test_summarize_discarded_pairs_never_count():
    """The warm pair is excluded from every statistic, even when it is the
    extreme value."""
    trail = [_pair(0, 400.0, 100.0, discarded=True)] + [
        _pair(i, 40.0, 12.0) for i in range(1, 4)
    ]
    s = summarize_trail(trail, turns=1_000_000, lo=4, hi=16)
    assert s["min_wall"] == {4: 40.0, 16: 12.0}
    assert s["n_valid"] == 3


def test_summarize_weather_rejection():
    """A silicon-revocation pair (10x wall at ONE level, seconds from 1x
    walls) is excluded from the gate but stays in min/median reporting —
    the exact shape measured on this host (w16 7.7s -> 78-100s at stable
    w4)."""
    good = [_pair(i, 30.0, 9.0) for i in range(3)]
    revoked = _pair(3, 30.0, 90.0)  # 16-wide silicon revoked
    s = summarize_trail(good + [revoked], turns=8_000_000, lo=4, hi=16)
    assert s["n_rejected"] == 1 and s["n_valid"] == 3
    assert s["eff_gate"] == pytest.approx(good[0]["norm_eff"])
    # the revoked pair still drags the MEDIAN statistics (reported, not gated)
    assert s["med_wall"][16] > 9.0 or len(good) % 2 == 1


def test_summarize_burst_normalization():
    """The narrow level running on 1.4x-burst cores is divided out: raw
    efficiency reads 0.714 but the spin probes saw the burst, so the
    normalized gate reads 1.0 (a real cluster gives both sizes the same
    per-core silicon)."""
    # 4c cores bursting 1.4x: spin4 3500 vs spin16 2500; engine perfect ->
    # w4 = 40/1.4 = 28.57, w16 = 10.0
    trail = [_pair(i, 40.0 / 1.4, 10.0, spin4=3500.0) for i in range(3)]
    s = summarize_trail(trail, turns=1_000_000, lo=4, hi=16)
    assert s["raw_eff_windowed"] == pytest.approx(1 / 1.4, rel=1e-3)
    assert s["eff_gate"] == pytest.approx(1.0, rel=1e-3)


def test_summarize_reproduces_shipped_artifact():
    """The committed BENCH_scaling.json gate numbers must be exactly what
    summarize_trail computes from the stored per-pair trail (the artifact
    is the function's output, not hand-edited)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_scaling.json",
    )
    runs = json.load(open(path))["runs"]
    r = runs.get("heavy_4_16_interleaved")
    if r is None or "per_pair" not in r:
        pytest.skip("no interleaved run in the artifact")
    s = summarize_trail(r["per_pair"], r["turns"], 4, 16)
    assert round(s["eff_gate"], 3) == r["scaling_efficiency"]
    assert round(s["eff_min"], 3) == r["scaling_efficiency_min_walls"]
    assert s["n_valid"] == r["weather_valid_pairs"]
    assert s["n_rejected"] == r["weather_rejected_pairs"]
