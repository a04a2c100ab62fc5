"""Unit tests for bench.py's scaling-pair validity logic (no Spark).

The scaling protocol's post-hoc T_lo band is the piece that decides
which measured pairs count as evidence, so it is pinned here against
the two recorded failure modes:

- relative: a single drifted lo leg inside an otherwise-stable session
  (observed T2=118.6 s pair "scoring" 0.912);
- absolute: a whole session of inflated lo legs that the
  median-relative check cannot see (campaign-6: T_2 = 87-106 s, all
  "in band" relative to the session median, scoring 0.842/0.876 where
  the cross-round job constant would read ~0.73).
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

KEY = "local[2]"


def _pair(t_lo: float, clean: bool = True) -> dict:
    return {KEY: {"sec": t_lo}, "clean": clean}


def test_relative_band_kills_single_drifted_leg():
    pairs = [_pair(82.0), _pair(83.5), _pair(118.6), _pair(81.0), _pair(84.0)]
    _bench._apply_tlo_band(pairs, KEY)
    assert [p["t_lo_in_band"] for p in pairs] == [True, True, False, True, True]
    assert pairs[2]["clean"] is False


def test_relative_band_alone_misses_inflated_session():
    # campaign-6 attempt 7's actual lo legs: every one inflated vs the
    # 76.7-92.7 s cross-round constant, yet all within 7% of the
    # session median -> the relative check alone passes them
    legs = [106.09, 87.39, 98.93, 93.48, 96.23, 102.45]
    pairs = [_pair(t) for t in legs]
    _bench._apply_tlo_band(pairs, KEY)
    # the 0.842/0.876 pairs (96.23, 102.45) survive the relative check
    assert pairs[4]["t_lo_in_band"] is True
    assert pairs[5]["t_lo_in_band"] is True


def test_absolute_band_invalidates_inflated_session():
    legs = [106.09, 87.39, 98.93, 93.48, 96.23, 102.45]
    pairs = [_pair(t) for t in legs]
    _bench._apply_tlo_band(pairs, KEY, abs_band="73,93")
    # only the 87.39 leg sits inside the job constant, but it already
    # fails the relative band (session median ~97.6); nothing survives
    assert all(p["t_lo_in_band"] is False for p in pairs)
    assert all(p["clean"] is False for p in pairs)


def test_absolute_band_keeps_constant_session_clean():
    # a session at the recorded job constant passes both checks
    legs = [84.28, 82.02, 86.82, 80.93, 85.07]
    pairs = [_pair(t) for t in legs]
    _bench._apply_tlo_band(pairs, KEY, abs_band="73,93")
    assert all(p["t_lo_in_band"] for p in pairs)
    assert all(p["clean"] for p in pairs)


def test_band_preserves_prior_bracket_verdict():
    # a leg in both bands must not resurrect a bracket-failed pair
    pairs = [_pair(82.0, clean=False), _pair(83.0), _pair(84.0)]
    _bench._apply_tlo_band(pairs, KEY, abs_band="73,93")
    assert pairs[0]["t_lo_in_band"] is True
    assert pairs[0]["clean"] is False
