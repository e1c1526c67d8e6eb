"""Pure-helper tests for bench.py's scoreboard machinery.

The heavy measurement paths need the real chip (the driver runs them);
these pin the host-side math that decides WHAT gets published: the
median/spread estimator every rate goes through, and the per-device-kind
canary floor that gates the headline behind the degraded flag
(VERDICT r4 #1 — the r04 20x scoreboard artifact).
"""

import importlib.util
import os

import pytest


@pytest.fixture(scope='module')
def bench():
    # bench.py lives at the repo root (not importable as a package
    # member); load it by path without executing main().
    path = os.path.join(os.path.dirname(__file__), '..', 'bench.py')
    spec = importlib.util.spec_from_file_location('bench', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_median_spread_odd(bench):
    med, spread = bench._median_spread([3.0, 1.0, 2.0])
    assert med == 2.0
    assert spread == pytest.approx((3.0 - 1.0) / 2.0)


def test_median_spread_constant(bench):
    med, spread = bench._median_spread([5.0, 5.0, 5.0])
    assert med == 5.0 and spread == 0.0


def test_median_spread_even_takes_upper(bench):
    # len//2 indexes the upper of the two middles — pinned so a future
    # edit can't silently change which sample the headline reports
    med, _ = bench._median_spread([1.0, 2.0, 3.0, 4.0])
    assert med == 3.0


def test_median_spread_outlier_robust(bench):
    # one straggler (tunnel hiccup) must not move the published value
    med, spread = bench._median_spread([9.0, 10.0, 11.0, 10.5, 100.0])
    assert med == 10.5
    assert spread > 5  # ... but it MUST show in the spread


@pytest.mark.parametrize('kind,floor', [
    ('TPU v5 lite', 49.0),     # the harness chip's exact spelling
    ('TPU v5litepod-8', 49.0),
    ('tpu v5e', 49.0),
    ('TPU v5p', 115.0),
    ('TPU v5', 49.0),          # bare v5 falls to the conservative floor
    ('TPU v4', 69.0),
    ('TPU v6e', 230.0),
    ('Trillium', 230.0),
])
def test_canary_floor_known_kinds(bench, kind, floor):
    assert bench._canary_floor(kind) == floor


def test_canary_floor_unknown_kind_catastrophic_only(bench):
    # an unexpected device string must not disable the gate entirely —
    # it falls to a floor that still catches the measured r04 mode
    # (20x down from ~180 TFLOP/s)
    assert bench._canary_floor('TPU v99 hyperpod') == 10.0


def test_canary_floor_below_healthy_readings(bench):
    # floors must sit well under healthy measurements (v5e measured
    # 179-207 TFLOP/s on this chip) and well over the r04 degraded
    # reading (~1/20 of healthy)
    healthy_v5e = 179.0
    assert bench._canary_floor('TPU v5 lite') < healthy_v5e * 0.5
    assert bench._canary_floor('TPU v5 lite') > healthy_v5e / 20 * 2
