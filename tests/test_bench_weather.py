"""Pins for the weather-aware bench protocol (r12 verdict task #3).

The r12 driver bench passed the 2.0 calibration-spread gate yet every
family — including ones that round never touched — sat a uniform
1.18-1.37x over its quiet-ledger minimum (median 1.259): machine
weather published as a 23% headline excursion. ``bench.weather_factor``
(median family ``vs_best_common``) detects exactly that shape; these
pins replay the r12 numbers against it.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402

# family -> vs_best_common from the r12 driver bench (BENCH_LOCAL.json
# dropped by that run) — the uniform-weather run the old protocol
# certified quiet.
R12_DRIVER_FAMILIES = {
    "asof": 1.369,
    "cdc": 1.282,
    "corpus": 1.259,
    "dedup": 1.267,
    "delta": 1.236,
    "events": 1.359,
    "iceberg": 1.253,
    "mm": 1.264,
    "percentiles": 1.218,
    "salted": 1.233,
    "sim": 1.326,
    "stream": 1.259,
    "text": 1.233,
    "topk": 1.176,
    "tpch": 1.365,
    "vocab": 1.241,
    "window": 1.396,
}


def _as_budgets(ratios: dict[str, float]) -> dict[str, dict]:
    return {f: {"sec": 1.0, "vs_best_common": r, "n": 1} for f, r in ratios.items()}


def test_r12_driver_run_would_have_been_flagged():
    wf = bench.weather_factor(_as_budgets(R12_DRIVER_FAMILIES))
    assert wf is not None and wf > bench.WEATHER_THRESHOLD, wf


def test_quiet_run_not_flagged():
    quiet = {f: 1.0 + 0.01 * i for i, f in enumerate(sorted(R12_DRIVER_FAMILIES))}
    wf = bench.weather_factor(_as_budgets(quiet))
    assert wf is not None and wf <= bench.WEATHER_THRESHOLD, wf


def test_single_family_regression_not_weather():
    """One genuinely regressed family must NOT read as weather — the
    per-family budget gate owns that case; the median shrugs it off."""
    ratios = {f: 1.02 for f in R12_DRIVER_FAMILIES}
    ratios["delta"] = 3.0
    wf = bench.weather_factor(_as_budgets(ratios))
    assert wf is not None and wf <= bench.WEATHER_THRESHOLD, wf


def test_no_ledger_history_is_none():
    assert bench.weather_factor({}) is None
    assert (
        bench.weather_factor({"x": {"sec": 1.0, "vs_best_common": None, "n": 1}})
        is None
    )
