"""Unit tests for bench.py's measurement protocol logic (pure host code —
no device). The benchmark is the round's evidence chain; its statistics and
failure handling deserve the same guard rails as the library:

- _median_spread median/spread semantics,
- _difference_samples re-measures non-positive differences instead of
  clamping (advisor r04: a clamped 1e-9 silently corrupted the median) and
  raises loudly when jitter cannot be resolved,
- the default-invocation skip machinery never drops a metric silently.
"""

import json
import sys

import pytest

import bench


def test_median_spread_odd_even():
    median, spread = bench._median_spread([3.0, 1.0, 2.0])
    assert median == 2.0
    assert spread == 100.0  # (3-1)/2
    median, spread = bench._median_spread([1.0, 2.0, 3.0, 4.0])
    assert median == 2.5
    assert spread == 120.0  # (4-1)/2.5


def test_difference_samples_cancels_fixed_cost():
    # Simulated harness: fixed 30ms per call + 5ms/step; short chain n=10,
    # long 3n=30. The differencing must recover exactly 5ms/step.
    n = 10
    times = {"short": 0.030 + n * 0.005, "long": 0.030 + 3 * n * 0.005}
    calls = []

    def make(kind):
        def run(attempt=0):
            calls.append(kind)

            class Forcible(float):
                pass

            return Forcible(times[kind])

        return run

    real_timer = bench._timed_force
    bench._timed_force = lambda fn, attempt=0: fn(attempt)
    try:
        seconds, spread = bench._difference_samples(
            make("short"), make("long"), n, repeats=3
        )
    finally:
        bench._timed_force = real_timer
    assert abs(seconds - 0.005) < 1e-12
    assert spread == 0.0
    assert calls == ["short", "long"] * 3


def test_difference_samples_rejects_nonpositive():
    # Long chain never slower than short (pathological jitter): must raise
    # NonPositiveDifference, not return a clamped garbage number.
    real_timer = bench._timed_force
    bench._timed_force = lambda fn, attempt=0: fn(attempt)
    try:
        with pytest.raises(bench.NonPositiveDifference):
            bench._difference_samples(
                lambda attempt=0: 1.0, lambda attempt=0: 1.0, 10, repeats=3
            )
    finally:
        bench._timed_force = real_timer


def test_difference_samples_survives_occasional_jitter():
    # One bad (non-positive) pair among good ones is re-measured, and the
    # result comes from the good pairs only.
    sequence = iter([
        (1.0, 0.9),   # bad pair -> retried
        (1.0, 2.0),
        (1.0, 2.0),
        (1.0, 2.0),
    ])
    current = {}

    def short(attempt=0):
        current["pair"] = next(sequence)
        return current["pair"][0]

    def long(attempt=0):
        return current["pair"][1]

    real_timer = bench._timed_force
    bench._timed_force = lambda fn, attempt=0: fn(attempt)
    try:
        seconds, spread = bench._difference_samples(short, long, 10, repeats=3)
    finally:
        bench._timed_force = real_timer
    assert abs(seconds - 1.0 / 20.0) < 1e-12


def test_emit_skip_and_print_tail(capsys, monkeypatch):
    # The record-preservation tail: pending benches get explicit skip lines
    # and the headline prints LAST for the driver's single-line parse.
    monkeypatch.setattr(bench, "_environment_tag", lambda: "test")
    monkeypatch.setattr(
        bench, "_HEADLINE", {"metric": "headline", "value": 1.0}
    )
    monkeypatch.setattr(bench, "_PENDING", ["a_bench", "b_bench"])
    bench._print_tail(reason="unit test")
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [l["metric"] for l in lines] == [
        "a_bench_skipped", "b_bench_skipped", "headline",
    ]
    assert "unit test" in lines[0]["unit"]
    assert bench._PENDING == []


def test_default_schedule_names_are_unique_and_estimated():
    schedule = bench._default_schedule()
    names = [name for name, _, _, _ in schedule]
    assert len(names) == len(set(names)) == 7
    assert all(est > 0 for _, _, est, _ in schedule)


def test_difference_samples_remeasures_stall_outliers():
    # One sample absorbing a harness stall (100x the others) is discarded
    # and re-measured; the final set is consistent.
    pairs = iter([
        (1.0, 2.0),
        (1.0, 102.0),  # multi-minute tunnel stall in the long chain
        (1.0, 2.0),
        (1.0, 2.0),
    ])
    current = {}

    def short(attempt=0):
        current["pair"] = next(pairs)
        return current["pair"][0]

    def long(attempt=0):
        return current["pair"][1]

    real_timer = bench._timed_force
    bench._timed_force = lambda fn, attempt=0: fn(attempt)
    try:
        seconds, spread = bench._difference_samples(short, long, 10, repeats=3)
    finally:
        bench._timed_force = real_timer
    assert abs(seconds - 1.0 / 20.0) < 1e-12
    assert spread == 0.0


def test_difference_samples_remeasures_deflated_outliers():
    # A stall in the SHORT chain deflates one sample toward zero; the
    # filter must drop the small outlier, not evict the good samples.
    pairs = iter([
        (1.0, 2.0),
        (1.99, 2.0),  # stalled short chain -> near-zero positive diff
        (1.0, 2.0),
        (1.0, 2.0),
    ])
    current = {}

    def short(attempt=0):
        current["pair"] = next(pairs)
        return current["pair"][0]

    def long(attempt=0):
        return current["pair"][1]

    real_timer = bench._timed_force
    bench._timed_force = lambda fn, attempt=0: fn(attempt)
    try:
        seconds, spread = bench._difference_samples(short, long, 10, repeats=3)
    finally:
        bench._timed_force = real_timer
    assert abs(seconds - 1.0 / 20.0) < 1e-12
    assert spread == 0.0


def test_print_tail_with_unmeasured_headline(capsys, monkeypatch):
    # Killed before the headline completed: the record still ends with an
    # explicit headline-named skip line for the driver's last-line parse.
    monkeypatch.setattr(bench, "_environment_tag", lambda: "test")
    monkeypatch.setattr(bench, "_HEADLINE", None)
    monkeypatch.setattr(bench, "_PENDING", ["a_bench"])
    bench._print_tail(reason="unit test")
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [l["metric"] for l in lines] == [
        "a_bench_skipped", "nerf_render_rays_per_sec_per_chip_skipped",
    ]
