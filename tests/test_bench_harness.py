"""bench.py harness behavior that must not regress silently.

The driver records the round from bench's stdout JSON; a Pallas Mosaic
lowering failure on the real chip must degrade that record (XLA
fallbacks + note), never erase it.  These tests exercise the fallback
plumbing without a chip.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench


def test_bench_safe_retries_with_pallas_disabled(monkeypatch):
    from gstpeaq_tpu.ops import fb_ear, iir

    # pin current flag values so the test's _disable_pallas mutation is
    # rolled back on teardown (module state leaks into other tests)
    monkeypatch.setattr(iir, "USE_PALLAS", iir.USE_PALLAS)
    monkeypatch.setattr(fb_ear, "USE_PALLAS_SPREAD", fb_ear.USE_PALLAS_SPREAD)
    monkeypatch.setattr(fb_ear, "USE_PALLAS_DC", fb_ear.USE_PALLAS_DC)

    calls = []

    def fake_bench(**kw):
        calls.append(dict(kw))
        if len(calls) == 1:
            raise RuntimeError("Mosaic failed to lower")
        assert iir.USE_PALLAS is False, "retry must run with kernels off"
        return [123.0, 125.0]

    monkeypatch.setattr(bench, "bench", fake_bench)
    rates, note = bench.bench_safe(advanced=False, batch=8)
    assert rates == [123.0, 125.0]
    assert "Mosaic failed to lower" in note
    assert len(calls) == 2 and calls[0] == calls[1]
    assert fb_ear.USE_PALLAS_SPREAD is False
    assert fb_ear.USE_PALLAS_DC is False


def test_bench_safe_passthrough_on_success(monkeypatch):
    # bench() returns a list of per-repeat rates; bench_safe must pass the
    # list through unchanged (the caller computes min/median/max)
    monkeypatch.setattr(bench, "bench", lambda **kw: [42.0, 43.0])
    rates, note = bench.bench_safe(advanced=True)
    assert rates == [42.0, 43.0] and note is None


def test_spread_fields_reports_median_and_extremes():
    sp = bench.spread_fields([9500.0, 9100.0, 9800.0])
    assert sp == {"value": 9500.0, "spread": [9100.0, 9800.0],
                  "n_repeats": 3}
    sp2 = bench.spread_fields([100.0, 200.0])
    assert sp2["value"] == 150.0
    sp1 = bench.spread_fields([7.0])
    assert sp1["value"] == 7.0 and sp1["spread"] == [7.0, 7.0]
