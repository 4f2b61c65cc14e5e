"""Benchmark harness: PEAQ throughput on the current accelerator.

Prints the headline JSON line FIRST and again LAST (round-2 showed the
driver parses the LAST stdout JSON line; emitting the identical headline
record in both positions is safe under either parser):
  {"metric": "audio-seconds/sec/chip (basic PEAQ, batch 64)",
   "value": N, "unit": "audio-sec/s", "vs_baseline": N / 6400}
Between them, one JSON line each for the advanced mode and the accurate
("mixed") tier, so every tier the north star cares about is
machine-tracked round over round.  Commentary goes to stderr.

Baseline normalization: the BASELINE.json north star asks for >=100x
realtime per pair at batch 64 on one chip = 6400 audio-seconds/sec/chip
(the C reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_pairs(batch: int, seconds: float, channels: int = 2,
               seed: int = 0) -> tuple[list, list]:
    rng = np.random.default_rng(seed)
    n = int(seconds * 48000)
    t = np.arange(n, dtype=np.float64) / 48000.0
    # only 11 distinct harmonic stacks exist (f0 cycles i % 11): build
    # each base once — the per-pair tone loop made 1000-pair sweep-demo
    # generation an 18-minute affair on this 1-core host
    bases = {}
    for m in range(min(batch, 11)):
        f0 = 180.0 + 37.0 * m
        ref = np.zeros(n)
        test = np.zeros(n)
        k = 1
        while k * f0 < 15000.0:
            tone = np.sin(2 * np.pi * k * f0 * t + 0.3 * k) / k
            ref += tone
            if k * f0 < 10000.0:  # codec-like lowpass on the test signal
                test += tone
            k += 1
        bases[m] = (0.5 * ref, 0.5 * test)
    refs, tests = [], []
    for i in range(batch):
        ref, test = bases[i % 11]
        test = test + 1e-4 * rng.standard_normal(n)
        # channel-major storage returned as [T, C] transposed VIEWS: the
        # batch padder's channel-major writes then hit the contiguous
        # memcpy path (~8 GB/s) instead of the 2-column strided one
        # (~1.3 GB/s) — host prep, not the device, bounds sweep
        # throughput on few-core hosts
        refs.append(np.stack([ref] * channels, 0).astype(np.float32).T)
        tests.append(np.stack([test] * channels, 0).astype(np.float32).T)
    return refs, tests


def bench(advanced: bool, batch: int, seconds: float, dtype: str,
          iters: int = 5, microbatch: int = 32,
          repeats: int = 1) -> list[float]:
    """Steady-state throughput: `iters` batches are dispatched back to back
    and materialized only at the end, as a production sweep would run (the
    per-execute host round trip on this tunneled backend is ~33 ms; syncing
    between batches serializes it with device compute and understates the
    sustained rate by up to ~45%).

    Returns one rate per repeat (each repeat times its own pipelined group
    of `iters` batches): the tunnel wobbles run-to-run by up to ~10%, so a
    single number cannot distinguish a regression from noise — callers
    report min/median/max across repeats."""
    import jax
    from gstpeaq_tpu import constants as C
    from gstpeaq_tpu.parallel import batch as B

    refs, tests = make_pairs(batch, seconds)
    buckets = B.compute_buckets(refs, tests, advanced)
    arrays = B.prepare_chunk(refs, tests, buckets)
    mb = min(microbatch, batch)
    # advanced sig_pair is pair-outermost [2, B, ...]: batch axis is dim 1
    sl = lambda a, s: (a[:, s:s + mb] if advanced and a.ndim >= 4
                       else a[s:s + mb])
    chunks = [[jax.device_put(sl(a, s)) for a in arrays]
              for s in range(0, batch, mb)]
    if advanced:
        fn = B._jitted_advanced_batch(92.0, C.DEFAULT_SETTINGS, dtype,
                                      buckets[0], buckets[1])
    else:
        fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, dtype)
    np.asarray(fn(*chunks[0]).odg)  # compile + warm up
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.extend(fn(*ch) for ch in chunks)
        # host-materialize at the end: block_until_ready() does not reliably
        # synchronize on this backend (see CLAUDE.md)
        for o in outs:
            np.asarray(o.odg)
        dt = time.perf_counter() - t0
        rates.append(iters * batch * seconds / dt)
    return rates


def _disable_pallas() -> None:
    """Force every Pallas kernel off (XLA fallbacks) and drop traced
    programs so the next bench() retraces with the flags applied."""
    from gstpeaq_tpu.ops import fb_ear, iir
    from gstpeaq_tpu.parallel import batch as B
    iir.USE_PALLAS = False        # recurrences + FFT-ear spread kernel
    fb_ear.USE_PALLAS_SPREAD = False
    fb_ear.USE_PALLAS_DC = False
    B._jitted_basic_batch.cache_clear()
    B._jitted_advanced_batch.cache_clear()


def bench_safe(**kwargs):
    """bench() with a one-shot fallback: a Mosaic lowering/compile
    regression in a Pallas kernel must degrade the record (slower XLA
    paths, note attached), never erase it."""
    try:
        return bench(**kwargs), None
    except Exception as exc:
        note = f"pallas disabled after {type(exc).__name__}: {exc}"
        print(f"# {note}", file=sys.stderr)
        _disable_pallas()
        return bench(**kwargs), note[:300]


def spread_fields(rates: list[float]) -> dict:
    """min/median/max across repeats (VERDICT r03 #7: a ±10% tunnel wobble
    must be distinguishable from a real regression in the round record)."""
    rs = sorted(rates)
    med = rs[len(rs) // 2] if len(rs) % 2 else 0.5 * (
        rs[len(rs) // 2 - 1] + rs[len(rs) // 2])
    return {"value": round(med, 1),
            "spread": [round(rs[0], 1), round(rs[-1], 1)],
            "n_repeats": len(rs)}


def main() -> None:
    import os

    import jax

    if os.environ.get("GSTPEAQ_PLATFORM"):
        # CPU dry-runs (same hook as the CLI); before first backend use
        jax.config.update("jax_platforms", os.environ["GSTPEAQ_PLATFORM"])
    # persistent compile cache: the TPU backend's first compile of the big
    # batched program is minutes; warm runs load from disk in seconds
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = "float32" if on_tpu else "float64"
    batch = 64
    seconds = 10.0
    if not on_tpu:  # keep CI/CPU runs quick
        batch, seconds = 8, 2.0

    # basic: one 64-pair chunk per batch (device compute ~60 ms hides the
    # ~33 ms dispatch floor; smaller chunks leave the device host-bound)
    basic_rates, basic_note = bench_safe(
        advanced=False, batch=batch, seconds=seconds, dtype=dtype,
        iters=4, microbatch=64, repeats=3)
    basic_sp = spread_fields(basic_rates)
    basic_rate = basic_sp["value"]
    print(f"# device={dev.device_kind} dtype={dtype} batch={batch} "
          f"len={seconds}s", file=sys.stderr)
    print(f"# basic: {basic_rate:.0f} audio-sec/s "
          f"({basic_rate / batch:.0f}x realtime/pair), "
          f"min/max {basic_sp['spread'][0]:.0f}/{basic_sp['spread'][1]:.0f} "
          f"over {basic_sp['n_repeats']} repeats", file=sys.stderr)
    headline_rec = {
        "metric": "audio-seconds/sec/chip (basic PEAQ, batch 64)",
        "unit": "audio-sec/s",
        "vs_baseline": round(basic_rate / 6400.0, 3),
        **basic_sp,
    }
    if basic_note:
        headline_rec["note"] = basic_note
    headline = json.dumps(headline_rec)
    # headline JSON first — secondary measurements may hit cold multi-minute
    # compiles and must not delay the reported metric
    print(headline, flush=True)
    # secondary tiers: always emitted as JSON records (the north star cares
    # about all three); a failure prints a JSON record with value 0 rather
    # than silently dropping the tier
    for metric, kwargs in [
        # microbatch 32 (r5): the r4 "mb32 measured WORSE" note predates
        # the HOP-layout ship + phase-major masking GEMMs; re-measured
        # interleaved A/B (tools/mb_ab.py): mb32 median 6006 vs mb16 5146
        # vs mb64 5724 a-s/s, and mb32's spread is 4x tighter (fewer
        # tunnel dispatches per audio-second ride out the wobble)
        (f"audio-seconds/sec/chip (advanced PEAQ, batch {batch})",
         dict(advanced=True, batch=batch, seconds=seconds, dtype=dtype,
              iters=2, microbatch=32, repeats=3)),
        # accurate tier == dense rDFT with HIGHEST front-end GEMMs since
        # the r4 on-chip 20-item drift runs (docs/precision.md): worst
        # |dODG| 1.4e-4 basic / 5.1e-4 advanced — inside the 1e-3 gate —
        # and it dominates both prior accurate candidates (VPU-FFT
        # "mixed": 2x slower, 1.8e-2 worst; CT-at-HIGHEST: slower and
        # 2.0e-3 worst).  mixed/CT remain A/B options, no longer benched.
        (f"audio-seconds/sec/chip (basic PEAQ, accurate tier, batch {batch})",
         dict(advanced=False, batch=batch, seconds=seconds,
              dtype="accurate" if on_tpu else "float64", iters=2,
              microbatch=32, repeats=3)),
        # advanced accurate tier (VERDICT r04 #3): the tier's advanced
        # drift is 5.1e-4 (docs/precision.md) — its speed must be on the
        # record too, so all four north-star numbers ship every round
        (f"audio-seconds/sec/chip (advanced PEAQ, accurate tier, "
         f"batch {batch})",
         dict(advanced=True, batch=batch, seconds=seconds,
              dtype="accurate" if on_tpu else "float64", iters=2,
              microbatch=32, repeats=3)),
    ]:
        try:
            rates, err = bench_safe(**kwargs)
        except Exception as exc:  # pragma: no cover
            rates, err = [0.0], f"{type(exc).__name__}: {exc}"
        sp = spread_fields(rates)
        rate = sp["value"]
        rec = {"metric": metric, "unit": "audio-sec/s",
               "vs_baseline": round(rate / 6400.0, 3), **sp}
        if err:
            rec["error"] = err[:300]
        print(json.dumps(rec), flush=True)
        print(f"# {metric}: {rate:.0f} ({rate / batch:.0f}x realtime/pair), "
              f"min/max {sp['spread'][0]:.0f}/{sp['spread'][1]:.0f}",
              file=sys.stderr)
    # headline repeated LAST: the driver records the last JSON line on
    # stdout (BENCH_r02.json took the accurate tier as the round's record)
    print(headline, flush=True)


if __name__ == "__main__":
    main()
