"""ODG/MOV drift of a TPU precision tier vs the exact CPU-f64 tier.

Usage: python tools/tpu_drift.py [--dtype float32|mixed] [--fft]
                                 [--advanced] [--pairs N] [--seconds S]

Runs the chosen tier on the accelerator over "realistic" program-like pairs
(bench harmonics + amplitude modulation + noise floor so the modulation MOVs
are exercised — the drift-dominant path, see docs/precision.md), then the
float64 spec on CPU in a clean subprocess (once the TPU backend has
initialized, switching jax_platforms no longer takes effect and f64 programs
would hit the TPU compiler), and prints per-MOV and ODG deltas.  --fft
forces the VPU FFT instead of the DFT GEMM.
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def realistic_pairs(n, seconds, seed=3):
    """Pairs spanning MILD to SEVERE distortion so the resulting ODGs cover
    the whole scale (~-0.3 .. -3.7).  A corpus whose ODGs all saturate near
    the -3.98 floor under-weights MOV drift through the sigmoid and would
    pass precision tiers that fail on conformance-grade items."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 48000), dtype=np.float64) / 48000.0
    am = (1.0 + 0.35 * np.sin(2 * np.pi * 4.0 * t)
          * np.sin(2 * np.pi * 0.7 * t))
    refs, tests = [], []
    # per-pair severity: test lowpass cutoff + level error + noise floor
    specs = [(16000.0, 1.000, 1e-5), (13000.0, 0.995, 5e-5),
             (10000.0, 0.985, 2e-4), (7000.0, 0.970, 6e-4)]
    for i in range(n):
        cutoff, gain, noise = specs[i % len(specs)]
        f0 = 180.0 + 37.0 * (i % 11)
        ref = np.zeros_like(t)
        test = np.zeros_like(t)
        k = 1
        while k * f0 < 15000.0:
            tone = np.sin(2 * np.pi * k * f0 * t + 0.3 * k) / k
            ref += tone
            if k * f0 < cutoff:
                test += tone
            k += 1
        ref = 0.5 * ref * am + 1e-5 * rng.standard_normal(t.shape)
        test = (0.5 * gain * test * am
                + noise * rng.standard_normal(t.shape))
        refs.append(np.stack([ref, ref], 1).astype(np.float32))
        tests.append(np.stack([test, test], 1).astype(np.float32))
    return refs, tests


def _run_tier(dtype, advanced, fft, pairs, seconds, front_precision=None):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if dtype == "float64":
        # must run before any backend use; a clean subprocess guarantees it
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if front_precision:
        # override the two large front-end GEMMs' MXU precision (rDFT +
        # FB conv) to measure the ODG cost of each precision tier
        import dataclasses
        prec = dict(default=jax.lax.Precision.DEFAULT,
                    high=jax.lax.Precision.HIGH,
                    highest=jax.lax.Precision.HIGHEST)[front_precision]
        from gstpeaq_tpu.ops import fb_ear as FB
        from gstpeaq_tpu.ops import fft_ear as FE
        fe_orig, fb_orig = FE.build_consts, FB.build_consts
        FE.build_consts = lambda *a, **kw: dataclasses.replace(
            fe_orig(*a, **kw), dft_precision=prec)
        FB.build_consts = lambda *a, **kw: dataclasses.replace(
            fb_orig(*a, **kw), conv_precision=prec)
    if fft:
        from gstpeaq_tpu.ops import fft_ear as FE
        orig = FE.build_consts
        FE.build_consts = (lambda p, dtype, use_dft_gemm=None,
                           spectrum_dtype=None: orig(
                               p, dtype, use_dft_gemm=False,
                               spectrum_dtype=spectrum_dtype))
    from gstpeaq_tpu.parallel import batch as B
    refs, tests = realistic_pairs(pairs, seconds)
    return B.peaq_batch(refs, tests, advanced=advanced, dtype=dtype,
                        microbatch=8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "mixed", "float64"])
    ap.add_argument("--fft", action="store_true",
                    help="force the VPU FFT instead of the DFT GEMM")
    ap.add_argument("--advanced", action="store_true")
    ap.add_argument("--front-precision", default=None,
                    choices=["default", "high", "highest"],
                    help="override the rDFT/FB-conv GEMM precision")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--save", default=None,
                    help="(internal) save odg/movs to this .npz and exit")
    args = ap.parse_args()

    from gstpeaq_tpu import constants as CC
    names = (CC.MOV_ADVANCED_NAMES if args.advanced
             else CC.MOV_BASIC_NAMES)

    t0 = time.time()
    out = _run_tier(args.dtype, args.advanced, args.fft, args.pairs,
                    args.seconds, args.front_precision)
    print(f"{args.dtype}{' fft' if args.fft else ''}"
          f"{' front=' + args.front_precision if args.front_precision else ''}"
          f" "
          f"({time.time() - t0:.0f} s incl compile):",
          np.round(out["odg"], 6), flush=True)
    if args.save:
        np.savez(args.save, odg=out["odg"], movs=out["movs"])
        return

    # exact reference leg in a clean subprocess (CPU f64)
    with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--dtype", "float64", "--pairs", str(args.pairs),
               "--seconds", str(args.seconds), "--save", tmp.name]
        if args.advanced:
            cmd.append("--advanced")
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        t0 = time.time()
        subprocess.run(cmd, check=True, env=env)
        ref = np.load(tmp.name)
        out64 = {"odg": ref["odg"], "movs": ref["movs"]}
    print(f"CPU float64 ({time.time() - t0:.0f} s):",
          np.round(out64["odg"], 6), flush=True)

    print("max |dODG|:", np.max(np.abs(out["odg"] - out64["odg"])),
          flush=True)
    for i, k in enumerate(names):
        d = np.max(np.abs(out["movs"][:, i] - out64["movs"][:, i])
                   / (np.abs(out64["movs"][:, i]) + 1e-30))
        print(f"  {k}: max rel {d:.2e}")


if __name__ == "__main__":
    main()
