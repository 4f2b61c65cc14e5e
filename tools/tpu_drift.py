"""ODG/MOV drift of a TPU precision tier vs the exact CPU-f64 tier.

Usage: python tools/tpu_drift.py [--dtype float32|mixed] [--fft]
                                 [--advanced] [--pairs N] [--seconds S]

Runs the chosen tier on the accelerator over "realistic" program-like pairs
(bench harmonics + amplitude modulation + noise floor so the modulation MOVs
are exercised — the drift-dominant path, see docs/precision.md), then the
float64 spec on CPU in the same process (the default platform is switched
after the TPU run; both backends stay registered), and prints per-MOV and
ODG deltas.  --fft forces the VPU FFT instead of the DFT GEMM.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

import bench as BE
from gstpeaq_tpu import constants as CC
from gstpeaq_tpu.ops import fft_ear as FE
from gstpeaq_tpu.parallel import batch as B


def realistic_pairs(n, seconds, seed=3):
    refs, tests = BE.make_pairs(n, seconds, seed=seed)
    t = np.arange(refs[0].shape[0]) / 48000.0
    am = (1.0 + 0.35 * np.sin(2 * np.pi * 4.0 * t)
          * np.sin(2 * np.pi * 0.7 * t)).astype(np.float32)[:, None]
    rng = np.random.default_rng(9)
    for i in range(len(refs)):
        refs[i] = (refs[i] * am + 3e-4 * rng.standard_normal(
            refs[i].shape).astype(np.float32))
        tests[i] = (tests[i] * am + 3e-4 * rng.standard_normal(
            refs[i].shape).astype(np.float32))
    return refs, tests


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "mixed"])
    ap.add_argument("--fft", action="store_true",
                    help="force the VPU FFT instead of the DFT GEMM")
    ap.add_argument("--advanced", action="store_true")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    if args.fft:
        orig = FE.build_consts
        FE.build_consts = (lambda p, dtype, use_dft_gemm=None,
                           spectrum_dtype=None: orig(
                               p, dtype, use_dft_gemm=False,
                               spectrum_dtype=spectrum_dtype))

    refs, tests = realistic_pairs(args.pairs, args.seconds)
    names = (CC.MOV_ADVANCED_NAMES if args.advanced
             else CC.MOV_BASIC_NAMES)

    t0 = time.time()
    out = B.peaq_batch(refs, tests, advanced=args.advanced,
                       dtype=args.dtype, microbatch=8)
    print(f"TPU {args.dtype}{' fft' if args.fft else ''} "
          f"({time.time() - t0:.0f} s incl compile):",
          np.round(out["odg"], 6), flush=True)

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    B._jitted_basic_batch.cache_clear()
    B._jitted_advanced_batch.cache_clear()
    t0 = time.time()
    out64 = B.peaq_batch(refs, tests, advanced=args.advanced,
                         dtype="float64", microbatch=8)
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
