"""Marginal cost of each pipeline stage, measured by substituting the
stage with a shape-preserving dummy inside the REAL batched program (isolated
stage timings are unreliable: XLA fuses differently out of context).

Usage: python tools/tpu_stage_cost.py [--mode basic|advanced] [--mb N]
                                      [--dtype float32|mixed]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench as BE
from gstpeaq_tpu import constants as C
from gstpeaq_tpu.models import (advanced, basic, level_adapt, modulation,
                                movs as MOVS)
from gstpeaq_tpu.ops import fb_ear as FB, fft_ear as FE
from gstpeaq_tpu.parallel import batch as B


def timed(fn, arrays, iters=4):
    np.asarray(fn(*arrays).odg)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*arrays).odg)
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


def build(dtype_name, mode="basic"):
    from gstpeaq_tpu import api
    dtype, sdtype = api.resolve_dtypes(dtype_name)
    if mode == "advanced":
        pipe, consts = advanced.make_pipeline(
            92.0, C.DEFAULT_SETTINGS, dtype, sdtype)
        jfn = jax.jit(jax.vmap(pipe, in_axes=(None, 0, 0, 0, 0, 0, 0)))
    else:
        pipe, consts = basic.make_pipeline(
            C.BASIC_BAND_COUNT, 92.0, C.DEFAULT_SETTINGS, dtype, sdtype)
        jfn = jax.jit(jax.vmap(pipe, in_axes=(None, 0, 0, 0)))
    return lambda *a: jfn(consts, *a)


DUMMIES = {
    "ehs": (MOVS, "ehs", lambda w_r, w_t, t0, t1, s, d, ehs_mats=None: (
        jnp.zeros(w_r.shape[:-1], w_r.dtype),
        jnp.ones(w_r.shape[:-2], bool))),
    "prob_detect": (MOVS, "prob_detect", lambda er, et, fl: (
        jnp.mean(er - et, axis=(-1, -2)) * 0 + 0.6,
        jnp.mean(er - et, axis=(-1, -2)))),
    "nmr": (MOVS, "nmr", lambda g, m, wr, wt, re: (
        jnp.mean(wr - wt, axis=-1), jnp.mean(wr - wt, axis=-1))),
    "bandwidth": (MOVS, "bandwidth", lambda r, t: (
        jnp.mean(r, -1), jnp.mean(t, -1),
        jnp.ones(r.shape[:-1], bool))),
    "modulation": (modulation, "modulation", lambda a, u, step: (
        u * 0.5, u * 0.3, None)),
    "level_adapt": (level_adapt, "level_adapt",
                    lambda a, m, re, te: (re, te, None)),
    "time_smear": (FE, "time_smear",
                   lambda k, u, axis=0, state=None: u * 1.001),
    "spread": (FE, "spread", lambda k, pp, block=16: pp * 1.0001),
    "mod_diff": (MOVS, "modulation_difference",
                 lambda n, mr, mt, al, rms_mode, lev_wt: (
                     jnp.mean(mr - mt, -1) * 100,
                     jnp.mean(mr - mt, -1) * 10,
                     jnp.mean(al, -1) * 0 + 1)),
    "noise_loud": (MOVS, "noise_loudness",
                   lambda n, a, tf, s0, nlm, mr, mt, ar, at: (
                       jnp.mean(ar - at, -1))),
    # FB-path stages (advanced mode)
    "fb_filter_bank": (FB, "filter_bank", lambda k, hp2, history=None: (
        jnp.mean(hp2.reshape(*hp2.shape[:-1], -1, 32), -1)[..., None]
        * jnp.ones((40,), hp2.dtype),) * 2),
    "fb_dc": (FB, "dc_reject",
              lambda x, state=None, return_state=False: x * 0.999),
    "fb_spread": (FB, "spread",
                  lambda k, re, im, cu_state=None, return_state=False:
                  re * re + im * im),
    "fb_masking": (FB, "back_and_forward_masking",
                   lambda k, e0, n_frames, state=None, return_state=False: (
                       (e0[..., 5::6, :] + k.internal_noise,
                        e0[..., 5::6, :] + k.internal_noise)
                       + ((state,) if return_state else ()))),
}


DUMMY_MODE = {
    "fb_filter_bank": "advanced", "fb_dc": "advanced",
    "fb_spread": "advanced", "fb_masking": "advanced",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["basic", "advanced"],
                    default="basic")
    ap.add_argument("--mb", type=int, default=None)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--stages", default=None,
                    help="comma list; default all for the mode")
    args = ap.parse_args()
    mb = args.mb or (32 if args.mode == "basic" else 8)

    refs, tests = BE.make_pairs(mb, 10.0)
    arrays = [jax.device_put(a)
              for a in B.prepare_batch(refs, tests, args.mode == "advanced")]

    full = timed(build(args.dtype, args.mode), arrays)
    print(f"full: {full:.1f} ms "
          f"({mb * 10.0 / full * 1000:.0f} audio-s/s)", flush=True)

    if args.stages:
        names = args.stages.split(",")
    else:
        names = [n for n in DUMMIES
                 if DUMMY_MODE.get(n, "basic") == args.mode
                 or n in ("ehs", "nmr", "modulation", "level_adapt",
                          "noise_loud")]
    for name in names:
        mod, attr, dummy = DUMMIES[name]
        orig = getattr(mod, attr)
        setattr(mod, attr, dummy)
        try:
            ms = timed(build(args.dtype, args.mode), arrays)
        finally:
            setattr(mod, attr, orig)
        print(f"without {name}: {ms:.1f} ms  (stage ~{full - ms:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
