"""Marginal cost of each basic-pipeline stage, measured by substituting the
stage with a shape-preserving dummy inside the REAL batched program (isolated
stage timings are unreliable: XLA fuses differently out of context).

Usage: python tools/tpu_stage_cost.py [--mb N] [--dtype float32|mixed]
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
from gstpeaq_tpu.models import basic, level_adapt, modulation, movs as MOVS
from gstpeaq_tpu.ops import fft_ear as FE
from gstpeaq_tpu.parallel import batch as B


def timed(fn, arrays, iters=4):
    np.asarray(fn(*arrays).odg)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*arrays).odg)
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


def build(dtype_name):
    from gstpeaq_tpu import api
    dtype, sdtype = api.resolve_dtypes(dtype_name)
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
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--stages", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    refs, tests = BE.make_pairs(args.mb, 10.0)
    arrays = [jax.device_put(a)
              for a in B.prepare_batch(refs, tests, False)]

    full = timed(build(args.dtype), arrays)
    print(f"full: {full:.1f} ms "
          f"({args.mb * 10.0 / full * 1000:.0f} audio-s/s)", flush=True)

    names = (args.stages.split(",") if args.stages else list(DUMMIES))
    for name in names:
        mod, attr, dummy = DUMMIES[name]
        orig = getattr(mod, attr)
        setattr(mod, attr, dummy)
        try:
            ms = timed(build(args.dtype), arrays)
        finally:
            setattr(mod, attr, orig)
        print(f"without {name}: {ms:.1f} ms  (stage ~{full - ms:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
