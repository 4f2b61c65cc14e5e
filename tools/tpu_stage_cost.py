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
from gstpeaq_tpu.ops import fb_ear as FB, fft_ear as FE, pallas_dc
from gstpeaq_tpu.parallel import batch as B


def timed(fn, arrays, iters=4):
    np.asarray(fn(*arrays).odg)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*arrays).odg)
        times.append(time.perf_counter() - t0)
    return min(times) * 1000


def build(dtype_name, mode="basic", buckets=None):
    from gstpeaq_tpu import api
    dtype, sdtype = api.resolve_dtypes(dtype_name)
    if mode == "advanced":
        pipe, consts = advanced.make_pipeline(
            92.0, C.DEFAULT_SETTINGS, dtype, sdtype)
        pipe = advanced.unified_input(pipe, buckets[0], buckets[1])
        jfn = jax.jit(jax.vmap(pipe, in_axes=(None, 0, 0, 0)))
    else:
        pipe, consts = basic.make_pipeline(
            C.BASIC_BAND_COUNT, 92.0, C.DEFAULT_SETTINGS, dtype, sdtype)
        jfn = jax.jit(jax.vmap(pipe, in_axes=(None, 0, 0, 0)))
    return lambda *a: jfn(consts, *a)


def _fb_bank_dummy(k, hp2, history=None):
    """Shape-matched stand-in for FB.filter_bank_t ([.., 40, I] pair)."""
    n_inst = hp2.shape[-1] // 32
    m = jnp.mean(hp2.reshape(*hp2.shape[:-1], n_inst, 32), -1)  # [.., I]
    x = m[..., None, :] * jnp.ones((40, 1), hp2.dtype)
    return x, 0.5 * x


def _fb_spread_dummy(k, fb_re, fb_im, cu_state=None, return_state=False):
    """Stand-in for FB.spread_t ([.., Z, I] layout, cu state [.., Z])."""
    e0 = fb_re * fb_re + fb_im * fb_im
    return (e0, e0[..., -1]) if return_state else e0


def _fb_masking_dummy(k, e0, n_frames, state=None, return_state=False):
    """Stand-in for FB.back_and_forward_masking_t ([.., Z, I] -> [.., Z, F]
    pair + (e0_tail [.., Z, 10], excitation [.., Z]) state)."""
    exc = (e0.reshape(*e0.shape[:-1], n_frames, 6)[..., 5]
           + k.internal_noise[:, None])
    if return_state:
        return exc, exc, (e0[..., -10:], exc[..., -1])
    return exc, exc


def _fb_dc_pallas_dummy(x3, level_factor, state=None, return_state=False,
                        interpret=False):
    # the real kernel applies the level scale internally (the XLA dummy's
    # input arrives pre-scaled); dropping it starves the loudness gates
    y = x3 * (0.999 * jnp.asarray(level_factor, jnp.float32))
    if not return_state:
        return y
    n = x3.shape[0]
    st = tuple(jnp.zeros((n, 2), jnp.float32) for _ in range(4))
    return y, st


def _fb_spread_fused_dummy(k, hp2, hp2_hist, cu_state):
    # removes the whole fused block: group convs + slope kernel + Pallas
    # spread (the fused path never calls filter_bank_t / spread_t)
    n_inst = hp2.shape[-1] // C.FB_SUBSAMPLING
    e0 = (hp2[..., None, ::C.FB_SUBSAMPLING] ** 2 + 1e-8) * jnp.ones(
        (k.band_count, 1), hp2.dtype)
    return e0, jnp.zeros((*hp2.shape[:-1], k.band_count), hp2.dtype)


# Each stage lists EVERY live form (XLA path + Pallas fast path): on the
# f32 TPU tier the pipelines dispatch to the Pallas kernels, and a dummy
# that only patches the XLA form silently measures ~0 (the round-2
# advisor's finding — do not regress it).
DUMMIES = {
    "ehs": (MOVS, "ehs",
            lambda w_r, w_t, t0, t1, s, d, ehs_mats=None,
            delta_weighted=None, ehs_mask=None, ehs_dmat=None,
            precision=None, ehs_zero=None: (
        jnp.zeros(w_r.shape[:-1], w_r.dtype),        # ehs_val [.., CH, F]
        jnp.ones(w_r.shape[-2:-1], bool))),          # valid [F]
    "prob_detect": (MOVS, "prob_detect", lambda er, et, fl: (
        jnp.mean(er - et, axis=(-3, -2)) * 0 + 0.6,
        jnp.mean(er - et, axis=(-3, -2)))),
    "nmr": (MOVS, "nmr", lambda g, m, wr, wt, re, delta_weighted=None: (
        jnp.mean(wr - wt, axis=-1), jnp.mean(wr - wt, axis=-1))),
    "bandwidth": (MOVS, "bandwidth", lambda r, t, bin_idx=None: (
        jnp.mean(r, -1), jnp.mean(t, -1),
        jnp.ones(r.shape[:-1], bool))),
    # the batch pipelines run level-adapter stage 1 + the modulation
    # smoothers through ONE fused call (level_adapt_fused_mod)
    "adapt_mod": (level_adapt, "level_adapt_fused_mod",
                  lambda a, m, exc2, uns2, step: (
                      exc2[0], exc2[1], uns2 * 0.5, uns2 * 0.3)),
    "time_smear": (FE, "time_smear",
                   lambda k, u, axis=0, state=None: u * 1.001),
    "spread": (FE, "spread", lambda k, pp, block=16: pp * 1.0001),
    "mod_diff": (MOVS, "modulation_difference",
                 lambda n, mr, mt, al, rms_mode, lev_wt: (
                     jnp.mean(mr - mt, -2) * 100,
                     jnp.mean(mr - mt, -2) * 10,
                     jnp.mean(al, -2) * 0 + 1)),
    "noise_loud": (MOVS, "noise_loudness",
                   lambda n, a, tf, s0, nlm, mr, mt, ar, at: (
                       jnp.mean(ar - at, -2))),
    # FB-path stages (advanced mode); targets match process_signal's
    # current call chain: filter_bank_t (grouped conv) -> spread_t ->
    # back_and_forward_masking_t (all on the transposed [.., Z, I] layout)
    "fb_filter_bank": (FB, "filter_bank_t", _fb_bank_dummy),
    "fb_dc": [(FB, "dc_reject",
               lambda x, state=None, return_state=False:
               (x * 0.999, (x[..., -2:],) * 4) if return_state else x * 0.999),
              (pallas_dc, "dc_chain_blocked", _fb_dc_pallas_dummy)],
    "fb_spread": [(FB, "spread_t", _fb_spread_dummy),
                  (FB, "_spread_fused", _fb_spread_fused_dummy)],
    "fb_masking": (FB, "back_and_forward_masking_t", _fb_masking_dummy),
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
    buckets = B.compute_buckets(refs, tests, args.mode == "advanced")
    arrays = [jax.device_put(a)
              for a in B.prepare_chunk(refs, tests, buckets)]

    full = timed(build(args.dtype, args.mode, buckets), arrays)
    print(f"full: {full:.1f} ms "
          f"({mb * 10.0 / full * 1000:.0f} audio-s/s)", flush=True)

    if args.stages:
        names = args.stages.split(",")
    else:
        names = [n for n in DUMMIES
                 if DUMMY_MODE.get(n, "basic") == args.mode
                 or n in ("ehs", "nmr", "adapt_mod", "noise_loud")]
    for name in names:
        patches = DUMMIES[name]
        if not isinstance(patches, list):
            patches = [patches]
        origs = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, dummy in patches:
            setattr(mod, attr, dummy)
        try:
            ms = timed(build(args.dtype, args.mode, buckets), arrays)
        finally:
            for mod, attr, orig in origs:
                setattr(mod, attr, orig)
        print(f"without {name}: {ms:.1f} ms  (stage ~{full - ms:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
