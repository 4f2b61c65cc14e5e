"""Microbenchmark: FIR-bank conv + regroup-to-[80, I] layout variants.

The grouped conv's output is [n, ti, 4, 2|G|] (time-block major, channels
minor) while the band chain wants [n, 80, I] (bands major, instants minor);
the de-interleaving transpose was ~16 ms/iter of the advanced profile.
Variants:
  a) current: per-group moveaxis(-1, -3) + sublane concat
  b) conv emits NCH directly (XLA handles the transpose in the conv)
  c) ungrouped single conv + one moveaxis (round-2 path, FLOP-heavy)
  d) grouped conv + ONE fused transpose via explicit dot-free relayout:
     transpose o[, :ti] as a whole [n, ti, 4*g2] -> [n, 4*g2, ti], then
     phase-interleave with a [g2, ti, 4] reshape trick
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

from gstpeaq_tpu import earparams as EP
from gstpeaq_tpu.ops import fb_ear as FB


def variant_baseline(k, hp2):
    """No conv, no regroup: synthesizes [.., 40, I] via a cheap reshape so
    the spread_t consumer's own cost can be subtracted."""
    lead = hp2.shape[:-1]
    i = hp2.shape[-1] // 32
    r = jnp.abs(hp2.reshape(*lead, 32, i)) + 1e-3
    r = jnp.concatenate([r, r[..., :8, :]], axis=-2)
    return r, 0.5 * r


def variant_current(k, hp2):
    return FB.filter_bank_t(k, hp2)


def variant_nch(k, hp2):
    blocks, n_inst, ti, lead = FB._blocks_for_conv(hp2, None)
    n = blocks.shape[0]
    res, ims = [], []
    for (lo, hi), kern in zip(k.group_blocks, k.h_group_kernels):
        o = jax.lax.conv_general_dilated(
            blocks[:, lo:], kern, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NCH"),
            preferred_element_type=hp2.dtype,
            precision=k.conv_precision)          # [n, 8|G|, t_out]
        g2 = kern.shape[-1] // 4                 # 2|G|
        og = o[:, :, :ti].reshape(n, 4, g2, ti)
        og = jnp.moveaxis(og, 1, -1).reshape(n, g2, 4 * ti)[..., :n_inst]
        res.append(og[:, :g2 // 2])
        ims.append(og[:, g2 // 2:])
    re = jnp.concatenate(res, axis=-2).reshape(*lead, 40, n_inst)
    im = jnp.concatenate(ims, axis=-2).reshape(*lead, 40, n_inst)
    return re, im


def variant_ungrouped(k, hp2):
    blocks, n_inst, ti, lead = FB._blocks_for_conv(hp2, None)
    n = blocks.shape[0]
    o = jax.lax.conv_general_dilated(
        blocks, k.h_phase, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=hp2.dtype,
        precision=k.conv_precision)
    fb4 = o[:, :ti].reshape(n, ti, 4, 80)
    fbt = jnp.moveaxis(fb4, -1, -3).reshape(n, 80, 4 * ti)[..., :n_inst]
    fbt = fbt.reshape(*lead, 80, n_inst)
    return fbt[..., :40, :], fbt[..., 40:, :]


def run(fn, k, hp2, iters=4, reps=8):
    # spread_t consumes the [.., 40, I] pair, forcing the regroup layout
    # (a plain jnp.sum is order-free and lets XLA elide the transpose).
    # The body repeats `reps` times INSIDE one jit via lax.scan — the
    # ~30 ms per-execute dispatch floor on this backend otherwise hides
    # all device-time differences even when pipelined.
    def body(carry, i):
        re, im = fn(k, hp2 + i * 1e-12)
        return carry + jnp.sum(spread_t_consumer(k, re, im)), ()

    def outer(k, x):
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.float32))
        return out
    f = jax.jit(outer)
    np.asarray(f(k, hp2))
    t0 = time.perf_counter()
    outs = [f(k, hp2) for _ in range(iters)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / (iters * reps) * 1e3


def spread_t_consumer(k, re, im):
    return FB.spread_t(k, re, im)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()
    params = EP.fb_ear_params(92.0)
    k = FB.build_consts(params, dtype=jnp.float32)
    t = int(args.seconds * 48000) // 192 * 192
    rng = np.random.default_rng(0)
    hp2 = jnp.asarray(rng.standard_normal((2, 2, args.mb, t)), jnp.float32)
    for name, fn in [("baseline (spread_t only)", variant_baseline),
                     ("current(grouped NHC + moveaxis)", variant_current),
                     ("grouped NCH", variant_nch),
                     ("ungrouped + one moveaxis", variant_ungrouped)]:
        ms = run(fn, k, hp2)
        print(f"{name:34s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
