"""Stage ablation of the PEAQ pipelines on the current accelerator.

Usage:  python tools/tpu_ablate.py [--mode basic|advanced] [--mb N]
                                   [--dtype float32|mixed|float64]

Times each pipeline stage cumulatively (host-synchronized: np.asarray of a
small per-pair vector inside the timed region; block_until_ready does not
reliably synchronize scalars on this backend — subtract the ~29 ms host
round-trip when comparing stages).
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
from gstpeaq_tpu import constants as C, earparams as EP, api
from gstpeaq_tpu.models import level_adapt, modulation as MP, movs as MOVS
from gstpeaq_tpu.ops import fb_ear as FB, fft_ear as FE, framing
from gstpeaq_tpu.parallel import batch as B


def timeit(name, fn, *a, iters=3):
    f = jax.jit(fn)
    np.asarray(f(*a))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times) * 1000:.1f} ms", flush=True)


def ablate_basic(mb, dtype_name):
    refs, tests = BE.make_pairs(mb, 10.0)
    ref_sig, test_sig, valid = [jax.device_put(a) for a in
                                B.prepare_batch(refs, tests, False)]
    dtype, sdtype = api.resolve_dtypes(dtype_name)
    p = EP.fft_ear_params(109)
    k = FE.build_consts(p, dtype, spectrum_dtype=sdtype)
    avg = jnp.asarray(level_adapt.sliding_average_matrix(109), dtype)
    F = ref_sig.shape[1] // 1024 - 1

    def frames_of(sig):
        return jax.vmap(lambda s: framing.frames_overlap50(s, F))(sig)

    timeit("noop", lambda r, s: r[:, ::65537, 0], ref_sig, test_sig)
    timeit("above_thr", lambda r, s: jax.vmap(
        lambda x: framing.above_threshold_signal(x, F, 2048, 1024))(
            r.astype(sdtype)).sum(-1), ref_sig, test_sig)

    def spectrum(r, s):
        both = jnp.stack([frames_of(r), frames_of(s)])
        if k.dft_matrix is not None:
            sr = jnp.dot(both.astype(sdtype), k.dft_matrix,
                         precision=k.dft_precision)
            return (sr[..., :1025] ** 2
                    + sr[..., 1025:] ** 2).sum((-1, -2, -3, 0))
        spec = FE.rfft_flat(both.astype(sdtype) * k.hann)
        return (jnp.real(spec) ** 2
                + jnp.imag(spec) ** 2).sum((-1, -2, -3, 0))

    timeit("spectrum (dft/fft+power)", spectrum, ref_sig, test_sig)

    def ear_full(r, s):
        both = jnp.stack([frames_of(r), frames_of(s)])
        power, weighted, unsmeared, thr = FE.stateless(k, both)
        return (power.sum((-1, -2, -3, 0)), weighted.sum((-1, -2, -3, 0)),
                unsmeared.sum((-1, -2, -3, 0)))

    timeit("ear stateless (+group+spread)", ear_full, ref_sig, test_sig)

    def with_scans(r, s):
        both = jnp.stack([frames_of(r), frames_of(s)])
        power, weighted, unsmeared, thr = FE.stateless(k, both)
        uns_t = jnp.moveaxis(unsmeared, 2, -1)      # [2, B, CH?, Z, F]
        exc = FE.time_smear(k, uns_t, axis=-1)
        ar, at, _ = level_adapt.level_adapt(k.adapt_a, avg, exc[0], exc[1])
        mr, al, _ = MP.modulation(k.adapt_a, uns_t[0], 1024)
        return ar.sum((-1, -2, -3)), mr.sum((-1, -2, -3))

    timeit("+smear+adapt+mod scans", with_scans, ref_sig, test_sig)

    def ehs_only(r, s):
        both = jnp.stack([frames_of(r), frames_of(s)])
        power, weighted, unsmeared, thr = FE.stateless(k, both)
        e, v = MOVS.ehs(weighted[0], weighted[1], thr[0], thr[1],
                        C.DEFAULT_SETTINGS, sdtype)
        return e.sum((-1, -2))

    timeit("ear+ehs", ehs_only, ref_sig, test_sig)

    fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, dtype_name)
    np.asarray(fn(ref_sig, test_sig, valid).odg)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(ref_sig, test_sig, valid).odg)
        times.append(time.perf_counter() - t0)
    print(f"full basic: {min(times) * 1000:.1f} ms "
          f"({mb * 10.0 / min(times):.0f} audio-s/s)", flush=True)


def ablate_advanced(mb, dtype_name):
    dtype, sdtype = api.resolve_dtypes(dtype_name)
    kb = FB.build_consts(EP.fb_ear_params(), dtype, spectrum_dtype=sdtype)
    rng = np.random.default_rng(0)
    T = 480000  # 10 s
    x = jnp.asarray(rng.standard_normal((mb, T)) * 0.3, jnp.float32)
    NF = T // 192

    timeit("noop", lambda s: s[:, ::65537].sum(-1), x)
    timeit("dc_reject", lambda s: (FB.dc_reject(s.astype(sdtype)) ** 2)
           .sum(-1), x)
    timeit("dc+fbank", lambda s: sum(
        (v ** 2).sum((-1, -2))
        for v in FB.filter_bank(kb, FB.dc_reject(s.astype(sdtype)))), x)

    def through_spread(s):
        hp2 = FB.dc_reject(s.astype(sdtype))
        re, im = FB.filter_bank(kb, hp2)
        bdtype = kb.internal_noise.dtype
        e0 = FB.spread(kb, re.astype(bdtype), im.astype(bdtype))
        return (e0 ** 2).sum((-1, -2))

    timeit("dc+fbank+spread", through_spread, x)
    timeit("full fb ear", lambda s: sum(
        (v ** 2).sum((-1, -2))
        for v in FB.process_signal(kb, s.astype(sdtype), NF)), x)

    refs, tests = BE.make_pairs(mb, 10.0)
    buckets = B.compute_buckets(refs, tests, True)
    arrays = [jax.device_put(a)
              for a in B.prepare_chunk(refs, tests, buckets)]
    fn = B._jitted_advanced_batch(92.0, C.DEFAULT_SETTINGS, dtype_name,
                                  buckets[0], buckets[1])
    np.asarray(fn(*arrays).odg)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*arrays).odg)
        times.append(time.perf_counter() - t0)
    print(f"full advanced: {min(times) * 1000:.1f} ms "
          f"({mb * 10.0 / min(times):.0f} audio-s/s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["basic", "advanced"], default="basic")
    ap.add_argument("--mb", type=int, default=None)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    mb = args.mb or (32 if args.mode == "basic" else 8)
    if args.mode == "basic":
        ablate_basic(mb, args.dtype)
    else:
        ablate_advanced(mb, args.dtype)


if __name__ == "__main__":
    main()
