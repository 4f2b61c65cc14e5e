"""Stage ablation of the basic pipeline at microbatch 32 on the TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gstpeaq_tpu import constants as C, earparams as EP
from gstpeaq_tpu.ops import fft_ear as FE, framing, iir
from gstpeaq_tpu.models import level_adapt, modulation as MP, movs as MOVS
import bench as BE
from gstpeaq_tpu.parallel import batch as B

MB = 32
refs, tests = BE.make_pairs(MB, 10.0)
arrays = [jax.device_put(a) for a in B.prepare_batch(refs, tests, False)]
ref_sig, test_sig, valid = arrays

p = EP.fft_ear_params(109)
k = FE.build_consts(p, jnp.float32)
avg = jnp.asarray(level_adapt.sliding_average_matrix(109), jnp.float32)


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(ref_sig, test_sig)
    jax.tree.map(lambda v: v.block_until_ready(), out)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(ref_sig, test_sig)
        jax.tree.map(lambda v: v.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms", flush=True)


def frames_of(sig):
    n_frames = sig.shape[1] // 1024 - 1
    return jax.vmap(lambda s: framing.frames_overlap50(s, n_frames))(sig)


def transfer_only(r, t):
    return r[:, ::997, :].sum() + t[:, ::997, :].sum()


def ear_core(r, t):
    both = jnp.stack([frames_of(r), frames_of(t)])
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    return power.sum(), weighted.sum(), unsmeared.sum()


def ear_fft_only(r, t):
    both = jnp.stack([frames_of(r), frames_of(t)])
    x = both.astype(jnp.float32) * k.hann
    spec = FE.rfft_flat(x)
    return (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).sum()


def with_smear_scans(r, t):
    both = jnp.stack([frames_of(r), frames_of(t)])
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    exc = FE.time_smear(k, jnp.moveaxis(unsmeared, 2, 0), axis=0)
    exc = jnp.moveaxis(exc, 0, 2)
    ar, at, _ = jax.vmap(lambda a, b: level_adapt.level_adapt(
        k.adapt_a, avg, a, b))(exc[0], exc[1])
    mr, al, _ = jax.vmap(lambda u: MP.modulation(k.adapt_a, u, 1024))(
        unsmeared[0])
    mt, _, _ = jax.vmap(lambda u: MP.modulation(k.adapt_a, u, 1024))(
        unsmeared[1])
    return ar.sum(), mr.sum(), mt.sum()


def ehs_only(r, t):
    both = jnp.stack([frames_of(r), frames_of(t)])
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    e, v = MOVS.ehs(weighted[0], weighted[1], thr[0], thr[1],
                    C.DEFAULT_SETTINGS, jnp.float32)
    return e.sum(), v.sum()


def above_only(r, t):
    rf = frames_of(r)
    return jax.vmap(framing.above_threshold)(rf.astype(jnp.float32)).sum()


def full(r, t):
    fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, "float32")
    return fn  # placeholder


timeit("transfer+noop", transfer_only)
timeit("fft only", ear_fft_only)
timeit("ear core (fft+group+spread)", ear_core)
timeit("+smear+adapt+mod scans", with_smear_scans)
timeit("ehs (incl ear)", ehs_only)
timeit("above_threshold", above_only)

fnb = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, "float32")
out = fnb(*arrays)
out.odg.block_until_ready()
times = []
for _ in range(4):
    t0 = time.perf_counter()
    out = fnb(*arrays)
    out.odg.block_until_ready()
    times.append(time.perf_counter() - t0)
print(f"full pipeline: {min(times)*1000:.1f} ms", flush=True)
