"""Ablate basic-pipeline stages at microbatch 32 (host-sync'd timings)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gstpeaq_tpu import constants as C, earparams as EP
from gstpeaq_tpu.ops import fft_ear as FE, framing
from gstpeaq_tpu.models import level_adapt, modulation as MP, movs as MOVS
import bench as BE
from gstpeaq_tpu.parallel import batch as B

MB = 32
refs, tests = BE.make_pairs(MB, 10.0)
ref_sig, test_sig, valid = [jax.device_put(a) for a in
                            B.prepare_batch(refs, tests, False)]
p = EP.fft_ear_params(109)
k = FE.build_consts(p, jnp.float32)
avg = jnp.asarray(level_adapt.sliding_average_matrix(109), jnp.float32)
F = ref_sig.shape[1] // 1024 - 1


def t(name, fn, *a):
    f = jax.jit(fn)
    np.asarray(f(*a))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms", flush=True)


def frames_of(sig):
    return jax.vmap(lambda s: framing.frames_overlap50(s, F))(sig)


t("noop", lambda r, s: r[:, ::65537, 0], ref_sig, test_sig)
t("above_thr", lambda r, s: jax.vmap(
    lambda x: framing.above_threshold_signal(x, F, 2048, 1024))(r).sum(-1),
  ref_sig, test_sig)


def dft_power(r, s):
    both = jnp.stack([frames_of(r), frames_of(s)])
    bins = 1025
    sr = jnp.dot(both.astype(jnp.float32), k.dft_matrix,
                 precision=k.dft_precision)
    return (sr[..., :bins] ** 2 + sr[..., bins:] ** 2).sum((-1, -2, -3, 0))


t("dft+power", dft_power, ref_sig, test_sig)


def ear_full(r, s):
    both = jnp.stack([frames_of(r), frames_of(s)])
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    return (power.sum((-1, -2, -3, 0)), weighted.sum((-1, -2, -3, 0)),
            unsmeared.sum((-1, -2, -3, 0)))


t("ear stateless", ear_full, ref_sig, test_sig)


def ehs_only(r, s):
    both = jnp.stack([frames_of(r), frames_of(s)])
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    e, v = MOVS.ehs(weighted[0], weighted[1], thr[0], thr[1],
                    C.DEFAULT_SETTINGS, jnp.float32)
    return e.sum((-1, -2))


t("ear+ehs", ehs_only, ref_sig, test_sig)

fn = B._jitted_basic_batch(92.0, C.DEFAULT_SETTINGS, "float32")
np.asarray(fn(ref_sig, test_sig, valid).odg)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(fn(ref_sig, test_sig, valid).odg)
    times.append(time.perf_counter() - t0)
print(f"full basic: {min(times)*1000:.1f} ms", flush=True)
