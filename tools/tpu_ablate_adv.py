"""Ablate the advanced-mode FB path stages on TPU (microbatch 8).

Timing note: on this backend block_until_ready() does not reliably
synchronize for scalar outputs, so every stage returns a small vector that
is materialized to host (np.asarray) inside the timed region; subtract the
~29 ms host round-trip constant when comparing stages.
"""
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

kb = FB.build_consts(EP.fb_ear_params(), jnp.float32)
rng = np.random.default_rng(0)
T = 480000  # 10 s
x = jnp.asarray(rng.standard_normal((32, T)) * 0.3, jnp.float32)
NF = T // 192


def t(name, fn, *a):
    f = jax.jit(fn)
    np.asarray(f(*a))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms", flush=True)


t("noop", lambda s: s[:, ::65537].sum(-1), x)
t("dc_reject", lambda s: (FB.dc_reject(s) ** 2).sum(-1), x)
t("dc+fbank", lambda s: sum((v ** 2).sum((-1, -2)) for v in
                            FB.filter_bank(kb, FB.dc_reject(s))), x)


def through_spread(s):
    hp2 = FB.dc_reject(s)
    re, im = FB.filter_bank(kb, hp2)
    e0 = FB.spread(kb, re, im)
    return (e0 ** 2).sum((-1, -2))


t("dc+fbank+spread", through_spread, x)
t("full fb", lambda s: sum(
    (v ** 2).sum((-1, -2)) for v in FB.process_signal(kb, s, NF)), x)
