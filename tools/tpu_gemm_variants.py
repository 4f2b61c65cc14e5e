"""Time filterbank-GEMM variants on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

rng = np.random.default_rng(0)
N, I, K, O = 32, 15000, 1472, 80
z = jnp.asarray(rng.standard_normal((N, I * 32 + K)), jnp.float32)
kpad = jnp.asarray(rng.standard_normal((O, K)), jnp.float32)


def t(name, fn, *a):
    f = jax.jit(fn)
    np.asarray(f(*a))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms", flush=True)


def windows_of(zz):
    slabs = [jax.lax.dynamic_slice_in_dim(zz, 32 * c, 32 * I,
                                          axis=-1).reshape(N, I, 32)
             for c in range(46)]
    return jnp.concatenate(slabs, axis=-1)


def v_3d_highest(zz, kk):
    w = windows_of(zz)
    return jnp.dot(w, kk.T, precision=jax.lax.Precision.HIGHEST).sum((-1, -2))


def v_2d_highest(zz, kk):
    w = windows_of(zz).reshape(N * I, K)
    return jnp.dot(w, kk.T,
                   precision=jax.lax.Precision.HIGHEST).reshape(
                       N, I, O).sum((-1, -2))


def v_2d_high(zz, kk):
    w = windows_of(zz).reshape(N * I, K)
    return jnp.dot(w, kk.T, precision=jax.lax.Precision.HIGH).reshape(
        N, I, O).sum((-1, -2))


def v_windows_only(zz):
    return windows_of(zz).sum((-1, -2))


t("windows only", v_windows_only, z)
t("3d HIGHEST", v_3d_highest, z, kpad)
t("2d HIGHEST", v_2d_highest, z, kpad)
t("2d HIGH", v_2d_high, z, kpad)


def v_block_conv(zz, kk):
    # zz: [N, 32*M'] -> blocks [N, M, 32]; conv over M, window 46
    m = zz.shape[-1] // 32
    blocks = zz[:, :m * 32].reshape(N, m, 32)
    # kernel [46, 32, 80]: kpad[o, 32c + s] -> k2[c, s, o]
    k2 = kk.reshape(O, 46, 32).transpose(1, 2, 0)
    out = jax.lax.conv_general_dilated(
        blocks, k2, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return out[:, :I].sum((-1, -2))


t("block conv HIGHEST", v_block_conv, z, kpad)


def v_block_conv_high(zz, kk):
    m = zz.shape[-1] // 32
    blocks = zz[:, :m * 32].reshape(N, m, 32)
    k2 = kk.reshape(O, 46, 32).transpose(1, 2, 0)
    out = jax.lax.conv_general_dilated(
        blocks, k2, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    return out[:, :I].sum((-1, -2))


t("block conv HIGH", v_block_conv_high, z, kpad)
