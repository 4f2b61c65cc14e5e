"""TPU compile-time bisect for the basic pipeline components."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gstpeaq_tpu import earparams as EP, constants as C
from gstpeaq_tpu.ops import fft_ear as FE, framing
from gstpeaq_tpu.models import level_adapt, modulation as MP, movs as MOVS

p = EP.fft_ear_params(109)
k = FE.build_consts(p, jnp.float32)
avg = jnp.asarray(level_adapt.sliding_average_matrix(109), jnp.float32)
F = 64
T = framing.padded_length(F, 2048, 1024)
B = 8
sig = jnp.zeros((B, T, 2), jnp.float32)


def stage(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)


def frames(ref):
    return jax.vmap(lambda s: framing.frames_overlap50(s, F))(ref)


def ear_only(ref):
    both = jnp.stack([frames(ref)] * 2)
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    return power.sum(), unsmeared.sum()


def ear_smear(ref):
    both = jnp.stack([frames(ref)] * 2)
    _, _, unsmeared, _ = FE.stateless(k, both)
    exc = FE.time_smear(k, jnp.moveaxis(unsmeared, 2, 0), axis=0)
    return exc.sum()


def adapt(ref):
    both = jnp.stack([frames(ref)] * 2)
    _, _, unsmeared, _ = FE.stateless(k, both)
    uns_t = jnp.moveaxis(unsmeared, 2, -1)       # [2, B, CH, Z, F]
    exc = FE.time_smear(k, uns_t, axis=-1)
    ar, at, _ = level_adapt.level_adapt(k.adapt_a, avg, exc[0], exc[1])
    mr, al, _ = MP.modulation(k.adapt_a, uns_t[0], 1024)
    return ar.sum(), mr.sum()


def movs_stage(ref):
    both = jnp.stack([frames(ref)] * 2)
    power, weighted, unsmeared, thr = FE.stateless(k, both)
    uns_t = jnp.moveaxis(unsmeared, 2, -1)
    exc = FE.time_smear(k, uns_t, axis=-1)
    bw = MOVS.bandwidth(power[0], power[1])
    nm = MOVS.nmr(k.group_matrix, k.masking_difference, weighted[0],
                  weighted[1], jnp.moveaxis(exc[0], -1, -3))
    pd = MOVS.prob_detect(exc[0], exc[1])
    eh = MOVS.ehs(weighted[0], weighted[1], thr[0], thr[1],
                  C.DEFAULT_SETTINGS, jnp.float32)
    return (bw[0].sum(), nm[0].sum(), pd[0].sum(), eh[0].sum())


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "ear"):
    stage("ear_stateless", ear_only, sig)
if which in ("all", "smear"):
    stage("ear+smear", ear_smear, sig)
if which in ("all", "adapt"):
    stage("adapt+mod", adapt, sig)
if which in ("all", "movs"):
    stage("movs", movs_stage, sig)
