"""Pallas TPU kernel for the FFT ear model's frequency spreading.

Transposed [Z, F] twin of ops/pallas_fb's FB spreading kernel for the
FFT-ear band chain (fft_ear.spread): the level-dependent upper spreading
U[i, j] = aUCEe[i]^(j-i) (j > i) runs as Z-1 SHIFT-MULTIPLY steps over
the band sublanes instead of Z^2/block exp-form weight slabs, the whole
normalization prelude (a_uce, g_iu, En, Ene — ~6 transcendentals per
cell in the XLA form, evaluated once per SOURCE band here) fuses into
the same VMEM tile, the constant lower spreading is an in-kernel
[Z, Z] x [Z, F] MXU dot, and E2^2.5 / norm fuses into the output write.
pitch_power is read once and only the spread excitation written.

The wrapper takes/returns the pipelines' bands-MINOR [..., F, Z] layout
(one pre-transpose of the small band tensor; the post-transpose cancels
against the pipelines' own [.., Z, F] MOV-tail transpose in XLA's
algebraic simplifier).  float32 TPU tier only, same dispatch/reference
policy as ops/pallas_iir — the exp-form XLA path (fft_ear.spread)
remains the reference and the CPU / wide-dtype path.

Reference for WHAT is computed: src/fftearmodel.c:636-676.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(z: int):
    def kernel(p_ref, cons_ref, low_ref, out_ref):
        ln_auc = cons_ref[0][:, 0:1]            # [Z, 1]
        n_up = cons_ref[1][:, 0:1]
        g_il = cons_ref[2][:, 0:1]
        inv_norm = cons_ref[3][:, 0:1]
        dz02 = cons_ref[4][:, 0:1]
        p = p_ref[...]                          # [bm, Z, F]
        lnp = jnp.log(p)
        ln_auce = ln_auc + dz02 * lnp
        a_uce = jnp.exp(ln_auce)
        g_iu = (1.0 - jnp.exp(n_up * ln_auce)) / (1.0 - a_uce)
        ene = jnp.exp(0.4 * (lnp - jnp.log(g_il + g_iu - 1.0)))
        rb = jnp.exp(0.4 * ln_auce)             # upper base aUCEe [bm,Z,F]
        # Row-shrink (same trick as pallas_fb._shift_multiply_e0): after
        # step e the weight's band rows < e are structurally zero and up's
        # rows < 8k stop changing once e >= 8k, so every 8 steps the top
        # sublane block retires and the chain shrinks [Z,F]->[Z-8,F]->…
        # Bit-identical: the dropped ops were all x+0 / 0*y, and the roll
        # wrap row stays masked via rb's row-0 zero.
        up = jnp.zeros_like(ene)
        w = ene
        done = []
        for e in range(1, z):
            if e > 1 and e % 8 == 1:
                done.append(up[:, :8])
                up, w, rb = up[:, 8:], w[:, 8:], rb[:, 8:]
            row = jax.lax.broadcasted_iota(
                jnp.int32, (1, w.shape[1], 1), 1)
            rb = jnp.where(row >= 1, pltpu.roll(rb, 1, axis=1), 0.0)
            w = pltpu.roll(w, 1, axis=1) * rb
            up = up + w
        up = jnp.concatenate(done + [up], axis=1)
        # constant lower part (incl. diagonal): [Z, Z] x [Z, F] MXU dot
        # per bm slice; explicit HIGHEST (the repo's #1 precision rule)
        low = low_ref[...]
        e2 = up + jnp.stack([
            jax.lax.dot_general(low, ene[i], (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            for i in range(ene.shape[0])])
        out_ref[...] = (e2 * e2) * jnp.sqrt(e2) * inv_norm
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def spread_fft(pitch_power: jnp.ndarray, ln_auc: jnp.ndarray,
               g_il: jnp.ndarray, lower_matrix: jnp.ndarray,
               spread_norm: jnp.ndarray, dz02,
               interpret: bool = False) -> jnp.ndarray:
    """fft_ear.spread on the bands-MINOR [..., F, Z] layout.

    pitch_power: [..., F, Z] float32 (> 0: band power + internal noise);
    ln_auc/g_il/spread_norm: [Z]; lower_matrix: [Z, Z] (lower[i, j],
    j <= i); dz02 = 0.2 * delta_z (scalar, may be traced).  Returns the
    unsmeared excitation, same shape/dtype.
    """
    shape = pitch_power.shape
    z = shape[-1]
    f = shape[-2]
    pt = jnp.swapaxes(pitch_power, -1, -2).reshape(-1, z, f)
    m = pt.shape[0]
    dzv = jnp.broadcast_to(jnp.asarray(dz02, jnp.float32), (z,))
    cons = jnp.stack([
        jnp.broadcast_to(x.astype(jnp.float32)[:, None], (z, 128))
        for x in (ln_auc, (z - jnp.arange(z, dtype=jnp.float32)),
                  g_il, 1.0 / spread_norm, dzv)])       # [5, Z, 128]
    bm = next((c for c in (8, 4, 2, 1) if m % c == 0 and c * z * f <= 2**21),
              1)
    grid = (m // bm,)
    blk = pl.BlockSpec((bm, z, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(z),
        out_shape=jax.ShapeDtypeStruct((m, z, f), jnp.float32),
        grid=grid,
        in_specs=[blk,
                  pl.BlockSpec((5, z, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((z, z), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=(5 * z + 2 * z + 20) * z * f * m,
            bytes_accessed=2 * 4 * z * f * m,
            transcendentals=6 * z * f * m),
    )(pt.astype(jnp.float32), cons,
      lower_matrix.astype(jnp.float32))
    return jnp.swapaxes(out.reshape(*shape[:-2], z, f), -1, -2) \
        .astype(pitch_power.dtype)
