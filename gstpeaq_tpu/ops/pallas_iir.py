"""Pallas TPU kernel for the banded first-order recurrences.

Drop-in fast path for iir.linear_recurrence_banded (y_t = a_z y_{t-1} +
b_t along the last axis, per-band coefficients): one VMEM-resident pass
per [Z, F] slice computing the scan by log2(F) lane-shift doubling steps

    y <- y + a_z^(2^e) * shift(y, 2^e)

instead of the XLA blocked-Toeplitz pipeline, which makes ~5 HBM passes
over the drive array (materialize b, read it into the [Z, L, L] prefix
einsum, write prefixes, read prefixes + write y).  Here b is read once
and y written once — the recurrences are HBM-bound, so the pass count is
the cost.  FLOPs: ~3 ops x log2(F) levels per element on the VPU
(~33/elem at F = 2560) vs the Toeplitz form's L = 128 MACs/elem on the
MXU; both are far from their compute roofline, only traffic matters.

Numerics: the doubling scan REASSOCIATES the weighted sum
sum_s a^(t-s) b_s (error ~eps per level; coefficients in (0, 1) keep the
terms bounded), and the a^(2^e) step factors are exp(2^e log a) — the
same in-graph f32 construction as the Toeplitz tables.  The
blocked-Toeplitz XLA form remains the reference and the CPU /
wide-dtype / streaming path, same policy as ops/pallas_dc.

Used by iir.linear_recurrence_banded for float32 calls on TPU — the
batch pipelines' level-adapter, modulation, forward-masking, and slope
smoothers (y_{-1} = y0 folds into the first drive lane exactly, so
stateful calls qualify too).  Reference semantics: src/leveladapter.c:
262-332, src/modpatt.c:233-250, src/fbearmodel.c:388-395.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_steps: int, f: int, has_y0: bool):
    def kernel(b_ref, steps_ref, *rest):
        y = b_ref[...]                                  # [bm, Z, F]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f), 2)
        if has_y0:
            # y_{-1} = y0 folds into the drive exactly: b'[0] = b[0] + a y0
            # (steps column 0 is a^1)
            y0_ref, out_ref = rest
            y = y + jnp.where(lane == 0,
                              steps_ref[:, 0:1] * y0_ref[...], 0.0)
        else:
            (out_ref,) = rest
        for e in range(n_steps):
            sh = 1 << e
            rolled = pltpu.roll(y, sh, axis=2)
            y = y + steps_ref[:, e:e + 1] * jnp.where(lane >= sh, rolled,
                                                      0.0)
        out_ref[...] = y
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def recurrence_banded(a: jnp.ndarray, b: jnp.ndarray, y0=None,
                      interpret: bool = False) -> jnp.ndarray:
    """y_t = a_z y_{t-1} + b_t along the LAST axis, y_{-1} = y0 (or 0).

    a: [Z] float in (0, 1); b: [..., Z, F] float32; y0: [..., Z]
    broadcastable against b's shape without the last axis.  Returns y
    with b's shape and dtype.
    """
    shape = b.shape
    z = shape[-2]
    f = shape[-1]
    n_steps = max(1, int(np.ceil(np.log2(max(f, 2)))))
    # a^(2^e) step factors, padded to a full lane tile.  exp underflows
    # to 0.0 for deep powers — harmless (the far terms are dead anyway).
    log_a = jnp.log(a.astype(jnp.float32))[:, None]     # [Z, 1]
    pw = jnp.asarray(
        np.pad(2.0 ** np.arange(n_steps), (0, max(128 - n_steps, 0)))[None],
        jnp.float32)                                    # [1, >=128]
    steps = jnp.exp(log_a * pw)
    b3 = b.reshape(-1, z, f)
    m = b3.shape[0]
    # whole-row [bm, Z, F] tiles: the scan never crosses a tile boundary.
    # ~3 live f32 arrays per grid step; keep bm * Z * F under ~2M elements.
    bm = next((c for c in (8, 4, 2, 1) if m % c == 0 and c * z * f <= 2**21),
              1)
    grid = (m // bm,)
    blk = pl.BlockSpec((bm, z, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [blk,
                pl.BlockSpec((z, steps.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [b3.astype(jnp.float32), steps]
    if y0 is not None:
        y0b = jnp.broadcast_to(jnp.asarray(y0, jnp.float32),
                               shape[:-1]).reshape(m, z, 1)
        in_specs.append(pl.BlockSpec((bm, z, 1), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(y0b)
    out = pl.pallas_call(
        _make_kernel(n_steps, f, y0 is not None),
        out_shape=jax.ShapeDtypeStruct((m, z, f), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=blk,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_steps * z * f * m,
            bytes_accessed=2 * 4 * z * f * m,
            transcendentals=0),
    )(*operands)
    return out.reshape(shape).astype(b.dtype)


def _make_mod_kernel(n_steps: int, f: int, scale: float):
    def kernel(exc_ref, uns_ref, oma_ref, steps_ref,
               excf_ref, mod_ref, loudf_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f), 2)
        uns = uns_ref[...]                              # [bm, Z, F]
        loud = jnp.exp(0.3 * jnp.log(uns))
        prev = jnp.where(lane >= 1, pltpu.roll(loud, 1, axis=2), 0.0)
        deriv = scale * jnp.abs(loud - prev)
        oma = oma_ref[:, 0:1]                           # (1 - a) [Z, 1]

        def scan(y):
            for e in range(n_steps):
                sh = 1 << e
                y = y + steps_ref[:, e:e + 1] * jnp.where(
                    lane >= sh, pltpu.roll(y, sh, axis=2), 0.0)
            return y

        excf_ref[...] = scan(oma * exc_ref[...])
        filt_deriv = scan(oma * deriv)
        filt_loud = scan(oma * loud)
        mod_ref[...] = filt_deriv / (1.0 + filt_loud / 0.3)
        loudf_ref[...] = filt_loud
    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_mod_smoothers(a: jnp.ndarray, exc2: jnp.ndarray,
                        uns2: jnp.ndarray, scale: float,
                        interpret: bool = False):
    """The level-adapter stage-1 + modulation-processor smoothers with the
    drive construction IN-KERNEL: loud = uns^0.3, its one-frame lane
    shift, the |derivative|, the (1 - a) scaling, three doubling scans,
    and the modulation ratio all happen on the VMEM tile — the XLA form
    materializes the stacked drive tensor (~3x the band-array bytes) just
    to feed the recurrence.  Fresh state only (the batch pipelines).

    a: [Z]; exc2/uns2: [..., Z, F] float32 (> 0); scale = rate/step.
    Returns (exc_filt, mod, filt_loud), each exc2's shape.
    Reference: src/leveladapter.c:262-268, src/modpatt.c:233-250.
    """
    shape = exc2.shape
    z, f = shape[-2], shape[-1]
    n_steps = max(1, int(np.ceil(np.log2(max(f, 2)))))
    af = a.astype(jnp.float32)
    log_a = jnp.log(af)[:, None]
    pw = jnp.asarray(
        np.pad(2.0 ** np.arange(n_steps), (0, max(128 - n_steps, 0)))[None],
        jnp.float32)
    steps = jnp.exp(log_a * pw)
    oma = jnp.broadcast_to((1.0 - af)[:, None], (z, 128))
    e3 = exc2.reshape(-1, z, f).astype(jnp.float32)
    u3 = uns2.reshape(-1, z, f).astype(jnp.float32)
    m = e3.shape[0]
    bm = next((c for c in (4, 2, 1) if m % c == 0 and c * z * f <= 2**20), 1)
    grid = (m // bm,)
    blk = pl.BlockSpec((bm, z, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((z, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((m, z, f), jnp.float32)
    excf, mod, loudf = pl.pallas_call(
        _make_mod_kernel(n_steps, f, float(scale)),
        out_shape=(out_sh, out_sh, out_sh),
        grid=grid,
        in_specs=[blk, blk, cblk, cblk],
        out_specs=(blk, blk, blk),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=(9 * n_steps + 10) * z * f * m,
            bytes_accessed=5 * 4 * z * f * m,
            transcendentals=2 * z * f * m),
    )(e3, u3, oma, steps)
    dt = exc2.dtype
    rs = lambda x: x.reshape(shape).astype(dt)
    return rs(excf), rs(mod), rs(loudf)
