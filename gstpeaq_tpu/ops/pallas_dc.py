"""Pallas TPU kernel for the FB ear model's DC-rejection cascade.

One VMEM-resident pass over the sample stream replacing the XLA chain
level-scale -> ff1 -> biquad1 -> ff2 -> biquad2 (ops/fb_ear.dc_reject),
which materializes ~10 HBM passes over the [.., T] sample arrays (~3.7 ms
of the advanced pipeline's ~32 ms iteration): here the signal is read
once and only hp2 is written.

Each grid step processes ONE ENTIRE signal row (a [bb, m, 128] tile of
the blocked stream, bb rows x the full time axis, ~2 MB per array at
m = 3840): the whole row fits VMEM, so the filter state never crosses a
tile boundary and the kernel needs no scratch carry.  (The earlier
sequential-time-grid design carried state in VMEM scratch; the Mosaic
lowering crashes — lower_to_llo.cc d>>32 check — whenever a scratch
read feeds the doubling scan whose result is written back to the same
scratch.  Whole-row tiles sidestep the cycle entirely.)

Per grid step:

* the ff (1 - z^-1)^2 feedforwards are lane shifts with the previous
  row's last lane patched in (zeros at r = 0: zero initial filter state)
  — the ff1 -> poles1 -> ff2 -> poles2 INTERLEAVING is numerically
  load-bearing (see fb_ear.dc_reject) and is kept exactly;
* each first-order recurrence is the same blocked Toeplitz scheme as
  iir.linear_recurrence_blocked at L = 128: an in-kernel [bb*m, 128] x
  [128, 128] HIGHEST-precision MXU dot for the in-row prefixes, a
  log-depth Hillis-Steele doubling ALONG SUBLANES for the m row-entry
  states (the [bb, m, 1] column is tiny), and one broadcast FMA;
* biquad1 (real distinct poles) stays the CASCADE of two real
  recurrences and biquad2 (complex pair) the single conjugate-pair
  complex recurrence — the same well-conditioned forms as
  fb_ear._biquad_feedback, for the same reasons.

Numerics: summation order differs from the XLA path only in the row-entry
scan (direct log-depth doubling over m rows vs the recursive blocked
scheme), an eps-level difference; the kernel is float32-tier-only and the
XLA path remains the reference (and the CPU / wide-dtype / streaming
path).  Reference chain: src/fbearmodel.c:291-303.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as _C

L = 128          # Toeplitz block (= lane count)


def _tables(m: int):
    """Host-side f64 power tables for both biquads, cast to f32.

    biquad1 (HP1): real distinct poles lp > lm — cascade tables.
    biquad2 (HP2): complex-conjugate pair lam — re/im split tables and
    the output gain g = lam / (lam - conj lam) (y = 2 Re(g u)).
    `steps` are the doubling factors a^(L*e), e = 1, 2, 4, ... < m for
    the row-entry scan (deep powers underflow to 0.0 harmlessly)."""
    a1, a2 = _C.HP1_A
    d = np.sqrt(a1 * a1 + 4.0 * a2)
    lp = (a1 + d) / 2.0
    lm = (a1 - d) / 2.0
    b1, b2 = _C.HP2_A
    lam = complex(b1 / 2.0, np.sqrt(-(b1 * b1 + 4.0 * b2)) / 2.0)
    g = lam / (lam - np.conj(lam))

    idx = np.arange(L)
    expo = idx[None, :] - idx[:, None]              # [j, l] -> l - j
    mask = expo >= 0

    def toep(lam_):
        return np.where(mask, np.power(lam_, np.maximum(expo, 0)), 0.0)

    def pw(lam_):
        return np.power(lam_, idx + 1.0)[None, None, :]   # [1, 1, L]

    f = lambda a: jnp.asarray(np.real(a), jnp.float32)
    t2 = toep(lam)
    p2 = pw(lam)
    consts = dict(
        toep_p=f(toep(lp)), toep_m=f(toep(lm)),
        t2r=f(t2), t2i=jnp.asarray(np.imag(t2), jnp.float32),
        pw_p=f(pw(lp)), pw_m=f(pw(lm)),
        pw2r=f(p2), pw2i=jnp.asarray(np.imag(p2), jnp.float32),
    )
    steps = []
    e = 1
    while e < m:
        with np.errstate(under="ignore"):
            steps.append((e,
                          float(np.real(lp ** (L * e))),
                          float(np.real(lm ** (L * e))),
                          complex(lam ** (L * e))))
        e *= 2
    return consts, steps, (float(np.real(g)), float(np.imag(g)))


def _shift1(x, row_idx):
    """Shift right by one sample in the row-major [bb, m, L] layout:
    out[b, r, 0] = x[b, r-1, L-1] (zero for r = 0: zero initial state)."""
    lastcol = x[:, :, L - 1:L]                       # [bb, m, 1]
    prevrow = pltpu.roll(lastcol, 1, axis=1)
    col = jnp.where(row_idx == 0, 0.0, prevrow)
    return jnp.concatenate([col, x[:, :, :L - 1]], axis=2)


def _row_scan(h, steps, sel, row_idx):
    """Exclusive row-entry states E[r] = sum_{r'<r} a^(r-1-r') h[r'] for
    a = lam^L, via an inclusive Hillis-Steele doubling over sublanes of
    the shifted sequence [0, h_0, .., h_{m-2}].  h: [bb, m, 1] (real) —
    `sel` picks the real/realm factor from `steps`."""
    hr = jnp.where(row_idx == 0, 0.0, pltpu.roll(h, 1, axis=1))
    for e, ap, am, _ in steps:
        a = ap if sel == 0 else am
        hr = hr + a * jnp.where(row_idx >= e, pltpu.roll(hr, e, axis=1), 0.0)
    return hr


def _row_scan_c(hr_, hi_, steps, row_idx):
    """Complex variant of _row_scan (biquad2's conjugate-pair pole)."""
    hr = jnp.where(row_idx == 0, 0.0, pltpu.roll(hr_, 1, axis=1))
    hi = jnp.where(row_idx == 0, 0.0, pltpu.roll(hi_, 1, axis=1))
    for e, _, _, alam in steps:
        ar, ai = alam.real, alam.imag
        rr = jnp.where(row_idx >= e, pltpu.roll(hr, e, axis=1), 0.0)
        ri = jnp.where(row_idx >= e, pltpu.roll(hi, e, axis=1), 0.0)
        hr = hr + ar * rr - ai * ri
        hi = hi + ar * ri + ai * rr
    return hr, hi


def _make_kernel(steps, g, m):
    gr, gi = g
    hp = jax.lax.Precision.HIGHEST

    def dot_t(x, t):
        return jax.lax.dot_general(
            x, t, (((2,), (0,)), ((), ())), precision=hp,
            preferred_element_type=jnp.float32)

    def kernel(lf_ref, x_ref, toep_p_ref, toep_m_ref, t2r_ref, t2i_ref,
               pw_p_ref, pw_m_ref, pw2r_ref, pw2i_ref, out_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)

        xs = x_ref[...] * lf_ref[0]
        # ff1: v1 = xs - 2 xs[-1] + xs[-2]
        s1 = _shift1(xs, row_idx)
        s2 = _shift1(s1, row_idx)
        v1 = xs - 2.0 * s1 + s2
        # biquad1 pole cascade: w = rec(lp, v1); y1 = rec(lm, w)
        pp = dot_t(v1, toep_p_ref[...])
        ew = _row_scan(pp[:, :, L - 1:L], steps, 0, row_idx)
        w = pp + ew * pw_p_ref[...]
        pm = dot_t(w, toep_m_ref[...])
        ey = _row_scan(pm[:, :, L - 1:L], steps, 1, row_idx)
        y1 = pm + ey * pw_m_ref[...]
        # ff2
        t1 = _shift1(y1, row_idx)
        t2 = _shift1(t1, row_idx)
        v2 = y1 - 2.0 * t1 + t2
        # biquad2: one complex conjugate-pair recurrence, y2 = 2 Re(g u)
        p2r = dot_t(v2, t2r_ref[...])
        p2i = dot_t(v2, t2i_ref[...])
        e2r, e2i = _row_scan_c(p2r[:, :, L - 1:L], p2i[:, :, L - 1:L],
                               steps, row_idx)
        u_r = p2r + e2r * pw2r_ref[...] - e2i * pw2i_ref[...]
        u_i = p2i + e2r * pw2i_ref[...] + e2i * pw2r_ref[...]
        out_ref[...] = 2.0 * (gr * u_r - gi * u_i)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def dc_chain_blocked(x3: jnp.ndarray, level_factor, interpret: bool = False):
    """hp2 = dc_reject(level_factor * x) in ONE Pallas pass.

    x3: [n, m, 128] float32 blocked sample stream (sample 128 b + l at
    [.., b, l]); level_factor: scalar.  Returns hp2 in the same blocked
    layout.  Zero initial filter state (whole-signal / first-chunk form
    only — the streaming path keeps the XLA chain).
    """
    n, m, l = x3.shape
    assert l == L and m % 8 == 0, (x3.shape,)
    consts, steps, g = _tables(m)
    # whole-row tiles: keep bb * m modest so ~12 live [bb, m, 128] f32
    # arrays stay well under VMEM
    b = next((bb for bb in (8, 4, 2, 1) if n % bb == 0 and bb * m <= 4608),
             1)
    grid = (n // b,)
    blk = pl.BlockSpec((b, m, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cblk = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    lf = jnp.reshape(jnp.asarray(level_factor, jnp.float32), (1,))
    return pl.pallas_call(
        _make_kernel(steps, g, m),
        out_shape=jax.ShapeDtypeStruct((n, m, L), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk,
                  cblk((L, L)), cblk((L, L)), cblk((L, L)), cblk((L, L)),
                  cblk((1, 1, L)), cblk((1, 1, L)), cblk((1, 1, L)),
                  cblk((1, 1, L))],
        out_specs=blk,
        interpret=interpret,
        # whole-row tiles exceed the default 16 MB scoped-VMEM budget
        # (~10 live [bb, m, 128] f32 arrays at m = 3840); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * L * (n * m * L),
            bytes_accessed=2 * 4 * n * m * L,
            transcendentals=0),
    )(lf, x3, consts["toep_p"], consts["toep_m"], consts["t2r"],
      consts["t2i"], consts["pw_p"], consts["pw_m"], consts["pw2r"],
      consts["pw2i"])
