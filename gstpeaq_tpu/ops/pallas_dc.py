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
  row's last lane patched in (row 0 takes the carried chunk state, zeros
  for a fresh signal)
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


def _shift1(x, row_idx, init):
    """Shift right by one sample in the row-major [bb, m, L] layout:
    out[b, r, 0] = x[b, r-1, L-1]; `init` [bb, 1, 1] supplies row 0
    (zero for a fresh signal, the previous chunk's sample when
    streaming)."""
    lastcol = x[:, :, L - 1:L]                       # [bb, m, 1]
    prevrow = pltpu.roll(lastcol, 1, axis=1)
    col = jnp.where(row_idx == 0, init, prevrow)
    return jnp.concatenate([col, x[:, :, :L - 1]], axis=2)


def _row_scan(h, steps, sel, row_idx, y0):
    """Exclusive row-entry states E[r] = a^r y0 + sum_{r'<r} a^(r-1-r')
    h[r'] for a = lam^L, via an inclusive Hillis-Steele doubling over
    sublanes of the shifted sequence [y0, h_0, .., h_{m-2}] (seeding row
    0 with the carried recurrence state y0 [bb, 1, 1] folds the initial
    condition into the same doubling).  h: [bb, m, 1] (real) — `sel`
    picks the real/realm factor from `steps`."""
    hr = jnp.where(row_idx == 0, y0, pltpu.roll(h, 1, axis=1))
    for e, ap, am, _ in steps:
        a = ap if sel == 0 else am
        hr = hr + a * jnp.where(row_idx >= e, pltpu.roll(hr, e, axis=1), 0.0)
    return hr


def _row_scan_c(hr_, hi_, steps, row_idx, y0r, y0i):
    """Complex variant of _row_scan (biquad2's conjugate-pair pole)."""
    hr = jnp.where(row_idx == 0, y0r, pltpu.roll(hr_, 1, axis=1))
    hi = jnp.where(row_idx == 0, y0i, pltpu.roll(hi_, 1, axis=1))
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

    def kernel(lf_ref, x_ref, st_ref, toep_p_ref, toep_m_ref, t2r_ref,
               t2i_ref, pw_p_ref, pw_m_ref, pw2r_ref, pw2i_ref, out_ref,
               st_out_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
        st = st_ref[...]                             # [bb, 1, 8] carried state

        def sc(i):
            return st[:, :, i:i + 1]                 # [bb, 1, 1]

        xs = x_ref[...] * lf_ref[0]
        # ff1: v1 = xs - 2 xs[-1] + xs[-2] (tails from the carried state)
        s1 = _shift1(xs, row_idx, sc(1))
        s2 = _shift1(s1, row_idx, sc(0))
        v1 = xs - 2.0 * s1 + s2
        # biquad1 pole cascade: w = rec(lp, v1); y1 = rec(lm, w)
        pp = dot_t(v1, toep_p_ref[...])
        ew = _row_scan(pp[:, :, L - 1:L], steps, 0, row_idx, sc(2))
        w = pp + ew * pw_p_ref[...]
        pm = dot_t(w, toep_m_ref[...])
        ey = _row_scan(pm[:, :, L - 1:L], steps, 1, row_idx, sc(3))
        y1 = pm + ey * pw_m_ref[...]
        # ff2
        t1 = _shift1(y1, row_idx, sc(5))
        t2 = _shift1(t1, row_idx, sc(4))
        v2 = y1 - 2.0 * t1 + t2
        # biquad2: one complex conjugate-pair recurrence, y2 = 2 Re(g u)
        p2r = dot_t(v2, t2r_ref[...])
        p2i = dot_t(v2, t2i_ref[...])
        e2r, e2i = _row_scan_c(p2r[:, :, L - 1:L], p2i[:, :, L - 1:L],
                               steps, row_idx, sc(6), sc(7))
        u_r = p2r + e2r * pw2r_ref[...] - e2i * pw2i_ref[...]
        u_i = p2i + e2r * pw2i_ref[...] + e2i * pw2r_ref[...]
        out_ref[...] = 2.0 * (gr * u_r - gi * u_i)
        # new state, same packing as fb_ear.dc_reject's streaming tuple:
        # (x_tail, (w, y1) carries, y1_tail, (Re u, Im u)).  The 8 scalars
        # ride lanes 0..7 of sublane 0 in a FULL (bb, 8, 128) tile: Mosaic
        # SIGABRTs (lower_to_llo.cc d>>32) storing computed values into
        # refs with sub-tile trailing dims, while a full-tile store of the
        # zero-padded concat lowers fine (bisected on-chip, round 3).
        c = jnp.concatenate(
            [xs[:, m - 1:m, L - 2:L], w[:, m - 1:m, L - 1:L],
             y1[:, m - 1:m, L - 1:L], y1[:, m - 1:m, L - 2:L],
             u_r[:, m - 1:m, L - 1:L], u_i[:, m - 1:m, L - 1:L]], axis=2)
        st_out_ref[...] = jnp.pad(c, ((0, 0), (0, 7), (0, L - 8)))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "return_state"))
def dc_chain_blocked(x3: jnp.ndarray, level_factor, state=None,
                     return_state: bool = False, interpret: bool = False):
    """hp2 = dc_reject(level_factor * x) in ONE Pallas pass.

    x3: [n, m, 128] float32 blocked sample stream (sample 128 b + l at
    [.., b, l]); level_factor: scalar.  Returns hp2 in the same blocked
    layout (+ the new filter state when `return_state`).

    `state`/returned state use fb_ear.dc_reject's streaming tuple layout
    (x_tail, u1, y1_tail, u2), each [n, 2] in the SCALED (level_factor
    applied) domain — interchangeable with the XLA chain's carries at
    the kernel's f32-reordering level.  None = zero initial state, which
    is bit-identical to the stateless form (the seeds flow through the
    same `where` row-0 selects with value 0).
    """
    n, m, l = x3.shape
    assert l == L and m % 8 == 0, (x3.shape,)
    # state rides as [n, 1, 8]: a 2-d [n, 8] operand would need a (b, 8)
    # block, and Mosaic rejects sublane blocks that neither divide 8 nor
    # equal the array dim (b = 1 for long signals); with a singleton
    # sublane axis the last two block dims (1, 8) always equal the array
    if state is None:
        st = jnp.zeros((n, 1, 8), jnp.float32)
    else:
        st = jnp.concatenate([s.reshape(n, 1, 2).astype(jnp.float32)
                              for s in state], axis=2)
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
    hp2, st_new = pl.pallas_call(
        _make_kernel(steps, g, m),
        out_shape=(jax.ShapeDtypeStruct((n, m, L), jnp.float32),
                   jax.ShapeDtypeStruct((n, 8, L), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk,
                  pl.BlockSpec((b, 1, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  cblk((L, L)), cblk((L, L)), cblk((L, L)), cblk((L, L)),
                  cblk((1, 1, L)), cblk((1, 1, L)), cblk((1, 1, L)),
                  cblk((1, 1, L))],
        out_specs=(blk,
                   pl.BlockSpec((b, 8, L), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
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
    )(lf, x3, st, consts["toep_p"], consts["toep_m"], consts["t2r"],
      consts["t2i"], consts["pw_p"], consts["pw_m"], consts["pw2r"],
      consts["pw2i"])
    if not return_state:
        return hp2
    st_new = st_new[:, 0, :8]
    return hp2, (st_new[:, 0:2], st_new[:, 2:4], st_new[:, 4:6],
                 st_new[:, 6:8])
