"""First-order linear recurrences as parallel (log-depth) scans.

Every stateful stage in PEAQ — time-domain smearing (src/fftearmodel.c:496-504),
forward masking (src/fbearmodel.c:388-395), level adaptation smoothers
(src/leveladapter.c:262-332), modulation smoothers (src/modpatt.c:233-250),
the slope filter (src/fbearmodel.c:336-338) and the MFPD max filter
(src/movaccum.c:415-422) — is a recurrence y_t = a_t * y_{t-1} + b_t.
On TPU we evaluate these with jax.lax.associative_scan (Blelloch), turning a
serial loop over hundreds/thousands of frames into ~log2(T) vectorized steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def linear_recurrence(a: jnp.ndarray, b: jnp.ndarray, axis: int = 0,
                      y0=None) -> jnp.ndarray:
    """Solve y_t = a_t * y_{t-1} + b_t along `axis` with y_{-1} = y0 (or 0).

    `a` is broadcast against `b` (e.g. constant per-band coefficients against
    per-frame inputs). Returns y with the same shape as b.
    """
    a = jnp.broadcast_to(a, b.shape)
    aa, bb = jax.lax.associative_scan(_combine, (a, b), axis=axis)
    if y0 is not None:
        bb = bb + aa * jnp.expand_dims(y0, axis)
    return bb


def smoothing_filter(a: jnp.ndarray, x: jnp.ndarray, axis: int = 0,
                     y0=None) -> jnp.ndarray:
    """y_t = a * y_{t-1} + (1 - a) * x_t (the standard PEAQ smoother)."""
    return linear_recurrence(a, (1.0 - a) * x, axis=axis, y0=y0)


def running_max(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Cumulative maximum along `axis` (associative, log-depth)."""
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis)


def linear_recurrence_blocked(a, b: jnp.ndarray, y0=None,
                              block: int = 64) -> jnp.ndarray:
    """y_t = a * y_{t-1} + b_t along the LAST axis, constant scalar `a`.

    Blocked two-pass algorithm: associative_scan makes ~2*log2(T) passes
    over the data; for sample-rate recurrences (T ~ 5e5) that is memory-bound
    and slow.  Here the axis is split into blocks of `block`: a short
    lax.scan over block-local steps (each step a wide FMA over all blocks in
    parallel), a tiny cross-block prefix, and a second short scan — ~4 data
    passes total.  Exact same math; |a| < 1 keeps it stable.

    b: [..., T] with T divisible by `block`; y0: [...] initial state.
    """
    dtype = b.dtype
    a = jnp.asarray(a, dtype)
    shape = b.shape
    t = shape[-1]
    pad = (-t) % block
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros((*shape[:-1], pad), dtype)], axis=-1)
    tt = t + pad
    g = tt // block
    bb = b.reshape(-1, g, block)
    n = bb.shape[0]
    bt = jnp.moveaxis(bb, -1, 0)  # [L, n, g]

    # pass 1+2 fused: scan block-local steps, carrying the running state of
    # every block at once; record states to produce outputs later.
    # First compute zero-entry block prefixes AND block summaries:
    def step(c, x):
        c2 = a * c + x
        return c2, c2

    zero = jnp.zeros((n, g), dtype)
    block_final, prefix = jax.lax.scan(step, zero, bt)  # prefix: [L, n, g]

    # cross-block exclusive prefix: entry state of block k is
    # E_k = a^L * E_{k-1} + final_{k-1}, E_0 = y0
    a_l = a ** block
    init = (jnp.zeros((n,), dtype) if y0 is None
            else jnp.asarray(y0, dtype).reshape(-1))

    def blk(c, f):
        e = c
        c2 = a_l * c + f
        return c2, e

    _, entries = jax.lax.scan(blk, init, jnp.moveaxis(block_final, 0, 1))
    entries = jnp.moveaxis(entries, 0, 1)  # [n, g]

    # final: y[l, :, g] = prefix + a^(l+1) * entry
    powers = jnp.power(a, jnp.arange(1, block + 1)).astype(dtype)
    y = prefix + powers[:, None, None] * entries[None]
    y = jnp.moveaxis(y, 0, -1).reshape(*shape[:-1], tt)
    return y[..., :t] if pad else y
