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
