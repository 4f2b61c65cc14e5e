"""MOV accumulation as masked reductions over the frame axis.

The reference accumulates frame by frame with a three-state INIT / NORMAL /
TENTATIVE machine per accumulator (src/movaccum.c:304-354): frames before the
first above-threshold frame are dropped entirely (INIT), and a snapshot taken
on entering tentative state makes trailing below-threshold frames invisible
to the final value.  Over a complete (finite) program this is equivalent to
a closed-form frame mask:

    committed[t] = any(above) & (t_first <= t <= t_last)

with t_first/t_last the first/last above-threshold frames — no sequential
state needed.  Only MODE_FILTERED_MAX (an IIR) and MODE_AVG_WINDOW (a sliding
window over *accumulated* frames) keep an internal trajectory; both are
expressed with log-depth scans / shifted stacks below.

A welcome corollary: trailing zero-padding frames (bucketed batching!) are
never above threshold, so they are masked out automatically — batching pairs
of different lengths requires no extra machinery.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import iir


def activity(above: jnp.ndarray):
    """above: [F] bool -> (has_any, active[F], committed[F]).

    active[t]:    accumulator not in INIT at frame t (state advances)
    committed[t]: contribution of frame t visible in the final value
    """
    has = jnp.any(above)
    f = above.shape[0]
    t = jnp.arange(f)
    t_first = jnp.argmax(above)
    t_last = f - 1 - jnp.argmax(above[::-1])
    active = has & (t >= t_first)
    committed = active & (t <= t_last)
    return has, active, committed


def _msum(x, mask):
    """Sum of x over frames where mask, NaN-proof for masked-out entries."""
    return jnp.sum(jnp.where(mask, x, 0.0), axis=0)


def avg(v, w, mask):
    """MODE_AVG; src/movaccum.c:386-390,450-451. v/w/mask: [F, ...]."""
    return _msum(w * v, mask) / _msum(w, mask)


def avg_log(v, w, mask):
    """MODE_AVG_LOG; src/movaccum.c:453-455."""
    return 10.0 * jnp.log10(_msum(w * v, mask) / _msum(w, mask))


def rms(v, w, mask):
    """MODE_RMS (weight-squared RMS); src/movaccum.c:375-378,458-460."""
    w2 = w * w
    return jnp.sqrt(_msum(w2 * v * v, mask) / _msum(w2, mask))


def rms_asym(v, w, mask):
    """MODE_RMS_ASYM (w is the second input); src/movaccum.c:380-384,462-466."""
    den = _msum(jnp.ones_like(v), mask)
    return (jnp.sqrt(_msum(v * v, mask) / den)
            + 0.5 * jnp.sqrt(_msum(w * w, mask) / den))


def adb(v, mask):
    """MODE_ADB; src/movaccum.c:471-476. v/mask: [F]."""
    num = _msum(v, mask)
    den = _msum(jnp.ones_like(v), mask)
    return jnp.where(den > 0,
                     jnp.where(num == 0.0, -0.5,
                               jnp.log10(jnp.maximum(num, 1e-300) / den)),
                     0.0)


def filtered_max(v, called, committed):
    """MODE_FILTERED_MAX; src/movaccum.c:415-422,468-469.

    The 0.9/0.1 IIR advances only on frames where accumulate() is called
    (`called`); the result is the running max of the filter state over
    committed call frames.  v/called/committed: [F, ...].
    """
    a = jnp.where(called, 0.9, 1.0)
    b = jnp.where(called, 0.1 * v, 0.0)
    state = iir.linear_recurrence(a, b, axis=0)
    return jnp.max(jnp.where(committed & called, state, 0.0), axis=0)


def avg_window(v, called, committed):
    """MODE_AVG_WINDOW (4-frame sliding window of sqrt, NaN-primed warmup);
    src/movaccum.c:392-413.

    Assumes `called` frames form one contiguous block (true for its only
    user, WinModDiff1B, gated on frame_counter >= 24): the j-th call
    contributes ((sum of last 4 sqrt values)/4)^4 once j >= 3.  The shift
    trick below silently mixes non-adjacent frames if the block has gaps,
    so violation poisons the result with NaN (loud, not wrong).
    """
    # invariant guard: `called` must be 0*1*0* along the frame axis
    # (at most one rising edge) for the fixed-shift window to be the
    # reference's per-call sliding window
    rising = (jnp.sum((called[1:] & ~called[:-1]).astype(jnp.int32), axis=0)
              + called[0].astype(jnp.int32))
    contiguous = jnp.all(rising <= 1)
    sq = jnp.sqrt(jnp.where(called, v, 0.0))

    def shift(x, k):
        pad = jnp.zeros_like(x[:k])
        return jnp.concatenate([pad, x[:-k]], axis=0) if k else x

    winsum = (sq + shift(sq, 1) + shift(sq, 2) + shift(sq, 3)) / 4.0
    contrib = winsum ** 4
    # call index: number of called frames before t (inclusive) - 1
    call_idx = jnp.cumsum(called.astype(v.dtype), axis=0) - 1.0
    full = called & (call_idx >= 3)
    mask = full & committed
    out = jnp.sqrt(_msum(contrib, mask) / _msum(jnp.ones_like(v), mask))
    return jnp.where(contiguous, out, jnp.nan)
