"""Modulation-pattern processing, vectorized over the frame axis.

src/modpatt.c:222-251: per band, loudness E^0.3, scaled absolute derivative
and loudness both smoothed by first-order IIRs -> two associative scans.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from ..ops import iir


def modulation(a: jnp.ndarray, unsmeared_excitation: jnp.ndarray,
               step_size: int):
    """unsmeared_excitation: [F, ..., Z] (frame axis leading) ->
    (modulation, average_loudness)."""
    derivative_factor = C.SAMPLING_RATE / step_size
    loud = unsmeared_excitation ** 0.3
    prev = jnp.concatenate([jnp.zeros_like(loud[:1]), loud[:-1]], axis=0)
    deriv = derivative_factor * jnp.abs(loud - prev)
    filt_deriv = iir.smoothing_filter(a, deriv, axis=0)
    filt_loud = iir.smoothing_filter(a, loud, axis=0)
    mod = filt_deriv / (1.0 + filt_loud / 0.3)
    return mod, filt_loud
