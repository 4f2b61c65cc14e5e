"""Level and pattern adaptation, vectorized over the frame axis.

The reference (src/leveladapter.c:242-340) carries eight per-band state
arrays frame by frame. All of them are first-order *linear* recurrences, so
the whole adapter runs as a handful of associative scans over the frame axis
plus elementwise math — no serial loop:

  1. ref/test filtered excitations  (smoothing IIR)      -> scan
  2. scalar level correction        (per-frame reduction) -> elementwise
  3. filtered num/den               (IIR without (1-a))   -> scan
  4. pattern-adaptation sliding average over bands        -> static matmul
  5. pattcorr smoothing             (smoothing IIR)       -> scan

Layout: all band-domain arrays are [..., Z, F] — bands on sublanes, frames
on lanes (the TPU MOV-tail convention).  The banded recurrences consume
this layout natively (no moveaxis), band reductions contract the sublane
axis, and none of the elementwise math pays the 40->128 lane padding of a
bands-minor layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iir


def sliding_average_matrix(band_count: int) -> np.ndarray:
    """Static [Z, Z] matrix for the +-M1/M2 band average;
    src/leveladapter.c:313-325.  Orientation: out[k] = sum_w in[w] * mat[w, k]
    (bands-minor right-multiply); the transposed-layout left-multiply uses
    mat.T."""
    m1c = band_count // 36
    m2c = band_count // 25
    mat = np.zeros((band_count, band_count))
    for k in range(band_count):
        m1 = min(k, m1c)
        m2 = min(band_count - k - 1, m2c)
        mat[k - m1:k + m2 + 1, k] = 1.0 / (m1 + m2 + 1)
    return mat


def level_adapt(a: jnp.ndarray, avg_matrix: jnp.ndarray,
                ref_excitation: jnp.ndarray, test_excitation: jnp.ndarray,
                state=None):
    """Process all frames at once.

    a:                [Z] smoothing coefficients (tau 0.008/0.05)
    avg_matrix:       [Z, Z] from sliding_average_matrix
    ref/test_excitation: [..., Z, F]
    `state` carries the six per-band IIR states ([..., Z] each) for chunked
    streaming (ref_filt, test_filt, filt_num, filt_den, pattcorr_ref,
    pattcorr_test).
    Returns (adapted_ref, adapted_test, new_state), each [..., Z, F].
    """
    # The six per-band recurrences batch pairwise into three banded
    # Toeplitz-GEMM calls (a leading ref/test stack axis): same math per
    # slice, half the recurrence-GEMM dispatches with doubled M rows.
    s = state if state is not None else (None,) * 6
    a_col = a[:, None]                # broadcast against the band SUBLANES
    pair0 = None if s[0] is None else jnp.stack([s[0], s[1]])
    filt = iir.linear_recurrence_banded(
        a, (1.0 - a_col) * jnp.stack([ref_excitation, test_excitation]),
        axis=-1, y0=pair0)
    ref_filt, test_filt = filt[0], filt[1]
    # (45) in BS.1387; src/leveladapter.c:260-277
    num = jnp.sum(jnp.sqrt(ref_filt * test_filt), axis=-2)
    den = jnp.sum(test_filt, axis=-2)
    lev_corr = (num * num / (den * den))[..., None, :]   # [..., 1, F]
    louder_ref = lev_corr > 1.0
    levcorr_ref = jnp.where(louder_ref, ref_excitation / lev_corr,
                            ref_excitation)
    levcorr_test = jnp.where(louder_ref, test_excitation,
                             test_excitation * lev_corr)
    # (48); note the input terms are *not* scaled by (1-a);
    # src/leveladapter.c:291-298
    pair2 = None if s[2] is None else jnp.stack([s[2], s[3]])
    nd = iir.linear_recurrence_banded(
        a, jnp.stack([levcorr_test * levcorr_ref,
                      levcorr_ref * levcorr_ref]), axis=-1, y0=pair2)
    filt_num, filt_den = nd[0], nd[1]
    num_ge = filt_num >= filt_den
    pattadapt_ref = jnp.where(num_ge, 1.0, filt_num / filt_den)
    pattadapt_test = jnp.where(num_ge, filt_den / filt_num, 1.0)
    hp = jax.lax.Precision.HIGHEST
    # transposed-layout band average: out[.., k, f] = sum_w mat[w, k] x[.., w, f]
    ra = jnp.matmul(avg_matrix.T,
                    jnp.stack([pattadapt_ref, pattadapt_test]),
                    precision=hp)
    pair4 = None if s[4] is None else jnp.stack([s[4], s[5]])
    pc = iir.linear_recurrence_banded(a, (1.0 - a_col) * ra, axis=-1,
                                      y0=pair4)
    pattcorr_ref, pattcorr_test = pc[0], pc[1]
    new_state = tuple(x[..., -1] for x in (
        ref_filt, test_filt, filt_num, filt_den, pattcorr_ref, pattcorr_test))
    return (levcorr_ref * pattcorr_ref, levcorr_test * pattcorr_test,
            new_state)
