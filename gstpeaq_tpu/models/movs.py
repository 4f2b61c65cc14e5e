"""Model-output-variable computation, vectorized over the frame axis.

Each function maps the per-frame quantities produced by the ear models /
preprocessors (frame axis leading) to per-frame MOV contributions; the
masked-reduction accumulation lives in accum.py.  Reference: src/movs.c.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import earparams as EP
from ..ops import ct_dft as CTD
from ..ops import fft_ear as FE


def modulation_difference(internal_noise: jnp.ndarray, mod_ref: jnp.ndarray,
                          mod_test: jnp.ndarray, avg_loud_ref: jnp.ndarray,
                          rms_mode: bool, lev_wt: float):
    """ModDiff1/ModDiff2/TempWt per frame; src/movs.c:204-254.

    mod_ref/mod_test/avg_loud_ref: [..., Z, F] (transposed MOV-tail
    layout: bands on sublanes).  Returns (mod_diff_1b, mod_diff_2b,
    temp_wt), each [..., F].
    """
    band_count = mod_ref.shape[-2]
    diff = jnp.abs(mod_ref - mod_test)
    md1 = jnp.sum(diff / (1.0 + mod_ref), axis=-2)
    w = jnp.where(mod_test >= mod_ref, 1.0, 0.1)
    md2 = jnp.sum(w * diff / (0.01 + mod_ref), axis=-2)
    temp_wt = jnp.sum(
        avg_loud_ref
        / (avg_loud_ref + (lev_wt * internal_noise ** 0.3)[:, None]),
        axis=-2)
    if rms_mode:
        md1 = md1 * (100.0 / np.sqrt(band_count))
    else:
        md1 = md1 * (100.0 / band_count)
    md2 = md2 * (100.0 / band_count)
    return md1, md2, temp_wt


def noise_loudness(internal_noise: jnp.ndarray, alpha: float,
                   thres_fac: float, s0: float, nl_min: float,
                   mod_ref: jnp.ndarray, mod_test: jnp.ndarray,
                   e_ref: jnp.ndarray, e_test: jnp.ndarray) -> jnp.ndarray:
    """Noise-loudness kernel, (66)-(68) of BS.1387; src/movs.c:708-743.
    All band inputs [..., Z, F] (transposed MOV-tail layout) -> [..., F]."""
    band_count = mod_ref.shape[-2]
    noise = internal_noise[:, None]
    sref = thres_fac * mod_ref + s0
    stest = thres_fac * mod_test + s0
    beta = jnp.exp(-alpha * (e_test - e_ref) / e_ref)
    nl = jnp.sum(
        (noise / stest) ** 0.23
        * ((1.0 + jnp.maximum(stest * e_test - sref * e_ref, 0.0)
            / (noise + sref * e_ref * beta)) ** 0.23 - 1.0),
        axis=-2) * (24.0 / band_count)
    return jnp.where(nl < nl_min, 0.0, nl)


def bandwidth(ref_power: jnp.ndarray, test_power: jnp.ndarray,
              bin_idx=None):
    """BandwidthRef/TestB per frame; src/movs.c:775-809.

    ref/test_power: [..., 1025] in natural bin order, or — with `bin_idx`
    given (the CT-DFT grid, ops/ct_dft) — [..., 1024] in any order, with
    bin_idx[q] naming the bin at position q.  The scans are order-free:
    "largest bin index above threshold" is a masked max over bin_idx.
    Returns (bw_ref, bw_test, valid) with valid = bw_ref > 346.
    """
    dtype = ref_power.dtype
    if bin_idx is None:
        zt = jnp.max(test_power[..., 921:1024], axis=-1, keepdims=True)
        idx = jnp.arange(921)
        # largest i in [1, 921] with ref_power[i-1] > 10*zt, else 0
        mask_ref = ref_power[..., :921] > 10.0 * zt
        bw_ref = jnp.max(jnp.where(mask_ref, idx + 1, 0), axis=-1)
        mask_test = test_power[..., :921] >= C.FIVE_DB_POWER_FACTOR * zt
        # largest i <= bw_ref with test_power[i-1] >= 5dB*zt, else 0
        below = idx < bw_ref[..., None]
        bw_test = jnp.max(jnp.where(mask_test & below, idx + 1, 0), axis=-1)
    else:
        # powers are >= 0, so masked maxes can fill with 0
        zt = jnp.max(jnp.where((bin_idx >= 921) & (bin_idx < 1024),
                               test_power, 0.0), axis=-1, keepdims=True)
        head = bin_idx < 921
        mask_ref = head & (ref_power > 10.0 * zt)
        bw_ref = jnp.max(jnp.where(mask_ref, bin_idx + 1, 0), axis=-1)
        mask_test = head & (test_power >= C.FIVE_DB_POWER_FACTOR * zt)
        below = bin_idx < bw_ref[..., None]
        bw_test = jnp.max(jnp.where(mask_test & below, bin_idx + 1, 0),
                          axis=-1)
    valid = bw_ref > 346
    return (bw_ref.astype(dtype), bw_test.astype(dtype), valid)


def nmr(group_matrix: jnp.ndarray, masking_difference: jnp.ndarray,
        ref_weighted: jnp.ndarray, test_weighted: jnp.ndarray,
        ref_excitation: jnp.ndarray, delta_weighted=None):
    """NMR per frame + disturbed-frame flag; src/movs.c:970-1023.

    ref/test_weighted: [..., 1025], ref_excitation: [..., Z]
    (leading axes arbitrary; the pipelines pass [CH, F, ...]).
    `delta_weighted` (optional): accurately-cancelled wr - wt from
    fft_ear.stateless_pair_hop (grouping-supported bins only — slice the
    weighted spectra and group_matrix to k.group_bin_hi to match); the
    noise spectrum then evaluates as
    ((wr - wt) / (sqrt(wr) + sqrt(wt)))^2 — algebraically identical to
    (sqrt(wr) - sqrt(wt))^2 but immune to the f32 cancellation that
    dominates NMR on near-transparent pairs.
    Returns (nmr_mean, disturbed) with disturbed in {0., 1.}.
    """
    if delta_weighted is not None:
        denom = jnp.sqrt(ref_weighted) + jnp.sqrt(test_weighted)
        ratio = delta_weighted / jnp.where(denom > 0.0, denom, 1.0)
        noise_spectrum = ratio * ratio
    else:
        noise_spectrum = (ref_weighted
                          - 2.0 * jnp.sqrt(ref_weighted * test_weighted)
                          + test_weighted)
    noise_in_bands = jnp.maximum(
        jnp.dot(noise_spectrum, group_matrix,
                precision=jax.lax.Precision.HIGHEST), 1e-12)
    mask = ref_excitation / masking_difference
    nmr_vec = noise_in_bands / mask
    nmr_mean = jnp.mean(nmr_vec, axis=-1)
    nmr_max = jnp.max(nmr_vec, axis=-1)
    disturbed = jnp.where(nmr_max > C.ONE_POINT_FIVE_DB_POWER_FACTOR, 1.0, 0.0)
    return nmr_mean, disturbed


def prob_detect(e_ref: jnp.ndarray, e_test: jnp.ndarray,
                use_floor: bool = False):
    """Binaural detection probability and steps per frame;
    src/movs.c:1223-1276.

    e_ref/e_test: [..., C, Z, F] excitation patterns (transposed MOV-tail
    layout).  Returns (p_bin, steps_bin), each [..., F].
    """
    eref_db = 10.0 * jnp.log10(e_ref)
    etest_db = 10.0 * jnp.log10(e_test)
    l = 0.3 * jnp.maximum(eref_db, etest_db) + 0.7 * etest_db
    cs = C.PD_S_COEFFS
    l_safe = jnp.where(l > 0.0, l, 1.0)
    s = jnp.where(
        l > 0.0,
        cs[0] * (cs[1] / l_safe) ** cs[2] + cs[3] * l_safe ** 4
        + cs[4] * l_safe ** 3 - cs[5] * l_safe * l_safe + cs[6] * l_safe
        - cs[7],
        1e30)
    e = eref_db - etest_db
    # (e/s)^b with b in {4, 6}: explicit even powers instead of a generic
    # pow — a data-dependent float exponent lowers to exp(b*log(x)), which
    # is both slower and ill-defined for the negative bases that occur
    # whenever the test is louder (the C reference's pow handles them via
    # the integral-exponent path, src/movs.c:1240)
    t = e / s
    t2 = t * t
    t4 = t2 * t2
    tb = jnp.where(eref_db > etest_db, t4, t4 * t2)
    pc = 1.0 - 0.5 ** tb
    int_e = jnp.floor(e) if use_floor else jnp.trunc(e)
    qc = jnp.abs(int_e) / s
    p_band = jnp.max(pc, axis=-3)     # max over channels -> [..., Z, F]
    q_band = jnp.max(qc, axis=-3)
    p_bin = 1.0 - jnp.prod(1.0 - p_band, axis=-2)
    steps_bin = jnp.sum(q_band, axis=-2)
    return p_bin, steps_bin


def ehs(ref_weighted: jnp.ndarray, test_weighted: jnp.ndarray,
        ref_thresh: jnp.ndarray, test_thresh: jnp.ndarray,
        settings: C.Settings, dtype, ehs_mats=None, delta_weighted=None,
        ehs_mask=None, ehs_dmat=None, precision=None, ehs_zero=None):
    """Error harmonic structure per frame; src/movs.c:1345-1443.

    ref/test_weighted: [CH, F, 1025]; ref/test_thresh: [CH, F] bool
    (channel-major like the whole FFT bin-domain path).  Returns
    (ehs_value [CH, F], valid [F]).  The value is garbage (zeros by
    construction of the NaN-proof max) on frames where valid is False; the
    accumulator mask must apply `valid`.

    `ehs_mats` = (fwd512, inv_re, inv_im, fwd256) DFT-GEMM matrices
    (FFTEarConsts.ehs_*): when given, the three per-frame transforms run as
    MXU matmuls instead of VPU FFTs (~2x faster stage on TPU, same math).

    `delta_weighted` (optional): accurately-cancelled wr - wt from
    fft_ear.stateless_pair_hop.  For bins where the distortion is small
    (|wr - wt| <= wr / 2) the log-spectral difference evaluates as
    d = log1p(-(wr - wt) / wr) — algebraically log(wt / wr), but exact
    zero for identical signals and accurate to the distortion scale
    (without it, f32 spectra make d pure rounding noise — ~2^-23, TPU's
    x/x is not exactly 1 — whose NORMALIZED autocorrelation is O(1):
    EHS has no amplitude scale, so eps noise produced O(0.1) EHS).  For
    bins the codec largely REMOVED (wt << wr) the delta form is the
    catastrophic one — wt reconstructs as wr - dl with absolute error
    eps * wr, i.e. O(1) error in d (corpus v2's MDCT items drove EHS 3x
    wrong) — so those bins use the direct log(wt / wr), whose own f32
    error is ~eps.  The two branches agree to ~eps at the 0.5 crossover.

    `ehs_zero`: per-bin dead mask over the 512 EHS bins (see
    FFTEarConsts.ehs_zero) — required whenever the inputs are plain
    power spectra rather than weighted ones.

    `precision`: MXU precision of the four DFT-GEMMs (default HIGHEST).
    EHS accuracy is set by the d log-difference, not its transforms (the
    autocorrelation is normalized scale-free), so the f32 tier passes its
    HIGH GEMM precision — measured accuracy-neutral on the drift corpus
    at ~2x the MXU rate.

    `ehs_dmat` given (with `ehs_mask`) = the CT-DFT permuted bin order
    (ops/ct_dft): inputs are full flat [..., 1024] grids; the 512 EHS
    bins are the head-grid lane slice, d's transforms use the
    row-permuted ehs_mats, the "first 256 bins" sub-sequence becomes the
    ehs_mask multiply, and the order-dependent sliding-window cumsum
    becomes the banded ehs_dmat matmul.  Lag-domain math is order-free.
    """
    n = C.MAXLAG
    hp = precision if precision is not None else jax.lax.Precision.HIGHEST
    ct = ehs_dmat is not None
    if ct:
        assert ehs_mats is not None, "CT bin order requires the DFT-GEMMs"
    valid = jnp.any(ref_thresh | test_thresh, axis=-2)  # over channels
    take = CTD.head_grid if ct else (lambda x: x[..., :2 * n])
    rw = take(ref_weighted)
    tw = take(test_weighted)
    if delta_weighted is not None:
        dl = take(delta_weighted)
        ratio = dl / rw
        tw_safe = jnp.where(tw > 0.0, tw, 1.0)
        d = jnp.where(jnp.abs(ratio) <= 0.5,
                      jnp.log1p(-ratio),
                      jnp.where(tw > 0.0, jnp.log(tw_safe / rw), -jnp.inf))
        d = jnp.where((rw == 0.0) & (tw == 0.0), 0.0, d)
    else:
        d = jnp.where((rw == 0.0) & (tw == 0.0), 0.0, jnp.log(tw / rw))
    if ehs_zero is not None:
        # pipelines feed plain POWER; bins whose om weight is 0 (the DC
        # bin) had identically-zero weighted spectra, which the mask above
        # used to zero — reproduce that (FFTEarConsts.ehs_zero)
        d = jnp.where(ehs_zero, 0.0, d)
    # c[i] = sum_{k<256} d[k] d[k+i], via frequency domain like the reference
    if ehs_mats is not None:
        fwd512, inv_re, inv_im, _ = ehs_mats
        bins = n + 1
        g1 = jnp.dot(d, fwd512, precision=hp)           # [.., 2*257]
        # f2 = rfft([d[:256], 0...]): only the first 256 bins contribute
        if ct:
            g2 = jnp.dot(jnp.where(ehs_mask, d, 0.0), fwd512, precision=hp)
        else:
            g2 = jnp.dot(d[..., :n], fwd512[:n], precision=hp)
        f1r, f1i = g1[..., :bins], g1[..., bins:]
        f2r, f2i = g2[..., :bins], g2[..., bins:]
        pr = f1r * f2r + f1i * f2i                      # re(f1 * conj(f2))
        pi = f1i * f2r - f1r * f2i                      # im(f1 * conj(f2))
        corr = (jnp.dot(pr, inv_re, precision=hp)
                + jnp.dot(pi, inv_im, precision=hp))    # irfft[..., :256]
    else:
        f1 = FE.rfft_flat(d)
        d_head = jnp.concatenate([d[..., :n], jnp.zeros_like(d[..., :n])],
                                 axis=-1)
        f2 = FE.rfft_flat(d_head)
        corr = FE.irfft_flat(f1 * jnp.conj(f2))[..., :n]
    d0 = corr[..., :1]
    dsq = d * d
    if ct:
        # sliding-window energy over the PERMUTED bin axis: the cumsum
        # below is order-dependent; the banded matmul is order-free
        dk = d0 + jnp.dot(dsq, ehs_dmat, precision=hp)
    else:
        dk = d0 + jnp.concatenate(
            [jnp.zeros_like(d0),
             jnp.cumsum(dsq[..., n:2 * n - 1] - dsq[..., :n - 1], axis=-1)],
            axis=-1)
    cnorm = corr / jnp.sqrt(d0 * dk)
    window = jnp.asarray(
        EP.ehs_correlation_window(settings.center_ehs_correlation_window),
        dtype=dtype)
    if settings.ehs_subtract_dc_before_window:
        cwin = (cnorm - jnp.mean(cnorm, axis=-1, keepdims=True)) * window
    else:
        cwin = cnorm * window
    if ehs_mats is not None:
        g = jnp.dot(cwin, ehs_mats[3], precision=hp)
        half = g.shape[-1] // 2
        power = g[..., :half] ** 2 + g[..., half:] ** 2
    else:
        cfft = FE.rfft_flat(cwin)
        power = jnp.real(cfft) ** 2 + jnp.imag(cfft) ** 2
    if not settings.ehs_subtract_dc_before_window:
        power = power.at[..., 0].set(0.0)
    # max over bins exceeding their predecessor; NaN-proof: NaN > x is False
    ascending = power[..., 1:] > power[..., :-1]
    ehs_val = jnp.max(jnp.where(ascending, power[..., 1:], 0.0), axis=-1)
    return 1000.0 * ehs_val, valid
