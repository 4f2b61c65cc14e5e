"""Pallas TPU kernels vs their XLA reference paths (interpret mode on CPU).

The float32 TPU tier swaps several XLA stages for fused Pallas kernels
(ops/pallas_fb, ops/pallas_dc).  On CPU the pipelines default to the XLA
paths, so without these tests the kernels would only ever run on the real
chip; here each kernel runs in interpret mode against the XLA stage it
replaces, at the f32-reordering tolerance (the kernels change summation
order, not math — see each kernel's module docstring).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gstpeaq_tpu import earparams as EP
from gstpeaq_tpu.ops import fb_ear as FB
from gstpeaq_tpu.ops import pallas_dc


def test_dc_chain_kernel_matches_xla():
    rng = np.random.default_rng(7)
    t = 49152
    n = 2
    x = (rng.standard_normal((n, t)) * 2500.0).astype(np.float32)
    lf = 0.0357
    want = np.asarray(FB.dc_reject(jnp.asarray(x, jnp.float32) * lf))
    got = np.asarray(pallas_dc.dc_chain_blocked(
        jnp.asarray(x).reshape(n, t // 128, 128), lf, interpret=True))
    got = got.reshape(n, t)
    scale = np.abs(want).max()
    # both paths carry ~6e-4 * max|hp2| of intrinsic f32 error vs the f64
    # chain (near-unit poles); their mutual difference is the same order
    assert np.abs(got - want).max() / scale < 2e-3
    # DC rejection actually happened: output mean far below input mean
    assert abs(got.mean()) < 1e-3 * scale


def test_dc_chain_kernel_streaming_state():
    """Chunked dc_chain_blocked with the carried state tuple matches the
    whole-signal kernel (different block count m => f32-reordering-level
    agreement), and the state interoperates with the XLA chain's."""
    rng = np.random.default_rng(13)
    tc = 49152
    n = 2
    x = (rng.standard_normal((n, 2 * tc)) * 2500.0).astype(np.float32)
    lf = 0.0357
    x3 = jnp.asarray(x).reshape(n, -1, 128)
    whole = np.asarray(pallas_dc.dc_chain_blocked(
        x3, lf, interpret=True)).reshape(n, -1)
    h1, st = pallas_dc.dc_chain_blocked(
        x3[:, :tc // 128], lf, return_state=True, interpret=True)
    h2 = pallas_dc.dc_chain_blocked(
        x3[:, tc // 128:], lf, state=st, interpret=True)
    got = np.concatenate([np.asarray(h1).reshape(n, -1),
                          np.asarray(h2).reshape(n, -1)], axis=1)
    scale = np.abs(whole).max()
    assert np.abs(got - whole).max() / scale < 2e-3
    # interop: XLA chunk-1 state resumes the kernel (and vice versa)
    xs = jnp.asarray(x, jnp.float32) * lf
    _, st_xla = FB.dc_reject(xs[:, :tc], None, True)
    want2 = np.asarray(FB.dc_reject(xs[:, tc:], st_xla, False))
    h2x = np.asarray(pallas_dc.dc_chain_blocked(
        x3[:, tc // 128:], lf, state=st_xla, interpret=True)).reshape(n, -1)
    assert np.abs(h2x - want2).max() / scale < 2e-3


def test_process_signal_pallas_dc_streaming(monkeypatch):
    """process_signal rides the Pallas DC kernel for streaming chunks
    (state carried through the [n, 2]-flattened tuple) and agrees with
    the XLA chain across the chunk boundary."""
    p = EP.fb_ear_params()
    k = FB.build_consts(p, dtype=jnp.float32)
    n_frames = 256                      # t = 49152 per chunk
    t = 192 * n_frames
    rng = np.random.default_rng(17)
    x = (rng.standard_normal((2, 2 * t)) * 0.2).astype(np.float32)
    xj = jnp.asarray(x, jnp.float32)

    monkeypatch.setattr(FB, "USE_PALLAS_DC", False)
    e1r, u1r, st_r = FB.process_signal(k, xj[:, :t], n_frames,
                                       return_state=True)
    e2r, u2r = FB.process_signal(k, xj[:, t:], n_frames, state=st_r)

    monkeypatch.setattr(FB, "USE_PALLAS_DC", True)
    e1g, u1g, st_g = FB.process_signal(k, xj[:, :t], n_frames,
                                       return_state=True)
    e2g, u2g = FB.process_signal(k, xj[:, t:], n_frames, state=st_g)
    for ref, got in ((e1r, e1g), (u1r, u1g), (e2r, e2g), (u2r, u2g)):
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-3


def test_process_signal_fused_spread_path(monkeypatch):
    """The fused Pallas spread path (slope-prefix kernel + conv
    de-interleave + shift-multiply spreading, forced + interpret on CPU)
    agrees with the XLA spread_t / back_and_forward_masking_t chain.  The
    kernels change only summation order (shift chain vs exp form), so
    agreement is at f32-reordering level."""
    p = EP.fb_ear_params()
    k = FB.build_consts(p, dtype=jnp.float32)
    n_frames = 256                      # n_inst = 1536 -> kernel-aligned
    t = 192 * n_frames
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, t)) * 0.2).astype(np.float32)
    x[1] *= 0.5
    xj = jnp.asarray(x, jnp.float32)

    monkeypatch.setattr(FB, "USE_PALLAS_DC", False)
    monkeypatch.setattr(FB, "USE_PALLAS_SPREAD", False)
    exc_ref, uns_ref = FB.process_signal(k, xj, n_frames)

    monkeypatch.setattr(FB, "USE_PALLAS_SPREAD", True)
    exc_got, uns_got = FB.process_signal(k, xj, n_frames)
    exc_st, uns_st, _ = FB.process_signal(k, xj, n_frames,
                                          return_state=True)

    for ref, got in ((exc_ref, exc_got), (uns_ref, uns_got),
                     (exc_ref, exc_st), (uns_ref, uns_st)):
        ref = np.asarray(ref)
        got = np.asarray(got)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_process_signal_pallas_dc_path(monkeypatch):
    """process_signal takes the Pallas DC fast path (forced, interpret on
    CPU) and agrees with the default XLA chain end to end."""
    p = EP.fb_ear_params()
    k = FB.build_consts(p, dtype=jnp.float32)
    n_frames = 256                      # t = 49152 -> kernel-aligned
    t = 192 * n_frames
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((t,)) * 0.2).astype(np.float32)
    xj = jnp.asarray(x, jnp.float32)

    monkeypatch.setattr(FB, "USE_PALLAS_DC", False)
    exc_ref, uns_ref = FB.process_signal(k, xj, n_frames)

    monkeypatch.setattr(FB, "USE_PALLAS_DC", True)
    exc_got, uns_got = FB.process_signal(k, xj, n_frames)

    ref = np.asarray(exc_ref)
    got = np.asarray(exc_got)
    assert np.abs(got - ref).max() / (np.abs(ref).max()) < 2e-3
    ref_u = np.asarray(uns_ref)
    got_u = np.asarray(uns_got)
    assert np.abs(got_u - ref_u).max() / (np.abs(ref_u).max()) < 2e-3


def test_spread_apply_matches_xla_spread_t(monkeypatch):
    """The [Z, I]-layout spread kernel (pallas_fb.spread_apply — the
    non-TILE_CONV-aligned TPU path, e.g. odd streaming chunks) agrees
    with the XLA exp-form spread_t, including a ragged final tile
    (I % TILE_I != 0) and a carried cu state."""
    p = EP.fb_ear_params()
    k = FB.build_consts(p, dtype=jnp.float32)
    rng = np.random.default_rng(23)
    n_i = 700                      # ragged: 700 = 512 + 188
    fb_re = jnp.asarray(rng.standard_normal((2, 40, n_i)) * 0.1, jnp.float32)
    fb_im = jnp.asarray(rng.standard_normal((2, 40, n_i)) * 0.1, jnp.float32)
    cu0 = jnp.asarray(rng.uniform(0.2, 0.9, (2, 40)), jnp.float32)

    monkeypatch.setattr(FB, "USE_PALLAS_SPREAD", False)
    ref, cu_ref = FB.spread_t(k, fb_re, fb_im, cu0, True)
    monkeypatch.setattr(FB, "USE_PALLAS_SPREAD", True)
    got, cu_got = FB.spread_t(k, fb_re, fb_im, cu0, True)
    for a, b in ((ref, got), (cu_ref, cu_got)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5


def test_pallas_iir_matches_toeplitz(monkeypatch):
    """The lane-shift doubling recurrence kernel (ops/pallas_iir, forced +
    interpret on CPU) agrees with the blocked-Toeplitz reference at
    f32-reordering level, including via the iir dispatcher."""
    from gstpeaq_tpu.ops import iir, pallas_iir
    rng = np.random.default_rng(11)
    for m, z, f in [(6, 40, 2560), (4, 55, 512), (2, 40, 60)]:
        a = jnp.asarray(np.exp(-rng.uniform(0.01, 3.0, z)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((m, z, f)), jnp.float32)
        ref = np.asarray(iir.linear_recurrence_banded(a, b, axis=-1))
        got = np.asarray(pallas_iir.recurrence_banded(a, b, interpret=True))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
        monkeypatch.setattr(iir, "USE_PALLAS", True)
        via = np.asarray(iir.linear_recurrence_banded(a, b, axis=-1))
        monkeypatch.setattr(iir, "USE_PALLAS", None)
        assert np.abs(via - ref).max() / np.abs(ref).max() < 1e-5


def test_pipelines_with_pallas_iir(monkeypatch):
    """Both pipelines stay within f32-reordering tolerance of their
    Toeplitz-recurrence form when the Pallas recurrence kernel is forced
    (interpret on CPU)."""
    from gstpeaq_tpu import api
    from gstpeaq_tpu.ops import iir
    from gstpeaq_tpu.utils import testsignals as TS
    n = 40 * 1024
    ref, test = TS.saw(n), TS.triangle(n)
    base = [api.peaq(ref, test, advanced=a, dtype="float32").odg
            for a in (False, True)]
    monkeypatch.setattr(iir, "USE_PALLAS", True)
    api._jitted_basic.cache_clear()
    api._jitted_advanced.cache_clear()
    got = [api.peaq(ref, test, advanced=a, dtype="float32").odg
           for a in (False, True)]
    api._jitted_basic.cache_clear()
    api._jitted_advanced.cache_clear()
    for b, g in zip(base, got):
        assert abs(float(b) - float(g)) < 2e-3, (b, g)


def test_fused_mod_smoothers_matches_xla(monkeypatch):
    """fused_mod_smoothers (drive construction in-kernel) agrees with the
    stack+Toeplitz XLA form at f32-reordering level."""
    from gstpeaq_tpu.models import level_adapt as LA
    from gstpeaq_tpu.ops import iir
    rng = np.random.default_rng(5)
    z, f = 40, 960
    a = jnp.asarray(np.exp(-192.0 / (48000 * np.linspace(0.03, 0.05, z))),
                    jnp.float32)
    exc2 = jnp.asarray(rng.uniform(0.01, 10.0, (2, 3, 2, z, f)), jnp.float32)
    uns2 = jnp.asarray(rng.uniform(0.01, 10.0, (2, 3, 2, z, f)), jnp.float32)
    avg = jnp.asarray(LA.sliding_average_matrix(z), jnp.float32)
    monkeypatch.setattr(iir, "USE_PALLAS", False)
    base = LA.level_adapt_fused_mod(a, avg, exc2, uns2, 192)
    monkeypatch.setattr(iir, "USE_PALLAS", True)
    got = LA.level_adapt_fused_mod(a, avg, exc2, uns2, 192)
    for x, y in zip(base, got):
        x, y = np.asarray(x), np.asarray(y)
        assert np.abs(x - y).max() / np.abs(x).max() < 1e-5


def test_fft_spread_kernel_matches_xla():
    """The FFT-ear shift-multiply spread kernel (ops/pallas_spread_fft,
    interpret on CPU) matches the exp-form XLA spread at f32-reordering
    level, for both band counts."""
    from gstpeaq_tpu.ops import fft_ear as FE
    from gstpeaq_tpu.ops import pallas_spread_fft as PSF
    rng = np.random.default_rng(4)
    for bc in (109, 55):
        k = FE.build_consts(EP.fft_ear_params(bc), dtype=jnp.float32)
        pp = jnp.asarray(rng.uniform(1e-6, 1e4, (2, 2, 37, bc)), jnp.float32)
        base = np.asarray(FE.spread(k, pp))
        got = np.asarray(PSF.spread_fft(
            pp, k.a_uc_log, k.g_il, k.lower_matrix, k.spread_norm,
            0.2 * float(np.asarray(k.delta_z)), interpret=True))
        assert np.abs(base - got).max() / np.abs(base).max() < 1e-5
        rel = np.abs(base - got) / np.maximum(np.abs(base), 1e-30)
        assert rel.max() < 1e-4
