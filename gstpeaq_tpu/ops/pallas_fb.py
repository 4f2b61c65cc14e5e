"""Pallas TPU kernel for the FB ear model's frequency spreading.

Replaces the XLA exp-form upper spreading (ops/fb_ear.spread_t's block
loop + lower einsum + |A|^2) with one VMEM-resident kernel on the
transposed [Z, I] layout (bands on sublanes, instants on lanes):

* the level-dependent upper spreading U[b, j] = cu[b]^(j-b) (j > b) is
  evaluated by 39 SHIFT-MULTIPLY steps — w_{e+1} = roll(w_e) * roll(cu, e+1)
  with row 0 masked — instead of Z^2 transcendentals per instant
  (exp(expo * log cu) costs ~10-15 VPU ops per cell; the shift chain ~6),
* the constant lower spreading runs as an in-kernel [Z, Z] x [Z, TI] MXU
  dot, and E0 = |A|^2 fuses into the same tile,
* fb_re / fb_im / cu are each read from HBM exactly once and only E0 is
  written — the XLA form re-materializes several [.., Z, I] intermediates.

All cross-element interaction is along the band (sublane) axis, so
out-of-range instant lanes of a ragged final tile stay self-contained and
are dropped by the output clipping.

A round-2 Pallas spread on the INTERLEAVED [I, 40] layout lost to XLA
(40 bands padded to 128 lanes tripled the VPU work); this kernel exists
because the transposed layout removed that padding.

Reference: src/fbearmodel.c:326-360 (spreading + rectification).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as _C

Z = 40           # FB band count (BS.1387 Table 8)
_DIST = _C.DIST
TILE_I = 512     # instants per grid step (lanes), spread_apply
# spread_from_conv tile: must divide every production instant count AND
# keep rows = TILE_CONV / 4 a multiple of 128 (Mosaic requires the last
# block dim 128-divisible).  Host-side FB buckets are multiples of 256
# frames (n_inst % 1536 == 0); a clamped ragged last tile would SHIFT the
# conv-row window and misalign the de-interleave, so the wrapper falls
# back to the XLA path when n_inst % TILE_CONV != 0.
TILE_CONV = 1536


def _shift_multiply_e0(fbr, fbi, cu, low):
    """Upper spreading by 39 shift-multiply steps + in-kernel lower-matrix
    MXU dot + |A|^2.  All inputs [Z, TI] (VMEM values), low [Z, Z].

    Row-shrink: after step e the weight stream's rows < e are structurally
    zero (w_e[j] = fb[j-e] cu[j-e]^e) and acc rows < 8k stop changing once
    e >= 8k, so every 8 steps the top sublane block retires and the whole
    chain shrinks [40,T]->[32,T]->...->[8,T] — 119 vreg-steps instead of
    195 for the same (bit-identical) arithmetic: the dropped ops were all
    x+0 / 0*y.  The circular roll's wrap row stays masked via the rcu
    row-0 zero, whose propagation is unaffected by dropping zero rows."""
    acc_r = fbr
    acc_i = fbi
    w_r = fbr
    w_i = fbi
    rcu = cu
    done_r = []
    done_i = []
    for e in range(1, Z):
        if e > 1 and e % 8 == 1:
            done_r.append(acc_r[:8])
            done_i.append(acc_i[:8])
            acc_r, acc_i = acc_r[8:], acc_i[8:]
            w_r, w_i, rcu = w_r[8:], w_i[8:], rcu[8:]
        row = jax.lax.broadcasted_iota(jnp.int32, (w_r.shape[0], 1), 0)
        # mask the wrap row ONCE on the rolled coefficient (zeroing rcu's
        # row 0 zeroes both weight streams) instead of once per stream —
        # one VPU op per step instead of two across the 39-step chain
        rcu = jnp.where(row >= 1, pltpu.roll(rcu, 1, axis=0), 0.0)
        w_r = pltpu.roll(w_r, 1, axis=0) * rcu
        w_i = pltpu.roll(w_i, 1, axis=0) * rcu
        acc_r = acc_r + w_r
        acc_i = acc_i + w_i
    acc_r = jnp.concatenate(done_r + [acc_r], axis=0)
    acc_i = jnp.concatenate(done_i + [acc_i], axis=0)
    # explicit HIGHEST: preferred_element_type sets only the OUTPUT dtype;
    # without precision= the MXU dot runs bfloat16 (2^-8), and the
    # modulation-derivative amplifier turned that into an 18% RmsModDiffA
    # error (ODG drift 1.9e-2) — the repo's #1 precision rule applies
    # inside kernels too
    er = jax.lax.dot_general(low, acc_r, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    ei = jax.lax.dot_general(low, acc_i, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    return er * er + ei * ei


def _spread_kernel(fbr_ref, fbi_ref, cu_ref, low_ref, out_ref):
    out_ref[0] = _shift_multiply_e0(fbr_ref[0], fbi_ref[0], cu_ref[0],
                                    low_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def spread_apply(fb_re: jnp.ndarray, fb_im: jnp.ndarray, cu: jnp.ndarray,
                 lower_matrix: jnp.ndarray, interpret: bool = False):
    """E0 = |lower(fb + upper(fb, cu))|^2 on the [.., Z, I] layout.

    fb_re/fb_im/cu: [..., Z, I] float32; lower_matrix: [Z, Z].
    Returns E0 [..., Z, I] float32.
    """
    shape = fb_re.shape
    assert shape[-2] == Z, shape
    i_tot = shape[-1]
    fbr = fb_re.reshape(-1, Z, i_tot)
    fbi = fb_im.reshape(-1, Z, i_tot)
    cuf = cu.reshape(-1, Z, i_tot)
    n = fbr.shape[0]
    grid = (n, pl.cdiv(i_tot, TILE_I))
    blk = pl.BlockSpec((1, Z, TILE_I), lambda b, i: (b, 0, i),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _spread_kernel,
        out_shape=jax.ShapeDtypeStruct((n, Z, i_tot), jnp.float32),
        grid=grid,
        in_specs=[blk, blk, blk,
                  pl.BlockSpec((Z, Z), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(6 * Z + 4) * Z * i_tot * n,
            bytes_accessed=4 * 4 * Z * i_tot * n,
            transcendentals=0),
    )(fbr, fbi, cuf, lower_matrix)
    return out.reshape(shape)


def _make_conv_kernel(group_sizes, pmajor: bool = False):
    """Kernel over PHASE-MAJOR lane tiles: lane p * rows + t is instant
    4 * (tile_t0 + t) + p.  The interleave to true time order would be a
    lane-regroup reshape Mosaic cannot lower ("unsupported shape cast"),
    so cu arrives phase-split from XLA (one cheap minor transpose of ONE
    array) and E0 leaves phase-split the same way; only 2-d transposes,
    static lane slices, and lane concats run in-kernel.

    pmajor: write E0 with the phase axis OUTERMOST ([4, n, Z, nb, rows])
    so each phase slice is a contiguous array downstream — the layout the
    back-masking frame-sum GEMMs consume with zero-copy operands (see
    fb_ear._back_mask_from_pmajor)."""
    def kernel(o1_ref, o2_ref, o3_ref, cu0_ref, cu1_ref, cu2_ref, cu3_ref,
               low_ref, out_ref):
        rows = TILE_CONV // 4
        fbr, fbi = _deinterleave((o1_ref, o2_ref, o3_ref), group_sizes)
        cu = jnp.concatenate(
            [r[0] for r in (cu0_ref, cu1_ref, cu2_ref, cu3_ref)], axis=1)
        e0 = _shift_multiply_e0(fbr, fbi, cu, low_ref[:])
        for p in range(4):
            if pmajor:
                out_ref[p, 0, 0, :, :] = e0[:, p * rows:(p + 1) * rows]
            else:
                out_ref[0, :, p, :] = e0[:, p * rows:(p + 1) * rows]
    return kernel


def _deinterleave(refs, group_sizes):
    """Conv-output refs -> (fbr, fbi) [Z, 4 * rows] phase-major tiles."""
    parts_re = []
    parts_im = []
    for ref, g in zip(refs, group_sizes):
        g2 = 2 * g
        x = ref[0]                                 # [rows, 4 * g2]
        flat = jnp.concatenate(
            [x[:, p * g2:(p + 1) * g2].T for p in range(4)],
            axis=1)                                # [g2, 4 * rows]
        parts_re.append(flat[:g])
        parts_im.append(flat[g:])
    return (jnp.concatenate(parts_re, axis=0),
            jnp.concatenate(parts_im, axis=0))


def _make_slope_kernel(group_sizes, log_dist, a):
    """Conv outputs -> Horner intra-phase slope prefixes c_0..c_3.

    Fuses level = 10 log10(|fb|^2), s = max(4, c1_band - 0.2 level),
    dist = DIST^s and the phase Horner chain c_p = a c_{p-1} + (1-a) dist_p
    into one pass over the conv outputs — the XLA form materialized dist in
    the conv layout, lane-concatenated the three groups, and transposed to
    the band-major layout (~2 ms/iter of formatting)."""
    def kernel(o1_ref, o2_ref, o3_ref, c1b_ref, c0_ref, c1_ref, c2_ref,
               c3_ref):
        rows = TILE_CONV // 4
        fbr, fbi = _deinterleave((o1_ref, o2_ref, o3_ref), group_sizes)
        # float(): a bare np.float64 scalar is STRONG-typed and silently
        # promotes the whole chain to f64 under x64 (CPU interpret tests)
        level = float(10.0 / np.log(10.0)) * jnp.log(fbr * fbr + fbi * fbi)
        s = jnp.maximum(4.0, c1b_ref[:, :1] - 0.2 * level)
        dist = jnp.exp(log_dist * s)               # [Z, 4 * rows]
        b = (1.0 - a) * dist
        c0 = b[:, :rows]
        c1 = a * c0 + b[:, rows:2 * rows]
        c2 = a * c1 + b[:, 2 * rows:3 * rows]
        c3 = a * c2 + b[:, 3 * rows:]
        c0_ref[0] = c0
        c1_ref[0] = c1
        c2_ref[0] = c2
        c3_ref[0] = c3
    return kernel


@functools.partial(jax.jit, static_argnames=("n_inst", "slope_a",
                                             "interpret"))
def slope_prefixes_from_conv(o1, o2, o3, c1_band, slope_a, n_inst: int,
                             interpret: bool = False):
    """Horner intra-phase prefixes (c_0..c_3), each [..., Z, ti], from the
    raw group-conv outputs (see _make_slope_kernel).  c1_band = 24 + 230/fc
    [Z]; slope_a = the smoother coefficient."""
    assert n_inst % TILE_CONV == 0, n_inst
    lead = o1.shape[:-2]
    ti = n_inst // 4
    n = int(np.prod(lead)) if lead else 1
    group_sizes = (o1.shape[-1] // 8, o2.shape[-1] // 8, o3.shape[-1] // 8)
    os_ = [o.reshape(n, o.shape[-2], o.shape[-1]) for o in (o1, o2, o3)]
    rows = TILE_CONV // 4
    grid = (n, n_inst // TILE_CONV)
    o_specs = [
        pl.BlockSpec((1, rows, 8 * g), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
        for g in group_sizes]
    cu_spec = pl.BlockSpec((1, Z, rows), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    c1b = jnp.broadcast_to(c1_band[:, None], (Z, 128)).astype(jnp.float32)
    outs = pl.pallas_call(
        _make_slope_kernel(group_sizes, float(np.log(_DIST)),
                           float(slope_a)),
        out_shape=tuple(jax.ShapeDtypeStruct((n, Z, ti), jnp.float32)
                        for _ in range(4)),
        grid=grid,
        in_specs=o_specs + [pl.BlockSpec((Z, 128), lambda b, i: (0, 0),
                                         memory_space=pltpu.VMEM)],
        out_specs=(cu_spec,) * 4,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * Z * n_inst * n,
            bytes_accessed=8 * Z * n_inst * n,
            transcendentals=2 * Z * n_inst * n),
    )(*os_, c1b)
    return tuple(o.reshape(*lead, Z, ti) for o in outs)


# NOTE (measured, round 3): a masksum kernel variant that contracted E0
# into the back-masking frame sums in-kernel (dense [Z, 1536] x [1536, 512]
# scatter dot against the static tap weights, HIGHEST — Mosaic rejects
# HIGH) was tried and REVERTED: with M = Z = 40 the MXU runs at ~31% row
# utilization, so the dot cost ~4 ms/iter against the ~2.5 ms of XLA
# unsplit + frame-reduce passes it replaced (advanced 4687 -> 4469 a-s/s).
# See git history for the implementation.


@functools.partial(jax.jit, static_argnames=("n_inst", "pmajor",
                                              "interpret"))
def spread_from_conv(o1, o2, o3, cu_phases, lower_matrix, n_inst: int,
                     pmajor: bool = False, interpret: bool = False):
    """E0 from the three RAW group-conv outputs — the de-interleave to the
    [Z, I] band-major layout happens on VMEM tiles inside the kernel, so
    the XLA transpose passes (the former regroup, ~6 ms/iter) never touch
    HBM.  Conv output row t holds instants 4t..4t+3 on channels
    p * 2|G| + [re bands | im bands].

    o1/o2/o3: [..., t_out_g, 8 * |G|] with |G| = (16, 16, 8);
    cu_phases: 4-tuple of [..., Z, ti] phase-split slope states
    (cu_phases[p][.., t] = cu at instant 4t + p — born phase-split from
    the quarter-rate recurrence, no transpose pass);
    Returns E0 PHASE-SPLIT: [..., Z, 4, ti] by default, or with
    pmajor=True [4, n, nb, Z, rows] (nb = ti / rows grid blocks, n = the
    flattened lead) — identical VMEM writes, phase-contiguous in HBM for
    the back-masking frame-sum GEMMs (fb_ear._back_mask_from_pmajor).
    The nb dim sits OUTSIDE Z so the block's last two dims are (Z, rows)
    — Mosaic requires them divisible by (8, 128) or equal to the array
    dims, which a (.., nb-block 1, 384) tail violates.
    Requires n_inst % TILE_CONV == 0 (see TILE_CONV).
    """
    assert n_inst % TILE_CONV == 0, n_inst
    cu0 = cu_phases[0]
    lead = cu0.shape[:-2]
    ti = n_inst // 4
    n = int(np.prod(lead)) if lead else 1
    cus = [c.reshape(n, Z, ti) for c in cu_phases]
    group_sizes = (o1.shape[-1] // 8, o2.shape[-1] // 8, o3.shape[-1] // 8)
    os_ = [o.reshape(n, o.shape[-2], o.shape[-1]) for o in (o1, o2, o3)]
    rows = TILE_CONV // 4
    nb = ti // rows
    grid = (n, n_inst // TILE_CONV)
    # index maps are in BLOCK units: block i covers rows [i*rows, (i+1)*rows)
    o_specs = [
        pl.BlockSpec((1, rows, 8 * g), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
        for g in group_sizes]
    cu_spec = pl.BlockSpec((1, Z, rows), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    if pmajor:
        out_shape = jax.ShapeDtypeStruct((4, n, nb, Z, rows), jnp.float32)
        out_spec = pl.BlockSpec((4, 1, 1, Z, rows),
                                lambda b, i: (0, b, i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n, Z, 4, ti), jnp.float32)
        out_spec = pl.BlockSpec((1, Z, 4, rows), lambda b, i: (b, 0, 0, i),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_conv_kernel(group_sizes, pmajor),
        out_shape=out_shape,
        grid=grid,
        in_specs=o_specs + [cu_spec] * 4
        + [pl.BlockSpec((Z, Z), lambda b, i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(6 * Z + 8) * Z * n_inst * n,
            bytes_accessed=4 * 4 * Z * n_inst * n,
            transcendentals=0),
    )(*os_, *cus, lower_matrix)
    if pmajor:
        return out
    return out.reshape(*lead, Z, 4, ti)
