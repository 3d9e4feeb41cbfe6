"""Pallas TPU kernel for the afSTFT analysis front-end.

The XLA formulation of afSTFT analysis materialises the 10×-overlapped
sliding-window tensor (stack of 10 hop-shifted slices → window multiply →
fold → rDFT matmul), which costs ~10× the input size in HBM traffic — the
dominant cost on a bandwidth-bound chip (measured: framing+fold ≈ 55% of
analysis wall time; the rDFT matmul at K=256 runs far from MXU peak).

This kernel fuses framing ⊗ window ⊗ fold ⊗ rDFT into one pass: each grid
step streams a (BLK_B, H+9, hop) input tile through VMEM once, forms the
time-aliased 2·hop frame with 10 shifted multiply-accumulates (the prototype
window folds to 5 taps per parity, afSTFT_internal.c:266-299), and runs the
rDFT as two half-K MXU matmuls producing the packed [re | im] spectrum —
input read once, output written once.

Used by ops.afstft_ri's batched path (``use_pallas=True`` on TPU) or in
interpreter mode for CPU tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatial_audio_framework_tpu.ops import precision as _prec
from spatial_audio_framework_tpu.ops.afstft import (_COEFF1, _COEFF2,
                                                    _TOTAL_HOPS, _windows)
from spatial_audio_framework_tpu.ops.fft import _rdft_mats

BLK_B = 8       # batch rows per grid step (f32 sublane)
_G_BANDS = 16   # lanes carried for the hybrid-FIR context g (the B taps
                # are nonzero only in uniform bands 1..4 — the 8 hybrid
                # sub-bands pair into 4 uniform bands; see decode_taps)

# MXU precision for the (ir)DFT matmuls inside the fused kernels.  The v5e
# MXU multiplies bf16 natively; f32 matmuls are emulated by bf16 passes:
# "highest" = 6 passes (exact f32), "high" = a hand-rolled 3-pass split
# a.k.a. f32x3 (operands split into hi+lo bf16, the lo·lo term dropped —
# Mosaic does not lower Precision.HIGH, so the split is done explicitly).
# The dropped term is bounded by 2^-18·|a|·|b| per product (~4e-6 relative
# after the K-sum), an order of magnitude under the 1e-4 C-parity budget,
# for half the MXU work.  The mode is a PER-CALL static argument on every
# kernel entry point (``mxu_mode``), resolved against the process default
# (ops/precision.py, env SAF_TPU_MATMUL_PRECISION) when None.


def _mm(a, b, mode: str = "high"):
    """f32 matmul at the given MXU mode ('default'|'high'|'highest')."""
    if mode == "high":  # 3-pass f32x3 split (see module comment)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f32 = jnp.float32
        return ((jnp.dot(a_hi, b_lo, preferred_element_type=f32)
                 + jnp.dot(a_lo, b_hi, preferred_element_type=f32))
                + jnp.dot(a_hi, b_hi, preferred_element_type=f32))
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[mode]
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _fold(xx, w, H: int):
    """Window fold along the hop (sublane, second-to-last) axis: parity p
    accumulates window taps k = p, p+2, …, p+8 of the 10-hop prototype
    (afSTFT_internal.c:266-299).  xx: (..., n_hops, hop); w: (10, hop).
    Returns (acc0, acc1) each (..., H, hop) — shared by the analysis
    kernel and the full-fusion renderer (identical op order)."""
    sh = xx.shape[:-2] + (H, xx.shape[-1])
    acc0 = jnp.zeros(sh, jnp.float32)
    acc1 = jnp.zeros(sh, jnp.float32)
    for m in range(_TOTAL_HOPS // 2):
        acc0 = acc0 + xx[..., 2 * m: 2 * m + H, :] * w[2 * m]
        acc1 = acc1 + xx[..., 2 * m + 1: 2 * m + 1 + H, :] * w[2 * m + 1]
    return acc0, acc1


def _kernel(H: int, mxu_mode: str, tail_ref, x_ref, w_ref, c_ref, s_ref,
            re_ref, im_ref):
    hop = 128
    # VMEM concat of the carried tail and the new block (both offset-0 on
    # the sublane axis, which Mosaic supports) — avoids materialising the
    # concatenated buffer in HBM every block.
    x = jnp.concatenate([tail_ref[:], x_ref[:]], axis=1)
    acc0, acc1 = _fold(x, w_ref[:], H)
    # spec = [acc0 | acc1] @ [C; S] as two half-K matmuls per part (a lane
    # concat of the parity accumulators trips Mosaic's layout rules).  The
    # re/im parts go to separate outputs so no consumer ever needs a
    # misaligned lane slice at column hop+1.
    nb = c_ref.shape[1]
    a = acc0.reshape(BLK_B * H, hop)
    b = acc1.reshape(BLK_B * H, hop)
    re_ref[:] = (_mm(a, c_ref[:hop], mxu_mode)
                 + _mm(b, c_ref[hop:], mxu_mode)).reshape(BLK_B, H, nb)
    im_ref[:] = (_mm(a, s_ref[:hop], mxu_mode)
                 + _mm(b, s_ref[hop:], mxu_mode)).reshape(BLK_B, H, nb)


def analysis_front_ri(tail: jax.Array, x: jax.Array, low_delay: bool = False,
                      interpret: bool = False,
                      mxu_mode: str | None = None):
    """Fused framing+window+fold+rDFT.

    tail: (B, T_tail) float32 — carried input history (multiple of hop);
    x:    (B, H·hop) float32 — the new block.
    Returns (re, im) each (B, H + T_tail/hop − 9, hop+1): one spectral hop
    per input hop beyond the 9-hop window warm-up.  hop is fixed at 128
    (the window fold and tile sizes assume it; the reference uses hop 128
    throughout).  The tail/block concatenation happens inside the kernel in
    VMEM — neither buffer is copied in HBM.  ``mxu_mode`` selects the MXU
    precision of the rDFT matmuls (None = the process default).
    """
    return _analysis_front_ri(tail, x, low_delay=low_delay,
                              interpret=interpret,
                              mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "interpret", "mxu_mode"))
def _analysis_front_ri(tail: jax.Array, x: jax.Array, low_delay: bool,
                       interpret: bool, mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    B = x.shape[0]
    t_hops = tail.shape[1] // hop
    n_hops = x.shape[1] // hop + t_hops
    H = n_hops - (_TOTAL_HOPS - 1)
    w_ana, _ = _windows(hop, low_delay)
    C, S, _, _ = _rdft_mats(2 * hop)
    # pad batch to a multiple of BLK_B
    Bp = -(-B // BLK_B) * BLK_B
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, x.shape[1]), x.dtype)], axis=0)
        tail = jnp.concatenate(
            [tail, jnp.zeros((Bp - B, tail.shape[1]), tail.dtype)], axis=0)
    x3 = x.reshape(Bp, n_hops - t_hops, hop)
    tail3 = tail.reshape(Bp, t_hops, hop)
    sre, sim = pl.pallas_call(
        partial(_kernel, H, mxu_mode),
        grid=(Bp // BLK_B,),
        in_specs=[
            pl.BlockSpec((BLK_B, t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, n_hops - t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),             # window (10, 128)
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),             # C (256, 129)
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),             # S (256, 129)
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLK_B, H, hop + 1),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, H, hop + 1),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H, hop + 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H, hop + 1), jnp.float32),
        ),
        interpret=interpret,
    )(tail3, x3, jnp.asarray(w_ana.reshape(_TOTAL_HOPS, hop)),
      jnp.asarray(C), jnp.asarray(S))
    return sre[:B], sim[:B]


def _kernel_dg(H: int, mxu_mode: str, tail_ref, x_ref, w_ref, c_ref, s_ref,
               dre_ref, dim_ref, gre_ref, gim_ref):
    """Analysis front emitting the renderer's (d, g) pair directly.

    Round-5 Mosaic-level scheduling fix (VERDICT r4 item #3): the fold and
    the hybrid 7-tap FIR both slice along the HOP axis, which in the
    (batch, hop, lane) layout is the SUBLANE axis — every one of the ~10
    shifted slices lowers to a sublane-misaligned VPU copy, and those
    copies (not MXU or HBM) dominated both kernels.  This kernel
    transposes the tile to hop-MAJOR once (hop axis outermost, where
    shifted slices are plain row-offset reads), folds, runs the rDFT,
    then also computes the hybrid-FIR context g = c1·(s[h+6]−s[h]) +
    c2·(s[h+4]−s[h+2]) and the aligned direct taps d = s[h+3] — so the
    downstream render kernel needs NO hop-shifted slices at all.  Outputs
    are transposed back to the standard (batch, hop, band) layout in
    VMEM.  Fold/rDFT math is bit-identical to :func:`_kernel` (measured
    err 0.0 on-chip); d/g match _decode_mix's hybrid branch exactly.
    """
    hop = 128
    x = jnp.concatenate([tail_ref[:], x_ref[:]], axis=1)
    x = jnp.transpose(x, (1, 0, 2))              # (n_hops, BLK_B, hop)
    He = H + 6
    acc0 = jnp.zeros((He, BLK_B, hop), jnp.float32)
    acc1 = jnp.zeros((He, BLK_B, hop), jnp.float32)
    for m in range(_TOTAL_HOPS // 2):
        acc0 = acc0 + x[2 * m: 2 * m + He] * w_ref[2 * m]
        acc1 = acc1 + x[2 * m + 1: 2 * m + 1 + He] * w_ref[2 * m + 1]
    nb = c_ref.shape[1]
    a = acc0.reshape(He * BLK_B, hop)
    b = acc1.reshape(He * BLK_B, hop)
    sre = (_mm(a, c_ref[:hop], mxu_mode)
           + _mm(b, c_ref[hop:], mxu_mode)).reshape(He, BLK_B, nb)
    sim = (_mm(a, s_ref[:hop], mxu_mode)
           + _mm(b, s_ref[hop:], mxu_mode)).reshape(He, BLK_B, nb)
    dre_ref[:] = jnp.transpose(sre[3:3 + H], (1, 0, 2))
    dim_ref[:] = jnp.transpose(sim[3:3 + H], (1, 0, 2))
    # the hybrid B taps are nonzero ONLY in uniform bands 1..4
    # (decode_taps zero-pads band 0 and bands 5+), so g is emitted on the
    # first _G_BANDS lanes only — 1/8 the inter-kernel HBM traffic of a
    # full-width g, which is what the dg pipeline is bound by
    sre_g = sre[..., :_G_BANDS]
    sim_g = sim[..., :_G_BANDS]
    gre = (_COEFF1 * (sre_g[6:6 + H] - sre_g[0:H])
           + _COEFF2 * (sre_g[4:4 + H] - sre_g[2:2 + H]))
    gim = (_COEFF1 * (sim_g[6:6 + H] - sim_g[0:H])
           + _COEFF2 * (sim_g[4:4 + H] - sim_g[2:2 + H]))
    gre_ref[:] = jnp.transpose(gre, (1, 0, 2))
    gim_ref[:] = jnp.transpose(gim, (1, 0, 2))


def analysis_front_dg_ri(tail: jax.Array, x: jax.Array,
                         low_delay: bool = False, interpret: bool = False,
                         mxu_mode: str | None = None):
    """Fused framing+window+fold+rDFT emitting (d_re, d_im, g_re, g_im),
    each (B, H, hop+1) — the direct taps and hybrid-FIR context the fused
    renderer consumes (see :func:`_kernel_dg`).  Same tail/x contract as
    :func:`analysis_front_ri`."""
    return _analysis_front_dg_ri(tail, x, low_delay=low_delay,
                                 interpret=interpret,
                                 mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "interpret", "mxu_mode"))
def _analysis_front_dg_ri(tail: jax.Array, x: jax.Array, low_delay: bool,
                          interpret: bool, mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    B = x.shape[0]
    t_hops = tail.shape[1] // hop
    n_hops = x.shape[1] // hop + t_hops
    H = n_hops - (_TOTAL_HOPS - 1) - 6           # d/g output hops
    w_ana, _ = _windows(hop, low_delay)
    C, S, _, _ = _rdft_mats(2 * hop)
    Bp = -(-B // BLK_B) * BLK_B
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, x.shape[1]), x.dtype)], axis=0)
        tail = jnp.concatenate(
            [tail, jnp.zeros((Bp - B, tail.shape[1]), tail.dtype)], axis=0)
    x3 = x.reshape(Bp, n_hops - t_hops, hop)
    tail3 = tail.reshape(Bp, t_hops, hop)
    spec = pl.pallas_call(
        partial(_kernel_dg, H, mxu_mode),
        grid=(Bp // BLK_B,),
        in_specs=[
            pl.BlockSpec((BLK_B, t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, n_hops - t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLK_B, H, hop + 1),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, H, hop + 1),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, H, _G_BANDS),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, H, _G_BANDS),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H, hop + 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H, hop + 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H, _G_BANDS), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H, _G_BANDS), jnp.float32),
        ),
        interpret=interpret,
    )(tail3, x3, jnp.asarray(w_ana.reshape(_TOTAL_HOPS, hop)),
      jnp.asarray(C), jnp.asarray(S))
    return tuple(o[:B] for o in spec)


# ---------------------------------------------------------------------------
# fused renderer back-end: hybrid ⊗ decode ⊗ hybrid-inverse ⊗ irDFT ⊗ OLA
# ---------------------------------------------------------------------------
#
# For a per-band mixing (decode) matrix M over the 133 HYBRID bands, the
# chain  hybrid-forward → per-band M → hybrid-inverse  collapses into a
# 7-tap FIR along the hop axis applied in the 129 UNIFORM bands:
#
#   y_u[h] = A_u · spec_u[h+3]  +  B_u · (j·(c1·(spec_u[h+6] − spec_u[h])
#                                          + c2·(spec_u[h+4] − spec_u[h+2])))
#
# with A_u = ½(M_lo + M_hi), B_u = s_u (M_lo − M_hi) for the four split
# uniform bands u∈{1..4} (lo/hi are the hybrid sub-band rows of M,
# s = [−1,1,−1,1]; afSTFT_internal.c:523-641), A_u = M for all other bands
# and B_u = 0.  This removes the hybrid stage, the packed-spectrum HBM
# round-trip and the per-band decode einsum from the XLA graph entirely —
# the decode runs as broadcast multiply-accumulates on the VPU while the
# spectra are already resident in VMEM.

BLK_S = 2       # streams per grid step in the fused renderer


def decode_taps(Mre, Mim, hybrid: bool = True):
    """(..., n_bands, Cout, Cin) hybrid-band decode matrices → uniform-band
    taps tensor (..., Cin, Cout, 4, 129) packing [A_re, A_im, B_re, B_im]."""
    xp = jnp if isinstance(Mre, jax.Array) else np
    if not hybrid:
        A_re, A_im = Mre, Mim
        B_re = xp.zeros_like(Mre)
        B_im = xp.zeros_like(Mim)
    else:
        s = np.array([-1.0, 1.0, -1.0, 1.0], np.float32)

        def collapse(M):
            lo = M[..., 1:9:2, :, :]
            hi = M[..., 2:10:2, :, :]
            A = xp.concatenate([M[..., :1, :, :], 0.5 * (lo + hi),
                                M[..., 9:, :, :]], axis=-3)
            B_mid = s[:, None, None] * (lo - hi)
            zpad1 = xp.zeros_like(M[..., :1, :, :])
            zpadr = xp.zeros_like(M[..., 9:, :, :])
            B = xp.concatenate([zpad1, B_mid, zpadr], axis=-3)
            return A, B

        A_re, B_re = collapse(Mre)
        A_im, B_im = collapse(Mim)
    # (..., nb, Cout, Cin) → (..., Cin, Cout, nb); stack the 4 parts
    def r(T):
        return xp.moveaxis(T, (-3, -2, -1), (-1, -2, -3))
    return xp.stack([r(A_re), r(A_im), r(B_re), r(B_im)], axis=-2)


def _tap_getter(taps_ref, per_stream: bool):
    """taps accessor shared by the render kernels: tap(s, e, k) is
    broadcastable against a (blk, H, nb) band tensor."""
    def tap(s, e, k):
        if per_stream:
            return taps_ref[:, s, e, k][:, None, :]     # (blk, 1, nb)
        return taps_ref[s, e, k]                        # (nb,)
    return tap


def _decode_mix(sre, sim, tap, H: int, cin: int, cout: int, hybrid: bool):
    """Per-uniform-band decode with the hybrid stage collapsed into A/B
    taps (see the fused-renderer comment above): sre/sim are sliceable
    (blk, cin, H+6, nb) spectra (VMEM refs or values).  Returns per-ear
    accumulations (out_re, out_im), each a list of (blk, H, nb)."""
    d_off = 3 if hybrid else 6
    out_re = [None] * cout
    out_im = [None] * cout
    for s in range(cin):
        d_re = sre[:, s, d_off:d_off + H, :]
        d_im = sim[:, s, d_off:d_off + H, :]
        if hybrid:
            g_re = (_COEFF1 * (sre[:, s, 6:6 + H, :] - sre[:, s, 0:H, :])
                    + _COEFF2 * (sre[:, s, 4:4 + H, :]
                                 - sre[:, s, 2:2 + H, :]))
            g_im = (_COEFF1 * (sim[:, s, 6:6 + H, :] - sim[:, s, 0:H, :])
                    + _COEFF2 * (sim[:, s, 4:4 + H, :]
                                 - sim[:, s, 2:2 + H, :]))
            w_re, w_im = -g_im, g_re                    # j · g
        for e in range(cout):
            are, aim = tap(s, e, 0), tap(s, e, 1)
            t_re = are * d_re - aim * d_im
            t_im = are * d_im + aim * d_re
            if hybrid:
                bre, bim = tap(s, e, 2), tap(s, e, 3)
                t_re = t_re + bre * w_re - bim * w_im
                t_im = t_im + bre * w_im + bim * w_re
            out_re[e] = t_re if s == 0 else out_re[e] + t_re
            out_im[e] = t_im if s == 0 else out_im[e] + t_im
    return out_re, out_im


def _irdft_ola_writeback(out_re, out_im, am, bm, w, H: int, blk: int,
                         cout: int, mxu_mode: str, acc, y_ref, tail_ref,
                         tail_out_ref):
    """Per-ear irDFT ⊗ synthesis window ⊗ overlap-add ⊗ tail merge, shared
    by the two-kernel renderer and the full-fusion renderer (identical op
    order).  Writes y_ref/tail_out_ref through the (blk, cout, …) refs."""
    hop = 128
    nb = am.shape[0]
    nt = _TOTAL_HOPS - 1
    for e in range(cout):
        fr = (_mm(out_re[e].reshape(blk * H, nb), am, mxu_mode)
              + _mm(out_im[e].reshape(blk * H, nb), bm, mxu_mode))
        fr = fr.reshape(blk, H, 2 * hop)
        f0 = fr[..., :hop]
        f1 = fr[..., hop:]
        acc[:, e] = jnp.zeros((blk, H + nt, hop), jnp.float32)
        for k in range(_TOTAL_HOPS):
            fk = f0 if k % 2 == 0 else f1
            acc[:, e, k:k + H, :] += fk * w[k]
        if H >= nt:
            y_ref[:, e] = acc[:, e, :H, :]
            y_ref[:, e, :nt, :] += tail_ref[:, e]
            tail_out_ref[:, e] = acc[:, e, H:, :]
        else:
            y_ref[:, e] = acc[:, e, :H, :] + tail_ref[:, e, :H, :]
            tail_out_ref[:, e] = acc[:, e, H:, :]
            tail_out_ref[:, e, :nt - H, :] += tail_ref[:, e, H:, :]


def _render_kernel(H: int, cin: int, cout: int, hybrid: bool,
                   per_stream: bool, mxu_mode: str, sre_ref, sim_ref,
                   taps_ref, am_ref, bm_ref, w_ref, tail_ref, y_ref,
                   tail_out_ref, acc):
    blk = sre_ref.shape[0]  # streams per grid step (see render's blk arg)
    out_re, out_im = _decode_mix(sre_ref, sim_ref,
                                 _tap_getter(taps_ref, per_stream),
                                 H, cin, cout, hybrid)
    _irdft_ola_writeback(out_re, out_im, am_ref[:], bm_ref[:], w_ref[:],
                         H, blk, cout, mxu_mode, acc, y_ref, tail_ref,
                         tail_out_ref)


def render_decode_synthesis_ri(sre: jax.Array, sim: jax.Array,
                               tail: jax.Array, taps: jax.Array,
                               low_delay: bool = False, hybrid: bool = True,
                               per_stream: bool = False,
                               interpret: bool = False, blk: int = BLK_S,
                               mxu_mode: str | None = None):
    """Fused decode ⊗ irDFT ⊗ window ⊗ overlap-add (``mxu_mode``: MXU
    precision of the irDFT matmuls; None = the process default).

    sre/sim: (S, Cin, H+6, 129) uniform-band spectra from
    :func:`analysis_front_ri` (6 leading warm-up hops);
    tail: (S, Cout, 9, hop) OLA carry; taps: (Cin, Cout, 4, 129) shared or
    (S, Cin, Cout, 4, 129) per-stream, from :func:`decode_taps`.
    Returns (y (S, Cout, H·hop), new_tail).

    ``blk`` = streams per grid step: the per-step VMEM footprint scales
    with blk·Cin·(H+6), so wide-Cin dispatches (high SH orders) pass
    blk=1 (see afstft_ri._fused_step_vmem_bytes).
    """
    return _render_decode_synthesis_ri(
        sre, sim, tail, taps, low_delay=low_delay, hybrid=hybrid,
        per_stream=per_stream, interpret=interpret, blk=blk,
        mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "hybrid", "per_stream",
                                   "interpret", "blk", "mxu_mode"))
def _render_decode_synthesis_ri(sre: jax.Array, sim: jax.Array,
                                tail: jax.Array, taps: jax.Array,
                                low_delay: bool, hybrid: bool,
                                per_stream: bool, interpret: bool,
                                blk: int, mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    S, cin, Hp6, nb = sre.shape
    H = Hp6 - 6
    cout = taps.shape[-3]
    _, w_syn = _windows(hop, low_delay)
    _, _, A, Bm = _rdft_mats(2 * hop)
    if low_delay:
        sign = np.where(np.arange(hop + 1) % 2, -1.0, 1.0)[:, None]
        A = A * sign
        Bm = Bm * sign
    Sp = -(-S // blk) * blk
    if Sp != S:
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((Sp - S,) + a.shape[1:], a.dtype)], axis=0)
        sre, sim, tail = pad(sre), pad(sim), pad(tail)
        if per_stream:
            taps = pad(taps)
    nt = _TOTAL_HOPS - 1
    if per_stream:
        taps_spec = pl.BlockSpec((blk, cin, cout, 4, nb),
                                 lambda i: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        taps_spec = pl.BlockSpec((cin, cout, 4, nb),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    y, new_tail = pl.pallas_call(
        partial(_render_kernel, H, cin, cout, hybrid, per_stream, mxu_mode),
        grid=(Sp // blk,),
        in_specs=[
            pl.BlockSpec((blk, cin, Hp6, nb),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cin, Hp6, nb),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            taps_spec,
            pl.BlockSpec((nb, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, cout, H, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, cout, H, hop), jnp.float32),
            jax.ShapeDtypeStruct((Sp, cout, nt, hop), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk, cout, H + nt, hop), jnp.float32),
        ],
        interpret=interpret,
    )(sre, sim, taps, jnp.asarray(A.astype(np.float32)),
      jnp.asarray(Bm.astype(np.float32)),
      jnp.asarray(w_syn.reshape(_TOTAL_HOPS, hop)), tail)
    return (y[:S].reshape(S, cout, H * hop), new_tail[:S])


def _decode_mix_dg(dre, dim_, gre, gim, taps_ref, per_stream: bool,
                   H: int, cin: int, cout: int):
    """Decode from the precomputed (d, g) pair — NO hop-shifted slices
    (the front kernel already applied the hybrid FIR; see _kernel_dg).
    Batched over the whole channel axis: per-ear products
    (blk, cin, H, nb) reduce over the ALIGNED cin axis in one op instead
    of cin unrolled iterations of small tensors (wide-cin orders spent
    their kernel time in loop bodies).  Same sums as _decode_mix's hybrid
    branch up to the reduction association (~1 ulp·√cin)."""
    out_re = [None] * cout
    out_im = [None] * cout
    nb = dre.shape[-1]
    blk = dre.shape[0]
    zpad = jnp.zeros((blk, H, nb - _G_BANDS), jnp.float32)
    w_re = -gim                                  # (blk, cin, H, _G_BANDS)
    w_im = gre

    def tap_all(e, k, nlanes):
        if per_stream:                           # (blk, cin, 1, nlanes)
            return taps_ref[:, :, e, k, :nlanes][:, :, None, :]
        return taps_ref[:, e, k, :nlanes][None, :, None, :]

    for e in range(cout):
        are, aim = tap_all(e, 0, nb), tap_all(e, 1, nb)
        bre, bim = tap_all(e, 2, _G_BANDS), tap_all(e, 3, _G_BANDS)
        t_re = (are * dre - aim * dim_).sum(axis=1)
        t_im = (are * dim_ + aim * dre).sum(axis=1)
        c_re = (bre * w_re - bim * w_im).sum(axis=1)
        c_im = (bre * w_im + bim * w_re).sum(axis=1)
        # the hybrid contribution lives in the first _G_BANDS lanes;
        # lane-concat with zeros (Mosaic-supported) rather than a
        # scatter-add, which fails to lower on current Mosaic
        out_re[e] = t_re + jnp.concatenate([c_re, zpad], axis=-1)
        out_im[e] = t_im + jnp.concatenate([c_im, zpad], axis=-1)
    return out_re, out_im


def _render_dg_kernel(H: int, cin: int, cout: int, per_stream: bool,
                      mxu_mode: str, dre_ref, dim_ref, gre_ref, gim_ref,
                      taps_ref, am_ref, bm_ref, w_ref, tail_ref, y_ref,
                      tail_out_ref, acc):
    blk = dre_ref.shape[0]
    out_re, out_im = _decode_mix_dg(dre_ref[:], dim_ref[:], gre_ref[:],
                                    gim_ref[:], taps_ref, per_stream,
                                    H, cin, cout)
    _irdft_ola_writeback(out_re, out_im, am_ref[:], bm_ref[:], w_ref[:],
                         H, blk, cout, mxu_mode, acc, y_ref, tail_ref,
                         tail_out_ref)


def render_decode_synthesis_dg_ri(dre: jax.Array, dim_: jax.Array,
                                  gre: jax.Array, gim: jax.Array,
                                  tail: jax.Array, taps: jax.Array,
                                  low_delay: bool = False,
                                  per_stream: bool = False,
                                  interpret: bool = False, blk: int = BLK_S,
                                  mxu_mode: str | None = None):
    """decode ⊗ irDFT ⊗ window ⊗ overlap-add from the (d, g) pair emitted
    by :func:`analysis_front_dg_ri` (each (S, Cin, H, 129)).  Same output
    contract as :func:`render_decode_synthesis_ri`; hybrid only."""
    return _render_decode_synthesis_dg_ri(
        dre, dim_, gre, gim, tail, taps, low_delay=low_delay,
        per_stream=per_stream, interpret=interpret, blk=blk,
        mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "per_stream", "interpret",
                                   "blk", "mxu_mode"))
def _render_decode_synthesis_dg_ri(dre, dim_, gre, gim, tail, taps,
                                   low_delay: bool, per_stream: bool,
                                   interpret: bool, blk: int,
                                   mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    S, cin, H, nb = dre.shape
    cout = taps.shape[-3]
    _, w_syn = _windows(hop, low_delay)
    _, _, A, Bm = _rdft_mats(2 * hop)
    if low_delay:
        sign = np.where(np.arange(hop + 1) % 2, -1.0, 1.0)[:, None]
        A = A * sign
        Bm = Bm * sign
    Sp = -(-S // blk) * blk
    if Sp != S:
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((Sp - S,) + a.shape[1:], a.dtype)], axis=0)
        dre, dim_, gre, gim = pad(dre), pad(dim_), pad(gre), pad(gim)
        tail = pad(tail)
        if per_stream:
            taps = pad(taps)
    nt = _TOTAL_HOPS - 1
    if per_stream:
        taps_spec = pl.BlockSpec((blk, cin, cout, 4, nb),
                                 lambda i: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        taps_spec = pl.BlockSpec((cin, cout, 4, nb),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    spec_spec = pl.BlockSpec((blk, cin, H, nb),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((blk, cin, H, _G_BANDS),
                          lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    y, new_tail = pl.pallas_call(
        partial(_render_dg_kernel, H, cin, cout, per_stream, mxu_mode),
        grid=(Sp // blk,),
        in_specs=[
            spec_spec, spec_spec, g_spec, g_spec,
            taps_spec,
            pl.BlockSpec((nb, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, cout, H, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, cout, H, hop), jnp.float32),
            jax.ShapeDtypeStruct((Sp, cout, nt, hop), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk, cout, H + nt, hop), jnp.float32),
        ],
        interpret=interpret,
    )(dre, dim_, gre, gim, taps, jnp.asarray(A.astype(np.float32)),
      jnp.asarray(Bm.astype(np.float32)),
      jnp.asarray(w_syn.reshape(_TOTAL_HOPS, hop)), tail)
    return (y[:S].reshape(S, cout, H * hop), new_tail[:S])


# ---------------------------------------------------------------------------
# FULLY-fused renderer: framing ⊗ window ⊗ fold ⊗ rDFT ⊗ hybrid ⊗ decode ⊗
# hybrid-inverse ⊗ irDFT ⊗ window ⊗ overlap-add — ONE kernel, so the
# uniform-band spectra never exist in HBM at all.  The two-kernel pipeline
# (analysis_front_ri → render_decode_synthesis_ri) writes + re-reads
# S·Cin·(H+6)·129 f32 ×2 between the kernels (~148 MB/chunk for the
# 64-stream order-3 flagship — 3-4x the algorithmic floor traffic).
# ---------------------------------------------------------------------------


def _render_full_kernel(H: int, cin: int, cout: int, hybrid: bool,
                        per_stream: bool, mxu_mode: str, tail_ref, x_ref,
                        taps_ref, wa_ref, c_ref, s_ref, am_ref, bm_ref,
                        ws_ref, otail_ref, y_ref, tail_out_ref, acc):
    hop = 128
    blk = x_ref.shape[0]
    He = H + 6                       # hybrid-FIR context hops
    R = blk * cin
    nb = c_ref.shape[1]
    # analysis front in HOP-MAJOR layout (round-5: shifted fold and
    # hybrid-FIR slices are free row-offset reads instead of the
    # sublane-misaligned copies that sank the round-4 full-fusion
    # attempt; see _kernel_dg)
    xx = jnp.concatenate([tail_ref[:], x_ref[:]], axis=2)
    xt = jnp.transpose(xx.reshape(R, -1, hop), (1, 0, 2))
    acc0 = jnp.zeros((He, R, hop), jnp.float32)
    acc1 = jnp.zeros((He, R, hop), jnp.float32)
    for m in range(_TOTAL_HOPS // 2):
        acc0 = acc0 + xt[2 * m: 2 * m + He] * wa_ref[2 * m]
        acc1 = acc1 + xt[2 * m + 1: 2 * m + 1 + He] * wa_ref[2 * m + 1]
    a = acc0.reshape(He * R, hop)
    b = acc1.reshape(He * R, hop)
    sre = (_mm(a, c_ref[:hop], mxu_mode)
           + _mm(b, c_ref[hop:], mxu_mode)).reshape(He, R, nb)
    sim = (_mm(a, s_ref[:hop], mxu_mode)
           + _mm(b, s_ref[hop:], mxu_mode)).reshape(He, R, nb)
    d_off = 3 if hybrid else 6
    dre = jnp.transpose(sre[d_off:d_off + H],
                        (1, 0, 2)).reshape(blk, cin, H, nb)
    dim_ = jnp.transpose(sim[d_off:d_off + H],
                         (1, 0, 2)).reshape(blk, cin, H, nb)
    if hybrid:
        sre_g = sre[..., :_G_BANDS]
        sim_g = sim[..., :_G_BANDS]
        gre = (_COEFF1 * (sre_g[6:6 + H] - sre_g[0:H])
               + _COEFF2 * (sre_g[4:4 + H] - sre_g[2:2 + H]))
        gim = (_COEFF1 * (sim_g[6:6 + H] - sim_g[0:H])
               + _COEFF2 * (sim_g[4:4 + H] - sim_g[2:2 + H]))
        gre = jnp.transpose(gre, (1, 0, 2)).reshape(blk, cin, H, _G_BANDS)
        gim = jnp.transpose(gim, (1, 0, 2)).reshape(blk, cin, H, _G_BANDS)
    else:
        gre = jnp.zeros((blk, cin, H, _G_BANDS), jnp.float32)
        gim = jnp.zeros((blk, cin, H, _G_BANDS), jnp.float32)
    out_re, out_im = _decode_mix_dg(dre, dim_, gre, gim, taps_ref,
                                    per_stream, H, cin, cout)
    _irdft_ola_writeback(out_re, out_im, am_ref[:], bm_ref[:], ws_ref[:],
                         H, blk, cout, mxu_mode, acc, y_ref, otail_ref,
                         tail_out_ref)


def render_full_ri(in_tail: jax.Array, x: jax.Array, ola_tail: jax.Array,
                   taps: jax.Array, low_delay: bool = False,
                   hybrid: bool = True, per_stream: bool = False,
                   interpret: bool = False, blk: int = 1,
                   mxu_mode: str | None = None):
    """One-kernel TF-matrix renderer.

    in_tail: (S, cin, 15·hop) carried input history; x: (S, cin, H·hop);
    ola_tail: (S, cout, 9, hop); taps from :func:`decode_taps`, shared
    (cin, cout, 4, 129) or per-stream (S, cin, cout, 4, 129).
    Returns (y (S, cout, H·hop), new_ola_tail).  Numerically identical to
    analysis_front_ri → render_decode_synthesis_ri (the math is the same
    ops in the same order); the packed uniform-band spectra stay in VMEM.
    """
    return _render_full_ri(in_tail, x, ola_tail, taps, low_delay=low_delay,
                           hybrid=hybrid, per_stream=per_stream,
                           interpret=interpret, blk=blk,
                           mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "hybrid", "per_stream",
                                   "interpret", "blk", "mxu_mode"))
def _render_full_ri(in_tail: jax.Array, x: jax.Array, ola_tail: jax.Array,
                    taps: jax.Array, low_delay: bool, hybrid: bool,
                    per_stream: bool, interpret: bool, blk: int,
                    mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    S, cin = x.shape[:2]
    H = x.shape[2] // hop
    t_hops = in_tail.shape[2] // hop
    cout = taps.shape[-3]
    w_ana, w_syn = _windows(hop, low_delay)
    C, Smat, A, Bm = _rdft_mats(2 * hop)
    if low_delay:
        sign = np.where(np.arange(hop + 1) % 2, -1.0, 1.0)[:, None]
        A = A * sign
        Bm = Bm * sign
    Sp = -(-S // blk) * blk
    if Sp != S:
        pad = lambda a_: jnp.concatenate(
            [a_, jnp.zeros((Sp - S,) + a_.shape[1:], a_.dtype)], axis=0)
        in_tail, x, ola_tail = pad(in_tail), pad(x), pad(ola_tail)
        if per_stream:
            taps = pad(taps)
    nt = _TOTAL_HOPS - 1
    if per_stream:
        taps_spec = pl.BlockSpec((blk, cin, cout, 4, hop + 1),
                                 lambda i: (i, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        taps_spec = pl.BlockSpec((cin, cout, 4, hop + 1),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    y, new_tail = pl.pallas_call(
        partial(_render_full_kernel, H, cin, cout, hybrid, per_stream,
                mxu_mode),
        grid=(Sp // blk,),
        in_specs=[
            pl.BlockSpec((blk, cin, t_hops, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cin, H, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            taps_spec,
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, hop + 1),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop + 1, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hop + 1, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, cout, H, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, cout, nt, hop),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, cout, H, hop), jnp.float32),
            jax.ShapeDtypeStruct((Sp, cout, nt, hop), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk, cout, H + nt, hop), jnp.float32),
        ],
        # the one-kernel pipeline's working set (hop-major spectra values
        # + d/g + decode products) legitimately exceeds the 16 MiB default
        # scoped budget; v5e has 128 MiB of physical VMEM
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)),
        interpret=interpret,
    )(in_tail.reshape(Sp, cin, t_hops, hop),
      x.reshape(Sp, cin, H, hop), taps,
      jnp.asarray(w_ana.reshape(_TOTAL_HOPS, hop)),
      jnp.asarray(C), jnp.asarray(Smat),
      jnp.asarray(A.astype(np.float32)), jnp.asarray(Bm.astype(np.float32)),
      jnp.asarray(w_syn.reshape(_TOTAL_HOPS, hop)), ola_tail)
    return (y[:S].reshape(S, cout, H * hop), new_tail[:S])


# ---------------------------------------------------------------------------
# synthesis back-end: hybrid-inverse ⊗ irDFT ⊗ window ⊗ overlap-add
# ---------------------------------------------------------------------------

def _hybrid_inverse_mtx(n_bands_hyb: int, hop: int) -> np.ndarray:
    """(n_bands_hyb, hop+1) 0/1 matrix summing hybrid band pairs back to
    uniform bands (afSTFT_internal.c:644-673) — folded into the irDFT."""
    nb_uni = hop + 1
    P = np.zeros((n_bands_hyb, nb_uni), np.float32)
    if n_bands_hyb == nb_uni:       # non-hybrid
        return np.eye(nb_uni, dtype=np.float32)
    P[0, 0] = 1.0
    for p in range(4):              # bands 1..8 are pairs of uniform 1..4
        P[1 + 2 * p, 1 + p] = 1.0
        P[2 + 2 * p, 1 + p] = 1.0
    for b in range(5, nb_uni):      # bands 9.. map 1:1 to uniform 5..
        P[4 + b, b] = 1.0
    return P


def _syn_kernel(H: int, mxu_mode: str, spec_ref, tail_ref, ab_ref, w_ref,
                y_ref, tail_out_ref, acc):
    hop = 128
    nbh2 = spec_ref.shape[2]
    # frames = [spec_re | spec_im] @ [P·A; P·B]  → (BLK_B·H, 2·hop)
    frames = _mm(spec_ref[:].reshape(BLK_B * H, nbh2), ab_ref[:], mxu_mode)
    frames = frames.reshape(BLK_B, H, 2 * hop)
    f0 = frames[..., :hop]
    f1 = frames[..., hop:]
    w = w_ref[:]
    acc[:] = jnp.zeros((BLK_B, H + _TOTAL_HOPS - 1, hop), jnp.float32)
    for k in range(_TOTAL_HOPS):
        fk = f0 if k % 2 == 0 else f1
        acc[:, k:k + H, :] += fk * w[k]
    nt = _TOTAL_HOPS - 1
    if H >= nt:
        y_ref[:] = acc[:, :H, :]
        y_ref[:, :nt, :] += tail_ref[:]
        tail_out_ref[:] = acc[:, H:, :]
    else:  # block shorter than the window tail: part of the old tail carries
        y_ref[:] = acc[:, :H, :] + tail_ref[:, :H, :]
        tail_out_ref[:] = acc[:, H:, :]
        tail_out_ref[:, : nt - H, :] += tail_ref[:, H:, :]


def synthesis_back_ri(spec: jax.Array, tail: jax.Array,
                      low_delay: bool = False, hybrid: bool = True,
                      interpret: bool = False, mxu_mode: str | None = None):
    """Fused hybrid-inverse + irDFT + window + overlap-add.

    spec: (B, H, 2·n_bands) float32, packed [re | im] (post-decode);
    tail:  (B, 9, hop) float32 — previous block's overlap carry.
    Returns (y (B, H, hop), new_tail (B, 9, hop)).  ``mxu_mode``: MXU
    precision of the irDFT matmul (None = the process default).
    """
    return _synthesis_back_ri(spec, tail, low_delay=low_delay,
                              hybrid=hybrid, interpret=interpret,
                              mxu_mode=_prec.resolve_mode(mxu_mode))


@partial(jax.jit, static_argnames=("low_delay", "hybrid", "interpret",
                                   "mxu_mode"))
def _synthesis_back_ri(spec: jax.Array, tail: jax.Array, low_delay: bool,
                       hybrid: bool, interpret: bool, mxu_mode: str):
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    B, H = spec.shape[:2]
    nbh = spec.shape[2] // 2
    _, w_syn = _windows(hop, low_delay)
    _, _, A, Bm = _rdft_mats(2 * hop)
    P = _hybrid_inverse_mtx(nbh, hop)
    if low_delay:
        sign = np.where(np.arange(hop + 1) % 2, -1.0, 1.0)[:, None]
        A = A * sign
        Bm = Bm * sign
    AB = np.concatenate([P @ A, P @ Bm], axis=0).astype(np.float32)
    Bp = -(-B // BLK_B) * BLK_B
    if Bp != B:
        spec = jnp.concatenate(
            [spec, jnp.zeros((Bp - B,) + spec.shape[1:], spec.dtype)], 0)
        tail = jnp.concatenate(
            [tail, jnp.zeros((Bp - B,) + tail.shape[1:], tail.dtype)], 0)
    y, new_tail = pl.pallas_call(
        partial(_syn_kernel, H, mxu_mode),
        grid=(Bp // BLK_B,),
        in_specs=[
            pl.BlockSpec((BLK_B, H, 2 * nbh),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, _TOTAL_HOPS - 1, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nbh, 2 * hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLK_B, H, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, _TOTAL_HOPS - 1, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H, hop), jnp.float32),
            jax.ShapeDtypeStruct((Bp, _TOTAL_HOPS - 1, hop), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLK_B, H + _TOTAL_HOPS - 1, hop), jnp.float32),
        ],
        interpret=interpret,
    )(spec, tail, jnp.asarray(AB),
      jnp.asarray(w_syn.reshape(_TOTAL_HOPS, hop)))
    return y[:B], new_tail[:B]
