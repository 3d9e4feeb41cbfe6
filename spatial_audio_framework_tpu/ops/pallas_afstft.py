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

from spatial_audio_framework_tpu.ops.afstft import _TOTAL_HOPS, _windows
from spatial_audio_framework_tpu.ops.fft import _rdft_mats

BLK_B = 8       # batch rows per grid step (f32 sublane)


def _kernel(H: int, tail_ref, x_ref, w_ref, cs_ref, out_ref):
    hop = 128
    # VMEM concat of the carried tail and the new block (both offset-0 on
    # the sublane axis, which Mosaic supports) — avoids materialising the
    # concatenated buffer in HBM every block.
    x = jnp.concatenate([tail_ref[:], x_ref[:]], axis=1)
    w = w_ref[:]                                    # (10, hop)
    # fold: parity p gets window taps k = p, p+2, ..., p+8
    acc0 = jnp.zeros((BLK_B, H, hop), jnp.float32)
    acc1 = jnp.zeros((BLK_B, H, hop), jnp.float32)
    for m in range(_TOTAL_HOPS // 2):
        acc0 = acc0 + x[:, 2 * m: 2 * m + H, :] * w[2 * m]
        acc1 = acc1 + x[:, 2 * m + 1: 2 * m + 1 + H, :] * w[2 * m + 1]
    # spec = [acc0 | acc1] @ CS as two half-K matmuls (a lane concat of the
    # parity accumulators trips Mosaic's layout rules)
    nb2 = cs_ref.shape[1]
    spec = (jnp.dot(acc0.reshape(BLK_B * H, hop), cs_ref[:hop],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(acc1.reshape(BLK_B * H, hop), cs_ref[hop:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
    out_ref[:] = spec.reshape(BLK_B, H, nb2)


@partial(jax.jit, static_argnames=("low_delay", "interpret"))
def analysis_front_ri(tail: jax.Array, x: jax.Array, low_delay: bool = False,
                      interpret: bool = False):
    """Fused framing+window+fold+rDFT.

    tail: (B, T_tail) float32 — carried input history (multiple of hop);
    x:    (B, H·hop) float32 — the new block.
    Returns (re, im) each (B, H + T_tail/hop − 9, hop+1): one spectral hop
    per input hop beyond the 9-hop window warm-up.  hop is fixed at 128
    (the window fold and tile sizes assume it; the reference uses hop 128
    throughout).  The tail/block concatenation happens inside the kernel in
    VMEM — neither buffer is copied in HBM.
    """
    hop = 128
    interpret = interpret or jax.default_backend() != "tpu"
    B = x.shape[0]
    t_hops = tail.shape[1] // hop
    n_hops = x.shape[1] // hop + t_hops
    H = n_hops - (_TOTAL_HOPS - 1)
    w_ana, _ = _windows(hop, low_delay)
    C, S, _, _ = _rdft_mats(2 * hop)
    CS = np.concatenate([C, S], axis=1)             # (256, 258)
    # pad batch to a multiple of BLK_B
    Bp = -(-B // BLK_B) * BLK_B
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, x.shape[1]), x.dtype)], axis=0)
        tail = jnp.concatenate(
            [tail, jnp.zeros((Bp - B, tail.shape[1]), tail.dtype)], axis=0)
    x3 = x.reshape(Bp, n_hops - t_hops, hop)
    tail3 = tail.reshape(Bp, t_hops, hop)
    out = pl.pallas_call(
        partial(_kernel, H),
        grid=(Bp // BLK_B,),
        in_specs=[
            pl.BlockSpec((BLK_B, t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, n_hops - t_hops, hop),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TOTAL_HOPS, hop),             # window (10, 128)
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hop, 2 * (hop + 1)),       # CS (256, 258)
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLK_B, H, 2 * (hop + 1)),
            lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H, 2 * (hop + 1)), jnp.float32),
        interpret=interpret,
    )(tail3, x3, jnp.asarray(w_ana.reshape(_TOTAL_HOPS, hop)),
      jnp.asarray(CS))
    out = out[:B]
    return out[..., : hop + 1], out[..., hop + 1:]


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


def _syn_kernel(H: int, spec_ref, tail_ref, ab_ref, w_ref, y_ref,
                tail_out_ref, acc):
    hop = 128
    nbh2 = spec_ref.shape[2]
    # frames = [spec_re | spec_im] @ [P·A; P·B]  → (BLK_B·H, 2·hop)
    frames = jnp.dot(spec_ref[:].reshape(BLK_B * H, nbh2), ab_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
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


@partial(jax.jit, static_argnames=("low_delay", "hybrid", "interpret"))
def synthesis_back_ri(spec: jax.Array, tail: jax.Array,
                      low_delay: bool = False, hybrid: bool = True,
                      interpret: bool = False):
    """Fused hybrid-inverse + irDFT + window + overlap-add.

    spec: (B, H, 2·n_bands) float32, packed [re | im] (post-decode);
    tail:  (B, 9, hop) float32 — previous block's overlap carry.
    Returns (y (B, H, hop), new_tail (B, 9, hop)).
    """
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
        partial(_syn_kernel, H),
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
