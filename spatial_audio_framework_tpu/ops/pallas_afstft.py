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


def _kernel(H: int, x_ref, w_ref, cs_ref, out_ref):
    hop = 128
    x = x_ref[:]                                    # (BLK_B, H+9, hop)
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
def analysis_front_ri(buf: jax.Array, low_delay: bool = False,
                      interpret: bool = False):
    """Fused framing+window+fold+rDFT.

    buf: (B, (H+9)·hop) float32 — input tail (9 hops) followed by the block.
    Returns (re, im) each (B, H, hop+1).  hop is fixed at 128 (the window
    fold and tile sizes assume it; the reference uses hop 128 throughout).
    """
    hop = 128
    B = buf.shape[0]
    n_hops = buf.shape[1] // hop
    H = n_hops - (_TOTAL_HOPS - 1)
    w_ana, _ = _windows(hop, low_delay)
    C, S, _, _ = _rdft_mats(2 * hop)
    CS = np.concatenate([C, S], axis=1)             # (256, 258)
    # pad batch to a multiple of BLK_B
    Bp = -(-B // BLK_B) * BLK_B
    if Bp != B:
        buf = jnp.concatenate(
            [buf, jnp.zeros((Bp - B, buf.shape[1]), buf.dtype)], axis=0)
    x3 = buf.reshape(Bp, n_hops, hop)
    out = pl.pallas_call(
        partial(_kernel, H),
        grid=(Bp // BLK_B,),
        in_specs=[
            pl.BlockSpec((BLK_B, n_hops, hop),
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
    )(x3, jnp.asarray(w_ana.reshape(_TOTAL_HOPS, hop)), jnp.asarray(CS))
    out = out[:B]
    return out[..., : hop + 1], out[..., hop + 1:]
