"""ambi_enc — Ambisonic (SH) encoder (counterpart of ``examples/src/ambi_enc``).

Encodes source signals at given directions into SH signals with a linear
crossfade between the previous and current encoding matrices each block
(ambi_enc.c process: interpolator_fadeIn/fadeOut), carrying the previous
frame's encoding matrix in the state.  Note the reference encodes the
*previous* frame's input (one-frame latency, ambi_enc.c prev_inputFrameTD);
reproduced here so outputs align bit-for-bit in spirit.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh


@dataclass(frozen=True)
class AmbiEncConfig:
    order: int = 1
    n_sources: int = 1
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    enable_post_scaling: bool = True
    frame_size: int = 128

    @property
    def nsh(self) -> int:
        return (self.order + 1) ** 2

    def __post_init__(self):
        C.validate_config(self)


class AmbiEncState(NamedTuple):
    prev_Y: jax.Array   # (nSH, nSrc) previous encoding matrix
    prev_x: jax.Array   # (nSrc, T) previous input frame


def encoding_mtx(cfg: AmbiEncConfig, src_dirs_deg) -> jax.Array:
    """Y = getRSH(order, dirs): (nSH, nSrc), N3D/ACN (ambi_enc.c getRSH_recur)."""
    return sh.get_rsh(cfg.order, src_dirs_deg)


def design(cfg: AmbiEncConfig) -> jax.Array:
    """Output-convention conversion matrix (ACN/N3D → cfg conventions)."""
    return jnp.asarray(C.output_conversion_mtx(cfg.order, cfg.ch_ordering, cfg.norm))


def init_state(cfg: AmbiEncConfig, src_dirs_deg: Optional[np.ndarray] = None) -> AmbiEncState:
    Y0 = (sh.get_rsh(cfg.order, np.asarray(src_dirs_deg, np.float64)).astype(np.float32)
          if src_dirs_deg is not None else np.zeros((cfg.nsh, cfg.n_sources), np.float32))
    return AmbiEncState(prev_Y=jnp.asarray(Y0),
                        prev_x=jnp.zeros((cfg.n_sources, cfg.frame_size), jnp.float32))


def process(cfg: AmbiEncConfig, out_conv: jax.Array, state: AmbiEncState,
            x: jax.Array, src_dirs_deg: jax.Array,
            src_gains: Optional[jax.Array] = None):
    """x: (nSrc, T); src_dirs_deg: traced (nSrc, 2) degrees.
    → ((nSH, T), state)."""
    T = x.shape[-1]
    if src_gains is not None:
        x = x * src_gains[:, None]
    d = jnp.asarray(np.pi / 180.0, x.dtype)
    dirs_rad = jnp.stack([src_dirs_deg[:, 0] * d,
                          jnp.asarray(np.pi / 2, x.dtype) - src_dirs_deg[:, 1] * d], -1)
    Y = sh.get_sh_real(cfg.order, dirs_rad) * np.sqrt(4.0 * np.pi)
    Y = Y.astype(x.dtype)
    # encode previous frame with both matrices, crossfade (ambi_enc.c:439-470)
    out_new = Y @ state.prev_x
    out_old = state.prev_Y @ state.prev_x
    fade_in = (jnp.arange(1, T + 1, dtype=x.dtype) / T)[None, :]
    out = out_new * fade_in + out_old * (1.0 - fade_in)
    if cfg.enable_post_scaling:
        out = out / np.sqrt(cfg.n_sources)
    out = out_conv @ out
    return out, AmbiEncState(prev_Y=Y, prev_x=x)
