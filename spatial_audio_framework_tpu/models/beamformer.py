"""beamformer — static SH-domain beamformers (counterpart of
``examples/src/beamformer``): cardioid / hypercardioid / max-EV patterns
steered at arbitrary directions, with per-block crossfade of the weights.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh

BEAM_CARDIOID = "cardioid"
BEAM_HYPERCARDIOID = "hypercardioid"
BEAM_MAX_EV = "max_ev"


@dataclass(frozen=True)
class BeamformerConfig:
    order: int = 1
    n_beams: int = 1
    beam_type: str = BEAM_HYPERCARDIOID
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    frame_size: int = 128

    @property
    def nsh(self) -> int:
        return (self.order + 1) ** 2

    def __post_init__(self):
        C.validate_config(self)


class BeamformerState(NamedTuple):
    prev_W: jax.Array   # (nBeams, nSH)
    prev_x: jax.Array   # (nSH, T)


def design(cfg: BeamformerConfig, beam_dirs_deg: np.ndarray) -> jax.Array:
    """Beamforming weights (nBeams, nSH): axisymmetric pattern b_n steered to
    each direction via rotateAxisCoeffsReal (beamformer_internal.c)."""
    b_n = {BEAM_CARDIOID: sh.beam_weights_cardioid,
           BEAM_HYPERCARDIOID: sh.beam_weights_hypercardioid,
           BEAM_MAX_EV: sh.beam_weights_max_ev}[cfg.beam_type](cfg.order)
    W = np.zeros((cfg.n_beams, cfg.nsh), np.float32)
    for i, (azi, elev) in enumerate(np.atleast_2d(beam_dirs_deg)[: cfg.n_beams]):
        W[i] = sh.rotate_axis_coeffs_real(
            cfg.order, b_n, np.pi / 2.0 - np.radians(elev), np.radians(azi))
    conv_in = C.input_conversion_mtx(cfg.order, cfg.ch_ordering, cfg.norm)
    return jnp.asarray(W @ conv_in)


def init_state(cfg: BeamformerConfig) -> BeamformerState:
    return BeamformerState(prev_W=jnp.zeros((cfg.n_beams, cfg.nsh), jnp.float32),
                           prev_x=jnp.zeros((cfg.nsh, cfg.frame_size), jnp.float32))


def process(cfg: BeamformerConfig, W: jax.Array, state: BeamformerState,
            x: jax.Array):
    """x: (nSH, T) → ((nBeams, T), state); crossfades W against the previous
    block's weights on the previous frame (one-frame latency)."""
    T = x.shape[-1]
    out_new = W @ state.prev_x
    out_old = state.prev_W @ state.prev_x
    fade_in = (jnp.arange(1, T + 1, dtype=x.dtype) / T)[None, :]
    out = out_new * fade_in + out_old * (1.0 - fade_in)
    return out, BeamformerState(prev_W=W, prev_x=x)
