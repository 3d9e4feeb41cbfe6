"""rotator — SH-domain rotation by yaw/pitch/roll (counterpart of
``examples/src/rotator``).  The Ivanic rotation matrix is traced, so
head-tracking angles stream without recompilation; the previous rotation
matrix is carried in state and crossfaded linearly over the block (the
reference's interpolator, rotator.c).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh
from spatial_audio_framework_tpu.utils import geometry as geo


@dataclass(frozen=True)
class RotatorConfig:
    order: int = 1
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    use_roll_pitch_yaw: bool = False
    frame_size: int = 128

    @property
    def nsh(self) -> int:
        return (self.order + 1) ** 2

    def __post_init__(self):
        C.validate_config(self)


class RotatorState(NamedTuple):
    prev_M: jax.Array   # (nSH, nSH)
    prev_x: jax.Array   # (nSH, T) previous input frame


def design(cfg: RotatorConfig):
    """(in_conv, out_conv) convention matrices folded around the rotation."""
    conv_in = C.input_conversion_mtx(cfg.order, cfg.ch_ordering, cfg.norm)
    conv_out = C.output_conversion_mtx(cfg.order, cfg.ch_ordering, cfg.norm)
    return jnp.asarray(conv_in), jnp.asarray(conv_out)


def init_state(cfg: RotatorConfig) -> RotatorState:
    return RotatorState(prev_M=jnp.eye(cfg.nsh, dtype=jnp.float32),
                        prev_x=jnp.zeros((cfg.nsh, cfg.frame_size), jnp.float32))


def process(cfg: RotatorConfig, weights, state: RotatorState, x: jax.Array,
            ypr: jax.Array):
    """x: (nSH, T); ypr: traced (yaw, pitch, roll) radians.  One-frame
    latency with matrix crossfade, as in the reference."""
    conv_in, conv_out = weights
    T = x.shape[-1]
    R = geo.yaw_pitch_roll2_rzyx(ypr[0], ypr[1], ypr[2],
                                 roll_pitch_yaw=cfg.use_roll_pitch_yaw)
    M = sh.get_sh_rot_mtx_real(R.astype(jnp.float32), cfg.order)
    xin = conv_in @ state.prev_x
    out_new = M @ xin
    out_old = state.prev_M @ xin
    fade_in = (jnp.arange(1, T + 1, dtype=x.dtype) / T)[None, :]
    out = conv_out @ (out_new * fade_in + out_old * (1.0 - fade_in))
    return out, RotatorState(prev_M=M, prev_x=x)
