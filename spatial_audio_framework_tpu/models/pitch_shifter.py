"""pitch_shifter — SMB phase-vocoder wrapper (counterpart of
``examples/src/pitch_shifter``)."""
from __future__ import annotations

from dataclasses import dataclass

import jax

from spatial_audio_framework_tpu.ops.pitch import SmbPitchShift, SmbPitchShiftState
from spatial_audio_framework_tpu.models import _common as C

# PITCH_SHIFTER_FFTSIZE / OSAMP options (pitch_shifter.h)
FFT_SIZES = (512, 1024, 2048, 4096, 8192, 16384)
OSAMPS = (2, 4, 8, 16, 32)


@dataclass(frozen=True)
class PitchShifterConfig:
    fs: float = 48000.0
    n_ch: int = 1
    fft_size: int = 8192
    osamp: int = 16

    @property
    def op(self) -> SmbPitchShift:
        return SmbPitchShift(fs=self.fs, n_ch=self.n_ch,
                             fft_size=self.fft_size, osamp=self.osamp)

    @property
    def latency(self) -> int:
        return self.op.latency

    def __post_init__(self):
        C.validate_config(self)


def init_state(cfg: PitchShifterConfig) -> SmbPitchShiftState:
    return cfg.op.init_state()


def design(cfg: PitchShifterConfig):
    """Device DFT operators to pass through jit as arguments (required on
    remote-compile backends at large fft_size; see SmbPitchShift.design)."""
    return cfg.op.design()


def process(cfg: PitchShifterConfig, state: SmbPitchShiftState, x: jax.Array,
            shift_factor, mats=None):
    """x: (nCH, T), T multiple of fft_size/osamp; shift_factor traced scalar
    in [0.5, 2] → ((nCH, T), state).  Pass mats=design(cfg) through the jit
    boundary for large fft_size."""
    return cfg.op.apply(state, x, shift_factor, mats=mats)
