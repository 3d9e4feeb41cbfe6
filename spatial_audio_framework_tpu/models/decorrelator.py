"""decorrelator — multi-channel decorrelator example (counterpart of
``examples/src/decorrelator``): afSTFT → optional transient ducking → lattice
all-pass decorrelation (+fixed per-band delays) → inverse afSTFT, with a
wet/dry ('decorrelation amount') mix.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.ops.afstft import AfSTFT, AfSTFTState
from spatial_audio_framework_tpu.utils import decor


@dataclass(frozen=True)
class DecorrelatorConfig:
    n_channels: int = 1
    fs: float = 48000.0
    decor_amount: float = 1.0       # decorrelator.h 'decorrelationAmount'
    enable_transient_ducker: bool = True
    hop: int = 128

    @property
    def afstft(self) -> AfSTFT:
        return AfSTFT(hop=self.hop, hybrid=True)

    @property
    def lattice(self) -> decor.LatticeDecorrelator:
        # orders/cutoffs as in decorrelator_internal.c initCodec
        return decor.LatticeDecorrelator(
            fs=self.fs, hop_size=self.hop, n_ch=self.n_channels,
            orders=(20, 15, 6, 3), freq_cutoffs=(600.0, 2.4e3, 4e3, 12e3),
            max_delay=10)


class DecorrelatorState(NamedTuple):
    bank: AfSTFTState
    lattice: decor.LatticeDecorState
    ducker: decor.TransientDuckerState


def design(cfg: DecorrelatorConfig) -> dict:
    freqs = cfg.afstft.centre_freqs(cfg.fs)
    return cfg.lattice.design(freqs)


def init_state(cfg: DecorrelatorConfig, design_data: dict) -> DecorrelatorState:
    n_bands = cfg.afstft.n_bands
    return DecorrelatorState(
        bank=cfg.afstft.init_state(cfg.n_channels, cfg.n_channels),
        lattice=cfg.lattice.init_state(design_data, n_bands),
        ducker=decor.transient_ducker_init(n_bands, cfg.n_channels))


def process(cfg: DecorrelatorConfig, design_data: dict,
            state: DecorrelatorState, x: jax.Array):
    """x: (nCH, T) → ((nCH, T), state)."""
    bank = cfg.afstft
    spec, bank_st = bank.analysis(state.bank, x)   # (nBands, nCH, H)
    frame = spec.transpose(0, 1, 2)
    ducker_st = state.ducker
    trans = jnp.zeros_like(frame)
    if cfg.enable_transient_ducker:
        frame, trans, ducker_st = decor.transient_ducker_apply(ducker_st, frame)
    wet, lat_st = cfg.lattice.apply(design_data, state.lattice, frame)
    out = cfg.decor_amount * wet + (1.0 - cfg.decor_amount) * frame + trans * 0
    y, bank_st = bank.synthesis(bank_st, out)
    return y, DecorrelatorState(bank=bank_st, lattice=lat_st, ducker=ducker_st)
