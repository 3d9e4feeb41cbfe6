"""sldoa — spatially-localised active-intensity DoA analyser (counterpart of
``examples/src/sldoa``).

Per frequency band, WXYZ sector beams (order-dependent t-design sector grids,
sldoa_internal.c:80-115) are applied to the SH frame, and the active
intensity vector of each sector gives a localised DoA + energy
(sldoa_internal.c:142-...).  Everything is one batched einsum + elementwise
math — fully jitted, batched over bands, sectors and time slots.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh
from spatial_audio_framework_tpu.ops.afstft import AfSTFT, AfSTFTState
from spatial_audio_framework_tpu.utils import presets


def order2num_sectors(order: int) -> int:
    """ORDER2NUMSECTORS: t-design of degree 2(N-1)... the reference uses
    (order)² sectors via __Tdesign_nPoints_per_degree[2(order-1)-1]."""
    return max(1, (order) * (order))


@dataclass(frozen=True)
class SldoaConfig:
    master_order: int = 1
    fs: float = 48000.0
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    hop: int = 128

    @property
    def nsh(self) -> int:
        return (self.master_order + 1) ** 2

    @property
    def afstft(self) -> AfSTFT:
        return AfSTFT(hop=self.hop, hybrid=True)


class SldoaWeights(NamedTuple):
    sec_coeffs: jax.Array   # (nSec, 4, nSH) sector WXYZ beams (anaOrder>1)
    conv_in: jax.Array
    sec_dirs_deg: np.ndarray


def design(cfg: SldoaConfig, ana_order: int | None = None) -> SldoaWeights:
    order = ana_order or cfg.master_order
    conv = C.input_conversion_mtx(cfg.master_order, cfg.ch_ordering, cfg.norm)
    if order == 1:
        # first-order: WXYZ directly (no sectors)
        coeffs = np.zeros((1, 4, cfg.nsh), np.float32)
        coeffs[0, :4, :4] = np.eye(4)
        return SldoaWeights(sec_coeffs=jnp.asarray(coeffs),
                            conv_in=jnp.asarray(conv),
                            sec_dirs_deg=np.zeros((1, 2)))
    sec_dirs = presets.tdesign(2 * (order - 1))
    coeffs, _ = sh.compute_sector_coeffs(order - 1, sh.SECTOR_PATTERN_MAXRE,
                                         sec_dirs)
    # reorder sector rows (W, X, Y, Z) → (W, Y, Z, X) so the dipoles line up
    # with the ACN first-order case used by the intensity formula below
    coeffs = coeffs[:, [0, 2, 3, 1], :]
    pad = np.zeros((coeffs.shape[0], 4, cfg.nsh), np.float32)
    pad[:, :, : coeffs.shape[2]] = coeffs
    return SldoaWeights(sec_coeffs=jnp.asarray(pad), conv_in=jnp.asarray(conv),
                        sec_dirs_deg=sec_dirs)


class SldoaState(NamedTuple):
    bank: AfSTFTState


def init_state(cfg: SldoaConfig) -> SldoaState:
    return SldoaState(bank=cfg.afstft.init_state(cfg.nsh, 1))


def analysis(cfg: SldoaConfig, w: SldoaWeights, state: SldoaState,
             x: jax.Array):
    """x: (nSH, T) → ((doa (nBands, nSec, H, 2) rad, energy (nBands, nSec, H)),
    state)."""
    xc = w.conv_in @ x
    spec, bank_st = cfg.afstft.analysis(state.bank, xc)  # (nBands, nSH, H)
    # sector WXYZ signals: (nBands, nSec, 4, H)
    sec = jnp.einsum("cws,bsh->bcwh", w.sec_coeffs.astype(spec.dtype), spec)
    # N3D→SN3D on the dipoles (sldoa_internal.c:182-185)
    scale = jnp.asarray([1.0, 1.0 / np.sqrt(3.0), 1.0 / np.sqrt(3.0),
                         1.0 / np.sqrt(3.0)], spec.real.dtype)
    sec = sec * scale[None, None, :, None]
    energy = 0.5 * jnp.sum(jnp.abs(sec) ** 2, axis=2)  # (nBands, nSec, H)
    inten = jnp.real(jnp.conj(sec[:, :, 0:1, :]) * sec[:, :, 1:, :])
    # ACN dipoles: [Y, Z, X] → azi = atan2(I_y, I_x); elev vs horizontal
    azi = jnp.arctan2(inten[:, :, 0], inten[:, :, 2])
    elev = jnp.arctan2(inten[:, :, 1],
                       jnp.sqrt(inten[:, :, 2] ** 2 + inten[:, :, 0] ** 2))
    doa = jnp.stack([azi, elev], axis=-1)
    return (doa, energy * 1e6), SldoaState(bank=bank_st)
