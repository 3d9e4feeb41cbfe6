"""powermap — SH-domain activity-map analyser (counterpart of
``examples/src/powermap``).

Process: afSTFT analysis → per-band SCM with one-pole temporal averaging
(powermap.c:265-266) → ERB-grouped covariance with per-band EQ → activity map
(PWD / MVDR / CroPaC-LCMV / MUSIC(±log) / MinNorm(±log)) → map averaging →
VBAP interpolation to a dense display grid (powermap.c:349-358).

The SCM update runs jitted on device; map generation is a batched einsum /
eigh (device for PWD/MVDR/MUSIC/MinNorm, host for CroPaC).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh, sh_est, vbap
from spatial_audio_framework_tpu.ops.afstft import AfSTFT, AfSTFTState
from spatial_audio_framework_tpu.utils import misc, presets

PM_PWD = "pwd"
PM_MVDR = "mvdr"
PM_CROPAC = "cropac_lcmv"
PM_MUSIC = "music"
PM_MUSIC_LOG = "music_log"
PM_MINNORM = "minnorm"
PM_MINNORM_LOG = "minnorm_log"


@dataclass(frozen=True)
class PowermapConfig:
    master_order: int = 1
    fs: float = 48000.0
    mode: str = PM_PWD
    n_sources: int = 1
    cov_avg_coeff: float = 0.5
    pmap_avg_coeff: float = 0.666       # powermap.c:51
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    grid_tdesign: int = 14              # analysis grid
    interp_res_deg: int = 5             # display grid resolution
    hop: int = 128

    @property
    def nsh(self) -> int:
        return (self.master_order + 1) ** 2

    @property
    def afstft(self) -> AfSTFT:
        return AfSTFT(hop=self.hop, hybrid=True)


class PowermapWeights(NamedTuple):
    Y_grid: jax.Array       # (nSH, nGrid) complex
    interp_table: jax.Array  # (nInterp, nGrid)
    conv_in: jax.Array      # (nSH, nSH)
    grid_dirs_deg: np.ndarray
    interp_dirs_deg: np.ndarray
    erb_idx: np.ndarray


class PowermapState(NamedTuple):
    bank: AfSTFTState
    Cx: jax.Array         # (nBands, nSH, nSH) complex
    prev_pmap: jax.Array  # (nInterp,)


def design(cfg: PowermapConfig) -> PowermapWeights:
    grid = presets.tdesign(cfg.grid_tdesign)
    dirs_rad = np.stack([np.radians(grid[:, 0]),
                         np.pi / 2 - np.radians(grid[:, 1])], -1)
    Y = sh.get_sh_real(cfg.master_order, dirs_rad) * np.sqrt(4.0 * np.pi)
    # display interpolation grid + amplitude-normalised VBAP table
    az = np.arange(-180, 180 + cfg.interp_res_deg, cfg.interp_res_deg)
    el = np.arange(-90, 90 + cfg.interp_res_deg, cfg.interp_res_deg)
    interp_dirs = np.stack(np.meshgrid(az, el), -1).reshape(-1, 2).astype(np.float64)
    g = vbap.generate_vbap_gain_table_3d_srcs(interp_dirs, grid)
    g = vbap.vbap_gain_table_to_interp_table(g)
    freqs = cfg.afstft.centre_freqs(cfg.fs)
    erb_idx, _ = misc.find_erb_partitions(freqs)
    return PowermapWeights(
        Y_grid=jnp.asarray(Y.astype(np.complex64)),
        interp_table=jnp.asarray(g),
        conv_in=jnp.asarray(C.input_conversion_mtx(cfg.master_order,
                                                   cfg.ch_ordering, cfg.norm)),
        grid_dirs_deg=grid, interp_dirs_deg=interp_dirs, erb_idx=erb_idx)


def init_state(cfg: PowermapConfig, w: PowermapWeights) -> PowermapState:
    n_bands = cfg.afstft.n_bands
    return PowermapState(
        bank=cfg.afstft.init_state(cfg.nsh, 1),
        Cx=jnp.zeros((n_bands, cfg.nsh, cfg.nsh), jnp.complex64),
        prev_pmap=jnp.zeros(w.interp_table.shape[0], jnp.float32))


def analysis(cfg: PowermapConfig, w: PowermapWeights, state: PowermapState,
             x: jax.Array):
    """x: (nSH, T) → (pmap (nInterp,) in [0,1], state).  Jittable except the
    CroPaC mode (host loop)."""
    xc = w.conv_in @ x
    spec, bank_st = cfg.afstft.analysis(state.bank, xc)  # (nBands, nSH, H)
    H = spec.shape[-1]
    new_Cx = jnp.einsum("bsh,bth->bst", spec, jnp.conj(spec)) / H
    Cx = cfg.cov_avg_coeff * state.Cx + (1.0 - cfg.cov_avg_coeff) * new_Cx
    # group bands (ERB partitions, equal weighting as powermap pmapEQ=1)
    groups = []
    eidx = list(w.erb_idx) + [Cx.shape[0]]
    for i in range(len(eidx) - 1):
        groups.append(Cx[eidx[i]:eidx[i + 1]].sum(0) * 1e3)
    C_grp = sum(groups)  # broadband map (the example sums across groups too)
    if cfg.mode == PM_PWD:
        pmap = sh_est.generate_pwd_map(C_grp, w.Y_grid)
    elif cfg.mode == PM_MVDR:
        pmap = sh_est.generate_mvdr_map(C_grp, w.Y_grid, 8.0)
    elif cfg.mode == PM_CROPAC:
        pmap = jnp.asarray(sh_est.generate_cropac_lcmv_map(
            np.asarray(C_grp), np.asarray(w.Y_grid), 8.0, 0.0))
    elif cfg.mode in (PM_MUSIC, PM_MUSIC_LOG):
        pmap = sh_est.generate_music_map(C_grp, w.Y_grid, cfg.n_sources,
                                         cfg.mode == PM_MUSIC_LOG)
    elif cfg.mode in (PM_MINNORM, PM_MINNORM_LOG):
        pmap = sh_est.generate_minnorm_map(C_grp, w.Y_grid, cfg.n_sources,
                                           cfg.mode == PM_MINNORM_LOG)
    else:
        raise ValueError(cfg.mode)
    pmap_i = w.interp_table @ pmap.astype(jnp.float32)
    pmap_i = (1.0 - cfg.pmap_avg_coeff) * pmap_i + cfg.pmap_avg_coeff * state.prev_pmap
    new_state = PowermapState(bank=bank_st, Cx=Cx, prev_pmap=pmap_i)
    # normalise to [0, 1] for display (powermap_getPmap)
    pmin, pmax = pmap_i.min(), pmap_i.max()
    return (pmap_i - pmin) / jnp.maximum(pmax - pmin, 1e-12), new_state
