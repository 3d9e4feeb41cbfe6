"""powermap — SH-domain activity-map analyser (counterpart of
``examples/src/powermap``).

Process: afSTFT analysis → per-band SCM with one-pole temporal averaging
(powermap.c:257-266) → order-truncated covariance grouping with per-band EQ
(powermap.c:275-289: each band contributes its top-left
(orderPerBand+1)²-block, scaled by 1e3·pmapEQ[band]) → activity map at the
max analysis order (PWD / MVDR / CroPaC-LCMV / MUSIC(±log) / MinNorm(±log))
→ map averaging on the analysis grid → VBAP interpolation to the dense
display grid (powermap.c:345-358).

TPU-native: the whole chain runs in split real/imaginary arithmetic
(ops.afstft_ri front-end + ops.herm_ri covariance algebra) — no complex64
ever reaches the device, so the map reads back on runtimes that poison
complex transfers.  Every mode including CroPaC is jittable; the per-band
analysis orders are static config (shape-determining, as in the reference
where changing them triggers a recalc), while the pmapEQ weights are traced
and can stream per call.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh, sh_est, vbap
from spatial_audio_framework_tpu.ops import afstft_ri as ri
from spatial_audio_framework_tpu.ops.afstft import AfSTFT
from spatial_audio_framework_tpu.utils import presets
from spatial_audio_framework_tpu.ops import precision as _prec

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
    # analysis grid: the reference scans the 812-dir icosahedral geosphere
    # (powermap_internal.c:57-59 geosphere_ico_freq = 9); a t-design can be
    # selected instead for cheaper maps
    analysis_grid: str = "geosphere_ico_9"
    grid_tdesign: int = 14              # used when analysis_grid == "tdesign"
    interp_res_deg: int = 5             # display grid resolution
    hop: int = 128
    # Per-band SH analysis order (len n_bands, each clipped to
    # [1, master_order]); None → master_order for every band
    # (powermap_internal.h:124 analysisOrderPerBand).  Static: changing it
    # re-designs/retraces, mirroring the reference's recalcPmap path.
    analysis_order_per_band: Optional[Tuple[int, ...]] = None

    @property
    def nsh(self) -> int:
        return (self.master_order + 1) ** 2

    @property
    def afstft(self) -> AfSTFT:
        return AfSTFT(hop=self.hop, hybrid=True)

    def orders_per_band(self) -> np.ndarray:
        n_bands = self.afstft.n_bands
        if self.analysis_order_per_band is None:
            return np.full(n_bands, self.master_order, int)
        o = np.asarray(self.analysis_order_per_band, int)
        assert o.shape == (n_bands,), (o.shape, n_bands)
        return np.clip(o, 1, self.master_order)

    @property
    def max_analysis_order(self) -> int:
        return int(self.orders_per_band().max())

    def __post_init__(self):
        C.validate_config(self)


class PowermapWeights(NamedTuple):
    Y_grid: jax.Array        # (nSH_max, nGrid) REAL SH steering
    interp_table: jax.Array  # (nInterp, nGrid)
    conv_in: jax.Array       # (nSH, nSH)
    band_mask: jax.Array     # (nBands, nSH_max) order-truncation masks
    grid_dirs_deg: np.ndarray
    interp_dirs_deg: np.ndarray


class PowermapState(NamedTuple):
    bank: ri.AfSTFTStateRI
    Cx_re: jax.Array      # (nBands, nSH, nSH)
    Cx_im: jax.Array
    prev_pmap: jax.Array  # (nGrid,) — averaged on the ANALYSIS grid
                          # before interpolation (powermap.c:345-347)


def design(cfg: PowermapConfig) -> PowermapWeights:
    if cfg.analysis_grid == "geosphere_ico_9":
        grid = presets.geosphere(9, icosahedral=True)
    else:
        grid = presets.tdesign(cfg.grid_tdesign)
    dirs_rad = np.stack([np.radians(grid[:, 0]),
                         np.pi / 2 - np.radians(grid[:, 1])], -1)
    max_order = cfg.max_analysis_order
    # the C scales the scanning-grid SH by 1/nSH (powermap_initAna,
    # powermap_internal.c:63 scaleY).  All maps except CroPaC are invariant
    # to this scale after the [0,1] display normalisation; CroPaC is NOT
    # (its MVDR base map scales as α⁻² while the LCMV cross-spectrum is
    # α-invariant, so the per-direction gain G mixes the two scalings).
    nsh_max = (max_order + 1) ** 2
    Y = sh.get_sh_real(max_order, dirs_rad) * np.sqrt(4.0 * np.pi) / nsh_max
    # display interpolation grid + amplitude-normalised VBAP table
    az = np.arange(-180, 180 + cfg.interp_res_deg, cfg.interp_res_deg)
    el = np.arange(-90, 90 + cfg.interp_res_deg, cfg.interp_res_deg)
    interp_dirs = np.stack(np.meshgrid(az, el), -1).reshape(-1, 2).astype(np.float64)
    g = vbap.generate_vbap_gain_table_3d_srcs(interp_dirs, grid)
    g = vbap.vbap_gain_table_to_interp_table(g)
    # order-truncation masks: band b contributes Cx rows/cols < (order_b+1)²
    orders = cfg.orders_per_band()
    mask = (np.arange(nsh_max)[None, :]
            < ((orders + 1) ** 2)[:, None]).astype(np.float32)
    return PowermapWeights(
        Y_grid=jnp.asarray(Y.astype(np.float32)),
        interp_table=jnp.asarray(g.astype(np.float32)),
        conv_in=jnp.asarray(C.input_conversion_mtx(cfg.master_order,
                                                   cfg.ch_ordering, cfg.norm)),
        band_mask=jnp.asarray(mask),
        grid_dirs_deg=grid, interp_dirs_deg=interp_dirs)


def init_state(cfg: PowermapConfig, w: PowermapWeights) -> PowermapState:
    n_bands = cfg.afstft.n_bands
    return PowermapState(
        bank=ri.init_state_ri(cfg.afstft, cfg.nsh, 1),
        Cx_re=jnp.zeros((n_bands, cfg.nsh, cfg.nsh), jnp.float32),
        Cx_im=jnp.zeros((n_bands, cfg.nsh, cfg.nsh), jnp.float32),
        prev_pmap=jnp.zeros(w.grid_dirs_deg.shape[0], jnp.float32))


def analysis(cfg: PowermapConfig, w: PowermapWeights, state: PowermapState,
             x: jax.Array, pmap_eq: Optional[jax.Array] = None):
    """x: (nSH, T) → (pmap (nInterp,) in [0,1], state).  Fully jittable in
    every mode; complex-free.  pmap_eq: optional per-band map EQ weights
    (nBands,), clipped to [0, 2] (powermap.c:284 pmapEQ)."""
    xc = w.conv_in @ x
    (sre, sim), bank_st = ri.analysis_ri(cfg.afstft, state.bank, xc)
    H = sre.shape[-1]
    hp = _prec.HOT
    # SCM in RI: C = S Sᴴ → re = Sre Sreᵀ + Sim Simᵀ, im = Sim Sreᵀ − Sre Simᵀ
    new_re = (jnp.einsum("bsh,bth->bst", sre, sre, precision=hp)
              + jnp.einsum("bsh,bth->bst", sim, sim, precision=hp)) / H
    new_im = (jnp.einsum("bsh,bth->bst", sim, sre, precision=hp)
              - jnp.einsum("bsh,bth->bst", sre, sim, precision=hp)) / H
    a = cfg.cov_avg_coeff
    Cx_re = a * state.Cx_re + (1.0 - a) * new_re
    Cx_im = a * state.Cx_im + (1.0 - a) * new_im

    # order-truncated grouping with per-band EQ (powermap.c:275-289)
    nsh_max = w.Y_grid.shape[0]
    if pmap_eq is None:
        eq = jnp.ones(cfg.afstft.n_bands, jnp.float32)
    else:
        eq = jnp.clip(pmap_eq, 0.0, 2.0)
    m = w.band_mask * (1e3 * eq)[:, None]          # (nBands, nSH_max)
    Ct_re = Cx_re[:, :nsh_max, :nsh_max]
    Ct_im = Cx_im[:, :nsh_max, :nsh_max]
    C_grp = (jnp.einsum("bi,bj,bij->ij", m, w.band_mask, Ct_re, precision=hp),
             jnp.einsum("bi,bj,bij->ij", m, w.band_mask, Ct_im, precision=hp))

    if cfg.mode == PM_PWD:
        pmap = sh_est.generate_pwd_map_ri(C_grp, w.Y_grid)
    elif cfg.mode == PM_MVDR:
        pmap = sh_est.generate_mvdr_map_ri(C_grp, w.Y_grid, 8.0)
    elif cfg.mode == PM_CROPAC:
        pmap = sh_est.generate_cropac_lcmv_map_ri(C_grp, w.Y_grid, 8.0, 0.0)
    elif cfg.mode in (PM_MUSIC, PM_MUSIC_LOG):
        pmap = sh_est.generate_music_map_ri(C_grp, w.Y_grid, cfg.n_sources,
                                            cfg.mode == PM_MUSIC_LOG)
    elif cfg.mode in (PM_MINNORM, PM_MINNORM_LOG):
        pmap = sh_est.generate_minnorm_map_ri(C_grp, w.Y_grid, cfg.n_sources,
                                              cfg.mode == PM_MINNORM_LOG)
    else:
        raise ValueError(cfg.mode)
    # trace guard: a silent scene yields a zero map (powermap.c:295-343)
    if cfg.mode != PM_PWD:
        tr = jnp.trace(C_grp[0])
        pmap = jnp.where(tr > 1e-8, pmap, jnp.zeros_like(pmap))

    # average over time on the ANALYSIS grid, then interpolate
    pmap = (1.0 - cfg.pmap_avg_coeff) * pmap \
        + cfg.pmap_avg_coeff * state.prev_pmap
    new_state = PowermapState(bank=bank_st, Cx_re=Cx_re, Cx_im=Cx_im,
                              prev_pmap=pmap)
    pmap_i = w.interp_table @ pmap.astype(jnp.float32)
    # normalise to [0, 1] for display (powermap.c:360-365 min/max scaling)
    pmin, pmax = pmap_i.min(), pmap_i.max()
    return (pmap_i - pmin) / jnp.maximum(pmax - pmin, 1e-12), new_state
