"""dirass — direction re-assigned activity maps (counterpart of
``examples/src/dirass``; Politis & McCormack re-assignment).

Three modes (dirass.h REASS_*):

* ``off``     — classic steered-beamformer energy map.
* ``upscale`` — per-grid-sector DoA via spatially-localised intensity, then
  re-encode the sector signals at a higher order at the estimated DoAs and
  beamform again (dirass.c:339-366).
* ``nearest`` — assign each sector's energy to the display grid point nearest
  its DoA estimate (dirass.c:372-...).

Time-domain (broadband) analysis with a band-pass pre-filter; all grid
beamforming is batched matmuls; the intensity + reassignment is elementwise —
fully jitted (the 'nearest' scatter uses a traced argmin + scatter-add).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh, vbap
from spatial_audio_framework_tpu.ops.iir import iir_filter
from spatial_audio_framework_tpu.utils import filters as F
from spatial_audio_framework_tpu.utils import presets
from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart

REASS_OFF = "off"
REASS_UPSCALE = "upscale"
REASS_NEAREST = "nearest"


@dataclass(frozen=True)
class DirassConfig:
    input_order: int = 1
    upscale_order: int = 10
    mode: str = REASS_UPSCALE        # dirass.c:52
    beam_type: str = "maxre"         # grid beamformer pattern
    grid_tdesign: int = 14
    interp_res_deg: int = 5
    min_freq_hz: float = 100.0
    max_freq_hz: float = 8000.0
    pmap_avg_coeff: float = 0.25
    fs: float = 48000.0
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D

    @property
    def nsh(self) -> int:
        return (self.input_order + 1) ** 2

    def __post_init__(self):
        C.validate_config(self)


class DirassWeights(NamedTuple):
    W_beam: jax.Array     # (nGrid, nSH) analysis-order beams
    Cw: jax.Array         # (nGrid, nSH) sector (W) beams, order N-1 padded
    Cxyz: jax.Array       # (nGrid, 3, nSH) velocity beams
    Uw: jax.Array         # (nGrid, up_nSH) upscale-order beams
    interp_table: jax.Array
    conv_in: jax.Array
    grid_dirs_deg: np.ndarray
    interp_dirs_deg: np.ndarray
    interp_u: jax.Array   # (nInterp, 3) unit vectors for 'nearest'


def _steered_beams(order: int, pattern: str, dirs_deg: np.ndarray) -> np.ndarray:
    b_n = {"cardioid": sh.beam_weights_cardioid,
           "hypercardioid": sh.beam_weights_hypercardioid,
           "maxre": sh.beam_weights_max_ev}[pattern](order)
    out = np.zeros((dirs_deg.shape[0], (order + 1) ** 2), np.float32)
    for i, (a, e) in enumerate(dirs_deg):
        out[i] = sh.rotate_axis_coeffs_real(order, b_n,
                                            np.pi / 2 - np.radians(e),
                                            np.radians(a))
    return out


def design(cfg: DirassConfig) -> DirassWeights:
    grid = presets.tdesign(cfg.grid_tdesign)
    N = cfg.input_order
    W_beam = _steered_beams(N, cfg.beam_type, grid)
    if N >= 2:
        sec, _ = sh.compute_sector_coeffs(N - 1, sh.SECTOR_PATTERN_MAXRE, grid)
        Cw = np.zeros((grid.shape[0], cfg.nsh), np.float32)
        Cw[:, : N * N] = sec[:, 0, : N * N]
        Cxyz = sec[:, 1:, :]  # (nGrid, 3 [x,y,z], (N+1)²)
    else:
        # first order: W sector ≡ omni, velocity beams ≡ dipoles (ACN X,Y,Z)
        Cw = np.zeros((grid.shape[0], cfg.nsh), np.float32)
        Cw[:, 0] = 1.0
        Cxyz = np.zeros((grid.shape[0], 3, cfg.nsh), np.float32)
        Cxyz[:, 0, 3] = Cxyz[:, 1, 1] = Cxyz[:, 2, 2] = 1.0 / np.sqrt(3.0)
    Uw = _steered_beams(cfg.upscale_order, cfg.beam_type, grid)
    az = np.arange(-180, 180 + cfg.interp_res_deg, cfg.interp_res_deg)
    el = np.arange(-90, 90 + cfg.interp_res_deg, cfg.interp_res_deg)
    interp_dirs = np.stack(np.meshgrid(az, el), -1).reshape(-1, 2).astype(np.float64)
    g = vbap.vbap_gain_table_to_interp_table(
        vbap.generate_vbap_gain_table_3d_srcs(interp_dirs, grid))
    return DirassWeights(
        W_beam=jnp.asarray(W_beam), Cw=jnp.asarray(Cw),
        Cxyz=jnp.asarray(Cxyz), Uw=jnp.asarray(Uw),
        interp_table=jnp.asarray(g),
        conv_in=jnp.asarray(C.input_conversion_mtx(N, cfg.ch_ordering, cfg.norm)),
        grid_dirs_deg=grid, interp_dirs_deg=interp_dirs,
        interp_u=jnp.asarray(np.asarray(
            unit_sph2cart(interp_dirs, degrees=True), np.float32)))


class DirassState(NamedTuple):
    hpf_z: jax.Array           # (nSH, 2) biquad states
    lpf_z: jax.Array
    prev_energy: jax.Array     # (nGrid,)
    prev_intensity: jax.Array  # (nGrid, 3)


def init_state(cfg: DirassConfig, w: DirassWeights) -> DirassState:
    n_grid = w.W_beam.shape[0]
    return DirassState(hpf_z=jnp.zeros((cfg.nsh, 2), jnp.float32),
                       lpf_z=jnp.zeros((cfg.nsh, 2), jnp.float32),
                       prev_energy=jnp.zeros(n_grid, jnp.float32),
                       prev_intensity=jnp.zeros((n_grid, 3), jnp.float32))


def analysis(cfg: DirassConfig, w: DirassWeights, state: DirassState,
             x: jax.Array):
    """x: (nSH, T) → (pmap (nInterp,) normalised 0..1, state)."""
    xc = w.conv_in @ x
    b_h, a_h = F.biquad_coeffs(F.BIQUAD_FILTER_HPF, cfg.min_freq_hz, cfg.fs, 0.7071)
    b_l, a_l = F.biquad_coeffs(F.BIQUAD_FILTER_LPF, cfg.max_freq_hz, cfg.fs, 0.7071)
    xc, hpf_z = iir_filter(b_h, a_h, xc, zi=state.hpf_z)
    xc, lpf_z = iir_filter(b_l, a_l, xc, zi=state.lpf_z)
    T = xc.shape[-1]
    lam = cfg.pmap_avg_coeff

    ss = w.W_beam @ xc if cfg.mode == REASS_OFF else w.Cw @ xc  # (nGrid, T)
    if cfg.mode == REASS_OFF:
        e = (ss ** 2).sum(-1)
        e = lam * state.prev_energy + (1.0 - lam) * e
        pmap = w.interp_table @ e
        new_state = state._replace(hpf_z=hpf_z, lpf_z=lpf_z, prev_energy=e)
    else:
        ssxyz = jnp.einsum("gds,st->gdt", w.Cxyz, xc)  # (nGrid, 3, T)
        inten = (ssxyz * ss[:, None, :]).mean(-1)  # (nGrid, 3 [x,y,z])
        inten = lam * state.prev_intensity + (1.0 - lam) * inten
        azi = jnp.arctan2(inten[:, 1], inten[:, 0])
        elev = jnp.arctan2(inten[:, 2],
                           jnp.sqrt(inten[:, 0] ** 2 + inten[:, 1] ** 2))
        if cfg.mode == REASS_UPSCALE:
            dirs_rad = jnp.stack([azi, jnp.pi / 2 - elev], -1)
            Y_up = sh.get_sh_real(cfg.upscale_order, dirs_rad) \
                * np.sqrt(4.0 * np.pi)  # (up_nSH, nGrid)
            sh_up = Y_up.astype(ss.dtype) @ ss  # (up_nSH, T)
            ss_up = w.Uw @ sh_up
            e = (ss_up ** 2).sum(-1)
            e = lam * state.prev_energy + (1.0 - lam) * e
            pmap = w.interp_table @ e
        else:  # REASS_NEAREST
            u_est = jnp.stack([jnp.cos(elev) * jnp.cos(azi),
                               jnp.cos(elev) * jnp.sin(azi),
                               jnp.sin(elev)], -1)  # (nGrid, 3)
            nearest = jnp.argmax(u_est @ w.interp_u.T, axis=-1)  # (nGrid,)
            # upstream quirk (C_PARITY #11): dirass.c:378-379 ASSIGNS
            # pmap[i] = ss[i,j]^2 inside the sample loop (OFF/UPSCALE use
            # +=), so NEAREST carries only the LAST sample's energy per
            # sector, not the frame sum.  Mirrored for parity.
            e = ss[:, -1] ** 2
            e = lam * state.prev_energy + (1.0 - lam) * e
            pmap = jnp.zeros(w.interp_table.shape[0], e.dtype).at[nearest].add(e)
        new_state = DirassState(hpf_z=hpf_z, lpf_z=lpf_z, prev_energy=e,
                                prev_intensity=inten)
    pmin, pmax = pmap.min(), pmap.max()
    return (pmap - pmin) / (pmax - pmin + 1e-11), new_state
