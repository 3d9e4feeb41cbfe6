"""sldoa — spatially-localised active-intensity DoA analyser (counterpart of
``examples/src/sldoa``; McCormack et al. 2019, JAES 67(11)).

Full reference machinery:

* **Per-order sector design** (sldoa_internal.c:62-122): for every analysis
  order o in 2..masterOrder, o² sector directions come from the minimal
  sphere-covering presets; VBAP gain patterns over a dense icosphere fit
  grid (the reference's precomputed 2562-point ``sldoa_database.c`` grid is
  regenerated here from our geosphere + SH basis) are multiplied with the
  omni + normalised-dipole basis rows and least-squares-fitted (pinv of the
  grid SH matrix) to give each sector's WXYZ beamforming coefficients.
* **Per-band analysis order** (sldoa_internal.h:124): each band analyses at
  MIN(analysisOrderPerBand[band], masterOrder); order-1 bands use WXYZ
  directly.  All bands' coefficients are baked into ONE (nBands, maxSec, 4,
  nSH) tensor at design time so the whole frame is a single einsum.
* **Estimation** (sldoa_internal.c:144-209): sector signals → N3D→SN3D
  dipole scaling → energy + active intensity → per-slot azi/elev.
* **Averaging + display** (sldoa.c:263-336): DoAs one-pole-averaged in
  Cartesian sequentially across time slots, energies one-pole-averaged;
  per-band azi/elev/colour/alpha display vectors with [minFreq, maxFreq]
  gating and per-band energy normalisation.

TPU-native: split real/imaginary front-end (ops.afstft_ri) + real einsums —
no complex64 anywhere, the sector coefficients are real by construction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.models import _common as C
from spatial_audio_framework_tpu.modules import sh, vbap
from spatial_audio_framework_tpu.ops import afstft_ri as ri
from spatial_audio_framework_tpu.ops.afstft import AfSTFT
from spatial_audio_framework_tpu.utils import presets
from spatial_audio_framework_tpu.ops import precision as _prec


def order2num_sectors(order: int) -> int:
    """ORDER2NUMSECTORS(order) = order² (sldoa_internal.h)."""
    return max(1, order * order)


@dataclass(frozen=True)
class SldoaConfig:
    master_order: int = 1
    fs: float = 48000.0
    ch_ordering: str = C.CH_ACN
    norm: str = C.NORM_SN3D
    hop: int = 128
    # Per-band analysis order, clipped to [1, master_order]; None → master
    # everywhere (sldoa.c:62).  Static (shape-determining).
    analysis_order_per_band: Optional[Tuple[int, ...]] = None
    min_freq: float = 500.0   # sldoa.c:65
    max_freq: float = 5e3     # sldoa.c:66
    avg_ms: float = 500.0     # sldoa.c:67
    fit_grid_level: int = 16  # icosphere freq → 2562 dirs (sldoa_database.h)

    @property
    def nsh(self) -> int:
        return (self.master_order + 1) ** 2

    @property
    def max_sectors(self) -> int:
        return order2num_sectors(self.master_order)

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
    def avg_coeff(self) -> float:
        """sldoa.c:271-272 one-pole coefficient from avg_ms."""
        if self.avg_ms < 10.0:
            return 0.99999
        a = 1.0 / ((self.avg_ms / 1e3) / (1.0 / self.hop) + 2.23e-9)
        return float(np.clip(a, 0.0, 0.99999))

    def __post_init__(self):
        C.validate_config(self)


def _sector_coeffs_vbap(order: int, nsh_master: int,
                        grid_dirs_deg: np.ndarray, Y_grid: np.ndarray,
                        dipoles_norm: np.ndarray) -> tuple:
    """One order's sector coefficients (sldoa_internal.c:73-117):
    VBAP-interp gains of the sphere-covering sector layout over the fit
    grid, imposed on [omni, normalised dipoles], LS-fitted via pinv(Y)."""
    n_sec = order2num_sectors(order)
    nsh_o = (order + 1) ** 2
    sec_dirs = presets.sphere_covering(n_sec)
    g = vbap.generate_vbap_gain_table_3d_srcs(grid_dirs_deg, sec_dirs)
    g = vbap.vbap_gain_table_to_interp_table(g)          # (nGrid, nSec)
    basis = np.concatenate([Y_grid[0:1], dipoles_norm], 0)  # (4, nGrid)
    pinv_Y = np.linalg.pinv(Y_grid[:nsh_o])              # (nGrid, nSH_o)
    # secPatterns[n] = vbap_col_n * basis → w = patterns @ pinv_Y
    pat = g.T[:, None, :] * basis[None, :, :]            # (nSec, 4, nGrid)
    w = pat @ pinv_Y                                     # (nSec, 4, nSH_o)
    out = np.zeros((n_sec, 4, nsh_master), np.float32)
    out[:, :, :nsh_o] = w
    return out, sec_dirs


class SldoaWeights(NamedTuple):
    sec_coeffs: jax.Array   # (nBands, maxSec, 4, nSH) per-band WXYZ beams
    sec_mask: jax.Array     # (nBands, maxSec) valid-sector mask
    band_in_range: jax.Array  # (nBands,) [minFreq, maxFreq] gate, DC off
    colour_scale: jax.Array   # (nBands,) static display colours
    conv_in: jax.Array
    sec_dirs_deg: dict      # order → (nSec, 2) sector directions
    orders_per_band: np.ndarray


def design(cfg: SldoaConfig) -> SldoaWeights:
    conv = C.input_conversion_mtx(cfg.master_order, cfg.ch_ordering, cfg.norm)
    orders = cfg.orders_per_band()
    n_bands = cfg.afstft.n_bands
    max_sec = cfg.max_sectors

    # fit grid (regenerates the sldoa_database tables)
    grid = presets.geosphere(cfg.fit_grid_level)         # (~2562, 2) deg
    dirs_rad = np.stack([np.radians(grid[:, 0]),
                         np.pi / 2 - np.radians(grid[:, 1])], -1)
    Y_grid = sh.get_sh_real(cfg.master_order, dirs_rad) * np.sqrt(4 * np.pi)
    dipoles_norm = Y_grid[1:4] / np.sqrt(3.0)            # sldoa.c:88

    # per-order coefficient tables (orders ≥ 2)
    per_order, sec_dirs_deg = {}, {}
    for o in sorted(set(orders[orders >= 2].tolist())):
        per_order[o], sec_dirs_deg[o] = _sector_coeffs_vbap(
            o, cfg.nsh, grid, Y_grid, dipoles_norm)
    # order-1 "sector": WXYZ passthrough, ACN rows (W, Y, Z, X) reordered to
    # the estimator's (W, X', Y', Z') slots as in the first-order branch
    o1 = np.zeros((1, 4, cfg.nsh), np.float32)
    o1[0, :4, :4] = np.eye(4)
    sec_dirs_deg[1] = np.zeros((1, 2))

    coeffs = np.zeros((n_bands, max_sec, 4, cfg.nsh), np.float32)
    mask = np.zeros((n_bands, max_sec), np.float32)
    for b, o in enumerate(orders):
        cb = per_order[o] if o >= 2 else o1
        coeffs[b, :cb.shape[0]] = cb
        mask[b, :cb.shape[0]] = 1.0

    freqs = cfg.afstft.centre_freqs(cfg.fs)
    in_range = ((freqs >= cfg.min_freq) & (freqs <= cfg.max_freq))
    in_range[0] = False  # ignore DC (sldoa.c:266)
    min_band = int(np.max(np.nonzero(freqs <= cfg.min_freq)[0], initial=0))
    n_ana = max(int(in_range.sum()), 1)
    colour = np.where(in_range,
                      (np.arange(n_bands) - min_band) / (n_ana + 1.0),
                      0.0).astype(np.float32)

    return SldoaWeights(
        sec_coeffs=jnp.asarray(coeffs), sec_mask=jnp.asarray(mask),
        band_in_range=jnp.asarray(in_range.astype(np.float32)),
        colour_scale=jnp.asarray(colour), conv_in=jnp.asarray(conv),
        sec_dirs_deg=sec_dirs_deg, orders_per_band=orders)


class SldoaState(NamedTuple):
    bank: ri.AfSTFTStateRI
    doa_xyz: jax.Array   # (nBands, maxSec, 3) averaged DoA unit vectors
    energy: jax.Array    # (nBands, maxSec) averaged sector energies


class SldoaOutput(NamedTuple):
    doa_rad: jax.Array       # (nBands, maxSec, H, 2) raw per-slot estimates
    energy: jax.Array        # (nBands, maxSec, H) raw per-slot energies ×1e6
    azi_deg: jax.Array       # (nBands, maxSec) averaged display azimuths
    elev_deg: jax.Array      # (nBands, maxSec)
    colour_scale: jax.Array  # (nBands, maxSec)
    alpha_scale: jax.Array   # (nBands, maxSec)


def init_state(cfg: SldoaConfig) -> SldoaState:
    n_bands = cfg.afstft.n_bands
    init_xyz = jnp.zeros((n_bands, cfg.max_sectors, 3), jnp.float32)
    init_xyz = init_xyz.at[..., 0].set(1.0)  # arbitrary unit vectors
    return SldoaState(bank=ri.init_state_ri(cfg.afstft, cfg.nsh, 1),
                      doa_xyz=init_xyz,
                      energy=jnp.zeros((n_bands, cfg.max_sectors),
                                       jnp.float32))


def analysis(cfg: SldoaConfig, w: SldoaWeights, state: SldoaState,
             x: jax.Array):
    """x: (nSH, T) → (SldoaOutput, state).  Fully jittable, complex-free."""
    xc = w.conv_in @ x
    (sre, sim), bank_st = ri.analysis_ri(cfg.afstft, state.bank, xc)
    hp = _prec.HOT
    # sector WXYZ signals (RI): real coefficients → two real einsums
    ws_re = jnp.einsum("bcws,bsh->bcwh", w.sec_coeffs, sre, precision=hp)
    ws_im = jnp.einsum("bcws,bsh->bcwh", w.sec_coeffs, sim, precision=hp)
    # N3D→SN3D on the dipoles (sldoa_internal.c:182-185)
    scale = jnp.asarray([1.0] + [1.0 / np.sqrt(3.0)] * 3, jnp.float32)
    ws_re = ws_re * scale[None, None, :, None]
    ws_im = ws_im * scale[None, None, :, None]
    energy = 0.5 * jnp.sum(ws_re ** 2 + ws_im ** 2, axis=2)  # (B, S, H)
    # active intensity: Re(conj(W) · dipole); dipole slots are the ACN rows
    # (Y, Z, X) so azi = atan2(I_y, I_x), elev vs the horizontal plane
    # (sldoa_internal.c:196-199)
    inten = (ws_re[:, :, 0:1] * ws_re[:, :, 1:]
             + ws_im[:, :, 0:1] * ws_im[:, :, 1:])            # (B, S, 3, H)
    azi = jnp.arctan2(inten[:, :, 0], inten[:, :, 2])
    elev = jnp.arctan2(inten[:, :, 1],
                       jnp.sqrt(inten[:, :, 2] ** 2 + inten[:, :, 0] ** 2))
    doa = jnp.stack([azi, elev], axis=-1)                     # (B, S, H, 2)

    # one-pole averaging, sequential across slots (sldoa.c:279-292)
    a = cfg.avg_coeff
    new_xyz = jnp.stack([jnp.cos(elev) * jnp.cos(azi),
                         jnp.cos(elev) * jnp.sin(azi),
                         jnp.sin(elev)], axis=-1)             # (B, S, H, 3)
    gate = (w.band_in_range[:, None] * w.sec_mask)[..., None]  # (B, S, 1)

    def slot_step(carry, slot):
        xyz, en = carry
        xyz_n, en_n = slot
        upd = xyz_n * a + xyz * (1.0 - a)
        upd = upd / jnp.maximum(jnp.linalg.norm(upd, axis=-1, keepdims=True),
                                1e-12)
        xyz = jnp.where(gate > 0, upd, xyz)
        en = jnp.where(gate[..., 0] > 0, en_n * a + en * (1.0 - a), en)
        return (xyz, en), None

    slots = (jnp.moveaxis(new_xyz, 2, 0), jnp.moveaxis(energy * 1e6, 2, 0))
    (avg_xyz, avg_en), _ = jax.lax.scan(slot_step,
                                        (state.doa_xyz, state.energy), slots)

    # display vectors (sldoa.c:297-336)
    azi_avg = jnp.degrees(jnp.arctan2(avg_xyz[..., 1], avg_xyz[..., 0]))
    elev_avg = jnp.degrees(jnp.arctan2(
        avg_xyz[..., 2], jnp.sqrt(avg_xyz[..., 0] ** 2 + avg_xyz[..., 1] ** 2)))
    g2 = gate[..., 0]
    big = jnp.float32(2.3e13)
    en_valid = jnp.where(w.sec_mask > 0, avg_en, -big)
    max_en = en_valid.max(axis=1, keepdims=True)
    en_valid_min = jnp.where(w.sec_mask > 0, avg_en, big)
    min_en = en_valid_min.min(axis=1, keepdims=True)
    alpha = jnp.clip((avg_en - min_en) / (max_en - min_en + 2.3e-10),
                     0.05, 1.0)
    first_order = (jnp.asarray((w.orders_per_band == 1)
                               .astype(np.float32))[:, None])
    alpha = jnp.where(first_order > 0, 1.0, alpha)
    out = SldoaOutput(
        doa_rad=doa, energy=energy * 1e6,
        azi_deg=azi_avg * g2, elev_deg=elev_avg * g2,
        colour_scale=w.colour_scale[:, None] * w.sec_mask,
        alpha_scale=alpha * g2)
    return out, SldoaState(bank=bank_st, doa_xyz=avg_xyz, energy=avg_en)
