"""spreader — coherent/incoherent source spreading over arbitrary IR sets
(counterpart of ``examples/src/spreader``).

Modes (spreader.h SPREADER_MODE_*): 'naive' (coherent sum of the IR-set
responses within the spread area), 'evd' (eigen-decomposition mixing of
decorrelated replicas to hit the target covariance), and 'om' (CDF4SAP
optimal-mixing of the prototype signals + decorrelated residual).

TPU design: the spread-area selection is a traced mask over the IR grid
(angles ≤ spread/2), so source directions/spreads stream per block; target
covariances (Σ h hᴴ over the area), the CDF4SAP solves and the EVD run
batched over all 133 bands at once.  Default IR set: the default HRIRs
(Q = 2, binaural spreading), as in the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.modules import cdf4sap, hrir as hrir_mod
from spatial_audio_framework_tpu.ops.afstft import AfSTFT, AfSTFTState
from spatial_audio_framework_tpu.utils import decor
from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart

MODE_NAIVE = "naive"
MODE_EVD = "evd"
MODE_OM = "om"
MAX_SPREAD_FREQ = 16e3  # spreader_internal.h


@dataclass(frozen=True)
class SpreaderConfig:
    n_sources: int = 1
    fs: float = 48000.0
    mode: str = MODE_OM
    cov_avg_coeff: float = 0.8
    hop: int = 128

    @property
    def afstft(self) -> AfSTFT:
        return AfSTFT(hop=self.hop, hybrid=True)


class SpreaderWeights(NamedTuple):
    H_grid: jax.Array    # (nBands, Q, nGrid) complex IR-set responses
    HHH: jax.Array       # (nBands, nGrid, Q, Q) outer products
    grid_u: jax.Array    # (nGrid, 3)
    freqs: jax.Array
    lattice: dict        # decorrelator design


class SpreaderState(NamedTuple):
    bank: AfSTFTState
    lattice: tuple                 # per-source decorrelator states
    Cproto: jax.Array              # (nSrc, nBands, Q, Q)
    Cy: jax.Array
    prev_M: jax.Array              # (nSrc, nBands, Q, Q) complex
    prev_Mr: jax.Array             # (nSrc, nBands, Q, Q) real


def design(cfg: SpreaderConfig, irs: Optional[np.ndarray] = None,
           ir_dirs_deg: Optional[np.ndarray] = None,
           ir_fs: Optional[int] = None) -> SpreaderWeights:
    if irs is None:
        irs, ir_dirs_deg, ir_fs = hrir_mod.default_hrirs()
    if ir_fs != cfg.fs:
        irs, _ = hrir_mod.resample_hrirs(irs, ir_fs, int(cfg.fs))
    H = hrir_mod.hrirs_to_hrtfs_afstft(irs, cfg.hop)  # (nBands, Q, nGrid)
    HHH = np.einsum("bqg,brg->bgqr", H, H.conj())
    u = np.asarray(unit_sph2cart(np.asarray(ir_dirs_deg, np.float64),
                                 degrees=True), np.float32)
    lat = decor.LatticeDecorrelator(
        fs=cfg.fs, hop_size=cfg.hop, n_ch=irs.shape[1],
        orders=(20, 15, 6, 3), freq_cutoffs=(700.0, 2.4e3, 4e3, 12e3))
    freqs = cfg.afstft.centre_freqs(cfg.fs)
    return SpreaderWeights(H_grid=jnp.asarray(H), HHH=jnp.asarray(HHH),
                           grid_u=jnp.asarray(u), freqs=jnp.asarray(freqs),
                           lattice=lat.design(freqs))


def init_state(cfg: SpreaderConfig, w: SpreaderWeights) -> SpreaderState:
    Q = w.H_grid.shape[1]
    n_bands = cfg.afstft.n_bands
    lat = decor.LatticeDecorrelator(
        fs=cfg.fs, hop_size=cfg.hop, n_ch=Q,
        orders=(20, 15, 6, 3), freq_cutoffs=(700.0, 2.4e3, 4e3, 12e3))
    eye = jnp.broadcast_to(jnp.eye(Q, dtype=jnp.complex64),
                           (cfg.n_sources, n_bands, Q, Q))
    return SpreaderState(
        bank=cfg.afstft.init_state(cfg.n_sources, Q),
        lattice=tuple(lat.init_state(w.lattice, n_bands)
                      for _ in range(cfg.n_sources)),
        Cproto=jnp.zeros((cfg.n_sources, n_bands, Q, Q), jnp.complex64),
        Cy=jnp.zeros((cfg.n_sources, n_bands, Q, Q), jnp.complex64),
        prev_M=eye, prev_Mr=jnp.zeros((cfg.n_sources, n_bands, Q, Q), jnp.float32))


def process(cfg: SpreaderConfig, w: SpreaderWeights, state: SpreaderState,
            x: jax.Array, src_dirs_deg: jax.Array, src_spread_deg: jax.Array):
    """x: (nSrc, T) → ((Q, T), state)."""
    bank = cfg.afstft
    Q = w.H_grid.shape[1]
    spec, bank_st = bank.analysis(state.bank, x)   # (nBands, nSrc, H)
    H_slots = spec.shape[-1]
    lam = cfg.cov_avg_coeff
    lat = decor.LatticeDecorrelator(
        fs=cfg.fs, hop_size=cfg.hop, n_ch=Q,
        orders=(20, 15, 6, 3), freq_cutoffs=(700.0, 2.4e3, 4e3, 12e3))

    out = jnp.zeros((bank.n_bands, Q, H_slots), spec.dtype)
    new_lat, new_Cp, new_Cy, new_M, new_Mr = [], [], [], [], []
    fade_in = jnp.arange(1, H_slots + 1, dtype=jnp.float32) / H_slots
    below = (w.freqs < MAX_SPREAD_FREQ)

    for src in range(cfg.n_sources):
        u_src = jnp.asarray(unit_sph2cart(src_dirs_deg[src], degrees=True))
        cosang = jnp.clip(w.grid_u @ u_src, -1.0, 0.9999999)
        angles = jnp.degrees(jnp.arccos(cosang))
        centre = jnp.argmin(angles)
        in_area = (angles <= src_spread_deg[src] / 2.0)
        n_spread = in_area.sum()
        use_area = (n_spread > 0)
        mask = jnp.where(use_area, in_area.astype(jnp.float32),
                         jax.nn.one_hot(centre, angles.shape[0]))
        mask = jnp.where(below[:, None], mask[None, :],
                         jax.nn.one_hot(centre, angles.shape[0])[None, :])
        n_eff = jnp.maximum(mask.sum(-1), 1.0)  # (nBands,)

        H_sum = jnp.einsum("bqg,bg->bq", w.H_grid, mask.astype(spec.dtype))
        proto = (H_sum / n_eff[:, None].astype(spec.dtype))[:, :, None] \
            * spec[:, src][:, None, :]   # (nBands, Q, H)

        if cfg.mode == MODE_NAIVE:
            out = out + proto
            new_lat.append(state.lattice[src])
            new_Cp.append(state.Cproto[src]); new_Cy.append(state.Cy[src])
            new_M.append(state.prev_M[src]); new_Mr.append(state.prev_Mr[src])
            continue

        if cfg.mode == MODE_EVD:
            proto = jnp.broadcast_to(spec[:, src][:, None, :],
                                     (bank.n_bands, Q, H_slots))
        dec, lat_st = lat.apply(w.lattice, state.lattice[src], proto)
        Cp = lam * state.Cproto[src] + (1 - lam) * jnp.einsum(
            "bqh,brh->bqr", proto, jnp.conj(proto))
        Cy_new = jnp.einsum("bgqr,bg->bqr", w.HHH, mask.astype(spec.dtype))
        if cfg.mode == MODE_OM:
            # impose target energies (spreader.c:#if 1 block)
            tr_y = jnp.einsum("bqq->b", Cy_new).real
            sig_c = jnp.einsum("bq,bh->bqh",
                               jnp.take(w.H_grid, centre, axis=2), spec[:, src])
            tr_e = jnp.einsum("bqh,bqh->b", sig_c, jnp.conj(sig_c)).real
            scale = jnp.where(below, tr_e / (tr_y + 2.23e-9), 1.0)
            Cy_new = Cy_new * scale[:, None, None].astype(Cy_new.dtype)
        Cy = lam * state.Cy[src] + (1 - lam) * Cy_new

        if cfg.mode == MODE_EVD:
            e_y = jnp.einsum("bqq->", Cy).real
            e_p = jnp.einsum("bqq->", Cp).real + 1e-6
            Cy_n = Cy * (e_p / (e_y + 2.23e-9))
            evals, V = jnp.linalg.eigh(Cy_n)
            evals = evals[..., ::-1]
            V = V[..., ::-1]
            M = V * jnp.sqrt(jnp.maximum(evals, 0.0)
                             ).astype(V.dtype)[..., None, :]
            Mr = jnp.zeros_like(state.prev_Mr[src])
            sig_in = dec
        else:  # OM
            eyeQ = jnp.eye(Q, dtype=Cp.dtype)
            Cp_l = Cp + 1e-5 * eyeQ
            M, Cr = cdf4sap.formulate_M_and_Cr(Cp_l, Cy, eyeQ, False, 0.2)
            Cp_diag = (jnp.einsum("bqq->bq", Cp).real)[..., None] * jnp.eye(Q)
            Mr, _ = cdf4sap.formulate_M_and_Cr(Cp_diag, Cr.real,
                                               jnp.eye(Q), False, 0.2)
            M = jnp.where(below[:, None, None], M, eyeQ[None])
            Mr = jnp.where(below[:, None, None], Mr, 0.0)
            sig_in = proto

        # crossfaded mixing-matrix application (spreader.c interpolator)
        M_t = (fade_in[None, :, None, None] * M[:, None]
               + (1 - fade_in)[None, :, None, None] * state.prev_M[src][:, None])
        mixed = jnp.einsum("bhqr,brh->bqh", M_t, sig_in)
        if cfg.mode == MODE_OM:
            Mr_t = (fade_in[None, :, None, None] * Mr[:, None]
                    + (1 - fade_in)[None, :, None, None]
                    * state.prev_Mr[src][:, None])
            mixed = mixed + jnp.einsum("bhqr,brh->bqh",
                                       Mr_t.astype(dec.dtype), dec)
        out = out + mixed
        new_lat.append(lat_st)
        new_Cp.append(Cp); new_Cy.append(Cy)
        new_M.append(M); new_Mr.append(Mr.real if cfg.mode == MODE_OM else Mr)

    y, bank_st = bank.synthesis(bank_st, out)
    new_state = SpreaderState(
        bank=bank_st, lattice=tuple(new_lat),
        Cproto=jnp.stack(new_Cp), Cy=jnp.stack(new_Cy),
        prev_M=jnp.stack(new_M), prev_Mr=jnp.stack(new_Mr))
    return y, new_state
