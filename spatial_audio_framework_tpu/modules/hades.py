"""HADES — parametric binaural renderer for hearing-assistive devices
(counterpart of ``saf_hades``: saf_hades_analysis.h / saf_hades_synthesis.h).

* Analysis (``HadesAnalysis``): afSTFT → per-band SCM with temporal averaging
  → diffuse whitening (from the array's theoretical diffuse covariance) →
  eigen-decomposition → COMEDIE diffuseness + sdMUSIC DoA over whitened
  array steering vectors (saf_hades_analysis.c:244-357).
* Synthesis (``HadesSynthesis``): per band, direct stream via filter-and-sum
  or binaural-MVDR beamformers expressed as relative transfer functions
  w.r.t. reference sensors + HRTF re-mapping, diffuse stream via reference
  sensors × diffuse EQ; stream-balance/EQ biasing; optional covariance
  matching via CDF4SAP (saf_hades_synthesis.c:308-470).

All per-band ops are batched device-friendly math; the parameter containers
mirror hades_param_container / hades_signal_container.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np

from spatial_audio_framework_tpu.modules import cdf4sap, hrir as hrir_mod
from spatial_audio_framework_tpu.ops.afstft import AfSTFT
from spatial_audio_framework_tpu.utils import geometry as geo

HADES_USE_COMEDIE = "comedie"
HADES_USE_MUSIC = "music"
HADES_BEAMFORMER_NONE = "none"
HADES_BEAMFORMER_FILTER_AND_SUM = "filter_and_sum"
HADES_BEAMFORMER_BMVDR = "bmvdr"


def comedie(evals: np.ndarray) -> float:
    """COMEDIE diffuseness from eigenvalues (saf_hades_internal.c:242)."""
    lam = np.asarray(evals, np.float64)
    N = lam.shape[-1]
    nord = np.sqrt(N) - 1.0
    s = lam.sum()
    if s < 1e-4:
        return 1.0
    g0 = 2.0 * ((nord + 1.0) ** 2 - 1.0)
    mean_ev = s / (nord + 1.0) ** 2
    g = np.abs(lam - mean_ev).sum() / mean_ev
    return float(max(1.0 - g / g0, 0.0))


@dataclass
class HadesParams:
    """hades_param_container (saf_hades_analysis.h:221-253)."""
    diffuseness: np.ndarray   # (nBands,)
    doa_idx: np.ndarray       # (nBands,) int
    gains_idx: np.ndarray
    gains_dir: np.ndarray
    gains_diff: np.ndarray


@dataclass
class HadesSignals:
    """hades_signal_container."""
    inTF: np.ndarray   # (nBands, nMics, timeSlots) complex
    Cx: np.ndarray     # (nBands, nMics, nMics) instantaneous SCMs


class HadesAnalysis:
    def __init__(self, fs: float = 48000.0, hop: int = 128,
                 h_array: Optional[np.ndarray] = None,
                 grid_dirs_deg: Optional[np.ndarray] = None,
                 diff_opt: str = HADES_USE_COMEDIE,
                 doa_opt: str = HADES_USE_MUSIC):
        """h_array: (nGrid, nMics, h_len) measured array IRs; defaults to the
        default HRIR set (binaural 2-mic array)."""
        if h_array is None:
            h_array, grid_dirs_deg, h_fs = hrir_mod.default_hrirs()
            h_array = h_array[::4]
            grid_dirs_deg = grid_dirs_deg[::4]
            del h_fs
        self.fs, self.hop = fs, hop
        self.bank = AfSTFT(hop=hop, hybrid=True)
        self.n_mics = h_array.shape[1]
        self.n_grid = h_array.shape[0]
        self.grid_dirs_deg = np.asarray(grid_dirs_deg)
        # scale so the loudest tap is 1 (hades_analysis_create)
        h_array = np.asarray(h_array, np.float32)
        h_array = h_array / np.abs(h_array).max()
        self.freq_vector = self.bank.centre_freqs(fs)
        self.n_bands = self.bank.n_bands
        self.H_array = hrir_mod.hrirs_to_hrtfs_afstft(h_array, hop)  # (nB, nM, nG)
        w = geo.get_voronoi_weights(self.grid_dirs_deg)
        w = w / w.sum() * self.n_grid  # relative weights (reference: areas)
        # diffuse covariance + whitening matrices (hades_analysis_create)
        self.DCM = np.einsum("bmg,g,bng->bmn", self.H_array, w / self.n_grid,
                             self.H_array.conj())
        T = np.zeros_like(self.DCM)
        for b in range(self.n_bands):
            e, U = np.linalg.eigh(self.DCM[b])
            e = e[::-1]
            U = U[:, ::-1]
            T[b] = np.diag(np.sqrt(1.0 / (e.real + 2.23e-10))) @ U.conj().T
        self.T = T
        self.H_array_w = np.einsum("bmn,bng->bmg", T, self.H_array)
        self.cov_avg_coeff = min(1.0 - 1.0 / (4096.0 / (8 * hop)), 0.99999)
        self.diff_opt, self.doa_opt = diff_opt, doa_opt
        self.Cx_avg = np.zeros((self.n_bands, self.n_mics, self.n_mics),
                               np.complex64)
        self.bank_state = self.bank.init_state(self.n_mics, 2)

    @property
    def proc_delay(self) -> int:
        return self.bank.proc_delay

    def apply(self, x: np.ndarray):
        """x: (nMics, T) → (HadesParams, HadesSignals)."""
        import jax
        import jax.numpy as jnp

        spec, self.bank_state = jax.jit(self.bank.analysis)(
            self.bank_state, jnp.asarray(x))
        inTF = np.asarray(spec)  # (nBands, nMics, H)
        H = inTF.shape[-1]
        Cx_new = np.einsum("bmh,bnh->bmn", inTF, inTF.conj())
        lam = self.cov_avg_coeff
        self.Cx_avg = lam * self.Cx_avg + (1 - lam) * Cx_new
        diff = np.zeros(self.n_bands, np.float32)
        doa_idx = np.zeros(self.n_bands, int)
        for b in range(self.n_bands):
            Tb = self.T[b]
            Cw = Tb @ self.Cx_avg[b] @ Tb.conj().T
            e, V = np.linalg.eigh(Cw)
            e = e[::-1].real
            V = V[:, ::-1]
            diff[b] = comedie(e)
            # sdMUSIC on the noise subspace over whitened steering vectors
            Vn = V[:, 1:]
            A = self.H_array_w[b]  # (nMics, nGrid)
            num = np.einsum("mg,mg->g", A.conj(), A).real
            VnA = Vn.conj().T @ A
            den = np.einsum("kg,kg->g", VnA.conj(), VnA).real
            doa_idx[b] = int(np.argmax(num / (den + 2.23e-10)))
        params = HadesParams(diffuseness=diff, doa_idx=doa_idx,
                             gains_idx=doa_idx.copy(),
                             gains_dir=np.ones(self.n_bands, np.float32),
                             gains_diff=np.ones(self.n_bands, np.float32))
        return params, HadesSignals(inTF=inTF, Cx=Cx_new)


class HadesRadialEditor:
    """hades_radial_editor (saf_hades_synthesis.h:96-115): per-direction gain
    pattern applied to the per-band direct/diffuse gains."""

    def __init__(self, grid_dirs_deg: np.ndarray):
        self.grid_dirs_deg = np.asarray(grid_dirs_deg)

    def apply(self, params: HadesParams, dir_gains_db: np.ndarray):
        """dir_gains_db: (360,) azimuth-dependent gains in dB."""
        azi = np.mod(np.round(self.grid_dirs_deg[params.doa_idx, 0]), 360).astype(int)
        params.gains_dir = (10.0 ** (np.asarray(dir_gains_db)[azi] / 20.0)
                            ).astype(np.float32)
        return params


class HadesSynthesis:
    def __init__(self, ana: HadesAnalysis,
                 hrirs: Optional[np.ndarray] = None,
                 hrir_dirs_deg: Optional[np.ndarray] = None,
                 beam_option: str = HADES_BEAMFORMER_FILTER_AND_SUM,
                 ref_indices=(0, 1), enable_cm: bool = True):
        self.ana = ana
        self.beam_option = beam_option
        self.ref = ref_indices
        self.enable_cm = enable_cm
        if hrirs is None:
            hrirs, hrir_dirs_deg, _ = hrir_mod.default_hrirs()
        # HRTFs interpolated to the analysis grid
        from spatial_audio_framework_tpu.modules import vbap as _vbap

        H_bin_full = hrir_mod.hrirs_to_hrtfs_afstft(
            np.asarray(hrirs, np.float32), ana.hop)
        gt = _vbap.generate_vbap_gain_table_3d_srcs(
            ana.grid_dirs_deg, np.asarray(hrir_dirs_deg, np.float64))
        gt = _vbap.vbap_gain_table_to_interp_table(gt)
        self.H_bin = np.einsum("bed,gd->beg", H_bin_full, gt)
        # binaural diffuse covariance + diffuse EQ (hades_synthesis_create)
        DCM_bin = np.einsum("beg,bfg->bef", self.H_bin,
                            self.H_bin.conj()) / ana.n_grid
        r0, r1 = self.ref
        num = DCM_bin[:, 0, 0].real + DCM_bin[:, 1, 1].real
        den = (ana.DCM[:, r0, r0].real + ana.DCM[:, r1, r1].real + 2.23e-10)
        self.diff_eq = np.minimum(np.sqrt(num / den), 3.0)
        self.DCM_bin_norm = DCM_bin / (num + 2.23e-10)[:, None, None]
        self.eq = np.ones(ana.n_bands, np.float32)
        self.stream_balance = np.ones(ana.n_bands, np.float32)
        self.syn_avg_coeff = 0.5
        self.M = np.zeros((ana.n_bands, 2, ana.n_mics), np.complex64)
        self.bank_state = ana.bank.init_state(ana.n_mics, 2)

    def apply(self, params: HadesParams, sigs: HadesSignals) -> np.ndarray:
        """→ binaural output block (2, T)."""
        import jax
        import jax.numpy as jnp

        ana = self.ana
        n_mics = ana.n_mics
        r0, r1 = self.ref
        new_M = np.zeros_like(self.M)
        for b in range(ana.n_bands):
            psi = float(np.clip(params.diffuseness[b], 0.0, 1.0))
            bal = float(np.clip(self.stream_balance[b], 0.0, 2.0))
            a, bb = (bal, 1.0) if bal < 1.0 else (1.0, 2.0 - bal)
            a *= params.gains_dir[b]
            bb *= params.gains_diff[b]
            eq = self.eq[b]
            As = ana.H_array[b, :, params.doa_idx[b]]
            As_l = As / (As[r0] + 1e-12)
            As_r = As / (As[r1] + 1e-12)
            h_dir = self.H_bin[b, :, params.gains_idx[b]]
            g_l = h_dir[0] / (As[r0] + 1e-12)
            g_r = h_dir[1] / (As[r1] + 1e-12)
            if abs(g_l) > 4.0 or abs(g_r) > 4.0:
                g_l = g_r = 1.0
            Q_diff = np.zeros((2, n_mics), np.complex64)
            Q_diff[0, r0] = self.diff_eq[b]
            Q_diff[1, r1] = self.diff_eq[b]
            if self.beam_option == HADES_BEAMFORMER_NONE:
                Q = np.zeros((2, n_mics), np.complex64)
                Q[0, r0] = Q[1, r1] = 1.0
            else:
                if self.beam_option == HADES_BEAMFORMER_FILTER_AND_SUM:
                    Q_dir = np.stack([np.linalg.pinv(As_l[:, None])[0] * g_l,
                                      np.linalg.pinv(As_r[:, None])[0] * g_r])
                else:  # BMVDR
                    Cx = np.array(sigs.Cx[b], np.complex128)
                    tr = np.trace(Cx).real
                    if tr < 1e-4 or np.abs(As).sum() < 1e-4:
                        Q_dir = np.zeros((2, n_mics), np.complex64)
                    else:
                        Cx += np.eye(n_mics) * (tr / n_mics * 10.0 + 1e-4)
                        rows = []
                        for Asx, g in [(As_l, g_l), (As_r, g_r)]:
                            w = np.linalg.solve(Cx, Asx.conj())
                            denom = w @ Asx + 1e-5
                            rows.append(w / denom * g)
                        Q_dir = np.stack(rows)
                Q = (eq * a * (1.0 - psi)) * Q_dir + (eq * bb * psi) * Q_diff
            target_e = eq * 0.25 * np.trace(sigs.Cx[b]).real * self.diff_eq[b]
            if self.enable_cm and target_e > 1e-4:
                Cy = (eq * a * (1 - psi) * target_e) * np.outer(h_dir,
                                                                h_dir.conj())
                Cy = Cy + (eq * bb * psi * target_e) * self.DCM_bin_norm[b]
                Mb, _ = cdf4sap.formulate_M_and_Cr(
                    np.asarray(sigs.Cx[b], np.complex128), Cy,
                    Q.astype(np.complex128), True, 0.1)
            else:
                Mb = Q
            new_M[b] = eq * Mb
        self.M = self.syn_avg_coeff * self.M + (1 - self.syn_avg_coeff) * new_M
        out = np.einsum("bem,bmh->beh", self.M, sigs.inTF)
        import jax.numpy as jnp

        y, self.bank_state = jax.jit(ana.bank.synthesis)(
            self.bank_state, jnp.asarray(out))
        return np.asarray(y)
