"""Image-source-method (IMS) shoebox room simulator (counterpart of
``saf_reverb``).

Host-side scene management and echogram computation (the analogue of the
reference's create/add/update/computeEchograms/renderRIRs API,
saf_reverb.h:105-146), fully vectorised over image sources in NumPy instead
of the reference's per-image loops (saf_reverb_internal.c:269-523).

The reference's streaming time-domain applicator
(``ims_shoebox_applyEchogramTD``: per-image-source circular-buffer taps +
per-source IIR filterbanks + crossfading, saf_reverb.c:297+) maps TPU-native
to *partitioned convolution of the rendered RIRs* with crossfade on scene
updates — i.e. ``ops.matrix_conv.TVConv`` — since dynamic per-tap gathers
don't tile onto the MXU but batched frequency-domain MACs do.  See
``models/ambi_roomsim.py``.

Limits follow the reference: ≤128 sources, ≤16 receivers (saf_reverb.h:52-55).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from spatial_audio_framework_tpu.modules import sh as _sh
from spatial_audio_framework_tpu.utils import filters as _filters

IMS_MAX_NUM_SOURCES = 128
IMS_MAX_NUM_RECEIVERS = 16
IMS_FIR_FILTERBANK_ORDER = 1000  # saf_reverb_internal.h


@dataclass
class Echogram:
    """One (receiver, source) echogram: value (nCh, nIm), time (nIm,) s,
    order (nIm, 3), coords (nIm, 3) — sorted by propagation time."""
    value: np.ndarray
    time: np.ndarray
    order: np.ndarray
    coords: np.ndarray


def _image_sources_order(max_n: int):
    r = np.arange(-max_n, max_n + 1)
    II, JJ, KK = np.meshgrid(r, r, r, indexing="ij")
    II, JJ, KK = II.ravel(), JJ.ravel(), KK.ravel()
    keep = np.abs(II) + np.abs(JJ) + np.abs(KK) <= max_n
    return II[keep], JJ[keep], KK[keep]


def _image_sources_time(room, d_max):
    Nx = int(d_max / room[0] + 1.0)
    Ny = int(d_max / room[1] + 1.0)
    Nz = int(d_max / room[2] + 1.0)
    II, JJ, KK = np.meshgrid(np.arange(-Nx, Nx + 1), np.arange(-Ny, Ny + 1),
                             np.arange(-Nz, Nz + 1), indexing="ij")
    return II.ravel(), JJ.ravel(), KK.ravel()


def compute_echogram(room, src, rec, c: float = 343.0,
                     max_order: int = -1, max_time_s: float = -1.0) -> Echogram:
    """Pure-propagation omni echogram (saf_reverb_internal.c
    ``ims_shoebox_coreInitT/N``).  src/rec in room coordinates (corner
    origin; the reference's y flip and centre-origin shift are applied
    internally).  Exactly one of max_order / max_time_s must be >= 0."""
    room = np.asarray(room, np.float64)
    src = np.asarray(src, np.float64)
    rec = np.asarray(rec, np.float64)
    # The scene API flips y before coreInit, and coreInit moves the origin to
    # the room centre with its own y flip (saf_reverb.c:205-212 +
    # saf_reverb_internal.c:283-289) — the two compose to plain centring.
    src_o = np.array([src[0] - room[0] / 2, src[1] - room[1] / 2, src[2] - room[2] / 2])
    rec_o = np.array([rec[0] - room[0] / 2, rec[1] - room[1] / 2, rec[2] - room[2] / 2])

    if max_time_s > 0:
        d_max = max_time_s * c
        II, JJ, KK = _image_sources_time(room, d_max)
    else:
        assert max_order >= 0
        II, JJ, KK = _image_sources_order(max_order)

    s = np.stack([II * room[0] + np.where(II % 2 == 0, src_o[0], -src_o[0]) - rec_o[0],
                  JJ * room[1] + np.where(JJ % 2 == 0, src_o[1], -src_o[1]) - rec_o[1],
                  KK * room[2] + np.where(KK % 2 == 0, src_o[2], -src_o[2]) - rec_o[2]],
                 axis=-1)
    d = np.linalg.norm(s, axis=-1)
    if max_time_s > 0:
        keep = d < d_max
        s, d = s[keep], d[keep]
        II, JJ, KK = II[keep], JJ[keep], KK[keep]
    t = d / c
    val = np.where(d <= 1.0, 1.0, 1.0 / np.maximum(d, 1e-9))
    idx = np.argsort(t, kind="stable")
    return Echogram(value=val[idx][None, :], time=t[idx],
                    order=np.stack([II, JJ, KK], -1)[idx], coords=s[idx])


def apply_sh_directivity(ec: Echogram, sh_order: int) -> Echogram:
    """Impose SH receiver directivities (``ims_shoebox_coreRecModuleSH``)."""
    if sh_order == 0:
        return ec
    azi = np.arctan2(ec.coords[:, 1], ec.coords[:, 0])
    elev = np.arctan2(ec.coords[:, 2], np.linalg.norm(ec.coords[:, :2], axis=-1))
    dirs = np.stack([azi, np.pi / 2 - elev], -1)
    Y = _sh.get_sh_real(sh_order, dirs)  # orthonormal (getSHreal_recur)
    return Echogram(value=Y * ec.value[0][None, :], time=ec.time,
                    order=ec.order, coords=ec.coords)


def apply_wall_absorption(ec: Echogram, abs_wall: np.ndarray) -> list[Echogram]:
    """Per-band wall absorption (``ims_shoebox_coreAbsorptionModule``).
    abs_wall: (nBands, 6) absorption [x0,x1,y0,y1,z0,z1] → list of per-band
    echograms."""
    abs_wall = np.atleast_2d(np.asarray(abs_wall, np.float64))
    r = np.sqrt(1.0 - abs_wall)  # (nBands, 6)
    out = []
    o = ec.order  # (nIm, 3)

    def hits(n):  # wall-hit counts (n_lo, n_hi) for one axis order vector
        a = np.abs(n)
        even = (n % 2 == 0)
        lo = np.where(even, a / 2.0, np.where(n > 0, np.ceil(n / 2.0),
                                              np.floor(a / 2.0)))
        hi = np.where(even, a / 2.0, np.where(n > 0, np.floor(n / 2.0),
                                              np.ceil(a / 2.0)))
        return lo, hi

    xl, xh = hits(o[:, 0])
    yl, yh = hits(o[:, 1])
    zl, zh = hits(o[:, 2])
    for band in range(abs_wall.shape[0]):
        g = (r[band, 0] ** xl * r[band, 1] ** xh
             * r[band, 2] ** yl * r[band, 3] ** yh
             * r[band, 4] ** zl * r[band, 5] ** zh)
        out.append(Echogram(value=ec.value * g[None, :], time=ec.time,
                            order=ec.order, coords=ec.coords))
    return out


def render_rir(echograms: list[Echogram], fs: float,
               H_filt: Optional[np.ndarray] = None,
               fractional_delays: bool = False) -> np.ndarray:
    """Accumulate per-band echograms into a broadband RIR
    (``ims_shoebox_renderRIR``): round taps to samples (or Lagrange
    fractional delays), band-filter with the FIR filterbank, sum.
    → (nCh, rir_len)."""
    n_ch = echograms[0].value.shape[0]
    endtime = max(ec.time[-1] for ec in echograms)
    rir_len = int(endtime * fs + 1.0) + 1
    out = np.zeros((n_ch, rir_len))
    for band, ec in enumerate(echograms):
        rir_b = np.zeros((n_ch, rir_len))
        if fractional_delays:
            from spatial_audio_framework_tpu.utils.misc import lagrange_weights

            order = 2
            base = np.floor(ec.time * fs).astype(int)
            frac = ec.time * fs - base
            W = lagrange_weights(order, frac)  # (order+1, nIm)
            for k in range(order + 1):
                idx = np.clip(base + k - order // 2, 0, rir_len - 1)
                np.add.at(rir_b.T, idx, (ec.value * W[k][None, :]).T)
        else:
            idx = np.round(ec.time * fs).astype(int)
            np.add.at(rir_b.T, idx, ec.value.T)
        if H_filt is not None:
            from scipy.signal import fftconvolve

            delay = (H_filt.shape[-1] - 1) // 2
            filt = fftconvolve(rir_b, H_filt[band][None, :], axes=-1)
            rir_b = filt[:, delay:delay + rir_len]
        out += rir_b
    return out.astype(np.float32)


@dataclass
class ShoeboxRoom:
    """Scene container (``ims_shoebox_create``, saf_reverb.h:105-118)."""
    room_dims: np.ndarray
    abs_wall: np.ndarray            # (nBands, 6)
    lowest_octave_band: float = 125.0
    c: float = 343.0
    fs: float = 48000.0
    sources: Dict[int, np.ndarray] = field(default_factory=dict)
    receivers: Dict[int, dict] = field(default_factory=dict)
    echograms: Dict[tuple, list] = field(default_factory=dict)
    rirs: Dict[tuple, np.ndarray] = field(default_factory=dict)

    def __post_init__(self):
        self.room_dims = np.asarray(self.room_dims, np.float64)
        self.abs_wall = np.atleast_2d(np.asarray(self.abs_wall, np.float64))
        self.n_bands = self.abs_wall.shape[0]
        if self.n_bands > 1:
            self.band_centres = self.lowest_octave_band * 2.0 ** np.arange(self.n_bands)
            self.band_cutoffs = _filters.get_octave_band_cutoff_freqs(self.band_centres)
        else:
            self.band_centres = self.band_cutoffs = None

    # -- scene management (saf_reverb.h:202-240) -----------------------------
    def add_source(self, pos) -> int:
        assert len(self.sources) < IMS_MAX_NUM_SOURCES
        sid = (max(self.sources) + 1) if self.sources else 0
        self.sources[sid] = np.asarray(pos, np.float64)
        return sid

    def add_receiver_sh(self, sh_order: int, pos) -> int:
        assert len(self.receivers) < IMS_MAX_NUM_RECEIVERS
        rid = (max(self.receivers) + 1) if self.receivers else 0
        self.receivers[rid] = {"pos": np.asarray(pos, np.float64),
                               "sh_order": sh_order}
        return rid

    def update_source(self, sid: int, pos):
        self.sources[sid] = np.asarray(pos, np.float64)

    def update_receiver(self, rid: int, pos):
        self.receivers[rid]["pos"] = np.asarray(pos, np.float64)

    def remove_source(self, sid: int):
        del self.sources[sid]

    def remove_receiver(self, rid: int):
        del self.receivers[rid]

    # -- compute (saf_reverb.h:136,146) --------------------------------------
    def compute_echograms(self, max_order: int = -1, max_time_ms: float = -1.0):
        for rid, rec in self.receivers.items():
            for sid, src in self.sources.items():
                ec = compute_echogram(self.room_dims, src, rec["pos"], self.c,
                                      max_order=max_order,
                                      max_time_s=max_time_ms / 1000.0)
                ec = apply_sh_directivity(ec, rec["sh_order"])
                self.echograms[(rid, sid)] = apply_wall_absorption(ec, self.abs_wall)

    def render_rirs(self, fractional_delays: bool = False):
        H_filt = None
        if self.n_bands > 1:
            H_filt = _filters.fir_filterbank(IMS_FIR_FILTERBANK_ORDER,
                                             self.band_cutoffs, self.fs)
        for key, ecs in self.echograms.items():
            self.rirs[key] = render_rir(ecs, self.fs, H_filt, fractional_delays)
        return self.rirs
