"""Generate the default HRIR dataset (data/default_hrirs.npz).

The reference declares a default set of 836 dirs x 2 ears x 256 taps @48 kHz
(framework/modules/saf_hrir/saf_hrir.h:49-61), but the data file
(saf_default_hrirs.c) is absent from the snapshot (see SURVEY.md fork delta
#5).  We therefore ship a synthesised default with the same shape: an
analytic rigid-sphere ("Duda & Martens 1998") head model evaluated on a
19-ring x 44-azimuth grid, with ears at azimuth ±90°.  This gives physically
plausible ITD/ILD behaviour with no measurement-data licensing concerns.
"""
import numpy as np
from scipy import special as sp

FS = 48000
LEN = 256
A = 0.0875           # head radius [m]
C = 343.0            # speed of sound [m/s]
BULK_DELAY = 48      # samples, to keep IRs causal
N_TERMS = 50


def sphere_hrtf(f, cos_theta):
    """Far-field rigid-sphere transfer function (Duda & Martens 1998).

    f: (nF,) Hz (f>0), cos_theta: (nD,) angle between source dir and ear.
    Returns (nF, nD) complex, normalised to free-field at the sphere centre.
    """
    mu = 2.0 * np.pi * np.asarray(f) * A / C  # (nF,)
    mu = np.maximum(mu, 1e-6)
    # Legendre polys P_m(cosθ): (N_TERMS, nD)
    P = [np.ones_like(cos_theta), cos_theta]
    for m in range(2, N_TERMS):
        P.append(((2 * m - 1) * cos_theta * P[m - 1] - (m - 1) * P[m - 2]) / m)
    P = np.stack(P, 0)
    # h'_m(mu) for spherical Hankel of the first kind
    m = np.arange(N_TERMS)
    jn = np.stack([sp.spherical_jn(mm, mu, derivative=True) for mm in m], 0)
    yn = np.stack([sp.spherical_yn(mm, mu, derivative=True) for mm in m], 0)
    hp = jn + 1j * yn  # (N_TERMS, nF)
    coef = ((-1j) ** (m - 1))[:, None] * (2 * m + 1)[:, None] / hp  # (N_TERMS, nF)
    H = np.einsum("mf,md->fd", coef, P) / (mu[:, None] ** 2)
    # conjugate: numpy's irfft delay convention is e^{-iωτ} for positive delay
    return H.conj()


def main():
    # Grid: 22 pole-free elevation rings × 38 azimuths = 836 dirs
    # (duplicate-free so spherical Voronoi weights are well defined).
    elevs = -90.0 + (np.arange(22) + 0.5) * (180.0 / 22.0)
    azis = np.arange(38) * (360.0 / 38.0)
    azis = np.where(azis > 180.0, azis - 360.0, azis)
    grid = np.stack(np.meshgrid(azis, elevs), -1).reshape(-1, 2)  # azi fastest
    n_dirs = grid.shape[0]
    assert n_dirs == 836

    a = np.radians(grid[:, 0])
    e = np.radians(grid[:, 1])
    u = np.stack([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)], -1)
    ear_l = np.array([0.0, 1.0, 0.0])   # +90° azimuth
    ear_r = np.array([0.0, -1.0, 0.0])

    freqs = np.fft.rfftfreq(LEN, 1.0 / FS)
    H = np.zeros((len(freqs), 2, n_dirs), np.complex128)
    for ei, ear in enumerate([ear_l, ear_r]):
        cth = np.clip(u @ ear, -1.0, 1.0)
        H[1:, ei, :] = sphere_hrtf(freqs[1:], cth)
    H[0] = 1.0  # DC: unit gain
    # bulk delay for causality; gentle high-shelf rolloff above 20 kHz to
    # avoid wrap-around ringing in the 256-tap IRs
    delay = np.exp(-2j * np.pi * freqs * BULK_DELAY / FS)
    lp = 1.0 / (1.0 + (freqs / 22000.0) ** 16)
    H *= (delay * lp)[:, None, None]
    hrirs = np.fft.irfft(H, n=LEN, axis=0)  # (LEN, 2, nDirs)
    hrirs = hrirs.transpose(2, 1, 0).astype(np.float32)  # (nDirs, 2, LEN)

    np.savez_compressed(
        "/root/repo/spatial_audio_framework_tpu/data/default_hrirs.npz",
        hrirs=hrirs, dirs_deg=grid.astype(np.float32), fs=np.int32(FS))
    print("saved", hrirs.shape, "peak", np.abs(hrirs).max())
    # sanity: ipsilateral earlier & louder than contralateral at azi=90
    idx = np.argmin(np.abs(grid[:, 0] - 90.0) + np.abs(grid[:, 1]))
    l_pk, r_pk = np.argmax(np.abs(hrirs[idx, 0])), np.argmax(np.abs(hrirs[idx, 1]))
    l_en, r_en = (hrirs[idx, 0] ** 2).sum(), (hrirs[idx, 1] ** 2).sum()
    print("azi=90: L peak idx", l_pk, "R peak idx", r_pk, "L/R energy",
          l_en / r_en)
    assert l_pk < r_pk and l_en > r_en


if __name__ == "__main__":
    main()
