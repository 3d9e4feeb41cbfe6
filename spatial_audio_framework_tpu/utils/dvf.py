"""Distance-variation function (DVF) near-field filters (counterpart of
``saf_utility_dvf``; Romblom & Cook 2008 high-shelf approximation).

Backend-agnostic and vectorised over sources/ears so the per-block traced
path of binauraliser_nf can update filters with traced distances/angles.
Coefficient lookup table (10° azimuth steps) from saf_utility_dvf.c:37-51.
"""
from __future__ import annotations

import numpy as np

_P11 = np.array([12.97, 13.19, 12.13, 11.19, 9.91, 8.328, 6.493, 4.455, 2.274, 0.018, -2.24, -4.43, -6.49, -8.34, -9.93, -11.3, -12.2, -12.8, -13.0])
_P21 = np.array([-9.69, 234.2, -11.2, -9.03, -7.87, -7.42, -7.31, -7.28, -7.29, -7.48, -8.04, -9.23, -11.6, -17.4, -48.4, 9.149, 1.905, -0.75, -1.32])
_Q11 = np.array([-1.14, 18.48, -1.25, -1.02, -0.83, -0.67, -0.5, -0.32, -0.11, -0.13, 0.395, 0.699, 1.084, 1.757, 4.764, -0.64, 0.109, 0.386, 0.45])
_Q21 = np.array([0.219, -8.5, 0.346, 0.336, 0.379, 0.421, 0.423, 0.382, 0.314, 0.24, 0.177, 0.132, 0.113, 0.142, 0.462, -0.14, -0.08, -0.06, -0.05])
_P12 = np.array([-4.39, -4.31, -4.18, -4.01, -3.87, -4.1, -3.87, -5.02, -6.72, -8.69, -11.2, -12.1, -11.1, -11.1, -9.72, -8.42, -7.44, -6.78, -6.58])
_P22 = np.array([2.123, -2.78, 4.224, 3.039, -0.57, -34.7, 3.271, 0.023, -8.96, -58.4, 11.47, 8.716, 21.8, 1.91, -0.04, -0.66, 0.395, 2.662, 3.387])
_Q12 = np.array([-0.55, 0.59, -1.01, -0.56, 0.665, 11.39, -1.57, -0.87, 0.37, 5.446, -1.13, -0.63, -2.01, 0.15, 0.243, 0.147, -0.18, -0.67, -0.84])
_Q22 = np.array([-0.06, -0.17, -0.02, -0.32, -1.13, -8.3, 0.637, 0.325, -0.08, -1.19, 0.103, -0.12, 0.098, -0.4, -0.41, -0.34, -0.18, 0.05, 0.131])
_P13 = np.array([0.457, 0.455, -0.87, 0.465, 0.494, 0.549, 0.663, 0.691, 3.507, -27.4, 6.371, 7.032, 7.092, 7.463, 7.453, 8.101, 8.702, 8.925, 9.317])
_P23 = np.array([-0.67, 0.142, 3404., -0.91, -0.67, -1.21, -1.76, 4.655, 55.09, 10336., 1.735, 40.88, 23.86, 102.8, -6.14, -18.1, -9.05, -9.03, -6.89])
_P33 = np.array([0.174, -0.11, -1699., 0.437, 0.658, 2.02, 6.815, 0.614, 589.3, 16818., -9.39, -44.1, -23.6, -92.3, -1.81, 10.54, 0.532, 0.285, -2.08])
_Q13 = np.array([-1.75, -0.01, 7354., -2.18, -1.2, -1.59, -1.23, -0.89, 29.23, 1945., -0.06, 5.635, 3.308, 13.88, -0.88, -2.23, -0.96, -0.9, -0.57])
_Q23 = np.array([0.699, -0.35, -5350., 1.188, 0.256, 0.816, 1.166, 0.76, 59.51, 1707., -1.12, -6.18, -3.39, -12.7, -0.19, 1.295, -0.02, -0.08, -0.4])
_N_AZ = 19

A_0 = 0.0875      # reference head radius used to generate the table [m]
A_HEAD = 0.09096  # head radius of this implementation [m]
HEAD_DIM = np.pi * (A_0 / A_HEAD)
SOS_DIV_2PI_A = 343.0 / (2.0 * np.pi * A_HEAD)


from spatial_audio_framework_tpu.utils.geometry import _xp  # shared dispatch


def calc_dvf_shelf_params(idx, rho, xp=np):
    """Shelf params (g0 dB, gInf dB, fc Hz) at table index idx
    (saf_utility_dvf.c ``calcDVFShelfParams``)."""
    rho2 = rho * rho
    tab = lambda t: xp.asarray(t)[idx]
    g0 = (tab(_P11) * rho + tab(_P21)) / (rho2 + tab(_Q11) * rho + tab(_Q21))
    ginf = (tab(_P12) * rho + tab(_P22)) / (rho2 + tab(_Q12) * rho + tab(_Q22))
    fc = ((tab(_P13) * rho2 + tab(_P23) * rho + tab(_P33))
          / (rho2 + tab(_Q13) * rho + tab(_Q23))) * SOS_DIV_2PI_A
    return g0, ginf, fc


def interp_dvf_shelf_params(theta_deg, rho):
    """Interpolated shelf params at exact azimuth
    (saf_utility_dvf.c ``interpDVFShelfParams``).  theta_deg: lateral angle on
    the interaural axis [0, 180]; rho: distance / head radius (≥1).
    Vectorised; works traced."""
    xp = _xp(theta_deg, rho)
    theta = xp.clip(xp.asarray(theta_deg), 0.0, 180.0)
    rho = xp.maximum(xp.asarray(rho), 1.0)
    t10 = theta / 10.0
    lo = xp.clip(xp.floor(t10).astype(int), 0, _N_AZ - 2)
    hi = lo + 1
    g0a, gia, fca = calc_dvf_shelf_params(lo, rho, xp)
    g0b, gib, fcb = calc_dvf_shelf_params(hi, rho, xp)
    f = t10 - lo
    return (g0a + (g0b - g0a) * f, gia + (gib - gia) * f, fca + (fcb - fca) * f)


def dvf_shelf_coeffs(g0, ginf, fc, fs: float):
    """Shelf params → 1st-order IIR coeffs (b0, b1, a1)
    (saf_utility_dvf.c ``dvfShelfCoeffs``)."""
    xp = _xp(g0, ginf, fc)
    v0 = 10.0 ** (ginf / 20.0)
    g0m = 10.0 ** (g0 / 20.0)
    tanf_ = xp.tan((HEAD_DIM / fs) * fc)
    a_c = (v0 * tanf_ - 1.0) / (v0 * tanf_ + 1.0)
    v = (v0 - 1.0) * 0.5
    b0 = g0m * (v - v * a_c + 1.0)
    b1 = g0m * (v * a_c - v + a_c)
    return b0, b1, a_c


def calc_dvf_coeffs(alpha_deg, rho, fs: float):
    """Lateral angle + distance → (b (...,2), a (...,2)) filter coeffs
    (saf_utility_dvf.h:62 ``calcDVFCoeffs``)."""
    xp = _xp(alpha_deg, rho)
    g0, gi, fc = interp_dvf_shelf_params(alpha_deg, rho)
    b0, b1, a1 = dvf_shelf_coeffs(g0, gi, fc, fs)
    b = xp.stack([b0, b1], -1)
    a = xp.stack([xp.ones_like(a1), a1], -1)
    return b, a


def doa_to_ipsi_interaural(azimuth_deg, elevation_deg):
    """DoA → ipsilateral interaural-polar angles for (L, R) ears
    (saf_utility_dvf.c ``doaToIpsiInteraural``).  Returns (alphaLR, betaLR)
    each (..., 2) degrees, vectorised/traceable."""
    xp = _xp(azimuth_deg, elevation_deg)
    az = xp.deg2rad(xp.asarray(azimuth_deg))
    el = xp.deg2rad(xp.asarray(elevation_deg))
    sinaz, cosaz = xp.sin(az), xp.cos(az)
    sinel, cosel = xp.sin(el), xp.cos(el)
    alpha = np.pi / 2.0 - xp.arccos(xp.clip(sinaz * cosel, -1.0, 1.0))
    beta = xp.arcsin(sinel / xp.sqrt(sinel ** 2 + cosaz ** 2 * cosel ** 2 + 1e-20))
    flip = beta > np.pi / 2.0
    alpha = xp.where(flip, np.pi - alpha, alpha)
    beta = xp.where(flip, np.pi - beta, beta)
    alpha = xp.abs(np.pi / 2.0 - alpha)
    alpha = xp.where(alpha > np.pi, 2 * np.pi - alpha, alpha)
    alpha_deg = xp.rad2deg(alpha)
    beta_deg = xp.rad2deg(beta)
    return (xp.stack([alpha_deg, 180.0 - alpha_deg], -1),
            xp.stack([beta_deg, 180.0 - beta_deg], -1))
