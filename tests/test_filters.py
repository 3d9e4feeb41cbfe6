"""Filter-design tests mirroring test__utilities_module.c recipes: IIR
filterbank flatness, butterworth vs scipy, biquad responses, IIR recurrence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from spatial_audio_framework_tpu.ops.iir import iir_filter
from spatial_audio_framework_tpu.utils import filters as F
from spatial_audio_framework_tpu.modules import cdf4sap


def test_windows_basic():
    for wt in [F.WINDOWING_FUNCTION_HAMMING, F.WINDOWING_FUNCTION_HANN,
               F.WINDOWING_FUNCTION_BLACKMAN, F.WINDOWING_FUNCTION_NUTTALL]:
        w = F.get_windowing_function(wt, 127)  # odd → symmetric
        assert w.shape == (127,)
        np.testing.assert_allclose(w, w[::-1], atol=1e-6)
    assert (F.get_windowing_function(F.WINDOWING_FUNCTION_RECTANGULAR, 8) == 1).all()


def test_biquad_responses():
    fs = 48000.0
    b, a = F.biquad_coeffs(F.BIQUAD_FILTER_LPF, 1000.0, fs, 0.7071)
    mag, _ = F.eval_iir_transfer_function(b, a, np.array([10.0, 1000.0, 20000.0]), fs)
    assert abs(mag[0]) < 0.1 and -4 < mag[1] < -2 and mag[2] < -20
    b, a = F.biquad_coeffs(F.BIQUAD_FILTER_HPF, 1000.0, fs, 0.7071)
    mag, _ = F.eval_iir_transfer_function(b, a, np.array([10.0, 20000.0]), fs)
    assert mag[0] < -30 and abs(mag[1]) < 0.5
    for t in [F.BIQUAD_FILTER_PEAK, F.BIQUAD_FILTER_PEAK_EQCB]:
        b, a = F.biquad_coeffs(t, 1000.0, fs, 1.0, gain_db=6.0)
        mag, _ = F.eval_iir_transfer_function(b, a, np.array([1000.0]), fs)
        assert abs(mag[0] - 6.0) < 0.75, (t, mag)
    # EQ-cookbook low shelf cuts properly; the DAFx variant reproduces the
    # reference's V0-inversion quirk (negative gain boosts |gain| dB at DC,
    # saf_utility_filters.c BIQUAD_FILTER_LOW_SHELF gain<0 branch).
    b, a = F.biquad_coeffs(F.BIQUAD_FILTER_LOW_SHELF_EQCB, 1000.0, fs, 0.7071,
                           gain_db=-6.0)
    mag, _ = F.eval_iir_transfer_function(b, a, np.array([20.0]), fs)
    assert abs(mag[0] + 6.0) < 0.5, mag
    b, a = F.biquad_coeffs(F.BIQUAD_FILTER_LOW_SHELF, 1000.0, fs, 0.7071,
                           gain_db=-6.0)
    mag, _ = F.eval_iir_transfer_function(b, a, np.array([20.0]), fs)
    assert abs(abs(mag[0]) - 6.0) < 0.5, mag
    for t in [F.BIQUAD_FILTER_HI_SHELF, F.BIQUAD_FILTER_HI_SHELF_EQCB]:
        b, a = F.biquad_coeffs(t, 1000.0, fs, 0.7071, gain_db=6.0)
        mag, _ = F.eval_iir_transfer_function(b, a, np.array([20000.0]), fs)
        assert abs(mag[0] - 6.0) < 0.6, (t, mag)


@pytest.mark.goldens
def test_iir_filter_matches_scipy():
    rng = np.random.default_rng(0)
    for order in [1, 2, 3]:
        b, a = sps.butter(order, 0.25)
        x = rng.standard_normal((3, 256)).astype(np.float32)
        zi = (rng.standard_normal((3, order)) * 0.1).astype(np.float32)
        y_ref, zf_ref = sps.lfilter(b, a, x, zi=zi)
        y, zf = jax.jit(lambda x, zi: iir_filter(b, a, x, zi))(
            jnp.asarray(x), jnp.asarray(zi))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=0.05)
        # float32 associative scan: moderate tolerance; exact in f64 (see ops/iir.py)
        assert np.abs(np.asarray(y) - y_ref).mean() < 5e-3


def test_fir_filterbank_flat_sum():
    """FIR filterbank bands sum to ~unity response (perfect reconstruction
    of the windowed-sinc bank)."""
    bank = F.fir_filterbank(128, np.array([500.0, 2000.0, 8000.0]), 48000.0)
    total = bank.sum(0)
    w, h = sps.freqz(total, worN=512)
    assert np.abs(np.abs(h) - 1.0).max() < 0.05


def test_faf_iir_filterbank_flatness():
    """FaF filterbank: sum of bands ≈ allpass (flat magnitude)
    (test__utilities_module.c faf_IIRFilterbank recipe)."""
    for order in [1, 3]:
        fb = F.FafIIRFilterbank(order, np.array([500.0, 2000.0, 8000.0]), 48000.0)
        imp = np.zeros(4096, np.float32)
        imp[0] = 1.0
        bands = fb.apply(imp)
        total = bands.sum(0)
        w, h = sps.freqz(total, worN=1024, fs=48000.0)
        mag_db = 20 * np.log10(np.abs(h) + 1e-12)
        sel = (w > 50) & (w < 20000)
        assert np.abs(mag_db[sel]).max() < 0.8, (order, np.abs(mag_db[sel]).max())
        # band isolation: band 0 contains the lows
        w0, h0 = sps.freqz(bands[0], worN=1024, fs=48000.0)
        assert 20 * np.log10(abs(h0[w0 > 4000]).max() + 1e-12) < -20


def test_butter_matches_reference_style():
    b, a = F.butter_coeffs("bpf", 2, 300.0, 3000.0, 48000.0)
    w, h = sps.freqz(b, a, worN=[100.0, 1000.0, 10000.0], fs=48000.0)
    mags = 20 * np.log10(np.abs(h))
    assert mags[0] < -10 and abs(mags[1]) < 1.0 and mags[2] < -10


def test_cdf4sap_achieves_target_covariance():
    """CDF4SAP: M Cx Mᴴ + Cr == Cy (test__cdf4sap_module.c recipe), real and
    complex, batched."""
    rng = np.random.default_rng(0)
    for cplx in [False, True]:
        nX, nY, B = 6, 4, 5
        def rnd(*s):
            m = rng.standard_normal(s)
            return m + 1j * rng.standard_normal(s) if cplx else m
        A = rnd(B, nX, 2 * nX)
        Cx = A @ A.conj().swapaxes(-1, -2) / nX
        Bm = rnd(B, nY, 2 * nY)
        Cy = Bm @ Bm.conj().swapaxes(-1, -2) / nY
        Q = rnd(B, nY, nX) * 0.5
        M, Cr = cdf4sap.formulate_M_and_Cr(Cx, Cy, Q, use_energy=False)
        Cy_hat = M @ Cx @ M.conj().swapaxes(-1, -2) + Cr
        np.testing.assert_allclose(Cy_hat, Cy, atol=1e-8)
        # energy mode: diagonal matched, Cr zero
        M2, Cr2 = cdf4sap.formulate_M_and_Cr(Cx, Cy, Q, use_energy=True)
        Cy2 = M2 @ Cx @ M2.conj().swapaxes(-1, -2)
        d2 = np.diagonal(Cy2, axis1=-2, axis2=-1).real
        dt = np.diagonal(Cy, axis1=-2, axis2=-1).real
        np.testing.assert_allclose(d2, dt, rtol=0.05)
        assert (Cr2 == 0).all()


def test_interpolate_filters_h_vs_c():
    """interpolateFiltersH spectral resampling (IFFT → half-rotate → FFT),
    up 256→512 and down 256→128, pinned against the C (ifh_* goldens)."""
    import numpy as np

    from spatial_audio_framework_tpu.utils.filters import interpolate_filters_h

    g = np.load("tests/goldens/c_goldens.npz")
    fin = np.asarray(g["ifh_in"])          # (129, 3) bin-major
    H = fin.T                              # (3, 129) filter-major
    up = interpolate_filters_h(H, 256, 512)
    dn = interpolate_filters_h(H, 256, 128)
    assert np.abs(up.T - g["ifh_out_up"]).max() <= 1e-5
    assert np.abs(dn.T - g["ifh_out_down"]).max() <= 1e-5
