"""Unit tests mirroring reference test cases not covered elsewhere
(test/src/saf_test.c list): getVoronoiWeights, gexpm, unique_i, cmplxPairUp,
sortc/sortz, resampleHRIRs, the DVF trio, Bessel golden values, delaunaynd/
convhullnd, realloc-free shape helpers."""
import numpy as np
import pytest

from spatial_audio_framework_tpu.modules import hrir as hrir_mod
from spatial_audio_framework_tpu.utils import dvf, geometry as geo, misc, sort


def test_voronoi_weights_uniform_grid():
    """getVoronoiWeights (test__getVoronoiWeights): areas of a t-design are
    equal and sum to 4π."""
    from spatial_audio_framework_tpu.utils.presets import tdesign

    dirs = tdesign(9)  # degrees, uniform arrangement
    w = geo.get_voronoi_weights(dirs)
    assert w.shape == (dirs.shape[0],)
    np.testing.assert_allclose(w.sum(), 4.0 * np.pi, rtol=1e-6)
    np.testing.assert_allclose(w, w.mean(), rtol=0.05)


def test_gexpm_matches_scipy():
    """test__gexpm: matrix exponential vs scipy reference."""
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    A = 0.3 * rng.standard_normal((6, 6))
    np.testing.assert_allclose(misc.gexpm(A), expm(A), atol=1e-10)


def test_unique_i():
    """test__unique_i."""
    x = np.array([3, 1, 3, 2, 1, 5])
    vals, idx = misc.unique_i(x)
    assert set(vals.tolist()) == {1, 2, 3, 5}
    np.testing.assert_array_equal(x[idx], vals)


def test_cmplx_pair_up_and_sortc():
    """test__cmplxPairUp / test__sortf / test__sortz."""
    vals = np.array([1.0 + 1.0j, 2.0, 1.0 - 1.0j, -0.5 + 2j, -0.5 - 2j, 3.0])
    paired = sort.cmplx_pair_up(vals)
    # conjugate pairs adjacent (negative-imag first), reals last
    assert np.isreal(paired[-1]) and np.isreal(paired[-2])
    for k in range(0, 4, 2):
        np.testing.assert_allclose(paired[k], np.conj(paired[k + 1]))
        assert paired[k].imag <= paired[k + 1].imag
    s, idx = sort.sort_with_indices(np.array([3.0, -1.0, 2.0]))
    np.testing.assert_array_equal(s, [-1.0, 2.0, 3.0])
    c, _ = sort.sortc(np.array([2 + 1j, 1 + 5j, 1 + 2j]))
    np.testing.assert_array_equal(c, np.array([1 + 2j, 1 + 5j, 2 + 1j]))


def test_resample_hrirs():
    """test__resampleHRIRs: 48k→96k doubles length, preserves band shape."""
    rng = np.random.default_rng(1)
    hrirs = rng.standard_normal((4, 2, 256)).astype(np.float32)
    up, new_len = hrir_mod.resample_hrirs(hrirs, 48000, 96000)
    assert new_len == 512 and up.shape == (4, 2, 512)
    # energy approximately preserved per unit time (×2 samples)
    e0 = (hrirs ** 2).sum(-1)
    e1 = (up ** 2).sum(-1) / 2.0
    np.testing.assert_allclose(e1, e0, rtol=0.12)
    down, back_len = hrir_mod.resample_hrirs(up, 96000, 48000)
    assert back_len == 256
    # round trip close (band-limited content)
    corr = np.sum(down * hrirs) / np.sqrt(
        np.sum(down ** 2) * np.sum(hrirs ** 2))
    assert corr > 0.98


def test_dvf_trio():
    """test__dvf_calcDVFShelfParams / _interpDVFShelfParams /
    _dvfShelfCoeffs: near sources boost ipsilateral low/mid freqs; the shelf
    biquad is stable and matches its target gains at the extremes."""
    g0n, ginfn, fcn = dvf.interp_dvf_shelf_params(0.0, 1.25)   # very near
    g0f, ginff, fcf = dvf.interp_dvf_shelf_params(0.0, 10.0)   # far
    assert float(g0n) > float(g0f)  # near field boosts the ipsilateral shelf
    b, a = dvf.calc_dvf_coeffs(0.0, 1.25, 48000.0)
    from scipy.signal import freqz

    w, h = freqz(np.asarray(b), np.asarray(a), worN=512, fs=48000.0)
    dc_db = 20 * np.log10(abs(h[1]))
    assert abs(dc_db - float(g0n)) < 1.5
    assert np.max(np.abs(np.roots(np.asarray(a)))) < 1.0  # stable
    # doaToIpsiInteraural maps any DoA into the ipsi lateral-angle range
    alphas, _ = dvf.doa_to_ipsi_interaural(150.0, 0.0)
    assert np.all(np.abs(np.asarray(alphas)) <= 180.0)


def test_bessel_golden_values():
    """test__cylindricalBesselFunctions / test__sphericalBesselFunctions:
    golden values (Abramowitz & Stegun)."""
    from spatial_audio_framework_tpu.utils import bessel

    J, dJ = bessel.bessel_Jn_all(2, np.array([1.0, 2.5]))
    np.testing.assert_allclose(J[0, 0], 0.7651976865579666, atol=1e-12)
    np.testing.assert_allclose(J[1, 1], 0.4970941024642741, atol=1e-10)
    j, dj = bessel.bessel_jn_all(2, np.array([1.0]))
    np.testing.assert_allclose(j[0, 0], np.sin(1.0) / 1.0, atol=1e-12)
    np.testing.assert_allclose(j[0, 1], np.sin(1.0) - np.cos(1.0), atol=1e-12)
    y, _ = bessel.bessel_yn_all(0, np.array([1.0]))
    np.testing.assert_allclose(y[0, 0], -np.cos(1.0) / 1.0, atol=1e-12)
    h1, _ = bessel.hankel_hn1_all(0, np.array([2.0]))
    np.testing.assert_allclose(h1[0, 0],
                               np.sin(2.0) / 2.0 - 1j * np.cos(2.0) / 2.0,
                               atol=1e-12)


def test_delaunay_and_convhull_nd():
    """test__delaunaynd: hull/triangulation of a cube."""
    pts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                    for z in (0, 1)], float)
    simpl = geo.delaunay_nd(pts)
    assert simpl.shape[1] == 4 and simpl.shape[0] >= 5  # ≥5 tetrahedra
    faces = geo.convhull_nd(pts)
    assert faces.shape[1] == 3 and faces.shape[0] == 12  # cube hull triangles


def test_grid_weights_vs_voronoi():
    """calculateGridWeights analogue: SHT condition check on a dense grid
    approximates uniform weights."""
    from spatial_audio_framework_tpu.utils.presets import tdesign

    dirs = tdesign(21)
    w = geo.get_voronoi_weights(dirs)
    np.testing.assert_allclose(w.sum(), 4 * np.pi, rtol=1e-6)
    assert w.std() / w.mean() < 0.15


def test_preset_handle_tables_fully_covered():
    """The reference's __HANDLES_* pointer tables (loudspeaker_presets.c)
    index per-size data arrays; the presets API must resolve every index
    they span: t-designs 1..21, sphere coverings 4..64, geospheres 0..16
    (ico + oct)."""
    from spatial_audio_framework_tpu.utils import presets

    for deg in range(1, 22):
        d = presets.tdesign(deg)
        assert d.shape == (presets.tdesign_n_points(deg), 2)
    for n in range(4, 65):
        assert presets.sphere_covering(n).shape == (n, 2)
    for lev in range(0, 17):
        for ico in (True, False):
            g = presets.geosphere(lev, icosahedral=ico)
            assert g.ndim == 2 and g.shape[1] == 2 and g.shape[0] >= 4


def test_bessel_hankel_z0_edge_is_silent_and_c_exact():
    """z <= 1e-15 takes the C's explicit DC branch (saf_utility_bessel.c:392
    etc.) with no RuntimeWarnings: cylindrical families → all zeros;
    spherical j/i → [1,0..] with dj[1]=1/3; spherical hankels → h[0]=1 and
    derivative all zeros."""
    import warnings

    import numpy as np

    from spatial_audio_framework_tpu.utils import bessel as B

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        h1, h1p = B.hankel_hn1_all(4, np.array([0.0, 1.0]))
        h2, _ = B.hankel_hn2_all(4, np.array([0.0, 1.0]))
        H1, _ = B.hankel_Hn1_all(4, np.array([0.0, 2.0]))
        H2, H2p = B.hankel_Hn2_all(4, np.array([0.0, 2.0]))
        J, dJ = B.bessel_Jn_all(4, np.array([0.0, 2.0]))
        j, dj = B.bessel_jn_all(4, np.array([0.0, 1.0]))
    # cylindrical DC rows: all zeros (even though J0(0)=1 mathematically)
    assert np.abs(J[0]).max() == 0 and np.abs(dJ[0]).max() == 0
    assert np.abs(H1[0]).max() == 0 and np.abs(H2[0]).max() == 0
    assert np.abs(H2p[0]).max() == 0
    # spherical DC rows: j=[1,0..], dj=[0,1/3,0..]; hankel h[0]=1, dh=0
    assert j[0, 0] == 1.0 and np.abs(j[0, 1:]).max() == 0
    assert dj[0, 1] == 1.0 / 3.0 and dj[0, 0] == 0
    assert h1[0, 0] == 1.0 and np.abs(h1[0, 1:]).max() == 0
    assert np.abs(h1p[0]).max() == 0 and h2[0, 0] == 1.0
    # away from the edge the values match j ± i*y
    from scipy import special as sp
    ref = sp.spherical_jn(1, 1.0) + 1j * sp.spherical_yn(1, 1.0)
    assert abs(h1[1, 1] - ref) < 1e-12
