"""SAF-named compatibility facade tests: the safmex/safpy binding-surface
symbols resolve and behave like their C namesakes (extras/safmex wrapper set +
main saf.h API)."""
import numpy as np
import pytest

from spatial_audio_framework_tpu import compat as saf


def test_sh_symbols():
    dirs_rad = np.array([[0.3, 1.1], [2.0, 0.4]])
    Y = saf.getSHreal(2, dirs_rad)
    assert Y.shape == (9, 2)
    Yc = saf.getSHcomplex(2, dirs_rad)
    T = saf.complex2realSHMtx(2)
    np.testing.assert_allclose(np.real(T @ Yc), Y, atol=1e-10)
    R = saf.yawPitchRoll2Rzyx(0.3, 0.1, -0.2)
    M = saf.getSHrotMtxReal(R, 2)
    np.testing.assert_allclose(M @ M.T, np.eye(9), atol=1e-6)
    # getRSH: degrees + sqrt(4pi) scaling
    Yr = saf.getRSH(1, np.array([[30.0, 10.0]]))
    incl = np.array([[np.radians(30.0), np.pi / 2 - np.radians(10.0)]])
    np.testing.assert_allclose(
        Yr, saf.getSHreal(1, incl) * np.sqrt(4 * np.pi), atol=1e-10)


def test_vbap_and_hoa_symbols():
    ls = np.array([[0.0, 0.0], [90.0, 0.0], [180.0, 0.0], [-90.0, 0.0],
                   [0.0, 90.0], [0.0, -90.0]])
    gt = saf.generateVBAPgainTable3D(ls, 10, 15)
    comp, idx = saf.compressVBAPgainTable3D(gt)
    assert comp.shape[1] == 3 and idx.shape == comp.shape
    it = saf.VBAPgainTable2InterpTable(gt)
    np.testing.assert_allclose(it.sum(-1), 1.0, atol=1e-5)
    dec = saf.getLoudspeakerDecoderMtx(ls, "allrad", 1)
    assert dec.shape == (6, 4)
    w = saf.getMaxREweights(3)
    assert w.shape == (16,)
    p = saf.getPvalues(20.0, np.array([100.0, 1000.0, 10000.0]))
    assert p.shape == (3,)


@pytest.mark.goldens
def test_afstft_handle_roundtrip():
    """safmex_afSTFT-style create/forward/backward reconstructs with the
    documented 12-hop delay (afSTFTlib.h:236-246)."""
    h = saf.afSTFT(2, 2, 128, 0, 1)
    assert h.getNBands() == 133
    d = h.getProcDelay()
    assert d == 12 * 128
    fv = h.getCentreFreqs(48000.0)
    assert fv.shape == (133,)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 128 * 30)).astype(np.float32)
    y = np.concatenate([h.backward(h.forward(x[:, s:s + 1024]))
                        for s in range(0, x.shape[1], 1024)], axis=1)
    err = np.abs(y[:, d:] - x[:, :x.shape[1] - d]).max()
    assert err < 0.01  # reference test tolerance (test__resources.c:35)


def test_hrir_and_cdf4sap_symbols():
    rng = np.random.default_rng(1)
    hrirs = rng.standard_normal((8, 2, 128)).astype(np.float32)
    itds = saf.estimateITDs(hrirs, 48000.0)
    assert itds.shape == (8,)
    hrtfs = saf.HRIRs2HRTFs_afSTFT(hrirs)
    assert hrtfs.shape == (133, 2, 8)
    eq = saf.diffuseFieldEqualiseHRTFs(hrtfs, itds,
                                       saf.afSTFT(1, 1).getCentreFreqs(48e3))
    assert eq.shape == hrtfs.shape and np.isfinite(eq).all()
    Cx = np.eye(4, dtype=np.float32) * 2.0
    Cy = np.eye(2, dtype=np.float32)
    Q = np.ones((2, 4), np.float32) / 2.0
    M, Cr = saf.formulate_M_and_Cr(Cx, Cy, Q)
    np.testing.assert_allclose(M @ Cx @ M.T + Cr, Cy, atol=1e-4)


def test_lattice_and_tracker_and_utils():
    fv = saf.afSTFT(1, 1).getCentreFreqs(48000.0)
    ld = saf.latticeDecorrelator(48000.0, 128, fv, 2)
    frame = (np.random.default_rng(2).standard_normal((133, 2, 8))
             + 0j).astype(np.complex64)
    out = ld.apply(frame)
    assert out.shape == frame.shape and np.isfinite(out).all()

    trk = saf.tracker3d_create(n_particles=20)
    for k in range(5):
        pos, var, ids = saf.tracker3d_step(
            trk, np.array([[1.0, 0.0, 0.0]]) + 0.01 * k)
    saf.tracker3d_reset(trk)

    assert saf.nextpow2(100) == 128
    w = saf.getWindowingFunction(saf.getWindowingFunction.__defaults__ and
                                 "hann" or "hann", 64)
    assert w.shape == (64,)
    b, a = saf.butterCoeffs("lpf", 4, 1000.0, 0.0, 48000.0)
    assert len(b) == 5
    fb = saf.faf_IIRFilterbank(3, np.array([500.0, 2000.0]), 48000.0)
    bands = fb.apply(np.random.default_rng(3).standard_normal(512))
    assert bands.shape == (3, 512)
    u = saf.sph2cart(np.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(u), [[1.0, 0.0, 0.0]], atol=1e-12)


def test_estimators_and_sofa(tmp_path):
    # plant one source, PWD map peaks near it
    grid = np.stack(np.meshgrid(np.arange(-180, 180, 10),
                                np.arange(-80, 81, 10)), -1).reshape(-1, 2)
    a = saf.getRSH(3, np.array([[40.0, 10.0]]))
    Cx = (a @ a.T).astype(np.float32)
    peaks, _ = saf.sphPWD(Cx, grid, 1)
    d = np.abs(grid[peaks[0]] - np.array([40.0, 10.0]))
    assert d.max() <= 10.0
    # SOFA write/read through the facade
    from spatial_audio_framework_tpu.modules.sofa import sofa_save
    irs = np.random.default_rng(4).standard_normal((4, 2, 32))
    dirs = np.array([[0, 0, 1.0], [90, 0, 1.0], [180, 0, 1.0], [-90, 0, 1.0]])
    p = str(tmp_path / "t.sofa")
    sofa_save(p, irs, 48000.0, dirs)
    c = saf.saf_sofa_open(p, "hrir")
    assert c.n_sources == 4 and c.data_length_ir == 32


def test_veclib_full_c_surface():
    """Every utility_?xxx symbol declared in the reference's
    saf_utility_veclib.h (116 symbols: 66 callables + 50 workspace
    create/destroy pairs)
    resolves in compat with the right dtype behavior."""
    import numpy as np

    from spatial_audio_framework_tpu import compat

    # the full surface, spelled out (mirrors saf_utility_veclib.h)
    surface = {
        "iminv": "sdcz", "imaxv": "sdcz", "vabs": "sc", "vmod": "s",
        "vrecip": "s", "vconj": "cz", "vvcopy": "sdcz", "vvadd": "sdcz",
        "vvsub": "sdcz", "vvmul": "sc", "vvdot": "sc", "vsmul": "sdcz",
        "vsdiv": "s", "vsadd": "s", "vssub": "s", "sv2cv_inds": "s",
        "svd": "sc", "seig": "sc", "eig": "cz", "eigmp": "cz",
        "glslv": "sdcz", "glslvt": "s", "slslv": "sc", "pinv": "sdcz",
        "chol": "sc", "det": "sd", "inv": "sdc",
    }
    handled = {"svd", "seig", "eig", "eigmp", "glslv", "glslvt", "slslv",
               "pinv", "chol", "det", "inv"}
    n = 0
    for base, prefixes in surface.items():
        for p in prefixes:
            name = f"utility_{p}{base}"
            assert hasattr(compat, name), name
            n += 1
            if base in handled:
                assert compat.__dict__[name + "_create"]() is None
                assert compat.__dict__[name + "_destroy"]() is None
                n += 2
    assert n == 116, n  # 66 callables + 50 create/destroy pairs

    # dtype casting follows the prefix
    A = np.eye(3) * 2.0
    assert compat.utility_sinv(A).dtype == np.float32
    assert compat.utility_dinv(A).dtype == np.float64
    assert compat.utility_cinv(A).dtype == np.complex64
    U, s, V = compat.utility_csvd(A + 1j * np.eye(3))
    assert U.dtype == np.complex64
    # integer index args are NOT cast (utility_ssv2cv_inds)
    out = compat.utility_ssv2cv_inds(np.arange(6.0), np.array([5, 1]))
    assert out.tolist() == [5.0, 1.0]
