"""Estimator-behaviour tests (test__sh_module.c style: planted sources are
recovered by sphPWD/sphMUSIC/sphESPRIT; maps peak at source directions)."""
import numpy as np
import pytest

from spatial_audio_framework_tpu.modules import sh, sh_est
from spatial_audio_framework_tpu.utils import presets


def _plant_sources(order, src_dirs_deg, powers, diff_pow=1e-4, seed=0):
    """Covariance of uncorrelated plane waves + diffuse noise (N3D SH)."""
    Y = sh.get_rsh(order, np.asarray(src_dirs_deg, np.float64))  # (nSH, K)
    nsh = Y.shape[0]
    Cx = (Y * np.asarray(powers)) @ Y.T + diff_pow * np.eye(nsh)
    return Cx.astype(np.complex64)


GRID = presets.tdesign(21)  # dense-ish spherical grid (240 dirs)
SRC = np.array([[40.0, 10.0], [-110.0, -20.0]])


def _nearest(grid, dirs):
    from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart

    u = np.asarray(unit_sph2cart(grid, degrees=True))
    v = np.asarray(unit_sph2cart(dirs, degrees=True))
    return np.argmax(u @ v.T, axis=0)  # grid index nearest each dir


@pytest.mark.parametrize("est", ["pwd", "music"])
def test_grid_estimators_recover_sources(est):
    Cx = _plant_sources(3, SRC, [1.0, 0.7])
    fn = sh_est.sph_pwd if est == "pwd" else sh_est.sph_music
    peaks, p = fn(Cx, GRID, 2)
    expect = set(_nearest(GRID, SRC))
    # each found peak is within ~10° of a true source
    from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart
    u = np.asarray(unit_sph2cart(GRID, degrees=True))
    v = np.asarray(unit_sph2cart(SRC, degrees=True))
    for pk in peaks:
        ang = np.degrees(np.arccos(np.clip((u[pk] @ v.T).max(), -1, 1)))
        assert ang < 10.0, (est, pk, ang)
    del expect


def test_maps_peak_at_source():
    order = 3
    Cx = _plant_sources(order, SRC[:1], [1.0])
    dirs_rad = np.stack([np.radians(GRID[:, 0]),
                         np.pi / 2 - np.radians(GRID[:, 1])], -1)
    Y = sh.get_sh_real(order, dirs_rad).astype(np.complex64)
    near = _nearest(GRID, SRC[:1])[0]
    for fn, kw in [(sh_est.generate_pwd_map, {}),
                   (sh_est.generate_mvdr_map, {}),
                   (sh_est.generate_music_map, {"n_sources": 1}),
                   (sh_est.generate_minnorm_map, {"n_sources": 1}),
                   (sh_est.generate_cropac_lcmv_map, {})]:
        p = np.asarray(fn(Cx, Y, **kw))
        from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart
        u = np.asarray(unit_sph2cart(GRID, degrees=True))
        ang = np.degrees(np.arccos(np.clip(u[np.argmax(p)] @ u[near], -1, 1)))
        assert ang < 10.0, (fn.__name__, ang)


def test_sph_esprit_recovers_directions():
    order = 3
    src = np.array([[35.0, 15.0], [-70.0, -25.0], [150.0, 40.0]])
    K = src.shape[0]
    dirs_rad = np.stack([np.radians(src[:, 0]),
                         np.pi / 2 - np.radians(src[:, 1])], -1)
    # SAF's sphESPRIT convention: the subspace comes from signals transformed
    # by conj(T_r2c) (test__sh_module.c:632-647), i.e. CONJUGATED complex-SH
    # steering vectors
    Yc = sh.get_sh_complex(order, dirs_rad).conj()  # (nSH, K)
    # signal subspace of Cx = Yc diag(p) Ycᴴ spans cols(Yc)
    p = np.array([1.0, 0.8, 0.6])
    Cx = (Yc * p) @ Yc.conj().T + 1e-6 * np.eye(Yc.shape[0])
    evals, V = np.linalg.eigh(Cx)
    Us = V[:, ::-1][:, :K]
    est = sh_est.sph_esprit(Us)
    est_deg = np.degrees(est)
    # match each estimate to nearest true source
    from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart
    u_est = np.asarray(unit_sph2cart(est_deg, degrees=True))
    u_true = np.asarray(unit_sph2cart(src, degrees=True))
    for ue in u_est:
        ang = np.degrees(np.arccos(np.clip((ue @ u_true.T).max(), -1, 1)))
        assert ang < 5.0, (est_deg, src)
