"""SH module tests, mirroring the reference's recipes (test__sh_module.c):
orthonormality over t-designs, real/complex consistency, rotation invariants."""
import numpy as np
import pytest

from spatial_audio_framework_tpu.modules import sh
from spatial_audio_framework_tpu.utils import geometry as geo, presets


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 6, 7, 10])
def test_sh_real_orthonormality(order):
    """(4π/nDirs)·Y Yᵀ == I over a 2N t-design (test__sh_module.c:27-80)."""
    dirs_deg = presets.tdesign(2 * order)
    Y = sh.get_rsh(order, dirs_deg)  # includes sqrt(4π) scaling
    G = Y @ Y.T / dirs_deg.shape[0]
    assert np.abs(G - np.eye(Y.shape[0])).max() < 1e-5


def test_sh_complex_vs_scipy():
    from scipy.special import sph_harm_y

    rng = np.random.default_rng(3)
    dirs = np.stack([rng.uniform(0, 2 * np.pi, 16), rng.uniform(0, np.pi, 16)], -1)
    Y = sh.get_sh_complex(4, dirs)
    for n in range(5):
        for m in range(-n, n + 1):
            ref = sph_harm_y(n, m, dirs[:, 1], dirs[:, 0])
            np.testing.assert_allclose(Y[n * n + n + m], ref, atol=1e-12)


def test_complex2real_basis_and_coeffs():
    rng = np.random.default_rng(4)
    dirs = np.stack([rng.uniform(0, 2 * np.pi, 8), rng.uniform(0, np.pi, 8)], -1)
    order = 3
    Yr = sh.get_sh_real(order, dirs)
    Yc = sh.get_sh_complex(order, dirs)
    T = sh.complex2real_sh_mtx(order)
    # Basis transform: Y_real = Re{T Y_complex}, purely real.
    np.testing.assert_allclose((T @ Yc).imag, 0, atol=1e-12)
    np.testing.assert_allclose((T @ Yc).real, Yr, atol=1e-12)
    # Unitarity and inverse.
    np.testing.assert_allclose(T @ T.conj().T, np.eye(T.shape[0]), atol=1e-12)
    np.testing.assert_allclose(sh.real2complex_sh_mtx(order), T.conj().T, atol=1e-12)


@pytest.mark.parametrize("order", [1, 3, 7])
def test_sh_rotation(order):
    """M(R) Y(u) == Y(R u); M orthogonal (test__sh_module.c getSHrotMtxReal)."""
    R = geo.yaw_pitch_roll2_rzyx(0.31, -0.42, 0.77)
    M = sh.get_sh_rot_mtx_real(R, order)
    rng = np.random.default_rng(5)
    dirs = np.stack([rng.uniform(0, 2 * np.pi, 24), rng.uniform(0, np.pi, 24)], -1)
    Y = sh.get_sh_real(order, dirs)
    u = np.stack([np.sin(dirs[:, 1]) * np.cos(dirs[:, 0]),
                  np.sin(dirs[:, 1]) * np.sin(dirs[:, 0]),
                  np.cos(dirs[:, 1])], -1)
    ur = u @ R.T
    dirs_rot = np.stack([np.arctan2(ur[:, 1], ur[:, 0]),
                         np.arccos(np.clip(ur[:, 2], -1, 1))], -1)
    Y_rot = sh.get_sh_real(order, dirs_rot)
    np.testing.assert_allclose(M @ Y, Y_rot, atol=1e-10)
    np.testing.assert_allclose(M @ M.T, np.eye(M.shape[0]), atol=1e-10)


def test_sh_rotation_jax_matches_numpy():
    import jax.numpy as jnp

    R = geo.yaw_pitch_roll2_rzyx(1.1, 0.2, -0.4)
    M_np = sh.get_sh_rot_mtx_real(R, 4)
    M_jx = np.asarray(sh.get_sh_rot_mtx_real(jnp.asarray(R, dtype=jnp.float32), 4))
    np.testing.assert_allclose(M_np, M_jx, atol=1e-5)


def test_unnorm_legendre_golden():
    """Golden values akin to test__utilities_module.c Legendre checks."""
    from scipy.special import assoc_legendre_p

    x = np.array([-0.8, -0.2, 0.3, 0.9])
    for n in [1, 3, 6]:
        P = sh.unnorm_legendre(n, x)
        for m in range(n + 1):
            ref = np.squeeze(assoc_legendre_p(n, m, x))
            np.testing.assert_allclose(P[m], ref, rtol=1e-9, atol=1e-10)


def test_beam_weights():
    """Axisymmetric beam weights: unity response in look direction."""
    for order in [1, 2, 3, 4]:
        for fn in [sh.beam_weights_cardioid, sh.beam_weights_hypercardioid,
                   sh.beam_weights_max_ev]:
            b = fn(order)
            # steer to an arbitrary direction and evaluate there
            c_nm = sh.rotate_axis_coeffs_real(order, b, 0.7, 1.9)
            Y = sh.get_sh_real(order, np.array([[1.9, 0.7]]))[:, 0]
            assert abs(float(c_nm @ Y) - 1.0) < 1e-4, (order, fn.__name__)
