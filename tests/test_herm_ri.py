"""ops.herm_ri + the RI activity-map generators vs their complex versions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_audio_framework_tpu.modules import sh_est
from spatial_audio_framework_tpu.ops import herm_ri as H


def _rand_herm(n, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    X = (rng.normal(size=batch + (n, 3 * n))
         + 1j * rng.normal(size=batch + (n, 3 * n)))
    C = (X @ np.swapaxes(X.conj(), -1, -2) / (3 * n)).astype(np.complex64)
    return C


def _ri(C):
    return jnp.asarray(C.real), jnp.asarray(C.imag)


def test_herm_solve_matches_complex():
    C = _rand_herm(12, 1)
    rng = np.random.default_rng(2)
    B = (rng.normal(size=(12, 5)) + 1j * rng.normal(size=(12, 5))).astype(
        np.complex64)
    Xre, Xim = H.herm_solve(_ri(C), (jnp.asarray(B.real),
                                     jnp.asarray(B.imag)))
    X_ref = np.linalg.solve(C, B)
    np.testing.assert_allclose(np.asarray(Xre), X_ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Xim), X_ref.imag, atol=1e-4)


def test_herm_inv_and_quadforms():
    C = _rand_herm(8, 3)
    inv = H.join(H.herm_inv(_ri(C)))
    np.testing.assert_allclose(inv, np.linalg.inv(C), atol=1e-4)

    rng = np.random.default_rng(4)
    W = (rng.normal(size=(8, 6)) + 1j * rng.normal(size=(8, 6))).astype(
        np.complex64)
    Wri = (jnp.asarray(W.real), jnp.asarray(W.imag))
    qh = np.asarray(H.herm_quadform(_ri(C), Wri))
    qt = np.asarray(H.quadform_trans(_ri(C), Wri))
    ref_h = np.real(np.einsum("sg,st,tg->g", W.conj(), C, W))
    ref_t = np.real(np.einsum("sg,st,tg->g", W, C, W))
    np.testing.assert_allclose(qh, ref_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(qt, ref_t, rtol=1e-4, atol=1e-4)


def test_noise_projector_matches_complex():
    C = _rand_herm(10, 5)
    K = 2
    Pre, Pim = H.noise_projector(_ri(C), K)
    _, V = np.linalg.eigh(C)
    Vn = V[:, : 10 - K]
    P_ref = Vn @ Vn.conj().T
    np.testing.assert_allclose(np.asarray(Pre), P_ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Pim), P_ref.imag, atol=1e-4)


@pytest.mark.parametrize("batch", [(), (3,)])
@pytest.mark.goldens
def test_map_generators_ri_vs_complex(batch):
    n, g = 16, 40
    C = _rand_herm(n, 7, batch)
    rng = np.random.default_rng(8)
    Y = rng.normal(size=(n, g)).astype(np.float32)
    Cri, Cj, Yj = _ri(C), jnp.asarray(C), jnp.asarray(Y)

    p0 = np.asarray(sh_est.generate_pwd_map(Cj, Yj.astype(jnp.complex64)))
    p1 = np.asarray(sh_est.generate_pwd_map_ri(Cri, Yj))
    np.testing.assert_allclose(p1, p0, rtol=1e-4)

    m0 = np.asarray(sh_est.generate_mvdr_map(Cj, Yj.astype(jnp.complex64)))
    m1 = np.asarray(sh_est.generate_mvdr_map_ri(Cri, Yj))
    np.testing.assert_allclose(m1, m0, rtol=1e-3)

    u0 = np.asarray(sh_est.generate_music_map(Cj, Yj.astype(jnp.complex64), 2))
    u1 = np.asarray(sh_est.generate_music_map_ri(Cri, Yj, 2))
    np.testing.assert_allclose(u1, u0, rtol=1e-3)

    # minnorm: normalisation differs by a global (phase-dependent) scale —
    # compare correlation per batch element
    n0 = np.asarray(sh_est.generate_minnorm_map(Cj, Yj.astype(jnp.complex64), 2))
    n1 = np.asarray(sh_est.generate_minnorm_map_ri(Cri, Yj, 2))
    corr = np.corrcoef(n0.reshape(-1, g)[0], n1.reshape(-1, g)[0])[0, 1]
    assert corr > 0.999


def test_cropac_ri_vs_complex_and_jittable():
    n, g = 9, 30
    C = _rand_herm(n, 9)
    rng = np.random.default_rng(10)
    Y = rng.normal(size=(n, g)).astype(np.float32)
    c0 = np.asarray(sh_est.generate_cropac_lcmv_map(C, Y))
    fn = jax.jit(lambda cri, y: sh_est.generate_cropac_lcmv_map_ri(cri, y))
    c1 = np.asarray(fn(_ri(C), jnp.asarray(Y)))
    np.testing.assert_allclose(c1, c0, rtol=1e-3, atol=1e-5 * np.abs(c0).max())
