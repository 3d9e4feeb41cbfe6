"""saf_stft round trip + veclib/sort parity behaviours."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.ops.stft import STFT
from spatial_audio_framework_tpu.ops import veclib as V
from spatial_audio_framework_tpu.utils import sort as S


def test_stft_lti_roundtrip():
    """winsize == hopsize: LTI, exact reconstruction, zero delay
    (test__utilities_module.c:259)."""
    st = STFT(winsize=128, hopsize=128, n_ch_in=2, n_ch_out=2)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 16 * 128)).astype(np.float32)
    s = st.init_state()
    spec, s = jax.jit(st.forward)(s, jnp.asarray(x))
    assert spec.shape == (129, 2, 16)
    y, s = jax.jit(st.backward)(s, spec)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_stft_50_overlap_roundtrip():
    """50% overlap Hann (test__utilities_module.c:318): PR after the delay."""
    win, hop = 128, 64
    st = STFT(winsize=win, hopsize=hop, n_ch_in=1, n_ch_out=1)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 64 * hop)).astype(np.float32)
    s = st.init_state()
    spec, s = jax.jit(st.forward)(s, jnp.asarray(x))
    y, s = jax.jit(st.backward)(s, spec)
    y = np.asarray(y)
    d = win - hop
    err = np.abs(y[:, d + win:] - x[:, win: x.shape[1] - d])
    assert err.max() < 1e-4, err.max()


def test_veclib():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))
    U, s, Vv = V.svd(A)
    np.testing.assert_allclose(U @ np.diag(s) @ Vv.conj().T, A, atol=1e-10)
    H = A @ A.conj().T
    Vm, d = V.seig(H)
    assert (np.diff(d) <= 1e-9).all()  # decreasing
    np.testing.assert_allclose(Vm @ np.diag(d) @ Vm.conj().T, H, atol=1e-9)
    B = rng.standard_normal((5, 2))
    np.testing.assert_allclose(A @ V.glslv(A, B), B, atol=1e-10)
    X = V.chol(H)
    np.testing.assert_allclose(X.conj().T @ X, H, atol=1e-9)
    np.testing.assert_allclose(V.pinv(A) @ A, np.eye(5), atol=1e-9)
    np.testing.assert_allclose(V.glslvt(A, B.T) @ A, B.T, atol=1e-9)
    Pd = V.slslv(H.real + 5 * np.eye(5), B)
    np.testing.assert_allclose((H.real + 5 * np.eye(5)) @ Pd, B, atol=1e-9)


def test_sort_and_grid_search():
    x = np.array([3.0, -1.0, 2.0])
    xs, idx = S.sort_with_indices(x)
    np.testing.assert_array_equal(xs, [-1.0, 2.0, 3.0])
    np.testing.assert_array_equal(idx, [1, 2, 0])
    grid = np.radians(np.array([[0, 0], [90, 0], [0, 90.0]]))
    t = np.radians(np.array([[85.0, 5.0]]))
    assert S.find_closest_grid_points(grid, t)[0] == 1


def test_iminv_imaxv_complex_cabs1():
    """Complex min/max-index selection compares by cabs1 = |Re|+|Im|
    (cblas_icamin/icamax semantics, used by utility_ciminv/cimaxv), NOT the
    modulus: [2.2, 1.5+1.5j] has cabs1 [2.2, 3.0] but modulus [2.2, 2.12]."""
    a = np.array([2.2 + 0.0j, 1.5 + 1.5j])
    assert V.imaxv(a) == 1
    assert V.iminv(a) == 0
    r = np.array([3.0, -5.0, 1.0])
    assert V.imaxv(r) == 1 and V.iminv(r) == 2
