"""Closed-form 2×2 decompositions (ops.herm_ri.herm_eig_2x2 / svd_2x2) and
the CDF4SAP 2×2 fast path, validated independently against numpy and the
golden-tested embedded-SVD path — including the near-rank-1 band where the
AᴴA construction is noise-dominated in f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_audio_framework_tpu.modules import cdf4sap
from spatial_audio_framework_tpu.ops import herm_ri as H


def _join(ri):
    return np.asarray(ri[0]) + 1j * np.asarray(ri[1])


def test_herm_eig_2x2_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((400, 2, 2)) + 1j * rng.standard_normal((400, 2, 2))
    C = (A @ A.conj().swapaxes(-1, -2)).astype(np.complex64)
    w, V = H.herm_eig_2x2(H.split(C))
    w = np.asarray(w)
    Vc = _join(V)
    np.testing.assert_allclose(
        w, np.linalg.eigvalsh(C)[..., ::-1], rtol=1e-5,
        atol=1e-5 * np.abs(w).max())
    R = np.einsum("bij,bj,bkj->bik", Vc, w, Vc.conj())
    assert np.abs(R - C).max() <= 1e-5 * np.abs(C).max()
    I = np.einsum("bij,bik->bjk", Vc.conj(), Vc)
    assert np.abs(I - np.eye(2)).max() <= 1e-5


@pytest.mark.parametrize("ratio", [1.0, 1e-2, 3e-5, 1e-5, 1e-6, 0.0])
def test_svd_2x2_unitary_across_rank_deficiency(ratio):
    """U stays unitary even where AᴴA's second eigenvector is f32-noise
    dominated (s2/s1 ~ 1e-5..1e-6)."""
    rng = np.random.default_rng(int(ratio * 1e7) + 3)
    q1, _ = np.linalg.qr(rng.standard_normal((2, 2))
                         + 1j * rng.standard_normal((2, 2)))
    q2, _ = np.linalg.qr(rng.standard_normal((2, 2))
                         + 1j * rng.standard_normal((2, 2)))
    A = (q1 @ np.diag([1.0, ratio]) @ q2.conj().T).astype(np.complex64)
    A = np.broadcast_to(A, (8, 2, 2))
    U, s, V = H.svd_2x2(H.split(A))
    Uc, Vc = _join(U), _join(V)
    for M in (Uc, Vc):
        I = np.einsum("bij,bik->bjk", M.conj(), M)
        assert np.abs(I - np.eye(2)).max() <= 1e-4, ratio
    R = np.einsum("bij,bj,bkj->bik", Uc, np.asarray(s), Vc.conj())
    assert np.abs(R - A).max() <= 1e-4


@pytest.mark.parametrize("use_energy", [False, True])
@pytest.mark.goldens
def test_cdf4sap_2x2_fast_path_matches_embedded(use_energy):
    """The closed-form 2×2 CDF4SAP equals the golden-tested embedded-SVD
    path (which HADES/spreader previously routed through)."""
    rng = np.random.default_rng(7)
    B = 200
    A = rng.standard_normal((B, 2, 2)) + 1j * rng.standard_normal((B, 2, 2))
    Cx = (A @ A.conj().swapaxes(-1, -2)).astype(np.complex64)
    A2 = rng.standard_normal((B, 2, 2)) + 1j * rng.standard_normal((B, 2, 2))
    Cy = (A2 @ A2.conj().swapaxes(-1, -2)).astype(np.complex64)
    Q = (rng.standard_normal((B, 2, 2))
         + 1j * rng.standard_normal((B, 2, 2))).astype(np.complex64)
    Mg_e, Crg_e = cdf4sap.formulate_M_and_Cr(
        H.herm_embed(H.split(Cx)), H.herm_embed(H.split(Cy)),
        H.embed_general(H.split(Q)), use_energy, 0.01)
    Mg = _join(H.extract_embedded(Mg_e, 2, 2))
    Crg = _join(H.extract_embedded(Crg_e, 2, 2))
    Mf, Crf = cdf4sap._formulate_2x2_ri(
        H.split(Cx), H.split(Cy), H.split(Q), use_energy, 0.01)
    assert np.abs(_join(Mf) - Mg).max() <= 2e-4
    assert np.abs(_join(Crf) - Crg).max() <= 2e-4


def test_cheev_2x2_matches_lapack():
    """ops/herm_ri.cheev_2x2 is bit-faithful to LAPACK cheev (the
    reference's utility_cseig backend) — eigenvalues descending by value
    AND eigenvector signs/phases — incl. indefinite and real-off-diagonal
    (clarfg early-exit) cases."""
    import jax
    import jax.numpy as jnp
    from scipy.linalg import lapack

    from spatial_audio_framework_tpu.ops import herm_ri as H

    rng = np.random.default_rng(7)
    As = []
    for i in range(500):
        X = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        A = X @ X.conj().T
        if rng.random() < 0.2:
            A[0, 1] = A[0, 1].real
            A[1, 0] = A[0, 1]
        if rng.random() < 0.3:
            A = A - rng.uniform(0, 2) * np.trace(A).real * np.eye(2)
        As.append(((A + A.conj().T) / 2).astype(np.complex64))
    As = np.stack(As)
    lam, V = jax.jit(H.cheev_2x2)((jnp.asarray(As.real),
                                   jnp.asarray(As.imag)))
    lam = np.asarray(lam)
    Vc = np.asarray(V[0]) + 1j * np.asarray(V[1])
    for i in range(len(As)):
        w, Vl, info = lapack.cheev(As[i], compute_v=1)
        assert info == 0
        wd, Vd = w[::-1], Vl[:, ::-1]
        scale = max(1.0, float(np.abs(As[i]).max()))
        assert np.abs(lam[i] - wd).max() <= 2e-4 * scale, i
        assert np.abs(Vc[i] - Vd).max() <= 3e-4, i
