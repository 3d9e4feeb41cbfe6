"""Covariance-Domain Framework for Spatial Audio Processing (CDF4SAP).

Counterpart of ``saf_cdf4sap`` (Vilkamo, Backstrom & Kuntz 2013): given input
covariance Cx, target covariance Cy and a prototype matrix Q, find the
optimal mixing matrix M (and residual covariance Cr) such that
M·Cx·Mᴴ ≈ Cy while M stays maximally close to Q.

Backend-agnostic and batched: all operations are matrix ops on the last two
axes, so a (nBands, ...) stack solves every band in one call — on device
(jnp) inside an analysis/synthesis jit, or in NumPy at design time.
Real (saf_cdf4sap.c:270 ``formulate_M_and_Cr``) and complex
(saf_cdf4sap.c:404 ``formulate_M_and_Cr_cmplx``) variants share one
implementation.
"""
from __future__ import annotations

import numpy as np


def _xp(*arrays):
    for a in arrays:
        if type(a).__module__.startswith("jax"):
            import jax.numpy as jnp

            return jnp
    return np


def formulate_M_and_Cr(Cx, Cy, Q, use_energy: bool = False, reg: float = 1e-2):
    """Returns (M, Cr).

    Cx: (..., nX, nX), Cy: (..., nY, nY), Q: (..., nY, nX) — real or complex.
    M: (..., nY, nX); Cr: (..., nY, nY) (zeros if use_energy).
    """
    xp = _xp(Cx, Cy, Q)
    Cx, Cy, Q = xp.asarray(Cx), xp.asarray(Cy), xp.asarray(Q)
    nX = Cx.shape[-1]
    nY = Cy.shape[-1]
    is_cplx = xp.iscomplexobj(Cx) or xp.iscomplexobj(Cy) or xp.iscomplexobj(Q)

    def H(a):
        return xp.conj(xp.swapaxes(a, -1, -2)) if is_cplx else xp.swapaxes(a, -1, -2)

    # Ky = U_Cy sqrt(S_Cy)  (saf_cdf4sap.c:293-300)
    U_cy, s_cy, _ = xp.linalg.svd(Cy)
    Ky = U_cy * xp.sqrt(xp.maximum(s_cy, 2.23e-20))[..., None, :]

    # Kx = U_Cx sqrt(S_Cx); regularised inverse (saf_cdf4sap.c:302-326)
    U_cx, s_cx, _ = xp.linalg.svd(Cx)
    s_sqrt = xp.sqrt(xp.maximum(s_cx, 2.23e-20))
    Kx = U_cx * s_sqrt[..., None, :]
    limit = xp.max(s_sqrt, axis=-1, keepdims=True) * reg + 2.23e-13
    s_inv = 1.0 / xp.maximum(s_sqrt, limit)
    Kx_reg_inv = s_inv[..., :, None] * H(U_cx)

    # normalisation matrix G_hat (saf_cdf4sap.c:328-344)
    G_full = Q @ Cx @ H(Q)
    g_diag = xp.real(xp.diagonal(G_full, axis1=-2, axis2=-1))
    g_lim = xp.max(g_diag, axis=-1, keepdims=True) * 0.001 + 2.23e-13
    cy_diag = xp.real(xp.diagonal(Cy, axis1=-2, axis2=-1))
    g_hat = xp.sqrt(xp.maximum(cy_diag, 2.23e-13) / xp.maximum(g_diag, g_lim))

    # optimal P via SVD of Kxᴴ Qᴴ G_hatᴴ Ky (saf_cdf4sap.c:346-375)
    A = H(Kx) @ H(Q) @ (g_hat[..., :, None] * Ky)
    U, _, Vh = xp.linalg.svd(A)
    V = H(Vh)
    lam = xp.zeros((nY, nX), dtype=A.dtype)
    if xp is np:
        lam[: min(nX, nY), : min(nX, nY)] = np.eye(min(nX, nY))
    else:
        lam = lam.at[: min(nX, nY), : min(nX, nY)].set(xp.eye(min(nX, nY), dtype=A.dtype))
    P = V @ lam @ H(U)

    # M and residual covariance (saf_cdf4sap.c:377-390)
    M = Ky @ P @ Kx_reg_inv
    Cy_tilde = M @ Cx @ H(M)
    Cr = Cy - Cy_tilde

    if use_energy:
        cyt_diag = xp.real(xp.diagonal(Cy_tilde, axis1=-2, axis2=-1))
        g = xp.sqrt(xp.maximum(cy_diag, 2.23e-20) / (cyt_diag + 2.23e-7))
        M = g[..., :, None] * M
        Cr = xp.zeros_like(Cr)
    return M, Cr


def formulate_M_and_Cr_ri(Cx_ri, Cy_ri, Q_ri, use_energy: bool = False,
                          reg: float = 1e-2):
    """Complex formulate_M_and_Cr in split real/imaginary arithmetic, for
    TPU paths that must avoid complex64.

    The [[A,-B],[B,A]] embedding is a *-ring homomorphism, and the CDF
    construction is invariant to the (unitary) choice of the Cx/Cy square
    roots and to orthogonal mixing inside the embedding's duplicated
    singular pairs, so running the real implementation verbatim on the
    embedded matrices yields exactly the embedding of the complex result
    (the top-2k singular cut always lands on a pair boundary because the
    embedded spectrum is doubled).
    """
    from spatial_audio_framework_tpu.ops import herm_ri as H

    nY, nX = Q_ri[0].shape[-2:]
    if nX == 2 and nY == 2:
        return _formulate_2x2_ri(Cx_ri, Cy_ri, Q_ri, use_energy, reg)
    M_e, Cr_e = formulate_M_and_Cr(H.herm_embed(Cx_ri), H.herm_embed(Cy_ri),
                                   H.embed_general(Q_ri), use_energy, reg)
    return H.extract_embedded(M_e, nY, nX), H.extract_embedded(Cr_e, nY, nY)


def _formulate_2x2_ri(Cx_ri, Cy_ri, Q_ri, use_energy: bool, reg: float):
    """The 2×2 case in closed form (herm_ri.herm_eig_2x2 / svd_2x2): the
    generic path's three batched SVDs lower to iterative Jacobi sweeps on
    TPU, which dominates the HADES/spreader synthesis cost for binaural
    (Q = 2) deployments.  Same recipe as formulate_M_and_Cr."""
    import jax.numpy as jnp

    from spatial_audio_framework_tpu.ops import herm_ri as H

    def diag_re(C):
        return jnp.diagonal(C[0], axis1=-2, axis2=-1)

    # Ky = U_Cy sqrt(S_Cy)
    sy, Uy = H.herm_eig_2x2(Cy_ri)
    ry = jnp.sqrt(jnp.maximum(sy, 2.23e-20))[..., None, :]
    Ky = (Uy[0] * ry, Uy[1] * ry)
    # Kx and its regularised inverse
    sx, Ux = H.herm_eig_2x2(Cx_ri)
    s_sqrt = jnp.sqrt(jnp.maximum(sx, 2.23e-20))
    Kx = (Ux[0] * s_sqrt[..., None, :], Ux[1] * s_sqrt[..., None, :])
    limit = jnp.max(s_sqrt, axis=-1, keepdims=True) * reg + 2.23e-13
    s_inv = (1.0 / jnp.maximum(s_sqrt, limit))[..., :, None]
    UxH = H.chermitian(Ux)
    Kx_reg_inv = (s_inv * UxH[0], s_inv * UxH[1])
    # normalisation g_hat
    G_full = H.cmatmul(H.cmatmul(Q_ri, Cx_ri), H.chermitian(Q_ri))
    g_diag = diag_re(G_full)
    g_lim = jnp.max(g_diag, axis=-1, keepdims=True) * 0.001 + 2.23e-13
    cy_diag = diag_re(Cy_ri)
    g_hat = jnp.sqrt(jnp.maximum(cy_diag, 2.23e-13)
                     / jnp.maximum(g_diag, g_lim))[..., :, None]
    # optimal P from the closed-form SVD
    A = H.cmatmul(H.cmatmul(H.chermitian(Kx), H.chermitian(Q_ri)),
                  (g_hat * Ky[0], g_hat * Ky[1]))
    U, _, V = H.svd_2x2(A)
    P = H.cmatmul(V, H.chermitian(U))
    M = H.cmatmul(H.cmatmul(Ky, P), Kx_reg_inv)
    Cy_tilde = H.cmatmul(H.cmatmul(M, Cx_ri), H.chermitian(M))
    Cr = (Cy_ri[0] - Cy_tilde[0], Cy_ri[1] - Cy_tilde[1])
    if use_energy:
        cyt_diag = diag_re(Cy_tilde)
        g = jnp.sqrt(jnp.maximum(cy_diag, 2.23e-20)
                     / (cyt_diag + 2.23e-7))[..., :, None]
        M = (g * M[0], g * M[1])
        Cr = (jnp.zeros_like(Cr[0]), jnp.zeros_like(Cr[1]))
    return M, Cr


def formulate_M_and_Cr_cmplx(Cx, Cy, Q, use_energy: bool = False,
                             reg: float = 1e-2):
    """Complex variant (saf_cdf4sap.c:404) — same math via the shared
    implementation; kept for API parity."""
    xp = _xp(Cx, Cy, Q)
    return formulate_M_and_Cr(xp.asarray(Cx).astype(complex if xp is np else None),
                              Cy, Q, use_energy, reg)
