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
    M_e, Cr_e = formulate_M_and_Cr(H.herm_embed(Cx_ri), H.herm_embed(Cy_ri),
                                   H.embed_general(Q_ri), use_energy, reg)
    return H.extract_embedded(M_e, nY, nX), H.extract_embedded(Cr_e, nY, nY)


def formulate_M_and_Cr_cmplx(Cx, Cy, Q, use_energy: bool = False,
                             reg: float = 1e-2):
    """Complex variant (saf_cdf4sap.c:404) — same math via the shared
    implementation; kept for API parity."""
    xp = _xp(Cx, Cy, Q)
    return formulate_M_and_Cr(xp.asarray(Cx).astype(complex if xp is np else None),
                              Cy, Q, use_energy, reg)
