"""ops/herm_ri.cgesv_ri vs the compiled C reference's utility_cglslv.

Fixture: tests/goldens/cglslv_probe_rows.txt — 8 deterministic 6x6 complex
systems and LAPACK f32 cgesv solutions, printed in C99 hex-float by
tools/c_goldens/cglslv_probe.c linked against the SAME libsaf.a + OpenBLAS
the golden generators use.  cgesv_ri mirrors cgetf2/cgetrs operation order
(cabs1 pivoting, Smith-division column scaling, cgeru/ctrsm ordering), so
it must track the C's f32 rounding to well under the generic-LU noise
floor: observed worst 5.2e-7 relative (residual = OpenBLAS kernel FMA) vs
~3.5e-6 for an independently-ordered f32 LU.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from spatial_audio_framework_tpu.ops.herm_ri import cgesv_ri, herm_solve

ROWS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "goldens", "cglslv_probe_rows.txt")


def load_rows():
    out = []
    for ln in open(ROWS):
        v = [float.fromhex(t) for t in ln.split()]
        A = np.array(v[:72], np.float32).reshape(6, 6, 2)
        b = np.array(v[72:84], np.float32).reshape(6, 2)
        x = np.array(v[84:96], np.float32).reshape(6, 2)
        out.append((A, b, x))
    return out


def test_cgesv_ri_tracks_lapack_f32_rounding():
    worst = 0.0
    for A, b, x in load_rows():
        xr, xi = cgesv_ri((jnp.asarray(A[..., 0]), jnp.asarray(A[..., 1])),
                          (jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1])))
        ours = np.stack([np.asarray(xr), np.asarray(xi)], -1)
        worst = max(worst, float(np.abs(ours - x).max() / np.abs(x).max()))
    assert worst < 2e-6, worst  # op-order-faithful; FMA-only residual


def test_cgesv_ri_batched_matches_loop():
    rows = load_rows()
    Ar = jnp.asarray(np.stack([A[..., 0] for A, _, _ in rows]))
    Ai = jnp.asarray(np.stack([A[..., 1] for A, _, _ in rows]))
    br = jnp.asarray(np.stack([b[:, 0] for _, b, _ in rows]))
    bi = jnp.asarray(np.stack([b[:, 1] for _, b, _ in rows]))
    xr, xi = cgesv_ri((Ar, Ai), (br, bi))
    for k, (A, b, _) in enumerate(rows):
        sr, si = cgesv_ri((jnp.asarray(A[..., 0]), jnp.asarray(A[..., 1])),
                          (jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1])))
        assert np.array_equal(np.asarray(xr[k]), np.asarray(sr))
        assert np.array_equal(np.asarray(xi[k]), np.asarray(si))


@pytest.mark.goldens
def test_cgesv_ri_solves_hermitian_like_herm_solve():
    # sanity on the BMVDR use case: Hermitian + diagonal loading
    rng = np.random.default_rng(5)
    X = (rng.standard_normal((3, 6, 6)) + 1j * rng.standard_normal((3, 6, 6))
         ).astype(np.complex64)
    C = X @ X.conj().transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.complex64)
    b = (rng.standard_normal((3, 6)) + 1j * rng.standard_normal((3, 6))
         ).astype(np.complex64)
    xr, xi = cgesv_ri((jnp.asarray(C.real), jnp.asarray(C.imag)),
                      (jnp.asarray(b.real), jnp.asarray(b.imag)))
    hr, hi = herm_solve((jnp.asarray(C.real), jnp.asarray(C.imag)),
                        (jnp.asarray(b.real)[..., None],
                         jnp.asarray(b.imag)[..., None]))
    ref = np.asarray(hr)[..., 0] + 1j * np.asarray(hi)[..., 0]
    ours = np.asarray(xr) + 1j * np.asarray(xi)
    assert np.abs(ours - ref).max() < 1e-5
