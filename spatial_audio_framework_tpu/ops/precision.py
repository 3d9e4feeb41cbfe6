"""Process-time MXU matmul precision policy.

XLA:TPU lowers f32 matmuls onto the bf16 MXU by splitting each operand into
bf16 limbs and accumulating several passes:

* ``Precision.DEFAULT``  — 1 pass  (bf16 inputs; ~2^-8 relative error)
* ``Precision.HIGH``     — 3 passes (the "bf16_3x"/f32x3 scheme; ~2^-21)
* ``Precision.HIGHEST``  — 6 passes (full f32; ~2^-24)

The C reference (saf_utility_veclib) computes in exact f32, so design-time
code here stays at ``HIGHEST``.  The per-block *process* paths use ``HOT``
(default ``HIGH``): the 3-pass scheme doubles effective MXU throughput at a
relative error (~5e-7) far inside the 1e-4 C-parity budget — and it is the
same scheme the fused Pallas kernels already use (ops/pallas_afstft.py
``_MXU_MODE = "f32x3"``), whose end-to-end error vs the compiled C reference
measured 1.7e-5 (bench.py ``max_abs_err_vs_c_reference``).

Override with ``SAF_TPU_MATMUL_PRECISION=highest|high|default`` (read at
import time) or :func:`set_hot_precision` for tests/experiments.
"""
from __future__ import annotations

import os

import jax

_MODES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

HOT = _MODES[os.environ.get("SAF_TPU_MATMUL_PRECISION", "high").lower()]

# Exact-f32 precision for design-time / golden-critical matmuls.
EXACT = jax.lax.Precision.HIGHEST


def set_hot_precision(mode: str) -> None:
    """Set the process-time matmul precision ('default'|'high'|'highest').

    Takes effect for traces executed after the call (already-jitted
    executables keep the precision they were traced with).
    """
    global HOT
    HOT = _MODES[mode.lower()]
