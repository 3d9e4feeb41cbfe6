"""Process-time MXU matmul precision policy — ONE policy for both halves of
the pipeline (XLA einsum/matmul paths AND the fused Pallas kernels).

XLA:TPU lowers f32 matmuls onto the bf16 MXU by splitting each operand into
bf16 limbs and accumulating several passes:

* ``"default"``  — 1 pass  (bf16 inputs; ~2^-8 relative error)
* ``"high"``     — 3 passes (the "bf16_3x"/f32x3 scheme; ~2^-21)
* ``"highest"``  — 6 passes (full f32; ~2^-24)

The C reference (saf_utility_veclib) computes in exact f32, so design-time
code here stays at ``EXACT`` (HIGHEST).  The per-block *process* paths use
the HOT mode (default ``"high"``): the 3-pass scheme doubles effective MXU
throughput at a relative error (~5e-7) far inside the 1e-4 C-parity budget.
The fused Pallas kernels implement the same scheme by hand (Mosaic does not
lower ``Precision.HIGH``; see ops/pallas_afstft._mm) — "f32x3" is accepted
as an alias of "high" everywhere.

Per-call control: every fused-kernel entry point and render path takes an
optional ``mxu_mode`` argument ("default"|"high"|"highest", None = this
module's HOT mode), threaded from model configs (e.g.
``AmbiBinConfig.mxu_precision``).  The environment variable is a process
default only, not an import-frozen trap: :func:`set_hot_precision` changes
the mode for traces executed after the call, and ``mxu_mode`` overrides it
per call.

Environment: ``SAF_TPU_MATMUL_PRECISION=default|high|highest`` (canonical;
``f32x3`` accepted).  The legacy ``SAF_TPU_MXU_PRECISION`` variable — which
used to control only the Pallas kernels, with a different vocabulary — is
honored as a fallback with a deprecation warning; if both are set and
disagree, the canonical variable wins.  An invalid value warns and falls
back to "high" (never crashes the whole package at import).
"""
from __future__ import annotations

import os
import warnings
from typing import Optional

import jax

_XLA = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
_ALIASES = {"f32x3": "high"}
VALID_MODES = tuple(_XLA)


def normalize_mode(mode: str) -> str:
    """Canonical mode string; raises ValueError with the valid vocabulary."""
    m = str(mode).lower()
    m = _ALIASES.get(m, m)
    if m not in _XLA:
        raise ValueError(
            f"invalid MXU precision mode {mode!r}: expected one of "
            f"{'|'.join(VALID_MODES)} (or the alias 'f32x3' == 'high')")
    return m


def to_xla(mode: str) -> jax.lax.Precision:
    """Canonical mode string → jax.lax.Precision for XLA matmul/einsum."""
    return _XLA[normalize_mode(mode)]


def _mode_from_env() -> str:
    raw = os.environ.get("SAF_TPU_MATMUL_PRECISION")
    legacy = os.environ.get("SAF_TPU_MXU_PRECISION")
    if legacy is not None:
        warnings.warn(
            "SAF_TPU_MXU_PRECISION is deprecated; both the XLA paths and "
            "the Pallas kernels are controlled by SAF_TPU_MATMUL_PRECISION "
            "(default|high|highest; 'f32x3' == 'high')",
            DeprecationWarning, stacklevel=3)
    chosen = raw if raw is not None else legacy
    if chosen is None:
        return "high"
    try:
        mode = normalize_mode(chosen)
    except ValueError as e:
        warnings.warn(f"{e}; falling back to 'high'", stacklevel=3)
        return "high"
    if raw is not None and legacy is not None:
        try:
            if normalize_mode(legacy) != mode:
                warnings.warn(
                    "SAF_TPU_MATMUL_PRECISION and SAF_TPU_MXU_PRECISION "
                    f"disagree ({raw!r} vs {legacy!r}); using "
                    f"SAF_TPU_MATMUL_PRECISION={mode!r} for BOTH the XLA "
                    "and Pallas halves of the pipeline", stacklevel=3)
        except ValueError:
            pass
    return mode


_HOT_MODE = _mode_from_env()

# jax.lax.Precision for process-time XLA matmuls (legacy constant; prefer
# resolve_mode()/to_xla() in code that supports per-call override)
HOT = _XLA[_HOT_MODE]

# Exact-f32 precision for design-time / golden-critical matmuls.
EXACT = jax.lax.Precision.HIGHEST


def hot_mode() -> str:
    """The current process-default mode string ('default'|'high'|'highest')."""
    return _HOT_MODE


def resolve_mode(mode: Optional[str] = None) -> str:
    """Per-call mode resolution: explicit argument wins, else the process
    HOT default.  Call this OUTSIDE jit boundaries (pass the result as a
    static argument) so a later :func:`set_hot_precision` is never masked
    by a stale trace cache."""
    return _HOT_MODE if mode is None else normalize_mode(mode)


def set_hot_precision(mode: str) -> None:
    """Set the process-default matmul precision ('default'|'high'|'highest',
    'f32x3' accepted as 'high').

    Takes effect for traces executed after the call (already-jitted
    executables keep the precision they were traced with).
    """
    global HOT, _HOT_MODE
    _HOT_MODE = normalize_mode(mode)
    HOT = _XLA[_HOT_MODE]
