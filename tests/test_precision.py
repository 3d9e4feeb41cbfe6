"""Per-call MXU precision plumbing (ops/precision.py; round-3 VERDICT #8).

The process-time matmul mode must be a per-call/config argument threaded all
the way into the fused Pallas kernels — not import-frozen env state.  On CPU
the XLA ``precision`` argument is a no-op, but the Pallas "high" mode is a
HAND-ROLLED bf16 hi/lo split (ops/pallas_afstft._mm), so its error vs
"highest" is real even in interpreter mode: a nonzero, sub-budget deviation
proves the argument actually reaches the kernel.  The full on-device error
ordering (default >> high > 0) is asserted by
``scripts/hot_precision_bench.py --check`` on the TPU.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from spatial_audio_framework_tpu.models import ambi_bin
from spatial_audio_framework_tpu.ops import precision as _prec


def _render(mode, wri, x):
    cfg = ambi_bin.AmbiBinConfig(order=3, method="magls", mxu_precision=mode)
    st = ambi_bin.init_state_batched(cfg, x.shape[0])
    y, _ = ambi_bin.process_ri_batched(cfg, wri, st, x)
    return np.asarray(y)


@pytest.fixture(scope="module")
def flagship_block():
    cfg = ambi_bin.AmbiBinConfig(order=3, method="magls")
    wri = ambi_bin.design_ri(cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (4, cfg.nsh, 16 * 128))
                    .astype(np.float32))
    return wri, x


@pytest.mark.goldens
def test_mxu_mode_reaches_the_kernel(flagship_block):
    wri, x = flagship_block
    y_exact = _render("highest", wri, x)
    y_high = _render("high", wri, x)
    err = float(np.abs(y_high - y_exact).max())
    # nonzero: the hand-rolled f32x3 split ran (the per-call argument is
    # alive end-to-end); sub-budget: within the 1e-4 C-parity envelope
    assert 0.0 < err < 1e-4, err


def test_f32x3_alias_is_high(flagship_block):
    wri, x = flagship_block
    assert np.array_equal(_render("f32x3", wri, x), _render("high", wri, x))


def test_none_follows_process_default(flagship_block):
    wri, x = flagship_block
    old = _prec.hot_mode()
    try:
        _prec.set_hot_precision("highest")
        y_none = _render(None, wri, x)
        assert np.array_equal(y_none, _render("highest", wri, x))
        # switching the process default AFTER traces exist must still take
        # effect (the round-3 import-frozen trap): mode resolution happens
        # outside the jit boundary
        _prec.set_hot_precision("high")
        y_none2 = _render(None, wri, x)
        assert np.array_equal(y_none2, _render("high", wri, x))
        assert not np.array_equal(y_none, y_none2)
    finally:
        _prec.set_hot_precision(old)


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="default|high|highest"):
        _prec.normalize_mode("fast")
    from spatial_audio_framework_tpu.models._common import SafConfigError
    with pytest.raises(SafConfigError, match="invalid MXU precision"):
        ambi_bin.AmbiBinConfig(order=1, mxu_precision="bogus")


def test_env_fallback_never_crashes_import(monkeypatch):
    monkeypatch.setenv("SAF_TPU_MATMUL_PRECISION", "garbage")
    with pytest.warns(UserWarning, match="falling back"):
        assert _prec._mode_from_env() == "high"
    monkeypatch.setenv("SAF_TPU_MATMUL_PRECISION", "f32x3")
    assert _prec._mode_from_env() == "high"
    monkeypatch.delenv("SAF_TPU_MATMUL_PRECISION")
    monkeypatch.setenv("SAF_TPU_MXU_PRECISION", "highest")  # legacy var
    with pytest.warns(DeprecationWarning):
        assert _prec._mode_from_env() == "highest"
