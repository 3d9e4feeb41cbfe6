"""array2sh tests: encoding filters recover SH patterns from a simulated
array (mirrors array2sh_evaluateSHTfilters usage)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.models import array2sh as A2S
from spatial_audio_framework_tpu.utils import presets


@pytest.mark.parametrize("ftype", [A2S.FILTER_TIKHONOV, A2S.FILTER_SOFT_LIM,
                                   A2S.FILTER_Z_STYLE, A2S.FILTER_Z_STYLE_MAXRE])
def test_array2sh_filters_evaluate_well(ftype):
    dirs = presets.mic_preset("eigenmike32")  # (32, 2) radians
    dirs_deg = np.degrees(dirs)
    cfg = A2S.Array2SHConfig(order=3, filter_type=ftype, r=0.042, R=0.042)
    w = A2S.design(cfg, dirs_deg)
    assert np.isfinite(np.asarray(w.W)).all()
    cSH, lSH = A2S.evaluate_filters(cfg, w, dirs_deg)
    freqs = cfg.afstft.centre_freqs(cfg.fs)
    mid = (freqs > 1500) & (freqs < 5000)
    assert cSH[mid].mean() > 0.85, (ftype, cSH[mid].mean())


def test_array2sh_process_shapes_and_omni():
    dirs_deg = np.degrees(presets.mic_preset("eigenmike32"))
    cfg = A2S.Array2SHConfig(order=2, norm="n3d")
    w = A2S.design(cfg, dirs_deg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 16 * 128)).astype(np.float32) * 0.1
    st = A2S.init_state(cfg, 32)
    y, _ = jax.jit(lambda s, xx: A2S.process(cfg, w, s, xx))(st, jnp.asarray(x))
    assert np.asarray(y).shape == (9, 16 * 128)
    assert np.isfinite(np.asarray(y)).all()
