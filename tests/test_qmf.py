"""QMF round-trip tests (test__utilities_module.c saf_qmf recipe)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.ops.qmf import QMF


@pytest.mark.parametrize("hybrid", [False, True])
def test_qmf_reconstruction(hybrid):
    hop = 128
    cfg = QMF(hop=hop, hybrid=hybrid)
    rng = np.random.default_rng(0)
    n_ch, H = 3, 80
    x = rng.uniform(-1, 1, (n_ch, H * hop)).astype(np.float32)
    st = cfg.init_state(n_ch, n_ch)
    spec, st = jax.jit(cfg.analysis)(st, jnp.asarray(x))
    assert spec.shape == (cfg.n_bands, n_ch, H)
    y, st = jax.jit(cfg.synthesis)(st, spec)
    y = np.asarray(y)
    d = cfg.proc_delay
    err = np.abs(y[:, d:] - x[:, : x.shape[1] - d])
    assert err.max() < 0.01, err.max()


def test_qmf_block_invariance():
    hop = 64
    cfg = QMF(hop=hop, hybrid=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 48 * hop)).astype(np.float32)
    st = cfg.init_state(2, 2)
    big, _ = jax.jit(cfg.analysis)(st, jnp.asarray(x))
    ana = jax.jit(cfg.analysis)
    st = cfg.init_state(2, 2)
    outs = []
    for i in range(0, 48, 8):
        o, st = ana(st, jnp.asarray(x[:, i * hop:(i + 8) * hop]))
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.asarray(big), np.concatenate(outs, -1),
                               atol=1e-5)


def test_qmf_centre_freqs():
    cfg = QMF(hop=128, hybrid=True)
    f = cfg.centre_freqs(48000.0)
    assert f.shape == (135,)
    assert np.all(np.diff(f) > 0)  # ascending spectral order
    uni = QMF(hop=128, hybrid=False).centre_freqs(48000.0)
    np.testing.assert_allclose(f[10:], uni[3:], atol=1e-3)
