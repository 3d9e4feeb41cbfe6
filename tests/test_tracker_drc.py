"""tracker3d follows a synthetic trajectory (test__tracker_module.c recipe);
ambi_drc compresses loud passages."""
import numpy as np
import jax
import jax.numpy as jnp

from spatial_audio_framework_tpu.modules.tracker import Tracker3D, Tracker3DConfig
from spatial_audio_framework_tpu.models import ambi_drc as DRC


def test_tracker_follows_trajectory():
    cfg = Tracker3DConfig(n_particles=30, dt=0.05, measure_noise_sd=0.1,
                          noise_spec_den=0.5, are_unit_vectors=True,
                          force_kill_distance=0.2)
    cfg.M0 = np.zeros(6); cfg.M0[0] = 1.0
    trk = Tracker3D(cfg, seed=1)
    rng = np.random.default_rng(0)
    errs = []
    for k in range(60):
        azi = np.radians(k * 2.0)  # slowly moving source on the equator
        true = np.array([np.cos(azi), np.sin(azi), 0.0])
        obs = true + rng.normal(0, 0.05, 3)
        obs /= np.linalg.norm(obs)
        pos, var, ids = trk.step(obs[None, :])
        if k > 15:
            assert pos.shape[0] >= 1
            d = np.linalg.norm(pos - true[None, :], axis=-1).min()
            errs.append(d)
    assert np.median(errs) < 0.2, np.median(errs)


def test_tracker_no_obs_decay():
    cfg = Tracker3DConfig(n_particles=20, alpha_death=2.0, beta_death=1.0)
    trk = Tracker3D(cfg, seed=0)
    obs = np.array([[1.0, 0.0, 0.0]])
    for _ in range(10):
        trk.step(obs)
    pos, _, _ = trk.step(obs)
    assert pos.shape[0] >= 1
    # starve it of observations: targets eventually die
    for _ in range(100):
        trk._predict(1)
    pos2, _, _ = trk.step(None)
    assert pos2.shape[0] <= pos.shape[0]


def test_ambi_drc_compresses():
    cfg = DRC.AmbiDrcConfig(order=1, theshold_db=-30.0, ratio=8.0,
                            attack_ms=5.0, release_ms=20.0)
    st = DRC.init_state(cfg)
    rng = np.random.default_rng(0)
    T = 64 * 128
    x = np.zeros((4, T), np.float32)
    x[0] = rng.uniform(-1, 1, T)  # loud omni
    x[1:] = 0.1 * x[0]
    y, st = jax.jit(lambda s, xx: DRC.process(cfg, s, xx))(st, jnp.asarray(x))
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    in_rms = np.sqrt((x[0, : T - d] ** 2).mean())
    out_rms = np.sqrt((y[0, d + 4096:] ** 2).mean())
    # heavily compressed: output well below input level
    assert out_rms < 0.5 * in_rms, (in_rms, out_rms)
    # spatial ratios preserved (all channels get the same gain)
    r_in = x[1, 1000] / x[0, 1000]
    ratio = y[1, d + 5000: d + 6000] / np.maximum(np.abs(y[0, d + 5000: d + 6000]), 1e-9) / np.sign(y[0, d + 5000: d + 6000])
    assert np.allclose(np.abs(ratio), abs(r_in), atol=0.02)
