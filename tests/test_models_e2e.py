"""End-to-end example/model tests, mirroring the reference's physics-based
example tests (test__examples.c:29-107: encode noise at a lateral direction,
binauralise, assert the correct ear is louder; rotation flips it)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.models import (ambi_bin, ambi_enc, beamformer,
                                                rotator)
from spatial_audio_framework_tpu.modules import sh


def _encode_noise(order, azi_deg, elev_deg, n_hops=24, hop=128, seed=0):
    """White noise encoded at (azi, elev), order N, ACN/N3D, steady-state."""
    rng = np.random.default_rng(seed)
    T = n_hops * hop
    x = rng.uniform(-1, 1, (1, T)).astype(np.float32)
    Y = sh.get_rsh(order, np.array([[azi_deg, elev_deg]]))[:, 0].astype(np.float32)
    return (Y[:, None] * x).astype(np.float32), x


@pytest.mark.parametrize("method", ["magls", "ls", "lsdiffeq", "ta"])
def test_ambi_bin_lateralisation(method):
    """Source at +90° azimuth (left): left-ear energy > right-ear energy."""
    order = 3 if method == "magls" else 1
    cfg = ambi_bin.AmbiBinConfig(order=order, norm="n3d", method=method)
    w = ambi_bin.design(cfg)
    sh_sig, _ = _encode_noise(order, 90.0, 0.0)
    st = ambi_bin.init_state(cfg)
    y, st = jax.jit(lambda w, s, x: ambi_bin.process(cfg, w, s, x))(w, st, jnp.asarray(sh_sig))
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    eL = float((y[0, d:] ** 2).sum())
    eR = float((y[1, d:] ** 2).sum())
    assert eL > 1.5 * eR, (method, eL, eR)


def test_ambi_bin_rotation_flips_ears():
    """yaw=180° swaps lateralisation (test__examples.c ambi_bin recipe)."""
    order = 3
    cfg = ambi_bin.AmbiBinConfig(order=order, norm="n3d", enable_rotation=True)
    w = ambi_bin.design(cfg)
    sh_sig, _ = _encode_noise(order, 90.0, 0.0)
    st = ambi_bin.init_state(cfg)
    proc = jax.jit(lambda w, s, x, ypr: ambi_bin.process(cfg, w, s, x, ypr))
    y, _ = proc(w, st, jnp.asarray(sh_sig), jnp.asarray([np.pi, 0.0, 0.0], np.float32))
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    eL = float((y[0, d:] ** 2).sum())
    eR = float((y[1, d:] ** 2).sum())
    assert eR > 1.5 * eL, (eL, eR)


def test_ambi_enc_matches_direct_encoding():
    cfg = ambi_enc.AmbiEncConfig(order=3, n_sources=2, norm="n3d",
                                 enable_post_scaling=False)
    out_conv = ambi_enc.design(cfg)
    dirs = np.array([[30.0, 10.0], [-45.0, 0.0]], np.float32)
    st = ambi_enc.init_state(cfg, dirs)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 128)).astype(np.float32)
    proc = jax.jit(lambda s, x, d: ambi_enc.process(cfg, out_conv, s, x, d))
    _, st = proc(st, jnp.asarray(x), jnp.asarray(dirs))          # feed frame
    out, st = proc(st, jnp.zeros_like(x), jnp.asarray(dirs))     # flush
    Y = sh.get_rsh(3, dirs.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), Y @ x, atol=2e-4)


def test_rotator_matches_rotated_encoding():
    order = 3
    cfg = rotator.RotatorConfig(order=order, norm="n3d")
    w = rotator.design(cfg)
    ypr = np.array([0.4, -0.25, 0.1], np.float32)
    sh_sig, _ = _encode_noise(order, 30.0, 20.0, n_hops=1)
    st = rotator.init_state(cfg)
    proc = jax.jit(lambda s, x: rotator.process(cfg, w, s, x, jnp.asarray(ypr)))
    _, st = proc(st, jnp.asarray(sh_sig))
    out, _ = proc(st, jnp.zeros_like(sh_sig))  # flush (steady-state M)
    from spatial_audio_framework_tpu.utils import geometry as geo
    R = geo.yaw_pitch_roll2_rzyx(*ypr.astype(np.float64))
    M = sh.get_sh_rot_mtx_real(R, order)
    np.testing.assert_allclose(np.asarray(out), M @ sh_sig, atol=2e-4)


def test_beamformer_look_direction_unity():
    order = 3
    for btype in [beamformer.BEAM_CARDIOID, beamformer.BEAM_HYPERCARDIOID,
                  beamformer.BEAM_MAX_EV]:
        cfg = beamformer.BeamformerConfig(order=order, n_beams=2,
                                          beam_type=btype, norm="n3d")
        W = beamformer.design(cfg, np.array([[40.0, 10.0], [-120.0, -30.0]]))
        sh_sig, x = _encode_noise(order, 40.0, 10.0, n_hops=1)
        st = beamformer.init_state(cfg)
        proc = jax.jit(lambda s, xx: beamformer.process(cfg, W, s, xx))
        _, st = proc(st, jnp.asarray(sh_sig))
        out, _ = proc(st, jnp.zeros_like(sh_sig))
        out = np.asarray(out)
        # Beam 0 looks at the source.  The reference's weight convention
        # (rotateAxisCoeffsReal on N3D signals, beamformer.c:142-151) yields a
        # look-direction gain of sqrt(4π) for a unit N3D-encoded source.
        g = np.sqrt(4.0 * np.pi)
        np.testing.assert_allclose(out[0], g * x[0], atol=5e-3 * g)
        # beam 1 looks away: attenuated
        assert (out[1] ** 2).sum() < 0.5 * g * g * (x[0] ** 2).sum()


def test_ambi_dec_loudest_speaker():
    """Loudest speaker matches the source direction (test__examples.c
    ambi_dec recipe), and panner localises correctly too."""
    from spatial_audio_framework_tpu.models import ambi_dec
    from spatial_audio_framework_tpu.utils import presets
    from spatial_audio_framework_tpu.modules import vbap as _vbap

    ls = presets.tdesign(6)  # 24 uniform speakers
    cfg = ambi_dec.AmbiDecConfig(master_order=3, norm="n3d")
    w = ambi_dec.design(cfg, ls)
    sh_sig, _ = _encode_noise(3, ls[5, 0], ls[5, 1], n_hops=24)
    st = ambi_dec.init_state(cfg, ls.shape[0])
    y, _ = jax.jit(lambda s, x: ambi_dec.process(cfg, w, s, x))(st, jnp.asarray(sh_sig))
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    energies = (y[:, d:] ** 2).sum(-1)
    assert energies.argmax() == 5, energies.argsort()[-3:]


def test_panner_localisation_and_norm():
    from spatial_audio_framework_tpu.models import panner
    from spatial_audio_framework_tpu.utils import presets

    ls = presets.loudspeaker_preset("9.x")
    cfg = panner.PannerConfig(n_sources=1, n_loudspeakers=ls.shape[0])
    w = panner.design(cfg, ls)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    st = panner.init_state(cfg)
    dirs = jnp.asarray(np.array([[ls[1, 0], ls[1, 1]]], np.float32))
    y, _ = jax.jit(lambda s, xx, dd: panner.process(cfg, w, s, xx, dd))(
        st, jnp.asarray(x), dirs)
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    energies = (y[:, d:] ** 2).sum(-1)
    assert energies.argmax() == 1, energies
    # energy confined to that speaker (source exactly at speaker dir)
    assert energies[1] > 0.8 * energies.sum()


@pytest.mark.goldens
def test_binauraliser_lateralisation():
    from spatial_audio_framework_tpu.models import binauraliser as B

    for mode in [B.INTERP_TRI, B.INTERP_TRI_PS]:
        cfg = B.BinauraliserConfig(n_sources=1, interp_mode=mode)
        w = B.design(cfg)
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
        st = B.init_state(cfg)
        dirs = jnp.asarray(np.array([[90.0, 0.0]], np.float32))  # hard left
        y, _ = jax.jit(lambda s, xx, dd: B.process(cfg, w, s, xx, dd))(
            st, jnp.asarray(x), dirs)
        y = np.asarray(y)
        d = cfg.afstft.proc_delay
        eL = (y[0, d:] ** 2).sum()
        eR = (y[1, d:] ** 2).sum()
        assert eL > 1.5 * eR, (mode, eL, eR)


@pytest.mark.goldens
def test_binauraliser_rotation():
    from spatial_audio_framework_tpu.models import binauraliser as B

    cfg = B.BinauraliserConfig(n_sources=1, enable_rotation=True)
    w = B.design(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    st = B.init_state(cfg)
    dirs = jnp.asarray(np.array([[90.0, 0.0]], np.float32))
    ypr = jnp.asarray(np.array([np.pi, 0.0, 0.0], np.float32))  # yaw 180°
    y, _ = jax.jit(lambda s, xx, dd, r: B.process(cfg, w, s, xx, dd, ypr=r))(
        st, jnp.asarray(x), dirs, ypr)
    y = np.asarray(y)
    d = cfg.afstft.proc_delay
    eL = (y[0, d:] ** 2).sum()
    eR = (y[1, d:] ** 2).sum()
    assert eR > 1.5 * eL
