"""roombinauraliser model tests (fork example, examples/src/roombinauraliser;
physics recipe mirrors the reference's example tests: ILD-coded synthetic
BRIRs, head rotation must select the matching grid direction)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.models import roombinauraliser as RB


def _ring_brirs(n_sources=1, n_azi=24, ir_len=256, fs=48000):
    """Synthetic 2-D BRIR ring: direction azi gets left gain 1+0.9·sin(azi),
    right gain 1-0.9·sin(azi) (left ear louder for sources on the left)."""
    azis = -180.0 + 360.0 * np.arange(n_azi) / n_azi
    dirs = np.stack([azis, np.zeros(n_azi)], -1)
    brirs = np.zeros((n_sources, n_azi, 2, ir_len), np.float32)
    s = np.sin(np.radians(azis))
    brirs[:, :, 0, 8] = 1.0 + 0.9 * s
    brirs[:, :, 1, 8] = 1.0 - 0.9 * s
    # small diffuse tail so ITD/CTF estimation has energy to work with
    rng = np.random.default_rng(1)
    brirs += 0.01 * rng.standard_normal(brirs.shape).astype(np.float32)
    return brirs, dirs, fs


def _run(cfg, w, x, ypr=None, gains=None):
    st = RB.init_state(cfg)
    f = jax.jit(lambda ww, s, xx, g, r: RB.process(cfg, ww, s, xx, g, r))
    g = (jnp.ones(cfg.n_sources) if gains is None else jnp.asarray(gains))
    r = jnp.zeros(3) if ypr is None else jnp.asarray(ypr, jnp.float32)
    y, _ = f(w, st, jnp.asarray(x), g, r)
    return np.asarray(y)


@pytest.mark.goldens
def test_roombinauraliser_rotation_selects_grid_direction():
    """2-D grid detected; yaw rotation moves the lookup along the ring:
    yaw=+90° → reference frame points to azi=+90° → left-ear BRIR selected."""
    brirs, dirs, fs = _ring_brirs()
    cfg, w = RB.design(RB.RoomBinauraliserConfig(n_sources=1, fs=fs),
                       brirs, dirs, fs)
    assert not cfg.vbap_3d  # no elevation diversity → 2-D table path
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    d = cfg.afstft.proc_delay

    y0 = _run(cfg, w, x)                                    # facing front
    e0 = (y0[:, d:] ** 2).sum(-1)
    assert abs(e0[0] - e0[1]) < 0.15 * e0.sum()             # ~centred

    yL = _run(cfg, w, x, ypr=[np.pi / 2, 0.0, 0.0])         # yaw +90°
    eL = (yL[:, d:] ** 2).sum(-1)
    yR = _run(cfg, w, x, ypr=[-np.pi / 2, 0.0, 0.0])        # yaw -90°
    eR = (yR[:, d:] ** 2).sum(-1)
    # lookup dir = row [1,0,0]·R: yaw +90° → azi +90° (left BRIR) and v.v.
    # (matches the reference's yawPitchRoll2Rzyx + row-vector gemm,
    # roombinauraliser.c:241-249)
    assert eL[0] > 1.5 * eL[1], eL
    assert eR[1] > 1.5 * eR[0], eR


def test_roombinauraliser_tri_ps_mode():
    brirs, dirs, fs = _ring_brirs()
    cfg, w = RB.design(RB.RoomBinauraliserConfig(
        n_sources=1, fs=fs, interp_mode=RB.INTERP_TRI_PS), brirs, dirs, fs)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    y = _run(cfg, w, x, ypr=[np.pi / 2, 0.0, 0.0])
    d = cfg.afstft.proc_delay
    e = (y[:, d:] ** 2).sum(-1)
    assert np.isfinite(y).all() and e[0] > 1.5 * e[1], e


@pytest.mark.goldens
def test_roombinauraliser_solo_mute_gains():
    """Soloing a silent source silences the output; unity gains restore it."""
    brirs, dirs, fs = _ring_brirs(n_sources=2)
    cfg, w = RB.design(RB.RoomBinauraliserConfig(n_sources=2, fs=fs),
                       brirs, dirs, fs)
    rng = np.random.default_rng(0)
    x = np.zeros((2, 24 * 128), np.float32)
    x[0] = rng.uniform(-1, 1, 24 * 128)                     # only src 0 active
    y_all = _run(cfg, w, x, gains=RB.solo_gains(2, None))
    y_solo1 = _run(cfg, w, x, gains=RB.solo_gains(2, 1))    # solo silent src
    y_mute0 = _run(cfg, w, x, gains=RB.mute_gains(np.ones(2), 0, True))
    assert (y_all ** 2).sum() > 1e-3
    assert (y_solo1 ** 2).sum() < 1e-10
    assert (y_mute0 ** 2).sum() < 1e-10


@pytest.mark.goldens
def test_roombinauraliser_diff_eq_modes():
    """FABIAN CTF (embedded 256-tap IR) scales all dirs per band; a delta
    own-filter leaves magnitudes ~unchanged; BRIR CTF runs and is finite."""
    ir = RB.fabian_ctf_ir()
    assert ir.shape == (256,) and abs(ir[0] - 0.63476235) < 1e-6

    brirs, dirs, fs = _ring_brirs()
    base_cfg = RB.RoomBinauraliserConfig(n_sources=1, fs=fs,
                                         enable_hrir_diff_eq=False)
    _, w0 = RB.design(base_cfg, brirs, dirs, fs)

    from dataclasses import replace
    _, wf = RB.design(replace(base_cfg, enable_hrir_diff_eq=True,
                              diff_eq_mode=RB.DIFF_EQ_FABIAN_CTF),
                      brirs, dirs, fs)
    ratio = np.asarray(wf.hrtf_fb) / np.asarray(w0.hrtf_fb)
    # per (band): same complex factor for every ear/direction
    spread = np.abs(ratio - ratio[:, :, :1, :1]).max()
    assert spread < 1e-5 and np.isfinite(ratio).all()

    delta = np.zeros(256, np.float32)
    delta[0] = 1.0
    _, wd = RB.design(replace(base_cfg, enable_hrir_diff_eq=True,
                              diff_eq_mode=RB.DIFF_EQ_OWN_FILTER),
                      brirs, dirs, fs, own_ctf_ir=delta)
    mag_ratio = np.abs(np.asarray(wd.hrtf_fb)) / np.abs(np.asarray(w0.hrtf_fb))
    assert abs(np.median(mag_ratio) - 1.0) < 0.15

    cfg_b, wb = RB.design(replace(base_cfg, enable_hrir_diff_eq=True,
                                  diff_eq_mode=RB.DIFF_EQ_BRIR_CTF),
                          brirs, dirs, fs)
    assert np.isfinite(np.asarray(wb.hrtf_fb)).all()
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 8 * 128)).astype(np.float32)
    y = _run(cfg_b, wb, x)
    assert np.isfinite(y).all()


def test_roombinauraliser_3d_grid_and_defaults():
    """3-D grid → vbap_3d path; default (tiled HRIR) fallback also works."""
    elevs = np.arange(-60, 61, 30)
    azis = -180.0 + 30.0 * np.arange(12)
    dirs = np.array([[a, e] for e in elevs for a in azis] +
                    [[0.0, 90.0], [0.0, -90.0]])
    rng = np.random.default_rng(2)
    n = dirs.shape[0]
    brirs = 0.05 * rng.standard_normal((1, n, 2, 128)).astype(np.float32)
    brirs[:, :, :, 4] += 1.0
    cfg, w = RB.design(RB.RoomBinauraliserConfig(
        n_sources=1, fs=48000, enable_hrir_diff_eq=False), brirs, dirs, 48000)
    assert cfg.vbap_3d
    x = rng.uniform(-1, 1, (1, 24 * 128)).astype(np.float32)
    y = _run(cfg, w, x, ypr=[0.3, 0.2, 0.0])
    assert np.isfinite(y).all() and (y ** 2).sum() > 1e-4
