"""powermap / sldoa analyser tests: planted sources are localised."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.models import powermap as PM, sldoa as SL
from spatial_audio_framework_tpu.modules import sh
from spatial_audio_framework_tpu.utils.geometry import unit_sph2cart


def _sh_noise(order, azi, elev, T, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, T).astype(np.float32)
    Y = sh.get_rsh(order, np.array([[azi, elev]]))[:, 0].astype(np.float32)
    return Y[:, None] * x[None, :]


@pytest.mark.parametrize("mode", [PM.PM_PWD, PM.PM_MVDR, PM.PM_MUSIC])
def test_powermap_localises(mode):
    cfg = PM.PowermapConfig(master_order=3, mode=mode, norm="n3d")
    w = PM.design(cfg)
    st = PM.init_state(cfg, w)
    x = _sh_noise(3, 40.0, 10.0, 32 * 128)
    fn = PM.analysis if mode == PM.PM_CROPAC else jax.jit(
        lambda s, xx: PM.analysis(cfg, w, s, xx))
    if mode == PM.PM_CROPAC:
        pmap, st = PM.analysis(cfg, w, st, jnp.asarray(x))
    else:
        pmap, st = fn(st, jnp.asarray(x))
    pmap = np.asarray(pmap)
    peak = w.interp_dirs_deg[np.argmax(pmap)]
    u = np.asarray(unit_sph2cart(np.array([peak]), degrees=True))[0]
    v = np.asarray(unit_sph2cart(np.array([[40.0, 10.0]]), degrees=True))[0]
    ang = np.degrees(np.arccos(np.clip(u @ v, -1, 1)))
    assert ang < 10.0, (mode, peak)


@pytest.mark.parametrize("order", [1, 3])
def test_sldoa_recovers_doa(order):
    cfg = SL.SldoaConfig(master_order=order, norm="n3d")
    w = SL.design(cfg)
    st = SL.init_state(cfg)
    x = _sh_noise(order, -60.0, 20.0, 32 * 128)
    (doa, energy), st = jax.jit(lambda s, xx: SL.analysis(cfg, w, s, xx))(
        st, jnp.asarray(x))
    doa, energy = np.asarray(doa), np.asarray(energy)
    # energy-weighted circular-mean DoA of the loudest sector (robust to the
    # noisy per-slot estimates at low bands)
    sec = int(energy.sum((0, 2)).argmax())
    wgt = energy[:, sec, :]
    u = np.stack([np.cos(doa[:, sec, :, 1]) * np.cos(doa[:, sec, :, 0]),
                  np.cos(doa[:, sec, :, 1]) * np.sin(doa[:, sec, :, 0]),
                  np.sin(doa[:, sec, :, 1])], -1)
    m = (u * wgt[..., None]).sum((0, 1)) / wgt.sum()
    m /= np.linalg.norm(m)
    azi = np.degrees(np.arctan2(m[1], m[0]))
    elev = np.degrees(np.arcsin(np.clip(m[2], -1, 1)))
    u = np.asarray(unit_sph2cart(np.array([[azi, elev]]), degrees=True))[0]
    v = np.asarray(unit_sph2cart(np.array([[-60.0, 20.0]]), degrees=True))[0]
    ang = np.degrees(np.arccos(np.clip(u @ v, -1, 1)))
    assert ang < 15.0, (azi, elev)


@pytest.mark.parametrize("mode", ["off", "upscale", "nearest"])
def test_dirass_localises(mode):
    from spatial_audio_framework_tpu.models import dirass as DR

    cfg = DR.DirassConfig(input_order=3, mode=mode, norm="n3d")
    w = DR.design(cfg)
    st = DR.init_state(cfg, w)
    x = _sh_noise(3, 40.0, 10.0, 16 * 128, seed=3)
    pmap, st = jax.jit(lambda s, xx: DR.analysis(cfg, w, s, xx))(
        st, jnp.asarray(x))
    pmap = np.asarray(pmap)
    peak = w.interp_dirs_deg[np.argmax(pmap)]
    u = np.asarray(unit_sph2cart(np.array([peak]), degrees=True))[0]
    v = np.asarray(unit_sph2cart(np.array([[40.0, 10.0]]), degrees=True))[0]
    ang = np.degrees(np.arccos(np.clip(u @ v, -1, 1)))
    # re-assignment sharpens the map; all modes must still peak at the source
    assert ang < 12.0, (mode, peak, ang)
