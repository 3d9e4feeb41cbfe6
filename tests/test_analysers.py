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
    out, st = jax.jit(lambda s, xx: SL.analysis(cfg, w, s, xx))(
        st, jnp.asarray(x))
    doa, energy = np.asarray(out.doa_rad), np.asarray(out.energy)
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
@pytest.mark.goldens
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


def test_powermap_cropac_jittable():
    cfg = PM.PowermapConfig(master_order=3, mode=PM.PM_CROPAC, norm="n3d")
    w = PM.design(cfg)
    st = PM.init_state(cfg, w)
    x = _sh_noise(3, 40.0, 10.0, 32 * 128)
    pmap, st = jax.jit(lambda s, xx: PM.analysis(cfg, w, s, xx))(
        st, jnp.asarray(x))
    pmap = np.asarray(pmap)
    peak = w.interp_dirs_deg[np.argmax(pmap)]
    u = np.asarray(unit_sph2cart(np.array([peak]), degrees=True))[0]
    v = np.asarray(unit_sph2cart(np.array([[40.0, 10.0]]), degrees=True))[0]
    assert np.degrees(np.arccos(np.clip(u @ v, -1, 1))) < 12.0


@pytest.mark.goldens
def test_powermap_per_band_order_truncates():
    """Forcing every band to order 1 must blur the map exactly as a
    master-order-1 analysis would (reference powermap.c:275-289 grouping)."""
    n_bands = PM.PowermapConfig().afstft.n_bands
    cfg3 = PM.PowermapConfig(master_order=3, norm="n3d")
    cfg1 = PM.PowermapConfig(
        master_order=3, norm="n3d",
        analysis_order_per_band=tuple([1] * n_bands))
    assert cfg1.max_analysis_order == 1
    w3, w1 = PM.design(cfg3), PM.design(cfg1)
    x = _sh_noise(3, 40.0, 10.0, 32 * 128)
    p3, _ = jax.jit(lambda s, xx: PM.analysis(cfg3, w3, s, xx))(
        PM.init_state(cfg3, w3), jnp.asarray(x))
    p1, _ = jax.jit(lambda s, xx: PM.analysis(cfg1, w1, s, xx))(
        PM.init_state(cfg1, w1), jnp.asarray(x))
    # reference-predicted direction: order truncation widens the main lobe →
    # more display cells above half-max in the order-1 map
    frac3 = (np.asarray(p3) > 0.5).mean()
    frac1 = (np.asarray(p1) > 0.5).mean()
    assert frac1 > 1.5 * frac3, (frac1, frac3)

    # a mixed profile (half the bands at order 1) sits in between
    prof = tuple([1] * (n_bands // 2) + [3] * (n_bands - n_bands // 2))
    cfgm = PM.PowermapConfig(master_order=3, norm="n3d",
                             analysis_order_per_band=prof)
    wm = PM.design(cfgm)
    assert cfgm.max_analysis_order == 3
    pm, _ = jax.jit(lambda s, xx: PM.analysis(cfgm, wm, s, xx))(
        PM.init_state(cfgm, wm), jnp.asarray(x))
    fracm = (np.asarray(pm) > 0.5).mean()
    assert frac3 < fracm < frac1, (frac3, fracm, frac1)


def test_powermap_pmap_eq_weights_bands():
    """pmapEQ selects which bands feed the map: with a low-passed source at
    one direction and a high-passed source at another, weighting only the
    low bands must move the peak to the low source (and vice versa)."""
    cfg = PM.PowermapConfig(master_order=2, norm="n3d")
    w = PM.design(cfg)
    n_bands = cfg.afstft.n_bands
    T = 16 * 128
    rng = np.random.default_rng(0)

    def bl_noise(lo, hi):
        s = rng.uniform(-1, 1, T).astype(np.float32)
        S = np.fft.rfft(s)
        f = np.fft.rfftfreq(T, 1 / 48000.0)
        S[(f < lo) | (f > hi)] = 0
        return np.fft.irfft(S, T).astype(np.float32)

    Ya = sh.get_rsh(2, np.array([[40.0, 10.0]]))[:, 0].astype(np.float32)
    Yb = sh.get_rsh(2, np.array([[-120.0, -30.0]]))[:, 0].astype(np.float32)
    x = Ya[:, None] * bl_noise(0, 2000)[None, :] \
        + Yb[:, None] * bl_noise(6000, 24000)[None, :]
    freqs = cfg.afstft.centre_freqs(cfg.fs)
    eq_lo = jnp.asarray((freqs < 3000).astype(np.float32))
    eq_hi = jnp.asarray((freqs > 4000).astype(np.float32))

    fn = jax.jit(lambda s, xx, eq: PM.analysis(cfg, w, s, xx, pmap_eq=eq))

    def peak_dir(eq):
        p, _ = fn(PM.init_state(cfg, w), jnp.asarray(x), eq)
        return w.interp_dirs_deg[int(np.argmax(np.asarray(p)))]

    def ang(d, target):
        u = np.asarray(unit_sph2cart(np.array([d]), degrees=True))[0]
        v = np.asarray(unit_sph2cart(np.array([target]), degrees=True))[0]
        return np.degrees(np.arccos(np.clip(u @ v, -1, 1)))

    assert ang(peak_dir(eq_lo), [40.0, 10.0]) < 15.0
    assert ang(peak_dir(eq_hi), [-120.0, -30.0]) < 15.0
    # eq is clipped to [0, 2] (powermap.c:284)
    p_clip, _ = fn(PM.init_state(cfg, w), jnp.asarray(x),
                   jnp.full(n_bands, 50.0, jnp.float32))
    p_two, _ = fn(PM.init_state(cfg, w), jnp.asarray(x),
                  jnp.full(n_bands, 2.0, jnp.float32))
    np.testing.assert_allclose(np.asarray(p_clip), np.asarray(p_two),
                               atol=1e-6)


def test_sldoa_per_band_order_and_display():
    n_bands = SL.SldoaConfig().afstft.n_bands
    prof = tuple([1] * 40 + [2] * 40 + [3] * (n_bands - 80))
    # avg_ms=50 → one-pole coeff ~0.16, converges within the test's 32 slots
    cfg = SL.SldoaConfig(master_order=3, norm="n3d", avg_ms=50.0,
                         analysis_order_per_band=prof)
    w = SL.design(cfg)
    assert cfg.max_sectors == 9
    # sector masks follow the per-band order: order-1 bands → 1 sector
    mask = np.asarray(w.sec_mask)
    assert mask[10].sum() == 1 and mask[50].sum() == 4 and mask[100].sum() == 9
    st = SL.init_state(cfg)
    x = _sh_noise(3, -60.0, 20.0, 32 * 128)
    out, st2 = jax.jit(lambda s, xx: SL.analysis(cfg, w, s, xx))(
        st, jnp.asarray(x))
    # display fields have the documented shapes and gating
    assert out.azi_deg.shape == (n_bands, 9)
    assert out.alpha_scale.shape == (n_bands, 9)
    a = np.asarray(out.alpha_scale)
    in_range = np.asarray(w.band_in_range) > 0
    assert np.all(a[~in_range] == 0.0)          # out-of-range bands gated
    assert np.all(a[in_range & (np.asarray(w.orders_per_band) == 1)][:, 0]
                  == 1.0)                        # order-1 bands: alpha 1
    # averaged DoA of in-range sectors points at the source
    azi = np.asarray(out.azi_deg)[in_range]
    el = np.asarray(out.elev_deg)[in_range]
    en = np.asarray(st2.energy)[in_range]
    i = np.unravel_index(np.argmax(en), en.shape)
    u = np.asarray(unit_sph2cart(np.array([[azi[i], el[i]]]), degrees=True))[0]
    v = np.asarray(unit_sph2cart(np.array([[-60.0, 20.0]]), degrees=True))[0]
    assert np.degrees(np.arccos(np.clip(u @ v, -1, 1))) < 15.0
