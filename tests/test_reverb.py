"""IMS shoebox tests mirroring test__reverb_module.c style: direct-path
physics, absorption-driven decay, SH receiver behaviour."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_audio_framework_tpu.modules import reverb, sh


def test_direct_path_time_and_gain():
    room = [10.0, 8.0, 4.0]
    src = np.array([2.0, 3.0, 1.5])
    rec = np.array([6.0, 3.0, 1.5])   # 4 m apart
    ec = reverb.compute_echogram(room, src, rec, max_order=2)
    # first arrival = direct path
    c = 343.0
    assert abs(ec.time[0] - 4.0 / c) < 1e-9
    assert abs(ec.value[0, 0] - 0.25) < 1e-9  # 1/d attenuation
    assert (ec.order[0] == 0).all()
    # image-source count for order N: all |i|+|j|+|k| <= N
    ec1 = reverb.compute_echogram(room, src, rec, max_order=1)
    assert ec1.time.shape[0] == 7
    assert np.all(np.diff(ec.time) >= 0)  # sorted


def test_max_time_mode():
    room = [6.0, 5.0, 3.0]
    ec = reverb.compute_echogram(room, [1, 1, 1], [4, 3, 2], max_time_s=0.05)
    assert ec.time.max() < 0.05
    assert ec.time.shape[0] > 10


def test_absorption_reduces_energy():
    room = [6.0, 5.0, 3.0]
    ec = reverb.compute_echogram(room, [1, 1, 1], [4, 3, 2], max_order=3)
    low = reverb.apply_wall_absorption(ec, np.full((1, 6), 0.1))[0]
    high = reverb.apply_wall_absorption(ec, np.full((1, 6), 0.9))[0]
    # direct path unaffected; reflections attenuated more with high absorption
    np.testing.assert_allclose(low.value[0, 0], ec.value[0, 0])
    assert (high.value[0, 1:] <= low.value[0, 1:] + 1e-12).all()
    assert high.value[0, 1:].sum() < 0.2 * low.value[0, 1:].sum()


def test_sh_receiver_directivity():
    room = [8.0, 6.0, 4.0]
    src = np.array([6.0, 3.0, 2.0])
    rec = np.array([2.0, 3.0, 2.0])   # source at +x of receiver
    ec = reverb.compute_echogram(room, src, rec, max_order=0)
    ec_sh = reverb.apply_sh_directivity(ec, 1)
    # ACN order 1: [W, Y, Z, X]; direct path from azi=0,elev=0 → X>0, Y≈Z≈0
    v = ec_sh.value[:, 0]
    assert v[0] > 0 and abs(v[1]) < 1e-6 and abs(v[2]) < 1e-6
    assert v[3] > 0.9 * v[0]


def test_render_rir_and_roomsim_model():
    from spatial_audio_framework_tpu.models import ambi_roomsim as ars

    cfg = ars.AmbiRoomSimConfig(sh_order=1, n_sources=1, n_receivers=1,
                                refl_order=2, room_dims=(7.0, 5.0, 3.0))
    src = np.array([[5.0, 2.5, 1.5]])
    rec = np.array([[2.0, 2.5, 1.5]])
    w = ars.design(cfg, src, rec)
    st = ars.init_state(cfg, w)
    T = 24 * 128
    x = np.zeros((1, T), np.float32)
    x[0, 0] = 1.0  # unit impulse → output = RIR
    y, _ = jax.jit(lambda s, xx: ars.process(cfg, w, s, xx))(st, jnp.asarray(x))
    y = np.asarray(y)
    c, d = 343.0, 3.0
    n_direct = int(round(d / c * cfg.fs))
    # W channel has the direct impulse at the right time and amplitude 1/d
    w_ch = y[0]
    peak = np.argmax(np.abs(w_ch[: n_direct + 32]))
    assert abs(peak - n_direct) <= 1
    ref_amp = (1.0 / d) * sh.get_sh_real(1, np.array([[0.0, np.pi / 2]]))[0, 0]
    assert abs(w_ch[peak] - ref_amp) / ref_amp < 0.05
    # reverberant tail exists
    assert np.abs(y[:, n_direct + 10:]).max() > 0


def test_multiband_rir_filterbank():
    room = reverb.ShoeboxRoom(np.array([6.0, 5.0, 3.0]),
                              np.tile([[0.2, 0.2, 0.3, 0.3, 0.4, 0.4]], (4, 1)),
                              lowest_octave_band=250.0)
    room.add_source([1.0, 1.0, 1.0])
    room.add_receiver_sh(0, [4.0, 3.0, 2.0])
    room.compute_echograms(max_order=1)
    rirs = room.render_rirs()
    rir = rirs[(0, 0)]
    assert rir.ndim == 2 and rir.shape[0] == 1 and np.abs(rir).max() > 0


def test_td_applicator_matches_rir_conv_broadband():
    """Streaming TD applicator (single band, integer delays) equals
    convolution with the rendered RIR (both are pure tap-delay sums)."""
    import jax

    room = reverb.ShoeboxRoom(np.array([5.0, 4.0, 3.0]),
                              np.array([[0.3, 0.3, 0.4, 0.4, 0.5, 0.5]]))
    room.add_source([1.2, 1.0, 1.1])
    room.add_source([3.5, 2.5, 1.4])
    room.add_receiver_sh(1, [2.5, 2.0, 1.5])
    room.compute_echograms(max_order=2)
    rirs = room.render_rirs()

    taps = room.pack_taps(0, max_taps=256)
    app = room.td_applicator(0, max_delay=4096)
    st = app.init_state()
    rng = np.random.default_rng(0)
    T, B = 4096, 512
    x = rng.uniform(-1, 1, (2, T)).astype(np.float32)
    proc = jax.jit(lambda s, xx: app.process(s, xx, taps))
    ys = []
    for k in range(T // B):
        y, st = proc(st, x[:, k * B:(k + 1) * B])
        ys.append(np.asarray(y))
    y = np.concatenate(ys, axis=1)

    from scipy.signal import fftconvolve
    ref = sum(fftconvolve(np.tile(x[s], (4, 1)), rirs[(0, s)],
                          axes=-1)[:, :T] for s in range(2))
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_td_applicator_crossfade_and_fractional():
    """Crossfaded block equals the explicit ramp blend; fractional-delay
    packing stays close to the integer-delay output."""
    import jax
    import jax.numpy as jnp

    room = reverb.ShoeboxRoom(np.array([5.0, 4.0, 3.0]),
                              np.array([[0.3, 0.3, 0.4, 0.4, 0.5, 0.5]]))
    room.add_source([1.2, 1.0, 1.1])
    room.add_receiver_sh(0, [2.5, 2.0, 1.5])
    room.compute_echograms(max_order=2)
    taps0 = room.pack_taps(0, max_taps=256)
    room.update_source(0, [1.4, 1.2, 1.1])
    room.compute_echograms(max_order=2)
    taps1 = room.pack_taps(0, max_taps=256)

    app = room.td_applicator(0, max_delay=2048)
    rng = np.random.default_rng(1)
    B = 512
    x = rng.uniform(-1, 1, (1, B)).astype(np.float32)

    st = app.init_state()
    y_cur, _ = app.process(st, x, taps1)
    y_prev, _ = app.process(st, x, taps0)
    y_xf, _ = app.process(st, x, taps1, taps0, jnp.ones(1))
    r = np.arange(1, B + 1) / B
    np.testing.assert_allclose(np.asarray(y_xf),
                               np.asarray(y_cur) * r
                               + np.asarray(y_prev) * (1 - r), atol=1e-5)

    # fractional-delay packing equals convolution with the fractionally
    # rendered RIR (identical order-2 Lagrange expansion)
    taps_frac = room.pack_taps(0, max_taps=768, fractional_delays=True)
    app2 = room.td_applicator(0, max_delay=2048)
    y_frac, _ = app2.process(app2.init_state(), x, taps_frac)
    rir_frac = reverb.render_rir(room.echograms[(0, 0)], room.fs,
                                 fractional_delays=True)
    from scipy.signal import fftconvolve
    ref = fftconvolve(np.tile(x[0], (1, 1)), rir_frac, axes=-1)[:, :B]
    np.testing.assert_allclose(np.asarray(y_frac), ref, atol=2e-4)


@pytest.mark.goldens
def test_td_applicator_multiband_and_faf_device():
    """Device FAF IIR filterbank matches the host scipy path; multi-band TD
    applicator runs, is finite, and is power-complementary-ish."""
    from spatial_audio_framework_tpu.utils.filters import FafIIRFilterbank

    fb = FafIIRFilterbank(3, np.array([400.0, 1600.0, 6400.0]), 48000.0)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 2048).astype(np.float32)
    host = fb.apply(x)
    import jax
    dev, _ = jax.jit(fb.apply_device)(x[None], fb.init_device_state((1,)))
    np.testing.assert_allclose(np.asarray(dev)[:, 0], host, atol=5e-3)

    room = reverb.ShoeboxRoom(
        np.array([6.0, 5.0, 3.0]),
        np.tile([[0.2, 0.2, 0.3, 0.3, 0.4, 0.4]], (4, 1)),
        lowest_octave_band=250.0)
    room.add_source([1.0, 1.0, 1.0])
    room.add_receiver_sh(1, [4.0, 3.0, 2.0])
    room.compute_echograms(max_order=1)
    taps = room.pack_taps(0, max_taps=64)
    app = room.td_applicator(0, max_delay=2048)
    assert app.n_bands == 4
    st = app.init_state()
    y, st = jax.jit(lambda s, xx: app.process(s, xx, taps))(
        st, np.asarray(x[None, :1024]))
    assert y.shape == (4, 1024) and np.isfinite(np.asarray(y)).all()
    assert np.abs(np.asarray(y)).max() > 0
