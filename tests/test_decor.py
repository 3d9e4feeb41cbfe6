"""Decorrelator tests (test__utilities_module.c latticeDecorrelator recipe:
energy preservation + decorrelation)."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from spatial_audio_framework_tpu.ops.afstft import AfSTFT
from spatial_audio_framework_tpu.utils import decor


def test_lattice_allpass_flatness():
    """The implemented lattice structure is all-pass: |H(ω)| == 1."""
    from scipy.signal import freqz

    for order in [2, 4, 8, 20]:
        num = decor.lattice_coeffs(order, 3)
        b = num
        a = np.concatenate([[1.0], num[::-1][1:order]])
        w, h = freqz(b, a, worN=256)
        np.testing.assert_allclose(np.abs(h), 1.0, atol=1e-4)


def test_decorrelation_delays():
    freqs = np.linspace(100, 20000, 64)
    d = decor.get_decorrelation_delays(4, freqs, 48000.0, 12, 128)
    assert d.shape == (64, 4) and (d >= 0).all() and (d <= 11).all()
    # lower bands get longer delays on average
    assert d[:8].mean() > d[-8:].mean()


def test_lattice_decorrelator_energy_and_coherence():
    hop = 128
    bank = AfSTFT(hop=hop)
    fs = 48000.0
    freqs = bank.centre_freqs(fs)
    n_ch = 2
    ld = decor.LatticeDecorrelator(fs=fs, hop_size=hop, n_ch=n_ch,
                                   orders=(20, 15, 6, 3),
                                   freq_cutoffs=(700.0, 2400.0, 4e3, 12e3))
    dz = ld.design(freqs)
    st = ld.init_state(dz, len(freqs))
    rng = np.random.default_rng(0)
    T = 128  # hops
    x = (rng.standard_normal((len(freqs), n_ch, T))
         + 1j * rng.standard_normal((len(freqs), n_ch, T))).astype(np.complex64)
    y, st = jax.jit(lambda s, f: ld.apply(dz, s, f))(st, jnp.asarray(x))
    y = np.asarray(y)
    sel = dz["delays"].max(-1) + 25  # skip transient per band
    # energy roughly preserved per band (compensation clamps at <=1)
    ein = (np.abs(x) ** 2).mean(-1).mean(-1)
    eout = (np.abs(y) ** 2).mean(-1).mean(-1)
    ratio = eout / ein
    assert (ratio > 0.25).mean() > 0.9 and (ratio < 1.3).all()
    # low coherence with input in the filtered region
    band = 20
    cc = np.abs(np.vdot(y[band, 0, 40:], x[band, 0, 40:])) / (
        np.linalg.norm(y[band, 0, 40:]) * np.linalg.norm(x[band, 0, 40:]))
    assert cc < 0.5, cc
    del sel


def test_transient_ducker():
    n_bands, n_ch, T = 8, 1, 1200
    x = np.ones((n_bands, n_ch, T), np.complex64) * 0.1
    x[:, :, 900] = 5.0  # transient after the detector has settled
    st = decor.transient_ducker_init(n_bands, n_ch)
    res, trans, st = jax.jit(decor.transient_ducker_apply)(st, jnp.asarray(x))
    res, trans = np.asarray(res), np.asarray(trans)
    np.testing.assert_allclose(res + trans, x, atol=1e-6)
    # the transient slot is mostly routed to the transient stream
    assert np.abs(trans[0, 0, 900]) > np.abs(res[0, 0, 900])
    # steady state (detector converged, slot well before the transient)
    assert np.abs(res[0, 0, 800]) > np.abs(trans[0, 0, 800])


def test_synthesise_noise_reverb():
    rir = decor.synthesise_noise_reverb(
        2, 48000.0, np.array([0.3, 0.25, 0.2, 0.15]),
        np.array([500.0, 1000.0, 2000.0, 4000.0]))
    assert rir.shape[0] == 2 and rir.shape[1] == int(0.3 * 48000)
    # energy decays over time
    e0 = (rir[:, :2000] ** 2).sum()
    e1 = (rir[:, -2000:] ** 2).sum()
    assert e0 > 10 * e1


@pytest.mark.goldens
def test_lattice_and_ducker_ri_equivalence():
    """RI lattice decorrelator + ducker equal the complex implementations."""
    import jax

    from spatial_audio_framework_tpu.utils.decor import (
        LatticeDecorrelator, lattice_apply_ri, lattice_init_state_ri,
        transient_ducker_apply, transient_ducker_apply_ri,
        transient_ducker_init)

    fs, hop, n_ch, n_bands, T = 48000.0, 128, 3, 40, 16
    freqs = np.linspace(0, fs / 2, n_bands)
    dec = LatticeDecorrelator(fs=fs, hop_size=hop, n_ch=n_ch,
                              orders=(6, 3), freq_cutoffs=(3e3, 12e3),
                              max_delay=8)
    design = dec.design(freqs, rng=np.random.default_rng(0))
    rng = np.random.default_rng(1)
    fr = rng.standard_normal((n_bands, n_ch, T)).astype(np.float32)
    fi = rng.standard_normal((n_bands, n_ch, T)).astype(np.float32)
    frame = (fr + 1j * fi).astype(np.complex64)

    st_c = dec.init_state(design, n_bands)
    y_c, st_c = jax.jit(lambda s, f: dec.apply(design, s, f))(st_c,
                                                              jnp.asarray(frame))
    st_r = lattice_init_state_ri(dec, design, n_bands)
    (yre, yim), st_r = jax.jit(
        lambda s, a, b: lattice_apply_ri(dec, design, s, a, b))(
        st_r, jnp.asarray(fr), jnp.asarray(fi))
    np.testing.assert_allclose(np.asarray(yre), np.real(y_c), atol=2e-5)
    np.testing.assert_allclose(np.asarray(yim), np.imag(y_c), atol=2e-5)
    # second block state carry
    y_c2, _ = jax.jit(lambda s, f: dec.apply(design, s, f))(st_c,
                                                            jnp.asarray(frame))
    (yre2, yim2), _ = jax.jit(
        lambda s, a, b: lattice_apply_ri(dec, design, s, a, b))(
        st_r, jnp.asarray(fr), jnp.asarray(fi))
    np.testing.assert_allclose(np.asarray(yre2), np.real(y_c2), atol=2e-5)

    dst = transient_ducker_init(n_bands, n_ch)
    res_c, tr_c, _ = transient_ducker_apply(dst, jnp.asarray(frame))
    (rre, rim), (tre, tim), _ = transient_ducker_apply_ri(
        dst, jnp.asarray(fr), jnp.asarray(fi))
    np.testing.assert_allclose(np.asarray(rre), np.real(res_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tim), np.imag(tr_c), atol=1e-5)

    # aliased-energy variant (C's in-place ducker path, C_PARITY #9):
    # RI and complex implementations must also agree there, and differ
    # from the default pre-delay-energy path
    st_c = dec.init_state(design, n_bands)
    st_r = lattice_init_state_ri(dec, design, n_bands)
    ya = None
    for _ in range(3):  # run past the delays so the EWMAs actually differ
        ya, st_c = dec.apply(design, st_c, jnp.asarray(frame),
                             aliased_energy=True)
        (yar, yai), st_r = lattice_apply_ri(dec, design, st_r,
                                            jnp.asarray(fr), jnp.asarray(fi),
                                            aliased_energy=True)
    np.testing.assert_allclose(np.asarray(yar), np.real(ya), atol=2e-5)
    np.testing.assert_allclose(np.asarray(yai), np.imag(ya), atol=2e-5)
    assert np.abs(np.asarray(yre2) - np.asarray(yar)).max() > 1e-4


@pytest.mark.goldens
def test_decorrelator_model_ri_batched_matches_process_ducker():
    """models/decorrelator: the RI-batched multi-stream path equals the
    complex single-stream path with the ducker + level compensation on
    (exercises aliased_energy through both pipelines)."""
    import jax

    from spatial_audio_framework_tpu.models import decorrelator as DCR

    cfg = DCR.DecorrelatorConfig(n_channels=2, decor_amount=0.7,
                                 enable_transient_ducker=True,
                                 compensate_level=True)
    w = DCR.design(cfg)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8 * 128)).astype(np.float32) * 0.25
    x[:, 300] += 3.0  # a transient so the ducker engages
    st = DCR.init_state(cfg, w)
    outs = []
    for f in range(8):
        y, st = DCR.process(cfg, w, st, jnp.asarray(x[:, f * 128:(f + 1) * 128]))
        outs.append(np.asarray(y))
    ref = np.concatenate(outs, -1)

    stb = DCR.init_state_batched(cfg, w, n_streams=2)
    outs_b = []
    xb = jnp.asarray(np.stack([x, x]))           # two identical streams
    for f in range(8):
        yb, stb = DCR.process_ri_batched(cfg, w, stb,
                                         xb[..., f * 128:(f + 1) * 128])
        outs_b.append(np.asarray(yb))
    out_b = np.concatenate(outs_b, -1)
    for s in range(2):
        np.testing.assert_allclose(out_b[s], ref, atol=3e-5)
