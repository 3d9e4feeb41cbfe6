"""Convolver tests mirroring the reference's reconstruction recipe
(test__utilities_module.c:403 saf_matrixConv etc.): outputs must equal direct
linear convolution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.signal import fftconvolve

from spatial_audio_framework_tpu.ops.matrix_conv import (MatrixConv, MultiConv,
                                                         TVConv)

HOP = 64


def _direct(H, x):
    """(n_out, n_in, L) ⊛ (n_in, T) → (n_out, T)"""
    n_out, n_in, L = H.shape
    T = x.shape[-1]
    y = np.zeros((n_out, T + L - 1))
    for o in range(n_out):
        for i in range(n_in):
            y[o] += fftconvolve(x[i], H[o, i])
    return y[:, :T].astype(np.float32)


@pytest.mark.parametrize("partitioned", [True, False])
def test_matrix_conv_reconstruction(partitioned):
    rng = np.random.default_rng(0)
    n_in, n_out, L, T = 3, 2, 190, 16 * HOP
    H = rng.standard_normal((n_out, n_in, L)).astype(np.float32) * 0.2
    x = rng.standard_normal((n_in, T)).astype(np.float32)
    mc = MatrixConv(hop=HOP, length_h=L, n_in=n_in, n_out=n_out,
                    partitioned=partitioned)
    Hf = mc.design(H)
    st = mc.init_state()
    y, _ = jax.jit(mc.apply_block)(Hf, st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), _direct(H, x), atol=2e-4)


def test_matrix_conv_block_invariance():
    rng = np.random.default_rng(1)
    n_in, n_out, L = 2, 2, 300
    H = rng.standard_normal((n_out, n_in, L)).astype(np.float32) * 0.2
    x = rng.standard_normal((n_in, 16 * HOP)).astype(np.float32)
    mc = MatrixConv(hop=HOP, length_h=L, n_in=n_in, n_out=n_out)
    Hf = mc.design(H)
    st = mc.init_state()
    big, _ = jax.jit(mc.apply_block)(Hf, st, jnp.asarray(x))
    st = mc.init_state()
    outs = []
    ab = jax.jit(mc.apply_block)
    for i in range(0, 16, 4):
        o, st = ab(Hf, st, jnp.asarray(x[:, i * HOP:(i + 4) * HOP]))
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.asarray(big), np.concatenate(outs, -1),
                               atol=1e-5)


def test_multi_conv_reconstruction():
    rng = np.random.default_rng(2)
    n_ch, L, T = 4, 200, 12 * HOP
    H = rng.standard_normal((n_ch, L)).astype(np.float32) * 0.3
    x = rng.standard_normal((n_ch, T)).astype(np.float32)
    mc = MultiConv(hop=HOP, length_h=L, n_ch=n_ch)
    Hf = mc.design(H)
    y, _ = jax.jit(mc.apply_block)(Hf, mc.init_state(), jnp.asarray(x))
    ref = np.stack([fftconvolve(x[c], H[c])[:T] for c in range(n_ch)])
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)


def test_tvconv_static_position_matches_direct():
    rng = np.random.default_rng(3)
    n_out, L, T, n_irs = 2, 150, 10 * HOP, 3
    H = rng.standard_normal((n_irs, n_out, L)).astype(np.float32) * 0.3
    x = rng.standard_normal(T).astype(np.float32)
    tv = TVConv(hop=HOP, length_h=L, n_out=n_out, n_irs=n_irs)
    Hf = tv.design(H)
    st = tv.init_state(init_idx=1)
    idx = jnp.full((T // HOP,), 1, jnp.int32)
    y, _ = jax.jit(tv.apply_block)(Hf, st, jnp.asarray(x), idx)
    ref = np.stack([fftconvolve(x, H[1, o])[:T] for o in range(n_out)])
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)


def test_tvconv_position_change_crossfades():
    """On a position switch the output crossfades within one hop — continuous,
    no clicks, and settles to the new filter's output."""
    rng = np.random.default_rng(4)
    n_out, L, T, n_irs = 1, 100, 12 * HOP, 2
    H = rng.standard_normal((n_irs, n_out, L)).astype(np.float32) * 0.3
    x = rng.standard_normal(T).astype(np.float32)
    tv = TVConv(hop=HOP, length_h=L, n_out=n_out, n_irs=n_irs)
    Hf = tv.design(H)
    idx = np.zeros(T // HOP, np.int32)
    idx[6:] = 1
    y, _ = jax.jit(tv.apply_block)(Hf, tv.init_state(0), jnp.asarray(x),
                                   jnp.asarray(idx))
    y = np.asarray(y)
    ref0 = np.stack([fftconvolve(x, H[0, o])[:T] for o in range(n_out)])
    ref1 = np.stack([fftconvolve(x, H[1, o])[:T] for o in range(n_out)])
    # before the switch: filter set 0
    np.testing.assert_allclose(y[:, : 6 * HOP], ref0[:, : 6 * HOP], atol=2e-4)
    # well after the switch (one hop of crossfade + tail): filter set 1
    np.testing.assert_allclose(y[:, 9 * HOP:], ref1[:, 9 * HOP:], atol=2e-3)


def test_matrix_conv_ri_equivalence():
    """Split real/imaginary partitioned convolution equals the complex path
    and direct convolution (complex-free graph for runtimes without complex
    transfer support)."""
    import jax

    from spatial_audio_framework_tpu.ops.matrix_conv import MatrixConv

    rng = np.random.default_rng(11)
    hop, L, n_in, n_out = 128, 700, 3, 2
    H = rng.standard_normal((n_out, n_in, L)).astype(np.float32) * 0.2
    conv = MatrixConv(hop=hop, length_h=L, n_in=n_in, n_out=n_out)
    Hf = conv.design(H)
    Hri = conv.design_ri(H)
    x = rng.uniform(-1, 1, (n_in, hop * 16)).astype(np.float32)

    st_c = conv.init_state()
    y_c, st_c = jax.jit(conv.apply_block)(Hf, st_c, jnp.asarray(x))
    st_r = conv.init_state_ri()
    y_r, st_r = jax.jit(conv.apply_block_ri)(Hri, st_r, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)
    # second block: state carry equivalence
    y_c2, _ = jax.jit(conv.apply_block)(Hf, st_c, jnp.asarray(x))
    y_r2, _ = jax.jit(conv.apply_block_ri)(Hri, st_r, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r2), np.asarray(y_c2), atol=1e-4)


def test_ambi_roomsim_ri_equivalence():
    from spatial_audio_framework_tpu.models import ambi_roomsim as RS

    cfg = RS.AmbiRoomSimConfig(sh_order=1, n_sources=2, refl_order=1,
                               room_dims=(5.0, 4.0, 3.0))
    src = np.array([[1.0, 1.0, 1.0], [3.5, 2.5, 1.5]])
    rec = np.array([[2.5, 2.0, 1.5]])
    w = RS.design(cfg, src, rec)
    wri = RS.design_ri(cfg, src, rec)
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (2, 8 * 128)).astype(np.float32)
    import jax
    y_c, _ = jax.jit(lambda s, xx: RS.process(cfg, w, s, xx))(
        RS.init_state(cfg, w), jnp.asarray(x))
    y_r, _ = jax.jit(lambda s, xx: RS.process_ri(cfg, wri, s, xx))(
        RS.init_state_ri(cfg, wri), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)


def test_multi_conv_ri_equivalence():
    import jax

    rng = np.random.default_rng(13)
    hop, L, n_ch = 128, 500, 3
    H = (rng.standard_normal((n_ch, L)) * 0.2).astype(np.float32)
    conv = MultiConv(hop=hop, length_h=L, n_ch=n_ch)
    Hf, Hri = conv.design(H), conv.design_ri(H)
    x = rng.uniform(-1, 1, (n_ch, hop * 12)).astype(np.float32)
    y_c, st_c = jax.jit(conv.apply_block)(Hf, conv.init_state(),
                                          jnp.asarray(x))
    y_r, st_r = jax.jit(conv.apply_block_ri)(Hri, conv.init_state_ri(),
                                             jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)


def test_tvconv_block_matches_sequential_hops():
    """The batched (scan-free) block path reproduces the per-hop recurrence
    exactly: random position stream, state carried across two blocks."""
    import jax

    rng = np.random.default_rng(21)
    hop, L, n_out, n_irs = 128, 300, 2, 4
    H = (rng.standard_normal((n_irs, n_out, L)) * 0.3).astype(np.float32)
    tv = TVConv(hop=hop, length_h=L, n_out=n_out, n_irs=n_irs)
    Hf = tv.design(H)
    nh = 9
    idx = rng.integers(0, n_irs, 2 * nh).astype(np.int32)
    x = rng.uniform(-1, 1, (2 * nh * hop,)).astype(np.float32)

    st_b = tv.init_state(0)
    outs_b = []
    for blk in range(2):
        y, st_b = jax.jit(tv.apply_block)(
            Hf, st_b, jnp.asarray(x[blk * nh * hop:(blk + 1) * nh * hop]),
            jnp.asarray(idx[blk * nh:(blk + 1) * nh]))
        outs_b.append(np.asarray(y))
    y_block = np.concatenate(outs_b, axis=-1)

    st_s = tv.init_state(0)
    hops = []
    for t in range(2 * nh):
        yh, st_s = tv.apply_hop(Hf, st_s, jnp.asarray(x[t * hop:(t + 1) * hop]),
                                jnp.int32(idx[t]))
        hops.append(np.asarray(yh))
    y_seq = np.concatenate(hops, axis=-1)
    np.testing.assert_allclose(y_block, y_seq, atol=1e-5)


def test_tvconv_ri_equivalence():
    import jax

    rng = np.random.default_rng(14)
    hop, L, n_out, n_irs = 128, 400, 2, 3
    H = (rng.standard_normal((n_irs, n_out, L)) * 0.3).astype(np.float32)
    tv = TVConv(hop=hop, length_h=L, n_out=n_out, n_irs=n_irs)
    Hf, Hri = tv.design(H), tv.design_ri(H)
    nh = 12
    x = rng.uniform(-1, 1, (nh * hop,)).astype(np.float32)
    idx = jnp.asarray(np.array([0] * 4 + [2] * 4 + [1] * 4, np.int32))
    y_c, _ = jax.jit(tv.apply_block)(Hf, tv.init_state(0), jnp.asarray(x), idx)
    y_r, _ = jax.jit(tv.apply_block_ri)(Hri, tv.init_state_ri(0),
                                        jnp.asarray(x), idx)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)


def test_conv_examples_ri_paths():
    """The three conv example wrappers expose RI variants equal to the
    complex paths."""
    import jax

    from spatial_audio_framework_tpu.models.conv_examples import (
        MatrixConvExample, MultiConvExample, TVConvExample)

    rng = np.random.default_rng(17)
    hop = 128
    # matrixconv
    ex = MatrixConvExample()
    H = (rng.standard_normal((2, 3, 300)) * 0.2).astype(np.float32)
    conv, Hf = ex.design(H)
    _, Hri = ex.design_ri(H)
    x = rng.uniform(-1, 1, (3, hop * 8)).astype(np.float32)
    y_c, _ = jax.jit(ex.process, static_argnums=0)(conv, Hf,
                                                   ex.init_state(conv),
                                                   jnp.asarray(x))
    y_r, _ = jax.jit(ex.process_ri, static_argnums=0)(conv, Hri,
                                                      ex.init_state_ri(conv),
                                                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)
    # multiconv
    ex2 = MultiConvExample()
    H2 = (rng.standard_normal((3, 300)) * 0.2).astype(np.float32)
    conv2, Hf2 = ex2.design(H2)
    _, Hri2 = ex2.design_ri(H2)
    y_c, _ = jax.jit(ex2.process, static_argnums=0)(conv2, Hf2,
                                                    ex2.init_state(conv2),
                                                    jnp.asarray(x))
    y_r, _ = jax.jit(ex2.process_ri, static_argnums=0)(
        conv2, Hri2, ex2.init_state_ri(conv2), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)
    # tvconv
    ex3 = TVConvExample()
    irs = (rng.standard_normal((3, 2, 300)) * 0.2).astype(np.float32)
    pos = rng.uniform(0, 5, (3, 3)).astype(np.float32)
    conv3, Hf3, P = ex3.design(irs, pos)
    _, Hri3, _ = ex3.design_ri(irs, pos)
    lp = jnp.asarray(pos[1] + 0.05)
    xt = rng.uniform(-1, 1, (hop * 8,)).astype(np.float32)
    y_c, _ = jax.jit(ex3.process, static_argnums=0)(
        conv3, Hf3, ex3.init_state(conv3, 1), jnp.asarray(xt), lp, P)
    y_r, _ = jax.jit(ex3.process_ri, static_argnums=0)(
        conv3, Hri3, ex3.init_state_ri(conv3, 1), jnp.asarray(xt), lp, P)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_c), atol=1e-4)
