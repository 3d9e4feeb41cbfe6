"""Natively-batched entry points == their single-instance references.

Round-5 grew leading-batch production paths (the `_32x` bench rows run
them): powermap/sldoa `analysis_batched`, powermap `analysis_chunks`
(map/EVD hoisted out of the chunk scan), MatrixConv's batched RI path
(including the grouped-conv spectral core that engages at
`_CONV_CORE_MIN_BATCH` instances), and TVConv's const-position fast path.
These tests pin each against per-instance / per-chunk reference calls so a
relayout or crossover regression fails CI instead of silently skewing
bench artifacts (round-5 review finding)."""
import numpy as np
import jax
import jax.numpy as jnp

from spatial_audio_framework_tpu.models import powermap as PM
from spatial_audio_framework_tpu.models import sldoa as SL
from spatial_audio_framework_tpu.ops import matrix_conv as MC


def test_powermap_analysis_batched_matches_per_instance():
    cfg = PM.PowermapConfig(master_order=2, mode=PM.PM_MVDR, norm="n3d")
    w = PM.design(cfg)
    rng = np.random.default_rng(0)
    N, T = 2, 512
    x = jnp.asarray(rng.standard_normal((N, cfg.nsh, T)).astype(np.float32))
    stb = PM.init_state_batched(cfg, w, N)
    sts = [PM.init_state(cfg, w) for _ in range(N)]
    for _ in range(2):
        pb, stb = PM.analysis_batched(cfg, w, stb, x)
        for i in range(N):
            p, sts[i] = PM.analysis(cfg, w, sts[i], x[i])
            np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(p),
                                       atol=5e-4)


def test_powermap_analysis_chunks_matches_sequential():
    cfg = PM.PowermapConfig(master_order=2, mode=PM.PM_MUSIC, norm="n3d")
    w = PM.design(cfg)
    rng = np.random.default_rng(1)
    K, T = 2, 512
    xs = jnp.asarray(rng.standard_normal((K, cfg.nsh, T)).astype(np.float32))
    st = PM.init_state(cfg, w)
    seq = []
    for k in range(K):
        p, st = PM.analysis(cfg, w, st, xs[k])
        seq.append(np.asarray(p))
    st2 = PM.init_state(cfg, w)
    pc, st2 = PM.analysis_chunks(cfg, w, st2, xs)
    np.testing.assert_allclose(np.asarray(pc), np.stack(seq), atol=5e-4)
    np.testing.assert_allclose(np.asarray(st2.Cx_re), np.asarray(st.Cx_re),
                               atol=5e-5)  # scan-body einsum reassociation
    # batched-chunks: leading instance axis
    N = 2
    xb = jnp.asarray(rng.standard_normal(
        (K, N, cfg.nsh, T)).astype(np.float32))
    stb = PM.init_state_batched(cfg, w, N)
    pb, _ = PM.analysis_chunks(cfg, w, stb, xb)
    for i in range(N):
        sti = PM.init_state(cfg, w)
        pi, _ = PM.analysis_chunks(cfg, w, sti, xb[:, i])
        np.testing.assert_allclose(np.asarray(pb[:, i]), np.asarray(pi),
                                   atol=5e-4)


def test_sldoa_analysis_batched_matches_per_instance():
    cfg = SL.SldoaConfig(master_order=2, norm="n3d")
    w = SL.design(cfg)
    rng = np.random.default_rng(2)
    N, T = 2, 512
    x = jnp.asarray(rng.standard_normal((N, cfg.nsh, T)).astype(np.float32))
    stb = SL.init_state_batched(cfg, N)
    sts = [SL.init_state(cfg) for _ in range(N)]
    for _ in range(2):
        ob, stb = SL.analysis_batched(cfg, w, stb, x)
        for i in range(N):
            o, sts[i] = SL.analysis(cfg, w, sts[i], x[i])
            scale = float(np.abs(np.asarray(o.energy)).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(ob.energy[i]) / scale,
                                       np.asarray(o.energy) / scale,
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(ob.azi_deg[i]),
                                       np.asarray(o.azi_deg), atol=2e-3)


def test_matrixconv_batched_conv_core_matches_einsum_core():
    """The grouped-conv spectral core engages at >= _CONV_CORE_MIN_BATCH
    instances and must match the (sub-threshold) einsum core per
    instance."""
    rng = np.random.default_rng(3)
    n_out, n_in, L = 3, 2, 512
    conv = MC.MatrixConv(hop=128, length_h=L, n_in=n_in, n_out=n_out,
                         partitioned=True)
    Hri = conv.design_ri(rng.standard_normal(
        (n_out, n_in, L)).astype(np.float32) * 0.2)
    N = MC._CONV_CORE_MIN_BATCH
    x = jnp.asarray(rng.standard_normal(
        (N, n_in, 4 * 128)).astype(np.float32))
    stb = conv.init_state_ri(batch=(N,))
    for _ in range(2):
        yb, stb = conv.apply_block_ri(Hri, stb, x)
    sts = conv.init_state_ri()
    for i in range(N):
        sti = conv.init_state_ri()
        yi = None
        for _ in range(2):
            yi, sti = conv.apply_block_ri(Hri, sti, x[i])
        np.testing.assert_allclose(np.asarray(yb[i]), np.asarray(yi),
                                   atol=2e-5)


def test_tvconv_const_path_matches_per_hop_path():
    """apply_block_ri_const (one position per call) must equal
    apply_block_ri with the broadcast per-hop index — including across a
    position CHANGE, where the crossfade splice engages."""
    rng = np.random.default_rng(4)
    n_irs, n_out, L = 5, 2, 512
    conv = MC.TVConv(hop=128, length_h=L, n_out=n_out, n_irs=n_irs)
    Hri = conv.design_ri(rng.standard_normal(
        (n_irs, n_out, L)).astype(np.float32) * 0.2)
    x = jnp.asarray(rng.standard_normal((3, 4 * 128)).astype(np.float32))
    idx_seq = [0, 3, 3]                     # change at call 1, static after
    st_a = conv.init_state_ri()
    st_b = conv.init_state_ri()
    for k, x_k in enumerate(x):
        ya, st_a = conv.apply_block_ri_const(
            Hri, st_a, x_k, jnp.int32(idx_seq[k]))
        yb, st_b = conv.apply_block_ri(
            Hri, st_b, x_k, jnp.full((4,), idx_seq[k], jnp.int32))
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   atol=2e-5)
    # batched const path vs per-instance const path
    N = 2
    xb = jnp.asarray(rng.standard_normal(
        (N, 4 * 128)).astype(np.float32))
    idxb = jnp.asarray([1, 4], jnp.int32)
    stb = conv.init_state_ri(batch=(N,))
    yb2, stb = conv.apply_block_ri_const(Hri, stb, xb, idxb)
    for i in range(N):
        sti = conv.init_state_ri()
        yi, _ = conv.apply_block_ri_const(Hri, sti, xb[i], idxb[i])
        np.testing.assert_allclose(np.asarray(yb2[i]), np.asarray(yi),
                                   atol=2e-5)
