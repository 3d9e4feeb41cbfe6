"""A/B the HOT matmul precision (ops/precision.py) on real configs.

Usage:
  SAF_TPU_MATMUL_PRECISION=high|highest python scripts/hot_precision_bench.py
      — per-config RTF with the two-chain-slope estimator (bench.py method)
  python scripts/hot_precision_bench.py --check
      — numerical A/B: renders one flagship chunk per mode via
        set_hot_precision and prints max|y_mode − y_highest| for
        mode ∈ {default, high}, asserting the documented error ordering
        (default ≫ high > 0 on TPU; all ≈ 0 on CPU where precision is a
        no-op).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

try:  # persistent compile cache + fail-fast on a wedged tunnel
    jax.config.update("jax_compilation_cache_dir", "/tmp/saf_tpu_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

FS = 48000.0
K = 8
HOP = 128
Tc = 64 * HOP


def fenced_rtf(step, state, xs, audio_sec, n_rep=3, c1=4, c2=36):
    p = jax.jit(step)
    e, state = p(state, xs)
    float(e)

    def run(chain):
        nonlocal state
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            s = state
            for _ in range(chain):
                e, s = p(s, xs)
            float(e)
            ts.append(time.perf_counter() - t0)
            state = s
        return float(np.min(ts))

    t1, t2 = run(c1), run(c2)
    per = (t2 - t1) / (c2 - c1)
    if per <= 0:
        per = t2 / c2
    if per * (c2 - c1) < 0.6:
        c2 = c1 + min(512, int(np.ceil(0.6 / max(per, 1e-5))))
        t2 = run(c2)
        per2 = (t2 - t1) / (c2 - c1)
        per = per2 if per2 > 0 else t2 / c2
    return audio_sec / per


def scan_chunks(body):
    def step(st, xs):
        st, e = jax.lax.scan(body, st, xs)
        return jnp.sum(e), st
    return step


def check():
    """max|y_mode − y_highest| of one flagship chunk, per HOT mode."""
    from spatial_audio_framework_tpu.models import ambi_bin
    from spatial_audio_framework_tpu.ops import precision as _prec

    rng = np.random.default_rng(0)
    cfg0 = ambi_bin.AmbiBinConfig(order=3, method="magls")
    wri = ambi_bin.design_ri(cfg0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, cfg0.nsh, 32 * HOP))
                    .astype(np.float32))

    def render(mode):
        # per-config override (threads mxu_mode through the fused kernels
        # AND the XLA paths; ops/precision.py)
        cfg = ambi_bin.AmbiBinConfig(order=3, method="magls",
                                     mxu_precision=mode)
        st = ambi_bin.init_state_batched(cfg, 8)
        y, _ = jax.jit(lambda w, s, xx: ambi_bin.process_ri_batched(
            cfg, w, s, xx))(wri, st, x)
        return np.asarray(y)

    y_exact = render("highest")
    errs = {}
    for mode in ("high", "default"):
        errs[mode] = float(np.abs(render(mode) - y_exact).max())
        print(f"max|y_{mode} - y_highest| = {errs[mode]:.3e}")
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        assert errs["default"] > errs["high"], (
            "documented error ordering violated: 1-pass bf16 should be "
            f"far coarser than 3-pass f32x3 ({errs})")
        assert errs["high"] < 1e-4, (
            f"'high' mode exceeds the C-parity budget: {errs['high']:.3e}")
    print("ok (ordering %s)" % ("asserted" if on_tpu
                                else "not checked on CPU: precision no-op"))
    return errs


def main():
    rng = np.random.default_rng(0)
    out = {}

    # tvconv (single instance)
    from spatial_audio_framework_tpu.models import conv_examples as CE
    tv = CE.TVConvExample()
    irs = 0.1 * rng.standard_normal((64, 2, 2048)).astype(np.float32)
    irs[:, :, 0] += 1.0
    pos = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    conv, Hri, posd = tv.design_ri(irs, pos)
    lpos = jnp.asarray(pos[3])
    tx = jax.jit(lambda x: jax.vmap(lambda k: jnp.roll(x, k + 1, -1))(
        jnp.arange(K)))(jnp.asarray(
            rng.uniform(-1, 1, (Tc,)).astype(np.float32)))

    def tbody(st, xk):
        y, st = tv.process_ri(conv, Hri, st, xk, lpos, posd)
        return st, jnp.sum(y * y)

    out["tvconv"] = fenced_rtf(scan_chunks(tbody), tv.init_state_ri(conv),
                               tx, K * Tc / FS)

    # powermap o3 MUSIC
    from spatial_audio_framework_tpu.models import powermap as PM
    pcfg = PM.PowermapConfig(master_order=3, mode=PM.PM_MUSIC, norm="n3d")
    pw = PM.design(pcfg)
    px = jax.jit(lambda x: jax.vmap(lambda k: jnp.roll(x, k + 1, -1))(
        jnp.arange(K)))(jnp.asarray(rng.uniform(
            -1, 1, (pcfg.nsh, Tc)).astype(np.float32)))

    def pbody(st, xk):
        m, st = PM.analysis(pcfg, pw, st, xk)
        return st, jnp.sum(m)

    out["powermap"] = fenced_rtf(scan_chunks(pbody), PM.init_state(pcfg, pw),
                                 px, K * Tc / FS)

    mode = os.environ.get("SAF_TPU_MATMUL_PRECISION", "high")
    for k, v in out.items():
        print(f"{mode:8s} {k:10s} rtf={v:9.1f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="numerical A/B of the HOT modes instead of RTFs")
    args = ap.parse_args()
    from spatial_audio_framework_tpu.runtime.watchdog import probe_device
    probe_device(timeout_s=120.0)  # exits with a diagnostic on a dead tunnel
    if args.check:
        check()
    else:
        main()
