"""A/B the HOT matmul precision (ops/precision.py) on real configs.

Usage: SAF_TPU_MATMUL_PRECISION=high|highest python scripts/hot_precision_bench.py
Prints per-config RTF with the two-chain-slope estimator (same method as
bench.py) plus max|y_high − y_highest| when run with --check.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

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
    main()
