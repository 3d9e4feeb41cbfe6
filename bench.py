"""Benchmark: 64 concurrent order-3 MagLS ambi_bin streams, real-time factor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is audio-seconds rendered per wall-second per chip (RTF) and vs_baseline is
value / 100 (the driver target: >100x real-time per v5e chip; the reference
publishes no numbers — BASELINE.json "published" is empty).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spatial_audio_framework_tpu.models import ambi_bin

    FS = 48000.0
    N_STREAMS = 64
    ORDER = 3
    HOP = 128
    HOPS_PER_BLOCK = 32          # 32*128 = 4096 samples (~85 ms) per call
    N_BLOCKS = 50

    cfg = ambi_bin.AmbiBinConfig(order=ORDER, fs=FS, method="magls")
    w = ambi_bin.design(cfg)
    st1 = ambi_bin.init_state(cfg)
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (N_STREAMS,) + a.shape),
                          st1)

    T = HOPS_PER_BLOCK * HOP
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N_STREAMS, cfg.nsh, T)).astype(np.float32))

    # NB: weights are jit *arguments* (closure constants would require a
    # device→host complex transfer at lowering, unsupported on this runtime).
    proc = jax.jit(jax.vmap(lambda w, s, xx: ambi_bin.process(cfg, w, s, xx),
                            in_axes=(None, 0, 0)))
    # warm-up / compile
    y, states = proc(w, states, x)
    y.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(N_BLOCKS):
        y, states = proc(w, states, x)
    y.block_until_ready()
    dt = time.perf_counter() - t0

    audio_seconds = N_STREAMS * N_BLOCKS * T / FS
    rtf = audio_seconds / dt
    p50_block_ms = 1000.0 * dt / N_BLOCKS
    result = {
        "metric": "ambi_bin_order3_magls_64streams_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 3),
        "extra": {
            "p50_block_latency_ms": round(p50_block_ms, 3),
            "block_samples": T,
            "n_streams": N_STREAMS,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
