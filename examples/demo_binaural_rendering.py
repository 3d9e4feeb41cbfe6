"""Demo: object-based and Ambisonics-based binaural rendering.

Runs on any backend (CPU included). Renders a moving source two ways:
1. binauraliser — direct HRTF rendering of the object;
2. ambi_enc → ambi_bin (MagLS) — encode to order-3 Ambisonics, decode
   binaurally with head-tracking.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from spatial_audio_framework_tpu.models import ambi_bin, ambi_enc, binauraliser


def main():
    fs, hop = 48000.0, 128
    n_blocks, H = 40, 16                       # 40 × ~43 ms blocks
    t = np.arange(n_blocks * H * hop) / fs
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)

    # --- path 1: binauraliser (complex-free fast path, works on every
    #     backend incl. runtimes without complex transfer support) ---------
    bcfg = binauraliser.BinauraliserConfig(n_sources=1)
    bw = binauraliser.design_ri(bcfg)
    bst = binauraliser.init_state_batched(bcfg, 1)
    bproc = jax.jit(lambda st, x, d: binauraliser.process_ri_batched(
        bcfg, bw, st, x, d))
    out1 = []
    for k in range(n_blocks):
        azi = -90.0 + 180.0 * k / n_blocks     # sweep right → left
        blk = sig[k * H * hop:(k + 1) * H * hop][None, None]
        y, bst = bproc(bst, jnp.asarray(blk),
                       jnp.asarray([[[azi, 0.0]]], jnp.float32))
        out1.append(np.asarray(y)[0])
    out1 = np.concatenate(out1, -1)

    # --- path 2: ambi_enc → ambi_bin -------------------------------------
    ecfg = ambi_enc.AmbiEncConfig(order=3, n_sources=1, norm="n3d",
                                 frame_size=H * hop)
    conv = ambi_enc.design(ecfg)
    acfg = ambi_bin.AmbiBinConfig(order=3, norm="n3d", method="magls")
    awri = ambi_bin.design_ri(acfg)
    est = ambi_enc.init_state(ecfg, np.array([[-90.0, 0.0]]))
    ast = ambi_bin.init_state_batched(acfg, 1)
    eproc = jax.jit(lambda st, x, d: ambi_enc.process(ecfg, conv, st, x, d))
    aproc = jax.jit(lambda st, x: ambi_bin.process_ri_batched(acfg, awri,
                                                              st, x))
    out2 = []
    for k in range(n_blocks):
        azi = -90.0 + 180.0 * k / n_blocks
        blk = sig[k * H * hop:(k + 1) * H * hop][None]
        sh, est = eproc(est, jnp.asarray(blk),
                        jnp.asarray([[azi, 0.0]], jnp.float32))
        y, ast = aproc(ast, sh[None])
        out2.append(np.asarray(y)[0])
    out2 = np.concatenate(out2, -1)

    for name, y in [("binauraliser", out1), ("ambi_enc→ambi_bin", out2)]:
        eL, eR = float((y[0] ** 2).sum()), float((y[1] ** 2).sum())
        print(f"{name}: rendered {y.shape[1] / fs:.2f}s, "
              f"L/R energy {eL:.1f}/{eR:.1f}")
    print("ok")


if __name__ == "__main__":
    main()
