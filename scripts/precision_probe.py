"""Measure MXU throughput + accuracy of the three f32 matmul precisions on
the attached TPU.  Informs the HOT precision default in ops/precision.py.

Usage: python scripts/precision_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    # tvconv-like shape: rows = streams*hops, K = 2*hop, N = bins
    M, K, N = 8192, 256, 256
    a = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.max(np.abs(ref))
    reps = 256

    for name, prec in [("default", jax.lax.Precision.DEFAULT),
                       ("high", jax.lax.Precision.HIGH),
                       ("highest", jax.lax.Precision.HIGHEST)]:
        @jax.jit
        def chain(a, b, prec=prec):
            x = a
            for _ in range(reps):
                x = jnp.matmul(x, b, precision=prec)
                x = x * (1.0 / jnp.float32(16.0))  # keep magnitudes bounded
            return x

        y1 = jnp.matmul(a, b, precision=prec)
        err = float(np.max(np.abs(np.asarray(y1, np.float64) - ref)) / scale)
        chain(a, b).block_until_ready()  # compile
        t0 = time.perf_counter()
        chain(a, b).block_until_ready()
        dt = time.perf_counter() - t0
        tflops = reps * 2 * M * K * N / dt / 1e12
        print(f"{name:8s}  rel_err={err:.2e}  {tflops:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
