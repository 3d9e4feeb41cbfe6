"""Streaming engine: scan long signals through a block processor.

The reference processes fixed 128-sample frames one callback at a time; here
a whole signal (or a long segment) is rendered as ``lax.scan`` over blocks of
H hops, so XLA pipelines the filterbank and the per-band matmuls across the
block axis with no Python overhead.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def render_signal(process_fn: Callable, state, x: jax.Array,
                  block_size: int):
    """Run ``process_fn(state, block) -> (out_block, state)`` over a long
    signal x: (..., C, T) in blocks of ``block_size`` samples via lax.scan.

    T must be a multiple of block_size.  Returns (y: (..., C_out, T), state).
    """
    C, T = x.shape[-2], x.shape[-1]
    n_blocks = T // block_size
    assert n_blocks * block_size == T, (T, block_size)
    xb = x.reshape(*x.shape[:-1], n_blocks, block_size)
    xb = jnp.moveaxis(xb, -2, 0)  # (n_blocks, ..., C, block)

    def step(st, blk):
        out, st = process_fn(st, blk)
        return st, out

    state, yb = jax.lax.scan(step, state, xb)
    y = jnp.moveaxis(yb, 0, -2)
    return y.reshape(*y.shape[:-2], -1), state
