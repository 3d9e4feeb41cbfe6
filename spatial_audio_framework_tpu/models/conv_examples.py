"""matrixconv / multiconv / tvconv example renderers (counterparts of
``examples/src/{matrixconv,multiconv,tvconv}``).

The reference examples wrap the saf_utility_matrixConv engines in a FIFO that
re-frames arbitrary host buffer sizes into hops (e.g. matrixconv.c:132-146);
the block-batched ops here already accept any multiple of the hop size, so
these wrappers only add the example-level configuration (filter loading,
partitioning flag, position state for tvconv).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.ops.matrix_conv import (MatrixConv,
                                                         MatrixConvState,
                                                         MultiConv, TVConv,
                                                         TVConvState)


@dataclass(frozen=True)
class MatrixConvExample:
    """examples/src/matrixconv: nCHout×nCHin filter matrix convolver."""
    hop: int = 128
    partitioned: bool = True  # matrixconv.h enablePartitionedConv

    def design(self, H: np.ndarray):
        n_out, n_in, L = H.shape
        conv = MatrixConv(hop=self.hop, length_h=L, n_in=n_in, n_out=n_out,
                          partitioned=self.partitioned)
        return conv, conv.design(H)

    def init_state(self, conv: MatrixConv) -> MatrixConvState:
        return conv.init_state()

    def process(self, conv: MatrixConv, Hf, state, x):
        return conv.apply_block(Hf, state, x)

    # complex-free variant (partitioned mode; see ops.afstft_ri rationale)
    def design_ri(self, H: np.ndarray):
        n_out, n_in, L = H.shape
        # forward partitioned so the RI path's partitioned-only assert fires
        # instead of silently overriding partitioned=False with the default
        conv = MatrixConv(hop=self.hop, length_h=L, n_in=n_in, n_out=n_out,
                          partitioned=self.partitioned)
        return conv, conv.design_ri(H)

    def init_state_ri(self, conv: MatrixConv) -> MatrixConvState:
        return conv.init_state_ri()

    def process_ri(self, conv: MatrixConv, H_ri, state, x):
        return conv.apply_block_ri(H_ri, state, x)


@dataclass(frozen=True)
class MultiConvExample:
    """examples/src/multiconv: per-channel (no matrixing) convolver."""
    hop: int = 128
    partitioned: bool = True

    def design(self, H: np.ndarray):
        n_ch, L = H.shape
        conv = MultiConv(hop=self.hop, length_h=L, n_ch=n_ch,
                         partitioned=self.partitioned)
        return conv, conv.design(H)

    def init_state(self, conv: MultiConv) -> MatrixConvState:
        return conv.init_state()

    def process(self, conv: MultiConv, Hf, state, x):
        return conv.apply_block(Hf, state, x)

    # complex-free variant (partitioned mode)
    def design_ri(self, H: np.ndarray):
        n_ch, L = H.shape
        conv = MultiConv(hop=self.hop, length_h=L, n_ch=n_ch,
                         partitioned=self.partitioned)  # see MatrixConv note
        return conv, conv.design_ri(H)

    def init_state_ri(self, conv: MultiConv) -> MatrixConvState:
        return conv.init_state_ri()

    def process_ri(self, conv: MultiConv, H_ri, state, x):
        return conv.apply_block_ri(H_ri, state, x)


@dataclass(frozen=True)
class TVConvExample:
    """examples/src/tvconv: time-varying convolver keyed on listener position.

    The example maps a 3-D listener position onto the nearest stored position
    index (tvconv_internal ``tvconv_findNearestNeigbour``); here that lookup
    is traced so positions can stream per block.
    """
    hop: int = 128

    def design(self, irs: np.ndarray, positions: np.ndarray):
        """irs: (nPos, nCH, L); positions: (nPos, 3)."""
        n_pos, n_ch, L = irs.shape
        conv = TVConv(hop=self.hop, length_h=L, n_out=n_ch, n_irs=n_pos)
        return conv, conv.design(irs), jnp.asarray(positions, jnp.float32)

    def init_state(self, conv: TVConv, init_idx: int = 0) -> TVConvState:
        return conv.init_state(init_idx)

    @staticmethod
    def nearest_position(positions: jax.Array, listener_pos: jax.Array):
        """Traced nearest-neighbour position index; listener_pos (..., 3)
        → (...,) int32 (batch-tolerant)."""
        d = jnp.sum((positions - listener_pos[..., None, :]) ** 2, axis=-1)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    def process(self, conv: TVConv, Hf, state: TVConvState, x: jax.Array,
                listener_pos: jax.Array, positions: jax.Array):
        """x: (..., T); listener_pos: traced (..., 3) → ((..., nCH, T),
        state).  Leading batch dims run independent instances in one
        dispatch (state from init_state(batch=...))."""
        idx = self.nearest_position(positions, listener_pos)
        n_hops = x.shape[-1] // self.hop
        return conv.apply_block(Hf, state, x, jnp.broadcast_to(
            idx[..., None], idx.shape + (n_hops,)))

    # complex-free variant
    def design_ri(self, irs: np.ndarray, positions: np.ndarray):
        n_pos, n_ch, L = irs.shape
        conv = TVConv(hop=self.hop, length_h=L, n_out=n_ch, n_irs=n_pos)
        return conv, conv.design_ri(irs), jnp.asarray(positions, jnp.float32)

    def init_state_ri(self, conv: TVConv, init_idx: int = 0) -> TVConvState:
        return conv.init_state_ri(init_idx)

    def process_ri(self, conv: TVConv, H_ri, state: TVConvState, x: jax.Array,
                   listener_pos: jax.Array, positions: jax.Array):
        """Batch-tolerant like :meth:`process` (x (..., T)).  One position
        per call ⇒ the const-index fast path (filters gathered once,
        boundary-only crossfade rows — apply_block_ri_const)."""
        idx = self.nearest_position(positions, listener_pos)
        return conv.apply_block_ri_const(H_ri, state, x, idx)
