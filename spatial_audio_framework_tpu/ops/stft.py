"""Basic STFT with overlap-add (counterpart of ``saf_stft_*`` in
saf_utility_fft.h:150-204): rectangular window when hop == winsize (LTI
operation), Hann analysis window otherwise; FFT size = 2·winsize
(zero-padded ×2); inverse = 1/N irFFT + overlap-add."""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spatial_audio_framework_tpu.ops.fft import irfft_op, rfft_op
from spatial_audio_framework_tpu.utils.filters import (
    WINDOWING_FUNCTION_HANN, get_windowing_function)


class STFTState(NamedTuple):
    in_tail: jax.Array   # (n_ch_in, winsize - hop)
    ola_tail: jax.Array  # (n_ch_out, 2*winsize - hop)


@dataclass(frozen=True)
class STFT:
    winsize: int
    hopsize: int
    n_ch_in: int = 1
    n_ch_out: int = 1

    @property
    def n_bands(self) -> int:
        return self.winsize + 1

    @property
    def fftsize(self) -> int:
        return 2 * self.winsize

    def _window(self) -> np.ndarray:
        if self.winsize == self.hopsize:
            return np.ones(self.winsize, np.float32)
        return get_windowing_function(WINDOWING_FUNCTION_HANN, self.winsize)

    def init_state(self) -> STFTState:
        return STFTState(
            in_tail=jnp.zeros((self.n_ch_in, self.winsize - self.hopsize),
                              jnp.float32),
            ola_tail=jnp.zeros((self.n_ch_out, self.fftsize - self.hopsize),
                               jnp.float32))

    def forward(self, state: STFTState, x: jax.Array):
        """x: (n_ch, H*hop) → ((n_bands, n_ch, H), state)."""
        win, hop = self.winsize, self.hopsize
        n_ch = x.shape[0]
        H = x.shape[1] // hop
        buf = jnp.concatenate([state.in_tail, x], axis=-1)
        hops = buf.reshape(n_ch, (win - hop) // hop + H, hop)
        k_hops = win // hop
        seg = jnp.stack([hops[:, k: k + H] for k in range(k_hops)], axis=2)
        frames = seg.reshape(n_ch, H, win) * jnp.asarray(self._window())
        spec = rfft_op(frames, self.fftsize)
        return spec.transpose(2, 0, 1), state._replace(in_tail=buf[:, H * hop:])

    def backward(self, state: STFTState, Y: jax.Array):
        """Y: (n_bands, n_ch, H) → ((n_ch, H*hop), state)."""
        hop, nfft = self.hopsize, self.fftsize
        Y = Y.transpose(1, 2, 0)
        n_ch, H = Y.shape[:2]
        frames = irfft_op(Y, nfft)  # (n_ch, H, nfft)
        k_hops = nfft // hop
        acc = jnp.zeros((n_ch, H + k_hops - 1, hop), frames.dtype)
        fr = frames.reshape(n_ch, H, k_hops, hop)
        for k in range(k_hops):
            acc = acc.at[:, k: k + H].add(fr[:, :, k])
        flat = acc.reshape(n_ch, -1)
        flat = flat.at[:, : nfft - hop].add(state.ola_tail)
        return flat[:, : H * hop], state._replace(ola_tail=flat[:, H * hop:])
