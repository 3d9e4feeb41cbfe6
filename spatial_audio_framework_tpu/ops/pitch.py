"""SMB phase-vocoder pitch shifter (counterpart of ``saf_utility_pitch``,
the classic smbPitchShift algorithm).

Functional state + lax.scan over STFT frames (the phase accumulators are a
true sequential dependency); each frame is windowed rFFT → phase-vocoder
reassignment (scatter-add over bins) → irFFT → overlap-add, all batched over
channels.  The pitch-shift factor is traced, so it can vary per block.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np



class SmbPitchShiftState(NamedTuple):
    in_fifo: jax.Array     # (nCH, N - step) input history
    out_accum: jax.Array   # (nCH, N) overlap-add accumulator
    last_phase: jax.Array  # (nCH, N//2+1)
    sum_phase: jax.Array   # (nCH, N//2+1)
    out_fifo: jax.Array    # (nCH, step) pending output (one-hop latency,
    #                        gOutFIFO in saf_utility_pitch.c:245 — hop j's
    #                        synthesis is emitted while hop j+1 is collected)


@dataclass(frozen=True)
class SmbPitchShift:
    fs: float = 48000.0
    n_ch: int = 1
    fft_size: int = 8192     # smb_pitchShift_create defaults (pitch_shifter.c)
    osamp: int = 16

    @property
    def step(self) -> int:
        return self.fft_size // self.osamp

    @property
    def latency(self) -> int:
        return self.fft_size - self.step

    def init_state(self) -> SmbPitchShiftState:
        N, half = self.fft_size, self.fft_size // 2 + 1
        return SmbPitchShiftState(
            in_fifo=jnp.zeros((self.n_ch, N - self.step), jnp.float32),
            out_accum=jnp.zeros((self.n_ch, N), jnp.float32),
            last_phase=jnp.zeros((self.n_ch, half), jnp.float32),
            sum_phase=jnp.zeros((self.n_ch, half), jnp.float32),
            out_fifo=jnp.zeros((self.n_ch, self.step), jnp.float32))

    def design(self):
        """Device copies of the DFT matmul operators, to pass into a jitted
        apply() as ARGUMENTS.  At fft_size 8192 the four matrices are
        ~0.5 GB of constants — baked into the traced graph they blow past
        remote-compile payload limits (HTTP 413 on the axon tunnel), while
        as runtime parameters they transfer once over h2d."""
        from spatial_audio_framework_tpu.ops.fft import _rdft_mats

        C, S, A, B = _rdft_mats(self.fft_size)
        return (jnp.asarray(C), jnp.asarray(S), jnp.asarray(A), jnp.asarray(B))

    def apply(self, state: SmbPitchShiftState, x: jax.Array,
              shift_factor: jax.Array, mats=None):
        """x: (nCH, T) with T a multiple of step → ((nCH, T), state).
        mats: optional design() output; pass it through jit arguments when
        compiling for a remote device (see design())."""
        N, step, osamp = self.fft_size, self.step, self.osamp
        half = N // 2 + 1
        n_frames = x.shape[-1] // step
        win = jnp.asarray(-0.5 * np.cos(2.0 * np.pi * np.arange(N) / N) + 0.5,
                          jnp.float32)
        k = jnp.arange(half, dtype=jnp.float32)
        freq_per_bin = self.fs / N
        expct = 2.0 * jnp.pi * step / N
        if mats is None:
            mats = self.design()
        C_, S_, A_, B_ = mats
        hp = jax.lax.Precision.HIGHEST

        sgn = jnp.asarray((-1.0) ** np.arange(N), jnp.float32)

        def frame_step(carry, x_hop):
            fifo, accum, last_ph, sum_ph, out_fifo = carry
            # emit the PREVIOUS frame's synthesis while collecting this hop
            # (the gOutFIFO one-hop latency, saf_utility_pitch.c:245)
            out_hop = out_fifo
            buf = jnp.concatenate([fifo, x_hop], axis=-1)  # (nCH, N)
            xw = buf * win
            spec_re = jnp.matmul(xw, C_, precision=hp)
            spec_im = jnp.matmul(xw, S_, precision=hp)
            magn = 2.0 * jnp.sqrt(spec_re ** 2 + spec_im ** 2)
            phase = jnp.arctan2(spec_im, spec_re)
            # phase-difference → true frequency (smb analysis)
            tmp = phase - last_ph - k * expct
            tmp = tmp - 2.0 * jnp.pi * jnp.round(tmp / (2.0 * jnp.pi))
            true_freq = k * freq_per_bin + (osamp * tmp / (2 * jnp.pi)) * freq_per_bin
            # reassign bins: index = floor(k * shift)
            idx = jnp.floor(k * shift_factor).astype(jnp.int32)
            valid = idx <= (N // 2)
            idx_c = jnp.clip(idx, 0, half - 1)
            syn_mag = jnp.zeros_like(magn).at[:, idx_c].add(
                jnp.where(valid, magn, 0.0))
            syn_freq = jnp.zeros_like(true_freq * magn)
            syn_freq = syn_freq.at[:, idx_c].set(
                jnp.where(valid, true_freq * shift_factor, 0.0))
            # synthesis phases
            tmp2 = ((syn_freq - k * freq_per_bin) / freq_per_bin
                    ) * 2.0 * jnp.pi / osamp + k * expct
            sum_ph = sum_ph + tmp2
            # The C synthesis (saf_utility_pitch.c:352-357) zeroes the
            # negative-frequency bins WITHOUT conjugate symmetrisation and
            # takes the real part of the unscaled complex inverse:
            #   U(n) = Re Σ_{k=0}^{N/2} S_k e^{+i2πkn/N}
            #        = (N·irfft(S) + Re S_0 + Re S_{N/2}·(−1)^n) / 2
            # with accumulation 2·win·U/(N·osamp) (kissFFT backward is 1/N).
            re = syn_mag * jnp.cos(sum_ph)
            im = syn_mag * jnp.sin(sum_ph)
            V = (jnp.matmul(re, A_, precision=hp)
                 + jnp.matmul(im, B_, precision=hp)) * N
            U = 0.5 * (V + re[:, :1] + re[:, -1:] * sgn)
            accum = accum + 2.0 * win * U / (N * osamp)
            out_fifo = accum[:, :step]
            accum = jnp.concatenate(
                [accum[:, step:], jnp.zeros((x.shape[0], step), accum.dtype)], -1)
            return (buf[:, step:], accum, phase, sum_ph, out_fifo), out_hop

        hops = jnp.moveaxis(x.reshape(x.shape[0], n_frames, step), 1, 0)
        carry = (state.in_fifo, state.out_accum, state.last_phase,
                 state.sum_phase, state.out_fifo)
        carry, outs = jax.lax.scan(frame_step, carry, hops)
        y = jnp.moveaxis(outs, 0, 1).reshape(x.shape[0], -1)
        return y, SmbPitchShiftState(*carry)
