"""FFT helpers and FFT-domain filtering.

TPU-native equivalents of the reference's unified DFT wrapper
(``framework/modules/saf_utilities/saf_utility_fft.h``): the backend axis
(FFTW/IPP/vDSP/MKL/kissFFT) collapses to XLA's native FFT; the conventions
are kept identical — unnormalised forward transform, 1/N-scaled inverse
(``saf_utility_fft.c:541``).

All functions are pure and jit-friendly; batch dims lead.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_uniform_freq_vector(fft_size: int, fs: float) -> np.ndarray:
    """Centre frequencies of rFFT bins (saf_utility_fft.h:67)."""
    return np.arange(fft_size // 2 + 1, dtype=np.float64) * fs / float(fft_size)


def rfft(x, n: int | None = None):
    """Real→complex forward FFT, unnormalised (saf_rfft_forward)."""
    return jnp.fft.rfft(x, n=n, axis=-1)


def irfft(X, n: int):
    """Complex→real inverse FFT with 1/N scaling (saf_rfft_backward)."""
    return jnp.fft.irfft(X, n=n, axis=-1)


def fft(x, n: int | None = None):
    """Complex forward FFT (saf_fft_forward)."""
    return jnp.fft.fft(x, n=n, axis=-1)


def ifft(X, n: int | None = None):
    """Complex inverse FFT, 1/N scaled (saf_fft_backward)."""
    return jnp.fft.ifft(X, n=n, axis=-1)


def fftconv(x, h, out_len: int | None = None):
    """Linear convolution via FFT (saf_utility_fft.h:86 ``fftconv``).

    x: (..., x_len), h: (..., h_len) → (..., x_len + h_len - 1) or out_len.
    """
    x_len = x.shape[-1]
    h_len = h.shape[-1]
    full = x_len + h_len - 1
    nfft = int(2 ** np.ceil(np.log2(full)))
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=nfft) * jnp.fft.rfft(h, n=nfft), n=nfft)
    y = y[..., :full]
    if out_len is not None:
        y = y[..., :out_len]
    return y


def fftfilt(x, h):
    """'filter'-style convolution: same length as x (saf_utility_fft.h:107)."""
    return fftconv(x, h)[..., : x.shape[-1]]


def hilbert(x):
    """Analytic signal via FFT (saf_utility_fft.h:128 ``hilbert``)."""
    n = x.shape[-1]
    X = jnp.fft.fft(x, axis=-1)
    w = np.zeros(n)
    if n % 2 == 0:
        w[0] = w[n // 2] = 1.0
        w[1 : n // 2] = 2.0
    else:
        w[0] = 1.0
        w[1 : (n + 1) // 2] = 2.0
    return jnp.fft.ifft(X * jnp.asarray(w, dtype=X.dtype), axis=-1)
