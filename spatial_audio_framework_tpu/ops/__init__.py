"""Compute-path ops: FFT, filterbanks, convolvers, linear algebra."""
from spatial_audio_framework_tpu.ops import fft, afstft  # noqa: F401
