"""Whole-signal frequency-domain filtering used by the F0 estimators.

Dio low-passes each band with a Nuttall window; Harvest band-passes with
a cosine-modulated Nuttall (reference src/dio.cpp:296-343,
src/harvest.cpp:99-148).  Both share a convolution quirk we reproduce:
the C++ writes each spectral product into bin fft_size-i-1 *while
iterating*, so at i = n/2-1 it clobbers the Nyquist bin before using it
and at i = n/2 it clobbers bin n/2-1 with the (already corrupt) Nyquist
product.  With low-pass bands these bins are ~0, but we match exactly.
"""

import jax
import jax.numpy as jnp

from .fftpack import irfft_unnormalized


def _shifted_irfft(prod, fft_size, index_bias, y_length, dtype):
    """irfft then circular left-shift by ``index_bias`` (the filter's
    group delay), truncated to y_length.

    float64 golden path: materialize + jnp.roll (two contiguous slices;
    bit-matches the reference's index arithmetic).  float32 TPU path:
    fold the shift into the spectrum as the phase ramp e^{+2i pi k b/n}
    — it fuses into the convolution product, deleting a full
    read+write pass of the time signal per channel (~6 ms/batch across
    the filterbank).  The angle is reduced by INTEGER mod before the
    trig so float32 stays exact for any k*b; Hermitian symmetry is
    preserved because the Nyquist multiplier e^{i pi b} is real.
    """
    if dtype == jnp.float64:
        sig = irfft_unnormalized(prod, fft_size)
        return jnp.roll(sig, -index_bias)[: y_length]
    k = jnp.arange(fft_size // 2 + 1)
    m = (k * index_bias) % fft_size
    theta = (2.0 * jnp.pi / fft_size) * m.astype(dtype)
    phase = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    return irfft_unnormalized(prod * phase, fft_size)[: y_length]


def _convolve_with_quirk(y_spectrum, filter_spectrum, fft_size):
    half = fft_size // 2
    prod = y_spectrum * filter_spectrum
    # Reference loop ordering (src/dio.cpp:317-328): the value that ends up
    # at bins half-1 and half is y[half] * (y[half-1] * h[half-1]).
    # Elementwise select instead of .at[].set — scatters are slow on TPU.
    corrupt = y_spectrum[..., half] * prod[..., half - 1]
    k = jnp.arange(half + 1)
    return jnp.where((k == half - 1) | (k == half), corrupt, prod)


def filtered_signal_dio(half_average_length, fft_size, y_spectrum, y_length,
                        dtype):
    """Low-pass by a Nuttall window of length 4*half_average_length, then
    compensate the group delay of 2*half_average_length samples
    (src/dio.cpp:296-343).  half_average_length may be traced."""
    from .common import nuttall_window_masked

    lpf = nuttall_window_masked(half_average_length * 4, fft_size, dtype)
    lpf_spectrum = jnp.fft.rfft(lpf)
    prod = _convolve_with_quirk(y_spectrum, lpf_spectrum, fft_size)
    return _shifted_irfft(prod, fft_size, half_average_length * 2,
                          y_length, dtype)


def filtered_signal_harvest(boundary_f0, fft_size, fs, y_spectrum, y_length,
                            dtype, filter_length_half):
    """Band-pass: Nuttall window times a cosine carrier at boundary_f0
    (src/harvest.cpp:99-148).  filter_length_half = round(fs/boundary*2)
    may be traced."""
    from .common import nuttall_window_masked

    n = filter_length_half * 2 + 1
    w = nuttall_window_masked(n, fft_size, dtype)
    i = jnp.arange(fft_size) - filter_length_half
    bpf = w * jnp.cos(2.0 * jnp.pi * boundary_f0 * i / fs)
    bpf = jnp.where(jnp.arange(fft_size) < n, bpf, 0.0)
    bpf_spectrum = jnp.fft.rfft(bpf)
    prod = _convolve_with_quirk(y_spectrum, bpf_spectrum, fft_size)
    return _shifted_irfft(prod, fft_size, filter_length_half + 1,
                          y_length, dtype)
