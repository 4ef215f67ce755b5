"""FFT conventions matching the reference WORLD library.

The reference wraps Ooura's FFT in an FFTW-like plan API (reference:
src/fft.cpp:26-72).  The conventions that matter downstream:

* ``r2c`` forward  == standard unnormalized forward DFT of a real signal
  (``numpy.fft.rfft``).  (src/fft.cpp:49-72 negates the imaginary part of
  the raw Ooura output, which lands on the FFTW/numpy sign convention.)
* ``c2r`` backward == *unnormalized* inverse: ``irfft(spec) * n``.  The
  imaginary parts of DC and Nyquist bins are ignored (src/fft.cpp:26-35).
* ``c2c`` backward == unnormalized inverse DFT (src/fft.cpp:36-46).

Everything here is a thin jnp wrapper so kernels read like the math.
"""

import jax.numpy as jnp


def rfft(x, n=None):
    """Forward real FFT, FFTW convention (matches reference r2c plans)."""
    return jnp.fft.rfft(x, n=n, axis=-1)


def irfft_unnormalized(spec, n):
    """Backward c2r, reference convention: unnormalized (irfft * n).

    DC / Nyquist imaginary parts are dropped exactly as the reference
    packing does (src/fft.cpp:27-33).
    """
    half = spec.shape[-1] - 1
    assert half * 2 == n, (spec.shape, n)
    # Zero the imag part of DC and Nyquist the way the Ooura packing does.
    k = jnp.arange(half + 1)
    interior = (k > 0) & (k < half)
    spec = jnp.where(interior, spec, spec.real.astype(spec.dtype))
    return jnp.fft.irfft(spec, n=n, axis=-1) * n


def ifft_unnormalized(spec):
    """Backward c2c, reference convention: unnormalized inverse DFT."""
    n = spec.shape[-1]
    return jnp.fft.ifft(spec, axis=-1) * n
