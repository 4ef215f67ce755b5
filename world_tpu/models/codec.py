"""Codec: compression of spectral envelope and band aperiodicity.

Reference src/codec.cpp.  The envelope codec resamples the log envelope
onto a mel axis and takes a DCT-II realized as an even-odd permuted
half-size real FFT with twiddle weights; aperiodicity is sampled at the
3 kHz coarse grid in dB.  All frames batch as one vmapped kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops.matlab import interp1, interp1q


def _freq_to_mel(f):
    return config.K_M0 * jnp.log(f / config.K_F0 + 1.0)


def _mel_to_freq(m):
    return config.K_F0 * (jnp.exp(m / config.K_M0) - 1.0)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size"))
def _code_aperiodicity_impl(aperiodicity, fs_t, *, fs, fft_size):
    """CodeAperiodicity (src/codec.cpp:217-236)."""
    n_aper = config.get_number_of_aperiodicities(fs)
    dtype = aperiodicity.dtype
    coarse_axis = (jnp.arange(n_aper, dtype=dtype) + 1.0) \
        * config.K_FREQUENCY_INTERVAL
    log_ap = 20.0 * jnp.log10(aperiodicity)
    return jax.vmap(lambda row: interp1q(0.0, fs_t / fft_size, row,
                                         coarse_axis))(log_ap)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size"))
def _decode_aperiodicity_impl(coded, fs_t, *, fs, fft_size):
    """DecodeAperiodicity (src/codec.cpp:238-266)."""
    n_aper = config.get_number_of_aperiodicities(fs)
    dtype = coded.dtype
    n_frames = coded.shape[0]
    half = fft_size // 2
    freq_axis = jnp.arange(half + 1, dtype=dtype) * fs_t / fft_size
    coarse_axis = jnp.concatenate(
        [jnp.arange(n_aper + 1, dtype=dtype) * config.K_FREQUENCY_INTERVAL,
         jnp.asarray([fs / 2.0], dtype)])
    edges = jnp.concatenate(
        [jnp.full((n_frames, 1), -60.0, dtype), coded,
         jnp.full((n_frames, 1), -config.K_MY_SAFE_GUARD_MINIMUM, dtype)], 1)
    ap = jax.vmap(lambda e: interp1(coarse_axis, e, freq_axis))(edges)
    ap = 10.0 ** (ap / 20.0)
    unvoiced = jnp.mean(coded, axis=1) > -0.5  # CheckVUV (src/codec.cpp:31-41)
    default = 1.0 - config.K_MY_SAFE_GUARD_MINIMUM
    return jnp.where(unvoiced[:, None], default, ap)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size",
                                              "number_of_dimensions"))
def _code_spectral_envelope_impl(spectrogram, fs_t, *, fs, fft_size,
                                 number_of_dimensions):
    """CodeSpectralEnvelope (src/codec.cpp:268-297)."""
    dtype = spectrogram.dtype
    max_dim = fft_size // 2
    floor_mel = config.K_M0 * np.log(config.K_FLOOR_FREQUENCY
                                     / config.K_F0 + 1.0)
    ceil_mel = config.K_M0 * np.log(min(fs / 2.0, config.K_CEIL_FREQUENCY)
                                    / config.K_F0 + 1.0)
    i = jnp.arange(max_dim, dtype=dtype)
    mel_axis = (ceil_mel - floor_mel) * i / max_dim + floor_mel
    freq_axis = _freq_to_mel(jnp.arange(max_dim + 1, dtype=dtype)
                             * fs_t / fft_size)
    w = 2.0 * jnp.exp(1j * i * config.K_PI / fft_size) / np.sqrt(fft_size)
    w = w.at[0].set(w[0] * (1.0 + 0j) / np.sqrt(2.0))

    # even-odd permutation indices for the half-size real FFT DCT trick
    perm = np.empty(max_dim, np.int32)
    perm[: max_dim // 2] = np.arange(max_dim // 2) * 2
    perm[max_dim // 2:] = max_dim - np.arange(max_dim // 2) * 2 - 1

    def one_frame(log_sp):
        mel = interp1(freq_axis, log_sp, mel_axis)
        spec = jnp.fft.rfft(mel[perm])  # max_dim//2 + 1 bins
        nb = spec.shape[-1]
        cep = spec.real * w.real[:nb] - spec.imag * w.imag[:nb]
        cep = jnp.concatenate([cep, jnp.zeros(max_dim - nb, dtype)])
        return (cep / np.sqrt(max_dim))[:number_of_dimensions]

    return jax.vmap(one_frame)(jnp.log(spectrogram))


@functools.partial(jax.jit, static_argnames=("fs", "fft_size",
                                              "number_of_dimensions"))
def _decode_spectral_envelope_impl(coded, fs_t, *, fs, fft_size,
                                   number_of_dimensions):
    """DecodeSpectralEnvelope (src/codec.cpp:299-324)."""
    dtype = coded.dtype
    max_dim = fft_size // 2
    floor_mel = config.K_M0 * np.log(config.K_FLOOR_FREQUENCY
                                     / config.K_F0 + 1.0)
    ceil_mel = config.K_M0 * np.log(min(fs / 2.0, config.K_CEIL_FREQUENCY)
                                    / config.K_F0 + 1.0)
    i = jnp.arange(max_dim, dtype=dtype)
    mel_axis = jnp.concatenate([
        jnp.zeros(1, dtype),
        _mel_to_freq((ceil_mel - floor_mel) * i / max_dim + floor_mel),
        jnp.asarray([fs / 2.0], dtype)])
    freq_axis = jnp.arange(max_dim + 1, dtype=dtype) * fs_t / fft_size

    k = jnp.arange(number_of_dimensions, dtype=dtype)
    w = jnp.exp(1j * k * config.K_PI / fft_size) * np.sqrt(fft_size)
    w = w.at[0].set(w[0] / np.sqrt(2.0))

    def one_frame(cep):
        inp = jnp.zeros(max_dim, jnp.complex128 if dtype == jnp.float64
                        else jnp.complex64)
        inp = inp.at[:number_of_dimensions].set(
            cep * jnp.conj(w) * np.sqrt(max_dim))
        # Reference InverseComplexFFT == conj(forward DFT)
        # (src/fft.cpp:36-46).
        out = jnp.conj(jnp.fft.fft(inp)).real
        mel = jnp.zeros(max_dim + 2, dtype)
        half_idx = np.arange(max_dim // 2)
        mel = mel.at[1 + half_idx * 2].set(out[half_idx])
        mel = mel.at[2 + half_idx * 2].set(out[max_dim - half_idx - 1])
        mel = mel.at[0].set(mel[1])
        mel = mel.at[max_dim + 1].set(mel[max_dim])
        sp = interp1(mel_axis, mel, freq_axis)
        return jnp.exp(sp / max_dim)

    return jax.vmap(one_frame)(coded)


def code_aperiodicity(aperiodicity, fs, fft_size=None):
    aperiodicity = jnp.asarray(aperiodicity)
    if fft_size is None:
        fft_size = 2 * (aperiodicity.shape[1] - 1)
    return _code_aperiodicity_impl(
        aperiodicity, jnp.asarray(float(fs), aperiodicity.dtype), fs=fs,
        fft_size=fft_size)


def decode_aperiodicity(coded, fs, fft_size):
    coded = jnp.asarray(coded)
    return _decode_aperiodicity_impl(
        coded, jnp.asarray(float(fs), coded.dtype), fs=fs, fft_size=fft_size)


def code_spectral_envelope(spectrogram, fs, number_of_dimensions,
                           fft_size=None):
    spectrogram = jnp.asarray(spectrogram)
    if fft_size is None:
        fft_size = 2 * (spectrogram.shape[1] - 1)
    return _code_spectral_envelope_impl(
        spectrogram, jnp.asarray(float(fs), spectrogram.dtype), fs=fs,
        fft_size=fft_size, number_of_dimensions=number_of_dimensions)


def decode_spectral_envelope(coded, fs, fft_size, number_of_dimensions=None):
    coded = jnp.asarray(coded)
    if number_of_dimensions is None:
        number_of_dimensions = coded.shape[1]
    return _decode_spectral_envelope_impl(
        coded, jnp.asarray(float(fs), coded.dtype), fs=fs, fft_size=fft_size,
        number_of_dimensions=number_of_dimensions)


get_number_of_aperiodicities = config.get_number_of_aperiodicities
