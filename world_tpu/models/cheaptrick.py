"""CheapTrick spectral-envelope estimation, TPU-native.

The reference (src/cheaptrick.cpp) loops over frames, each doing an
F0-adaptive windowed FFT, DC correction, linear smoothing and cepstral
liftering.  Here every frame is a lane of a vmapped fixed-shape kernel:
the F0-adaptive window (half length round(1.5*fs/f0)) always fits inside
fft_size because f0 >= 3*fs/(fft_size-3) is enforced the same way the
reference does (unvoiced/low frames use kDefaultF0=500).

RNG: the reference dithers with its serial xorshift stream
(src/cheaptrick.cpp:127-128,150).  mode="exact" reproduces that stream
per-frame via GF(2) jumps (ops/rng.py); mode="fast" uses jax.random;
mode="none" disables dither (envelope differs only at the ~1e-12 level
on non-silent frames).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from ..ops import common
from ..ops import rng as rng_ops
from ..ops.matlab import matlab_round


def _window_lengths(f0, fs):
    half = matlab_round(1.5 * fs / f0)
    return half, 2 * half + 1


def _windowed_waveform(x, fs, f0, position, fft_size, dither, seg=None):
    """F0-adaptive Hann-ish window of the waveform around ``position``
    (reference src/cheaptrick.cpp:87-142).  Returns (fft_size,) padded.
    ``seg``: pre-read window starting at round(position*fs+0.001)-half
    (hoisted shared-table read; see ops/common.window_table_build)."""
    half, win_len = _window_lengths(f0, fs)
    i = jnp.arange(fft_size)
    base = i - half
    in_window = i < win_len
    origin = matlab_round(position * fs + 0.001)
    if seg is None:
        seg = common.window_slice(x, origin - half, fft_size)
    pos = base.astype(x.dtype) / 1.5 / fs
    window = 0.5 * jnp.cos(config.K_PI * pos * f0) + 0.5
    window = jnp.where(in_window, window, 0.0)
    window = window / jnp.sqrt(jnp.sum(window**2))
    waveform = seg * window + dither * config.K_MY_SAFE_GUARD_MINIMUM
    waveform = jnp.where(in_window, waveform, 0.0)
    # Window-weighted mean removal.
    coeff = jnp.sum(waveform) / jnp.sum(window)
    return jnp.where(in_window, waveform - window * coeff, 0.0)


def _smoothing_with_recovery(smoothed_power, f0, fs, fft_size, q1):
    """Cepstral liftering: smoothing lifter sinc(pi f0 q) x compensation
    lifter (1-2q1)+2q1 cos(2 pi q f0) (reference src/cheaptrick.cpp:22-57)."""
    half = fft_size // 2
    dtype = smoothed_power.dtype
    quefrency = jnp.arange(1, half + 1, dtype=dtype) / fs
    arg = config.K_PI * f0 * quefrency
    smoothing = jnp.concatenate(
        [jnp.ones((1,), dtype), jnp.sin(arg) / arg])
    compensation = jnp.concatenate(
        [jnp.asarray([1.0], dtype),
         (1.0 - 2.0 * q1) + 2.0 * q1 * jnp.cos(2.0 * config.K_PI * quefrency * f0)])

    log_power = jnp.log(smoothed_power)
    mirrored = jnp.concatenate([log_power, log_power[half - 1:0:-1]])
    cep = jnp.fft.rfft(mirrored).real
    lifted = cep * smoothing * compensation / fft_size
    # c2r backward is unnormalized (irfft * n); see ops/fftpack.
    envelope = jnp.fft.irfft(lifted.astype(jnp.complex128 if dtype == jnp.float64
                                           else jnp.complex64),
                             n=fft_size) * fft_size
    return jnp.exp(envelope[: half + 1])


def _power_kernel(x, fs, fft_size, f0, position, win_dither, seg=None):
    waveform = _windowed_waveform(x, fs, f0, position, fft_size, win_dither,
                                  seg=seg)
    spectrum = jnp.fft.rfft(waveform)
    return spectrum.real**2 + spectrum.imag**2


def _envelope_kernel(fs, fft_size, q1, b_max, power, f0, f0_b, spec_dither):
    width = f0_b * 2.0 / 3.0
    power = common.linear_smoothing(power, width, fs, fft_size, b_max)
    power = power + jnp.abs(spec_dither) * config.K_EPS
    return _smoothing_with_recovery(power, f0, fs, fft_size, q1)


@functools.partial(jax.jit,
                   static_argnames=("fs", "fft_size", "q1", "rng_mode",
                                    "f0_cap"))
def _cheap_trick_impl(x, temporal_positions, f0, *, fs, fft_size, q1,
                      rng_mode, f0_cap=config.K_CEIL_F0 * 1.1):
    dtype = x.dtype
    half = fft_size // 2
    f0_floor = config.get_f0_floor_for_cheaptrick(fs, fft_size)
    # Static bound on the smoothing mirror.  Widths are 2*f0/3; default F0
    # tracks are bounded by kCeilF0*1.1 (and kDefaultF0=500 for unvoiced),
    # so the default 1200 Hz cap is generous.  Callers with a larger
    # f0_ceil pass a larger cap (see cheap_trick); f0 is clamped to the
    # cap inside the kernel so an out-of-range value degrades gracefully
    # instead of silently zero-filling replica bins.
    b_max = int((2.0 * f0_cap / 3.0) * fft_size / fs) + 2
    # DC-correction replica prefix: exact for every f0 <= f0_cap.
    b_cap_dc = int(f0_cap * fft_size / fs) + 4

    f0_eff = jnp.where(f0 <= f0_floor, config.K_DEFAULT_F0, f0).astype(dtype)
    win_lens = 2 * matlab_round(1.5 * fs / f0_eff) + 1

    n_frames = f0.shape[0]
    if rng_mode == "exact":
        counts = win_lens + (half + 1)
        offsets = jnp.cumsum(counts) - counts
        draws = rng_ops.randn_blocks_at(offsets, fft_size + half + 1)
        draws = draws.astype(dtype)
        # Per frame the stream is: win_len window draws, then half+1
        # spectral draws (reference consumption order).
        idx = jnp.arange(fft_size + half + 1)
        win_dither = jnp.where(idx[None, :fft_size] < win_lens[:, None],
                               draws[:, :fft_size], 0.0)
        gather = win_lens[:, None] + jnp.arange(half + 1)[None, :]
        spec_dither = jnp.take_along_axis(draws, gather, axis=1)
    elif rng_mode == "fast":
        key = jax.random.PRNGKey(0)
        win_dither = jax.random.normal(key, (n_frames, fft_size), dtype)
        spec_dither = jax.random.normal(
            jax.random.fold_in(key, 1), (n_frames, half + 1), dtype)
    else:
        win_dither = jnp.zeros((n_frames, fft_size), dtype)
        spec_dither = jnp.zeros((n_frames, half + 1), dtype)

    # Hoisted window reads: one table row-gather for all frames (the
    # per-frame vmap(dynamic_slice) lowers to a sequential
    # while-of-gathers on TPU); starts replicate _windowed_waveform's
    # origin/half arithmetic bit-for-bit.
    w_starts = (matlab_round(temporal_positions * fs + 0.001)
                - matlab_round(1.5 * fs / f0_eff))
    segs = common.window_table_read(
        common.window_table_build(x, fft_size), w_starts)
    power = jax.vmap(
        lambda f, p, d, s: _power_kernel(x, fs, fft_size, f, p, d, seg=s))(
            f0_eff, temporal_positions, win_dither, segs)
    # f0 is clamped at the static cap for the DC-correction/smoothing
    # bins (the cap is sized from the caller's f0_ceil, so it only binds
    # on f0 values above the declared ceiling — a documented deviation
    # instead of silent zero-fill).
    f0_b = jnp.minimum(f0_eff, jnp.asarray(f0_cap, dtype))
    if dtype == jnp.float64:
        power = jax.vmap(lambda s, f: common.dc_correction(
            s, f, fs, fft_size, b_cap=b_cap_dc))(power, f0_b)
    else:
        # One batched fast-path DC correction instead of a per-frame
        # arbitrary gather (see common.dc_correction_batched).
        power = common.dc_correction_batched(power, f0_b, fs, fft_size,
                                             b_cap=b_cap_dc)
    return jax.vmap(
        lambda pw, f, fb, d: _envelope_kernel(fs, fft_size, q1, b_max,
                                              pw, f, fb, d))(
            power, f0_eff, f0_b, spec_dither)


def f0_cap_for(f0_ceil):
    """Static smoothing-bin cap for a declared F0 ceiling.

    Estimators reject refined values above their f0_ceil, and harvest's
    widened candidate band tops out at f0_ceil * 1.1
    (src/harvest.cpp:1149-1150), so kCeilF0 * 1.1 = 880 bounds every
    default F0 track; the cap sizes the static smoothing/DC-correction
    buffers (b_max scales the hot windowed-sum loops)."""
    return max(config.K_CEIL_F0 * 1.1, float(f0_ceil) * 1.1) \
        if f0_ceil else config.K_CEIL_F0 * 1.1


def cheap_trick(x, fs, temporal_positions, f0, option=None, rng_mode="exact",
                f0_ceil=None):
    """Spectral envelope estimation (reference src/cheaptrick.cpp:200-229).

    ``f0_ceil``: the estimator ceiling the f0 track was produced with, if
    above the default kCeilF0 (800); sizes the static smoothing buffers.
    Returns spectrogram of shape (f0_length, fft_size//2 + 1).
    """
    option = (option or config.CheapTrickOption()).resolve(fs)
    x = jnp.asarray(x)
    return _cheap_trick_impl(
        x, jnp.asarray(temporal_positions, x.dtype), jnp.asarray(f0, x.dtype),
        fs=fs, fft_size=option.fft_size, q1=option.q1, rng_mode=rng_mode,
        f0_cap=f0_cap_for(f0_ceil))
