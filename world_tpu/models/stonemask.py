"""StoneMask F0 refinement, TPU-native.

Refines a Dio track by instantaneous frequency (reference
src/stonemask.cpp).  The per-frame FFT size depends on f0
(2^(2+floor(log2(2*half_window+1)))), so frames are *bucketed*: every
candidate FFT size in the admissible range runs as one vmapped
fixed-shape batch over all frames, and each frame selects the result
from its own size.  Power-of-two sizes mean the redundant work is a
geometric series (~2x the largest bucket), fully parallel.
"""

import functools
import math

import jax
import jax.numpy as jnp

from .. import config
from ..ops import common
from ..ops.matlab import matlab_round


def _possible_fft_sizes(fs):
    """All fft sizes reachable for f0 in (kFloorF0StoneMask, fs/12]."""
    sizes = set()
    # half_window = int(1.5*fs/f0 + 1); f0 in (40, fs/12]
    hw_min = int(1.5 * fs / (fs / 12.0) + 1.0)
    hw_max = int(1.5 * fs / config.K_FLOOR_F0_STONEMASK + 1.0)
    for hw in (hw_min, hw_max):
        sizes.add(2 ** (2 + int(math.log(hw * 2.0 + 1.0) / config.K_LOG2)))
    lo, hi = min(sizes), max(sizes)
    s = lo
    out = []
    while s <= hi:
        out.append(s)
        s *= 2
    return out


def _fix_f0(power_spectrum, numerator_i, fft_size, fs, f0, n_harmonics):
    """Amplitude-weighted instantaneous-frequency average
    (src/stonemask.cpp:96-118).  n_harmonics static (2 or 6)."""
    half = power_spectrum.shape[-1] - 1
    harm = jnp.arange(1, n_harmonics + 1, dtype=power_spectrum.dtype)
    index = jnp.minimum(matlab_round(f0 * fft_size / fs * harm), half)
    ps = power_spectrum[index]
    inst = jnp.where(
        ps == 0.0, 0.0,
        index.astype(ps.dtype) * fs / fft_size
        + numerator_i[index] / ps * fs / (2.0 * config.K_PI))
    amp = jnp.sqrt(ps)
    return jnp.sum(amp * inst) / (jnp.sum(amp * harm)
                                  + config.K_MY_SAFE_GUARD_MINIMUM)


def _spectra_at_size(x, fs, fft_size, max_len, position, f0):
    """Windowed main/diff spectra -> (power, numerator_i)
    (src/stonemask.cpp:24-91).  Gathers are sized max_len and masked."""
    dtype = x.dtype
    half_window = (1.5 * fs / f0 + 1.0).astype(jnp.int32)
    win_len = 2 * half_window + 1
    wlt = win_len.astype(dtype) / fs  # window_length_in_time

    i = jnp.arange(max_len)
    in_win = i < win_len
    base_time = (i - half_window).astype(dtype) / fs
    index_raw = matlab_round((position + base_time) * fs)
    tmp = (index_raw.astype(dtype) - 1.0) / fs - position
    main_window = (0.42 + 0.5 * jnp.cos(2.0 * config.K_PI * tmp / wlt)
                   + 0.08 * jnp.cos(4.0 * config.K_PI * tmp / wlt))
    main_window = jnp.where(in_win, main_window, 0.0)
    # diff window: centered difference, halves at the edges
    # (src/stonemask.cpp:49-55)
    nxt = jnp.roll(main_window, -1)
    prv = jnp.roll(main_window, 1)
    diff_window = -(nxt - prv) / 2.0
    diff_window = jnp.where(i == 0, -nxt / 2.0, diff_window)
    diff_window = jnp.where(i == win_len - 1, prv / 2.0, diff_window)
    diff_window = jnp.where(in_win, diff_window, 0.0)

    if dtype == jnp.float64:
        # Exact golden path: the reference rounds (position+t)*fs per
        # element, so indices can jitter off the contiguous ramp at .5
        # boundaries; keep the elementwise gather.
        safe = jnp.clip(index_raw - 1, 0, x.shape[0] - 1)
        seg = jnp.where(in_win, x[safe], 0.0)
    else:
        # Fast path: contiguous edge-clamped slice from index_raw[0];
        # a general gather costs ~30x a slice on TPU and the +-1 sample
        # jitter is far below float32 noise.
        seg = common.window_slice(x, index_raw[0] - 1, max_len)
        seg = jnp.where(in_win, seg, 0.0)
    main_spec = jnp.fft.rfft(seg * main_window, n=fft_size)
    diff_spec = jnp.fft.rfft(seg * diff_window, n=fft_size)
    power = main_spec.real**2 + main_spec.imag**2
    numerator = (main_spec.real * diff_spec.imag
                 - main_spec.imag * diff_spec.real)
    return power, numerator


def _refine_at_size(x, fs, fft_size, max_len, position, f0):
    power, numerator = _spectra_at_size(x, fs, fft_size, max_len, position,
                                        f0)
    t0 = _fix_f0(power, numerator, fft_size, fs, f0, 2)
    bad = (t0 <= 0.0) | (t0 > f0 * 2.0)
    t1 = _fix_f0(power, numerator, fft_size, fs, t0, 6)
    return jnp.where(bad, 0.0, t1)


def _refine_direct(x, fs_t, max_len, position, f0, seg=None):
    """GetRefinedF0 computing only the needed harmonic DFT bins
    (float32/TPU path): one fixed window, no per-fft-size buckets, and
    the two FixF0 passes read 2 then 6 bins as windowed cos/sin dots.
    The common DFT phase offset cancels in |M|^2 and Im(conj(M) D).
    ``seg``: pre-read (max_len,) window starting at idx0-1 (hoisted
    shared-table read; see ops/common.window_table_build)."""
    dtype = x.dtype
    hw = (1.5 * fs_t / f0 + 1.0).astype(jnp.int32)
    win_len = 2 * hw + 1
    wlt = win_len.astype(dtype) / fs_t
    i = jnp.arange(max_len)
    in_win = i < win_len
    idx0 = matlab_round((position - hw.astype(dtype) / fs_t) * fs_t)
    tmp = ((idx0 + i).astype(dtype) - 1.0) / fs_t - position
    main_window = (0.42 + 0.5 * jnp.cos(2.0 * config.K_PI * tmp / wlt)
                   + 0.08 * jnp.cos(4.0 * config.K_PI * tmp / wlt))
    main_window = jnp.where(in_win, main_window, 0.0)
    nxt = jnp.roll(main_window, -1)
    prv = jnp.roll(main_window, 1)
    diff_window = -(nxt - prv) / 2.0
    diff_window = jnp.where(i == 0, -nxt / 2.0, diff_window)
    diff_window = jnp.where(i == win_len - 1, prv / 2.0, diff_window)
    diff_window = jnp.where(in_win, diff_window, 0.0)
    if seg is None:
        seg = common.window_slice(x, idx0 - 1, max_len)
    seg = jnp.where(in_win, seg, 0.0)
    xm = seg * main_window
    xd = seg * diff_window

    fftf = jnp.exp2(2.0 + jnp.floor(
        jnp.log(win_len.astype(dtype)) / config.K_LOG2)).astype(dtype)
    half_bin = (fftf / 2).astype(jnp.int32)

    def fix(f, n_harmonics):
        harm = jnp.arange(1, n_harmonics + 1, dtype=dtype)
        index = jnp.minimum(matlab_round(f * fftf / fs_t * harm), half_bin)
        index = jnp.maximum(index, 0)
        omega = (2.0 * config.K_PI / fftf) * index.astype(dtype)
        phase = omega[:, None] * i.astype(dtype)[None, :]
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        m_re = c @ xm
        m_im = -(s @ xm)
        d_re = c @ xd
        d_im = -(s @ xd)
        ps = m_re**2 + m_im**2
        numer = m_re * d_im - m_im * d_re
        inst = jnp.where(ps == 0.0, 0.0,
                         index.astype(dtype) * fs_t / fftf
                         + numer / ps * fs_t / (2.0 * config.K_PI))
        amp = jnp.sqrt(ps)
        return jnp.sum(amp * inst) / (jnp.sum(amp * harm)
                                      + config.K_MY_SAFE_GUARD_MINIMUM)

    t0 = fix(f0, 2)
    bad = (t0 <= 0.0) | (t0 > f0 * 2.0)
    t1 = fix(t0, 6)
    return jnp.where(bad, 0.0, t1)


@functools.partial(jax.jit, static_argnames=("fs",))
def _stone_mask_impl(x, temporal_positions, f0, fs_t, *, fs):
    # fs_t is fs as a *traced* scalar: XLA strength-reduces division by a
    # constant to multiply-by-reciprocal (1 ulp off IEEE division), which
    # flips window indices that land exactly on .5 sample boundaries.
    dtype = x.dtype
    sizes = _possible_fft_sizes(fs)
    usable = (f0 > config.K_FLOOR_F0_STONEMASK) & (f0 <= fs_t / 12.0)
    f0_safe = jnp.where(usable, f0, 100.0)
    hw = (1.5 * fs_t / f0_safe + 1.0).astype(jnp.int32)
    frame_fft = 2 ** (2 + jnp.floor(
        jnp.log(hw * 2.0 + 1.0) / config.K_LOG2).astype(jnp.int32))

    if dtype == jnp.float64:
        # Golden path: bucketed full FFTs, bit-matching the reference.
        refined = jnp.zeros_like(f0)
        for fft_size in sizes:
            max_len = fft_size  # win_len <= fft_size/2 by construction
            vals = jax.vmap(lambda p, f: _refine_at_size(
                x, fs_t, fft_size, max_len, p, f))(
                temporal_positions, f0_safe.astype(dtype))
            refined = jnp.where(frame_fft == fft_size, vals, refined)
    else:
        max_len = max(sizes) // 2  # >= 2*hw_max+1 by bucket construction
        # Hoisted window reads: one table row-gather for all frames
        # (the per-frame vmap(dynamic_slice) lowers to a sequential
        # while-of-gathers on TPU).  idx0 replicates _refine_direct's
        # start arithmetic bit-for-bit (hw from the same f0_safe).
        idx0 = matlab_round(
            (temporal_positions - hw.astype(dtype) / fs_t) * fs_t)
        segs = common.window_table_read(
            common.window_table_build(x, max_len), idx0 - 1)
        refined = jax.vmap(lambda p, f, s: _refine_direct(
            x, fs_t, max_len, p, f, seg=s))(temporal_positions,
                                            f0_safe.astype(dtype), segs)

    # Reject out-of-range inputs and over-large corrections
    # (src/stonemask.cpp:185-208).
    refined = jnp.where(usable, refined, 0.0)
    over = jnp.abs(refined - f0) > f0 * 0.2
    return jnp.where(usable & over, f0, refined)


def stone_mask(x, fs, temporal_positions, f0):
    """Refine an F0 contour by instantaneous frequency
    (reference src/stonemask.cpp:212-218)."""
    x = jnp.asarray(x)
    return _stone_mask_impl(x, jnp.asarray(temporal_positions, x.dtype),
                            jnp.asarray(f0, x.dtype),
                            jnp.asarray(float(fs), x.dtype), fs=fs)
