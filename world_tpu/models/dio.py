"""Dio F0 estimator, TPU-native.

Pipeline (reference src/dio.cpp:578-635): decimate + one whole-signal
FFT; per band (vmapped) a Nuttall low-pass in the frequency domain, four
zero-crossing event streams, interp1 onto the frame grid, candidate =
mean of 4 streams scored by their deviation; best-per-frame selection;
then the 4-step contour fix.  Steps 3/4 are data-dependent walks along
frames; they become single forward/backward lax.scans (the section-by-
section C++ iteration is equivalent to one scan with an "active" flag —
see _fix_step3/_fix_step4).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import zerocross
from ..ops.common import get_suitable_fft_size
from ..ops.filterbank import filtered_signal_dio
from ..ops.matlab import decimate, interp1, matlab_round


def _design_low_cut_filter(n, fft_size):
    """50 Hz low-cut as 1 - normalized Hann (reference src/dio.cpp:40-53),
    stored rotated so the filter is zero-phase.  Static shapes (numpy)."""
    w = 0.5 - 0.5 * np.cos(np.arange(1, n + 1) * 2.0 * np.pi / (n + 1))
    lcf = np.zeros(fft_size)
    lcf[:n] = -w / w.sum()
    shift = (n - 1) // 2
    lcf[fft_size - shift:] = lcf[:shift]
    lcf[: n - shift] = lcf[shift:n]
    lcf[n - shift: n] = 0.0
    lcf[0] += 1.0
    return lcf


def _spectrum_for_estimation(x, x_length, y_length, actual_fs, fft_size,
                             decimation_ratio):
    """Decimated, DC-removed, low-cut-filtered signal spectrum
    (src/dio.cpp:60-106)."""
    if decimation_ratio != 1:
        base = decimate(x, decimation_ratio)
    else:
        base = x
    y = jnp.zeros(y_length, x.dtype).at[: base.shape[0]].set(base)
    y = y - jnp.mean(y)
    y = jnp.concatenate([y, jnp.zeros(fft_size - y_length, x.dtype)])
    y_spectrum = jnp.fft.rfft(y)

    cutoff_in_sample = int(round(actual_fs / config.K_CUT_OFF))
    lcf = _design_low_cut_filter(cutoff_in_sample * 2 + 1, fft_size)
    return y_spectrum * jnp.fft.rfft(jnp.asarray(lcf, x.dtype))


def _band_candidates(boundary_f0, y_spectrum, y_length, actual_fs, fft_size,
                     temporal_positions, f0_floor, f0_ceil, dtype):
    """Candidate contour + score for one band (src/dio.cpp:441-544)."""
    hal = matlab_round(actual_fs / boundary_f0 / 2.0)
    filtered = filtered_signal_dio(hal, fft_size, y_spectrum, y_length, dtype)
    locs, ints, n_pairs = zerocross.four_zero_crossing_streams(
        filtered, y_length, actual_fs)
    interp = jax.vmap(lambda lo, iv, n: interp1(lo, iv, temporal_positions,
                                                n_valid=n))(locs, ints,
                                                            n_pairs)
    candidate = jnp.mean(interp, axis=0)
    dev = interp - candidate[None, :]
    score = jnp.sqrt(jnp.sum(dev * dev, axis=0) / 3.0)
    bad = ((candidate > boundary_f0) | (candidate < boundary_f0 / 2.0)
           | (candidate > f0_ceil) | (candidate < f0_floor))
    valid_band = jnp.all(n_pairs >= 3)
    candidate = jnp.where(valid_band & ~bad, candidate, 0.0)
    score = jnp.where(valid_band & ~bad, score, config.K_MAXIMUM_VALUE)
    score = score / (candidate + config.K_MY_SAFE_GUARD_MINIMUM)
    return candidate, score


def _all_band_candidates_fast(boundary_f0_list, y_spectrum, y_length,
                              actual_fs, fft_size, temporal_positions,
                              f0_floor, f0_ceil, dtype, block_index,
                              block_mask, frame_tf):
    """Candidates + scores for ALL bands, TPU path: frame-block
    crossing summaries (no sorts — the merge-rank interp1 and
    zero-crossing compaction sorts were 24.7 ms of the dio stage's
    32 ms device time) with the cross-block carry scans run once for
    all bands.  Same local arithmetic as interp1 on the bracketing
    crossings; the f64 golden path keeps the sort-based
    _band_candidates.  Returns (cands (C, F), scores (C, F))."""
    fs_t = jnp.asarray(actual_fs, dtype)
    big = jnp.asarray(3e38 if dtype == jnp.float32 else 1e300, dtype)

    def chan(b):
        hal = matlab_round(fs_t / b / 2.0)
        filtered = filtered_signal_dio(hal, fft_size, y_spectrum,
                                       y_length, dtype)
        return zerocross.four_stream_block_summaries(
            filtered, y_length, block_index, block_mask)

    sums, n_pairs = jax.vmap(chan)(boundary_f0_list)
    interp = zerocross.frame_candidates_eval(
        jnp.moveaxis(sums, 1, 0), actual_fs,
        frame_tf[None, None, :], temporal_positions[None, None, :], big)
    candidate = jnp.mean(interp, axis=1)               # (C, F)
    dev = interp - candidate[:, None, :]
    score = jnp.sqrt(jnp.sum(dev * dev, axis=1) / 3.0)
    b = boundary_f0_list[:, None]
    bad = ((candidate > b) | (candidate < b / 2.0)
           | (candidate > f0_ceil) | (candidate < f0_floor))
    valid = jnp.all(n_pairs >= 3, axis=1)[:, None]
    candidate = jnp.where(valid & ~bad, candidate, 0.0)
    score = jnp.where(valid & ~bad, score, config.K_MAXIMUM_VALUE)
    score = score / (candidate + config.K_MY_SAFE_GUARD_MINIMUM)
    return candidate, score


def _select_best(current, past, cands, allowed_range):
    """SelectBestF0 (src/dio.cpp:190-209)."""
    reference = (current * 3.0 - past) / 2.0
    err = jnp.abs(reference - cands)
    best = cands[jnp.argmin(err)]
    return jnp.where(jnp.abs(1.0 - best / reference) > allowed_range,
                     0.0, best)


def _fix_step1(best, voice_range_minimum, allowed_range):
    """Zero out jumps (src/dio.cpp:132-150)."""
    n = best.shape[0]
    i = jnp.arange(n)
    base = jnp.where((i < voice_range_minimum)
                     | (i >= n - voice_range_minimum), 0.0, best)
    prev = jnp.concatenate([jnp.zeros(1, best.dtype), base[:-1]])
    keep = jnp.abs((base - prev) / (config.K_MY_SAFE_GUARD_MINIMUM + base)) \
        < allowed_range
    return jnp.where((i >= voice_range_minimum) & keep, base, 0.0)


def _fix_step2(f0_step1, voice_range_minimum):
    """Zero frames whose +/-center window contains a zero
    (src/dio.cpp:156-169)."""
    center = (voice_range_minimum - 1) // 2
    n = f0_step1.shape[0]
    ok = f0_step1 != 0.0
    allok = ok
    for j in range(-center, center + 1):
        if j == 0:
            continue
        allok = allok & jnp.roll(ok, -j)
    i = jnp.arange(n)
    middle = (i >= center) & (i < n - center)
    return jnp.where(middle & ~allok, 0.0, f0_step1)


def _fix_step3(f0_step2, candidates, allowed_range):
    """Forward re-selection from each voiced->unvoiced boundary
    (src/dio.cpp:215-231) as a single scan; the per-section C++ loops
    chain head-to-tail, which one scan with an active flag reproduces."""
    nz = f0_step2 != 0.0
    # negative boundary at index t-1  ->  first written frame is t
    start = jnp.concatenate([jnp.zeros(1, bool), nz[:-1] & ~nz[1:]])

    def step(carry, inp):
        prev1, prev2, active = carry
        orig, is_start, cands = inp
        active = active | is_start
        sel = _select_best(prev1, prev2, cands, allowed_range)
        val = jnp.where(active, sel, orig)
        active = active & (val != 0.0)
        return (val, prev1, active), val

    init = (f0_step2[0], jnp.asarray(0.0, f0_step2.dtype),
            jnp.asarray(False))
    _, out = jax.lax.scan(step, init,
                          (f0_step2[1:], start[1:], candidates[1:]))
    return jnp.concatenate([f0_step2[:1], out])


def _fix_step4(f0_step3, f0_step2, candidates, allowed_range):
    """Backward re-selection from each unvoiced->voiced boundary
    (src/dio.cpp:237-253); boundaries from f0_step2, values from step3."""
    nz = f0_step2 != 0.0
    # positive boundary at index t+1 -> first written frame is t
    start = jnp.concatenate([~nz[:-1] & nz[1:], jnp.zeros(1, bool)])

    def step(carry, inp):
        next1, next2, active = carry
        orig, is_start, cands, is_first = inp
        active = active | is_start
        sel = _select_best(next1, next2, cands, allowed_range)
        val = jnp.where(active & ~is_first, sel, orig)
        active = active & (val != 0.0)
        return (val, next1, active), val

    n = f0_step3.shape[0]
    is_first = jnp.arange(n - 1) == 0
    init = (f0_step3[-1], jnp.asarray(0.0, f0_step3.dtype),
            jnp.asarray(False))
    _, out = jax.lax.scan(
        step, init,
        (f0_step3[:-1], start[:-1], candidates[:-1], is_first),
        reverse=True)
    return jnp.concatenate([out, f0_step3[-1:]])


@functools.partial(
    jax.jit, static_argnames=("fs", "frame_period", "f0_floor", "f0_ceil",
                              "channels_in_octave", "speed", "allowed_range"))
def _dio_impl(x, *, fs, frame_period, f0_floor, f0_ceil, channels_in_octave,
              speed, allowed_range):
    dtype = x.dtype
    x_length = x.shape[0]
    number_of_bands = 1 + int(
        np.log(f0_ceil / f0_floor) / config.K_LOG2 * channels_in_octave)
    boundary_f0_list = f0_floor * 2.0 ** (
        (np.arange(number_of_bands) + 1) / channels_in_octave)

    decimation_ratio = max(min(speed, 12), 1)
    y_length = 1 + x_length // decimation_ratio
    actual_fs = fs / decimation_ratio
    fft_size = get_suitable_fft_size(
        y_length + int(round(actual_fs / config.K_CUT_OFF)) * 2 + 1
        + 4 * int(1.0 + actual_fs / boundary_f0_list[0] / 2.0))

    y_spectrum = _spectrum_for_estimation(x, x_length, y_length, actual_fs,
                                          fft_size, decimation_ratio)

    f0_length = config.get_samples_for_dio(fs, x_length, frame_period)
    # Host-side constant in the reference's exact evaluation order
    # (i * frame_period) / 1000.0 (src/dio.cpp:610): XLA folds the
    # traced *fp/1000 chain into *0.005, a 1-ulp difference that flips
    # matlab_round sample indices wherever tp*fs lands on exact .5
    # (every odd frame at fs=44100).
    temporal_positions = jnp.asarray(
        np.arange(f0_length, dtype=np.float64) * frame_period / 1000.0,
        dtype)

    if dtype == jnp.float64:
        cands, scores = jax.vmap(
            lambda b: _band_candidates(b, y_spectrum, y_length, actual_fs,
                                       fft_size, temporal_positions,
                                       f0_floor, f0_ceil, dtype)
        )(jnp.asarray(boundary_f0_list, dtype))
    else:
        # Static frame-grid sample positions: t_f * fs in (s, s+1].
        tf_np = (np.arange(f0_length, dtype=np.float64) * frame_period
                 / 1000.0 * actual_fs)
        frame_samples = np.clip(np.ceil(tf_np).astype(np.int64) - 1, 0,
                                y_length - 1)
        block_index, block_mask = zerocross.frame_block_layout(
            frame_samples, y_length)
        cands, scores = _all_band_candidates_fast(
            jnp.asarray(boundary_f0_list, dtype), y_spectrum, y_length,
            actual_fs, fft_size, temporal_positions, f0_floor, f0_ceil,
            dtype, block_index, block_mask, jnp.asarray(tf_np, dtype))

    best_idx = jnp.argmin(scores, axis=0)
    best = jnp.take_along_axis(cands, best_idx[None, :], axis=0)[0]

    voice_range_minimum = int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1
    if f0_length <= voice_range_minimum:
        return temporal_positions, jnp.zeros(f0_length, dtype)
    step1 = _fix_step1(best, voice_range_minimum, allowed_range)
    step2 = _fix_step2(step1, voice_range_minimum)
    cands_t = cands.T  # (frames, bands)
    step3 = _fix_step3(step2, cands_t, allowed_range)
    step4 = _fix_step4(step3, step2, cands_t, allowed_range)
    return temporal_positions, step4


def dio(x, fs, option=None):
    """Dio F0 estimation (reference src/dio.cpp:643-648).

    Returns (temporal_positions, f0), each (f0_length,).
    """
    option = option or config.DioOption()
    x = jnp.asarray(x)
    return _dio_impl(x, fs=fs, frame_period=option.frame_period,
                     f0_floor=option.f0_floor, f0_ceil=option.f0_ceil,
                     channels_in_octave=option.channels_in_octave,
                     speed=option.speed, allowed_range=option.allowed_range)
