"""WORLD synthesis (batch), TPU-native.

Reference src/synthesis.cpp: a pulse train is derived from the F0 contour
(per-sample phase accumulation; a pulse wherever the wrapped phase jumps
by more than pi), and for each pulse a minimum-phase periodic response
plus a noise-excited aperiodic response is overlap-added.

TPU mapping: phase accumulation is a cumsum; pulse extraction is a mask
compacted into a fixed-capacity padded pulse array; the per-pulse
response (2 minimum-phase analyses + 3 FFTs) is one vmapped fixed-shape
kernel; OLA is a scatter-add with out-of-range drop.  Exact-mode RNG
reproduces the reference's per-pulse noise blocks via GF(2) stream jumps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import rng as rng_ops
from ..ops.common import minimum_phase_spectrum
from ..ops.matlab import fftshift, interp1

BIG = jnp.iinfo(jnp.int32).max // 2


def _dc_remover(fft_size, dtype):
    """Hann-ish normalized DC removal kernel (src/synthesis.cpp:323-335)."""
    i = np.arange(fft_size // 2)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (i + 1.0) / (1.0 + fft_size))
    w = w / (2.0 * w.sum())
    return jnp.asarray(np.concatenate([w, w[::-1]]), dtype)


def _time_base(f0, fs_t, frame_period_s, y_length, lowest_f0, dtype):
    """Per-sample f0/vuv interpolation and pulse extraction
    (src/synthesis.cpp:224-321).  Returns padded pulse arrays."""
    f0_length = f0.shape[0]
    coarse_time = jnp.arange(f0_length + 1, dtype=dtype) * frame_period_s
    cf0 = jnp.where(f0 < lowest_f0, 0.0, f0)
    cvuv = jnp.where(cf0 == 0.0, 0.0, 1.0)
    cf0 = jnp.concatenate([cf0, (cf0[-1] * 2 - cf0[-2])[None]])
    cvuv = jnp.concatenate([cvuv, (cvuv[-1] * 2 - cvuv[-2])[None]])

    time_axis = jnp.arange(y_length, dtype=dtype) / fs_t
    if0 = interp1(coarse_time, cf0, time_axis)
    ivuv = interp1(coarse_time, cvuv, time_axis)
    ivuv = jnp.where(ivuv > 0.5, 1.0, 0.0)
    if0 = jnp.where(ivuv == 0.0, config.K_DEFAULT_F0, if0)

    total_phase = jnp.cumsum(2.0 * config.K_PI * if0 / fs_t)
    wrap_phase = jnp.mod(total_phase, 2.0 * config.K_PI)
    jump = jnp.abs(jnp.diff(wrap_phase))
    is_pulse = jump > config.K_PI  # pulse at sample i, i < y_length-1

    idx = jnp.arange(y_length - 1)
    n_pulses = jnp.sum(is_pulse)

    # Elementwise-before-compaction: the fractional shift and the vuv
    # flag cost a few flops per SAMPLE, so compute them for every sample
    # and let the compaction sort carry them as payloads — three
    # arbitrary pulse-index gathers (~1 us per scalar on TPU) become
    # extra sort bytes.  Same operands and op order per pulse, so the
    # kept slots are bit-identical; BIG-keyed slots carry garbage (the
    # shift can be inf/NaN where the phase is locally flat) that the
    # caller's `valid` mask replaces before it can reach the output.
    y1 = wrap_phase[:-1] - 2.0 * config.K_PI
    y2 = wrap_phase[1:]
    shift_all = (-y1 / (y2 - y1)) / fs_t
    key = jnp.where(is_pulse, idx, BIG)
    order, shift, vuv = jax.lax.sort(
        (key, shift_all, ivuv[:y_length - 1]), num_keys=1, is_stable=False)

    safe = jnp.clip(order, 0, y_length - 2)
    return order, safe, shift, n_pulses, vuv


def _lerp_frames(values, current_time, frame_period_s, f0_length):
    """Two-frame linear interpolation of a spectral track
    (src/synthesis.cpp:141-179)."""
    t = current_time / frame_period_s
    lo = jnp.minimum(jnp.floor(t).astype(jnp.int32), f0_length - 1)
    hi = jnp.minimum(jnp.ceil(t).astype(jnp.int32), f0_length - 1)
    w = t - jnp.floor(t)
    same = lo == hi
    return jnp.where(same, values[lo], (1.0 - w) * values[lo]
                     + w * values[hi])


def _one_pulse(spectrogram_abs, aperiodicity_safe, f0_length, fft_size,
               frame_period_s, fs_t, dc_remover, current_time, current_vuv,
               fractional_shift, noise_draws, noise_size):
    """Periodic + aperiodic response for one pulse
    (src/synthesis.cpp:184-222)."""
    dtype = spectrogram_abs.dtype
    half = fft_size // 2
    env = _lerp_frames(spectrogram_abs, current_time, frame_period_s,
                       f0_length)
    ap = _lerp_frames(aperiodicity_safe, current_time, frame_period_s,
                      f0_length) ** 2

    # --- periodic response (src/synthesis.cpp:106-139) ---
    logspec = jnp.log(env * (1.0 - ap) + config.K_MY_SAFE_GUARD_MINIMUM) / 2.0
    mp = minimum_phase_spectrum(logspec, fft_size)
    coefficient = (2.0 * config.K_PI * fractional_shift * fs_t / fft_size)
    k = jnp.arange(half + 1, dtype=dtype)
    re2 = jnp.cos(coefficient * k)
    im2 = jnp.sqrt(1.0 - re2**2)  # == sin for arguments in [0, pi)
    shifted = (mp.real * re2 + mp.imag * im2) \
        + 1j * (mp.imag * re2 - mp.real * im2)
    periodic = jnp.fft.irfft(shifted, n=fft_size) * fft_size
    periodic = fftshift(periodic)
    dc = jnp.sum(periodic[half:])
    periodic = jnp.where(jnp.arange(fft_size) < half, 0.0, periodic) \
        - dc * dc_remover
    skip = (current_vuv <= 0.5) | (ap[0] > 0.999)
    periodic = jnp.where(skip, 0.0, periodic)

    # --- aperiodic response (src/synthesis.cpp:19-69) ---
    i = jnp.arange(fft_size)
    in_noise = i < noise_size
    noise = jnp.where(in_noise, noise_draws, 0.0)
    mean = jnp.sum(noise) / jnp.maximum(noise_size, 1)
    noise = jnp.where(in_noise, noise - mean, 0.0)
    noise_spec = jnp.fft.rfft(noise)
    ap_log = jnp.where(current_vuv != 0.0,
                       jnp.log(env * ap) / 2.0, jnp.log(env) / 2.0)
    mp_ap = minimum_phase_spectrum(ap_log, fft_size)
    aperiodic = jnp.fft.irfft(mp_ap * noise_spec, n=fft_size) * fft_size
    aperiodic = fftshift(aperiodic)

    sqrt_noise = jnp.sqrt(noise_size.astype(dtype))
    return (periodic * sqrt_noise + aperiodic) / fft_size


@functools.partial(jax.jit, static_argnames=("fs", "fft_size",
                                              "frame_period", "y_length",
                                              "max_pulses", "rng_mode"))
def _synthesis_impl(f0, spectrogram, aperiodicity, fs_t, *, fs, fft_size,
                    frame_period, y_length, max_pulses, rng_mode):
    dtype = spectrogram.dtype
    f0_length = f0.shape[0]
    frame_period_s = frame_period / 1000.0
    lowest_f0 = fs / fft_size + 1.0

    order, safe_idx, shift, n_pulses, pulse_vuv = _time_base(
        f0, fs_t, frame_period_s, y_length, lowest_f0, dtype)
    order = order[:max_pulses]
    safe_idx = safe_idx[:max_pulses]
    shift = shift[:max_pulses]
    pulse_vuv = pulse_vuv[:max_pulses]
    valid = jnp.arange(max_pulses) < n_pulses

    k = jnp.arange(max_pulses)
    next_idx = jnp.where(k + 1 < n_pulses, jnp.roll(safe_idx, -1), safe_idx)
    noise_size = next_idx - safe_idx

    if rng_mode == "exact":
        counts = jnp.where(valid, noise_size, 0)
        offsets = jnp.cumsum(counts) - counts
        noise_draws = rng_ops.randn_blocks_at(offsets, fft_size).astype(dtype)
    elif rng_mode == "fast":
        key = jax.random.PRNGKey(3)
        noise_draws = jax.random.normal(key, (max_pulses, fft_size), dtype)
    else:
        noise_draws = jnp.zeros((max_pulses, fft_size), dtype)

    sp_abs = jnp.abs(spectrogram)
    ap_safe = jnp.clip(aperiodicity, 0.001, 1.0 - config.K_MY_SAFE_GUARD_MINIMUM)
    dc_rem = _dc_remover(fft_size, dtype)

    current_time = safe_idx.astype(dtype) / fs_t
    current_vuv = pulse_vuv

    def render(t, v, s, nd, ns):
        return jax.vmap(lambda tt, vv, ss, nn, zz: _one_pulse(
            sp_abs, ap_safe, f0_length, fft_size, frame_period_s, fs_t,
            dc_rem, tt, vv, ss, nn, zz))(t, v, s, nd, ns)

    if dtype == jnp.float64:
        responses = render(current_time, current_vuv, shift, noise_draws,
                           noise_size)
    else:
        # max_pulses is a worst-case capacity (~1500 Hz); real tracks
        # have far fewer pulses and the compaction sort already put them
        # first, so render only enough chunks to cover n_pulses.
        pc = min(128, max_pulses)
        p_pad = (-max_pulses) % pc
        padz = lambda a: jnp.concatenate(
            [a, jnp.zeros((p_pad,) + a.shape[1:], a.dtype)])
        args = tuple(padz(a) for a in (current_time, current_vuv, shift,
                                       noise_draws, noise_size))
        needed = (n_pulses + pc - 1) // pc

        def body(carry):
            i, acc = carry
            sl = tuple(jax.lax.dynamic_slice_in_dim(a, i * pc, pc)
                       for a in args)
            return i + 1, jax.lax.dynamic_update_slice(
                acc, render(*sl), (i * pc, 0))

        acc0 = jnp.zeros((max_pulses + p_pad, fft_size), dtype)
        _, responses = jax.lax.while_loop(lambda c: c[0] < needed, body,
                                          (0, acc0))
        responses = responses[:max_pulses]
    responses = jnp.where(valid[:, None], responses, 0.0)

    offsets = safe_idx - fft_size // 2 + 1
    if dtype == jnp.float64:
        # Exact/golden path: scatter-add with drop, like the C++ OLA loop.
        # mode="drop" only drops out-of-BOUNDS indices; negative indices
        # wrap Python-style and would fold early pulses' left tails onto
        # the end of the waveform — remap them to an always-dropped OOB
        # index instead.
        targets = offsets[:, None] + jnp.arange(fft_size)[None, :]
        targets = jnp.where(targets < 0, y_length, targets)
        y = jnp.zeros(y_length, dtype)
        y = y.at[targets].add(responses, mode="drop")
        return y

    # Fast path: a scatter-add of (pulses, fft_size) rows at arbitrary
    # sample offsets is the single slowest lowering on TPU (~200 ms for a
    # 16x1249-pulse batch); the Pallas VMEM-accumulator kernel does the
    # same OLA in ~5 ms (bit-exact vs. the scatter).
    from ..ops.pallas_ola import ola_accumulate

    pad_l = fft_size                      # covers offsets >= -(fft_size-1)
    y_padded = y_length + 2 * fft_size
    o = jnp.clip(offsets + pad_l, 0, y_padded - fft_size)
    y = ola_accumulate(responses[None], o[None].astype(jnp.int32),
                       y_padded=y_padded)[0]
    return y[pad_l: pad_l + y_length]


def synthesis(f0, spectrogram, aperiodicity, fs, frame_period=5.0,
              y_length=None, fft_size=None, max_pulses=None,
              rng_mode="exact"):
    """Batch synthesis (reference src/synthesis.cpp:339-399).

    Returns the synthesized waveform of length ``y_length`` (default:
    (f0_length-1)*frame_period*fs/1000 + 1, as in test/test.cpp:252-254).
    """
    spectrogram = jnp.asarray(spectrogram)
    f0 = jnp.asarray(f0, spectrogram.dtype)
    f0_length = f0.shape[0]
    if fft_size is None:
        fft_size = 2 * (spectrogram.shape[1] - 1)
    if y_length is None:
        y_length = int((f0_length - 1) * frame_period / 1000.0 * fs) + 1
    if max_pulses is None:
        # Pulses are at most one per period; 1500 Hz covers any F0 track
        # up to nearly double the default 800 Hz ceiling.  A concrete
        # (non-traced) F0 — the public-API case — additionally sizes the
        # capacity from its own maximum, so manipulated tracks above
        # 1500 Hz (e.g. test.cpp-style F0 scaling) never silently drop
        # pulses; inside jit, pass max_pulses explicitly.
        ceiling = 1500.0
        if not isinstance(f0, jax.core.Tracer):
            ceiling = max(ceiling, float(jnp.max(f0)) * 1.001 + 1.0)
        # Pulses only exist at samples i < y_length-1 (_time_base).
        max_pulses = min(y_length - 1, int(y_length / fs * ceiling) + 64)
    return _synthesis_impl(
        f0, spectrogram, jnp.asarray(aperiodicity, spectrogram.dtype),
        jnp.asarray(float(fs), spectrogram.dtype), fs=fs, fft_size=fft_size,
        frame_period=float(frame_period), y_length=y_length,
        max_pulses=max_pulses, rng_mode=rng_mode)
