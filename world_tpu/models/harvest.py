"""Harvest F0 estimator, TPU-native.

Reference src/harvest.cpp.  Internally always runs at a 1 ms frame
period with 40 channels/octave on a ~8 kHz decimated signal, then
nearest-neighbor resamples to the requested period (src/harvest.cpp:
1223-1255).

Device pipeline (jitted):
  A. decimate (MATLAB-compatible edge extension) + whole-signal rfft;
     per channel (vmapped over ~152 bands): cosine-modulated Nuttall
     band-pass, four zero-crossing streams, interp1 -> raw candidates.
  B. channel-run collapse into per-frame candidate lists, +/-3 frame
     overlap smear (gather with traced candidate count), then the
     instantaneous-frequency refinement of every (frame, candidate)
     pair — the >90%-of-runtime kernel.  float64 buckets full FFTs by
     power-of-two size (bit-matching the reference); float32/TPU
     computes only the <=6 harmonic DFT bins on a frame-centered grid
     (one waveform slice per frame, no buckets).
  C. neighbor-consistency pruning (vectorized).
  D. contour fixing (FixStep1-4 incl. Extend/Merge) and per-section
     zero-phase smoothing as masked scans on device
     (models/harvest_contour.py), cross-validated against the
     host-numpy transcription oracle in tests/harvest_contour_oracle.py
     by harvest_contour's randomized property test.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import common
from ..ops import zerocross
from ..ops.common import get_suitable_fft_size
from ..ops.filterbank import filtered_signal_harvest
from ..ops.matlab import decimate, interp1, matlab_round

BIG = jnp.iinfo(jnp.int32).max // 2


# ---------------------------------------------------------------------------
# Stage A: decimation, filterbank, raw candidates
# ---------------------------------------------------------------------------

def _waveform_and_spectrum(x, y_length, fft_size, decimation_ratio):
    """Decimate with MATLAB-compatible edge extension, remove DC, rfft
    (src/harvest.cpp:43-93).  Returns (y, y_spectrum)."""
    if decimation_ratio == 1:
        y = x[:y_length]
    else:
        lag = int(math.ceil(140.0 / decimation_ratio) * decimation_ratio)
        head = jnp.full(lag, x[0], x.dtype)
        tail = jnp.full(lag, x[-1], x.dtype)
        new_y = decimate(jnp.concatenate([head, x, tail]), decimation_ratio)
        y = jax.lax.dynamic_slice(new_y, (lag // decimation_ratio,),
                                  (y_length,))
    y = y - jnp.mean(y)
    padded = jnp.concatenate([y, jnp.zeros(fft_size - y_length, x.dtype)])
    return y, jnp.fft.rfft(padded)


def _channel_candidates(boundary_f0, y_spectrum, y_length, actual_fs,
                        fft_size, temporal_positions, f0_floor, f0_ceil,
                        dtype):
    """Raw F0 candidate contour for one channel, float64 golden path:
    compaction sort + merge-rank interp1, bit-matching the reference
    (src/harvest.cpp:99-293)."""
    flh = matlab_round(actual_fs / boundary_f0 * 2.0)
    filtered = filtered_signal_harvest(boundary_f0, fft_size, actual_fs,
                                       y_spectrum, y_length, dtype, flh)
    locs, ints, n_pairs = zerocross.four_zero_crossing_streams(
        filtered, y_length, actual_fs)
    interp = jax.vmap(
        lambda lo, iv, n: interp1(lo, iv, temporal_positions,
                                  n_valid=n))(locs, ints, n_pairs)
    candidate = jnp.mean(interp, axis=0)
    bad = ((candidate > boundary_f0 * 1.1) | (candidate < boundary_f0 * 0.9)
           | (candidate > f0_ceil) | (candidate < f0_floor))
    valid = jnp.all(n_pairs >= 3)
    return jnp.where(valid & ~bad, candidate, 0.0)


def _all_channel_candidates_fast(boundaries, y_spectrum, y_length,
                                 actual_fs, fft_size, temporal_positions,
                                 f0_floor, f0_ceil, dtype, block_index,
                                 block_mask, frame_tf):
    """Raw candidates for ALL channels, TPU path: frame-block crossing
    summaries per channel (no sorts, no data-dependent gathers — same
    local arithmetic as interp1 on the bracketing triple), with the two
    cross-block carry scans hoisted OUT of the channel map so they run
    once.  Returns (channels, frames)."""
    fs_t = jnp.asarray(actual_fs, dtype)

    def chan(b):
        flh = matlab_round(fs_t / b * 2.0)
        filtered = filtered_signal_harvest(b, fft_size, fs_t, y_spectrum,
                                           y_length, dtype, flh)
        return zerocross.four_stream_block_summaries(
            filtered, y_length, block_index, block_mask)

    sums, n_pairs = jax.lax.map(chan, boundaries, batch_size=76)
    big = jnp.asarray(3e38 if dtype == jnp.float32 else 1e300, dtype)
    interp = zerocross.frame_candidates_eval(
        jnp.moveaxis(sums, 1, 0), actual_fs,
        frame_tf[None, None, :], temporal_positions[None, None, :], big)
    candidate = jnp.mean(interp, axis=1)            # (C, F)
    b = boundaries[:, None]
    bad = ((candidate > b * 1.1) | (candidate < b * 0.9)
           | (candidate > f0_ceil) | (candidate < f0_floor))
    valid = jnp.all(n_pairs >= 3, axis=1)[:, None]
    return jnp.where(valid & ~bad, candidate, 0.0)


# ---------------------------------------------------------------------------
# Stage B: candidate collapse, overlap, IF refinement
# ---------------------------------------------------------------------------

def _detect_official_candidates(raw, max_candidates):
    """Collapse voiced channel runs (>=10 channels) into per-frame
    candidate lists (src/harvest.cpp:348-412).

    raw: (channels, frames).  Returns ((frames, max_candidates) array,
    global candidate count C).

    Formulation: run means are produced at each run-END channel by a
    sequential scan over the (short) channel axis carrying the cumsum
    value at the latest run start; one two-operand lax.sort compacts
    the kept means into slots.  Bit-identical to the per-frame
    sort+gather version (same cumsum differences, same order) at a
    fraction of the sort volume."""
    n_ch, n_frames = raw.shape
    vuv = raw > 0.0
    ch = jnp.arange(n_ch)
    vuv = vuv & (ch[:, None] != 0) & (ch[:, None] != n_ch - 1)

    prev = jnp.concatenate([jnp.zeros((1, n_frames), bool), vuv[:-1]])
    starts = vuv & ~prev                     # (C, F)
    ends = ~vuv & prev
    csum = jnp.cumsum(raw, axis=0)
    csum_prev = jnp.concatenate(
        [jnp.zeros((1, n_frames), raw.dtype), csum[:-1]])

    def step(carry, xs):
        st_csum, st_ch = carry
        is_start, cp, c = xs
        st_csum = jnp.where(is_start, cp, st_csum)
        st_ch = jnp.where(is_start, c, st_ch)
        return (st_csum, st_ch), (st_csum, st_ch)

    init = (jnp.zeros(n_frames, raw.dtype), jnp.zeros(n_frames, ch.dtype))
    _, (st_csum, st_ch) = jax.lax.scan(
        step, init, (starts, csum_prev,
                     jnp.broadcast_to(ch[:, None], (n_ch, n_frames))))
    length = ch[:, None] - st_ch             # run length at end position
    mean = (csum_prev - st_csum) / jnp.maximum(length, 1).astype(raw.dtype)
    keep = ends & (length >= 10)
    # Compact kept means into slots, order preserved: one sort of
    # (channel-key, mean) pairs per frame.  Unstable is bit-identical
    # here — kept keys are distinct channel indices and every BIG-padded
    # slot carries the same 0.0 payload — and drops the iota operand a
    # stable TPU sort would carry (sorts are byte-rate bound).
    key = jnp.where(keep, ch[:, None], BIG)
    skey, smean = jax.lax.sort((jnp.broadcast_to(key, keep.shape).T,
                                jnp.where(keep, mean, 0.0).T), num_keys=1,
                               is_stable=False)
    cands = jnp.where(skey[:, :max_candidates] < BIG,
                      smean[:, :max_candidates], 0.0)
    counts = jnp.sum(keep, axis=0)
    return cands, jnp.max(counts)


def _overlap_candidates(cands, n_cands, max_candidates):
    """Smear candidates +/-3 frames into slots j + C*i
    (src/harvest.cpp:417-429).  C = n_cands is traced.

    Slot s of the output reads column s % C of the cands row s // C
    frames away — a 2D gather with traced indices.  Expressed instead
    as seven static frame shifts times 0/1 slot-permutation matmuls
    (one nonzero per output slot, so bit-identical)."""
    dtype = cands.dtype
    c = jnp.maximum(n_cands, 1)
    s = jnp.arange(max_candidates)[None, :]
    j = jnp.arange(max_candidates)[:, None]
    out = jnp.zeros_like(cands)
    for q in range(7):
        shift = q if q <= 3 else -(q - 3)
        if shift > 0:
            shifted = jnp.concatenate(
                [jnp.zeros((shift, max_candidates), dtype),
                 cands[:-shift]], 0)
        elif shift < 0:
            shifted = jnp.concatenate(
                [cands[-shift:],
                 jnp.zeros((-shift, max_candidates), dtype)], 0)
        else:
            shifted = cands
        perm = ((s == q * c + j) & (j < c)).astype(dtype)
        out = out + shifted @ perm
    return jnp.where(n_cands > 0, out, 0.0)


def _refine_pair(y, fs_t, fft_size, max_len, position, f0, f0_floor,
                 f0_ceil):
    """GetRefinedF0 for one (frame, candidate) pair at a static fft size
    (src/harvest.cpp:434-617)."""
    dtype = y.dtype
    half_window = (1.5 * fs_t / f0 + 1.0).astype(jnp.int32)
    win_len = 2 * half_window + 1
    wlt = win_len.astype(dtype) / fs_t

    i = jnp.arange(max_len)
    in_win = i < win_len
    # GetBaseIndex (harvest variant): one rounded origin, then +i
    # (src/harvest.cpp:434-441).
    bt0 = -half_window.astype(dtype) / fs_t
    basic_index = matlab_round((position + bt0) * fs_t + 0.001)
    base_index = basic_index + i
    tmp = (base_index.astype(dtype) - 1.0) / fs_t - position
    main_window = (0.42 + 0.5 * jnp.cos(2.0 * config.K_PI * tmp / wlt)
                   + 0.08 * jnp.cos(4.0 * config.K_PI * tmp / wlt))
    main_window = jnp.where(in_win, main_window, 0.0)
    nxt = jnp.roll(main_window, -1)
    prv = jnp.roll(main_window, 1)
    diff_window = -(nxt - prv) / 2.0
    diff_window = jnp.where(i == 0, -nxt / 2.0, diff_window)
    diff_window = jnp.where(i == win_len - 1, prv / 2.0, diff_window)
    diff_window = jnp.where(in_win, diff_window, 0.0)

    # base_index = basic_index + i is contiguous by construction, so the
    # edge-clamped slice equals the clipped gather bit-for-bit (and is
    # ~30x cheaper on TPU).
    seg = common.window_slice(y, basic_index - 1, max_len)
    seg = jnp.where(in_win, seg, 0.0)
    main_spec = jnp.fft.rfft(seg * main_window, n=fft_size)
    diff_spec = jnp.fft.rfft(seg * diff_window, n=fft_size)
    power = main_spec.real**2 + main_spec.imag**2
    numer = (main_spec.real * diff_spec.imag
             - main_spec.imag * diff_spec.real)

    # FixF0, harvest flavor: single pass, data-dependent harmonic count
    # (src/harvest.cpp:507-536,571-573).
    n_harm = jnp.minimum((fs_t / 2.0 / f0).astype(jnp.int32), 6)
    harm = jnp.arange(1, 7, dtype=dtype)
    active = jnp.arange(6) < n_harm
    index = matlab_round(f0 * fft_size / fs_t * harm)
    index = jnp.clip(index, 0, fft_size // 2)
    ps = power[index]
    inst = jnp.where(ps == 0.0, 0.0,
                     index.astype(dtype) * fs_t / fft_size
                     + numer[index] / ps * fs_t / (2.0 * config.K_PI))
    amp = jnp.where(active, jnp.sqrt(ps), 0.0)
    refined = jnp.sum(amp * inst * active) / (
        jnp.sum(amp * harm) + config.K_MY_SAFE_GUARD_MINIMUM)
    dev = jnp.sum(jnp.where(active, jnp.abs((inst / harm - f0) / f0), 0.0))
    score = 1.0 / (dev / jnp.maximum(n_harm, 1)
                   + config.K_MY_SAFE_GUARD_MINIMUM)

    ok = (refined >= f0_floor) & (refined <= f0_ceil) & (score >= 2.5)
    return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)


def _refine_frame_direct(seg_p, seg_m, c0f, posf, fs_t, hw_max, f0,
                         f0_floor, f0_ceil):
    """GetRefinedF0 for one candidate on a FRAME-CENTERED grid,
    computing only the <=6 harmonic DFT bins directly.

    The FFT path reads just bins round(h*f0*fft/fs) of each spectrum, so
    the f32/TPU path evaluates those bins as windowed cos/sin dots: no
    FFT, no per-fft-size bucketing (which re-ran every pair at every
    bucket).  On the centered grid j in [-hw_max, hw_max] the spectra
    pick up a common phase factor e^{-i omega hw} which cancels in
    |M|^2 and in Im(conj(M) D), so the instantaneous-frequency math is
    unchanged, and the phase omega*j is odd-symmetric: cos even / sin
    odd, so every dot folds onto j in [0, hw_max] —
      sum_j cos(w j) x_j = sum_{j>=0} cos(w j) (x_j + [j>0] x_{-j})
      sum_j sin(w j) x_j = sum_{j>0}  sin(w j) (x_j - x_{-j})
    — halving the transcendental count and reduction width.

    Inputs are the frame-shared waveform slice PRE-SPLIT into the plus
    half (index j in [0, hw_max]) and the REVERSED minus half (index m
    maps to j = -m): the reversal happens once per frame in _refine_all
    instead of per candidate here, so the whole per-candidate chain
    (windows, folds, phase dots) stays one XLA fusion with no HBM
    round-trips (a per-candidate rev forced ~80 MB/chunk of
    intermediates to materialize).  The window time bases are rebuilt
    here from the two per-frame scalars (rounded center c0f, frame
    position posf) — bit-identical to the former precomputed (F, W)
    arrays but ~2x less HBM streamed per slot-chunk iteration.  Float64
    keeps the FFT path for golden parity; this path is ~0.005 cents
    off."""
    dtype = seg_p.dtype
    m_idx = jnp.arange(hw_max + 1)
    hw = (1.5 * fs_t / f0 + 1.0).astype(jnp.int32)
    win_len = 2 * hw + 1
    wlt = win_len.astype(dtype) / fs_t
    in_win = m_idx <= hw

    # The Blackman argument is a LINEAR phase ramp: tmp_p[j] = t0 + j/fs,
    # tmp_m[j] = t0 - j/fs with t0 = (c0f-1)/fs - posf, so
    #   cos(2pi tmp_p/wlt) = cos(a + j d) = cos a cos(j d) - sin a sin(j d)
    #   cos(2pi tmp_m/wlt) = cos(a - j d) = cos a cos(j d) + sin a sin(j d)
    # with a = 2pi t0/wlt, d = 2pi/(fs wlt) = 2pi/win_len.  cos/sin(j d)
    # grow by the same radix-B angle addition as the DFT dots below: FOUR
    # transcendentals per (frame, candidate) instead of 2*(hw_max+1)
    # (~37% of the refine chunk loop was window cosines).  f32 chain
    # error ~1e-5 — below the fast path's 0.1-cent budget (measured
    # 0.006 cents vs the f64 golden, unchanged from the direct cos).
    t0 = (c0f - 1.0) / fs_t - posf
    a = 2.0 * config.K_PI * t0 / wlt
    d = 2.0 * config.K_PI / win_len.astype(dtype)
    Bw = 16
    Ww = hw_max + 1
    Qw = -(-Ww // Bw)
    cd, sd = jnp.cos(d), jnp.sin(d)
    crw, srw = [jnp.ones_like(cd)], [jnp.zeros_like(sd)]
    for _ in range(Bw - 1):
        crw.append(crw[-1] * cd - srw[-1] * sd)
        srw.append(srw[-1] * cd + crw[-2] * sd)
    crw = jnp.stack(crw)                  # (Bw,): cos(r d)
    srw = jnp.stack(srw)
    cBw, sBw = cd, sd
    for _ in range(4):                    # Bw = 2**4 doublings
        cBw, sBw = cBw * cBw - sBw * sBw, 2.0 * sBw * cBw
    cqw, sqw = [jnp.ones_like(cd)], [jnp.zeros_like(sd)]
    for _ in range(Qw - 1):
        cqw.append(cqw[-1] * cBw - sqw[-1] * sBw)
        sqw.append(sqw[-1] * cBw + cqw[-2] * sBw)
    cqw = jnp.stack(cqw)                  # (Qw,): cos(Bw q d)
    sqw = jnp.stack(sqw)
    cosj = (cqw[:, None] * crw[None, :]
            - sqw[:, None] * srw[None, :]).reshape(-1)[:Ww]
    sinj = (sqw[:, None] * crw[None, :]
            + cqw[:, None] * srw[None, :]).reshape(-1)[:Ww]
    ca, sa = jnp.cos(a), jnp.sin(a)

    def blackman(c2):
        # cos(2a) = 2cos^2(a)-1 halves the transcendental count.
        w = 0.42 + 0.5 * c2 + 0.08 * (2.0 * c2 * c2 - 1.0)
        return jnp.where(in_win, w, 0.0)

    w_p = blackman(ca * cosj - sa * sinj)   # j = 0..hw_max
    w_m = blackman(ca * cosj + sa * sinj)   # j = 0..-hw_max (reversed)

    # DiffWindow -(w[j+1]-w[j-1])/2 with one-sided edges at j=+-hw:
    # the masked-zero w beyond hw makes the interior formula produce
    # the edge values automatically; only the j=0 neighbors cross
    # between the halves.
    z1 = jnp.zeros(1, dtype)
    nxt_p = jnp.concatenate([w_p[1:], z1])          # w(j+1)
    prv_p = jnp.concatenate([w_m[1:2], w_p[:-1]])   # w(j-1); w(-1)=w_m[1]
    dw_p = jnp.where(in_win, -(nxt_p - prv_p) / 2.0, 0.0)
    nxt_m = jnp.concatenate([w_p[1:2], w_m[:-1]])   # w(-m+1); w(1)=w_p[1]
    prv_m = jnp.concatenate([w_m[1:], z1])          # w(-m-1)
    dw_m = jnp.where(in_win, -(nxt_m - prv_m) / 2.0, 0.0)

    nonzero_m = m_idx > 0
    xm_e = seg_p * w_p + jnp.where(nonzero_m, seg_m * w_m, 0.0)
    xm_o = seg_p * w_p - jnp.where(nonzero_m, seg_m * w_m, 0.0)
    xd_e = seg_p * dw_p + jnp.where(nonzero_m, seg_m * dw_m, 0.0)
    xd_o = seg_p * dw_p - jnp.where(nonzero_m, seg_m * dw_m, 0.0)

    fft_size = jnp.exp2(2.0 + jnp.floor(
        jnp.log(win_len.astype(dtype)) / config.K_LOG2)).astype(dtype)
    n_harm = jnp.minimum((fs_t / 2.0 / f0).astype(jnp.int32), 6)
    harm = jnp.arange(1, 7, dtype=dtype)
    active = jnp.arange(6) < n_harm
    index = matlab_round(f0 * fft_size / fs_t * harm)
    index = jnp.clip(index, 0, (fft_size / 2).astype(jnp.int32))

    omega = (2.0 * config.K_PI / fft_size) * index.astype(dtype)
    # Radix-B factorization of the 6-bin DFT dots (j = q*B + r):
    #   cos(w j) = cos(wBq) cos(wr) - sin(wBq) sin(wr)
    # so sum_j trig(w j) x_j collapses to per-block partial dots of x
    # against small (6, B) r-tables followed by a (6, Q) combine with
    # the q-tables.  Only TWO transcendentals per harmonic (cos w,
    # sin w) instead of 2*(hw_max+1); the tables grow by unrolled
    # angle addition, whose f32 chain error (~1e-5) is BELOW the
    # argument-rounding error of direct f32 cos(w*j) at j ~ 200
    # (~3e-5).  All stays one XLA fusion: nothing of size (6, W)
    # materializes.
    B = 16
    W = hw_max + 1
    Q = -(-W // B)
    cb = jnp.cos(omega)
    sb = jnp.sin(omega)
    crl, srl = [jnp.ones_like(cb)], [jnp.zeros_like(sb)]
    for _ in range(B - 1):
        crl.append(crl[-1] * cb - srl[-1] * sb)
        srl.append(srl[-1] * cb + crl[-2] * sb)
    cr = jnp.stack(crl, -1)               # (6, B): cos(w r)
    sr = jnp.stack(srl, -1)
    cB, sB = cb, sb
    for _ in range(4):                    # B = 2**4 doublings -> trig(wB)
        cB, sB = cB * cB - sB * sB, 2.0 * sB * cB
    cql, sql = [jnp.ones_like(cb)], [jnp.zeros_like(sb)]
    for _ in range(Q - 1):
        cql.append(cql[-1] * cB - sql[-1] * sB)
        sql.append(sql[-1] * cB + cql[-2] * sB)
    cq = jnp.stack(cql, -1)               # (6, Q): cos(w B q)
    sq = jnp.stack(sql, -1)

    zpad = jnp.zeros(Q * B - W, dtype)

    def _partials(x):
        xr = jnp.concatenate([x, zpad]).reshape(Q, B)
        pc = jnp.sum(cr[:, None, :] * xr[None, :, :], axis=-1)  # (6, Q)
        ps = jnp.sum(sr[:, None, :] * xr[None, :, :], axis=-1)
        return pc, ps

    pc, ps = _partials(xm_e)
    main_re = jnp.sum(cq * pc - sq * ps, axis=-1)
    pc, ps = _partials(xm_o)
    main_im = -jnp.sum(sq * pc + cq * ps, axis=-1)
    pc, ps = _partials(xd_e)
    diff_re = jnp.sum(cq * pc - sq * ps, axis=-1)
    pc, ps = _partials(xd_o)
    diff_im = -jnp.sum(sq * pc + cq * ps, axis=-1)
    power = main_re**2 + main_im**2
    numer = main_re * diff_im - main_im * diff_re

    inst = jnp.where(power == 0.0, 0.0,
                     index.astype(dtype) * fs_t / fft_size
                     + numer / power * fs_t / (2.0 * config.K_PI))
    amp = jnp.where(active, jnp.sqrt(power), 0.0)
    refined = jnp.sum(amp * inst * active) / (
        jnp.sum(amp * harm) + config.K_MY_SAFE_GUARD_MINIMUM)
    dev = jnp.sum(jnp.where(active, jnp.abs((inst / harm - f0) / f0), 0.0))
    score = 1.0 / (dev / jnp.maximum(n_harm, 1)
                   + config.K_MY_SAFE_GUARD_MINIMUM)

    ok = (refined >= f0_floor) & (refined <= f0_ceil) & (score >= 2.5)
    return jnp.where(ok, refined, 0.0), jnp.where(ok, score, 0.0)


def _refine_buckets(fs, f0_floor, f0_ceil):
    hw_min = int(1.5 * fs / f0_ceil + 1.0)
    hw_max = int(1.5 * fs / f0_floor + 1.0)
    lo = 2 ** (2 + int(math.log(hw_min * 2.0 + 1.0) / config.K_LOG2))
    hi = 2 ** (2 + int(math.log(hw_max * 2.0 + 1.0) / config.K_LOG2))
    sizes, s = [], lo
    while s <= hi:
        sizes.append(s)
        s *= 2
    return sizes


def _refine_all(y, fs_t, positions, cands, f0_floor, f0_ceil, sizes,
                fs_static, chunk=2048):
    """Refine every (frame, candidate) pair, bucketed by fft size and
    chunked along the flattened pair axis."""
    n_frames, n_slots = cands.shape
    flat_f0 = cands.reshape(-1)
    flat_pos = jnp.broadcast_to(positions[:, None],
                                (n_frames, n_slots)).reshape(-1)
    n = flat_f0.shape[0]
    pad = (-n) % chunk
    flat_f0 = jnp.concatenate([flat_f0, jnp.zeros(pad, flat_f0.dtype)])
    flat_pos = jnp.concatenate([flat_pos, jnp.zeros(pad, flat_pos.dtype)])

    usable = flat_f0 > 0.0
    f0_safe = jnp.where(usable, flat_f0, 100.0)

    if flat_f0.dtype == jnp.float64:
        # Golden path: bucketed full FFTs, bit-matching the reference.
        hw = (1.5 * fs_t / f0_safe + 1.0).astype(jnp.int32)
        pair_fft = 2 ** (2 + jnp.floor(
            jnp.log(hw * 2.0 + 1.0) / config.K_LOG2).astype(jnp.int32))

        refined = jnp.zeros_like(flat_f0)
        scores = jnp.zeros_like(flat_f0)
        for fft_size in sizes:
            def one_chunk(args, fft_size=fft_size):
                p, f = args
                return jax.vmap(lambda pp, ff: _refine_pair(
                    y, fs_t, fft_size, fft_size, pp, ff, f0_floor,
                    f0_ceil))(p, f)

            r, s = jax.lax.map(one_chunk,
                               (flat_pos.reshape(-1, chunk),
                                f0_safe.reshape(-1, chunk)))
            sel = pair_fft == fft_size
            refined = jnp.where(sel, r.reshape(-1), refined)
            scores = jnp.where(sel, s.reshape(-1), scores)
    else:
        # TPU path: direct 6-bin DFT on a frame-centered grid, one
        # waveform slice per FRAME shared by its candidates, no buckets.
        # Candidate f0 can undershoot f0_floor by the x0.9 channel
        # widening plus the +-10% acceptance band.
        #
        # Adaptive slot count: only ~7*(max channel runs) of the
        # n_slots = round(channels/10)*7 capacity hold real candidates
        # (~16-25% for speech).  Compact valid slots to the front of
        # each frame (stable sort) and refine slot-chunks with a
        # while_loop that stops once every valid slot is covered —
        # bitwise-identical results, typically ~3x less work.
        hw_max = int(1.5 * fs_static / (f0_floor * 0.9 * 0.9) + 1.0) + 1
        W = 2 * hw_max + 1
        f0_raw = flat_f0[: n_frames * n_slots].reshape(n_frames, n_slots)
        invalid = f0_raw <= 0.0
        f0_filled = jnp.where(invalid, 100.0, f0_raw)
        # Valid slots are structurally bounded (overlap fills slots
        # s < 7*C only), so chunking in ORIGINAL slot order covers the
        # same work as front-compaction without its two argsorts and
        # four per-lane take_along_axis gathers.

        # Frame-shared segments, computed once and pre-split into
        # plus/reversed-minus halves (the per-candidate fold then needs
        # no rev — see _refine_frame_direct).  The window time bases are
        # rebuilt inside the kernel from c0/positions scalars.
        c0 = matlab_round(positions * fs_t + 0.001)
        # One row-gather for all frames' windows (the vmapped
        # dynamic_slice lowers to a ~10 ms sequential while-of-slices).
        segs = common.window_slice_table(
            y, c0.astype(jnp.int32) - hw_max - 1, W)
        segs_p, segs_m = segs[:, hw_max:], segs[:, hw_max::-1]

        sc = 1
        s_pad = (-n_slots) % sc
        f0_filled = jnp.concatenate(
            [f0_filled, jnp.full((n_frames, s_pad), 100.0, y.dtype)], 1)
        n_chunks = (n_slots + s_pad) // sc

        # Slot-major accumulators: a trailing-axis dynamic_update_slice
        # on (F, S) rewrites every (8,128) tile of the whole array each
        # trip (the slot axis lives inside the 128-lane tile), turning
        # the loop bandwidth-bound (~2.6 GB accessed at sc=4).  With
        # (S, F) layout each trip reads/writes one sc-row band (~25 KB),
        # so only the refine compute itself streams.  Transposes happen
        # once outside the loop; values are bit-identical.
        f0_t = f0_filled.T  # (S+pad, F)

        # Tiered per-slot chunking: per-pair refine cost is O(window)
        # and hw = 1.5 fs/f0 + 1.  sc=1 measured fastest (28 -> 19 ms
        # combined at sc=4 -> 1 on the fixture): smaller chunks fit
        # VMEM (sc=8 regressed to 39 ms) and give each slot its own
        # window tier — a single low-f0 slot no longer forces chunk
        # neighbors wide.  Slots with no valid candidate are skipped.
        inv_p = jnp.concatenate(
            [invalid, jnp.ones((n_frames, s_pad), bool)], 1)
        valid_m = (~inv_p).reshape(n_frames, n_chunks, sc)
        hw_all = (1.5 * fs_t / f0_filled + 1.0).astype(
            jnp.int32).reshape(n_frames, n_chunks, sc)
        chunk_hw = jnp.max(jnp.where(valid_m, hw_all, 0), axis=(0, 2))
        chunk_any = jnp.any(valid_m, axis=(0, 2))
        cidx = jnp.arange(n_chunks)
        # Tier ladder (hw_max, hw_max/2, hw_max/4, ...): the while trip
        # count is one per valid slot REGARDLESS of tiering (sc=1), so
        # finer tiers only shrink each iteration's window width toward
        # the slot's true hw (folds beyond hw are exact zeros — only
        # the f32 reduction-tree order differs between tiers).
        tiers = [hw_max]
        while tiers[-1] >= 48:
            tiers.append(tiers[-1] // 2)

        def make_body(order, hw_kernel, sp, sm):
            def body(carry):
                i, r_acc, s_acc = carry
                ci = order[i]
                fchunk = jax.lax.dynamic_slice(
                    f0_t, (ci * sc, 0), (sc, n_frames)).T
                r, sco = jax.vmap(
                    lambda spr, smr, cf, pf, frow: jax.vmap(
                        lambda ff: _refine_frame_direct(
                            spr, smr, cf, pf, fs_t, hw_kernel, ff,
                            f0_floor, f0_ceil))(frow)
                )(sp, sm, c0, positions, fchunk)
                r_acc = jax.lax.dynamic_update_slice(
                    r_acc, r.T, (ci * sc, 0))
                s_acc = jax.lax.dynamic_update_slice(
                    s_acc, sco.T, (ci * sc, 0))
                return i + 1, r_acc, s_acc
            return body

        zeros = jnp.zeros((n_slots + s_pad, n_frames), y.dtype)
        refined, scores = zeros, zeros
        for k, hw_k in enumerate(tiers):
            lo = tiers[k + 1] if k + 1 < len(tiers) else 0
            sel = chunk_any & (chunk_hw > lo)
            if k > 0:
                sel &= chunk_hw <= hw_k
            order_k = jnp.argsort(jnp.where(sel, cidx, BIG))
            n_k = jnp.sum(sel)
            _, refined, scores = jax.lax.while_loop(
                lambda c, n_k=n_k: c[0] < n_k,
                make_body(order_k, hw_k,
                          segs_p[:, : hw_k + 1], segs_m[:, : hw_k + 1]),
                (0, refined, scores))
        refined = refined.T
        scores = scores.T
        return (jnp.where(~invalid, refined[:, :n_slots], 0.0),
                jnp.where(~invalid, scores[:, :n_slots], 0.0))

    refined = jnp.where(usable, refined, 0.0)[:n]
    scores = jnp.where(usable, scores, 0.0)[:n]
    return refined.reshape(n_frames, n_slots), scores.reshape(n_frames,
                                                              n_slots)


def _remove_unreliable(cands, scores):
    """Zero candidates with no close neighbor in the adjacent frames
    (src/harvest.cpp:652-688)."""
    ref = cands  # snapshot semantics: C++ compares against a pre-copy
    nxt = jnp.concatenate([ref[1:], ref[-1:]])
    prv = jnp.concatenate([ref[:1], ref[:-1]])

    def min_err(a, b):
        # min over b's candidates of |a - b_j| / a, capped at 1.0
        e = jnp.abs(a[:, :, None] - b[:, None, :]) / a[:, :, None]
        return jnp.minimum(jnp.min(e, axis=-1), 1.0)

    e1 = min_err(ref, nxt)
    e2 = min_err(ref, prv)
    bad = jnp.minimum(e1, e2) > 0.05
    n_frames = cands.shape[0]
    interior = ((jnp.arange(n_frames) > 0)
                & (jnp.arange(n_frames) < n_frames - 1))[:, None]
    kill = bad & interior & (ref != 0.0)
    return (jnp.where(kill, 0.0, cands), jnp.where(kill, 0.0, scores))


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil",
                                              "channels_in_octave", "speed"))
def _harvest_device_stage(x, fs_t, *, fs, f0_floor, f0_ceil,
                          channels_in_octave, speed):
    """Stages A+B+C-prune on device.  Always 1 ms frame period."""
    dtype = x.dtype
    x_length = x.shape[0]
    adj_floor = f0_floor * 0.9
    adj_ceil = f0_ceil * 1.1
    n_channels = 1 + int(math.log(adj_ceil / adj_floor)
                         / config.K_LOG2 * channels_in_octave)
    boundaries = adj_floor * 2.0 ** (
        (np.arange(n_channels) + 1) / channels_in_octave)

    decimation_ratio = max(min(speed, 12), 1)
    y_length = int(math.ceil(x_length / decimation_ratio))
    actual_fs = fs / decimation_ratio
    fft_size = get_suitable_fft_size(
        y_length + 5 + 2 * int(2.0 * actual_fs / boundaries[0]))

    y, y_spectrum = _waveform_and_spectrum(x, y_length, fft_size,
                                           decimation_ratio)

    f0_length = config.get_samples_for_harvest(fs, x_length, 1.0)
    positions = jnp.arange(f0_length, dtype=dtype) / 1000.0

    if dtype == jnp.float64:
        raw = jax.lax.map(
            lambda b: _channel_candidates(b, y_spectrum, y_length,
                                          jnp.asarray(actual_fs, dtype),
                                          fft_size, positions, f0_floor,
                                          f0_ceil, dtype),
            jnp.asarray(boundaries, dtype), batch_size=32)
    else:
        # Static frame-grid sample positions: t_f * fs in (s, s+1].
        tf_np = np.arange(f0_length) / 1000.0 * actual_fs
        frame_samples = np.clip(np.ceil(tf_np).astype(np.int64) - 1, 0,
                                y_length - 1)
        block_index, block_mask = zerocross.frame_block_layout(
            frame_samples, y_length)
        raw = _all_channel_candidates_fast(
            jnp.asarray(boundaries, dtype), y_spectrum, y_length,
            actual_fs, fft_size, positions, f0_floor, f0_ceil, dtype,
            block_index, block_mask, jnp.asarray(tf_np, dtype))

    max_candidates = int(round(n_channels / 10.0)) * 7
    cands0, n_cands = _detect_official_candidates(raw, max_candidates)
    cands = _overlap_candidates(cands0, n_cands, max_candidates)

    fs_dec = jnp.asarray(actual_fs, dtype)
    sizes = _refine_buckets(actual_fs, f0_floor, f0_ceil)
    refined, scores = _refine_all(y, fs_dec, positions, cands, f0_floor,
                                  f0_ceil, sizes, actual_fs)
    return _remove_unreliable(refined, scores)


@functools.partial(jax.jit, static_argnames=("fs", "frame_period",
                                              "f0_floor", "f0_ceil"))
def _harvest_impl(x, *, fs, frame_period, f0_floor, f0_ceil):
    """Full Harvest on device (reference src/harvest.cpp:1223-1255):
    1 ms-internal analysis, contour fix + smoothing, then nearest-
    neighbor resample to the requested frame period."""
    from .harvest_contour import fix_and_smooth

    dtype = x.dtype
    x_length = x.shape[0]
    dimension_ratio = int(round(fs / 8000.0))
    cands, scores = _harvest_device_stage(
        x, jnp.asarray(float(fs), dtype), fs=fs, f0_floor=f0_floor,
        f0_ceil=f0_ceil, channels_in_octave=40.0, speed=dimension_ratio)
    basic_f0 = fix_and_smooth(cands, scores)

    f0_length = config.get_samples_for_harvest(fs, x_length, frame_period)
    # (i * frame_period) / 1000.0 as a host constant — see dio.py: XLA
    # folds the traced chain into *0.005, 1 ulp off the reference
    # (src/harvest.cpp:1248), which flips .5-rounding at fs=44100.
    temporal_positions = jnp.asarray(
        np.arange(f0_length, dtype=np.float64) * frame_period / 1000.0,
        dtype)
    if frame_period == 1.0:
        f0 = basic_f0[:f0_length]
    else:
        # matlab_round (half away from zero), not jnp.round (half to
        # even): fractional periods like 2.5 ms hit exact x.5 positions
        # (src/harvest.cpp:1250).
        idx = jnp.minimum(basic_f0.shape[0] - 1,
                          matlab_round(temporal_positions * 1000.0)
                          .astype(jnp.int32))
        f0 = basic_f0[idx]
    return temporal_positions, f0


def harvest(x, fs, option=None):
    """Harvest F0 estimation (reference src/harvest.cpp:1223-1255).

    Returns (temporal_positions, f0) at option.frame_period ms.
    """
    option = option or config.HarvestOption()
    x = jnp.asarray(x)
    return _harvest_impl(x, fs=fs, frame_period=option.frame_period,
                         f0_floor=option.f0_floor, f0_ceil=option.f0_ceil)
