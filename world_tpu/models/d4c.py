"""D4C band-aperiodicity estimation, TPU-native.

Reference src/d4c.cpp.  Structure: a LoveTrain VUV/energy gate per frame,
then (for passing frames) a static group delay computed from two offset
Blackman-window centroids and a smoothed power spectrum, from which a
coarse aperiodicity per 3 kHz band is read off via a sorted cumulative
power tail.  The C++ skips unvoiced/failing frames with `continue`; here
every frame computes and the result is masked (select) — the TPU way.

The per-band std::sort becomes jax.lax sort over fft bins; band and frame
axes are vmapped.  RNG consumption order (LoveTrain windows for voiced
frames, then centroid1/centroid2/smoothed windows for passing frames)
matches the reference stream in exact mode.
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from ..ops import common
from ..ops import rng as rng_ops
from ..ops.matlab import interp1, matlab_round

HANNING = 1
BLACKMAN = 2


def _windowed_waveform(x, fs_t, f0, position, window_type,
                       window_length_ratio, max_len, dither, seg=None):
    """F0-adaptive window with mean removal (src/d4c.cpp:21-84).
    Returns (max_len,) padded with zeros; dither scale kSafeGuardD4C.
    ``seg``: the (max_len,) waveform window starting at
    round(position*fs+0.001) - half, pre-read via a shared window
    table (callers hoist the read out of frame vmaps — the per-frame
    vmap(dynamic_slice) lowers to a sequential while-of-gathers inside
    chunk loops); None reads it here."""
    half = matlab_round(window_length_ratio * fs_t / f0 / 2.0)
    win_len = 2 * half + 1
    i = jnp.arange(max_len)
    base = i - half
    in_win = i < win_len
    origin = matlab_round(position * fs_t + 0.001)
    if seg is None:
        seg = common.window_slice(x, origin - half, max_len)
    pos = (2.0 * base.astype(x.dtype) / window_length_ratio) / fs_t
    if window_type == HANNING:
        window = 0.5 * jnp.cos(config.K_PI * pos * f0) + 0.5
    else:
        window = (0.42 + 0.5 * jnp.cos(config.K_PI * pos * f0)
                  + 0.08 * jnp.cos(config.K_PI * pos * f0 * 2))
    window = jnp.where(in_win, window, 0.0)
    waveform = seg * window + dither * config.K_SAFE_GUARD_D4C
    waveform = jnp.where(in_win, waveform, 0.0)
    coeff = jnp.sum(waveform) / jnp.sum(window)
    return jnp.where(in_win, waveform - window * coeff, 0.0), half


def _love_train_frame(x, fs_t, fft_size, boundaries, f0, position, dither,
                      seg=None):
    """Cumulative band-power ratio for VUV detection
    (src/d4c.cpp:227-252)."""
    b0, b1, b2 = boundaries
    waveform, _ = _windowed_waveform(x, fs_t, f0, position, BLACKMAN, 3.0,
                                     fft_size, dither, seg=seg)
    spec = jnp.fft.rfft(waveform)
    power = spec.real**2 + spec.imag**2
    k = jnp.arange(power.shape[0])
    power = jnp.where(k <= b0, 0.0, power)
    cum = jnp.cumsum(power)
    return cum[b1] / cum[b2]


def _centroid(x, fs_t, fft_size, f0, position, dither, seg=None):
    """Energy centroid (src/d4c.cpp:90-120)."""
    waveform, half = _windowed_waveform(x, fs_t, f0, position, BLACKMAN, 4.0,
                                        fft_size, dither, seg=seg)
    # Normalization runs over indices 0..2*round(2fs/f0) == the window.
    power = jnp.sum(waveform**2)
    waveform = waveform / jnp.sqrt(power)
    spec1 = jnp.fft.rfft(waveform)
    ramped = waveform * (jnp.arange(fft_size, dtype=x.dtype) + 1.0)
    spec2 = jnp.fft.rfft(ramped)
    return spec1.real * spec2.real + spec1.imag * spec2.imag


def _coarse_aperiodicity(static_group_delay, fs_static, fft_size, n_bands,
                         window, window_length, dtype):
    """Per-band sorted cumulative power tail of the windowed group delay
    (src/d4c.cpp:194-225).  vmapped over bands; sort via jnp.sort."""
    # static: matlab_round of positive static operands
    boundary = int(fft_size * 8.0 / window_length + 0.5)
    half_window = window_length // 2
    half = fft_size // 2

    if n_bands == 0:
        # fs < 12 kHz has no coarse bands (GetNumberOfAperiodicities —
        # src/d4c.cpp:268-272); the output keeps only the two edges.
        return jnp.zeros((0,), dtype)

    # Band centers depend only on static parameters, so the segment
    # extraction is a STATIC slice per band (a traced dynamic_slice here
    # cost ~4 ms/batch of per-lane slicing on TPU).  Python float is
    # IEEE double, so int(3000.0*(b+1)*fft/fs) reproduces the C++
    # static_cast<int> exactly (src/d4c.cpp:207-208) — unlike the
    # float32 traced division it replaces.
    segs = []
    for band in range(n_bands):
        center = int(config.K_FREQUENCY_INTERVAL * (band + 1)
                     * fft_size / fs_static)
        segs.append(static_group_delay[center - half_window:
                                       center + half_window + 1])
    seg = jnp.stack(segs) * window[None, :]
    spec = jnp.fft.rfft(seg, n=fft_size)
    power = spec.real**2 + spec.imag**2
    total = jnp.sum(power, axis=-1)
    # The reference sorts and reads the cumulative tail
    # (src/d4c.cpp:217-222): cum[half-boundary-1]/cum[half] ==
    # 1 - sum(top boundary+1 values)/total.  Only the SUM of that
    # top-k is needed (k = boundary+1 ~ 30 of fft/2+1 ~ 1000).
    k = power.shape[-1] - (half - int(boundary))
    if dtype == jnp.float64:
        # Golden path: values-only sort (beats top_k, whose TPU
        # lowering is a (values, iota) tuple sort carrying twice the
        # bytes for indices nothing reads).
        top = jnp.sort(power, axis=-1)[:, half - int(boundary):]
        top_sum = jnp.sum(top, axis=-1)
    else:
        # TPU: sorts run ~1.4 GB/s on this chip vs ~100 GB/s for
        # masked reductions, so select the k-th largest by a bitwise
        # binary search instead (power >= 0, so the int32 bit pattern
        # orders like the float).  31 unrolled count passes construct
        # the largest t with count(bits > t) >= k; then the k-th
        # largest is exactly bitcast(t + 1), and duplicates at the
        # boundary contribute the same value whichever copies the sort
        # would have kept — the top-k sum is reproduced exactly (up to
        # summation order).
        bits = jax.lax.bitcast_convert_type(power, jnp.int32)
        t = jnp.zeros(power.shape[:-1], jnp.int32)
        for b in range(30, -1, -1):
            cand = t | (1 << b)
            cnt = jnp.sum((bits > cand[..., None]).astype(jnp.int32),
                          axis=-1)
            t = jnp.where(cnt >= k, cand, t)
        vk_bits = t + 1
        vk = jax.lax.bitcast_convert_type(vk_bits, dtype)
        gt = bits > vk_bits[..., None]
        cnt_gt = jnp.sum(gt.astype(jnp.int32), axis=-1)
        top_sum = (jnp.sum(jnp.where(gt, power, 0.0), axis=-1)
                   + (k - cnt_gt).astype(dtype) * vk)
    return 10.0 * jnp.log10((total - top_sum) / total)


def _d4c_body_chunk(x, fs_t, fs_static, fft_size_d4c, n_bands, window,
                    window_length, f0_cap, b_max, f0s, positions, dithers,
                    wread=None):
    """A chunk of D4CGeneralBody frames (src/d4c.cpp:293-321): coarse
    aperiodicity values per band, before the frequency-axis interp.

    Chunk-level (not per-frame) so the two DC corrections can run as ONE
    batched fast-path call in float32: per-frame they were arbitrary
    gathers (~9.5 ms/batch of the D4C stage); see
    common.dc_correction_batched.  float64 keeps the per-frame interp1Q
    arithmetic for golden parity."""
    dtype = x.dtype
    # Smoothing widths are f0 and f0/2; the static cap bounds the
    # windowed-sum temporaries and is sized from the caller's f0_ceil
    # (default 1200 Hz covers kCeilF0*1.1 — see cheaptrick.f0_cap_for).
    f0s = jnp.minimum(f0s, f0_cap)

    if wread is not None:
        # Hoisted window reads: the chunk's 3 windows/frame in ONE
        # table row-gather (a per-frame vmap(dynamic_slice) inside the
        # chunk while lowers to a sequential while-of-gathers, ~2 ms
        # per window family per step).  Starts replicate
        # _windowed_waveform's origin/half arithmetic bit-for-bit.
        half = matlab_round(4.0 * fs_t / f0s / 2.0)
        starts = jnp.concatenate([
            matlab_round((positions - 0.25 / f0s) * fs_t + 0.001) - half,
            matlab_round((positions + 0.25 / f0s) * fs_t + 0.001) - half,
            matlab_round(positions * fs_t + 0.001) - half])
        fc3 = f0s.shape[0]
        segs3 = wread(starts)
        seg1, seg2, seg3 = (segs3[:fc3], segs3[fc3: 2 * fc3],
                            segs3[2 * fc3:])
    else:
        seg1 = seg2 = seg3 = jnp.zeros((f0s.shape[0], 0), dtype)

    def part1(f0, position, dithers, s1, s2, s3):
        nz = None if wread is None else (s1, s2, s3)
        c1 = _centroid(x, fs_t, fft_size_d4c, f0, position - 0.25 / f0,
                       dithers[0], seg=None if nz is None else s1)
        c2 = _centroid(x, fs_t, fft_size_d4c, f0, position + 0.25 / f0,
                       dithers[1], seg=None if nz is None else s2)
        waveform, _ = _windowed_waveform(
            x, fs_t, f0, position, HANNING, 4.0, fft_size_d4c,
            dithers[2], seg=None if nz is None else s3)
        spec = jnp.fft.rfft(waveform)
        return c1 + c2, spec.real**2 + spec.imag**2

    centroid_raw, power_raw = jax.vmap(part1)(f0s, positions, dithers,
                                              seg1, seg2, seg3)

    if dtype == jnp.float64:
        dc = jax.vmap(lambda s, f: common.dc_correction(
            s, f, fs_t, fft_size_d4c, b_cap=b_max + 2))
        static_centroid = dc(centroid_raw, f0s)
        smoothed = dc(power_raw, f0s)
    else:
        fc = f0s.shape[0]
        both = common.dc_correction_batched(
            jnp.concatenate([centroid_raw, power_raw], axis=0),
            jnp.concatenate([f0s, f0s]), fs_t, fft_size_d4c,
            b_cap=b_max + 2)
        static_centroid, smoothed = both[:fc], both[fc:]

    def part2(static_centroid, smoothed, f0):
        smoothed = common.linear_smoothing(smoothed, f0, fs_t,
                                           fft_size_d4c, b_max)
        # Guard the division for float32: the smoothed power of a
        # silent window can underflow to 0 (float64 never gets tiny).
        smoothed = jnp.maximum(smoothed, jnp.finfo(dtype).tiny * 1e8)
        sgd = static_centroid / smoothed
        sgd = common.linear_smoothing(sgd, f0 / 2.0, fs_t, fft_size_d4c,
                                      b_max)
        sgd = sgd - common.linear_smoothing(sgd, f0, fs_t, fft_size_d4c,
                                            b_max)
        coarse = _coarse_aperiodicity(sgd, fs_static, fft_size_d4c,
                                      n_bands, window, window_length,
                                      dtype)
        return jnp.minimum(0.0, coarse + (f0 - 100.0) / 50.0)

    return jax.vmap(part2)(static_centroid, smoothed, f0s)


@functools.partial(jax.jit, static_argnames=("fs", "fft_size", "threshold",
                                              "rng_mode", "f0_cap"))
def _d4c_impl(x, temporal_positions, f0, fs_t, *, fs, fft_size, threshold,
              rng_mode, f0_cap=config.K_CEIL_F0 * 1.1):
    dtype = x.dtype
    n_frames = f0.shape[0]
    half_out = fft_size // 2

    fft_lt = config.get_fft_size_for_d4c_love_train(fs)
    fft_d4c = config.get_fft_size_for_d4c(fs)
    n_bands = config.get_number_of_aperiodicities(fs)
    import numpy as np
    # LoveTrain cumulative-power boundaries at 100/4000/7900 Hz
    # (src/d4c.cpp:270-272).  For fs < 15.8 kHz the 7900 Hz (and below
    # 8.2 kHz the 4000 Hz) index lands beyond Nyquist: the reference
    # then reads UNINITIALIZED heap memory past the spectrum's end
    # (src/d4c.cpp:246-249 fills only fft/2+1 entries; the cumsum at
    # :246-248 and the ratio at :250 run to boundary2) — observed to
    # fail every frame's VUV gate at fs=8000, leaving ap == 1
    # everywhere.  We clamp to Nyquist instead: the band power above
    # Nyquist is zero by definition, so ratios degrade gracefully
    # (at fs=8000 both bands coincide and every voiced frame passes).
    # Deliberate, documented divergence from reference UB.
    boundaries = tuple(min(int(np.ceil(f * fft_lt / fs)), fft_lt // 2)
                       for f in (100.0, 4000.0, 7900.0))
    window_length = int(config.K_FREQUENCY_INTERVAL * fft_d4c / fs) * 2 + 1
    window = common.nuttall_window(window_length, dtype=dtype)

    voiced = f0 != 0.0
    f0_lt = jnp.maximum(f0, 40.0)
    f0_body = jnp.maximum(f0, config.K_FLOOR_F0_D4C)

    # ---- RNG draws, matching the reference's sequential consumption ----
    # Counts use the same fp expressions as the window halves so draw
    # consumption stays aligned with the reference stream.
    lt_counts = jnp.where(voiced,
                          2 * matlab_round(3.0 * fs_t / f0_lt / 2.0) + 1, 0)
    max_lt = 2 * int(round(1.5 * fs / 40.0)) + 2
    body_win = 2 * matlab_round(4.0 * fs_t / f0_body / 2.0) + 1
    max_body = 2 * int(round(2.0 * fs / config.K_FLOOR_F0_D4C)) + 2
    if rng_mode == "exact":
        lt_offsets = jnp.cumsum(lt_counts) - lt_counts
        lt_dither = rng_ops.randn_blocks_at(lt_offsets, max_lt).astype(dtype)
    elif rng_mode == "fast":
        key = jax.random.PRNGKey(1)
        lt_dither = jax.random.normal(key, (n_frames, max_lt), dtype)
    else:
        lt_dither = jnp.zeros((n_frames, max_lt), dtype)

    # Shared window tables: one row-gather read per window family
    # replaces per-frame vmap(dynamic_slice) (sequential while-gathers
    # on TPU, ~2 ms each inside the chunk loop).  fft_lt and fft_d4c
    # coincide at most rates; build each distinct size once.
    packs = {m: common.window_table_build(x, m)
             for m in {fft_lt, fft_d4c}}

    half_lt = matlab_round(3.0 * fs_t / f0_lt / 2.0)
    lt_starts = matlab_round(temporal_positions * fs_t + 0.001) - half_lt
    lt_segs = common.window_table_read(packs[fft_lt], lt_starts)

    pad = jnp.zeros((n_frames, fft_lt - max_lt), dtype)
    ap0 = jax.vmap(lambda f, p, d, s: _love_train_frame(
        x, fs_t, fft_lt, boundaries, f, p, d, seg=s))(
            f0_lt, temporal_positions,
            jnp.concatenate([lt_dither, pad], 1), lt_segs)
    ap0 = jnp.where(voiced, ap0, 0.0)

    passing = voiced & (ap0 > threshold)

    if rng_mode == "exact":
        body_counts = jnp.where(passing, 3 * body_win, 0)
        total_lt = jnp.sum(lt_counts)
        body_offsets = total_lt + jnp.cumsum(body_counts) - body_counts
        flat_offsets = (body_offsets[:, None]
                        + body_win[:, None] * jnp.arange(3)[None, :])
        body_dither = rng_ops.randn_blocks_at(
            flat_offsets.reshape(-1), max_body).astype(dtype)
        body_dither = body_dither.reshape(n_frames, 3, max_body)
    elif rng_mode == "fast":
        key = jax.random.PRNGKey(2)
        body_dither = jax.random.normal(key, (n_frames, 3, max_body), dtype)
    else:
        body_dither = jnp.zeros((n_frames, 3, max_body), dtype)

    padb = jnp.zeros((n_frames, 3, fft_d4c - max_body), dtype)
    b_max = int(f0_cap * fft_d4c / fs) + 2
    dither_full = jnp.concatenate([body_dither, padb], 2)

    # The reference runs D4CGeneralBody only for frames passing the
    # LoveTrain gate (src/d4c.cpp:385-395).  Compact passing frames to
    # the front and process only enough chunks to cover them — the
    # masked-out remainder keeps its default-aperiodicity row anyway.
    order = jnp.argsort(~passing, stable=True)
    n_pass = jnp.sum(passing)
    fc = min(16, n_frames)
    f_pad = (-n_frames) % fc
    order_p = jnp.concatenate([order, jnp.zeros(f_pad, order.dtype)])
    needed = (n_pass + fc - 1) // fc

    wread = functools.partial(common.window_table_read, packs[fft_d4c])

    def body_fn(carry):
        i, acc = carry
        idxs = jax.lax.dynamic_slice(order_p, (i * fc,), (fc,))
        cc = _d4c_body_chunk(
            x, fs_t, fs, fft_d4c, n_bands, window, window_length,
            jnp.asarray(f0_cap, dtype), b_max,
            f0_body[idxs], temporal_positions[idxs], dither_full[idxs],
            wread=wread)
        return i + 1, jax.lax.dynamic_update_slice(acc, cc, (i * fc, 0))

    acc0 = jnp.zeros((n_frames + f_pad, n_bands), dtype)
    _, compacted = jax.lax.while_loop(lambda c: c[0] < needed, body_fn,
                                      (0, acc0))
    inv = jnp.argsort(order, stable=True)
    coarse = compacted[:n_frames][inv]

    # Assemble [-60, coarse..., -eps] and interpolate onto the output axis
    # (src/d4c.cpp:330-338,372-394).
    edges = jnp.concatenate(
        [jnp.full((n_frames, 1), -60.0, dtype), coarse,
         jnp.full((n_frames, 1), -config.K_MY_SAFE_GUARD_MINIMUM, dtype)], 1)
    coarse_axis = jnp.concatenate(
        [jnp.arange(n_bands + 1, dtype=dtype) * config.K_FREQUENCY_INTERVAL,
         jnp.asarray([fs / 2.0], dtype)])
    freq_axis = jnp.arange(half_out + 1, dtype=dtype) * fs_t / fft_size
    ap = jax.vmap(lambda e: interp1(coarse_axis, e, freq_axis))(edges)
    ap = 10.0 ** (ap / 20.0)

    default = 1.0 - config.K_MY_SAFE_GUARD_MINIMUM
    return jnp.where(passing[:, None], ap, default), ap0


def d4c(x, fs, temporal_positions, f0, fft_size=None, option=None,
        rng_mode="exact", f0_ceil=None):
    """D4C aperiodicity estimation (reference src/d4c.cpp:342-403).

    fft_size is the *output* spectral resolution (CheapTrick's fft_size).
    ``f0_ceil``: estimator ceiling if above the default (see cheap_trick).
    Returns aperiodicity of shape (f0_length, fft_size//2 + 1).
    """
    from .cheaptrick import f0_cap_for

    option = option or config.D4COption()
    if fft_size is None:
        fft_size = config.get_fft_size_for_cheaptrick(fs)
    x = jnp.asarray(x)
    ap, _ = _d4c_impl(x, jnp.asarray(temporal_positions, x.dtype),
                      jnp.asarray(f0, x.dtype),
                      jnp.asarray(float(fs), x.dtype), fs=fs,
                      fft_size=fft_size, threshold=option.threshold,
                      rng_mode=rng_mode, f0_cap=f0_cap_for(f0_ceil))
    return ap
