"""Shared DSP blocks: windows, spectral smoothing, minimum phase.

Fixed-shape, vmappable re-implementations of the reference's common.cpp.
Where the C++ allocates arrays whose length depends on runtime values
(e.g. LinearSmoothing's mirror boundary), we use a static maximum extent;
the result is provably identical because only integral *differences* are
consumed (see linear_smoothing below).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fftpack
from .matlab import interp1q

PI = 3.1415926535897932384
EPS = 2.2204460492503131e-16
SAFE_GUARD_MINIMUM = 1e-12


def get_suitable_fft_size(n):
    """Next power of two (reference src/common.cpp:51-54)."""
    return int(2 ** (int(math.log(n) / math.log(2.0)) + 1))


def nuttall_window(n, total=None, dtype=jnp.float64):
    """Nuttall window of length n (src/common.cpp:113-121).

    If ``total`` is given the result is zero-padded to that length.
    ``n`` may be a static python int; for traced lengths use
    nuttall_window_masked.
    """
    i = jnp.arange(n if total is None else total, dtype=dtype)
    t = i / (n - 1.0)
    w = (0.355768 - 0.487396 * jnp.cos(2 * PI * t)
         + 0.144232 * jnp.cos(4 * PI * t) - 0.012604 * jnp.cos(6 * PI * t))
    if total is not None:
        w = jnp.where(i < n, w, 0.0)
    return w


def nuttall_window_masked(n, total, dtype=jnp.float64):
    """Nuttall window with traced length ``n``, padded to static ``total``."""
    i = jnp.arange(total, dtype=dtype)
    t = i / (n - 1.0)
    w = (0.355768 - 0.487396 * jnp.cos(2 * PI * t)
         + 0.144232 * jnp.cos(4 * PI * t) - 0.012604 * jnp.cos(6 * PI * t))
    return jnp.where(i < n, w, 0.0)


@functools.lru_cache(maxsize=None)
def _multi_window(max_len):
    """(N,)-buffer x (F,)-starts -> (F, max_len) contiguous windows, with
    a custom batching rule that keeps the TPU fast path alive under
    nested vmaps.

    vmap(dynamic_slice) with per-lane starts into a SHARED buffer lowers
    fast; once an outer vmap batches the buffer too, XLA degrades to a
    sequential while-of-slices (~4 ms per window family in D4C).  The
    rule re-flattens a batched buffer into one shared 1D buffer with
    absolute starts and re-enters this same function, so any vmap depth
    resolves to the shared-buffer form.  Starts must be pre-clamped by
    the caller to [0, N - max_len] per row (window_slice does), so the
    flattened slice can never cross row boundaries."""

    @jax.custom_batching.custom_vmap
    def g(xp, starts):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(xp, (s,), (max_len,)))(starts)

    @g.def_vmap
    def g_vmap(axis_size, in_batched, xp, starts):
        xp_b, st_b = in_batched
        if not st_b:
            starts = jnp.broadcast_to(starts[None],
                                      (axis_size,) + starts.shape)
        n_win = starts.shape[-1]
        if not xp_b:
            out = g(xp, starts.reshape(-1))
        else:
            n = xp.shape[-1]
            offs = (jnp.arange(axis_size, dtype=starts.dtype) * n)[:, None]
            out = g(xp.reshape(-1), (starts + offs).reshape(-1))
        return out.reshape((axis_size, n_win, max_len)), True

    return g


def window_slice_table(x, starts, max_len):
    """Bit-identical to ``vmap(window_slice)`` over many starts, but as
    ONE wide row gather instead of a sequential while-of-dynamic-slices.

    Decompose each start s = 8q + r: an overlapping stride-8 row table
    T[k, j] = xp[8k + j] (built from ~max_len/8 static contiguous
    slices) turns the window read into a row gather T[q] plus an 8-way
    select over static column shifts.  The while-of-slices the
    vmap(dynamic_slice) fast path lowers to moves ~1.9 GB/s; the row
    gather streams (measured: the harvest refine's 12.7k windows drop
    ~10x).  Memory: the table is ~(len(x)/8)*(max_len+8) floats — use
    only where that blowup (~max_len/8 x) is acceptable.
    """
    return window_table_read(window_table_build(x, max_len), starts)


def window_table_build(x, max_len):
    """Precompute window_slice_table's slab table for ``x`` so many
    read sites (e.g. every iteration of a chunk loop) share ONE build.
    Returns an opaque (table, n, max_len-marker) pack for
    window_table_read.

    The table is assembled hierarchically (radix-8 sliding-slab
    doubling): a flat ~tile/8-operand concatenate lowers as one
    kernel per operand on TPU (~10 ms for a 2048-wide table at B=16);
    the log-depth build keeps the same elements in the same positions
    with ~20 large copies instead.

    Slab width is capped at TILE=1024 samples and wide windows read
    ceil(max_len/TILE) row-gathers instead: table memory and build
    traffic scale with n*TILE/8, not n*max_len/8 (a 4096 window over
    48 kHz audio would otherwise materialize ~86 MB per lane)."""
    n = x.shape[0]
    tile = min(1024, -(-max_len // 8) * 8)
    n_slab = -(-(tile + 8) // 8)
    # rows must cover q for s up to n + max_len plus (tiles-1)*tile
    # sub-read offsets — i.e. up to n + 2*max_len.
    n_rows = (n + 2 * max_len) // 8 + 2
    radices = []
    w = 1
    while w < n_slab:
        r = min(8, -(-n_slab // w))
        radices.append(r)
        w *= r
    pad_l = jnp.full((max_len,), x[0], x.dtype)
    pad_r = jnp.full((max_len,), x[-1], x.dtype)
    xp = jnp.concatenate([pad_l, x, pad_r])
    need = 8 * (n_rows + w - 1)
    xp = jnp.concatenate(
        [xp, jnp.zeros(max(0, need - xp.shape[0]), x.dtype)])[:need]
    # invariant: t[k, 8c + j] == xp[8*(k + c) + j] for all c < width
    t = xp.reshape(-1, 8)
    width = 1
    for r in radices:
        nr = t.shape[0] - width * (r - 1)
        t = jnp.concatenate([t[width * i: width * i + nr]
                             for i in range(r)], axis=1)
        width *= r
    table = t[:n_rows, : 8 * n_slab]
    return table, n, jnp.zeros((max_len, 0), jnp.int8), tile


def window_table_read(pack, starts):
    """Read (len(starts), max_len) edge-clamped windows from a built
    table: one row gather + 8-way static-shift select per tile.
    Bit-identical to vmap(window_slice)."""
    table, n, marker, tile = pack
    max_len = marker.shape[0]
    F = starts.shape[0]
    s = jnp.clip(starts.astype(jnp.int32) + max_len, 0, n + max_len)
    r = s % 8                                # tile is a multiple of 8
    outs = []
    for t0 in range(0, max_len, tile):
        tw = min(tile, max_len - t0)
        g = table[(s + t0) // 8]             # one row gather (F, .)
        out = jnp.zeros((F, tw), table.dtype)
        for rr in range(8):
            shifted = jax.lax.slice(g, (0, rr), (F, rr + tw))
            out = out + jnp.where((r == rr)[:, None], shifted, 0.0)
        outs.append(out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def window_slice(x, start, max_len):
    """Edge-clamped contiguous window read: equals
    ``x[clip(start + arange(max_len), 0, len(x)-1)]`` bit-for-bit, but as
    a dynamic_slice of an edge-padded copy.  On TPU an arbitrary-index
    gather of (frames, max_len) costs ~30x a contiguous slice; every
    F0-adaptive analysis window in the pipeline is contiguous by
    construction, so they all take this path (vmap over ``start``;
    _multi_window keeps it fast under a further batch vmap).
    """
    pad_l = jnp.full((max_len,), x[0], x.dtype)
    pad_r = jnp.full((max_len,), x[-1], x.dtype)
    xp = jnp.concatenate([pad_l, x, pad_r])
    s = jnp.clip(start.astype(jnp.int32) + max_len, 0,
                 x.shape[0] + max_len)
    return _multi_window(max_len)(xp, s[None])[0]


def dc_correction(spectrum, f0, fs, fft_size, b_cap=None):
    """Mirror the spectrum below f0 back onto the 0..f0 band
    (src/common.cpp:56-75).  ``spectrum`` has fft_size//2+1 bins.

    The C++ builds a variable-length replica (upper_limit depends on f0);
    here we compute the replica over a static prefix and mask.  ``b_cap``
    statically bounds that prefix (any value >= upper_limit-1 for every
    f0 seen is exact; callers clamp f0 <= 1200 Hz): the interp gather is
    the expensive op on TPU, and only the first ~f0/delta bins are used.
    """
    nbins = fft_size // 2 + 1
    dtype = spectrum.dtype
    delta = jnp.asarray(fs, dtype) / fft_size
    upper_limit = 2 + (f0 * fft_size / fs).astype(jnp.int32)
    n_rep = nbins if b_cap is None else min(b_cap, nbins)
    k = jnp.arange(n_rep, dtype=dtype)
    # interp1Q(f0, -delta, input, ...) at queries k*delta, i.e. sample the
    # spectrum on the *descending* axis starting at f0.
    replica = interp1q(f0, -delta, spectrum, k * delta)
    if n_rep < nbins:
        replica = jnp.concatenate(
            [replica, jnp.zeros(spectrum.shape[:-1] + (nbins - n_rep,),
                                dtype)], axis=-1)
    mask = jnp.arange(nbins) < (upper_limit - 1)
    return jnp.where(mask, spectrum + replica, spectrum)


def dc_correction_batched(spectra, f0s, fs, fft_size, b_cap):
    """Batched float32 fast path of dc_correction over (B, nbins) rows.

    The interp1Q queries k*delta on the descending axis starting at f0
    all share one fractional part: with fb = f0*fft_size/fs, i0 =
    trunc(fb), frac = fb - i0, the replica is
        replica[k] = S[i0-k] + (S[i0-k+1] - S[i0-k]) * frac,
    i.e. a REVERSED CONTIGUOUS window of S ending at i0+1.  Per-frame
    that window is an arbitrary gather (the slow primitive — ~2.4 ms
    per call at D4C's sizes); batched, it is one vmapped dynamic_slice
    with per-lane starts into the SHARED flattened batch (the fast
    path).  Bins k > i0 are masked to the input, exactly like
    dc_correction's upper_limit mask, so the zero padding read below
    bin 0 never reaches the output.  float64 callers keep dc_correction
    (bit-identical interp1Q arithmetic order for golden parity).
    """
    B, nbins = spectra.shape
    dtype = spectra.dtype
    n_rep = min(b_cap, nbins)
    # Same arithmetic as interp1q's t at k=0: delta = fs/fft_size, then
    # f0/delta (one rounding each, matching (0*delta - f0)/(-delta)).
    fb = f0s / (fs / jnp.asarray(fft_size, dtype))
    i0 = jnp.trunc(fb).astype(jnp.int32)
    frac = fb - i0.astype(dtype)
    stride = nbins + n_rep
    sp = jnp.concatenate(
        [jnp.zeros((B, n_rep), dtype), spectra], axis=1).reshape(-1)
    # i0+1 <= nbins-1 always holds (f0 well below Nyquist); the clip only
    # pins the _multi_window row invariant, it never engages.
    off = jnp.clip(i0 + 1, 0, nbins - 1)
    starts = jnp.arange(B) * stride + off     # = idx of S[i0-(n_rep-1)]
    # _multi_window (not a plain vmapped dynamic_slice): under the outer
    # utterance vmap the plain form sees a per-lane buffer and degrades
    # to a true gather (~2 ms/call in D4C + CheapTrick); the custom
    # batching rule re-flattens to the shared-buffer fast path.
    win = _multi_window(n_rep + 1)(sp, starts)
    y0 = win[:, n_rep - 1::-1]          # S[i0-k], k = 0..n_rep-1
    y1 = win[:, n_rep:0:-1]             # S[i0-k+1]
    replica = y0 + (y1 - y0) * frac[:, None]
    if n_rep < nbins:
        replica = jnp.concatenate(
            [replica, jnp.zeros((B, nbins - n_rep), dtype)], axis=1)
    mask = jnp.arange(nbins)[None, :] < (i0 + 1)[:, None]
    return jnp.where(mask, spectra + replica, spectra)


def _mirror_extend(spectrum, half, b_max):
    """Spectrum on positions p = -b_max .. half+b_max by edge reflection
    (reference src/common.cpp:27-46).  mirror(p) = S[|p|] for p<=0 (no repeat
    of bin 0's neighbourhood beyond reflection), S[p] inside, S[2*half-p]
    above.

    Built from flip+concat rather than a static index gather: XLA lowers
    the reversed prefix/suffix of the gather to tiny standalone gathers
    with ~0.4 ms fixed cost each on TPU, while `rev` is a native fast op.
    (Requires b_max <= half, which every caller satisfies: b_max tracks a
    smoothing width well below fs/2.)"""
    assert b_max <= half, (b_max, half)
    pre = jnp.flip(spectrum[..., 1:b_max + 1], axis=-1)
    suf = jnp.flip(spectrum[..., half - b_max:half], axis=-1)
    return jnp.concatenate([pre, spectrum, suf], axis=-1)


def linear_smoothing(spectrum, width, fs, fft_size, b_max):
    """Rectangular smoothing of width ``width`` Hz (src/common.cpp:77-111).

    The C++ uses boundary = int(width*fft/fs)+1 and a mirror of that size;
    we mirror with a static ``b_max`` >= any runtime boundary.  Because the
    output is (high-low)/width of a cumulative integral, the extra constant
    prefix cancels and results match the reference bit-for-bit in spirit
    (and to <1e-12 numerically — golden-tested).

    float64 follows the reference's cumulative-integral formulation (same
    rounding as the C++ running sum).  float32 cannot: the cumsum
    difference cancels catastrophically (negative power -> NaN after
    log), so it evaluates the algebraically identical *local* windowed
    sum over at most b_max+1 bins.

    ``width`` may be a traced scalar (per-frame).  b_max must satisfy
    b_max >= int(width*fft_size/fs) + 1 for every width used.
    """
    half = fft_size // 2
    dtype = spectrum.dtype
    delta = jnp.asarray(fs, dtype) / fft_size
    mirrored = _mirror_extend(spectrum, half, b_max)
    origin = -(b_max - 0.5) * delta
    freq = jnp.arange(half + 1, dtype=dtype) * delta

    if dtype == jnp.float64:
        segment = jnp.cumsum(mirrored * delta, axis=-1)
        low = interp1q(origin, delta, segment, freq - width / 2.0)
        high = interp1q(origin, delta, segment, freq + width / 2.0)
        return (high - low) / width

    # Local form: integral over [f - w/2, f + w/2] of the mirrored
    # staircase.  Because queries sit on the same Delta grid as the bins,
    # the fractional end weights are constant across output bins and the
    # whole operation is a box convolution: out[i] = sum_r w(r) *
    # mirrored[i + k_l+1 + r], w(r) = [0<=r<span] - fl*[r==0] + fh*[r==span].
    # A dynamic_slice whose start depends on the (vmapped) frame lowers to
    # a general gather — the single most expensive lowering on TPU.
    # Re-indexing over the STATIC shift j = k_l+1+r keeps every slice
    # static and moves the per-frame dependence into a scalar weight.
    s_l = (-width / 2.0 - origin) / delta          # t_l at bin 0
    s_h = s_l + width / delta
    k_l = jnp.floor(s_l).astype(jnp.int32)
    k_h = jnp.floor(s_h).astype(jnp.int32)
    fl = s_l - k_l
    fh = s_h - k_h
    span = k_h - k_l                                # <= b_max

    # Two extra trailing mirror bins: max static slice end is
    # half + 2*b_max + 3 while the b_max mirror stops at half + 2*b_max.
    mp = _mirror_extend(spectrum, half, b_max + 2)  # old index j -> mp[j+2]
    total = jnp.zeros(half + 1, dtype)
    for j in range(2 * b_max + 2):
        r = j - k_l - 1
        w = (jnp.where((r >= 0) & (r <= span - 1), 1.0, 0.0)
             - fl * (r == 0) + fh * (r == span))
        total = total + w * jax.lax.slice_in_dim(mp, j + 2, j + half + 3)
    return jnp.maximum(total * delta / width, 0.0)


def minimum_phase_spectrum(log_spectrum, fft_size):
    """Minimum-phase spectrum from a half log-power spectrum
    (src/common.cpp:182-220): mirror -> cepstrum -> fold -> FFT -> exp.

    log_spectrum: (..., fft_size//2+1) real.  Returns complex
    (..., fft_size//2+1).
    """
    half = fft_size // 2
    mirrored = jnp.concatenate(
        [log_spectrum, log_spectrum[..., half - 1:0:-1]], axis=-1)
    cep = jnp.fft.rfft(mirrored, axis=-1)
    k = jnp.arange(half + 1)
    scale = jnp.where((k > 0) & (k < half), 2.0, 1.0)
    folded_half = cep * scale
    folded = jnp.concatenate(
        [folded_half,
         jnp.zeros(folded_half.shape[:-1] + (fft_size - half - 1,),
                   folded_half.dtype)], axis=-1)
    spec = jnp.fft.fft(folded, axis=-1)[..., : half + 1] / fft_size
    return jnp.exp(spec.real) * jnp.exp(1j * spec.imag)
