"""Zero-crossing interval extraction (shared by Dio and Harvest).

The reference extracts, per filtered band, four event streams — negative-
going / positive-going zero crossings of the signal and of its derivative
(peaks / dips) — and converts crossing intervals into per-frame F0
candidates via interp1 (reference src/dio.cpp:349-508,
src/harvest.cpp:154-293).

Counts are data dependent; everything here works on fixed-size padded
arrays with validity counts, so it vmaps over bands and batches.
"""

import jax
import jax.numpy as jnp

BIG = jnp.iinfo(jnp.int32).max // 2


def _crossing_pairs(signal, n_valid, fs):
    """Intervals between successive +to- zero crossings of ``signal``
    (reference ZeroCrossingEngine, src/dio.cpp:357-393).

    signal: (L,) padded; only the first ``n_valid`` samples are real.
    Returns (locations, intervals, n_pairs) with locations padded to +inf
    ascending (ready for interp1) and intervals padded with their last
    valid value (harmless under interp1's clamp).
    """
    L = signal.shape[0]
    idx = jnp.arange(L)
    s_next = jnp.roll(signal, -1)
    is_edge = (signal > 0.0) & (s_next <= 0.0) & (idx < n_valid - 1)
    n_edges = jnp.sum(is_edge)

    # Sub-sample crossing position, computed *elementwise* before
    # compaction (the reference gathers signal[e-1]/signal[e] after; an
    # arbitrary gather is ~30x a roll on TPU).  fine_i in (i, i+1] is
    # strictly increasing over edges, so one ascending sort compacts.
    # A +to- crossing needs a sign change, so there are at most L/2
    # events: truncating the compacted list halves every downstream
    # sort/gather with zero information loss.
    fine_all = (idx + 1).astype(signal.dtype) - signal / (s_next - signal)
    cap = L // 2 + 2
    fine = jnp.sort(jnp.where(is_edge, fine_all, jnp.inf))[:cap]

    nxt = jnp.roll(fine, -1)
    intervals = fs / (nxt - fine)
    locations = (fine + nxt) / 2.0 / fs
    n_pairs = jnp.maximum(n_edges - 1, 0)
    valid = jnp.arange(cap) < n_pairs
    locations = jnp.where(valid, locations, jnp.inf)
    intervals = jnp.where(valid, intervals, 0.0)
    return locations, intervals, n_pairs


def four_zero_crossing_streams(filtered, n_valid, fs):
    """The four event streams of GetFourZeroCrossingIntervals
    (src/dio.cpp:402-435): signal, negated signal, and the +/- forward
    difference (peaks and dips).  Returns (4, L) locations / intervals
    and (4,) pair counts."""
    d = jnp.roll(filtered, -1) - filtered  # forward diff, last entry junk
    streams = jnp.stack([filtered, -filtered, d, -d])
    valids = jnp.stack([n_valid, n_valid, n_valid - 1, n_valid - 1])
    return jax.vmap(_crossing_pairs, in_axes=(0, 0, None))(
        streams, valids, jnp.asarray(fs, filtered.dtype))
