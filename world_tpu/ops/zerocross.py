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


def _last_valid_scan(values, flags, reverse=False):
    """Propagate the last (or next) flagged value along the array."""
    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    v, _ = jax.lax.associative_scan(combine, (values, flags),
                                    reverse=reverse)
    return v


def _crossing_states(signal, n_valid, fill):
    """Per-sample crossing neighborhoods, no sorts and no compaction.

    For each sample position i: the last four crossing sub-sample
    positions at-or-before i (q1 most recent; ``fill`` = -inf padding)
    and the next three strictly after (r1 first).  Each is one chained
    'last/next flagged value' associative scan — the crossing list never
    needs compacting because its order IS sample order.
    """
    L = signal.shape[0]
    dtype = signal.dtype
    idx = jnp.arange(L)
    s_next = jnp.roll(signal, -1)
    is_edge = (signal > 0.0) & (s_next <= 0.0) & (idx < n_valid - 1)
    fine = (idx + 1).astype(dtype) - signal / (s_next - signal)
    neg = jnp.full(L, -fill, dtype)
    pos = jnp.full(L, fill, dtype)

    def shift_r(a):
        return jnp.concatenate([neg[:1], a[:-1]])

    def shift_l(a):
        return jnp.concatenate([a[1:], pos[:1]])

    q1 = _last_valid_scan(jnp.where(is_edge, fine, -fill), is_edge)
    q2 = _last_valid_scan(jnp.where(is_edge, shift_r(q1), -fill), is_edge)
    q3 = _last_valid_scan(jnp.where(is_edge, shift_r(q2), -fill), is_edge)
    q4 = _last_valid_scan(jnp.where(is_edge, shift_r(q3), -fill), is_edge)

    r1i = _last_valid_scan(jnp.where(is_edge, fine, fill), is_edge,
                           reverse=True)
    r1 = shift_l(r1i)                       # next crossing strictly after i
    r2i = _last_valid_scan(jnp.where(is_edge, r1, fill), is_edge,
                           reverse=True)
    r2 = shift_l(r2i)
    r3i = _last_valid_scan(jnp.where(is_edge, r2, fill), is_edge,
                           reverse=True)
    r3 = shift_l(r3i)
    n_pairs = jnp.maximum(jnp.sum(is_edge) - 1, 0)
    return (q4, q3, q2, q1, r1, r2, r3), n_pairs


def _interp_from_states(states, tf, t, fs, big):
    """Evaluate the crossing-interval contour at query time tf (in
    sub-sample units) from the (q4..q1, r1..r3) neighborhood gathered at
    tf's sample.  Reproduces interp1's clamped-rank evaluation
    (k = clip(#{loc <= t}, 1, n-1); segment (k-1, k)) as a select tree:
    the bracketing triple of crossings is always among the last three
    before / first three after tf."""
    q4, q3, q2, q1, r1, r2, r3 = states
    # At most one crossing lies inside tf's own sample interval, and it
    # is q1; reclassify it against tf.
    fut = q1 > tf
    p3 = jnp.where(fut, q4, q3)
    p2 = jnp.where(fut, q3, q2)
    p1 = jnp.where(fut, q2, q1)
    n1 = jnp.where(fut, q1, r1)
    n2 = jnp.where(fut, r1, r2)
    n3 = jnp.where(fut, r2, r3)

    no_past1 = p1 <= -big        # no crossing before tf
    no_past2 = p2 <= -big        # fewer than two before
    no_next1 = n1 >= big         # none after
    no_next2 = n2 >= big         # fewer than two after
    mid_le = (p1 + n1) * 0.5 <= tf   # pair(p1,n1) midpoint <= t

    in_b = mid_le & ~no_next2    # segment (pair(p1,n1), pair(n1,n2))
    a = jnp.where(no_past1, n1, jnp.where(no_past2, p1,
                  jnp.where(no_next1, p3, jnp.where(in_b, p1, p2))))
    b = jnp.where(no_past1, n2, jnp.where(no_past2, n1,
                  jnp.where(no_next1, p2, jnp.where(in_b, n1, p1))))
    c = jnp.where(no_past1, n3, jnp.where(no_past2, n2,
                  jnp.where(no_next1, p1, jnp.where(in_b, n2, n1))))

    # Same arithmetic as the compacted interp1 path, on the triple.
    ba = b - a
    cb = c - b
    ok = (ba > 0) & (cb > 0) & jnp.isfinite(a) & jnp.isfinite(c) \
        & (jnp.abs(a) < big) & (jnp.abs(c) < big)
    ba = jnp.where(ok, ba, 1.0)
    cb = jnp.where(ok, cb, 1.0)
    y0 = fs / ba
    y1 = fs / cb
    x0 = (a + b) * 0.5 / fs
    x1 = (b + c) * 0.5 / fs
    s = (t - x0) / (x1 - x0)
    return jnp.where(ok, y0 + s * (y1 - y0), 0.0)


def four_stream_frame_candidates(filtered, n_valid, fs, frame_samples,
                                 frame_tf, frame_t):
    """Fast path (float32/TPU): the four crossing streams interpolated
    straight onto the frame grid with NO sorts and NO data-dependent
    gathers: per-sample crossing neighborhoods (associative scans), one
    static-index gather at the frame sample positions (indices shared by
    every lane), and an elementwise bracketing select tree.

    frame_samples: (F,) static int sample index with t_f*fs in
    (s, s+1]; frame_tf: (F,) query positions in sub-sample units
    (t_f * fs); frame_t: (F,) query times in seconds.
    Returns ((4, F) interps, (4,) pair counts).
    """
    d = jnp.roll(filtered, -1) - filtered
    streams = jnp.stack([filtered, -filtered, d, -d])
    valids = jnp.stack([n_valid, n_valid, n_valid - 1, n_valid - 1])
    big = jnp.asarray(3e38 if filtered.dtype == jnp.float32 else 1e300,
                      filtered.dtype)
    states, n_pairs = jax.vmap(_crossing_states, in_axes=(0, 0, None))(
        streams, valids, big)
    # Static shared indices: the minor-dim gather lowers to slices.
    at_frames = tuple(s[:, frame_samples] for s in states)
    interp = _interp_from_states(at_frames, frame_tf[None, :],
                                 frame_t[None, :],
                                 jnp.asarray(fs, filtered.dtype), big)
    return interp, n_pairs


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
