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
import numpy as np

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


def _select_eval(p3, p2, p1, n1, n2, n3, tf, t, fs, big):
    """Evaluate the crossing-interval contour at query time tf (in
    sub-sample units) from the last three crossings at-or-before tf
    (p1 most recent) and the first three after (n1 first), padded with
    +-big.  Reproduces interp1's clamped-rank evaluation
    (k = clip(#{loc <= t}, 1, n-1); segment (k-1, k)) as a select tree:
    the bracketing triple of crossings is always among these six."""
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


def frame_block_layout(frame_samples, y_length):
    """Static block partition of the sample axis by frame: block j =
    samples [s_j, s_{j+1}) (s_F = y_length).  Returns (index (F, B),
    mask (F, B)) numpy arrays; B = max block width, and the crossing
    capacity per block is bounded by ceil(B/2)+1 since +to- crossings
    are at least two samples apart."""
    s = np.asarray(frame_samples, np.int64)
    widths = np.diff(np.append(s, y_length))
    if widths.min() < 0:
        raise ValueError("frame_samples must be ascending")
    B = int(widths.max())
    index = np.clip(s[:, None] + np.arange(B)[None, :], 0, y_length - 1)
    mask = np.arange(B)[None, :] < widths[:, None]
    return index.astype(np.int32), mask


def four_stream_block_summaries(filtered, n_valid, block_index, block_mask):
    """Per-frame-block crossing summaries for the four streams of one
    channel: block-local last-3 / first-4 crossing positions, counts,
    the offset-0 slot, and the stream pair counts.  No sorts, no
    data-dependent gathers (block_index/block_mask are static, from
    frame_block_layout).  Returns ((11, 4, F) stacked summaries,
    (4,) pair counts)."""
    dtype = filtered.dtype
    L = filtered.shape[0]
    big = jnp.asarray(3e38 if dtype == jnp.float32 else 1e300, dtype)
    d = jnp.roll(filtered, -1) - filtered
    streams = jnp.stack([filtered, -filtered, d, -d])
    valids = jnp.stack([n_valid, n_valid, n_valid - 1, n_valid - 1])

    idx = jnp.arange(L)
    s_next = jnp.roll(streams, -1, axis=-1)
    is_edge = (streams > 0.0) & (s_next <= 0.0) \
        & (idx[None, :] < valids[:, None] - 1)
    fine = (idx + 1).astype(dtype) - streams / (s_next - streams)
    n_pairs = jnp.maximum(jnp.sum(is_edge, axis=-1) - 1, 0)

    F, B = block_index.shape
    take = jnp.asarray(block_index.reshape(-1))
    blk_f = fine[:, take].reshape(4, F, B)
    blk_e = is_edge[:, take].reshape(4, F, B) & jnp.asarray(block_mask)

    # Block-local crossing lists.  Small blocks (harvest: 1 ms frames
    # at 8 kHz, B ~ 9) unroll directly; wide blocks (dio: 5 ms frames
    # at the raw rate, B ~ 110) first reduce 8-slot SUB-blocks and then
    # merge the sub-summaries — 2B tiny select stages become ~2B/8
    # larger ones plus ~2B/8 merges, the same elements selected in the
    # same precedence, so the outputs are bit-identical.
    if B <= 24:
        l1 = l2 = l3 = jnp.full((4, F), -big)
        for o in range(B):                  # last-3, most recent first
            v, e = blk_f[..., o], blk_e[..., o]
            l1, l2, l3 = (jnp.where(e, v, l1), jnp.where(e, l1, l2),
                          jnp.where(e, l2, l3))
        f1 = f2 = f3 = f4 = jnp.full((4, F), big)
        for o in range(B - 1, -1, -1):      # first-4, earliest first
            v, e = blk_f[..., o], blk_e[..., o]
            f1, f2, f3, f4 = (jnp.where(e, v, f1), jnp.where(e, f1, f2),
                              jnp.where(e, f2, f3), jnp.where(e, f3, f4))
        cnt = jnp.sum(blk_e, axis=-1).astype(dtype)
    else:
        S = 8
        pad = (-B) % S
        if pad:
            blk_fp = jnp.concatenate(
                [blk_f, jnp.zeros((4, F, pad), dtype)], -1)
            blk_ep = jnp.concatenate(
                [blk_e, jnp.zeros((4, F, pad), bool)], -1)
        else:
            blk_fp, blk_ep = blk_f, blk_e
        B2 = (B + pad) // S
        sub_f = blk_fp.reshape(4, F, B2, S)
        sub_e = blk_ep.reshape(4, F, B2, S)
        sl1 = sl2 = sl3 = jnp.full((4, F, B2), -big)
        for o in range(S):
            v, e = sub_f[..., o], sub_e[..., o]
            sl1, sl2, sl3 = (jnp.where(e, v, sl1), jnp.where(e, sl1, sl2),
                             jnp.where(e, sl2, sl3))
        sf1 = sf2 = sf3 = sf4 = jnp.full((4, F, B2), big)
        for o in range(S - 1, -1, -1):
            v, e = sub_f[..., o], sub_e[..., o]
            sf1, sf2, sf3, sf4 = (
                jnp.where(e, v, sf1), jnp.where(e, sf1, sf2),
                jnp.where(e, sf2, sf3), jnp.where(e, sf3, sf4))
        scnt = jnp.sum(sub_e, axis=-1)
        l1 = l2 = l3 = jnp.full((4, F), -big)
        for j in range(B2):                 # earliest -> latest
            c = scnt[..., j]
            a1, a2, a3 = sl1[..., j], sl2[..., j], sl3[..., j]
            l1, l2, l3 = (
                jnp.where(c >= 1, a1, l1),
                jnp.where(c >= 2, a2, jnp.where(c == 1, l1, l2)),
                jnp.where(c >= 3, a3, jnp.where(
                    c == 2, l1, jnp.where(c == 1, l2, l3))))
        f1 = f2 = f3 = f4 = jnp.full((4, F), big)
        for j in range(B2 - 1, -1, -1):     # latest -> earliest
            c = scnt[..., j]
            b1, b2, b3, b4 = (sf1[..., j], sf2[..., j], sf3[..., j],
                              sf4[..., j])
            f1, f2, f3, f4 = (
                jnp.where(c >= 1, b1, f1),
                jnp.where(c >= 2, b2, jnp.where(c == 1, f1, f2)),
                jnp.where(c >= 3, b3, jnp.where(
                    c == 2, f1, jnp.where(c == 1, f2, f3))),
                jnp.where(c >= 4, b4, jnp.where(c == 3, f1, jnp.where(
                    c == 2, f2, jnp.where(c == 1, f3, f4)))))
        cnt = jnp.sum(scnt, axis=-1).astype(dtype)
    fine0 = blk_f[..., 0]
    edge0 = blk_e[..., 0].astype(dtype)
    return (jnp.stack([l1, l2, l3, f1, f2, f3, f4, cnt, fine0, edge0]),
            n_pairs)


def frame_candidates_eval(sums, fs, frame_tf, frame_t, big):
    """Evaluate frame-grid interps from stacked block summaries.

    sums: (10, ..., 4, F) — the stack from four_stream_block_summaries,
    with arbitrary batch dims folded between.  Two sequential F-step
    scans carry the last-3 / next-3 crossing neighborhoods across
    blocks (cheap: the carry is a handful of lane vectors — the scans
    run ONCE for all channels, not inside the channel map), then an
    elementwise select tree reproduces interp1's clamped-rank
    evaluation.  Returns (..., 4, F) interps.
    """
    l1, l2, l3, f1, f2, f3, f4, cntf, fine0, edge0 = tuple(sums)
    cnt = cntf.astype(jnp.int32)
    dtype = l1.dtype
    lanes = l1.shape[:-1]

    def fwd(carry, xs):
        q1, q2, q3 = carry
        a1, a2, a3, c = xs
        r1 = jnp.where(c >= 1, a1, q1)
        r2 = jnp.where(c >= 2, a2, jnp.where(c == 1, q1, q2))
        r3 = jnp.where(c >= 3, a3,
                       jnp.where(c == 2, q1, jnp.where(c == 1, q2, q3)))
        return (r1, r2, r3), carry

    def rev(carry, xs):
        s1, s2, s3 = carry
        a1, a2, a3, c = xs
        r1 = jnp.where(c >= 1, a1, s1)
        r2 = jnp.where(c >= 2, a2, jnp.where(c == 1, s1, s2))
        r3 = jnp.where(c >= 3, a3,
                       jnp.where(c == 2, s1, jnp.where(c == 1, s2, s3)))
        return (r1, r2, r3), carry

    # Blocked scans: U frame-steps unrolled per lax.scan step.  The
    # per-step combine is ~10 selects over the lane vectors, so at
    # F ~ 800 the sequential-step overhead dominates; U=8 runs the same
    # select sequence (bit-identical) in F/8 steps.  cnt=0 padding is a
    # pass-through for both directions, so tail padding is inert.
    F = l1.shape[-1]
    U = 8
    Fp = -(-F // U) * U

    def mv(a):                              # (..., F) -> (F//U, U, ...)
        a = jnp.moveaxis(a, -1, 0)
        if Fp != F:
            a = jnp.concatenate(
                [a, jnp.zeros((Fp - F,) + a.shape[1:], a.dtype)])
        return a.reshape((Fp // U, U) + a.shape[1:])

    def blocked(step, reverse):
        def body(carry, xs):
            outs = [None] * U
            for u in (range(U - 1, -1, -1) if reverse else range(U)):
                carry, outs[u] = step(carry, tuple(a[u] for a in xs))
            return carry, tuple(jnp.stack([o[i] for o in outs])
                                for i in range(3))
        return body

    def unmv(a):                            # (F//U, U, ...) -> (..., F)
        a = a.reshape((Fp,) + a.shape[2:])[:F]
        return jnp.moveaxis(a, 0, -1)

    neg3 = tuple(jnp.full(lanes, -big, dtype) for _ in range(3))
    pos3 = tuple(jnp.full(lanes, big, dtype) for _ in range(3))
    _, P = jax.lax.scan(blocked(fwd, False), neg3,
                        (mv(l1), mv(l2), mv(l3), mv(cnt)))
    _, S = jax.lax.scan(blocked(rev, True), pos3,
                        (mv(f1), mv(f2), mv(f3), mv(cnt)), reverse=True)
    P1, P2, P3 = (unmv(p) for p in P)
    S1, S2, S3 = (unmv(s) for s in S)

    # Assemble the neighborhoods of tf_j: only the block's offset-0
    # crossing can be <= tf (tf in (s_j, s_j+1], crossings >= 2 apart).
    tf = frame_tf
    past0 = (edge0 != 0.0) & (fine0 <= tf)
    p1 = jnp.where(past0, fine0, P1)
    p2 = jnp.where(past0, P1, P2)
    p3 = jnp.where(past0, P2, P3)
    R1 = jnp.where(past0, f2, f1)           # block crossings after tf
    R2 = jnp.where(past0, f3, f2)
    R3 = jnp.where(past0, f4, f3)
    rc = jnp.minimum(cnt - past0.astype(cnt.dtype), 3)
    n1 = jnp.where(rc >= 1, R1, S1)
    n2 = jnp.where(rc >= 2, R2, jnp.where(rc == 1, S1, S2))
    n3 = jnp.where(rc >= 3, R3,
                   jnp.where(rc == 2, S1, jnp.where(rc == 1, S2, S3)))

    return _select_eval(p3, p2, p1, n1, n2, n3, tf, frame_t,
                        jnp.asarray(fs, dtype), big)


def four_stream_frame_candidates(filtered, n_valid, fs, block_index,
                                 block_mask, frame_tf, frame_t):
    """Single-channel convenience wrapper: summaries + eval in one call
    (production harvest hoists the eval outside its channel map)."""
    sums, n_pairs = four_stream_block_summaries(filtered, n_valid,
                                                block_index, block_mask)
    big = jnp.asarray(3e38 if filtered.dtype == jnp.float32 else 1e300,
                      filtered.dtype)
    interp = frame_candidates_eval(sums, fs, frame_tf[None, :],
                                   frame_t[None, :], big)
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
