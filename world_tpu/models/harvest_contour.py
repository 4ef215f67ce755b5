"""Harvest contour fixing + smoothing, device-native.

JAX re-expression of FixF0Contour / SmoothF0Contour (reference
src/harvest.cpp:693-1113), replacing the host-numpy v0 scaffolding so the
whole Harvest path jits and vmaps into the batched pipeline.

The C++ walks data-dependent section lists with in-place swaps; here
sections live in fixed-capacity tensors (capacity = f0_length//8 + 2:
FixStep2 guarantees >= 7 voiced frames per section plus a gap) and every
walk is a masked lax.scan:

- FixStep1 is frame-parallel (the jump test reads the *unfixed* base).
- FixStep2 uses run-length scans (cummax/cummin of boundary indices).
- FixStep3's ExtendF0 is a 101-step scan per section x direction
  (vmapped); ExtendSub's mean-residue carry and MergeF0's sequential
  overwrite of the merged contour are scans over the section axis; the
  C++ MakeSortedOrder swap-insertion is a correct stable sort for its
  keys, so a stable argsort by section start reproduces it.
- FixStep4 fills short gaps frame-parallel from prev/next-section scans.
- SmoothF0Contour runs the zero-phase biquad as a lax.scan over time,
  batched over the section lanes, with 300-frame edge-hold padding.

Everything matches the host transcription op-for-op; only floating-point
summation order differs (jnp.sum vs numpy pairwise) in the ExtendSub
mean and MergeF0Sub scores, which decide ties only at ~1e-16.
"""

import functools

import jax
import jax.numpy as jnp

BIG = jnp.iinfo(jnp.int32).max // 2
LAG = 300  # smoothing pad (src/harvest.cpp:1090)

# SmoothF0Contour biquad (src/harvest.cpp:1058-1059).
_B = (0.0078202080334971724, 0.015640416066994345)
_A = (1.7347257688092754, -0.76600660094326412)


@functools.lru_cache(maxsize=None)
def _biquad_tables(block=128):
    """Block-LTI tables for the smoothing biquad's float32 path.
    State s_t = (y_t, y_{t-1}, x_t, x_{t-1}):
      y_t = b0 x_t + (a0, a1, b1, b0) . s_{t-1}."""
    from ..ops.matlab import lti_block_tables
    import numpy as np
    M = np.array([[_A[0], _A[1], _B[1], _B[0]],
                  [1.0, 0.0, 0.0, 0.0],
                  [0.0, 0.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0]])
    e = np.array([_B[0], 0.0, 1.0, 0.0])
    c = np.array([_A[0], _A[1], _B[1], _B[0]])
    return lti_block_tables(M, e, c, _B[0], block)


def _shift_right(x, k, fill=0.0):
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]])


def _section_masks(values):
    """Voiced-run starts/ends with the reference's forced-unvoiced
    endpoints (GetBoundaryList, src/harvest.cpp:767-786)."""
    v = values != 0.0
    n = v.shape[0]
    v = v & (jnp.arange(n) > 0) & (jnp.arange(n) < n - 1)
    prev = jnp.concatenate([jnp.zeros(1, bool), v[:-1]])
    nxt = jnp.concatenate([v[1:], jnp.zeros(1, bool)])
    return v, v & ~prev, v & ~nxt


def _section_bounds(values, cap):
    """(starts, ends, count) as fixed-capacity ascending index arrays."""
    _, s_mask, e_mask = _section_masks(values)
    idx = jnp.arange(values.shape[0])
    st = jnp.sort(jnp.where(s_mask, idx, BIG))[:cap]
    ed = jnp.sort(jnp.where(e_mask, idx, BIG))[:cap]
    return st, ed, jnp.sum(s_mask)


def _select_best(reference, cands_row, allowed):
    """SelectBestF0 (src/harvest.cpp:636-650): nearest candidate within
    ``allowed`` relative error; ties keep the *later* candidate."""
    err = jnp.abs(reference - cands_row) / reference
    n = cands_row.shape[0]
    j = n - 1 - jnp.argmin(err[::-1])
    return jnp.where(err[j] <= allowed, cands_row[j], 0.0)


def _fix_step1(base, allowed_range):
    """Jump removal (src/harvest.cpp:710-722); reads the unfixed base."""
    n = base.shape[0]
    b1 = _shift_right(base, 1)
    b2 = _shift_right(base, 2)
    ref = b1 * 2.0 - b2
    c1 = jnp.abs((base - ref) / ref) > allowed_range
    c2 = jnp.abs(base - b1) / b1 > allowed_range
    keep = (jnp.arange(n) >= 2) & (base != 0.0) & ~(c1 & c2)
    return jnp.where(keep, base, 0.0)


def _fix_step2(step1, voice_range_minimum=6):
    """Drop voiced runs with ed - st < 6 (src/harvest.cpp:748-762)."""
    _, s_mask, e_mask = _section_masks(step1)
    idx = jnp.arange(step1.shape[0])
    st_f = jax.lax.cummax(jnp.where(s_mask, idx, -1))
    ed_f = jax.lax.cummin(jnp.where(e_mask, idx, BIG), reverse=True)
    v, _, _ = _section_masks(step1)
    remove = v & (ed_f - st_f < voice_range_minimum)
    return jnp.where(remove, 0.0, step1)


def _extend_one(ref0, origin, last_point, shift, rows, allowed):
    """ExtendF0 (src/harvest.cpp:791-820): walk from ``origin`` toward
    ``last_point`` selecting candidates, stop after 4 straight misses.
    ``ref0`` is the contour value at the origin; ``rows`` are the 101
    candidate rows of the walk pre-sliced in step order (a per-step
    gather inside the scan was the slow primitive; out-of-range steps
    carry zero rows, masked by ``active``).
    Returns (emitted values (101,), shifted_origin)."""
    n_steps = jnp.abs(last_point - origin) + 1

    def body(carry, inp):
        s, row = inp
        tmp, cnt, done, shifted = carry
        t = origin + shift * (s + 1)
        active = (s < n_steps) & ~done
        val = jnp.where(active, _select_best(tmp, row, allowed), 0.0)
        hit = val != 0.0
        cnt = jnp.where(active, jnp.where(hit, 0, cnt + 1), cnt)
        tmp = jnp.where(active & hit, val, tmp)
        shifted = jnp.where(active & hit, t, shifted)
        done = done | (cnt >= 4)
        return (tmp, cnt, done, shifted), val

    (_, _, _, shifted), vals = jax.lax.scan(
        body, (ref0, 0, False, origin), (jnp.arange(101), rows))
    return vals, shifted


def _place(rel_values, base, direction, n_frames):
    """Scatter the 101 emitted walk values at base + direction*(1..101)
    as a masked gather (TPU-friendly)."""
    j = jnp.arange(n_frames)
    rel = (j - base) * direction - 1
    ok = (rel >= 0) & (rel < 101)
    return jnp.where(ok, rel_values[jnp.clip(rel, 0, 100)], 0.0)


def _search_score(value, cands, scores):
    """Best score among slots holding ``value``
    (src/harvest.cpp:858-868); frame-parallel over a (F,) contour."""
    hit = cands == value[:, None]
    return jnp.max(jnp.where(hit, scores, 0.0), axis=1)


def _fix_step3(step2, cands, scores, cap, allowed_range=0.18):
    """Extend + Merge (src/harvest.cpp:791-995)."""
    n_frames, _ = cands.shape
    st, ed, n_sec = _section_bounds(step2, cap)
    sec_valid = jnp.arange(cap) < n_sec
    j = jnp.arange(n_frames)

    # Extend every section both ways (threshold 100 frames).  Walk
    # windows are contiguous, so each direction's 101 candidate rows are
    # one dynamic_slice of a zero-padded copy (per-lane starts into a
    # SHARED array — the fast path).
    cands_pad = jnp.concatenate(
        [jnp.zeros((101,) + cands.shape[1:], cands.dtype), cands,
         jnp.zeros((101,) + cands.shape[1:], cands.dtype)])

    def walk_rows(first_t):
        return jax.lax.dynamic_slice(
            cands_pad, (first_t + 101, 0), (101, cands.shape[1]))

    def extend_k(row, s, e):
        last_r = jnp.minimum(n_frames - 2, e + 100)
        vals_r, new_e = _extend_one(row[e], e, last_r, 1,
                                    walk_rows(e + 1), allowed_range)
        row = row + _place(vals_r, e, 1, n_frames)
        last_l = jnp.maximum(1, s - 100)
        vals_l, new_s = _extend_one(row[s], s, last_l, -1,
                                    walk_rows(s - 101)[::-1],
                                    allowed_range)
        row = row + _place(vals_l, s, -1, n_frames)
        return row, new_s, new_e

    # Chunk the extension over the REAL section count: valid sections
    # occupy the ascending prefix of st/ed (BIG beyond), so an 8-lane
    # while_loop stops once every real section is extended instead of
    # paying the fixed capacity.  The walk scans and _place's per-lane
    # placement gather were each full-capacity vmaps (the two placement
    # gathers alone were ~24 ms of device time at cap~100 when only a
    # handful of sections exist).
    st_c = jnp.clip(st, 0, n_frames - 1)
    ed_c = jnp.clip(ed, 0, n_frames - 1)
    ec = 8
    epad = (-cap) % ec
    st_p = jnp.concatenate([st_c, jnp.zeros(epad, st_c.dtype)])
    ed_p = jnp.concatenate([ed_c, jnp.zeros(epad, ed_c.dtype)])
    ext_needed = (jnp.maximum(n_sec, 1) + ec - 1) // ec

    def ext_body(carry):
        i, m_acc, s_acc, e_acc = carry
        st_ch = jax.lax.dynamic_slice(st_p, (i * ec,), (ec,))
        ed_ch = jax.lax.dynamic_slice(ed_p, (i * ec,), (ec,))
        in_ch = (j[None, :] >= st_ch[:, None]) & (j[None, :] <= ed_ch[:, None])
        m_ch = jnp.where(in_ch, step2[None, :], 0.0)
        m_ch, s_ch, e_ch = jax.vmap(extend_k)(m_ch, st_ch, ed_ch)
        return (i + 1,
                jax.lax.dynamic_update_slice(m_acc, m_ch, (i * ec, 0)),
                jax.lax.dynamic_update_slice(s_acc, s_ch, (i * ec,)),
                jax.lax.dynamic_update_slice(e_acc, e_ch, (i * ec,)))

    _, multi, new_st, new_ed = jax.lax.while_loop(
        lambda c: c[0] < ext_needed, ext_body,
        (0, jnp.zeros((cap + epad, n_frames), step2.dtype),
         jnp.zeros(cap + epad, st_c.dtype),
         jnp.zeros(cap + epad, ed_c.dtype)))
    multi = multi[:cap]
    new_st = jnp.where(sec_valid, new_st[:cap], BIG)
    new_ed = jnp.where(sec_valid, new_ed[:cap], BIG)
    multi = jnp.where(sec_valid[:, None], multi, 0.0)

    # ExtendSub: keep sections with 2200/mean < length; the mean carries
    # residue across sections exactly like the C++ (src/harvest.cpp:840-856).
    span = (j[None, :] >= new_st[:, None]) & (j[None, :] < new_ed[:, None])
    sums = jnp.sum(jnp.where(span, multi, 0.0), axis=1)
    lens = (new_ed - new_st).astype(multi.dtype)

    def sub_body(mean, inp):
        s, l, valid = inp
        mean = jnp.where(valid, (mean + s) / l, mean)
        keep = valid & (2200.0 / mean < l)
        return mean, keep

    _, keep = jax.lax.scan(sub_body, jnp.asarray(0.0, multi.dtype),
                           (sums, lens, sec_valid))
    n_kept = jnp.sum(keep)

    # Compaction preserves original order among kept sections; MergeF0's
    # MakeSortedOrder then sorts by start (stable).
    compact = jnp.argsort(jnp.where(keep, jnp.arange(cap), BIG))
    st_k = new_st[compact]
    ed_k = new_ed[compact]
    multi_k = multi[compact]
    order = jnp.argsort(jnp.where(jnp.arange(cap) < n_kept, st_k, BIG),
                        stable=True)

    # Per-section frame scores, chunked to the kept prefix (kept
    # sections are compacted to the front, so a while_loop over 8-lane
    # chunks stops once every kept section is scored instead of paying
    # the full fixed capacity).
    sc = 8
    cpad = (-cap) % sc
    multi_p = jnp.concatenate(
        [multi_k, jnp.zeros((cpad, n_frames), multi_k.dtype)])
    fs_needed = (jnp.maximum(n_kept, 1) + sc - 1) // sc

    def fs_body(carry):
        i, acc = carry
        chunk = jax.lax.dynamic_slice(multi_p, (i * sc, 0),
                                      (sc, n_frames))
        r = jax.vmap(lambda c: _search_score(c, cands, scores))(chunk)
        return i + 1, jax.lax.dynamic_update_slice(acc, r, (i * sc, 0))

    _, frame_score = jax.lax.while_loop(
        lambda c: c[0] < fs_needed, fs_body,
        (0, jnp.zeros((cap + cpad, n_frames), multi_k.dtype)))
    frame_score = frame_score[:cap]  # (cap, F)

    # Sequential merge (src/harvest.cpp:881-963), trip count bounded by
    # the actual kept-section count instead of the fixed capacity.
    merged0 = multi_k[0]
    b0_0 = st_k[0]
    b1_0 = ed_k[0]

    def merge_body(carry):
        i, merged, mscore, b0, b1 = carry
        oi = order[i]
        st2, ed2 = st_k[oi], ed_k[oi]
        f0_2 = multi_k[oi]
        s2 = frame_score[oi]

        disjoint = st2 - b1 > 0
        contained = (b0 <= st2) & (b1 >= ed2)
        overlap = ~disjoint & ~contained
        in_score = (j >= st2) & (j <= b1)
        score1 = jnp.sum(jnp.where(in_score, mscore, 0.0))
        score2 = jnp.sum(jnp.where(in_score, s2, 0.0))
        lo = jnp.where(score1 > score2, b1, st2)  # overwrite [lo, ed2]
        write = (disjoint & (j >= st2) & (j <= ed2)
                 | overlap & (j >= lo) & (j <= ed2))
        merged = jnp.where(write, f0_2, merged)
        mscore = jnp.where(write, s2, mscore)
        b0 = jnp.where(disjoint, st2, b0)
        b1 = jnp.where(~contained, ed2, b1)
        return i + 1, merged, mscore, b0, b1

    _, merged, _, _, _ = jax.lax.while_loop(
        lambda c: c[0] < n_kept, merge_body,
        (1, merged0, frame_score[0], b0_0, b1_0))

    merged = jnp.where(n_kept > 0, merged, step2)
    return jnp.where(n_sec > 0, merged, step2)


def _fix_step4(step3, threshold=9):
    """Linear fill of short unvoiced gaps (src/harvest.cpp:1000-1022)."""
    n = step3.shape[0]
    j = jnp.arange(n)
    _, s_mask, e_mask = _section_masks(step3)
    prev_ed = jax.lax.cummax(jnp.where(e_mask, j, -1))
    next_st = jax.lax.cummin(jnp.where(s_mask, j, BIG), reverse=True)
    has = (prev_ed >= 0) & (next_st < BIG)
    dist = next_st - prev_ed - 1
    gap = has & (step3 == 0.0) & (j > prev_ed) & (j < next_st) \
        & (dist < threshold)
    t0 = step3[jnp.clip(prev_ed, 0, n - 1)] + 1.0
    t1 = step3[jnp.clip(next_st, 0, n - 1)] - 1.0
    coef = (t1 - t0) / (dist + 1.0).astype(step3.dtype)
    fill = t0 + coef * (j - prev_ed).astype(step3.dtype)
    return jnp.where(gap, fill, step3)


def _smooth_contour(f0, cap):
    """Zero-phase 2nd-order smoothing per voiced section with 300-frame
    edge-hold padding (src/harvest.cpp:1049-1113)."""
    dtype = f0.dtype
    b = jnp.asarray(_B, dtype)
    a = jnp.asarray(_A, dtype)
    n = f0.shape[0] + 2 * LAG
    contour = jnp.concatenate(
        [jnp.zeros(LAG, dtype), f0, jnp.zeros(LAG, dtype)])
    st, ed, n_sec = _section_bounds(contour, cap)
    valid = jnp.arange(cap) < n_sec
    st_c = jnp.clip(st, 0, n - 1)
    ed_c = jnp.clip(ed, 0, n - 1)

    # Edge-hold input per section: x[t] = contour[clip(t, st, ed)].
    # Expressed as selects over the shared contour row plus two scalar
    # edge values per section — the 2D clip-gather was a per-lane
    # arbitrary gather (the slow primitive).
    t = jnp.arange(n)
    v_st = contour[st_c]
    v_ed = contour[ed_c]
    x = jnp.where(t[None, :] < st_c[:, None], v_st[:, None],
                  jnp.where(t[None, :] > ed_c[:, None], v_ed[:, None],
                            contour[None, :]))
    x = jnp.where(valid[:, None], x, 0.0)

    def biquad(seq):
        # y[t] = b0 x[t] + b1 x[t-1] + b0 x[t-2] + a0 y[t-1] + a1 y[t-2],
        # zero initial state, batched over the section lanes.
        if dtype == jnp.float64:
            # Golden path: per-sample scan, reference recurrence order.
            def step(carry, xt):
                x1, x2, y1, y2 = carry
                yt = (b[0] * xt + b[1] * x1 + b[0] * x2
                      + a[0] * y1 + a[1] * y2)
                return (xt, x1, yt, y1), yt

            z = jnp.zeros(seq.shape[1:], dtype)
            _, y = jax.lax.scan(step, (z, z, z, z), seq)
            return y
        # TPU path: block LTI form (per-sample scans cost ~86 ns/step;
        # fp differs from the scan only in summation order, ~1e-6 rel).
        from ..ops.matlab import lti_block_filter
        return lti_block_filter(seq, _biquad_tables(), dtype)

    y1 = biquad(x.T)[::-1]
    y2 = biquad(y1)[::-1].T  # (cap, n)

    in_sec = (t[None, :] >= st_c[:, None]) & (t[None, :] <= ed_c[:, None])
    out = jnp.sum(jnp.where(in_sec & valid[:, None], y2, 0.0), axis=0)
    return out[LAG: LAG + f0.shape[0]]


@functools.partial(jax.jit, static_argnames=("cap",))
def fix_and_smooth(cands, scores, *, cap=None):
    """FixF0Contour + SmoothF0Contour (src/harvest.cpp:1027-1113),
    fully on device.  cands/scores: (f0_length, n_slots)."""
    f0_length = cands.shape[0]
    if cap is None:
        cap = f0_length // 8 + 2

    best = jnp.argmax(scores, axis=1)
    has = jnp.max(scores, axis=1) > 0.0
    base = jnp.where(has, cands[jnp.arange(f0_length), best], 0.0)

    step1 = _fix_step1(base, 0.008)
    step2 = _fix_step2(step1)
    step3 = _fix_step3(step2, cands, scores, cap)
    step4 = _fix_step4(step3)
    return _smooth_contour(step4, cap + 2)
