"""Host-numpy oracle for Harvest contour fixing/smoothing.

Op-for-op transcription of the reference's FixF0Contour + SmoothF0Contour
(src/harvest.cpp:693-1113, including ExtendSub's mean-residue quirk at
src/harvest.cpp:840-856) used ONLY to cross-validate the on-device
implementation in world_tpu/models/harvest_contour.py via the randomized
property tests in test_harvest.py.  Deliberately NOT part of the package:
production code contains no transcribed reference logic.
"""

import numpy as np
import scipy.signal


def _select_best_np(reference, cands, allowed_range):
    """SelectBestF0 (src/harvest.cpp:636-650): nearest candidate within
    allowed relative error; ties keep the later candidate."""
    err = np.abs(reference - cands) / reference
    best, best_err = 0.0, allowed_range
    for c, e in zip(cands, err):
        if e > best_err:
            continue
        best, best_err = c, e
    return best, best_err


def _get_boundary_list(f0):
    vuv = (f0 > 0).astype(np.int32)
    vuv[0] = vuv[-1] = 0
    idx = np.where(np.diff(vuv) != 0)[0] + 1
    bl = []
    for n, i in enumerate(idx):
        bl.append(i - n % 2)
    return bl


def _fix_contour_np(cands, scores):
    """FixF0Contour (src/harvest.cpp:693-1044) on the host."""
    f0_length, n_slots = cands.shape
    # SearchF0Base
    base = np.zeros(f0_length)
    best = np.argmax(scores, axis=1)
    has = scores.max(axis=1) > 0.0
    base[has] = cands[np.arange(f0_length), best][has]

    # FixStep1 (allowed_range 0.008)
    step1 = np.zeros(f0_length)
    for i in range(2, f0_length):
        if base[i] == 0.0:
            continue
        reference = base[i - 1] * 2 - base[i - 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            c1 = np.abs((base[i] - reference) / reference) > 0.008
            c2 = np.abs(base[i] - base[i - 1]) / base[i - 1] > 0.008
        step1[i] = 0.0 if (c1 and c2) else base[i]

    # FixStep2: drop voiced runs shorter than 6
    step2 = step1.copy()
    bl = _get_boundary_list(step1)
    for k in range(len(bl) // 2):
        if bl[2 * k + 1] - bl[2 * k] >= 6:
            continue
        step2[bl[2 * k]: bl[2 * k + 1] + 1] = 0.0

    # FixStep3: Extend + Merge (src/harvest.cpp:791-995)
    step3 = _fix_step3_np(step2, cands, scores)

    # FixStep4: fill short unvoiced gaps (<9) linearly
    step4 = step3.copy()
    bl = _get_boundary_list(step3)
    for k in range(len(bl) // 2 - 1):
        dist = bl[(k + 1) * 2] - bl[k * 2 + 1] - 1
        if dist >= 9:
            continue
        t0 = step3[bl[k * 2 + 1]] + 1
        t1 = step3[bl[(k + 1) * 2]] - 1
        coef = (t1 - t0) / (dist + 1.0)
        for c, j in enumerate(range(bl[k * 2 + 1] + 1, bl[(k + 1) * 2])):
            step4[j] = t0 + coef * (c + 1)
    return step4


def _extend_f0_np(extended, origin, last_point, shift, cands, allowed):
    """ExtendF0 (src/harvest.cpp:791-820): walk selecting candidates,
    stop after 4 consecutive misses."""
    tmp_f0 = extended[origin]
    shifted_origin = origin
    count = 0
    for step in range(abs(last_point - origin) + 1):
        t = origin + shift * step + shift
        val, _ = _select_best_np(tmp_f0, cands[t], allowed)
        extended[t] = val
        if val == 0.0:
            count += 1
        else:
            tmp_f0 = val
            count = 0
            shifted_origin = t
        if count == 4:
            break
    return shifted_origin


def _search_score_np(f0, cands_row, scores_row):
    score = 0.0
    for c, s in zip(cands_row, scores_row):
        if f0 == c and score < s:
            score = s
    return score


def _fix_step3_np(step2, cands, scores):
    f0_length = step2.shape[0]
    step3 = step2.copy()
    bl = _get_boundary_list(step2)
    n_sec = len(bl) // 2
    if n_sec == 0:
        return step3
    multi = np.zeros((n_sec, f0_length))
    for k in range(n_sec):
        multi[k, bl[2 * k]: bl[2 * k + 1] + 1] = \
            step2[bl[2 * k]: bl[2 * k + 1] + 1]
    bl = list(bl)

    # Extend (threshold 100 frames each way, allowed_range 0.18)
    for k in range(n_sec):
        bl[2 * k + 1] = _extend_f0_np(
            multi[k], bl[2 * k + 1], min(f0_length - 2, bl[2 * k + 1] + 100),
            1, cands, 0.18)
        bl[2 * k] = _extend_f0_np(
            multi[k], bl[2 * k], max(1, bl[2 * k] - 100), -1, cands, 0.18)

    # ExtendSub: keep long-enough sections; mean_f0 carries residue
    # across iterations exactly like the C++ (src/harvest.cpp:840-856).
    count = 0
    mean_f0 = 0.0
    for k in range(n_sec):
        st, ed = bl[2 * k], bl[2 * k + 1]
        mean_f0 += multi[k, st:ed].sum()
        mean_f0 /= ed - st
        if 2200.0 / mean_f0 < ed - st:
            # swap into the kept prefix
            multi[[count, k]] = multi[[k, count]]
            bl[2 * count], bl[2 * k] = bl[2 * k], bl[2 * count]
            bl[2 * count + 1], bl[2 * k + 1] = bl[2 * k + 1], bl[2 * count + 1]
            count += 1
    n_kept = count
    if n_kept == 0:
        return step3

    # MergeF0 (src/harvest.cpp:937-963).  MakeSortedOrder is a literal
    # transcription: the swap targets fixed position i, so it is not a
    # textbook insertion sort — match it operation for operation.
    order = list(range(n_kept))
    for i in range(1, n_kept):
        for j in range(i - 1, -1, -1):
            if bl[2 * order[j]] > bl[2 * order[i]]:
                order[i], order[j] = order[j], order[i]
            else:
                break
    merged = multi[0].copy()
    b = list(bl)
    for i in range(1, n_kept):
        oi = order[i]
        if b[2 * oi] - b[1] > 0:
            merged[b[2 * oi]: b[2 * oi + 1] + 1] = \
                multi[oi, b[2 * oi]: b[2 * oi + 1] + 1]
            b[0] = b[2 * oi]
            b[1] = b[2 * oi + 1]
        else:
            b[1] = _merge_f0_sub_np(merged, b[0], b[1], multi[oi],
                                    b[2 * oi], b[2 * oi + 1], cands, scores)
    return merged


def _merge_f0_sub_np(merged, st1, ed1, f0_2, st2, ed2, cands, scores):
    """MergeF0Sub (src/harvest.cpp:912-932)."""
    if st1 <= st2 and ed1 >= ed2:
        return ed1
    score1 = score2 = 0.0
    for i in range(st2, ed1 + 1):
        score1 += _search_score_np(merged[i], cands[i], scores[i])
        score2 += _search_score_np(f0_2[i], cands[i], scores[i])
    if score1 > score2:
        merged[ed1: ed2 + 1] = f0_2[ed1: ed2 + 1]
    else:
        merged[st2: ed2 + 1] = f0_2[st2: ed2 + 1]
    return ed2


def _smooth_contour_np(f0):
    """Per-voiced-section zero-phase 2nd-order smoothing
    (src/harvest.cpp:1049-1113)."""
    b = np.array([0.0078202080334971724, 0.015640416066994345])
    a = np.array([1.7347257688092754, -0.76600660094326412])
    num = np.array([b[0], b[1], b[0]])
    den = np.array([1.0, -a[0], -a[1]])
    lag = 300
    n = f0.shape[0] + lag * 2
    contour = np.zeros(n)
    contour[lag: lag + f0.shape[0]] = f0
    out = np.zeros_like(f0)
    bl = _get_boundary_list(contour)
    for k in range(len(bl) // 2):
        st, ed = bl[2 * k], bl[2 * k + 1]
        x = contour.copy()
        x[:st] = x[st]
        x[ed + 1:] = x[ed]
        y1 = scipy.signal.lfilter(num, den, x)[::-1]
        y2 = scipy.signal.lfilter(num, den, y1)[::-1]
        out[st - lag: ed + 1 - lag] = y2[st: ed + 1]
    return out


