"""Streaming (real-time) synthesizer.

Reference src/synthesisrealtime.cpp: parameters arrive in chunks through
a ring buffer; Synthesis2 renders exactly buffer_size samples per call,
carrying pulse phase and F0 across chunk boundaries.

TPU mapping: the ring-buffer bookkeeping, chunk time base and pulse
scheduling are host state (tiny, O(frames) work); the per-pulse
response — two minimum-phase analyses + three FFTs — is a jitted device
kernel shared in spirit with the batch path but with the realtime
variants: no fractional time shift, +eps inside the aperiodic log, and
the subtract-only second-half DC removal (src/synthesisrealtime.cpp:
138-182).  Exact-mode RNG tracks the stream with a draw counter and
jumps there in O(log n).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import rng as rng_ops
from ..ops.common import minimum_phase_spectrum
from ..ops.matlab import fftshift


def _np_interp1(x, y, xi):
    """interp1 with histc semantics (matches ops.matlab.interp1), numpy."""
    k = np.clip(np.searchsorted(x, xi, side="right"), 1, len(x) - 1)
    x0 = x[k - 1]
    s = (xi - x0) / (x[k] - x0)
    return y[k - 1] + s * (y[k] - y[k - 1])


def _dc_remover_half(n, dtype=np.float64):
    """GetDCRemover(fft_size/2) (src/synthesisrealtime.cpp:428-440)."""
    i = np.arange(n // 2)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (i + 1.0) / (1.0 + n))
    w = w / (2.0 * w.sum())
    return np.concatenate([w, w[::-1]]).astype(dtype)


def _response_kernel(env, ap_ratio, current_vuv, noise_draws, noise_size,
                     dc_remover, *, fft_size):
    """GetOneFrameSegment, realtime flavor
    (src/synthesisrealtime.cpp:246-281)."""
    dtype = env.dtype
    half = fft_size // 2

    logspec = jnp.log(env * (1.0 - ap_ratio)
                      + config.K_MY_SAFE_GUARD_MINIMUM) / 2.0
    mp = minimum_phase_spectrum(logspec, fft_size)
    periodic = jnp.fft.irfft(mp, n=fft_size) * fft_size
    periodic = fftshift(periodic)
    dc = jnp.sum(periodic[half:])
    upper = jnp.arange(fft_size) >= half
    periodic = jnp.where(upper, periodic, 0.0) \
        - dc * jnp.concatenate([jnp.zeros(half, dtype), dc_remover])
    skip = (current_vuv <= 0.5) | (ap_ratio[0] > 0.999)
    periodic = jnp.where(skip, 0.0, periodic)

    i = jnp.arange(fft_size)
    in_noise = i < noise_size
    noise = jnp.where(in_noise, noise_draws, 0.0)
    mean = jnp.sum(noise) / jnp.maximum(noise_size, 1)
    noise = jnp.where(in_noise, noise - mean, 0.0)
    noise_spec = jnp.fft.rfft(noise)
    ap_log = jnp.where(
        current_vuv != 0.0,
        jnp.log(env * ap_ratio + config.K_MY_SAFE_GUARD_MINIMUM) / 2.0,
        jnp.log(env) / 2.0)
    mp_ap = minimum_phase_spectrum(ap_log, fft_size)
    aperiodic = fftshift(jnp.fft.irfft(mp_ap * noise_spec, n=fft_size)
                         * fft_size)

    return (periodic * jnp.sqrt(noise_size.astype(dtype)) + aperiodic) \
        / fft_size


@functools.partial(jax.jit, static_argnames=("n", "dtype"))
def _fast_noise(base_key, refs, n, dtype):
    """Per-pulse fast-mode noise blocks in one fused device call."""
    return jax.vmap(lambda r: jax.random.normal(
        jax.random.fold_in(base_key, r), (n,), dtype))(refs)


@functools.partial(jax.jit, static_argnames=("fft_size",))
def _response_batch(envs, ap_ratios, vuvs, noise_draws, noise_sizes,
                    dc_remover, *, fft_size):
    """All pulses of one render window in a single vmapped device call
    (the per-pulse dispatch was the streaming path's bottleneck)."""
    return jax.vmap(lambda e, a, v, nd, ns: _response_kernel(
        e, a, v, nd, ns, dc_remover, fft_size=fft_size))(
            envs, ap_ratios, vuvs, noise_draws, noise_sizes)


class _Chunk:
    __slots__ = ("f0_length", "f0_origin", "spectrogram", "aperiodicity",
                 "interpolated_vuv", "pulse_locations",
                 "pulse_locations_index", "number_of_pulses", "start_sample")

    def __init__(self):
        self.number_of_pulses = 0
        self.interpolated_vuv = None
        self.pulse_locations = None
        self.pulse_locations_index = None


class StreamingSynthesizer:
    """WorldSynthesizer / AddParameters / Synthesis2 / IsLocked
    (reference src/world/synthesisrealtime.h, src/synthesisrealtime.cpp)."""

    def __init__(self, fs, frame_period, fft_size, buffer_size,
                 number_of_pointers, rng_mode="exact", dtype=np.float64,
                 lookahead_pulses=256):
        self.fs = fs
        self.frame_period = frame_period / 1000.0
        self.fft_size = fft_size
        self.buffer_size = buffer_size
        self.number_of_pointers = number_of_pointers
        self.rng_mode = rng_mode
        self.dtype = dtype
        # Render up to this many future pulses per device call and cache
        # them — a render call has fixed dispatch latency, so small
        # buffer sizes (64 samples ~ 3 ms) can only hit real time when
        # one call covers many windows.  0 disables.
        self.lookahead_pulses = lookahead_pulses
        self.dc_remover = jnp.asarray(_dc_remover_half(fft_size // 2, dtype))
        self.buffer = np.zeros(buffer_size * 2 + fft_size, dtype)
        self.chunks = {}
        self.refresh()

    # -- ring-buffer state ---------------------------------------------
    def refresh(self):
        """RefreshSynthesizer (src/synthesisrealtime.cpp:521-542)."""
        self.chunks.clear()
        self.handoff_phase = 0.0
        self.handoff_f0 = 0.0
        self.cumulative_frame = -1
        self.last_location = 0
        self.current_pointer = 0
        self.current_pointer2 = 0
        self.head_pointer = 0
        self.handoff = 0
        self.i = 0
        self.synthesized_sample = 0
        self.buffer[:] = 0.0
        self._draw_counter = 0
        self._fast_key = jax.random.PRNGKey(3)
        self._fast_step = 0
        self._resp_cache = {}
        # Lookahead walk bookkeeping: the shadow-walk over future pulses
        # only needs to re-run when new pulses arrive (_pulse_epoch
        # bumps), when a render window has a cache miss, or when a
        # cap-limited walk's horizon must advance with consumption.
        # Without this, every 64-sample render call re-walks every known
        # future pulse in Python — the dominant cost of a fully cached
        # steady state.
        self._pulse_epoch = 0
        self._walk_epoch = -1
        self._walk_exhausted = False
        self._consumed_since_walk = 0

    def is_locked(self):
        """IsLocked (src/synthesisrealtime.cpp:566-575)."""
        full = (self.head_pointer - self.current_pointer2
                == self.number_of_pointers)
        starved = (self.synthesized_sample + self.buffer_size
                   >= self.last_location)
        return full and starved

    def add_parameters(self, f0, spectrogram, aperiodicity):
        """AddParameters (src/synthesisrealtime.cpp:480-519).
        Returns False when the ring is full."""
        if self.head_pointer - self.current_pointer2 \
                == self.number_of_pointers:
            return False
        f0 = np.asarray(f0, self.dtype)
        chunk = _Chunk()
        chunk.f0_length = len(f0)
        chunk.f0_origin = self.cumulative_frame + 1
        self.cumulative_frame += len(f0)
        chunk.spectrogram = np.asarray(spectrogram, self.dtype)
        chunk.aperiodicity = np.asarray(aperiodicity, self.dtype)
        self.chunks[self.head_pointer] = chunk

        if self.cumulative_frame < 1:
            self.handoff_f0 = f0[-1]
            self.head_pointer += 1
            self.handoff = 1
            return True

        start_sample = max(0, int(np.ceil(
            (self.cumulative_frame - len(f0)) * self.frame_period * self.fs)))
        end_sample = int(np.ceil(
            self.cumulative_frame * self.frame_period * self.fs))
        n = end_sample - start_sample
        chunk.start_sample = start_sample
        self._get_time_base(f0, chunk, start_sample, n)
        # GetTimeBase stores the interpolated f0 into handoff_f0, but
        # AddParameters immediately overwrites it with the raw last frame
        # value (src/synthesisrealtime.cpp:372,515) — keep the effective one.
        self.handoff_f0 = f0[-1]
        self.head_pointer += 1
        self.handoff = 1
        self._pulse_epoch += 1
        return True

    def _get_time_base(self, f0, chunk, start_sample, n):
        """GetTimeBase (src/synthesisrealtime.cpp:341-378)."""
        h = self.handoff
        cum0 = max(0, self.cumulative_frame - len(f0))
        coarse_time = np.empty(len(f0) + h)
        coarse_f0 = np.empty(len(f0) + h)
        coarse_vuv = np.empty(len(f0) + h)
        if h:
            coarse_f0[0] = self.handoff_f0
            coarse_time[0] = cum0 * self.frame_period
            coarse_vuv[0] = 0.0 if self.handoff_f0 == 0 else 1.0
        coarse_time[h:] = (np.arange(len(f0)) + cum0 + h) * self.frame_period
        coarse_f0[h:] = f0
        coarse_vuv[h:] = np.where(f0 == 0.0, 0.0, 1.0)

        time_axis = (np.arange(n) + start_sample) / self.fs
        if0 = _np_interp1(coarse_time, coarse_f0, time_axis)
        ivuv = _np_interp1(coarse_time, coarse_vuv, time_axis)
        ivuv = np.where(ivuv > 0.5, 1.0, 0.0)
        if0 = np.where(ivuv == 0.0, config.K_DEFAULT_F0, if0)
        vuv_store = np.empty(n + 1)
        vuv_store[:n] = ivuv
        vuv_store[n] = ivuv[-1]
        chunk.interpolated_vuv = vuv_store

        # GetPulseLocationsForTimeBase (src/synthesisrealtime.cpp:298-339)
        if h:
            # Accumulate *starting from* handoff_phase so each step does a
            # single rounding, exactly like the C++ running sum.
            total = np.cumsum(np.concatenate(
                [[self.handoff_phase], 2.0 * np.pi * if0[: n - 1 + h]
                 / self.fs]))
        else:
            total = np.cumsum(2.0 * np.pi * if0 / self.fs)
        self.handoff_phase = total[n - 1 + h]
        wrap = np.mod(total, 2.0 * np.pi)
        jumps = np.abs(np.diff(wrap)) > np.pi
        pulse_samples = np.where(jumps)[0]
        locs = time_axis[pulse_samples] - h / self.fs if len(pulse_samples) \
            else np.empty(0)
        # careful: time_axis index is i, but with handoff the pulse time is
        # time_axis[i] - handoff/fs (src/synthesisrealtime.cpp:322-328)
        chunk.pulse_locations = locs
        # matlab_round, not np.round: half-to-even differs at exact .5
        # (src/synthesisrealtime.cpp:326-328); locations are >= 0.
        idx = np.floor(locs * self.fs + 0.5).astype(np.int64)
        chunk.pulse_locations_index = idx
        chunk.number_of_pulses = len(idx)
        if len(idx):
            self.last_location = int(idx[-1])
        self._last_interp_f0 = if0[-1]

    # -- rendering -------------------------------------------------------
    def _chunk(self, pointer):
        return self.chunks.get(pointer)

    def _seek(self, current_location):
        """SeekSynthesizer (src/synthesisrealtime.cpp:101-117).

        Note: the C++ caller at the end of Synthesis2 passes *samples*
        where this expects seconds, making that call a no-op; we call
        this with seconds only from the per-pulse path, matching the
        effective behavior."""
        frame = int(current_location / self.frame_period)
        tmp_pointer = self.current_pointer2
        for i in range(self.head_pointer - self.current_pointer2):
            p = tmp_pointer + i
            c = self._chunk(p)
            if c.f0_origin <= frame < c.f0_origin + c.f0_length:
                tmp_pointer = p
                break
        # ClearRingBuffer frees pulse arrays but keeps chunk metadata and
        # the caller-owned parameter arrays (src/synthesisrealtime.cpp:
        # 81-99); prune fully out-of-reach chunks to bound memory.
        # Clearing is bounded by the CONSUMPTION pointer: a lookahead
        # seek must never destroy pulses the render walk hasn't reached.
        reach = min(self.current_pointer, tmp_pointer)
        for p in range(self.current_pointer2, reach):
            c = self._chunk(p)
            if c is not None:
                c.number_of_pulses = 0
                c.pulse_locations = None
                c.pulse_locations_index = None
        for p in [k for k in self.chunks if k < reach - 1]:
            del self.chunks[p]
        self.current_pointer2 = tmp_pointer

    def _frame_pointer(self, frame):
        """Non-mutating SeekSynthesizer lookup: the ring pointer whose
        chunk contains ``frame`` (for lookahead rendering, which must
        not advance current_pointer2 past frames the consumption walk
        still needs)."""
        for p in range(self.current_pointer2, self.head_pointer):
            c = self._chunk(p)
            if c is not None and \
                    c.f0_origin <= frame < c.f0_origin + c.f0_length:
                return p
        return self.current_pointer2

    def _search(self, frame, which, pointer=None):
        """SearchPointer (src/synthesisrealtime.cpp:119-136)."""
        p = self.current_pointer2 if pointer is None else pointer
        c = self._chunk(p)
        index = frame - c.f0_origin
        arr = c.spectrogram if which == 0 else c.aperiodicity
        front = arr[index]
        if index == c.f0_length - 1:
            nc = self._chunk(p + 1)
            nxt = (nc.spectrogram if which == 0 else nc.aperiodicity)[0]
        else:
            nxt = arr[index + 1]
        return front, nxt

    def _pulse_env(self, current_location, pointer, ahead=False):
        """Host-side parameter interpolation for one pulse: the frame
        lerp of envelope/aperiodicity and the vuv lookup
        (src/synthesisrealtime.cpp:246-281, 230-241).  ``pointer`` is
        the ring pointer whose chunk contains the pulse.  ``ahead``
        pulses use a non-mutating frame lookup (the consumption-path
        seek state must not move past frames still to be consumed)."""
        t = current_location / self.fs
        fp = self.frame_period
        lo = int(t / fp)
        if ahead:
            p2 = self._frame_pointer(lo)
        else:
            self._seek(t)
            p2 = None
        hi = int(np.ceil(t / fp))
        w = t / fp - lo
        sf, sn = self._search(lo, 0, p2)
        af, an = self._search(lo, 1, p2)
        if lo == hi:
            env = np.abs(sf)
            ap = np.clip(af, 0.001, 1 - 1e-12) ** 2
        else:
            env = (1 - w) * np.abs(sf) + w * np.abs(sn)
            ap = ((1 - w) * np.clip(af, 0.001, 1 - 1e-12)
                  + w * np.clip(an, 0.001, 1 - 1e-12)) ** 2

        # GetCurrentVUV (src/synthesisrealtime.cpp:230-241)
        c = self._chunk(pointer)
        start_sample = max(0, int(np.ceil(
            (c.f0_origin - 1) * self.frame_period * self.fs)))
        vuv = float(c.interpolated_vuv[current_location - start_sample + 1])
        return env, ap, vuv

    def _rng_ref(self, noise_size):
        """Allocate the pulse's RNG reference in stream order (mutates
        the counters; _predict_rng must mirror this)."""
        if self.rng_mode == "exact":
            ref = self._draw_counter
            self._draw_counter += max(noise_size, 0)
        elif self.rng_mode == "fast":
            self._fast_step += 1
            ref = self._fast_step
        else:
            ref = 0
        return ref

    @staticmethod
    def _predict_rng(rng_mode, counters, noise_size):
        """Shadow-walk version of _rng_ref: (ref, next_counters)."""
        draw, fast = counters
        if rng_mode == "exact":
            return draw, (draw + max(noise_size, 0), fast)
        if rng_mode == "fast":
            return fast + 1, (draw, fast + 1)
        return 0, counters

    def _render_pulses(self, pulses):
        """Render a window's pulses with ONE vmapped device call
        (bucketed padding so only log-many shapes ever compile).

        pulses: list of (env, ap, vuv, rng_ref, noise_size).  Padded
        lanes carry vuv=0 / noise_size=0 and contribute exact zeros.
        Returns (P, fft_size) responses."""
        fft = self.fft_size
        p = len(pulses)
        cap = 1
        while cap < p:
            cap *= 2
        envs = np.ones((cap, fft // 2 + 1), self.dtype)
        aps = np.ones((cap, fft // 2 + 1), self.dtype)
        vuvs = np.zeros(cap, self.dtype)
        sizes = np.zeros(cap, np.int32)
        for k, (env, ap, vuv, _, ns) in enumerate(pulses):
            envs[k], aps[k], vuvs[k], sizes[k] = env, ap, vuv, ns

        if self.rng_mode == "exact":
            offsets = np.zeros(cap, np.int64)
            for k, (_, _, _, ref, ns) in enumerate(pulses):
                offsets[k] = ref
            draws = rng_ops.randn_blocks_at(jnp.asarray(offsets), fft)
            draws = jnp.asarray(draws, self.dtype)
        elif self.rng_mode == "fast":
            refs = np.zeros(cap, np.uint32)
            for k, (_, _, _, ref, ns) in enumerate(pulses):
                refs[k] = ref
            # One fused call — an eager per-pulse fold_in loop costs a
            # full dispatch each on this backend.
            draws = _fast_noise(self._fast_key, jnp.asarray(refs), fft,
                                jnp.dtype(self.dtype).name)
        else:
            draws = jnp.zeros((cap, fft), self.dtype)

        resp = _response_batch(
            jnp.asarray(envs), jnp.asarray(aps), jnp.asarray(vuvs),
            draws, jnp.asarray(sizes), self.dc_remover, fft_size=fft)
        return np.asarray(resp)[:p]

    def _next_pulse_index_at(self, pointer, i):
        """GetNextPulseLocationIndex (src/synthesisrealtime.cpp:380-393)
        at an explicit walk position."""
        c = self._chunk(pointer)
        if i < c.number_of_pulses - 1:
            return int(c.pulse_locations_index[i + 1])
        if pointer == self.head_pointer - 1:
            return 0
        for k in range(1, self.number_of_pointers):
            c = self._chunk(pointer + k)
            if c is not None and c.number_of_pulses != 0:
                return int(c.pulse_locations_index[0])
        return 0

    def _advance_at(self, pointer, i):
        """UpdateSynthesizer's walk step (src/synthesisrealtime.cpp:
        395-413) without mutating: returns (pointer, i, ok)."""
        c = self._chunk(pointer)
        if i < c.number_of_pulses - 1:
            return pointer, i + 1, True
        if pointer == self.head_pointer - 1:
            return pointer, i, False
        for k in range(1, self.number_of_pointers):
            c = self._chunk(pointer + k)
            if c is not None and c.number_of_pulses != 0:
                return pointer + k, 0, True
        return pointer, i, False

    def _next_pulse_index(self):
        return self._next_pulse_index_at(self.current_pointer, self.i)

    def _update(self):
        self.current_pointer, self.i, ok = self._advance_at(
            self.current_pointer, self.i)
        return ok

    def synthesis2(self):
        """Synthesis2 (src/synthesisrealtime.cpp:577-603).  On success the
        first buffer_size samples of self.buffer are the new audio."""
        # CheckSynthesizer (src/synthesisrealtime.cpp:415-426)
        if self.synthesized_sample + self.buffer_size >= self.last_location:
            return False
        c = self._chunk(self.current_pointer)
        while c is not None and c.number_of_pulses == 0:
            if self.current_pointer == self.head_pointer:
                break
            self.current_pointer += 1
            c = self._chunk(self.current_pointer)
        if c is None or c.number_of_pulses == 0:
            return False

        bs, fft = self.buffer_size, self.fft_size
        self.buffer[: bs + fft] = self.buffer[bs: 2 * bs + fft]

        c = self._chunk(self.current_pointer)
        current_location = int(c.pulse_locations_index[self.i])
        window, to_render, render_keys = [], [], []
        while current_location < self.synthesized_sample + bs:
            at = (self.current_pointer, self.i)
            tmp = self._next_pulse_index()
            noise_size = tmp - current_location
            env, ap, vuv = self._pulse_env(current_location, at[0])
            ref = self._rng_ref(noise_size)
            key = (at[0], at[1], noise_size, ref)
            window.append((current_location, key))
            if key not in self._resp_cache:
                to_render.append((env, ap, vuv, ref, noise_size))
                render_keys.append(key)
            current_location = tmp
            self._consumed_since_walk += 1
            if not self._update():
                break

        # Lookahead: shadow-walk future pulses (all but the last known
        # one, whose noise_size is provisional until the next pulse
        # exists) with predicted RNG references, and render them in the
        # SAME device call — one dispatch then covers many render
        # windows, which is what makes 64-sample buffers real-time.
        # The walk is skipped when nothing changed since the last one
        # (no new pulses, no window miss, horizon still ahead of
        # consumption): in a fully cached steady state synthesis2 then
        # does O(window) host work instead of O(lookahead) per call.
        need_walk = bool(to_render) or (
            self._walk_epoch != self._pulse_epoch
            or (not self._walk_exhausted
                and 2 * self._consumed_since_walk >= self.lookahead_pulses))
        ahead_params, ahead_keys = [], []
        if self.lookahead_pulses and need_walk:
            ptr, i = self.current_pointer, self.i
            counters = (self._draw_counter, self._fast_step)
            exhausted = False
            # Bound per-call walk work: pulses beyond the step cap get
            # rendered later, once consumption draws the horizon closer.
            steps = 4 * self.lookahead_pulses
            while (len(ahead_keys) + len(to_render)
                   < self.lookahead_pulses) and steps > 0:
                steps -= 1
                ca = self._chunk(ptr)
                if ca is None or ca.number_of_pulses == 0:
                    exhausted = True
                    break
                loc = int(ca.pulse_locations_index[i])
                tmp = self._next_pulse_index_at(ptr, i)
                if tmp == 0:
                    exhausted = True
                    break
                ns = tmp - loc
                ref, counters = self._predict_rng(self.rng_mode,
                                                  counters, ns)
                key = (ptr, i, ns, ref)
                if key not in self._resp_cache:
                    env, ap, vuv = self._pulse_env(loc, ptr, ahead=True)
                    ahead_params.append((env, ap, vuv, ref, ns))
                    ahead_keys.append(key)
                ptr, i, ok = self._advance_at(ptr, i)
                if not ok:
                    exhausted = True
                    break
            self._walk_epoch = self._pulse_epoch
            self._walk_exhausted = exhausted
            self._consumed_since_walk = 0

        # Dispatch policy: a window miss forces a render (and takes the
        # gathered lookahead along for free); ahead-only batches wait
        # until enough pulses accumulate to amortize the call's fixed
        # dispatch cost (frame-by-frame feeding otherwise dispatches a
        # 1-2 pulse render after every AddParameters).
        ahead_min = max(1, min(self.lookahead_pulses, 64) // 2)
        if to_render or len(ahead_params) >= ahead_min:
            batch = to_render + ahead_params
            resps = self._render_pulses(batch)
            for key, resp in zip(render_keys + ahead_keys, resps):
                self._resp_cache[key] = resp
        for loc, key in window:
            resp = self._resp_cache.pop(key)
            offset = loc - self.synthesized_sample - fft // 2 + 1
            lo = max(0, -offset)
            self.buffer[lo + offset: fft + offset] += resp[lo:]
        if len(self._resp_cache) > 4 * max(self.lookahead_pulses, 64):
            self._resp_cache.clear()  # stale keys from rewound streams
            self._walk_epoch = -1  # force a fresh lookahead walk
        self.synthesized_sample += bs
        # The reference calls SeekSynthesizer(synthesized_sample) here with
        # samples where seconds are expected, so it never matches a frame
        # and is a no-op (src/synthesisrealtime.cpp:601); keep that.
        return True
