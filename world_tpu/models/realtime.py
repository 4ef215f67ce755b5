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

import atexit
import functools
import queue
import threading
import time
import weakref

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
    return _fast_noise_impl(base_key, refs, n, dtype)


def _fast_noise_impl(base_key, refs, n, dtype):
    return jax.vmap(lambda r: jax.random.normal(
        jax.random.fold_in(base_key, r), (n,), dtype))(refs)


@functools.partial(jax.jit, static_argnames=("fft_size", "fast_noise"))
def _response_batch(envs, ap_ratios, vuvs, noise_draws, noise_sizes,
                    dc_remover, *, fft_size, fast_noise=False):
    """All pulses of one render window in a single vmapped device call
    (the per-pulse dispatch was the streaming path's bottleneck).
    ``fast_noise``: see _span_batch."""
    if fast_noise:
        base_key, refs = noise_draws
        noise_draws = _fast_noise_impl(base_key, refs, fft_size,
                                       envs.dtype)
    return jax.vmap(lambda e, a, v, nd, ns: _response_kernel(
        e, a, v, nd, ns, dc_remover, fft_size=fft_size))(
            envs, ap_ratios, vuvs, noise_draws, noise_sizes)


def _lerp_params(param_buf, los, his, ws):
    """Per-pulse envelope/aperiodicity from DEVICE-RESIDENT parameter
    rows: env = lerp(|sp|), ap = lerp(clip(ap))^2 over the bracketing
    frames — the same arithmetic _pulse_env does on host, but reading
    rows uploaded once per AddParameters chunk instead of shipping
    (cap, fft/2+1) arrays with every render (~1 MB/call, 30-100 ms of
    tunnel time on the render critical path)."""
    R = param_buf.shape[1]
    sp_lo = param_buf[0, los % R]
    sp_hi = param_buf[0, his % R]
    ap_lo = param_buf[1, los % R]
    ap_hi = param_buf[1, his % R]
    w = ws[:, None]
    envs = (1.0 - w) * sp_lo + w * sp_hi
    aps = ((1.0 - w) * ap_lo + w * ap_hi) ** 2
    return envs, aps


@functools.partial(jax.jit, static_argnames=("fft_size", "fast_noise"))
def _response_batch_dev(param_buf, los, his, ws, vuvs, noise_draws,
                        noise_sizes, dc_remover, *, fft_size,
                        fast_noise=False):
    envs, aps = _lerp_params(param_buf, los, his, ws)
    return _response_batch(envs, aps, vuvs, noise_draws, noise_sizes,
                           dc_remover, fft_size=fft_size,
                           fast_noise=fast_noise)


@functools.partial(jax.jit, static_argnames=("fft_size", "span",
                                             "fast_noise"))
def _span_batch_dev(param_buf, los, his, ws, vuvs, noise_draws,
                    noise_sizes, dc_remover, offs, clips, *, fft_size,
                    span, fast_noise=False):
    envs, aps = _lerp_params(param_buf, los, his, ws)
    return _span_batch(envs, aps, vuvs, noise_draws, noise_sizes,
                       dc_remover, offs, clips, fft_size=fft_size,
                       span=span, fast_noise=fast_noise)


@functools.partial(jax.jit, donate_argnums=0)
def _ring_store(param_buf, rows, start):
    """Write a chunk's (2, F, half+1) parameter rows at ring rows
    (start + i) % R.  A row scatter (~30x a slice on TPU) is fine
    here: stores run at AddParameters time, off the render critical
    path, and F is small.  Donated: updates are in-place on device;
    the runtime serializes against in-flight readers."""
    R = param_buf.shape[1]
    F = rows.shape[1]
    idx = (start + jnp.arange(F)) % R
    return param_buf.at[:, idx, :].set(rows)


# Span buckets (samples) for the device-side OLA: every span length is
# padded up to one of these so only a handful of XLA programs ever
# compile.  Multiples of 1024 (the Pallas store block).
_SPAN_BUCKETS = (2048, 3072, 4096, 6144, 8192, 12288, 16384, 20480,
                 24576, 32768)


@functools.partial(jax.jit, static_argnames=("fft_size", "span",
                                             "fast_noise"))
def _span_batch(envs, ap_ratios, vuvs, noise_draws, noise_sizes,
                dc_remover, offs, clips, *, fft_size, span,
                fast_noise=False):
    """Render a batch of pulses AND overlap-add them into a contiguous
    waveform span ON DEVICE, so the host fetches ~4 bytes per sample of
    audio instead of 4*fft_size bytes per pulse (the per-pulse response
    fetch is ~10-40x more tunnel traffic and was the measured bottleneck
    of bulk streaming — ~1 MB per second of audio at 8-16 MB/s).

    ``offs[k]`` places pulse k's response at span sample offs[k]
    (0 <= off <= span - fft_size; callers segment batches to fit).
    ``clips[k]`` zeroes the response's first clips[k] samples — the
    reference's Synthesis2 truncates a pulse's contribution to samples
    at or after the 64-sample window that consumes it
    (src/synthesisrealtime.cpp:577-600: the ring add never reaches
    below buffer index 0), and the clip reproduces that exactly.
    Padded lanes (vuv=0, noise_size=0) contribute exact zeros.

    ``fast_noise=True``: noise_draws is (base_key, uint32 refs) and the
    draws are generated INSIDE this program — a separate noise call
    would chain a second ~27 ms dispatch in front of every render on
    the tunnel backend."""
    if fast_noise:
        base_key, refs = noise_draws
        noise_draws = _fast_noise_impl(base_key, refs, fft_size,
                                       envs.dtype)
    resp = jax.vmap(lambda e, a, v, nd, ns: _response_kernel(
        e, a, v, nd, ns, dc_remover, fft_size=fft_size))(
            envs, ap_ratios, vuvs, noise_draws, noise_sizes)
    resp = jnp.where(jnp.arange(fft_size)[None, :] >= clips[:, None],
                     resp, 0.0)
    if resp.dtype == jnp.float64:
        # Oracle path: scatter-add, same op family as the batch
        # synthesis f64 OLA (models/synthesis.py).
        targets = offs[:, None] + jnp.arange(fft_size)[None, :]
        return jnp.zeros(span, resp.dtype).at[targets].add(
            resp, mode="drop")
    from ..ops.pallas_ola import ola_accumulate
    return ola_accumulate(resp[None], offs[None].astype(jnp.int32),
                          y_padded=span)[0]


_live_workers = weakref.WeakSet()


@atexit.register
def _shutdown_workers():
    for w in list(_live_workers):
        w.shutdown()


class _RenderWorker:
    """Background device-render thread for streaming synthesis.

    On the TPU backend every device interaction — dispatch AND the
    fetch of an already-computed result — costs a ~30 ms tunnel round
    trip, an order of magnitude over a 64-sample buffer's 2.9 ms audio
    budget.  So ALL JAX work for a streaming synthesizer runs on this
    thread; the synthesis2 caller thread is numpy-only and communicates
    through queues.  Requests queued while a render is in flight are
    coalesced into ONE device call (response lanes are independent
    vmap lanes, so batch composition cannot change per-pulse values).
    The fetch pool completes batches out of submission order, so
    completion is tracked per-bid (see _loop).
    """

    _N_FETCHERS = 4  # concurrent device->host fetch threads

    def __init__(self, dispatch_fn, span_sink=None):
        self._dispatch = dispatch_fn
        # Called (on the MAIN thread, inside drain/wait) with
        # (base_sample, waveform) for device-OLA span results.
        self._span_sink = span_sink
        self._requests = queue.SimpleQueue()
        self._fetches = queue.SimpleQueue()
        self._results = queue.SimpleQueue()
        self._thread = None
        self._fetchers = []
        self._next_id = 0
        # Completed bids: everything below _done_mark plus the (small,
        # out-of-order) set above it — the set is pruned to a contiguous
        # watermark so day-long streams don't accumulate one entry per
        # batch forever.
        self._done = set()
        self._done_mark = 0
        self._n_done = 0
        # outstanding dispatched-not-fetched batches, bounded so a
        # burst cannot pile unbounded device work
        self._inflight = threading.Semaphore(8)
        _live_workers.add(self)

    def submit(self, keys, pulses):
        """Main thread: enqueue a render; returns its batch id."""
        if self._thread is None or not self._thread.is_alive():
            _live_workers.add(self)  # re-register after a shutdown()
            # The dispatch thread runs XLA COMPILES (first use of a
            # render bucket); LLVM's recursive passes can blow through
            # the 8 MB default thread stack (observed: segfault inside
            # backend_compile_and_load on this thread in long test
            # sessions) — give these threads a deep stack.
            old_stack = threading.stack_size()
            try:
                threading.stack_size(64 * 1024 * 1024)
            except (ValueError, RuntimeError):  # platform refuses: keep
                old_stack = None
            try:
                self._thread = threading.Thread(
                    target=self._loop, daemon=True,
                    name="world-tpu-render-worker")
                self._thread.start()
                for i in range(self._N_FETCHERS):
                    t = threading.Thread(
                        target=self._fetch_loop, daemon=True,
                        name=f"world-tpu-render-fetch-{i}")
                    t.start()
                    self._fetchers.append(t)
            finally:
                if old_stack is not None:
                    threading.stack_size(old_stack)
        bid = self._next_id
        self._next_id += 1
        self._requests.put((bid, keys, pulses))
        return bid

    def _loop(self):
        # Dispatch thread: coalesce queued requests into ONE device
        # call and hand the un-fetched handle to the fetcher pool.
        # On the TPU tunnel a fetch costs ~28 ms even for a ready
        # result, but concurrent fetches overlap (~3x measured), so
        # fetching happens on _N_FETCHERS parallel threads; batches may
        # therefore COMPLETE out of submission order, and completion is
        # tracked per-bid, not by a high-water mark.
        backlog = []
        stopping = False
        while True:
            if not backlog and not stopping:
                req = self._requests.get()  # idle: block for work
                if req is None:
                    stopping = True
                else:
                    backlog.append(req)
            while True:
                try:
                    req = self._requests.get_nowait()
                except queue.Empty:
                    break
                if req is None:
                    stopping = True
                else:
                    backlog.append(req)
            if backlog:
                self._inflight.acquire()
                reqs, backlog = backlog, []
                bids = [bid for bid, _, _ in reqs]
                keys = [k for _, ks, _ in reqs for k in ks]
                pulses = [p for _, _, ps in reqs for p in ps]
                try:
                    fetch = self._dispatch(pulses)
                    self._fetches.put((bids, keys, fetch))
                except BaseException as e:  # noqa: BLE001 — surface on main
                    self._inflight.release()
                    self._results.put((bids, keys, e))
            if stopping and not backlog and self._requests.empty():
                for _ in range(self._N_FETCHERS):
                    self._fetches.put(None)
                return

    def _fetch_loop(self):
        while True:
            item = self._fetches.get()
            if item is None:
                return
            bids, keys, fetch = item
            try:
                rows = fetch()
            except BaseException as e:  # noqa: BLE001 — surface on main
                rows = e
            self._inflight.release()
            self._results.put((bids, keys, rows))

    def shutdown(self):
        """Stop the threads after finishing queued work (a daemon
        thread caught inside an XLA call during interpreter teardown
        segfaults, so atexit joins every live worker first).  The join
        timeout must cover a worst-case FIRST compile of an unseen
        response bucket (30-300 s on the remote-compile tunnel) — a
        shorter timeout would recreate exactly the teardown segfault the
        join exists to prevent; call ``warmup()`` before streaming so
        shutdown never waits on a compile."""
        if self._thread is not None and self._thread.is_alive():
            self._requests.put(None)
            self._thread.join(timeout=600.0)
        for t in self._fetchers:
            if t.is_alive():
                t.join(timeout=600.0)
        self._fetchers = []
        self._thread = None
        _live_workers.discard(self)

    def _mark_done(self, bids):
        self._done.update(bids)
        self._n_done += len(bids)
        while self._done_mark in self._done:
            self._done.discard(self._done_mark)
            self._done_mark += 1

    def _is_done(self, bid):
        return bid < self._done_mark or bid in self._done

    def _absorb(self, item, into):
        bids, keys, rows = item
        self._mark_done(bids)
        if isinstance(rows, BaseException):
            # Revert the batch's keys to 'missing' so the owner's next
            # call re-stages and re-dispatches them — leaving the
            # ('pending', bid) markers would poison the cache forever
            # (blocking mode would KeyError, hold mode would livelock).
            for k in keys:
                into.pop(k, None)
            raise rows
        if isinstance(rows, tuple) and rows and rows[0] == "span":
            # Device-OLA result: the audio lands in the owner's span
            # accumulator; the keys just mark 'landed' (True).
            for base, wave in rows[1]:
                self._span_sink(base, wave)
            for k in keys:
                into[k] = True
            return
        for k, row in zip(keys, rows):
            into[k] = row

    def drain(self, into):
        """Main thread: non-blocking; move finished rows into ``into``."""
        while True:
            try:
                item = self._results.get_nowait()
            except queue.Empty:
                return
            self._absorb(item, into)

    def wait(self, bid, into):
        """Main thread: block until batch ``bid`` has completed."""
        while bid >= 0 and not self._is_done(bid):
            self._absorb(self._results.get(), into)

    def idle(self):
        return self._n_done == self._next_id

    def flush(self):
        """Main thread: block until every submitted render completed,
        discarding rows (used when the owner resets its cache)."""
        while self._n_done < self._next_id:
            self._absorb(self._results.get(), {})


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
                 lookahead_pulses=256, hold_on_miss=False,
                 dispatch_min_pulses=None, hold_force_ms=15.0,
                 span_render=True, span_min_pulses=8,
                 device_params="auto", param_ring_rows=4096):
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
        # hold_on_miss=True bounds per-call latency: when the next
        # window needs responses that are still rendering, synthesis2
        # returns False WITHOUT consuming state instead of blocking on
        # the ~30 ms device round trip; the audio stream then lags the
        # parameter feed by roughly that round trip (a fixed, bounded
        # priming latency) while every call stays sub-millisecond.
        # False keeps the reference's synchronous semantics
        # (src/synthesisrealtime.cpp:577-603): a miss blocks.
        if hold_on_miss and lookahead_pulses <= 0:
            # The hold path relies on _collect_lookahead to dispatch the
            # missing window's pulses; at lookahead 0 it collects
            # nothing and synthesis2 would return False forever.
            raise ValueError(
                "hold_on_miss requires lookahead_pulses >= 1 (the hold "
                "path renders the missing window via the lookahead walk)")
        self.hold_on_miss = hold_on_miss
        # Ahead-only render batches wait for this many pulses before
        # dispatching (amortizes the per-call round trip); window
        # misses and hold_on_miss dispatch regardless.
        self.dispatch_min = (max(1, min(lookahead_pulses, 64) // 2)
                             if dispatch_min_pulses is None
                             else dispatch_min_pulses)
        # hold_on_miss dispatch pacing: a held window waits at most this
        # long for more pulses to batch up before its render is forced —
        # it directly bounds the latency the hold policy can add on top
        # of the device round trip.
        self.hold_force_ms = hold_force_ms
        # Device-side OLA for batches of >= span_min_pulses pulses: the
        # batch's responses are summed into a waveform span on device
        # and only the span crosses the tunnel (~10-40x fewer bytes
        # than per-pulse response rows; see _span_batch).  Batches
        # below the threshold keep the per-pulse path (same bytes at
        # tiny sizes, and its response buckets are the warmed-up set).
        self.span_render = span_render
        self.span_min_pulses = max(1, span_min_pulses)
        # Span calls use a FIXED lane count (one compiled program per
        # span bucket).  One big call beats splitting: a split batch's
        # segments fetch SEQUENTIALLY inside one worker item (measured
        # 2x slower end-to-end than padding to 256 lanes — padded-lane
        # compute is ~5 ms of device time, a second tunnel round trip
        # is ~50 ms).
        cap = 1
        while cap < max(lookahead_pulses, self.span_min_pulses, 8):
            cap *= 2
        self._span_cap = cap
        self.dc_remover = jnp.asarray(_dc_remover_half(fft_size // 2, dtype))
        self.buffer = np.zeros(buffer_size * 2 + fft_size, dtype)
        self.chunks = {}
        # Device-resident parameters: |sp| and clipped ap rows live in
        # a (2, R, fft/2+1) device ring keyed by global frame index
        # mod R, uploaded ONCE per AddParameters chunk; render calls
        # then ship only per-pulse (lo, hi, w) indices instead of
        # (cap, fft/2+1) envelope arrays (~1 MB and 30-100 ms of
        # tunnel time per bulk render).  Batches referencing frames
        # older than R fall back to host envelopes transparently.
        # "auto" = float32 only (the TPU production path): the ring is
        # ~17 MB (f32), and a synthesizer that is never close()d stays
        # pinned by its worker threads — f64 oracle runs (tests) would
        # pay 34 MB per leaked instance for no tunnel to save.
        if device_params == "auto":
            device_params = np.dtype(dtype) == np.float32
        self._pring = max(64, param_ring_rows) if device_params else None
        self._pbuf = None  # allocated lazily on first bulk chunk
        self._plock = threading.Lock()
        # Only chunks of >= this many frames upload to the ring: a ring
        # store is a device dispatch (~27 ms on the tunnel), so storing
        # every 1-frame AddParameters would serialize the parameter
        # feed behind a donation chain (measured: frame-feed collapsed
        # to 0.2x RT).  Frame-by-frame streams keep the host-envelope
        # path (their per-render uploads are tiny anyway); bulk feeds
        # get the ring.  _pstored_through tracks contiguous stored
        # coverage so renders never read rows that were skipped.
        self._pstore_min = 8
        self._pstored_through = -1
        # Late binding so a subclass/monkeypatched _render_dispatch is
        # honored even when swapped in after construction.
        self._worker = _RenderWorker(
            lambda pulses: self._render_dispatch(pulses),
            span_sink=self._span_sink)
        self.refresh()

    # -- ring-buffer state ---------------------------------------------
    def refresh(self):
        """RefreshSynthesizer (src/synthesisrealtime.cpp:521-542)."""
        # Let in-flight renders finish so their rows cannot land in the
        # refreshed cache (the worker thread itself is reused).
        self._worker.flush()
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
        self._pstored_through = -1  # ring coverage restarts with frames
        # Span accumulator: landed device-OLA waveform spans, covering
        # samples [_acc_start, _acc_start + len(_acc)).  Emission adds
        # _acc's slice for the finished window into self.buffer.
        self._acc = np.zeros(0, self.dtype)
        self._acc_start = 0
        self._staged = {}  # key -> pulse params awaiting dispatch
        self._hold_t0 = None  # first hold time for the current window
        self.holds = 0  # hold_on_miss "not yet" returns (diagnostics)
        # Dispatch-threshold ramp: the first renders of a stream go out
        # as soon as ANY pulse is ready (1, 2, 4, ... pulses), doubling
        # until dispatch_min — priming latency is then one device round
        # trip instead of the time real-time feeding needs to
        # accumulate dispatch_min pulses (~80 ms at 16 pulses/200 Hz).
        self._ramp = 1
        # True once any render batch has been submitted; gates the
        # speculative first dispatch in add_parameters.
        self._primed = False
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

    def close(self):
        """Stop the worker's background threads after finishing queued
        work.  Long-lived processes that create many synthesizers must
        call this (or use the context manager) — otherwise each
        synthesizer's 5 daemon threads, and through them the
        synthesizer itself, stay pinned until interpreter exit."""
        self._worker.shutdown()
        self._pbuf = None  # free the parameter ring promptly

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

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
        if self._pring is not None \
                and chunk.f0_length >= self._pstore_min:
            rows = np.stack([np.abs(chunk.spectrogram),
                             np.clip(chunk.aperiodicity, 0.001,
                                     1.0 - 1e-12)]).astype(self.dtype)
            with self._plock:
                if self._pbuf is None:
                    self._pbuf = jnp.zeros(
                        (2, self._pring, self.fft_size // 2 + 1),
                        self.dtype)
                self._pbuf = _ring_store(self._pbuf, jnp.asarray(rows),
                                         chunk.f0_origin)
                if chunk.f0_origin <= self._pstored_through + 1:
                    self._pstored_through = max(
                        self._pstored_through,
                        chunk.f0_origin + chunk.f0_length - 1)

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
        # Speculative priming: before the stream's FIRST render, start
        # rendering the new pulses NOW, so the first synthesis2 call
        # finds its window already in flight instead of paying the full
        # device round trip then.  Output-invariant (renders are pure
        # functions of the pulse params + RNG refs).  Strictly
        # first-dispatch-only: doing this on EVERY add_parameters
        # re-walks all outstanding pulses per call and floods the
        # worker with threshold-sized batches, bypassing the
        # hold_force_ms batching — measured to halve paced frame-feed
        # throughput.  Steady-state dispatch policy stays untouched.
        if self.lookahead_pulses > 0 and not self._primed:
            params, keys = self._collect_lookahead()
            if keys:
                self._submit(keys, params)
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
        # (lo, hi==lo+1 except at exact frames, w) also index the
        # device parameter ring; w=0 at lo==hi makes the device lerp
        # read the same single row.
        return env, ap, vuv, lo, (lo if lo == hi else lo + 1), w

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

    def _pulse_arrays(self, pulses, cap, dev):
        """Pad a batch of pulse params to ``cap`` lanes and build the
        device inputs (env_args, vuvs, sizes, noise, fast).  Padded
        lanes carry vuv=0 / noise_size=0 and contribute exact zeros.
        ``dev``: env_args is (los, his, ws) indexing the device
        parameter ring (padded lanes read row 0 with w=0 — harmless,
        their responses are exact zeros); otherwise it is the
        materialized (envs, aps) host arrays.
        Fast-mode noise ships as (key, refs) and is generated INSIDE
        the render program (fast=True) — a separate noise dispatch
        would chain a second ~27 ms tunnel round trip per render."""
        fft = self.fft_size
        vuvs = np.zeros(cap, self.dtype)
        sizes = np.zeros(cap, np.int32)
        for k, p in enumerate(pulses):
            vuvs[k], sizes[k] = p[2], p[4]
        if dev:
            los = np.zeros(cap, np.int32)
            his = np.zeros(cap, np.int32)
            ws = np.zeros(cap, self.dtype)
            for k, p in enumerate(pulses):
                los[k], his[k], ws[k] = p[6], p[7], p[8]
            env_args = (jnp.asarray(los), jnp.asarray(his),
                        jnp.asarray(ws))
        else:
            envs = np.ones((cap, fft // 2 + 1), self.dtype)
            aps = np.ones((cap, fft // 2 + 1), self.dtype)
            for k, p in enumerate(pulses):
                envs[k], aps[k] = p[0], p[1]
            env_args = (jnp.asarray(envs), jnp.asarray(aps))

        fast = False
        if self.rng_mode == "exact":
            offsets = np.zeros(cap, np.int64)
            for k, p in enumerate(pulses):
                offsets[k] = p[3]
            draws = rng_ops.randn_blocks_at(jnp.asarray(offsets), fft)
            noise = jnp.asarray(draws, self.dtype)
        elif self.rng_mode == "fast":
            refs = np.zeros(cap, np.uint32)
            for k, p in enumerate(pulses):
                refs[k] = p[3]
            noise = (self._fast_key, jnp.asarray(refs))
            fast = True
        else:
            noise = jnp.zeros((cap, fft), self.dtype)
        return (env_args, jnp.asarray(vuvs), jnp.asarray(sizes), noise,
                fast)

    def _use_device_params(self, pulses):
        """Device-ring dispatch is valid when every pulse's bracketing
        frames were actually stored (contiguously, up to
        _pstored_through — small chunks skip the ring) and are still
        resident (newer than R frames ago); warmup pulses carry
        lo=None and always take the host path."""
        if self._pbuf is None:
            return False
        oldest = self.cumulative_frame - self._pring + 1
        return all(p[6] is not None and p[6] >= max(0, oldest)
                   and p[7] <= self._pstored_through
                   for p in pulses)

    def _render_dispatch(self, pulses):
        """Dispatch a batch of pulses (bucketed padding so only
        log-many shapes ever compile) and return a zero-arg FETCH
        closure (async — the worker's fetch pool calls it, which lets
        round trips overlap).

        pulses: list of (env, ap, vuv, rng_ref, noise_size, location).
        Small batches render per-pulse response rows; batches of
        >= span_min_pulses pulses with known locations render AND
        overlap-add on device (_span_batch), so the fetch moves the
        waveform span instead of (pulses, fft_size) response rows."""
        fft = self.fft_size
        p = len(pulses)
        if (self.span_render and p >= self.span_min_pulses
                and all(pl[5] is not None for pl in pulses)):
            return self._dispatch_span(pulses)
        cap = 1
        while cap < p:
            cap *= 2
        dev = self._use_device_params(pulses)
        env_args, vuvs, sizes, noise, fast = self._pulse_arrays(
            pulses, cap, dev)
        if dev:
            with self._plock:
                handle = _response_batch_dev(
                    self._pbuf, *env_args, vuvs, noise, sizes,
                    self.dc_remover, fft_size=fft, fast_noise=fast)
        else:
            handle = _response_batch(*env_args, vuvs, noise, sizes,
                                     self.dc_remover, fft_size=fft,
                                     fast_noise=fast)
        return lambda: np.asarray(handle)[:p]

    _SPAN_MAX = _SPAN_BUCKETS[-1]

    def _dispatch_span(self, pulses):
        """Device-OLA dispatch: segment the (location-sorted) batch so
        each segment's span fits the largest bucket, place each pulse
        at (loc - fft/2 + 1) relative to its segment base, clip its
        response to its consuming 64-sample window (the reference's
        ring-add truncation), and dispatch one _span_batch call per
        segment.  Returns a fetch closure yielding
        ("span", [(base_sample, waveform), ...])."""
        fft = self.fft_size
        bs = self.buffer_size
        # FIXED lane count: with cap constant, only one _span_batch
        # program per span bucket ever compiles (padded lanes cost ~a
        # ms of device compute, not tunnel bytes — the scarce resource).
        cap = self._span_cap
        # Walk order is location order, but a coalesced batch can mix an
        # error-retry with later requests; segmenting needs sorted locs
        # (span results are keyed-independent, so reordering is safe).
        pulses = sorted(pulses, key=lambda pl: pl[5])
        segments = []
        seg = []
        base = None
        for pl in pulses:
            start = pl[5] - fft // 2 + 1
            if seg and (start + fft - base > self._SPAN_MAX
                        or len(seg) == cap):
                segments.append((base, seg))
                seg, base = [], None
            if base is None:
                base = start
            seg.append(pl)
        if seg:
            segments.append((base, seg))

        handles = []
        for base, seg in segments:
            extent = (seg[-1][5] - fft // 2 + 1 - base) + fft
            span = next(b for b in _SPAN_BUCKETS if b >= min(
                extent, self._SPAN_MAX))
            offs = np.zeros(cap, np.int32)
            clips = np.zeros(cap, np.int32)
            for k, pl in enumerate(seg):
                loc = pl[5]
                offs[k] = loc - fft // 2 + 1 - base
                clips[k] = max(0, bs * (loc // bs) - (loc - fft // 2 + 1))
            dev = self._use_device_params(seg)
            env_args, vuvs, sizes, noise, fast = self._pulse_arrays(
                seg, cap, dev)
            if dev:
                with self._plock:
                    h = _span_batch_dev(
                        self._pbuf, *env_args, vuvs, noise, sizes,
                        self.dc_remover, jnp.asarray(offs),
                        jnp.asarray(clips), fft_size=fft, span=span,
                        fast_noise=fast)
            else:
                h = _span_batch(
                    *env_args, vuvs, noise, sizes, self.dc_remover,
                    jnp.asarray(offs), jnp.asarray(clips),
                    fft_size=fft, span=span, fast_noise=fast)
            handles.append((base, h))
        return lambda: ("span", [(b, np.asarray(h)) for b, h in handles])

    # -- span accumulator ------------------------------------------------
    def _span_sink(self, base, wave):
        """Absorb a landed device-OLA span (main thread, via the
        worker's drain/wait).  Contributions below _acc_start target
        already-emitted samples and are zeros by construction (the
        per-pulse clip) — dropped."""
        rel = base - self._acc_start
        if rel < 0:
            wave = wave[-rel:]
            rel = 0
        end = rel + len(wave)
        if end > len(self._acc):
            self._acc = np.concatenate(
                [self._acc,
                 np.zeros(max(end - len(self._acc), 8192), self.dtype)])
        self._acc[rel:end] += wave

    def _acc_emit(self, start, n):
        """Add the span accumulator's [start, start+n) samples into
        self.buffer[:n] and lazily compact the consumed prefix."""
        rel = start - self._acc_start
        if rel >= len(self._acc):
            return
        take = min(n, len(self._acc) - rel)
        self.buffer[:take] += self._acc[rel: rel + take]
        if rel + take >= 1 << 15:
            self._acc = self._acc[rel + take:].copy()
            self._acc_start = start + take

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

    def _window_probe(self):
        """Non-mutating mirror of the next window walk: 'ready' when
        every response the window needs is a materialized row in the
        cache, 'pending' when some are still rendering on the worker,
        'missing' when some were never dispatched."""
        ptr, i = self.current_pointer, self.i
        counters = (self._draw_counter, self._fast_step)
        loc = int(self._chunk(ptr).pulse_locations_index[i])
        end = self.synthesized_sample + self.buffer_size
        state = "ready"
        while loc < end:
            tmp = self._next_pulse_index_at(ptr, i)
            ns = tmp - loc
            ref, counters = self._predict_rng(self.rng_mode, counters, ns)
            v = self._resp_cache.get((ptr, i, ns, ref))
            if v is None:
                return "missing"
            if v is not True and not isinstance(v, np.ndarray):
                state = "pending"
            loc = tmp
            ptr, i, ok = self._advance_at(ptr, i)
            if not ok:
                break
        return state

    def _collect_lookahead(self, base=0):
        """Shadow-walk future pulses (all but the last known one, whose
        noise_size is provisional until the next pulse exists) with
        predicted RNG references; returns (params, keys) for the ones
        not yet cached or rendering, capped at lookahead_pulses - base.
        Updates the walk bookkeeping."""
        ptr, i = self.current_pointer, self.i
        counters = (self._draw_counter, self._fast_step)
        exhausted = False
        params, keys = [], []
        # Bound per-call walk work: pulses beyond the step cap get
        # rendered later, once consumption draws the horizon closer.
        steps = 4 * self.lookahead_pulses
        while len(keys) + base < self.lookahead_pulses and steps > 0:
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
            ref, counters = self._predict_rng(self.rng_mode, counters, ns)
            key = (ptr, i, ns, ref)
            if key not in self._resp_cache:
                p = self._staged.get(key)
                if p is None:
                    env, ap, vuv, lo, hi, w = self._pulse_env(
                        loc, ptr, ahead=True)
                    p = self._staged[key] = (env, ap, vuv, ref, ns, loc,
                                             lo, hi, w)
                params.append(p)
                keys.append(key)
            ptr, i, ok = self._advance_at(ptr, i)
            if not ok:
                exhausted = True
                break
        self._walk_epoch = self._pulse_epoch
        self._walk_exhausted = exhausted
        self._consumed_since_walk = 0
        return params, keys

    def warmup(self, max_pulses=None):
        """Compile and prime every response bucket this stream can hit
        (render batches are padded to powers of two, and each padded
        size is a separate XLA program whose FIRST use pays the remote
        compile — 30-300 s on the TPU tunnel; hitting an unseen bucket
        mid-stream would stall the audio for that long).  Real-time
        deployments call this once before streaming."""
        n = max(max_pulses or max(self.lookahead_pulses, 1), 1)
        half = self.fft_size // 2 + 1
        env = np.ones(half, self.dtype)
        apr = np.ones(half, self.dtype)
        scratch = {}
        # Per-pulse response buckets: with span rendering on, only
        # batches below span_min_pulses use them.
        rows_top = min(n, self.span_min_pulses) if self.span_render else n
        cap = 1
        while cap <= max(rows_top, 1):
            # one batch per bucket, waited on so the worker cannot
            # coalesce them into a single (largest-bucket) call
            bid = self._worker.submit(
                [("warmup", cap, k) for k in range(cap)],
                [(env, apr, 0.0, 0, 0, None, None, 0, 0.0)] * cap)
            self._worker.wait(bid, scratch)
            cap *= 2
        if self.span_render:
            # One zero-contribution batch per span bucket (vuv=0 /
            # noise_size=0 lanes add exact zeros to the accumulator).
            fft = self.fft_size
            m = self.span_min_pulses
            for span in _SPAN_BUCKETS:
                locs = np.linspace(fft // 2, fft // 2 + span - fft,
                                   m).astype(int)
                bid = self._worker.submit(
                    [("warmup_span", span, k) for k in range(m)],
                    [(env, apr, 0.0, 0, 0, int(lc), None, 0, 0.0)
                     for lc in locs])
                self._worker.wait(bid, scratch)
        return self

    def _submit(self, keys, params):
        """Queue a render on the worker; mark its keys as pending."""
        bid = self._worker.submit(keys, params)
        self._primed = True
        for k in keys:
            self._resp_cache[k] = ("pending", bid)
            self._staged.pop(k, None)
        if self._ramp < self.dispatch_min:
            self._ramp *= 2
        return bid

    @property
    def _dispatch_threshold(self):
        return min(self.dispatch_min, self._ramp)

    def synthesis2(self):
        """Synthesis2 (src/synthesisrealtime.cpp:577-603).  On success the
        first buffer_size samples of self.buffer are the new audio.

        All device work rides self._worker (a background thread): ahead
        renders are fire-and-forget; a window miss blocks on its batch
        (reference semantics) unless hold_on_miss, where it returns
        False without consuming state until the responses land."""
        self._worker.drain(self._resp_cache)
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

        if self.hold_on_miss:
            state = self._window_probe()
            if state != "ready":
                now = time.perf_counter()
                if self._hold_t0 is None:
                    self._hold_t0 = now
                if state == "missing":
                    # Batch up arriving pulses for up to hold_force_ms
                    # (or until dispatch_min accumulate), then render:
                    # the hold adds at most hold_force_ms of latency on
                    # top of the device round trip.
                    force = 1e3 * (now - self._hold_t0) \
                        >= self.hold_force_ms
                    if force or self._walk_epoch != self._pulse_epoch:
                        params, keys = self._collect_lookahead()
                        if keys and (force
                                     or len(keys)
                                     >= self._dispatch_threshold):
                            self._submit(keys, params)
                            self._hold_t0 = now  # bound restarts per batch
                self._worker.drain(self._resp_cache)
                state = self._window_probe()
                if state != "ready":
                    self.holds += 1
                    return False
            self._hold_t0 = None

        bs, fft = self.buffer_size, self.fft_size
        self.buffer[: bs + fft] = self.buffer[bs: 2 * bs + fft]

        c = self._chunk(self.current_pointer)
        current_location = int(c.pulse_locations_index[self.i])
        window, to_render, render_keys = [], [], []
        while current_location < self.synthesized_sample + bs:
            at = (self.current_pointer, self.i)
            tmp = self._next_pulse_index()
            noise_size = tmp - current_location
            env, ap, vuv, lo, hi, w = self._pulse_env(
                current_location, at[0])
            ref = self._rng_ref(noise_size)
            key = (at[0], at[1], noise_size, ref)
            window.append((current_location, key))
            if key not in self._resp_cache:
                to_render.append((env, ap, vuv, ref, noise_size,
                                  current_location, lo, hi, w))
                render_keys.append(key)
            current_location = tmp
            self._consumed_since_walk += 1
            if not self._update():
                break

        # Lookahead: render future pulses ahead of consumption — one
        # coalesced device call covers many render windows, which is
        # what makes 64-sample buffers real-time.  The walk is skipped
        # when nothing changed since the last one (no new pulses, no
        # window miss, horizon still ahead of consumption): in a fully
        # cached steady state synthesis2 then does O(window) host work
        # instead of O(lookahead) per call.
        need_walk = bool(to_render) or (
            self._walk_epoch != self._pulse_epoch
            or (not self._walk_exhausted
                and 2 * self._consumed_since_walk >= self.lookahead_pulses))
        ahead_params, ahead_keys = [], []
        if self.lookahead_pulses and need_walk:
            ahead_params, ahead_keys = self._collect_lookahead(
                base=len(to_render))

        # Dispatch policy: a window miss forces a render (and takes the
        # gathered lookahead along for free); ahead-only batches are
        # fire-and-forget but wait for dispatch_min pulses to
        # accumulate (frame-by-frame feeding otherwise dispatches a
        # 1-2 pulse render after every AddParameters).
        if to_render or len(ahead_params) >= self._dispatch_threshold:
            bid = self._submit(render_keys + ahead_keys,
                               to_render + ahead_params)
            if to_render:
                self._worker.wait(bid, self._resp_cache)
        for loc, key in window:
            resp = self._resp_cache.pop(key)
            if resp is not True and not isinstance(resp, np.ndarray):
                self._worker.wait(resp[1], self._resp_cache)  # rendering
                resp = self._resp_cache.pop(key)
            if resp is True:
                continue  # device-OLA pulse: audio already in _acc
            offset = loc - self.synthesized_sample - fft // 2 + 1
            lo = max(0, -offset)
            self.buffer[lo + offset: fft + offset] += resp[lo:]
        self._acc_emit(self.synthesized_sample, bs)
        if len(self._resp_cache) > 4 * max(self.lookahead_pulses, 64):
            # Stale keys from rewound streams.  Only drop materialized
            # ROWS: a landed span marker (True) stands for audio already
            # accumulated in _acc — dropping it would re-render and
            # double-add — and an in-flight ('pending', bid) marker
            # would reappear when its batch lands anyway.
            for k in [k for k, v in self._resp_cache.items()
                      if isinstance(v, np.ndarray)]:
                del self._resp_cache[k]
            self._staged.clear()
            self._walk_epoch = -1  # force a fresh lookahead walk
        self.synthesized_sample += bs
        # The reference calls SeekSynthesizer(synthesized_sample) here with
        # samples where seconds are expected, so it never matches a frame
        # and is a no-op (src/synthesisrealtime.cpp:601); keep that.
        return True
