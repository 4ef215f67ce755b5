import numpy as np

from world_tpu.models.realtime import StreamingSynthesizer


def snr_db(ref, y):
    return 10 * np.log10(np.sum(ref**2) / np.sum((ref - y) ** 2))


def _run_all_at_once(gold, n_pointers=1, buffer_size=64):
    """test.cpp variant 2: queue everything, 1 ring slot."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_length = gold["synthesis2_y"].shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"),
                                 buffer_size, n_pointers)
    out = np.zeros(y_length)
    index = 0
    i = 0
    n = len(f0)
    while i < n:
        if synth.add_parameters(f0[i:], sp[i:], ap[i:]):
            i = n
        while synth.synthesis2():
            take = min(buffer_size, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += buffer_size
    return out


def _run_frame_by_frame(gold, n_pointers=100, buffer_size=64):
    """test.cpp variant 3: frame-by-frame streaming."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_length = gold["synthesis3_y"].shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"),
                                 buffer_size, n_pointers)
    out = np.zeros(y_length)
    index = 0
    for i in range(len(f0)):
        assert synth.add_parameters(f0[i: i + 1], sp[i: i + 1],
                                    ap[i: i + 1])
        while synth.synthesis2():
            take = min(buffer_size, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += buffer_size
        assert not synth.is_locked()
    return out


def test_streaming_all_at_once(gold):
    out = _run_all_at_once(gold)
    ref = gold["synthesis2_y"]
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s


def test_streaming_frame_by_frame(gold):
    out = _run_frame_by_frame(gold)
    ref = gold["synthesis3_y"]
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s


def test_ring_full_and_lock_detection(gold):
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 1)
    assert synth.add_parameters(f0[:3], sp[:3], ap[:3])
    # ring of size 1 is now full
    assert not synth.add_parameters(f0[3:6], sp[3:6], ap[3:6])
    # consume everything renderable: queue still full + starved = locked,
    # the documented deadlock the caller must Refresh out of
    # (src/world/synthesisrealtime.h:125-139).
    while synth.synthesis2():
        pass
    assert synth.is_locked()
    synth.refresh()
    assert synth.add_parameters(f0[3:6], sp[3:6], ap[3:6])


def test_refresh_resets(gold):
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 100)
    for i in range(10):
        synth.add_parameters(f0[i: i + 1], sp[i: i + 1], ap[i: i + 1])
    while synth.synthesis2():
        pass
    synth.refresh()
    assert synth.synthesized_sample == 0
    assert not synth.synthesis2()


def test_streaming_dispatch_batching(gold, monkeypatch):
    """The dispatch policy must amortize device renders whenever the
    producer runs ahead of consumption: all-queued feeding renders
    everything in O(pulses/lookahead) calls, and chunked feeding renders
    ~once per chunk (the chunk's first window miss takes the rest of the
    chunk's pulses along).  Frame-by-frame real-time feeding stays
    per-pulse by nature — the next buffer needs the pulse immediately —
    which test_streaming_frame_by_frame covers for accuracy."""
    calls = {"n": 0, "sizes": []}
    orig = StreamingSynthesizer._render_dispatch

    def counted(self, pulses):
        calls["n"] += 1
        calls["sizes"].append(len(pulses))
        return orig(self, pulses)

    monkeypatch.setattr(StreamingSynthesizer, "_render_dispatch", counted)

    # All queued upfront (bench / batch-offline shape): one render.
    out = _run_all_at_once(gold, n_pointers=1)
    ref = gold["synthesis2_y"]
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s
    assert calls["n"] <= 3, (calls["n"], calls["sizes"])

    # Chunked feeding, 20 frames (~100 ms) at a time: about one render
    # per chunk, not one per pulse.
    calls["n"], calls["sizes"] = 0, []
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_length = gold["synthesis3_y"].shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 100)
    out = np.zeros(y_length)
    index = 0
    step = 20
    for i in range(0, len(f0), step):
        assert synth.add_parameters(f0[i: i + step], sp[i: i + step],
                                    ap[i: i + step])
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
    ref = gold["synthesis3_y"]
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s
    n_chunks = -(-len(f0) // step)
    assert calls["n"] <= n_chunks + 3, (calls["n"], calls["sizes"])


def test_streaming_random_feed_patterns(gold):
    """Property test: any interleaving of AddParameters chunk sizes and
    partial drains must produce the same waveform as the all-at-once
    feed (the reference's 01/02/03 equivalence, generalized).  Stresses
    the lookahead walk-skip state machine: partial drains leave the
    window mid-chunk, chunk arrivals bump the pulse epoch, and cache
    entries are consumed across feed boundaries."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    ref = gold["synthesis2_y"]
    y_length = ref.shape[0]
    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"),
                                     64, 100)
        out = np.zeros(y_length)
        index = 0
        i = 0
        while i < len(f0):
            step = int(rng.integers(1, 24))
            assert synth.add_parameters(f0[i: i + step], sp[i: i + step],
                                        ap[i: i + step])
            i += step
            # Partial drain: render only a random number of buffers.
            for _ in range(int(rng.integers(0, 4))):
                if not synth.synthesis2():
                    break
                take = min(64, y_length - index)
                if take > 0:
                    out[index: index + take] = synth.buffer[:take]
                index += 64
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
        v = np.abs(ref) > 0
        s = snr_db(ref[v], out[v])
        assert s > 80.0, (seed, s)


def test_streaming_recovers_from_device_error(gold, monkeypatch):
    """A transient device error must not poison the response cache: the
    failed batch's keys revert to 'missing' and get re-dispatched, so
    the stream completes with the correct waveform after the error
    surfaces once (regression: ('pending', bid) markers used to stay in
    _resp_cache forever — hold mode livelocked, blocking mode
    KeyError'd)."""
    import time

    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    ref = gold["synthesis3_y"]
    y_length = ref.shape[0]
    orig = StreamingSynthesizer._render_dispatch
    state = {"calls": 0}

    def flaky(self, pulses):
        state["calls"] += 1
        if state["calls"] == 2:  # fail once, mid-stream
            raise RuntimeError("injected transient device failure")
        return orig(self, pulses)

    monkeypatch.setattr(StreamingSynthesizer, "_render_dispatch", flaky)
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 100,
                                 hold_on_miss=True, dispatch_min_pulses=4)
    out = np.zeros(y_length)
    index = 0
    errors = 0

    def pump():
        nonlocal index, errors
        try:
            ok = synth.synthesis2()
        except RuntimeError:
            errors += 1
            return True  # error surfaced; state unconsumed — retry
        if ok:
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
        return ok

    for i in range(len(f0)):
        while not synth.add_parameters(f0[i: i + 1], sp[i: i + 1],
                                       ap[i: i + 1]):
            pump()
        while pump():
            pass
    deadline = time.perf_counter() + 60.0
    while synth.synthesized_sample + 64 < synth.last_location \
            and time.perf_counter() < deadline:
        if not pump():
            time.sleep(0.002)
    assert errors >= 1  # the injected failure did surface to the caller
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s


def test_render_worker_done_set_pruned():
    """Completion tracking must not grow with stream length: completed
    bids collapse into a contiguous watermark (regression: one set entry
    per batch forever — millions/day at streaming rates)."""
    from world_tpu.models.realtime import _RenderWorker

    w = _RenderWorker(
        lambda pulses: (lambda n=len(pulses): np.zeros((n, 4))))
    cache = {}
    for k in range(64):
        bid = w.submit([("k", k)], [None])
        w.wait(bid, cache)
    w.flush()
    assert w._done_mark == 64
    assert len(w._done) == 0
    w.shutdown()


def test_close_stops_worker_threads(gold):
    """close() must stop the worker's daemon threads so long-lived
    processes creating many synthesizers don't accumulate threads; a
    closed synthesizer transparently restarts its worker when reused."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    with StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"),
                              64, 100) as synth:
        assert synth.add_parameters(f0[:8], sp[:8], ap[:8])
        assert synth.synthesis2()
    assert synth._worker._thread is None
    assert not synth._worker._fetchers
    # reuse after close: threads restart on the next submit
    assert synth.synthesis2()
    synth.close()
    assert synth._worker._thread is None


def test_hold_on_miss_requires_lookahead(gold):
    import pytest

    with pytest.raises(ValueError):
        StreamingSynthesizer(gold.scalar("fs"), 5.0,
                             gold.scalar("fft_size"), 64, 100,
                             hold_on_miss=True, lookahead_pulses=0)


def test_streaming_hold_on_miss_frame_feed(gold):
    """hold_on_miss bounds per-call latency: when the next window's
    responses are still rendering on the worker thread, synthesis2
    returns False WITHOUT consuming state, and the audio arrives once
    they land — the waveform must match the reference's frame-by-frame
    streaming output exactly like the blocking mode does."""
    import time

    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    ref = gold["synthesis3_y"]
    y_length = ref.shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 100,
                                 hold_on_miss=True, dispatch_min_pulses=4)
    out = np.zeros(y_length)
    index = 0

    def drain(index, patience=30.0):
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < patience:
            if synth.synthesis2():
                t0 = time.perf_counter()
                take = min(64, y_length - index)
                if take > 0:
                    out[index: index + take] = synth.buffer[:take]
                index += 64
            else:
                if synth.synthesized_sample + 64 >= synth.last_location:
                    break  # genuinely needs more parameters
                time.sleep(0.002)  # held: responses still rendering
        return index

    for i in range(len(f0)):
        while not synth.add_parameters(f0[i: i + 1], sp[i: i + 1],
                                       ap[i: i + 1]):
            index = drain(index)  # ring full: consume
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
    index = drain(index)
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s
    # consumption stops one buffer short of the final pulse location
    assert index >= y_length - 2 * 64


def test_streaming_span_render_matches_per_pulse(gold):
    """Device-OLA span rendering (_span_batch: responses summed into a
    waveform span on device, ~10-40x fewer tunnel bytes) must produce
    the same audio as the per-pulse response path — same pulse values,
    different summation order, so equality is near-machine-precision,
    not bitwise."""
    out_span = _run_all_at_once(gold)          # span_render defaults on
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_length = gold["synthesis2_y"].shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 1,
                                 span_render=False)
    out_rows = np.zeros(y_length)
    index = 0
    i = 0
    n = len(f0)
    while i < n:
        if synth.add_parameters(f0[i:], sp[i:], ap[i:]):
            i = n
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out_rows[index: index + take] = synth.buffer[:take]
            index += 64
    synth.close()
    v = np.abs(out_rows) > 0
    assert v.any()
    s = snr_db(out_rows[v], out_span[v])
    assert s > 200.0, s  # float64: summation-order noise only


def test_streaming_span_render_float32(gold):
    """The float32 span path (Pallas OLA kernel on TPU, interpreted on
    CPU) against the float64 reference waveform."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"].astype(np.float32)
    sp = gold["cheaptrick_sp"].astype(np.float32)
    ap = gold["d4c_ap"].astype(np.float32)
    ref = gold["synthesis2_y"]
    y_length = ref.shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 1,
                                 rng_mode="fast", dtype=np.float32)
    out = np.zeros(y_length, np.float32)
    index = 0
    i = 0
    n = len(f0)
    while i < n:
        if synth.add_parameters(f0[i:], sp[i:], ap[i:]):
            i = n
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
    synth.close()
    # fast-mode RNG differs from the exact stream: compare envelopes —
    # voiced/periodic structure must match the reference closely.
    v = np.abs(ref) > 0
    ref_pow = float(np.sum(ref[v] ** 2))
    out_pow = float(np.sum(out[v].astype(np.float64) ** 2))
    assert 0.5 < out_pow / ref_pow < 2.0, out_pow / ref_pow


def test_streaming_device_params_matches_host(gold):
    """Device-resident parameter rows (ring-buffer lerp on device) must
    produce the same audio as host-computed envelopes: identical
    arithmetic, different executor, so near-machine agreement.
    device_params defaults to float32-only (the 'auto' gate), so it is
    forced on for this f64 fixture."""
    fs = gold.scalar("fs")
    f0d = gold["harvest_f0"]
    spd = gold["cheaptrick_sp"]
    apd = gold["d4c_ap"]
    y_len = gold["synthesis2_y"].shape[0]
    sd = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 1,
                              device_params=True)
    assert sd._pring is not None
    out_dev = np.zeros(y_len)
    idx = 0
    j = 0
    while j < len(f0d):
        if sd.add_parameters(f0d[j:], spd[j:], apd[j:]):
            j = len(f0d)
        while sd.synthesis2():
            take = min(64, y_len - idx)
            if take > 0:
                out_dev[idx: idx + take] = sd.buffer[:take]
            idx += 64
    sd.close()
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_length = gold["synthesis2_y"].shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64, 1,
                                 device_params=False)
    out_host = np.zeros(y_length)
    index = 0
    i = 0
    n = len(f0)
    while i < n:
        if synth.add_parameters(f0[i:], sp[i:], ap[i:]):
            i = n
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out_host[index: index + take] = synth.buffer[:take]
            index += 64
    synth.close()
    v = np.abs(out_host) > 0
    assert v.any()
    s = snr_db(out_host[v], out_dev[v])
    assert s > 200.0, s


def test_streaming_device_params_ring_wrap(gold):
    """A parameter ring smaller than the stream forces wraparound (and
    the host fallback for any pulse referencing evicted rows) — audio
    must stay correct through both.  Chunks of 10 frames exceed
    _pstore_min so they really upload; ring_rows=64 wraps every ~6
    chunks."""
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    ref = gold["synthesis3_y"]
    y_length = ref.shape[0]
    synth = StreamingSynthesizer(fs, 5.0, gold.scalar("fft_size"), 64,
                                 100, device_params=True,
                                 param_ring_rows=64)
    out = np.zeros(y_length)
    index = 0
    step = 10
    for i in range(0, len(f0), step):
        assert synth.add_parameters(f0[i: i + step], sp[i: i + step],
                                    ap[i: i + step])
        while synth.synthesis2():
            take = min(64, y_length - index)
            if take > 0:
                out[index: index + take] = synth.buffer[:take]
            index += 64
    assert synth._pstored_through > 64  # the ring really wrapped
    synth.close()
    s = snr_db(ref[np.abs(ref) > 0], out[np.abs(ref) > 0])
    assert s > 80.0, s
