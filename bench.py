"""Benchmark: aggregate real-time factor of the full WORLD pipeline.

Times BOTH pipelines (harvest -> cheaptrick -> d4c -> synthesis, the
reference's canonical quality path per test/test.cpp:393-396, and
dio -> stonemask -> ..., the speed path) plus per-stage ms on the real
TPU chip, printing ONE JSON line whose headline metric is the
harvest-path RTF:

  {"metric": "harvest_pipeline_rtf_per_chip", "value": N,
   "unit": "x_realtime", "vs_baseline": M, "dio_pipeline_rtf": ...,
   "stage_ms": {...}}

Baseline: the single-core C++ reference processes the 0.794 s fixture in
~0.286 s total (Harvest 212 ms + CheapTrick 11 ms + D4C 47 ms +
Synthesis 8 ms), i.e. ~2.78x real time.  BASELINE.md's target for this
build is >= 50x real time per chip.

Timing honesty (see CLAUDE.md): the TPU runtime memoizes repeat
executions by input content across processes and block_until_ready can
return early, so every timed call uses entropy-fresh inputs and
completion is forced by fetching a tiny pre-compiled slice of every
output.
"""

import json
import os
import time

import numpy as np

CPP_BASELINE_RTF = 0.793651 / 0.286  # reference single-core, test.cpp timers
BATCH = 16
ITERS = 4


def _timed(step, tail, make_input, iters=ITERS):
    """Median wall-clock of step(x) with entropy-fresh inputs and forced
    completion via a tiny pre-compiled output fetch."""
    import jax

    out = step(make_input())  # warmup / compile
    checksum = float(np.asarray(tail(out)).sum())
    inputs = [make_input() for _ in range(iters)]
    jax.block_until_ready(inputs)
    times = []
    for xb in inputs:
        t0 = time.perf_counter()
        out = step(xb)
        checksum += float(np.asarray(tail(out)).sum())
        times.append(time.perf_counter() - t0)
    assert np.isfinite(checksum)
    return float(np.median(times))


def _wait_for_backend(retries=8, pause_s=75):
    """The remote TPU tunnel has outages (backend init hangs or raises
    UNAVAILABLE for minutes at a time — observed 2026-08-21).  Probe in
    a subprocess (a hung init cannot be cancelled in-process) and retry
    for ~10 minutes before giving up so a transient outage doesn't cost
    the benchmark artifact."""
    import subprocess
    import sys
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=240 if attempt else 420)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass  # hung init == outage; the probe child was killed
        print(f"# TPU backend unavailable (attempt {attempt + 1}/"
              f"{retries}); retrying in {pause_s}s", file=sys.stderr)
        time.sleep(pause_s)
    raise RuntimeError("TPU backend unavailable after retries")


def main(sections=None):
    """Run the benchmark; ``sections`` (a set) restricts to a subset of
    {"pipeline", "stages", "48k", "longform", "corpus", "streaming"} for quick
    re-measurement of one block (None = all, the driver contract)."""
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from world_tpu.parallel.pipeline import make_batch_step

    def want(s):
        return sections is None or s in sections

    x = np.fromfile("tests/goldens/x.f64").astype(np.float32)
    fs = 22050
    duration_s = len(x) / fs
    audio_seconds = BATCH * duration_s
    rng = np.random.default_rng()  # OS-entropy seed, run-unique

    def fresh():
        return jnp.asarray(
            x[None, :] * (0.5 + rng.random((BATCH, 1), dtype=np.float32)))

    tail4 = jax.jit(lambda o: jnp.concatenate(
        [o[0][:, -1], o[1][:, -1, -1], o[2][:, -1, -1], o[3][:, -8:].ravel()]))

    result = {}
    for method in ("harvest", "dio") if want("pipeline") else ():
        step = jax.jit(make_batch_step(fs, len(x), rng_mode="fast",
                                       f0_method=method))
        dt = _timed(step, tail4, fresh)
        result[f"{method}_pipeline_rtf"] = round(audio_seconds / dt, 2)
        if method == "harvest":
            # BASELINE "frames analyzed/s/chip" at the operating batch.
            # Batch 16 IS the throughput optimum: per-chip RTF measures
            # flat 16->32 (73.8 vs 72.7) and ~10% lower at 64 (vmapped
            # while-loop trip counts grow with the max over lanes), so
            # larger batches only add latency.
            from world_tpu import config as _cfg
            f0_len = _cfg.get_samples_for_dio(fs, len(x), 5.0)
            result["frames_per_second_per_chip"] = round(
                BATCH * f0_len / dt)

    # ---- per-stage ms (B=16 batch, one fused vmapped call per stage) ----
    from world_tpu import config
    from world_tpu.models.cheaptrick import _cheap_trick_impl
    from world_tpu.models.d4c import _d4c_impl
    from world_tpu.models.dio import _dio_impl
    from world_tpu.models.harvest import _harvest_impl
    from world_tpu.models.stonemask import _stone_mask_impl
    from world_tpu.models.synthesis import _synthesis_impl

    option = config.CheapTrickOption().resolve(fs)
    fft_size = option.fft_size
    frame_period = 5.0
    f0_length = config.get_samples_for_dio(fs, len(x), frame_period)
    y_length = int((f0_length - 1) * frame_period / 1000.0 * fs) + 1
    fs_f = float(fs)

    harvest_f0 = jax.jit(jax.vmap(lambda xc: _harvest_impl(
        xc, fs=fs, frame_period=frame_period, f0_floor=config.K_FLOOR_F0,
        f0_ceil=config.K_CEIL_F0)))

    def dio_sm(xc):
        tp, f0 = _dio_impl(xc, fs=fs, frame_period=frame_period,
                           f0_floor=config.K_FLOOR_F0,
                           f0_ceil=config.K_CEIL_F0, channels_in_octave=2.0,
                           speed=1, allowed_range=0.1)
        return tp, _stone_mask_impl(xc, tp, f0, jnp.asarray(fs_f, xc.dtype),
                                    fs=fs)

    dio_f0 = jax.jit(jax.vmap(dio_sm))
    cheaptrick = jax.jit(jax.vmap(lambda xc, tp, f0: _cheap_trick_impl(
        xc, tp, f0, fs=fs, fft_size=fft_size, q1=option.q1,
        rng_mode="fast")))
    d4c = jax.jit(jax.vmap(lambda xc, tp, f0: _d4c_impl(
        xc, tp, f0, jnp.asarray(fs_f, xc.dtype), fs=fs, fft_size=fft_size,
        threshold=config.K_THRESHOLD, rng_mode="fast")[0]))
    synth = jax.jit(jax.vmap(lambda f0, sp, ap: _synthesis_impl(
        f0, sp, ap, jnp.asarray(fs_f, sp.dtype), fs=fs, fft_size=fft_size,
        frame_period=frame_period, y_length=y_length,
        max_pulses=min(y_length, int(y_length / fs_f * 1500) + 64),
        rng_mode="fast")))

    def stage_inputs():
        xb = fresh()
        tp, f0 = jax.block_until_ready(dio_f0(xb))
        sp = jax.block_until_ready(cheaptrick(xb, tp, f0))
        ap = jax.block_until_ready(d4c(xb, tp, f0))
        return xb, tp, f0, sp, ap

    tail2 = jax.jit(lambda o: o[1][:, -4:].ravel())
    tail1 = jax.jit(lambda o: o[:, -4:].ravel() if o.ndim == 2
                    else o[:, -1, -4:].ravel())
    if want("stages"):
        stage_ms = {}
        stage_ms["harvest"] = 1e3 * _timed(
            harvest_f0, tail2, fresh, iters=3)
        stage_ms["dio_stonemask"] = 1e3 * _timed(
            dio_f0, tail2, fresh, iters=3)
        for name, fn in (("cheaptrick", cheaptrick), ("d4c", d4c)):
            stage_ms[name] = 1e3 * _timed(
                lambda args, fn=fn: fn(args[0], args[1], args[2]),
                tail1, stage_inputs, iters=3)
        stage_ms["synthesis"] = 1e3 * _timed(
            lambda args: synth(args[2], args[3], args[4]),
            tail1, stage_inputs, iters=3)
        result["stage_ms"] = {k: round(v, 1) for k, v in stage_ms.items()}
    result["batch"] = BATCH
    result["audio_seconds_per_step"] = round(audio_seconds, 3)

    # ---- production rate: 48 kHz / fft_size 2048 ------------------------
    # The reference's 71 Hz f0_floor is chosen to keep fft_size at 2048
    # at 48 kHz (src/world/constantnumbers.h:28-30); the RTF claim is
    # demonstrated at that flagship configuration too.
    x48 = np.fromfile("tests/goldens_fs48/x.f64").astype(np.float32) \
        if want("48k") else None
    if want("48k"):
        step48 = make_batch_step(48000, len(x48), rng_mode="fast",
                                 f0_method="harvest")

        def fresh48():
            return jnp.asarray(
                x48[None, :]
                * (0.5 + rng.random((BATCH, 1), dtype=np.float32)))

        dt48 = _timed(step48, tail4, fresh48, iters=3)
        result["harvest_pipeline_rtf_48k"] = round(
            BATCH * len(x48) / 48000 / dt48, 2)

    # ---- long-form: 5 minutes of 48 kHz through chunked harvest --------
    # SURVEY §5's long-context obligation: halo-chunked analyze_long on
    # the production path (int16 input converted on device, batched
    # pipelined dispatch, on-device codec so full (F, fft/2+1) tensors
    # never cross the ~15 MB/s tunnel).  First call compiles; the timed
    # run uses content never submitted before.
    if want("longform"):
        from world_tpu.parallel.longform import analyze_long

        xl48 = np.fromfile("tests/goldens_fs48/x.f64")
        secs = 300.0
        reps = int(np.ceil(secs * 48000 / len(xl48)))
        base = np.tile(xl48, reps)[: int(secs * 48000)]

        def fresh_long():
            s = 0.4 + 0.4 * rng.random()
            return (np.clip(base * s, -0.999, 0.999)
                    * 32767).astype(np.int16)

        # 6.25 s chunks x 2-lane batches measured best on the one-chip
        # tunnel (sweep: 16s/8 44.9, 12.5s/8 51.3, 12.5s/4 59.2,
        # 12.5s/2 64.4, 8.3s/2 66.3, 6.25s/2 ~72, 6.25s/1 52.8): fine
        # batches overlap transfers with compute almost fully, and the
        # remaining gap to the batch-16 RTF is the 0.9 s halo
        # replicated per 6.25 s chunk (14% extra analysis compute) —
        # the documented price of O(chunk) memory instead of the
        # reference's whole-signal FFT.  Multi-chip meshes shard the
        # chunk lanes on 'data' instead (see dryrun_multichip).
        lf_kw = dict(chunk_seconds=6.25, codec_dims=64, batch_lanes=2,
                     f0_method="harvest")
        dt_l = None
        for _ in range(2):  # first run compiles the (8, chunk) shapes
            xl = fresh_long()
            t0 = time.perf_counter()
            tp_l, f0_l, sp_l, ap_l = analyze_long(xl, 48000, **lf_kw)
            dt_l = time.perf_counter() - t0
        assert np.isfinite(f0_l).all() and sp_l.shape[1] == 64
        result["longform_rtf_48k"] = round(secs / dt_l, 2)
        result["longform_minutes"] = round(secs / 60.0, 1)

    # ---- sustained corpus throughput (production path) -----------------
    # End-to-end BatchedCorpusRunner: wav read -> double-buffered device
    # steps -> FULL result fetch -> reference-format parameter files.
    # Unlike the per-step RTF above this includes every host cost (file
    # I/O, f64 conversion, checkpointing), overlapped with device
    # compute by the runner's dispatch pipelining.
    import shutil
    import tempfile

    from world_tpu.io.audio import wavwrite
    from world_tpu.utils.corpus import BatchedCorpusRunner

    corpus_dir = tempfile.mkdtemp(prefix="world_bench_corpus_")
    try:
        if not want("corpus"):
            raise _SkipSection
        n_utt = 4 * BATCH
        # 2*BATCH extra warmup-only files (one batch per output config):
        # the runtime memoizes repeat executions by input content, so the
        # timed runs must only see content never submitted before
        paths = []
        for i in range(n_utt * 2 + 2 * BATCH):
            scale = 0.5 + 0.45 * rng.random()  # entropy-fresh content
            p = os.path.join(corpus_dir, f"u{i:03d}.wav")
            wavwrite((x * scale).astype(np.float64), fs, p)
            paths.append(p)
        base = dict(fs=fs, bucket_sizes=[len(x)], batch_size=BATCH,
                    f0_method="harvest", log=lambda *a: None)
        # Production config: on-device codec + float32 npz output —
        # a (B,F,fft/2+1) tensor never crosses the ~13 MB/s tunnel.
        prod = dict(base, output_format="npz", codec_dims=64)
        for tag, kw, lo in (("corpus_rtf_sustained", prod, 0),
                            ("corpus_rtf_ref_format", base, n_utt)):
            # warmup run compiles this config's step (shared afterwards
            # via the memoized get_batch_step)
            BatchedCorpusRunner(
                os.path.join(corpus_dir, f"warm_{tag}"), **kw) \
                .run(paths[2 * n_utt + (0 if lo == 0 else BATCH):
                           2 * n_utt + (BATCH if lo == 0 else 2 * BATCH)])
            m = BatchedCorpusRunner(
                os.path.join(corpus_dir, f"out_{tag}"), **kw) \
                .run(paths[lo: lo + n_utt])
            assert m["utterances_failed"] == 0 \
                and m["utterances_done"] == n_utt
            result[tag] = m["realtime_factor"]
            if lo == 0:
                result["corpus_frames_per_second"] = \
                    m["frames_per_second"]
    except _SkipSection:
        pass
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    # ---- streaming synthesis (reference test.cpp:300-339) --------------
    from world_tpu.models.realtime import StreamingSynthesizer

    if not want("streaming"):
        rtf = result.get("harvest_pipeline_rtf", 0.0)
        print(json.dumps({"metric": "harvest_pipeline_rtf_per_chip",
                          "value": rtf, "unit": "x_realtime",
                          "vs_baseline": round(rtf / CPP_BASELINE_RTF, 2),
                          **result}))
        return

    def g64(name, shape):
        return np.fromfile(f"tests/goldens/{name}.f64").reshape(shape)

    f0g = g64("harvest_f0", (-1,)).astype(np.float32)
    spg = g64("cheaptrick_sp", (len(f0g), -1)).astype(np.float32)
    apg = g64("d4c_ap", (len(f0g), -1)).astype(np.float32)
    fftg = 2 * (spg.shape[1] - 1)
    frame_s = 0.005
    streaming = {}

    # (a) all-parameters-upfront throughput at two buffer sizes.
    # These runs are ONE device round trip + one ~80 KB fetch end to
    # end (device-OLA span render), so they measure the tunnel's round
    # trip as much as the code: identical binaries measured 44-172 ms
    # across hours (the r04 'streaming regression' was exactly this).
    # Report best-of-5 as the capability number and the median beside
    # it so weather stays visible.
    for bs in (64, 4096):
        times = []
        for it in range(6):
            synth = StreamingSynthesizer(fs, 5.0, fftg, bs,
                                         number_of_pointers=200,
                                         rng_mode="fast", dtype=np.float32)
            scale = np.float32(0.5 + rng.random())  # content-fresh
            ok = synth.add_parameters(f0g, spg * scale, apg)
            assert ok
            rendered = 0
            t0 = time.perf_counter()
            while synth.synthesis2():
                rendered += bs
            times.append(time.perf_counter() - t0)
            synth.close()
        # first iteration compiles the response buckets; take the rest
        streaming[f"rtf_buf{bs}"] = round(
            rendered / fs / float(np.min(times[1:])), 2)
        streaming[f"rtf_buf{bs}_median"] = round(
            rendered / fs / float(np.median(times[1:])), 2)

    # (b) the reference's marquee REAL-TIME scenario: ONE 5 ms frame per
    # AddParameters, 64-sample buffers drained as they become available
    # (test/test.cpp:300-339).  hold_on_miss keeps every call
    # sub-millisecond (no call ever blocks on the ~30 ms device round
    # trip); the audio stream instead lags the parameter feed by a
    # bounded priming latency that the paced run measures directly.
    bs = 64
    y_total = int((len(f0g) - 1) * frame_s * fs) + 1

    def frame_feed(paced):
        # dispatch_min 2: the worker's fetch POOL overlaps device round
        # trips (~3x measured), so small batches sustain the ~200/s
        # pulse rate and steady-state latency approaches one ~30 ms
        # round trip; 1 saturates the dispatch thread, >=4 only adds
        # accumulation wait.  hold_force_ms 8 bounds what a held window
        # can add on top.
        synth = StreamingSynthesizer(
            fs, 5.0, fftg, bs, number_of_pointers=250, rng_mode="fast",
            dtype=np.float32, hold_on_miss=True, dispatch_min_pulses=2,
            hold_force_ms=8.0).warmup()
        scale = np.float32(0.5 + rng.random())
        spl = spg * scale
        call_ms = []
        avail = []          # wall time each buffer became available
        feed_t = []         # wall time each frame was fed
        t0 = time.perf_counter()

        def pump():
            t1 = time.perf_counter()
            ok = synth.synthesis2()
            t2 = time.perf_counter()
            call_ms.append(1e3 * (t2 - t1))
            if ok:
                avail.append(t2 - t0)
            return ok

        for i in range(len(f0g)):
            if paced:  # real-time pacing: frame i arrives at t0 + 5 ms*i
                while time.perf_counter() - t0 < i * frame_s:
                    if not pump():
                        time.sleep(2e-4)
            while not synth.add_parameters(f0g[i: i + 1], spl[i: i + 1],
                                           apg[i: i + 1]):
                pump()  # ring full: consume
            feed_t.append(time.perf_counter() - t0)
            while pump():
                pass
        deadline = time.perf_counter() + 20.0
        while len(avail) * bs < y_total - bs \
                and time.perf_counter() < deadline:
            if not pump():
                if synth.synthesized_sample + bs >= synth.last_location:
                    break
                time.sleep(2e-4)
        wall = time.perf_counter() - t0
        return np.asarray(call_ms), np.asarray(avail), np.asarray(feed_t), \
            wall, len(avail) * bs, synth.holds

    frame_feed(paced=False)  # warm up / compile the response buckets
    ff_rtf, ff_max, ff_p99 = [], [], []
    for _ in range(3):
        call_ms, _, _, wall, rendered, holds = frame_feed(paced=False)
        ff_rtf.append(rendered / fs / wall)
        ff_max.append(float(call_ms.max()))
        ff_p99.append(float(np.percentile(call_ms, 99)))
    streaming["rtf_frame_feed"] = round(max(ff_rtf), 2)
    streaming["rtf_frame_feed_median"] = round(float(np.median(ff_rtf)), 2)
    streaming["frame_feed_max_call_ms"] = round(max(ff_max), 3)
    streaming["frame_feed_p99_call_ms"] = round(max(ff_p99), 3)

    # Paced at real time: per-buffer lag behind its feed-complete time
    # (buffer b needs parameters through frame ceil(((b+1)*bs)/fs/5ms)+1;
    # its lag is avail_time - that frame's feed time).  The steady-state
    # max over the tail is the stream's bounded latency.  Three runs so
    # the p99/max are a distribution, not one lucky draw.
    lag_runs, max_calls, holds_total = [], [], 0
    for _ in range(3):
        call_ms, avail, feed_t, wall, rendered, holds = frame_feed(
            paced=True)
        nb = len(avail)
        need = np.minimum((np.ceil((np.arange(1, nb + 1) * bs)
                                    / (frame_s * fs)) + 1).astype(int),
                          len(feed_t) - 1)
        lag_ms = 1e3 * (avail - np.asarray(feed_t)[need])
        prime = min(32, nb // 2)
        lag_runs.append(lag_ms[prime:])
        streaming.setdefault("paced_priming_ms", round(
            float(lag_ms[:prime].max()), 1))
        max_calls.append(float(call_ms.max()))
        holds_total += int(holds)
    lag_all = np.concatenate(lag_runs)
    streaming["paced_latency_ms_max"] = round(float(lag_all.max()), 1)
    streaming["paced_latency_ms_p99"] = round(
        float(np.percentile(lag_all, 99)), 1)
    streaming["paced_latency_ms_p50"] = round(
        float(np.percentile(lag_all, 50)), 1)
    streaming["paced_runs"] = len(lag_runs)
    streaming["paced_max_call_ms"] = round(max(max_calls), 3)
    streaming["paced_holds"] = holds_total

    # Latency floor of this environment: one minimal dispatch+fetch
    # round trip through the tunnel (pre-compiled identity-ish graph,
    # entropy-fresh scalar input so the content cache can't short-cut).
    tiny = jax.jit(lambda v: v * 1.000001 + 1.0)
    _ = np.asarray(tiny(jnp.float32(rng.random())))  # compile
    rts = []
    for _ in range(25):
        v = jnp.float32(rng.random())
        t0 = time.perf_counter()
        np.asarray(tiny(v))
        rts.append(1e3 * (time.perf_counter() - t0))
    streaming["dispatch_fetch_floor_ms_p50"] = round(
        float(np.percentile(rts, 50)), 1)
    # One rendered 64-sample buffer inherently needs >= 1 round trip
    # (dispatch+fetch) after its parameters arrive; the steady-state
    # paced lag above is measured against this floor.
    result["streaming"] = streaming

    rtf = result.get("harvest_pipeline_rtf", 0.0)
    print(json.dumps({
        "metric": "harvest_pipeline_rtf_per_chip",
        "value": rtf,
        "unit": "x_realtime",
        "vs_baseline": round(rtf / CPP_BASELINE_RTF, 2),
        **result,
    }))


class _SkipSection(Exception):
    pass


if __name__ == "__main__":
    import sys
    main(set(sys.argv[1:]) or None)
