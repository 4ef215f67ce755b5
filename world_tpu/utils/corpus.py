"""Corpus-scale analysis jobs: checkpoint/resume, retries, metrics.

The reference's failure handling is wav-header validation and the
streaming deadlock detector; its persistence is the tagged parameter
files (reference tools/parameterio.cpp).  At corpus scale the new
framework adds what the single-file C++ never needed: a job runner that
records completed utterances so a preempted run resumes where it left
off, retries transient per-utterance failures, and reports structured
throughput metrics (frames/s, aggregate real-time factor) per shard.
"""

import json
import os
import time
import traceback

import numpy as np


class CorpusCheckpoint:
    """Append-only JSONL record of completed utterances."""

    def __init__(self, path):
        self.path = path
        self.done = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self.done[rec["utterance"]] = rec

    def is_done(self, utterance):
        return utterance in self.done

    def mark(self, utterance, **info):
        rec = {"utterance": utterance, "time": time.time(), **info}
        self.done[utterance] = rec
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class CorpusRunner:
    """Analyze a list of wav files into tagged parameter files.

    Per-utterance failures are retried ``max_retries`` times, then
    recorded as failed (the job continues).  Completed work is skipped
    on resume via the checkpoint.
    """

    def __init__(self, out_dir, frame_period=5.0, f0_method="dio",
                 rng_mode="fast", max_retries=2, checkpoint=None,
                 log=print):
        self.out_dir = out_dir
        self.frame_period = frame_period
        self.f0_method = f0_method
        self.rng_mode = rng_mode
        self.max_retries = max_retries
        os.makedirs(out_dir, exist_ok=True)
        self.checkpoint = CorpusCheckpoint(
            checkpoint or os.path.join(out_dir, "checkpoint.jsonl"))
        self.log = log

    def _process_one(self, wav_path):
        from .. import analyze
        from ..io.audio import wavread
        from ..io.parameterio import (write_aperiodicity, write_f0,
                                      write_spectral_envelope)

        x, fs, _ = wavread(wav_path)
        params = analyze(x, fs, self.frame_period, f0_method=self.f0_method,
                         rng_mode=self.rng_mode)
        stem = os.path.join(
            self.out_dir,
            os.path.splitext(os.path.basename(wav_path))[0])
        write_f0(stem + ".f0", np.asarray(params.f0), self.frame_period)
        write_spectral_envelope(stem + ".sp",
                                np.asarray(params.spectrogram), fs,
                                self.frame_period, params.fft_size)
        write_aperiodicity(stem + ".ap", np.asarray(params.aperiodicity),
                           fs, self.frame_period, params.fft_size)
        return len(x) / fs, params.f0.shape[0]

    def run(self, wav_paths):
        """Returns a metrics dict; individual failures are recorded, not
        raised."""
        t_start = time.time()
        audio_seconds = 0.0
        frames = 0
        n_done = n_skipped = n_failed = 0
        for path in wav_paths:
            key = os.path.basename(path)
            if self.checkpoint.is_done(key):
                n_skipped += 1
                continue
            err = None
            for attempt in range(self.max_retries + 1):
                try:
                    secs, nf = self._process_one(path)
                    self.checkpoint.mark(key, status="ok", seconds=secs,
                                         frames=nf)
                    audio_seconds += secs
                    frames += nf
                    n_done += 1
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 — retry then record
                    err = f"{type(e).__name__}: {e}"
                    self.log(f"[corpus] {key} attempt {attempt + 1} "
                             f"failed: {err}")
                    traceback.print_exc()
            if err is not None:
                self.checkpoint.mark(key, status="failed", error=err)
                n_failed += 1
        wall = time.time() - t_start
        metrics = {
            "utterances_done": n_done,
            "utterances_skipped": n_skipped,
            "utterances_failed": n_failed,
            "audio_seconds": round(audio_seconds, 3),
            "frames": frames,
            "wall_seconds": round(wall, 3),
            "frames_per_second": round(frames / wall, 1) if wall else 0.0,
            "realtime_factor": round(audio_seconds / wall, 2) if wall
            else 0.0,
        }
        self.log(f"[corpus] {json.dumps(metrics)}")
        return metrics


class BatchedCorpusRunner(CorpusRunner):
    """Corpus analysis through the jitted batched pipeline.

    Wavs are bucketed by padded length (one compile per bucket) and
    analyzed ``batch_size`` at a time in float32 fast mode — the TPU
    production path (BASELINE config: "batched corpus sharded across a
    pod").  Parameter files, checkpointing and retries behave like the
    per-file runner; frames beyond each utterance's true length are
    cropped before writing.
    """

    def __init__(self, out_dir, fs, bucket_sizes, batch_size=16,
                 frame_period=5.0, f0_method="harvest", mesh=None, **kw):
        super().__init__(out_dir, frame_period=frame_period,
                         f0_method=f0_method, **kw)
        self.fs = fs
        self.bucket_sizes = sorted(bucket_sizes)
        self.batch_size = batch_size
        self.mesh = mesh
        self._steps = {}

    def _step_for(self, length):
        if length not in self._steps:
            from ..parallel.pipeline import make_batch_step
            self._steps[length] = make_batch_step(
                self.fs, length, frame_period=self.frame_period,
                rng_mode=self.rng_mode, mesh=self.mesh,
                f0_method=self.f0_method, with_synthesis=False)
        return self._steps[length]

    def run(self, wav_paths):
        import jax.numpy as jnp

        from .. import config
        from ..io.audio import wavread
        from ..io.parameterio import (write_aperiodicity, write_f0,
                                      write_spectral_envelope)
        from ..parallel.pipeline import pad_and_bucket

        t_start = time.time()
        audio_seconds = 0.0
        frames = 0
        n_done = n_skipped = n_failed = 0

        todo = []
        for p in wav_paths:
            if self.checkpoint.is_done(os.path.basename(p)):
                n_skipped += 1
            else:
                todo.append(p)
        waves = []
        paths = []
        for p in todo:
            try:
                x, fs, _ = wavread(p)
                if fs != self.fs:
                    raise ValueError(f"fs {fs} != runner fs {self.fs}")
                waves.append(np.asarray(x, np.float32))
                paths.append(p)
            except Exception as e:  # noqa: BLE001 — record and continue
                self.checkpoint.mark(os.path.basename(p), status="failed",
                                     error=f"{type(e).__name__}: {e}")
                n_failed += 1

        buckets = pad_and_bucket(waves, self.bucket_sizes)
        fft_size = config.get_fft_size_for_cheaptrick(self.fs)

        def complete(pending):
            """Fetch a dispatched batch's results (retrying the step on
            failure, falling back to the per-file runner if it keeps
            failing) and write the parameter files."""
            nonlocal audio_seconds, frames, n_done, n_failed
            handles, rows, length, b0, idx, lengths = pending
            step = self._step_for(length)
            out = None
            # Transient device-step failures are retried like the
            # per-file runner's; a batch that keeps failing falls back
            # to the per-file path for its utterances so one bad batch
            # cannot abort the whole corpus run.  Dispatch is async, so
            # the device-side failure of the ALREADY-dispatched handles
            # surfaces at this fetch; retries re-dispatch synchronously.
            # A dispatch that already raised consumed attempt 0.
            first = 1 if handles is None else 0
            for attempt in range(first, self.max_retries + 1):
                try:
                    if handles is None:
                        handles = step(jnp.asarray(rows))
                    f0b, spb, apb = handles[0], handles[1], handles[2]
                    out = (np.asarray(f0b), np.asarray(spb),
                           np.asarray(apb))
                    break
                except Exception as e:  # noqa: BLE001 — retry/fall back
                    handles = None
                    self.log(f"[corpus] batch step (len {length}, "
                             f"offset {b0}) attempt {attempt + 1} "
                             f"failed: {type(e).__name__}: {e}")
            if out is None:
                batch_paths = [paths[idx[b0 + row]] for row in
                               range(min(self.batch_size, len(idx) - b0))]
                m = CorpusRunner.run(self, batch_paths)
                n_done += m["utterances_done"]
                n_failed += m["utterances_failed"]
                audio_seconds += m["audio_seconds"]
                frames += m["frames"]
                return
            f0b, spb, apb = out
            for row in range(min(self.batch_size, len(idx) - b0)):
                i = idx[b0 + row]
                true_len = int(lengths[b0 + row])
                nf = config.get_samples_for_dio(
                    self.fs, true_len, self.frame_period)
                stem = os.path.join(self.out_dir, os.path.splitext(
                    os.path.basename(paths[i]))[0])
                try:
                    write_f0(stem + ".f0", f0b[row][:nf].astype(
                        np.float64), self.frame_period)
                    write_spectral_envelope(
                        stem + ".sp", spb[row][:nf].astype(np.float64),
                        self.fs, self.frame_period, fft_size)
                    write_aperiodicity(
                        stem + ".ap", apb[row][:nf].astype(np.float64),
                        self.fs, self.frame_period, fft_size)
                    self.checkpoint.mark(
                        os.path.basename(paths[i]), status="ok",
                        seconds=true_len / self.fs, frames=nf)
                    audio_seconds += true_len / self.fs
                    frames += nf
                    n_done += 1
                except Exception as e:  # noqa: BLE001
                    self.checkpoint.mark(
                        os.path.basename(paths[i]), status="failed",
                        error=f"{type(e).__name__}: {e}")
                    n_failed += 1

        # Double-buffered: dispatch batch k (async), then fetch + write
        # batch k-1 while the device crunches k — host file I/O and the
        # ~27 ms per-call dispatch overhead hide behind device compute
        # instead of serializing with it.
        inflight = None
        for length, (arr, lengths, idx) in sorted(buckets.items()):
            step = self._step_for(length)
            for b0 in range(0, len(idx), self.batch_size):
                rows = arr[b0: b0 + self.batch_size]
                pad = self.batch_size - len(rows)
                if pad:
                    rows = np.concatenate(
                        [rows, np.zeros((pad, length), np.float32)])
                try:
                    handles = step(jnp.asarray(rows))
                except Exception as e:  # noqa: BLE001 — retried at fetch
                    handles = None
                    self.log(f"[corpus] batch dispatch (len {length}, "
                             f"offset {b0}) failed: "
                             f"{type(e).__name__}: {e}")
                if inflight is not None:
                    complete(inflight)
                inflight = (handles, rows, length, b0, idx, lengths)
        if inflight is not None:
            complete(inflight)

        wall = time.time() - t_start
        metrics = {
            "utterances_done": n_done,
            "utterances_skipped": n_skipped,
            "utterances_failed": n_failed,
            "audio_seconds": round(audio_seconds, 3),
            "frames": frames,
            "wall_seconds": round(wall, 3),
            "frames_per_second": round(frames / wall, 1) if wall else 0.0,
            "realtime_factor": round(audio_seconds / wall, 2) if wall
            else 0.0,
        }
        self.log(f"[corpus] {json.dumps(metrics)}")
        return metrics
