"""Long-form audio: chunked analysis with halos + streaming synthesis.

The reference FFTs the *entire* signal at next-pow2 length inside Dio
and Harvest (src/dio.cpp:592-599, src/harvest.cpp:1164-1171) — fine for
seconds-long clips, unusable for hour-long 48 kHz audio.  Here long
waveforms are cut into equal chunks padded with an analysis halo on
each side; every chunk is one lane of the batched pipeline (and, under
a mesh, chunks ride the 'data' axis — this is the framework's context
parallelism), and the per-chunk frame grids are aligned to the global
grid so stitching is pure slicing.

Chunking is an approximation at the halo level: filter tails beyond the
halo and the global DC mean differ from whole-signal processing.  The
halo must cover the longest analysis influence radius: for Harvest that
is FixStep3's bidirectional extension (up to 100 internal 1 ms frames,
src/harvest.cpp:823-833) plus the per-section zero-phase smoothing whose
IIR poles (|p| ~ 0.875, src/harvest.cpp:1081-1084) decay to ~1e-6 within
another ~100 frames, plus FixStep4's 9-frame gap fill and the window
supports (D4C LoveTrain 3/40 s ~ 75 ms).  The default 0.45 s halo covers
all of these with margin; the residual differences are confined to
numerical noise except within a frame or two of a chunk edge (a voiced
section longer than the chunk still smooths over a slightly different
section extent — sub-cent in practice); see tests/test_longform.py.

Synthesis of long parameter tracks goes through StreamingSynthesizer
(reference src/synthesisrealtime.cpp), which carries the pulse phase
across chunk boundaries exactly, with a large render buffer.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..models.cheaptrick import _cheap_trick_impl
from ..models.d4c import _d4c_impl
from ..models.dio import _dio_impl
from ..models.harvest import _harvest_impl
from ..models.stonemask import _stone_mask_impl


@functools.lru_cache(maxsize=16)
def _chunk_fn(fs, frame_period, f0_method, rng_mode, codec_dims, int_in,
              dtype_name):
    """Memoized jitted per-chunk pipeline: a fresh jax.jit wrapper
    re-traces and re-lowers on EVERY call even when the XLA binary is
    cached (~90 s for an 8-lane 16 s harvest batch) — the process-wide
    cache makes repeated analyze_long calls trace once."""
    dtype = jnp.dtype(dtype_name)
    option = config.CheapTrickOption().resolve(fs)
    fft_size = option.fft_size
    fs_t = jnp.asarray(float(fs), dtype)

    def one(xc):
        if int_in:
            # exact power-of-2 scaling, identical to wavread's
            # val / 2^(nbit-1) done on host
            xc = xc.astype(dtype) / 32768.0
        if f0_method == "harvest":
            tp, f0 = _harvest_impl(xc, fs=fs, frame_period=frame_period,
                                   f0_floor=config.K_FLOOR_F0,
                                   f0_ceil=config.K_CEIL_F0)
        else:
            tp, f0 = _dio_impl(xc, fs=fs, frame_period=frame_period,
                               f0_floor=config.K_FLOOR_F0,
                               f0_ceil=config.K_CEIL_F0,
                               channels_in_octave=2.0, speed=1,
                               allowed_range=0.1)
            f0 = _stone_mask_impl(xc, tp, f0, fs_t, fs=fs)
        sp = _cheap_trick_impl(xc, tp, f0, fs=fs, fft_size=fft_size,
                               q1=option.q1, rng_mode=rng_mode)
        ap, _ = _d4c_impl(xc, tp, f0, fs_t, fs=fs, fft_size=fft_size,
                          threshold=config.K_THRESHOLD, rng_mode=rng_mode)
        if codec_dims is not None:
            from ..models.codec import (_code_aperiodicity_impl,
                                        _code_spectral_envelope_impl)
            sp = _code_spectral_envelope_impl(
                sp, fs_t, fs=fs, fft_size=fft_size,
                number_of_dimensions=codec_dims)
            ap = _code_aperiodicity_impl(ap, fs_t, fs=fs,
                                         fft_size=fft_size)
        return f0, sp, ap

    return jax.jit(jax.vmap(one))


def analyze_long(x, fs, *, frame_period=5.0, chunk_seconds=8.0,
                 halo_seconds=0.45, f0_method="harvest", rng_mode="fast",
                 mesh=None, codec_dims=None, batch_lanes=None):
    """Analyze arbitrarily long audio in fixed-size halo-padded chunks.

    Returns (temporal_positions, f0, sp, ap) covering the whole signal
    on the global frame grid.

    Production knobs for the device->host tunnel (hour-scale audio at
    full spectral resolution would move ~GB/minute):

    - ``codec_dims``: code sp/ap ON DEVICE (models/codec.py) so only
      (frames, codec_dims) mel-cepstra and (frames, bands) coarse
      aperiodicity cross to the host (~16x fewer bytes at fft 2048);
      decode via io.parameterio.load_npz_parameters semantics or
      models.codec.decode_*.
    - ``batch_lanes``: dispatch the chunk lanes in batches of this
      size and fetch results through a thread pool — device compute,
      host->device input transfer and device->host fetches overlap
      instead of serializing (the one-shot path holds all lanes in one
      call).
    - int16 input is converted to float32 ON DEVICE (exact /2^15, the
      wavread scaling), halving the input transfer.
    """
    x = np.asarray(x)
    n = len(x)
    fp_s = frame_period / 1000.0
    n_frames = config.get_samples_for_dio(fs, n, frame_period)

    halo_f = int(math.ceil(halo_seconds / fp_s))
    core_f = max(1, int(round(chunk_seconds / fp_s)))
    local_f = core_f + 2 * halo_f
    # chunk samples cover the last local frame's analysis window too
    chunk_len = int(math.ceil((local_f - 1) * fp_s * fs)) + 1

    n_chunks = max(1, int(math.ceil(n_frames / core_f)))
    starts_f = np.arange(n_chunks) * core_f - halo_f     # global frame idx
    start_samples = np.round(starts_f * fp_s * fs).astype(np.int64)

    chunks = np.zeros((n_chunks, chunk_len), x.dtype)
    for c, s0 in enumerate(start_samples):
        lo, hi = max(0, s0), min(n, s0 + chunk_len)
        if hi > lo:
            chunks[c, lo - s0: hi - s0] = x[lo:hi]

    int_in = x.dtype == np.int16
    dtype = jnp.float32 if (x.dtype == np.float32 or int_in) \
        else jnp.float64

    jfn = _chunk_fn(fs, frame_period, f0_method, rng_mode, codec_dims,
                    int_in, jnp.dtype(dtype).name)

    def put(arr):
        a = jnp.asarray(arr) if int_in else jnp.asarray(arr, dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            a = jax.device_put(a, NamedSharding(mesh, P("data", None)))
        return a

    if batch_lanes and n_chunks > batch_lanes:
        # Pipelined: dispatch every batch (async), fetch through a
        # small thread pool so tunnel round trips overlap compute.
        from concurrent.futures import ThreadPoolExecutor
        nb = (n_chunks + batch_lanes - 1) // batch_lanes
        handles = []
        for b in range(nb):
            rows = chunks[b * batch_lanes: (b + 1) * batch_lanes]
            if len(rows) < batch_lanes:
                rows = np.concatenate([rows, np.zeros(
                    (batch_lanes - len(rows),) + rows.shape[1:],
                    rows.dtype)])
            handles.append(jfn(put(rows)))
        with ThreadPoolExecutor(4) as pool:
            futs = [tuple(pool.submit(np.asarray, h) for h in hs)
                    for hs in handles]
            parts = [tuple(f.result() for f in fs3) for fs3 in futs]
        f0c, spc, apc = (np.concatenate([p[i] for p in parts])[:n_chunks]
                         for i in range(3))
    else:
        f0c, spc, apc = jfn(put(chunks))
        f0c, spc, apc = np.asarray(f0c), np.asarray(spc), np.asarray(apc)

    # Stitch: core frames only, padded-lane shapes are all equal.
    f0 = np.zeros(n_frames, f0c.dtype)
    sp = np.zeros((n_frames, spc.shape[2]), spc.dtype)
    ap = np.zeros((n_frames, apc.shape[2]), apc.dtype)
    for c in range(n_chunks):
        g0 = c * core_f
        g1 = min(n_frames, g0 + core_f)
        l0 = g0 - starts_f[c]                    # == halo_f except chunk 0
        f0[g0:g1] = f0c[c, l0: l0 + g1 - g0]
        sp[g0:g1] = spc[c, l0: l0 + g1 - g0]
        ap[g0:g1] = apc[c, l0: l0 + g1 - g0]

    tp = np.arange(n_frames) * fp_s
    return tp, f0, sp, ap


def synthesize_long(f0, sp, ap, fs, *, frame_period=5.0, buffer_size=4096,
                    frames_per_push=512, rng_mode="fast"):
    """Synthesize a long parameter track chunk-by-chunk through the
    streaming synthesizer (exact pulse-phase handoff across chunks)."""
    from ..models.realtime import StreamingSynthesizer

    f0 = np.asarray(f0)
    fft_size = 2 * (np.asarray(sp).shape[1] - 1)
    synth = StreamingSynthesizer(
        fs, frame_period, fft_size, buffer_size, number_of_pointers=16,
        rng_mode=rng_mode,
        dtype=np.float32 if np.asarray(sp).dtype == np.float32
        else np.float64)
    out = []
    n_frames = len(f0)
    pushed = 0
    while True:
        pushed0 = pushed
        while (pushed < n_frames
               and synth.add_parameters(
                   f0[pushed: pushed + frames_per_push],
                   np.asarray(sp)[pushed: pushed + frames_per_push],
                   np.asarray(ap)[pushed: pushed + frames_per_push])):
            pushed += frames_per_push
        progressed = False
        while synth.synthesis2():
            out.append(synth.buffer[:buffer_size].copy())
            progressed = True
        if pushed >= n_frames and not progressed:
            break
        if not progressed and pushed == pushed0:
            # No frames accepted and no samples rendered: the stream is
            # wedged (is_locked() covers the queue-full case; this also
            # catches any other stall) — stop rather than spin forever.
            break
    return np.concatenate(out) if out else np.zeros(0)
