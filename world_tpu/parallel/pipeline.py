"""Batched, sharded analysis/synthesis pipeline.

The reference processes one utterance per process invocation; scaling is
"run test.exe per file".  Here the corpus axis is a first-class mesh
axis: utterances are padded/bucketed to fixed lengths, batched with
vmap, and sharded over a ('data', 'frame') mesh — utterances across
'data', frame-major spectral tensors across 'frame'.  XLA inserts the
collectives (the waveform is all-gathered along 'frame' where per-frame
kernels gather arbitrary windows; metric reductions ride psum).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config
from ..models.cheaptrick import _cheap_trick_impl
from ..models.d4c import _d4c_impl
from ..models.dio import _dio_impl
from ..models.harvest import _harvest_impl
from ..models.stonemask import _stone_mask_impl
from ..models.synthesis import _synthesis_impl


def make_mesh(n_data=None, n_frame=1, devices=None):
    """Create a ('data', 'frame') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_frame
    import numpy as np
    dev = np.asarray(devices[: n_data * n_frame]).reshape(n_data, n_frame)
    return Mesh(dev, ("data", "frame"))


def pad_and_bucket(waveforms, bucket_sizes):
    """Pad ragged utterances to the smallest admissible bucket length.

    Returns a dict bucket_length -> (stacked array, lengths, indices) so
    each bucket compiles once.  Host-side packing; the reference has no
    analogue (it is one-file-at-a-time).
    """
    import numpy as np
    buckets = {}
    for i, w in enumerate(waveforms):
        n = len(w)
        for b in sorted(bucket_sizes):
            if n <= b:
                buckets.setdefault(b, []).append((i, w))
                break
        else:
            raise ValueError(f"utterance {i} longer than largest bucket")
    out = {}
    for b, items in buckets.items():
        arr = np.zeros((len(items), b), np.float32)
        lengths = np.zeros(len(items), np.int32)
        idx = []
        for row, (i, w) in enumerate(items):
            arr[row, : len(w)] = w
            lengths[row] = len(w)
            idx.append(i)
        out[b] = (arr, lengths, np.asarray(idx))
    return out


def make_batch_step(fs, x_length, frame_period=5.0, rng_mode="fast",
                    mesh=None, f0_method="dio", with_synthesis=True,
                    codec_dims=None):
    """Build a jitted batched analysis(+synthesis) step.

    Returns step(x_batch (B, x_length)) ->
    (f0 (B,F), sp (B,F,K), ap (B,F,K), y (B,y_length));
    with_synthesis=False skips resynthesis and returns y=None
    (corpus analysis jobs).

    With ``codec_dims`` set, sp/ap are CODED on device before they leave
    the step — sp becomes (B,F,codec_dims) mel-cepstrum coefficients and
    ap becomes (B,F,n_aper) coarse dB bands (reference src/codec.cpp) —
    shrinking the device->host fetch ~10-40x for corpus jobs.

    With ``mesh`` given, batch rides the 'data' axis and the frame-major
    sp/ap stages (CheapTrick, D4C, StoneMask — per-frame independent
    given the waveform) are shard_map'ed over the 'frame' axis: each
    device holds the full (small) waveform but computes and stores only
    its 1/n_frame slice of the (B,F,fft/2+1) spectral tensors.  The F0
    estimators (sequential contour logic) ride 'data' only.  Frame
    sharding requires rng_mode "fast"/"none" (the exact xorshift stream
    is a single global sequence; fast-mode dither keys are per-shard, a
    1e-12-relative difference).
    """
    option = config.CheapTrickOption().resolve(fs)
    fft_size = option.fft_size
    f0_length = config.get_samples_for_dio(fs, x_length, frame_period)
    y_length = int((f0_length - 1) * frame_period / 1000.0 * fs) + 1
    n_frame = 1 if mesh is None else mesh.shape.get("frame", 1)
    if n_frame > 1 and rng_mode == "exact":
        raise ValueError("frame-axis sharding requires rng_mode "
                         "'fast' or 'none' (exact mode consumes one "
                         "global xorshift stream)")

    def constrain(t, spec):
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, spec))

    def f0_stage(x, fs_t):
        """Per-utterance F0 estimate (dio returns its unrefined track;
        stonemask runs in the frame-sharded stage)."""
        if f0_method == "harvest":
            with jax.named_scope("world_harvest"):
                tp, f0 = _harvest_impl(x, fs=fs, frame_period=frame_period,
                                       f0_floor=config.K_FLOOR_F0,
                                       f0_ceil=config.K_CEIL_F0)
        else:
            with jax.named_scope("world_dio"):
                tp, f0 = _dio_impl(x, fs=fs, frame_period=frame_period,
                                   f0_floor=config.K_FLOOR_F0,
                                   f0_ceil=config.K_CEIL_F0,
                                   channels_in_octave=2.0, speed=1,
                                   allowed_range=0.1)
        return tp, f0

    def spap_stage(x, tp, f0, fs_t):
        """Per-utterance frame-major stage: works on any contiguous
        frame slice because every kernel windows the full waveform by
        the frame's absolute time."""
        if f0_method != "harvest":
            with jax.named_scope("world_stonemask"):
                f0 = _stone_mask_impl(x, tp, f0, fs_t, fs=fs)
        with jax.named_scope("world_cheaptrick"):
            sp = _cheap_trick_impl(x, tp, f0, fs=fs, fft_size=fft_size,
                                   q1=option.q1, rng_mode=rng_mode)
        with jax.named_scope("world_d4c"):
            ap, _ = _d4c_impl(x, tp, f0, fs_t, fs=fs, fft_size=fft_size,
                              threshold=config.K_THRESHOLD,
                              rng_mode=rng_mode)
        if codec_dims is not None:
            from ..models.codec import (_code_aperiodicity_impl,
                                        _code_spectral_envelope_impl)
            with jax.named_scope("world_codec"):
                sp_c = _code_spectral_envelope_impl(
                    sp, fs_t, fs=fs, fft_size=fft_size,
                    number_of_dimensions=codec_dims)
                ap_c = _code_aperiodicity_impl(ap, fs_t, fs=fs,
                                               fft_size=fft_size)
            if not with_synthesis:
                return f0, sp_c, ap_c
            # synthesis still needs the full-resolution tensors
            return f0, sp_c, ap_c, sp, ap
        return f0, sp, ap

    def step(x_batch):
        x_batch = constrain(x_batch, P("data", None))
        fs_t = jnp.asarray(float(fs), x_batch.dtype)
        tp, f0 = jax.vmap(lambda x: f0_stage(x, fs_t))(x_batch)

        if n_frame > 1:
            pad = (-f0_length) % n_frame
            tp_p = jnp.pad(tp, ((0, 0), (0, pad)), mode="edge") if pad \
                else tp
            f0_p = jnp.pad(f0, ((0, 0), (0, pad))) if pad else f0
            block = jax.shard_map(
                lambda xb, tpb, f0b, fst: jax.vmap(
                    lambda x, t, f: spap_stage(x, t, f, fst))(
                        xb, tpb, f0b),
                mesh=mesh,
                in_specs=(P("data", None), P("data", "frame"),
                          P("data", "frame"), P()),
                out_specs=P("data", "frame"),
                check_vma=False)
            outs = block(x_batch, tp_p, f0_p, fs_t)
            if pad:
                outs = tuple(o[:, :f0_length] for o in outs)
        else:
            outs = jax.vmap(lambda x, t, f: spap_stage(x, t, f, fs_t))(
                x_batch, tp, f0)

        if codec_dims is not None and with_synthesis:
            f0, sp, ap, sp_full, ap_full = outs
        else:
            f0, sp, ap = outs
            sp_full, ap_full = sp, ap

        if with_synthesis:
            # Synthesis is frame-COUPLED (each output sample
            # overlap-adds pulses from neighboring frames), so it runs
            # monolithically per utterance: sp/ap all-gather along
            # 'frame' exactly once here (~2 copies of (B,F,K) over
            # ICI), and 'data' stays the synthesis scaling axis.
            # tests/test_parallel.py::test_synthesis_step_allgather_is_
            # bounded pins this on the compiled executable.
            with jax.named_scope("world_synthesis"):
                y = jax.vmap(lambda f, s, a: _synthesis_impl(
                    f, s, a, fs_t, fs=fs, fft_size=fft_size,
                    frame_period=frame_period, y_length=y_length,
                    max_pulses=min(y_length,
                                   int(y_length / fs * 1500) + 64),
                    rng_mode=rng_mode))(f0, sp_full, ap_full)
        else:
            y = None

        f0 = constrain(f0, P("data", "frame"))
        sp = constrain(sp, P("data", "frame", None))
        ap = constrain(ap, P("data", "frame", None))
        if y is not None:
            y = constrain(y, P("data", None))
        return f0, sp, ap, y

    return jax.jit(step)


_STEP_CACHE = {}
# Each entry retains a traced step (and, through jit, its compiled
# executables + Mesh reference) for the process lifetime.  Corpus jobs
# should BUCKET lengths (BatchedCorpusRunner does) so the working set
# stays at a handful of entries; the bound below is a leak backstop
# for long-lived processes sweeping many (fs, length) shapes, not a
# working-set tuning knob.  Evicting the oldest entry only drops the
# Python wrapper — XLA's compilation cache still holds the binary, so
# a re-build of an evicted shape re-traces (~seconds) but does not
# recompile.
_STEP_CACHE_MAX = 64


def get_batch_step(fs, x_length, frame_period=5.0, rng_mode="fast",
                   mesh=None, f0_method="dio", with_synthesis=True,
                   codec_dims=None):
    """Memoized make_batch_step: repeated runners (warmup + production,
    resumed jobs) share one traced/compiled step per configuration
    instead of re-tracing a fresh jit wrapper each time."""
    key = (fs, x_length, frame_period, rng_mode, mesh, f0_method,
           with_synthesis, codec_dims)
    if key not in _STEP_CACHE:
        while len(_STEP_CACHE) >= _STEP_CACHE_MAX:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        _STEP_CACHE[key] = make_batch_step(
            fs, x_length, frame_period=frame_period, rng_mode=rng_mode,
            mesh=mesh, f0_method=f0_method, with_synthesis=with_synthesis,
            codec_dims=codec_dims)
    return _STEP_CACHE[key]


def corpus_metrics(f0_batch, lengths, fs, frame_period):
    """Corpus-level reductions (voiced ratio, mean F0) — the kind of
    statistic the distributed runs psum across hosts."""
    voiced = f0_batch > 0
    return {
        "voiced_frames": jnp.sum(voiced),
        "mean_f0": jnp.sum(jnp.where(voiced, f0_batch, 0.0))
        / jnp.maximum(jnp.sum(voiced), 1),
        "audio_seconds": jnp.sum(lengths) / fs,
    }
