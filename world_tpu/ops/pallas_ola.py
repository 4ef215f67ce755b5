"""Pallas TPU kernel for pitch-synchronous overlap-add.

The synthesis OLA adds ~1e3 responses of fft_size samples at arbitrary
(sorted, pulse-synchronous) sample offsets into the output waveform.  As
an XLA scatter-add this costs ~200 ms for a 16-utterance batch; as a
one-hot matmul ~50 ms (the per-row alignment shift becomes a 23M-element
gather).  Here the accumulator lives in VMEM and each pulse is two
vector rotates plus one aligned read-modify-write.

Mosaic constraints shape the kernel: no 1D vectors, dynamic stores must
be tile-aligned.  So the waveform lives as (y/128, 128) rows, each
response row as (fft/128, 128), and an offset off = 1024*q + 128*a + c
becomes a dynamic lane rotate by c, a dynamic sublane rotate by a, and a
store at row 8*q (8 rows = 1024 samples, the f32 tile height).

Reference semantics (src/synthesis.cpp:370-386): out-of-range samples
are dropped; callers guarantee offsets are pre-clamped into the padded
range and invalid pulses carry all-zero responses.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
BLK = LANE * SUB  # 1024 samples per aligned store block


def _ola_kernel(off_ref, resp_ref, y_ref):
    _, max_pulses, rows, _ = resp_ref.shape
    b = pl.program_id(0)
    y_ref[...] = jnp.zeros_like(y_ref)
    zeros = jnp.zeros((rows, LANE), y_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, LANE), 1)

    def body(p, _):
        off = off_ref[b * max_pulses + p]
        q = off // BLK
        a = (off % BLK) // LANE
        c = off % LANE
        row2d = jnp.concatenate([resp_ref[0, p], zeros], axis=0)
        # 1-D roll by c over the flattened (2*rows, LANE) buffer: lane
        # rotate, then pull the wrapped lanes from the previous sublane.
        rot = pltpu.roll(row2d, c, 1)
        prev = pltpu.roll(rot, 1, 0)  # wrap row holds zeros (top half)
        shifted = jnp.where(col >= c, rot, prev)
        # Remaining sublane shift by a (wraps only zero rows).
        shifted = pltpu.roll(shifted, a, 0)
        start = pl.multiple_of(q * SUB, SUB)
        y_ref[0, pl.ds(start, 2 * rows), :] += shifted
        return 0

    jax.lax.fori_loop(0, max_pulses, body, 0)


@functools.partial(jax.jit, static_argnames=("y_padded",))
def ola_accumulate(responses, offsets, *, y_padded):
    """Scatter-add ``responses[b, p]`` at ``offsets[b, p]`` into a
    (batch, y_padded) waveform.

    offsets MUST already satisfy 0 <= off <= y_padded - fft_size (clamp
    and zero-fill invalid pulses before calling).
    """
    batch, max_pulses, fft_size = responses.shape
    if fft_size % BLK:
        # Small fft sizes (512 at fs 8000/11025): zero-pad each response
        # row to the 1024-sample store block; offsets are unchanged and
        # the padded tail adds zeros.
        f_pad = (-fft_size) % BLK
        responses = jnp.concatenate(
            [responses,
             jnp.zeros((batch, max_pulses, f_pad), responses.dtype)], axis=2)
        fft_size += f_pad
    p_pad = (-max_pulses) % 8
    if p_pad:
        responses = jnp.concatenate(
            [responses,
             jnp.zeros((batch, p_pad, fft_size), responses.dtype)], axis=1)
        offsets = jnp.concatenate(
            [offsets, jnp.zeros((batch, p_pad), offsets.dtype)], axis=1)
        max_pulses += p_pad
    rows = fft_size // LANE
    # The aligned store spans up to off + 2*fft_size.
    yp = y_padded + fft_size + ((-y_padded) % BLK)
    resp4 = responses.reshape(batch, max_pulses, rows, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, max_pulses, rows, LANE),
                         lambda b, off: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, yp // LANE, LANE),
                               lambda b, off: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _ola_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, yp // LANE, LANE),
                                       responses.dtype),
        # Non-TPU backends (CPU float32 tests) run the interpreter.
        interpret=jax.default_backend() == "cpu",
    )(offsets.reshape(-1), resp4)
    return out.reshape(batch, yp)[:, :y_padded]
