"""Deterministic RNG matching the reference, plus a fast TPU-native mode.

The reference uses xorshift128 with a fixed seed, summing 12 draws of
(w >> 4) to approximate N(0,1) (reference src/matlabfunctions.cpp:237-264).
Every public entry point reseeds, so outputs are bit-reproducible.

The C++ consumes the stream *sequentially* across data-dependent block
sizes (one block per frame / per pulse).  To reproduce that on TPU without
a serial dependency across blocks, we exploit that the xorshift128 state
update is linear over GF(2): jumping k draws ahead is a 128x128 bit-matrix
power.  We precompute M^(2^b) for the per-draw transition M (12 state
steps), land every block's start state in parallel, then run short
vmapped scans inside each block.

Fast mode (production path) uses jax.random instead; the synthesis noise
tolerance (SNR within 0.5 dB) does not require bit-exact noise.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

SEED = (123456789, 362436069, 521288629, 88675123)


def _state_step_bits(bits):
    """One state update acting on a 128-bit boolean vector (numpy)."""
    x = bits[0:32]
    y = bits[32:64]
    z = bits[64:96]
    w = bits[96:128]
    # t = x ^ (x << 11): bit i of t = x[i] ^ x[i-11] (left shift moves bits up)
    t = x.copy()
    t[11:] ^= x[:-11]
    # w' = (w ^ (w>>19)) ^ (t ^ (t>>8))
    wn = w.copy()
    wn[:-19] ^= w[19:]
    wn ^= t
    wn[:-8] ^= t[8:]
    out = np.empty(128, np.uint8)
    out[0:32] = y
    out[32:64] = z
    out[64:96] = w
    out[96:128] = wn
    return out


@functools.lru_cache(maxsize=1)
def _jump_matrices(max_log2=34):
    """M_draw^(2^b) for b in 0..max_log2-1, where M_draw = 12 state steps.

    Returned as a numpy array (max_log2, 128, 128) uint8; row-major action:
    next_bits = (bits @ M.T) & 1  ==  M @ bits.
    """
    # Build the single-step matrix column by column (action on basis vecs).
    eye = np.eye(128, dtype=np.uint8)
    m_step = np.stack([_state_step_bits(eye[i]) for i in range(128)], axis=1)

    def matmul2(a, b):
        return (a.astype(np.int32) @ b.astype(np.int32) & 1).astype(np.uint8)

    m_draw = eye
    for _ in range(12):
        m_draw = matmul2(m_step, m_draw)
    mats = np.empty((max_log2, 128, 128), np.uint8)
    mats[0] = m_draw
    for b in range(1, max_log2):
        mats[b] = matmul2(mats[b - 1], mats[b - 1])
    return mats


def _seed_bits(dtype=np.uint8):
    bits = np.zeros(128, dtype)
    for word, val in enumerate(SEED):
        for b in range(32):
            bits[word * 32 + b] = (val >> b) & 1
    return bits


def states_at_draws(offsets):
    """States (uint32[4]) positioned just before draw number ``offsets``.

    offsets: int32 array (n,) of draw indices (0 = fresh seed).  Fully
    parallel: log2(max_offset) masked GF(2) matrix applications.
    """
    mats = jnp.asarray(_jump_matrices())
    bits = jnp.broadcast_to(jnp.asarray(_seed_bits()), offsets.shape + (128,))
    offsets = offsets.astype(jnp.int64)

    def body(b, bits):
        take = ((offsets >> b) & 1).astype(bool)
        jumped = (bits.astype(jnp.int32) @ mats[b].astype(jnp.int32).T) & 1
        return jnp.where(take[..., None], jumped.astype(jnp.uint8), bits)

    bits = jax.lax.fori_loop(0, mats.shape[0], body, bits)
    # Pack bits back into 4 uint32 words.
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = (bits.reshape(offsets.shape + (4, 32)).astype(jnp.uint32)
             * weights).sum(axis=-1, dtype=jnp.uint32)
    return words


def _state_step(state):
    x, y, z, w = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    t = x ^ (x << 11)
    wn = (w ^ (w >> 19)) ^ (t ^ (t >> 8))
    return jnp.stack([y, z, w, wn], axis=-1)


def randn_block(state, n):
    """Draw ``n`` normals sequentially from ``state`` (uint32[..., 4]).

    Matches reference randn() (src/matlabfunctions.cpp:244-264).
    Returns (draws[..., n], final_state).
    """
    def draw(state, _):
        def sub(i, carry):
            st, acc = carry
            st = _state_step(st)
            return st, acc + (st[..., 3] >> 4)

        state, acc = jax.lax.fori_loop(
            0, 12, sub, (state, jnp.zeros(state.shape[:-1], jnp.uint32)))
        val = acc.astype(jnp.float64) / 268435456.0 - 6.0
        return state, val

    state, draws = jax.lax.scan(draw, state, None, length=n)
    return jnp.moveaxis(draws, 0, -1), state


def randn_blocks_at(offsets, n):
    """Parallel blocks: for each offset, n sequential draws starting there.

    offsets: (F,) draw indices.  Returns (F, n) float64 draws.
    """
    states = states_at_draws(offsets)
    draws, _ = jax.vmap(lambda s: randn_block(s, n))(states)
    return draws


def randn_sequence(n):
    """First n draws after a reseed (for golden tests / synthesis noise)."""
    state = states_at_draws(jnp.zeros((1,), jnp.int32))[0]
    draws, _ = randn_block(state, n)
    return draws
