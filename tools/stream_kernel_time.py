"""Time the streaming render kernels on the real chip, isolating device
compute from fetch: dispatch, block via tiny-slice fetch (pre-compiled),
then full fetch.  Run alone (one TPU process at a time)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from world_tpu.models import realtime as rt

    fft = 1024
    cap = 256
    span = 24576
    dtype = np.float32
    rng = np.random.default_rng()

    dc = jnp.asarray(rt._dc_remover_half(fft // 2, dtype))

    def fresh_inputs():
        envs = jnp.asarray(
            np.abs(rng.standard_normal((cap, fft // 2 + 1))) + 0.1,
            dtype)
        aps = jnp.asarray(rng.random((cap, fft // 2 + 1)) * 0.9 + 0.05,
                          dtype)
        vuvs = jnp.ones(cap, dtype)
        sizes = jnp.full(cap, 130, jnp.int32)
        draws = jnp.asarray(rng.standard_normal((cap, fft)), dtype)
        offs = jnp.asarray(np.arange(cap) * 90, jnp.int32)
        clips = jnp.zeros(cap, jnp.int32)
        return envs, aps, vuvs, sizes, draws, offs, clips

    tail_resp = jax.jit(lambda o: o[-1, -4:])
    tail_span = jax.jit(lambda o: o[-4:])

    # compile
    e, a, v, s, d, o, c = fresh_inputs()
    rows = rt._response_batch(e, a, v, d, s, dc, fft_size=fft)
    np.asarray(tail_resp(rows))
    sp = rt._span_batch(e, a, v, d, s, dc, o, c, fft_size=fft, span=span)
    np.asarray(tail_span(sp))
    nz = rt._fast_noise(jax.random.PRNGKey(3), jnp.arange(cap, dtype=jnp.uint32), fft, "float32")
    np.asarray(nz[-1, -4:])

    for name, fn, tail in (
            ("response_batch", lambda i: rt._response_batch(
                i[0], i[1], i[2], i[4], i[3], dc, fft_size=fft), tail_resp),
            ("span_batch", lambda i: rt._span_batch(
                i[0], i[1], i[2], i[4], i[3], dc, i[5], i[6],
                fft_size=fft, span=span), tail_span)):
        compute, full = [], []
        for _ in range(5):
            inp = fresh_inputs()
            jax.block_until_ready(inp)
            t0 = time.perf_counter()
            out = fn(inp)
            np.asarray(tail(out))  # forces completion, tiny fetch
            t1 = time.perf_counter()
            _ = np.asarray(out)  # full fetch of a READY result
            t2 = time.perf_counter()
            compute.append(1e3 * (t1 - t0))
            full.append(1e3 * (t2 - t1))
        print(f"{name}: dispatch+compute+tinyfetch ms="
              f"{[round(x,1) for x in compute]} "
              f"fullfetch ms={[round(x,1) for x in full]}")


if __name__ == "__main__":
    main()
