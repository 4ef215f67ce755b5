"""Microbenchmark TPU primitives used by the pipeline.

Timing on this backend needs care:
- dispatch is async; completion is forced by fetching a tiny slice of
  the output through a pre-compiled tail program;
- repeat executions are memoized by input content, so each call gets a
  fresh entropy seed;
- host->device transfer through the tunnel costs ~30 ms for MBs, so the
  big operand is synthesized ON DEVICE from the tiny seed.

A "null" case (synthesize operand + fetch, no op) measures the floor;
subtract it mentally from the others.

Usage: python tools/microbench.py [name ...]
"""

import sys
import time

import numpy as np

F, N = 2544, 2048  # frames x fft_size, the d4c body shape


def main(names):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng()

    def operand(seed, shape=(F, N)):
        i = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
        return jnp.sin(i * seed[0] + j * seed[1] + seed[2])

    cases = {
        "null": lambda s: operand(s),
        "rfft_2048": lambda s: jnp.abs(jnp.fft.rfft(operand(s), axis=-1)),
        "rfft_x8": lambda s: sum(
            jnp.abs(jnp.fft.rfft(operand(s) + k, axis=-1))
            for k in range(8)),
        "irfft_roundtrip": lambda s: jnp.fft.irfft(
            jnp.fft.rfft(operand(s), axis=-1), axis=-1),
        "rfft_4096": lambda s: jnp.abs(
            jnp.fft.rfft(operand(s, (F, 4096)), axis=-1)),
        "matmul_2048": lambda s: operand(s) @ operand(s, (N, N))[:N],
        "top_k_44": lambda s: jax.lax.top_k(operand(s), 44)[0],
        "sort_full": lambda s: jnp.sort(operand(s), axis=-1),
        "cumsum": lambda s: jnp.cumsum(operand(s), axis=-1),
        "frame_gather": lambda s: (lambda x: jax.vmap(
            lambda c: x[jnp.clip(c + jnp.arange(N), 0, x.shape[0] - 1)])(
                (jnp.abs(x[:F]) * 1e4).astype(jnp.int32) % 17000))(
                    operand(s, (17500,))),
        "dynamic_slice_vmap": lambda s: (lambda g: jax.vmap(
            lambda st: jax.lax.dynamic_slice(g, (st,), (381,)))(
                (jnp.abs(g[:F]) * 1e3).astype(jnp.int32) % 1024))(
                    operand(s, (N,))),
        "exp_log": lambda s: jnp.exp(jnp.log(jnp.abs(operand(s)) + 1.0)),
        "interp_like": lambda s: (lambda a: jnp.take_along_axis(
            a, jnp.clip((jnp.abs(a) * 7).astype(jnp.int32), 0, N - 1),
            axis=-1))(operand(s)),
    }

    for name in (names or cases):
        fn = jax.jit(cases[name])
        tail = jax.jit(
            lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[-4:])
        mk = lambda: jnp.asarray(
            rng.standard_normal(3).astype(np.float32))
        o = fn(mk())
        np.asarray(tail(o))
        ts = []
        for _ in range(3):
            sk = mk()
            jax.block_until_ready(sk)
            t0 = time.perf_counter()
            o = fn(sk)
            np.asarray(tail(o))
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s} {min(ts)*1000:10.2f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
