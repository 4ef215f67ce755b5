"""Time just the batched Harvest F0 stage on the TPU (honest harness)."""
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # script lives in tools/, package at root
    sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from world_tpu import config
    from world_tpu.models.harvest import _harvest_impl

    x = np.fromfile("tests/goldens/x.f64").astype(np.float32)
    fs = 22050
    batch = 16
    rng = np.random.default_rng()

    fn = jax.jit(jax.vmap(lambda xc: _harvest_impl(
        xc, fs=fs, frame_period=5.0, f0_floor=config.K_FLOOR_F0,
        f0_ceil=config.K_CEIL_F0)))
    tail = jax.jit(lambda tp, f0: f0[:, -4:].ravel())

    def fresh():
        return jnp.asarray(
            x[None, :] * (0.5 + rng.random((batch, 1), dtype=np.float32)))

    out = fn(fresh())
    s = float(np.asarray(tail(*out)).sum())
    for _ in range(4):
        xb = fresh()
        jax.block_until_ready(xb)
        t0 = time.perf_counter()
        out = fn(xb)
        s += float(np.asarray(tail(*out)).sum())
        print(f"{1e3 * (time.perf_counter() - t0):9.1f} ms")
    assert np.isfinite(s)


if __name__ == "__main__":
    main()
