"""Benchmark: aggregate real-time factor of the full WORLD pipeline.

Runs the batched analysis+synthesis step (dio -> stonemask -> cheaptrick
-> d4c -> synthesis, float32 fast mode) on the real TPU chip and prints
one JSON line:

  {"metric": "pipeline_rtf_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": M}

Baseline: the single-core C++ reference processes the 0.794 s fixture in
~0.286 s total (Harvest 212 ms + CheapTrick 11 ms + D4C 47 ms +
Synthesis 8 ms), i.e. ~2.78x real time.  BASELINE.md's target for this
build is >= 50x real time per chip.
"""

import json
import time

import numpy as np

CPP_BASELINE_RTF = 0.793651 / 0.286  # reference single-core, test.cpp timers


def main():
    import jax
    import jax.numpy as jnp

    from world_tpu.parallel.pipeline import make_batch_step

    x = np.fromfile("tests/goldens/x.f64").astype(np.float32)
    fs = 22050
    duration_s = len(x) / fs

    batch = 16
    rng = np.random.RandomState(0)
    scales = 0.5 + rng.rand(batch, 1).astype(np.float32)
    xb = jnp.asarray(x[None, :] * scales)
    step = jax.jit(make_batch_step(fs, len(x), rng_mode="fast"))

    # warmup / compile
    out = step(xb)
    jax.block_until_ready(out)

    # Unique input per iteration: the runtime caches executions with
    # identical input buffers, which would fake the timing.
    iters = 5
    t0 = time.perf_counter()
    for k in range(iters):
        out = step(xb + np.float32(k) * np.float32(1e-6))
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_seconds = batch * duration_s * iters
    rtf = audio_seconds / dt
    result = {
        "metric": "pipeline_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / CPP_BASELINE_RTF, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
