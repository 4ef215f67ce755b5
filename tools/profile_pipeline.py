"""Trace the fused harvest-path pipeline step on TPU and print the top ops.

Usage: python tools/profile_pipeline.py [stage]
  stage in {pipeline, harvest, d4c, synthesis, cheaptrick}
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np


def run(stage="pipeline"):
    import jax
    import jax.numpy as jnp

    from world_tpu import config
    from world_tpu.parallel.pipeline import make_batch_step

    x = np.fromfile("tests/goldens/x.f64").astype(np.float32)
    fs = 22050
    batch = 16
    rng = np.random.default_rng()

    if stage == "pipeline":
        fn = jax.jit(make_batch_step(fs, len(x), rng_mode="fast",
                                     f0_method="harvest"))
        tail = jax.jit(lambda o: o[3][:, -8:].ravel())
    elif stage == "harvest":
        from world_tpu.models.harvest import _harvest_impl
        fn = jax.jit(jax.vmap(lambda xc: _harvest_impl(
            xc, fs=fs, frame_period=5.0, f0_floor=config.K_FLOOR_F0,
            f0_ceil=config.K_CEIL_F0)))
        tail = jax.jit(lambda o: o[1][:, -4:].ravel())
    else:
        raise SystemExit(f"unknown stage {stage}")

    def fresh():
        return jnp.asarray(
            x[None, :] * (0.5 + rng.random((batch, 1), dtype=np.float32)))

    out = fn(fresh())  # compile
    s = float(np.asarray(tail(out)).sum())

    tracedir = "/tmp/jaxtrace_prof"
    import shutil
    shutil.rmtree(tracedir, ignore_errors=True)
    xb = fresh()
    jax.block_until_ready(xb)
    with jax.profiler.trace(tracedir):
        out = fn(xb)
        s += float(np.asarray(tail(out)).sum())
    assert np.isfinite(s)

    paths = glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace["traceEvents"]
              if e.get("ph") == "X" and "dur" in e]
    # device events: pid names containing "TPU" / xla ops
    pidname = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"]["name"]
    bucket = defaultdict(float)
    total = 0.0
    for e in events:
        pn = pidname.get(e["pid"], "")
        if "TPU" not in pn and "tpu" not in pn and "XLA" not in pn:
            continue
        tid_ok = True
        if not tid_ok:
            continue
        name = e["name"]
        bucket[name] += e["dur"]
        total += e["dur"]
    items = sorted(bucket.items(), key=lambda kv: -kv[1])
    print(f"# device total {total/1e3:.1f} ms over {len(items)} op names "
          f"(pids: {set(pidname.values())})")
    for name, dur in items[:60]:
        print(f"{dur/1e3:9.2f} ms  {name[:140]}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "pipeline")
