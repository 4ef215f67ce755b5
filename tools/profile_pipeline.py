"""Trace a pipeline stage on TPU and print the top device ops.

Usage: python tools/profile_pipeline.py [stage] [batch]
  stage in {pipeline, harvest, dio, cheaptrick, d4c, synthesis}
  batch: utterances per step (default 16)

Works from any cwd (golden paths resolve relative to the repo root).
Only the 'XLA Ops' trace line is summed, so module-level span events
never double-count the device total.
"""
import glob
import gzip
import json
import pathlib
import sys
from collections import defaultdict

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # script lives in tools/, package at root
    sys.path.insert(0, str(REPO))


def _golden(name, fs=22050):
    d = "goldens" if fs == 22050 else f"goldens_fs{fs // 1000}"
    return np.fromfile(REPO / "tests" / d / name)


def make_stage(stage, fs, x, batch):
    """Returns (fn, tail, make_input) for one jitted stage at ``batch``."""
    import jax
    import jax.numpy as jnp

    from world_tpu import config
    from world_tpu.parallel.pipeline import make_batch_step

    rng = np.random.default_rng()

    def fresh_x():
        return jnp.asarray(
            x[None, :] * (0.5 + rng.random((batch, 1), dtype=np.float32)))

    if stage == "pipeline":
        fn = jax.jit(make_batch_step(fs, len(x), rng_mode="fast",
                                     f0_method="harvest"))
        return fn, jax.jit(lambda o: o[3][:, -8:].ravel()), fresh_x

    option = config.CheapTrickOption().resolve(fs)
    fft_size = option.fft_size
    frame_period = 5.0
    fs_f = float(fs)

    if stage == "harvest":
        from world_tpu.models.harvest import _harvest_impl
        fn = jax.jit(jax.vmap(lambda xc: _harvest_impl(
            xc, fs=fs, frame_period=frame_period,
            f0_floor=config.K_FLOOR_F0, f0_ceil=config.K_CEIL_F0)))
        return fn, jax.jit(lambda o: o[1][:, -4:].ravel()), fresh_x
    if stage == "dio":
        from world_tpu.models.dio import _dio_impl
        from world_tpu.models.stonemask import _stone_mask_impl

        def dio_sm(xc):
            tp, f0 = _dio_impl(
                xc, fs=fs, frame_period=frame_period,
                f0_floor=config.K_FLOOR_F0, f0_ceil=config.K_CEIL_F0,
                channels_in_octave=2.0, speed=1, allowed_range=0.1)
            return tp, _stone_mask_impl(xc, tp, f0,
                                        jnp.asarray(fs_f, xc.dtype), fs=fs)

        fn = jax.jit(jax.vmap(dio_sm))
        return fn, jax.jit(lambda o: o[1][:, -4:].ravel()), fresh_x

    # Parameter-consuming stages need (x, tp, f0[, sp, ap]) inputs.
    from world_tpu.models.cheaptrick import _cheap_trick_impl
    from world_tpu.models.d4c import _d4c_impl
    from world_tpu.models.dio import _dio_impl
    from world_tpu.models.stonemask import _stone_mask_impl
    from world_tpu.models.synthesis import _synthesis_impl

    def dio_sm(xc):
        tp, f0 = _dio_impl(
            xc, fs=fs, frame_period=frame_period,
            f0_floor=config.K_FLOOR_F0, f0_ceil=config.K_CEIL_F0,
            channels_in_octave=2.0, speed=1, allowed_range=0.1)
        return tp, _stone_mask_impl(xc, tp, f0,
                                    jnp.asarray(fs_f, xc.dtype), fs=fs)

    dio_f0 = jax.jit(jax.vmap(dio_sm))
    cheaptrick = jax.jit(jax.vmap(lambda xc, tp, f0: _cheap_trick_impl(
        xc, tp, f0, fs=fs, fft_size=fft_size, q1=option.q1,
        rng_mode="fast")))
    d4c = jax.jit(jax.vmap(lambda xc, tp, f0: _d4c_impl(
        xc, tp, f0, jnp.asarray(fs_f, xc.dtype), fs=fs, fft_size=fft_size,
        threshold=config.K_THRESHOLD, rng_mode="fast")[0]))
    f0_length = config.get_samples_for_dio(fs, len(x), frame_period)
    y_length = int((f0_length - 1) * frame_period / 1000.0 * fs) + 1
    synth = jax.jit(jax.vmap(lambda f0, sp, ap: _synthesis_impl(
        f0, sp, ap, jnp.asarray(fs_f, sp.dtype), fs=fs, fft_size=fft_size,
        frame_period=frame_period, y_length=y_length,
        max_pulses=min(y_length, int(y_length / fs_f * 1500) + 64),
        rng_mode="fast")))

    def stage_inputs():
        xb = fresh_x()
        tp, f0 = jax.block_until_ready(dio_f0(xb))
        sp = jax.block_until_ready(cheaptrick(xb, tp, f0))
        ap = jax.block_until_ready(d4c(xb, tp, f0))
        return xb, tp, f0, sp, ap

    tail1 = jax.jit(lambda o: o[:, -4:].ravel() if o.ndim == 2
                    else o[:, -1, -4:].ravel())
    if stage == "cheaptrick":
        return (lambda a: cheaptrick(a[0], a[1], a[2])), tail1, stage_inputs
    if stage == "d4c":
        return (lambda a: d4c(a[0], a[1], a[2])), tail1, stage_inputs
    if stage == "synthesis":
        return (lambda a: synth(a[2], a[3], a[4])), tail1, stage_inputs
    raise SystemExit(f"unknown stage {stage}")


def run(stage="pipeline", batch=16, fs=22050):
    import jax

    x = _golden("x.f64", fs).astype(np.float32)
    fn, tail, make_input = make_stage(stage, fs, x, batch)

    out = fn(make_input())  # compile
    s = float(np.asarray(tail(out)).sum())

    tracedir = "/tmp/jaxtrace_prof"
    import shutil
    shutil.rmtree(tracedir, ignore_errors=True)
    args = make_input()
    jax.block_until_ready(args)
    with jax.profiler.trace(tracedir):
        out = fn(args)
        s += float(np.asarray(tail(out)).sum())
    assert np.isfinite(s)

    paths = glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    # Metadata: process ("TPU:0 …") and thread ("XLA Ops", "XLA Modules",
    # "Steps" …) names.  Sum ONLY the per-op line: module-level span
    # events cover the same wall-clock and would double-count.
    pidname, tidname = {}, {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"]["name"]
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tidname[(e["pid"], e["tid"])] = e["args"]["name"]
    bucket = defaultdict(float)
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pn = pidname.get(e["pid"], "")
        if "TPU" not in pn and "tpu" not in pn and "XLA" not in pn:
            continue
        tn = tidname.get((e["pid"], e.get("tid")), "")
        if "XLA Ops" not in tn:
            continue
        bucket[e["name"]] += e["dur"]
        total += e["dur"]
    items = sorted(bucket.items(), key=lambda kv: -kv[1])
    print(f"# {stage} batch={batch}: device total {total/1e3:.1f} ms over "
          f"{len(items)} op names "
          f"(threads: {sorted(set(tidname.values()))[:8]})")
    for name, dur in items[:60]:
        print(f"{dur/1e3:9.2f} ms  {name[:140]}")

    # Source attribution: join op names against the compiled HLO's
    # metadata so the long tail of small fusions is chargeable to a
    # module, not just the top-60 to an op id.  jit-wrapped callables
    # expose lower(); plain lambdas (stage wrappers) are skipped.
    try:
        import re
        hlo = fn.lower(args).compile().as_text()
    except Exception as e:  # pragma: no cover
        print(f"# (no source attribution: {e})")
        return
    src_of = {}
    pat = re.compile(r"%(\S+?) = .*?source_file=\"([^\"]+)\""
                     r"(?:.*?source_line=(\d+))?")
    for m in pat.finditer(hlo):
        src_of.setdefault(m.group(1), (m.group(2), m.group(3) or "?"))
    per_src = defaultdict(float)
    per_line = defaultdict(float)
    for name, dur in items:
        src, line = src_of.get(name, ("<unattributed>", "?"))
        src = src.replace("/root/repo/", "")
        per_src[src] += dur
        per_line[f"{src}:{line}"] += dur
    print("# per-source totals:")
    for src, dur in sorted(per_src.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur/1e3:9.2f} ms  {src}")
    print("# per-line totals (top 40):")
    for src, dur in sorted(per_line.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  {src}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "pipeline",
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
        int(sys.argv[3]) if len(sys.argv) > 3 else 22050)
