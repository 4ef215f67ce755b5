"""True multi-HOST simulation (SURVEY §4.4): the sharded pipeline runs
across two OS processes (2 virtual CPU devices each) joined via
jax.distributed + Gloo collectives, and must reproduce the
single-process result bit-for-bit.  This exercises what the in-process
8-device tests cannot: global-array construction from per-host shards,
cross-process collectives, and the multi-host allreduce_metrics path.
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step_matches_single(gold, tmp_path):
    fs = gold.scalar("fs")
    x = np.asarray(gold["x"][:4096], np.float64)
    batch = np.stack([x * s for s in (1.0, 0.7, 0.5, 0.3)])
    np.save(tmp_path / "batch.npy", batch)

    # Single-process reference (current pytest runtime, unsharded).
    import jax.numpy as jnp

    from world_tpu.parallel.pipeline import make_batch_step

    step = make_batch_step(fs, 4096, rng_mode="none")
    f0_p, sp_p, ap_p, y_p = (np.asarray(a)
                             for a in step(jnp.asarray(batch)))

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    worker = os.path.join(HERE, "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    voiced_ref = float((f0_p > 0).sum())
    got = {}
    for i in range(2):
        with np.load(tmp_path / f"proc{i}.npz") as z:
            assert z["voiced_global"] == voiced_ref, (
                i, float(z["voiced_global"]), voiced_ref)
            for k in z.files:
                if k != "voiced_global":
                    got[k] = z[k]

    for name, ref in (("f0", f0_p), ("sp", sp_p), ("y", y_p)):
        rows = [got[f"{name}_{r}"] for r in range(len(batch))]
        np.testing.assert_array_equal(np.concatenate(rows), ref,
                                      err_msg=name)
