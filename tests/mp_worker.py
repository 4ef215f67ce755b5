"""Worker for tests/test_multiprocess.py: one of N jax.distributed
processes on the CPU backend (2 virtual devices each), running the
sharded batch step over the GLOBAL ('data','frame') mesh.

Usage: python mp_worker.py <process_id> <num_processes> <port> <workdir>

Reads <workdir>/batch.npy (B, L); writes <workdir>/proc<i>.npz with the
process's addressable output shards (utterance index -> rows) plus the
allreduce_metrics result, which must agree across processes.
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from world_tpu.utils import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from world_tpu.parallel.pipeline import make_batch_step, make_mesh

    batch = np.load(os.path.join(workdir, "batch.npy"))
    n_utt, x_length = batch.shape
    fs = 22050

    # Global mesh over every device of every process; one utterance per
    # device on the 'data' axis.
    mesh = make_mesh(n_data=len(jax.devices()), n_frame=1)
    sharding = NamedSharding(mesh, P("data", None))
    xb = jax.make_array_from_callback(
        batch.shape, sharding, lambda idx: jnp.asarray(batch[idx]))

    step = make_batch_step(fs, x_length, rng_mode="none", mesh=mesh)
    f0, sp, ap, y = step(xb)

    # Per-host contribution (addressable shards only) + global psum.
    local_voiced = sum(float((np.asarray(s.data) > 0).sum())
                       for s in f0.addressable_shards)
    reduced = distributed.allreduce_metrics({"voiced_frames": local_voiced})

    out = {"voiced_global": reduced["voiced_frames"]}
    for name, arr in (("f0", f0), ("sp", sp), ("y", y)):
        for s in arr.addressable_shards:
            out[f"{name}_{s.index[0].start}"] = np.asarray(s.data)
    np.savez(os.path.join(workdir, f"proc{pid}.npz"), **out)
    print(f"proc {pid} ok: devices={len(jax.devices())} "
          f"voiced_global={reduced['voiced_frames']}")


if __name__ == "__main__":
    main()
