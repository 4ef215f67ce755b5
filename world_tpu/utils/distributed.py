"""Multi-host initialization and corpus sharding helpers.

The reference has no distributed runtime; scaling here rides JAX's
standard multi-host machinery: `initialize()` joins the jax.distributed
cluster (ICI within a slice, DCN across slices), `shard_utterances`
splits a corpus across processes, and `allreduce_metrics` sums metric
dicts over hosts with a psum.
"""

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """jax.distributed.initialize with env-var fallbacks; no-op if the
    runtime is already initialized or single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_utterances(paths, process_index=None, process_count=None):
    """Deterministic round-robin split of a corpus across processes."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(paths)[pi::pc]


def allreduce_metrics(metrics, mesh=None):
    """Sum each process's numeric metrics across all hosts.

    Single-process this is the identity (one host's contribution);
    multi-process it all-gathers the per-host vectors over the global
    device mesh and sums (tests/test_multiprocess.py runs it across
    two OS processes on the CPU backend)."""
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    keys = sorted(k for k, v in metrics.items()
                  if isinstance(v, (int, float)))
    local = jnp.asarray([float(metrics[k]) for k in keys], jnp.float32)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(local)  # (nproc, k)
        return dict(zip(keys, np.asarray(gathered).sum(0).tolist()))

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
    n = len(jax.devices())
    tiled = jnp.tile(local[None, :], (n, 1))

    def reduce_fn(vals):
        return jax.lax.psum(vals / n, "all")

    summed = shard_map(reduce_fn, mesh=mesh, in_specs=P("all", None),
                       out_specs=P(None))(tiled)
    return dict(zip(keys, np.asarray(summed).reshape(-1).tolist()))
