import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from world_tpu.parallel.pipeline import (make_batch_step, make_mesh,
                                         pad_and_bucket)


def test_mesh_and_sharded_step_matches_single_device(gold):
    """Numerical results must be identical with and without sharding."""
    assert len(jax.devices()) == 8
    fs = gold.scalar("fs")
    x = np.asarray(gold["x"][:4096], np.float64)
    batch = np.stack([x * s for s in (1.0, 0.7, 0.5, 0.3)])

    step_plain = make_batch_step(fs, 4096, rng_mode="none")
    f0_p, sp_p, ap_p, y_p = step_plain(jnp.asarray(batch))

    mesh = make_mesh(n_data=4, n_frame=2)
    step_sharded = make_batch_step(fs, 4096, rng_mode="none", mesh=mesh)
    xb = jax.device_put(jnp.asarray(batch),
                        NamedSharding(mesh, P("data", None)))
    f0_s, sp_s, ap_s, y_s = step_sharded(xb)

    np.testing.assert_allclose(np.asarray(f0_p), np.asarray(f0_s), atol=0)
    np.testing.assert_allclose(np.asarray(sp_p), np.asarray(sp_s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s), atol=1e-12)


def test_sharded_harvest_matches_single_device(gold):
    """The harvest path (scan-heavy contour logic) under a mesh with
    sharding constraints must equal the unsharded run."""
    assert len(jax.devices()) == 8
    fs = gold.scalar("fs")
    import __graft_entry__ as ge
    batch = ge._voiced(4096, fs, batch=4)

    step_plain = make_batch_step(fs, 4096, rng_mode="none",
                                 f0_method="harvest")
    f0_p, sp_p, ap_p, y_p = step_plain(jnp.asarray(batch))
    assert (np.asarray(f0_p) > 0).sum() > 0  # fixture must be voiced

    mesh = make_mesh(n_data=4, n_frame=2)
    step_sharded = make_batch_step(fs, 4096, rng_mode="none", mesh=mesh,
                                   f0_method="harvest")
    xb = jax.device_put(jnp.asarray(batch),
                        NamedSharding(mesh, P("data", None)))
    f0_s, sp_s, ap_s, y_s = step_sharded(xb)

    np.testing.assert_allclose(np.asarray(f0_p), np.asarray(f0_s), atol=0)
    np.testing.assert_allclose(np.asarray(sp_p), np.asarray(sp_s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s), atol=1e-12)


def test_pad_and_bucket():
    ws = [np.ones(100), np.ones(900), np.ones(1500), np.ones(80)]
    buckets = pad_and_bucket(ws, [128, 1024, 2048])
    assert set(buckets) == {128, 1024, 2048}
    arr, lengths, idx = buckets[128]
    assert arr.shape == (2, 128)
    assert list(lengths) == [100, 80]
    assert list(idx) == [0, 3]
    with pytest.raises(ValueError):
        pad_and_bucket([np.ones(5000)], [128])


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = fn(*args)
    for t in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(t)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_scaling_cli_smoke():
    """`tools scaling` must stay runnable: 2-device virtual mesh, one
    tiny weak-scaling row per mesh size, valid JSON with efficiency
    fields (the committed SCALING_r*.json artifacts are produced by
    this same command)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "world_tpu.tools", "scaling",
         "--devices", "1,2", "--batch-per-device", "1",
         "--seconds", "0.25", "--fs", "8000", "--iters", "1"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "scaling_efficiency"
    assert [r["devices"] for r in rec["rows"]] == [1, 2]
    assert all(r["throughput_xrt"] > 0 for r in rec["rows"])
    assert rec["rows"][0]["efficiency"] == 1.0
