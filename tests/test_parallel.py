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


def _allgather_bytes(hlo_text):
    """Total bytes moved by all-gather ops in compiled HLO."""
    import re
    sizes = {"f32": 4, "f64": 8, "s32": 4, "s64": 8, "u32": 4, "pred": 1,
             "c64": 8, "c128": 16, "bf16": 2, "f16": 2}
    total = 0
    for line in hlo_text.splitlines():
        if "all-gather" not in line or "=" not in line:
            continue
        m = re.search(r"=\s*(\w+)\[([\d,]*)\]", line)
        if m:
            dims = [int(d) for d in m.group(2).split(",") if d]
            total += int(np.prod(dims)) * sizes.get(m.group(1), 4) \
                if dims else sizes.get(m.group(1), 4)
    return total


def test_frame_axis_shards_compute_and_memory():
    """The 'frame' mesh axis must PARTITION the per-frame sp/ap compute,
    not merely constrain output layouts (a GSPMD regression to
    replicated compute would pass pure equality tests).  Asserted via
    the compiled executable itself:

    - per-device output shards are (B/d, F/f, K) — outputs really live
      1/(d*f)-sized on each device;
    - per-device temp memory shrinks by >2x vs the unsharded step
      (replicated frame compute would keep it ~1x);
    - with F divisible by n_frame, the harvest step compiles to ZERO
      all-gather bytes — no collective ever carries a spectral tensor
      (the waveform is replicated along 'frame' from the start).
    """
    fs = 22050
    n = 8768  # -> F = 80 frames: divisible by every n_frame used here
    F, K = 80, 1025
    B = 2
    xb = jnp.zeros((B, n), jnp.float32)

    plain = make_batch_step(fs, n, rng_mode="fast", f0_method="dio",
                            with_synthesis=False)
    t_plain = plain.lower(xb).compile().memory_analysis() \
        .temp_size_in_bytes

    mesh = make_mesh(n_data=2, n_frame=4)
    sharded = make_batch_step(fs, n, rng_mode="fast", f0_method="dio",
                              mesh=mesh, with_synthesis=False)
    xs = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
    comp = sharded.lower(xs).compile()

    f0_sh, sp_sh, ap_sh, _ = comp.output_shardings
    assert sp_sh.shard_shape((B, F, K)) == (B // 2, F // 4, K), sp_sh
    assert ap_sh.shard_shape((B, F, K)) == (B // 2, F // 4, K), ap_sh
    assert f0_sh.shard_shape((B, F)) == (B // 2, F // 4), f0_sh

    t_sharded = comp.memory_analysis().temp_size_in_bytes
    assert t_sharded < 0.5 * t_plain, (t_sharded, t_plain)

    # harvest, frame-only mesh: no all-gather at all in the analysis step
    mesh_f = make_mesh(n_data=1, n_frame=8)
    sharded_h = make_batch_step(fs, n, rng_mode="fast",
                                f0_method="harvest", mesh=mesh_f,
                                with_synthesis=False)
    xs_f = jax.device_put(xb, NamedSharding(mesh_f, P("data", None)))
    comp_h = sharded_h.lower(xs_f).compile()
    ag = _allgather_bytes(comp_h.as_text())
    assert ag == 0, f"harvest frame-sharded step all-gathers {ag} bytes"


def test_frame_axis_requires_inexact_rng():
    mesh = make_mesh(n_data=1, n_frame=8)
    with pytest.raises(ValueError):
        make_batch_step(22050, 4096, rng_mode="exact", mesh=mesh)


def test_harvest_frame_sharding_shrinks_memory():
    """Round-4 proof covered dio only; pin the harvest analysis step's
    memory contract too.  Harvest's temp memory is DOMINATED by its f0
    stage (channel map + refine), which is deliberately outside the
    frame shard_map (the contour fixing is frame-sequential), so the
    >2x shrink of the dio test cannot hold here — frame sharding only
    shrinks the sp/ap portion (measured ~4% of this fixture's temp).
    Assert strictly-smaller so a GSPMD regression that REPLICATES the
    sp/ap compute (making sharded memory >= unsharded) trips; the
    strong partitioning proof for harvest stays with the output shard
    shapes + zero-all-gather assertions above."""
    fs = 22050
    n = 8768
    xb = jnp.zeros((2, n), jnp.float32)
    plain = make_batch_step(fs, n, rng_mode="fast", f0_method="harvest",
                            with_synthesis=False)
    t_plain = plain.lower(xb).compile().memory_analysis() \
        .temp_size_in_bytes
    mesh = make_mesh(n_data=1, n_frame=8)
    sharded = make_batch_step(fs, n, rng_mode="fast",
                              f0_method="harvest", mesh=mesh,
                              with_synthesis=False)
    xs = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
    t_sharded = sharded.lower(xs).compile().memory_analysis() \
        .temp_size_in_bytes
    assert t_sharded < 0.99 * t_plain, (t_sharded, t_plain)


def test_synthesis_step_allgather_is_bounded():
    """Synthesis is frame-COUPLED (every output sample overlap-adds
    pulses whose envelopes come from neighboring frames), so the
    synthesis-included step deliberately all-gathers sp/ap along
    'frame' ONCE in front of the monolithic OLA and otherwise keeps
    the analysis compute frame-sharded.  This tripwire pins that
    contract on the compiled executable: the all-gather volume stays
    within ~2 copies of the (B, F, K) sp/ap pair (+ slack for f0 and
    padding) — a GSPMD regression that re-gathers per pulse or
    replicates the analysis would blow through the bound."""
    fs = 22050
    n = 8768
    F, K = 80, 1025
    B = 2
    xb = jnp.zeros((B, n), jnp.float32)
    mesh = make_mesh(n_data=1, n_frame=8)
    sharded = make_batch_step(fs, n, rng_mode="fast",
                              f0_method="harvest", mesh=mesh,
                              with_synthesis=True)
    xs = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
    comp = sharded.lower(xs).compile()
    ag = _allgather_bytes(comp.as_text())
    pair = 2 * B * F * K * 4
    assert 0 < ag <= 2.5 * pair, (ag, pair)
