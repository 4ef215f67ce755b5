"""Accuracy gates for the float32 fast path (what runs on TPU), on CPU.

The float64 golden tests prove reference parity; these lock the f32
reformulations (direct harmonic-bin DFT refinement, box-filter
smoothing, frame-centered grids, Pallas-interpret OLA) to the quality
targets: F0 < 1 cent, envelope within a few thousandths of a dB, and
fast-noise resynthesis matching the reference's energy envelope."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def fx(gold):
    return np.asarray(gold["x"], np.float32), gold.scalar("fs")


def test_harvest_f32(gold, fx):
    from world_tpu.models.harvest import harvest
    x, fs = fx
    tp, f0 = harvest(jnp.asarray(x), fs)
    f0 = np.asarray(f0)
    ref = gold["harvest_f0"]
    assert ((f0 > 0) == (ref > 0)).mean() > 0.99
    v = (f0 > 0) & (ref > 0)
    cents = 1200 * np.abs(np.log2(f0[v] / ref[v]))
    assert np.sqrt((cents**2).mean()) < 0.1, np.sqrt((cents**2).mean())


def test_dio_stonemask_f32(gold, fx):
    from world_tpu.models.dio import dio
    from world_tpu.models.stonemask import stone_mask
    x, fs = fx
    tp, f0 = dio(jnp.asarray(x), fs)
    f0 = np.asarray(stone_mask(jnp.asarray(x), fs, tp, f0))
    ref = gold["stonemask_f0"]
    assert ((f0 > 0) == (ref > 0)).mean() > 0.99
    v = (f0 > 0) & (ref > 0)
    cents = 1200 * np.abs(np.log2(f0[v] / ref[v]))
    assert np.sqrt((cents**2).mean()) < 1.0, np.sqrt((cents**2).mean())


def test_full_fast_pipeline_f32(gold, fx):
    """The exact graph the TPU bench runs, on CPU float32: envelope
    parity of the resynthesis vs the C++ reference output."""
    from world_tpu.parallel.pipeline import make_batch_step
    x, fs = fx
    step = jax.jit(make_batch_step(fs, len(x), rng_mode="fast",
                                   f0_method="harvest"))
    f0, sp, ap, y = step(jnp.asarray(x[None]))
    y = np.asarray(y[0])
    ref = gold["synthesis_y"]
    n = (min(len(y), len(ref)) // 256) * 256
    re = ref[:n].reshape(-1, 256).std(axis=1)
    ye = y[:n].reshape(-1, 256).std(axis=1)
    act = re > re.max() * 0.03
    db = 20 * np.abs(np.log10(ye[act] / re[act]))
    assert np.median(db) < 0.5, np.median(db)

    spec = np.asarray(sp[0])
    ref_sp = gold["cheaptrick_sp"]
    err_db = np.abs(10 * np.log10(spec / ref_sp))
    assert np.median(err_db) < 0.01, np.median(err_db)
