import numpy as np

from world_tpu.models.harvest import harvest


def cents(a, b):
    return 1200.0 * np.abs(np.log2(a / b))


def test_harvest_golden(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    tp, f0 = harvest(x, fs)
    tp, f0 = np.asarray(tp), np.asarray(f0)
    np.testing.assert_allclose(tp, gold["harvest_tp"], atol=1e-12)
    ref = gold["harvest_f0"]
    assert f0.shape == ref.shape
    same_vuv = (f0 > 0) == (ref > 0)
    assert same_vuv.mean() > 0.99, np.where(~same_vuv)
    voiced = (f0 > 0) & (ref > 0)
    assert voiced.sum() > 100
    c = cents(f0[voiced], ref[voiced])
    # BASELINE target: F0 RMSE < 1 cent on voiced frames.
    rmse = np.sqrt((c**2).mean())
    assert rmse < 1.0, (rmse, c.max())


def test_contour_fix_device_matches_host():
    """Property test: the device fix_and_smooth must reproduce the
    host-numpy transcription (itself golden-validated) on random
    candidate grids with diverse voiced/unvoiced section shapes."""
    import world_tpu.models.harvest as H
    from world_tpu.models.harvest_contour import fix_and_smooth
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    for trial in range(8):
        F, S = 400, 21
        cands = np.zeros((F, S))
        scores = np.zeros((F, S))
        # voiced runs of varying length/quality around a wandering pitch
        t = 0
        pitch = 150.0 + 50.0 * rng.rand()
        while t < F:
            run = rng.randint(2, 40)
            gap = rng.randint(1, 12)
            for i in range(t, min(F, t + run)):
                pitch *= 1.0 + 0.01 * rng.randn()
                pitch = float(np.clip(pitch, 80.0, 600.0))
                k = rng.randint(1, S)
                cands[i, :k] = pitch * (1.0 + 0.05 * rng.randn(k))
                scores[i, :k] = np.abs(rng.randn(k)) * 3.0
            t += run + gap
        ref = H._smooth_contour_np(H._fix_contour_np(cands, scores))
        dev = np.asarray(fix_and_smooth(jnp.asarray(cands),
                                        jnp.asarray(scores)))
        np.testing.assert_allclose(dev, ref, atol=1e-9, rtol=1e-9,
                                   err_msg=f"trial {trial}")
