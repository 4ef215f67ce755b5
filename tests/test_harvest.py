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
