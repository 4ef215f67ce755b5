import numpy as np

from world_tpu.models.dio import dio
from world_tpu.models.stonemask import stone_mask
from world_tpu import config


def cents(a, b):
    return 1200.0 * np.abs(np.log2(a / b))


def test_dio_golden(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    tp, f0 = dio(x, fs)
    tp, f0 = np.asarray(tp), np.asarray(f0)
    np.testing.assert_allclose(tp, gold["dio_tp"], atol=1e-12)
    ref = gold["dio_f0"]
    assert f0.shape == ref.shape
    # Voicing decisions must agree everywhere; voiced values < 0.1 cent.
    same_vuv = (f0 > 0) == (ref > 0)
    assert same_vuv.mean() == 1.0, np.where(~same_vuv)
    voiced = (f0 > 0) & (ref > 0)
    assert voiced.sum() > 50
    c = cents(f0[voiced], ref[voiced])
    assert c.max() < 0.1, c.max()


def test_stonemask_golden(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    ref_sm = gold["stonemask_f0"]
    # Refine the *reference* dio track so errors don't compound.
    f0 = np.asarray(stone_mask(x, fs, gold["dio_tp"], gold["dio_f0"]))
    same_vuv = (f0 > 0) == (ref_sm > 0)
    assert same_vuv.mean() == 1.0, np.where(~same_vuv)
    voiced = (f0 > 0) & (ref_sm > 0)
    c = cents(f0[voiced], ref_sm[voiced])
    assert c.max() < 0.1, (c.max(), np.argmax(c))


def test_dio_speed_knob(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    _, f0_fast = dio(x, fs, config.DioOption(speed=5))
    f0_fast = np.asarray(f0_fast)
    ref = gold["dio_f0"]
    voiced = (f0_fast > 0) & (ref > 0)
    assert voiced.sum() > 40
    med = np.median(cents(f0_fast[voiced], ref[voiced]))
    assert med < 10.0, med
