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


def test_frame_block_candidates_match_interp1():
    """The frame-block (sort-free, gather-free) candidate interpolation
    must equal the compacted interp1 formulation bit-for-bit on random
    band-limited signals, including silence regions."""
    import jax
    import jax.numpy as jnp

    from world_tpu.ops import zerocross as Z
    from world_tpu.ops.matlab import interp1

    rng = np.random.default_rng(7)
    fs, L, F = 7350.0, 2000, 270
    t = np.arange(F) / 1000.0
    tf = t * fs
    fsamp = np.clip(np.ceil(tf).astype(np.int64) - 1, 0, L - 1)
    bidx, bmsk = Z.frame_block_layout(fsamp, L)

    for trial in range(10):
        x = rng.standard_normal(L)
        k = np.fft.rfftfreq(L, 1 / fs)
        X = np.fft.rfft(x) * np.exp(
            -((k - 150 * (1 + trial % 5)) / 80.0) ** 2)
        sig = np.fft.irfft(X, L)
        if trial % 7 == 3:
            sig[: L // 3] = 0.0
        sig32 = jnp.asarray(sig, jnp.float32)

        new, np_new = Z.four_stream_frame_candidates(
            sig32, L, fs, bidx, bmsk, jnp.asarray(tf, jnp.float32),
            jnp.asarray(t, jnp.float32))
        locs, ints, npair = Z.four_zero_crossing_streams(
            sig32, L, jnp.float32(fs))
        old = jax.vmap(lambda lo, iv, n: interp1(
            lo, iv, jnp.asarray(t, jnp.float32), n_valid=n))(
                locs, ints, npair)
        np.testing.assert_array_equal(np.asarray(np_new), np.asarray(npair))
        for s in range(4):
            if np.asarray(npair)[s] < 3:
                continue
            np.testing.assert_array_equal(np.asarray(new)[s],
                                          np.asarray(old)[s])
