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
    import harvest_contour_oracle as H
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


def test_contour_fix_device_edge_cases():
    """Deterministic shapes that stress specific branches: all-unvoiced,
    single section, boundary-length runs/gaps, contained/overlapping
    merges after extension."""
    import harvest_contour_oracle as H
    from world_tpu.models.harvest_contour import fix_and_smooth
    import jax.numpy as jnp

    F, S = 300, 15

    def run(cands, scores):
        ref = H._smooth_contour_np(H._fix_contour_np(cands, scores))
        dev = np.asarray(fix_and_smooth(jnp.asarray(cands),
                                        jnp.asarray(scores)))
        np.testing.assert_allclose(dev, ref, atol=1e-9, rtol=1e-9)

    # all unvoiced
    run(np.zeros((F, S)), np.zeros((F, S)))

    # one long section
    c = np.zeros((F, S)); s = np.zeros((F, S))
    c[50:250, 0] = 150.0; s[50:250, 0] = 5.0
    run(c, s)

    # exactly-threshold run lengths (6 and 7 frames) and gaps (8 and 9)
    c = np.zeros((F, S)); s = np.zeros((F, S))
    for st, ln in ((10, 6), (30, 7), (60, 12), (80, 12)):
        c[st:st+ln, 0] = 140.0; s[st:st+ln, 0] = 4.0
    # gap of 8 between 60..71 and 80..91 (fill), then far section
    c[150:190, 0] = 160.0; s[150:190, 0] = 6.0
    run(c, s)

    # two sections whose extensions overlap, with candidates everywhere
    rng = np.random.RandomState(11)
    c = 120.0 + 10.0 * rng.randn(F, S); sgrid = np.abs(rng.randn(F, S))
    cc = np.zeros((F, S)); ss = np.zeros((F, S))
    cc[:, :3] = np.abs(c[:, :3]); ss[:, :3] = sgrid[:, :3]
    cc[100:140] = 0.0; ss[100:140] = 0.0  # hole the extension can cross
    run(cc, ss)


def test_contour_fix_device_matches_host_more():
    """More randomized trials with harsher section statistics."""
    import harvest_contour_oracle as H
    from world_tpu.models.harvest_contour import fix_and_smooth
    import jax.numpy as jnp

    rng = np.random.RandomState(23)
    for trial in range(8):
        F = int(rng.choice([150, 401, 797]))
        S = int(rng.choice([7, 21, 49]))
        cands = np.zeros((F, S))
        scores = np.zeros((F, S))
        t = 0
        pitch = 90.0 + 300.0 * rng.rand()
        while t < F:
            run_len = rng.randint(1, 80)
            gap = rng.randint(1, 20)
            for i in range(t, min(F, t + run_len)):
                pitch *= 1.0 + 0.03 * rng.randn()
                pitch = float(np.clip(pitch, 70.0, 750.0))
                k = rng.randint(1, S)
                cands[i, :k] = pitch * (1.0 + 0.1 * rng.randn(k))
                scores[i, :k] = np.abs(rng.randn(k)) * 4.0
            t += run_len + gap
        ref = H._smooth_contour_np(H._fix_contour_np(cands, scores))
        dev = np.asarray(fix_and_smooth(jnp.asarray(cands),
                                        jnp.asarray(scores)))
        np.testing.assert_allclose(dev, ref, atol=1e-9, rtol=1e-9,
                                   err_msg=f"trial {trial} F={F} S={S}")


def test_contour_fix_many_sections():
    """>8 surviving sections forces multiple trips of the chunked
    extension while_loop in _fix_step3 (the single real-audio fixture
    has ~5 sections, so multi-trip chunking is otherwise unexercised)."""
    import harvest_contour_oracle as H
    from world_tpu.models.harvest_contour import fix_and_smooth
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    F, S = 797, 21
    cands = np.zeros((F, S))
    scores = np.zeros((F, S))
    t = 5
    while t + 12 < F:
        # stable pitch per run so FixStep1's 0.008 jump test keeps it
        pitch = 100.0 + 400.0 * rng.rand()
        ln = rng.randint(7, 14)
        for i in range(t, t + ln):
            k = rng.randint(1, S)
            cands[i, :k] = pitch * (1.0 + 0.002 * rng.randn(k))
            scores[i, :k] = np.abs(rng.randn(k)) * 3.0
        t += ln + rng.randint(10, 25)
    ref = H._smooth_contour_np(H._fix_contour_np(cands, scores))
    dev = np.asarray(fix_and_smooth(jnp.asarray(cands),
                                    jnp.asarray(scores)))
    np.testing.assert_allclose(dev, ref, atol=1e-9, rtol=1e-9)
