import numpy as np

from world_tpu.models.synthesis import synthesis


def snr_db(ref, y):
    return 10 * np.log10(np.sum(ref**2) / np.sum((ref - y) ** 2))


def test_synthesis_golden(gold):
    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"]
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    ref = gold["synthesis_y"]
    y = np.asarray(synthesis(f0, sp, ap, fs, frame_period=5.0,
                             rng_mode="exact"))
    assert y.shape == ref.shape
    s = snr_db(ref, y)
    # Exact RNG + identical math: only FFT/cumsum rounding differs.
    assert s > 200.0, s


def test_synthesis_fast_quality(gold):
    """Fast-mode noise differs sample-wise; assert energy/envelope
    agreement instead (the production quality criterion)."""
    fs = gold.scalar("fs")
    y = np.asarray(synthesis(gold["harvest_f0"], gold["cheaptrick_sp"],
                             gold["d4c_ap"], fs, rng_mode="fast"))
    ref = gold["synthesis_y"]
    assert np.isfinite(y).all()
    # Frame-RMS envelope within 1 dB where signal is present.
    n = (len(ref) // 256) * 256
    re = ref[:n].reshape(-1, 256).std(axis=1)
    ye = y[:n].reshape(-1, 256).std(axis=1)
    act = re > re.max() * 0.03
    db = 20 * np.abs(np.log10(ye[act] / re[act]))
    assert np.median(db) < 0.5, np.median(db)
    assert db.max() < 3.0, db.max()


def test_ola_accumulate_small_fft():
    """fft_size=512 (fs 8000/11025) must pad to the 1024 store block
    instead of asserting (synthesis float32 fast path)."""
    import jax.numpy as jnp

    from world_tpu.ops.pallas_ola import ola_accumulate

    rng = np.random.default_rng(0)
    batch, pulses, fft = 2, 5, 512
    resp = rng.standard_normal((batch, pulses, fft)).astype(np.float32)
    y_padded = 4000
    offs = rng.integers(0, y_padded - fft, (batch, pulses)).astype(np.int32)
    out = np.asarray(ola_accumulate(jnp.asarray(resp), jnp.asarray(offs),
                                    y_padded=y_padded))
    ref = np.zeros((batch, y_padded), np.float32)
    for b in range(batch):
        for p in range(pulses):
            ref[b, offs[b, p]: offs[b, p] + fft] += resp[b, p]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_high_f0_pulse_capacity(gold):
    """A manipulated F0 track above the 1500 Hz default capacity
    heuristic must not silently drop pulses: the default max_pulses is
    sized from the concrete F0's own maximum (public eager API)."""
    import jax.numpy as jnp

    from world_tpu.models.synthesis import synthesis

    fs = gold.scalar("fs")
    f0 = gold["harvest_f0"] * 8.0  # ~2000 Hz voiced
    sp = gold["cheaptrick_sp"]
    ap = gold["d4c_ap"]
    y_default = np.asarray(synthesis(f0, sp, ap, fs))
    fs_v = float(fs)
    roomy = int(len(y_default) / fs_v * 3000.0) + 64
    y_roomy = np.asarray(synthesis(f0, sp, ap, fs, max_pulses=roomy))
    # Padded-lane count affects only scatter-add summation order (~1e-16).
    np.testing.assert_allclose(y_default, y_roomy, atol=1e-12)
