import numpy as np

from world_tpu.models.d4c import d4c


def test_d4c_golden(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    f0 = gold["harvest_f0"]
    tp = gold["harvest_tp"]
    fft_size = gold.scalar("fft_size")
    ap = np.asarray(d4c(x, fs, tp, f0, fft_size, rng_mode="exact"))
    ref = gold["d4c_ap"]
    assert ap.shape == ref.shape
    # Frames left at the default (unvoiced / gated) must agree exactly.
    default_ref = np.all(ref == 1.0 - 1e-12, axis=1)
    default_mine = np.all(ap == 1.0 - 1e-12, axis=1)
    np.testing.assert_array_equal(default_mine, default_ref)
    # Active frames: aperiodicity is a dB-interpolated coarse grid.
    act = ~default_ref
    db = 20 * np.abs(np.log10(ap[act]) - np.log10(ref[act]))
    assert db.max() < 0.01, db.max()


def test_d4c_fast_mode(gold):
    fs = gold.scalar("fs")
    ap = np.asarray(d4c(gold["x"], fs, gold["harvest_tp"],
                        gold["harvest_f0"], gold.scalar("fft_size"),
                        rng_mode="fast"))
    ref = gold["d4c_ap"]
    assert ap.shape == ref.shape
    assert np.isfinite(ap).all()
    assert (ap > 0).all() and (ap <= 1.0).all()
    # Dither is 1e-6-scale; gating may flip borderline frames but the
    # bulk must agree.
    default_ref = np.all(ref == 1.0 - 1e-12, axis=1)
    default_mine = np.all(ap == 1.0 - 1e-12, axis=1)
    assert (default_mine == default_ref).mean() > 0.95


def test_d4c_custom_threshold(gold):
    """Non-default D4COption.threshold (0.0 passes every voiced frame
    through the LoveTrain gate) against a C++ golden."""
    from world_tpu import config
    fs = gold.scalar("fs")
    ap = np.asarray(d4c(gold["x"], fs, gold["harvest_tp"],
                        gold["harvest_f0"], gold.scalar("fft_size"),
                        option=config.D4COption(threshold=0.0),
                        rng_mode="exact"))
    ref = gold["d4c_ap_thr0"]
    assert ap.shape == ref.shape
    default_ref = np.all(ref == 1.0 - 1e-12, axis=1)
    default_mine = np.all(ap == 1.0 - 1e-12, axis=1)
    np.testing.assert_array_equal(default_mine, default_ref)
    act = ~default_ref
    db = 20 * np.abs(np.log10(ap[act]) - np.log10(ref[act]))
    assert db.max() < 0.01, db.max()
