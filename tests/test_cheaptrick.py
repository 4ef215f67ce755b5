import numpy as np
import jax.numpy as jnp

from world_tpu.models.cheaptrick import cheap_trick


def test_cheaptrick_golden(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    f0 = gold["harvest_f0"]
    tp = gold["harvest_tp"]
    sp = np.asarray(cheap_trick(x, fs, tp, f0, rng_mode="exact"))
    ref = gold["cheaptrick_sp"]
    assert sp.shape == ref.shape
    # Bit-identical RNG + identical math; only FFT rounding differs, which
    # is amplified at bins ~1e16x below the spectral peak (the log of a
    # power at the FFT noise floor).  Criterion: dB error.
    db = 10 * np.abs(np.log10(sp) - np.log10(ref))
    assert np.median(db) < 1e-9, np.median(db)
    assert db.max() < 1e-3, db.max()


def test_cheaptrick_fast_mode_close(gold):
    fs = gold.scalar("fs")
    x = gold["x"]
    f0 = gold["harvest_f0"]
    tp = gold["harvest_tp"]
    sp = np.asarray(cheap_trick(x, fs, tp, f0, rng_mode="fast"))
    ref = gold["cheaptrick_sp"]
    # Voiced frames are dither-insensitive; compare on dB scale there.
    voiced = f0 > 0
    db = 10 * np.abs(np.log10(sp[voiced]) - np.log10(ref[voiced]))
    assert db.max() < 0.2, db.max()


def test_cheaptrick_custom_fft_size(gold):
    """Non-default CheapTrickOption.fft_size (2048 vs the 1024 default at
    fs 22050) against a C++ golden."""
    from world_tpu import config
    fs = gold.scalar("fs")
    opt = config.CheapTrickOption(fft_size=2048)
    sp = np.asarray(cheap_trick(gold["x"], fs, gold["harvest_tp"],
                                gold["harvest_f0"], option=opt,
                                rng_mode="exact"))
    ref = gold["cheaptrick_sp_fft2048"]
    assert sp.shape == ref.shape
    db = 10 * np.abs(np.log10(sp) - np.log10(ref))
    assert np.median(db) < 1e-9, np.median(db)
    assert db.max() < 1e-3, db.max()


def test_cheaptrick_high_f0_cap(gold):
    """F0 above the default 1200 Hz smoothing cap: declaring f0_ceil
    sizes the cap so the result still matches the (uncapped) reference."""
    fs = gold.scalar("fs")
    sp = np.asarray(cheap_trick(gold["x"], fs, gold["harvest_tp"],
                                gold["hif0"], rng_mode="exact",
                                f0_ceil=1500.0))
    ref = gold["cheaptrick_sp_hif0"]
    assert sp.shape == ref.shape
    db = 10 * np.abs(np.log10(sp) - np.log10(ref))
    assert np.median(db) < 1e-9, np.median(db)
    assert db.max() < 1e-3, db.max()
