"""Full-pipeline self-consistency at sample rates the goldens don't
cover (the reference supports arbitrary fs; 16 kHz is its canonical
fixture, 44.1/48 kHz the production rates).  Checks shapes, F0 accuracy
on a synthetic glottal-pulse vowel, aperiodicity range, and resynthesis
plausibility."""

import numpy as np
import pytest

import world_tpu
from world_tpu import config


def synth_vowel(fs, f0=140.0, seconds=0.6, seed=0):
    """Pulse train through two formant resonators + weak noise."""
    rng = np.random.RandomState(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    phase = np.cumsum(2 * np.pi * f0 * (1 + 0.02 * np.sin(2 * np.pi * 3 * t)) / fs)
    pulses = np.zeros(n)
    wrapped = np.mod(phase, 2 * np.pi)
    pulses[1:] = (np.diff(wrapped) < 0).astype(float)
    x = pulses + 0.0005 * rng.randn(n)
    for fc, bw in ((700.0, 130.0), (1200.0, 160.0)):
        r = np.exp(-np.pi * bw / fs)
        th = 2 * np.pi * fc / fs
        a1, a2 = 2 * r * np.cos(th), -r * r
        y = np.zeros(n)
        for i in range(n):
            y[i] = x[i] + (a1 * y[i - 1] if i > 0 else 0) \
                + (a2 * y[i - 2] if i > 1 else 0)
        x = y
    return 0.3 * x / np.abs(x).max()


@pytest.mark.parametrize("fs", [16000, 44100, 48000])
def test_pipeline_at_fs(fs):
    f0_true = 140.0
    x = synth_vowel(fs, f0_true)

    tp, f0 = world_tpu.harvest(x, fs)
    f0 = np.asarray(f0)
    n_frames = config.get_samples_for_harvest(fs, len(x), 5.0)
    assert f0.shape == (n_frames,)
    voiced = f0 > 0
    assert voiced.mean() > 0.5, voiced.mean()
    mid = voiced.copy()
    mid[: n_frames // 5] = mid[-n_frames // 5:] = False
    cents = 1200 * np.abs(np.log2(f0[mid] / f0_true))
    assert np.median(cents) < 40.0, np.median(cents)

    sp = np.asarray(world_tpu.cheap_trick(x, fs, tp, f0))
    ap = np.asarray(world_tpu.d4c(x, fs, tp, f0))
    half = config.get_fft_size_for_cheaptrick(fs) // 2
    assert sp.shape == (n_frames, half + 1)
    assert ap.shape == (n_frames, half + 1)
    assert np.all(sp > 0) and np.isfinite(sp).all()
    assert np.all((ap > 0) & (ap <= 1.0))
    # voiced frames must show real periodicity somewhere in the band
    assert ap[mid].min() < 0.5

    y = np.asarray(world_tpu.synthesis(f0, sp, ap, fs, frame_period=5.0))
    assert np.isfinite(y).all()
    # energy within 3 dB of the original over the analyzed span
    n = min(len(y), len(x))
    ratio = 10 * np.log10(np.sum(y[:n] ** 2) / np.sum(x[:n] ** 2))
    assert abs(ratio) < 3.0, ratio

    # codec round trip at this fs
    n_ap = config.get_number_of_aperiodicities(fs)
    coded = np.asarray(world_tpu.code_aperiodicity(ap, fs,
                                                   2 * half))
    assert coded.shape == (n_frames, n_ap)
    dec = np.asarray(world_tpu.decode_aperiodicity(coded, fs, 2 * half))
    assert dec.shape == ap.shape
    sp_c = np.asarray(world_tpu.code_spectral_envelope(sp, fs, 50, 2 * half))
    sp_d = np.asarray(world_tpu.decode_spectral_envelope(sp_c, fs, 2 * half))
    err_db = np.abs(10 * np.log10(sp_d[mid] / sp[mid]))
    assert np.median(err_db) < 3.0, np.median(err_db)
