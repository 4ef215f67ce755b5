import os

import numpy as np
import pytest

from world_tpu.io import audio, parameterio
from tests.conftest import GOLDEN_DIR

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vaiueo2d.wav")


def test_wavread_matches_reference(gold):
    x, fs, nbit = audio.wavread(FIXTURE)
    assert fs == gold.scalar("fs")
    assert nbit == 16
    np.testing.assert_allclose(x, gold["x"], atol=0)


def test_wavwrite_matches_reference(tmp_path):
    x = (np.arange(1000) - 500) / 600.0
    out = tmp_path / "ramp.wav"
    audio.wavwrite(x, 22050, str(out))
    ref = open(os.path.join(GOLDEN_DIR, "ref_ramp.wav"), "rb").read()
    assert out.read_bytes() == ref


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.arange(500) * 0.01) * 0.9
    p = tmp_path / "t.wav"
    audio.wavwrite(x, 16000, str(p))
    y, fs, nbit = audio.wavread(str(p))
    assert fs == 16000 and nbit == 16
    # writer scales by 32767 (truncating), reader divides by 32768:
    # the reference round-trip is ~2 LSB, not exact.
    np.testing.assert_allclose(x, y, atol=2.5 / 32768)


def _ref_params():
    n = 159
    tp = np.arange(n) * 0.005
    f0 = np.where(np.arange(n) % 7 == 0, 0.0, 100.0 + np.arange(n) * 0.25)
    sp = (np.arange(n)[:, None] * 0.001
          + np.arange(33)[None, :] * 1e-6)
    return tp, f0, sp


def test_f0_file_bytes(tmp_path):
    tp, f0, _ = _ref_params()
    p = tmp_path / "f0.bin"
    parameterio.write_f0(str(p), f0, 5.0)
    ref = open(os.path.join(GOLDEN_DIR, "ref_f0.bin"), "rb").read()
    assert p.read_bytes() == ref
    tp2, f02 = parameterio.read_f0(os.path.join(GOLDEN_DIR, "ref_f0.bin"))
    np.testing.assert_allclose(f02, f0, atol=0)
    np.testing.assert_allclose(tp2, tp, atol=1e-12)


def test_f0_text_bytes(tmp_path):
    tp, f0, _ = _ref_params()
    p = tmp_path / "f0.txt"
    parameterio.write_f0(str(p), f0, 5.0, temporal_positions=tp, text=True)
    ref = open(os.path.join(GOLDEN_DIR, "ref_f0.txt"), "rb").read()
    assert p.read_bytes() == ref


@pytest.mark.parametrize("kind", ["spec", "ap"])
def test_matrix_file_bytes(tmp_path, kind):
    _, _, sp = _ref_params()
    p = tmp_path / f"{kind}.bin"
    if kind == "spec":
        parameterio.write_spectral_envelope(str(p), sp, 22050, 5.0, 64)
        data, meta = parameterio.read_spectral_envelope(
            os.path.join(GOLDEN_DIR, f"ref_{kind}.bin"))
    else:
        parameterio.write_aperiodicity(str(p), sp, 22050, 5.0, 64)
        data, meta = parameterio.read_aperiodicity(
            os.path.join(GOLDEN_DIR, f"ref_{kind}.bin"))
    ref = open(os.path.join(GOLDEN_DIR, f"ref_{kind}.bin"), "rb").read()
    assert p.read_bytes() == ref
    np.testing.assert_allclose(data, sp, atol=0)
    assert meta["fs"] == 22050 and meta["fft_size"] == 64


def test_header_information():
    path = os.path.join(GOLDEN_DIR, "ref_spec.bin")
    assert parameterio.get_header_information(path, "FS  ") == 22050
    assert parameterio.get_header_information(path, "FP  ") == 5.0
    assert parameterio.get_header_information(path, "NOF ") == 159
    assert parameterio.get_header_information(path, "FFT ") == 64


def test_npz_roundtrip_full(tmp_path):
    """write_npz/read_npz/load_npz_parameters with full-resolution
    arrays: float32 storage, exact scalar metadata."""
    rng = np.random.RandomState(11)
    F, K = 12, 33
    f0 = np.abs(rng.randn(F)) * 100
    sp = np.abs(rng.randn(F, K)) + 0.5
    ap = np.clip(np.abs(rng.randn(F, K)) * 0.3, 1e-3, 1 - 1e-12)
    p = str(tmp_path / "u.npz")
    parameterio.write_npz(p, f0, 16000, 5.0, 64, spectrogram=sp,
                          aperiodicity=ap)
    d = parameterio.read_npz(p)
    assert d["f0"].dtype == np.float32
    np.testing.assert_allclose(d["spectrogram"], sp, rtol=1e-6)
    f0r, spr, apr, info = parameterio.load_npz_parameters(p)
    assert f0r.dtype == np.float64
    assert info == {"fs": 16000, "frame_period": 5.0, "fft_size": 64}
    np.testing.assert_allclose(spr, sp, rtol=1e-6)
    np.testing.assert_allclose(apr, ap, rtol=1e-6)


def test_npz_roundtrip_coded(tmp_path):
    """Coded npz restores full-resolution sp/ap through the codec with
    the same result as decoding the coded arrays directly."""
    from world_tpu.models.codec import (code_aperiodicity,
                                        code_spectral_envelope,
                                        decode_aperiodicity,
                                        decode_spectral_envelope)

    fs, fft_size, dims = 16000, 512, 24
    rng = np.random.RandomState(12)
    F, K = 9, fft_size // 2 + 1
    f0 = np.abs(rng.randn(F)) * 100
    sp = np.exp(rng.randn(F, K) * 0.5)
    ap = np.clip(np.abs(rng.randn(F, K)) * 0.3, 1e-3, 1 - 1e-12)
    csp = np.asarray(code_spectral_envelope(sp, fs, dims, fft_size),
                     np.float32)
    cap = np.asarray(code_aperiodicity(ap, fs, fft_size), np.float32)
    p = str(tmp_path / "c.npz")
    parameterio.write_npz(p, f0, fs, 5.0, fft_size, coded_sp=csp,
                          coded_ap=cap)
    f0r, spr, apr, info = parameterio.load_npz_parameters(p)
    want_sp = np.asarray(decode_spectral_envelope(
        csp.astype(np.float64), fs, fft_size))
    want_ap = np.asarray(decode_aperiodicity(
        cap.astype(np.float64), fs, fft_size))
    np.testing.assert_allclose(spr, want_sp, rtol=1e-12)
    np.testing.assert_allclose(apr, want_ap, rtol=1e-12)
    assert spr.shape == (F, K) and apr.shape == (F, K)
