import numpy as np

from world_tpu.models import codec


def test_code_aperiodicity(gold):
    fs = gold.scalar("fs")
    out = np.asarray(codec.code_aperiodicity(gold["d4c_ap"], fs,
                                             gold.scalar("fft_size")))
    np.testing.assert_allclose(out, gold["coded_ap"], atol=1e-9)


def test_decode_aperiodicity(gold):
    fs = gold.scalar("fs")
    out = np.asarray(codec.decode_aperiodicity(gold["coded_ap"], fs,
                                               gold.scalar("fft_size")))
    np.testing.assert_allclose(out, gold["decoded_ap"], atol=1e-10)


def test_code_spectral_envelope(gold):
    fs = gold.scalar("fs")
    out = np.asarray(codec.code_spectral_envelope(
        gold["cheaptrick_sp"], fs, gold.scalar("sp_dim"),
        gold.scalar("fft_size")))
    ref = gold["coded_sp"]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_decode_spectral_envelope(gold):
    fs = gold.scalar("fs")
    out = np.asarray(codec.decode_spectral_envelope(
        gold["coded_sp"], fs, gold.scalar("fft_size")))
    ref = gold["decoded_sp"]
    np.testing.assert_allclose(out, ref, rtol=1e-9)


def test_number_of_aperiodicities(gold):
    assert codec.get_number_of_aperiodicities(gold.scalar("fs")) == \
        gold.scalar("n_aper")
