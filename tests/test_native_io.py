import os

import numpy as np
import pytest

from world_tpu.io import audio, native

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vaiueo2d.wav")


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_wavread_matches_python(lib, gold):
    x, fs, nbit = native.wavread(FIXTURE)
    assert fs == gold.scalar("fs") and nbit == 16
    np.testing.assert_allclose(x, gold["x"], atol=0)


def test_native_wavwrite_matches_python(lib, tmp_path):
    x = np.sin(np.arange(777) * 0.03) * 0.8
    p1, p2 = tmp_path / "n.wav", tmp_path / "p.wav"
    native.wavwrite(x, 16000, str(p1))
    audio.wavwrite(x, 16000, str(p2))
    assert p1.read_bytes() == p2.read_bytes()


def test_native_batch_loader(lib, tmp_path):
    paths = []
    for i in range(5):
        x = np.sin(np.arange(1000 + 100 * i) * 0.01) * 0.5
        p = tmp_path / f"u{i}.wav"
        audio.wavwrite(x, 22050, str(p))
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.wav"))
    batch, lengths, fs, failed = native.load_batch(paths, 2048)
    assert fs == 22050
    assert batch.shape == (6, 2048)
    assert failed == [5]
    assert list(lengths[:5]) == [1000, 1100, 1200, 1300, 1400]
    ref, _, _ = audio.wavread(paths[0])
    np.testing.assert_allclose(batch[0, :1000], ref.astype(np.float32),
                               atol=1e-7)
    assert batch[0, 1000:].max() == 0.0
