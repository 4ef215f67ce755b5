"""Manipulation-path parity: test.cpp's ParameterModification
(F0 scaling + log-domain spectral stretching, test/test.cpp:221-258)
driven end-to-end through the `tools test` CLI and compared against the
01/02/03 output wavs produced by the compiled C++ reference binary with
the same arguments (tests/goldens_manip/, dumped from
`test vaiueo2d.wav out.wav 2.0 1.5` and `... 1.0 0.7`).

Note test.cpp:145 lowers the Harvest f0_floor to 40 Hz, so this also
covers a non-default Harvest option end-to-end (more channels, lower
candidate bands) — none of the stage goldens exercise that.
"""

import dataclasses
import os
import wave

import numpy as np
import pytest

import world_tpu
from world_tpu.tools import cli

HERE = os.path.dirname(os.path.abspath(__file__))
WAV = os.path.join(HERE, "vaiueo2d.wav")
GOLD = os.path.join(HERE, "goldens_manip")


def read_wav_int16(path):
    with wave.open(path) as w:
        assert w.getsampwidth() == 2
        return np.frombuffer(w.readframes(w.getnframes()), np.int16)


def assert_wav_matches(path, golden_name):
    ref = read_wav_int16(os.path.join(GOLD, golden_name)).astype(np.int64)
    got = read_wav_int16(path).astype(np.int64)
    assert got.shape == ref.shape
    d = got - ref
    # The float64 exact path is bit-comparable (~222 dB); after 16-bit
    # quantization only rounding-boundary ties may differ by 1 LSB.
    assert np.abs(d).max() <= 1, np.abs(d).max()
    assert (d != 0).mean() < 0.01, (d != 0).mean()


def test_cli_test_manipulation(tmp_path, monkeypatch):
    """Full test.cpp pipeline: harvest(floor 40) -> cheaptrick -> d4c ->
    f0 x2.0, stretch 1.5 -> batch + both streaming synthesis variants."""
    monkeypatch.chdir(tmp_path)
    cli.cmd_test([WAV, "out.wav", "2.0", "1.5"])
    for variant in ("01", "02", "03"):
        assert_wav_matches(str(tmp_path / f"{variant}out.wav"),
                           f"{variant}out.wav")


def test_stretch_down_flat_fill(tmp_path):
    """ratio < 1 takes the flat-fill branch (test/test.cpp:248-252)."""
    x, fs, _ = cli._read_wav(WAV)
    params = world_tpu.analyze(
        x, fs, f0_option=world_tpu.HarvestOption(f0_floor=40.0))
    sp = cli.parameter_modification_stretch(
        np.asarray(params.spectrogram), fs, 0.7)
    y = np.asarray(world_tpu.synthesize(
        dataclasses.replace(params, spectrogram=sp)))
    out = str(tmp_path / "ours.wav")
    from world_tpu.io.audio import wavwrite
    wavwrite(y, fs, out)
    assert_wav_matches(out, "01out_stretch07.wav")
