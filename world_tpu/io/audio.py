"""Wav I/O, byte-compatible with the reference tools.

The reference reader (tools/audioio.cpp) is a minimal RIFF parser: mono
only, 8/16/24/32-bit integer PCM, scaling by 2^(nbit-1); the writer emits
16-bit PCM with clipping at [-32768, 32767] and scaling by 32767.  We
reproduce the exact sample scaling so round-trips match the C++ bit for
bit.
"""

import struct

import numpy as np


def wavread(filename):
    """Read a mono PCM wav.  Returns (x float64 in [-1,1], fs, nbit)."""
    with open(filename, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    if data[12:16] != b"fmt " or struct.unpack("<I", data[16:20])[0] != 16:
        raise ValueError("unsupported fmt chunk")
    fmt, channels = struct.unpack("<HH", data[20:24])
    if fmt != 1:
        raise ValueError("only integer PCM supported")
    if channels != 1:
        raise ValueError("only mono supported")
    fs = struct.unpack("<I", data[24:28])[0]
    nbit = struct.unpack("<H", data[34:36])[0]
    # find the data chunk (reference skips unknown chunks byte-by-byte)
    pos = data.find(b"data", 36)
    if pos < 0:
        raise ValueError("no data chunk")
    n_bytes = struct.unpack("<I", data[pos + 4: pos + 8])[0]
    qbyte = nbit // 8
    n = n_bytes // qbyte
    raw = np.frombuffer(data[pos + 8: pos + 8 + n * qbyte], np.uint8)
    raw = raw.reshape(n, qbyte).astype(np.float64)
    # little-endian signed integer, matching tools/audioio.cpp:239-249
    top = raw[:, -1]
    sign_bias = np.where(top >= 128, 2.0 ** (nbit - 1), 0.0)
    raw[:, -1] = np.where(top >= 128, top - 128, top)
    weights = 256.0 ** np.arange(qbyte)
    val = raw @ weights
    x = (val - sign_bias) / 2.0 ** (nbit - 1)
    return x, fs, nbit


def wavwrite(x, fs, filename):
    """Write 16-bit mono PCM exactly like tools/audioio.cpp:115-170."""
    x = np.asarray(x, np.float64)
    pcm = np.clip((x * 32767).astype(np.int64), -32768, 32767) \
        .astype(np.int16)
    n = len(pcm)
    with open(filename, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + n * 2))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", n * 2))
        f.write(pcm.tobytes())


def get_audio_length(filename):
    try:
        x, _, _ = wavread(filename)
    except (ValueError, OSError):
        return -1
    return len(x)


def peek_header(filename):
    """Parse only the RIFF header: returns (n_samples, fs) without
    reading the sample data.  Used by the corpus runner to assign bucket
    lengths before the threaded batch loader reads the audio.
    Raises ValueError on malformed/unsupported files (same conditions as
    wavread)."""
    with open(filename, "rb") as f:
        head = f.read(4096)
    if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    if head[12:16] != b"fmt " or struct.unpack("<I", head[16:20])[0] != 16:
        raise ValueError("unsupported fmt chunk")
    fmt, channels = struct.unpack("<HH", head[20:24])
    if fmt != 1 or channels != 1:
        raise ValueError("only mono integer PCM supported")
    fs = struct.unpack("<I", head[24:28])[0]
    nbit = struct.unpack("<H", head[34:36])[0]
    pos = head.find(b"data", 36)
    if pos < 0 or pos + 8 > len(head):
        raise ValueError("no data chunk")
    n_bytes = struct.unpack("<I", head[pos + 4: pos + 8])[0]
    return n_bytes // (nbit // 8), fs
