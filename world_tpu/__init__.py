"""world_tpu: a TPU-native WORLD vocoder (analysis / manipulation /
synthesis) built on JAX.

Public API mirrors the reference C library's eight entry points
(reference /root/reference/src/world/*.h) plus a high-level pipeline:

    dio, stone_mask, harvest           -- F0 estimation / refinement
    cheap_trick                        -- spectral envelope
    d4c                                -- band aperiodicity
    synthesis, StreamingSynthesizer    -- waveform synthesis
    code_/decode_spectral_envelope, code_/decode_aperiodicity
    analyze / synthesize               -- full pipeline conveniences
"""

__version__ = "0.1.0"

import dataclasses

import jax.numpy as jnp

from . import io  # noqa: F401  (world_tpu.io.audio / .parameterio)
from .config import (CheapTrickOption, D4COption, DioOption, HarvestOption,
                     get_f0_floor_for_cheaptrick, get_fft_size_for_cheaptrick,
                     get_number_of_aperiodicities, get_samples_for_dio,
                     get_samples_for_harvest)
from .models.cheaptrick import cheap_trick
from .models.codec import (code_aperiodicity, code_spectral_envelope,
                           decode_aperiodicity, decode_spectral_envelope)
from .models.d4c import d4c
from .models.dio import dio
from .models.harvest import harvest
from .models.realtime import StreamingSynthesizer
from .models.stonemask import stone_mask
from .models.synthesis import synthesis

__all__ = [
    "dio", "stone_mask", "harvest", "cheap_trick", "d4c", "synthesis",
    "StreamingSynthesizer", "code_aperiodicity", "decode_aperiodicity",
    "code_spectral_envelope", "decode_spectral_envelope",
    "DioOption", "HarvestOption", "CheapTrickOption", "D4COption",
    "analyze", "synthesize", "WorldParameters",
    "get_fft_size_for_cheaptrick", "get_f0_floor_for_cheaptrick",
    "get_number_of_aperiodicities", "get_samples_for_dio",
    "get_samples_for_harvest",
]


@dataclasses.dataclass
class WorldParameters:
    """Analysis result: the three WORLD parameters plus metadata."""
    temporal_positions: jnp.ndarray
    f0: jnp.ndarray
    spectrogram: jnp.ndarray
    aperiodicity: jnp.ndarray
    fs: int
    frame_period: float
    fft_size: int


def analyze(x, fs, frame_period=5.0, f0_method="harvest", rng_mode="exact",
            f0_option=None):
    """Full analysis: F0 -> spectral envelope -> aperiodicity.

    f0_method: "harvest" (quality, default like test.cpp) or "dio"
    (fast path; refined with StoneMask).  f0_option optionally overrides
    the HarvestOption/DioOption (its frame_period is forced to
    ``frame_period``).
    """
    import dataclasses as _dc
    if f0_method == "harvest":
        opt = f0_option or HarvestOption()
        tp, f0 = harvest(x, fs, _dc.replace(opt, frame_period=frame_period))
    elif f0_method == "dio":
        opt = f0_option or DioOption()
        tp, f0 = dio(x, fs, _dc.replace(opt, frame_period=frame_period))
        f0 = stone_mask(x, fs, tp, f0)
    else:
        raise ValueError(f0_method)
    option = CheapTrickOption().resolve(fs)
    sp = cheap_trick(x, fs, tp, f0, option, rng_mode=rng_mode)
    ap = d4c(x, fs, tp, f0, option.fft_size, rng_mode=rng_mode)
    return WorldParameters(tp, f0, sp, ap, fs, frame_period,
                           option.fft_size)


def synthesize(params, y_length=None, rng_mode="exact"):
    """Resynthesize a waveform from WorldParameters."""
    return synthesis(params.f0, params.spectrogram, params.aperiodicity,
                     params.fs, params.frame_period, y_length=y_length,
                     fft_size=params.fft_size, rng_mode=rng_mode)
