"""Host-side audio I/O: wav read/save and resampling.

Parity with reference data/audio_utils.py ``AudioUtils`` (:47-127): multi-
backend save with graceful fallback (scipy -> raw numpy), int16/int32
normalization on read (reference data/dataset.py:644-652).

Resampling uses ``scipy.signal.resample_poly`` (polyphase sinc) — the same
family of kernel torchaudio uses; used for corpus-rate conversion and speed
perturbation (reference dataset.py:672-684).
"""

from __future__ import annotations

import logging
from fractions import Fraction
from pathlib import Path
from typing import Tuple

import numpy as np

logger = logging.getLogger(__name__)


def read_wav(path: str | Path) -> Tuple[int, np.ndarray]:
    """Read a wav file -> (sample_rate, float32 mono samples in [-1, 1])."""
    from scipy.io import wavfile

    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:  # (samples, channels) -> mono
        data = data.mean(axis=1)
    return int(sr), data


def save_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> bool:
    """Save float audio as 16-bit PCM; scipy first, raw numpy fallback
    (reference audio_utils.py:47-127)."""
    audio = np.asarray(audio, dtype=np.float32).squeeze()
    peak = np.max(np.abs(audio)) if audio.size else 0.0
    if peak > 1.0:
        audio = audio / peak
    pcm = (audio * 32767.0).astype(np.int16)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        from scipy.io import wavfile

        wavfile.write(str(path), sample_rate, pcm)
        return True
    except Exception as err:  # pragma: no cover - scipy is baked in
        logger.warning("scipy wav save failed (%s); writing raw header", err)
    try:
        _write_wav_raw(path, pcm, sample_rate)
        return True
    except OSError as err:
        logger.error("All wav backends failed for %s: %s", path, err)
        return False


def _write_wav_raw(path: Path, pcm: np.ndarray, sr: int) -> None:
    import struct

    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def resample(audio: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase sinc resampling."""
    if orig_sr == new_sr:
        return audio
    from scipy.signal import resample_poly

    frac = Fraction(new_sr, orig_sr).limit_denominator(1000)
    return resample_poly(audio, frac.numerator, frac.denominator).astype(
        np.float32
    )


def peak_normalize(audio: np.ndarray) -> np.ndarray:
    return audio / (np.max(np.abs(audio)) + 1e-9)


def apply_speed_perturbation(
    audio: np.ndarray, sample_rate: int, factor: float
) -> np.ndarray:
    """Change speaking rate by resampling to ``sr * factor`` and playing back
    at ``sr`` (double-resample trick, reference dataset.py:672-684).
    factor > 1 -> faster/shorter."""
    if factor == 1.0:
        return audio
    out = resample(audio, sample_rate, int(sample_rate * factor))
    return peak_normalize(out)
