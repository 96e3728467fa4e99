"""Energy contour extraction from mel spectrograms or waveforms.

Parity with the reference ``EnergyExtractor``
(reference model/variance_predictor.py:628-727):

* log-domain mels -> mean over mel bins (geometric-mean-of-linear semantics);
  linear mels -> mean power then ``log1p``,
* log/linear auto-detection heuristic: ``median < -1`` means log domain,
* 5th/95th-percentile normalization into [0, 1], min/max fallback for < 3
  frames,
* waveform variant: windowed RMS.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from kokoro_tpu.ops.stft import hann_window


def extract_energy_from_mel(
    mel_spec: jnp.ndarray, log_domain: Optional[bool] = None
) -> jnp.ndarray:
    """Energy contour in [0, 1] from ``(..., frames, n_mels)`` mels.

    ``log_domain=None`` applies the reference's conservative heuristic
    (median < -1 -> log domain, variance_predictor.py:652-666).  Prefer passing
    it explicitly; the heuristic makes the function non-jittable w.r.t. values
    when None (it must inspect data), so the training pipeline always passes
    ``log_domain`` explicitly.
    """
    if log_domain is None:
        log_domain = bool(jnp.median(mel_spec) < -1.0)

    if log_domain:
        energy = jnp.mean(mel_spec, axis=-1)
    else:
        energy = jnp.log1p(jnp.clip(jnp.mean(mel_spec, axis=-1), 0.0, None))

    T = energy.shape[-1]
    if T < 3:
        floor = jnp.min(energy, axis=-1, keepdims=True)
        ceil = jnp.max(energy, axis=-1, keepdims=True)
    else:
        floor = jnp.quantile(energy, 0.05, axis=-1, keepdims=True)
        ceil = jnp.quantile(energy, 0.95, axis=-1, keepdims=True)
    energy = (energy - floor) / jnp.maximum(ceil - floor, 1e-8)
    return jnp.clip(energy, 0.0, 1.0)


def extract_energy_from_waveform(
    waveform: jnp.ndarray, hop_length: int = 256, win_length: int = 1024
) -> jnp.ndarray:
    """Windowed RMS energy (reference variance_predictor.py:691-727)."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None, :]
    pad = win_length // 2
    waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    if waveform.shape[1] < win_length:
        waveform = jnp.pad(waveform, ((0, 0), (0, win_length - waveform.shape[1])))
    n_frames = 1 + (waveform.shape[1] - win_length) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(win_length)[None, :]
    frames = jnp.take(waveform, idx, axis=1) * hann_window(win_length)[None, None, :]
    energy = jnp.sqrt(jnp.mean(frames**2, axis=-1) + 1e-8)
    return energy[0] if squeeze else energy
