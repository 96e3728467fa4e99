"""Training losses — masked means with finite-value filtering.

Parity with reference training/losses.py:9-216:

* mel: L1 over (mel mask AND finite elements) (:40-46),
* duration: Huber(delta=1) on ``log(d + 1)`` targets over (phoneme mask AND
  d > 0) (:48-98),
* stop: BCE-with-logits with ``pos_weight`` over the mel mask (:100-105),
* pitch/energy: Huber(delta=0.05) on frame-level targets truncated to the mel
  length, masked by the mel mask (:107-156),
* per-loss clamps (mel/duration/stop <= 100, pitch/energy <= 10) and weighted
  total (:201-207).

All functions are pure jnp — they run inside the jitted train step.  Where the
reference logs divergence warnings host-side (:158-199), we return the raw loss
values in the metrics dict and let the host loop do the logging.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` over positions where ``mask`` is True AND the value is
    finite; 0.0 when nothing is valid (reference losses.py:40-46)."""
    valid = mask & jnp.isfinite(values)
    total = jnp.sum(jnp.where(valid, values, 0.0))
    count = jnp.sum(valid)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float) -> jnp.ndarray:
    """torch.nn.HuberLoss semantics: 0.5*e^2 if |e| < delta else delta*(|e| - 0.5*delta)."""
    err = jnp.abs(pred - target)
    return jnp.where(
        err < delta, 0.5 * err**2, delta * (err - 0.5 * delta)
    )


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: float = 1.0
) -> jnp.ndarray:
    """torch BCEWithLogitsLoss(pos_weight) elementwise:
    ``pw * z * softplus(-x) + (1 - z) * softplus(x)``."""
    softplus = lambda v: jnp.logaddexp(v, 0.0)
    return pos_weight * targets * softplus(-logits) + (1.0 - targets) * softplus(
        logits
    )


def calculate_training_losses(
    *,
    predicted_mel: jnp.ndarray,            # (B, T, M)
    predicted_log_durations: jnp.ndarray,  # (B, L)
    predicted_stop_logits: jnp.ndarray,    # (B, T)
    mel_specs: jnp.ndarray,                # (B, T, M)
    phoneme_durations: jnp.ndarray,        # (B, L)
    stop_token_targets: jnp.ndarray,       # (B, T)
    mel_lengths: jnp.ndarray,              # (B,)
    phoneme_lengths: jnp.ndarray,          # (B,)
    predicted_pitch: Optional[jnp.ndarray] = None,   # (B, T)
    predicted_energy: Optional[jnp.ndarray] = None,  # (B, T)
    pitch_targets: Optional[jnp.ndarray] = None,     # (B, T) frame-level
    energy_targets: Optional[jnp.ndarray] = None,    # (B, T) frame-level
    duration_loss_weight: float = 0.35,
    stop_token_loss_weight: float = 0.010,
    pitch_loss_weight: float = 1.0,
    energy_loss_weight: float = 1.0,
    stop_token_pos_weight: float = 17.0,
    duration_huber_delta: float = 1.0,
    pitch_huber_delta: float = 0.05,
    energy_huber_delta: float = 0.05,
) -> Dict[str, Any]:
    """Returns dict: total, mel, duration, stop, pitch, energy (all scalars)."""
    # All loss arithmetic and reductions in float32 regardless of the model's
    # compute dtype or the batch transfer dtype (bf16 accumulation over ~1e6
    # elements loses ~2 decimal digits).
    f32 = lambda x: None if x is None else x.astype(jnp.float32)
    predicted_mel = f32(predicted_mel)
    predicted_log_durations = f32(predicted_log_durations)
    predicted_stop_logits = f32(predicted_stop_logits)
    mel_specs = f32(mel_specs)
    stop_token_targets = f32(stop_token_targets)
    predicted_pitch = f32(predicted_pitch)
    predicted_energy = f32(predicted_energy)
    pitch_targets = f32(pitch_targets)
    energy_targets = f32(energy_targets)
    T = mel_specs.shape[1]
    L = phoneme_durations.shape[1]
    mel_mask = jnp.arange(T)[None, :] < mel_lengths[:, None]          # (B, T)
    phoneme_mask = jnp.arange(L)[None, :] < phoneme_lengths[:, None]  # (B, L)

    loss_mel = masked_mean(
        l1_loss(predicted_mel, mel_specs), mel_mask[:, :, None]
    )

    target_log_durations = jnp.log(phoneme_durations.astype(jnp.float32) + 1.0)
    dur_valid = phoneme_mask & (phoneme_durations > 0)
    loss_duration = masked_mean(
        huber_loss(predicted_log_durations, target_log_durations,
                   duration_huber_delta),
        dur_valid,
    )

    loss_stop = masked_mean(
        bce_with_logits(
            predicted_stop_logits, stop_token_targets, stop_token_pos_weight
        ),
        mel_mask,
    )

    if predicted_pitch is not None and pitch_targets is not None:
        loss_pitch = masked_mean(
            huber_loss(
                predicted_pitch[:, :T], pitch_targets[:, :T], pitch_huber_delta
            ),
            mel_mask,
        )
    else:
        loss_pitch = jnp.zeros(())

    if predicted_energy is not None and energy_targets is not None:
        loss_energy = masked_mean(
            huber_loss(
                predicted_energy[:, :T], energy_targets[:, :T], energy_huber_delta
            ),
            mel_mask,
        )
    else:
        loss_energy = jnp.zeros(())

    # Per-loss clamps (reference losses.py:197-205)
    loss_mel = jnp.minimum(loss_mel, 100.0)
    loss_duration = jnp.minimum(loss_duration, 100.0)
    loss_stop = jnp.minimum(loss_stop, 100.0)
    loss_pitch = jnp.minimum(loss_pitch, 10.0)
    loss_energy = jnp.minimum(loss_energy, 10.0)

    total = (
        loss_mel
        + loss_duration * duration_loss_weight
        + loss_stop * stop_token_loss_weight
        + loss_pitch * pitch_loss_weight
        + loss_energy * energy_loss_weight
    )
    return {
        "total": total,
        "mel": loss_mel,
        "duration": loss_duration,
        "stop": loss_stop,
        "pitch": loss_pitch,
        "energy": loss_energy,
    }


def build_stop_token_targets(
    T: int, lengths: jnp.ndarray, tail: int = 6, decay: float = 0.5
) -> jnp.ndarray:
    """Temporally-smoothed stop targets for a batch (reference data/dataset.py:32-65).

    ``frame[len-1-k] = decay^k`` for ``k = 0..tail``; zero elsewhere.  Batched,
    static-shape version: built from position arithmetic, no scatter.

    Args:
        T: padded frame-buffer length.
        lengths: (B,) true mel lengths.
    """
    pos = jnp.arange(T)[None, :]                                 # (1, T)
    k = (lengths[:, None] - 1) - pos                             # (B, T) distance from stop frame
    in_tail = (k >= 0) & (k <= tail) & (pos < lengths[:, None])
    return jnp.where(in_tail, decay ** jnp.maximum(k, 0).astype(jnp.float32), 0.0)


def spectral_convergence(
    pred_mel: jnp.ndarray, target_mel: jnp.ndarray, mel_mask: jnp.ndarray
) -> jnp.ndarray:
    """Validation metric: ||pred - target||_F / ||target||_F over valid frames
    (reference trainer.py:1865-1888)."""
    m = mel_mask[:, :, None]
    diff = jnp.where(m, pred_mel - target_mel, 0.0)
    tgt = jnp.where(m, target_mel, 0.0)
    return jnp.sqrt(jnp.sum(diff**2)) / jnp.maximum(jnp.sqrt(jnp.sum(tgt**2)), 1e-8)


def f0_rmse(
    pred_pitch: jnp.ndarray, target_pitch: jnp.ndarray, mel_mask: jnp.ndarray
) -> jnp.ndarray:
    """Validation metric: frame-level F0 RMSE over voiced+valid frames
    (reference trainer.py:1890-1910)."""
    valid = mel_mask & (target_pitch > 0)
    se = jnp.where(valid, (pred_pitch - target_pitch) ** 2, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sqrt(jnp.sum(se) / count)


def mel_cepstral_distortion(
    pred_log_mel: jnp.ndarray,     # (B, T, M) natural-log mel
    target_log_mel: jnp.ndarray,   # (B, T, M)
    mel_mask: jnp.ndarray,         # (B, T) True = valid
    n_coeffs: int = 13,
) -> jnp.ndarray:
    """Mel-cepstral distortion in dB (the BASELINE.json parity metric; the
    reference computes only spectral convergence + F0 RMSE, so this is an
    addition): DCT-II of the log-mel per frame, coefficients 1..n_coeffs
    (c0 excluded — it is overall energy), standard Kubichek form
    ``(10 / ln 10) * sqrt(2 * sum_k (dc_k)^2)`` averaged over valid frames.

    Inputs are natural-log mels (the pipeline's ``log(mel + 1e-9)``); the
    10/ln10 factor converts to dB."""
    M = pred_log_mel.shape[-1]
    # Orthonormal DCT-II basis (M, M): basis[k, n] = s_k cos(pi k (2n+1) / 2M)
    n = jnp.arange(M)
    k = jnp.arange(M)[:, None]
    basis = jnp.cos(jnp.pi * k * (2 * n[None, :] + 1) / (2 * M))
    scale = jnp.where(k == 0, jnp.sqrt(1.0 / M), jnp.sqrt(2.0 / M))
    basis = (basis * scale).astype(jnp.float32)
    c_pred = jnp.einsum("btm,km->btk", pred_log_mel.astype(jnp.float32), basis)
    c_tgt = jnp.einsum("btm,km->btk", target_log_mel.astype(jnp.float32), basis)
    dc = (c_pred - c_tgt)[..., 1 : n_coeffs + 1]
    per_frame = (10.0 / jnp.log(10.0)) * jnp.sqrt(
        2.0 * jnp.sum(dc**2, axis=-1) + 1e-12
    )
    valid = mel_mask.astype(jnp.float32)
    return jnp.sum(per_frame * valid) / jnp.maximum(jnp.sum(valid), 1.0)
