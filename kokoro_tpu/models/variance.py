"""FastSpeech-2 style variance stack: duration/pitch/energy predictors and the
variance adaptor.

Behavior parity with reference model/variance_predictor.py:

* ``VariancePredictor`` (:25): 2 x (Conv1d(k=3, same) -> GroupNorm(1) -> ReLU
  -> Dropout) -> Linear(1); xavier init; duration head bias log1p(5) (:167-170)
  so initial predictions are ~5 frames/phoneme.
* ``VarianceAdaptor`` (:118): token-level duration -> length regulation ->
  frame-level pitch/energy -> quantize into ``n_bins`` buckets over [0, 1]
  (:181-186) -> add pitch+energy embeddings (:429-433).  Teacher forcing uses
  frame-level dataset targets (:387-427); inference uses
  ``clip(round(expm1(pred)), 0)`` (:341-348).

TPU-native differences (deliberate, documented):
* No 512-frame conv chunking (reference :79-87 is an MPS memory workaround).
* GroupNorm statistics are computed over VALID frames only (masked): with
  bucketed static padding, unmasked stats would depend on the bucket size
  rather than the utterance — masking makes numerics padding-invariant.
* Length regulation runs on-device as a gather (ops/lengths.py) with the
  reference's stop-gradient semantics preserved behind a flag.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kokoro_tpu.ops.lengths import expand_tokens, token_to_frame_map

Dtype = Any
xavier = nn.initializers.xavier_uniform


def _masked_group_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    valid: Optional[jnp.ndarray], eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm-over-(C, L) per sample — GroupNorm(1 group) — with optional
    masking of padded frames.  ``x``: (B, L, C); ``valid``: (B, L) bool."""
    if valid is None:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
    else:
        v = valid[:, :, None].astype(x.dtype)
        count = jnp.maximum(v.sum(axis=(1, 2), keepdims=True) * x.shape[2], 1.0)
        mean = (x * v).sum(axis=(1, 2), keepdims=True) / count
        var = (((x - mean) ** 2) * v).sum(axis=(1, 2), keepdims=True) / count
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale[None, None, :] + bias[None, None, :]


class VariancePredictor(nn.Module):
    """Conv-stack scalar predictor over token or frame sequences."""

    hidden_dim: int = 512
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    num_layers: int = 2
    output_bias: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # (B, L) True = padding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """(B, L, H) -> (B, L) with padded positions zeroed."""
        valid = None if mask is None else ~mask.astype(bool)
        for i in range(self.num_layers):
            x = nn.Conv(
                self.filter_size, (self.kernel_size,), padding="SAME",
                kernel_init=xavier(), name=f"conv{i}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
            scale = self.param(
                f"norm{i}_scale", nn.initializers.ones, (self.filter_size,),
                self.param_dtype,
            )
            bias = self.param(
                f"norm{i}_bias", nn.initializers.zeros, (self.filter_size,),
                self.param_dtype,
            )
            x = _masked_group_norm(x, scale, bias, valid)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if valid is not None:
                x = jnp.where(valid[:, :, None], x, 0.0)
        out = nn.Dense(
            1, kernel_init=xavier(),
            bias_init=nn.initializers.constant(self.output_bias),
            name="linear", dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)[..., 0]
        if mask is not None:
            out = jnp.where(mask.astype(bool), 0.0, out)
        return out


class SimpleDurationAdaptor(nn.Module):
    """Fallback duration-only adaptor (reference duration_adaptor.py:51-102,
    model.py:146-170): a small MLP duration predictor + gradient-preserving
    ``length_regulate``; no pitch/energy predictions.

    Selected by ``use_variance_predictor=False``.  Inference durations invert
    the log1p training target with ``expm1`` clamped to >= 1 frame
    (reference duration_adaptor.py:88-96 — using exp() was a reference bug
    fixed there)."""

    hidden_dim: int = 512
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        encoder_output: jnp.ndarray,          # (B, L, H)
        max_frames: int,
        mask: Optional[jnp.ndarray] = None,   # (B, L) True = padding
        pitch_target: Optional[jnp.ndarray] = None,    # ignored
        energy_target: Optional[jnp.ndarray] = None,   # ignored
        duration_target: Optional[jnp.ndarray] = None,  # (B, L)
        deterministic: bool = True,
    ):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = encoder_output
        # Linear(h, h) -> ReLU -> Dropout -> Linear(h, h/2) -> ReLU ->
        # Dropout -> Linear(h/2, 1) (reference model.py:148-156)
        h = nn.Dense(self.hidden_dim, kernel_init=xavier(),
                     name="linear1", **common)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim // 2, kernel_init=xavier(),
                     name="linear2", **common)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        dur_pred = nn.Dense(1, kernel_init=xavier(), name="linear3",
                            **common)(h)[..., 0]
        if mask is not None:
            dur_pred = jnp.where(mask.astype(bool), 0.0, dur_pred)

        if duration_target is not None:
            durations = duration_target.astype(jnp.int32)
        else:
            durations = jnp.clip(
                jnp.round(jnp.expm1(dur_pred)), 1, None
            ).astype(jnp.int32)

        from kokoro_tpu.ops.lengths import length_regulate

        text_pad = (
            mask.astype(bool) if mask is not None
            else jnp.zeros(encoder_output.shape[:2], bool)
        )
        expanded, frame_mask = length_regulate(
            encoder_output, durations, text_pad, max_frames,
            stop_gradient=False,  # the Simple path preserves gradients
        )
        # No pitch/energy predictions (reference returns None; None keeps the
        # pitch/energy losses at exactly zero)
        return expanded, dur_pred, None, None, frame_mask


class VarianceAdaptor(nn.Module):
    """Duration -> length-regulate -> pitch/energy -> embedding adaptor."""

    hidden_dim: int = 512
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    n_bins: int = 256
    pitch_min: float = 0.0
    pitch_max: float = 1.0
    energy_min: float = 0.0
    energy_max: float = 1.0
    length_regulator_stop_gradient: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(
            hidden_dim=self.hidden_dim, filter_size=self.filter_size,
            kernel_size=self.kernel_size, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        # log1p(5) bias -> ~5 frames/phoneme at init (reference :167-170).
        # math.log1p, not jnp: setup() runs under jit tracing, where jnp ops
        # return tracers that float() cannot concretize.
        self.duration_predictor = VariancePredictor(
            output_bias=math.log1p(5.0), name="duration_predictor", **common
        )
        self.pitch_predictor = VariancePredictor(name="pitch_predictor", **common)
        self.energy_predictor = VariancePredictor(name="energy_predictor", **common)
        self.pitch_embedding = nn.Embed(
            self.n_bins, self.hidden_dim, name="pitch_embedding",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.energy_embedding = nn.Embed(
            self.n_bins, self.hidden_dim, name="energy_embedding",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def _quantize(self, values: jnp.ndarray) -> jnp.ndarray:
        """Bucketize [0, 1] values into ``n_bins`` indices
        (reference :181-186 ``torch.bucketize`` over ``linspace(0, 1, n-1)``)."""
        boundaries = jnp.linspace(0.0, 1.0, self.n_bins - 1)
        return jnp.searchsorted(boundaries, values, side="left").astype(jnp.int32)

    def _normalize_pitch(self, x: jnp.ndarray) -> jnp.ndarray:
        """Hz -> [0,1] heuristic (reference :224-244): only rescale when values
        fall outside [0, 1]."""
        out_of_range = (jnp.max(x) > 1.0) | (jnp.min(x) < 0.0)
        scaled = jnp.clip(
            (x - self.pitch_min) / (self.pitch_max - self.pitch_min + 1e-8), 0.0, 1.0
        )
        return jnp.where(out_of_range, scaled, x)

    def _normalize_energy(self, x: jnp.ndarray) -> jnp.ndarray:
        out_of_range = (jnp.max(x) > 1.0) | (jnp.min(x) < 0.0)
        scaled = jnp.clip(
            (x - self.energy_min) / (self.energy_max - self.energy_min + 1e-8),
            0.0, 1.0,
        )
        return jnp.where(out_of_range, scaled, x)

    def __call__(
        self,
        encoder_output: jnp.ndarray,          # (B, L, H)
        max_frames: int,                      # static frame-bucket length
        mask: Optional[jnp.ndarray] = None,   # (B, L) True = padding
        pitch_target: Optional[jnp.ndarray] = None,   # (B, T) frame-level
        energy_target: Optional[jnp.ndarray] = None,  # (B, T) frame-level
        duration_target: Optional[jnp.ndarray] = None,  # (B, L) frame counts
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (adapted (B,T,H), duration_pred (B,L) log1p-domain,
        pitch_pred (B,T), energy_pred (B,T), frame_mask (B,T) True=padding)."""
        duration_pred = self.duration_predictor(
            encoder_output, mask, deterministic=deterministic
        )

        if duration_target is not None:
            durations = duration_target
        else:
            durations = jnp.clip(jnp.round(jnp.expm1(duration_pred)), 0, None)
        durations = jnp.maximum(durations.astype(jnp.int32), 0)
        if mask is not None:
            durations = jnp.where(mask.astype(bool), 0, durations)

        x = expand_tokens(
            encoder_output, durations, max_frames,
            stop_gradient=self.length_regulator_stop_gradient,
        )
        _, frame_valid, _ = token_to_frame_map(durations, max_frames)
        frame_mask = ~frame_valid  # True = padding

        pitch_pred = self.pitch_predictor(x, frame_mask, deterministic=deterministic)
        energy_pred = self.energy_predictor(x, frame_mask, deterministic=deterministic)

        if pitch_target is not None:
            # Frame-level targets: align to (B, max_frames) (reference :404-415)
            t = pitch_target[:, :max_frames]
            if t.shape[1] < max_frames:
                t = jnp.pad(t, ((0, 0), (0, max_frames - t.shape[1])))
            p_val = self._normalize_pitch(t)
        else:
            p_val = jnp.clip(pitch_pred, 0.0, 1.0)

        if energy_target is not None:
            t = energy_target[:, :max_frames]
            if t.shape[1] < max_frames:
                t = jnp.pad(t, ((0, 0), (0, max_frames - t.shape[1])))
            e_val = self._normalize_energy(t)
        else:
            e_val = jnp.clip(energy_pred, 0.0, 1.0)

        adapted = (
            x
            + self.pitch_embedding(self._quantize(p_val))
            + self.energy_embedding(self._quantize(e_val))
        )
        adapted = jnp.where(frame_mask[:, :, None], 0.0, adapted)
        return adapted, duration_pred, pitch_pred, energy_pred, frame_mask
