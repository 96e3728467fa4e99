"""SpecAugment applied to the expanded encoder memory (NOT the mel decoder
input) — reference config.py:148-166, applied at reference model/model.py:636-639.

Masking the cross-attention memory forces the decoder to reconstruct from
incomplete upstream context without corrupting the causal self-attention chain.

TPU-native: masks are built from ``broadcasted_iota`` comparisons against
uniformly sampled (start, length) pairs — fully traced, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _span_mask(key: jax.Array, batch: int, size: int, max_width: int, n_masks: int):
    """(batch, size) bool — True where masked.  Each of ``n_masks`` spans has a
    random width in [0, max_width] and a random start."""
    k_w, k_s = jax.random.split(key)
    widths = jax.random.randint(k_w, (batch, n_masks), 0, max_width + 1)
    starts = jax.random.randint(k_s, (batch, n_masks), 0, jnp.maximum(size - widths, 1))
    pos = jnp.arange(size)[None, None, :]
    spans = (pos >= starts[:, :, None]) & (pos < (starts + widths)[:, :, None])
    return jnp.any(spans, axis=1)


def apply_spec_augment(
    memory: jnp.ndarray,                 # (B, T, D)
    key: jax.Array,
    time_mask_max: int = 5,
    freq_mask_max: int = 3,
    num_time_masks: int = 1,
    num_freq_masks: int = 2,
) -> jnp.ndarray:
    """Zero out random time spans and feature-dim spans per sample."""
    B, T, D = memory.shape
    k_t, k_f = jax.random.split(key)
    time_mask = _span_mask(k_t, B, T, time_mask_max, num_time_masks)     # (B, T)
    freq_mask = _span_mask(k_f, B, D, freq_mask_max, num_freq_masks)     # (B, D)
    keep = ~(time_mask[:, :, None] | freq_mask[:, None, :])
    return memory * keep.astype(memory.dtype)
