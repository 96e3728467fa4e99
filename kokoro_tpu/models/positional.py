"""Positional encodings: absolute sinusoidal PE and rotary (RoPE).

Reference: model/positional_encoding.py — sinusoidal PE with ``seq_offset`` for
autoregressive decode (:36-93) and ``RotaryPositionalEncoding`` with q/k
position offsets for KV-cached decode (:96-209).

TPU-native: tables are computed inline with ``jnp`` ops (constant-folded by
XLA under jit) instead of lazily-grown torch buffers; everything is pure.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_table(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard transformer sinusoidal position table ``(length, dim)``."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, dim, 2, dtype=np.float64) * (-np.log(10000.0) / dim)
    )
    table = np.zeros((length, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term[: table[:, 1::2].shape[1]])
    return jnp.asarray(table, dtype=dtype)


def add_positional_encoding(
    x: jnp.ndarray, seq_offset: int | jnp.ndarray = 0, max_len: int | None = None
) -> jnp.ndarray:
    """Add sinusoidal PE to ``(B, T, D)`` starting at absolute ``seq_offset``.

    ``seq_offset`` may be a traced scalar (AR decode under ``lax.while_loop``);
    in that case the table is sliced dynamically.
    """
    B, T, D = x.shape
    if isinstance(seq_offset, (int, np.integer)):
        table = sinusoidal_table(T + int(seq_offset), D, dtype=x.dtype)
        pe = table[int(seq_offset) : int(seq_offset) + T]
    else:
        limit = max_len if max_len is not None else 4096
        table = sinusoidal_table(limit, D, dtype=x.dtype)
        pe = jnp.take(
            table, jnp.clip(seq_offset + jnp.arange(T), 0, limit - 1), axis=0
        )
    return x + pe[None, :, :]


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, base: float = 10000.0, dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary cos/sin tables for integer ``positions`` of any shape.

    Returns ``(cos, sin)`` with shape ``positions.shape + (head_dim // 2,)``.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, base: float = 10000.0
) -> jnp.ndarray:
    """Rotate ``(..., T, head_dim)`` by position-dependent angles.

    Pairs dimensions as ``(0, 1), (2, 3), ...`` (interleaved convention,
    matching reference positional_encoding.py:96-209's rotate-half on
    even/odd pairs).

    Args:
        x: ``(..., T, head_dim)`` queries or keys.
        positions: ``(T,)`` or broadcastable integer positions.
    """
    head_dim = x.shape[-1]
    cos, sin = rope_cos_sin(positions, head_dim, base, dtype=x.dtype)
    # reshape to pairs: (..., T, half, 2)
    x_pairs = x.reshape(*x.shape[:-1], head_dim // 2, 2)
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    # broadcast cos/sin (T, half) against (..., T, half)
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


def apply_rope_heads_last(
    x: jnp.ndarray, positions: jnp.ndarray, base: float = 10000.0
) -> jnp.ndarray:
    """:func:`apply_rope` for the heads-last ``(B, T, H, head_dim)`` layout
    (the transpose-free fused-attention path, ops/fused_attention.py).

    Identical rotation per (t, head_dim) — only the broadcast differs: the
    ``(T, half)`` tables gain a singleton heads axis.  Equivalence with
    ``apply_rope`` on the transposed layout is unit-tested."""
    head_dim = x.shape[-1]
    cos, sin = rope_cos_sin(positions, head_dim, base, dtype=x.dtype)
    cos, sin = cos[:, None, :], sin[:, None, :]  # (T, 1, half)
    x_pairs = x.reshape(*x.shape[:-1], head_dim // 2, 2)
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)
