"""Token <-> frame conversion core (length regulation).

Reference behavior (reference utils/lengths.py):

* ``vectorized_expand_tokens`` (:16) repeats each token ``durations[i]`` times
  into a zero-padded ``(B, max_len)`` buffer.  The reference implementation
  detaches and round-trips through the CPU every training step ("CPU round-trip
  retained for MPS stability", :21-31) — a deliberate MPS workaround.
* ``length_regulate`` (:108) is the gradient-preserving per-row variant that
  clamps durations to >= 1 on non-padded tokens.
* ``average_by_duration`` (:156) averages frame-level values back to tokens.

TPU-native design: all three are static-shape device ops.

* Expansion is a **gather**: ``ends = cumsum(durations)`` gives each token's
  exclusive end frame; frame ``t`` belongs to the first token whose ``end > t``
  (a vectorized ``searchsorted``).  ``take_along_axis`` then reads the token
  row — differentiable w.r.t. token values, O(T log L), no host transfer.
* Averaging is a **matmul** with the frame->token assignment one-hot — it runs
  on the MXU and yields exact mean gradients.

Gradient semantics: the reference's expansion detaches token values
(reference utils/lengths.py:30 ``tokens.detach()``), so the mel loss never
reaches the encoder through the length regulator.  ``expand_tokens`` exposes
``stop_gradient`` (default True for parity; set False to let gradients flow).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def token_to_frame_map(
    durations: jnp.ndarray, max_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map each output frame to its source token index.

    Args:
        durations: ``(B, L)`` per-token frame counts (any numeric dtype; values
            are clamped to >= 0 like reference utils/lengths.py:33).
        max_len: static output frame count ``T``.

    Returns:
        ``(frame_to_token, frame_mask, total_lengths)`` where
        ``frame_to_token`` is ``(B, T)`` int32 in ``[0, L-1]`` (clamped for
        out-of-range frames), ``frame_mask`` is ``(B, T)`` bool — True for
        valid (non-padding) frames, and ``total_lengths`` is ``(B,)`` int32
        (sum of durations, clamped to ``max_len``).
    """
    durations = jnp.maximum(durations.astype(jnp.int32), 0)
    ends = jnp.cumsum(durations, axis=1)                      # (B, L) exclusive ends
    total = jnp.minimum(ends[:, -1], max_len)                 # (B,)
    frames = jnp.arange(max_len, dtype=jnp.int32)             # (T,)
    # frame t -> first token whose cumulative end exceeds t
    frame_to_token = jax.vmap(
        lambda e: jnp.searchsorted(e, frames, side="right")
    )(ends).astype(jnp.int32)
    num_tokens = durations.shape[1]
    frame_mask = frames[None, :] < total[:, None]
    frame_to_token = jnp.clip(frame_to_token, 0, num_tokens - 1)
    return frame_to_token, frame_mask, total.astype(jnp.int32)


def expand_tokens(
    tokens: jnp.ndarray,
    durations: jnp.ndarray,
    max_len: int,
    stop_gradient: bool = True,
) -> jnp.ndarray:
    """Repeat token values per duration into a fixed-length frame sequence.

    Matches reference ``vectorized_expand_tokens`` (utils/lengths.py:16):
    durations clamped to >= 0, frames past the total length are zero, output is
    exactly ``(B, max_len[, D])``.

    Args:
        tokens: ``(B, L)`` or ``(B, L, D)`` token values.
        durations: ``(B, L)`` frame counts.
        max_len: static output length.
        stop_gradient: True reproduces the reference's detach
            (utils/lengths.py:30); False keeps the op differentiable.
    """
    if stop_gradient:
        tokens = jax.lax.stop_gradient(tokens)
    frame_to_token, frame_mask, _ = token_to_frame_map(durations, max_len)
    if tokens.ndim == 3:
        gathered = jnp.take_along_axis(tokens, frame_to_token[:, :, None], axis=1)
        return jnp.where(frame_mask[:, :, None], gathered, 0.0)
    gathered = jnp.take_along_axis(tokens, frame_to_token, axis=1)
    return jnp.where(frame_mask, gathered, jnp.zeros((), dtype=tokens.dtype))


def length_regulate(
    encoder_outputs: jnp.ndarray,
    durations: jnp.ndarray,
    text_padding_mask: jnp.ndarray,
    max_len: int,
    stop_gradient: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient-preserving length regulation (reference utils/lengths.py:108).

    Non-padded tokens contribute at least one frame (durations clamped >= 1);
    padded tokens contribute zero frames.

    Args:
        encoder_outputs: ``(B, L, D)``.
        durations: ``(B, L)`` (float or int).
        text_padding_mask: ``(B, L)`` bool — True at PADDING positions
            (the reference's convention).
        max_len: static output frame count.

    Returns:
        ``(expanded, frame_padding_mask)`` with ``expanded`` ``(B, T, D)`` and
        ``frame_padding_mask`` ``(B, T)`` bool — True at PADDING frames
        (matching the reference's returned mask polarity, utils/lengths.py:137).
    """
    keep = ~text_padding_mask.astype(bool)
    dur = jnp.where(keep, jnp.maximum(durations.astype(jnp.int32), 1), 0)
    expanded = expand_tokens(
        encoder_outputs, dur, max_len, stop_gradient=stop_gradient
    )
    _, frame_mask, _ = token_to_frame_map(dur, max_len)
    return expanded, ~frame_mask


def average_by_duration(
    values: jnp.ndarray,
    durations: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Average frame-level values back to token level (utils/lengths.py:156).

    Each token's output is the mean of its frames; zero-duration tokens (and
    masked tokens when ``mask`` is given — True = padding) produce 0.

    TPU-native: the frame->token assignment is materialized as a one-hot
    ``(B, T, L)`` and contracted on the MXU, so both the sum and the count are
    a single batched matmul and gradients are exact.

    Args:
        values: ``(B, T)`` frame-level values.
        durations: ``(B, L)`` per-token frame counts.
        mask: optional ``(B, L)`` bool, True = padding.
    """
    num_tokens = durations.shape[1]
    max_frames = values.shape[1]
    frame_to_token, frame_mask, _ = token_to_frame_map(durations, max_frames)
    onehot = jax.nn.one_hot(frame_to_token, num_tokens, dtype=values.dtype)
    onehot = onehot * frame_mask[:, :, None].astype(values.dtype)
    sums = jnp.einsum("bt,btl->bl", values, onehot)
    counts = jnp.sum(onehot, axis=1)
    out = sums / jnp.maximum(counts, 1.0)
    dur_nonzero = jnp.maximum(durations.astype(jnp.int32), 0) > 0
    out = jnp.where(dur_nonzero, out, 0.0)
    if mask is not None:
        out = jnp.where(mask.astype(bool), 0.0, out)
    return out
