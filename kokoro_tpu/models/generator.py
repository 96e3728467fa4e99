"""Autoregressive mel generation — the serving hot loop.

Semantics parity with reference model/generator.py:24-127 and
model/model.py:676-782:

* cross-attention K/V precomputed once from the expanded memory (:39),
* per step: project previous mel frame with PE offset t -> decoder ->
  mel frame + stop logit,
* stop when ``sigmoid(stop) > threshold`` after ``min_expected_length``, with
  the relaxed ``post_expected_stop_threshold`` once past the duration-predicted
  length (:70-79),
* energy-based early stop when the last 30 frames' mean < -9.5 (:81-88),
* generation bounds (model.py:743-750): ``min = max(floor, 0.7 * expected)``,
  ``max = min(max_len, max(expected + 80, 3 * expected), 1600)``,
* final clamp to [-11.5, 2.0] (:115).

TPU-native design: the reference steps a Python loop with growing KV tensors —
one full decoder dispatch per frame from the host.  Here the ENTIRE decode is
one ``lax.while_loop`` inside a single jitted function: KV caches are
preallocated at the static frame cap and updated in place with
``dynamic_update_slice``; all stop conditions are traced scalar logic.  The
host launches one XLA program per utterance bucket, not one per frame.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kokoro_tpu.models.kokoro import KokoroModel


def make_generate_fn(model: KokoroModel, max_frames: int):
    """Build a jitted ``generate(params, phoneme_indices, stress_indices,
    text_padding_mask, ...) -> (mel, length, expected)`` for a static frame
    cap.  One compilation per (phoneme bucket, max_frames) pair."""

    head_dim = model.hidden_dim // model.n_heads

    @partial(
        jax.jit,
        static_argnames=("stop_threshold", "post_expected_stop_threshold",
                         "min_len_ratio", "min_len_floor", "max_len_ratio",
                         "max_len_cap"),
    )
    def generate(
        params,
        phoneme_indices: jnp.ndarray,          # (1, L)
        stress_indices: Optional[jnp.ndarray],  # (1, L) or None
        text_padding_mask: jnp.ndarray,         # (1, L) True = pad
        stop_threshold: float = 0.5,
        post_expected_stop_threshold: float = 0.2,
        min_len_ratio: float = 0.7,
        min_len_floor: int = 12,
        max_len_ratio: float = 3.0,
        max_len_cap: int = 1600,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = phoneme_indices.shape[0]
        M = model.n_mels

        memory, memory_pad_mask, expected = model.apply(
            params,
            phoneme_indices,
            stress_indices,
            text_padding_mask,
            max_frames,
            method=KokoroModel.encode_for_inference,
        )
        # Per-ROW stop bookkeeping (B,) so one decode serves a whole batch of
        # utterances (VERDICT r2 #8): every bound/threshold/flag below is a
        # vector; with B=1 the semantics reduce exactly to the reference's
        # single-utterance loop (reference generator.py:24-127).
        expected_length = expected  # (B,)

        cross_kvs = model.apply(
            params, memory, method=KokoroModel.project_memory_kv
        )

        min_expected = jnp.maximum(
            min_len_floor, (expected_length * min_len_ratio).astype(jnp.int32)
        )
        max_expected = jnp.minimum(
            jnp.minimum(
                jnp.asarray(max_frames, jnp.int32),
                jnp.maximum(
                    expected_length + 80,
                    (expected_length * max_len_ratio).astype(jnp.int32),
                ),
            ),
            max_len_cap,
        )
        max_expected = jnp.where(
            max_expected <= min_expected,
            jnp.minimum(max_frames, min_expected + 1),
            max_expected,
        )

        caches = [
            {
                "k": jnp.zeros((B, model.n_heads, max_frames, head_dim),
                               dtype=model.dtype),
                "v": jnp.zeros((B, model.n_heads, max_frames, head_dim),
                               dtype=model.dtype),
                "index": jnp.asarray(0, jnp.int32),
            }
            for _ in range(model.n_decoder_layers)
        ]

        init_state = {
            "t": jnp.asarray(0, jnp.int32),
            "prev_frame": jnp.zeros((B, 1, M), jnp.float32),
            "mels": jnp.zeros((B, max_frames, M), jnp.float32),
            "caches": caches,
            "done": jnp.zeros((B,), bool),
            "length": jnp.zeros((B,), jnp.int32),
        }

        def cond(state):
            return jnp.any((~state["done"]) & (state["t"] < max_expected))

        def body(state):
            t = state["t"]
            # (B,) rows still generating this step; finished rows ride along
            # (their outputs are masked out) — cheaper than compacting the
            # batch inside the loop
            row_active = (~state["done"]) & (t < max_expected)
            mel_t, stop_t, new_caches = model.apply(
                params,
                state["prev_frame"],
                t,
                state["caches"],
                cross_kvs,
                memory_pad_mask,
                method=KokoroModel.decode_step,
            )
            mel_t = mel_t.astype(jnp.float32)
            # Freeze finished rows by masking ONLY the frame being written
            # (slot t of a frozen row still holds its zero init) — a
            # whole-buffer where() here would copy (B, max_frames, M) every
            # step and dominate batched decode.
            current = jax.lax.dynamic_slice(
                state["mels"], (0, t, 0), (B, 1, M)
            )
            write = jnp.where(row_active[:, None, None], mel_t, current)
            mels = jax.lax.dynamic_update_slice(
                state["mels"], write, (0, t, 0)
            )
            stop_prob = jnp.mean(
                jax.nn.sigmoid(stop_t.astype(jnp.float32)).reshape(B, -1),
                axis=-1,
            )  # (B,)

            past_min = t >= min_expected  # (B,)
            eff_thresh = jnp.where(
                t < expected_length,
                stop_threshold,
                jnp.minimum(stop_threshold, post_expected_stop_threshold),
            )
            stop_hit = past_min & (stop_prob > eff_thresh)

            # energy early-stop over the last 30 generated frames (:81-88)
            n_gen = t + 1
            start = jnp.maximum(n_gen - 30, 0)
            window = jax.lax.dynamic_slice(
                mels, (0, start, 0), (B, 30, M)
            )
            frame_idx = start + jnp.arange(30)
            valid = (frame_idx < n_gen)[None, :, None]
            recent_energy = jnp.sum(
                jnp.where(valid, window, 0.0), axis=(1, 2)
            ) / jnp.maximum(jnp.sum(valid) * M, 1)  # (B,)
            energy_hit = past_min & (n_gen >= 30) & (recent_energy < -9.5)

            done = state["done"] | (row_active & (stop_hit | energy_hit))
            return {
                "t": t + 1,
                "prev_frame": mel_t,
                "mels": mels,
                "caches": new_caches,
                "done": done,
                # active rows advance; rows that stopped (or hit their max
                # bound) keep their final length
                "length": jnp.where(row_active, t + 1, state["length"]),
            }

        final = jax.lax.while_loop(cond, body, init_state)
        mel = jnp.clip(final["mels"], -11.5, 2.0)
        if B == 1:  # single-utterance API stays scalar (B is static under jit)
            return mel, final["length"][0], expected_length[0]
        return mel, final["length"], expected_length

    return generate
