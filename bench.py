#!/usr/bin/env python3
"""Benchmark: training throughput in mel-frames/sec/chip on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's MPS throughput is ~18k mel-frames/s
(3.68 it/s x ~11 samples x ~440 frames, order-of-magnitude).  vs_baseline is
value / 18000.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.config import get_default_config
    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.optimizer import build_preclip_tree, build_optimizer
    from kokoro_tpu.training.train_step import create_train_state, make_train_step

    config = get_default_config()
    # Flagship shape: 512 hidden, 6+6 layers (reference config.py:100-117).
    # Benchmark batch: 8 x 880 frames = 7040 mel frames/step (a realistic
    # dynamic-batching bucket under the reference's 15000-frame budget).
    B, L, T, M = 8, 128, 896, config.n_mels
    VOCAB = 128

    model = KokoroModel(
        vocab_size=VOCAB,
        n_mels=M,
        hidden_dim=config.hidden_dim,
        n_encoder_layers=config.n_encoder_layers,
        n_decoder_layers=config.n_decoder_layers,
        n_heads=config.n_heads,
        encoder_ff_dim=config.encoder_ff_dim,
        decoder_ff_dim=config.decoder_ff_dim,
        qk_norm=config.qk_norm,
        ffn_output_norm=config.ffn_output_norm,
        use_stochastic_depth=config.use_stochastic_depth,
        stochastic_depth_rate=config.stochastic_depth_rate,
        gradient_checkpointing=config.gradient_checkpointing,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    # durations roughly T/L frames per phoneme
    durations = np.full((B, L), T // L, dtype=np.int32)
    batch = {
        "phoneme_indices": jnp.asarray(rng.integers(1, VOCAB, size=(B, L)), jnp.int32),
        "stress_indices": jnp.asarray(rng.integers(0, 3, size=(B, L)), jnp.int32),
        "phoneme_durations": jnp.asarray(durations),
        "mel_specs": jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
        "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "energy_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "stop_token_targets": jnp.zeros((B, T), jnp.float32),
        "mel_lengths": jnp.full((B,), T, jnp.int32),
        "phoneme_lengths": jnp.full((B,), L, jnp.int32),
    }

    from kokoro_tpu.training.train_step import init_params

    key = jax.random.PRNGKey(0)
    params = init_params(model, key, batch)
    optimizer = build_optimizer(config, params, total_steps=20000)
    state = create_train_state(
        model, config, optimizer, key, batch, params=params
    )
    preclips = build_preclip_tree(params, config)
    train_step = jax.jit(
        make_train_step(model, config, optimizer, preclips, ema_decay=0.999),
        donate_argnums=(0,),
    )

    # Warmup / compile
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["total"])

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["total"])
    dt = time.perf_counter() - t0

    frames_per_step = B * T
    frames_per_sec = frames_per_step * n_steps / dt
    baseline = 18000.0  # BASELINE.md: derived MPS reference, order-of-magnitude
    print(
        json.dumps(
            {
                "metric": "train_mel_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "mel-frames/s",
                "vs_baseline": round(frames_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
