#!/usr/bin/env python3
"""Benchmark: training throughput in mel-frames/sec/chip on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's MPS throughput is ~18k mel-frames/s
(3.68 it/s x ~11 samples x ~440 frames, order-of-magnitude).  vs_baseline is
value / 18000.

Measurement discipline: on this host's device transport,
``jax.block_until_ready`` does NOT reliably wait for in-flight computation —
only a value fetch truly synchronizes.  The timed region is K*N optimizer
steps ended by a scalar fetch of the last step's loss (single-device streams
execute in order, so that fetch transitively waits for everything).

Config measured: the high-performance training preset — bf16 compute, no
remat, attention-weight dropout off (flash/einsum attention without the
(B,H,T,T) bernoulli masks, which alone cost ~57 ms/step), scan_steps=8
multi-step dispatch, B=16 x 896 frames (just under the reference's 15000
frame budget x2 as allowed by the preset).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from kokoro_tpu.config import get_high_performance_config
    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.optimizer import build_preclip_tree, build_optimizer
    from kokoro_tpu.training.train_step import (
        create_train_state,
        init_params,
        make_multi_step,
        make_train_step,
    )

    config = get_high_performance_config()
    B, L, T, M = 16, 128, 896, config.n_mels
    K = config.scan_steps
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
        use_flash_attention=False,  # einsum beats the pallas kernel at T=896
        attention_weight_dropout=config.attention_weight_dropout,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
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

    key = jax.random.PRNGKey(0)
    params = init_params(model, key, batch)
    optimizer = build_optimizer(config, params, total_steps=20000)
    state = create_train_state(
        model, config, optimizer, key, batch, params=params
    )
    preclips = build_preclip_tree(params, config)
    train_step = jax.jit(
        make_multi_step(
            make_train_step(model, config, optimizer, preclips, ema_decay=0.999),
            K,
        ),
        donate_argnums=(0,),
    )
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )

    # Warmup: compile + settle buffer layouts.  End with a VALUE fetch.
    for i in range(2):
        state, metrics = train_step(state, batches, jax.random.PRNGKey(i + 100))
    _ = float(metrics["total"][-1])

    n_calls = 4
    times = []
    for i in range(n_calls):
        t0 = time.perf_counter()
        state, metrics = train_step(state, batches, jax.random.fold_in(key, i))
        _ = float(metrics["total"][-1])  # true barrier
        times.append(time.perf_counter() - t0)
    best = min(times)  # min-of-N: transport jitter only ever adds time

    frames_per_sec = B * T * K / best
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
