#!/usr/bin/env python3
"""Sweep train-step shapes on the real chip: per-chip batch x sequence length.

VERDICT r2 #4: the compute floor was measured at B=16 x T=896 (~21% MXU on
the decoder floor) without trying larger per-chip batches.  This sweep
measures optimizer-step throughput for B in {16, 32, 64} x T in {896, 1280}
(remat off, flash auto-gated) and prints a step-time table for
docs/PERFORMANCE.md plus a recommended default.

Method: same discipline as bench.py compute-only — K-step lax.scan per
dispatch, min-of-N wall times ended by a VALUE fetch (block_until_ready is
not a true barrier on tunneled transports).  Throughput is PADDED
mel-frames/s/chip (B*T*K / time): the kernel ceiling a bucketed e2e epoch
divides into.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CONFIGS = [
    # (B, L, T)
    (16, 128, 896),
    (32, 128, 896),
    (64, 128, 896),
    (16, 192, 1280),
    (32, 192, 1280),
    (64, 192, 1280),
]

# short-bucket utilization probe (round 4): the e2e bench mix is dominated
# by T 288-512 steps at B=16 (4.6k-8.2k padded frames per step vs 14.3k at
# B16xT896) — is the short-T padded rate B-bound?
CONFIGS_SHORT = [
    (16, 64, 288),
    (48, 64, 288),
    (16, 96, 512),
    (32, 96, 512),
]


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from kokoro_tpu.config import get_high_performance_config
    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
    from kokoro_tpu.training.train_step import (
        create_train_state,
        init_params,
        make_multi_step,
        make_train_step,
    )

    config = get_high_performance_config()
    VOCAB, M = 128, config.n_mels
    K = 4  # scan steps per dispatch: amortizes RTT, keeps compiles moderate

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
        use_flash_attention=config.use_flash_attention,
        attention_weight_dropout=config.attention_weight_dropout,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    configs = CONFIGS_SHORT if "--short" in sys.argv else CONFIGS
    results = []
    params = None
    for B, L, T in configs:
        rng = np.random.default_rng(0)
        batch = {
            "phoneme_indices": jnp.asarray(
                rng.integers(1, VOCAB, size=(B, L)), jnp.int32
            ),
            "stress_indices": jnp.asarray(rng.integers(0, 3, size=(B, L)), jnp.int32),
            "phoneme_durations": jnp.asarray(np.full((B, L), T // L, np.int32)),
            "mel_specs": jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
            "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
            "energy_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
            "stop_token_targets": jnp.zeros((B, T), jnp.float32),
            "mel_lengths": jnp.full((B,), T, jnp.int32),
            "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        }
        key = jax.random.PRNGKey(0)
        try:
            t0 = time.perf_counter()
            if params is None:
                params = init_params(model, key, batch)
            optimizer = build_optimizer(config, params, total_steps=20000)
            state = create_train_state(
                model, config, optimizer, key, batch, params=params
            )
            preclips = build_preclip_tree(params, config)
            step = jax.jit(
                make_multi_step(
                    make_train_step(model, config, optimizer, preclips, 0.999), K
                ),
                donate_argnums=(0,),
            )
            batches = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
            )
            for i in range(2):  # compile + layout settle
                state, metrics = step(state, batches, jax.random.PRNGKey(i + 100))
            _ = float(metrics["total"][-1])
            t_compile = time.perf_counter() - t0
            times = []
            for i in range(4):
                t0 = time.perf_counter()
                state, metrics = step(state, batches, jax.random.fold_in(key, i))
                _ = float(metrics["total"][-1])  # true barrier
                times.append(time.perf_counter() - t0)
            best = min(times)
            fps = B * T * K / best
            results.append(
                {
                    "B": B, "T": T, "L": L,
                    "step_ms": round(best / K * 1e3, 1),
                    "padded_frames_per_sec": round(fps, 0),
                    "compile_s": round(t_compile, 1),
                }
            )
            log(f"B={B:3d} T={T:5d}: {best / K * 1e3:7.1f} ms/step  "
                f"{fps / 1e3:8.1f}k frames/s  (compile {t_compile:.0f}s)")
            del state, step, batches
        except Exception as err:
            results.append({"B": B, "T": T, "L": L, "error": str(err)[:200]})
            log(f"B={B:3d} T={T:5d}: FAILED {err}")
    print(json.dumps(results, ensure_ascii=False))


if __name__ == "__main__":
    main()
