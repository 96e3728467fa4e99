#!/usr/bin/env python3
"""A/B the train step's PRNG configuration on the real TPU.

The r5 device trace (/tmp/trace_r5_fused.json) shows ~42% of device step
time in thousands of tiny u32[1] kLoop fusions rooted at %rng ops — the
threefry key-derivation chains (flax ``make_rng`` -> fold_in/split) behind
every dropout call, ~450 scalar fusions per step that serialize the device.
This script measures the compute-only bench step under:

  A. default threefry                     (baseline)
  B. jax_threefry_partitionable=True      (vectorizable key math)
  C. jax_default_prng_impl=rbg            (cheap split, hardware RNG bits)

Usage: python scripts/bench_prng_ab.py [--variant A|B|C] [--k 16]
Each variant runs in a separate process (PRNG impl is a global config).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_variant(k: int) -> float:
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
    B, L, T, M = 32, 96, 512, config.n_mels
    model = KokoroModel(
        vocab_size=128, n_mels=M, hidden_dim=config.hidden_dim,
        n_encoder_layers=config.n_encoder_layers,
        n_decoder_layers=config.n_decoder_layers, n_heads=config.n_heads,
        encoder_ff_dim=config.encoder_ff_dim,
        decoder_ff_dim=config.decoder_ff_dim, qk_norm=config.qk_norm,
        ffn_output_norm=config.ffn_output_norm,
        use_stochastic_depth=config.use_stochastic_depth,
        stochastic_depth_rate=config.stochastic_depth_rate,
        gradient_checkpointing=config.gradient_checkpointing,
        use_flash_attention=config.use_flash_attention,
        attention_weight_dropout=config.attention_weight_dropout,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    rng = __import__("numpy").random.default_rng(0)
    np = __import__("numpy")
    batch = {
        "phoneme_indices": jnp.asarray(rng.integers(1, 128, (B, L)), jnp.int32),
        "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        "mel_specs": jnp.asarray(rng.normal(size=(B, T, M)), jnp.float32),
        "mel_lengths": jnp.full((B,), T, jnp.int32),
        "phoneme_durations": jnp.full((B, L), T // L, jnp.float32),
        "stop_token_targets": jnp.zeros((B, T), jnp.float32),
        "pitch_targets": jnp.asarray(rng.uniform(0, 1, (B, T)), jnp.float32),
        "energy_targets": jnp.asarray(rng.uniform(0, 1, (B, T)), jnp.float32),
        "stress_indices": jnp.zeros((B, L), jnp.int32),
    }
    params = init_params(model, key, batch)
    optimizer = build_optimizer(config, params, total_steps=20000)
    state = create_train_state(model, config, optimizer, key, batch, params=params)
    preclips = build_preclip_tree(params, config)
    step = jax.jit(
        make_multi_step(
            make_train_step(model, config, optimizer, preclips, ema_decay=0.999), k
        ),
        donate_argnums=(0,),
    )
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch
    )
    for i in range(2):
        state, metrics = step(state, batches, jax.random.PRNGKey(i + 100))
    _ = float(metrics["total"][-1])
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step(state, batches, jax.random.fold_in(key, i))
        _ = float(metrics["total"][-1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = B * T * k / best
    print(f"RESULT frames_per_sec={fps:.0f} best_s={best:.3f} "
          f"ms_per_step={1000*best/k:.1f}")
    return fps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=("A", "B", "C"))
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()
    if args.variant:
        if args.variant == "B":
            import jax
            jax.config.update("jax_threefry_partitionable", True)
        elif args.variant == "C":
            import jax
            jax.config.update("jax_default_prng_impl", "rbg")
        run_variant(args.k)
        return 0
    for v in ("A", "B", "C"):
        print(f"--- variant {v} ---", flush=True)
        subprocess.run(
            [sys.executable, __file__, "--variant", v, "--k", str(args.k)],
            check=False, env=os.environ,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
