#!/usr/bin/env python3
"""Roofline profile of the flagship train step on the real chip.

Uses XLA's own compiled cost model (``compiled.cost_analysis()``: exact HLO
flop / byte counts) plus measured wall time (value-fetch barrier) to place
the step on the v5e roofline: achieved model-TFLOP/s vs the 197 TFLOP/s
bf16 MXU peak, and achieved HBM GB/s vs the ~819 GB/s pin bandwidth.  Also
lowers a forward-only (loss, no grad) program for the fwd/bwd split, and
prints the compiled peak-HBM footprint.

Interpretation guide (docs/PERFORMANCE.md "Speed of light"):
* flops/time near peak        -> compute-bound: only algorithmic changes help
* bytes/time near peak        -> bandwidth-bound: fuse more, shrink dtypes
* neither near peak           -> latency/occupancy-bound: bigger batch, fewer
                                 kernels, check for serializing reductions

Shapes default to the bench compute phase (B32 x L96 x T512, K=4 scan
steps) so every program is a persistent-cache hit after a bench run.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0  # per chip, public TPU v5e spec
V5E_HBM_GBPS = 819.0


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
    B, L, T, K = 32, 96, 512, 4
    if "--shape" in sys.argv:
        B, L, T, K = (int(x) for x in sys.argv[sys.argv.index("--shape") + 1].split("x"))

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

    rng = np.random.default_rng(0)
    batch = {
        "phoneme_indices": jnp.asarray(rng.integers(1, VOCAB, size=(B, L)), jnp.int32),
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
    params = init_params(model, key, batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    optimizer = build_optimizer(config, params, total_steps=20000)
    state = create_train_state(model, config, optimizer, key, batch, params=params)
    preclips = build_preclip_tree(params, config)

    step = jax.jit(
        make_multi_step(make_train_step(model, config, optimizer, preclips, 0.999), K),
        donate_argnums=(0,),
    )
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch
    )

    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    # --- compiled cost model ---
    compiled = step.lower(state, batches, key).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    mem = compiled.memory_analysis()
    log(f"cost_analysis: {flops/1e12:.3f} TFLOP, {bytes_accessed/1e9:.2f} GB "
        f"accessed per {K}-step dispatch; params {n_params/1e6:.1f}M")
    peak_hbm = None
    if mem is not None:
        peak_hbm = (
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
        )
        log(f"memory_analysis: args {getattr(mem, 'argument_size_in_bytes', 0)/1e9:.2f} GB, "
            f"temps {getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f} GB, "
            f"output {getattr(mem, 'output_size_in_bytes', 0)/1e9:.2f} GB")

    # --- measured time ---
    for i in range(2):
        state, metrics = step(state, batches, jax.random.PRNGKey(i + 100))
    _ = float(metrics["total"][-1])
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        state, metrics = step(state, batches, jax.random.fold_in(key, i))
        _ = float(metrics["total"][-1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    step_ms = best / K * 1e3
    fps = B * T * K / best
    tflops = flops / best / 1e12
    gbps = bytes_accessed / best / 1e9
    log(f"measured: {step_ms:.1f} ms/step, {fps/1e3:.1f}k padded frames/s")
    log(f"roofline: {tflops:.1f} TFLOP/s = {100*tflops/V5E_BF16_PEAK_TFLOPS:.1f}% of "
        f"bf16 peak; {gbps:.0f} GB/s = {100*gbps/V5E_HBM_GBPS:.1f}% of HBM peak")

    # --- forward-only split ---
    from kokoro_tpu.training.train_step import make_loss_fn

    loss_fn = make_loss_fn(model, config)
    fwd = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
    cf = fwd.lower(state.params, batch, key).compile()
    caf = cf.cost_analysis()
    caf = caf[0] if isinstance(caf, (list, tuple)) else caf
    fwd_flops = float(caf.get("flops", 0.0))
    _ = float(fwd(state.params, batch, key))
    ftimes = []
    for i in range(6):
        t0 = time.perf_counter()
        v = fwd(state.params, batch, jax.random.fold_in(key, i))
        _ = float(v)
        ftimes.append(time.perf_counter() - t0)
    fbest = min(ftimes)
    log(f"forward-only: {fbest*1e3:.1f} ms, {fwd_flops/1e12:.3f} TFLOP "
        f"({fwd_flops/fbest/1e12:.1f} TFLOP/s); fwd+bwd/fwd flop ratio "
        f"{flops/K/max(fwd_flops,1):.2f}, time ratio {step_ms/1e3/fbest:.2f}")

    print(json.dumps({
        "shape": f"B{B}xL{L}xT{T}xK{K}",
        "step_ms": round(step_ms, 2),
        "padded_frames_per_sec": round(fps, 0),
        "dispatch_tflop": round(flops / 1e12, 3),
        "dispatch_gb": round(bytes_accessed / 1e9, 2),
        "achieved_tflops": round(tflops, 1),
        "mxu_util_pct": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "achieved_hbm_gbps": round(gbps, 0),
        "hbm_util_pct": round(100 * gbps / V5E_HBM_GBPS, 1),
        "peak_hbm_gb": round(peak_hbm / 1e9, 2) if peak_hbm else None,
        "fwd_ms": round(fbest * 1e3, 2),
        "fwd_tflop": round(fwd_flops / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
