#!/usr/bin/env python3
"""Batched AR-decode scaling sweep: streams-vs-throughput on one chip.

The while_loop decode step is launch-overhead-bound at small B (measured
0.5 ms/frame at B=1, 0.23 ms/stream/frame at B=8); this sweep measures how
aggregate decode throughput scales with concurrent streams so serving
deployments can pick a batch size (docs/PERFORMANCE.md)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    sys.path.insert(0, "/root/repo")
    from kokoro_tpu.config import get_default_config
    from kokoro_tpu.models.generator import make_generate_fn
    from kokoro_tpu.models.kokoro import KokoroModel

    config = get_default_config()
    VOCAB, L, MAX_FRAMES = 128, 128, 1024
    model = KokoroModel(
        vocab_size=VOCAB, n_mels=config.n_mels, hidden_dim=config.hidden_dim,
        n_encoder_layers=config.n_encoder_layers,
        n_decoder_layers=config.n_decoder_layers, n_heads=config.n_heads,
        encoder_ff_dim=config.encoder_ff_dim,
        decoder_ff_dim=config.decoder_ff_dim, qk_norm=config.qk_norm,
        ffn_output_norm=config.ffn_output_norm, use_stochastic_depth=False,
        gradient_checkpointing=False, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.integers(1, VOCAB, (1, L)), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), phoneme_indices=p1,
        mel_specs=jnp.zeros((1, 64, config.n_mels)),
        phoneme_durations=jnp.ones((1, L), jnp.int32),
        stress_indices=jnp.zeros((1, L), jnp.int32), deterministic=True,
    )
    generate = make_generate_fn(model, MAX_FRAMES)
    kwargs = dict(stop_threshold=1.1, min_len_ratio=0.0,
                  min_len_floor=MAX_FRAMES - 1, max_len_cap=MAX_FRAMES)
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    results = []
    single_fps = None
    for B in (1, 8, 16, 32, 64):
        ph = jnp.asarray(rng.integers(1, VOCAB, (B, L)), jnp.int32)
        st = jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32)
        pad = jnp.zeros((B, L), bool)
        try:
            mel, length, _ = generate(params, ph, st, pad, **kwargs)
            _ = float(mel[0, 0, 0])
            times = []
            for r in range(3):
                t0 = time.perf_counter()
                mel, length, _ = generate(params, ph, st, pad, **kwargs)
                _ = float(mel[0, 0, 0])
                times.append(time.perf_counter() - t0)
            best = min(times)
            fps = B * MAX_FRAMES / best
            if single_fps is None:
                single_fps = fps
            results.append({
                "streams": B,
                "decode_s": round(best, 3),
                "frames_per_s": round(fps, 0),
                "ms_per_frame_per_stream": round(best / MAX_FRAMES * 1e3, 3),
                "throughput_vs_single": round(fps / single_fps, 2),
            })
            log(f"B={B:3d}: {best:.3f}s  {fps/1e3:7.1f}k frames/s  "
                f"x{fps/single_fps:.2f} vs single")
        except Exception as err:
            results.append({"streams": B, "error": str(err)[:160]})
            log(f"B={B}: FAILED {err}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
