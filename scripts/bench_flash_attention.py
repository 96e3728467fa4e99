#!/usr/bin/env python3
"""Flash-attention vs einsum attention at the flagship training shape
(VERDICT round-1 weak #10: 'make flash win at the flagship shapes or stop
carrying the complexity').

Benchmarks forward+backward through causal self-attention at
(B=16, H=8, T=896, Dh=64) in bf16, sweeping the pallas kernel's block sizes,
with value-fetch barriers (block_until_ready is unreliable on this host's
transport).

Usage: python scripts/bench_flash_attention.py [--T 896] [--B 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def einsum_attention(q, k, v, *, causal=True):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        T = q.shape[2]
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask[None, None], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def flash_attention_with_blocks(q, k, v, *, block_q, block_k, causal=True):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    bs = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_k_dkv=block_k, block_q_dkv=block_q,
        block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
    )
    return flash_attention(
        q, k, v, causal=causal, sm_scale=1.0 / np.sqrt(q.shape[-1]),
        block_sizes=bs,
    )


def bench_fn(fn, q, k, v, n=6):
    def loss(q):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    out = g(q)
    _ = float(out[0, 0, 0, 0])  # warmup + barrier
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = g(q)
        _ = float(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--H", type=int, default=8)
    p.add_argument("--T", type=int, default=896)
    p.add_argument("--D", type=int, default=64)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    shape = (args.B, args.H, args.T, args.D)
    q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

    t_e = bench_fn(einsum_attention, q, k, v)
    print(f"einsum: {t_e * 1e3:8.2f} ms  (fwd+bwd, causal, "
          f"B{args.B} H{args.H} T{args.T} D{args.D})", flush=True)

    best = (None, np.inf)
    for bq in (128, 256, 448):
        for bk in (128, 256, 448):
            if args.T % bq or args.T % bk:
                continue
            try:
                t = bench_fn(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention_with_blocks(
                        q, k, v, block_q=bq, block_k=bk
                    ),
                    q, k, v,
                )
            except Exception as err:
                print(f"flash bq={bq} bk={bk}: failed ({err})", flush=True)
                continue
            flag = " <-- faster than einsum" if t < t_e else ""
            print(f"flash bq={bq:4d} bk={bk:4d}: {t * 1e3:8.2f} ms{flag}",
                  flush=True)
            if t < best[1]:
                best = ((bq, bk), t)
    if best[0]:
        print(f"best flash {best[0]}: {best[1] * 1e3:.2f} ms vs "
              f"einsum {t_e * 1e3:.2f} ms -> "
              f"{'FLASH WINS' if best[1] < t_e else 'EINSUM WINS'} "
              f"({t_e / best[1]:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
