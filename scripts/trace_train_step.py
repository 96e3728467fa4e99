#!/usr/bin/env python3
"""Fusion-level device trace of the flagship train step (VERDICT r4 #1).

Captures a REAL ``jax.profiler`` device trace of one multi-step dispatch at
the bench shape, then aggregates the TPU-side "XLA Ops" events: per-fusion
device time, achieved HBM bandwidth (the trace's own ``bytes_accessed`` /
measured duration), and distance from the v5e roofline.  This replaces the
r4 roofline's program-level cost-model numbers with per-fusion evidence:
for each top fusion the output states whether it is within ~10% of its
bandwidth bound or leaves schedulable headroom.

Writes ``--out`` (default docs/trace_train_step_r5.json) with the top-N
fusions and prints a table to stderr.

Usage:
    python scripts/trace_train_step.py [--shape 32x96x512x4] [--top 25]
    python scripts/trace_train_step.py --deterministic   # dropout off
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def build_step(B, L, T, K, deterministic=False, overrides=None):
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.config import get_high_performance_config
    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
    from kokoro_tpu.training.train_step import (
        create_train_state,
        init_params,
        make_multi_step,
        make_train_step,
    )

    config = get_high_performance_config(**(overrides or {}))
    if config.prng_impl:
        # The trainer applies this at setup (trainer.py); the trace must match
        # the program the bench actually runs — threefry vs rbg changes the
        # fusion profile materially (scripts/bench_prng_ab.py: 120 -> 89 ms).
        jax.config.update("jax_default_prng_impl", config.prng_impl)
    VOCAB, M = 128, config.n_mels
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
    return step, state, batches, key


# Container HLOs whose duration covers their children (the K-step scan's
# while wraps the entire step body) — excluded from leaf aggregation.
_CONTAINERS = {"while", "conditional", "call"}


def _signature(name: str) -> str:
    """Group the same logical fusion across layers/steps: strip HLO ids."""
    import re

    return re.sub(r"\.\d+", "", name)


def parse_trace(trace_dir: Path):
    """Aggregate TPU-side XLA Ops leaf events from the newest trace."""
    files = sorted(
        glob.glob(str(trace_dir / "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    d = json.loads(gzip.open(files[-1]).read())
    ev = d["traceEvents"]
    pname, tname = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e["name"] == "process_name":
                pname[e["pid"]] = e["args"]["name"]
            elif e["name"] == "thread_name":
                tname[(e["pid"], e["tid"])] = e["args"]["name"]
    tpu_pids = {p for p, n in pname.items() if "TPU" in n}
    ops = collections.defaultdict(
        lambda: dict(us=0.0, count=0, bytes=0, flops=0, long="", names=set())
    )
    cats = collections.defaultdict(lambda: dict(us=0.0, count=0, bytes=0, flops=0))
    module_us = 0.0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        thread = tname.get((e["pid"], e["tid"]), "")
        if thread == "XLA Modules":
            module_us += e["dur"]
            continue
        if thread != "XLA Ops":
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category", "")
        if cat in _CONTAINERS:
            continue
        nbytes = int(args.get("bytes_accessed", 0) or 0)
        flops = int(args.get("model_flops", 0) or 0)
        o = ops[_signature(e["name"])]
        o["us"] += e["dur"]
        o["count"] += 1
        o["bytes"] += nbytes
        o["flops"] += flops
        o["names"].add(e["name"])
        if not o["long"]:
            o["long"] = args.get("long_name", "")[:400]
        o["category"] = cat
        c = cats[cat]
        c["us"] += e["dur"]
        c["count"] += 1
        c["bytes"] += nbytes
        c["flops"] += flops
    return ops, cats, module_us, files[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="32x96x512x4")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--deterministic", action="store_true",
                    help="trace the dropout-free step")
    ap.add_argument("--trace-dir", default="/tmp/trace_train_step")
    ap.add_argument("--out", default=str(REPO / "docs/trace_train_step_r5.json"))
    ap.add_argument("--parse-only", action="store_true",
                    help="re-analyze the newest existing trace (no TPU run)")
    args = ap.parse_args()
    B, L, T, K = (int(x) for x in args.shape.split("x"))

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    wall_ms = 0.0
    if not args.parse_only:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

        step, state, batches, key = build_step(B, L, T, K, args.deterministic)
        # warm up: compile + settle layouts (value fetch = true barrier)
        for i in range(2):
            state, metrics = step(state, batches, jax.random.PRNGKey(100 + i))
        _ = float(metrics["total"][-1])
        t0 = time.perf_counter()
        state, metrics = step(state, batches, jax.random.PRNGKey(7))
        _ = float(metrics["total"][-1])
        wall_ms = (time.perf_counter() - t0) * 1e3
        log(f"warm dispatch: {wall_ms:.1f} ms wall ({wall_ms/K:.1f} ms/step incl. RTT)")

        jax.profiler.start_trace(args.trace_dir)
        state, metrics = step(state, batches, jax.random.PRNGKey(8))
        _ = float(metrics["total"][-1])
        jax.profiler.stop_trace()

    ops, cats, module_us, trace_file = parse_trace(Path(args.trace_dir))
    total_us = sum(o["us"] for o in ops.values())

    def mk_row(name, o):
        gbps = (o["bytes"] / 1e9) / (o["us"] / 1e6) if o["us"] else 0.0
        tflops = (o["flops"] / 1e12) / (o["us"] / 1e6) if o["us"] else 0.0
        return {
            "op": name,
            "category": o.get("category", ""),
            "device_ms": round(o["us"] / 1e3, 3),
            "pct_of_step": round(100 * o["us"] / max(total_us, 1e-9), 1),
            "count": o["count"],
            "bytes_gb": round(o["bytes"] / 1e9, 3),
            "achieved_gbps": round(gbps, 0),
            "pct_of_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
            "achieved_tflops": round(tflops, 1),
            "pct_of_mxu_peak": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
            "hlo": o.get("long", "")[:200],
        }

    rows = [mk_row(n, o) for n, o in sorted(ops.items(), key=lambda kv: -kv[1]["us"])]
    cat_rows = [
        dict(mk_row(n, dict(o, long="")), hlo="")
        for n, o in sorted(cats.items(), key=lambda kv: -kv[1]["us"])
    ]
    log(f"\nleaf device total {total_us/1e3:.1f} ms over {K} steps "
        f"({total_us/1e3/K:.2f} ms/step); module span {module_us/1e3:.1f} ms")
    log(f"{'ms':>8} {'%step':>6} {'n':>5} {'GB/s':>6} {'%hbm':>6} {'%mxu':>6}  category")
    for r in cat_rows:
        log(f"{r['device_ms']:8.2f} {r['pct_of_step']:6.1f} {r['count']:5d} "
            f"{r['achieved_gbps']:6.0f} {r['pct_of_hbm_peak']:6.1f} "
            f"{r['pct_of_mxu_peak']:6.1f}  {r['op']}")
    log(f"\n{'ms':>8} {'%step':>6} {'n':>5} {'GB/s':>6} {'%hbm':>6} {'%mxu':>6}  fusion signature")
    for r in rows[: args.top]:
        log(f"{r['device_ms']:8.2f} {r['pct_of_step']:6.1f} {r['count']:5d} "
            f"{r['achieved_gbps']:6.0f} {r['pct_of_hbm_peak']:6.1f} "
            f"{r['pct_of_mxu_peak']:6.1f}  {r['op'][:46]} [{r['category']}]")

    payload = {
        "shape": f"B{B}xL{L}xT{T}xK{K}",
        "deterministic": args.deterministic,
        "wall_ms_per_dispatch": round(wall_ms, 1),
        "device_ms_per_step": round(total_us / 1e3 / K, 2),
        "device_total_ms": round(total_us / 1e3, 2),
        "module_span_ms": round(module_us / 1e3, 2),
        "trace_file": trace_file,
        "hbm_peak_gbps": V5E_HBM_GBPS,
        "mxu_peak_tflops": V5E_BF16_PEAK_TFLOPS,
        "categories": cat_rows,
        "top_ops": rows[: args.top],
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: payload[k] for k in
                      ("shape", "device_ms_per_step", "wall_ms_per_dispatch")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
