"""Profiling tools: device traces, step timing, memory stats, interbatch
phases.

TPU equivalents of the reference's four profiling mechanisms (SURVEY.md §5.1):

* torch.profiler + tensorboard_trace_handler (reference trainer.py:200,
  1027-1061) -> ``jax.profiler`` traces viewable in TensorBoard/Perfetto,
* ``GPUProfiler`` per-stage memory logging (reference utils/gpu_profiler.py)
  -> ``DeviceProfiler`` reading PJRT ``memory_stats()``,
* ``InterbatchProfiler`` wall-clock phase stats (reference
  utils/interbatch_profiler.py:7-211) -> same API,
* standalone step profiler (reference trainer.py:3509, utils/profiling_tools.py)
  -> ``profile_step_fn`` with ``block_until_ready`` timing.

The reference's AMP A/B profiler (trainer.py:3442-3507) has no TPU analogue:
bf16 is a dtype policy, not an autocast mode — ``compare_dtype_policies``
benchmarks bf16-vs-fp32 step time instead, preserving the "profile then
decide" workflow.
"""

from __future__ import annotations

import contextlib
import logging
import statistics
import time
from pathlib import Path
from typing import Callable, Dict, List

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace into ``logdir`` (TensorBoard 'profile' plugin /
    Perfetto)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DeviceProfiler:
    """Per-stage device memory logging (reference gpu_profiler.py:70-130)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: List[Dict] = []

    @staticmethod
    def memory_stats() -> Dict[str, float]:
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
        }

    def log_stage(self, name: str) -> None:
        if not self.enabled:
            return
        stats = self.memory_stats()
        self.stages.append({"stage": name, **stats})
        logger.info(
            "[mem] %s: %.1f MB in use (peak %.1f MB)",
            name, stats["bytes_in_use"] / 1e6, stats["peak_bytes_in_use"] / 1e6,
        )

    def summary(self) -> str:
        if not self.stages:
            return "no stages recorded"
        peak = max(s["peak_bytes_in_use"] for s in self.stages)
        return f"{len(self.stages)} stages, peak {peak / 1e6:.1f} MB"


class InterbatchProfiler:
    """Wall-clock phase profiler: interbatch / data-load / step
    (reference interbatch_profiler.py:32-211)."""

    def __init__(self, report_interval: int = 100):
        self.report_interval = report_interval
        self.phases: Dict[str, List[float]] = {}
        self._marks: Dict[str, float] = {}
        self._count = 0

    def start(self, phase: str) -> None:
        self._marks[phase] = time.perf_counter()

    def end(self, phase: str) -> None:
        t0 = self._marks.pop(phase, None)
        if t0 is None:
            return
        self.phases.setdefault(phase, []).append(time.perf_counter() - t0)
        if phase == "step":
            self._count += 1
            if self.report_interval and self._count % self.report_interval == 0:
                logger.info(self.report())

    def report(self) -> str:
        lines = []
        for phase, times in sorted(self.phases.items()):
            if not times:
                continue
            lines.append(
                f"{phase}: mean {statistics.mean(times)*1e3:.1f}ms "
                f"median {statistics.median(times)*1e3:.1f}ms "
                f"n={len(times)}"
            )
        return "interbatch profile: " + "; ".join(lines)

    def throughput(self, items_per_step: float) -> float:
        steps = self.phases.get("step", [])
        total = sum(steps)
        return len(steps) * items_per_step / total if total else 0.0


def profile_step_fn(
    step_fn: Callable, args: tuple, n_steps: int = 10, warmup: int = 2
) -> Dict[str, float]:
    """Time a jitted step with proper device synchronization
    (reference trainer.py:3509 standalone profiler)."""
    out = None
    for _ in range(warmup):
        out = step_fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        out = step_fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": statistics.mean(times),
        "median_s": statistics.median(times),
        "min_s": min(times),
        "max_s": max(times),
        "steps_per_s": 1.0 / statistics.mean(times),
    }


def profile_dtype_for_config(config, n_steps: int = 5) -> str:
    """Pre-train bf16-vs-fp32 A/B on the configured model; returns the faster
    compute dtype (the reference's --profile-amp workflow,
    reference cli/training.py:49-73, trainer.py:3442-3507)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
    from kokoro_tpu.training.train_step import (
        create_train_state,
        init_params,
        make_train_step,
    )

    B, L, T = 8, 64, 512
    rng = np.random.default_rng(0)
    batch = {
        "phoneme_indices": jnp.asarray(rng.integers(1, 60, (B, L)), jnp.int32),
        "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32),
        "phoneme_durations": jnp.asarray(np.full((B, L), T // L, np.int32)),
        "mel_specs": jnp.asarray(
            rng.normal(size=(B, T, config.n_mels)).astype(np.float32)
        ),
        "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "energy_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "stop_token_targets": jnp.zeros((B, T), jnp.float32),
        "mel_lengths": jnp.full((B,), T, jnp.int32),
        "phoneme_lengths": jnp.full((B,), L, jnp.int32),
    }

    def make_step(dtype_str: str):
        cfg = dataclasses.replace(config, compute_dtype=dtype_str)
        model = KokoroModel(
            vocab_size=64,
            n_mels=cfg.n_mels,
            hidden_dim=cfg.hidden_dim,
            n_encoder_layers=cfg.n_encoder_layers,
            n_decoder_layers=cfg.n_decoder_layers,
            n_heads=cfg.n_heads,
            encoder_ff_dim=cfg.encoder_ff_dim,
            decoder_ff_dim=cfg.decoder_ff_dim,
            qk_norm=cfg.qk_norm,
            gradient_checkpointing=False,
            use_stochastic_depth=False,
            dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_str],
        )
        key = jax.random.PRNGKey(0)
        params = init_params(model, key, batch)
        opt = build_optimizer(cfg, params, 1000)
        state = create_train_state(model, cfg, opt, key, batch, params=params)
        step = jax.jit(
            make_train_step(model, cfg, opt, build_preclip_tree(params, cfg), 0.999)
        )

        def run(s=state):
            new_state, metrics = step(s, batch, key)
            _ = float(metrics["total"])  # value fetch = true device barrier
            return new_state

        return run, ()

    results = compare_dtype_policies(make_step, n_steps=n_steps)
    return (
        "bfloat16" if results["speedup_bf16"]["value"] >= 1.0 else "float32"
    )


def compare_dtype_policies(
    make_step: Callable[[str], tuple], n_steps: int = 10
) -> Dict[str, Dict[str, float]]:
    """bf16-vs-fp32 A/B (replaces the reference's AMP A/B profiler,
    trainer.py:3442-3507).  ``make_step(dtype)`` -> (step_fn, args)."""
    results = {}
    for dtype in ("bfloat16", "float32"):
        step_fn, args = make_step(dtype)
        results[dtype] = profile_step_fn(step_fn, args, n_steps)
    speedup = results["float32"]["mean_s"] / results["bfloat16"]["mean_s"]
    logger.info("bf16 speedup vs fp32: %.2fx", speedup)
    results["speedup_bf16"] = {"value": speedup}
    return results
