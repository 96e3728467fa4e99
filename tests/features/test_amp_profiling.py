"""Feature pack: mixed-precision policy + profiling (the reference's
tests/features/test_amp_profiling.py exercises MPS autocast + its profiler;
the TPU-native analogue is the bf16 compute-dtype policy with f32 loss
reductions, plus DeviceProfiler/InterbatchProfiler —
kokoro_tpu/utils/profiling.py:46-118, kokoro_tpu/training/losses.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.training.train_step import init_params, make_loss_fn
from kokoro_tpu.utils.profiling import DeviceProfiler, InterbatchProfiler

VOCAB = 16


def tiny_model(dtype):
    return KokoroModel(
        vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=8, dtype=dtype,
        use_stochastic_depth=False, use_spec_augment=False,
    )


def batch(B=2, L=4, T=8, M=8):
    rng = np.random.default_rng(0)
    return {
        "phoneme_indices": jnp.asarray(rng.integers(1, VOCAB, (B, L)), jnp.int32),
        "stress_indices": jnp.zeros((B, L), jnp.int32),
        "phoneme_durations": jnp.full((B, L), 2, jnp.int32),
        "mel_specs": jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
        "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "energy_targets": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        "stop_token_targets": jnp.zeros((B, T), jnp.float32),
        "mel_lengths": jnp.full((B,), T, jnp.int32),
        "phoneme_lengths": jnp.full((B,), L, jnp.int32),
    }


class TestMixedPrecisionPolicy:
    def test_bf16_compute_keeps_f32_loss(self):
        """The AMP contract: half-precision compute, full-precision loss
        reduction (reference autocasts forward, keeps the loss fp32)."""
        cfg = get_smoke_test_config(compute_dtype="bfloat16")
        model = tiny_model(jnp.bfloat16)
        b = batch()
        params = init_params(model, jax.random.PRNGKey(0), b)
        loss_fn = make_loss_fn(model, cfg)
        loss, metrics = loss_fn(params, b, jax.random.PRNGKey(1),
                                deterministic=True)
        assert loss.dtype == jnp.float32
        assert jnp.isfinite(loss)

    def test_params_stay_f32_under_bf16_compute(self):
        """Master weights remain fp32 (the torch GradScaler analogue: only
        activations/matmuls run half precision)."""
        cfg = get_smoke_test_config(compute_dtype="bfloat16")
        model = tiny_model(jnp.bfloat16)
        params = init_params(model, jax.random.PRNGKey(0), batch())
        dtypes = {leaf.dtype for leaf in jax.tree_util.tree_leaves(params)}
        assert dtypes == {jnp.dtype(jnp.float32)}

    def test_bf16_and_f32_losses_agree_coarsely(self):
        """bf16 forward deviates from f32 by well under the loss scale —
        the go/no-go the reference's AMP feature test eyeballs."""
        b = batch()
        losses = {}
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            cfg = get_smoke_test_config(
                compute_dtype="float32" if dtype == jnp.float32 else "bfloat16")
            model = tiny_model(dtype)
            params = init_params(model, jax.random.PRNGKey(0), b)
            loss, _ = make_loss_fn(model, cfg)(
                params, b, jax.random.PRNGKey(1), deterministic=True)
            losses[name] = float(loss)
        rel = abs(losses["bf16"] - losses["f32"]) / abs(losses["f32"])
        assert rel < 0.05, losses


class TestDeviceProfiler:
    def test_stage_logging_and_summary(self):
        prof = DeviceProfiler(enabled=True)
        prof.log_stage("init")
        prof.log_stage("first_step")
        assert len(prof.stages) == 2
        assert {"stage", "bytes_in_use", "peak_bytes_in_use"} <= set(
            prof.stages[0])
        assert "2 stages" in prof.summary()

    def test_disabled_profiler_is_free(self):
        prof = DeviceProfiler(enabled=False)
        prof.log_stage("x")
        assert prof.stages == []
        assert prof.summary() == "no stages recorded"

    def test_memory_stats_keys(self):
        stats = DeviceProfiler.memory_stats()
        assert {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"} <= set(stats)


class TestInterbatchProfiler:
    def test_phase_accounting(self):
        prof = InterbatchProfiler(report_interval=0)
        for _ in range(3):
            prof.start("data")
            time.sleep(0.001)
            prof.end("data")
            prof.start("step")
            time.sleep(0.002)
            prof.end("step")
        rep = prof.report()
        assert "data" in rep and "step" in rep and "n=3" in rep

    def test_throughput_uses_step_phase_only(self):
        prof = InterbatchProfiler(report_interval=0)
        prof.start("step")
        time.sleep(0.01)
        prof.end("step")
        tp = prof.throughput(items_per_step=100)
        assert 0 < tp < 100 / 0.009

    def test_unmatched_end_is_ignored(self):
        prof = InterbatchProfiler()
        prof.end("never_started")
        assert prof.phases == {}

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
