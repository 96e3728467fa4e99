"""Config-surface integrity + the schedule/stability knobs wired in round 2.

Covers the VERDICT round-1 "dead config fields" findings: every TrainingConfig
field must have a consumer, and the newly wired behaviors (legacy
CosineAnnealingWarmRestarts, ema_update_every, checkpoint_segments,
max_sequence_dim_cap, stabilization thresholds) must be observable.
"""

import dataclasses
import math
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.config import TrainingConfig, get_smoke_test_config

REPO = Path(__file__).resolve().parents[2]


# ----------------------------------------------------------------------
# Every config field has a consumer (VERDICT weak #3: "a flag with no
# behavior is fake coverage")
# ----------------------------------------------------------------------
class TestConfigConsumers:
    def test_every_field_is_consumed_somewhere(self):
        fields = [f.name for f in dataclasses.fields(TrainingConfig)]
        corpus = ""
        for p in (REPO / "kokoro_tpu").rglob("*.py"):
            if p.name == "config.py":
                continue
            corpus += p.read_text()
        for name in ("bench.py", "__graft_entry__.py", "bench_inference.py"):
            corpus += (REPO / name).read_text()
        dead = [f for f in fields if not re.search(r"\b%s\b" % f, corpus)]
        assert dead == [], f"config fields with no consumer: {dead}"

    def test_json_round_trip_preserves_new_fields(self, tmp_path):
        cfg = TrainingConfig(
            lr_T_0=7, lr_T_mult=3, lr_eta_min=2e-6, ema_update_every=4,
            stabilization_soft_frames=1200, stabilization_max_duration=120,
            max_sequence_dim_cap=1500, checkpoint_segments=3,
        )
        path = tmp_path / "cfg.json"
        cfg.save_json(path)
        back = TrainingConfig.load_json(path)
        assert back == cfg


# ----------------------------------------------------------------------
# Legacy CosineAnnealingWarmRestarts (use_onecycle_lr=False)
# ----------------------------------------------------------------------
class TestWarmRestartsSchedule:
    def _sched(self, **kw):
        from kokoro_tpu.training.optimizer import make_group_schedule

        cfg = TrainingConfig(use_onecycle_lr=False, num_epochs=100, **kw)
        total = 100 * 10  # 10 steps/epoch
        return cfg, make_group_schedule(cfg, total, "decoder_other")

    def test_matches_torch_cosine_annealing_warm_restarts(self):
        """Numerical parity with torch.optim.lr_scheduler.CosineAnnealingWarmRestarts
        (reference trainer.py:779-790, stepped per epoch)."""
        import torch

        cfg, sched = self._sched(learning_rate=1e-3, lr_T_0=20, lr_T_mult=2,
                                 lr_eta_min=1e-6)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        ts = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=20, T_mult=2, eta_min=1e-6
        )
        for epoch in range(60):
            want = opt.param_groups[0]["lr"]
            got = float(sched(epoch * 10))  # first step of the epoch
            assert got == pytest.approx(want, rel=1e-5), f"epoch {epoch}"
            ts.step()

    def test_warm_restarts_constant_within_epoch(self):
        """The reference steps CosineAnnealingWarmRestarts once per EPOCH
        (scheduler_per_batch=False) — the LR must be piecewise-constant
        across the steps of one epoch, not a continuous fraction."""
        cfg, sched = self._sched(learning_rate=1e-3, lr_T_0=20, lr_T_mult=2,
                                 lr_eta_min=1e-6)
        for epoch in (0, 3, 19, 20, 45):
            first = float(sched(epoch * 10))
            for step_in_epoch in (1, 5, 9):
                assert float(sched(epoch * 10 + step_in_epoch)) == pytest.approx(
                    first, rel=1e-7
                ), f"LR moved mid-epoch {epoch}"

    def test_warm_restarts_mid_epoch_matches_torch(self):
        """Mid-epoch steps must hold the value torch reports for that epoch."""
        import torch

        cfg, sched = self._sched(learning_rate=1e-3, lr_T_0=5, lr_T_mult=1,
                                 lr_eta_min=0.0)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        ts = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=5, T_mult=1, eta_min=0.0
        )
        for epoch in range(12):
            want = opt.param_groups[0]["lr"]
            got = float(sched(epoch * 10 + 7))  # mid-epoch step
            assert got == pytest.approx(want, rel=1e-5), f"epoch {epoch}"
            ts.step()

    def test_t_mult_one_is_periodic(self):
        cfg, sched = self._sched(learning_rate=1e-3, lr_T_0=10, lr_T_mult=1)
        # epoch 0 and epoch 10 (one full cycle) both sit at the peak
        assert float(sched(0)) == pytest.approx(1e-3, rel=1e-6)
        assert float(sched(10 * 10)) == pytest.approx(1e-3, rel=1e-6)
        # mid-cycle is the floor-adjacent midpoint
        mid = float(sched(5 * 10))
        assert mid == pytest.approx((1e-3 + 1e-6) / 2, rel=1e-4)

    def test_group_multiplier_applies_in_legacy_mode(self):
        from kokoro_tpu.training.optimizer import make_group_schedule

        cfg = TrainingConfig(
            use_onecycle_lr=False, num_epochs=10, learning_rate=1e-3,
            stop_head_lr_multiplier=0.1,
        )
        s = make_group_schedule(cfg, 100, "stop_head")
        assert float(s(0)) == pytest.approx(1e-4, rel=1e-5)

    def test_onecycle_still_default(self):
        from kokoro_tpu.training.optimizer import make_group_schedule

        cfg = TrainingConfig(num_epochs=10, learning_rate=1e-3, warmup_steps=10)
        s = make_group_schedule(cfg, 100, "decoder_other")
        # linear warmup from warmup_start_lr_ratio * base
        assert float(s(0)) == pytest.approx(1e-5, rel=1e-4)


# ----------------------------------------------------------------------
# ema_update_every gating inside the train step
# ----------------------------------------------------------------------
class TestEmaUpdateEvery:
    @pytest.fixture(scope="class")
    def tiny(self):
        from kokoro_tpu.models.kokoro import KokoroModel
        from kokoro_tpu.training.optimizer import build_optimizer
        from kokoro_tpu.training.train_step import (
            create_train_state,
            init_params,
            make_train_step,
        )

        cfg = get_smoke_test_config(ema_update_every=2, warmup_steps=1)
        model = KokoroModel(
            vocab_size=32, n_mels=cfg.n_mels, hidden_dim=cfg.hidden_dim,
            n_encoder_layers=1, n_decoder_layers=1, n_heads=cfg.n_heads,
            encoder_ff_dim=cfg.encoder_ff_dim, decoder_ff_dim=cfg.decoder_ff_dim,
            variance_filter_size=cfg.variance_filter_size,
            gradient_checkpointing=False, use_stochastic_depth=False,
        )
        B, L, T = 2, 8, 32
        rng = np.random.default_rng(0)
        batch = {
            "phoneme_indices": jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32),
            "phoneme_durations": jnp.full((B, L), T // L, jnp.int32),
            "mel_specs": jnp.asarray(rng.normal(size=(B, T, cfg.n_mels)), jnp.float32),
            "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "energy_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "stop_token_targets": jnp.zeros((B, T), jnp.float32),
            "mel_lengths": jnp.full((B,), T, jnp.int32),
            "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        }
        key = jax.random.PRNGKey(0)
        params = init_params(model, key, batch)
        opt = build_optimizer(cfg, params, 100)
        state = create_train_state(model, cfg, opt, key, batch, params=params)
        step = jax.jit(make_train_step(model, cfg, opt, None, 0.5))
        return state, step, batch

    def test_ema_updates_every_other_step(self, tiny):
        state, step, batch = tiny
        key = jax.random.PRNGKey(1)
        # step 1: opt_step 0 -> 1; (0+1) % 2 != 0 -> no EMA update
        s1, _ = step(state, batch, key)
        assert int(s1.opt_step) == 1
        assert int(s1.ema_updates) == 0
        leaf0 = jax.tree_util.tree_leaves(state.ema_params)[0]
        leaf1 = jax.tree_util.tree_leaves(s1.ema_params)[0]
        np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
        # step 2: opt_step 1 -> 2; (1+1) % 2 == 0 -> EMA updates
        s2, _ = step(s1, batch, key)
        assert int(s2.opt_step) == 2
        assert int(s2.ema_updates) == 1
        leaf2 = jax.tree_util.tree_leaves(s2.ema_params)[0]
        assert not np.array_equal(np.asarray(leaf1), np.asarray(leaf2))


# ----------------------------------------------------------------------
# Adaptive stabilization consumes the config thresholds
# ----------------------------------------------------------------------
class TestStabilizationThresholds:
    def _batch(self, mel_len, max_dur):
        return {
            "mel_lengths": jnp.asarray([mel_len], jnp.int32),
            "phoneme_durations": jnp.asarray([[max_dur]], jnp.int32),
        }

    def test_below_threshold_is_identity(self):
        from kokoro_tpu.training.train_step import adaptive_stabilization

        cfg = TrainingConfig(stabilization_soft_frames=1400,
                             stabilization_max_duration=150)
        scale, clip = adaptive_stabilization(self._batch(1000, 100), cfg)
        assert float(scale) == 1.0
        assert float(clip) == cfg.max_grad_norm

    def test_above_threshold_scales_by_config_ratio(self):
        from kokoro_tpu.training.train_step import adaptive_stabilization

        cfg = TrainingConfig(stabilization_soft_frames=700,
                             stabilization_max_duration=150)
        # 1400 frames at threshold 700 -> risk 2.0 (reference trainer.py:2240-2242)
        scale, clip = adaptive_stabilization(self._batch(1400, 100), cfg)
        assert float(scale) == pytest.approx(0.5)
        assert float(clip) == pytest.approx(0.5 / math.sqrt(2.0))

    def test_duration_risk_uses_config_cap(self):
        from kokoro_tpu.training.train_step import adaptive_stabilization

        cfg = TrainingConfig(stabilization_max_duration=50)
        scale, _ = adaptive_stabilization(self._batch(100, 100), cfg)
        assert float(scale) == pytest.approx(0.5)  # risk = 100/50 = 2


# ----------------------------------------------------------------------
# max_sequence_dim_cap in collate
# ----------------------------------------------------------------------
class TestSequenceDimCap:
    def _feat(self, t, l, n_mels=80):
        return {
            "mel_spec": np.zeros((t, n_mels), np.float32),
            "phoneme_indices": np.ones(l, np.int32),
            "stress_indices": np.zeros(l, np.int32),
            "phoneme_durations": np.full(l, max(t // l, 1), np.int32),
            "pitch": np.zeros(t, np.float32),
            "energy": np.zeros(t, np.float32),
            "mel_length": t,
            "phoneme_length": l,
        }

    def test_cap_truncates_batch_dims(self):
        from kokoro_tpu.data.batching import collate

        cfg = TrainingConfig(
            max_sequence_dim_cap=100, mel_bucket_sizes=(64, 256),
            phoneme_bucket_sizes=(16, 64), max_seq_length=256,
        )
        batch = collate([self._feat(200, 20)], cfg)
        assert batch["mel_specs"].shape[1] == 100  # capped below the 256 bucket
        assert int(batch["mel_lengths"][0]) == 100

    def test_no_cap_when_under(self):
        from kokoro_tpu.data.batching import collate

        cfg = TrainingConfig(
            max_sequence_dim_cap=2000, mel_bucket_sizes=(64, 256),
            phoneme_bucket_sizes=(16, 64), max_seq_length=256,
        )
        batch = collate([self._feat(200, 20)], cfg)
        assert batch["mel_specs"].shape[1] == 256  # bucket, not cap


# ----------------------------------------------------------------------
# checkpoint_segments: segment remat preserves numerics and param structure
# ----------------------------------------------------------------------
class TestCheckpointSegments:
    def _model(self, segments, remat):
        from kokoro_tpu.models.kokoro import KokoroModel

        return KokoroModel(
            vocab_size=32, n_mels=20, hidden_dim=32, n_encoder_layers=4,
            n_decoder_layers=1, n_heads=4, encoder_ff_dim=64, decoder_ff_dim=64,
            variance_filter_size=16, gradient_checkpointing=remat,
            checkpoint_segments=segments, use_stochastic_depth=False,
        )

    def test_segment_remat_matches_no_remat(self):
        B, L, T = 2, 8, 16
        rng = np.random.default_rng(3)
        kwargs = dict(
            phoneme_indices=jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            mel_specs=jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32),
            phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
            deterministic=True,
        )
        m_plain = self._model(2, remat=False)
        m_seg = self._model(2, remat=True)
        params = m_plain.init(jax.random.PRNGKey(0), **kwargs)
        out_plain = m_plain.apply(params, **kwargs)
        out_seg = m_seg.apply(params, **kwargs)  # same param structure
        np.testing.assert_allclose(
            np.asarray(out_plain["predicted_mel"]),
            np.asarray(out_seg["predicted_mel"]), rtol=2e-5, atol=2e-5,
        )

    @pytest.mark.parametrize("segments", [1, 2, 4])
    def test_gradients_identical_across_segment_counts(self, segments):
        B, L, T = 2, 8, 16
        rng = np.random.default_rng(5)
        kwargs = dict(
            phoneme_indices=jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            mel_specs=jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32),
            phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
            deterministic=True,
        )
        ref_model = self._model(1, remat=False)
        params = ref_model.init(jax.random.PRNGKey(0), **kwargs)

        def loss(model):
            def f(p):
                return jnp.sum(model.apply(p, **kwargs)["predicted_mel"] ** 2)
            return jax.grad(f)(params)

        g_ref = loss(ref_model)
        g_seg = loss(self._model(segments, remat=True))
        ref_leaves = jax.tree_util.tree_leaves(g_ref)
        seg_leaves = jax.tree_util.tree_leaves(g_seg)
        for a, b in zip(ref_leaves, seg_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
