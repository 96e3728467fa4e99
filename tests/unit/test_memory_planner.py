"""Static HBM planner (utils/memory_planner.py) — the ahead-of-time
TPU-native replacement for the reference's adaptive memory manager
(reference utils/adaptive_memory_manager.py) and advisor CLI (reference
utils/mps_optimizer.py); test intent mirrors the reference's
test_adaptive_memory_manager.py (threshold/recommendation behavior) recast
for static planning."""

from __future__ import annotations

import dataclasses
import logging

import pytest

from kokoro_tpu.config import (
    get_high_performance_config,
    get_smoke_test_config,
)
from kokoro_tpu.utils.memory_planner import (
    DEFAULT_HBM_BYTES,
    MemoryEstimate,
    _approx_params,
    count_params,
    estimate_train_step_hbm,
    live_hbm_bytes,
    max_batch_size,
    plan_buckets,
    recommend_settings,
)

GIB = 1024**3


@pytest.fixture(scope="module")
def hp_config():
    return get_high_performance_config()


@pytest.fixture(scope="module")
def n_params(hp_config):
    return count_params(hp_config, vocab_size=60)


class TestParamCount:
    def test_eval_shape_count_runs_without_device_work(self, n_params):
        # flagship model is ~35-50M params depending on vocab/positional tables
        assert 20_000_000 < n_params < 80_000_000

    def test_approx_within_factor_of_exact(self, hp_config, n_params):
        approx = _approx_params(hp_config)
        assert 0.5 < approx / n_params < 2.0

    def test_count_scales_with_layers(self, hp_config):
        small = dataclasses.replace(
            hp_config, n_encoder_layers=2, n_decoder_layers=2
        )
        assert count_params(small, 60) < count_params(hp_config, 60)


class TestSweepCalibration:
    """The measured round-3 shape sweep (docs/shape_sweep_r3.json) is the
    calibration anchor set: 15.75 GiB usable, high-performance preset."""

    @pytest.mark.parametrize(
        "B,T,L", [(16, 896, 128), (32, 896, 128), (16, 1280, 192), (32, 1280, 192)]
    )
    def test_measured_fitting_shapes_classified_fit(self, hp_config, n_params, B, T, L):
        est = estimate_train_step_hbm(hp_config, B, T, L, n_params=n_params)
        assert est.fits(DEFAULT_HBM_BYTES, margin=1.0), est.summary()

    def test_measured_oom_shape_classified_oom(self, hp_config, n_params):
        # B=64 x T=896: compiler reported 22.4 G > 15.75 G
        est = estimate_train_step_hbm(hp_config, 64, 896, 128, n_params=n_params)
        assert not est.fits(DEFAULT_HBM_BYTES, margin=1.0), est.summary()

    def test_boundary_shape_near_limit(self, hp_config, n_params):
        # B=64 x T=1280 (flash active) failed in the remote compiler; the
        # memory terms alone put it at ~87% of HBM — assert the planner at
        # least flags it as boundary (>80%), documented in the module.
        est = estimate_train_step_hbm(hp_config, 64, 1280, 192, n_params=n_params)
        assert est.total_bytes > 0.8 * DEFAULT_HBM_BYTES


class TestEstimateStructure:
    def test_monotonic_in_batch(self, hp_config, n_params):
        totals = [
            estimate_train_step_hbm(hp_config, b, 896, 128, n_params=n_params).total_bytes
            for b in (8, 16, 32, 64)
        ]
        assert totals == sorted(totals) and len(set(totals)) == 4

    def test_monotonic_in_frames_without_flash(self, hp_config, n_params):
        cfg = dataclasses.replace(hp_config, use_flash_attention=False)
        totals = [
            estimate_train_step_hbm(cfg, 16, t, 128, n_params=n_params).total_bytes
            for t in (256, 512, 896, 1280)
        ]
        assert totals == sorted(totals) and len(set(totals)) == 4

    def test_flash_removes_quadratic_terms_at_gate(self, hp_config, n_params):
        below = estimate_train_step_hbm(hp_config, 16, 896, 128, n_params=n_params)
        above = estimate_train_step_hbm(hp_config, 16, 1280, 128, n_params=n_params)
        assert not below.flash_active and above.flash_active
        assert above.transient_bytes == 0
        assert below.transient_bytes > 0
        # flash at 1280 frames needs LESS attention-weight memory than
        # einsum at 896
        assert above.attention_weight_bytes < below.attention_weight_bytes

    def test_flash_config_off_means_never_active(self, hp_config, n_params):
        cfg = dataclasses.replace(hp_config, use_flash_attention=False)
        est = estimate_train_step_hbm(cfg, 16, 1800, 256, n_params=n_params)
        assert not est.flash_active and est.transient_bytes > 0

    def test_remat_reduces_activation_memory(self, hp_config, n_params):
        plain = estimate_train_step_hbm(hp_config, 16, 896, 128, n_params=n_params)
        remat_cfg = dataclasses.replace(
            hp_config, gradient_checkpointing=True, checkpoint_segments=2
        )
        remat = estimate_train_step_hbm(remat_cfg, 16, 896, 128, n_params=n_params)
        assert remat.remat_active and not plain.remat_active
        assert remat.token_activation_bytes < plain.token_activation_bytes
        assert remat.attention_weight_bytes < plain.attention_weight_bytes
        # remat does NOT remove the f32 score transients (recompute replays them)
        assert remat.transient_bytes == plain.transient_bytes

    def test_state_term_scales_with_params(self, hp_config):
        small = estimate_train_step_hbm(hp_config, 16, 896, 128, n_params=1_000_000)
        big = estimate_train_step_hbm(hp_config, 16, 896, 128, n_params=100_000_000)
        assert big.state_bytes == 100 * small.state_bytes
        # params (f32) + mu + nu + EMA + grad scratch = 5 f32 copies
        assert small.state_bytes == 1_000_000 * 4 * 5

    def test_total_is_sum_of_terms(self, hp_config, n_params):
        est = estimate_train_step_hbm(hp_config, 16, 896, 128, n_params=n_params)
        assert est.total_bytes == (
            est.state_bytes + est.token_activation_bytes
            + est.attention_weight_bytes + est.transient_bytes
            + est.batch_bytes + est.overhead_bytes
        )

    def test_summary_mentions_shape_and_flags(self, hp_config, n_params):
        est = estimate_train_step_hbm(hp_config, 16, 1280, 192, n_params=n_params)
        s = est.summary()
        assert "B=16" in s and "T=1280" in s and "flash" in s


class TestMaxBatchAndPlan:
    def test_max_batch_honors_multiple(self, hp_config, n_params):
        b = max_batch_size(hp_config, 896, 128, n_params=n_params, multiple=16)
        assert b % 16 == 0 and b >= 16

    def test_max_batch_zero_when_nothing_fits(self, hp_config, n_params):
        b = max_batch_size(
            hp_config, 1800, 256, hbm_bytes=1 * GIB, n_params=n_params
        )
        assert b == 0

    def test_max_batch_shrinks_with_sequence_length(self, hp_config, n_params):
        cfg = dataclasses.replace(hp_config, use_flash_attention=False)
        short = max_batch_size(cfg, 512, 96, n_params=n_params)
        long = max_batch_size(cfg, 1280, 192, n_params=n_params)
        assert short > long > 0

    def test_plan_buckets_one_row_per_mel_bucket(self, hp_config, n_params):
        rows = plan_buckets(hp_config, n_params=n_params)
        assert len(rows) == len(hp_config.mel_bucket_sizes)
        assert all(r["max_batch"] >= 0 for r in rows)
        # every bucket must accommodate the preset's configured batch
        assert all(r["configured_fits"] for r in rows)

    def test_plan_flags_oversized_configured_batch(self, hp_config, n_params):
        cfg = dataclasses.replace(
            hp_config, batch_size=512, use_flash_attention=False
        )
        rows = plan_buckets(cfg, n_params=n_params)
        assert not rows[-1]["configured_fits"]


class TestRecommendations:
    def test_preset_recommendation_fits_without_remat(self, hp_config, n_params):
        rec = recommend_settings(hp_config, n_params=n_params)
        assert rec["batch_size"] >= 8
        assert rec["gradient_checkpointing"] is False
        # throughput note: fits > configured batch, but MXU-bound
        assert any("MXU-bound" in n for n in rec["notes"])

    def test_tiny_hbm_recommends_remat(self, hp_config, n_params):
        cfg = dataclasses.replace(hp_config, use_flash_attention=False)
        rec = recommend_settings(cfg, hbm_bytes=6 * GIB, n_params=n_params)
        assert rec["gradient_checkpointing"] is True

    def test_flash_suggested_when_off_at_long_sequences(self, hp_config, n_params):
        cfg = dataclasses.replace(hp_config, use_flash_attention=False)
        rec = recommend_settings(cfg, n_params=n_params)
        assert any("use_flash_attention" in n for n in rec["notes"])

    def test_live_hbm_query_none_or_positive(self):
        limit = live_hbm_bytes()
        assert limit is None or limit > 0


class TestTrainerPreflight:
    def test_preflight_logs_plan_and_never_raises(self, tmp_path, caplog):
        from kokoro_tpu.training.trainer import KokoroTrainer
        from tests.unit.test_cli_commands import _corpus

        corpus = _corpus(tmp_path / "corpus", n=3)
        cfg = get_smoke_test_config(
            data_dir=str(corpus), output_dir=str(tmp_path / "out"),
            num_epochs=1, batch_size=2, validation_split=0.34,
            use_speed_perturbation=False, use_spec_augment=False,
        )
        with caplog.at_level(logging.INFO, logger="kokoro_tpu.training.trainer"):
            trainer = KokoroTrainer(cfg)
        assert any("HBM plan" in r.message for r in caplog.records)
        del trainer


class TestPlanCLI:
    def test_cli_prints_table_and_recommendation(self, capsys, monkeypatch):
        import sys

        from kokoro_tpu.cli.plan import main

        monkeypatch.setattr(
            sys, "argv",
            ["kokoro-plan", "--data-dir", "/nonexistent", "--hbm-gib", "15.75"],
        )
        assert main() == 0
        out = capsys.readouterr().out
        assert "HBM budget: 15.75 GiB" in out
        assert "Recommendation at the largest bucket" in out
        assert "max B" in out

    def test_cli_json_mode_round_trips(self, capsys, monkeypatch):
        import json
        import sys

        from kokoro_tpu.cli.plan import main

        monkeypatch.setattr(
            sys, "argv",
            ["kokoro-plan", "--data-dir", "/nonexistent", "--json",
             "--hbm-gib", "8"],
        )
        assert main() == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc["hbm_bytes"] == 8 * GIB
        assert len(doc["buckets"]) >= 1
        assert "batch_size" in doc["recommendation"]

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
