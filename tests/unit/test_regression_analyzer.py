"""Unit tests for the regression-forensics analyzer's metric sections
(reference scripts/analyze_training_regression.py parity: stop-loss bursts,
mel<->stop window correlation, val-mel epoch series)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPT = Path(__file__).resolve().parents[2] / "scripts" / "analyze_training_regression.py"
spec = importlib.util.spec_from_file_location("regression_analyzer", SCRIPT)
analyzer = importlib.util.module_from_spec(spec)
sys.modules["regression_analyzer"] = analyzer
spec.loader.exec_module(analyzer)


class TestStopTokenAnalysis:
    def test_percentiles_and_bursts(self):
        steps = list(range(0, 1000, 10))
        vals = [0.1] * len(steps)
        vals[5] = 0.5    # early burst (step 50)
        vals[90] = 0.9   # late burst (step 900)
        scalars = {"loss/stop": list(zip(steps, vals))}
        rep = analyzer.analyze_stop_token(scalars)["step"]
        assert rep["p50"] == pytest.approx(0.1)
        assert rep["bursts"] == 2
        assert rep["late_bursts"] == 1
        assert 50 in rep["burst_steps"] and 900 in rep["burst_steps"]

    def test_no_bursts_when_flat(self):
        scalars = {"loss/stop": [(s, 0.2) for s in range(0, 100, 10)]}
        rep = analyzer.analyze_stop_token(scalars)["step"]
        assert rep["bursts"] == 0
        assert rep["late_bursts"] == 0

    def test_epoch_regressions_flagged(self):
        scalars = {
            "loss/stop": [(0, 0.1)],
            "loss/val_stop_epoch": [(10, 0.3), (20, 0.2), (30, 0.25), (40, 0.1)],
        }
        rep = analyzer.analyze_stop_token(scalars)
        assert rep["epoch_val"]["regression_epochs"] == [3]

    def test_empty_scalars(self):
        assert analyzer.analyze_stop_token({}) == {}


class TestMelStopCorrelation:
    def _scalars(self):
        # two windows: first mel falls / stop falls, second mel flat / stop up
        mel = [(s, 1.0 - 0.001 * s) for s in range(0, 200, 10)]
        mel += [(s, 0.8) for s in range(200, 400, 10)]
        mel += [(s, 0.8) for s in range(400, 600, 10)]
        stop = [(s, 0.5 - 0.001 * s) for s in range(0, 400, 10)]
        stop += [(s, 0.9) for s in range(400, 600, 10)]
        lr = [(s, 1e-4) for s in range(0, 600, 10)]
        return {"loss/mel": mel, "loss/stop": stop, "stats/lr_decoder": lr}

    def test_attribution_labels(self):
        rows = analyzer.analyze_mel_stop_correlation(self._scalars())
        assert len(rows) == 3
        assert rows[0]["attribution"] == ""          # no previous window
        assert rows[1]["attribution"] == "both_down_improving"
        assert rows[2]["attribution"] == "stop_up_only_stop_source"

    def test_lr_pct_present(self):
        rows = analyzer.analyze_mel_stop_correlation(self._scalars())
        assert all(r["lr_pct"] == 100.0 for r in rows)

    def test_no_mel_returns_empty(self):
        assert analyzer.analyze_mel_stop_correlation({"loss/stop": [(0, 1.0)]}) == []


class TestValMelSeries:
    def test_regression_flagging_and_slope(self):
        # descending with one late regression outside the SpecAugment window
        vm = [(100 * (i + 1), v) for i, v in enumerate(
            [1.5, 1.2, 1.0, 0.9, 0.85, 0.84, 0.95])]
        rep = analyzer.analyze_val_mel_series({"loss/val_mel_epoch": vm})
        assert rep["best"] == pytest.approx(0.84)
        assert rep["best_epoch"] == 6
        assert rep["regression_count"] == 1
        assert rep["epochs"][-1]["flag"] == "REGRESSION"
        assert rep["slope_per_epoch"] < 0  # overall still descending

    def test_spec_augment_transient_not_counted(self):
        vm = [(100, 1.5), (200, 1.6), (300, 1.2)]  # rise at epoch 2
        rep = analyzer.analyze_val_mel_series(
            {"loss/val_mel_epoch": vm}, spec_augment_epoch=1
        )
        assert rep["regression_count"] == 0
        assert rep["epochs"][1]["flag"] == "spec_augment_transient"

    def test_empty(self):
        assert analyzer.analyze_val_mel_series({}) == {}


class TestChecklistIntegration:
    def test_late_bursts_produce_warn_and_recommendation(self):
        steps = list(range(0, 1000, 10))
        vals = [0.1] * len(steps)
        vals[95] = 1.0
        metric_report = analyzer.analyze_metrics(
            {"loss/stop": list(zip(steps, vals))}
        )
        checks = analyzer.build_checklist({"checkpoints": []}, metric_report)
        stop_checks = [c for c in checks if c["check"] == "stop-loss bursts"]
        assert stop_checks and stop_checks[0]["status"] == "WARN"
        recs = analyzer.recommendations(checks)
        assert any("stop" in r for r in recs)

    def test_linear_slope_r2(self):
        slope, r2 = analyzer._linear_slope([1.0, 0.9, 0.8, 0.7])
        assert slope == pytest.approx(-0.1)
        assert r2 == pytest.approx(1.0)


class TestCheckpointForensics:
    """The round-4 deep-forensics surface: true parameter-space deltas,
    group attribution, rank stability, persistent movers, burst->epoch
    attribution (reference compute_weight_stats/compute_rank_stability/
    print_persistent_movers :213-400)."""

    def test_classify_param_groups(self):
        cases = {
            "params/decoder_layer_0/self_attn/w_q/kernel": "decoder_attn",
            "params/decoder_layer_1/glu/linear1/kernel": "decoder_ffn",
            "params/decoder_layer_2/norm1/scale": "decoder_other",
            "params/encoder_layer_0/ffn/linear2/bias": "encoder",
            "params/stop_token_predictor/kernel": "stop_head",
            "params/pitch_embedding/embedding": "variance_embed",
            "params/variance_adaptor/duration/conv1/kernel": "variance_pred",
            "params/text_embedding/embedding": "embedding",
            "params/mel_projection_out/kernel": "decoder_io",
        }
        for name, want in cases.items():
            assert analyzer.classify_param(name) == want, name

    def test_compute_entry_true_deltas(self, tmp_path, monkeypatch):
        """||w - w_prev|| must be the norm of the DIFFERENCE: two tensors
        with identical norms but different values still register a delta
        (the old difference-of-norms metric reported 0 for them)."""
        prev = {"params": {"layer": {"w": np.array([1.0, 0.0, 2.0])}},
                "ema_params": {"layer": {"w": np.array([1.0, 0.0, 2.0])}}}
        curr = {"params": {"layer": {"w": np.array([0.0, 1.0, 2.0])}},
                "ema_params": {"layer": {"w": np.array([1.0, 0.0, 2.0])}}}
        monkeypatch.setattr(
            analyzer, "load_checkpoint_params", lambda ck: curr
        )
        entry, arrays = analyzer._compute_entry(
            tmp_path, analyzer.flatten_arrays(prev["params"]),
            {"epoch": 3, "optimizer_step": 40},
            {"epoch": 2, "optimizer_step": 30},
        )
        assert entry["total_delta_norm"] == pytest.approx(np.sqrt(2), abs=1e-4)
        assert entry["delta_velocity"] == pytest.approx(np.sqrt(2) / 10, abs=1e-4)
        # curr live [0,1,2] vs curr EMA [1,0,2] -> distance sqrt(2)
        assert entry["ema_divergence_norm"] == pytest.approx(
            np.sqrt(2), abs=1e-4
        )
        assert entry["top_movers"][0]["delta"] == pytest.approx(
            np.sqrt(2), abs=1e-4
        )
        assert "layer/w" in arrays

    def test_burst_epoch_attribution(self):
        metric_report = {
            "stop_token": {"step": {"burst_steps": [5, 25, 26, 99]}}
        }
        ck_report = {"checkpoints": [
            {"epoch": 0, "optimizer_step": 10},
            {"epoch": 1, "optimizer_step": 20},
            {"epoch": 2, "optimizer_step": 30},
        ]}
        analyzer.attribute_burst_epochs(metric_report, ck_report)
        assert metric_report["stop_token"]["step"]["burst_epochs"] == {
            0: 1, 2: 2, 3: 1,  # step 99 lands after the last boundary
        }

    def test_rank_stability_checklist(self):
        ck_report = {
            "checkpoints": [
                {"rank_stability_jaccard": 0.9},
                {"rank_stability_jaccard": 0.8},
            ],
            "persistent_movers": [
                {"param": "p/decoder_layer_0/glu/linear1/kernel",
                 "group": "decoder_ffn", "epochs_in_top": 4, "of_epochs": 4},
            ],
            "ema_divergence": {"final_norm": 1.0},
        }
        checks = analyzer.build_checklist(ck_report, {})
        rank = [c for c in checks if c["check"] == "mover rank stability"]
        assert rank and rank[0]["status"] == "WARN"
        assert "decoder_ffn" in rank[0]["detail"] or "linear1" in rank[0]["detail"]
