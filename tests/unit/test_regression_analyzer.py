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
