"""Host-loop logic tests via dependency injection (the reference's
KokoroTrainer.__new__ + hand-injected attributes pattern,
reference tests/unit/test_trainer_adaptive_stabilization.py:8-80):
deferred-metric accounting, microbatch extraction, epoch-sum bookkeeping,
divergence warnings, and debug-batch dumps — no model, no device."""

import logging
from pathlib import Path

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.training.trainer import KokoroTrainer, _JsonlWriter, _mel_image


def bare_trainer(tmp_path, **cfg_kw):
    t = KokoroTrainer.__new__(KokoroTrainer)
    t.config = get_smoke_test_config(**cfg_kw)
    t.output_dir = Path(tmp_path)
    t.writer = _JsonlWriter(Path(tmp_path) / "logs")
    t._epoch_sums = {}
    t._epoch_steps = 0
    t._metric_queue = []
    t._host_step = 0
    t._interbatch = None
    return t


def fake_host_metrics(scan_k, total=1.0, stepped=1.0):
    base = {
        k: (np.full((scan_k,), total, np.float32) if scan_k > 1
            else np.float32(total))
        for k in ("total", "mel", "duration", "stop", "pitch", "energy",
                  "grad_norm", "grad_norm_clipped")
    }
    base["stepped"] = (
        np.full((scan_k,), stepped, np.float32) if scan_k > 1
        else np.float32(stepped)
    )
    return base


class TestLogChunkAccounting:
    def test_epoch_sums_accumulate_per_step(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        t._log_chunk(fake_host_metrics(3, total=2.0), 3, batch, base_step=0)
        assert t._epoch_steps == 3
        assert t._epoch_sums["total"] == pytest.approx(6.0)

    def test_single_step_chunk(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        t._log_chunk(fake_host_metrics(1, total=1.5), 1, batch, base_step=10)
        assert t._epoch_steps == 1
        assert t._epoch_sums["mel"] == pytest.approx(1.5)

    def test_divergence_warning_logged(self, tmp_path, caplog):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32)}
        with caplog.at_level(logging.WARNING):
            t._log_chunk(fake_host_metrics(1, total=42.0), 1, batch, 0)
        assert any("divergence" in r.message for r in caplog.records)

    def test_skip_warning_and_debug_dump(self, tmp_path, caplog):
        t = bare_trainer(tmp_path)
        batch = {
            "mel_specs": np.ones((1, 4, 4), np.float32),
            "mel_lengths": np.asarray([4], np.int32),
        }
        with caplog.at_level(logging.WARNING):
            t._log_chunk(fake_host_metrics(1, stepped=0.0), 1, batch, 5)
        assert any("skipped" in r.message for r in caplog.records)
        dumps = list(Path(tmp_path).glob("debug_batch_step_*.npz"))
        assert len(dumps) == 1
        back = np.load(dumps[0])
        np.testing.assert_array_equal(back["mel_specs"], batch["mel_specs"])

    def test_no_dump_on_healthy_steps(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32)}
        t._log_chunk(fake_host_metrics(2), 2, batch, 0)
        assert list(Path(tmp_path).glob("debug_batch_*")) == []


class TestDrainQueue:
    def test_drain_empties_queue_in_order(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32)}
        t._metric_queue = [
            (1, 1, fake_host_metrics(1, total=1.0), batch, 0),
            (2, 2, fake_host_metrics(2, total=2.0), batch, 1),
        ]
        t._drain_metrics()
        assert t._metric_queue == []
        assert t._epoch_steps == 3
        assert t._epoch_sums["total"] == pytest.approx(1.0 + 4.0)


class TestMicroFrom:
    def test_plain_batch_passthrough(self, tmp_path):
        t = bare_trainer(tmp_path)
        b = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        assert t._micro_from(b) is b

    def test_accum_stacked(self, tmp_path):
        t = bare_trainer(tmp_path)
        b = {"mel_specs": np.zeros((3, 2, 8, 4), np.float32),
             "mel_lengths": np.zeros((3, 2), np.int32)}
        m = t._micro_from(b)
        assert m["mel_specs"].shape == (2, 8, 4)

    def test_scan_of_accum(self, tmp_path):
        t = bare_trainer(tmp_path)
        b = {"mel_specs": np.zeros((4, 3, 2, 8, 4), np.float32)}
        m = t._micro_from(b)
        assert m["mel_specs"].shape == (2, 8, 4)


class TestMelImage:
    def test_chw_and_unit_range(self):
        mel = np.random.default_rng(0).normal(size=(20, 8)).astype(np.float32)
        img = _mel_image(mel)
        assert img.shape == (1, 8, 20)
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_constant_input_no_nan(self):
        img = _mel_image(np.zeros((5, 4), np.float32))
        assert np.isfinite(img).all()


class TestJsonlWriter:
    def test_scalars_written(self, tmp_path):
        w = _JsonlWriter(tmp_path)
        w.add_scalar("loss/total", 1.5, 10)
        w.flush()
        import json

        rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
        assert rec == {"tag": "loss/total", "value": 1.5, "step": 10}

    def test_histogram_noop(self, tmp_path):
        w = _JsonlWriter(tmp_path)
        w.add_histogram("x", np.zeros(3), 0)  # must not raise
        w.close()


class TestCastTransfer:
    def test_counters_helper(self, tmp_path):
        t = bare_trainer(tmp_path)

        class FakeState:
            opt_step = np.int32(7)
            ema_updates = np.int32(6)
            skipped_steps = np.int32(1)

        t.state = FakeState()
        t.best_val_loss = 0.5
        t.best_val_epoch = 2
        t._step_seq = 99
        c = t._counters(epoch=3)
        assert c["optimizer_step"] == 7
        assert c["step_seq"] == 99
        assert c["epoch"] == 3


class TestDurationDiagnostics:
    def test_verbose_logs_stats(self, tmp_path, caplog):
        t = bare_trainer(tmp_path, verbose=True)
        micro = {
            "phoneme_indices": np.zeros((2, 5), np.int32),
            "phoneme_lengths": np.asarray([5, 3], np.int32),
            "phoneme_durations": np.asarray(
                [[2, 3, 2, 3, 2], [4, 4, 4, 0, 0]], np.int32
            ),
        }
        out = {"predicted_log_durations": np.full((2, 5), 1.6, np.float32)}
        with caplog.at_level(logging.INFO):
            t._log_duration_diagnostics(out, micro, step=7)
        msgs = [r.message for r in caplog.records]
        assert any("Duration pred @7" in m for m in msgs)
        joined = " ".join(msgs)
        assert "phoneme mask positions=8" in joined
        assert "duration_valid positions=8" in joined

    def test_zero_duration_positions_excluded(self, tmp_path, caplog):
        t = bare_trainer(tmp_path, verbose=True)
        micro = {
            "phoneme_indices": np.zeros((1, 4), np.int32),
            "phoneme_lengths": np.asarray([4], np.int32),
            "phoneme_durations": np.asarray([[2, 0, 3, 0]], np.int32),
        }
        out = {"predicted_log_durations": np.ones((1, 4), np.float32)}
        with caplog.at_level(logging.INFO):
            t._log_duration_diagnostics(out, micro, step=1)
        joined = " ".join(r.message for r in caplog.records)
        assert "phoneme mask positions=4" in joined
        assert "duration_valid positions=2" in joined
