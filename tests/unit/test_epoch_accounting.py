"""Epoch batch-count and loss-averaging semantics (mirrors reference
tests/unit/test_train_epoch_batch_count_and_averaging.py): epoch averages
cover only successfully processed optimizer steps — a skipped (non-finite)
step's losses are NaN and must not poison the mean — and the optimizer-step
count matches the accumulation-grouped batch count."""

import numpy as np
import pytest

from tests.unit.test_trainer_host_logic import bare_trainer, fake_host_metrics


def metrics_with(scan_k, totals, stepped):
    """Per-step metric chunk with explicit total/stepped vectors."""
    base = fake_host_metrics(scan_k)
    if scan_k > 1:
        base = {k: np.asarray(v, np.float32).copy() for k, v in base.items()}
        for key in ("total", "mel", "duration", "stop", "pitch", "energy"):
            base[key] = np.asarray(totals, np.float32)
        base["stepped"] = np.asarray(stepped, np.float32)
    else:
        for key in ("total", "mel", "duration", "stop", "pitch", "energy"):
            base[key] = np.float32(totals)
        base["stepped"] = np.float32(stepped)
    return base


class TestSkippedStepAveraging:
    def test_skipped_step_nan_losses_excluded(self, tmp_path):
        """A skipped step reports NaN losses; the epoch mean must ignore it
        (reference accumulates losses only after a successful step)."""
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32),
                 "mel_lengths": np.asarray([4], np.int32)}
        chunk = metrics_with(
            3, totals=[1.0, float("nan"), 3.0], stepped=[1.0, 0.0, 1.0]
        )
        t._log_chunk(chunk, 3, batch, base_step=0)
        assert t._epoch_steps == 2
        assert t._epoch_sums["total"] == pytest.approx(4.0)
        assert np.isfinite(t._epoch_sums["total"])

    def test_all_skipped_chunk_counts_zero(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32),
                 "mel_lengths": np.asarray([4], np.int32)}
        chunk = metrics_with(2, totals=[float("nan")] * 2, stepped=[0.0, 0.0])
        t._log_chunk(chunk, 2, batch, base_step=0)
        assert t._epoch_steps == 0
        assert t._epoch_sums.get("total", 0.0) == 0.0

    def test_single_step_skip(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32),
                 "mel_lengths": np.asarray([4], np.int32)}
        t._log_chunk(metrics_with(1, float("nan"), 0.0), 1, batch, 0)
        t._log_chunk(metrics_with(1, 2.5, 1.0), 1, batch, 1)
        assert t._epoch_steps == 1
        assert t._epoch_sums["total"] == pytest.approx(2.5)

    def test_healthy_steps_all_counted(self, tmp_path):
        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((1, 4, 4), np.float32)}
        t._log_chunk(metrics_with(4, [1, 2, 3, 4], [1, 1, 1, 1]), 4, batch, 0)
        assert t._epoch_steps == 4
        assert t._epoch_sums["total"] == pytest.approx(10.0)


class TestEpochBatchCount:
    @pytest.fixture()
    def corpus(self, tmp_path):
        from kokoro_tpu.data.audio_io import save_wav

        root = tmp_path / "corpus"
        wavs = root / "wavs"
        wavs.mkdir(parents=True)
        rng = np.random.default_rng(0)
        texts = ["привет мир", "как дела", "всё", "пока", "да", "нет",
                 "утром", "вечером"]
        lines = []
        for i, text in enumerate(texts):
            t = np.arange(int(22050 * 0.4)) / 22050
            audio = 0.4 * np.sin(2 * np.pi * (130 + 25 * i) * t)
            audio = (audio + 0.02 * rng.normal(size=len(t))).astype(np.float32)
            save_wav(wavs / f"s{i}.wav", audio, 22050)
            lines.append(f"s{i}|{text}")
        (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
        return root

    def test_opt_steps_match_accumulation_grouped_batches(self, corpus, tmp_path):
        """opt_step after one epoch == ceil(batches / accum) including the
        short tail group (reference exact-tail-divisor semantics)."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = get_smoke_test_config(
            data_dir=str(corpus), output_dir=str(tmp_path / "out"),
            num_epochs=1, batch_size=2, gradient_accumulation_steps=2,
            validation_split=0.25, use_speed_perturbation=False,
            use_spec_augment=False, compute_dtype="float32", scan_steps=1,
        )
        t = KokoroTrainer(cfg)
        batches = t.batcher.build_batches(0)
        t.train_epoch(0)
        t._drain_metrics()
        expected = -(-len(batches) // 2)
        assert int(t.state.opt_step) == expected
        assert t._epoch_steps == expected

    def test_epoch_average_matches_manual_mean(self, corpus, tmp_path):
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = get_smoke_test_config(
            data_dir=str(corpus), output_dir=str(tmp_path / "out2"),
            num_epochs=1, batch_size=2, validation_split=0.25,
            use_speed_perturbation=False, use_spec_augment=False,
            compute_dtype="float32", scan_steps=1,
        )
        t = KokoroTrainer(cfg)
        metrics = t.train_epoch(0)
        t._drain_metrics()
        assert t._epoch_steps == int(t.state.opt_step)
        assert metrics["total"] == pytest.approx(
            t._epoch_sums["total"] / t._epoch_steps
        )

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
