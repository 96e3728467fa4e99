"""Feature pack: validation loop semantics (mirrors reference
tests/features/test_validation.py — best-val tracking with min_delta,
early-stopping patience, best-checkpoint gating — asserted on the REAL
KokoroTrainer.train() loop with scripted validation outcomes;
kokoro_tpu/training/trainer.py:370-396)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


def make_corpus(root, n=4):
    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    texts = ["привет мир", "как дела", "всё хорошо", "пока"]
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(int(22050 * 0.4)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 25 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
    (root / "metadata.csv").write_text(
        "\n".join(f"s{i}|{texts[i % 4]}" for i in range(n)), encoding="utf-8")
    return root


def scripted_trainer(tmp_path, val_script, num_epochs, patience,
                     min_delta=0.001):
    """Real trainer, real train epochs, validation outcomes scripted so the
    bookkeeping path under test is deterministic."""
    from kokoro_tpu.training.trainer import KokoroTrainer

    cfg = get_smoke_test_config(
        data_dir=str(make_corpus(tmp_path / "corpus")),
        output_dir=str(tmp_path / "out"),
        num_epochs=num_epochs, batch_size=2, validation_split=0.25,
        use_speed_perturbation=False, use_spec_augment=False,
        compute_dtype="float32", save_every=100,
        early_stopping_patience=patience,
        early_stopping_min_delta=min_delta,
    )
    trainer = KokoroTrainer(cfg)
    calls = {"val": 0, "best_saves": 0}
    script = list(val_script)

    def fake_validate(epoch):
        calls["val"] += 1
        return {"total": script[epoch], "mel": script[epoch]}

    real_save_best = trainer.ckpt.save_best

    def counting_save_best(*a, **kw):
        calls["best_saves"] += 1
        return real_save_best(*a, **kw)

    trainer.validate_epoch = fake_validate
    trainer.ckpt.save_best = counting_save_best
    return trainer, calls


class TestBestValTracking:
    def test_improvement_updates_best_and_saves(self, tmp_path):
        trainer, calls = scripted_trainer(
            tmp_path, [1.0, 0.8, 0.9], num_epochs=3, patience=10)
        trainer.train()
        assert trainer.best_val_loss == 0.8
        assert trainer.best_val_epoch == 1
        assert calls["best_saves"] == 2  # epochs 0 and 1, not the 0.9

    def test_min_delta_blocks_marginal_improvement(self, tmp_path):
        """An improvement smaller than min_delta does NOT reset patience or
        update best (the reference's min_delta semantics)."""
        trainer, calls = scripted_trainer(
            tmp_path, [1.0, 1.0 - 0.0005, 1.0 - 0.0008], num_epochs=3,
            patience=10, min_delta=0.001)
        trainer.train()
        assert trainer.best_val_loss == 1.0
        assert trainer.best_val_epoch == 0
        assert trainer.epochs_without_improvement == 2
        assert calls["best_saves"] == 1


class TestEarlyStopping:
    def test_stops_after_patience_epochs_without_improvement(self, tmp_path):
        trainer, calls = scripted_trainer(
            tmp_path, [1.0, 1.1, 1.2, 1.3, 0.5, 0.4], num_epochs=6,
            patience=2)
        trainer.train()
        # vals: 1.0 (best), 1.1 (1), 1.2 (2 -> stop). Epochs 3-5 never run.
        assert calls["val"] == 3
        assert trainer.best_val_loss == 1.0

    def test_patience_resets_on_improvement(self, tmp_path):
        trainer, calls = scripted_trainer(
            tmp_path, [1.0, 1.1, 0.9, 1.0, 1.05], num_epochs=5, patience=2)
        trainer.train()
        # 1.1 (1), 0.9 resets, 1.0 (1), 1.05 (2 -> stop at the last epoch)
        assert calls["val"] == 5
        assert trainer.best_val_loss == 0.9
        assert trainer.best_val_epoch == 2

    def test_no_early_stop_when_improving(self, tmp_path):
        trainer, calls = scripted_trainer(
            tmp_path, [1.0, 0.9, 0.8], num_epochs=3, patience=1)
        result = trainer.train()
        assert calls["val"] == 3
        assert result["best_val_loss"] == pytest.approx(0.8)
        assert trainer.epochs_without_improvement == 0

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
