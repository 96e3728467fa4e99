"""End-to-end smoke train: tiny model, synthetic corpus, 2 epochs with
checkpointing + resume (mirrors the reference's own smoke test,
reference README.md:97-103, and BASELINE.json config #1)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    texts = ["привет мир", "как дела", "всё хорошо", "пока"]
    lines = []
    for i, text in enumerate(texts):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def make_config(corpus, out, **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        num_epochs=2,
        batch_size=2,
        gradient_accumulation_steps=1,
        validation_split=0.25,
        use_speed_perturbation=False,
        save_every=1,
        log_every_steps=1,
        use_spec_augment=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return get_smoke_test_config(**base)


class TestSmokeTrain:
    def test_two_epoch_train_and_resume(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        out = tmp_path / "run"
        cfg = make_config(corpus, out)
        trainer = KokoroTrainer(cfg)
        result = trainer.train()
        assert np.isfinite(result["best_val_loss"])
        assert int(trainer.state.opt_step) > 0
        assert int(trainer.state.skipped_steps) == 0

        # artifacts exist
        assert (out / "kokoro_russian_final" / "metadata.json").exists()
        assert (out / "phoneme_processor.pkl").exists()
        assert (out / "checkpoint_epoch_2").exists()

        # resume: a new trainer picks up epoch 2 and does nothing more
        cfg2 = make_config(corpus, out, resume_checkpoint="auto")
        trainer2 = KokoroTrainer(cfg2)
        trainer2._maybe_resume()
        assert trainer2.start_epoch == 2
        assert int(trainer2.state.opt_step) == int(trainer.state.opt_step)

    def test_metadata_mismatch_rejected(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        out = tmp_path / "run2"
        cfg = make_config(corpus, out, num_epochs=1)
        trainer = KokoroTrainer(cfg)
        trainer.train()

        # different hidden_dim must fail strict metadata validation
        cfg_bad = make_config(corpus, out, hidden_dim=128, resume_checkpoint="auto")
        trainer_bad = KokoroTrainer(cfg_bad)
        with pytest.raises(ValueError, match="architecture mismatch"):
            trainer_bad._maybe_resume()

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
