"""Observability parity 'done' criterion (VERDICT round-1 item #4): a smoke
training run's TensorBoard event file must contain every reference tag
family (reference trainer.py:122-135, 1940-1974, 2485-2537, 2902-2940)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


@pytest.fixture(scope="module")
def tb_run(tmp_path_factory):
    pytest.importorskip("torch.utils.tensorboard")
    root = tmp_path_factory.mktemp("tb_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    for i, text in enumerate(["привет мир", "как дела", "всё хорошо", "пока"]):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 25 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
    (root / "metadata.csv").write_text(
        "\n".join(f"s{i}|{t}" for i, t in enumerate(
            ["привет мир", "как дела", "всё хорошо", "пока"])),
        encoding="utf-8",
    )
    out = tmp_path_factory.mktemp("tb_out")
    cfg = get_smoke_test_config(
        data_dir=str(root), output_dir=str(out), num_epochs=1, batch_size=2,
        validation_split=0.25, use_speed_perturbation=False,
        use_spec_augment=False, compute_dtype="float32",
        log_every_steps=1, histogram_every_steps=1, save_every=1,
    )
    from kokoro_tpu.training.trainer import KokoroTrainer

    trainer = KokoroTrainer(cfg)
    trainer.train()
    trainer.writer.flush()
    trainer.writer.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(
        str(out / "logs"),
        size_guidance={"scalars": 0, "histograms": 0, "images": 0},
    )
    acc.Reload()
    return acc.Tags()


SCALAR_FAMILIES = [
    "loss/total", "loss/mel", "loss/duration", "loss/stop", "loss/pitch",
    "loss/energy",
    "loss/val_total", "loss/val_mel",
    "loss/train_total_epoch", "loss/train_mel_epoch", "loss/train_stop_epoch",
    "loss/val_total_epoch", "loss/val_mel_epoch",
    "stats/grad_norm", "stats/grad_norm_clipped",
    "stats/lr_encoder", "stats/lr_decoder", "stats/lr_decoder_ffn",
    "stats/lr_decoder_attn", "stats/lr_stop_head", "stats/lr_variance_embed",
    "metrics/val_spectral_convergence", "metrics/val_f0_rmse",
    "metrics/val_mcd",
    "metrics/train_spectral_convergence",
]


class TestTagFamilies:
    @pytest.mark.parametrize("tag", SCALAR_FAMILIES)
    def test_scalar_tag_present(self, tb_run, tag):
        assert tag in tb_run.get("scalars", []), (
            f"{tag} missing; present: {sorted(tb_run.get('scalars', []))[:40]}"
        )

    def test_weight_histograms_present(self, tb_run):
        hists = tb_run.get("histograms", [])
        assert any(h.startswith("weights/") for h in hists)

    def test_gradient_histograms_present(self, tb_run):
        hists = tb_run.get("histograms", [])
        assert any(h.startswith("gradients/") for h in hists), (
            f"no gradients/* histograms; present: {sorted(hists)[:20]}"
        )

    def test_val_prediction_histograms_present(self, tb_run):
        hists = tb_run.get("histograms", [])
        for tag in ("val_predictions/log_durations", "val_predictions/pitch",
                    "val_predictions/energy"):
            assert tag in hists, f"{tag} missing from {sorted(hists)[:30]}"

    def test_spectrogram_images_present(self, tb_run):
        images = tb_run.get("images", [])
        for tag in ("spectrogram/val_predicted", "spectrogram/val_ground_truth",
                    "spectrogram/train_predicted",
                    "spectrogram/train_ground_truth"):
            assert tag in images, f"{tag} missing from {sorted(images)}"

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
