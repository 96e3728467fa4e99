"""CLI command smoke tests (reference cli/ — note the reference's
kokoro-infer entry point is BROKEN, setup.py:53; ours must keep working):
corpus validation, precompute cache fill/skip semantics, infer batch mode
against a real tiny trained model."""

import json
from pathlib import Path

import numpy as np
import pytest

from kokoro_tpu.cli.precompute import precompute_features
from kokoro_tpu.cli.preprocess import validate_corpus
from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


def _corpus(root: Path, n=3):
    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        t = np.arange(int(22050 * 0.4)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (160 + 30 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"c{i}.wav", audio, 22050)
        lines.append(f"c{i}|привет мир {i}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


class TestValidateCorpus:
    def test_valid_corpus(self, tmp_path):
        _corpus(tmp_path)
        out = validate_corpus(str(tmp_path))
        assert out["valid"]
        assert out["metadata_entries"] == 3
        assert out["wav_files"] == 3
        assert out["matched"] == 3

    def test_missing_metadata(self, tmp_path):
        (tmp_path / "wavs").mkdir()
        out = validate_corpus(str(tmp_path))
        assert not out["valid"]
        assert any("metadata" in i for i in out["issues"])

    def test_missing_wavs_dir(self, tmp_path):
        (tmp_path / "metadata.csv").write_text("a|б\n", encoding="utf-8")
        out = validate_corpus(str(tmp_path))
        assert not out["valid"]
        assert any("wavs" in i for i in out["issues"])

    def test_no_matches(self, tmp_path):
        (tmp_path / "wavs").mkdir()
        (tmp_path / "metadata.csv").write_text("ghost|текст\n", encoding="utf-8")
        out = validate_corpus(str(tmp_path))
        assert not out["valid"]
        assert out["matched"] == 0


class TestPrecompute:
    def test_fill_then_skip(self, tmp_path):
        corpus = _corpus(tmp_path / "c")
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_mfa=False, use_speed_perturbation=False
        )
        stats1 = precompute_features(cfg)
        assert stats1["computed"] == 3
        assert stats1["failed"] == 0
        assert len(list(Path(cfg.feature_cache_dir).glob("*.npz"))) == 3
        # second run: everything cached -> skipped (reference :67-75)
        stats2 = precompute_features(cfg)
        assert stats2["computed"] == 0
        assert stats2["skipped"] == 3

    def test_cache_version_reported(self, tmp_path):
        from kokoro_tpu.data.dataset import FEATURE_CACHE_VERSION

        corpus = _corpus(tmp_path / "c2", n=1)
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_mfa=False, use_speed_perturbation=False
        )
        assert precompute_features(cfg)["cache_version"] == FEATURE_CACHE_VERSION


class TestInferCli:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        """A real 1-epoch smoke-trained model directory."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        corpus = _corpus(tmp_path_factory.mktemp("icorpus"), n=4)
        out = tmp_path_factory.mktemp("imodel")
        cfg = get_smoke_test_config(
            data_dir=str(corpus), output_dir=str(out), num_epochs=1,
            batch_size=2, validation_split=0.25, use_speed_perturbation=False,
            use_spec_augment=False, compute_dtype="float32",
        )
        KokoroTrainer(cfg).train()
        return out

    def test_single_text_mode(self, trained, tmp_path):
        from kokoro_tpu.cli.infer import main

        wav_out = tmp_path / "one.wav"
        rc = main([
            "--model", str(trained), "--text", "привет",
            "--output", str(wav_out), "--vocoder", "griffin_lim",
        ])
        assert rc == 0
        assert wav_out.exists()
        from kokoro_tpu.data.audio_io import read_wav

        sr, wav = read_wav(wav_out)
        assert sr == 22050
        assert np.isfinite(wav).all() and wav.size > 0

    def test_batch_file_mode(self, trained, tmp_path):
        from kokoro_tpu.cli.infer import main

        txt = tmp_path / "lines.txt"
        txt.write_text("привет\nкак дела\n", encoding="utf-8")
        out_dir = tmp_path / "outs"
        rc = main([
            "--model", str(trained), "--file", str(txt),
            "--output-dir", str(out_dir), "--vocoder", "griffin_lim",
        ])
        assert rc == 0
        wavs = sorted(out_dir.glob("*.wav"))
        assert len(wavs) == 2

    def test_missing_model_dir_errors(self, tmp_path):
        from kokoro_tpu.cli.infer import main

        rc = main(["--model", str(tmp_path / "nope"), "--text", "привет"])
        assert rc != 0

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
