"""Dataset semantics depth (reference dataset.py): metadata parsing and
dir-scan fallback, max_seq_length clipping, duration/frame reconciliation,
feature alignment guarantees, deterministic splits."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav
from kokoro_tpu.data.dataset import (
    RuslanDataset,
    build_fallback_durations,
    train_val_split,
)


def _make_corpus(root, items, metadata_name="metadata.csv"):
    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    lines = []
    rng = np.random.default_rng(0)
    for stem, text, seconds in items:
        t = np.arange(int(22050 * seconds)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * 180 * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"{stem}.wav", audio, 22050)
        lines.append(f"{stem}|{text}")
    (root / metadata_name).write_text("\n".join(lines), encoding="utf-8")
    return root


class TestMetadataParsing:
    def test_pipe_rows_and_order(self, tmp_path):
        corpus = _make_corpus(
            tmp_path, [("u0", "привет", 0.4), ("u1", "мир", 0.4)]
        )
        ds = RuslanDataset(str(corpus), get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False))
        assert len(ds) == 2
        stems = {s["audio_file"] for s in ds.samples}
        assert stems == {"u0", "u1"}

    def test_missing_wav_rows_dropped(self, tmp_path):
        corpus = _make_corpus(tmp_path, [("only", "привет", 0.4)])
        meta = corpus / "metadata.csv"
        meta.write_text(
            meta.read_text(encoding="utf-8") + "\nghost|нет файла",
            encoding="utf-8",
        )
        ds = RuslanDataset(str(corpus), get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False))
        assert len(ds) == 1

    def test_dir_scan_fallback_without_metadata(self, tmp_path):
        """No metadata.csv: .txt transcript next to each wav
        (reference :285-340)."""
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        t = np.arange(int(22050 * 0.4)) / 22050
        save_wav(wavs / "solo.wav",
                 (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), 22050)
        (wavs / "solo.txt").write_text("привет", encoding="utf-8")
        ds = RuslanDataset(str(tmp_path), get_smoke_test_config(
            data_dir=str(tmp_path), use_speed_perturbation=False))
        assert len(ds) == 1
        assert ds.samples[0]["text"] == "привет"


class TestMaxSeqClipping:
    def test_long_audio_clipped_to_max_seq(self, tmp_path):
        # smoke config max_seq_length=128 -> 128*256/22050 = 1.49 s
        corpus = _make_corpus(tmp_path, [("long", "очень длинный текст", 3.0)])
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False)
        ds = RuslanDataset(str(corpus), cfg)
        f = ds.get_features(0, np.random.default_rng(0))
        assert int(f["mel_length"]) == cfg.max_seq_length
        assert f["mel_spec"].shape[0] == cfg.max_seq_length
        # durations reconcile to the CLIPPED frame count
        assert int(f["phoneme_durations"].sum()) == cfg.max_seq_length

    def test_lengths_metadata_matches_features(self, tmp_path):
        corpus = _make_corpus(tmp_path, [("m", "привет мир", 0.6)])
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False)
        ds = RuslanDataset(str(corpus), cfg)
        frames_meta, phon_meta = ds.lengths(0)
        f = ds.get_features(0, np.random.default_rng(0))
        assert frames_meta == int(f["mel_length"])
        assert phon_meta == int(f["phoneme_length"])


class TestFallbackDurations:
    def test_exact_frame_sum(self):
        d = build_fallback_durations(7, 100)
        assert d.sum() == 100
        assert (d >= 1).all()

    def test_more_phonemes_than_frames_zero_tail(self):
        """Reference parity (dataset.py:589-592): when frames < phonemes the
        tail gets ZERO durations (never over-allocate; the loss masks
        zero-duration tokens), and the frame sum stays exact."""
        d = build_fallback_durations(10, 3)
        assert d.sum() == 3
        assert list(d[:3]) == [1, 1, 1]
        assert (d[3:] == 0).all()

    def test_single_phoneme_takes_all(self):
        d = build_fallback_durations(1, 55)
        assert list(d) == [55]


class TestFeatureAlignment:
    def test_pitch_energy_length_match_mel(self, tmp_path):
        corpus = _make_corpus(tmp_path, [("al", "как дела сегодня", 0.8)])
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False)
        ds = RuslanDataset(str(corpus), cfg)
        f = ds.get_features(0, np.random.default_rng(0))
        T = int(f["mel_length"])
        assert f["pitch"].shape[0] == T
        assert f["energy"].shape[0] == T
        assert (f["pitch"] <= 1.0).all() and (f["pitch"] >= 0.0).all()
        assert (f["energy"] <= 1.0).all() and (f["energy"] >= 0.0).all()

    def test_phoneme_and_stress_parallel(self, tmp_path):
        corpus = _make_corpus(tmp_path, [("st", "москва́ зимой", 0.6)])
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False)
        ds = RuslanDataset(str(corpus), cfg)
        f = ds.get_features(0, np.random.default_rng(0))
        assert f["phoneme_indices"].shape == f["stress_indices"].shape
        assert set(np.unique(f["stress_indices"])).issubset({0, 1, 2})

    def test_vocab_indices_in_range(self, tmp_path):
        corpus = _make_corpus(tmp_path, [("vx", "пятьдесят три года", 0.7)])
        cfg = get_smoke_test_config(
            data_dir=str(corpus), use_speed_perturbation=False)
        ds = RuslanDataset(str(corpus), cfg)
        f = ds.get_features(0, np.random.default_rng(0))
        vocab = ds.phoneme_processor.get_vocab_size()
        assert f["phoneme_indices"].min() >= 0
        assert f["phoneme_indices"].max() < vocab


class TestTrainValSplit:
    def test_split_fraction(self):
        train, val = train_val_split(100, 0.1, seed=42)
        assert len(val) == 10 and len(train) == 90

    def test_no_overlap_covers_all(self):
        train, val = train_val_split(57, 0.2, seed=1)
        assert set(train) | set(val) == set(range(57))
        assert not set(train) & set(val)

    def test_same_seed_same_split(self):
        assert train_val_split(50, 0.1, seed=9) == train_val_split(50, 0.1, seed=9)

    def test_different_seed_differs(self):
        a = train_val_split(200, 0.1, seed=1)
        b = train_val_split(200, 0.1, seed=2)
        assert a != b

    def test_zero_split_all_train(self):
        train, val = train_val_split(10, 0.0, seed=0)
        assert len(val) == 0 and len(train) == 10

    def test_reference_split_recipe_pinned(self):
        """Byte-for-byte the reference's split (reference trainer.py:286-293):
        Mersenne shuffle at seed 42, train = head int(n*(1-vs)), val = TAIL.
        Both frameworks must put the SAME utterances in validation for the
        head-to-head parity run (scripts/parity_run.py)."""
        import random

        n, vs = 48, 0.25
        expect = list(range(n))
        random.seed(42)
        random.shuffle(expect)
        split_idx = int(n * (1 - vs))
        train, val = train_val_split(n, vs, seed=42)
        assert train == expect[:split_idx]
        assert val == expect[split_idx:]
