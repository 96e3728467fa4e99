"""KokoroTTS inference-control precedence and health-check behavior
(reference inference.py:393-451 _apply_checkpoint_inference_controls:
checkpoint-tuned controls with explicit-CLI-override precedence)."""

import json
from pathlib import Path

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.inference.tts import KokoroTTS


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A real (tiny) trained model directory via the trainer's save path."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.data.phonemes import RussianPhonemeProcessor
    from kokoro_tpu.models.kokoro import KokoroModel
    from kokoro_tpu.training.checkpoint import (
        CheckpointManager,
        build_model_metadata,
    )
    from kokoro_tpu.training.optimizer import build_optimizer
    from kokoro_tpu.training.train_step import create_train_state, init_params

    out = tmp_path_factory.mktemp("tts_model")
    proc = RussianPhonemeProcessor()
    cfg = get_smoke_test_config()
    model = KokoroModel(
        vocab_size=proc.get_vocab_size(), n_mels=cfg.n_mels,
        hidden_dim=cfg.hidden_dim, n_encoder_layers=cfg.n_encoder_layers,
        n_decoder_layers=cfg.n_decoder_layers, n_heads=cfg.n_heads,
        encoder_ff_dim=cfg.encoder_ff_dim, decoder_ff_dim=cfg.decoder_ff_dim,
        variance_filter_size=cfg.variance_filter_size,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )
    B, L, T = 1, 8, 32
    rng = np.random.default_rng(0)
    batch = {
        "phoneme_indices": jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
        "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32),
        "phoneme_durations": jnp.full((B, L), T // L, jnp.int32),
        "mel_specs": jnp.asarray(rng.normal(size=(B, T, cfg.n_mels)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params = init_params(model, key, batch)
    opt = build_optimizer(cfg, params, 10)
    state = create_train_state(model, cfg, opt, key, batch, params=params)
    mgr = CheckpointManager(out)
    meta = build_model_metadata(cfg, proc.get_vocab_size())
    mgr.save_final_model(state, cfg, meta, {"ema_updates": 0})
    mgr.save_phoneme_processor(proc)
    return out


class TestControlPrecedence:
    def test_checkpoint_controls_are_defaults(self, model_dir):
        tts = KokoroTTS(str(model_dir), vocoder_type="griffin_lim")
        cfg = get_smoke_test_config()
        assert tts.max_frames == cfg.max_seq_length
        assert tts.stop_threshold == 0.5
        assert tts.post_stop_threshold == 0.2

    def test_explicit_overrides_win(self, model_dir):
        tts = KokoroTTS(
            str(model_dir), vocoder_type="griffin_lim",
            max_len=96, stop_threshold=0.8, min_len_ratio=0.5, min_len_floor=4,
        )
        assert tts.max_frames == 96
        assert tts.stop_threshold == 0.8
        assert tts.min_len_ratio == 0.5
        assert tts.min_len_floor == 4

    def test_non_ema_weights_used_when_no_ema_updates(self, model_dir):
        # counters said ema_updates=0 -> auto picks live weights
        tts = KokoroTTS(str(model_dir), vocoder_type="griffin_lim",
                        use_ema_weights="auto")
        assert tts.params is not None

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises((FileNotFoundError, ValueError)):
            KokoroTTS(str(tmp_path / "nope"), vocoder_type="griffin_lim")


class TestSplitText:
    def test_short_text_single_chunk(self, model_dir):
        assert KokoroTTS.split_text("Привет мир.") == ["Привет мир."]

    def test_long_text_chunked_at_sentences(self, model_dir):
        text = "Первое предложение. " * 20
        chunks = KokoroTTS.split_text(text.strip(), max_chars=150)
        assert all(len(c) <= 150 for c in chunks)
        assert len(chunks) > 1

    def test_no_sentence_boundary_stays_single_chunk(self, model_dir):
        """Reference parity (inference.py:453-487): a single sentence longer
        than max_chars is NOT hard-split — chunking is strictly at
        punctuation boundaries."""
        text = ("слово " * 60).strip()
        chunks = KokoroTTS.split_text(text, max_chars=100)
        assert chunks == [text]


class TestBatchedSynthesis:
    def test_batch_matches_single_per_text(self, model_dir):
        """synthesize_mel_batch must reproduce synthesize_mel per text
        (same trim, same values) while grouping by phoneme bucket."""
        tts = KokoroTTS(str(model_dir), vocoder_type="griffin_lim")
        texts = ["привет мир", "как дела", "да"]
        batched = tts.synthesize_mel_batch(texts)
        for text, got in zip(texts, batched):
            single = tts.synthesize_mel(text)
            assert (got is None) == (single is None), text
            if single is not None:
                assert got.shape == single.shape, text
                np.testing.assert_allclose(got, single, rtol=1e-5, atol=1e-5)

    def test_empty_encoding_yields_none_slot(self, model_dir):
        tts = KokoroTTS(str(model_dir), vocoder_type="griffin_lim")
        out = tts.synthesize_mel_batch(["...", "привет"])
        assert len(out) == 2
        assert out[1] is not None

    def test_batch_file_mode_batched_writes_wavs(self, model_dir, tmp_path):
        """kokoro-infer --file --batched: grouped decode writes one wav per
        input, same filenames as the sequential path."""
        tts = KokoroTTS(str(model_dir), vocoder_type="griffin_lim")
        texts = ["привет мир", "как дела", "пока"]
        tts.batch_text_to_speech(texts, str(tmp_path / "batched"), batched=True)
        wavs = sorted((tmp_path / "batched").glob("output_*.wav"))
        assert [w.name for w in wavs] == [
            "output_0000.wav", "output_0001.wav", "output_0002.wav"
        ]
        assert all(w.stat().st_size > 1000 for w in wavs)

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
