"""Train/eval mode semantics + validation-path guarantees (mirrors reference
tests/unit/test_model_mode_management.py and the validation behaviors of
trainer.py:1771-1910): dropout/stochastic-depth gating by `deterministic`,
validation running on EMA weights, f32 validation transfer, and the bf16
transfer cast's dtype selectivity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.kokoro import KokoroModel

VOCAB = 24


def model_with(**kw):
    base = dict(
        vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=16,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )
    base.update(kw)
    return KokoroModel(**base)


def batch(B=2, L=6, T=24, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        phoneme_indices=jnp.asarray(rng.integers(1, VOCAB, (B, L))),
        stress_indices=jnp.asarray(rng.integers(0, 3, (B, L))),
        mel_specs=jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
        phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
    )


class TestDeterministicGating:
    def test_eval_mode_is_deterministic(self):
        m = model_with(encoder_dropout=0.3, decoder_dropout=0.3)
        b = batch()
        p = m.init(jax.random.PRNGKey(0), **b, deterministic=True)
        o1 = m.apply(p, **b, deterministic=True)
        o2 = m.apply(p, **b, deterministic=True)
        np.testing.assert_array_equal(
            np.asarray(o1["predicted_mel"]), np.asarray(o2["predicted_mel"])
        )

    def test_train_mode_same_rng_reproducible(self):
        m = model_with(encoder_dropout=0.3, decoder_dropout=0.3)
        b = batch()
        p = m.init(jax.random.PRNGKey(0), **b, deterministic=True)
        rngs = {"dropout": jax.random.PRNGKey(7)}
        o1 = m.apply(p, **b, deterministic=False, rngs=rngs)
        o2 = m.apply(p, **b, deterministic=False, rngs=rngs)
        np.testing.assert_array_equal(
            np.asarray(o1["predicted_mel"]), np.asarray(o2["predicted_mel"])
        )

    def test_train_mode_different_rng_differs(self):
        m = model_with(encoder_dropout=0.3, decoder_dropout=0.3)
        b = batch()
        p = m.init(jax.random.PRNGKey(0), **b, deterministic=True)
        o1 = m.apply(p, **b, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = m.apply(p, **b, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(
            np.asarray(o1["predicted_mel"]), np.asarray(o2["predicted_mel"])
        )

    def test_stochastic_depth_inactive_in_eval(self):
        """With stochastic depth configured, eval outputs are rng-independent
        (reference: drop_path only active in training)."""
        m = model_with(use_stochastic_depth=True, stochastic_depth_rate=0.5)
        b = batch()
        p = m.init(jax.random.PRNGKey(0), **b, deterministic=True)
        o1 = m.apply(p, **b, deterministic=True)
        o2 = m.apply(p, **b, deterministic=True)
        np.testing.assert_array_equal(
            np.asarray(o1["predicted_mel"]), np.asarray(o2["predicted_mel"])
        )

    def test_spec_augment_needs_rng_stream(self):
        """SpecAugment applies only in training AND with the 'specaugment'
        rng provided — eval never augments (reference model.py:636-639)."""
        m = model_with(use_spec_augment=True)
        b = batch()
        p = m.init(jax.random.PRNGKey(0), **b, deterministic=True)
        o_eval = m.apply(p, **b, deterministic=True)
        o_no_rng = m.apply(
            p, **b, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        # without the specaugment stream the memory is untouched; outputs
        # differ from eval only by dropout, both finite
        assert np.isfinite(np.asarray(o_eval["predicted_mel"])).all()
        assert np.isfinite(np.asarray(o_no_rng["predicted_mel"])).all()


def _tiny_corpus(tmp_path):
    from kokoro_tpu.data.audio_io import save_wav

    root = tmp_path / "corpus"
    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(["привет мир", "как дела", "всё", "пока"]):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


class TestValidationSemantics:
    def test_validate_epoch_uses_ema_weights(self, tmp_path):
        """Corrupting ema_params (only) must change the validation loss —
        proof validation evaluates the EMA model (reference trainer.py:1771)."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = get_smoke_test_config(
            data_dir=str(_tiny_corpus(tmp_path)),
            output_dir=str(tmp_path / "out"),
            num_epochs=1, batch_size=2, validation_split=0.5,
            use_speed_perturbation=False, use_spec_augment=False,
            compute_dtype="float32",
        )
        t = KokoroTrainer(cfg)
        t.train_epoch(0)
        base = t.validate_epoch(0)["mel"]
        t.state = t.state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda x: x * 0.0, t.state.ema_params
            )
        )
        corrupted = t.validate_epoch(0)["mel"]
        assert corrupted != pytest.approx(base)

    def test_validation_batches_stay_float32_under_bf16_transfer(self, tmp_path):
        """batch_transfer_dtype='bfloat16' quantizes only the TRAIN path;
        validation collates full-precision float32 batches
        (docs/PERFORMANCE.md dtype-asymmetry note)."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.data.batching import collate
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = get_smoke_test_config(
            data_dir=str(_tiny_corpus(tmp_path)),
            output_dir=str(tmp_path / "out2"),
            num_epochs=1, batch_size=2, validation_split=0.5,
            use_speed_perturbation=False, use_spec_augment=False,
            compute_dtype="float32", batch_transfer_dtype="bfloat16",
        )
        t = KokoroTrainer(cfg)
        rng = np.random.default_rng(0)
        feats = [t.val_dataset.get_features(0, rng)]
        val_batch = collate(feats, cfg)
        assert val_batch["mel_specs"].dtype == np.float32
        # train path: the cast converts every float32 tensor, nothing else
        cast = t._cast_transfer(val_batch)
        import ml_dtypes

        assert cast["mel_specs"].dtype == ml_dtypes.bfloat16
        assert cast["phoneme_indices"].dtype == val_batch["phoneme_indices"].dtype

    def test_cast_transfer_identity_for_float32_config(self, tmp_path):
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.trainer import KokoroTrainer, _JsonlWriter
        from pathlib import Path

        t = KokoroTrainer.__new__(KokoroTrainer)
        t.config = get_smoke_test_config(batch_transfer_dtype="float32")
        b = {"mel_specs": np.zeros((1, 4, 4), np.float32)}
        assert t._cast_transfer(b) is b

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
