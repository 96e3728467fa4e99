"""Utils layer + remaining op tests: SpecAugment, RoPE properties, profiling
helpers, cache manager, misc (mirrors reference test_spec_augment /
test_rope_positional_encoding coverage areas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.positional import (
    add_positional_encoding,
    apply_rope,
    sinusoidal_table,
)
from kokoro_tpu.ops.specaugment import apply_spec_augment


class TestSpecAugment:
    def test_masks_applied(self):
        mem = jnp.ones((4, 64, 32))
        out = apply_spec_augment(
            mem, jax.random.PRNGKey(0), time_mask_max=10, freq_mask_max=8,
            num_time_masks=2, num_freq_masks=2,
        )
        assert out.shape == mem.shape
        assert float(out.sum()) < float(mem.sum())  # something was zeroed
        assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}

    def test_mask_width_bounded(self):
        mem = jnp.ones((1, 200, 4))
        out = apply_spec_augment(
            mem, jax.random.PRNGKey(1), time_mask_max=5, freq_mask_max=0,
            num_time_masks=1, num_freq_masks=0,
        )
        zeros_per_dim = (np.asarray(out[0]) == 0).all(axis=1).sum()
        assert zeros_per_dim <= 5

    def test_different_keys_differ(self):
        mem = jnp.ones((2, 64, 16))
        o1 = apply_spec_augment(mem, jax.random.PRNGKey(0))
        o2 = apply_spec_augment(mem, jax.random.PRNGKey(1))
        assert not np.array_equal(np.asarray(o1), np.asarray(o2))

    def test_zero_masks_identity(self):
        mem = jnp.ones((2, 16, 8))
        out = apply_spec_augment(
            mem, jax.random.PRNGKey(0), time_mask_max=0, freq_mask_max=0,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(mem))


class TestRoPE:
    def test_norm_preserved(self):
        """Rotation preserves vector norms."""
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 10, 64)), jnp.float32)
        r = apply_rope(x, jnp.arange(10))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(r), axis=-1),
            rtol=1e-5,
        )

    def test_relative_property(self):
        """<rope(q, m), rope(k, n)> depends only on (m - n)."""
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 1, 1, 64)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 1, 64)), jnp.float32)

        def dot(m, n):
            qm = apply_rope(q, jnp.array([m]))
            kn = apply_rope(k, jnp.array([n]))
            return float(jnp.sum(qm * kn))

        np.testing.assert_allclose(dot(3, 1), dot(10, 8), rtol=1e-4)
        np.testing.assert_allclose(dot(0, 0), dot(7, 7), rtol=1e-4)

    def test_position_zero_identity(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1, 1, 32)), jnp.float32)
        r = apply_rope(x, jnp.array([0]))
        np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=1e-6)


class TestSinusoidalPE:
    def test_offset_slicing(self):
        """PE with seq_offset t equals the t-th rows of the full table
        (reference positional_encoding.py:36-93 decode semantics)."""
        x = jnp.zeros((1, 4, 16))
        full = add_positional_encoding(jnp.zeros((1, 10, 16)), 0)
        shifted = add_positional_encoding(x, 6)
        np.testing.assert_allclose(
            np.asarray(full[0, 6:10]), np.asarray(shifted[0]), atol=1e-6
        )

    def test_traced_offset(self):
        x = jnp.zeros((1, 2, 16))
        f = jax.jit(lambda t: add_positional_encoding(x, t, max_len=64))
        np.testing.assert_allclose(
            np.asarray(f(jnp.asarray(5))),
            np.asarray(add_positional_encoding(x, 5)),
            atol=1e-6,
        )


class TestProfilingUtils:
    def test_interbatch_profiler(self):
        from kokoro_tpu.utils.profiling import InterbatchProfiler

        p = InterbatchProfiler(report_interval=0)
        for _ in range(3):
            p.start("step")
            p.end("step")
        assert "step" in p.report()
        assert p.throughput(10) > 0

    def test_profile_step_fn(self):
        from kokoro_tpu.utils.profiling import profile_step_fn

        f = jax.jit(lambda x: x * 2)
        stats = profile_step_fn(f, (jnp.ones(16),), n_steps=3, warmup=1)
        assert stats["mean_s"] > 0 and stats["steps_per_s"] > 0

    def test_device_profiler(self):
        from kokoro_tpu.utils.profiling import DeviceProfiler

        p = DeviceProfiler(enabled=True)
        p.log_stage("test")
        assert "1 stages" in p.summary()


class TestCacheManager:
    def test_status_and_clear(self, tmp_path):
        from kokoro_tpu.utils.cache_manager import cache_clear, cache_status

        cache = tmp_path / ".feature_cache"
        cache.mkdir()
        np.savez(cache / "utt0.npz", cache_version=1, x=np.ones(4))
        s = cache_status(str(tmp_path))
        assert s["exists"] and s["entries"] == 1 and s["sampled_corrupt"] == 0
        assert cache_clear(str(tmp_path))
        assert not cache.exists()
        assert cache_status(str(tmp_path))["exists"] is False


class TestMisc:
    def test_format_model_size(self):
        from kokoro_tpu.utils.misc import format_model_size

        assert format_model_size(35_000_000) == "35.00M"
        assert format_model_size(1_500_000_000) == "1.50B"
        assert format_model_size(900) == "900"

    def test_count_parameters(self):
        from kokoro_tpu.utils.misc import count_parameters

        tree = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones(5)}}
        assert count_parameters(tree) == 17

    def test_estimate_training_time(self):
        from kokoro_tpu.utils.misc import estimate_training_time

        est = estimate_training_time(677, 30, 0.1)
        assert est["total_steps"] == 20310
        assert est["total_hours"] == pytest.approx(20310 * 0.1 / 3600)


class TestModelLoader:
    def test_loads_from_training_output(self, tmp_path):
        """ModelLoader reconstructs model+params from a checkpoint dir."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.data.audio_io import save_wav
        from kokoro_tpu.models.model_loader import ModelLoader
        from kokoro_tpu.training.trainer import KokoroTrainer

        corpus = tmp_path / "corpus"
        (corpus / "wavs").mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = []
        for i in range(3):
            t = np.arange(int(22050 * 0.4)) / 22050
            audio = (0.4 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
            save_wav(corpus / "wavs" / f"u{i}.wav", audio, 22050)
            lines.append(f"u{i}|привет мир")
        (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

        out = tmp_path / "run"
        cfg = get_smoke_test_config(
            data_dir=str(corpus), output_dir=str(out), num_epochs=1,
            batch_size=2, validation_split=0.34, use_speed_perturbation=False,
            use_spec_augment=False, compute_dtype="float32",
        )
        KokoroTrainer(cfg).train()

        model, params = ModelLoader(out).load()
        assert model.hidden_dim == cfg.hidden_dim
        assert "text_embedding" in params["params"]

    def test_missing_dir_raises(self, tmp_path):
        from kokoro_tpu.models.model_loader import ModelLoader

        with pytest.raises(FileNotFoundError):
            ModelLoader(tmp_path / "nope").load()


class TestSpecAugmentGating:
    """SpecAugment epoch gating (reference trainer.py:2042-2055): before
    spec_augment_start_epoch the loss fn omits the specaugment rng entirely;
    the model then skips memory masking."""

    def _setup(self):
        import jax
        import jax.numpy as jnp

        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.models.kokoro import KokoroModel
        from kokoro_tpu.training.train_step import make_loss_fn

        cfg = get_smoke_test_config(
            use_spec_augment=True,
            spec_augment_num_time_masks=4, spec_augment_num_freq_masks=4,
            spec_augment_time_mask_max=8, spec_augment_freq_mask_max=16,
        )
        model = KokoroModel(
            vocab_size=24, n_mels=8, hidden_dim=32, n_encoder_layers=1,
            n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
            variance_filter_size=16, gradient_checkpointing=False,
            use_stochastic_depth=False, encoder_dropout=0.0,
            decoder_dropout=0.0, decoder_input_dropout=0.0,
            variance_dropout=0.0, use_spec_augment=True,
            spec_augment_num_time_masks=4, spec_augment_num_freq_masks=4,
            spec_augment_time_mask_max=8, spec_augment_freq_mask_max=16,
        )
        rng = np.random.default_rng(0)
        B, L, T = 2, 5, 16
        batch = {
            "phoneme_indices": jnp.asarray(rng.integers(1, 24, (B, L)), jnp.int32),
            "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32),
            "phoneme_durations": jnp.full((B, L), T // L, jnp.int32),
            "mel_specs": jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
            "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "energy_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "stop_token_targets": jnp.zeros((B, T), jnp.float32),
            "mel_lengths": jnp.full((B,), T, jnp.int32),
            "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        }
        import jax as _jax

        params = model.init(
            _jax.random.PRNGKey(0),
            phoneme_indices=batch["phoneme_indices"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stress_indices=batch["stress_indices"],
            pitch_targets=batch["pitch_targets"],
            energy_targets=batch["energy_targets"],
            deterministic=True,
        )
        return cfg, model, params, batch

    def test_gated_off_equals_deterministic(self):
        import jax

        from kokoro_tpu.training.train_step import make_loss_fn

        cfg, model, params, batch = self._setup()
        loss_off = make_loss_fn(model, cfg, spec_augment=False)
        l1, _ = loss_off(params, batch, jax.random.PRNGKey(1))
        l2, _ = loss_off(params, batch, jax.random.PRNGKey(1), deterministic=True)
        # all dropouts zero + SA gated off -> stochastic == deterministic
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_gated_on_changes_loss(self):
        import jax

        from kokoro_tpu.training.train_step import make_loss_fn

        cfg, model, params, batch = self._setup()
        loss_on = make_loss_fn(model, cfg, spec_augment=True)
        loss_off = make_loss_fn(model, cfg, spec_augment=False)
        l_on, _ = loss_on(params, batch, jax.random.PRNGKey(1))
        l_off, _ = loss_off(params, batch, jax.random.PRNGKey(1))
        assert float(l_on) != pytest.approx(float(l_off), rel=1e-7)

    def test_trainer_epoch_gate_boolean(self):
        from kokoro_tpu.config import get_smoke_test_config

        cfg = get_smoke_test_config(use_spec_augment=True,
                                    spec_augment_start_epoch=3)
        gate = lambda epoch: cfg.use_spec_augment and (
            epoch + 1
        ) >= cfg.spec_augment_start_epoch
        assert not gate(0) and not gate(1)
        assert gate(2) and gate(5)

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
