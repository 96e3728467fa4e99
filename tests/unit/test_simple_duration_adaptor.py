"""SimpleDurationAdaptor fallback (reference duration_adaptor.py:51-102,
model.py:146-170): duration-only MLP adaptor with gradient-preserving length
regulation, no pitch/energy, selected by use_variance_predictor=False."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.models.variance import SimpleDurationAdaptor


def _model(use_vp):
    return KokoroModel(
        vocab_size=32, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, use_variance_predictor=use_vp,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )


def _batch(B=2, L=5, T=16, M=8, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        phoneme_indices=jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
        mel_specs=jnp.asarray(rng.normal(size=(B, T, M)), jnp.float32),
        phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
        deterministic=True,
    )


class TestAdaptorUnit:
    @pytest.fixture(scope="class")
    def adaptor(self):
        m = SimpleDurationAdaptor(hidden_dim=32, dropout=0.0)
        enc = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 32)),
                          jnp.float32)
        p = m.init(jax.random.PRNGKey(0), enc, max_frames=20)
        return m, p, enc

    def test_mlp_param_shapes(self, adaptor):
        """Linear(h,h) -> Linear(h,h/2) -> Linear(h/2,1)
        (reference model.py:148-156)."""
        m, p, _ = adaptor
        params = p["params"]
        assert params["linear1"]["kernel"].shape == (32, 32)
        assert params["linear2"]["kernel"].shape == (32, 16)
        assert params["linear3"]["kernel"].shape == (16, 1)

    def test_returns_none_pitch_energy(self, adaptor):
        m, p, enc = adaptor
        _, dur, pitch, energy, _ = m.apply(p, enc, max_frames=20)
        assert pitch is None and energy is None
        assert dur.shape == (2, 5)

    def test_inference_durations_expm1_min_one(self, adaptor):
        """durations = clamp(round(expm1(pred)), min=1)
        (reference duration_adaptor.py:88-96 — expm1, not exp)."""
        m, p, enc = adaptor
        _, dur_pred, _, _, frame_mask = m.apply(p, enc, max_frames=64)
        want = np.clip(np.round(np.expm1(np.asarray(dur_pred))), 1, None)
        valid = (~np.asarray(frame_mask)).sum(axis=1)
        np.testing.assert_array_equal(
            valid, np.minimum(want.sum(axis=1), 64).astype(int)
        )
        assert (want >= 1).all()  # every phoneme gets at least one frame

    def test_duration_target_teacher_forcing(self, adaptor):
        m, p, enc = adaptor
        tgt = jnp.full((2, 5), 3, jnp.int32)
        expanded, _, _, _, frame_mask = m.apply(
            p, enc, max_frames=20, duration_target=tgt
        )
        assert expanded.shape == (2, 20, 32)
        np.testing.assert_array_equal(
            (~np.asarray(frame_mask)).sum(axis=1), [15, 15]
        )

    def test_gradients_flow_through_expansion(self, adaptor):
        """The Simple path preserves encoder gradients through length
        regulation (unlike the VarianceAdaptor's reference-parity
        stop-gradient default)."""
        m, p, enc = adaptor
        tgt = jnp.full((2, 5), 3, jnp.int32)

        def loss(enc_in):
            expanded, *_ = m.apply(p, enc_in, max_frames=20, duration_target=tgt)
            return jnp.sum(expanded**2)

        g = np.asarray(jax.grad(loss)(enc))
        assert np.abs(g).max() > 0


class TestModelLevelFallback:
    def test_forward_runs_and_pitch_energy_none(self):
        model = _model(use_vp=False)
        batch = _batch()
        p = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(p, **batch)
        assert out["predicted_pitch"] is None
        assert out["predicted_energy"] is None
        assert np.isfinite(np.asarray(out["predicted_mel"])).all()

    def test_params_under_duration_adaptor(self):
        model = _model(use_vp=False)
        p = model.init(jax.random.PRNGKey(0), **_batch())
        assert "duration_adaptor" in p["params"]
        assert "variance_adaptor" not in p["params"]

    def test_optimizer_labels_fallback_no_decay(self):
        from kokoro_tpu.training.optimizer import label_for_path

        assert label_for_path(
            ("params", "duration_adaptor", "linear1", "kernel")
        ) == "decoder_no_decay"

    def test_losses_zero_pitch_energy(self):
        from kokoro_tpu.training.losses import calculate_training_losses

        model = _model(use_vp=False)
        batch = _batch()
        p = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(p, **batch)
        losses = calculate_training_losses(
            predicted_mel=out["predicted_mel"],
            predicted_log_durations=out["predicted_log_durations"],
            predicted_stop_logits=out["predicted_stop_logits"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stop_token_targets=jnp.zeros(batch["mel_specs"].shape[:2]),
            mel_lengths=jnp.full((2,), 16),
            phoneme_lengths=jnp.full((2,), 5),
            predicted_pitch=out["predicted_pitch"],
            predicted_energy=out["predicted_energy"],
            pitch_targets=jnp.ones(batch["mel_specs"].shape[:2]),
            energy_targets=jnp.ones(batch["mel_specs"].shape[:2]),
        )
        assert float(losses["pitch"]) == 0.0
        assert float(losses["energy"]) == 0.0
        assert float(losses["mel"]) > 0.0

    def test_train_step_with_fallback(self):
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.optimizer import build_optimizer
        from kokoro_tpu.training.train_step import (
            create_train_state,
            init_params,
            make_train_step,
        )

        cfg = get_smoke_test_config(use_variance_predictor=False)
        model = _model(use_vp=False)
        B, L, T = 2, 5, 16
        rng = np.random.default_rng(1)
        batch = {
            "phoneme_indices": jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L)), jnp.int32),
            "phoneme_durations": jnp.full((B, L), T // L, jnp.int32),
            "mel_specs": jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
            "pitch_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "energy_targets": jnp.asarray(rng.uniform(size=(B, T)), jnp.float32),
            "stop_token_targets": jnp.zeros((B, T), jnp.float32),
            "mel_lengths": jnp.full((B,), T, jnp.int32),
            "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        }
        key = jax.random.PRNGKey(0)
        params = init_params(model, key, batch)
        opt = build_optimizer(cfg, params, 10)
        state = create_train_state(model, cfg, opt, key, batch, params=params)
        step = jax.jit(make_train_step(model, cfg, opt, None, 0.9))
        new_state, metrics = step(state, batch, key)
        assert float(metrics["stepped"]) == 1.0
        assert float(metrics["pitch"]) == 0.0
        assert np.isfinite(float(metrics["total"]))

    def test_metadata_round_trip_selects_fallback(self):
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.checkpoint import build_model_metadata

        cfg = get_smoke_test_config(use_variance_predictor=False)
        meta = build_model_metadata(cfg, vocab_size=32)
        assert meta["use_variance_predictor"] is False

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
